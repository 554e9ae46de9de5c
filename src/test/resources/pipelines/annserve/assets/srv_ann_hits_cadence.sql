/* @bruin
name: srv_ann_hits_cadence
type: spark.sql
description: degraded float-IVF serving with a recall cadence — the exact baseline's corpus pass is paid every 3rd drain and on index-generation changes; skipped drains leave a skip row
depends:
  - srv_vec_index_half
  - srv_corpus
materialization:
  type: table
parameters:
  serve: ann
  serve_index: srv_vec_index_half
  serve_k: "3"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_recall_min: "0.95"
  serve_recall_sample: "10"
  serve_recall_corpus: srv_corpus
  serve_recall_every: "3"
  source_uri: file:///tmp/graft-srv-cadence-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_cadence; this body is not executed'
