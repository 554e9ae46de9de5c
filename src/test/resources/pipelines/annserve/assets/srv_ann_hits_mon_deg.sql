/* @bruin
name: srv_ann_hits_mon_deg
type: spark.sql
description: float-IVF serving over the stale half-corpus index with an exact CORPUS recall baseline — must trip the gate
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
  source_uri: file:///tmp/graft-srv-mon-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_mon_deg; this body is not executed'
