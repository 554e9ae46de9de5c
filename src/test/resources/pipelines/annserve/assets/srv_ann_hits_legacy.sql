/* @bruin
name: srv_ann_hits_legacy
type: spark.sql
description: float-IVF serving into a PRE-EXISTING unpartitioned sink (pre-date-partition layout) — the write side must fall back instead of failing the append
depends:
  - srv_vec_index
materialization:
  type: table
parameters:
  serve: ann
  serve_index: srv_vec_index
  serve_k: "3"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_recall_min: "1.0"
  serve_recall_sample: "10"
  source_uri: file:///tmp/graft-srv-legacy-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_legacy; this body is not executed'
