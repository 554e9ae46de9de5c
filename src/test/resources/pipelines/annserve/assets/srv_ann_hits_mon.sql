/* @bruin
name: srv_ann_hits_mon
type: spark.sql
description: float-IVF serving with a blocking recall@k monitor (healthy full probe)
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
  source_uri: file:///tmp/graft-srv-mon-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_mon; this body is not executed'
