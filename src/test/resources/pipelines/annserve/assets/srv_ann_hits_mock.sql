/* @bruin
name: srv_ann_hits_mock
type: spark.sql
description: float-IVF serving over a BROKER-routed feed (mock scheme) with the recall monitor on — the capture side-table makes broker feeds monitorable
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
  source_uri: mock://queries
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_mock; this body is not executed'
