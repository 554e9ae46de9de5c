/* @bruin
name: srv_ann_hits
type: spark.sql
description: float-IVF retrieval serving over the persisted inverted-list index
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
  source_uri: file:///tmp/graft-srv-vec-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits; this body is not executed'
