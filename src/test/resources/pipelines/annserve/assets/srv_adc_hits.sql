/* @bruin
name: srv_adc_hits
type: spark.sql
description: IVFADC retrieval serving over the persisted PQ-code index
depends:
  - srv_pq_index
materialization:
  type: table
parameters:
  serve: ivfadc
  serve_index: srv_pq_index
  serve_k: "3"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  source_uri: file:///tmp/graft-srv-vec-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_adc_hits; this body is not executed'
