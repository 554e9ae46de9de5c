/* @bruin
name: srv_adc_hits_mock
type: spark.sql
description: IVFADC serving over the stale half-corpus index through a BROKER-routed feed (mock scheme) — its recall monitor must trip exactly like the file-fed arm
depends:
  - srv_pq_index_half
  - srv_corpus
materialization:
  type: table
parameters:
  serve: ivfadc
  serve_index: srv_pq_index_half
  serve_k: "3"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_recall_min: "0.95"
  serve_recall_sample: "10"
  serve_recall_corpus: srv_corpus
  source_uri: mock://queries
@bruin */
SELECT 'serving asset: hits append to srv_adc_hits_mock; this body is not executed'
