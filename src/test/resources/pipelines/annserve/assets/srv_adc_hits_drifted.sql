/* @bruin
name: srv_adc_hits_drifted
type: spark.sql
description: IVFADC serving fed NEGATED query vectors — the tier-generic drift gate trips on the mirrored distribution
depends:
  - srv_pq_index
  - srv_corpus
materialization:
  type: table
parameters:
  serve: ivfadc
  serve_index: srv_pq_index
  serve_k: "3"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_drift_max_psi: "1.0"
  serve_drift_ref: srv_corpus
  source_uri: file:///tmp/graft-srv-drift2-feed-neg
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_adc_hits_drifted; this body is not executed'
