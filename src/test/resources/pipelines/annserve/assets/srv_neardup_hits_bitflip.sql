/* @bruin
name: srv_neardup_hits_bitflip
type: spark.sql
description: hamming serving fed BIT-FLIPPED signatures — flips chosen within the serve radius so the route still matches, while the per-bit drift PSI trips
depends:
  - srv_sig_index
materialization:
  type: table
parameters:
  serve: hamming
  serve_index: srv_sig_index
  serve_max_hamming: "7"
  serve_id_col: doc_id
  serve_sig_col: simhash
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_drift_max_psi: "1.0"
  source_uri: file:///tmp/graft-srv-bitflip-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_neardup_hits_bitflip; this body is not executed'
