/* @bruin
name: srv_neardup_hits
type: spark.sql
description: streaming hamming near-dup flagging against the signature index
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
  source_uri: file:///tmp/graft-srv-sig-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_neardup_hits; this body is not executed'
