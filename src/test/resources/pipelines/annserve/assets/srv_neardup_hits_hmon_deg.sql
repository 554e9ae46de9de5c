/* @bruin
name: srv_neardup_hits_hmon_deg
type: spark.sql
description: hamming serving over the HALF-coverage signature index — the banded-recall spot check vs the full declared population trips the gate
depends:
  - srv_sig_index_half
materialization:
  type: table
parameters:
  serve: hamming
  serve_index: srv_sig_index_half
  serve_max_hamming: "7"
  serve_id_col: doc_id
  serve_sig_col: simhash
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_recall_min: "0.9"
  serve_recall_sample: "10"
  serve_recall_corpus: srv_sig_corpus
  source_uri: file:///tmp/graft-srv-hmon-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_neardup_hits_hmon_deg; this body is not executed'
