/* @bruin
name: srv_neardup_hits_hmon
type: spark.sql
description: hamming serving with BOTH guardrails — banded-recall spot check vs the declared signature population and per-bit signature-drift PSI vs the index population (healthy arm)
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
  serve_recall_min: "0.9"
  serve_recall_sample: "10"
  serve_recall_corpus: srv_sig_corpus
  serve_drift_max_psi: "1.0"
  source_uri: file:///tmp/graft-srv-hmon-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_neardup_hits_hmon; this body is not executed'
