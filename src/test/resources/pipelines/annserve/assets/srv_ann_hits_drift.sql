/* @bruin
name: srv_ann_hits_drift
type: spark.sql
description: float-IVF serving with recall AND query-drift monitors — healthy arm (queries drawn from the corpus)
depends:
  - srv_vec_index
  - srv_corpus
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
  serve_recall_sample: "50"
  serve_drift_max_psi: "1.0"
  serve_drift_ref: srv_corpus
  source_uri: file:///tmp/graft-srv-drift-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_drift; this body is not executed'
