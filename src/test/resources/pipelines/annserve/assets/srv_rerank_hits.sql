/* @bruin
name: srv_rerank_hits
type: spark.sql
description: two-stage ADC-shortlist + exact-cosine-rerank serving
depends:
  - srv_pq_index
  - srv_corpus
materialization:
  type: table
parameters:
  serve: rerank
  serve_index: srv_pq_index
  serve_corpus: srv_corpus
  serve_k: "3"
  serve_shortlist: "64"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  source_uri: file:///tmp/graft-srv-vec-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_rerank_hits; this body is not executed'
