/* @bruin
name: srv_sig_index_half
type: spark.sql
description: DEGRADED signature index — only half the doc population is banded (coverage loss the banded route cannot see from inside)
depends:
  - srv_doc_corpus
materialization:
  type: table
  strategy: create+replace
parameters:
  index: signature
  index_signature: simhash
  index_max_hamming: "7"
  index_bands: "8"
@bruin */
SELECT doc_id, text FROM srv_doc_corpus WHERE doc_id <= 20
