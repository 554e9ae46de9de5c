/* @bruin
name: srv_sig_index
type: spark.sql
description: banded signature index for the streaming hamming near-dup serving tier
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
SELECT doc_id, text FROM srv_doc_corpus
