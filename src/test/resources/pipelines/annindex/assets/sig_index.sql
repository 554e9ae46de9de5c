/* @bruin
name: sig_index
type: spark.sql
description: banded signature index built declaratively (simhash computed in the materializer)
depends:
  - doc_corpus
materialization:
  type: table
  strategy: append
parameters:
  index: signature
  index_signature: simhash
  index_max_hamming: "7"
  index_bands: "8"
@bruin */
SELECT doc_id, text FROM doc_corpus
