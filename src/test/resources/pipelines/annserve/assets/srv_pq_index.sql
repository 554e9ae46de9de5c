/* @bruin
name: srv_pq_index
type: spark.sql
description: persisted IVFADC (PQ-code) index for the ADC + rerank serving tiers
depends:
  - srv_corpus
materialization:
  type: table
  strategy: create+replace
parameters:
  index: ivfpq
  index_nlist: "4"
  index_m: "2"
  index_k: "8"
@bruin */
SELECT vec_id, embedding FROM srv_corpus
