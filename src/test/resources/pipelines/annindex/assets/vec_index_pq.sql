/* @bruin
name: vec_index_pq
type: spark.sql
description: persisted IVFADC (PQ-code) index; append runs route batches under the frozen quantizers
depends:
  - corpus_vecs
materialization:
  type: table
  strategy: append
parameters:
  index: ivfpq
  index_nlist: "4"
  index_m: "2"
  index_k: "8"
@bruin */
SELECT vec_id, embedding FROM corpus_vecs
