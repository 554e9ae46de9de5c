/* @bruin
name: srv_pq_index_half
type: spark.sql
description: deliberately STALE PQ index over only half the corpus — the recall monitor's degraded fixture
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
SELECT vec_id, embedding FROM srv_corpus WHERE vec_id <= 30
