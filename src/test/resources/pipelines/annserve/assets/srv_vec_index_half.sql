/* @bruin
name: srv_vec_index_half
type: spark.sql
description: deliberately STALE float IVF index over only half the corpus — the ann recall monitor's degraded fixture
depends:
  - srv_corpus
materialization:
  type: table
  strategy: create+replace
parameters:
  index: ivf
  index_nlist: "4"
@bruin */
SELECT vec_id, embedding FROM srv_corpus WHERE vec_id <= 30
