/* @bruin
name: vec_index
type: spark.sql
description: persisted IVF inverted-list index built declaratively from the corpus asset
depends:
  - corpus_vecs
materialization:
  type: table
  strategy: create+replace
parameters:
  index: ivf
  index_nlist: "4"
@bruin */
SELECT vec_id, embedding FROM corpus_vecs
