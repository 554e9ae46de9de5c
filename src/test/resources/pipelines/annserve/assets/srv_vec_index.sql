/* @bruin
name: srv_vec_index
type: spark.sql
description: persisted IVF inverted-list index for the float serving tier
depends:
  - srv_corpus
materialization:
  type: table
  strategy: create+replace
parameters:
  index: ivf
  index_nlist: "4"
@bruin */
SELECT vec_id, embedding FROM srv_corpus
