/* @bruin
name: srv_corpus
type: spark.sql
description: deterministic synthetic embedding corpus (8-dim float vectors)
materialization:
  type: table
  strategy: create+replace
@bruin */
SELECT id AS vec_id,
       transform(sequence(1, 8),
                 j -> CAST(pmod(id * j, 17) / 17.0 AS FLOAT)) AS embedding
FROM range(1, 61)
