/* @bruin
name: srv_doc_corpus
type: spark.sql
description: synthetic doc corpus with repeated-text groups (simhash-identical cliques)
materialization:
  type: table
  strategy: create+replace
@bruin */
SELECT id AS doc_id,
       concat('alpha beta gamma delta w', CAST(id % 5 AS STRING),
              ' epsilon zeta eta theta iota kappa lambda mu') AS text
FROM range(1, 41)
