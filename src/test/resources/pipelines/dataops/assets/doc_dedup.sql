/* @bruin
name: doc_dedup
type: spark.sql
description: exact-dedup clusters over the cleaned corpus
depends:
  - clean_docs
materialization:
  type: table
  strategy: create+replace
custom_checks:
  - name: found_duplicate_cluster
    query: SELECT count(*) FROM doc_dedup WHERE n_docs > 1
    value: 1
@bruin */
SELECT content_hash, keep_id, n_docs FROM (
{{ dedup_exact('clean_docs') }}
) z
