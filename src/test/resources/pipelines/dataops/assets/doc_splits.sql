/* @bruin
name: doc_splits
type: spark.sql
description: deterministic md5-bucket train/valid/test tagging
depends:
  - clean_docs
materialization:
  type: table
  strategy: create+replace
@bruin */
SELECT doc_id, lang, split FROM (
{{ stratified_split('clean_docs') }}
) z
