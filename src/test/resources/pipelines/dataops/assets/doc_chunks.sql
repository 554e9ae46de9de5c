/* @bruin
name: doc_chunks
type: spark.sql
description: 16-token training windows with 4-token overlap
depends:
  - clean_docs
materialization:
  type: table
  strategy: create+replace
@bruin */
SELECT doc_id, chunk_id, chunk_text, n_tokens FROM (
{{ token_chunk('clean_docs', 'doc_id', 'text', 16, 4) }}
) z
