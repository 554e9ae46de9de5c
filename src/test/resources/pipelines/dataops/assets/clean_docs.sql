/* @bruin
name: clean_docs
type: spark.sql
description: raw docs gated through the engine's Gopher quality battery
depends:
  - raw_docs
materialization:
  type: table
  strategy: create+replace
parameters:
  quality_filter: gopher
  quality_filter_lang: lang
@bruin */
SELECT doc_id, lang, text FROM raw_docs
