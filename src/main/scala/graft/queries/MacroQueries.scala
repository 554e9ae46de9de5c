package graft.queries

import graft.render.{Macros, Template}

/** Oracle-checked runs of the jinja macro layer (SURVEY §2.9). Each query is
  * authored as a template, rendered through [[Template]]/[[Macros]] (Spark
  * dialect), and executed; the DuckDB oracle is either the identical rendered
  * text (portable macros) or a handwritten DuckDB equivalent.
  */
object MacroQueries {

  private val ctx = Template.context(
    startDate = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0),
    endDate = java.time.LocalDateTime.of(2024, 3, 31, 0, 0, 0),
    executionDate = java.time.LocalDateTime.of(2024, 1, 15, 0, 0, 0),
    pipelineName = "graft", runId = "r1")

  private def rendered(tmpl: String): String = Template.render(tmpl, ctx)

  /** Template-render + run on Spark; oracle gets `duck` (or the same text). */
  private def macroQ(name: String, tmpl: String, duck: Option[String] = scala.None): OQ = {
    val sql = rendered(tmpl)
    OQ.df(name, (s, _) => s.sql(sql), duck.getOrElse(sql))
  }

  /** safe_divide / safe_add / safe_subtract / generate_surrogate_key — the
    * rendered SQL is portable, so engine and oracle share one text. */
  val arithmetic: OQ = macroQ("macro_safe_arithmetic",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  {{ safe_divide('l_extendedprice', 'l_quantity') }} AS unit_price,
      |  {{ safe_add('l_tax', 'l_discount') }} AS fees,
      |  {{ safe_subtract('l_extendedprice', 'l_discount') }} AS net,
      |  {{ generate_surrogate_key(['l_orderkey', 'l_linenumber', 'l_partkey']) }} AS sk
      |FROM lineitem""".stripMargin)

  /** pivot macro — DuckDB widens SUM(int) to HUGEINT, so the oracle casts. */
  val pivot: OQ = macroQ("macro_pivot",
    """SELECT o_orderpriority,
      |  {{ pivot('o_orderstatus', ['F', 'O', 'P']) }}
      |FROM orders
      |{{ group_by(1) }}""".stripMargin,
    duck = Some(
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY 1""".stripMargin))

  /** deduplicate macro — NATURAL JOIN + ROW_NUMBER CTE, portable. */
  val dedup: OQ = macroQ("macro_deduplicate",
    """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS STRING) AS od FROM (
      |{{ deduplicate('orders', 'o_custkey', 'o_orderdate, o_orderkey') }}
      |) z""".stripMargin)

  /** width_bucket — Spark native; DuckDB oracle replicates the standard
    * floor((v-min)/((max-min)/n))+1 with clamps. */
  val widthBucket: OQ = macroQ("macro_width_bucket",
    """SELECT c_custkey,
      |  CAST({{ width_bucket('c_acctbal', '-1000.0', '10000.0', '10') }} AS BIGINT) AS bucket
      |FROM customer""".stripMargin,
    duck = Some(
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < -1000.0 THEN 0
        |       WHEN c_acctbal >= 10000.0 THEN 11
        |       ELSE CAST(floor((c_acctbal - -1000.0) / ((10000.0 - -1000.0) / 10)) AS BIGINT) + 1
        |  END AS bucket
        |FROM customer""".stripMargin))

  /** haversine + degrees_to_radians over synthesized coordinates; rounded to
    * absorb libm last-ulp differences between JVM and C. */
  val haversine: OQ = macroQ("macro_haversine",
    """SELECT s_suppkey,
      |  round({{ haversine_distance('(s_nationkey * 2.0)', '(s_suppkey % 80)', '40.0', '-70.0', 'km') }}, 4) AS dist_km,
      |  round({{ degrees_to_radians('s_nationkey * 10.0') }}, 6) AS rads
      |FROM supplier""".stripMargin)

  /** date_spine — reference's Spark sequence()+explode form vs DuckDB's
    * generate_series form (bruin_funcs.go SparkDateSpine / DuckDBDateSpine). */
  val dateSpine: OQ = macroQ("macro_date_spine",
    """SELECT CAST(date_day AS STRING) AS day FROM (
      |{{ date_spine('day', "'2024-01-01'", "'2024-02-01'") }}
      |) z""".stripMargin,
    duck = Some(
      """SELECT CAST(cast(date_day as date) AS STRING) AS day
        |FROM generate_series(cast('2024-01-01' as date), cast('2024-02-01' as date), interval '1 day') as t(date_day)
        |WHERE date_day < cast('2024-02-01' as date)""".stripMargin))

  /** generate_series — Spark sequence vs DuckDB native series. */
  val series: OQ = macroQ("macro_generate_series",
    """SELECT CAST(generated_number AS BIGINT) AS n FROM (
      |{{ generate_series(100) }}
      |) z""".stripMargin,
    duck = Some(
      "SELECT CAST(generated_number AS BIGINT) AS n FROM generate_series(1, 100) AS t(generated_number)"))

  /** URL helpers over synthesized URLs — split_part/position text is portable. */
  val urls: OQ = macroQ("macro_url_helpers",
    """SELECT c_custkey,
      |  {{ get_url_host('u') }} AS host,
      |  {{ get_url_path('u') }} AS path,
      |  {{ get_url_parameter('u', 'seg') }} AS seg
      |FROM (
      |  SELECT c_custkey,
      |    concat('https://shop.example.com/c/', CAST(c_custkey AS STRING),
      |           '?seg=', c_mktsegment, '&x=1') AS u
      |  FROM customer) t""".stripMargin)

  /** Template context variables (start_date/end_date/run_id/pipeline/this). */
  val contextVars: OQ = macroQ("macro_context_vars",
    """SELECT '{{ start_date }}' AS start_date, '{{ end_date_nodash }}' AS end_nodash,
      |  '{{ ds }}' AS ds, '{{ pipeline }}' AS pipeline, '{{ run_id }}' AS run_id,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders WHERE o_orderdate >= TIMESTAMP '{{ start_date }} 00:00:00'""".stripMargin)

  /** user-defined {% macro %} + {% for %}/loop control flow (reference
    * jinja.go:37-68 user macros): the macro expands to a portable CASE
    * bucketing expression shared by both engines. */
  val userMacro: OQ = macroQ("macro_user_defined",
    """{% macro price_bucket(col, bounds) -%}
      |CASE{% for b in bounds %} WHEN {{ col }} < {{ b }} THEN {{ loop.index0 }}{% endfor %} ELSE -1 END
      |{%- endmacro %}
      |SELECT {{ price_bucket('o_totalprice', [50000, 150000, 300000]) }} AS bucket,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY 1""".stripMargin)

  /** slugify renders at template time into an identifier-safe literal;
    * the oracle pins the expansion (digit-leading names get a '_' guard). */
  val slugifyQ: OQ = macroQ("macro_slugify",
    """SELECT '{{ slugify("Data Team's Report #1") }}' AS slug,
      |  '{{ slugify("2024 Q1 Revenue") }}' AS digit_led,
      |  CAST(count(*) AS BIGINT) AS n FROM region""".stripMargin)

  /** dedup_exact macro — the asset-surface face of the engine's exact-dedup
    * operator ([[graft.ops.Dedup.exact]]): the rendered Spark SQL must
    * reproduce the SAME clusters the Scala operator (and its DuckDB oracle,
    * `dedup_exact`) produce. */
  val dedupExactMacro: OQ = macroQ("macro_dedup_exact",
    """SELECT content_hash, keep_id, n_docs FROM (
      |{{ dedup_exact('documents') }}
      |) z""".stripMargin,
    duck = Some(
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
        |  min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin))

  /** stratified_split macro — deterministic md5-bucket train/valid/test
    * tagging ([[graft.ops.Sampling.split]]); checked via the per-(split,
    * lang) histogram like the operator's own `sample_split` key. */
  val stratifiedSplitMacro: OQ = macroQ("macro_stratified_split",
    """SELECT split, lang, count(*) AS n FROM (
      |{{ stratified_split('documents') }}
      |) z GROUP BY 1, 2""".stripMargin,
    duck = Some {
      val b = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
      s"""SELECT CASE WHEN $b < 80 THEN 'train'
         |            WHEN $b < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |  lang, count(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin
    })

  /** token_chunk macro — the training-window chunker
    * ([[graft.ops.TextAnalysis.chunk]]) at 64/16; the DuckDB replay is the
    * operator's own `text_chunk` oracle shape. */
  val tokenChunkMacro: OQ = macroQ("macro_token_chunk",
    """SELECT doc_id, chunk_id, chunk_text, n_tokens FROM (
      |{{ token_chunk('documents', 'doc_id', 'text', 64, 16) }}
      |) z""".stripMargin,
    duck = Some(
      """WITH d AS (SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
        |toks AS (SELECT doc_id, string_split(norm, ' ') AS w FROM d
        |  WHERE coalesce(norm, '') <> ''),
        |st AS (SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 48)) AS s
        |  FROM toks)
        |SELECT doc_id, CAST(s / 48 AS INT) AS chunk_id,
        |  array_to_string(list_slice(w, s + 1, s + 64), ' ') AS chunk_text,
        |  CAST(len(list_slice(w, s + 1, s + 64)) AS BIGINT) AS n_tokens
        |FROM st""".stripMargin))

  val all: Seq[OQ] = Seq(arithmetic, pivot, dedup, widthBucket, haversine, userMacro,
    dateSpine, series, urls, contextVars, slugifyQ,
    dedupExactMacro, stratifiedSplitMacro, tokenChunkMacro)
}
