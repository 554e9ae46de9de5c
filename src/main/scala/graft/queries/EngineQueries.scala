package graft.queries

import org.apache.spark.sql.functions._
import graft.diff.DataDiff
import graft.exec.PipelineRunner
import graft.lineage.Lineage
import graft.materialize.SessionCatalogWarehouse
import graft.model._
import graft.semantic.Semantic
import graft.sources.Seeds
import graft.streaming.Streams

/** Oracle-checked runs of the remaining engine surfaces: semantic layer,
  * lineage, data-diff, seeds, the full pipeline runner, and streaming. */
object EngineQueries {

  // ---- semantic layer -----------------------------------------------------

  private val semanticModel = Semantic.Model(
    table = "orders",
    dimensions = Seq(
      Semantic.Dimension("status", "o_orderstatus"),
      Semantic.Dimension("priority", "o_orderpriority"),
      Semantic.Dimension("order_month", "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING)")),
    metrics = Seq(
      Semantic.Metric("order_count", "COUNT(1)"),
      Semantic.Metric("revenue", "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"),
      Semantic.Metric("big_orders", "COUNT(1)", filter = Some("o_totalprice > 250000")),
      Semantic.Metric("avg_order_value", "{revenue} / {order_count}"),
      // running totals accumulate over an EXACT base (bigint) — double
      // running sums are not bit-stable across engines (DuckDB's windowed
      // SUM uses segment trees, so the accumulation order differs)
      Semantic.Metric("running_orders", "{order_count}",
        window = Some(Semantic.WindowSpec("running_total", orderBy = "order_month"))),
      Semantic.Metric("prev_month_revenue", "{revenue}",
        window = Some(Semantic.WindowSpec("lag", orderBy = "order_month"))),
      Semantic.Metric("revenue_rank", "{revenue}",
        window = Some(Semantic.WindowSpec("rank", orderBy = "order_month"))),
      Semantic.Metric("pct_of_orders", "{order_count}",
        window = Some(Semantic.WindowSpec("percent_of_total", orderBy = "order_month")))),
    segments = Map("fulfilled" -> "o_orderstatus = 'F'"),
    name = "orders_model",
    joins = Seq(Semantic.Join("customers", "many_to_one", foreignKey = "o_custkey")))

  /** Joined dimension model (reference semantic-engine joins,
    * model.go:22-29 + graph.go fromSQL). */
  private val customerModel = Semantic.Model(
    table = "customer", name = "customers", primaryKey = "c_custkey",
    dimensions = Seq(
      Semantic.Dimension("segment", "c_mktsegment"),
      Semantic.Dimension("name", "c_name")),
    metrics = Nil)

  private val semanticModels = Map("customers" -> customerModel)

  /** simple path: dims + plain/derived/filtered metrics + dim & metric filters. */
  val semanticSimple: OQ = {
    val sql = Semantic.generateSql(semanticModel, Semantic.Query(
      dimensions = Seq("status", "priority"),
      metrics = Seq("order_count", "revenue", "big_orders", "avg_order_value"),
      filters = Seq(
        Semantic.Filter("priority", "not_in", Seq("5-LOW")),
        Semantic.Filter("order_count", "gt", Seq("5")))))
    OQ.shared("semantic_simple", sql)
  }

  /** segment + between + sort + limit. */
  val semanticSegment: OQ = {
    val sql = Semantic.generateSql(semanticModel, Semantic.Query(
      dimensions = Seq("order_month"),
      metrics = Seq("order_count", "revenue"),
      filters = Seq(Semantic.Filter("order_month", "between", Seq("1996-01-01", "1998-12-31"))),
      segments = Seq("fulfilled"),
      sort = Seq("order_month" -> "asc"),
      limit = Some(24)))
    OQ.shared("semantic_segment", sql)
  }

  /** wrapped path: window metrics (running_total, lag, rank, percent_of_total).
    * DuckDB widens windowed SUM(BIGINT) to HUGEINT, so its side casts back. */
  val semanticWindow: OQ = {
    val sql = Semantic.generateSql(semanticModel, Semantic.Query(
      dimensions = Seq("order_month"),
      metrics = Seq("revenue", "running_orders", "prev_month_revenue",
        "revenue_rank", "pct_of_orders")))
    val runningExpr = "SUM(base.order_count) OVER (ORDER BY base.order_month ROWS UNBOUNDED PRECEDING)"
    OQ.split("semantic_window", sql,
      sql.replace(s"$runningExpr AS running_orders",
        s"CAST($runningExpr AS BIGINT) AS running_orders"))
  }

  /** joined path: many_to_one dimension from the customers model — base
    * grain preserved (fan-out-safe), LEFT JOIN on fk = target pk, qualified
    * refs, sanitized output aliases. */
  val semanticJoin: OQ = {
    val sql = Semantic.generateSql(semanticModel, Semantic.Query(
      dimensions = Seq("status", "customers.segment"),
      metrics = Seq("order_count", "revenue", "big_orders"),
      filters = Seq(Semantic.Filter("customers.segment", "not_in", Seq("FURNITURE"))),
      segments = Seq("fulfilled")), semanticModels)
    OQ.shared("semantic_join", sql)
  }

  // ---- lineage ------------------------------------------------------------

  private val lineageSql =
    """SELECT n_name AS nation,
      |  SUM(l_extendedprice * (1 - l_discount)) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** Column lineage of a 4-table join — the expected edges are static, so the
    * oracle is a VALUES literal. */
  val lineageColumns: OQ = OQ.df("lineage_column_level",
    (s, _) => {
      import s.implicits._
      val l = Lineage.columnLineage(s, lineageSql)
      val rows = l.columns.map(c =>
        (c.column, c.upstreams.map(u => s"${u.table}.${u.column}").mkString(","))) ++
        Seq(("__non_selected__", l.nonSelected.map(u => s"${u.table}.${u.column}").mkString(",")))
      rows.toDF("out_column", "upstreams")
    },
    """SELECT * FROM (VALUES
      |  ('nation', 'nation.n_name'),
      |  ('revenue', 'lineitem.l_discount,lineitem.l_extendedprice'),
      |  ('n_items', ''),
      |  ('__non_selected__', 'customer.c_custkey,customer.c_nationkey,lineitem.l_orderkey,nation.n_nationkey,orders.o_custkey,orders.o_orderdate,orders.o_orderkey')
      |) t(out_column, upstreams)""".stripMargin)

  /** UsedTables (auto-dependency inference input). */
  val lineageUsedTables: OQ = OQ.df("lineage_used_tables",
    (s, _) => {
      import s.implicits._
      Lineage.usedTables(s, lineageSql).toDF("table_name")
    },
    "SELECT * FROM (VALUES ('customer'), ('lineitem'), ('nation'), ('orders')) t(table_name)")

  // ---- data-diff profile ---------------------------------------------------

  val diffProfile: OQ = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, 'numeric' AS type_class, stat, value FROM (
         |  SELECT 'count' AS stat, CAST(count($c) AS VARCHAR) AS value FROM customer UNION ALL
         |  SELECT 'null_count', CAST(CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'min', CAST(CAST(min($c) AS DOUBLE) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'max', CAST(CAST(max($c) AS DOUBLE) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'avg', CAST(round(avg(CAST($c AS DOUBLE)), 3) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'sum', CAST(round(sum(CAST($c AS DOUBLE)), 3) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'stddev', CAST(round(stddev(CAST($c AS DOUBLE)), 3) AS VARCHAR) FROM customer) s""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col_name, 'string' AS type_class, stat, value FROM (
         |  SELECT 'count' AS stat, CAST(count($c) AS VARCHAR) AS value FROM customer UNION ALL
         |  SELECT 'null_count', CAST(CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'distinct', CAST(count(DISTINCT $c) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'min_length', CAST(min(length($c)) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'max_length', CAST(max(length($c)) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'avg_length', CAST(round(avg(CAST(length($c) AS DOUBLE)), 3) AS VARCHAR) FROM customer UNION ALL
         |  SELECT 'empty', CAST(CAST(sum(CASE WHEN $c = '' THEN 1 ELSE 0 END) AS BIGINT) AS VARCHAR) FROM customer) s""".stripMargin
    OQ.df("diff_profile",
      (s, _) => DataDiff.profileDf(s, "customer"),
      Seq(num("c_custkey"), str("c_name"), num("c_nationkey"), num("c_acctbal"),
        str("c_mktsegment"),
        "SELECT '*' AS col_name, 'table' AS type_class, 'row_count' AS stat, CAST(count(*) AS VARCHAR) AS value FROM customer")
        .mkString("\nUNION ALL\n"))
  }

  /** Distribution drift (PSI) between two corpus snapshots — even/odd
    * doc_id halves over n_chars, fixed 200-char buckets. Per-bucket rows,
    * so no float-summation-order dependence; Laplace-smoothed shares. */
  val diffDrift: OQ = OQ.df("diff_distribution_psi",
    (s, _) => {
      val docs = s.table("documents")
      DataDiff.distributionDrift(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "n_chars", bucketWidth = 200.0, nBuckets = 20)
    },
    """WITH a AS (SELECT greatest(least(CAST(floor(n_chars / 200.0) AS BIGINT), 19), 0) AS bucket,
      |    count(*) AS ca FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
      |  GROUP BY 1),
      |b AS (SELECT greatest(least(CAST(floor(n_chars / 200.0) AS BIGINT), 19), 0) AS bucket,
      |    count(*) AS cb FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
      |  GROUP BY 1),
      |na AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
      |nb AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL),
      |j AS (SELECT coalesce(a.bucket, b.bucket) AS bucket,
      |    (coalesce(ca, 0) + 1) / CAST(na.n + 20 AS DOUBLE) AS pa,
      |    (coalesce(cb, 0) + 1) / CAST(nb.n + 20 AS DOUBLE) AS pb
      |  FROM a FULL OUTER JOIN b ON a.bucket = b.bucket, na, nb)
      |SELECT bucket, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
      |  round((pa - pb) * ln(pa / pb), 6) AS psi_contrib
      |FROM j""".stripMargin)

  /** Categorical composition drift — lang shares between the even/odd
    * halves; union-cardinality smoothing. */
  val diffDriftCat: OQ = OQ.df("diff_categorical_psi",
    (s, _) => {
      val docs = s.table("documents")
      DataDiff.categoricalDrift(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "lang")
    },
    """WITH a AS (SELECT lang AS value, count(*) AS ca FROM documents
      |  WHERE doc_id % 2 = 0 AND lang IS NOT NULL GROUP BY 1),
      |b AS (SELECT lang AS value, count(*) AS cb FROM documents
      |  WHERE doc_id % 2 = 1 AND lang IS NOT NULL GROUP BY 1),
      |na AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL),
      |nb AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL),
      |u AS (SELECT coalesce(a.value, b.value) AS value, ca, cb
      |  FROM a FULL OUTER JOIN b ON a.value = b.value),
      |card AS (SELECT count(*) AS c FROM u),
      |j AS (SELECT value,
      |    (coalesce(ca, 0) + 1) / CAST(na.n + card.c AS DOUBLE) AS pa,
      |    (coalesce(cb, 0) + 1) / CAST(nb.n + card.c AS DOUBLE) AS pb
      |  FROM u, na, nb, card)
      |SELECT value, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
      |  round((pa - pb) * ln(pa / pb), 6) AS psi_contrib
      |FROM j""".stripMargin)

  /** Schema-drift monitor promoted to the oracle tier: two deterministic
    * projections of `orders` with one dropped column, one added, and one
    * numeric→string retype — the diff must report exactly those three,
    * sorted classification first (reference data-diff's schema gate,
    * pkg/diff/diff.go). */
  val diffSchema: OQ = OQ.df("diff_schema",
    (s, _) => {
      import s.implicits._
      // explicit casts pin the declared types: the diff must not silently
      // track whatever physical widths the driver regenerates the parquet
      // with (the r8 events-ts class)
      val a = s.table("orders")
        .select(col("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      val b = s.table("orders")
        .select(col("o_orderkey"),
          col("o_orderstatus").cast("string").as("o_orderstatus"),
          col("o_totalprice").cast("string").as("o_totalprice"))
      DataDiff.compareSchemas(a.schema, b.schema)
        .map(d => (d.column, d.kind, d.detail))
        .toDF("column_name", "kind", "detail")
    },
    """SELECT * FROM (VALUES
      |  ('o_custkey', 'only_in_left', 'bigint'),
      |  ('o_orderstatus', 'only_in_right', 'string'),
      |  ('o_totalprice', 'type_class_changed', 'numeric -> string')
      |) t(column_name, kind, detail)""".stripMargin)

  /** Jensen–Shannon drift — the bounded companion to the PSI monitors
    * (total ∈ [0, ln 2], no smoothing constant leaking into the score):
    * lang composition between the even/odd halves, raw shares, the
    * vanished-side term exactly zero. */
  val diffJs: OQ = OQ.df("diff_js_divergence",
    (s, _) => {
      val docs = s.table("documents")
      DataDiff.jsDivergence(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "lang")
    },
    """WITH a AS (SELECT lang AS value, count(*) AS ca FROM documents
      |  WHERE doc_id % 2 = 0 AND lang IS NOT NULL GROUP BY 1),
      |b AS (SELECT lang AS value, count(*) AS cb FROM documents
      |  WHERE doc_id % 2 = 1 AND lang IS NOT NULL GROUP BY 1),
      |na AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL),
      |nb AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL),
      |u AS (SELECT coalesce(a.value, b.value) AS value, ca, cb
      |  FROM a FULL OUTER JOIN b ON a.value = b.value),
      |j AS (SELECT value,
      |    coalesce(ca, 0) / CAST(na.n AS DOUBLE) AS pa,
      |    coalesce(cb, 0) / CAST(nb.n AS DOUBLE) AS pb
      |  FROM u, na, nb)
      |SELECT value, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
      |  round((CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END
      |       + CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END) / 2,
      |    6) AS jsd_contrib
      |FROM j""".stripMargin)

  /** Numeric JSD drift — the distributionDrift bucketing (fixed 200-char
    * clamped buckets over n_chars) feeding the bounded JSD. */
  val diffJsNum: OQ = OQ.df("diff_js_numeric",
    (s, _) => {
      val docs = s.table("documents")
      DataDiff.jsDivergenceNumeric(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "n_chars", bucketWidth = 200.0, nBuckets = 20)
    },
    """WITH a AS (SELECT greatest(least(CAST(floor(n_chars / 200.0) AS BIGINT), 19), 0) AS value,
      |    count(*) AS ca FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
      |  GROUP BY 1),
      |b AS (SELECT greatest(least(CAST(floor(n_chars / 200.0) AS BIGINT), 19), 0) AS value,
      |    count(*) AS cb FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
      |  GROUP BY 1),
      |na AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
      |nb AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL),
      |u AS (SELECT coalesce(a.value, b.value) AS value, ca, cb
      |  FROM a FULL OUTER JOIN b ON a.value = b.value),
      |j AS (SELECT value,
      |    coalesce(ca, 0) / CAST(na.n AS DOUBLE) AS pa,
      |    coalesce(cb, 0) / CAST(nb.n AS DOUBLE) AS pb
      |  FROM u, na, nb)
      |SELECT value, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
      |  round((CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END
      |       + CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END) / 2,
      |    6) AS jsd_contrib
      |FROM j""".stripMargin)

  /** Vocabulary drift — the categorical PSI monitor over the word stream
    * of the even/odd corpus halves (per-word shares + contributions over
    * the union vocabulary). */
  val diffVocab: OQ = OQ.df("diff_vocab_psi",
    (s, _) => {
      val docs = s.table("documents")
      DataDiff.vocabularyDrift(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1))
    },
    """WITH norm AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt FROM documents),
      |wa AS (SELECT unnest(string_split(nt, ' ')) AS value FROM norm WHERE doc_id % 2 = 0),
      |wb AS (SELECT unnest(string_split(nt, ' ')) AS value FROM norm WHERE doc_id % 2 = 1),
      |a AS (SELECT value, count(*) AS ca FROM wa WHERE value <> '' GROUP BY 1),
      |b AS (SELECT value, count(*) AS cb FROM wb WHERE value <> '' GROUP BY 1),
      |u AS (SELECT coalesce(a.value, b.value) AS value, ca, cb
      |  FROM a FULL OUTER JOIN b ON a.value = b.value),
      |t AS (SELECT CAST(sum(coalesce(ca, 0)) AS BIGINT) AS na,
      |    CAST(sum(coalesce(cb, 0)) AS BIGINT) AS nb,
      |    count(*) AS card FROM u),
      |j AS (SELECT value,
      |    (coalesce(ca, 0) + 1) / CAST(t.na + t.card AS DOUBLE) AS pa,
      |    (coalesce(cb, 0) + 1) / CAST(t.nb + t.card AS DOUBLE) AS pb
      |  FROM u, t)
      |SELECT value, round(pa, 6) AS share_a, round(pb, 6) AS share_b,
      |  round((pa - pb) * ln(pa / pb), 6) AS psi_contrib
      |FROM j""".stripMargin)

  /** Keyed row diff — added/removed/changed/unchanged counts plus
    * per-column changed counts between two deterministic mutations of
    * orders (one full-outer join + one aggregation pass). */
  val diffKeyed: OQ = OQ.df("diff_keyed_rows",
    (s, _) => {
      val o = s.table("orders")
      val a = o.where(col("o_orderkey") % 19 =!= 0)
      val b = o.where(col("o_orderkey") % 23 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 3, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 13 === 5, lit("X"))
            .otherwise(col("o_orderstatus")))
      DataDiff.keyedDiff(a, b, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
    },
    """WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |  WHERE o_orderkey % 19 <> 0),
      |b AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 1.0
      |      ELSE o_totalprice END AS o_totalprice,
      |    CASE WHEN o_orderkey % 13 = 5 THEN 'X'
      |      ELSE o_orderstatus END AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 23 <> 0),
      |j AS (SELECT a.o_orderkey AS ak, b.o_orderkey AS bk,
      |    a.o_totalprice AS ap, b.o_totalprice AS bp,
      |    a.o_orderstatus AS ast, b.o_orderstatus AS bst
      |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
      |SELECT
      |  CAST(sum(CASE WHEN ak IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN bk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |    AND (ap IS DISTINCT FROM bp OR ast IS DISTINCT FROM bst)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |    AND ap IS NOT DISTINCT FROM bp AND ast IS NOT DISTINCT FROM bst
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
      |  CAST(sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |    AND ap IS DISTINCT FROM bp THEN 1 ELSE 0 END) AS BIGINT) AS changed_o_totalprice,
      |  CAST(sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |    AND ast IS DISTINCT FROM bst THEN 1 ELSE 0 END) AS BIGINT) AS changed_o_orderstatus
      |FROM j""".stripMargin)

  // ---- seeds ---------------------------------------------------------------

  private val seedCsvPath = "/tmp/graft_seed_demo.csv"

  val seedCsv: OQ = OQ.df("seed_csv",
    (s, _) => {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(seedCsvPath),
        "id,name,price\n1,Widget,499.99\n2,Gadget,899.0\n3,Trinket,49.5\n")
      val asset = Asset(name = "g_seed_demo", assetType = AssetType.Seed,
        parameters = Map("path" -> seedCsvPath),
        columns = Seq(Column("id", "INT"), Column("name", "STRING"), Column("price", "DOUBLE")))
      val wh = new SessionCatalogWarehouse(s)
      wh.drop("g_seed_demo")
      wh.createOrReplace("g_seed_demo", Seeds.load(s, asset, "/tmp"))
      s.table("g_seed_demo")
    },
    s"""SELECT CAST(id AS INT) AS id, CAST(name AS STRING) AS name, CAST(price AS DOUBLE) AS price
       |FROM read_csv_auto('$seedCsvPath')""".stripMargin)

  // ---- full pipeline end-to-end ---------------------------------------------

  /** The whole engine in one query: a 4-asset pipeline (SQL staging →
    * aggregate with column+custom checks → sensor → summary) scheduled
    * concurrently; output is the final table. */
  val pipelineE2e: OQ = OQ.df("pipeline_end_to_end",
    (s, _) => {
      val p = Pipeline(name = "e2e", concurrency = 4, assets = Seq(
        Asset(name = "g_e2e_stg",
          content = """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
                      |FROM orders WHERE o_orderdate < TIMESTAMP '{{ var.cutoff }} 00:00:00'""".stripMargin,
          materialization = Materialization(MaterializationType.Table, Some(Strategy.CreateReplace))),
        Asset(name = "g_e2e_gate", assetType = AssetType.SensorQuery,
          content = "SELECT count(*) FROM g_e2e_stg",
          upstreams = Seq(Upstream("g_e2e_stg"))),
        Asset(name = "g_e2e_agg",
          content = """SELECT o_orderstatus,
                      |  COUNT(*) AS n_orders,
                      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
                      |FROM g_e2e_stg GROUP BY o_orderstatus""".stripMargin,
          upstreams = Seq(Upstream("g_e2e_stg"), Upstream("g_e2e_gate")),
          materialization = Materialization(MaterializationType.Table, Some(Strategy.CreateReplace)),
          columns = Seq(
            Column("o_orderstatus", "STRING", checks = Seq(ColumnCheck("not_null"), ColumnCheck("unique"))),
            Column("n_orders", "BIGINT", checks = Seq(ColumnCheck("positive")))),
          customChecks = Seq(CustomCheck("has_revenue",
            "SELECT count(*) FROM g_e2e_agg WHERE revenue <= 0", value = Some(0)))),
        Asset(name = "g_e2e_summary",
          content = """SELECT count(*) AS n_statuses,
                      |  CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
                      |FROM g_e2e_agg""".stripMargin,
          upstreams = Seq(Upstream("g_e2e_agg")),
          materialization = Materialization(MaterializationType.Table, Some(Strategy.CreateReplace)))),
        variables = Map("cutoff" -> "2000-01-01"))
      Seq("g_e2e_stg", "g_e2e_agg", "g_e2e_summary").foreach(t =>
        new SessionCatalogWarehouse(s).drop(t))
      val results = new PipelineRunner(s).run(p)
      val failed = results.filter(_._2.status != graft.exec.Scheduler.Succeeded)
      require(failed.isEmpty, s"pipeline failures: ${failed.keys.mkString(", ")}")
      s.table("g_e2e_summary")
    },
    """WITH stg AS (SELECT o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'),
      |agg AS (SELECT o_orderstatus,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |  FROM stg GROUP BY o_orderstatus)
      |SELECT count(*) AS n_statuses,
      |  CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |FROM agg""".stripMargin)

  // ---- streaming -------------------------------------------------------------

  /** Structured Streaming tumbling-window aggregation over the events table
    * via the PRODUCTION path: append mode + watermark into a catalog table.
    * Append emits only watermark-finalized windows — end ≤ max observed
    * event time − watermark delay — so the oracle applies the same cutoff. */
  val streamWindow: OQ = OQ.df("stream_window_counts",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_sink")
      val agg = Streams.windowedCounts(Streams.eventStream(s, s"$dir/events.parquet"))
      // fresh checkpoint: the oracle drops the sink and wants a full replay
      Streams.runAppendToTable(s, agg, "g_stream_sink",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-oracle-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
    },
    """WITH w AS (
      |  SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300) AS TIMESTAMP) AS wstart,
      |    event_type, value, CAST(ts AS TIMESTAMP) AS tss
      |  FROM events)
      |SELECT CAST(wstart AS STRING) AS window_start, event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM w
      |WHERE wstart + INTERVAL 5 MINUTE <= (SELECT max(tss) FROM w) - INTERVAL 10 MINUTE
      |GROUP BY 1, 2""".stripMargin)

  /** Streaming drift monitor: per-window event-type composition vs a
    * DECLARED reference mix, finished as PSI contributions over the
    * finalized window sink. Undeclared values hit the epsilon floor and
    * register strongly. Same append-mode watermark cutoff as
    * stream_window_counts; the oracle replays the windows in SQL. */
  val streamDrift: OQ = OQ.df("stream_drift_psi",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_drift_sink")
      val comp = Streams.windowedComposition(
        Streams.eventStream(s, s"$dir/events.parquet"))
      val sink = Streams.runAppendToTable(s, comp, "g_stream_drift_sink",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-drift-cp").toString))
      Streams.driftPsiFinish(sink,
        Map("view" -> 0.6, "click" -> 0.25, "purchase" -> 0.1))
        .select(col("window_start").cast("string").as("window_start"),
          col("value"), col("n"), col("share"), col("psi_contrib"))
    },
    """WITH w AS (
      |  SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300) AS TIMESTAMP) AS wstart,
      |    event_type, CAST(ts AS TIMESTAMP) AS tss
      |  FROM events),
      |f AS (SELECT wstart, event_type AS value, count(*) AS n FROM w
      |  WHERE wstart + INTERVAL 5 MINUTE <= (SELECT max(tss) FROM w) - INTERVAL 10 MINUTE
      |  GROUP BY 1, 2),
      |t AS (SELECT wstart, CAST(sum(n) AS BIGINT) AS nn, count(*) AS card
      |  FROM f GROUP BY 1),
      |j AS (SELECT f.wstart, value, CAST(n AS BIGINT) AS n,
      |    (n + 1) / CAST(nn + card AS DOUBLE) AS p,
      |    CASE value WHEN 'view' THEN 0.6 WHEN 'click' THEN 0.25
      |      WHEN 'purchase' THEN 0.1 ELSE 0.000001 END AS r
      |  FROM f JOIN t ON f.wstart = t.wstart)
      |SELECT CAST(wstart AS STRING) AS window_start, value, n,
      |  round(p, 6) AS share, round((p - r) * ln(p / r), 6) AS psi_contrib
      |FROM j""".stripMargin)

  /** Stream–static enrichment: the event stream broadcast-joined to the
    * customer dimension per micro-batch, windowed revenue per market
    * segment; events without a dimension row keep a NULL segment (left
    * join). Same append-mode watermark cutoff as stream_window_counts. */
  val streamEnriched: OQ = OQ.df("stream_enriched_counts",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_enriched_sink")
      val dim = s.table("customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      val agg = Streams.enrichedWindowedCounts(
        Streams.eventStream(s, s"$dir/events.parquet"), dim, "user_id", "segment")
      Streams.runAppendToTable(s, agg, "g_stream_enriched_sink",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-enrich-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("segment"), col("n"), col("total_value"))
    },
    """WITH w AS (
      |  SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300) AS TIMESTAMP) AS wstart,
      |    c.c_mktsegment AS segment, value, CAST(ts AS TIMESTAMP) AS tss
      |  FROM events LEFT JOIN customer c ON events.user_id = c.c_custkey)
      |SELECT CAST(wstart AS STRING) AS window_start, segment, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM w
      |WHERE wstart + INTERVAL 5 MINUTE <= (SELECT max(tss) FROM w) - INTERVAL 10 MINUTE
      |GROUP BY 1, 2""".stripMargin)

  /** Stateful streaming dedup over a deliberately DOUBLED source (every
    * event replayed once — the at-least-once broker shape): the sink must
    * contain each event exactly once, pinned per event_type against the
    * batch distinct. */
  val streamDedup: OQ = OQ.df("stream_dedup_counts",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_dedup_sink")
      val deduped = Streams.dedupedEvents(
        Streams.eventStream(s, s"$dir/events.parquet", copies = 2))
      Streams.runAppendToTable(s, deduped, "g_stream_dedup_sink",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-dedup-cp").toString))
      s.table("g_stream_dedup_sink")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
    },
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin)

  /** Streaming ingestion dedup against a static corpus: documents stream in
    * REPLAYED TWICE (at-least-once source); half the corpus is already
    * known (md5 doc_id bucket < 50). The sink must hold each novel content
    * fingerprint exactly once — checked as (count, total normalized chars)
    * since exact-duplicate groups make row identity nondeterministic. */
  val streamCorpusDedup: OQ = {
    val duckBucket = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    OQ.df("stream_corpus_dedup",
      (s, dir) => {
        s.sql("DROP TABLE IF EXISTS g_stream_corpus_sink")
        val b = graft.ops.Sampling.hashBucket(col("doc_id"))
        val corpus = s.table("documents").where(b < 50)
        val incoming = Streams.docStream(s, s"$dir/documents.parquet", copies = 2)
          .where(graft.ops.Sampling.hashBucket(col("doc_id")) >= 50)
        val fresh = Streams.dedupAgainstCorpus(incoming, corpus)
        Streams.runAppendToTable(s, fresh, "g_stream_corpus_sink",
          checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-corpusdedup-cp").toString))
        s.table("g_stream_corpus_sink")
          .agg(count(lit(1)).as("n_new_docs"),
            sum(length(graft.ops.TextAnalysis.normText(col("text"))))
              .cast("long").as("total_norm_chars"))
      },
      s"""WITH nt AS (SELECT md5($norm) AS h, len($norm) AS l, $duckBucket AS b
         |  FROM documents),
         |corpus AS (SELECT DISTINCT h FROM nt WHERE b < 50),
         |novel AS (SELECT h, min(l) AS l FROM nt WHERE b >= 50 GROUP BY 1),
         |fresh AS (SELECT n.h, n.l FROM novel n
         |  LEFT JOIN corpus c USING (h) WHERE c.h IS NULL)
         |SELECT count(*) AS n_new_docs,
         |  CAST(sum(l) AS BIGINT) AS total_norm_chars FROM fresh""".stripMargin)
  }

  /** The text battery runs UNCHANGED on a document stream: the Gopher rule
    * gate is a pure projection (its zero-exchange property is PlanSpec-
    * pinned on the batch side), so the same expressions gate each streaming
    * micro-batch at scan speed — no state, no shuffle before the sink. The
    * oracle replays identical gating over the batch table; parity proves
    * stream and batch curation agree verdict-for-verdict. */
  val streamQualityGate: OQ = {
    val stops = graft.ops.TextAnalysis.Stopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    OQ.df("stream_quality_gate",
      (s, dir) => {
        s.sql("DROP TABLE IF EXISTS g_stream_gate_sink")
        val incoming = Streams.docStream(s, s"$dir/documents.parquet")
        val gated = graft.ops.TextAnalysis.gopherFilter(incoming)
          .select(col("doc_id"), col("lang"), col("passes_gopher"))
        Streams.runAppendToTable(s, gated, "g_stream_gate_sink",
          checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-gate-cp").toString))
        s.table("g_stream_gate_sink")
          .groupBy("lang", "passes_gopher")
          .agg(count(lit(1)).cast("long").as("n"))
      },
      s"""WITH w AS (SELECT doc_id, lang, text, string_split($norm, ' ') AS ws FROM documents),
         |m AS (SELECT doc_id, lang, len(ws) AS n_words,
         |  round(CAST(list_aggregate(list_transform(ws, x -> len(x)), 'sum') AS DOUBLE) / len(ws), 6) AS mwl,
         |  len(list_filter(ws, x -> list_contains($stops, x))) AS nsh,
         |  round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws), 6) AS af,
         |  round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) / len(ws), 6) AS sr
         |  FROM w)
         |SELECT lang,
         |  ((n_words BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
         |    AND nsh >= 2 AND af >= 0.8 AND sr <= 0.1) AS passes_gopher,
         |  count(*) AS n
         |FROM m GROUP BY 1, 2""".stripMargin)
  }

  /** Complete sessionization of a file feed: EVERY event must land in
    * exactly one emitted visit (the oracle is total batch sessionization —
    * same `>` gap rule as rel_sessionize — so a stranded open visit fails
    * the hash). The replay routes through the hot-key-safe sort-based path
    * (one AvailableNow batch = the whole input, so the stateful fold would
    * buffer a hot user's full history on one task); the custom-state
    * streaming operator itself is parity-pinned against this exact result
    * in EngineSpec ("incremental and batch sessionizers agree"). */
  val streamVisits: OQ = OQ.df("stream_user_visits",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_visits")
      val visits = Streams.userVisitsComplete(s, s"$dir/events.parquet")
      Streams.runAppendToTable(s, visits.toDF(), "g_stream_visits",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-visits-cp").toString))
      s.table("g_stream_visits")
    },
    """WITH e AS (SELECT user_id, ts, event_id,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts, cents,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id, count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents,
      |  epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us
      |FROM s GROUP BY user_id, sid""".stripMargin)

  /** Streaming windowed heavy hitters end-to-end: the bounded-state
    * Misra–Gries trend detector over weekly event windows. Item =
    * floor(sqrt(user_id % 100)) — a SCALE-FREE skew (item j carries
    * (2j+1)% of the stream at every SF), so a fixed phi stays
    * non-degenerate as the data grows. In the oracle configuration
    * (shards=1, k=20 ≥ 10 distinct items) the summary never decrements,
    * so counts are exact and order-independent — the adversarial
    * high-cardinality path (decrements, superset guarantee, count
    * bounds) is witness-tested in EngineSpec. */
  val streamHeavyHitters: OQ = OQ.df("stream_heavy_hitters",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_hh")
      val item = floor(sqrt(col("user_id") % 100)).cast("long").cast("string")
      // shards = 1 pins the exact, order-independent configuration the
      // hash-matched oracle needs (the production default is auto/per-core)
      val hits = Streams.streamingHeavyHittersComplete(
        s, s"$dir/events.parquet", item, phi = 0.05, shards = 1)
      Streams.runAppendToTable(s, hits.toDF(), "g_stream_hh",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-hh-cp").toString))
      s.table("g_stream_hh").selectExpr(
        "window_id", "item", "CAST(n_item AS BIGINT) AS n_item")
    },
    """WITH e AS (SELECT epoch_us(ts) // 604800000000 AS window_id,
      |  CAST(CAST(floor(sqrt(user_id % 100)) AS BIGINT) AS VARCHAR) AS item
      |  FROM events),
      |t AS (SELECT window_id, count(*) AS n FROM e GROUP BY 1),
      |c AS (SELECT window_id, item, count(*) AS n_item FROM e GROUP BY 1, 2)
      |SELECT c.window_id, c.item, CAST(c.n_item AS BIGINT) AS n_item
      |FROM c JOIN t USING (window_id)
      |WHERE c.n_item >= CAST(ceil(0.05 * t.n) AS BIGINT)""".stripMargin)

  /** Streaming windowed top-k: the 5 highest-value events per weekly
    * window, computed with bounded per-(window, shard) state (k entries
    * per shard) and finished exact by the bounded-heap groupTopK over the
    * per-shard candidates. Multi-shard ON: the oracle pins that the
    * shard-union superset + final reduction equals the plain window rank. */
  val streamTopK: OQ = OQ.df("stream_window_topk",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_topk")
      val hits = Streams.streamingTopKComplete(
        s, s"$dir/events.parquet", col("event_id"), col("value"), k = 5)
      Streams.runAppendToTable(s, hits.toDF(), "g_stream_topk",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-tk-cp").toString))
      // tie-break on the STRING id — the same total order the shard heaps
      // used, so the shard-union superset provably contains these rows
      graft.ops.Sampling.groupTopK(s.table("g_stream_topk"),
          Seq("window_id"), Seq((-col("score")).as("ns"), col("id").as("i")), 5)
        .selectExpr("window_id", "CAST(id AS BIGINT) AS event_id", "score")
    },
    """WITH e AS (SELECT epoch_us(ts) // 604800000000 AS window_id,
      |  event_id, value FROM events),
      |r AS (SELECT window_id, event_id, value,
      |  row_number() OVER (PARTITION BY window_id
      |    ORDER BY value DESC, CAST(event_id AS VARCHAR)) AS rn FROM e)
      |SELECT window_id, event_id, value AS score FROM r WHERE rn <= 5""".stripMargin)

  /** Streaming SCD2 as-of enrichment: a two-version dimension derived from
    * customer (segment flips to `seg+` at 2024-01-16), each event joined
    * to the version valid AT ITS OWN EVENT TIME, rolled up per finalized
    * window — events before the flip must count under the OLD segment
    * even though the dimension has advanced, the property a
    * current-snapshot lookup gets wrong. Same append-mode watermark
    * cutoff as stream_window_counts. */
  val streamScd2: OQ = OQ.df("stream_scd2_enrich",
    (s, dir) => {
      s.sql("DROP TABLE IF EXISTS g_stream_scd2_sink")
      val cust = s.table("customer")
        .select(col("c_custkey").cast("long").as("cust_id"),
          col("c_mktsegment").cast("string").as("seg"))
      val mid = lit("2024-01-16 00:00:00").cast("timestamp")
      val dim = cust.select(col("cust_id"), col("seg").as("segment"),
          lit("1970-01-01 00:00:00").cast("timestamp").as("valid_from"),
          mid.as("valid_to"))
        .unionByName(cust.select(col("cust_id"),
          concat(col("seg"), lit("+")).as("segment"),
          mid.as("valid_from"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("valid_to")))
      val agg = Streams.scd2EnrichedCounts(
        Streams.eventStream(s, s"$dir/events.parquet"), dim,
        joinKey = "user_id", dimKey = "cust_id", attr = "segment")
      Streams.runAppendToTable(s, agg, "g_stream_scd2_sink",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-scd2-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("segment"), col("n"))
    },
    """WITH w AS (SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300) AS TIMESTAMP) AS wstart,
      |    user_id, CAST(ts AS TIMESTAMP) AS tss FROM events),
      |d AS (SELECT CAST(c_custkey AS BIGINT) AS cust_id, c_mktsegment AS segment,
      |    TIMESTAMP '1970-01-01 00:00:00' AS vf, TIMESTAMP '2024-01-16 00:00:00' AS vt
      |  FROM customer
      |  UNION ALL SELECT CAST(c_custkey AS BIGINT), c_mktsegment || '+',
      |    TIMESTAMP '2024-01-16 00:00:00', TIMESTAMP '2100-01-01 00:00:00'
      |  FROM customer),
      |j AS (SELECT w.wstart, w.tss, d.segment FROM w LEFT JOIN d
      |  ON w.user_id = d.cust_id AND w.tss >= d.vf AND w.tss < d.vt)
      |SELECT CAST(wstart AS STRING) AS window_start, segment, count(*) AS n
      |FROM j
      |WHERE wstart + INTERVAL 5 MINUTE <= (SELECT max(tss) FROM j) - INTERVAL 10 MINUTE
      |GROUP BY 1, 2""".stripMargin)

  /** Streaming ANN retrieval end-to-end, EXACT-ROUTE pinned: the label-0
    * vectors become a timestamped query stream (ts spread from vec_id —
    * replayable in SQL), routed through a corpus-trained IVF quantizer at
    * nprobe = nlist (probing every list provably covers the corpus), so
    * the full stream path — routing, scoring tier, bounded-heap windowed
    * top-k, append-mode emission — must reproduce the brute-force
    * bipartite rank for every query whose window the watermark closed.
    * BOTH scoring tiers are pinned under the SAME oracle:
    * `stream_ann_topk` forces the join (spill) tier with
    * maxBroadcastBytes = 0 — the 100 TB shape where no executor holds the
    * index — and `stream_ann_topk_broadcast` takes the RAM-resident
    * serving tier (primitive-kernel scoring under a broadcast index). The
    * production nprobe ≪ nlist config is the same code path (recall-gated
    * batch-side in DataOpsSpec). */
  /** Content-keyed one-file staging of the timestamped query-vector feed
    * (the cdc-feed idiom): deterministic, so bench re-runs and the oracle
    * replay share the same feed. Race-safe: the gate is q.parquet itself,
    * which only ever appears via an ATOMIC same-filesystem rename of a
    * fully-written file — a concurrent run either sees it absent (and
    * stages its own identical, content-keyed copy) or sees a complete
    * feed; no reader can observe a partial file, and losers' renames
    * atomically swap identical bytes (open fds keep the old inode).
    * Shared by every streaming-ANN key. */
  private def stageAnnFeed(s: org.apache.spark.sql.SparkSession): String = {
    import java.nio.file.{Files, StandardCopyOption}
    val emb = s.table("embeddings")
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val queries = emb.where(col("label") === 0)
      .select(col("vec_id"), col("embedding"),
        (t0 + make_dt_interval(lit(0), lit(0), lit(0),
          pmod(col("vec_id"), lit(7200)))).as("ts"))
    val sig = s"ann-v1:${emb.inputFiles.toSeq.sorted.mkString(",")}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val feed = java.nio.file.Paths.get(s"/tmp/graft-ann-feed-$key")
    if (!Files.exists(feed.resolve("q.parquet"))) {
      val tmp = Files.createTempDirectory(feed.getParent, "graft-ann-stage")
      queries.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = graft.core.Fs.listDir(tmp)
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.createDirectories(feed)
      Files.move(part, feed.resolve("q.parquet"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      graft.core.Fs.deleteRecursively(tmp)
    }
    feed.toString
  }

  private def annStreamQuery(qname: String, sink: String,
                             maxBroadcastBytes: Long,
                             useIndex: Boolean = false): OQ = OQ.df(qname,
    (s, dir) => {
      s.sql(s"DROP TABLE IF EXISTS $sink")
      val emb = s.table("embeddings")
      val corpus = emb.where(col("label") =!= 0)
      val feed = stageAnnFeed(s)
      val qStream = s.readStream
        .schema(s.read.parquet(feed).schema)
        .parquet(feed)
      // 1-minute windows/watermark: the ts spread is one second per id, so
      // minute-scale horizons keep most query windows below the final
      // watermark at every SF (a 10-minute horizon drops ALL of sf0.01's
      // 499-second spread — an empty result would pass vacuously)
      val cents = graft.ops.Similarity.ivfCentroids(corpus, nlist = 16)
      // the persisted-index serving shape: list assignment read from a
      // saveIndex artifact (stamp-verified) instead of a per-stream-start
      // corpus map — what a 100 TB serving job would do
      val idx =
        if (!useIndex) scala.None
        else {
          graft.ops.Similarity.saveIndex(s, corpus, cents, "g_stream_ann_idx")
          Some(graft.ops.Similarity.loadIndex(s, "g_stream_ann_idx"))
        }
      val hits = Streams.streamingAnnTopK(qStream, corpus, cents,
        k = 5, nprobe = 16, windowLen = "1 minute", watermark = "1 minute",
        prebuiltIndex = idx, maxBroadcastBytes = maxBroadcastBytes)
      Streams.runAppendToTable(s, hits, sink,
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-ann-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("q"), col("b"), col("cos"), col("rank"))
    },
    """WITH el AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |norms AS (SELECT vec_id, sqrt(sum(e*e)) AS nrm FROM el GROUP BY 1),
      |qt AS (SELECT vec_id AS q,
      |    TIMESTAMP '2024-01-01 00:00:00' + (vec_id % 7200) * INTERVAL 1 SECOND AS ts
      |  FROM embeddings WHERE label = 0 AND embedding IS NOT NULL),
      |dots AS (SELECT a.vec_id AS q, b.vec_id AS b, sum(a.e * b.e) AS dot
      |  FROM el a JOIN el b ON a.i = b.i
      |  WHERE a.label = 0 AND b.label <> 0 GROUP BY 1, 2),
      |sims AS (SELECT q, b, round(dot / (nq.nrm * nb.nrm), 6) AS cos
      |  FROM dots JOIN norms nq ON dots.q = nq.vec_id
      |            JOIN norms nb ON dots.b = nb.vec_id),
      |r AS (SELECT q, b, cos,
      |    row_number() OVER (PARTITION BY q ORDER BY cos DESC, b) AS rank
      |  FROM sims),
      |w AS (SELECT q, ts,
      |    CAST(to_timestamp(floor(epoch(ts) / 60) * 60) AS TIMESTAMP) AS wstart
      |  FROM qt)
      |SELECT CAST(w.wstart AS STRING) AS window_start, r.q, r.b, r.cos,
      |  CAST(r.rank AS INT) AS rank
      |FROM r JOIN w ON r.q = w.q
      |WHERE r.rank <= 5
      |  AND w.wstart + INTERVAL 1 MINUTE <= (SELECT max(ts) FROM qt) - INTERVAL 1 MINUTE""".stripMargin)

  val streamAnn: OQ =
    annStreamQuery("stream_ann_topk", "g_stream_ann_sink", maxBroadcastBytes = 0L)
  val streamAnnBroadcast: OQ =
    annStreamQuery("stream_ann_topk_broadcast", "g_stream_ann_bsink",
      maxBroadcastBytes = 256L << 20)
  /** The 100 TB serving composition: a PERSISTED [[graft.ops.Similarity
    * .saveIndex]] artifact feeds the stream (assignment read, never
    * recomputed; pairing stamp verified; the size gate answers from plan
    * stats) AND the packed-list spill tier scores it (gate forced to 0 —
    * the index-too-big-for-any-executor regime). Same full-probe oracle:
    * the loaded assignment is row-identical to the fresh map. */
  val streamAnnIndexed: OQ =
    annStreamQuery("stream_ann_topk_indexed", "g_stream_ann_isink",
      maxBroadcastBytes = 0L, useIndex = true)

  /** STREAMING IVFADC SERVING pin — ADC search over the broadcast
    * PERSISTED PQ-code index, through the streaming window/watermark
    * machinery. The `ann_knn_join_ivfpq_indexed` reduction applied to the
    * stream: zero coarse centroid + m=1 identity codebook trained with
    * full coverage make ADC distances exact squared-L2 and nprobe=1
    * exhaustive, so the whole composition — savePqIndex → load →
    * stamp-verify → stats-gated broadcast → per-(query, cell) distance
    * tables → bounded-heap windowed merge → append-mode emission — must
    * reproduce the brute-force bipartite L2 rank for every
    * watermark-closed window. The production config (real m, nprobe ≪
    * nlist) is the same code path, recall-gated batch-side. */
  private def adcStreamQuery(qname: String, sink: String,
                             maxBroadcastBytes: Long): OQ = OQ.df(qname,
    (s, _) => {
      s.sql(s"DROP TABLE IF EXISTS $sink")
      val emb = s.table("embeddings")
      val corpus = emb.where(col("label") =!= 0)
        .where(col("embedding").isNotNull)
      val zeroCentroid = Array(Array.emptyFloatArray)
      val books = graft.ops.Pq.pqTrain(corpus, m = 1, k = 1 << 17,
        iterations = 0, maxTrainSample = 1 << 17)
      graft.ops.Pq.saveCodebooks(s, books, "g_sadc_books")
      graft.ops.Pq.savePqIndex(s, corpus, zeroCentroid, books, "g_sadc_idx")
      val feed = stageAnnFeed(s)
      val qStream = s.readStream
        .schema(s.read.parquet(feed).schema).parquet(feed)
      val hits = Streams.streamingAnnAdcTopK(qStream,
        graft.ops.Pq.loadPqIndex(s, "g_sadc_idx"), zeroCentroid,
        graft.ops.Pq.loadCodebooks(s, "g_sadc_books"), k = 5, nprobe = 1,
        windowLen = "1 minute", watermark = "1 minute",
        maxBroadcastBytes = maxBroadcastBytes)
      Streams.runAppendToTable(s, hits, sink,
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-adc-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("q"), col("b"), round(col("dist2"), 6).as("dist2"), col("rank"))
    },
    """WITH el AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |qt AS (SELECT vec_id AS q,
      |    TIMESTAMP '2024-01-01 00:00:00' + (vec_id % 7200) * INTERVAL 1 SECOND AS ts
      |  FROM embeddings WHERE label = 0 AND embedding IS NOT NULL),
      |d AS (SELECT a.vec_id AS q, b.vec_id AS b,
      |    sum((a.e - b.e) * (a.e - b.e)) AS d2
      |  FROM el a JOIN el b ON a.i = b.i
      |  WHERE a.label = 0 AND b.label <> 0 GROUP BY 1, 2),
      |r AS (SELECT q, b, d2,
      |    row_number() OVER (PARTITION BY q ORDER BY d2, b) AS rank FROM d),
      |w AS (SELECT q, ts,
      |    CAST(to_timestamp(floor(epoch(ts) / 60) * 60) AS TIMESTAMP) AS wstart
      |  FROM qt)
      |SELECT CAST(w.wstart AS STRING) AS window_start, r.q, r.b,
      |  round(r.d2, 6) AS dist2, CAST(r.rank AS INT) AS rank
      |FROM r JOIN w ON r.q = w.q
      |WHERE r.rank <= 5
      |  AND w.wstart + INTERVAL 1 MINUTE <= (SELECT max(ts) FROM qt) - INTERVAL 1 MINUTE""".stripMargin)

  val streamAnnAdc: OQ =
    adcStreamQuery("stream_ann_adc_topk", "g_stream_adc_sink",
      maxBroadcastBytes = 256L << 20)
  /** The same oracle with the gate forced to 0: the PACKED-CODE spill
    * tier — fold to one (ids, flat codes) row per list, rows-only
    * stream-static join, in-place ann_adc_list_top_k scoring — must
    * produce the identical ADC result. */
  val streamAnnAdcSpill: OQ =
    adcStreamQuery("stream_ann_adc_spill", "g_stream_adcs_sink",
      maxBroadcastBytes = 0L)

  /** STREAMING TWO-STAGE RETRIEVAL pin — ADC shortlist over the persisted
    * code index, exact native-cosine rerank of the survivors, windowed
    * bounded-heap merge. With the degenerate quantizers and a shortlist
    * covering the corpus, stage 1 is provably lossless, so the composed
    * stream must reproduce the exact bipartite COSINE rank — it shares
    * `stream_ann_topk`'s oracle verbatim. */
  private def rerankStreamQuery(qname: String, sink: String, tag: String,
                                maxBroadcastBytes: Long): OQ = OQ.df(qname,
    (s, _) => {
      s.sql(s"DROP TABLE IF EXISTS $sink")
      val emb = s.table("embeddings")
      val corpus = emb.where(col("label") =!= 0)
        .where(col("embedding").isNotNull)
      val zeroCentroid = Array(Array.emptyFloatArray)
      val books = graft.ops.Pq.pqTrain(corpus, m = 1, k = 1 << 17,
        iterations = 0, maxTrainSample = 1 << 17)
      graft.ops.Pq.saveCodebooks(s, books, s"g_${tag}_books")
      graft.ops.Pq.savePqIndex(s, corpus, zeroCentroid, books, s"g_${tag}_idx")
      val feed = stageAnnFeed(s)
      val qStream = s.readStream
        .schema(s.read.parquet(feed).schema).parquet(feed)
      val hits = Streams.streamingAnnRerankTopK(qStream,
        graft.ops.Pq.loadPqIndex(s, s"g_${tag}_idx"), corpus, zeroCentroid,
        graft.ops.Pq.loadCodebooks(s, s"g_${tag}_books"), k = 5,
        shortlist = 1 << 17, nprobe = 1,
        windowLen = "1 minute", watermark = "1 minute",
        maxBroadcastBytes = maxBroadcastBytes)
      Streams.runAppendToTable(s, hits, sink,
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-rr-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("q"), col("b"), col("cos"), col("rank"))
    },
    streamAnn.oracle.get)

  val streamAnnRerank: OQ = rerankStreamQuery("stream_ann_rerank_topk",
    "g_stream_rr_sink", "srr", maxBroadcastBytes = 256L << 20)
  /** The same lossless-shortlist oracle with the gate forced to 0: the
    * composed PACKED-CODE spill shortlist (r16 refused past the gate) +
    * unchanged exact rerank must produce the identical cosine rank. */
  val streamAnnRerankSpill: OQ = rerankStreamQuery("stream_ann_rerank_spill",
    "g_stream_rrs_sink", "srrs", maxBroadcastBytes = 0L)

  /** STREAMING HAMMING NEAR-DUP pin — the crawl-ingest dedup shape over
    * the persisted signature index: 90% of the corpus's replayable
    * synthetic signatures (the `mm_phash_neardup_exact` fixture) are
    * saved to a [[graft.ops.Dedup.saveSignatureIndex]] artifact; the
    * other 10% stream in as timestamped (id, signature) rows and are
    * flagged against the LOADED index — banding under the frozen
    * geometry, exact bit_count verify, windowed multi-band collapse.
    * Uncapped 9-band/63-bit banding is pigeonhole-exact at hamming ≤ 8,
    * so the oracle replays the brute-force cross-hamming join with the
    * same watermark cutoff in SQL. */
  val streamHammingNearDup: OQ = OQ.df("stream_hamming_neardup",
    (s, dir) => {
      import java.nio.file.{Files, StandardCopyOption}
      import graft.ops.{Dedup, Multimodal}
      s.sql("DROP TABLE IF EXISTS g_stream_hnd_sink")
      val media = Multimodal.toMediaTable(s.table("documents"))
      val sigs = media.selectExpr("media_id",
        """CAST(conv(substring(md5(CAST(CAST(media_id % 200 AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT)
          | ^ shiftleft(CAST(1 AS BIGINT),
          |     CAST(CAST(conv(substring(md5(CAST(CAST(media_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 60 AS INT))
          | AS phash""".stripMargin.replace("\n", " "))
      // hash-bucket split, NOT media_id % 10: the synthetic signature
      // groups are media_id % 200 and 200k ≡ 0 (mod 10), so a modular
      // split puts every group WHOLLY in one side — zero cross pairs,
      // a vacuously-passing oracle (caught by the sf0.001 smoke test).
      // The md5 bucket is orthogonal to the group id and DuckDB-replayable.
      val b = graft.ops.Sampling.hashBucket(col("media_id"))
      Dedup.saveSignatureIndex(s, sigs.where(b >= 10),
        "g_hnd_sig_idx", maxHamming = 8, bands = 9, sigBits = 63,
        idCol = "media_id", sigCol = "phash")
      val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
      val feedRows = sigs.where(b < 10)
        .select(col("media_id"), col("phash"),
          (t0 + make_dt_interval(lit(0), lit(0), lit(0),
            pmod(col("media_id"), lit(7200)))).as("ts"))
      // content-keyed one-file staging, atomic-rename gated (the ann-feed
      // idiom): bench re-runs and the oracle replay share the same feed
      // v2: the v1 feed was the modular split that never crossed groups
      val sig = s"hnd-v2:${s.table("documents").inputFiles.toSeq.sorted.mkString(",")}"
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      val feed = java.nio.file.Paths.get(s"/tmp/graft-hnd-feed-$key")
      if (!Files.exists(feed.resolve("q.parquet"))) {
        val tmp = Files.createTempDirectory(feed.getParent, "graft-hnd-stage")
        feedRows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = graft.core.Fs.listDir(tmp)
          .find(_.getFileName.toString.endsWith(".parquet")).get
        Files.createDirectories(feed)
        Files.move(part, feed.resolve("q.parquet"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        graft.core.Fs.deleteRecursively(tmp)
      }
      val inStream = s.readStream
        .schema(s.read.parquet(feed.toString).schema)
        .parquet(feed.toString)
      val flagged = Streams.streamingHammingNearDup(inStream,
        Dedup.loadSignatureIndex(s, "g_hnd_sig_idx"), maxHamming = 8,
        bands = 9, sigBits = 63, idCol = "media_id", sigCol = "phash",
        windowLen = "1 minute", watermark = "1 minute")
      Streams.runAppendToTable(s, flagged, "g_stream_hnd_sink",
        checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-hnd-cp").toString))
        .select(col("window_start").cast("string").as("window_start"),
          col("a"), col("b"), col("hamming"))
    },
    """WITH sig AS (SELECT doc_id AS media_id,
      |    xor(CAST('0x' || substr(md5(CAST(doc_id % 200 AS VARCHAR)), 1, 15) AS BIGINT),
      |        CAST(1 AS BIGINT) << CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 60 AS INT)) AS phash
      |  FROM documents),
      |hb AS (SELECT media_id, phash,
      |    CAST('0x' || substr(md5(CAST(media_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bkt
      |  FROM sig),
      |a AS (SELECT media_id, phash,
      |    TIMESTAMP '2024-01-01 00:00:00' + (media_id % 7200) * INTERVAL 1 SECOND AS ts
      |  FROM hb WHERE bkt < 10),
      |b AS (SELECT media_id, phash FROM hb WHERE bkt >= 10),
      |p AS (SELECT a.media_id AS a, b.media_id AS b,
      |    CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming, a.ts
      |  FROM a JOIN b ON a.media_id <> b.media_id
      |  WHERE bit_count(xor(a.phash, b.phash)) <= 8),
      |w AS (SELECT a, b, hamming,
      |    CAST(to_timestamp(floor(epoch(ts) / 60) * 60) AS TIMESTAMP) AS wstart FROM p)
      |SELECT CAST(wstart AS STRING) AS window_start, a, b, hamming
      |FROM w
      |WHERE wstart + INTERVAL 1 MINUTE <= (SELECT max(ts) FROM a) - INTERVAL 1 MINUTE""".stripMargin)

  /** Streaming histogram quantiles — per finalized 5-minute window, the
    * fixed-grid p50/p95 of event value: the watermarked windowed
    * aggregation keeps only (window × occupied-bucket) counts as state
    * (bounded by the DECLARED grid, not the stream), and the batch finish
    * is the same engine-identical estimator as `sketch_quantile_histogram`
    * — so the oracle replays the whole streaming approximation in SQL. */
  val streamQuantile: OQ = {
    val qsSql = "[CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]"
    OQ.df("stream_quantile_histogram",
      (s, dir) => {
        s.sql("DROP TABLE IF EXISTS g_stream_qh_sink")
        val ev = Streams.eventStream(s, s"$dir/events.parquet")
          .where(col("value").isNotNull)
          .select(col("ts"),
            graft.ops.Sketches.bucketOf(col("value"), 2.0, 256).as("bucket"))
        val comp = Streams.windowedComposition(ev, catCol = "bucket")
        Streams.runAppendToTable(s, comp, "g_stream_qh_sink",
          checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-qh-cp").toString))
        val counts = s.table("g_stream_qh_sink")
          .select(col("window_start").as("grp"),
            col("value").cast("long").as("bucket"), col("n").as("__c"))
        graft.ops.Sketches.quantilesFromCounts(counts, 2.0, Seq(0.5, 0.95))
          .select(col("grp").cast("string").as("window_start"), col("q"),
            col("n").cast("long").as("n"), col("quantile_est"))
      },
      s"""WITH w AS (
         |  SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300) AS TIMESTAMP) AS wstart,
         |    greatest(least(CAST(floor(value / 2.0) AS BIGINT), 255), 0) AS bucket,
         |    CAST(ts AS TIMESTAMP) AS tss
         |  FROM events WHERE value IS NOT NULL),
         |f AS (SELECT wstart, bucket, count(*) AS cnt FROM w
         |  WHERE wstart + INTERVAL 5 MINUTE <= (SELECT max(tss) FROM w) - INTERVAL 10 MINUTE
         |  GROUP BY 1, 2),
         |ww AS (SELECT wstart, bucket, cnt,
         |    sum(cnt) OVER (PARTITION BY wstart ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(cnt) OVER (PARTITION BY wstart) AS n FROM f),
         |qq AS (SELECT unnest($qsSql) AS q),
         |hit AS (SELECT wstart, q, n, bucket, cum, cnt,
         |    row_number() OVER (PARTITION BY wstart, q ORDER BY bucket) AS rn
         |  FROM ww, qq WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
         |SELECT CAST(wstart AS STRING) AS window_start, q, CAST(n AS BIGINT) AS n,
         |  round(CAST(bucket AS DOUBLE) * 2.0 + 2.0 *
         |    ((q * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)),
         |    6) AS quantile_est
         |FROM hit WHERE rn = 1""".stripMargin)
  }

  /** Streaming windowed KMV distinct — unique users per weekly window
    * with bounded per-(window, fingerprint-shard) state (≤ k sorted
    * 60-bit md5 fingerprints each). Multi-shard ON: sharding is BY the
    * fingerprint, so the shard-union is duplicate-free and contains the
    * window's k minima; the bounded-heap groupTopK + (k−1)/θ finish is
    * replayed by the oracle in SQL — at sf0.01 each window holds more
    * distinct users than k, so the checked values are REAL estimates
    * (the portable-sketch property, same as `sketch_distinct_kmv`). */
  val streamKmv: OQ = {
    val k = 64
    OQ.df("stream_distinct_kmv",
      (s, dir) => {
        s.sql("DROP TABLE IF EXISTS g_stream_kmv")
        val cands = Streams.streamingDistinctKmvComplete(
          s, s"$dir/events.parquet", col("user_id"), k = k)
        Streams.runAppendToTable(s, cands.toDF(), "g_stream_kmv",
          checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-kmv-cp").toString))
        val kept = graft.ops.Sampling.groupTopK(s.table("g_stream_kmv"),
          Seq("window_id"), Seq(col("h")), k)
        val est = lit((k - 1).toDouble) /
          (col("__hk").cast("double") / lit(1152921504606846976.0))
        kept.groupBy("window_id")
          .agg(count(lit(1)).as("__c"), max(col("h")).as("__hk"))
          .select(col("window_id"),
            when(col("__c") < k, col("__c"))
              .otherwise(round(est).cast("long")).as("n_distinct_est"),
            (col("__c") < k).as("is_exact"))
      },
      s"""WITH h AS (SELECT DISTINCT epoch_us(ts) // 604800000000 AS window_id,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT window_id, h,
         |    row_number() OVER (PARTITION BY window_id ORDER BY h) AS rn FROM h),
         |kk AS (SELECT window_id, count(*) AS c, max(h) AS hk
         |  FROM r WHERE rn <= $k GROUP BY 1)
         |SELECT window_id,
         |  CASE WHEN c < $k THEN c
         |    ELSE CAST(round(${k - 1}.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0)) AS BIGINT) END AS n_distinct_est,
         |  c < $k AS is_exact
         |FROM kk""".stripMargin)
  }

  /** CDC apply end-to-end: a Debezium-shaped change feed derived from
    * `orders` — snapshot (`r`, seq 0); +100 price update (`u`, seq 2) on
    * keys %7; delete (`d`, seq 3) on keys %13; and a LATE -50 update (`u`,
    * seq 1) on keys %5 — staged as 3 files consumed one per micro-batch
    * (maxFilesPerTrigger=1), so the final batch arrives OUT OF ORDER: its
    * seq-1 changes must neither roll back the seq-2 updates nor resurrect
    * the seq-3 deletes. The oracle replays global last-writer-wins by
    * (seq, op) over the same derived feed in DuckDB. */
  /** The canonical CDC change scenario — ONE definition consumed by both
    * the parquet feed (cdcQuery) and the Debezium-JSON feed
    * (streamCdcDebezium), so the two pipelines and the (separately
    * dialected) cdcOracleSql cannot drift apart silently:
    * snapshot r/seq0; +100 update on %7 (seq 2); delete on %13 (seq 3);
    * LATE -50 update on %5 (seq 1). Each entry: (rows, price, op, seq). */
  private def cdcScenario(base: org.apache.spark.sql.DataFrame)
      : Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column, String, Long)] = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
    Seq(
      (base, col("o_totalprice"), "r", 0L),
      (base.where(col("o_orderkey") % 7 === 0),
        dec(col("o_totalprice")) + dec(lit(100)), "u", 2L),
      (base.where(col("o_orderkey") % 13 === 0), col("o_totalprice"), "d", 3L),
      (base.where(col("o_orderkey") % 5 === 0),
        dec(col("o_totalprice")) - dec(lit(50)), "u", 1L))
  }

  private val cdcOracleSql =
    """WITH ch AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'r' AS op, 0 AS seq
      |    FROM orders
      |  UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) + 100 AS DOUBLE), 'u', 2
      |    FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL SELECT o_orderkey, NULL, NULL, NULL, 'd', 3
      |    FROM orders WHERE o_orderkey % 13 = 0
      |  UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) - 50 AS DOUBLE), 'u', 1
      |    FROM orders WHERE o_orderkey % 5 = 0),
      |last AS (SELECT ch.*, row_number() OVER (
      |    PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn FROM ch)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM last WHERE rn = 1 AND op <> 'd'""".stripMargin

  /** The CDC end-to-end query, parameterized by target asset + writer params
    * so the same feed and oracle prove EVERY [[Streams.CdcStateWriter]]. */
  private def cdcQuery(qname: String, target: String,
                       params: Map[String, String]): OQ = OQ.df(qname,
    (s, _) => {
      import java.nio.file.{Files, StandardCopyOption}
      import org.apache.spark.sql.{Column => SCol, DataFrame}
      s.sql(s"DROP VIEW IF EXISTS $target")
      // the state table is itself a (generation or overlay) view — drop all
      graft.materialize.SessionCatalogWarehouse.dropAny(s, s"${target}__cdc_state")
      val base = s.table("orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      def change(t: (DataFrame, SCol, String, Long)): DataFrame = t match {
        // delete events carry NULL non-key fields (the parquet feed's
        // tombstone shape); everything else the full priced row
        case (rows, _, "d", seq) => rows
          .select(col("o_orderkey"), lit(null).cast("bigint").as("o_custkey"),
            lit(null).cast("string").as("o_orderstatus"),
            lit(null).cast("double").as("o_totalprice"),
            lit("d").as("op"), lit(seq).as("seq"))
        case (rows, price, op, seq) => rows
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            price.cast("double").as("o_totalprice"),
            lit(op).as("op"), lit(seq).as("seq"))
      }
      val Seq(snap, upd2, del3, late1) = cdcScenario(base).map(change)

      // three files, strictly increasing mtimes: FileStreamSource orders by
      // modification time, so AvailableNow + maxFilesPerTrigger=1 yields
      // exactly the batch sequence [snapshot, updates+deletes, late].
      // Staged once per (sf, derivation): the feed is deterministic, so
      // repeated runs (bench min-of-N) reuse the dir, same as eventStream's
      // content-keyed staging; _STAGED gates a torn first staging.
      val sfSig = s"cdc-v2:${s.table("orders").inputFiles.toSeq.sorted.mkString(",")}"
      val sfKey = java.security.MessageDigest.getInstance("MD5")
        .digest(sfSig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      val feed = java.nio.file.Paths.get(s"/tmp/graft-cdc-feed-$sfKey")
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft-cdc-stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = graft.core.Fs.listDir(tmp)
          .find(_.getFileName.toString.endsWith(".parquet")).get
        val dst = feed.resolve(name)
        Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtime))
      }
      val t0 = 1700000000000L // fixed, deterministic staging mtimes
      if (!Files.exists(feed.resolve("_STAGED"))) {
        Files.createDirectories(feed)
        stage(snap, "b0.parquet", t0)
        stage(upd2.unionByName(del3), "b1.parquet", t0 + 60000)
        stage(late1, "b2.parquet", t0 + 120000)
        Files.createFile(feed.resolve("_STAGED"))
      }

      // schema sniffed from the staged feed's own footer (the r8 failure
      // class): the staged files inherit whatever physical types the
      // orders table carries, so a literal schema would silently mis-read
      // if the driver regenerates orders with different widths
      val stream = s.readStream
        .schema(s.read.parquet(feed.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed.toString)
      val wh = new SessionCatalogWarehouse(s)
      val a = Asset(name = target, assetType = AssetType.Ingest,
        columns = Seq(Column("o_orderkey", "BIGINT", primaryKey = true)),
        parameters = params)
      Streams.cdcApply(wh, a, stream).awaitTermination()
      s.table(target)
    },
    cdcOracleSql)

  /** CDC through the DEFAULT writer (overlay: incremental+atomic composed
    * view) — no pins, so the row proves the full default path: the snapshot
    * creates the base, the two wide batches exercise compaction; the
    * localized overlay path is witness-tested in EngineSpec. */
  val streamCdc: OQ = cdcQuery("stream_cdc_apply", "g_cdc_orders", Map.empty)

  /** The same feed through the BUCKETED writer (dynamic partition
    * overwrite): auto-sized bucket count, then the wide-batch rebuild
    * fallback (batches 2/3 touch every bucket under uniform hash). Same
    * oracle — writer choice must never change CDC semantics. */
  val streamCdcBucketed: OQ = cdcQuery("stream_cdc_apply_bucketed",
    "g_cdc_orders_bk", Map("cdc_writer" -> "bucketed"))

  /** Debezium decode end-to-end: the SAME change scenario as
    * stream_cdc_apply, but round-tripped through Debezium-envelope JSON —
    * wrapped (`{"payload": …}`) for even keys, bare for odd, so both
    * converter layouts decode — then LWW-folded. Same oracle: the decode
    * must be information-lossless or the fold hash breaks. */
  val streamCdcDebezium: OQ = OQ.df("stream_cdc_debezium",
    (s, _) => {
      import org.apache.spark.sql.{Column => SCol, DataFrame}
      val base = s.table("orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val recCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      def envelope(t: (DataFrame, SCol, String, Long)): DataFrame = {
        val (rows, price, op, seq) = t
        val withPrice = rows.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), price.cast("double").as("o_totalprice"))
        val rec = struct(recCols.map(col): _*)
        val nullRec = when(lit(false), rec) // typed NULL of the record struct
        val payload = struct(
          (if (op == "d") rec else nullRec).as("before"),
          (if (op == "d") nullRec else rec).as("after"),
          lit(op).as("op"), lit(1700000000000L).as("ts_ms"),
          struct(lit(seq).as("lsn"), lit(1700000000000L).as("ts_ms")).as("source"))
        withPrice.select(
          when(pmod(col("o_orderkey"), lit(2)) === 0,
            to_json(struct(payload.as("payload"))))
            .otherwise(to_json(payload)).as("value"))
      }
      val feed = cdcScenario(base).map(envelope).reduce(_ unionByName _)
      val changes = Streams.debeziumDecode(feed,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      // same associative LWW argmax as cdcApply's per-batch fold (map-side
      // partial agg, no sort) — the decode and the fold fuse into ONE
      // aggregation pass over the envelope stream
      val payload = struct(changes.columns.map(col): _*)
      changes.groupBy("o_orderkey")
        .agg(max_by(payload, struct(col("seq"), col("op"))).as("__w"))
        .select(col("__w.*"))
        .where(col("op") =!= "d")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    },
    // deletes carry the full before-image through the decode, so the fold
    // sees real column values on 'd' rows; they are dropped either way
    cdcOracleSql)

  /** Streaming keys whose IN-FLIGHT aggregation is a k-bounded heap
    * (BoundedTopK inside the windowed state). These execute their stream
    * during OQ.run, so the whole builder must run on a raised CLONE
    * session ([[graft.core.HeapAgg.raisedClone]]) — batch keys are
    * plan-sniffed post-hoc by HeapAgg.maybeRebound instead and need no
    * entry here. */
  val heapRaisedStreaming: Set[String] = Set(
    "stream_ann_topk", "stream_ann_topk_broadcast", "stream_ann_topk_indexed",
    "stream_ann_adc_topk", "stream_ann_adc_spill",
    "stream_ann_rerank_topk", "stream_ann_rerank_spill")

  val all: Seq[OQ] = Seq(semanticSimple, semanticSegment, semanticWindow, semanticJoin,
    lineageColumns, lineageUsedTables, diffProfile, diffDrift, diffDriftCat,
    diffJs, diffJsNum, diffVocab, diffKeyed, diffSchema, seedCsv, pipelineE2e, streamWindow, streamDrift,
    streamDedup, streamEnriched, streamCorpusDedup, streamQualityGate,
    streamHeavyHitters, streamTopK, streamKmv, streamQuantile, streamScd2,
    streamAnn, streamAnnBroadcast, streamAnnIndexed, streamAnnAdc,
    streamAnnAdcSpill, streamAnnRerank, streamAnnRerankSpill,
    streamHammingNearDup, streamCdc, streamCdcBucketed,
    streamCdcDebezium, streamVisits)
}
