package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model._
import graft.materialize.{Materializer, SessionCatalogWarehouse}
import graft.materialize.Materializer.Context

/** Oracle-checked end-to-end runs of every materialization strategy
  * (SURVEY §2.2). Each query builds deterministic initial/incremental slices
  * from `orders`, drives the real [[Materializer.execute]] path twice, and
  * returns the final table state; the DuckDB oracle is the same two-run
  * program expressed as one CTE query.
  *
  * Frozen run timestamps T1/T2 stand in for the reference's FreezeTime
  * (pkg/sqlparser/parser.go:451-461) so SCD2/hub load dates are exact.
  */
object Materializations {

  private val T1 = "2024-01-01 00:00:00"
  private val T2 = "2024-02-01 00:00:00"
  private val MAX = Materializer.ScdMaxTs

  /** Initial load: everything shipped before 1999. */
  private val INIT =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin

  /** Incremental batch: overlap year 1998 (updates) + 1999 onward (inserts),
    * with modified status and price. */
  private val BATCH =
    """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |  o_totalprice + 1000 AS o_totalprice, o_orderdate
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  private def out(tbl: String) =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |  CAST(o_orderdate AS STRING) AS o_orderdate FROM $tbl""".stripMargin

  private def outWrap(inner: String) =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |  CAST(o_orderdate AS STRING) AS o_orderdate FROM ($inner) fin""".stripMargin

  private def tableAsset(name: String, strategy: Strategy,
                         columns: Seq[Column] = Nil,
                         incrementalKey: Option[String] = None,
                         parameters: Map[String, String] = Map.empty,
                         granularity: TimeGranularity = TimeGranularity.Timestamp): Asset =
    Asset(name = name, columns = columns, parameters = parameters,
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(strategy),
        incrementalKey = incrementalKey, timeGranularity = granularity))

  /** Run strategy with INIT then BATCH (or custom slices), return final state. */
  private def twoRun(spark: SparkSession, asset: Asset,
                     q1: String, q2: String,
                     readBack: String): DataFrame = {
    val wh = new SessionCatalogWarehouse(spark)
    wh.drop(asset.name); wh.drop(s"${asset.name}__stage")
    Materializer.execute(wh, asset, q1, Context(now = T1))
    Materializer.execute(wh, asset, q2, Context(now = T2))
    spark.sql(readBack)
  }

  // -------------------------------------------------------------------------

  val view: OQ = OQ.df("mat_view",
    (s, _) => {
      val a = Asset(name = "g_mat_view",
        materialization = Materialization(typ = MaterializationType.View))
      Materializer.execute(new SessionCatalogWarehouse(s), a, INIT, Context(now = T1))
      s.sql(out("g_mat_view"))
    },
    outWrap(INIT))

  val createReplace: OQ = OQ.df("mat_create_replace",
    (s, _) => twoRun(s, tableAsset("g_mat_cr", Strategy.CreateReplace),
      INIT, BATCH, out("g_mat_cr")),
    outWrap(BATCH))

  val append: OQ = OQ.df("mat_append",
    (s, _) => twoRun(s, tableAsset("g_mat_append", Strategy.Append),
      INIT, BATCH, out("g_mat_append")),
    outWrap(s"SELECT * FROM ($INIT) i UNION ALL SELECT * FROM ($BATCH) b"))

  val truncateInsert: OQ = OQ.df("mat_truncate_insert",
    (s, _) => twoRun(s, tableAsset("g_mat_ti", Strategy.TruncateInsert),
      INIT, BATCH, out("g_mat_ti")),
    outWrap(BATCH))

  /** delete+insert keyed on o_custkey: all of a customer's initial rows are
    * replaced when the batch touches that customer. */
  val deleteInsert: OQ = OQ.df("mat_delete_insert",
    (s, _) => twoRun(s, tableAsset("g_mat_di", Strategy.DeleteInsert,
      incrementalKey = Some("o_custkey")), INIT, BATCH, out("g_mat_di")),
    outWrap(
      s"""WITH init AS ($INIT), b AS ($BATCH)
         |SELECT * FROM init WHERE o_custkey NOT IN (SELECT DISTINCT o_custkey FROM b)
         |UNION ALL SELECT * FROM b""".stripMargin))

  /** merge on pk o_orderkey; only o_totalprice is update_on_merge, so matched
    * rows take the new price but keep the old status. */
  val merge: OQ = OQ.df("mat_merge",
    (s, _) => twoRun(s, tableAsset("g_mat_merge", Strategy.Merge,
      columns = Seq(
        Column("o_orderkey", "BIGINT", primaryKey = true),
        Column("o_custkey", "BIGINT"),
        Column("o_orderstatus", "STRING"),
        Column("o_totalprice", "DOUBLE", updateOnMerge = true),
        Column("o_orderdate", "TIMESTAMP"))),
      INIT, BATCH, out("g_mat_merge")),
    outWrap(
      s"""WITH init AS ($INIT), b AS ($BATCH)
         |SELECT i.o_orderkey, i.o_custkey, i.o_orderstatus, b.o_totalprice, i.o_orderdate
         |  FROM init i JOIN b ON i.o_orderkey = b.o_orderkey
         |UNION ALL SELECT i.* FROM init i WHERE i.o_orderkey NOT IN (SELECT o_orderkey FROM b)
         |UNION ALL SELECT b.* FROM b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM init)""".stripMargin))

  /** time_interval on o_orderdate: replace the 1998 window. */
  val timeInterval: OQ = {
    val batch98 =
      """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |  o_totalprice + 1000 AS o_totalprice, o_orderdate
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1998-12-31 23:59:59'""".stripMargin
    OQ.df("mat_time_interval",
      (s, _) => {
        val a = tableAsset("g_mat_tw", Strategy.TimeInterval, incrementalKey = Some("o_orderdate"))
        val wh = new SessionCatalogWarehouse(s)
        wh.drop(a.name); wh.drop(s"${a.name}__stage")
        Materializer.execute(wh, a, INIT, Context(now = T1))
        Materializer.execute(wh, a, batch98,
          Context(now = T2, startTs = "1998-01-01 00:00:00", endTs = "1998-12-31 23:59:59"))
        s.sql(out("g_mat_tw"))
      },
      outWrap(
        s"""WITH init AS ($INIT), b AS ($batch98)
           |SELECT * FROM init
           |WHERE o_orderdate NOT BETWEEN TIMESTAMP '1998-01-01 00:00:00' AND TIMESTAMP '1998-12-31 23:59:59'
           |UNION ALL SELECT * FROM b""".stripMargin))
  }

  /** ddl: declared-schema table creation; surfaced as DESCRIBE output and
    * pinned against the expected schema as a VALUES oracle. */
  val ddl: OQ = OQ.df("mat_ddl",
    (s, _) => {
      val a = tableAsset("g_mat_ddl", Strategy.DDL, columns = Seq(
        Column("id", "BIGINT", nullable = false, primaryKey = true),
        Column("name", "STRING", description = "display name"),
        Column("price", "DECIMAL(10,2)"),
        Column("created_at", "TIMESTAMP")))
      val wh = new SessionCatalogWarehouse(s)
      wh.drop(a.name); wh.drop(s"${a.name}__stage")
      Materializer.execute(wh, a, "", Context(now = T1))
      s.sql("DESCRIBE TABLE g_mat_ddl").selectExpr("col_name", "data_type")
    },
    """SELECT * FROM (VALUES
      |  ('id', 'bigint'), ('name', 'string'),
      |  ('price', 'decimal(10,2)'), ('created_at', 'timestamp')
      |) t(col_name, data_type)""".stripMargin)

  /** scd2_by_column: odd-key prices change in the batch, even-key rows are
    * unchanged, pre-1998 rows vanish; validity windows frozen at T1/T2. */
  val scd2ByColumn: OQ = {
    val batchCase =
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin
    val scdOut =
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS STRING) AS o_orderdate,
        |  CAST(_valid_from AS STRING) AS _valid_from,
        |  CAST(_valid_until AS STRING) AS _valid_until,
        |  _is_current""".stripMargin
    OQ.df("mat_scd2_by_column",
      (s, _) => twoRun(s, tableAsset("g_mat_scd2c", Strategy.SCD2ByColumn,
        columns = Seq(Column("o_orderkey", "BIGINT", primaryKey = true))),
        INIT, batchCase, s"$scdOut FROM g_mat_scd2c"),
      s"""WITH init AS ($INIT), b AS ($batchCase), fin AS (
         |  SELECT i.*, TIMESTAMP '$T1' AS _valid_from, TIMESTAMP '$T2' AS _valid_until, FALSE AS _is_current
         |    FROM init i WHERE i.o_orderkey NOT IN (SELECT o_orderkey FROM b)
         |  UNION ALL
         |  SELECT i.*, TIMESTAMP '$T1', TIMESTAMP '$T2', FALSE
         |    FROM init i JOIN b ON i.o_orderkey = b.o_orderkey WHERE b.o_totalprice <> i.o_totalprice
         |  UNION ALL
         |  SELECT i.*, TIMESTAMP '$T1', TIMESTAMP '$MAX', TRUE
         |    FROM init i JOIN b ON i.o_orderkey = b.o_orderkey WHERE b.o_totalprice = i.o_totalprice
         |  UNION ALL
         |  SELECT b.*, TIMESTAMP '$T2', TIMESTAMP '$MAX', TRUE
         |    FROM b JOIN init i ON i.o_orderkey = b.o_orderkey WHERE b.o_totalprice <> i.o_totalprice
         |  UNION ALL
         |  SELECT b.*, TIMESTAMP '$T2', TIMESTAMP '$MAX', TRUE
         |    FROM b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM init))
         |$scdOut FROM fin""".stripMargin)
  }

  /** scd2_by_time keyed on o_orderdate: odd keys arrive 400 days later
    * (newer → expire+insert), even keys re-arrive unchanged (kept). */
  val scd2ByTime: OQ = {
    val batchT =
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1000 AS o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderdate + INTERVAL 400 DAY ELSE o_orderdate END AS o_orderdate
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-07-01 00:00:00'""".stripMargin
    val scdOut =
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS STRING) AS o_orderdate,
        |  CAST(_valid_from AS STRING) AS _valid_from,
        |  CAST(_valid_until AS STRING) AS _valid_until,
        |  _is_current""".stripMargin
    OQ.df("mat_scd2_by_time",
      (s, _) => twoRun(s, tableAsset("g_mat_scd2t", Strategy.SCD2ByTime,
        columns = Seq(Column("o_orderkey", "BIGINT", primaryKey = true)),
        incrementalKey = Some("o_orderdate")),
        INIT, batchT, s"$scdOut FROM g_mat_scd2t"),
      s"""WITH init AS ($INIT), b AS ($batchT), fin AS (
         |  SELECT i.*, i.o_orderdate AS _valid_from, TIMESTAMP '$T2' AS _valid_until, FALSE AS _is_current
         |    FROM init i WHERE i.o_orderkey NOT IN (SELECT o_orderkey FROM b)
         |  UNION ALL
         |  SELECT i.*, i.o_orderdate, TIMESTAMP '$MAX', TRUE
         |    FROM init i JOIN b ON i.o_orderkey = b.o_orderkey WHERE b.o_orderdate <= i.o_orderdate
         |  UNION ALL
         |  SELECT i.*, i.o_orderdate, b.o_orderdate, FALSE
         |    FROM init i JOIN b ON i.o_orderkey = b.o_orderkey WHERE b.o_orderdate > i.o_orderdate
         |  UNION ALL
         |  SELECT b.*, b.o_orderdate, TIMESTAMP '$MAX', TRUE
         |    FROM b JOIN init i ON i.o_orderkey = b.o_orderkey WHERE b.o_orderdate > i.o_orderdate
         |  UNION ALL
         |  SELECT b.*, b.o_orderdate, TIMESTAMP '$MAX', TRUE
         |    FROM b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM init))
         |$scdOut FROM fin""".stripMargin)
  }

  /** datavault hub over customer business key, two loads (first half, then
    * all) — only new keys insert on run 2, stamped with that run's load_dt. */
  val datavaultHub: OQ = {
    val s1 = "SELECT c_custkey FROM customer WHERE c_custkey < 750"
    val s2 = "SELECT c_custkey FROM customer"
    OQ.df("mat_datavault_hub",
      (s, _) => {
        val a = tableAsset("g_dv_hub", Strategy.DataVaultHub,
          parameters = Map("business_keys" -> "c_custkey"))
        val wh = new SessionCatalogWarehouse(s)
        wh.drop(a.name); wh.drop(s"${a.name}__stage")
        Materializer.execute(wh, a, s1, Context(now = T1))
        Materializer.execute(wh, a, s2, Context(now = T2))
        s.sql("""SELECT g_dv_hub_hk, c_custkey, CAST(load_dt AS STRING) AS load_dt, record_src
                |FROM g_dv_hub""".stripMargin)
      },
      s"""WITH s1 AS (SELECT DISTINCT c_custkey FROM ($s1) x), s2 AS (SELECT DISTINCT c_custkey FROM ($s2) y)
         |SELECT md5(CAST(c_custkey AS STRING)) AS g_dv_hub_hk, c_custkey,
         |       '$T1' AS load_dt, 'graft' AS record_src FROM s1
         |UNION ALL
         |SELECT md5(CAST(c_custkey AS STRING)), c_custkey, '$T2', 'graft'
         |FROM s2 WHERE c_custkey NOT IN (SELECT c_custkey FROM s1)""".stripMargin)
  }

  /** datavault link relating customer-hub and order-hub keys. */
  val datavaultLink: OQ = {
    val src = "SELECT o_custkey, o_orderkey FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"
    OQ.df("mat_datavault_link",
      (s, _) => {
        val a = tableAsset("g_dv_link", Strategy.DataVaultLink,
          parameters = Map("business_keys" -> "o_custkey,o_orderkey"))
        val wh = new SessionCatalogWarehouse(s)
        wh.drop(a.name); wh.drop(s"${a.name}__stage")
        Materializer.execute(wh, a, src, Context(now = T1))
        s.sql("""SELECT g_dv_link_hk, o_custkey, o_orderkey, CAST(load_dt AS STRING) AS load_dt, record_src
                |FROM g_dv_link""".stripMargin)
      },
      s"""SELECT DISTINCT md5(concat_ws('||', CAST(o_custkey AS STRING), CAST(o_orderkey AS STRING))) AS g_dv_link_hk,
         |  o_custkey, o_orderkey, '$T1' AS load_dt, 'graft' AS record_src
         |FROM ($src) x""".stripMargin)
  }

  /** datavault satellite on parent key o_orderkey: run 2 re-delivers 1998 rows
    * 400 days later; only odd keys carry a changed attribute (status→'U'),
    * so only those append — LAG/tip hashdiff logic end-to-end. */
  val datavaultSatellite: OQ = {
    val s1 =
      """SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |  o_orderdate AS load_dt
        |FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin
    val s2 =
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 1 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |  o_orderdate + INTERVAL 400 DAY AS load_dt
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin
    val satOut =
      """SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price,
        |  CAST(load_dt AS STRING) AS load_dt, parent_hk, hashdiff""".stripMargin
    OQ.df("mat_datavault_satellite",
      (s, _) => {
        val a = Asset(name = "g_dv_sat",
          columns = Seq(Column("o_orderkey", "BIGINT", primaryKey = true)),
          materialization = Materialization(
            typ = MaterializationType.Table,
            strategy = Some(Strategy.DataVaultSatellite),
            incrementalKey = Some("load_dt")))
        val wh = new SessionCatalogWarehouse(s)
        wh.drop(a.name); wh.drop(s"${a.name}__stage")
        Materializer.execute(wh, a, s1, Context(now = T1))
        Materializer.execute(wh, a, s2, Context(now = T2))
        s.sql(s"$satOut FROM g_dv_sat")
      },
      s"""WITH r1 AS ($s1), r2 AS ($s2), fin AS (
         |  SELECT o_orderkey, o_orderstatus, price, load_dt FROM r1
         |  UNION ALL
         |  SELECT o_orderkey, o_orderstatus, price, load_dt FROM r2 WHERE o_orderkey % 2 = 1)
         |SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price,
         |  CAST(load_dt AS STRING) AS load_dt,
         |  md5(CAST(o_orderkey AS STRING)) AS parent_hk,
         |  md5(concat_ws('||', o_orderstatus, CAST(price AS STRING))) AS hashdiff
         |FROM fin""".stripMargin)
  }

  /** BUCKETED co-located join: both sides materialize `bucketBy` the join
    * key (8 buckets, sorted within buckets), then join on it — at scale
    * the recurring-join layout move: the shuffle is paid ONCE at write
    * time, and every later join/aggregate on the key reads the bucket
    * files as pre-hashed partitions with NO exchange (PlanSpec pins the
    * shuffle-free plan; this key pins the result is still exactly the
    * plain join's). DECIMAL-routed sum for cross-engine float parity. */
  val bucketedJoin: OQ = OQ.df("mat_bucketed_join",
    (s, _) => {
      import org.apache.spark.sql.functions._
      val wh = new SessionCatalogWarehouse(s)
      wh.createOrReplace("g_bk_orders",
        s.table("orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice")),
        partitionBy = Nil, clusterBy = Nil,
        bucketBy = Seq("o_custkey"), buckets = 8)
      wh.createOrReplace("g_bk_customer",
        s.table("customer").select(col("c_custkey"), col("c_mktsegment")),
        partitionBy = Nil, clusterBy = Nil,
        bucketBy = Seq("c_custkey"), buckets = 8)
      s.table("g_bk_orders")
        .join(s.table("g_bk_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").as("sum_price"))
    },
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin)

  val all: Seq[OQ] = Seq(view, createReplace, append, truncateInsert,
    deleteInsert, merge, timeInterval, ddl, scd2ByColumn, scd2ByTime,
    datavaultHub, datavaultLink, datavaultSatellite, bucketedJoin)
}
