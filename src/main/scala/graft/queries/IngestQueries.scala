package graft.queries

import graft.materialize.SessionCatalogWarehouse
import graft.model._
import graft.sources.Ingest

/** Oracle-checked ingestion runs (SURVEY §2.1 "Ingestr ingestion"): file
  * source → interval filter → masking → incremental-strategy write, driving
  * the real [[Ingest.run]] path twice like the materialization oracles. The
  * DuckDB oracle replays the same window/mask program over the same parquet.
  */
object IngestQueries {

  private val OUT_COLS =
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, CAST(o_orderdate AS STRING) AS o_orderdate, o_orderpriority"

  private def asset(name: String, dir: String, strategy: String,
                    lo: String, hi: String): Asset =
    Asset(name = name, assetType = AssetType.Ingest,
      columns = Seq(
        Column("o_orderkey", "BIGINT", primaryKey = true),
        Column("o_custkey", "BIGINT"),
        Column("o_orderstatus", "STRING"),
        Column("o_totalprice", "DOUBLE", updateOnMerge = true),
        Column("o_orderdate", "TIMESTAMP"),
        Column("o_orderpriority", mask = "md5")), // PII-style masking on load
      parameters = Map(
        "source_uri" -> s"$dir/orders.parquet",
        "incremental_strategy" -> strategy,
        "incremental_key" -> "o_orderdate",
        "interval_start" -> lo,
        "interval_end" -> hi))

  private def duckOracle(where: String) =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |  CAST(o_orderdate AS STRING) AS o_orderdate, md5(o_orderpriority) AS o_orderpriority
       |FROM orders $where""".stripMargin

  /** replace: the second run's window fully replaces the first load. */
  val replace: OQ = OQ.df("ingest_replace",
    (s, dir) => {
      val wh = new SessionCatalogWarehouse(s)
      wh.drop("g_ing_replace")
      Ingest.run(wh, asset("g_ing_replace", dir, "replace",
        "1997-01-01 00:00:00", "1997-12-31 23:59:59"))
      Ingest.run(wh, asset("g_ing_replace", dir, "replace",
        "1998-01-01 00:00:00", "1998-12-31 23:59:59"))
      s.sql(s"SELECT $OUT_COLS FROM g_ing_replace")
    },
    duckOracle(
      """WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1998-12-31 23:59:59'""".stripMargin))

  /** merge: overlapping windows upsert on the primary key — every order lands
    * exactly once even though 1997 is ingested twice. */
  val merge: OQ = OQ.df("ingest_merge",
    (s, dir) => {
      val wh = new SessionCatalogWarehouse(s)
      wh.drop("g_ing_merge")
      Ingest.run(wh, asset("g_ing_merge", dir, "merge",
        "1995-01-01 00:00:00", "1998-12-31 23:59:59"))
      Ingest.run(wh, asset("g_ing_merge", dir, "merge",
        "1998-01-01 00:00:00", "2000-12-31 23:59:59"))
      s.sql(s"SELECT $OUT_COLS FROM g_ing_merge")
    },
    duckOracle(
      """WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '2000-12-31 23:59:59'""".stripMargin))

  /** delete+insert keyed on the incremental column: the second window's keys
    * are replaced wholesale, earlier rows survive. */
  val deleteInsert: OQ = OQ.df("ingest_delete_insert",
    (s, dir) => {
      val wh = new SessionCatalogWarehouse(s)
      wh.drop("g_ing_di")
      Ingest.run(wh, asset("g_ing_di", dir, "delete+insert",
        "1995-01-01 00:00:00", "1998-12-31 23:59:59"))
      Ingest.run(wh, asset("g_ing_di", dir, "delete+insert",
        "1998-01-01 00:00:00", "2000-12-31 23:59:59"))
      s.sql(s"SELECT $OUT_COLS FROM g_ing_di")
    },
    duckOracle(
      """WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '2000-12-31 23:59:59'""".stripMargin))

  /** Broker-path ingest end-to-end through the registered stream source
    * (the file stand-in; kafka runs the identical route modulo the
    * jar-gated `format("kafka")` call): URI routing → streaming read →
    * interval filter + masking on the stream → per-micro-batch strategy
    * write. The oracle replays the same window/mask program batch-side —
    * stream and batch ingestion must land identical rows. */
  val brokerStream: OQ = OQ.df("ingest_broker_stream",
    (s, dir) => {
      val wh = new SessionCatalogWarehouse(s)
      wh.drop("g_ing_broker")
      Ingest.run(wh, Asset(name = "g_ing_broker", assetType = AssetType.Ingest,
        columns = Seq(
          Column("event_id", "BIGINT", primaryKey = true),
          Column("user_id", "BIGINT"),
          Column("event_type", "STRING"),
          Column("value", "DOUBLE"),
          Column("props", mask = "md5")),
        parameters = Map(
          "source_uri" -> s"file://$dir/events.parquet",
          "source_stream" -> "true",
          "incremental_strategy" -> "append",
          "incremental_key" -> "ts",
          "interval_start" -> "2024-01-05 00:00:00",
          "interval_end" -> "2024-01-15 23:59:59")))
      s.sql("""SELECT event_id, unix_micros(ts) AS ts_us, user_id,
              |  event_type, value, props FROM g_ing_broker""".stripMargin)
    },
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
      |  md5(props) AS props
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      |  AND ts <= TIMESTAMP '2024-01-15 23:59:59'""".stripMargin)

  val all: Seq[OQ] = Seq(replace, merge, deleteInsert, brokerStream)
}
