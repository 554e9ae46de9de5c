package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers one oracle-checked
  * query here (Spark program + DuckDB-equivalent SQL). Modules:
  * [[graft.queries.Relational]] and friends.
  */
object SparkEntry {

  /** All oracle-checked queries, one per operator. */
  def registry: Seq[OQ] =
    Relational.all ++ Materializations.all ++ ChecksQueries.all ++
      MacroQueries.all ++ DataOpsQueries.all ++ EngineQueries.all ++
      IngestQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinRevenueByNation.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    OQ.toQueryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    OQ.toOracleMap(registry)

  /** The bench surface: the full oracle registry plus approximate-ANN
    * configs that have no SQL oracle (recall-gated in DataOpsSpec instead)
    * but whose round-over-round timings we keep tracking. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    OQ.toQueryMap(registry ++ DataOpsQueries.benchOnly)

  /** Streaming keys that must run under the raised object-agg fallback
    * threshold ([[graft.core.HeapAgg]]): their bounded-heap aggregation
    * executes inside OQ.run, before a caller can sniff the plan. */
  def heapRaisedStreaming: Set[String] = EngineQueries.heapRaisedStreaming
}
