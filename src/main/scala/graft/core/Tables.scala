package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for the driver-provided testdata tables.
  *
  * Mirrors the reference's implicit contract that every asset reads upstream
  * *tables by name* (bruin resolves table names against the warehouse catalog;
  * see reference pkg/sqlparser/parser.go:200-239 — table resolution only).
  * Here the "warehouse" is the SparkSession: each parquet table is registered
  * as a temp view so both `spark.sql` and `spark.table` resolve it.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns at the source, so registering all tables costs nothing
  * until a query actually reads one.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // idempotent + cheap: registering 10 parquet tables costs footer reads, so
  // remember which (session, dir) pairs are already registered
  private val registered = scala.collection.mutable.Set[(SparkSession, String)]()

  /** Register every testdata table under `dir` as a temp view. Idempotent. */
  def register(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registered((spark, dir))) {
      all.foreach { t => load(spark, dir, t).createOrReplaceTempView(t) }
      registered += ((spark, dir))
    }
  }

  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    // reader rejects; read nanos as long and truncate to micros — the same
    // ns→us truncation DuckDB applies when it coerces TIMESTAMP_NS.
    if (table == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$table.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$table.parquet")
  }
}
