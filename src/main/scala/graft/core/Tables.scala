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
  // remember the dir each session's views currently point at. Keyed on the
  // LAST dir (not a (session, dir) set): switching dirs re-registers, so the
  // views always reflect the most recent request instead of silently serving
  // a previously-registered dir.
  private val registered = scala.collection.mutable.Map[SparkSession, String]()

  /** Register every testdata table under `dir` as a temp view. Idempotent
    * for repeated calls with the same dir; re-registers on a dir switch.
    *
    * Hardened per-table: one unreadable file must not poison queries that
    * never touch it, so each view registers under its own try and failures
    * are logged (queries that DO read the broken table fail at name
    * resolution instead).
    */
  def register(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registered.get(spark).contains(dir)) {
      var allOk = true
      all.foreach { t =>
        try load(spark, dir, t).createOrReplaceTempView(t)
        catch { case e: Throwable =>
          // drop any stale view from a previous dir — resolving to another
          // dir's data would be silently wrong; absent is loudly wrong
          spark.catalog.dropTempView(t)
          allOk = false
          System.err.println(s"[tables] failed to register '$t' from $dir: ${e.getMessage}")
        }
      }
      // only a FULLY successful registration is cached: recording a partial
      // one would make a transient per-table failure (file mid-restage)
      // sticky for the whole session — later register calls would no-op
      // while the view stays missing
      if (allOk) registered(spark) = dir else registered.remove(spark)
    }
  }

  /** Normalize an event-time column to session-zoned TimestampType,
    * WHATEVER physical type the file carries. The engine never assumes a
    * writer's physical choice (the reference delegates typing to the
    * warehouse — pkg/query/extract.go:21-26); typing is sniffed per file:
    *   - LongType        → int64 epoch-NANOS read via nanosAsLong; truncate
    *                       to micros (the coercion DuckDB applies to
    *                       TIMESTAMP_NS)
    *   - TimestampType   → pass through
    *   - anything else   → cast (covers TIMESTAMP_NTZ micros parquet,
    *                       strings, dates)
    */
  def eventTimeNormalize(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema.fields.find(_.name == colName).map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case Some(TimestampType) => df
      case Some(_) => df.withColumn(colName, col(colName).cast("timestamp"))
      case None    => df
    }
  }

  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    if (table == "events") {
      // nanosAsLong lets a TIMESTAMP(NANOS) file load at all (Spark's reader
      // rejects it otherwise); harmless for micros-typed files
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      eventTimeNormalize(spark.read.parquet(s"$dir/$table.parquet"))
    } else if (table == "embeddings") {
      embeddingNormalize(spark.read.parquet(s"$dir/$table.parquet"))
    } else spark.read.parquet(s"$dir/$table.parquet")
  }

  /** Normalize an embedding column to array<float> WHATEVER element type
    * the file carries (same contract as [[eventTimeNormalize]]: the engine
    * sniffs physical types per file instead of assuming a writer's choice
    * — r8's testdata regeneration turned that assumption into a
    * board-wide crash for events). The vector kernels are float-typed
    * (`Dataset[(Long, Array[Float])]`), so a list<double> or list<int>
    * re-generation must down-cast at the scan, not ClassCastException in
    * every ANN operator. */
  def embeddingNormalize(df: DataFrame, colName: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    df.schema.fields.find(_.name == colName).map(_.dataType) match {
      case Some(ArrayType(FloatType, _)) => df
      case Some(ArrayType(_, _)) =>
        df.withColumn(colName, col(colName).cast("array<float>"))
      case _ => df
    }
  }
}
