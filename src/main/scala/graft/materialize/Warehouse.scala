package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-backed table store the materializer writes into.
  *
  * The reference delegates writes to ~25 warehouse backends; here the
  * "warehouse" is Spark's session catalog (parquet tables under
  * spark.sql.warehouse.dir). On a cluster the same interface maps onto a
  * Delta/Iceberg catalog where `createOrReplace` is atomic and merge/delete
  * are native — the staged-swap below is the format-agnostic fallback (the
  * reference uses the exact same emulation for DuckDB,
  * pkg/duckdb/materialization.go:111-170).
  */
trait Warehouse {
  def spark: SparkSession
  def exists(name: String): Boolean
  def table(name: String): DataFrame
  /** Full-table replace. Implemented stage-then-rename so a) the new data is
    * fully written before the old table disappears and b) the SELECT may read
    * the table it replaces (self-referencing rebuilds: SCD2, merge). */
  def createOrReplace(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
                      clusterBy: Seq[String] = Nil,
                      bucketBy: Seq[String] = Nil, buckets: Int = 0): Unit
  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
             clusterBy: Seq[String] = Nil,
             bucketBy: Seq[String] = Nil, buckets: Int = 0): Unit
  /** INSERT OVERWRITE keeping the table definition. */
  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
                clusterBy: Seq[String] = Nil,
                bucketBy: Seq[String] = Nil, buckets: Int = 0): Unit
  def drop(name: String): Unit
  def ensureSchema(name: String): Unit
}

final class SessionCatalogWarehouse(val spark: SparkSession) extends Warehouse {

  override def exists(name: String): Boolean = spark.catalog.tableExists(name)

  override def table(name: String): DataFrame = spark.table(name)

  /** CREATE SCHEMA IF NOT EXISTS for qualified names (reference
    * pkg/duckdb/operator.go:118-123, ansisql/schema.go). */
  override def ensureSchema(name: String): Unit = {
    val parts = name.split('.')
    if (parts.length > 1)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${parts.dropRight(1).mkString(".")}")
  }

  override def createOrReplace(name: String, df: DataFrame, partitionBy: Seq[String],
                               clusterBy: Seq[String],
                               bucketBy: Seq[String], buckets: Int): Unit = {
    ensureSchema(name)
    // Unique stage name: two overlapping runs of the same asset never collide
    // on the staging table. On a v2 catalog (Delta/Iceberg) this whole method
    // becomes a single atomic CREATE OR REPLACE TABLE AS.
    val stage = s"${name}__stage_${java.lang.Long.toHexString(System.nanoTime())}"
    var targetDropped = false
    try {
      write(df, partitionBy, clusterBy, bucketBy, buckets).mode(SaveMode.Overwrite).saveAsTable(stage)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      targetDropped = true
      spark.sql(s"ALTER TABLE $stage RENAME TO $name")
      // Hive-style partition metadata stores absolute locations; the rename
      // moves the directory, so re-discover partitions from the new path.
      if (partitionBy.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $name")
    } catch {
      case e: Throwable =>
        // only reap the stage while the old target still exists — once the
        // target is dropped, the stage holds the ONLY copy of the data and
        // must survive for recovery (`graft clean` reaps abandoned stages)
        if (!targetDropped)
          try spark.sql(s"DROP TABLE IF EXISTS $stage") catch { case _: Throwable => () }
        throw e
    }
  }

  override def append(name: String, df: DataFrame, partitionBy: Seq[String],
                      clusterBy: Seq[String],
                      bucketBy: Seq[String], buckets: Int): Unit = {
    ensureSchema(name)
    // Keep the table's partition layout on append — writing unpartitioned
    // into a partitioned table silently forks its layout.
    val parts = if (partitionBy.nonEmpty) partitionBy else tablePartitionColumns(name)
    write(df, parts, clusterBy, bucketBy, buckets).mode(SaveMode.Append).saveAsTable(name)
  }

  override def overwrite(name: String, df: DataFrame, partitionBy: Seq[String],
                         clusterBy: Seq[String],
                         bucketBy: Seq[String], buckets: Int): Unit = {
    // The writer can't overwrite a table it reads from; stage-swap instead,
    // preserving the partition layout.
    val parts = if (partitionBy.nonEmpty) partitionBy else tablePartitionColumns(name)
    createOrReplace(name, df, parts, clusterBy, bucketBy, buckets)
  }

  override def drop(name: String): Unit = spark.sql(s"DROP TABLE IF EXISTS $name")

  /** Existing partition columns of `name` ([] when absent/unpartitioned). */
  private def tablePartitionColumns(name: String): Seq[String] =
    if (!exists(name)) Nil
    else
      try {
        import scala.jdk.CollectionConverters._
        spark.catalog.listColumns(name).collectAsList().asScala.toSeq
          .filter(_.isPartition).map(_.name)
      } catch { case _: Throwable => Nil }

  private def write(df: DataFrame, partitionBy: Seq[String], clusterBy: Seq[String] = Nil,
                    bucketBy: Seq[String] = Nil, buckets: Int = 0) = {
    // Cluster writes by the partition columns so each output partition is
    // written by few tasks (avoids the small-files explosion at scale).
    val clustered =
      if (partitionBy.nonEmpty)
        df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else df
    // cluster_by: co-locate rows within each file so min/max row-group stats
    // prune on those columns at read time (the parquet-table analogue of
    // Delta Z-ORDER; reference bigquery/materialization.go:518-548 CLUSTER BY)
    val sorted =
      if (clusterBy.nonEmpty)
        clustered.sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
      else clustered
    val w0 = sorted.write.format("parquet")
    val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    // bucketed layout: co-bucketed tables join/aggregate on the bucket keys
    // WITHOUT a shuffle (Spark reads bucket files as pre-hashed partitions)
    if (bucketBy.nonEmpty && buckets > 0)
      w1.bucketBy(buckets, bucketBy.head, bucketBy.tail: _*).sortBy(bucketBy.head, bucketBy.tail: _*)
    else w1
  }
}
