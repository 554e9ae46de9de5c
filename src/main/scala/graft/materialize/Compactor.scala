package graft.materialize

import org.apache.spark.sql.functions.col

/** Small-file compaction — the warehouse-side maintenance the reference
  * delegates to its backing engines but a Spark-native warehouse must own
  * (the analogue of Delta's OPTIMIZE / Iceberg's rewrite_data_files).
  *
  * Every append-shaped strategy (append, merge batches, streaming
  * foreachBatch sinks, CDC overlay folds) accretes files sized by the
  * WRITER's parallelism, not by what readers want: a thousand micro-batches
  * leave a thousand slivers, and at scale every scan then pays file-open +
  * footer-read + scheduling per sliver. Compaction rewrites the table into
  * ⌈bytes / target⌉ right-sized files.
  *
  * The rewrite rides the generation machinery: read through the view (the
  * OLD generation), write the compacted copy as a NEW generation, one
  * atomic view repoint — readers never see a partial rewrite, and a crash
  * mid-compaction leaves the original serving (`graft clean` sweeps the
  * torn copy). Partitioned tables repartition BY their partition columns so
  * each partition directory's slivers merge without breaking the layout.
  *
  * File inventory is a driver-side listing (paths from the scan's own
  * `inputFiles`, sizes from one FS status call per file) — the same
  * metadata the catalog reads to plan any scan of the table, not a data
  * pass.
  */
object Compactor {

  final case class Stats(table: String, filesBefore: Int, bytesBefore: Long,
                         filesAfter: Int, rewritten: Boolean) {
    def pretty: String =
      if (rewritten)
        f"$table: $filesBefore files (${bytesBefore / 1048576.0}%.1f MiB) -> $filesAfter files"
      else
        s"$table: $filesBefore files already within target, not rewritten"
  }

  /** Rewrite `name` into ~⌈bytes/targetBytes⌉ files if it currently has
    * more; no-op (and no write) when the table is already within target.
    *
    * `zorderBy` turns the rewrite into Delta's OPTIMIZE-ZORDER workflow:
    * the surviving files are laid out along the Morton curve over those
    * columns ([[graft.ops.ZOrder]]), so the compaction pass that every
    * append-heavy table needs anyway ALSO buys multi-column row-group
    * pruning. A z-order request always rewrites (the point is the layout,
    * not just the file count). */
  def compact(wh: Warehouse, name: String,
              targetBytes: Long = 128L << 20,
              zorderBy: Seq[String] = Nil): Stats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val spark = wh.spark
    val backing = SessionCatalogWarehouse.backingTable(spark, name)
    // a VIEW with no generation backing is composed state (a CDC overlay
    // view, a user view) — rewriting it into a generation snapshot would
    // silently freeze it; compact the underlying state table instead
    if (backing.isEmpty && SessionCatalogWarehouse.isView(spark, name))
      throw new IllegalArgumentException(
        s"$name is a composed view, not a warehouse table; compact its " +
          "underlying state/base tables instead")
    val target = backing.getOrElse(name)
    val files = spark.table(target).inputFiles
    val hconf = spark.sessionState.newHadoopConf()
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val wanted = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (zorderBy.isEmpty && files.length <= wanted)
      return Stats(name, files.length, bytes, files.length, rewritten = false)
    val parts = partitionColumnsOf(spark, target)
    val df = spark.table(name) // through the view: reads the OLD generation
    val compacted =
      if (zorderBy.nonEmpty && parts.isEmpty)
        graft.ops.ZOrder.cluster(df, zorderBy, wanted)
      else if (zorderBy.nonEmpty)
        // partitioned + z-order: cluster WITHIN each partition directory —
        // range-sharding on the z-value across partition dirs would have
        // every task write into every directory (tasks × dirs slivers)
        graft.ops.ZOrder.zValue(df, zorderBy)
          .repartition(wanted, parts.map(col): _*)
          .sortWithinPartitions((parts :+ "__z").map(col): _*)
          .drop("__z")
      else if (parts.isEmpty) df.repartition(wanted)
      // partitioned: shuffle on the partition columns so each directory is
      // written by few tasks — its slivers merge, the layout is unchanged
      else df.repartition(wanted, parts.map(col): _*)
    // a bucketed table's layout is part of its contract (shuffle-free
    // co-located joins) — the rewrite must carry it, not silently drop it
    val (bucketCols, nBuckets) = bucketSpecOf(spark, target)
    wh.createOrReplace(name, compacted, partitionBy = parts,
      bucketBy = bucketCols, buckets = nBuckets)
    val after = SessionCatalogWarehouse.backingTable(spark, name).getOrElse(name)
    Stats(name, files.length, bytes,
      spark.table(after).inputFiles.length, rewritten = true)
  }

  /** (bucket columns, bucket count) from DESCRIBE FORMATTED; (Nil, 0) for
    * unbucketed tables. */
  private def bucketSpecOf(spark: org.apache.spark.sql.SparkSession,
                           table: String): (Seq[String], Int) =
    try {
      val rows = spark.sql(s"DESCRIBE FORMATTED $table").collect()
        .map(r => r.getString(0).trim -> Option(r.getString(1)).getOrElse("").trim)
        .toMap
      val n = rows.get("Num Buckets").flatMap(_.toIntOption).getOrElse(0)
      val cols = rows.getOrElse("Bucket Columns", "")
        .stripPrefix("[").stripSuffix("]")
        .split(',').map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
      if (n > 0 && cols.nonEmpty) (cols, n) else (Nil, 0)
    } catch { case _: Exception => (Nil, 0) }

  private def partitionColumnsOf(spark: org.apache.spark.sql.SparkSession,
                                 table: String): Seq[String] =
    try {
      import scala.jdk.CollectionConverters._
      spark.catalog.listColumns(table).collectAsList().asScala.toSeq
        .filter(_.isPartition).map(_.name)
    } catch { case _: Throwable => Nil }
}
