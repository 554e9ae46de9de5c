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
    // per-file sizes grouped by directory: the largest partition dir sets
    // how many ways a single partition value must split to honor target
    val dirSizes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getParent.toString -> p.getFileSystem(hconf).getFileStatus(p).getLen
    }
    val bytes = dirSizes.map(_._2).sum
    val wanted = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // rewrite when the table has too MANY files for its bytes, or any
    // single file is well over target (reader parallelism suffers both
    // ways: a thousand slivers or one monolith); 2× slack avoids churn
    val maxFileBytes = dirSizes.iterator.map(_._2).maxOption.getOrElse(0L)
    if (zorderBy.isEmpty && files.length <= wanted && maxFileBytes <= targetBytes * 2)
      return Stats(name, files.length, bytes, files.length, rewritten = false)
    val parts = partitionColumnsOf(spark, target)
    val maxDirBytes = dirSizes.groupBy(_._1).valuesIterator
      .map(_.map(_._2).sum).maxOption.getOrElse(0L)
    // a big partition value must fan out over ~⌈dirBytes/target⌉ tasks —
    // hashing on the partition columns alone funnels the whole directory
    // to ONE task and one arbitrarily oversized file
    val saltCard = math.max(1L, (maxDirBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.table(name) // through the view: reads the OLD generation
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    // every branch arranges its own layout, then marks the frame so the
    // warehouse write path doesn't re-cluster (and undo) it
    val mark = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn(SessionCatalogWarehouse.ArrangedMarker, lit(true))
    val compacted =
      if (zorderBy.nonEmpty && parts.isEmpty)
        mark(graft.ops.ZOrder.cluster(df, zorderBy, wanted))
      else if (zorderBy.nonEmpty)
        // partitioned + z-order: range-shard on (partition cols, z) — equal
        // partition keys stay contiguous (each task writes into ~1 dir) and
        // an oversized directory splits across tasks at z boundaries, so
        // its files are both target-sized AND z-disjoint for pruning
        mark(graft.ops.ZOrder.zValue(df, zorderBy)
          .repartitionByRange(wanted, (parts :+ "__z").map(col): _*)
          .sortWithinPartitions((parts :+ "__z").map(col): _*)
          .drop("__z"))
      else if (parts.isEmpty) mark(df.repartition(wanted))
      else {
        // partitioned: shuffle on the partition columns so each directory
        // is written by few tasks, plus a deterministic row-hash salt so a
        // directory bigger than targetBytes splits into ~saltCard files
        // hash() rejects map-typed columns — salt on the hashable subset
        val hashable = df.schema.fields
          .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
          .map(f => col(f.name)).toSeq
        val salt =
          if (saltCard <= 1 || hashable.isEmpty) Nil
          else Seq(pmod(hash(hashable: _*), lit(saltCard)))
        mark(df.repartition(wanted, parts.map(col) ++ salt: _*))
      }
    // a bucketed table's layout is part of its contract (shuffle-free
    // co-located joins) — the rewrite must carry it, not silently drop it
    val (bucketCols, nBuckets) = bucketSpecOf(spark, target)
    wh.createOrReplace(name, compacted, partitionBy = parts,
      bucketBy = bucketCols, buckets = nBuckets)
    val after = SessionCatalogWarehouse.backingTable(spark, name).getOrElse(name)
    Stats(name, files.length, bytes,
      spark.table(after).inputFiles.length, rewritten = true)
  }

  /** (bucket columns, bucket count) straight off the catalog's table
    * metadata — a stable API, unlike parsing DESCRIBE FORMATTED's
    * human-oriented output (r9 verdict #3); (Nil, 0) for unbucketed. */
  private def bucketSpecOf(spark: org.apache.spark.sql.SparkSession,
                           table: String): (Seq[String], Int) =
    try {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      spark.sessionState.catalog.getTableMetadata(ident).bucketSpec match {
        case Some(bs) if bs.numBuckets > 0 && bs.bucketColumnNames.nonEmpty =>
          (bs.bucketColumnNames, bs.numBuckets)
        case _ => (Nil, 0)
      }
    } catch { case _: Exception => (Nil, 0) }

  private def partitionColumnsOf(spark: org.apache.spark.sql.SparkSession,
                                 table: String): Seq[String] =
    try {
      import scala.jdk.CollectionConverters._
      spark.catalog.listColumns(table).collectAsList().asScala.toSeq
        .filter(_.isPartition).map(_.name)
    } catch { case _: Throwable => Nil }
}
