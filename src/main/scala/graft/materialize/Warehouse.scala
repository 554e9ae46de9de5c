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
  /** Full-table replace. Implemented as a generation write + atomic view
    * repoint so a) readers see strictly old-or-new data at every instant and
    * b) the SELECT may read the table it replaces (self-referencing
    * rebuilds: SCD2, merge). */
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
  /** Dynamic-partition overwrite: replace ONLY the partitions present in
    * `df`, leaving every other partition untouched — the incremental write
    * primitive for partition-bucketed state (cost scales with touched
    * partitions, not table size). The table must exist and be partitioned.
    * NOT atomic across partitions (file-level replace per partition); on a
    * transactional catalog this maps to `replaceWhere`/`MERGE`. */
  def overwritePartitions(name: String, df: DataFrame): Unit
}

final class SessionCatalogWarehouse(val spark: SparkSession) extends Warehouse {
  import SessionCatalogWarehouse._

  override def exists(name: String): Boolean = spark.catalog.tableExists(name)

  override def table(name: String): DataFrame = spark.table(name)

  /** CREATE SCHEMA IF NOT EXISTS for qualified names (reference
    * pkg/duckdb/operator.go:118-123, ansisql/schema.go). */
  override def ensureSchema(name: String): Unit = {
    val parts = name.split('.')
    if (parts.length > 1)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${parts.dropRight(1).mkString(".")}")
  }

  /** View-indirection swap (r4 verdict task #8): the public `name` is a VIEW
    * over the current generation table `name__gen_<hex>`. Replacing data =
    * write the next generation, then ONE `CREATE OR REPLACE VIEW` — a single
    * catalog operation, so readers see strictly old-or-new and a crash at any
    * point leaves the previous generation fully readable (the old
    * drop→rename swap had a window with NO table at all). Superseded
    * generations are reaped after the repoint; `graft clean` sweeps orphans
    * from torn writes. Self-referencing rebuilds (SCD2/merge reading the
    * table they replace) read the OLD generation while writing the NEW one —
    * no read-write conflict by construction. */
  override def createOrReplace(name: String, df: DataFrame, partitionBy: Seq[String],
                               clusterBy: Seq[String],
                               bucketBy: Seq[String], buckets: Int): Unit = {
    ensureSchema(name)
    val gen = s"${name}$GenSep${java.lang.Long.toHexString(System.nanoTime())}"
    // resolve the outgoing generation BEFORE the repoint (one SHOW CREATE
    // TABLE) — a listTables scan per write would make every materialization
    // pay O(catalog size); orphans from torn writes are `graft clean`'s job
    var legacyDropped = false
    val prevBacking =
      try {
        write(df, partitionBy, clusterBy, bucketBy, buckets)
          .mode(SaveMode.Overwrite).saveAsTable(gen)
        val prev =
          if (!exists(name)) scala.None
          else if (!isView(spark, name)) {
            // one-time migration: a pre-indirection plain TABLE must vacate
            // the name before the view can claim it (the only remaining
            // non-atomic window, crossed exactly once per legacy table)
            spark.sql(s"DROP TABLE $name"); legacyDropped = true; scala.None
          } else backingFromDdl(spark, name)
        spark.sql(s"CREATE OR REPLACE VIEW $name AS SELECT * FROM $gen")
        backingCache.put(cacheKey(spark, name), qualified(spark, gen))
        prev
      } catch {
        case e: Throwable =>
          invalidateBacking(spark, name)
          // the repoint never happened. When a previous view (or nothing) held
          // the name, the new generation is garbage — reap it. But on the
          // one-time migration path the legacy table is already gone, so `gen`
          // is the ONLY remaining copy of the data: leave it on disk for
          // recovery (`graft clean --grace` keeps fresh generations safe).
          if (!legacyDropped)
            try spark.sql(s"DROP TABLE IF EXISTS $gen") catch { case _: Throwable => () }
          else System.err.println(
            s"graft: view repoint for $name failed after migrating a legacy " +
              s"table; data preserved in $gen — recover with CREATE OR " +
              s"REPLACE VIEW $name AS SELECT * FROM $gen")
          throw e
      }
    // compare by simple name: resolution may return a db-qualified spelling
    // while `gen` inherits the caller's (possibly unqualified) one
    prevBacking.filterNot(_.split('.').last == gen.split('.').last)
      .foreach(g => try spark.sql(s"DROP TABLE IF EXISTS $g") catch { case _: Throwable => () })
  }

  override def append(name: String, df: DataFrame, partitionBy: Seq[String],
                      clusterBy: Seq[String],
                      bucketBy: Seq[String], buckets: Int): Unit = {
    ensureSchema(name)
    // appends land in the CURRENT generation behind the view (the view text
    // `SELECT * FROM gen` keeps serving; parquet appends are file-level
    // additive, so a crash mid-append never loses existing rows)
    val target = backingTable(spark, name).getOrElse(name)
    // Keep the table's partition layout on append — writing unpartitioned
    // into a partitioned table silently forks its layout.
    val parts = if (partitionBy.nonEmpty) partitionBy else tablePartitionColumns(target)
    write(df, parts, clusterBy, bucketBy, buckets).mode(SaveMode.Append).saveAsTable(target)
    // a cross-session writer (a foreachBatch micro-batch runs in a CLONED
    // session) refreshes only ITS relation cache; this session's cached
    // file listing would keep serving the pre-append snapshot — the same
    // staleness overwritePartitions already guards against below
    if (!(spark eq df.sparkSession)) spark.catalog.refreshTable(target)
  }

  override def overwrite(name: String, df: DataFrame, partitionBy: Seq[String],
                         clusterBy: Seq[String],
                         bucketBy: Seq[String], buckets: Int): Unit = {
    // The writer can't overwrite a table it reads from; generation-swap
    // instead, preserving the partition layout.
    val target = backingTable(spark, name).getOrElse(name)
    val parts = if (partitionBy.nonEmpty) partitionBy else tablePartitionColumns(target)
    createOrReplace(name, df, parts, clusterBy, bucketBy, buckets)
  }

  override def drop(name: String): Unit = SessionCatalogWarehouse.dropAny(spark, name)

  override def overwritePartitions(name: String, df: DataFrame): Unit = {
    // resolve through the generation view to the physical table; insertInto
    // is position-based, so align to the table's column order first
    val target = backingTable(spark, name).getOrElse(name)
    val ordered = df.select(spark.table(target).columns.map(org.apache.spark.sql.functions.col): _*)
    // run the insert under a CLONED session with dynamic overwrite mode:
    // toggling the shared session's conf would race concurrent writers into
    // the wrong mode, and the per-write DataFrameWriter option is ignored by
    // insertInto's analysis path (verifyNotReadPath fires under static mode)
    val sess = org.apache.spark.sql.graft.SqlBridge.sessionWithConf(
      ordered.sparkSession, "spark.sql.sources.partitionOverwriteMode" -> "dynamic")
    org.apache.spark.sql.graft.SqlBridge
      .ofRows(sess, org.apache.spark.sql.graft.SqlBridge.analyzedPlan(ordered))
      .write.mode(SaveMode.Overwrite).insertInto(target)
    // the insert refreshed the CLONE's relation cache; readers resolve
    // through the original sessions, whose cached file listings are now stale
    ordered.sparkSession.catalog.refreshTable(target)
    if (!(spark eq ordered.sparkSession)) spark.catalog.refreshTable(target)
  }

  /** Existing partition columns of `name` ([] when absent/unpartitioned). */
  private def tablePartitionColumns(name: String): Seq[String] =
    if (!exists(name)) Nil
    else
      try {
        import scala.jdk.CollectionConverters._
        spark.catalog.listColumns(name).collectAsList().asScala.toSeq
          .filter(_.isPartition).map(_.name)
      } catch { case _: Throwable => Nil }

  private[materialize] def write(df: DataFrame, partitionBy: Seq[String], clusterBy: Seq[String] = Nil,
                    bucketBy: Seq[String] = Nil, buckets: Int = 0) = {
    // A writer that already arranged its own layout (the Compactor's salted
    // or z-ordered shuffles) marks the frame; re-clustering here would undo
    // it. The marker is a dropped projection, so partitioning/order survive.
    val preArranged = df.columns.contains(SessionCatalogWarehouse.ArrangedMarker)
    val base = if (preArranged) df.drop(SessionCatalogWarehouse.ArrangedMarker) else df
    // Cluster writes by the partition columns so each output partition is
    // written by few tasks (avoids the small-files explosion at scale).
    // REBALANCE (not repartition): AQE both merges sliver partition values
    // into shared tasks AND splits a skewed value across several tasks at
    // advisoryPartitionSizeInBytes — a plain hash repartition funnels each
    // partition value to exactly ONE task, so a hot value (half the fact
    // table in today's date) writes one giant file behind one straggler.
    val clustered =
      if (partitionBy.nonEmpty && !preArranged)
        base.hint("rebalance", partitionBy: _*)
      else base
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

object SessionCatalogWarehouse {

  /** Generation-table suffix separator: `orders__gen_1a2b3c`. */
  val GenSep = "__gen_"

  /** Marker column a writer adds (value irrelevant) to tell [[write]] the
    * frame's layout is already arranged — skip the rebalance-by-partition
    * clustering and just drop the marker. */
  val ArrangedMarker = "__graft_arranged"

  /** In-process view→generation resolution cache. Every materialization (and,
    * worse, every streaming micro-batch) otherwise pays a SHOW CREATE TABLE
    * round-trip just to find its backing table. All writers in this JVM go
    * through this object, so the cache is invalidated exactly at the two
    * mutation points (repoint, drop); a cross-path drop is caught by the
    * cheap tableExists guard on read. Keys are catalog-qualified lowercase
    * names, so resolution is stable across currentDatabase changes. */
  private val backingCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cacheKey(spark: SparkSession, name: String): String = {
    val n = name.replace("`", "").toLowerCase
    if (n.contains('.')) n else s"${spark.catalog.currentDatabase.toLowerCase}.$n"
  }

  private def qualified(spark: SparkSession, name: String): String =
    if (name.contains('.')) name else s"${spark.catalog.currentDatabase}.$name"

  /** Drop `name`'s cached backing resolution — required after any view
    * repoint or drop that bypasses this object (e.g. a raw CREATE OR REPLACE
    * VIEW claiming a name a generation view previously held). */
  def invalidateBacking(spark: SparkSession, name: String): Unit =
    backingCache.remove(cacheKey(spark, name))

  private[materialize] def isView(spark: SparkSession, name: String): Boolean =
    try spark.catalog.getTable(name).tableType == "VIEW"
    catch { case _: Exception => false }

  /** All generation tables of `name`, fully qualified. */
  def generations(spark: SparkSession, name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val parts = name.split('.')
    val (db, tbl) =
      if (parts.length > 1) (parts.dropRight(1).mkString("."), parts.last)
      else (spark.catalog.currentDatabase, parts.last)
    if (!spark.catalog.databaseExists(db)) Nil
    else spark.catalog.listTables(db).collectAsList().asScala.toSeq
      .filter(t => t.tableType != "TEMPORARY" && t.name.startsWith(tbl + GenSep))
      .map(t => s"$db.${t.name}")
  }

  private val GenRef = ("[A-Za-z0-9_.]*" + GenSep + "[0-9a-f]+").r

  /** Fast backing resolution: parse the generation reference straight out of
    * the view's stored text (one catalog call, no table listing). */
  private[materialize] def backingFromDdl(spark: SparkSession, name: String): Option[String] =
    try {
      val ddl = spark.sql(s"SHOW CREATE TABLE $name").head().getString(0)
        .replace("`", "")
      // re-qualify an unqualified reference with the view's own schema so
      // callers in a different current database still hit the right table
      GenRef.findFirstIn(ddl).map { g =>
        if (g.contains('.') || !name.contains('.')) g
        else name.split('.').dropRight(1).mkString(".") + "." + g
      }
    } catch { case _: Exception => scala.None }

  /** The generation table a graft view currently serves, when `name` is such
    * a view. Resolution: the in-process cache (no catalog round-trip beyond
    * a tableExists guard); else the view text names its generation (one SHOW
    * CREATE TABLE); the listing fallback covers views whose text a catalog
    * quirk hides. Torn writes can leave EXTRA generations behind — never
    * pick those. */
  def backingTable(spark: SparkSession, name: String): Option[String] = {
    val key = cacheKey(spark, name)
    val cached = Option(backingCache.get(key))
      .filter(g => try spark.catalog.tableExists(g) catch { case _: Exception => false })
    cached match {
      case some @ Some(_) => some
      case scala.None =>
        backingCache.remove(key)
        val resolved =
          if (!isView(spark, name)) scala.None
          else backingFromDdl(spark, name) match {
            case some @ Some(_) => some
            case scala.None =>
              generations(spark, name) match {
                case Seq() => scala.None
                case Seq(only) => Some(only)
                // latest by PARSED nanoTime suffix: lexicographic max
                // mis-orders hex strings of different lengths ("f…" > "10…")
                case several => Some(several.maxBy(g => scala.util.Try(
                  java.lang.Long.parseUnsignedLong(
                    g.substring(g.lastIndexOf(GenSep) + GenSep.length), 16))
                  .getOrElse(Long.MinValue)))
              }
          }
        resolved.foreach(g => backingCache.put(key, qualified(spark, g)))
        resolved
    }
  }

  /** Drop `name` whatever it is — view (plus its generations) or table.
    * The one safe spell for callers that can't know which world a target
    * was materialized in. */
  def dropAny(spark: SparkSession, name: String): Unit = {
    invalidateBacking(spark, name)
    if (isView(spark, name)) spark.sql(s"DROP VIEW IF EXISTS $name")
    else spark.sql(s"DROP TABLE IF EXISTS $name")
    (generations(spark, name) ++ overlayTables(spark, name))
      .foreach(g => try spark.sql(s"DROP TABLE IF EXISTS $g") catch { case _: Throwable => () })
  }

  /** Overlay-layout CDC state tables of `name` (base + overlay chain from
    * [[graft.streaming.Streams.OverlayStateWriter]]), fully qualified. */
  private def overlayTables(spark: SparkSession, name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val parts = name.split('.')
    val (db, tbl) =
      if (parts.length > 1) (parts.dropRight(1).mkString("."), parts.last)
      else (spark.catalog.currentDatabase, parts.last)
    if (!spark.catalog.databaseExists(db)) Nil
    else spark.catalog.listTables(db).collectAsList().asScala.toSeq
      .filter(t => t.tableType != "TEMPORARY" &&
        (t.name.startsWith(tbl + "__cdcbase_") || t.name.startsWith(tbl + "__cdcov_")))
      .map(t => s"$db.${t.name}")
  }
}
