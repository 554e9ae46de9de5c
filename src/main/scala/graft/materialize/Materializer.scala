package graft.materialize

import org.apache.spark.sql.{Column => SCol, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.model._

/** The twelve materialization strategies (reference
  * pkg/pipeline/materializer.go:13-55 dispatch; DuckDB generator
  * pkg/duckdb/materialization.go:81-603; Data Vault
  * pkg/duckdb/datavault_materialization.go).
  *
  * Two faces:
  *  - [[render]] — the SQL program the strategy stands for (Spark SQL
  *    dialect), used by `render`/lint and golden-tested like the
  *    reference's materialization_test.go;
  *  - [[execute]] — the scale-aware DataFrame implementation. Where Spark's
  *    v1 catalog lacks DELETE/UPDATE/MERGE we rebuild via anti-join +
  *    unionByName + staged swap — exactly the reference's own DuckDB
  *    emulation (temp table + UPDATE…FROM + INSERT WHERE NOT EXISTS,
  *    materialization.go:111-170), expressed as one declarative plan per
  *    strategy so Catalyst broadcast/AQE-optimizes the join against the
  *    (usually small) increment. On Delta/Iceberg `execute` would emit
  *    native MERGE/DELETE; the plan shapes below are the portable core.
  */
object Materializer {

  /** Run context: frozen timestamps make SCD2/time_interval deterministic
    * (mirrors FreezeTime, reference pkg/sqlparser/parser.go:451-461). */
  final case class Context(
      now: String = java.time.Instant.now.toString.replace("T", " ").take(19),
      startTs: String = "1970-01-01 00:00:00",
      endTs: String = "9999-12-31 00:00:00",
      fullRefresh: Boolean = false)

  val ScdValidFrom = "_valid_from"
  val ScdValidUntil = "_valid_until"
  val ScdIsCurrent = "_is_current"
  val ScdMaxTs = "9999-12-31 00:00:00"

  /** `--full-refresh` overrides any table strategy to create+replace except
    * ddl and Data Vault (reference materializer.go:30-43). */
  def effectiveStrategy(asset: Asset, ctx: Context): Option[Strategy] = {
    val s = asset.materialization.strategy
    if (!ctx.fullRefresh) s
    else s match {
      case Some(Strategy.DDL) | Some(Strategy.DataVaultHub) |
           Some(Strategy.DataVaultLink) | Some(Strategy.DataVaultSatellite) => s
      case Some(_) => Some(Strategy.CreateReplace)
      case scala.None => scala.None
    }
  }

  // ======================================================================
  // execute
  // ======================================================================

  /** Materialize `asset` whose rendered SELECT is `query`. */
  def execute(wh: Warehouse, asset: Asset, query: String, ctx: Context = Context()): Unit =
    asset.materialization.typ match {
      case MaterializationType.View if asset.name.contains('.') =>
        // Qualified view assets become real catalog views so checks and
        // downstream SQL referencing the full asset name resolve (reference
        // duckdb/materialization.go:81-83 CREATE OR REPLACE VIEW). An existing
        // TABLE under the name (asset switched table → view) is replaced
        // first — otherwise CREATE OR REPLACE VIEW fails and a stale table
        // would shadow the result. Falls back to a session temp view ONLY
        // for the temp-relation case (permanent views may not reference
        // temporary ones), after removing any stale permanent object that
        // would otherwise shadow the fallback.
        wh.ensureSchema(asset.name)
        // dropAny also reaps generation tables when the asset switched from
        // a table strategy (whose output is a generation view) to view
        def dropStale(): Unit =
          if (wh.spark.catalog.tableExists(asset.name))
            SessionCatalogWarehouse.dropAny(wh.spark, asset.name)
        val existsAsTable = wh.spark.catalog.tableExists(asset.name) &&
          (try wh.spark.catalog.getTable(asset.name).tableType != "VIEW"
           catch { case _: Exception => false })
        // a generation VIEW (asset switched table→view) must also vacate:
        // CREATE OR REPLACE VIEW would succeed over it but strand its
        // generations as orphans and leave a stale backing-cache entry
        if (existsAsTable ||
            SessionCatalogWarehouse.backingTable(wh.spark, asset.name).nonEmpty)
          dropStale()
        try wh.spark.sql(s"CREATE OR REPLACE VIEW ${asset.name} AS\n$query")
        catch { case _: org.apache.spark.sql.AnalysisException =>
          dropStale() // never leave a stale object shadowing the temp view
          wh.spark.sql(query).createOrReplaceTempView(asset.name.split('.').last)
        }
      case _ => executeDf(wh, asset, wh.spark.sql(query), ctx)
    }

  /** DataFrame-input variant — used by streaming foreachBatch (where the
    * batch lives in a cloned session) and the Python-handoff ingester.
    * `input` is by-name: the ddl strategy never evaluates its query. */
  def executeDf(wh: Warehouse, asset: Asset, input: => DataFrame, ctx: Context = Context()): Unit = {
    val name = asset.name
    // `cluster_strategy: zorder` upgrades cluster_by from a single-column
    // in-partition sort to a Morton-curve layout over ALL the cluster
    // columns (graft.ops.ZOrder) — tight parquet min/max stats on every
    // dimension. The plain clusterBy sort is suppressed downstream: it
    // would re-sort each partition by the first column and destroy the
    // curve order.
    // only for strategies that write the input's layout verbatim — merge/
    // scd2/delete+insert rebuild and reshuffle, so a pre-layout would be
    // paid and thrown away
    val zorder = asset.parameters.get("cluster_strategy").contains("zorder") &&
      asset.materialization.clusterBy.nonEmpty &&
      asset.materialization.typ == MaterializationType.Table &&
      Set[Strategy](Strategy.CreateReplace, Strategy.Append, Strategy.TruncateInsert)(
        effectiveStrategy(asset, ctx).getOrElse(Strategy.CreateReplace))
    val mat =
      if (zorder) asset.materialization.copy(clusterBy = Nil)
      else asset.materialization
    // `quality_filter: gopher` gates the asset's input rows through the
    // engine's Gopher rule battery before materialization — the
    // asset-surface face of [[graft.ops.TextAnalysis.gopherFilter]], so a
    // pipeline author reaches the quality gate from a .sql asset +
    // parameters instead of Scala. Rule columns are internal: the written
    // table keeps the query's own schema. Optional `quality_filter_lang`
    // names a language column for per-language stopword lists;
    // `quality_filter_text` overrides the text column (default `text`).
    def qualityGate(in: DataFrame): DataFrame =
      asset.parameters.get("quality_filter") match {
        case scala.None => in
        case Some("gopher") =>
          val before = in.columns
          graft.ops.TextAnalysis.gopherFilter(in,
              langCol = asset.parameters.get("quality_filter_lang").map(col),
              textCol = asset.parameters.getOrElse("quality_filter_text", "text"))
            .where(col("passes_gopher"))
            .select(before.map(col): _*)
        case Some("c4") =>
          val before = in.columns
          graft.ops.TextAnalysis.c4Filter(in,
              textCol = asset.parameters.getOrElse("quality_filter_text", "text"))
            .where(col("passes_c4"))
            .select(before.map(col): _*)
        case Some(other) => throw new IllegalArgumentException(
          s"${asset.name}: unknown quality_filter '$other' (supported: gopher, c4)")
      }
    lazy val gated: DataFrame = qualityGate(input)
    lazy val df: DataFrame =
      if (zorder) {
        val files = asset.parameters.get("zorder_files").map(_.toInt).getOrElse(
          wh.spark.conf.get("spark.sql.shuffle.partitions").toInt)
        val parts = asset.materialization.partitionBy
        val arranged =
          if (parts.isEmpty)
            graft.ops.ZOrder.cluster(gated, asset.materialization.clusterBy, files)
          else
            // partitioned: range-shard on (partition cols, z) so equal
            // partition keys stay contiguous AND each directory's files
            // come out z-disjoint (same layout the Compactor's
            // --zorder path writes)
            graft.ops.ZOrder.zValue(gated, asset.materialization.clusterBy)
              .repartitionByRange(files, (parts :+ "__z").map(col): _*)
              .sortWithinPartitions((parts :+ "__z").map(col): _*)
              .drop("__z")
        // the marker tells Warehouse.write the layout is deliberate — its
        // rebalance-by-partition clustering would scatter the curve order
        arranged.withColumn(SessionCatalogWarehouse.ArrangedMarker, lit(true))
      } else gated

    // `index: ivf|ivfpq` turns a TABLE asset into a declarative ANN-index
    // build: the asset's query emits the corpus, the materialization
    // persists the index artifacts (the `cluster_strategy: zorder` /
    // `quality_filter` precedent — a pipeline author reaches
    // saveIndex/savePqIndex from a .sql asset + parameters instead of
    // Scala). An `append` asset with an existing index routes ONLY the
    // batch under the FROZEN quantizer artifacts — the nightly-crawl
    // incremental shape of appendToIndex/appendToPqIndex.
    if (asset.parameters.contains("index")) {
      require(mat.typ == MaterializationType.Table,
        s"$name: `index` assets must materialize as a table " +
          s"(got ${mat.typ})")
      buildAnnIndex(wh, asset, df, ctx)
      analyzeIfRequested(wh, asset)
      return
    }

    // k-bounded-heap plans (an asset selecting through group-top-k /
    // capped-list engine SQL) execute under the scoped fallback raise;
    // every other asset keeps the session-default valve, so a pipeline
    // author's unbounded collect_list degrades to sort instead of OOMing.
    // The ddl strategy never evaluates its input, so it must not be
    // sniffed (the plan force would evaluate the by-name query).
    val isDdl = mat.typ == MaterializationType.Table &&
      effectiveStrategy(asset, ctx).getOrElse(Strategy.CreateReplace) == Strategy.DDL
    // `d` is by-name: the DDL strategy must never evaluate the asset's
    // (empty) query — only the Table/None/View branches force it
    def materialize(d: => DataFrame): Unit = mat.typ match {
      case MaterializationType.None =>
        // Run as-is without fetching to the driver (reference
        // materializer.go:23-27 executes without a result set). The noop v2
        // sink evaluates the full plan distributed; rows never leave executors.
        d.write.format("noop").mode("overwrite").save()
      case MaterializationType.View =>
        // In-session mapping of CREATE OR REPLACE VIEW (temp views may
        // reference other temp views; permanent views may not).
        d.createOrReplaceTempView(name.split('.').last)
      case MaterializationType.Table =>
        effectiveStrategy(asset, ctx).getOrElse(Strategy.CreateReplace) match {
          case Strategy.CreateReplace  => wh.createOrReplace(name, d, mat.partitionBy, mat.clusterBy, mat.bucketBy, mat.buckets)
          case Strategy.Append         =>
            if (!wh.exists(name)) wh.createOrReplace(name, d, mat.partitionBy, mat.clusterBy, mat.bucketBy, mat.buckets)
            else wh.append(name, d, mat.partitionBy, mat.clusterBy, mat.bucketBy, mat.buckets)
          case Strategy.TruncateInsert =>
            if (!wh.exists(name)) wh.createOrReplace(name, d, mat.partitionBy, mat.clusterBy, mat.bucketBy, mat.buckets)
            else wh.overwrite(name, d, mat.partitionBy, mat.clusterBy, mat.bucketBy, mat.buckets)
          case Strategy.DeleteInsert   => deleteInsert(wh, asset, d)
          case Strategy.Merge          => merge(wh, asset, d)
          case Strategy.TimeInterval   => timeInterval(wh, asset, d, ctx)
          case Strategy.DDL            => ddl(wh, asset)
          case Strategy.SCD2ByColumn   => scd2ByColumn(wh, asset, d, ctx)
          case Strategy.SCD2ByTime     => scd2ByTime(wh, asset, d, ctx)
          case Strategy.DataVaultHub       => datavaultHub(wh, asset, d, ctx)
          case Strategy.DataVaultLink      => datavaultHub(wh, asset, d, ctx) // same keyed-insert shape
          case Strategy.DataVaultSatellite => datavaultSatellite(wh, asset, d, ctx)
        }
        analyzeIfRequested(wh, asset)
    }
    // k-bounded-heap plans execute rebound onto a RAISED CLONE session
    // (never a shared-conf mutation — pipeline concurrency > 1 runs assets
    // on a thread pool over one session, so a conf set/restore here would
    // race every concurrent asset's planning). A View registers its plan
    // on the PARENT session (nothing executes, and the temp view must be
    // visible to downstream assets), so it is never rebound. Note the
    // composing strategies (merge/scd2/...) join the rebound frame with
    // target-table frames built on the parent session; their OUTER plan
    // executes under the parent conf — perf-only, and none of them carry
    // bounded heaps today.
    if (isDdl || mat.typ == MaterializationType.View) materialize(df)
    else {
      // bound once: `d` is by-name, and the rebind (plan sniff + clone)
      // must not re-run per reference inside the strategy dispatch
      lazy val rebound = graft.core.HeapAgg.maybeRebound(df)
      materialize(rebound)
    }
  }

  /** `index: ivf|ivfpq` asset builds. The asset NAME is the index table;
    * the quantizer artifacts land beside it as `<name>_centroids` (and
    * `<name>_codebooks` for ivfpq), so a later session — or a later
    * `append` run of the same asset — loads the frozen quantizers by
    * convention. Parameters: `index_id_col`/`index_vec_col` (default
    * vec_id/embedding), `index_nlist` (coarse lists, default 16),
    * `index_buckets` (bucketBy count, default 8), and for ivfpq
    * `index_m`/`index_k` (sub-quantizers / codes per book, defaults 8/16).
    *
    * Strategy semantics: `create+replace` (or a first `append` run) trains
    * the quantizers on the asset's own rows, persists them, and writes the
    * full index via the atomic generation swap; a later `append` run
    * NEVER retrains — it loads the saved artifacts and routes only the
    * batch (O(batch), the appendTo* contract; the pairing stamp fails
    * fast if the artifacts were replaced out from under the index). Other
    * strategies are refused: an index is an assignment under a frozen
    * quantizer, and merge/scd2-style rewrites would silently mix
    * geometries. */
  private def buildAnnIndex(wh: Warehouse, asset: Asset, df: DataFrame, ctx: Context): Unit = {
    import graft.ops.{Pq, Similarity}
    val spark = wh.spark
    val name = asset.name
    val kind = asset.parameters("index")
    require(kind == "ivf" || kind == "ivfpq" || kind == "signature",
      s"$name: unknown index '$kind' (supported: ivf, ivfpq, signature)")
    if (kind == "signature") { buildSignatureIndex(wh, asset, df, ctx); return }
    val idCol   = asset.parameters.getOrElse("index_id_col", "vec_id")
    val vecCol  = asset.parameters.getOrElse("index_vec_col", "embedding")
    val nlist   = asset.parameters.get("index_nlist").map(_.toInt).getOrElse(16)
    val buckets = asset.parameters.get("index_buckets").map(_.toInt).getOrElse(8)
    val m       = asset.parameters.get("index_m").map(_.toInt).getOrElse(8)
    val k       = asset.parameters.get("index_k").map(_.toInt).getOrElse(16)
    val centroidsTable = s"${name}_centroids"
    val booksTable     = s"${name}_codebooks"
    val strategy = effectiveStrategy(asset, ctx).getOrElse(Strategy.CreateReplace)
    require(strategy == Strategy.CreateReplace || strategy == Strategy.Append,
      s"$name: index assets support create+replace and append, got $strategy")
    wh.ensureSchema(name)
    if (strategy == Strategy.Append && wh.exists(name)) {
      // incremental: assign (+ encode) ONLY the batch under the FROZEN
      // artifacts — never retrain, never rescan the built corpus
      val centroids = Similarity.loadCentroids(spark, centroidsTable)
      if (kind == "ivf")
        Similarity.appendToIndex(spark, df, centroids, name, idCol, vecCol, buckets)
      else
        Pq.appendToPqIndex(spark, df, centroids,
          Pq.loadCodebooks(spark, booksTable), name, idCol, vecCol, buckets)
    } else {
      val corpus = df.where(col(vecCol).isNotNull)
      val centroids = Similarity.ivfCentroids(corpus, nlist, idCol, vecCol)
      Similarity.saveCentroids(spark, centroids, centroidsTable)
      if (kind == "ivf")
        Similarity.saveIndex(spark, df, centroids, name, idCol, vecCol, buckets)
      else {
        val books = Pq.residualCodebooks(corpus, centroids, m, k, idCol, vecCol)
        Pq.saveCodebooks(spark, books, booksTable)
        Pq.savePqIndex(spark, df, centroids, books, name, idCol, vecCol, buckets)
      }
    }
  }

  /** `index: signature` asset builds — the banded-signature face of
    * [[buildAnnIndex]] (hamming near-dup dedup instead of vector
    * retrieval). The asset's query emits (id, signature) rows — or raw
    * text with `index_signature: simhash`, which runs
    * [[graft.ops.Dedup.simhash]] over `index_text_col` (default `text`)
    * first, making the whole signature+index build declarative.
    * Parameters: `index_id_col` (default doc_id), `index_sig_col`
    * (default simhash), `index_max_hamming` (default 3), `index_bands`
    * (0 = maxHamming+1), `index_sig_bits` (default 60), `index_buckets`
    * (default 8). Strategy semantics mirror [[buildAnnIndex]]:
    * create+replace (or a first append) builds the full artifact, a later
    * `append` run bands ONLY the batch under the artifact's FROZEN
    * geometry (the stamp is the authority — appendToSignatureIndex reads
    * it and fails fast when absent or unparseable). */
  private def buildSignatureIndex(wh: Warehouse, asset: Asset, df: DataFrame,
                                  ctx: Context): Unit = {
    import graft.ops.Dedup
    val name = asset.name
    val idCol    = asset.parameters.getOrElse("index_id_col", "doc_id")
    val sigCol   = asset.parameters.getOrElse("index_sig_col", "simhash")
    val maxHam   = asset.parameters.get("index_max_hamming").map(_.toInt).getOrElse(3)
    val bands    = asset.parameters.get("index_bands").map(_.toInt).getOrElse(0)
    val sigBits  = asset.parameters.get("index_sig_bits").map(_.toInt).getOrElse(60)
    val buckets  = asset.parameters.get("index_buckets").map(_.toInt).getOrElse(8)
    val strategy = effectiveStrategy(asset, ctx).getOrElse(Strategy.CreateReplace)
    require(strategy == Strategy.CreateReplace || strategy == Strategy.Append,
      s"$name: index assets support create+replace and append, got $strategy")
    val sigs = asset.parameters.get("index_signature") match {
      case scala.None => df
      case Some("simhash") =>
        Dedup.simhash(df, bits = sigBits, idCol = idCol,
          textCol = asset.parameters.getOrElse("index_text_col", "text"))
      case Some(other) => throw new IllegalArgumentException(
        s"$name: unknown index_signature '$other' (supported: simhash)")
    }
    require(sigs.columns.contains(sigCol),
      s"$name: the asset query must emit a '$sigCol' signature column " +
        "(or set index_signature: simhash over a text column)")
    wh.ensureSchema(name)
    if (strategy == Strategy.Append && wh.exists(name))
      Dedup.appendToSignatureIndex(wh.spark, sigs, name, idCol, sigCol, buckets)
    else
      Dedup.saveSignatureIndex(wh.spark, sigs, name, maxHam, bands, sigBits,
        idCol, sigCol, buckets)
  }

  /** Post-write `ANALYZE TABLE` when the asset opts in (`analyze: true`,
    * or `analyze: columns` which also collects per-column stats for the
    * asset's declared columns). Row counts and column NDV/min/max are what
    * the cost-based optimizer needs to pick broadcast sides and join
    * orders for DOWNSTREAM assets reading this table — at warehouse scale
    * a freshly-materialized fact with no stats is planned from file sizes
    * alone. The view indirection is resolved first: ANALYZE targets the
    * backing generation table, not the view. */
  private def analyzeIfRequested(wh: Warehouse, asset: Asset): Unit =
    asset.parameters.get("analyze").filter(v => v == "true" || v == "columns")
      .foreach { mode =>
        val target = SessionCatalogWarehouse
          .backingTable(wh.spark, asset.name).getOrElse(asset.name)
        val cols = asset.columns.map(_.name)
          .filter(c => wh.spark.table(target).columns.contains(c))
        // backtick-quote identifiers: a column named `order` or `from`
        // must not fail the post-write analyze (and thereby the run)
        def q(id: String) = "`" + id.replace("`", "``") + "`"
        val forCols =
          if (mode == "columns" && cols.nonEmpty)
            s" FOR COLUMNS ${cols.map(q).mkString(", ")}"
          else ""
        val qualified = target.split('.').map(q).mkString(".")
        wh.spark.sql(s"ANALYZE TABLE $qualified COMPUTE STATISTICS$forCols")
      }

  /** delete+insert: drop target rows whose incremental key appears in the new
    * batch, then insert the batch (reference duckdb/materialization.go:89-109).
    * IN-list semantics: NULL-keyed target rows are never deleted. */
  private def deleteInsert(wh: Warehouse, asset: Asset, df: DataFrame): Unit = {
    val k = asset.materialization.incrementalKey.getOrElse(
      throw new IllegalArgumentException(s"${asset.name}: delete+insert needs incremental_key"))
    if (!wh.exists(asset.name)) { wh.createOrReplace(asset.name, df, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return }
    val incoming = df.cache() // read once: keys + insert
    val keys = incoming.select(col(k)).where(col(k).isNotNull).distinct()
    val kept = wh.table(asset.name).join(keys, Seq(k), "left_anti")
    wh.createOrReplace(asset.name, kept.unionByName(incoming), asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
    incoming.unpersist()
  }

  /** merge/upsert keyed on primary_key columns; only update_on_merge columns
    * take the source value on match (reference duckdb/materialization.go:111-170;
    * NULL-safe ON like bigquery/materialization.go:100 via <=>). */
  private def merge(wh: Warehouse, asset: Asset, df: DataFrame): Unit = {
    val pks = asset.primaryKeys
    require(pks.nonEmpty, s"${asset.name}: merge needs primary_key columns")
    if (!wh.exists(asset.name)) { wh.createOrReplace(asset.name, df, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return }
    val updateCols = asset.mergeUpdateColumns.toSet
    val target = wh.table(asset.name)
    val cols = target.columns.toSeq

    // dedupe source on the pk so the upsert is deterministic. Frames alias as
    // target/source — the names render() and the reference use — so an
    // incremental_predicate written per convention ("target.updated_at > …")
    // resolves here too (reference ansisql/materialization.go:23-34).
    val src = df.dropDuplicates(pks).withColumn("__s", lit(1))
    val tgt = target.withColumn("__t", lit(1))
    val joinCond = pks.map(k => tgt(k) <=> src(k)).reduce(_ && _)
    val extraOn = asset.materialization.incrementalPredicate.map(expr).map(_ && joinCond)
    val joined = tgt.alias("target").join(src.alias("source"), extraOn.getOrElse(joinCond), "full_outer")

    val mergeSqlByCol = asset.columns.filter(_.mergeSql.nonEmpty)
      .map(c => c.name -> c.mergeSql).toMap
    val out = cols.map { c =>
      val tC = col(s"target.$c"); val sC = col(s"source.$c")
      // matched value: merge_sql expression > update_on_merge source > target
      val matchedValue = mergeSqlByCol.get(c).map(expr)
        .getOrElse(if (updateCols.contains(c)) sC else tC)
      val merged =
        when(col("target.__t").isNull, sC)                            // insert
          .when(col("source.__s").isNull, tC)                         // untouched
          .otherwise(matchedValue)                                    // matched
      merged.as(c)
    }
    wh.createOrReplace(asset.name, joined.select(out: _*), asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  /** time_interval: replace the [start,end] window of the incremental key
    * (reference duckdb/materialization.go:197-231). NULL-keyed rows survive
    * the delete, like SQL DELETE WHERE k BETWEEN … */
  private def timeInterval(wh: Warehouse, asset: Asset, df: DataFrame, ctx: Context): Unit = {
    val k = asset.materialization.incrementalKey.getOrElse(
      throw new IllegalArgumentException(s"${asset.name}: time_interval needs incremental_key"))
    if (!wh.exists(asset.name)) { wh.createOrReplace(asset.name, df, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return }
    val (lo, hi) = asset.materialization.timeGranularity match {
      case TimeGranularity.Date => (to_date(lit(ctx.startTs.take(10))), to_date(lit(ctx.endTs.take(10))))
      case TimeGranularity.Timestamp => (to_timestamp(lit(ctx.startTs)), to_timestamp(lit(ctx.endTs)))
    }
    val inWindow = col(k) >= lo && col(k) <= hi
    val kept = wh.table(asset.name).where(coalesce(!inWindow, lit(true)))
    // At scale with partition_by=k this becomes a partition overwrite
    // (INSERT OVERWRITE … replaceWhere) instead of a full rebuild.
    wh.createOrReplace(asset.name, kept.unionByName(df), asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  /** ddl: CREATE TABLE IF NOT EXISTS from declared columns
    * (reference duckdb/materialization.go:233-278). */
  private def ddl(wh: Warehouse, asset: Asset): Unit = {
    if (wh.exists(asset.name)) return
    val schema = StructType.fromDDL(
      asset.columns.map(c => s"${c.name} ${if (c.typ.nonEmpty) c.typ else "STRING"}").mkString(", "))
    val empty = wh.spark.createDataFrame(
      wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    wh.createOrReplace(asset.name, empty, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  /** SCD2 shared plumbing: initial load stamps every row current-as-of-now. */
  private def scd2Initial(df: DataFrame, ctx: Context): DataFrame =
    df.withColumn(ScdValidFrom, to_timestamp(lit(ctx.now)))
      .withColumn(ScdValidUntil, to_timestamp(lit(ScdMaxTs)))
      .withColumn(ScdIsCurrent, lit(true))

  /** scd2_by_column: change = any non-PK column differs; changed or vanished
    * current rows expire, new/changed rows insert (reference
    * duckdb/materialization.go:280-410 — rebuilt via UNION ALL, same here). */
  private def scd2ByColumn(wh: Warehouse, asset: Asset, df: DataFrame, ctx: Context): Unit = {
    val pks = asset.primaryKeys
    require(pks.nonEmpty, s"${asset.name}: scd2_by_column needs primary_key columns")
    if (!wh.exists(asset.name)) {
      wh.createOrReplace(asset.name, scd2Initial(df, ctx), asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return
    }
    val target = wh.table(asset.name)
    val dataCols = target.columns.toSeq.filterNot(Seq(ScdValidFrom, ScdValidUntil, ScdIsCurrent).contains)
    val attrCols = dataCols.filterNot(pks.contains)

    val src = df.dropDuplicates(pks).withColumn("__s", lit(1))
    val curr = target.where(col(ScdIsCurrent)).withColumn("__t", lit(1))
    val hist = target.where(!col(ScdIsCurrent))

    val joinCond = pks.map(k => curr(k) <=> src(k)).reduce(_ && _)
    val j = curr.alias("t").join(src.alias("s"), joinCond, "full_outer")
    val changed: SCol = attrCols
      .map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val nowTs = to_timestamp(lit(ctx.now))
    val maxTs = to_timestamp(lit(ScdMaxTs))

    val matched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val vanished = col("t.__t").isNotNull && col("s.__s").isNull
    val newRow = col("t.__t").isNull

    // surviving current rows (unchanged)
    val keepCurr = j.where(matched && !changed)
      .select(dataCols.map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$ScdValidFrom").as(ScdValidFrom), maxTs.as(ScdValidUntil), lit(true).as(ScdIsCurrent)): _*)
    // expired: changed or vanished
    val expired = j.where((matched && changed) || vanished)
      .select(dataCols.map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$ScdValidFrom").as(ScdValidFrom), nowTs.as(ScdValidUntil), lit(false).as(ScdIsCurrent)): _*)
    // inserts: brand new or changed
    val inserted = j.where(newRow || (matched && changed))
      .select(dataCols.map(c => col(s"s.$c").as(c)) ++
        Seq(nowTs.as(ScdValidFrom), maxTs.as(ScdValidUntil), lit(true).as(ScdIsCurrent)): _*)

    val rebuilt = hist.select((dataCols ++ Seq(ScdValidFrom, ScdValidUntil, ScdIsCurrent)).map(col): _*)
      .unionByName(keepCurr).unionByName(expired).unionByName(inserted)
    wh.createOrReplace(asset.name, rebuilt, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  /** scd2_by_time: change-detection = CAST(s.incremental_key AS TIMESTAMP) >
    * t._valid_from (reference duckdb/materialization.go:412-528). */
  private def scd2ByTime(wh: Warehouse, asset: Asset, df: DataFrame, ctx: Context): Unit = {
    val pks = asset.primaryKeys
    val ik = asset.materialization.incrementalKey.getOrElse(
      throw new IllegalArgumentException(s"${asset.name}: scd2_by_time needs incremental_key"))
    require(pks.nonEmpty, s"${asset.name}: scd2_by_time needs primary_key columns")
    if (!wh.exists(asset.name)) {
      val init = df
        .withColumn(ScdValidFrom, col(ik).cast("timestamp"))
        .withColumn(ScdValidUntil, to_timestamp(lit(ScdMaxTs)))
        .withColumn(ScdIsCurrent, lit(true))
      wh.createOrReplace(asset.name, init, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return
    }
    val target = wh.table(asset.name)
    val dataCols = target.columns.toSeq.filterNot(Seq(ScdValidFrom, ScdValidUntil, ScdIsCurrent).contains)

    val src = df.dropDuplicates(pks).withColumn("__s", lit(1))
    val curr = target.where(col(ScdIsCurrent)).withColumn("__t", lit(1))
    val hist = target.where(!col(ScdIsCurrent))

    val joinCond = pks.map(k => curr(k) <=> src(k)).reduce(_ && _)
    val j = curr.alias("t").join(src.alias("s"), joinCond, "full_outer")
    val newer = col(s"s.$ik").cast("timestamp") > col(s"t.$ScdValidFrom")
    val maxTs = to_timestamp(lit(ScdMaxTs))

    val matched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val vanished = col("t.__t").isNotNull && col("s.__s").isNull
    val newRow = col("t.__t").isNull
    val nowTs = to_timestamp(lit(ctx.now))

    val keepCurr = j.where(matched && !newer)
      .select(dataCols.map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$ScdValidFrom").as(ScdValidFrom), maxTs.as(ScdValidUntil), lit(true).as(ScdIsCurrent)): _*)
    val expired = j.where((matched && newer) || vanished)
      .select(dataCols.map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$ScdValidFrom").as(ScdValidFrom),
          when(vanished, nowTs).otherwise(col(s"s.$ik").cast("timestamp")).as(ScdValidUntil),
          lit(false).as(ScdIsCurrent)): _*)
    val inserted = j.where(newRow || (matched && newer))
      .select(dataCols.map(c => col(s"s.$c").as(c)) ++
        Seq(when(newRow, col(s"s.$ik").cast("timestamp"))
              .otherwise(col(s"s.$ik").cast("timestamp")).as(ScdValidFrom),
          maxTs.as(ScdValidUntil), lit(true).as(ScdIsCurrent)): _*)

    val rebuilt = hist.select((dataCols ++ Seq(ScdValidFrom, ScdValidUntil, ScdIsCurrent)).map(col): _*)
      .unionByName(keepCurr).unionByName(expired).unionByName(inserted)
    wh.createOrReplace(asset.name, rebuilt, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  /** datavault hub/link: insert-only distinct keyed rows not already present
    * (reference duckdb/datavault_materialization.go:11-126). The anti-join is
    * on the hash key — broadcastable when the increment is small. */
  private def datavaultHub(wh: Warehouse, asset: Asset, df: DataFrame, ctx: Context): Unit = {
    val businessKeys = asset.parameters.get("business_keys")
      .map(_.split(',').map(_.trim).toSeq)
      .getOrElse(asset.primaryKeys)
    require(businessKeys.nonEmpty, s"${asset.name}: datavault needs business_keys or primary_key")
    val recordSrc = asset.parameters.getOrElse("record_source", "graft")
    val hk = s"${asset.name.split('.').last}_hk"

    val hashed = df.select(
      md5(concat_ws("||", businessKeys.map(c => coalesce(col(c).cast("string"), lit(""))): _*)).as(hk)
        +: businessKeys.map(col): _*)
      .distinct()
      .withColumn("load_dt", to_timestamp(lit(ctx.now)))
      .withColumn("record_src", lit(recordSrc))

    if (!wh.exists(asset.name)) { wh.createOrReplace(asset.name, hashed, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return }
    val fresh = hashed.join(wh.table(asset.name).select(hk), Seq(hk), "left_anti")
    wh.append(asset.name, fresh, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  /** datavault satellite: dedup source, drop consecutive duplicate hashdiffs
    * via LAG, insert rows whose hashdiff differs from the satellite tip
    * (reference duckdb/datavault_materialization.go:127-230). */
  private def datavaultSatellite(wh: Warehouse, asset: Asset, df: DataFrame, ctx: Context): Unit = {
    val pks = asset.primaryKeys
    require(pks.nonEmpty, s"${asset.name}: satellite needs primary_key (parent key)")
    val loadCol = asset.materialization.incrementalKey.getOrElse("load_dt")
    val attrCols = df.columns.toSeq.filterNot(c => pks.contains(c) || c == loadCol)
    val hk = "parent_hk"

    import org.apache.spark.sql.expressions.Window
    val hashed = df.withColumn(hk,
        md5(concat_ws("||", pks.map(c => coalesce(col(c).cast("string"), lit(""))): _*)))
      .withColumn("hashdiff",
        md5(concat_ws("||", attrCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)))
    val w = Window.partitionBy(hk).orderBy(col(loadCol))
    val dedup = hashed
      .withColumn("__prev", lag(col("hashdiff"), 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> col("hashdiff")))
      .drop("__prev")

    if (!wh.exists(asset.name)) { wh.createOrReplace(asset.name, dedup, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets); return }
    // only rows newer than + different from the current tip per parent key
    val tip = wh.table(asset.name)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(hk)).orderBy(col(loadCol).desc)))
      .where(col("__rn") === 1)
      .select(col(hk).as("tip_hk"), col("hashdiff").as("tip_hashdiff"), col(loadCol).as("tip_load"))
    val fresh = dedup.join(tip, dedup(hk) === col("tip_hk"), "left")
      .where(col("tip_hk").isNull ||
        (col(loadCol) > col("tip_load") && !(col("hashdiff") <=> col("tip_hashdiff"))))
      .drop("tip_hk", "tip_hashdiff", "tip_load")
    wh.append(asset.name, fresh, asset.materialization.partitionBy, asset.materialization.clusterBy,
      asset.materialization.bucketBy, asset.materialization.buckets)
  }

  // ======================================================================
  // render — the SQL program each strategy stands for (Spark SQL dialect)
  // ======================================================================

  def render(asset: Asset, query: String, ctx: Context = Context()): Seq[String] = {
    val name = asset.name
    val mat = asset.materialization
    val q = query.trim.stripSuffix(";")
    mat.typ match {
      case MaterializationType.None => Seq(q)
      case MaterializationType.View => Seq(s"CREATE OR REPLACE VIEW $name AS\n$q")
      case MaterializationType.Table =>
        effectiveStrategy(asset, ctx).getOrElse(Strategy.CreateReplace) match {
          case Strategy.CreateReplace => Seq(s"CREATE OR REPLACE TABLE $name AS\n$q")
          case Strategy.Append => Seq(s"INSERT INTO $name\n$q")
          case Strategy.TruncateInsert => Seq(s"TRUNCATE TABLE $name", s"INSERT INTO $name\n$q")
          case Strategy.DeleteInsert =>
            val k = mat.incrementalKey.getOrElse("?")
            Seq(
              s"CREATE OR REPLACE TEMPORARY VIEW __graft_tmp AS\n$q",
              s"DELETE FROM $name WHERE $k IN (SELECT DISTINCT $k FROM __graft_tmp)",
              s"INSERT INTO $name SELECT * FROM __graft_tmp")
          case Strategy.Merge =>
            val pks = asset.primaryKeys
            val on = pks.map(k => s"target.$k <=> source.$k").mkString(" AND ")
            val upd = asset.columns
              .filter(c => c.mergeSql.nonEmpty || c.updateOnMerge)
              .map(c => s"target.${c.name} = " +
                (if (c.mergeSql.nonEmpty) c.mergeSql else s"source.${c.name}"))
              .mkString(", ")
            val updClause = if (upd.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $upd\n" else ""
            Seq(s"MERGE INTO $name AS target\nUSING ($q) AS source\nON $on\n$updClause" +
              "WHEN NOT MATCHED THEN INSERT *")
          case Strategy.TimeInterval =>
            val k = mat.incrementalKey.getOrElse("?")
            val (lo, hi) = mat.timeGranularity match {
              case TimeGranularity.Date => (s"DATE '${ctx.startTs.take(10)}'", s"DATE '${ctx.endTs.take(10)}'")
              case TimeGranularity.Timestamp => (s"TIMESTAMP '${ctx.startTs}'", s"TIMESTAMP '${ctx.endTs}'")
            }
            Seq(
              s"DELETE FROM $name WHERE $k BETWEEN $lo AND $hi",
              s"INSERT INTO $name\n$q")
          case Strategy.DDL =>
            val cols = asset.columns.map { c =>
              val t = if (c.typ.nonEmpty) c.typ else "STRING"
              val nn = if (!c.nullable) " NOT NULL" else ""
              val cm = if (c.description.nonEmpty) s" COMMENT '${c.description.replace("'", "''")}'" else ""
              s"  ${c.name} $t$nn$cm"
            }.mkString(",\n")
            val part = if (mat.partitionBy.nonEmpty) s"\nPARTITIONED BY (${mat.partitionBy.mkString(", ")})" else ""
            Seq(s"CREATE TABLE IF NOT EXISTS $name (\n$cols\n) USING parquet$part")
          case Strategy.SCD2ByColumn | Strategy.SCD2ByTime =>
            Seq(s"-- scd2 rebuild of $name (CREATE OR REPLACE … UNION ALL program; executed natively)\n" +
              s"CREATE OR REPLACE TABLE $name AS\n$q")
          case Strategy.DataVaultHub | Strategy.DataVaultLink =>
            Seq(s"INSERT INTO $name SELECT DISTINCT md5(…business keys…), … FROM ($q) " +
              s"WHERE hash_key NOT IN (SELECT hash_key FROM $name)")
          case Strategy.DataVaultSatellite =>
            Seq(s"INSERT INTO $name -- LAG(hashdiff) dedup over ($q)")
        }
    }
  }
}
