package graft.exec

import java.time.LocalDateTime
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.SqlBridge
import graft.checks.Checks
import graft.config.Environment
import graft.materialize.{Materializer, SessionCatalogWarehouse, Warehouse}
import graft.model._
import graft.render.Template
import graft.sources.Seeds

/** End-to-end pipeline execution: render → materialize → checks, scheduled
  * as a DAG (reference cmd/run.go:571-1573 flow; operator dispatch mirrors
  * SetupExecutors run.go:1953-2300).
  *
  * With a dev [[Environment]] (schema_prefix), every asset materializes under
  * its prefixed physical name and table references to pipeline assets are
  * rewritten at the plan level (reference pkg/devenv/modifier.go +
  * RenameTables parser.go:263-270) — string literals and comments untouched.
  */
final class PipelineRunner(
    spark: SparkSession,
    baseDir: String = ".",
    startDate: LocalDateTime = LocalDateTime.of(2024, 1, 1, 0, 0),
    endDate: LocalDateTime = LocalDateTime.of(2024, 1, 2, 0, 0),
    fullRefresh: Boolean = false,
    frozenNow: Option[String] = None,
    /** Run-level `--sensor-mode` override (reference cmd/run.go `--sensor-mode`
      * skip|once|wait); None = per-asset `mode` parameter (default once). */
    sensorMode: Option[String] = None,
    /** Selected `.graft.yml` environment (connections + dev schema_prefix). */
    environment: Environment = Environment(),
    /** Run-level `--push-metadata` (reference cmd/run.go): push descriptions
      * for every asset, not just those opting in via parameters. */
    pushMetadata: Boolean = false) {

  val warehouse: Warehouse = new SessionCatalogWarehouse(spark)

  if (environment.fullRefreshRestricted && fullRefresh)
    throw new IllegalArgumentException(
      s"environment '${environment.name}' restricts --full-refresh")

  def physical(name: String): String = environment.physicalName(name)

  private def renameMap(pipeline: Pipeline): Map[String, String] =
    environment.renameMapping(pipeline.assets.map(_.name))

  /** Per-asset run window: interval_modifiers shift the pipeline dates
    * (reference pipeline.go:1375-1499; applied python/helper.go:90-110). */
  private def assetDates(asset: Asset): (LocalDateTime, LocalDateTime) = (
    asset.intervalModifiers.start.map(IntervalModifiers.shift(startDate, _)).getOrElse(startDate),
    asset.intervalModifiers.end.map(IntervalModifiers.shift(endDate, _)).getOrElse(endDate))

  def templateContext(pipeline: Pipeline, asset: Asset): Template.Ctx = {
    val (s, e) = assetDates(asset)
    Template.context(s, e, executionDate = s,
      pipelineName = pipeline.name, runId = "run",
      fullRefresh = fullRefresh, thisAsset = physical(asset.name),
      vars = pipeline.variables)
  }

  private def matContext(asset: Asset): Materializer.Context = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val (s, e) = assetDates(asset)
    Materializer.Context(
      now = frozenNow.getOrElse(java.time.LocalDateTime.now.format(fmt)),
      startTs = s.format(fmt), endTs = e.format(fmt),
      fullRefresh = fullRefresh)
  }

  /** User macro files `*.sql` files in the macros dir, prepended to every render (reference
    * pkg/jinja/jinja.go:37-68 LoadMacros). */
  private lazy val macroPrelude: String = Template.loadMacros(baseDir)

  /** Render an asset's SQL (hooks around it; reference pipeline/hooks.go). */
  def renderAsset(pipeline: Pipeline, asset: Asset): String =
    Template.render(macroPrelude + asset.content, templateContext(pipeline, asset)).trim

  def executeInstance(pipeline: Pipeline)(i: Scheduler.Instance): Unit = {
    // tag this attempt's Spark jobs so a timeout can cancel them for real
    // (thread interrupts alone don't stop running Spark stages)
    spark.sparkContext.setJobGroup(i.id, s"graft:${i.id}", interruptOnCancel = true)
    try executeInstanceBody(pipeline)(i)
    finally spark.sparkContext.clearJobGroup()
  }

  private def executeInstanceBody(pipeline: Pipeline)(i: Scheduler.Instance): Unit = i.typ match {
    case Scheduler.Main => executeMain(pipeline, i.asset)
    case Scheduler.ColumnCheckInstance(column, ck) =>
      val r = Checks.run(spark, physical(i.asset.name), column, ck,
        Checks.annotation(pipeline.name, i.asset.name, column, ck.name))
      if (!r.passed)
        throw new RuntimeException(s"check failed: ${i.asset.name}.$column ${ck.name} " +
          s"(expected ${r.expected}, got ${r.actual})")
    case Scheduler.CustomCheckInstance(ck) =>
      val rendered = ck.copy(query =
        Template.render(macroPrelude + ck.query, templateContext(pipeline, i.asset)).trim)
      val r = Checks.runCustom(spark, rendered, renameMap(pipeline))
      if (!r.passed)
        throw new RuntimeException(s"custom check failed: ${ck.name} " +
          s"(expected ${r.expected}, got ${r.actual})")
  }

  def executeMain(pipeline: Pipeline, asset: Asset): Unit = {
    // hook lists (reference pipeline/hooks.go:24-54) + single-param legacy form
    val pre = asset.hooks.pre ++ asset.parameters.get("pre_hook").toSeq
    val post = asset.hooks.post ++ asset.parameters.get("post_hook").toSeq
    val rename = renameMap(pipeline)
    def hook(h: String): Unit = {
      val rendered = Template.render(macroPrelude + h, templateContext(pipeline, asset)).trim
      if (rename.isEmpty) spark.sql(rendered)
      else SqlBridge.renameTablesSql(spark, rendered, rename,
        environment.physicalName).foreach(_ => ())
    }
    pre.foreach(hook)
    val target = if (rename.isEmpty) asset else asset.copy(name = physical(asset.name))
    // retrieval-serving assets (`serve:` parameter) drain their query feed
    // once per scheduled run — the ingest AvailableNow contract; `graft
    // serve` / `run --stream` is the blocking foreground form
    if (Serving.isServing(asset)) {
      Serving.run(warehouse, resolveConnection(target), foreground = false,
        physicalName = if (rename.isEmpty) identity else physical)
      post.foreach(hook)
      return
    }
    asset.assetType match {
      case AssetType.Empty => () // pure DAG node (reference executor/empty.go)
      case AssetType.Seed =>
        warehouse.createOrReplace(target.name, Seeds.load(spark, asset, baseDir),
          asset.materialization.partitionBy)
      case AssetType.Ingest =>
        graft.sources.Ingest.run(warehouse, resolveConnection(target), baseDir, matContext(asset))
      case AssetType.SparkPython =>
        graft.sources.PythonRunner.run(warehouse, target, baseDir, matContext(asset),
          templateContext(pipeline, asset), environment)
      case AssetType.SensorQuery =>
        surfaceSkip(asset)(Sensors.querySensor(spark, renderAsset(pipeline, asset),
          mode = modeFor(asset), pokeIntervalMs = pokeMs(asset), timeoutMs = sensorTimeoutMs(asset)))
      case AssetType.SensorTable =>
        val t = asset.parameters.getOrElse("table", asset.content.trim)
        surfaceSkip(asset)(Sensors.tableSensor(spark, rename.getOrElse(t, t),
          mode = modeFor(asset), pokeIntervalMs = pokeMs(asset), timeoutMs = sensorTimeoutMs(asset)))
      case _ =>
        val sql = renderAsset(pipeline, asset)
        val statements = graft.render.QuerySplitter.split(sql)
        if (statements.length > 1) {
          // multi-statement script asset: run each statement in order
          // (reference duckdb/operator.go:55-161 splits then executes);
          // materialization strategies need exactly one query
          require(asset.materialization.typ == MaterializationType.None,
            s"${asset.name}: materialization requires a single query, " +
              s"got ${statements.length} statements")
          statements.foreach { st =>
            // dev env: asset-name refs rename per the map, and any OTHER
            // write/DDL target gets the sandbox prefix so script DDL can
            // never land on prod names (ADVICE r2, devenv isolation)
            val df = if (rename.isEmpty) spark.sql(st)
                     else SqlBridge.renameTablesSql(spark, st, rename,
                       environment.physicalName)
            df.foreach(_ => ()) // force SELECTs; commands already ran
          }
        } else if (rename.isEmpty) {
          Materializer.execute(warehouse, asset, sql, matContext(asset))
        } else {
          // dev env: plan-level rename of upstream refs, prefixed target
          val plan = SqlBridge.renameTables(
            spark.sessionState.sqlParser.parsePlan(sql), rename)
          val renamedDf = SqlBridge.ofRows(spark, plan)
          if (asset.materialization.typ == MaterializationType.View)
            // a renamed plan has no SQL text to CREATE VIEW from, and a temp
            // view can't carry the prefixed qualified name — in the dev
            // sandbox, view assets materialize as tables under the physical
            // name so downstream renames and checks resolve
            warehouse.createOrReplace(target.name, renamedDf)
          else
            Materializer.executeDf(warehouse, target, renamedDf, matContext(asset))
        }
    }
    // metadata push: descriptions → catalog comments (reference
    // cmd/run.go:2007-2038; per-asset opt-in or run-level --push-metadata)
    if ((pushMetadata || asset.parameters.get("push_metadata").contains("true")) &&
        warehouse.exists(target.name))
      graft.materialize.MetadataPush.push(spark, asset, target.name)
    post.foreach(hook)
  }

  /** Resolve `source_connection` through the environment's connections into
    * the concrete source_uri + reader options (reference
    * ingestruri.ForConnection, pkg/ingestr/operator.go:213-220). */
  /** `run --stream` (reference cmd/run.go:918-946): run exactly ONE
    * broker/CDC streaming asset in the FOREGROUND. The asset's
    * `flush_interval` becomes a continuous ProcessingTime trigger, so the
    * call blocks until the streaming query is stopped or the process is
    * interrupted (without `flush_interval` the source drains once and
    * returns). Checks and metadata push are skipped — a stream never
    * "succeeds", so they would run against a moving table. */
  def runStreamForeground(pipeline: Pipeline, assetName: String): Unit = {
    val asset = pipeline.asset(assetName).getOrElse(
      throw new IllegalArgumentException(s"no such asset: $assetName"))
    val rename = renameMap(pipeline)
    val target = if (rename.isEmpty) asset else asset.copy(name = physical(asset.name))
    val connected = resolveConnection(target)
    // retrieval-serving assets (`serve: ann|ivfadc|rerank|hamming`) route
    // to the serving tiers instead of the ingest writer — same foreground
    // contract, reading a PERSISTED index and appending hits to the sink
    if (Serving.isServing(connected)) {
      Serving.run(warehouse, connected, foreground = true,
        physicalName = if (rename.isEmpty) identity else physical)
      return
    }
    val resolved = graft.sources.Ingest.brokerResolved(connected).getOrElse(
      throw new IllegalArgumentException(
        s"${asset.name} is not a streaming asset; --stream requires a " +
          "broker/CDC source_uri (kafka://…, <scheme>+cdc://…, or " +
          "source_stream: true on a file source)"))
    graft.sources.Ingest.runStream(warehouse, connected, resolved,
      matContext(asset), foreground = true)
  }

  private def resolveConnection(asset: Asset): Asset =
    asset.parameters.get("source_connection") match {
      case scala.None => asset
      case Some(cn) =>
        val conn = environment.connection(cn).getOrElse(
          throw new IllegalArgumentException(
            s"${asset.name}: connection '$cn' not defined in environment '${environment.name}'"))
        val opts = conn.options.map { case (k, v) => s"jdbc_$k" -> v }
        asset.copy(parameters = asset.parameters ++ opts + ("source_uri" -> conn.uri))
    }

  private def modeFor(asset: Asset): String =
    sensorMode.getOrElse(asset.parameters.getOrElse("mode", "once"))

  /** poke_interval (seconds, default 30 — reference sensor docs) and the
    * sensor's own timeout (default 8h, reference ansisql/operator.go). */
  private def pokeMs(asset: Asset): Long =
    asset.parameters.get("poke_interval").map(_.toLong * 1000).getOrElse(30000L)
  private def sensorTimeoutMs(asset: Asset): Long =
    asset.timeoutSeconds.map(_ * 1000).getOrElse(8L * 3600 * 1000)

  /** A skip-mode sensor whose condition is unmet marks its instance Skipped
    * (and downstream cascades) instead of silently succeeding. */
  private def surfaceSkip(asset: Asset)(outcome: Sensors.Outcome): Unit = outcome match {
    case Sensors.SkipRun => throw Scheduler.SkipTask(s"sensor condition unmet: ${asset.name}")
    case Sensors.Met     => ()
  }

  /** Run the pipeline DAG; returns per-instance results. Run state persists
    * under baseDir/logs/runs for `--continue` (pass `continueRun = true` to
    * skip instances that already succeeded last run). */
  def run(pipeline: Pipeline, selectorTerms: Seq[String] = Nil,
          concurrency: Int = 0,
          continueRun: Boolean = false,
          only: Seq[String] = Nil): Map[String, Scheduler.Result] = {
    val selected =
      if (selectorTerms.isEmpty) scala.None
      else Some(Selector.select(pipeline, selectorTerms))
    val completed =
      if (continueRun) RunState.completedIds(baseDir, pipeline.name) else Set.empty[String]
    val results = Scheduler.run(pipeline, executeInstance(pipeline),
      concurrency = if (concurrency > 0) concurrency else math.max(1, pipeline.concurrency),
      selected = selected, retries = pipeline.retries,
      connectionLimits = environment.connections.collect {
        case (name, c) if c.concurrency > 0 => name -> c.concurrency
      },
      completed = completed,
      onTimeout = i => spark.sparkContext.cancelJobGroup(i.id),
      only = only.toSet)
    RunState.save(baseDir, pipeline.name, results)
    results
  }
}
