package graft

import java.time.LocalDateTime
import org.apache.spark.sql.SparkSession
import graft.config.{Config, Environment}
import graft.diff.DataDiff
import graft.exec.{Lint, PipelineRunner, Scheduler}
import graft.lineage.Lineage
import graft.materialize.Materializer
import graft.model._
import graft.render.Template
import graft.unittest.UnitTests

/** CLI entry points (reference main.go:62-86): run, render, lint, query,
  * unit-test, lineage, data-diff, environments. One JVM, one SparkSession —
  * the Spark analogue of `bruin <cmd>`.
  *
  * Usage:
  *   graft run <pipeline-dir> [--select term]... [--environment env]
  *       [--full-refresh] [--start-date YYYY-MM-DD] [--end-date YYYY-MM-DD]
  *       [--sensor-mode skip|once|wait] [--concurrency n]
  *   graft serve <pipeline-dir> <serving-asset> [--environment env]
  *   graft render <pipeline-dir> <asset>
  *   graft lint <pipeline-dir>
  *   graft query --q "SELECT …" [--limit n] [--export /path/out.csv]
  *   graft unit-test <pipeline-dir> [asset]
  *   graft lineage <pipeline-dir> <asset>
  *   graft data-diff <table1> <table2>
  *   graft environments <dir>
  *   graft init [template] [folder] [--in-place]
  *   graft connections list|add|delete|test [dir] [--environment e] …
  *   graft import <dir> --schema s [--no-columns]
  *   graft patch fill-asset-dependencies|fill-columns-from-db <dir|file>
  *   graft render-ddl <dir> <asset>
  */
object Main {

  def main(args: Array[String]): Unit = sys.exit(run(args.toIndexedSeq))

  /** Exit-code-returning core, testable without System.exit. */
  def run(args: Seq[String], spark0: Option[SparkSession] = scala.None): Int = {
    val (flags, pos) =
      try parseArgs(args.drop(1))
      catch {
        case e: IllegalArgumentException =>
          System.err.println(s"graft: ${e.getMessage}")
          return 2
      }
    def spark: SparkSession = spark0.getOrElse(newSession())
    args.headOption match {
      case Some("run")          => cmdRun(spark, flags, pos)
      case Some("serve")        => cmdServe(spark, flags, pos)
      case Some("render")       => cmdRender(flags, pos)
      case Some("lint")         => cmdLint(flags, pos, () => spark)
      case Some("query")        => cmdQuery(spark, flags)
      case Some("unit-test")    => cmdUnitTest(spark, pos)
      case Some("lineage")      => cmdLineage(spark, pos)
      case Some("data-diff")    => cmdDiff(spark, pos)
      case Some("environments") => cmdEnvironments(pos)
      case Some("format")       => cmdFormat(flags, pos)
      case Some("docs")         => cmdDocs(pos)
      case Some("parse-pipeline") =>
        // machine-readable model dump for tooling (reference internal.go)
        println(graft.model.JsonDump.pipeline(
          AssetParser.loadPipeline(pos.headOption.getOrElse(".")))); 0
      case Some("clean")        => cmdClean(spark, flags)
      case Some("compact")      => cmdCompact(spark, flags, pos)
      case Some("init")         => graft.cli.ProjectCli.cmdInit(flags, pos)
      case Some("connections")  => graft.cli.ProjectCli.cmdConnections(flags, pos)
      case Some("import")       => graft.cli.ProjectCli.cmdImport(spark, flags, pos)
      case Some("patch")        => graft.cli.ProjectCli.cmdPatch(spark, flags, pos)
      case Some("render-ddl")   => graft.cli.ProjectCli.cmdRenderDdl(flags, pos)
      case _ =>
        System.err.println(
          "usage: graft run|serve|render|render-ddl|lint|query|unit-test|lineage|data-diff|" +
            "environments|format|docs|parse-pipeline|clean|compact|init|connections|import|patch …")
        2
    }
  }

  /** --key value / --flag / positionals; repeated --select accumulates.
    * A value flag with no value (last token, or followed by another --flag)
    * is a usage error, not a silent boolean (ADVICE r2). */
  private[graft] def parseArgs(args: Seq[String]): (Map[String, Seq[String]], Seq[String]) = {
    val flags = scala.collection.mutable.Map[String, Seq[String]]().withDefaultValue(Nil)
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    val boolFlags = Set("--full-refresh", "--no-validation", "--continue",
      "--downstream", "--push-metadata", "--check", "--dry-run", "--in-place",
      "--no-columns", "--stream")
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val k = a.stripPrefix("--")
        if (boolFlags.contains(a)) { flags(k) = flags(k) :+ "true"; i += 1 }
        // a value is "missing" when the next token itself looks like a flag
        // (--word shape) — but an SQL comment ("-- daily\nSELECT…") or other
        // '--'-leading VALUE with spaces/newlines is still accepted
        else if (i + 1 >= args.length || args(i + 1).matches("--[A-Za-z][A-Za-z0-9-]*"))
          throw new IllegalArgumentException(s"flag $a requires a value")
        else { flags(k) = flags(k) :+ args(i + 1); i += 2 }
      } else { pos += a; i += 1 }
    }
    (flags.toMap.withDefaultValue(Nil), pos.toSeq)
  }

  private def parseScalar(v: String): Any =
    if (v.matches("-?\\d+")) v.toLong
    else if (v.matches("-?\\d+\\.\\d+")) v.toDouble
    else if (v.equalsIgnoreCase("true")) true
    else if (v.equalsIgnoreCase("false")) false
    else v

  private def newSession(): SparkSession =
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      // the object-agg sort-fallback valve stays ARMED at the session
      // default: pipeline authors can write unbounded collect_list/
      // percentile in .sql assets, and the valve is what keeps those from
      // OOMing an executor. Materializer.executeDf raises the threshold
      // per asset, only when the asset's plan aggregates with one of
      // graft's k-bounded heaps (graft.core.HeapAgg).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def date(flags: Map[String, Seq[String]], key: String,
                   dflt: LocalDateTime): LocalDateTime =
    flags(key).lastOption.map(d => LocalDateTime.parse(d.take(10) + "T00:00:00")).getOrElse(dflt)

  private def envFor(dir: String, flags: Map[String, Seq[String]]): Environment =
    Config.load(dir).environment(flags("environment").lastOption)

  // ---- run ----------------------------------------------------------------

  private def cmdRun(spark: SparkSession, flags: Map[String, Seq[String]],
                     pos: Seq[String]): Int = {
    val dir = pos.headOption.getOrElse(".")
    val loaded = AssetParser.loadPipeline(dir)
    val environment = envFor(dir, flags)
    // --variant preset then --var k=v overrides (reference run.go:812-915)
    val withVariant = flags("variant").lastOption
      .map(v => Variables.applyVariant(loaded, v)).getOrElse(loaded)
    val overrides = flags("var").map(_.split("=", 2)).collect {
      case Array(k, v) => k -> parseScalar(v)
    }.toMap
    val pipeline =
      if (overrides.isEmpty) withVariant
      else Variables.applyOverrides(withVariant, overrides)
    if (!flags.contains("no-validation")) {
      val glossary = graft.model.Glossary.load(dir)
      val issues = Lint.validate(pipeline, Some(environment),
        if (glossary.isEmpty) scala.None else Some(glossary))
      issues.foreach(i =>
        System.err.println(s"[lint:${i.severity}] ${i.rule}: ${i.message}"))
      // warnings (e.g. unknown forward-compatible header keys) don't block
      if (issues.exists(_.isError)) return 1
    }
    val runner = new PipelineRunner(spark,
      baseDir = dir,
      startDate = date(flags, "start-date", LocalDateTime.of(2024, 1, 1, 0, 0)),
      endDate = date(flags, "end-date", LocalDateTime.of(2024, 1, 2, 0, 0)),
      fullRefresh = flags.contains("full-refresh"),
      sensorMode = flags("sensor-mode").lastOption,
      environment = environment,
      pushMetadata = flags.contains("push-metadata"))
    // --stream: run exactly ONE streaming asset in the foreground until
    // interrupted (reference cmd/run.go:918-946). A stream never finishes,
    // so flags that assume a finite multi-asset batch run are rejected.
    if (flags.contains("stream")) {
      for (bad <- Seq("downstream", "continue", "full-refresh", "sensor-mode",
                      "push-metadata") if flags.contains(bad)) {
        System.err.println(s"graft: --stream cannot be combined with --$bad")
        return 2
      }
      val named = flags("select") ++ pos.drop(1)
      if (named.size != 1) {
        System.err.println("graft: --stream requires exactly one asset, " +
          "e.g. graft run <dir> --stream --select my.stream_asset")
        return 2
      }
      return try { runner.runStreamForeground(pipeline, named.head); 0 }
      catch {
        case e: IllegalArgumentException =>
          System.err.println(s"graft: ${e.getMessage}"); 2
        case scala.util.control.NonFatal(e) =>
          // a run-time failure of the stream itself — e.g. the serving
          // recall gate tripping — is a FAILED run (exit 1, like a failed
          // batch asset), not a usage error and not an uncaught crash.
          // Full trace to stderr: a null getMessage alone (NPE class
          // failures) would leave the operator nothing to debug with.
          System.err.println(
            s"[failed] ${named.head}: ${e.getClass.getSimpleName}: ${e.getMessage}")
          e.printStackTrace()
          1
      }
    }
    // --downstream: selected assets also pull their transitive downstream
    val terms = if (!flags.contains("downstream")) flags("select")
      else flags("select").map(t =>
        if (t.endsWith("+") || t.startsWith("tag:") || t.startsWith("@")) t else s"$t+")
    // --only main|checks (repeatable, reference run.go:765): restrict the
    // run to task types; excluded dependencies count as satisfied
    val only = flags("only")
    only.find(v => v != "main" && v != "checks").foreach { bad =>
      System.err.println(s"graft: --only accepts main|checks, got '$bad'")
      return 2
    }
    val results = runner.run(pipeline,
      selectorTerms = terms,
      concurrency = flags("concurrency").lastOption.map(_.toInt).getOrElse(0),
      continueRun = flags.contains("continue"),
      only = only)
    val byStatus = results.values.groupBy(_.status).map { case (k, v) => k -> v.size }
    println(s"run finished: ${byStatus.map { case (k, v) => s"$v $k" }.mkString(", ")}")
    results.values.toSeq.sortBy(_.instance.id)
      .filter(r => r.status == Scheduler.Failed)
      .foreach(r => System.err.println(
        s"[failed] ${r.instance.id}: ${r.error.map(_.getMessage).getOrElse("")}"))
    if (results.values.exists(r =>
      r.status == Scheduler.Failed || r.status == Scheduler.UpstreamFailed)) 1 else 0
  }

  // ---- serve --------------------------------------------------------------

  /** `graft serve <dir> <asset>` — foreground retrieval serving over a
    * persisted index: sugar for `run <dir> --stream --select <asset>`
    * applied to a `serve: ann|ivfadc|rerank|hamming` asset
    * ([[graft.exec.Serving]]). Blocks while `flush_interval` is set;
    * drains the feed once and returns otherwise. */
  private def cmdServe(spark: SparkSession, flags: Map[String, Seq[String]],
                       pos: Seq[String]): Int = pos match {
    case Seq(dir, assetName) =>
      cmdRun(spark,
        flags.updated("stream", Seq("true")).updated("select", Seq(assetName)),
        Seq(dir))
    case _ =>
      System.err.println("usage: graft serve <pipeline-dir> <serving-asset>")
      2
  }

  // ---- render -------------------------------------------------------------

  private def cmdRender(flags: Map[String, Seq[String]], pos: Seq[String]): Int =
    pos match {
      case Seq(dir, assetName) =>
        val pipeline = AssetParser.loadPipeline(dir)
        pipeline.asset(assetName) match {
          case Some(asset) =>
            val env = envFor(dir, flags)
            val ctx = Template.context(
              date(flags, "start-date", LocalDateTime.of(2024, 1, 1, 0, 0)),
              date(flags, "end-date", LocalDateTime.of(2024, 1, 2, 0, 0)),
              executionDate = date(flags, "start-date", LocalDateTime.of(2024, 1, 1, 0, 0)),
              pipelineName = pipeline.name, runId = "render",
              fullRefresh = flags.contains("full-refresh"),
              thisAsset = env.physicalName(asset.name), vars = pipeline.variables)
            // same macro prelude the runner uses — assets calling user
            // macro files render identically here
            val sql = Template.render(Template.loadMacros(dir) + asset.content, ctx).trim
            // dev environments rename at the PLAN level (no SQL text form),
            // so the rendered text shows logical names; surface the mapping
            // that execution will apply instead of hiding it
            val rename = env.renameMapping(pipeline.assets.map(_.name))
            if (rename.nonEmpty) {
              println(s"-- environment '${env.name}': plan-level renames applied at run time:")
              rename.toSeq.sorted.foreach { case (l, p) => println(s"--   $l -> $p") }
            }
            Materializer.render(asset, sql).foreach(s => println(s + ";"))
            0
          case scala.None =>
            System.err.println(s"no such asset: $assetName"); 1
        }
      case _ => System.err.println("usage: graft render <dir> <asset>"); 2
    }

  // ---- lint ---------------------------------------------------------------

  private def cmdLint(flags: Map[String, Seq[String]], pos: Seq[String],
                      sparkFor: () => SparkSession): Int = {
    val dir = pos.headOption.getOrElse(".")
    val pipeline = AssetParser.loadPipeline(dir)
    val glossary = graft.model.Glossary.load(dir)
    val issues = Lint.validate(pipeline,
      glossary = if (glossary.isEmpty) scala.None else Some(glossary),
      // --dry-run additionally parse-checks hook/custom-check SQL (needs a
      // session; plain lint stays session-free and instant)
      spark = if (flags.contains("dry-run")) Some(sparkFor()) else scala.None,
      // dry-run renders with the same user-macro prelude the runner uses;
      // plain lint skips the macro-dir I/O entirely
      macroPrelude = if (flags.contains("dry-run")) Template.loadMacros(dir) else "")
    issues.foreach(i => println(s"[${i.severity}] ${i.rule}: ${i.message}"))
    if (issues.exists(_.isError)) 1 else { if (issues.isEmpty) println("ok"); 0 }
  }

  // ---- query --------------------------------------------------------------

  /** Ad-hoc query + CSV export + asset/semantic paths
    * (reference cmd/fetch.go:46-390; semantic path :593-893). */
  private def cmdQuery(spark: SparkSession, flags: Map[String, Seq[String]]): Int = {
    // dev-environment renames apply when querying through an asset (the
    // pipeline context is known there); plain --q has no pipeline scope
    var rename: Map[String, String] = Map.empty
    var sandboxPrefix: String => String = identity
    val q: String = (flags("q").lastOption, flags("asset").lastOption,
                     flags("model").lastOption) match {
      case (Some(sql), _, _) => sql
      case (_, Some(assetName), _) =>
        // render an asset's SQL with the pipeline context (fetch.go:461-584)
        val dir = flags("dir").lastOption.getOrElse(".")
        val pipeline = AssetParser.loadPipeline(dir)
        val env = envFor(dir, flags)
        rename = env.renameMapping(pipeline.assets.map(_.name))
        // ad-hoc DDL targets in a queried asset get the sandbox prefix,
        // exactly as the run path applies it — query must not be a hole
        // in the dev write-isolation guarantee
        if (rename.nonEmpty) sandboxPrefix = env.physicalName
        pipeline.asset(assetName) match {
          case Some(a) =>
            Template.render(Template.loadMacros(dir) + a.content,
              Template.context(
                date(flags, "start-date", LocalDateTime.of(2024, 1, 1, 0, 0)),
                date(flags, "end-date", LocalDateTime.of(2024, 1, 2, 0, 0)),
                executionDate = date(flags, "start-date", LocalDateTime.of(2024, 1, 1, 0, 0)),
                pipelineName = pipeline.name, runId = "query",
                thisAsset = env.physicalName(a.name),
                vars = pipeline.variables)).trim
          case scala.None => System.err.println(s"no such asset: $assetName"); return 1
        }
      case (_, _, Some(modelPath)) =>
        // semantic query: dimensions/metrics compiled against a model file
        val (model, others) = graft.semantic.Semantic.parseModel(
          java.nio.file.Files.readString(java.nio.file.Paths.get(modelPath)))
        val query = graft.semantic.Semantic.Query(
          dimensions = flags("dimensions").flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
          metrics = flags("metrics").flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
          segments = flags("segments").flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
          limit = flags("limit").lastOption.map(_.toInt))
        graft.semantic.Semantic.generateSql(model, query, others)
      case _ =>
        System.err.println(
          "usage: graft query --q 'SELECT …' | --asset name [--dir d] | " +
            "--model m.yml --dimensions d1,d2 --metrics m1 [--limit n] [--export out.csv]")
        return 2
    }
    val base =
      if (rename.isEmpty) spark.sql(q)
      else org.apache.spark.sql.graft.SqlBridge.renameTablesSql(spark, q, rename, sandboxPrefix)
    val limited = flags("limit").lastOption.map(_.toInt) match {
      case Some(n) => base.limit(n)
      case scala.None => base
    }
    flags("export").lastOption match {
      case Some(path) =>
        // format by extension (reference exports CSV only; .jsonl and
        // .parquet are free on Spark and the formats a training pipeline
        // actually consumes). coalesce(1): the export contract is ONE file
        // a human/tool opens — not a scale path; use a sink asset for that.
        val w = limited.coalesce(1).write.mode("overwrite")
        path.toLowerCase match {
          case p if p.endsWith(".jsonl") || p.endsWith(".json") => w.json(path)
          case p if p.endsWith(".parquet") => w.parquet(path)
          case p if p.endsWith(".orc") => w.orc(path)
          case _ => w.option("header", "true").csv(path)
        }
        println(s"exported to $path")
      case scala.None => limited.show(flags("limit").lastOption.map(_.toInt).getOrElse(20), false)
    }
    0
  }

  // ---- unit-test ----------------------------------------------------------

  private def cmdUnitTest(spark: SparkSession, pos: Seq[String]): Int = {
    val pipeline = AssetParser.loadPipeline(pos.headOption.getOrElse("."))
    val assets = pos.lift(1) match {
      case Some(name) => pipeline.asset(name).toSeq
      case scala.None => pipeline.assets
    }
    var failures = 0
    assets.foreach { a =>
      a.unitTests.foreach { t =>
        UnitTests.run(spark, pipeline, a, t) match {
          case scala.None => println(s"[pass] ${a.name} :: ${t.name}")
          case Some(f) => failures += 1; println(s"[FAIL] ${a.name} :: ${t.name} — ${f.reason}")
        }
      }
    }
    if (failures == 0) 0 else 1
  }

  // ---- lineage ------------------------------------------------------------

  private def cmdLineage(spark: SparkSession, pos: Seq[String]): Int =
    pos match {
      case Seq(dir, assetName) =>
        val pipeline = AssetParser.loadPipeline(dir)
        pipeline.asset(assetName) match {
          case Some(asset) =>
            println(s"asset: ${asset.name}")
            println(s"uses: ${Lineage.usedTables(spark, asset.content).mkString(", ")}")
            val lin = Lineage.columnLineage(spark, asset.content)
            lin.columns.foreach { c =>
              println(s"  ${c.column} <- ${c.upstreams.map(u => s"${u.table}.${u.column}").mkString(", ")}")
            }
            if (lin.nonSelected.nonEmpty)
              println(s"  (non-selected: ${lin.nonSelected.map(u => s"${u.table}.${u.column}").mkString(", ")})")
            0
          case scala.None => System.err.println(s"no such asset: $assetName"); 1
        }
      case _ => System.err.println("usage: graft lineage <dir> <asset>"); 2
    }

  // ---- data-diff ----------------------------------------------------------

  private def cmdDiff(spark: SparkSession, pos: Seq[String]): Int =
    pos match {
      case Seq(left, right) =>
        DataDiff.diffTables(spark, left, right).show(200, false)
        0
      case _ => System.err.println("usage: graft data-diff <table1> <table2>"); 2
    }

  // ---- format -------------------------------------------------------------

  /** Canonical re-serialization of asset files (reference cmd/format.go).
    * A file is rewritten only when re-parsing the formatted text yields the
    * identical asset — guaranteed lossless; anything else is reported and
    * left untouched. `--check` reports without writing. */
  private def cmdFormat(flags: Map[String, Seq[String]], pos: Seq[String]): Int = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(pos.headOption.getOrElse("."), "assets")
    if (!Files.isDirectory(dir)) { System.err.println(s"no assets dir under ${pos.headOption.getOrElse(".")}"); return 1 }
    val checkOnly = flags.contains("check")
    var changed = 0
    var skipped = 0
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && (p.toString.endsWith(".sql") || p.toString.endsWith(".py")))
      .foreach { p =>
        val original = Files.readString(p)
        val asset = AssetParser.parse(p.toString, original)
        val formatted = Formatter.formatAsset(asset)
        if (formatted != original) {
          if (AssetParser.parse(p.toString, formatted) == asset) {
            changed += 1
            if (checkOnly) println(s"would format: $p")
            else { Files.writeString(p, formatted); println(s"formatted: $p") }
          } else { skipped += 1; println(s"skipped (round-trip not lossless): $p") }
        }
      }
    println(s"$changed formatted, $skipped skipped")
    if (checkOnly && changed > 0) 1 else 0
  }

  // ---- docs ---------------------------------------------------------------

  private def cmdDocs(pos: Seq[String]): Int = {
    val dir = pos.headOption.getOrElse(".")
    val pipeline = AssetParser.loadPipeline(dir)
    val md = Docs.markdown(pipeline)
    pos.lift(1) match {
      case Some(out) => java.nio.file.Files.writeString(java.nio.file.Paths.get(out), md)
      case scala.None => println(md)
    }
    0
  }

  // ---- clean --------------------------------------------------------------

  /** Drop temp artifacts left behind by interrupted swaps (reference
    * cmd/clean.go): legacy `__stage_` tables, plus `__gen_` generation
    * tables no longer referenced by their asset's view (a torn write, or a
    * strategy switch that replaced the view). `--grace <seconds>` (default
    * 900) keeps generations younger than the window: a createOrReplace that
    * has written its generation but not yet repointed the view looks exactly
    * like an orphan, so reaping without a grace period would drop an
    * in-flight write's data out from under it. The generation suffix IS its
    * creation nanoTime (same-machine monotonic clock), so age needs no extra
    * catalog round-trip; an unparseable suffix is treated as old. */
  private def cmdClean(spark: SparkSession, flags: Map[String, Seq[String]]): Int = {
    import scala.jdk.CollectionConverters._
    import graft.materialize.SessionCatalogWarehouse.{GenSep, backingTable}
    // flags are keyed WITHOUT the leading dashes (parser strips them); the
    // old "--grace" lookup always missed and silently ran at the default
    val graceNanos =
      flags("grace").headOption.map(_.toLong).getOrElse(900L) * 1000000000L
    val now = System.nanoTime()
    var dropped = 0
    spark.catalog.listDatabases().collectAsList().asScala.foreach { db =>
      spark.catalog.listTables(db.name).collectAsList().asScala
        .filter(t => t.tableType != "TEMPORARY")
        .foreach { t =>
          val fq = s"${db.name}.${t.name}"
          val orphanGen = t.name.contains(GenSep) && {
            val base = s"${db.name}.${t.name.substring(0, t.name.indexOf(GenSep))}"
            val pastGrace = scala.util.Try(java.lang.Long.parseUnsignedLong(
              t.name.substring(t.name.indexOf(GenSep) + GenSep.length), 16))
              .toOption.forall(created => now - created > graceNanos)
            pastGrace && !backingTable(spark, base).contains(fq)
          }
          if (t.name.contains("__stage_") || orphanGen) {
            spark.sql(s"DROP TABLE IF EXISTS $fq")
            dropped += 1
          }
        }
    }
    // streaming staging dirs (single-file symlink stages, end-of-input
    // sentinel parquet) are content-keyed so re-runs reuse them, but a
    // re-generated or deleted input strands its old dir forever. They are
    // LIVE FileStreamSource inputs while a stream runs, and their mtime is
    // touched on every reuse — so the sweep uses its own, much longer
    // window (`--stream-grace <seconds>`, default 24 h) rather than the
    // minutes-scale generation grace: a dir untouched for a day belongs to
    // an input that was re-generated or deleted.
    val streamGraceNanos = flags("stream-grace").headOption.map(_.toLong)
      .getOrElse(86400L) * 1000000000L
    val swept = sweepStreamStaging(streamGraceNanos)
    println(s"dropped $dropped abandoned staging/generation table(s), " +
      s"swept $swept streaming staging dir(s)")
    0
  }

  /** Streaming staging prefixes under /tmp owned by [[graft.streaming.Streams]]. */
  private[graft] val streamStagingPrefixes = graft.streaming.Streams.StagingPrefixes

  /** Age-based staging sweep with a LIVENESS override: a dir whose
    * heartbeat file (touched per micro-batch by the streaming listener,
    * see [[graft.streaming.Streams.HeartbeatFile]]) is younger than
    * `heartbeatGraceNanos` is a LIVE stream's input and is spared no
    * matter how old the dir itself is — mtime alone would reap a
    * foreground stream that simply ran longer than `--stream-grace`.
    * 30 min of heartbeat grace covers any sane trigger interval while
    * still letting a crashed stream's dir age out within the hour. */
  private[graft] def sweepStreamStaging(graceNanos: Long,
                                        tmp: java.nio.file.Path =
                                          java.nio.file.Paths.get("/tmp"),
                                        heartbeatGraceNanos: Long =
                                          1800L * 1000000000L): Int = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(tmp)) return 0
    val listing = java.nio.file.Files.list(tmp)
    val stale =
      try listing.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        streamStagingPrefixes.exists(n.startsWith) &&
          graft.core.Fs.ageNanos(p) > graceNanos && {
            val hb = p.resolve(graft.streaming.Streams.HeartbeatFile)
            !java.nio.file.Files.exists(hb) ||
              graft.core.Fs.ageNanos(hb) > heartbeatGraceNanos
          }
      }.toSeq
      finally listing.close()
    stale.foreach(graft.core.Fs.deleteRecursively)
    stale.size
  }

  // ---- compact ------------------------------------------------------------

  /** `graft compact <table>... [--target-mb N]` — merge a table's small
    * files into ~N-MiB files (default 128) through the atomic generation
    * swap. The warehouse-maintenance sibling of `clean`: append/merge/
    * streaming sinks accrete writer-sized slivers; this rewrites them
    * reader-sized. */
  private def cmdCompact(spark: SparkSession, flags: Map[String, Seq[String]],
                         pos: Seq[String]): Int = {
    if (pos.isEmpty) {
      System.err.println("graft: compact requires at least one table name")
      return 2
    }
    val targetBytes =
      flags("target-mb").lastOption.map(_.toLong).getOrElse(128L) << 20
    // --zorder c1,c2: re-layout along the Morton curve while compacting
    val zorderBy = flags("zorder").lastOption
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val wh = new graft.materialize.SessionCatalogWarehouse(spark)
    var rc = 0
    pos.foreach { t =>
      try println(graft.materialize.Compactor.compact(wh, t, targetBytes, zorderBy).pretty)
      catch { case e: Exception =>
        System.err.println(s"graft: compact $t failed: ${e.getMessage}"); rc = 1
      }
    }
    rc
  }

  // ---- environments -------------------------------------------------------

  private def cmdEnvironments(pos: Seq[String]): Int = {
    val cfg = Config.load(pos.headOption.getOrElse("."))
    if (cfg.environments.isEmpty) println("(no .graft.yml — implicit default environment)")
    cfg.environments.values.foreach { e =>
      val marker = if (e.name == cfg.defaultEnvironment) "*" else " "
      println(s"$marker ${e.name}" +
        (if (e.schemaPrefix.nonEmpty) s" (schema_prefix=${e.schemaPrefix})" else "") +
        (if (e.connections.nonEmpty) s" connections: ${e.connections.keys.mkString(", ")}" else ""))
    }
    0
  }
}
