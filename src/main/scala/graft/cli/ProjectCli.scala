package graft.cli

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.config.{Config, Connection, Environment}
import graft.lineage.Lineage
import graft.model._
import graft.render.Template

/** Project-onboarding commands: init / connections / import / patch /
  * render-ddl (reference cmd/init.go, cmd/connections.go, cmd/import.go,
  * cmd/patch.go, cmd/render_ddl.go, wired at main.go:67-84). Pure
  * filesystem + catalog manipulation — no query execution — so they live
  * apart from the run-path in Main.
  */
object ProjectCli {

  // ---- init ---------------------------------------------------------------

  /** `graft init [template] [folder] [--in-place]` (reference cmd/init.go:
    * 205-343). Non-interactive: no TUI in a library CLI, the template
    * defaults to `default`. Refuses to scribble over an existing pipeline. */
  def cmdInit(flags: Map[String, Seq[String]], pos: Seq[String]): Int = {
    val template = pos.headOption.getOrElse("default")
    Templates.all.get(template) match {
      case scala.None =>
        System.err.println(
          s"unknown template '$template' (have: ${Templates.names.mkString(", ")})")
        2
      case Some(files) =>
        val inPlace = flags.contains("in-place")
        val target = Paths.get(
          pos.lift(1).getOrElse(if (inPlace) "." else Templates.DefaultFolderName))
        if (Files.exists(target.resolve("pipeline.yml"))) {
          System.err.println(s"refusing to overwrite: ${target.resolve("pipeline.yml")} exists")
          return 1
        }
        files.foreach { case (rel, content) =>
          val p = target.resolve(rel)
          Option(p.getParent).foreach(Files.createDirectories(_))
          Files.writeString(p, content)
        }
        // merge the template's environments into an existing parent config
        // instead of shadowing it (reference mergeTemplateConfig,
        // cmd/init.go:161-178): the project root keeps one .graft.yml
        val parentCfgDir = Option(target.toAbsolutePath.getParent)
          .filter(d => Files.exists(d.resolve(Config.FileName)))
        parentCfgDir.foreach { d =>
          val central = Config.load(d.toString)
          val tpl = Config.parse(files.toMap.getOrElse(".graft.yml", ""))
          val merged = Config(
            defaultEnvironment = central.defaultEnvironment,
            environments = tpl.environments.foldLeft(central.environments) {
              case (envs, (n, tplEnv)) =>
                envs.get(n) match {
                  case scala.None => envs + (n -> tplEnv)
                  case Some(c) => envs + (n -> c.copy(
                    connections = tplEnv.connections ++ c.connections))
                }
            })
          Config.save(d.toString, merged)
          Files.deleteIfExists(target.resolve(Config.FileName))
        }
        println(s"initialized '$template' pipeline in $target")
        println(s"  next: graft run $target")
        0
    }
  }

  // ---- connections --------------------------------------------------------

  /** `graft connections list|add|delete|test` against `.graft.yml`
    * (reference cmd/connections.go, pkg/config/manager.go:27-296). */
  def cmdConnections(flags: Map[String, Seq[String]], pos: Seq[String]): Int = {
    val dir = pos.lift(1).getOrElse(".")
    def envName = flags("environment").lastOption
    pos.headOption match {
      case Some("list") =>
        val cfg = Config.load(dir)
        val envs = envName match {
          case Some(n) => cfg.environments.get(n).toSeq
          case scala.None => cfg.environments.values.toSeq.sortBy(_.name)
        }
        if (flags("output").lastOption.contains("json")) {
          val body = envs.map { e =>
            val conns = e.connections.toSeq.sortBy(_._1).map { case (n, c) =>
              s"""{"name":${js(n)},"type":${js(c.typ)},"uri":${js(c.uri)}}"""
            }.mkString("[", ",", "]")
            s"""${js(e.name)}:$conns"""
          }.mkString("{", ",", "}")
          println(body)
        } else if (envs.isEmpty) println("(no environments configured)")
        else envs.foreach { e =>
          println(s"${e.name}:")
          if (e.connections.isEmpty) println("  (no connections)")
          e.connections.toSeq.sortBy(_._1).foreach { case (n, c) =>
            println(s"  $n  type=${c.typ}" + (if (c.uri.nonEmpty) s" uri=${c.uri}" else ""))
          }
        }
        0
      case Some("add") =>
        (flags("name").lastOption, flags("type").lastOption) match {
          case (Some(name), Some(typ)) =>
            val cfg = Config.load(dir)
            val en = envName.getOrElse(cfg.defaultEnvironment)
            val env = cfg.environments.getOrElse(en, Environment(name = en))
            if (env.connections.contains(name)) {
              System.err.println(s"connection '$name' already exists in environment '$en'")
              return 1
            }
            val opts = flags("option").map(_.split("=", 2)).collect {
              case Array(k, v) => k -> v
            }.toMap
            val conn = Connection(name, typ,
              uri = flags("uri").lastOption.getOrElse(""),
              options = opts,
              concurrency = flags("concurrency").lastOption.map(_.toInt).getOrElse(0))
            Config.save(dir, cfg.copy(environments = cfg.environments +
              (en -> env.copy(connections = env.connections + (name -> conn)))))
            println(s"added connection '$name' to environment '$en'")
            0
          case _ =>
            System.err.println("usage: graft connections add [dir] --name n --type t " +
              "[--environment e] [--uri u] [--option k=v]... [--concurrency n]")
            2
        }
      case Some("delete") =>
        flags("name").lastOption match {
          case Some(name) =>
            val cfg = Config.load(dir)
            val en = envName.getOrElse(cfg.defaultEnvironment)
            cfg.environments.get(en) match {
              case Some(env) if env.connections.contains(name) =>
                Config.save(dir, cfg.copy(environments = cfg.environments +
                  (en -> env.copy(connections = env.connections - name))))
                println(s"deleted connection '$name' from environment '$en'")
                0
              case _ =>
                System.err.println(s"no connection '$name' in environment '$en'")
                1
            }
          case scala.None =>
            System.err.println("usage: graft connections delete [dir] --name n [--environment e]")
            2
        }
      case Some("test") =>
        val cfg = Config.load(dir)
        val en = envName.getOrElse(cfg.defaultEnvironment)
        cfg.environments.get(en) match {
          case scala.None => System.err.println(s"no such environment '$en'"); 1
          case Some(env) =>
            val targets = flags("name").lastOption match {
              case Some(n) => env.connections.get(n).toSeq
              case scala.None => env.connections.values.toSeq.sortBy(_.name)
            }
            if (targets.isEmpty) { System.err.println("no matching connections"); return 1 }
            var failures = 0
            targets.foreach { c =>
              testConnection(c) match {
                case scala.None => println(s"[ok] ${c.name}")
                case Some(reason) => failures += 1; println(s"[FAIL] ${c.name}: $reason")
              }
            }
            if (failures == 0) 0 else 1
        }
      case _ =>
        System.err.println("usage: graft connections list|add|delete|test [dir] …")
        2
    }
  }

  /** Reachability probe per connection type (reference `connections`
    * platform pings). None = healthy, Some(reason) = failure. */
  private[graft] def testConnection(c: Connection): Option[String] = c.typ.toLowerCase match {
    case "file" | "seed" | "csv" | "parquet" | "json" =>
      val p = c.uri.stripPrefix("file://")
      if (p.isEmpty) Some("no uri configured")
      else if (Files.exists(Paths.get(p))) scala.None
      else Some(s"path not found: $p")
    case "jdbc" =>
      if (!c.uri.startsWith("jdbc:")) Some(s"uri is not a jdbc url: '${c.uri}'")
      else
        try {
          java.sql.DriverManager.setLoginTimeout(5)
          val conn = java.sql.DriverManager.getConnection(
            c.uri, c.options.getOrElse("user", ""), c.options.getOrElse("password", ""))
          conn.close(); scala.None
        } catch { case e: Exception => Some(e.getMessage) }
    case "spark" | "warehouse" | "" =>
      // the session catalog IS the warehouse — healthy when a session exists
      if (SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).nonEmpty)
        scala.None
      else Some("no active Spark session")
    case other => Some(s"untestable connection type '$other'")
  }

  // ---- import -------------------------------------------------------------

  /** `graft import <pipeline-dir> --schema s [--no-columns]` — adopt existing
    * warehouse (session-catalog) tables as asset files (reference
    * cmd/import.go `import database`). Each table becomes
    * `assets/<schema>.<table>.asset.yml`; already-declared assets are left
    * untouched. Imported assets are `empty` nodes — the table exists, the
    * asset carries metadata and takes its place in the DAG. */
  def cmdImport(spark: SparkSession, flags: Map[String, Seq[String]],
                pos: Seq[String]): Int = {
    val dir = pos.headOption.getOrElse(".")
    val schema = flags("schema").lastOption.getOrElse("default")
    if (!spark.catalog.databaseExists(schema)) {
      System.err.println(s"no such schema in catalog: $schema")
      return 1
    }
    val fillColumns = !flags.contains("no-columns")
    val pipeline = AssetParser.loadPipeline(dir)
    val known = pipeline.assets.map(_.name).toSet
    val assetsDir = Paths.get(dir, "assets")
    Files.createDirectories(assetsDir)
    var imported = 0
    var skipped = 0
    spark.catalog.listTables(schema).collectAsList().asScala
      .filter(_.tableType != "TEMPORARY").sortBy(_.name).foreach { t =>
        val fqName = s"$schema.${t.name}"
        if (known.contains(fqName) || known.contains(t.name)) skipped += 1
        else {
          val cols =
            if (!fillColumns) Nil
            else spark.catalog.listColumns(fqName).collectAsList().asScala.toSeq
              .filterNot(_.isPartition).map(c => Column(
                name = c.name, typ = c.dataType.toUpperCase,
                description = Option(c.description).getOrElse("")))
          val asset = Asset(name = fqName, assetType = AssetType.Empty, columns = cols)
          Files.writeString(assetsDir.resolve(s"$fqName.asset.yml"),
            Formatter.formatAsset(asset))
          imported += 1
        }
      }
    println(s"imported $imported asset(s) from schema '$schema'" +
      (if (skipped > 0) s", $skipped already declared" else ""))
    0
  }

  // ---- patch --------------------------------------------------------------

  /** `graft patch fill-asset-dependencies|fill-columns-from-db <dir|file>`
    * (reference cmd/patch.go:229-470): programmatic asset-metadata editing.
    * Files are rewritten through Formatter only when re-parsing the new text
    * yields the patched asset — same losslessness contract as `format`. */
  def cmdPatch(spark: SparkSession, flags: Map[String, Seq[String]],
               pos: Seq[String]): Int = pos match {
    case Seq(sub, target, _*) =>
      val targetPath = Paths.get(target)
      val (dir, files) =
        if (Files.isDirectory(targetPath))
          (targetPath, assetFiles(targetPath.resolve("assets")))
        else (Option(targetPath.getParent).map(_.getParent).getOrElse(Paths.get(".")),
          Seq(targetPath))
      val pipeline = AssetParser.loadPipeline(dir)
      val json = flags("output").lastOption.contains("json")
      sub match {
        case "fill-asset-dependencies" =>
          patchFiles(files, json) { asset =>
            fillDependencies(spark, pipeline, dir.toString, asset)
          }
        case "fill-columns-from-db" =>
          patchFiles(files, json) { asset => fillColumnsFromDb(spark, asset) }
        case other =>
          System.err.println(s"unknown patch subcommand '$other' " +
            "(have: fill-asset-dependencies, fill-columns-from-db)")
          2
      }
    case _ =>
      System.err.println("usage: graft patch fill-asset-dependencies|fill-columns-from-db <dir|asset-file>")
      2
  }

  private def assetFiles(assetsDir: Path): Seq[Path] =
    if (!Files.isDirectory(assetsDir)) Nil
    else Files.walk(assetsDir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && {
        val n = p.toString
        n.endsWith(".sql") || n.endsWith(".py") || n.endsWith(".yml") || n.endsWith(".yaml")
      }).toSeq.sortBy(_.toString)

  /** Apply `patch` to each file; rewrite only on lossless change. */
  private def patchFiles(files: Seq[Path], json: Boolean)(patch: Asset => Asset): Int = {
    var patched = 0
    var unchanged = 0
    var failed = 0
    val results = files.map { p =>
      try {
        val original = AssetParser.parseFile(p)
        val next = patch(original)
        if (next == original) { unchanged += 1; (p, "unchanged") }
        else {
          val text = Formatter.formatAsset(next)
          if (AssetParser.parse(p.toString, text) == next) {
            Files.writeString(p, text); patched += 1; (p, "patched")
          } else { failed += 1; (p, "skipped: round-trip not lossless") }
        }
      } catch { case e: Exception => failed += 1; (p, s"error: ${e.getMessage}") }
    }
    if (json)
      println(results.map { case (p, s) => s"{${js(p.toString)}:${js(s)}}" }
        .mkString("[", ",", "]"))
    else {
      results.foreach { case (p, s) => println(s"[$s] $p") }
      println(s"$patched patched, $unchanged unchanged, $failed failed")
    }
    if (failed == 0) 0 else 1
  }

  /** Fill `depends:` from the tables the asset's SQL actually reads
    * (reference patch.go fill-asset-dependencies): rendered through the same
    * macro prelude the runner uses, filtered to names that are assets of this
    * pipeline, existing upstreams preserved. */
  private[cli] def fillDependencies(spark: SparkSession, pipeline: Pipeline,
                                    dir: String, asset: Asset): Asset = {
    if (asset.assetType != AssetType.SparkSql || asset.content.trim.isEmpty) asset
    else {
      val ctx = Template.context(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2024, 1, 2, 0, 0),
        executionDate = java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
        pipelineName = pipeline.name, runId = "patch",
        thisAsset = asset.name, vars = pipeline.variables)
      val sql = Template.render(Template.loadMacros(dir) + asset.content, ctx).trim
      val used = Lineage.usedTables(spark, sql).toSet
      val assetNames = pipeline.assets.map(_.name).toSet
      val have = asset.upstreams.map(_.value).toSet
      val missing = (used intersect assetNames) -- have - asset.name
      if (missing.isEmpty) asset
      else asset.copy(upstreams =
        asset.upstreams ++ missing.toSeq.sorted.map(Upstream(_)))
    }
  }

  /** Fill `columns:` from the catalog schema of the asset's table
    * (reference patch.go fill-columns-from-db): missing columns are
    * appended with their catalog types; declared columns keep their
    * metadata, gaining only a type when they had none. */
  private[cli] def fillColumnsFromDb(spark: SparkSession, asset: Asset): Asset =
    if (!spark.catalog.tableExists(asset.name)) asset
    else {
      val dbCols = spark.catalog.listColumns(asset.name).collectAsList().asScala.toSeq
      val declared = asset.columns.map(c => c.name.toLowerCase -> c).toMap
      val merged = dbCols.map { dc =>
        declared.get(dc.name.toLowerCase) match {
          case Some(c) if c.typ.nonEmpty => c
          case Some(c) => c.copy(typ = dc.dataType.toUpperCase)
          case scala.None => Column(name = dc.name, typ = dc.dataType.toUpperCase)
        }
      }
      // declared-but-not-in-db columns stay (lint flags them, patch must not
      // silently destroy user metadata)
      val extra = asset.columns.filterNot(c =>
        dbCols.exists(_.name.equalsIgnoreCase(c.name)))
      asset.copy(columns = merged ++ extra)
    }

  // ---- render-ddl ----------------------------------------------------------

  /** `graft render-ddl <dir> <asset>` (reference cmd/render_ddl.go:158 —
    * "force the asset to use DDL strategy for schema generation"). */
  def cmdRenderDdl(flags: Map[String, Seq[String]], pos: Seq[String]): Int = pos match {
    case Seq(dir, assetName) =>
      val pipeline = AssetParser.loadPipeline(dir)
      pipeline.asset(assetName) match {
        case scala.None => System.err.println(s"no such asset: $assetName"); 1
        case Some(asset) =>
          if (asset.columns.isEmpty) {
            System.err.println(s"asset '$assetName' declares no columns — nothing to render")
            return 1
          }
          val ddlAsset = asset.copy(materialization = asset.materialization.copy(
            typ = MaterializationType.Table, strategy = Some(Strategy.DDL)))
          graft.materialize.Materializer.render(ddlAsset, asset.content)
            .foreach(s => println(s + ";"))
          0
      }
    case _ => System.err.println("usage: graft render-ddl <dir> <asset>"); 2
  }

  private def js(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
