package graft.model

import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._
import java.nio.file.{Files, Path, Paths}

/** Parses asset files: SQL with an embedded `/* @bruin … @bruin */` YAML
  * header, Python with a `""" @bruin … @bruin """` block, or pure YAML
  * (reference pkg/pipeline/comment.go, yaml.go; strip regex mirrors
  * pkg/pipeline/materializer.go:11).
  */
object AssetParser {

  private val SqlHeader = """(?s)/\*\s*@bruin(.*?)@bruin\s*\*/""".r
  private val PyHeader  = "(?s)\"\"\"\\s*@bruin(.*?)@bruin\\s*\"\"\"".r

  /** Parse a single asset file's text. `fileName` drives defaults
    * (asset name from file stem, type from extension). */
  def parse(fileName: String, text: String): Asset = {
    val stem = fileName.split('/').last.replaceAll("\\.(sql|py|asset\\.yml|asset\\.yaml|yml|yaml)$", "")
    if (fileName.endsWith(".yml") || fileName.endsWith(".yaml"))
      fromYaml(stem, text, content = "")
    else {
      val (header, body) = splitHeader(fileName, text)
      val defaultType =
        if (fileName.endsWith(".py")) AssetType.SparkPython else AssetType.SparkSql
      header match {
        case Some(yamlText) => fromYaml(stem, yamlText, body, defaultType)
        case scala.None     => Asset(name = stem, assetType = defaultType, content = body)
      }
    }
  }

  def parseFile(path: Path): Asset =
    parse(path.toString, Files.readString(path))

  /** Strip the @bruin header; return (headerYaml, remaining content). */
  def splitHeader(fileName: String, text: String): (Option[String], String) = {
    val re = if (fileName.endsWith(".py")) PyHeader else SqlHeader
    re.findFirstMatchIn(text) match {
      case Some(m) => (Some(m.group(1)), re.replaceFirstIn(text, "").trim)
      case scala.None => (scala.None, text.trim)
    }
  }

  // ---- YAML → model ------------------------------------------------------

  def fromYaml(defaultName: String, yamlText: String, content: String,
               defaultType: String = AssetType.SparkSql): Asset = {
    val root = Option(new Yaml().load[Any](yamlText)).map(asMap).getOrElse(Map.empty)
    val name = str(root, "name").getOrElse(defaultName)
    val typ  = AssetType.normalize(str(root, "type").getOrElse(defaultType))

    val upstreams = seq(root, "depends").map {
      case s: String => Upstream(s)
      case m         =>
        val mm = asMap(m)
        Upstream(
          str(mm, "asset").orElse(str(mm, "uri")).getOrElse(""),
          typ = if (mm.contains("uri")) "uri" else "asset",
          mode = str(mm, "mode").getOrElse("full"))
    }

    val columns = seq(root, "columns").map(c => parseColumn(asMap(c)))
    val mat = map(root, "materialization").map(parseMaterialization).getOrElse(Materialization())

    val custom = seq(root, "custom_checks").map { c =>
      val m = asMap(c)
      CustomCheck(
        name = str(m, "name").getOrElse("custom"),
        query = str(m, "query").getOrElse(""),
        value = longOpt(m, "value"),
        count = longOpt(m, "count"),
        blocking = bool(m, "blocking").getOrElse(true))
    }

    val params = map(root, "parameters")
      .map(_.map { case (k, v) => k -> String.valueOf(v) })
      .getOrElse(Map.empty)

    val unitTests = seq(root, "unit_tests").map(parseUnitTest)

    Asset(
      name = name, assetType = typ,
      description = str(root, "description").getOrElse(""),
      content = if (content.nonEmpty) content else str(root, "query").getOrElse(""),
      upstreams = upstreams, columns = columns, materialization = mat,
      customChecks = custom, parameters = params,
      secrets = seq(root, "secrets").map { s =>
        val m = asMap(s)
        val key = str(m, "key").getOrElse("")
        SecretMapping(key, str(m, "inject_as").getOrElse(key))
      },
      intervalModifiers = map(root, "interval_modifiers").map { m =>
        IntervalModifiers(start = str(m, "start"), end = str(m, "end"))
      }.getOrElse(IntervalModifiers()),
      hooks = map(root, "hooks").map { h =>
        Hooks(
          pre = seq(h, "pre").map(String.valueOf(_)),
          post = seq(h, "post").map(String.valueOf(_)))
      }.getOrElse(Hooks()),
      tags = seq(root, "tags").map(String.valueOf(_)),
      owner = str(root, "owner").getOrElse(""),
      tier = longOpt(root, "tier").map(_.toInt).getOrElse(0),
      notifications = parseNotifications(root),
      unknownFields = (root.keySet -- KnownAssetKeys).toSeq.sorted,
      unitTests = unitTests)
  }

  /** Header keys the parser understands — anything else is a typo the
    * unknown-asset-fields lint surfaces (reference lint/list.go). */
  private val KnownAssetKeys = Set(
    "name", "type", "description", "query", "depends", "columns",
    "materialization", "custom_checks", "parameters", "unit_tests",
    "secrets", "interval_modifiers", "hooks", "tags", "owner", "tier",
    "notifications")

  private val KnownPipelineKeys = Set(
    "name", "schedule", "start_date", "variables", "variants",
    "concurrency", "retries", "notifications")

  /** `notifications:` block (reference pipeline.go Notifications): slack
    * entries are `{channel: "#x"}` maps or bare channel strings; email
    * entries are `{recipients: [a@b, …]}` groups. */
  private def parseNotifications(root: Map[String, Any]): Notifications =
    map(root, "notifications").map { n =>
      Notifications(
        slack = seq(n, "slack").map {
          case s: String => s
          case m => str(asMap(m), "channel").getOrElse("")
        },
        emails = seq(n, "email").map(e => seq(asMap(e), "recipients").map(String.valueOf(_))))
    }.getOrElse(Notifications())

  private def parseColumn(m: Map[String, Any]): Column = {
    val checks = seq(m, "checks").map {
      case s: String => ColumnCheck(s)
      case c =>
        val cm = asMap(c)
        ColumnCheck(
          name = str(cm, "name").getOrElse(""),
          value = cm.get("value").map(CheckValue.of),
          blocking = bool(cm, "blocking").getOrElse(true))
    }
    Column(
      name = str(m, "name").getOrElse(""),
      typ = str(m, "type").getOrElse(""),
      description = str(m, "description").getOrElse(""),
      primaryKey = bool(m, "primary_key").getOrElse(false),
      updateOnMerge = bool(m, "update_on_merge").getOrElse(false),
      nullable = bool(m, "nullable").getOrElse(true),
      mask = str(m, "mask").getOrElse(""),
      mergeSql = str(m, "merge_sql").getOrElse(""),
      extendsRef = str(m, "extends").getOrElse(""),
      checks = checks)
  }

  private def parseMaterialization(m: Map[String, Any]): Materialization =
    Materialization(
      typ = str(m, "type").map(MaterializationType.parse).getOrElse(MaterializationType.None),
      strategy = str(m, "strategy").map(Strategy.parse),
      partitionBy = strOrList(m, "partition_by"),
      clusterBy = strOrList(m, "cluster_by"),
      bucketBy = strOrList(m, "bucket_by"),
      buckets = longOpt(m, "buckets").map(_.toInt).getOrElse(0),
      incrementalKey = str(m, "incremental_key"),
      incrementalPredicate = str(m, "incremental_predicate"),
      timeGranularity = str(m, "time_granularity").map(TimeGranularity.parse)
        .getOrElse(TimeGranularity.Timestamp))

  private def parseUnitTest(raw: Any): UnitTest = {
    val m = asMap(raw)
    val inputs = seq(m, "inputs").map { i =>
      val im = asMap(i)
      UnitTestFixture(
        asset = str(im, "asset").getOrElse(""),
        rows = seq(im, "rows").map(asMap))
    }
    val exp = map(m, "expected").map { em =>
      UnitTestExpectation(
        rows = seq(em, "rows").map(asMap),
        count = longOpt(em, "count"),
        matchMode = str(em, "match").getOrElse("subset"),
        order = str(em, "order").getOrElse("any"))
    }.getOrElse(UnitTestExpectation())
    def parseExpectation(em: Map[String, Any]): UnitTestExpectation =
      UnitTestExpectation(
        rows = seq(em, "rows").map(asMap),
        count = longOpt(em, "count"),
        matchMode = str(em, "match").getOrElse("subset"),
        order = str(em, "order").getOrElse("any"))
    val ctes = map(m, "expected_ctes").getOrElse(Map.empty).map {
      case (cte, body) => cte -> parseExpectation(asMap(body))
    }
    UnitTest(
      name = str(m, "name").getOrElse(""),
      inputs = inputs, expected = exp,
      cteExpectations = ctes,
      executionTime = str(m, "execution_time"))
  }

  // ---- pipeline.yml ------------------------------------------------------

  def parsePipelineYaml(text: String): Pipeline = {
    val root = Option(new Yaml().load[Any](text)).map(asMap).getOrElse(Map.empty)
    // variables accept both the plain form (`env: prod`) and the reference's
    // schema form (`env: {type: string, default: prod}` —
    // pkg/pipeline/variables.go:17-81)
    val rawVars = map(root, "variables").getOrElse(Map.empty)
    // schema form is recognized by `type` OR `default` — a schema entry
    // missing its default must NOT leak into plain variables (it would render
    // the raw map into SQL); Variables.validate reports it instead
    val (schemaForm, plainForm) = rawVars.partition {
      case (_, m: java.util.Map[_, _]) =>
        val mm = asMap(m); mm.contains("default") || mm.contains("type")
      case _ => false
    }
    val schema = schemaForm.map { case (k, v) =>
      k -> asMap(v).map { case (sk, sv) => sk -> toScala(sv) }
    }
    val defaults = schema.flatMap { case (k, s) => s.get("default").map(k -> _) }
    val variants = map(root, "variants").getOrElse(Map.empty).map {
      case (vn, vv) => vn -> asMap(vv).map { case (k, v) => k -> toScala(v) }
    }
    Pipeline(
      name = str(root, "name").getOrElse("pipeline"),
      schedule = str(root, "schedule").getOrElse(""),
      startDate = str(root, "start_date").getOrElse(""),
      variables = plainForm.map { case (k, v) => k -> toScala(v) } ++ defaults,
      variableSchema = schema,
      variants = variants,
      concurrency = longOpt(root, "concurrency").map(_.toInt).getOrElse(1),
      retries = longOpt(root, "retries").map(_.toInt).getOrElse(0),
      notifications = parseNotifications(root),
      unknownFields = (root.keySet -- KnownPipelineKeys).toSeq.sorted)
  }

  /** Recursively convert snakeyaml's java collections to Scala. */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> toScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.toSeq.map(toScala)
    case i: java.lang.Integer => i.toLong
    case other => other
  }

  /** Load a pipeline directory: pipeline.yml + the assets dir. */
  def loadPipeline(dir: Path): Pipeline = {
    val pyml = dir.resolve("pipeline.yml")
    val base =
      if (Files.exists(pyml)) parsePipelineYaml(Files.readString(pyml))
      else Pipeline(name = dir.getFileName.toString)
    val assetsDir = dir.resolve("assets")
    val assets =
      if (!Files.exists(assetsDir)) Nil
      else Files.walk(assetsDir).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter { p =>
          val n = p.toString
          n.endsWith(".sql") || n.endsWith(".py") || n.endsWith(".yml") || n.endsWith(".yaml")
        }
        .map(parseFile).toSeq.sortBy(_.name)
    // glossary enrichment: columns with `extends:` inherit entity-attribute
    // metadata (reference pipeline.go:1747-1784); unresolvable refs are left
    // as-is for Lint to report
    val glossary = Glossary.load(dir.toString)
    val enriched =
      if (glossary.isEmpty) assets
      else assets.map { a =>
        try Glossary.enrich(a, glossary) catch { case _: IllegalArgumentException => a }
      }
    base.copy(assets = enriched)
  }

  def loadPipeline(dir: String): Pipeline = loadPipeline(Paths.get(dir))

  // ---- yaml plumbing -----------------------------------------------------

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> (vv: Any) }.toMap
    case _ => Map.empty
  }
  private def map(m: Map[String, Any], k: String): Option[Map[String, Any]] =
    m.get(k).collect { case mm: java.util.Map[_, _] => asMap(mm) }
  private def seq(m: Map[String, Any], k: String): Seq[Any] = m.get(k) match {
    case Some(l: java.util.List[_]) => l.asScala.toSeq
    case _ => Nil
  }
  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case s if s != null => String.valueOf(s) }.filter(_.nonEmpty)
  private def bool(m: Map[String, Any], k: String): Option[Boolean] = m.get(k).collect {
    case b: Boolean => b
    case b: java.lang.Boolean => b.booleanValue
    case s: String => s.equalsIgnoreCase("true")
  }
  /** Accept `key: col` or `key: [col1, col2]`. */
  private def strOrList(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(l: java.util.List[_]) => l.asScala.toSeq.map(String.valueOf(_))
    case Some(s) if s != null       => Seq(String.valueOf(s)).filter(_.nonEmpty)
    case _                          => Nil
  }
  private def longOpt(m: Map[String, Any], k: String): Option[Long] = m.get(k).collect {
    case i: Int => i.toLong
    case l: Long => l
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
    case s: String if s.matches("-?\\d+") => s.toLong
  }
}
