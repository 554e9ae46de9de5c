package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.exec.{Lint, PipelineRunner, RunState, Scheduler, Selector, Sensors}
import graft.model._

class SchedulerSpec extends AnyFunSuite {
  import SparkTestSession._

  private val pipelineDir = "src/test/resources/pipelines/demo"

  test("end-to-end: seed -> sql asset -> checks -> downstream") {
    val p = AssetParser.loadPipeline(pipelineDir)
    assert(p.name == "demo" && p.assets.map(_.name).sorted ==
      Seq("expensive_products", "product_summary", "raw_products"))
    assert(Lint.validate(p).isEmpty, Lint.validate(p).mkString("; "))

    val runner = new PipelineRunner(spark, baseDir = pipelineDir)
    val results = runner.run(p)
    assert(results.values.forall(_.status == Scheduler.Succeeded),
      results.filter(_._2.status != Scheduler.Succeeded).keys.mkString(", "))

    val rows = spark.table("expensive_products").orderBy("product_id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2)) // var.min_price=300 rendered
    val summary = spark.table("product_summary").head()
    assert(summary.getLong(0) == 2L && summary.getDouble(1) == 499.99)
  }

  test("blocking check failure cascades; non-blocking does not") {
    def pipeline(blocking: Boolean) = Pipeline(name = "p", assets = Seq(
      Asset(name = "a", columns = Seq(Column("x", "INT",
        checks = Seq(ColumnCheck("failcheck", blocking = blocking))))),
      Asset(name = "b", upstreams = Seq(Upstream("a")))))

    def run(blocking: Boolean) =
      Scheduler.run(pipeline(blocking), {
        case i if i.id == "a:check:x:failcheck" => throw new RuntimeException("boom")
        case _ => ()
      }, concurrency = 2)

    val blocked = run(blocking = true)
    assert(blocked("a:check:x:failcheck").status == Scheduler.Failed)
    assert(blocked("b").status == Scheduler.UpstreamFailed)

    val soft = run(blocking = false)
    assert(soft("a:check:x:failcheck").status == Scheduler.Failed)
    assert(soft("b").status == Scheduler.Succeeded)
  }

  test("--only restricts task types; excluded dependencies count satisfied") {
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "a", columns = Seq(Column("x", "INT",
        checks = Seq(ColumnCheck("failcheck"))))), // blocking by default
      Asset(name = "b", upstreams = Seq(Upstream("a")))))
    def exec(i: Scheduler.Instance): Unit =
      if (i.id == "a:check:x:failcheck") throw new RuntimeException("boom")
    // only=main: the failing check never runs, so b is NOT gated on it
    val mains = Scheduler.run(p, exec, concurrency = 2, only = Set("main"))
    assert(mains.keySet == Set("a", "b"), mains.keySet.toString)
    assert(mains.values.forall(_.status == Scheduler.Succeeded))
    // only=checks: mains are assumed current; the check runs (and fails)
    // without re-materializing anything
    val checks = Scheduler.run(p, exec, concurrency = 2, only = Set("checks"))
    assert(checks.keySet == Set("a:check:x:failcheck"))
    assert(checks("a:check:x:failcheck").status == Scheduler.Failed)
    // CLI validation: unknown type is a usage error
    assert(Main.run(Seq("run", pipelineDir, "--only", "nope"), Some(spark)) == 2)
    // CLI happy path over the demo pipeline: checks-only run, all green
    assert(Main.run(Seq("run", pipelineDir, "--only", "main"), Some(spark)) == 0)
    assert(Main.run(Seq("run", pipelineDir, "--only", "checks"), Some(spark)) == 0)
  }

  test("retries recover flaky instances") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = Pipeline(name = "p", assets = Seq(Asset(name = "flaky")))
    val res = Scheduler.run(p, _ => {
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("flaky")
    }, retries = 3)
    assert(res("flaky").status == Scheduler.Succeeded && res("flaky").attempts == 3)
  }

  test("selectors: upstream/downstream closure, tags, component") {
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "a"),
      Asset(name = "b", upstreams = Seq(Upstream("a")), tags = Seq("gold")),
      Asset(name = "c", upstreams = Seq(Upstream("b"))),
      Asset(name = "d")))
    assert(Selector.select(p, Seq("+c")) == Set("a", "b", "c"))
    assert(Selector.select(p, Seq("1+c")) == Set("b", "c"))
    assert(Selector.select(p, Seq("a+")) == Set("a", "b", "c"))
    assert(Selector.select(p, Seq("tag:gold")) == Set("b"))
    assert(Selector.select(p, Seq("@a")) == Set("a", "b", "c"))
    assert(Selector.select(p, Seq("d", "b")) == Set("d", "b"))
  }

  test("sensors: modes and timeout") {
    assert(Sensors.querySensor(spark, "SELECT 1", mode = "once") == Sensors.Met)
    assert(Sensors.querySensor(spark, "SELECT 0", mode = "skip") == Sensors.SkipRun)
    intercept[Sensors.SensorTimeout] {
      Sensors.querySensor(spark, "SELECT 0", mode = "wait",
        pokeIntervalMs = 1, timeoutMs = 3, sleep = _ => ())
    }
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "sensor_target")
    intercept[Sensors.SensorTimeout] {
      Sensors.tableSensor(spark, "sensor_target", mode = "once")
    }
    spark.sql("CREATE TABLE sensor_target USING parquet AS SELECT 1 AS x")
    assert(Sensors.tableSensor(spark, "sensor_target", mode = "once") == Sensors.Met)
  }

  test("lint catches bad configs and cycles") {
    val bad = Pipeline(name = "p", assets = Seq(
      Asset(name = "x", upstreams = Seq(Upstream("ghost")),
        materialization = Materialization(typ = MaterializationType.Table,
          strategy = Some(Strategy.DeleteInsert))),
      Asset(name = "y", upstreams = Seq(Upstream("z"))),
      Asset(name = "z", upstreams = Seq(Upstream("y")))))
    val issues = Lint.validate(bad)
    assert(issues.exists(_.rule == "dependency-exists"))
    assert(issues.exists(_.rule == "materialization-config"))
    assert(issues.exists(_.rule == "acyclic-pipeline"))

    assert(Lint.dryRun(spark, "SELECT nope FROM missing_table").isLeft)
    assert(Lint.dryRun(spark, "SELECT 1").isRight)
  }

  test("lint validates tier, notifications, and dry-runs hooks/checks") {
    val bad = Pipeline(name = "p",
      notifications = Notifications(slack = Seq("#ops", "ops")), // dup after '#' strip
      assets = Seq(
        Asset(name = "a", content = "SELECT 1", tier = 9,
          notifications = Notifications(
            slack = Seq(""), emails = Seq(Nil, Seq("not-an-email"))),
          hooks = Hooks(pre = Seq("SELEC BROKEN FROM")),
          customChecks = Seq(CustomCheck(name = "c1", query = "SELECT count(* FROM t", value = Some(0))))))
    val rules = Lint.validate(bad, spark = Some(spark)).map(_.rule)
    assert(rules.contains("valid-asset-tier"))
    assert(rules.count(_ == "valid-notifications") >= 4,
      s"want dup-channel + empty-channel + empty-recipients + bad-email, got $rules")
    assert(rules.contains("hook-query-dry-run"))
    assert(rules.contains("custom-check-query-dry-run"))
    // clean config passes every new rule
    val ok = Pipeline(name = "p",
      notifications = Notifications(slack = Seq("#ops"), emails = Seq(Seq("a@b.co"))),
      assets = Seq(Asset(name = "a", content = "SELECT 1", tier = 1,
        hooks = Hooks(pre = Seq("SELECT {{ start_date }}")),
        customChecks = Seq(CustomCheck(name = "c1", query = "SELECT count(*) FROM t", count = Some(1))))))
    assert(Lint.validate(ok, spark = Some(spark)).isEmpty)
    // typo'd header keys surface as unknown-asset-fields
    val typo = AssetParser.fromYaml("n", "name: n\nmaterialisation:\n  type: table\n", "SELECT 1")
    assert(typo.unknownFields == Seq("materialisation"))
    assert(Lint.validate(Pipeline(name = "p", assets = Seq(typo)))
      .exists(_.rule == "unknown-asset-fields"))
    assert(AssetParser.parsePipelineYaml("name: p\nschedle: daily\n").unknownFields == Seq("schedle"))

    // header YAML parses the new fields
    val parsed = AssetParser.fromYaml("n",
      """name: n
        |tier: 2
        |notifications:
        |  slack:
        |    - channel: "#alerts"
        |  email:
        |    - recipients: [x@y.co]
        |""".stripMargin, "SELECT 1")
    assert(parsed.tier == 2 && parsed.notifications.slack == Seq("#alerts") &&
      parsed.notifications.emails == Seq(Seq("x@y.co")))
  }

  test("CLI drives the demo pipeline end-to-end") {
    assert(Main.run(Seq("run", pipelineDir), Some(spark)) == 0)
    assert(spark.table("expensive_products").count() == 2)
    assert(Main.run(Seq("lint", pipelineDir), Some(spark)) == 0)
    // expensive_products calls a user macro file — render must load macros
    assert(Main.run(Seq("render", pipelineDir, "expensive_products"), Some(spark)) == 0)
    // --check is a boolean flag: the dir after it is still the positional arg
    assert(Main.run(Seq("format", "--check", pipelineDir), Some(spark)) >= 0)
    // parse-pipeline emits valid JSON with the full asset model
    val jsonOut = graft.model.JsonDump.pipeline(AssetParser.loadPipeline(pipelineDir))
    assert(jsonOut.contains("\"name\":\"demo\"") && jsonOut.contains("\"expensive_products\""))
    assert(Main.run(Seq("parse-pipeline", pipelineDir), Some(spark)) == 0)
    assert(Main.run(Seq("clean"), Some(spark)) == 0)
    // query --asset renders (with macros) and runs the asset's SQL
    assert(Main.run(Seq("query", "--asset", "expensive_products",
      "--dir", pipelineDir, "--limit", "5"), Some(spark)) == 0)
    // semantic model file query
    val modelFile = java.nio.file.Files.createTempFile("graft-model", ".yml")
    java.nio.file.Files.writeString(modelFile,
      """name: products_model
        |table: raw_products
        |dimensions:
        |  - name: pname
        |    expression: name
        |metrics:
        |  - name: n
        |    expression: COUNT(1)
        |  - name: total_price
        |    expression: CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
        |""".stripMargin)
    assert(Main.run(Seq("query", "--model", modelFile.toString,
      "--dimensions", "pname", "--metrics", "n,total_price"), Some(spark)) == 0)
    assert(Main.run(Seq("query", "--q", "SELECT 1 AS one", "--limit", "5"), Some(spark)) == 0)
    assert(Main.run(Seq("nonsense"), Some(spark)) == 2)
    // selector subset: only the seed runs
    assert(Main.run(Seq("run", pipelineDir, "--select", "raw_products"), Some(spark)) == 0)
  }

  test("dev environment schema_prefix renames targets and references") {
    import graft.config.{Config, Environment}
    val cfg = Config.parse(
      """default_environment: default
        |environments:
        |  default:
        |    connections: {}
        |  dev:
        |    schema_prefix: dev_
        |    connections:
        |      src_db:
        |        type: jdbc
        |        uri: jdbc:derby:memory:${DERBY_DB_NAME};create=true
        |""".stripMargin, env = Map("DERBY_DB_NAME" -> "cfgdb"))
    assert(cfg.environment(scala.None).name == "default")
    val dev = cfg.environment(Some("dev"))
    assert(dev.schemaPrefix == "dev_")
    assert(dev.connection("src_db").get.uri == "jdbc:derby:memory:cfgdb;create=true")
    // the SCHEMA segment gets the prefix (reference devenv/modifier.go:110)
    assert(dev.physicalName("sales.orders") == "dev_sales.orders")
    assert(dev.physicalName("cat.sales.orders") == "cat.dev_sales.orders")
    assert(dev.physicalName("orders") == "dev_orders")

    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "dev_expensive_products")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "dev_product_summary")
    val p = AssetParser.loadPipeline(pipelineDir)
    val runner = new PipelineRunner(spark, baseDir = pipelineDir, environment = dev)
    val results = runner.run(p)
    assert(results.values.forall(r => r.status == Scheduler.Succeeded),
      results.filter(_._2.status != Scheduler.Succeeded).keys.mkString(", "))
    // targets landed under the prefix, and downstream read the prefixed upstream
    assert(spark.table("dev_expensive_products").count() == 2)
    assert(spark.table("dev_product_summary").head().getLong(0) == 2L)

    // full-refresh restriction
    val restricted = Environment(name = "prod", fullRefreshRestricted = true)
    intercept[IllegalArgumentException] {
      new PipelineRunner(spark, baseDir = pipelineDir,
        fullRefresh = true, environment = restricted)
    }

    // qualified VIEW assets resolve under the prefix too (materialized as
    // tables in the dev sandbox)
    spark.sql("CREATE DATABASE IF NOT EXISTS dev_vs")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "dev_vs.v_prices")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "dev_vs.price_stats")
    val vp = Pipeline(name = "vp", assets = Seq(
      Asset(name = "vs.v_prices", content = "SELECT 42 AS price",
        materialization = Materialization(typ = MaterializationType.View)),
      Asset(name = "vs.price_stats",
        content = "SELECT max(price) AS max_price FROM vs.v_prices",
        upstreams = Seq(Upstream("vs.v_prices")),
        materialization = Materialization(typ = MaterializationType.Table))))
    val vr = new PipelineRunner(spark, environment = dev).run(vp)
    assert(vr.values.forall(_.status == Scheduler.Succeeded),
      vr.filter(_._2.status != Scheduler.Succeeded).mkString(", "))
    assert(spark.table("dev_vs.price_stats").head().getInt(0) == 42)
  }

  test("dev environment isolates script-asset DDL write targets") {
    import graft.config.Environment
    val dev = Environment(name = "dev", schemaPrefix = "dev_")
    Seq("scr_src", "dev_scr_src", "scr_scratch", "dev_scr_scratch")
      .foreach(t => graft.materialize.SessionCatalogWarehouse.dropAny(spark, t))
    // the script's CTAS names an AD-HOC table (not a pipeline asset): the
    // sandbox prefix must still apply, or dev runs would write prod names
    // (ADVICE r2 — write targets of script DDL were not renamed)
    val p = Pipeline(name = "script", assets = Seq(
      Asset(name = "scr_src", content = "SELECT 1 AS x",
        materialization = Materialization(typ = MaterializationType.Table)),
      Asset(name = "scr_script", upstreams = Seq(Upstream("scr_src")), content =
        """CREATE TABLE scr_scratch AS SELECT x FROM scr_src;
          |INSERT INTO scr_scratch SELECT 2 AS x;
          |""".stripMargin)))
    val r = new PipelineRunner(spark, environment = dev).run(p)
    assert(r.values.forall(_.status == Scheduler.Succeeded),
      r.filter(_._2.status != Scheduler.Succeeded).keys.mkString(", "))
    // CTAS + INSERT landed under the prefix; the prod names never existed
    assert(spark.table("dev_scr_scratch").count() == 2)
    assert(!spark.catalog.tableExists("scr_scratch"))
    assert(!spark.catalog.tableExists("scr_src"))
    // DROP in a dev script drops the sandbox table, not prod
    val drop = Pipeline(name = "drop", assets = Seq(
      Asset(name = "scr_drop", content = "DROP TABLE scr_scratch; SELECT 1 AS ok;")))
    val dr = new PipelineRunner(spark, environment = dev).run(drop)
    assert(dr.values.forall(_.status == Scheduler.Succeeded))
    assert(!spark.catalog.tableExists("dev_scr_scratch"))
  }

  test("value flags without values are usage errors, not silent booleans") {
    // trailing value flag (ADVICE r2: was parsed as boolean "true")
    assert(Main.run(Seq("run", pipelineDir, "--start-date"), Some(spark)) == 2)
    // value flag consuming the next --flag as its value
    assert(Main.run(Seq("run", pipelineDir, "--select", "--full-refresh"), Some(spark)) == 2)
    // boolean flags still fine in last position
    assert(Main.run(Seq("lint", pipelineDir, "--full-refresh"), Some(spark)) == 0)
  }

  test("check annotation JSON survives quotes and backslashes in names") {
    val a = graft.checks.Checks.annotation("""pipe"line""", """as\set""", "col", "not_null")
    assert(a ==
      """-- graft.check: {"pipeline": "pipe\"line", "asset": "as\\set", "column": "col", "check": "not_null"}""")
  }

  test("lint rule table: each bad config trips its rule") {
    def issuesOf(p: Pipeline, env: Option[graft.config.Environment] = scala.None) =
      Lint.validate(p, env).map(_.rule).toSet
    def one(a: Asset) = Pipeline(name = "p", assets = Seq(a))

    val cases: Seq[(String, Pipeline)] = Seq(
      "valid-pipeline-name" -> Pipeline(name = "bad name!"),
      "valid-pipeline-schedule" -> Pipeline(name = "p", schedule = "sometimes"),
      "valid-pipeline-start-date" -> Pipeline(name = "p", startDate = "not-a-date"),
      "valid-pipeline-concurrency" -> Pipeline(name = "p", concurrency = 0),
      "valid-task-type" -> one(Asset(name = "a", assetType = "teradata.sql")),
      "asset-name-component-count" -> one(Asset(name = "a.b.c.d", content = "SELECT 1")),
      "valid-executable-file" -> one(Asset(name = "a", content = "")),
      "valid-ingestr" -> one(Asset(name = "a", assetType = AssetType.Ingest)),
      "valid-table-sensor-table" -> one(Asset(name = "a", assetType = AssetType.SensorTable)),
      "valid-sensor-mode" -> one(Asset(name = "a", assetType = AssetType.SensorQuery,
        content = "SELECT 1", parameters = Map("mode" -> "maybe"))),
      "valid-timeout" -> one(Asset(name = "a", content = "SELECT 1",
        parameters = Map("timeout" -> "-5"))),
      "valid-interval-modifiers" -> one(Asset(name = "a", content = "SELECT 1",
        intervalModifiers = IntervalModifiers(start = Some("2 fortnights")))),
      "custom-check-query-exists" -> one(Asset(name = "a", content = "SELECT 1",
        customChecks = Seq(CustomCheck("c", query = " ")))),
      "custom-check-name-unique" -> one(Asset(name = "a", content = "SELECT 1",
        customChecks = Seq(CustomCheck("c", "SELECT 1"), CustomCheck("c", "SELECT 2")))),
      "duplicate-tags" -> one(Asset(name = "a", content = "SELECT 1", tags = Seq("x", "x"))),
      "secret-mapping-unique" -> one(Asset(name = "a", content = "SELECT 1",
        secrets = Seq(SecretMapping("k1", "ENV"), SecretMapping("k2", "ENV")))),
      "cross-pipeline-uri-dependencies" -> one(Asset(name = "a", content = "SELECT 1",
        upstreams = Seq(Upstream("://no-scheme/events", typ = "uri")))))
    cases.foreach { case (rule, p) =>
      assert(issuesOf(p).contains(rule), s"expected rule $rule for $p")
    }
    // a well-formed uri dependency is clean
    assert(!issuesOf(one(Asset(name = "a", content = "SELECT 1",
      upstreams = Seq(Upstream("pipeline://other/events", typ = "uri")))))
      .contains("cross-pipeline-uri-dependencies"))
    // secret key resolution needs the environment
    val withSecret = one(Asset(name = "a", content = "SELECT 1",
      secrets = Seq(SecretMapping("ghost", "G"))))
    assert(issuesOf(withSecret, Some(graft.config.Environment()))
      .contains("secret-mapping-key-exists"))
    // a clean pipeline trips nothing
    assert(issuesOf(one(Asset(name = "ok", content = "SELECT 1"))).isEmpty)
  }

  test("full fixture pipeline: seed + ingest + macros + python + sensor + glossary") {
    val dir = "src/test/resources/pipelines/full"
    Seq("raw_products", "raw_orders", "product_stats", "product_flags",
        "dev_raw_products", "dev_raw_orders", "dev_product_stats", "dev_product_flags")
      .foreach(t => graft.materialize.SessionCatalogWarehouse.dropAny(spark, t))

    // glossary enrichment happened at load
    val p = AssetParser.loadPipeline(dir)
    val statCol = p.asset("product_stats").get.columns.head
    assert(statCol.name == "product_id" && statCol.description == "unique product identifier")

    // default environment, default variables: only the 499.99 widget clears
    // the 400 price floor
    assert(Main.run(Seq("run", dir), Some(spark)) == 0)
    assert(spark.table("raw_orders").select("secret").distinct().head().getString(0) == "****")
    assert(spark.table("product_stats").count() == 1)
    assert(spark.table("run_marker").head().getString(0) == "done") // hooks ran
    assert(spark.table("product_flags").count() == 2)

    // variant lowers the floor: two products qualify
    assert(Main.run(Seq("run", dir, "--variant", "cheap"), Some(spark)) == 0)
    assert(spark.table("product_stats").count() == 2)

    // --var override beats the default — and an impossible floor leaves the
    // table empty, so the blocking has_rows check fails the run (exit 1)
    assert(Main.run(Seq("run", dir, "--var", "min_price=1000"), Some(spark)) == 1)
    assert(spark.table("product_stats").count() == 0)
    // variant restores a passing state for the runs below
    assert(Main.run(Seq("run", dir, "--variant", "cheap"), Some(spark)) == 0)

    // dev environment: everything lands under dev_ prefixed names
    assert(Main.run(Seq("run", dir, "--environment", "dev"), Some(spark)) == 0)
    assert(spark.table("dev_product_stats").count() == 1)
    assert(spark.table("dev_product_flags").count() == 2)

    // query --asset under the dev environment reads the dev tables, not
    // prod: with the prod upstreams dropped, the query only resolves if
    // the renames actually applied
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "raw_products")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "raw_orders")
    assert(Main.run(Seq("query", "--asset", "product_stats", "--dir", dir,
      "--environment", "dev", "--limit", "5"), Some(spark)) == 0)
    intercept[Exception] { // un-renamed read hits the dropped prod tables
      Main.run(Seq("query", "--asset", "product_stats", "--dir", dir,
        "--limit", "5"), Some(spark))
    }
  }

  test("multi-statement script assets run each statement in order") {
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "ms_a")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "ms_b")
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "script", content =
        """CREATE TABLE ms_a USING parquet AS SELECT 1 AS x;
          |CREATE TABLE ms_b USING parquet AS SELECT x + 1 AS y FROM ms_a;
          |""".stripMargin)))
    val results = new PipelineRunner(spark).run(p)
    assert(results("script").status == Scheduler.Succeeded)
    assert(spark.table("ms_b").head().getInt(0) == 2)

    // a materialization strategy over multiple statements is rejected
    val bad = Pipeline(name = "p", assets = Seq(
      Asset(name = "bad_script", content = "SELECT 1; SELECT 2",
        materialization = Materialization(typ = MaterializationType.Table))))
    val r2 = new PipelineRunner(spark).run(bad)
    assert(r2("bad_script").status == Scheduler.Failed)
    assert(r2("bad_script").error.exists(_.getMessage.contains("single query")))
  }

  test("glossary entities enrich extends: columns; lint validates references") {
    val g = Glossary.parse(
      """entities:
        |  - name: Customer
        |    description: A person
        |    attributes:
        |      ID:
        |        type: BIGINT
        |        description: unique customer id
        |      Email:
        |        type: STRING
        |        description: contact email
        |""".stripMargin)
    assert(g.entity("Customer").get.attributes("ID").typ == "BIGINT")

    val asset = Asset(name = "a", content = "SELECT 1", columns = Seq(
      Column("customer_id", extendsRef = "Customer.ID", description = "declared wins"),
      Column("", extendsRef = "Customer.Email")))
    val enriched = Glossary.enrich(asset, g)
    assert(enriched.columns(0).typ == "BIGINT")
    assert(enriched.columns(0).description == "declared wins") // declared value kept
    assert(enriched.columns(1).name == "Email")                // inherited name
    assert(enriched.columns(1).description == "contact email")

    val bad = Pipeline(name = "p", assets = Seq(Asset(name = "a", content = "SELECT 1",
      columns = Seq(Column("x", extendsRef = "Ghost.Nope")))))
    assert(Lint.validate(bad, glossary = Some(g)).exists(_.rule == "valid-entity-references"))
    assert(Lint.validate(bad).exists(_.rule == "valid-entity-references")) // no glossary at all
  }

  test("variables schema, variants, and --var overrides") {
    val p = AssetParser.parsePipelineYaml(
      """name: vp
        |variables:
        |  env:
        |    type: string
        |    default: dev
        |  limit:
        |    type: integer
        |    default: 10
        |  plain_legacy: hello
        |variants:
        |  prod_run:
        |    env: prod
        |    limit: 100
        |  broken:
        |    limit: not_a_number
        |""".stripMargin)
    assert(p.variables == Map("env" -> "dev", "limit" -> 10L, "plain_legacy" -> "hello"))
    assert(p.variableSchema("env")("type") == "string")

    val prod = Variables.applyVariant(p, "prod_run")
    assert(prod.variables("env") == "prod" && prod.variables("limit") == 100L)
    intercept[IllegalArgumentException](Variables.applyVariant(p, "nope"))
    intercept[IllegalArgumentException](
      Variables.applyOverrides(p, Map("limit" -> "ten"))) // type mismatch
    intercept[IllegalArgumentException](
      Variables.applyOverrides(p, Map("ghost" -> 1)))     // unknown var
    val ok = Variables.applyOverrides(p, Map("limit" -> 42L))
    assert(ok.variables("limit") == 42L)

    // lint surfaces the broken variant
    val issues = Lint.validate(p.copy(assets = Seq(Asset(name = "a", content = "SELECT 1"))))
    assert(issues.exists(i => i.rule == "valid-variables" && i.message.contains("broken")))

    // a schema-form variable WITHOUT a default stays out of the rendered
    // values and trips valid-variables instead of leaking its raw map
    val noDflt = AssetParser.parsePipelineYaml(
      """name: vp2
        |variables:
        |  env:
        |    type: string
        |""".stripMargin)
    assert(!noDflt.variables.contains("env"))
    assert(Lint.validate(noDflt).exists(i =>
      i.rule == "valid-variables" && i.message.contains("default")))

    // a config whose default_environment names nothing is an error, not an
    // implicit empty environment
    val cfg = graft.config.Config.parse(
      "default_environment: prod\nenvironments:\n  production:\n    connections: {}\n")
    intercept[IllegalArgumentException](cfg.environment(scala.None))
  }

  test("run state persists and --continue skips completed instances") {
    val dir = java.nio.file.Files.createTempDirectory("graft-continue").toString
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    var failB = true
    val p = Pipeline(name = "cp", assets = Seq(
      Asset(name = "a", content = "SELECT 1 AS x",
        materialization = Materialization(typ = MaterializationType.Table)),
      Asset(name = "b", content = "SELECT 1 AS x", upstreams = Seq(Upstream("a")),
        materialization = Materialization(typ = MaterializationType.Table)),
      Asset(name = "c", content = "SELECT 1 AS x", upstreams = Seq(Upstream("b")),
        materialization = Materialization(typ = MaterializationType.Table))))

    // hand-rolled exec so we can fail b and observe what re-runs
    def runOnce(continueRun: Boolean): Map[String, Scheduler.Result] = {
      val completed = if (continueRun) RunState.completedIds(dir, p.name) else Set.empty[String]
      val results = Scheduler.run(p, { i =>
        ran += i.id
        if (i.asset.name == "b" && failB) throw new RuntimeException("boom")
      }, concurrency = 1, completed = completed)
      RunState.save(dir, p.name, results)
      results
    }

    val first = runOnce(continueRun = false)
    assert(first("a").status == Scheduler.Succeeded)
    assert(first("b").status == Scheduler.Failed)
    assert(first("c").status == Scheduler.UpstreamFailed)

    ran.clear(); failB = false
    val second = runOnce(continueRun = true)
    assert(ran.toSeq == Seq("b", "c"), s"only b and c should re-run, ran: $ran")
    assert(second.values.forall(_.status == Scheduler.Succeeded))

    // a subset run merges into (not overwrites) the saved state
    val subsetOnly = Scheduler.run(p, _ => (), concurrency = 1,
      selected = Some(Set("a")))
    RunState.save(dir, p.name, subsetOnly)
    val merged = RunState.load(dir, p.name)
    assert(merged("b") == "Succeeded" && merged("c") == "Succeeded",
      s"subset save lost prior state: $merged")
  }

  test("connection concurrency limits serialize instances on one connection") {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = Pipeline(name = "p", concurrency = 4, assets = (1 to 6).map(i =>
      Asset(name = s"a$i", parameters = Map("connection" -> "db1"))))
    val results = Scheduler.run(p, { _ =>
      val n = active.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, n))
      Thread.sleep(30)
      active.decrementAndGet()
      ()
    }, concurrency = 4, connectionLimits = Map("db1" -> 2))
    assert(results.values.forall(_.status == Scheduler.Succeeded))
    assert(maxSeen.get() <= 2, s"limit of 2 exceeded: ${maxSeen.get()}")
  }

  test("per-asset timeout and rerun_cooldown") {
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "slow", parameters = Map("timeout" -> "1")),
      Asset(name = "fast", parameters = Map("timeout" -> "30"))))
    val cancelled = new java.util.concurrent.atomic.AtomicReference[String]("")
    val results = Scheduler.run(p, { i =>
      if (i.asset.name == "slow") Thread.sleep(10000)
    }, concurrency = 2, onTimeout = i => cancelled.set(i.id))
    assert(results("slow").status == Scheduler.Failed)
    assert(results("slow").error.exists(_.isInstanceOf[java.util.concurrent.TimeoutException]))
    assert(results("fast").status == Scheduler.Succeeded)
    assert(cancelled.get() == "slow") // job-group cancel hook fired

    // rerun_cooldown spaces per-asset retries; retries parameter overrides
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    val p2 = Pipeline(name = "p", assets = Seq(
      Asset(name = "flaky", parameters = Map("retries" -> "2", "rerun_cooldown" -> "1"))))
    val r2 = Scheduler.run(p2, { _ =>
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("boom")
    }, concurrency = 1)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(r2("flaky").status == Scheduler.Succeeded && attempts.get() == 3)
    assert(elapsedMs >= 2000, s"cooldown not applied: ${elapsedMs}ms")
  }

  test("interval modifiers shift per-asset template dates; hook lists run in order") {
    assert(IntervalModifiers.shift(
      java.time.LocalDateTime.of(2024, 1, 10, 12, 0), "-2h") ==
      java.time.LocalDateTime.of(2024, 1, 10, 10, 0))
    assert(IntervalModifiers.shift(
      java.time.LocalDateTime.of(2024, 1, 10, 12, 0), "1d") ==
      java.time.LocalDateTime.of(2024, 1, 11, 12, 0))
    assert(IntervalModifiers.shift(
      java.time.LocalDateTime.of(2024, 1, 10, 12, 0), "-1M") ==
      java.time.LocalDateTime.of(2023, 12, 10, 12, 0))

    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "im_out")
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "im_out",
        content = "SELECT '{{ start_datetime }}' AS s, '{{ end_datetime }}' AS e",
        materialization = Materialization(typ = MaterializationType.Table),
        intervalModifiers = IntervalModifiers(start = Some("-2h"), end = Some("30m")),
        hooks = Hooks(
          pre = Seq("CREATE OR REPLACE TEMPORARY VIEW hook_order AS SELECT 'pre' AS step"),
          post = Seq("CREATE OR REPLACE TEMPORARY VIEW hook_order AS SELECT 'post' AS step")))))
    val runner = new PipelineRunner(spark)
    assert(runner.run(p).values.forall(_.status == Scheduler.Succeeded))
    val row = spark.table("im_out").head()
    assert(row.getString(0) == "2023-12-31T22:00:00") // start 2024-01-01 - 2h
    assert(row.getString(1) == "2024-01-02T00:30:00") // end + 30m
    assert(spark.table("hook_order").head().getString(0) == "post")
  }

  test("skip-mode sensor with unmet condition skips itself and downstream") {
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "gate", assetType = AssetType.SensorQuery,
        content = "SELECT 0", parameters = Map("mode" -> "skip")),
      Asset(name = "after_gate", content = "SELECT 1 AS x",
        upstreams = Seq(Upstream("gate")),
        materialization = Materialization(typ = MaterializationType.Table)),
      Asset(name = "independent", content = "SELECT 2 AS y",
        materialization = Materialization(typ = MaterializationType.Table))))
    val runner = new PipelineRunner(spark)
    val results = runner.run(p)
    assert(results("gate").status == Scheduler.Skipped)
    assert(results("after_gate").status == Scheduler.Skipped)
    assert(results("independent").status == Scheduler.Succeeded)

    // run-level --sensor-mode override flips the same pipeline to wait/once
    val failing = new PipelineRunner(spark, sensorMode = Some("once"))
    val r2 = failing.run(p)
    assert(r2("gate").status == Scheduler.Failed)
    assert(r2("after_gate").status == Scheduler.UpstreamFailed)
  }
}
