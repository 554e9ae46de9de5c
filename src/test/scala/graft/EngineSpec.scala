package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.diff.DataDiff
import graft.lineage.Lineage
import graft.materialize.SessionCatalogWarehouse
import graft.exec.{PipelineRunner, Scheduler}
import graft.model._
import graft.render.QuerySplitter
import graft.semantic.Semantic
import graft.sources.PythonHandoff
import graft.streaming.Streams
import graft.unittest.UnitTests

class EngineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("unit-test harness: fixtures, freeze time, subset/exact semantics") {
    val pipeline = Pipeline(name = "p", assets = Seq(
      Asset(name = "analytics.orders", columns = Seq(
        Column("id", "INT"), Column("status", "STRING"), Column("amount", "DOUBLE"))),
      Asset(name = "rev",
        content = """SELECT status, CAST(sum(amount) AS DOUBLE) AS revenue,
                    |  CAST(current_timestamp() AS STRING) AS computed_at
                    |FROM analytics.orders WHERE status = 'paid' GROUP BY status""".stripMargin,
        upstreams = Seq(Upstream("analytics.orders")))))
    val asset = pipeline.asset("rev").get
    val test = UnitTest("refunds_excluded",
      inputs = Seq(UnitTestFixture("analytics.orders", Seq(
        Map("id" -> 1, "status" -> "paid", "amount" -> 100.0),
        Map("id" -> 2, "status" -> "refunded", "amount" -> 999.0),
        Map("id" -> 3, "status" -> "paid")))), // sparse: amount -> NULL
      expected = UnitTestExpectation(
        rows = Seq(Map("status" -> "paid", "revenue" -> 100,
          "computed_at" -> "2024-01-01 00:00:00")),
        count = Some(1), matchMode = "exact"),
      executionTime = Some("2024-01-01T00:00:00"))
    assert(UnitTests.run(spark, pipeline, asset, test).isEmpty)

    val failing = test.copy(expected = test.expected.copy(
      rows = Seq(Map("status" -> "paid", "revenue" -> 123))))
    assert(UnitTests.run(spark, pipeline, asset, failing).nonEmpty)
  }

  test("unit tests rewrite tables at the plan level; unmocked upstreams mock empty") {
    import org.apache.spark.sql.graft.SqlBridge
    // 1. table name inside a string literal survives the rename
    spark.sql("SELECT 1 AS id").createOrReplaceTempView("renamed_target")
    val df = SqlBridge.renameTablesSql(spark,
      "SELECT id, 'orders_src untouched' AS note FROM orders_src",
      Map("orders_src" -> "renamed_target"))
    val row = df.head()
    assert(row.getInt(0) == 1 && row.getString(1) == "orders_src untouched")

    // 2. an unmocked upstream with declared columns reads as empty, not as the
    //    real table (or an analysis failure)
    val pipeline = Pipeline(name = "p", assets = Seq(
      Asset(name = "ut.base", columns = Seq(Column("id", "INT"))),
      Asset(name = "ut.extra", columns = Seq(Column("id", "INT"))),
      Asset(name = "combo",
        content = "SELECT count(*) AS n FROM ut.base UNION ALL SELECT count(*) FROM ut.extra",
        upstreams = Seq(Upstream("ut.base"), Upstream("ut.extra")))))
    val test0 = UnitTest("only_base_mocked",
      inputs = Seq(UnitTestFixture("ut.base", Seq(Map("id" -> 1), Map("id" -> 2)))),
      expected = UnitTestExpectation(
        rows = Seq(Map("n" -> 2), Map("n" -> 0)), matchMode = "exact"))
    assert(UnitTests.run(spark, pipeline, pipeline.asset("combo").get, test0).isEmpty)

    // 3. extractSelect pulls the query child out of DML
    val sel = SqlBridge.extractSelect(spark, "INSERT INTO tgt SELECT id FROM src")
    val out = SqlBridge.ofRows(spark,
      SqlBridge.renameTables(sel, Map("src" -> "renamed_target"))).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1))
  }

  test("renameTables rewrites write/DDL targets, with unmapped-prefix fallback") {
    import org.apache.spark.sql.graft.SqlBridge
    val m = Map("tgt" -> "dev_tgt", "src" -> "dev_src")
    def planOf(sql: String, prefix: String => String = identity): String =
      SqlBridge.renameTables(
        spark.sessionState.sqlParser.parsePlan(sql), m, prefix).toString
    // mapped CTAS target + read both rename
    val ctas = planOf("CREATE TABLE tgt AS SELECT * FROM src")
    assert(ctas.contains("dev_tgt") && ctas.contains("dev_src"))
    // CREATE VIEW / DROP / INSERT targets rename through the mapping too
    assert(planOf("CREATE OR REPLACE VIEW tgt AS SELECT 1").contains("dev_tgt"))
    assert(planOf("DROP TABLE tgt").contains("dev_tgt"))
    assert(planOf("INSERT INTO tgt SELECT * FROM src").contains("dev_tgt"))
    // UNMAPPED write target gets the sandbox prefix; unmapped READ does not
    val adhoc = planOf("CREATE TABLE scratch AS SELECT * FROM external_raw", "sbx_" + _)
    assert(adhoc.contains("sbx_scratch") && !adhoc.contains("sbx_external_raw"))
  }

  test("unit tests assert per-CTE outputs") {
    val pipeline = Pipeline(name = "p", assets = Seq(
      Asset(name = "src_tbl", columns = Seq(Column("v", "INT"))),
      Asset(name = "agg",
        content = """WITH filtered AS (SELECT v FROM src_tbl WHERE v > 10),
                    |totals AS (SELECT CAST(count(*) AS BIGINT) AS n FROM filtered)
                    |SELECT * FROM totals""".stripMargin,
        upstreams = Seq(Upstream("src_tbl")))))
    val asset = pipeline.asset("agg").get
    val good = UnitTest("cte_assertions",
      inputs = Seq(UnitTestFixture("src_tbl",
        Seq(Map("v" -> 5), Map("v" -> 20), Map("v" -> 30)))),
      expected = UnitTestExpectation(rows = Seq(Map("n" -> 2)), matchMode = "exact"),
      cteExpectations = Map(
        "filtered" -> UnitTestExpectation(
          rows = Seq(Map("v" -> 20), Map("v" -> 30)), matchMode = "exact")))
    assert(UnitTests.run(spark, pipeline, asset, good).isEmpty)

    val badCte = good.copy(cteExpectations = Map(
      "filtered" -> UnitTestExpectation(rows = Seq(Map("v" -> 999)), matchMode = "exact")))
    val failure = UnitTests.run(spark, pipeline, asset, badCte)
    assert(failure.exists(_.reason.nonEmpty))

    val unknownCte = good.copy(cteExpectations = Map(
      "ghost" -> UnitTestExpectation(count = Some(1))))
    assert(UnitTests.run(spark, pipeline, asset, unknownCte).nonEmpty)

    // yaml surface parses expected_ctes
    val parsed = AssetParser.parse("assets/a.sql",
      """/* @bruin
        |name: a
        |unit_tests:
        |  - name: t
        |    expected_ctes:
        |      filtered:
        |        count: 2
        |@bruin */
        |SELECT 1""".stripMargin)
    assert(parsed.unitTests.head.cteExpectations("filtered").count.contains(2L))
  }

  test("JDBC ingest applies incremental merge across runs") {
    import graft.sources.Ingest
    val url = "jdbc:derby:memory:ingdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src (id INT, v VARCHAR(16), secret VARCHAR(16))")
    st.execute("INSERT INTO src VALUES (1, 'one', 'pw1'), (2, 'two', 'pw2')")

    val wh = new graft.materialize.SessionCatalogWarehouse(spark)
    wh.drop("jdbc_tgt")
    val asset = Asset(name = "jdbc_tgt", assetType = AssetType.Ingest,
      columns = Seq(
        Column("ID", "INT", primaryKey = true),
        Column("V", "STRING", updateOnMerge = true),
        Column("SECRET", mask = "star")), // masked before landing
      parameters = Map("source_uri" -> url, "source_table" -> "src",
        "incremental_strategy" -> "merge"))
    Ingest.run(wh, asset)
    assert(spark.table("jdbc_tgt").count() == 2)

    st.execute("UPDATE src SET v = 'uno' WHERE id = 1")
    st.execute("INSERT INTO src VALUES (3, 'three', 'pw3')")
    conn.close()
    Ingest.run(wh, asset)
    val rows = spark.table("jdbc_tgt").orderBy("ID")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq((1, "uno", "****"), (2, "two", "****"), (3, "three", "****")))
  }

  test("python asset runner executes materialize() through strategy writers") {
    import graft.config.{Connection, Environment}
    val script =
      """import os, json
        |def materialize():
        |    conn = json.loads(os.environ["WAREHOUSE_CONN"])
        |    assert conn["type"] == "jdbc", conn
        |    start = os.environ["GRAFT_START_DATE"]
        |    if start == "2024-01-01":
        |        return [{"id": 1, "v": "a", "seen": start},
        |                {"id": 2, "v": "b", "seen": start}]
        |    return [{"id": 2, "v": "b2", "seen": start},
        |            {"id": 3, "v": "c", "seen": start}]
        |""".stripMargin
    val asset = Asset(name = "py_merged", assetType = AssetType.SparkPython,
      content = script,
      columns = Seq(
        Column("id", "INT", primaryKey = true),
        Column("v", "STRING", updateOnMerge = true),
        Column("seen", "STRING", updateOnMerge = true)),
      materialization = Materialization(typ = MaterializationType.Table,
        strategy = Some(Strategy.Merge)),
      secrets = Seq(SecretMapping("wh", "WAREHOUSE_CONN")))
    val env = Environment(name = "t",
      connections = Map("wh" -> Connection("wh", typ = "jdbc", uri = "jdbc:derby:memory:x")))
    val p = Pipeline(name = "pyp", assets = Seq(asset))

    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "py_merged")
    val r1 = new PipelineRunner(spark, environment = env)
    assert(r1.run(p).values.forall(_.status == Scheduler.Succeeded))
    val r2 = new PipelineRunner(spark, environment = env,
      startDate = java.time.LocalDateTime.of(2024, 2, 1, 0, 0))
    assert(r2.run(p).values.forall(_.status == Scheduler.Succeeded))

    val rows = spark.table("py_merged").select("id", "v", "seen").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq((1, "a", "2024-01-01"), (2, "b2", "2024-02-01"), (3, "c", "2024-02-01")))
  }

  test("selectFromCte rewrites to a named CTE") {
    val sql = """WITH paid AS (SELECT 1 AS id, 100 AS amt),
                |big AS (SELECT * FROM paid WHERE amt > 10)
                |SELECT count(*) AS n FROM big""".stripMargin
    val df = org.apache.spark.sql.graft.SqlBridge.selectFromCte(spark, sql, "paid")
    assert(df.columns.toSeq == Seq("id", "amt") && df.count() == 1)
    intercept[IllegalArgumentException](
      org.apache.spark.sql.graft.SqlBridge.selectFromCte(spark, sql, "nope"))
  }

  test("query splitter respects strings, comments, dollar quotes") {
    val sql =
      """-- leading comment with ; inside
        |SELECT 'a;b' AS x; /* block; comment */
        |INSERT INTO t VALUES ('it''s; fine');
        |SELECT $$weird; stuff$$;
        |""".stripMargin
    val stmts = QuerySplitter.split(sql)
    assert(stmts.size == 3)
    assert(stmts(0) == "SELECT 'a;b' AS x")
    assert(stmts(1).startsWith("INSERT INTO t"))
    assert(stmts(2).contains("$$weird; stuff$$"))
    assert(QuerySplitter.isSingleSelect("WITH a AS (SELECT 1) SELECT * FROM a"))
    assert(!QuerySplitter.isSingleSelect("SELECT 1; SELECT 2"))
    assert(QuerySplitter.addLimit("SELECT * FROM t;", 5).endsWith("LIMIT 5"))
  }

  test("lineage: missing dependency inference") {
    Tables.register(spark, sfDir)
    val p = Pipeline(name = "p", assets = Seq(
      Asset(name = "orders"), Asset(name = "customer"),
      Asset(name = "joined",
        content = "SELECT * FROM orders JOIN customer ON o_custkey = c_custkey",
        upstreams = Seq(Upstream("orders")))))
    assert(Lineage.missingDependencies(spark, p, p.asset("joined").get) == Seq("customer"))
  }

  test("semantic: validation rejects unknown refs and cycles") {
    val m = Semantic.Model("t",
      dimensions = Seq(Semantic.Dimension("d", "d")),
      metrics = Seq(
        Semantic.Metric("a", "{b}"), Semantic.Metric("b", "{a}"),
        Semantic.Metric("n", "COUNT(1)")))
    intercept[IllegalArgumentException](
      Semantic.generateSql(m, Semantic.Query(metrics = Seq("nope"))))
    intercept[IllegalArgumentException](
      Semantic.generateSql(m, Semantic.Query(metrics = Seq("a"))))
    val sql = Semantic.generateSql(m, Semantic.Query(dimensions = Seq("d"), metrics = Seq("n")))
    assert(sql == "SELECT d AS d, COUNT(1) AS n FROM t GROUP BY 1")
  }

  test("semantic joins: qualified SQL, fan-out and missing-key rejection") {
    val dim = Semantic.Model("dims", name = "dims", primaryKey = "id",
      dimensions = Seq(Semantic.Dimension("kind", "kind")), metrics = Nil)
    def base(rel: String, targetKey: String = "") = Semantic.Model("facts",
      dimensions = Seq(Semantic.Dimension("day", "CAST(d AS STRING)")),
      metrics = Seq(Semantic.Metric("n", "COUNT(1)"),
        Semantic.Metric("total", "SUM(amount)")),
      joins = Seq(Semantic.Join("dims", rel, foreignKey = "dim_id", targetKey = targetKey)))
    val models = Map("dims" -> dim)

    val sql = Semantic.generateSql(base("many_to_one"),
      Semantic.Query(dimensions = Seq("day", "dims.kind"), metrics = Seq("n", "total")), models)
    assert(sql ==
      "SELECT CAST(base.d AS STRING) AS day, dims.kind AS dims_kind, COUNT(1) AS n, " +
        "SUM(base.amount) AS total" +
        " FROM (SELECT * FROM facts) base LEFT JOIN (SELECT * FROM dims) dims" +
        " ON base.dim_id = dims.id GROUP BY 1, 2")

    // fan-out: to-many relationships are not queryable as dimensions
    intercept[IllegalArgumentException](Semantic.generateSql(base("one_to_many"),
      Semantic.Query(dimensions = Seq("dims.kind"), metrics = Seq("n")), models))
    // missing target key and no primary_key on target
    intercept[IllegalArgumentException](Semantic.generateSql(
      base("many_to_one").copy(joins = Seq(Semantic.Join("dims", "many_to_one", "dim_id"))),
      Semantic.Query(dimensions = Seq("dims.kind"), metrics = Seq("n")),
      Map("dims" -> dim.copy(primaryKey = ""))))
    // unknown relationship
    intercept[IllegalArgumentException](Semantic.generateSql(base("sideways"),
      Semantic.Query(dimensions = Seq("dims.kind"), metrics = Seq("n")), models))

    // identifier qualification leaves backticked names and scientific
    // notation untouched
    assert(Semantic.qualify("`order` * amount", "base") == "`order` * base.amount")
    assert(Semantic.qualify("amount * 1e-2 + 2E3", "base") == "base.amount * 1e-2 + 2E3")
    assert(Semantic.qualify("x * 1.5e+10", "base") == "base.x * 1.5e+10")
  }

  test("distribution drift: zero PSI on identical snapshots, signal on a shift") {
    import spark.implicits._
    import graft.diff.DataDiff
    val a = (1 to 1000).map(i => (i.toLong, (i % 50) * 10.0)).toDF("id", "m")
    // identical distributions → every bucket's contribution is exactly 0
    val same = DataDiff.distributionDrift(a, a, "m", bucketWidth = 100.0,
      nBuckets = 6).collect()
    assert(same.nonEmpty && same.forall(_.getDouble(3) == 0.0))
    // shifted snapshot → a clearly positive total PSI
    val b = (1 to 1000).map(i => (i.toLong, (i % 50) * 10.0 + 200.0)).toDF("id", "m")
    val drift = DataDiff.distributionDrift(a, b, "m", bucketWidth = 100.0,
      nBuckets = 6).collect()
    assert(drift.map(_.getDouble(3)).sum > 0.2, "shift must register as PSI >= 0.2")
    // clamp BOTH ends: values past nBuckets*width land in the last bucket,
    // negatives (signed metrics) in the first — never a bucket id outside
    // [0, nBuckets)
    val clamped = DataDiff.distributionDrift(
      Seq((1L, 10000.0), (2L, -50.0)).toDF("id", "m"),
      Seq((3L, 50.0)).toDF("id", "m"), "m", bucketWidth = 100.0, nBuckets = 6)
      .collect().map(_.getLong(0)).toSet
    assert(clamped == Set(0L, 5L), s"expected clamped buckets {0, 5}: $clamped")
  }

  test("directional drift: a centroid-preserving rotation is invisible to the centroid projection and caught by a hyperplane") {
    // WHY the serving drift monitor projects onto multiple directions: a
    // rotation within the centroid's orthogonal complement moves every
    // vector while preserving each row's norm AND centroid component —
    // the 1-D cosine-to-centroid multiset is bit-identical, so a
    // centroid-only monitor scores PSI exactly 0 on a fully-drifted feed.
    // The md5-derived hyperplane projections catch it.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.diff.DataDiff
    // ±symmetric 4-d corpus on the exact 1/16 grid (×10000 is an integer,
    // so centroidByLabel's floor-quantized sums cancel EXACTLY) →
    // centroid exactly (1,0,0,0); x wide, z narrow
    val base = (1 to 100).flatMap { i =>
      val (x, y, z) = ((4 + i % 12) / 16f, (i % 5 - 2) / 16f, (i % 3 - 1) / 16f)
      Seq(Array(1f, x, y, z), Array(1f, -x, -y, -z))
    }
    val ref = base.map(Tuple1(_)).toDF("embedding")
    // rotate the (e2, e4) plane by 90°: (x, y, z) → (z, y, −x) — norm and
    // the e1 (centroid) component are preserved per ROW
    val rotated = base.map(v => Tuple1(Array(v(0), v(3), v(2), -v(1)))).toDF("embedding")
    val cent = graft.ops.Quantize
      .centroidByLabel(ref.withColumn("__l", lit(1)), "__l", "embedding")
      .orderBy("dim").select("mean").collect().map(_.getDouble(0).toFloat)
    assert(cent.toSeq == Seq(1f, 0f, 0f, 0f), s"symmetric corpus centroid: ${cent.toSeq}")
    val dirs = cent +: graft.ops.Similarity.planes(0, 3, 4).toSeq.map(_.map(_.toFloat))
    val psi = DataDiff.directionalDrift(rotated, ref, dirs, nBuckets = 20)
      .groupBy("direction").agg(sum(col("psi_contrib")).as("psi"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(psi(0) == 0.0,
      s"the centroid direction must see NOTHING — the rotation preserves it: ${psi(0)}")
    assert((1 to 3).map(psi).max > 0.5,
      s"a hyperplane direction must catch the rotation: $psi")
  }

  test("categorical drift: new values register strongly, identical mixes are flat") {
    import spark.implicits._
    import graft.diff.DataDiff
    val a = (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "en" else "de")).toDF("id", "lang")
    val flat = DataDiff.categoricalDrift(a, a, "lang").collect()
    assert(flat.length == 2 && flat.forall(_.getDouble(3) == 0.0))
    // a value present ONLY in snapshot b (the "new source appeared" signal)
    val b = (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "en" else "fr")).toDF("id", "lang")
    val drift = DataDiff.categoricalDrift(a, b, "lang").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(drift.keySet == Set("en", "de", "fr"))
    assert(drift("en") == 0.0 && drift("de") > 0.5 && drift("fr") > 0.5,
      s"one-sided values must register strongly: $drift")
  }

  test("data-diff: schema compare and table diff") {
    import org.apache.spark.sql.types._
    val a = StructType(Seq(StructField("id", LongType), StructField("x", DoubleType),
      StructField("gone", StringType)))
    val b = StructType(Seq(StructField("id", IntegerType), StructField("x", StringType),
      StructField("added", StringType)))
    val diffs = DataDiff.compareSchemas(a, b)
    assert(diffs.map(d => (d.column, d.kind)).toSet == Set(
      ("gone", "only_in_left"), ("added", "only_in_right"), ("x", "type_class_changed")))
    // id: long -> int is the same numeric class => not reported

    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dl AS SELECT 1 AS id, 'x' AS s")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dr AS SELECT 2 AS id, 'x' AS s")
    val d = DataDiff.diffTables(spark, "dl", "dr")
    assert(d.where("equal = false").count() > 0)
    assert(d.where("stat = 'count' AND equal = true").count() > 0)
  }

  test("python handoff: strategy mapping + parquet ingest applies merge") {
    val wh = new SessionCatalogWarehouse(spark)
    assert(PythonHandoff.mappedStrategy(Some(Strategy.SCD2ByColumn)) == Strategy.CreateReplace)
    assert(PythonHandoff.mappedStrategy(Some(Strategy.Merge)) == Strategy.Merge)

    val handoff = s"/tmp/graft-handoff-${ProcessHandle.current().pid()}"
    val asset = Asset(name = "t_py_out",
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING", updateOnMerge = true)),
      materialization = Materialization(MaterializationType.Table, Some(Strategy.Merge)))
    wh.drop("t_py_out")
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.mode("overwrite").parquet(handoff)
    PythonHandoff.ingest(wh, asset, handoff)
    Seq((2, "b2"), (3, "c")).toDF("id", "v").write.mode("overwrite").parquet(handoff)
    PythonHandoff.ingest(wh, asset, handoff)
    val rows = spark.table("t_py_out").orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a"), (2, "b2"), (3, "c")))
  }

  test("streaming append path writes finalized windows to a catalog table") {
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "t_stream_append")
    val agg = Streams.windowedCounts(Streams.eventStream(spark, s"$sfDir/events.parquet"))
    val out = Streams.runAppendToTable(spark, agg, "t_stream_append",
      checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-test-cp").toString))
    assert(out.count() > 0)
    // state pruning means strictly fewer rows than the all-state complete mode
    val complete = Streams.runToCompletion(spark,
      Streams.windowedCounts(Streams.eventStream(spark, s"$sfDir/events.parquet")), "t_stream_c")
    assert(out.count() < complete.count())

    import org.apache.spark.sql.streaming.Trigger
    assert(Streams.triggerFor(Map("flush_interval" -> "5 seconds")) ==
      Trigger.ProcessingTime("5 seconds"))
    assert(Streams.sourceOptionsFor(Map("flush_records" -> "1000"))("maxOffsetsPerTrigger") == "1000")
    assert(Streams.sourceOptionsFor(Map.empty).isEmpty)
  }

  test("streaming listener heartbeats the staged dir while micro-batches progress") {
    import java.nio.file.{Files, Paths}
    // a SINGLE-FILE source goes through the /tmp symlink staging dir —
    // the thing `graft clean --stream-grace` sweeps and the per-batch
    // heartbeat must protect while a query is live
    val src = Files.createTempDirectory("graft-hb-events")
    spark.range(0, 50).selectExpr("id AS event_id",
      "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS ts",
      "id % 5 AS user_id", "'e' AS event_type", "1.0 AS value", "'' AS props")
      .coalesce(1).write.mode("overwrite").parquet(src.toString)
    import scala.jdk.CollectionConverters._
    val oneFile = Files.list(src).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Streams.runToCompletion(spark,
      Streams.windowedCounts(Streams.eventStream(spark, oneFile.toString)), "t_hb_counts")
    // the staged dir holds a symlink c0-<filename> back to our source file
    def stagedFor(f: java.nio.file.Path): Option[java.nio.file.Path] = {
      val l = Files.list(Paths.get("/tmp"))
      try l.iterator().asScala.find { d =>
        d.getFileName.toString.startsWith("graft-stream-") &&
          Files.exists(d.resolve(s"c0-${f.getFileName}")) &&
          scala.util.Try(Files.readSymbolicLink(d.resolve(s"c0-${f.getFileName}")))
            .toOption.contains(f)
      }.map(identity)
      finally l.close()
    }
    val staged = stagedFor(oneFile)
    assert(staged.nonEmpty, "single-file stream must stage a symlink dir")
    // listener events are delivered async after awaitTermination returns
    val hb = staged.get.resolve(graft.streaming.Streams.HeartbeatFile)
    val deadline = System.nanoTime() + 15L * 1000000000L
    while (!Files.exists(hb) && System.nanoTime() < deadline) Thread.sleep(100)
    assert(Files.exists(hb),
      s"heartbeat file missing in ${staged.get} after a progressing query")
  }

  test("runAppendToTable's batch branch is idempotent: a re-run never duplicates the sink") {
    // the batch leg (the sort-based visits replay path) carries the
    // COMPLETE result of its computation — unlike the streaming leg it
    // has no offset log, so the only write honoring the "re-runs
    // converge, never duplicate" sink contract is a replace. Two runs
    // into one sink must land exactly one copy of every visit.
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "t_batch_visits")
    val visits1 = Streams.userVisitsComplete(spark, s"$sfDir/events.parquet")
    val expected = visits1.count()
    assert(expected > 0)
    Streams.runAppendToTable(spark, visits1.toDF(), "t_batch_visits")
    val visits2 = Streams.userVisitsComplete(spark, s"$sfDir/events.parquet")
    val out = Streams.runAppendToTable(spark, visits2.toDF(), "t_batch_visits")
    assert(out.count() == expected,
      s"re-run duplicated the sink: ${out.count()} rows vs $expected visits")
  }

  test("custom-state sessionizer closes visits on event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val visits = graft.streaming.Streams.userVisits(
      ms.toDF().toDF("user_id", "ts", "value"))
    val q = visits.writeStream.format("memory").queryName("t_visits")
      .outputMode("append").start()
    try {
      // batch 1: user 7 has two events 10 min apart — one open visit
      ms.addData((7L, ts("2024-01-01 10:00:00"), 1.25), (7L, ts("2024-01-01 10:10:00"), 2.50))
      q.processAllAvailable()
      assert(spark.table("t_visits").count() == 0, "visit must stay open until timeout")
      // batch 2: a much later event pushes the watermark past 10:40 + gap,
      // so the open visit times out and emits; the new event opens visit 2
      ms.addData((7L, ts("2024-01-01 13:00:00"), 9.99))
      q.processAllAvailable()
      val rows = spark.table("t_visits").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((7L, 2L, 375L)), // 2 events, 3.75 in cents
        s"expected the closed first visit, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("CDC apply upserts and deletes keyed changes per micro-batch") {
    import org.apache.spark.sql.functions._
    val wh = new SessionCatalogWarehouse(spark)
    spark.sql("DROP VIEW IF EXISTS cdc_target")
    wh.drop("cdc_target__cdc_state")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc")
    // batch of Debezium-style change events; later seq wins per key
    spark.createDataFrame(Seq(
      (1, "one", "c", 1L), (2, "two", "c", 2L), (3, "three", "c", 3L),
      (1, "uno", "u", 4L),      // update key 1
      (2, "TWO", "u", 5L), (2, "x", "d", 6L), // update then DELETE key 2
      (4, "four", "c", 7L), (4, "quatro", "u", 8L)))
      .toDF("id", "v", "op", "seq")
      .write.parquet(dir.toString + "/events")
    val events = spark.readStream
      .schema("id INT, v STRING, op STRING, seq BIGINT")
      .parquet(dir.toString + "/events")
    val asset = Asset(name = "cdc_target",
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")))
    Streams.cdcApply(wh, asset, events).awaitTermination()
    def state() = spark.table("cdc_target").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(state() == Seq((1, "uno"), (3, "three"), (4, "quatro"))) // 2 deleted
    // a LATE batch (lower seq than what's applied) must neither roll back
    // key 1 nor resurrect deleted key 2 — last-writer-wins by seq, not
    // by arrival order
    spark.createDataFrame(Seq((1, "stale", "u", 0L), (2, "ghost", "u", 1L)))
      .toDF("id", "v", "op", "seq")
      .write.parquet(dir.toString + "/late")
    val lateEvents = spark.readStream
      .schema("id INT, v STRING, op STRING, seq BIGINT")
      .parquet(dir.toString + "/late")
    Streams.cdcApply(wh, asset, lateEvents).awaitTermination()
    assert(state() == Seq((1, "uno"), (3, "three"), (4, "quatro")),
      "late low-seq changes must lose to the applied state")
  }

  test("CDC apply accepts a pluggable state writer and rejects a table-shaped target") {
    import org.apache.spark.sql.functions._
    val wh = new SessionCatalogWarehouse(spark)
    spark.sql("DROP VIEW IF EXISTS cdc_plug")
    wh.drop("cdc_plug__cdc_state")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-plug")
    spark.createDataFrame(Seq((1, "one", "c", 1L), (1, "uno", "u", 2L)))
      .toDF("id", "v", "op", "seq").write.parquet(dir.toString + "/events")
    def events() = spark.readStream
      .schema("id INT, v STRING, op STRING, seq BIGINT")
      .parquet(dir.toString + "/events")
    val asset = Asset(name = "cdc_plug",
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")))
    // a mock writer slots into the seam: counts the upsert calls and
    // delegates — operator output must be identical to the default path
    var upserts = 0
    val counting = new Streams.CdcStateWriter {
      override def upsert(wh: graft.materialize.Warehouse, state: String,
                          incoming: org.apache.spark.sql.DataFrame,
                          latestOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                          partitionBy: Seq[String], clusterBy: Seq[String]): Unit = {
        upserts += 1
        Streams.RebuildStateWriter.upsert(wh, state, incoming, latestOf, partitionBy, clusterBy)
      }
    }
    Streams.cdcApply(wh, asset, events(), writer = counting).awaitTermination()
    assert(upserts == 1)
    // op and seq are replication metadata — the reader-visible view carries
    // data columns only
    assert(spark.table("cdc_plug").columns.toSeq == Seq("id", "v"))
    assert(spark.table("cdc_plug").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq((1, "uno")))
    // a pre-existing TABLE under the asset name must fail fast (CREATE OR
    // REPLACE VIEW would crash mid-stream with no migration hint)
    spark.sql("DROP VIEW IF EXISTS cdc_clash")
    wh.createOrReplace("cdc_clash", spark.range(3).toDF("id"))
    val clash = Asset(name = "cdc_clash",
      columns = Seq(Column("id", "BIGINT", primaryKey = true)))
    val e = intercept[IllegalStateException] {
      Streams.cdcApply(wh, clash, events())
    }
    assert(e.getMessage.contains("already exists as a TABLE"))
    wh.drop("cdc_clash")
  }

  test("bucketed CDC state writer rewrites only the touched hash buckets") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val wh = new SessionCatalogWarehouse(spark)
    wh.drop("bkt_state")
    val w = new Streams.BucketedStateWriter(Seq("id"), Some(8))
    val win = Window.partitionBy(col("id")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__rn", row_number().over(win)).where(col("__rn") === 1).drop("__rn")

    val b1 = spark.createDataFrame(Seq(
      (1, "one", "c", 1L), (2, "two", "c", 1L), (3, "three", "c", 1L)))
      .toDF("id", "v", "op", "seq")
    w.upsert(wh, "bkt_state", latestOf(b1), latestOf, Nil, Nil)

    // state is a generation view over a table partitioned by the key bucket
    val backing = SessionCatalogWarehouse.backingTable(spark, "bkt_state").get
    import scala.jdk.CollectionConverters._
    assert(spark.catalog.listColumns(backing).collectAsList().asScala
      .filter(_.isPartition).map(_.name).toSeq == Seq("__bucket"))

    val filesBefore = spark.table("bkt_state")
      .select(col("id"), input_file_name().as("f")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    // second batch: update id=1 (higher seq), insert id=4, late-loser for
    // id=2 (lower seq must NOT win) — buckets of ids 2,3 untouched unless
    // they collide with 1/4's buckets
    val b2 = spark.createDataFrame(Seq(
      (1, "uno", "u", 3L), (4, "four", "c", 2L), (2, "stale", "u", 0L)))
      .toDF("id", "v", "op", "seq")
    w.upsert(wh, "bkt_state", latestOf(b2), latestOf, Nil, Nil)

    val rows = spark.table("bkt_state")
      .select("id", "v").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(1 -> "uno", 2 -> "two", 3 -> "three", 4 -> "four"),
      s"LWW by seq violated: $rows")

    // rows whose bucket was NOT in the batch keep their exact files —
    // the incremental write never rewrote their partitions
    val bucketOf = spark.range(0).sparkSession.createDataFrame(
      Seq(Tuple1(1), Tuple1(2), Tuple1(3), Tuple1(4))).toDF("id")
      .select(col("id"), pmod(hash(col("id")), lit(8)).as("b"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val touched = Set(bucketOf(1), bucketOf(2), bucketOf(4))
    val filesAfter = spark.table("bkt_state")
      .select(col("id"), input_file_name().as("f")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    Seq(2, 3).filterNot(id => touched(bucketOf(id))).foreach { id =>
      assert(filesAfter(id) == filesBefore(id),
        s"untouched bucket of id=$id was rewritten")
    }

    // RESTART over existing state in auto mode: a fresh writer must recover
    // the exact bucket count from the self-describing partition values — a
    // re-derived wrong count would assign keys to different buckets than
    // their old rows and silently duplicate them
    val w2 = new Streams.BucketedStateWriter(Seq("id"))
    val b3 = spark.createDataFrame(Seq((1, "eins", "u", 5L)))
      .toDF("id", "v", "op", "seq")
    w2.upsert(wh, "bkt_state", latestOf(b3), latestOf, Nil, Nil)
    val rows3 = spark.table("bkt_state")
      .select("id", "v").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows3 == Map(1 -> "eins", 2 -> "two", 3 -> "three", 4 -> "four"),
      s"restart re-bucketing duplicated or lost keys: $rows3")

    // WIDE batch (touches > half the buckets): falls back to an atomic
    // bucket-partitioned rebuild — a new generation table, same results
    val genBefore = SessionCatalogWarehouse.backingTable(spark, "bkt_state").get
    val wide = spark.createDataFrame(
      (1 to 40).map(i => (i, s"w$i", "u", 9L))).toDF("id", "v", "op", "seq")
    w2.upsert(wh, "bkt_state", latestOf(wide), latestOf, Nil, Nil)
    val genAfter = SessionCatalogWarehouse.backingTable(spark, "bkt_state").get
    assert(genAfter != genBefore, "wide batch should rebuild via generation swap")
    val rows4 = spark.table("bkt_state").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows4 == (1 to 40).map(i => i -> s"w$i").toMap)
    wh.drop("bkt_state")
  }

  test("overlay CDC state writer: incremental AND atomic via composed view") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val wh = new SessionCatalogWarehouse(spark)
    SessionCatalogWarehouse.dropAny(spark, "ov_state")
    val win = Window.partitionBy(col("id")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__rn", row_number().over(win)).where(col("__rn") === 1).drop("__rn")
    def rows() = spark.table("ov_state").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    def viewText() = spark.sql("SHOW CREATE TABLE ov_state").head().getString(0)

    val w = new Streams.OverlayStateWriter(Seq("id"), Some(8))
    val b1 = spark.createDataFrame(Seq(
      (1, "one", "c", 1L), (2, "two", "c", 1L), (3, "three", "c", 1L)))
      .toDF("id", "v", "op", "seq")
    w.upsert(wh, "ov_state", latestOf(b1), latestOf, Nil, Nil)
    assert(rows() == Map(1 -> "one", 2 -> "two", 3 -> "three"))
    val filesBefore = spark.table("ov_state")
      .select(col("id"), input_file_name().as("f")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    // LOCALIZED batch → an overlay table; the single view swap is the
    // commit, and rows in untouched buckets keep their exact base files
    val b2 = spark.createDataFrame(Seq((1, "uno", "u", 3L), (2, "stale", "u", 0L)))
      .toDF("id", "v", "op", "seq")
    w.upsert(wh, "ov_state", latestOf(b2), latestOf, Nil, Nil)
    assert(rows() == Map(1 -> "uno", 2 -> "two", 3 -> "three"), s"LWW violated: ${rows()}")
    assert(viewText().contains("__cdcov_"), "localized batch should append an overlay")
    val bucketOf = spark.createDataFrame(Seq(Tuple1(1), Tuple1(2), Tuple1(3)))
      .toDF("id").select(col("id"), pmod(hash(col("id")), lit(8)).as("b"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val touched2 = Set(bucketOf(1), bucketOf(2))
    val filesAfter = spark.table("ov_state")
      .select(col("id"), input_file_name().as("f")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    Seq(2, 3).filterNot(id => touched2(bucketOf(id))).foreach { id =>
      assert(filesAfter(id) == filesBefore(id), s"untouched bucket of id=$id rewritten")
    }

    // ATOMICITY: a torn write (overlay table written, view never swapped)
    // is invisible to readers — the view text is the only commit point
    spark.createDataFrame(Seq((99, "garbage", "c", 9L)))
      .toDF("id", "v", "op", "seq")
      .withColumn("__bucket", lit("b8_0"))
      .write.mode("overwrite").saveAsTable("ov_state__cdcov_8_deadbeef")
    assert(rows() == Map(1 -> "uno", 2 -> "two", 3 -> "three"),
      "an unreferenced (torn) overlay table must not affect readers")

    // RESTART: a fresh writer derives the composition from the view text
    val w2 = new Streams.OverlayStateWriter(Seq("id"), Some(8))
    val b3 = spark.createDataFrame(Seq((4, "four", "c", 4L))).toDF("id", "v", "op", "seq")
    w2.upsert(wh, "ov_state", latestOf(b3), latestOf, Nil, Nil)
    assert(rows() == Map(1 -> "uno", 2 -> "two", 3 -> "three", 4 -> "four"))

    // WIDE batch → compaction: one fresh base, overlay chain gone, stale
    // tables (including the torn-write orphan) reaped
    val wide = spark.createDataFrame(
      (1 to 40).map(i => (i, s"w$i", "u", 9L))).toDF("id", "v", "op", "seq")
    w2.upsert(wh, "ov_state", latestOf(wide), latestOf, Nil, Nil)
    assert(rows() == (1 to 40).map(i => i -> s"w$i").toMap)
    val vt = viewText()
    assert(!vt.contains("__cdcov_"), s"compaction should fold overlays: $vt")
    assert(!spark.catalog.tableExists("ov_state__cdcov_8_deadbeef"),
      "compaction should reap torn-write orphans")
    import scala.jdk.CollectionConverters._
    val leftover = spark.catalog.listTables().collectAsList().asScala
      .map(_.name).filter(n => n.startsWith("ov_state__cdc"))
    assert(leftover.size == 1, s"exactly the live base should remain: $leftover")

    // dropAny knows the overlay layout
    SessionCatalogWarehouse.dropAny(spark, "ov_state")
    val after = spark.catalog.listTables().collectAsList().asScala
      .map(_.name).filter(_.startsWith("ov_state"))
    assert(after.isEmpty, s"dropAny should reap overlay tables: $after")
  }

  test("overlay writer chain-folds localized batches without touching the base") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val wh = new SessionCatalogWarehouse(spark)
    SessionCatalogWarehouse.dropAny(spark, "fold_state")
    val win = Window.partitionBy(col("id")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__rn", row_number().over(win)).where(col("__rn") === 1).drop("__rn")
    def batch(rows: (Int, String, String, Long)*) =
      latestOf(spark.createDataFrame(rows).toDF("id", "v", "op", "seq"))
    def ovCount() = "__cdcov_[0-9]+_[0-9a-f]+".r
      .findAllIn(spark.sql("SHOW CREATE TABLE fold_state").head().getString(0))
      .toSeq.distinct.size

    // three ids with pairwise-DISTINCT hash buckets, so each localized
    // batch grows the chain (same-bucket updates would shadow instead)
    val byBucket = spark.createDataFrame((1 to 50).map(Tuple1(_))).toDF("id")
      .select(col("id"), pmod(hash(col("id")), lit(8)).as("b"))
      .collect().map(r => r.getInt(1) -> r.getInt(0)).toMap  // one id per bucket
    val Seq(a, b, c) = byBucket.values.take(3).toSeq

    // maxOverlays=2 so the third localized batch must fold the chain
    val w = new Streams.OverlayStateWriter(Seq("id"), Some(8), maxOverlays = 2)
    w.upsert(wh, "fold_state", batch((a, "one", "c", 1L), (b, "two", "c", 1L),
      (c, "three", "c", 1L)), latestOf, Nil, Nil)
    val baseFiles = spark.table("fold_state")
      .select(col("id"), input_file_name().as("f")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    w.upsert(wh, "fold_state", batch((a, "uno", "u", 2L)), latestOf, Nil, Nil)
    w.upsert(wh, "fold_state", batch((b, "dos", "u", 2L)), latestOf, Nil, Nil)
    assert(ovCount() == 2, s"two localized batches → two overlays, got ${ovCount()}")
    // chain at maxOverlays and coverage ≤ half the buckets → FOLD: one
    // overlay remains, and the base was never rewritten (id c's file)
    w.upsert(wh, "fold_state", batch((a, "eins", "u", 3L)), latestOf, Nil, Nil)
    assert(ovCount() == 1, s"chain should fold into one overlay, got ${ovCount()}")
    val rows = spark.table("fold_state").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(a -> "eins", b -> "dos", c -> "three"), s"fold lost data: $rows")
    assert(spark.table("fold_state")
      .select(col("id"), input_file_name().as("f")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap.apply(c) == baseFiles(c),
      "chain fold must not rewrite the base")
    SessionCatalogWarehouse.dropAny(spark, "fold_state")
  }

  test("corpus dedup auto-bounds its state when the stream carries event time") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val corpus = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")

    // timestamped stream → the watermark + WithinWatermark shape kicks in
    // automatically (first TimestampType column)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val incoming = ms.toDF().toDF("doc_id", "text", "arrived_at")
    val fresh = Streams.dedupAgainstCorpus(incoming, corpus)
    assert(fresh.queryExecution.analyzed.toString.contains("EventTimeWatermark"),
      "a timestamped stream should get the watermark-bounded dedup shape")
    val q = fresh.writeStream.format("memory").queryName("t_corpus_fresh")
      .outputMode("append").start()
    try {
      ms.addData(
        (10L, "alpha doc", ts("2024-01-01 10:00:00")),   // known in corpus → drop
        (11L, "gamma doc", ts("2024-01-01 10:00:00")),   // novel → keep
        (12L, "Gamma   DOC", ts("2024-01-01 10:01:00"))) // dup within stream → drop
      q.processAllAvailable()
      ms.addData((13L, "delta doc", ts("2024-01-01 10:02:00"))) // novel → keep
      q.processAllAvailable()
      val kept = spark.table("t_corpus_fresh").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 13L), s"expected exactly the novel docs, got $kept")
    } finally q.stop()

    // timestamp-less stream → unbounded dropDuplicates, same results shape
    // (the stream_corpus_dedup oracle exercises this end-to-end at sf)
    val ms2 = MemoryStream[(Long, String)]
    val plain = Streams.dedupAgainstCorpus(
      ms2.toDF().toDF("doc_id", "text"), corpus)
    assert(!plain.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
    // batch replay input: never watermarked even with the column present
    val batchIn = Seq((20L, "alpha doc", ts("2024-01-01 11:00:00")),
      (21L, "epsilon doc", ts("2024-01-01 11:00:00")),
      (22L, "epsilon  doc", ts("2024-01-01 11:01:00"))).toDF("doc_id", "text", "arrived_at")
    val batchOut = Streams.dedupAgainstCorpus(batchIn, corpus)
    assert(batchOut.select("doc_id").collect().map(_.getLong(0)).toSet
      .subsetOf(Set(21L, 22L)) && batchOut.count() == 1)
  }

  test("overlay writer: kill between table write and commit, fresh writer resumes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import scala.jdk.CollectionConverters._
    val wh = new SessionCatalogWarehouse(spark)
    SessionCatalogWarehouse.dropAny(spark, "kill_state")
    val win = Window.partitionBy(col("id")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__rn", row_number().over(win)).where(col("__rn") === 1).drop("__rn")
    def batch(rows: (Int, String, String, Long)*) =
      latestOf(spark.createDataFrame(rows).toDF("id", "v", "op", "seq"))
    def rows() = spark.table("kill_state").select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    def cdcTables() = spark.catalog.listTables().collectAsList().asScala
      .map(_.name).filter(_.startsWith("kill_state__cdc")).toSet

    // a writer whose next commit "crashes" the process: tables written,
    // view swap never taken
    final class CrashingWriter extends Streams.OverlayStateWriter(Seq("id"), Some(8)) {
      var crashNext = false
      override protected def beforeCommit(): Unit =
        if (crashNext) { crashNext = false; throw new RuntimeException("kill -9") }
    }

    val w = new CrashingWriter
    w.upsert(wh, "kill_state", batch((1, "one", "c", 1L), (2, "two", "c", 1L),
      (3, "three", "c", 1L)), latestOf, Nil, Nil)
    assert(rows() == Map(1 -> "one", 2 -> "two", 3 -> "three"))
    val tablesBefore = cdcTables()

    // CRASH mid-upsert: the overlay table for this batch is fully written
    // when the kill lands, but the swap never happens
    w.crashNext = true
    intercept[RuntimeException] {
      w.upsert(wh, "kill_state", batch((1, "uno", "u", 2L)), latestOf, Nil, Nil)
    }
    // old state visible throughout — the batch left NO trace in the view
    assert(rows() == Map(1 -> "one", 2 -> "two", 3 -> "three"),
      "crash before commit must leave readers on the old state")
    val orphans = cdcTables() -- tablesBefore
    assert(orphans.nonEmpty, "the torn write should have left an orphan table")
    val vt = spark.sql("SHOW CREATE TABLE kill_state").head().getString(0)
    orphans.foreach(o => assert(!vt.contains(o), s"orphan $o must be unreferenced"))

    // RESTART: a FRESH writer (no in-memory composition) replays the batch
    // — at-least-once delivery — and recovers via the view text
    val w2 = new Streams.OverlayStateWriter(Seq("id"), Some(8))
    w2.upsert(wh, "kill_state", batch((1, "uno", "u", 2L)), latestOf, Nil, Nil)
    assert(rows() == Map(1 -> "uno", 2 -> "two", 3 -> "three"),
      "replayed batch after restart must apply exactly once")
    val st = spark.table("kill_state")
    assert(st.count() == st.select("id").distinct().count(), "duplicate keys after recovery")

    // next FULL compaction reaps the torn-write orphans
    val wide = spark.createDataFrame(
      (1 to 40).map(i => (i, s"w$i", "u", 9L))).toDF("id", "v", "op", "seq")
    w2.upsert(wh, "kill_state", latestOf(wide), latestOf, Nil, Nil)
    assert(rows() == (1 to 40).map(i => i -> s"w$i").toMap)
    orphans.foreach(o => assert(!spark.catalog.tableExists(o),
      s"compaction should reap torn-write orphan $o"))
    assert(cdcTables().size == 1, s"exactly the live base should remain: ${cdcTables()}")
    SessionCatalogWarehouse.dropAny(spark, "kill_state")
  }

  test("stream sources resolve by scheme; +cdc URIs flag CDC semantics") {
    val mock = new graft.streaming.StreamSource {
      override val scheme = "mockbroker"
      override def load(s: org.apache.spark.sql.SparkSession, uri: java.net.URI,
                        options: Map[String, String]) =
        Streams.eventStream(s, s"$sfDir/events.parquet")
    }
    graft.streaming.StreamSources.register(mock)
    val plain = graft.streaming.StreamSources.forUri("mockbroker://events")
    assert(plain.source eq mock)
    assert(!plain.cdc)
    val cdc = graft.streaming.StreamSources.forUri("mockbroker+cdc://events")
    assert(cdc.source eq mock)
    assert(cdc.cdc)
    // the file stand-in is pre-registered and yields a streaming frame
    val f = graft.streaming.StreamSources.forUri(s"file://$sfDir/events.parquet")
    assert(f.source.load(spark, f.uri).isStreaming)
    // kafka: the registration is real but classpath-gated — with the
    // connector jar present the scheme resolves and builds a streaming
    // frame (no broker contact until .start()); without it the registry
    // stays honest and names what IS available
    if (graft.streaming.StreamSources.kafkaConnectorPresent) {
      val k = graft.streaming.StreamSources.forUri("kafka://localhost:9092/events")
      assert(k.source eq graft.streaming.KafkaEventSource)
      assert(k.source.load(spark, k.uri).isStreaming)
    } else {
      val err = intercept[IllegalArgumentException] {
        graft.streaming.StreamSources.forUri("kafka://topic")
      }
      assert(err.getMessage.contains("registered:"))
    }
  }

  test("streaming top-k: shard-union superset, exact after reduction, tie-safe") {
    import spark.implicits._
    // two weekly windows; scores with DELIBERATE ties at the k boundary
    // (score = id % 7 → many equal scores), ids whose STRING and NUMERIC
    // orders disagree ("10" < "9") — the regime where a mixed tie-break
    // between the shard heaps and the final reduction would drop rows
    val base = java.sql.Timestamp.valueOf("2024-01-01 06:00:00").getTime
    val weekUs = 7L * 24 * 3600 * 1000000L
    val events = (0 until 400).map { i =>
      (i.toLong, new java.sql.Timestamp(base + (i % 2) * (weekUs / 1000) + i * 1000L),
        0L, "e", (i % 7).toDouble, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-tk-adv").toString
    events.coalesce(4).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val k = 6
    val hits = Streams.streamingTopKComplete(spark, s"$dir/events.parquet",
      org.apache.spark.sql.functions.col("event_id"),
      org.apache.spark.sql.functions.col("value"), k, shards = 8)
    val q = hits.toDF().writeStream.format("memory").queryName("tk_adv")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val cand = spark.table("tk_adv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    // per-(window, shard) emission is bounded by k
    assert(cand.length <= 2 * 8 * k, s"state bound violated: ${cand.length} rows")
    // straight-line truth: top-k per window by (score desc, STRING id asc)
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000
    val truth = (0 until 400).map { i =>
      (us(new java.sql.Timestamp(base + (i % 2) * (weekUs / 1000) + i * 1000L)) / weekUs,
        i.toString, (i % 7).toDouble)
    }.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, id, s) => (-s, id) }.take(k)).toMap
    // superset: every true top-k row is among its window's candidates
    val candSet = cand.map(c => (c._1, c._2)).toSet
    truth.foreach { case (w, rows) =>
      val missed = rows.map(r => (w, r._2)).filterNot(candSet)
      assert(missed.isEmpty, s"window $w lost true top-k rows: $missed")
    }
    // the bounded-heap reduction over candidates is EXACTLY the truth
    import org.apache.spark.sql.functions.{col => c}
    val fin = graft.ops.Sampling.groupTopK(spark.table("tk_adv"),
        Seq("window_id"), Seq((-c("score")).as("ns"), c("id").as("i")), k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.toSeq).toMap
    truth.foreach { case (w, rows) => assert(fin(w) == rows.map(r => (w, r._2, r._3)),
      s"window $w: ${fin(w)} vs $rows") }
  }

  test("streaming top-k: sub-millisecond window ends never close a group early") {
    // windowUs = 1,000,500 μs — window 20's true end is 21,010.5 ms. A
    // timeout computed with TRUNCATING ms division lands at 21,000 ms, so a
    // watermark of 21,005 ms (from an in-window event) would close the
    // group early; a later in-window, pre-window-end event then re-creates
    // it and the same (window, shard) emits TWICE. The ceiling-division
    // timeout (≥ true end) must keep the group open across all three
    // batches and emit exactly once per shard.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val winUs = 1000500L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val ms = MemoryStream[(String, Double, java.sql.Timestamp)]
    // shard = floorMod(id.hashCode, 2): "a"/"c"/"e" → 1, "b"/"d" → 0
    val hits = Streams.streamingTopK(ms.toDF().toDF("id", "score", "ts"),
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("score"),
      k = 2, windowUs = winUs, shards = 2,
      watermark = "0 seconds")
    val q = hits.toDF().writeStream.format("memory").queryName("tk_submilli")
      .outputMode("append").start()
    try {
      // batch 1: shard-1 rows mid-window + a shard-0 clock row at 21.005 s
      // (still window 20; true end 21.0105 s) → watermark 21,005 ms
      ms.addData(("a", 5.0, ts(20500)), ("c", 3.0, ts(20600)), ("d", 1.0, ts(21005)))
      q.processAllAvailable()
      // batch 2: only shard-0 data — shard 1's timeout is evaluated against
      // the 21,005 ms watermark; a truncated timeout (21,000 ms) fires here
      ms.addData(("b", 7.0, ts(21006)))
      q.processAllAvailable()
      assert(spark.table("tk_submilli").count() == 0,
        "no window may close before its true event-time end")
      // batch 3: a late-but-in-window shard-1 row joins the SAME open group
      ms.addData(("e", 9.0, ts(21008)))
      q.processAllAvailable()
      // batch 4: far-future row pushes the watermark past the true end
      ms.addData(("z", 0.0, ts(100000)))
      q.processAllAvailable()
      val cand = spark.table("tk_submilli").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val w20 = cand.filter(_._1 == 20L)
      // one emission per shard, k-bounded: shard 1 kept {e:9, a:5} (c
      // evicted), shard 0 kept {b:7, d:1} — an early close would have
      // emitted {a, c} AND later {e}: 5 rows with c present
      assert(w20.map(_._2).toSet == Set("e", "a", "b", "d"),
        s"expected one k-bounded emission per shard, got $w20")
    } finally q.stop()
  }

  test("streaming heavy hitters: superset guarantee and bounds under high cardinality") {
    import spark.implicits._
    // ~5000 distinct items, zipf-ish (item j appears ⌈600/(j+1)⌉ times);
    // phi=0.01 → k=100 counters ≪ 5000 items, so Misra–Gries decrements
    // genuinely happen — the path the exact-oracle configuration never hits
    val rows = (0 until 5000).flatMap(j => Seq.fill(math.ceil(600.0 / (j + 1)).toInt)(j))
    val base = java.sql.Timestamp.valueOf("2024-01-01 06:00:00").getTime
    val events = rows.zipWithIndex.map { case (item, i) =>
      (i.toLong, new java.sql.Timestamp(base + (i % 80000) * 1000L),
        item.toLong, "e", 0.0, "")
    }.sortBy { case (id, _, it, _, _, _) => (it * 2654435761L + id) % 99991 } // adversarial but deterministic arrival
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-adv").toString
    events.coalesce(4).write.mode("overwrite").parquet(s"$dir/events.parquet")

    // auto default resolves to the stable multi-shard constant (restart-
    // safe: the shard index is part of the state key), never the 1-task trap
    assert(Streams.resolveShards(spark, 0) == Streams.AutoShards &&
      Streams.AutoShards > 1)
    assert(Streams.resolveShards(spark, 3) == 3)

    val phi = 0.01
    val hits = Streams.streamingHeavyHittersComplete(spark,
      s"$dir/events.parquet",
      org.apache.spark.sql.functions.col("user_id").cast("string"), phi, shards = 8)
    val q = hits.toDF().writeStream.format("memory").queryName("hh_adv")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table("hh_adv").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap

    val truth = rows.groupBy(identity).map { case (k, v) => k.toString -> v.size.toLong }
    val n = rows.size.toLong
    val trueHeavy = truth.filter { case (_, c) => c >= math.ceil(phi * n) }.keySet
    assert(trueHeavy.nonEmpty && trueHeavy.size < 120, s"fixture: ${trueHeavy.size} heavy")
    // SUPERSET guarantee: every true phi-heavy item must be emitted
    val missed = trueHeavy -- emitted.keySet
    assert(missed.isEmpty, s"missed true heavy items: $missed")
    // and every emitted count pair brackets the true count
    emitted.foreach { case (item, (lo, hi)) =>
      val t = truth.getOrElse(item, 0L)
      assert(lo <= t && t <= hi, s"item $item: bounds [$lo,$hi] miss true $t")
    }
    // the bounded-state claim: nothing emitted can exceed k survivors/shard
    assert(emitted.size <= 8 * (math.ceil(1 / phi).toInt + 1))
  }

  test("streaming KMV distinct: shard-independent, duplicate-proof, exact below k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two weekly windows; window 0 holds 30 distinct users (< k — must come
    // out EXACT despite heavy duplication: each user appears 20×), window 1
    // holds 500 distinct (> k — the estimator path)
    val base = java.sql.Timestamp.valueOf("2024-01-01 06:00:00").getTime
    val weekMs = 7L * 24 * 3600 * 1000L
    val w0 = (0 until 600).map(i => (i.toLong, 0L, (i % 30).toLong))
    val w1 = (0 until 500).map(i => (1000L + i, 1L, 10000L + i))
    val events = (w0 ++ w1).map { case (id, w, u) =>
      (id, new java.sql.Timestamp(base + w * weekMs + (id % 97) * 1000L),
        u, "e", 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-adv").toString
    events.coalesce(4).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val k = 64
    def finished(shards: Int, name: String): Map[Long, (Long, Boolean)] = {
      val cands = Streams.streamingDistinctKmvComplete(spark,
        s"$dir/events.parquet", col("user_id"), k, shards = shards)
      val q = cands.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // candidates are duplicate-free across shards (sharded BY fingerprint)
      val raw = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(raw.length == raw.distinct.length, "duplicate fingerprints across shards")
      val kept = graft.ops.Sampling.groupTopK(spark.table(name),
        Seq("window_id"), Seq(col("h")), k)
      kept.groupBy("window_id")
        .agg(count(lit(1)).as("c"), max(col("h")).as("hk"))
        .select(col("window_id"),
          when(col("c") < k, col("c")).otherwise(
            round(lit((k - 1).toDouble) /
              (col("hk").cast("double") / lit(1152921504606846976.0))).cast("long")),
          col("c") < k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    }
    val one = finished(1, "kmv_s1")
    val five = finished(5, "kmv_s5")
    // shard count must never change the finished sketch
    assert(one == five, s"shard-dependent result: $one vs $five")
    // windows are epoch-aligned: both test windows share the in-window
    // offset (base + exactly one week), so their ids are consecutive
    val w0id = base * 1000L / (7L * 24 * 3600 * 1000000L)
    // window 0: 30 distinct < k → exact despite 20× duplication
    assert(one(w0id) == ((30L, true)), s"window 0: ${one(w0id)}")
    // window 1: 500 distinct > k → a real estimate, within 25%
    val (est, exact) = one(w0id + 1)
    assert(!exact && math.abs(est - 500.0) / 500.0 < 0.25, s"window 1 est: $est")
  }

  test("kafka connection mapping is pure and jar-independent") {
    import graft.streaming.KafkaEventSource.connection
    def uri(s: String) = java.net.URI.create(s)
    assert(connection(uri("kafka://broker1:9093/clicks")) == ("broker1:9093", "clicks"))
    // port defaults to 9092
    assert(connection(uri("kafka://broker1/clicks")) == ("broker1:9092", "clicks"))
    // RFC-invalid hostnames (docker underscores) fall back to the raw authority
    assert(connection(uri("kafka://my_broker:9092/t")) == ("my_broker:9092", "t"))
    // a missing topic is a loud error
    intercept[IllegalArgumentException](connection(uri("kafka://h:9092")))
    intercept[IllegalArgumentException](connection(uri("kafka://h:9092/")))
  }

  test("broker ingest: envelope decode, routing rules, end-to-end stream paths") {
    import spark.implicits._
    import graft.sources.Ingest
    import graft.streaming.{StreamSource, StreamSources}

    // kafka's fixed output shape, built by hand (what format("kafka") yields)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def env(values: Seq[String]) = values.zipWithIndex.map { case (v, i) =>
      (s"k$i".getBytes("UTF-8"), v.getBytes("UTF-8"), "t", 0, i.toLong, ts, 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")

    val plainEnv = env(Seq(
      """{"id": 1, "v": "one"}""", """{"id": 2, "v": "two"}""", "not json"))
    assert(Streams.isBrokerEnvelope(plainEnv))
    assert(!Streams.isBrokerEnvelope(spark.range(3).toDF("id")))
    val dec = Streams.decodeJsonValue(plainEnv, "id INT, v STRING")
    assert(dec.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "one"), (2, "two"))) // malformed value dropped, not landed as NULLs

    // routing: batch URIs stay batch, streams are explicit or broker-schemed
    def asset0(params: (String, String)*) =
      Asset(name = "x", parameters = params.toMap)
    assert(Ingest.brokerResolved(asset0("source_uri" -> "jdbc:derby:memory:x")).isEmpty)
    assert(Ingest.brokerResolved(asset0("source_uri" -> "csv://data/x.txt")).isEmpty)
    assert(Ingest.brokerResolved(asset0("source_uri" -> "/plain/path.parquet")).isEmpty)
    assert(Ingest.brokerResolved(asset0("source_uri" -> "s3://bucket/x.parquet")).isEmpty)
    assert(Ingest.brokerResolved(asset0("source_uri" -> "file:///x.parquet")).isEmpty)
    assert(Ingest.brokerResolved(asset0(
      "source_uri" -> "file:///x.parquet", "source_stream" -> "true")).nonEmpty)
    assert(Ingest.brokerResolved(asset0("source_uri" -> "file+cdc:///x.parquet"))
      .exists(_.cdc))
    if (!StreamSources.kafkaConnectorPresent) {
      // jarless: a kafka URI must surface the registry's error, not fall
      // through to the batch file reader's "no filesystem for scheme kafka"
      val err = intercept[IllegalArgumentException](
        Ingest.brokerResolved(asset0("source_uri" -> "kafka://h:9092/t")))
      assert(err.getMessage.contains("registered:"))
    }

    // end-to-end over a registered mock broker serving the kafka shape —
    // everything the kafka path runs except the jar-gated format() call
    val stage = java.nio.file.Files.createTempDirectory("mockkafka").toString
    plainEnv.write.mode("overwrite").parquet(s"$stage/plain")
    val cdcValues = Seq(
      """{"after": {"id": 1, "v": "a"}, "op": "c", "ts_ms": 1, "source": {"lsn": 10, "ts_ms": 1}}""",
      """{"after": {"id": 2, "v": "b"}, "op": "c", "ts_ms": 2, "source": {"lsn": 11, "ts_ms": 2}}""",
      """{"after": {"id": 1, "v": "a2"}, "op": "u", "ts_ms": 3, "source": {"lsn": 12, "ts_ms": 3}}""",
      """{"before": {"id": 2, "v": "b"}, "op": "d", "ts_ms": 4, "source": {"lsn": 13, "ts_ms": 4}}""")
    env(cdcValues).write.mode("overwrite").parquet(s"$stage/cdc")
    val mock = new StreamSource {
      override val scheme = "mockkafka"
      override def load(s: org.apache.spark.sql.SparkSession, uri: java.net.URI,
                        options: Map[String, String]) =
        options.foldLeft(s.readStream.schema(plainEnv.schema)) {
          case (r, (k, v)) => r.option(k, v) // honor maxFilesPerTrigger etc.
        }.parquet(s"$stage${uri.getPath}")
    }
    StreamSources.register(mock)

    val wh = new SessionCatalogWarehouse(spark)
    SessionCatalogWarehouse.dropAny(spark, "broker_tgt")
    Ingest.run(wh, Asset(name = "broker_tgt", assetType = AssetType.Ingest,
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")),
      parameters = Map("source_uri" -> "mockkafka://broker/plain",
        "incremental_strategy" -> "append")))
    assert(spark.table("broker_tgt").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "one"), (2, "two")))

    // a RE-RUN with the sink intact resumes from the per-asset checkpoint's
    // committed offsets: append must NOT re-drain the topic and duplicate
    // every previously landed row (scheduled-run contract)
    def brokerAsset = Asset(name = "broker_tgt", assetType = AssetType.Ingest,
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")),
      parameters = Map("source_uri" -> "mockkafka://broker/plain",
        "incremental_strategy" -> "append"))
    Ingest.run(wh, brokerAsset)
    assert(spark.table("broker_tgt").count() == 2,
      "append re-run must resume offsets, not duplicate rows")
    // dropping the sink invalidates the stale checkpoint: the rebuild
    // re-drains from earliest instead of landing zero rows
    SessionCatalogWarehouse.dropAny(spark, "broker_tgt")
    Ingest.run(wh, brokerAsset)
    assert(spark.table("broker_tgt").count() == 2,
      "rebuild after drop must re-drain in full")

    // a whole-table strategy on a MULTI-batch stream: batch 0 replaces,
    // later batches append — each trigger must NOT wipe the previous one's
    // rows (flush_records forces one file per micro-batch)
    plainEnv.where(org.apache.spark.sql.functions.col("offset") === 0)
      .write.parquet(s"$stage/multi")
    env(Seq("""{"id": 9, "v": "nine"}""")).write.mode("append").parquet(s"$stage/multi")
    SessionCatalogWarehouse.dropAny(spark, "broker_multi_tgt")
    Ingest.run(wh, Asset(name = "broker_multi_tgt", assetType = AssetType.Ingest,
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")),
      parameters = Map("source_uri" -> "mockkafka://broker/multi",
        "incremental_strategy" -> "replace", "flush_records" -> "1")))
    assert(spark.table("broker_multi_tgt").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "one"), (9, "nine")),
      "a later micro-batch must append, not re-replace the table")

    // an EXPLICIT checkpoint_location on a full-copy strategy must be
    // IGNORED: a persisted offset log would make a scheduled re-run
    // resume with batchId > 0, map every batch to Append, and the
    // promised "each run copies current state" replace would silently
    // never happen (worse: the sink would hold only the delta)
    val fullCopyCp = java.nio.file.Files.createTempDirectory("graft-fullcopy-cp").toString
    def replaceWithCp = Asset(name = "broker_multi_tgt", assetType = AssetType.Ingest,
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")),
      parameters = Map("source_uri" -> "mockkafka://broker/multi",
        "incremental_strategy" -> "replace", "flush_records" -> "1",
        "checkpoint_location" -> fullCopyCp))
    Ingest.run(wh, replaceWithCp)
    Ingest.run(wh, replaceWithCp)
    assert(spark.table("broker_multi_tgt").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "one"), (9, "nine")),
      "a full-copy re-run with an explicit checkpoint must still replace, not append the delta")

    // `+cdc` routes the same envelope through debezium decode + the CDC fold
    SessionCatalogWarehouse.dropAny(spark, "broker_cdc_tgt")
    SessionCatalogWarehouse.dropAny(spark, "broker_cdc_tgt__cdc_state")
    Ingest.run(wh, Asset(name = "broker_cdc_tgt", assetType = AssetType.Ingest,
      columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")),
      parameters = Map("source_uri" -> "mockkafka+cdc://broker/cdc")))
    // key 1 upserted to its latest image, key 2 deleted
    assert(spark.table("broker_cdc_tgt").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a2")))
  }

  test("debezium decode: wrapped/bare envelopes, op mapping, junk dropped") {
    import spark.implicits._
    val rows = Seq(
      // schema-wrapped create -> op r, lsn seq
      """{"payload": {"after": {"id": 1, "v": "a"}, "op": "c", "ts_ms": 5, "source": {"lsn": 10, "ts_ms": 5}}}""",
      // bare delete -> before image, op d
      """{"before": {"id": 2, "v": "b"}, "op": "d", "ts_ms": 6, "source": {"lsn": 11, "ts_ms": 6}}""",
      // bare update without source block -> seq falls back to ts_ms
      """{"after": {"id": 3, "v": "c"}, "op": "u", "ts_ms": 7}""",
      "not json at all",
      """{"some": "other json"}"""
    ).toDF("value")
    val out = Streams.debeziumDecode(rows, "id BIGINT, v STRING")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSet == Set((1L, "a", "r", 10L), (2L, "b", "d", 11L), (3L, "c", "u", 7L)),
      s"decoded: ${out.mkString(", ")}")
  }

  test("userVisitsComplete returns empty on an empty source instead of crashing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-events")
    spark.createDataFrame(Seq.empty[(Long, Long, Long, String, Double, String)])
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir.toString)
    assert(Streams.userVisitsComplete(spark, dir.toString).isEmpty)
    assert(Streams.userVisitsComplete(spark, dir.toString, incremental = true).isEmpty)
  }

  test("batch visit replay is sort-based and survives a hot key owning half the input") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-hotkey-events")
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // user 1 = 5000 events 1s apart (one giant visit, ~50% of the feed);
    // 50 cold users × 100 events each, every event its own visit (2h apart)
    val hot = (0 until 5000).map(i =>
      (i.toLong, new Timestamp(base + i * 1000L), 1L, "e", 0.25, ""))
    val cold = (0 until 50).flatMap(u => (0 until 100).map(i =>
      (100000L + u * 100 + i, new Timestamp(base + i * 7200000L), 2L + u, "e", 1.0, "")))
    spark.createDataFrame(hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir.toString)
    val visits = Streams.userVisitsComplete(spark, dir.toString)
    // the replay must be the spill-capable window plan, not the stateful
    // fold that buffers a key's whole history on one task
    assert(!visits.isStreaming, "replay must be a batch plan")
    val plan = visits.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a sort-based Window plan:\n$plan")
    assert(!plan.contains("FlatMapGroupsWithState"), "stateful fold in a batch replay")
    val byUser = visits.collect().groupBy(_.user_id)
    val hotVisits = byUser(1L)
    assert(hotVisits.length == 1 && hotVisits.head.n_events == 5000L &&
      hotVisits.head.total_cents == 5000L * 25, hotVisits.toSeq.toString)
    assert(byUser(2L).length == 100, s"cold user visits: ${byUser(2L).length}")
  }

  test("incremental and batch sessionizers agree on the same feed") {
    import java.sql.Timestamp
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-visits-parity")
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      // irregular gaps straddling the 30-min boundary in both directions
      val step = if (rnd.nextBoolean()) rnd.nextInt(1700) else 1900 + rnd.nextInt(4000)
      (i.toLong, new Timestamp(base + i.toLong * step * 1000L),
        (i % 7).toLong, "e", rnd.nextInt(500) / 100.0, "")
    }
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir.toString)
    val batch = Streams.userVisitsComplete(spark, dir.toString).collect().toSet
    val inc = Streams.userVisitsComplete(spark, dir.toString, incremental = true)
    assert(inc.isStreaming, "incremental path must be the stateful streaming operator")
    val q = inc.writeStream.format("memory").queryName("t_visits_parity")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("t_visits_parity")
      .as[graft.streaming.Streams.Visit].collect().toSet
    assert(streamed == batch,
      s"paths disagree: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
  }

  test("streaming merge upserts each micro-batch") {
    val wh = new SessionCatalogWarehouse(spark)
    wh.drop("t_stream_merge")
    val asset = Asset(name = "t_stream_merge",
      columns = Seq(Column("user_id", "BIGINT", primaryKey = true),
        Column("value", "DOUBLE", updateOnMerge = true)),
      materialization = Materialization(MaterializationType.Table, Some(Strategy.Merge)))
    val events = Streams.eventStream(spark, s"$sfDir/events.parquet")
      .selectExpr("user_id", "value").groupBy("user_id").agg(
        org.apache.spark.sql.functions.max("value").as("value"))
    // complete-mode aggregate can't feed foreachBatch merge directly; use raw
    val raw = Streams.eventStream(spark, s"$sfDir/events.parquet")
      .selectExpr("user_id", "CAST(value AS DOUBLE) AS value")
      .dropDuplicates("user_id")
    val q = Streams.streamingMerge(wh, asset, raw)
    q.awaitTermination()
    assert(spark.table("t_stream_merge").count() > 0)
  }

  test("drift PSI finisher: undeclared categories alarm above declared drift") {
    import spark.implicits._
    // window 1 matches the declared mix; window 2 is mostly an UNDECLARED
    // value — its epsilon-floored contribution must dominate everything
    val comp = Seq(
      ("w1", "view", 60L), ("w1", "click", 25L), ("w1", "purchase", 15L),
      ("w2", "view", 20L), ("w2", "bot_spam", 75L), ("w2", "click", 5L)
    ).toDF("window_start", "value", "n")
    val out = Streams.driftPsiFinish(comp,
      Map("view" -> 0.6, "click" -> 0.25, "purchase" -> 0.1))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(4))).toSeq
    val byKey = out.map(r => (r._1, r._2) -> r._3).toMap
    val spam = byKey(("w2", "bot_spam"))
    assert(out.forall { case (w, v, psi) => (w, v) == ("w2", "bot_spam") || psi < spam },
      s"undeclared category must carry the largest contribution: $out")
    // a window matching its declared mix stays near zero
    assert(out.filter(_._1 == "w1").map(_._3).forall(math.abs(_) < 0.05),
      s"in-mix window must be quiet: ${out.filter(_._1 == "w1")}")
    // (p - r) and ln(p / r) always share a sign, so every term is >= 0
    assert(out.forall(_._3 >= 0.0), "PSI terms are non-negative by construction")
  }

  test("scd2 enrich: past-threshold dim drops the broadcast hint, same result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // batch replay (EliminateEventTimeWatermark strips the watermark) so the
    // physical join strategy is inspectable on the executed plan
    val events = Seq(
      (1L, "2024-01-10 00:00:00"), (1L, "2024-01-20 00:00:00"),
      (2L, "2024-01-12 00:00:00"), (3L, "2024-01-25 00:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val mid = lit("2024-01-16 00:00:00").cast("timestamp")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("cust_id", "seg")
      .select(col("cust_id"), col("seg").as("segment"),
        lit("1970-01-01 00:00:00").cast("timestamp").as("valid_from"), mid.as("valid_to"))
      .unionByName(Seq((1L, "a+"), (2L, "b+"), (3L, "c+")).toDF("cust_id", "segment")
        .select(col("cust_id"), col("segment"), mid.as("valid_from"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("valid_to")))
    def run(maxB: Long) = Streams.scd2EnrichedCounts(events, dim,
      joinKey = "user_id", dimKey = "cust_id", attr = "segment",
      maxBroadcastBytes = maxB)
    // auto-broadcast off: the planner may no longer broadcast on its own, so
    // the strategy difference below is EXACTLY the hint the gate drops
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (a, b) = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hinted = run(256L << 20)
      val gated = run(0L) // every dim is past a zero threshold
      assert(hinted.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "a small dim must take the broadcast path (the hint must survive the gate)")
      assert(!gated.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "a past-threshold dim must not plan a broadcast build side")
      (hinted.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet,
        gated.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    assert(a == b && a.nonEmpty, s"join strategy changed the result: $a vs $b")
    // as-of semantics hold on both paths: the 01-10 event lands on the old
    // version, the 01-20 event on the new one
    val segs = b.map(_._2)
    assert(segs.contains("a") && segs.contains("a+"))
  }
}
