package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.materialize.{Materializer, SessionCatalogWarehouse}
import graft.materialize.Materializer.Context

class MaterializerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("@bruin SQL header parses into the asset model") {
    val asset = AssetParser.parse("assets/inventory.sql",
      """/* @bruin
        |name: inv.inventory
        |type: duckdb.sql
        |materialization:
        |  type: table
        |  strategy: merge
        |depends:
        |  - raw.items
        |columns:
        |  - name: item_id
        |    type: INTEGER
        |    primary_key: true
        |    checks:
        |      - name: not_null
        |      - name: positive
        |  - name: item_name
        |    type: VARCHAR
        |    update_on_merge: true
        |  - name: unit_price
        |    type: DOUBLE
        |    update_on_merge: false
        |@bruin */
        |SELECT 1 AS item_id, 'Widget' AS item_name, 9.99 AS unit_price
        |""".stripMargin)
    assert(asset.name == "inv.inventory")
    assert(asset.assetType == AssetType.SparkSql)
    assert(asset.materialization.strategy.contains(Strategy.Merge))
    assert(asset.primaryKeys == Seq("item_id"))
    assert(asset.mergeUpdateColumns == Seq("item_name"))
    assert(asset.dependsOn == Seq("raw.items"))
    assert(asset.columns.head.checks.map(_.name) == Seq("not_null", "positive"))
    assert(asset.content.startsWith("SELECT 1"))
  }

  test("merge semantics match the reference inventory fixture") {
    // reference integration-tests/test-pipelines/duckdb-materialization-merge:
    // item 1's name updates (merge column), price does NOT (non-merge), row 4 appends.
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "t_inventory",
      columns = Seq(
        Column("item_id", "INT", primaryKey = true),
        Column("item_name", "STRING", updateOnMerge = true),
        Column("stock", "INT"),
        Column("unit_price", "DOUBLE", updateOnMerge = false)),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.Merge)))
    wh.drop("t_inventory")
    val v1 =
      """SELECT item_id, item_name, stock, CAST(unit_price AS DOUBLE) AS unit_price FROM VALUES
        |  (1, 'Widget', 100, 1999.99), (2, 'Gadget', 50, 799.99), (3, 'Tool', 25, 299.99)
        |AS t(item_id, item_name, stock, unit_price)""".stripMargin
    val v2 =
      """SELECT item_id, item_name, stock, CAST(unit_price AS DOUBLE) AS unit_price FROM VALUES
        |  (1, 'Widget Pro', 100, 2099.99), (4, 'Accessory', 250, 249.99)
        |AS t(item_id, item_name, stock, unit_price)""".stripMargin
    Materializer.execute(wh, asset, v1)
    Materializer.execute(wh, asset, v2)
    val rows = spark.table("t_inventory").orderBy("item_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1, "Widget Pro", 100, 1999.99), // name merged, price kept
      (2, "Gadget", 50, 799.99),
      (3, "Tool", 25, 299.99),
      (4, "Accessory", 250, 249.99)))
  }

  test("render emits the strategy SQL programs") {
    val a = Asset(name = "s.t",
      columns = Seq(Column("id", "BIGINT", primaryKey = true, nullable = false)),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.CreateReplace)))
    assert(Materializer.render(a, "SELECT 1 AS id") ==
      Seq("CREATE OR REPLACE TABLE s.t AS\nSELECT 1 AS id"))

    val app = a.copy(materialization = a.materialization.copy(strategy = Some(Strategy.Append)))
    assert(Materializer.render(app, "SELECT 1 AS id") == Seq("INSERT INTO s.t\nSELECT 1 AS id"))

    val ddl = a.copy(materialization = a.materialization.copy(strategy = Some(Strategy.DDL)))
    assert(Materializer.render(ddl, "").head.contains("CREATE TABLE IF NOT EXISTS s.t"))
    assert(Materializer.render(ddl, "").head.contains("id BIGINT NOT NULL"))

    // --full-refresh overrides to create+replace except ddl/datavault
    val mrg = a.copy(materialization = a.materialization.copy(strategy = Some(Strategy.Merge)))
    assert(Materializer.render(mrg, "SELECT 1 AS id", Context(fullRefresh = true)).head
      .startsWith("CREATE OR REPLACE TABLE"))
    assert(Materializer.render(ddl, "", Context(fullRefresh = true)).head
      .startsWith("CREATE TABLE IF NOT EXISTS"))
  }

  test("pipeline yaml + seed asset yaml parse") {
    val p = AssetParser.parsePipelineYaml(
      """name: demo
        |schedule: daily
        |start_date: "2024-01-01"
        |concurrency: 4
        |variables:
        |  env: prod
        |""".stripMargin)
    assert(p.name == "demo" && p.concurrency == 4)

    val seed = AssetParser.parse("assets/contacts.asset.yml",
      """name: raw.contacts
        |type: duckdb.seed
        |parameters:
        |  path: ./seed.csv
        |columns:
        |  - name: name
        |    type: VARCHAR
        |    checks: [not_null]
        |""".stripMargin)
    assert(seed.assetType == AssetType.Seed)
    assert(seed.parameters("path") == "./seed.csv")
  }

  test("merge honors incremental_predicate written as target./source.") {
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "t_pred_merge",
      columns = Seq(
        Column("id", "INT", primaryKey = true),
        Column("v", "INT", updateOnMerge = true),
        Column("updated_at", "INT")),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.Merge),
        incrementalPredicate = Some("target.updated_at < source.updated_at")))
    wh.drop("t_pred_merge")
    Materializer.execute(wh, asset,
      "SELECT * FROM VALUES (1, 10, 5), (2, 20, 5) AS t(id, v, updated_at)")
    // id=1 source is OLDER than target -> predicate blocks the update AND the
    // row inserts as unmatched (reference semantics: the predicate is part of
    // the merge ON / NOT EXISTS condition, duckdb/materialization.go:158-166);
    // id=2 is newer -> updates; id=3 is brand new -> inserts
    Materializer.execute(wh, asset,
      "SELECT * FROM VALUES (1, 99, 1), (2, 99, 9), (3, 30, 9) AS t(id, v, updated_at)")
    val rows = spark.table("t_pred_merge").orderBy("id", "v")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 10), (1, 99), (2, 99), (3, 30)))
  }

  test("append and truncate_insert keep the table's partition layout") {
    val wh = new SessionCatalogWarehouse(spark)
    // partition layout is a property of the current generation table (the
    // public name is a view since the atomic-swap change)
    def partCols(t: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val target = SessionCatalogWarehouse.backingTable(spark, t).getOrElse(t)
      spark.catalog.listColumns(target).collectAsList().asScala.toSeq
        .filter(_.isPartition).map(_.name)
    }
    val asset = Asset(name = "t_part_append",
      materialization = Materialization(typ = MaterializationType.Table,
        strategy = Some(Strategy.Append), partitionBy = Seq("p")))
    wh.drop("t_part_append")
    Materializer.execute(wh, asset, "SELECT 1 AS x, 'a' AS p")
    assert(partCols("t_part_append") == Seq("p"))
    Materializer.execute(wh, asset, "SELECT 2 AS x, 'b' AS p")
    assert(partCols("t_part_append") == Seq("p"))
    assert(spark.table("t_part_append").count() == 2)

    val trunc = asset.copy(name = "t_part_trunc",
      materialization = asset.materialization.copy(strategy = Some(Strategy.TruncateInsert)))
    wh.drop("t_part_trunc")
    Materializer.execute(wh, trunc, "SELECT 1 AS x, 'a' AS p")
    Materializer.execute(wh, trunc, "SELECT 2 AS x, 'b' AS p")
    assert(partCols("t_part_trunc") == Seq("p"))
    assert(spark.table("t_part_trunc").count() == 1)
  }

  test("qualified view assets resolve under their full name") {
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "viewschema.v_prices",
      materialization = Materialization(typ = MaterializationType.View))
    Materializer.execute(wh, asset, "SELECT 42 AS answer")
    assert(spark.sql("SELECT answer FROM viewschema.v_prices").head().getInt(0) == 42)
    spark.sql("DROP VIEW IF EXISTS viewschema.v_prices")
  }

  test("merge_sql column expressions accumulate on match") {
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "t_merge_sql",
      columns = Seq(
        Column("id", "INT", primaryKey = true),
        Column("qty", "INT", mergeSql = "target.qty + source.qty"),
        Column("v", "STRING", updateOnMerge = true)),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.Merge)))
    wh.drop("t_merge_sql")
    Materializer.execute(wh, asset, "SELECT * FROM VALUES (1, 10, 'a') AS t(id, qty, v)")
    Materializer.execute(wh, asset,
      "SELECT * FROM VALUES (1, 5, 'a2'), (2, 7, 'b') AS t(id, qty, v)")
    val rows = spark.table("t_merge_sql").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows == Seq((1, 15, "a2"), (2, 7, "b"))) // qty accumulated, v replaced

    // render emits the custom expression in the UPDATE SET clause
    val rendered = Materializer.render(asset, "SELECT 1").head
    assert(rendered.contains("target.qty = target.qty + source.qty"))
    assert(rendered.contains("target.v = source.v"))
  }

  test("merge matches NULL primary keys null-safely") {
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "t_null_merge",
      columns = Seq(
        Column("k", "INT", primaryKey = true),
        Column("v", "STRING", updateOnMerge = true)),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.Merge)))
    wh.drop("t_null_merge")
    Materializer.execute(wh, asset,
      "SELECT * FROM VALUES (1, 'one'), (CAST(NULL AS INT), 'null-row') AS t(k, v)")
    // NULL key matches NULL key (<=>): updates instead of duplicating
    Materializer.execute(wh, asset,
      "SELECT * FROM VALUES (CAST(NULL AS INT), 'null-row-v2'), (2, 'two') AS t(k, v)")
    val rows = spark.table("t_null_merge").orderBy(org.apache.spark.sql.functions.col("k").asc_nulls_last)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "one"), (2, "two"), (-1, "null-row-v2")))
  }

  test("cluster_by sorts rows within written files") {
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "t_clustered",
      materialization = Materialization(typ = MaterializationType.Table,
        strategy = Some(Strategy.CreateReplace), clusterBy = Seq("k")))
    wh.drop("t_clustered")
    Materializer.execute(wh, asset,
      "SELECT id % 7 AS k, id AS v FROM range(1000)")
    // rows inside each file are ordered by k (monotonic per input split)
    import org.apache.spark.sql.functions._
    val disorder = spark.table("t_clustered")
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("k", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .where(col("prev") > col("k")).count()
    assert(disorder == 0)
    assert(spark.table("t_clustered").count() == 1000)
  }

  test("co-bucketed tables join without a shuffle") {
    val wh = new SessionCatalogWarehouse(spark)
    def bucketedAsset(name: String) = Asset(name = name,
      materialization = Materialization(typ = MaterializationType.Table,
        strategy = Some(Strategy.CreateReplace),
        bucketBy = Seq("k"), buckets = 4))
    wh.drop("t_bucket_a"); wh.drop("t_bucket_b")
    Materializer.execute(wh, bucketedAsset("t_bucket_a"),
      "SELECT id AS k, id * 2 AS v FROM range(1000)")
    Materializer.execute(wh, bucketedAsset("t_bucket_b"),
      "SELECT id AS k, id * 3 AS w FROM range(1000)")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.sql(
        "SELECT a.k, a.v, b.w FROM t_bucket_a a JOIN t_bucket_b b ON a.k = b.k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      // co-bucketed sides read as pre-hashed partitions: zero exchanges
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("metadata push lands descriptions as catalog comments") {
    import graft.materialize.MetadataPush
    spark.sql("DROP TABLE IF EXISTS t_meta")
    spark.sql("CREATE TABLE t_meta USING parquet AS SELECT 1 AS id, 'x' AS name")
    val asset = Asset(name = "t_meta", description = "core entity table",
      columns = Seq(
        Column("id", "INT", description = "primary identifier"),
        Column("name", "STRING", description = "display name"),
        Column("ghost", "INT", description = "not in the table")))
    assert(MetadataPush.push(spark, asset) == 3) // table + 2 real columns
    val comments = spark.sql("DESCRIBE TABLE t_meta").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(comments("id") == "primary identifier")
    assert(comments("name") == "display name")
    // v1 promotes the 'comment' property to the table comment
    assert(spark.catalog.getTable("t_meta").description == "core entity table")
  }

  test("format: canonical serialization round-trips losslessly") {
    val text =
      """/* @bruin
        |name: sales.orders
        |type: duckdb.sql
        |description: daily orders
        |tier: 2
        |notifications:
        |  slack:
        |    - channel: "#data-alerts"
        |  email:
        |    - recipients: [oncall@example.com]
        |depends:
        |  - raw.events
        |materialization:
        |  type: table
        |  strategy: merge
        |columns:
        |  - name: id
        |    type: BIGINT
        |    primary_key: true
        |    checks: [not_null, unique]
        |  - name: qty
        |    type: INT
        |    merge_sql: target.qty + source.qty
        |custom_checks:
        |  - name: has_rows
        |    query: SELECT count(*) FROM sales.orders
        |    value: 1
        |parameters:
        |  timeout: "30"
        |hooks:
        |  pre:
        |    - SELECT 1
        |@bruin */
        |SELECT * FROM raw.events
        |""".stripMargin
    val asset = AssetParser.parse("assets/orders.sql", text)
    val formatted = graft.model.Formatter.formatAsset(asset)
    // round trip: formatting then re-parsing yields the identical asset,
    // and formatting is idempotent
    assert(AssetParser.parse("assets/orders.sql", formatted) == asset)
    assert(graft.model.Formatter.formatAsset(
      AssetParser.parse("assets/orders.sql", formatted)) == formatted)

    // docs render mentions assets and columns
    val md = graft.model.Docs.markdown(Pipeline(name = "p", assets = Seq(asset)))
    assert(md.contains("## sales.orders") && md.contains("| id | BIGINT |"))

    // CLI: format --check on the demo pipeline must not flag lossy skips
    val rc = Main.run(Seq("format", "src/test/resources/pipelines/demo", "--check"))
    assert(rc == 0 || rc == 1) // exit 1 just means files would be reformatted
    assert(Main.run(Seq("docs", "src/test/resources/pipelines/demo")) == 0)
  }

  test("none materialization executes without collecting") {
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "noop_asset") // default type = none
    // would OOM the driver if collected at scale; here just assert it runs
    Materializer.execute(wh, asset, "SELECT explode(sequence(1, 1000)) AS n")
  }

  test("seed loader round-trips every supported format") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-seed-fmt")
    val df = spark.createDataFrame(Seq(
      (1L, "Widget", 499.99), (2L, "Gadget", 899.0), (3L, "Trinket", 49.5)))
      .toDF("id", "name", "price")
    val expect = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    def got(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id").cast("long"), col("name"), col("price").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // single-file writes per format, then read back through the seed API.
    // avro is jar-gated in this environment (spark-avro is an EXTERNAL
    // module, absent from /opt/spark/jars — same class of block as the
    // kafka connector): round-trip it when loadable, otherwise pin that
    // the branch fails with Spark's data-source-not-found guidance rather
    // than something silent.
    scala.util.Try(
      df.coalesce(1).write.mode("overwrite").format("avro").save(s"$base/a")) match {
      case scala.util.Success(_) =>
        val part = graft.core.Fs.listDir(base.resolve("a"))
          .find(_.getFileName.toString.endsWith(".avro")).get
        assert(got(graft.sources.Seeds.readAs(spark, "avro", part.toString)) == expect)
      case scala.util.Failure(e) =>
        // the module is absent here: the seed branch must surface Spark's
        // own deploy-the-avro-module guidance, not something silent
        assert(e.getMessage != null && e.getMessage.toLowerCase.contains("avro"),
          s"unexpected avro failure: $e")
        val r = intercept[org.apache.spark.sql.AnalysisException](
          graft.sources.Seeds.readAs(spark, "avro", s"$base/nope.avro"))
        assert(r.getMessage.toLowerCase.contains("avro"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$base/p")
    df.coalesce(1).write.mode("overwrite").orc(s"$base/o")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$base/c")
    df.coalesce(1).write.mode("overwrite").json(s"$base/j")
    for ((fmt, dir) <- Seq("parquet" -> "p", "orc" -> "o",
                           "csv" -> "c", "jsonl" -> "j")) {
      val part = graft.core.Fs.listDir(base.resolve(dir))
        .find(p => !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.endsWith(".crc")).get
      assert(got(graft.sources.Seeds.readAs(spark, fmt, part.toString)) == expect,
        s"format $fmt diverged")
    }
    assert(graft.sources.Seeds.SupportedExtensions.contains("orc"))
    intercept[IllegalArgumentException](
      graft.sources.Seeds.readAs(spark, "xml", s"$base/nope.xml"))
    graft.core.Fs.deleteRecursively(base)
  }

  test("quality_filter parameter gates materialization input through gopher or c4") {
    import org.apache.spark.sql.functions._
    val wh = new SessionCatalogWarehouse(spark)
    val sent = "the quick brown fox jumps over the lazy dog and runs into the green field."
    val good = (sent + " ") * 4   // 60 words, sentence-terminated lines
    val junk = "### 12 34"
    val in = spark.createDataFrame(Seq((1L, good), (2L, junk))).toDF("doc_id", "text")
    for ((filt, tbl) <- Seq("gopher" -> "qf_gopher_t", "c4" -> "qf_c4_t")) {
      wh.drop(tbl)
      Materializer.executeDf(wh, Asset(name = tbl,
        materialization = Materialization(typ = MaterializationType.Table),
        parameters = Map("quality_filter" -> filt)), in)
      val rows = spark.table(tbl).collect()
      assert(rows.map(_.getLong(0)).toSet == Set(1L),
        s"$filt gate should keep only the real doc: ${rows.map(_.getLong(0)).mkString(",")}")
      assert(spark.table(tbl).columns.toSeq == Seq("doc_id", "text"),
        s"$filt gate must not leak rule columns")
      SessionCatalogWarehouse.dropAny(spark, tbl)
    }
    // unknown filter fails fast with the supported list
    val e = intercept[IllegalArgumentException] {
      Materializer.executeDf(wh, Asset(name = "qf_bad",
        materialization = Materialization(typ = MaterializationType.Table),
        parameters = Map("quality_filter" -> "nope")), in)
    }
    assert(e.getMessage.contains("supported: gopher, c4"))
  }

  test("index parameter builds and incrementally appends a persisted ANN index") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.{Pq, Similarity}
    val wh = new SessionCatalogWarehouse(spark)
    val rnd = new scala.util.Random(7)
    val all = (1L to 60L).map(i => (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val built  = all.where(col("vec_id") % 10 =!= 3)
    val batch  = all.where(col("vec_id") % 10 === 3)
    Seq("idx_ivf_t", "idx_ivf_t_centroids", "idx_pq_t", "idx_pq_t_centroids",
        "idx_pq_t_codebooks").foreach(t => SessionCatalogWarehouse.dropAny(spark, t))

    // ---- ivf: create+replace trains + persists, append routes only the batch
    val ivfAsset = Asset(name = "idx_ivf_t",
      materialization = Materialization(typ = MaterializationType.Table,
        strategy = Some(Strategy.Append)),
      parameters = Map("index" -> "ivf", "index_nlist" -> "4"))
    Materializer.executeDf(wh, ivfAsset, built)       // not exists -> full build
    val cents = Similarity.loadCentroids(spark, "idx_ivf_t_centroids")
    assert(cents.length == 4, s"nlist param should size the quantizer: ${cents.length}")
    Materializer.executeDf(wh, ivfAsset, batch)       // exists -> incremental
    val idx = Similarity.loadIndex(spark, "idx_ivf_t")
    assert(idx.count() == 60, "append must add exactly the batch rows")
    // append froze the quantizer: the artifact is unchanged and every index
    // row carries the SAME pairing stamp
    assert(Similarity.loadCentroids(spark, "idx_ivf_t_centroids")
      .map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(idx.select("__quantizer_md5").distinct().count() == 1)
    // the built+appended index serves the routed join: full probe == exact
    val queries = all.where(col("vec_id") <= 5)
    val routed = Similarity.knnJoinIvfIndexed(queries, idx, cents, k = 3,
      nprobe = cents.length).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val exact = Similarity.knnJoin(queries, all, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(routed == exact, "routed join over the asset-built index must match exact")

    // ---- ivfpq: same shape, both quantizer tiers persisted + frozen
    val pqAsset = Asset(name = "idx_pq_t",
      materialization = Materialization(typ = MaterializationType.Table,
        strategy = Some(Strategy.Append)),
      parameters = Map("index" -> "ivfpq", "index_nlist" -> "4",
        "index_m" -> "2", "index_k" -> "8"))
    Materializer.executeDf(wh, pqAsset, built)
    val books = Pq.loadCodebooks(spark, "idx_pq_t_codebooks")
    assert(books.length == 2 && books.forall(_.length <= 8))
    Materializer.executeDf(wh, pqAsset, batch)
    val pqIdx = Pq.loadPqIndex(spark, "idx_pq_t")
    assert(pqIdx.count() == 60)
    assert(pqIdx.select("__quantizer_md5").distinct().count() == 1,
      "appended codes must carry the same dual-tier pairing stamp")
    // the loaded artifacts serve ADC search over the combined index
    val pqCents = Similarity.loadCentroids(spark, "idx_pq_t_centroids")
    assert(Pq.knnJoinIvfPqIndexed(queries, pqIdx, pqCents, books,
      topK = 3, nprobe = 4).count() > 0)

    // ---- refusals: non-index strategies and unknown kinds fail fast
    val e1 = intercept[IllegalArgumentException] {
      Materializer.executeDf(wh, ivfAsset.copy(name = "idx_bad1",
        materialization = Materialization(typ = MaterializationType.Table,
          strategy = Some(Strategy.Merge))), built)
    }
    assert(e1.getMessage.contains("create+replace and append"))
    val e2 = intercept[IllegalArgumentException] {
      Materializer.executeDf(wh, ivfAsset.copy(name = "idx_bad2",
        parameters = Map("index" -> "hnsw")), built)
    }
    assert(e2.getMessage.contains("supported: ivf, ivfpq"))
    Seq("idx_ivf_t", "idx_ivf_t_centroids", "idx_pq_t", "idx_pq_t_centroids",
        "idx_pq_t_codebooks").foreach(t => SessionCatalogWarehouse.dropAny(spark, t))
  }

  test("compacting an appended ANN index preserves bucket layout, stamp, and search") {
    // the nightly-ingest lifecycle: build -> append x3 (file count grows
    // per batch) -> compact -> serve. Compaction must keep the
    // bucketBy(list_id) spec (the exchange-free join contract), the
    // quantizer pairing stamp, and the routed result.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Similarity
    import graft.materialize.Compactor
    val wh = new SessionCatalogWarehouse(spark)
    SessionCatalogWarehouse.dropAny(spark, "idx_compact_t")
    val rnd = new scala.util.Random(11)
    val all = (1L to 80L).map(i => (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(all, nlist = 4)
    Similarity.saveIndex(spark, all.where(col("vec_id") % 4 === 0), cents, "idx_compact_t")
    (1 to 3).foreach(m => Similarity.appendToIndex(spark,
      all.where(col("vec_id") % 4 === m), cents, "idx_compact_t"))
    val queries = all.where(col("vec_id") <= 5)
    def routed() = Similarity.knnJoinIvfIndexed(queries,
      Similarity.loadIndex(spark, "idx_compact_t"), cents, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val before = routed()
    val stats = Compactor.compact(wh, "idx_compact_t", targetBytes = 512L << 20)
    assert(stats.rewritten, "4 generations of bucket files should trigger a rewrite")
    val backing = SessionCatalogWarehouse.backingTable(spark, "idx_compact_t").get
    assert(org.apache.spark.sql.graft.SqlBridge.bucketCount(spark, backing)
      .contains(8), "compaction must keep the bucketBy(list_id) spec")
    val idx = Similarity.loadIndex(spark, "idx_compact_t")
    assert(idx.count() == 80)
    assert(idx.select("__quantizer_md5").distinct().count() == 1,
      "the pairing stamp must survive compaction")
    assert(routed() == before, "compaction must not change the routed result")
    // and a later append still lands on the compacted artifact
    Similarity.appendToIndex(spark, all.where(col("vec_id") % 4 === 3)
      .limit(0), cents, "idx_compact_t") // schema-compatible no-op batch
    SessionCatalogWarehouse.dropAny(spark, "idx_compact_t")
  }

  test("compacting an appended signature index preserves buckets, stamp, and pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.Dedup
    import graft.materialize.Compactor
    val wh = new SessionCatalogWarehouse(spark)
    SessionCatalogWarehouse.dropAny(spark, "sig_compact_t")
    val rnd = new scala.util.Random(13)
    val base = Array.fill(30)(rnd.nextLong() & ((1L << 62) - 1))
    // 60 ids over 30 base signatures with one-bit edits: guaranteed pairs
    val sigs = (0 until 60).map(i => (i.toLong, base(i % 30) ^ (1L << (i % 40))))
      .toDF("doc_id", "simhash")
    Dedup.saveSignatureIndex(spark, sigs.where(col("doc_id") % 3 === 0),
      "sig_compact_t", maxHamming = 7, bands = 8)
    (1 to 2).foreach(m => Dedup.appendToSignatureIndex(spark,
      sigs.where(col("doc_id") % 3 === m), "sig_compact_t"))
    def pairs() = Dedup.hammingPairsIndexed(
      Dedup.loadSignatureIndex(spark, "sig_compact_t"), maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = pairs()
    assert(before.nonEmpty, "the one-bit-edit fixture must produce pairs")
    val stats = Compactor.compact(wh, "sig_compact_t", targetBytes = 512L << 20)
    assert(stats.rewritten, "3 generations of bucket files should trigger a rewrite")
    val backing = SessionCatalogWarehouse.backingTable(spark, "sig_compact_t").get
    assert(org.apache.spark.sql.graft.SqlBridge.bucketCount(spark, backing)
      .contains(8), "compaction must keep the bucketBy(bk) spec")
    val idx = Dedup.loadSignatureIndex(spark, "sig_compact_t")
    assert(idx.select("__band_config").distinct().count() == 1,
      "the geometry stamp must survive compaction")
    assert(pairs() == before, "compaction must not change the flagged pairs")
    SessionCatalogWarehouse.dropAny(spark, "sig_compact_t")
  }

  test("analyze param collects table and column statistics after the write") {
    val wh = new SessionCatalogWarehouse(spark)
    wh.drop("stats_t")
    Materializer.executeDf(wh, Asset(name = "stats_t",
      materialization = Materialization(typ = MaterializationType.Table),
      columns = Seq(Column("n", "BIGINT")),
      parameters = Map("analyze" -> "columns")),
      spark.range(1000).toDF("n"))
    // stats land on the BACKING generation table (ANALYZE on a view fails)
    val backing = SessionCatalogWarehouse.backingTable(spark, "stats_t").get
    val desc = spark.sql(s"DESCRIBE EXTENDED $backing").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Statistics").exists(_.contains("1000 rows")),
      s"row-count stat missing: ${desc.get("Statistics")}")
    val colStats = spark.sql(s"DESCRIBE EXTENDED $backing n").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("distinct_count").exists(v => v != null && v != "NULL"),
      s"column NDV missing: $colStats")
    SessionCatalogWarehouse.dropAny(spark, "stats_t")

    // reserved-word column names must not fail the post-write analyze
    // (identifiers are backtick-quoted into the ANALYZE statement)
    wh.drop("stats_kw")
    Materializer.executeDf(wh, Asset(name = "stats_kw",
      materialization = Materialization(typ = MaterializationType.Table),
      columns = Seq(Column("order", "BIGINT"), Column("from", "STRING")),
      parameters = Map("analyze" -> "columns")),
      spark.range(50).selectExpr("id AS `order`", "CAST(id AS STRING) AS `from`"))
    val kwBacking = SessionCatalogWarehouse.backingTable(spark, "stats_kw").get
    val kwStats = spark.sql(s"DESCRIBE EXTENDED $kwBacking `order`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kwStats.get("distinct_count").exists(v => v != null && v != "NULL"),
      s"reserved-word column NDV missing: $kwStats")
    SessionCatalogWarehouse.dropAny(spark, "stats_kw")
  }

  test("cluster_strategy zorder lays the table out for multi-column pruning") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val wh = new SessionCatalogWarehouse(spark)
    val data = spark.range(100000).select(
      pmod(hash(col("id"), lit("x")), lit(1000)).as("x"),
      pmod(hash(col("id"), lit("y")), lit(1000)).as("y"))
    def scanned(table: String): Long = {
      val q = spark.table(table).where(col("y").between(500, 520))
      q.collect()
      q.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    def matAsset(name: String, params: Map[String, String]) = Asset(name = name,
      materialization = Materialization(typ = MaterializationType.Table,
        clusterBy = Seq("x", "y")),
      parameters = params)
    wh.drop("zorder_t"); wh.drop("plain_t")
    Materializer.executeDf(wh, matAsset("zorder_t",
      Map("cluster_strategy" -> "zorder", "zorder_files" -> "32")), data)
    Materializer.executeDf(wh, matAsset("plain_t", Map.empty),
      data.repartition(32))
    assert(spark.table("zorder_t").count() == 100000)
    val (z, p) = (scanned("zorder_t"), scanned("plain_t"))
    assert(p > 80000, s"plain multi-column sort should read ~all on y: $p")
    assert(z < p / 2, s"zorder should prune the y scan: $z vs $p")
    SessionCatalogWarehouse.dropAny(spark, "zorder_t")
    SessionCatalogWarehouse.dropAny(spark, "plain_t")

    // PARTITIONED asset + zorder: the curve order must survive the write
    // path's rebalance (the arranged-layout marker) — a y filter prunes
    // row groups INSIDE each partition directory
    wh.drop("zorder_p"); wh.drop("plain_p")
    val pdata = data.withColumn("p", pmod(col("x"), lit(2)).cast("int"))
    def pAsset(name: String, params: Map[String, String]) = Asset(name = name,
      materialization = Materialization(typ = MaterializationType.Table,
        partitionBy = Seq("p"), clusterBy = Seq("x", "y")),
      parameters = params)
    Materializer.executeDf(wh, pAsset("zorder_p",
      Map("cluster_strategy" -> "zorder", "zorder_files" -> "32")), pdata)
    Materializer.executeDf(wh, pAsset("plain_p", Map.empty), pdata.repartition(32))
    assert(spark.table("zorder_p").count() == 100000)
    assert(!spark.table("zorder_p").columns.contains(
      SessionCatalogWarehouse.ArrangedMarker), "marker column must not land")
    val (zp, pp) = (scanned("zorder_p"), scanned("plain_p"))
    assert(zp < pp / 2, s"partitioned zorder should prune the y scan: $zp vs $pp")
    SessionCatalogWarehouse.dropAny(spark, "zorder_p")
    SessionCatalogWarehouse.dropAny(spark, "plain_p")
  }

  test("partitioned write rebalances: a hot partition value splits across files") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, when}
    val wh = new SessionCatalogWarehouse(spark)
    wh.drop("rebal_t")
    // one partition value owns ~99% of the bytes; with the advisory size
    // lowered, AQE's rebalance must split it across several write tasks
    // instead of funneling the whole directory through one task/file
    val prev = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    try {
      val skewed = spark.range(60000).select(
        col("id").as("n"),
        concat_ws("-", col("id"), col("id") * 7, col("id") * 13).as("pad"),
        when(col("id") % 100 === 0, 1).otherwise(0).cast("int").as("p"))
      wh.createOrReplace("rebal_t", skewed, partitionBy = Seq("p"))
      val backing = SessionCatalogWarehouse.backingTable(spark, "rebal_t").get
      val hotFiles = spark.table(backing).inputFiles.count(_.contains("p=0"))
      assert(hotFiles >= 2,
        s"hot partition should split across write tasks, got $hotFiles file(s)")
      assert(spark.table("rebal_t").count() == 60000)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None => spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
      SessionCatalogWarehouse.dropAny(spark, "rebal_t")
    }
  }

  test("compact merges small files atomically, keeps layout, no-ops when tight") {
    import graft.materialize.Compactor
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col
    val wh = new SessionCatalogWarehouse(spark)
    // unpartitioned: 6 appends × 10 writer tasks = a sliver pile
    wh.drop("compact_t")
    wh.createOrReplace("compact_t", spark.range(0, 100).toDF("n").repartition(10))
    (1 to 5).foreach(i =>
      wh.append("compact_t", spark.range(i * 100L, i * 100L + 100).toDF("n").repartition(10)))
    val before = spark.table("compact_t").inputFiles.length
    assert(before >= 30, s"fixture should be fragmented, got $before files")
    val stats = Compactor.compact(wh, "compact_t", targetBytes = 512L << 20)
    assert(stats.rewritten && stats.filesBefore == before)
    assert(stats.filesAfter <= 2, s"expected ~1 file, got ${stats.filesAfter}")
    assert(spark.table("compact_t").count() == 600, "compaction must not lose rows")
    // idempotent: already within target → no rewrite, no new generation
    val gen = SessionCatalogWarehouse.backingTable(spark, "compact_t")
    assert(!Compactor.compact(wh, "compact_t", targetBytes = 512L << 20).rewritten)
    assert(SessionCatalogWarehouse.backingTable(spark, "compact_t") == gen)

    // partitioned: slivers merge per directory, layout survives
    wh.drop("compact_p")
    import spark.implicits._
    def batch(lo: Long) = spark.range(lo, lo + 100)
      .select(col("id").as("n"), (col("id") % 2).cast("int").as("p"))
    wh.createOrReplace("compact_p", batch(0).repartition(8), partitionBy = Seq("p"))
    (1 to 4).foreach(i => wh.append("compact_p", batch(i * 100L).repartition(8)))
    val pBefore = spark.table("compact_p").inputFiles.length
    val pStats = Compactor.compact(wh, "compact_p", targetBytes = 512L << 20)
    assert(pStats.rewritten && pStats.filesAfter < pBefore / 2)
    val backing = SessionCatalogWarehouse.backingTable(spark, "compact_p").get
    assert(spark.catalog.listColumns(backing).collectAsList().asScala
      .exists(c => c.name == "p" && c.isPartition), "partition layout lost")
    assert(spark.table("compact_p").count() == 500)

    // SKEWED partitioned: one partition value owns ~all the bytes — the
    // rewrite must salt it across several target-sized files, not funnel
    // the whole directory to one task and one oversized file
    wh.drop("compact_skew")
    def skewBatch(lo: Long) = spark.range(lo, lo + 20000)
      .select(col("id").as("n"),
        org.apache.spark.sql.functions.concat_ws("-",
          col("id"), col("id") * 7, col("id") * 13).as("pad"),
        org.apache.spark.sql.functions.when(col("id") % 100 === 0, 1)
          .otherwise(0).cast("int").as("p"))
    wh.createOrReplace("compact_skew", skewBatch(0).repartition(16),
      partitionBy = Seq("p"))
    (1 to 3).foreach(i =>
      wh.append("compact_skew", skewBatch(i * 20000L).repartition(16)))
    val sStats = Compactor.compact(wh, "compact_skew", targetBytes = 32L << 10)
    assert(sStats.rewritten, sStats.pretty)
    val sBacking = SessionCatalogWarehouse.backingTable(spark, "compact_skew").get
    val hotFiles = spark.table(sBacking).inputFiles.count(_.contains("p=0"))
    assert(hotFiles >= 3,
      s"hot partition should split into ~targetBytes files, got $hotFiles")
    assert(spark.table("compact_skew").count() == 80000)
    SessionCatalogWarehouse.dropAny(spark, "compact_skew")

    // CLI surface
    assert(Main.run(Seq("compact", "compact_t", "compact_p", "--target-mb", "64"),
      Some(spark)) == 0)
    assert(Main.run(Seq("compact"), Some(spark)) == 2)
    assert(Main.run(Seq("compact", "no_such_table_xyz"), Some(spark)) == 1)

    // --zorder: the compaction rewrite doubles as an OPTIMIZE-ZORDER —
    // after it, a filter on the SECOND clustered column prunes row groups
    wh.drop("compact_z")
    val scatter = spark.range(100000).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("id"),
          org.apache.spark.sql.functions.lit("x")),
        org.apache.spark.sql.functions.lit(1000)).as("x"),
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("id"),
          org.apache.spark.sql.functions.lit("y")),
        org.apache.spark.sql.functions.lit(1000)).as("y"))
    wh.createOrReplace("compact_z", scatter.repartition(32))
    val zStats = Compactor.compact(wh, "compact_z",
      targetBytes = 16L << 10, zorderBy = Seq("x", "y"))
    assert(zStats.rewritten && zStats.filesAfter > 10, zStats.pretty)
    val q = spark.table("compact_z").where(col("y").between(500, 520))
    q.collect()
    val scanned = q.queryExecution.executedPlan.collectLeaves().head
      .metrics("numOutputRows").value
    assert(scanned < 50000, s"z-order compaction should prune y scans: $scanned")
    assert(spark.table("compact_z").count() == 100000)

    // a bucketed table keeps its bucket layout through the rewrite — the
    // layout is the shuffle-free-join contract, not an implementation detail
    wh.drop("compact_b")
    def bbatch(lo: Long) = spark.range(lo, lo + 500)
      .select(col("id").as("n"), (col("id") % 16).as("k"))
    wh.createOrReplace("compact_b", bbatch(0).repartition(4),
      bucketBy = Seq("k"), buckets = 4)
    (1 to 4).foreach(i => wh.append("compact_b", bbatch(i * 500L).repartition(4),
      bucketBy = Seq("k"), buckets = 4))
    val bBefore = spark.table("compact_b").inputFiles.length
    val bStats = Compactor.compact(wh, "compact_b", targetBytes = 512L << 20)
    assert(bStats.rewritten && bStats.filesAfter < bBefore, bStats.pretty)
    val bBacking = SessionCatalogWarehouse.backingTable(spark, "compact_b").get
    val bDesc = spark.sql(s"DESCRIBE FORMATTED $bBacking").collect()
      .map(r => r.getString(0).trim -> Option(r.getString(1)).getOrElse("")).toMap
    assert(bDesc.get("Num Buckets").exists(_.trim == "4"),
      s"bucket count lost: ${bDesc.get("Num Buckets")}")
    assert(bDesc.get("Bucket Columns").exists(_.contains("k")),
      s"bucket columns lost: ${bDesc.get("Bucket Columns")}")
    assert(spark.table("compact_b").count() == 2500)
    SessionCatalogWarehouse.dropAny(spark, "compact_b")

    // composed views (CDC overlays, user views) are refused, not silently
    // frozen into a generation snapshot
    spark.sql("CREATE OR REPLACE VIEW compact_v AS SELECT * FROM compact_z")
    val err = intercept[IllegalArgumentException](
      Compactor.compact(wh, "compact_v"))
    assert(err.getMessage.contains("composed view"))
    spark.sql("DROP VIEW compact_v")
    SessionCatalogWarehouse.dropAny(spark, "compact_t")
    SessionCatalogWarehouse.dropAny(spark, "compact_p")
    SessionCatalogWarehouse.dropAny(spark, "compact_z")
  }

  test("clean sweeps stale streaming staging dirs, spares fresh and foreign ones") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft-clean-sweep")
    // one stale dir per owned prefix (mtime pushed past any grace), one
    // fresh dir, one foreign dir that must never be touched
    val stale = Main.streamStagingPrefixes.map { pre =>
      val d = Files.createDirectory(tmp.resolve(pre + "stale01"))
      Files.write(d.resolve("part-0000.parquet"), Array[Byte](1, 2, 3))
      Files.setLastModifiedTime(d, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600L * 1000))
      d
    }
    val fresh = Files.createDirectory(tmp.resolve("graft-stream-fresh01"))
    val foreign = Files.createDirectory(tmp.resolve("someone-elses-dir"))
    // a LIVE stream's dir: old by mtime (past any grace) but carrying a
    // fresh heartbeat — the per-micro-batch listener touch must override
    // the age check, or a stream running longer than --stream-grace
    // loses its input mid-run
    val live = Files.createDirectory(tmp.resolve("graft-stream-live0001"))
    graft.streaming.Streams.touchHeartbeat(live)
    Files.setLastModifiedTime(live, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 48L * 3600 * 1000))
    val swept = Main.sweepStreamStaging(graceNanos = 900L * 1000000000L, tmp = tmp)
    assert(swept == stale.size, s"expected ${stale.size} sweeps, got $swept")
    stale.foreach(d => assert(!Files.exists(d), s"stale $d must be swept"))
    assert(Files.exists(fresh), "in-grace dir must survive")
    assert(Files.exists(foreign), "foreign dir must never be touched")
    assert(Files.exists(live), "fresh-heartbeat dir must survive any grace")
    // even a zero grace spares it — liveness, not age, is the signal
    Main.sweepStreamStaging(graceNanos = 0L, tmp = tmp)
    assert(Files.exists(live), "fresh-heartbeat dir must survive grace 0")
    // …but a STALE heartbeat stops protecting: the stream is gone
    val hb = live.resolve(graft.streaming.Streams.HeartbeatFile)
    Files.setLastModifiedTime(hb, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 48L * 3600 * 1000))
    Main.sweepStreamStaging(graceNanos = 0L, tmp = tmp)
    assert(!Files.exists(live), "stale-heartbeat dir must be swept once past grace")
    // the CLI surface drives the same sweep against the real /tmp — with a
    // huge stream-grace so a unit test never reaps another process's
    // (legitimately old but live) staging dirs on a shared machine
    assert(Main.run(Seq("clean", "--stream-grace", "999999999"), Some(spark)) == 0)
    graft.core.Fs.deleteRecursively(tmp)
  }

  test("createOrReplace swap is atomic: no crash window without a readable table") {
    val wh = new SessionCatalogWarehouse(spark)
    val name = "swap_atomic_t"
    wh.drop(name)
    wh.createOrReplace(name, spark.range(5).toDF("n"))
    assert(spark.table(name).count() == 5)
    // the public name is a view over exactly one generation table
    def isView(n: String) = spark.catalog.getTable(n).tableType == "VIEW"
    assert(isView(name))
    assert(SessionCatalogWarehouse.generations(spark, name).size == 1)
    val gen1 = SessionCatalogWarehouse.backingTable(spark, name).get

    // simulate a writer that crashed AFTER writing its generation but BEFORE
    // the view repoint: an extra generation table appears — readers are
    // untouched, and the backing resolution still picks the live generation
    spark.range(99).toDF("n").write.saveAsTable(
      s"$name${SessionCatalogWarehouse.GenSep}deadbeef")
    assert(spark.table(name).count() == 5, "torn write must not affect readers")
    assert(SessionCatalogWarehouse.backingTable(spark, name).contains(gen1))

    // `graft clean` reaps the orphan, not the live generation (--grace 0:
    // the default 15-minute window exists to protect in-flight writes)
    assert(Main.run(Seq("clean", "--grace", "0"), Some(spark)) == 0)
    // observed flaky once under heavy host load (r9): on failure, dump the
    // catalog state clean saw so the next occurrence self-explains
    withClue {
      import scala.jdk.CollectionConverters._
      val gens = spark.catalog.listDatabases().collectAsList().asScala.flatMap(db =>
        spark.catalog.listTables(db.name).collectAsList().asScala
          .filter(_.name.contains(SessionCatalogWarehouse.GenSep))
          .map(t => s"${db.name}.${t.name} (type=${t.tableType})"))
      s"currentDatabase=${spark.catalog.currentDatabase} " +
        s"nanoTime=${System.nanoTime()} " +
        s"backing=${SessionCatalogWarehouse.backingTable(spark, name)} " +
        s"generations=[${gens.mkString(", ")}] "
    } {
      assert(!spark.catalog.tableExists(s"$name${SessionCatalogWarehouse.GenSep}deadbeef"))
    }
    assert(spark.table(name).count() == 5)

    // a replace swaps generations atomically and reaps the old one
    wh.createOrReplace(name, spark.range(7).toDF("n"))
    assert(spark.table(name).count() == 7)
    assert(SessionCatalogWarehouse.generations(spark, name).size == 1)
    assert(SessionCatalogWarehouse.backingTable(spark, name).get != gen1)

    // a failed replace leaves the current generation serving
    intercept[Exception] {
      wh.createOrReplace(name, spark.sql("SELECT assert_true(false) AS n"))
    }
    assert(spark.table(name).count() == 7, "failed swap must leave old data live")
    assert(SessionCatalogWarehouse.generations(spark, name).size == 1)

    // appends land in the current generation through the view
    wh.append(name, spark.range(3).toDF("n"))
    assert(spark.table(name).count() == 10)

    // legacy migration: a plain pre-indirection TABLE is adopted on replace
    val legacy = "swap_legacy_t"
    spark.sql(s"DROP VIEW IF EXISTS $legacy")
    spark.sql(s"DROP TABLE IF EXISTS $legacy")
    spark.range(2).toDF("n").write.saveAsTable(legacy)
    wh.createOrReplace(legacy, spark.range(4).toDF("n"))
    assert(spark.table(legacy).count() == 4)
    assert(isView(legacy))
    wh.drop(legacy)
    wh.drop(name)
    assert(SessionCatalogWarehouse.generations(spark, name).isEmpty,
      "drop must reap generations")
  }
}
