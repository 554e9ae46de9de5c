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
}
