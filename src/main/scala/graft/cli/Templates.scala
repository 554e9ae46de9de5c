package graft.cli

/** Embedded project templates for `graft init` (reference `templates/`
  * embed.FS + cmd/init.go:205-343). The reference ships 30+ warehouse-
  * specific scaffolds; Spark IS the warehouse here, so the set collapses to
  * the shapes that differ structurally: an empty skeleton, the default
  * seed→SQL→Python starter (reference templates/default), and a richer demo
  * with variables, macros and quality checks.
  *
  * Each template is a list of (relative path, content) pairs written
  * verbatim; every scaffold must `graft run` green out of the box — that is
  * spec-enforced (EngineSpec "init scaffolds run green").
  */
object Templates {

  val DefaultFolderName = "graft-pipeline"

  private val graftYml =
    """default_environment: default
      |environments:
      |  default:
      |    connections: {}
      |""".stripMargin

  private val emptyTemplate = Seq(
    "pipeline.yml" ->
      """name: my-pipeline
        |
        |# schedule: daily
        |# start_date: "2024-01-01"
        |
        |# variables:
        |#   min_price: 100
        |
        |# retries: 3
        |# concurrency: 1
        |""".stripMargin,
    ".graft.yml" -> graftYml,
    "assets/.gitkeep" -> "")

  private val defaultTemplate = Seq(
    "pipeline.yml" ->
      """name: graft-init
        |schedule: daily
        |start_date: "2024-01-01"
        |""".stripMargin,
    ".graft.yml" -> graftYml,
    "seed/players.csv" ->
      """name,rating,country
        |Magnus,2830,NO
        |Hikaru,2780,US
        |Fabiano,2790,US
        |Alireza,2760,FR
        |Magnus,2830,NO
        |""".stripMargin,
    "assets/players.asset.yml" ->
      """name: dataset.players
        |type: seed
        |parameters:
        |  path: ./seed/players.csv
        |columns:
        |  - name: name
        |    type: STRING
        |    checks: [not_null]
        |  - name: rating
        |    type: INT
        |    checks: [positive]
        |""".stripMargin,
    "assets/player_stats.sql" ->
      """/* @bruin
        |
        |name: dataset.player_stats
        |type: spark.sql
        |
        |depends:
        |  - dataset.players
        |
        |materialization:
        |  type: table
        |  strategy: create+replace
        |
        |columns:
        |  - name: name
        |    type: STRING
        |    description: player name
        |    checks: [not_null, unique]
        |  - name: player_count
        |    type: BIGINT
        |    description: number of rows with the given name
        |    checks: [not_null, positive]
        |
        |custom_checks:
        |  - name: table is not empty
        |    query: SELECT count(*) > 1 FROM dataset.player_stats
        |    value: 1
        |
        |@bruin */
        |
        |SELECT name, count(*) AS player_count
        |FROM dataset.players
        |GROUP BY 1
        |""".stripMargin,
    "assets/my_python_asset.py" ->
      Seq("\"\"\" @bruin", "name: my_python_asset", "@bruin \"\"\"", "",
        "print(\"hello world\")", "").mkString("\n"),
    "README.md" ->
      """# graft starter pipeline
        |
        |Run it:
        |
        |    graft run .
        |
        |Render an asset's SQL program:
        |
        |    graft render . dataset.player_stats
        |
        |Lint, test, docs:
        |
        |    graft lint .
        |    graft unit-test .
        |    graft docs .
        |""".stripMargin)

  private val demoTemplate = Seq(
    "pipeline.yml" ->
      """name: demo
        |schedule: daily
        |start_date: "2024-01-01"
        |concurrency: 4
        |variables:
        |  min_price: 300
        |""".stripMargin,
    ".graft.yml" -> graftYml,
    "macros/price_filter.sql" ->
      """{% macro price_filter(col, min_value) -%}
        |{{ col }} >= {{ min_value }}
        |{%- endmacro %}
        |""".stripMargin,
    "seed_products.csv" ->
      """product_id,name,price,stock
        |1,Widget,499.99,10
        |2,Gadget,899.0,4
        |3,Trinket,49.5,100
        |""".stripMargin,
    "assets/raw_products.asset.yml" ->
      """name: raw_products
        |type: seed
        |parameters:
        |  path: ./seed_products.csv
        |columns:
        |  - name: product_id
        |    type: INT
        |    primary_key: true
        |    checks: [not_null, unique, positive]
        |  - name: name
        |    type: STRING
        |    checks: [not_null]
        |  - name: price
        |    type: DOUBLE
        |  - name: stock
        |    type: INT
        |""".stripMargin,
    "assets/expensive_products.sql" ->
      """/* @bruin
        |name: expensive_products
        |type: spark.sql
        |depends:
        |  - raw_products
        |materialization:
        |  type: table
        |  strategy: create+replace
        |columns:
        |  - name: product_id
        |    type: INT
        |    checks: [not_null]
        |  - name: price
        |    type: DOUBLE
        |    checks:
        |      - name: min
        |        value: 300
        |@bruin */
        |SELECT product_id, name, price
        |FROM raw_products
        |WHERE {{ price_filter('price', var.min_price) }}
        |""".stripMargin,
    "assets/product_summary.sql" ->
      """/* @bruin
        |name: product_summary
        |type: spark.sql
        |depends:
        |  - expensive_products
        |materialization:
        |  type: table
        |  strategy: create+replace
        |@bruin */
        |SELECT count(*) AS n_products, min(price) AS min_price
        |FROM expensive_products
        |""".stripMargin)

  val all: Map[String, Seq[(String, String)]] = Map(
    "empty" -> emptyTemplate,
    "default" -> defaultTemplate,
    "demo" -> demoTemplate)

  def names: Seq[String] = all.keys.toSeq.sorted
}
