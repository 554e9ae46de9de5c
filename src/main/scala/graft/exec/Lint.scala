package graft.exec

import org.apache.spark.sql.SparkSession
import graft.model._

/** Validation rules (reference pkg/lint/list.go:32-371, rules.go — the
  * high-value subset) + analyze-only dry-run (pkg/query/dryrun.go).
  */
object Lint {

  final case class Issue(rule: String, asset: String, message: String)

  private val ValidName = """^[a-zA-Z0-9_\-\.]+$""".r
  private val KnownChecks = Set("not_null", "unique", "positive", "non_negative",
    "negative", "min", "max", "accepted_values", "pattern")

  def validate(pipeline: Pipeline): Seq[Issue] = {
    val issues = scala.collection.mutable.ArrayBuffer[Issue]()
    val names = pipeline.assets.map(_.name)

    // duplicate asset names
    names.groupBy(identity).filter(_._2.size > 1).keys.foreach { n =>
      issues += Issue("asset-name-unique", n, s"asset '$n' defined more than once")
    }
    val nameSet = names.toSet

    pipeline.assets.foreach { a =>
      if (ValidName.findFirstIn(a.name).isEmpty)
        issues += Issue("task-name-valid", a.name, s"invalid asset name '${a.name}'")

      // dependency-exists (uri/symbolic upstreams are external by design)
      a.upstreams.filter(u => u.typ == "asset" && !u.isSymbolic).foreach { u =>
        if (!nameSet.contains(u.value))
          issues += Issue("dependency-exists", a.name, s"upstream '${u.value}' is not in the pipeline")
      }

      // duplicate column names
      a.columns.groupBy(_.name).filter(_._2.size > 1).keys.foreach { c =>
        issues += Issue("duplicate-column-names", a.name, s"column '$c' declared twice")
      }

      // materialization-config
      val mat = a.materialization
      mat.strategy.foreach {
        case Strategy.DeleteInsert | Strategy.TimeInterval if mat.incrementalKey.isEmpty =>
          issues += Issue("materialization-config", a.name,
            s"strategy ${mat.strategy.get.name} requires incremental_key")
        case Strategy.Merge | Strategy.SCD2ByColumn if a.primaryKeys.isEmpty =>
          issues += Issue("materialization-config", a.name,
            s"strategy ${mat.strategy.get.name} requires primary_key columns")
        case Strategy.SCD2ByTime if a.primaryKeys.isEmpty || mat.incrementalKey.isEmpty =>
          issues += Issue("materialization-config", a.name,
            "scd2_by_time requires primary_key columns and incremental_key")
        case Strategy.DDL if a.columns.isEmpty =>
          issues += Issue("materialization-config", a.name, "ddl strategy requires declared columns")
        case _ => ()
      }
      if (mat.strategy.nonEmpty && mat.typ != MaterializationType.Table)
        issues += Issue("materialization-config", a.name,
          "strategy requires materialization type: table")

      // check validity
      a.columns.foreach { c =>
        c.checks.foreach { ck =>
          if (!KnownChecks.contains(ck.name))
            issues += Issue("check-valid", a.name, s"unknown check '${ck.name}' on ${c.name}")
          if (Set("min", "max", "accepted_values", "pattern")(ck.name) && ck.value.isEmpty)
            issues += Issue("check-valid", a.name, s"check '${ck.name}' on ${c.name} needs a value")
        }
      }

      // seed config
      if (a.assetType == AssetType.Seed && !a.parameters.contains("path"))
        issues += Issue("valid-seed", a.name, "seed asset requires parameters.path")
    }

    // acyclic-pipeline
    issues ++= findCycle(pipeline).map(c =>
      Issue("acyclic-pipeline", c.head, s"dependency cycle: ${c.mkString(" -> ")}"))

    issues.toSeq
  }

  private def findCycle(pipeline: Pipeline): Option[Seq[String]] = {
    val names = pipeline.assets.map(_.name).toSet
    val edges = pipeline.assets.map(a => a.name -> a.dependsOn.filter(names)).toMap
    val color = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val stack = scala.collection.mutable.ArrayBuffer[String]()
    def dfs(n: String): Option[Seq[String]] = {
      color(n) = 1; stack += n
      val hit = edges.getOrElse(n, Nil).view.flatMap { m =>
        if (color(m) == 1) Some(stack.dropWhile(_ != m).toSeq :+ m)
        else if (color(m) == 0) dfs(m)
        else scala.None
      }.headOption
      color(n) = 2; stack.remove(stack.length - 1)
      hit
    }
    pipeline.assets.view.flatMap(a => if (color(a.name) == 0) dfs(a.name) else scala.None).headOption
  }

  /** Dry-run: analyze the rendered query without executing (Catalyst resolves
    * tables/columns/types — the Spark analogue of EXPLAIN-based validation). */
  def dryRun(spark: SparkSession, sql: String): Either[String, Unit] =
    try { spark.sql(sql).queryExecution.analyzed; Right(()) }
    catch { case e: Throwable => Left(e.getMessage) }
}
