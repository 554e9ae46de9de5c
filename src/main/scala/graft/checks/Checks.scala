package graft.checks

import org.apache.spark.sql.SparkSession
import graft.model.{CheckValue, ColumnCheck, CustomCheck}

/** Quality checks compiled to assertion SQL (reference pkg/ansisql/checks.go —
  * CountableQueryCheck :33-114; duckdb extras pkg/duckdb/checks.go).
  *
  * Every column check renders to a scalar query whose result is compared to an
  * expected value (0 violations unless stated). The generated SQL is plain
  * aggregation — on a cluster each check is one scan (or less: Catalyst
  * merges them when batched via [[batchSql]] into a single pass).
  */
object Checks {

  final case class CheckResult(
      check: String, table: String, column: String,
      expected: Long, actual: Long) {
    def passed: Boolean = expected == actual
  }

  /** The violation-count expression for a column check (counted over `table`). */
  def violationExpr(column: String, check: ColumnCheck): String = check.name match {
    case "not_null"     => s"count(CASE WHEN $column IS NULL THEN 1 END)"
    case "unique"       => s"count($column) - count(DISTINCT $column)"
    case "positive"     => s"count(CASE WHEN $column <= 0 THEN 1 END)"
    case "non_negative" => s"count(CASE WHEN $column < 0 THEN 1 END)"
    case "negative"     => s"count(CASE WHEN $column >= 0 THEN 1 END)"
    case "min" =>
      val v = sqlValue(check, "min")
      s"count(CASE WHEN $column < $v THEN 1 END)"
    case "max" =>
      val v = sqlValue(check, "max")
      s"count(CASE WHEN $column > $v THEN 1 END)"
    case "accepted_values" =>
      val v = sqlValue(check, "accepted_values")
      s"count(CASE WHEN CAST($column AS STRING) NOT IN $v THEN 1 END)"
    case "pattern" =>
      val v = sqlValue(check, "pattern")
      s"count(CASE WHEN NOT ($column RLIKE $v) THEN 1 END)"
    case other => throw new IllegalArgumentException(s"unknown check: $other")
  }

  def buildSql(table: String, column: String, check: ColumnCheck): String =
    s"SELECT ${violationExpr(column, check)} AS violations FROM $table"

  /** Check-annotation comment prepended to generated assertion SQL so
    * warehouse query logs attribute the scan (reference
    * ansisql/checks.go:57-62 + pkg/query/logging.go). */
  def annotation(pipeline: String, asset: String, column: String, check: String): String = {
    import graft.model.JsonDump.q
    // names are user input — escape so a quote/backslash can't break the JSON
    s"""-- graft.check: {"pipeline": ${q(pipeline)}, "asset": ${q(asset)}, "column": ${q(column)}, "check": ${q(check)}}"""
  }

  /** One scan for many checks: SELECT c1, c2, … FROM table. */
  def batchSql(table: String, checks: Seq[(String, ColumnCheck)]): String = {
    val exprs = checks.zipWithIndex.map { case ((col, ck), i) =>
      s"${violationExpr(col, ck)} AS v$i"
    }
    s"SELECT ${exprs.mkString(", ")} FROM $table"
  }

  def run(spark: SparkSession, table: String, column: String, check: ColumnCheck,
          annotationComment: String = ""): CheckResult = {
    val sql = (if (annotationComment.nonEmpty) annotationComment + "\n" else "") +
      buildSql(table, column, check)
    val actual = spark.sql(sql).head().getLong(0)
    CheckResult(check.name, table, column, expected = 0, actual = actual)
  }

  /** Custom check: arbitrary SQL; either `value` compares against the scalar
    * result, or `count` against SELECT count(*) of the wrapped query
    * (reference ansisql/checks.go:283-315). */
  def runCustom(spark: SparkSession, check: CustomCheck): CheckResult = {
    check.count match {
      case Some(expectedCount) =>
        val actual = spark.sql(s"SELECT count(*) FROM (${check.query.stripSuffix(";")}) t").head().getLong(0)
        CheckResult(s"custom:${check.name}", "", "", expectedCount, actual)
      case scala.None =>
        val expected = check.value.getOrElse(0L)
        val actual = toLongScalar(spark.sql(check.query).head().get(0))
        CheckResult(s"custom:${check.name}", "", "", expected, actual)
    }
  }

  /** Coerce a custom-check scalar to the comparison domain. Booleans map to
    * 1/0 — the reference's own starter template asserts
    * `SELECT count(*) > 1 …` against `value: 1` (templates/default). */
  private def toLongScalar(raw: Any): Long = raw match {
    case l: Long => l
    case i: Int => i.toLong
    case b: Boolean => if (b) 1L else 0L
    case d: java.math.BigDecimal => d.longValue
    case d: Double => d.toLong
    case other => String.valueOf(other).toDouble.toLong
  }

  /** Custom check with dev-environment table renames applied at the plan
    * level (reference devenv modifier wraps check queries the same way). */
  def runCustom(spark: SparkSession, check: CustomCheck,
                rename: Map[String, String]): CheckResult =
    if (rename.isEmpty) runCustom(spark, check)
    else {
      val df = org.apache.spark.sql.graft.SqlBridge.renameTablesSql(
        spark, check.query.stripSuffix(";"), rename)
      check.count match {
        case Some(expectedCount) =>
          CheckResult(s"custom:${check.name}", "", "", expectedCount, df.count())
        case scala.None =>
          CheckResult(s"custom:${check.name}", "", "",
            check.value.getOrElse(0L), toLongScalar(df.head().get(0)))
      }
    }

  private def sqlValue(check: ColumnCheck, name: String): String =
    CheckValue.toSql(check.value.getOrElse(
      throw new IllegalArgumentException(s"check $name needs a value")))
}
