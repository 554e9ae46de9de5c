package graft.render

/** Spark-dialect builtin SQL-generating macros.
  *
  * Semantics mirror the reference's jinja builtins
  * (pkg/jinja/bruin_funcs.go:82-101 registry; platform-independent bodies
  * :560-818), emitted in Spark SQL. The reference already ships a Spark
  * date_spine variant (bruin_funcs.go SparkDateSpine) — ours matches that
  * sequence()+explode shape.
  */
object Macros {

  type Fn = (Seq[Any], Map[String, Any]) => String

  private def str(v: Any): String = String.valueOf(v)
  private def strs(args: Seq[Any]): Seq[String] = args.map(str)

  val SurrogateKeyNull = "_bruin_surrogate_key_null_"

  /** group_by(n) → "group by 1, …, n" (bruin_funcs.go bruinGroupBy). */
  def groupBy(n: Int): String = "group by " + (1 to n).mkString(", ")

  def safeDivide(num: String, den: String): String = s"($num) / nullif(($den), 0)"

  def safeArithmetic(fields: Seq[String], op: String): String =
    fields.map(f => s"coalesce($f, 0)").mkString(s" $op\n    ")

  /** md5 over '-'-joined null-preserving casts (SurrogateKeyWith default). */
  def generateSurrogateKey(fields: Seq[String]): String = {
    if (fields.isEmpty) return ""
    val parts = fields.map(f => s"coalesce(cast($f as string), '$SurrogateKeyNull')")
    val concat = if (parts.size == 1) parts.head
      else s"concat(${parts.mkString(", '-', ")})"
    s"md5($concat)"
  }

  /** Conditional-aggregation pivot columns (bruinPivot), backtick-quoted for Spark. */
  def pivot(column: String, values: Seq[String],
            agg: String = "sum", cmp: String = "=", prefix: String = "",
            suffix: String = "", thenValue: String = "1", elseValue: String = "0",
            alias: Boolean = true, distinct: Boolean = false): String =
    values.map { value =>
      val escaped = value.replace("'", "''")
      val d = if (distinct) "distinct " else ""
      val expr = s"$agg(\n        ${d}case\n        when $column $cmp '$escaped'\n            then $thenValue\n        else $elseValue\n        end\n    )"
      if (alias) expr + s"\n        as `$prefix$value$suffix`" else expr
    }.mkString(",\n    ")

  def degreesToRadians(degrees: String): String = s"acos(-1) * $degrees / 180"

  /** Haversine with the reference's 2*3961*asin(√…) form and radians(). */
  def haversineDistance(lat1: String, lon1: String, lat2: String, lon2: String,
                        unit: String = "mi"): String = {
    val conversion = unit match {
      case "mi" => "1"
      case "km" => "1.60934"
      case other => throw new IllegalArgumentException(s"haversine_distance unit must be 'mi' or 'km', got '$other'")
    }
    def radians(e: String) = s"radians($e)"
    s"2 * 3961 * asin(sqrt(power((sin(${radians(s"($lat2 - $lat1) / 2")})), 2) +\n" +
      s"    cos(${radians(lat1)}) * cos(${radians(lat2)}) *\n" +
      s"    power((sin(${radians(s"($lon2 - $lon1) / 2")})), 2))) * $conversion"
  }

  /** Standard width_bucket: floor((v-min)/((max-min)/n))+1 with edge clamps —
    * Spark's native function implements exactly this, so emit it. */
  def widthBucket(expr: String, minV: String, maxV: String, buckets: String): String =
    s"width_bucket($expr, $minV, $maxV, $buckets)"

  /** ROW_NUMBER dedup CTE (bruinDeduplicate) — NATURAL JOIN form. */
  def deduplicate(relation: String, partitionBy: String, orderBy: String): String =
    s"""with row_numbered as (
       |        select
       |            _inner.*,
       |            row_number() over (
       |                partition by $partitionBy
       |                order by $orderBy
       |            ) as __bruin_row_number
       |        from $relation as _inner
       |    )
       |
       |    select
       |        distinct data.*
       |    from $relation as data
       |    natural join row_numbered
       |    where row_numbered.__bruin_row_number = 1""".stripMargin

  /** Integer series 1..n — Spark-native sequence()+explode (the reference's
    * cross-join CTE emulation exists for engines without a generator). */
  def generateSeries(upperBound: Long): String =
    s"select explode(sequence(1, $upperBound)) as generated_number"

  /** date_spine — the reference's own Spark form (SparkDateSpine). */
  def dateSpine(datepart: String, startDate: String, endDate: String): String = {
    val columnName = s"date_$datepart"
    val isTs = Set("hour", "minute", "second", "millisecond", "microsecond")(datepart.toLowerCase)
    val castFn = if (isTs) "to_timestamp" else "to_date"
    val arrayType = if (isTs) "array<timestamp>" else "array<date>"
    val step = datepart.toLowerCase match {
      case "quarter" => "3 month"
      case "week"    => "7 day"
      case dp        => s"1 $dp"
    }
    s"""select explode(
       |    case
       |        when $castFn($startDate) + interval $step <= $castFn($endDate)
       |            then filter(sequence($castFn($startDate), $castFn($endDate), interval $step), x -> x < $castFn($endDate))
       |        else cast(array() as $arrayType)
       |    end
       |) as $columnName""".stripMargin
  }

  /** Identifier slug (bruinSlugify) — string-level, not SQL. */
  def slugify(s0: String): String = {
    if (s0.isEmpty) return ""
    var s = s0.toLowerCase.replaceAll("[ -]+", "_").replaceAll("[^a-z0-9_]+", "")
    if (s.nonEmpty && s.head.isDigit) s = "_" + s
    s
  }

  def getUrlHost(field: String): String =
    s"split_part(split_part(replace(replace(replace($field, 'android-app://', ''), 'http://', ''), 'https://', ''), '/', 1), '?', 1)"

  def getUrlParameter(field: String, param: String): String = {
    val queryPart = s"case when position('?' in $field) > 0 then split_part($field, '?', 2) else $field end"
    val lit = "'&" + param.replace("'", "''") + "='"
    s"nullif(split_part(split_part(concat('&', $queryPart), $lit, 2), '&', 1), '')"
  }

  def getUrlPath(field: String): String = {
    val stripped = s"replace(replace(replace($field, 'android-app://', ''), 'http://', ''), 'https://', '')"
    val parsed = s"case when position('/' in $stripped) > 0 then split_part(right($stripped, length($stripped) - position('/' in $stripped)), '?', 1) else '' end"
    s"cast($parsed as string)"
  }

  // ---- registry for the template engine ----------------------------------

  private def s(a: Any): String = str(a)

  val registry: Map[String, Fn] = Map(
    "group_by" -> ((a, _) => groupBy(s(a.head).toDouble.toInt)),
    "safe_divide" -> ((a, _) => safeDivide(s(a(0)), s(a(1)))),
    "safe_add" -> ((a, _) => safeArithmetic(strs(a), "+")),
    "safe_subtract" -> ((a, _) => safeArithmetic(strs(a), "-")),
    "generate_surrogate_key" -> ((a, _) => generateSurrogateKey(flatten(a))),
    "pivot" -> ((a, kw) => pivot(s(a(0)), flatten(a.drop(1).take(1)),
      agg = kw.get("agg").map(s).getOrElse("sum"),
      cmp = kw.get("cmp").map(s).getOrElse("="),
      prefix = kw.get("prefix").map(s).getOrElse(""),
      suffix = kw.get("suffix").map(s).getOrElse(""),
      thenValue = kw.get("then_value").map(s).getOrElse("1"),
      elseValue = kw.get("else_value").map(s).getOrElse("0"),
      alias = kw.get("alias").forall(_ == true),
      distinct = kw.get("distinct").contains(true))),
    "haversine_distance" -> ((a, kw) => haversineDistance(s(a(0)), s(a(1)), s(a(2)), s(a(3)),
      unit = kw.get("unit").map(s).getOrElse(if (a.length > 4) s(a(4)) else "mi"))),
    "degrees_to_radians" -> ((a, _) => degreesToRadians(s(a.head))),
    "width_bucket" -> ((a, _) => widthBucket(s(a(0)), s(a(1)), s(a(2)), s(a(3)))),
    "deduplicate" -> ((a, _) => deduplicate(s(a(0)), s(a(1)), s(a(2)))),
    "generate_series" -> ((a, _) => generateSeries(s(a.head).toDouble.toLong)),
    "date_spine" -> ((a, _) => dateSpine(s(a(0)), s(a(1)), s(a(2)))),
    "slugify" -> ((a, _) => slugify(s(a.head))),
    "get_url_host" -> ((a, _) => getUrlHost(s(a.head))),
    "get_url_parameter" -> ((a, _) => getUrlParameter(s(a(0)), s(a(1)))),
    "get_url_path" -> ((a, _) => getUrlPath(s(a.head))))

  private def flatten(args: Seq[Any]): Seq[String] = args.flatMap {
    case xs: Seq[_] => xs.map(str)
    case v => Seq(str(v))
  }
}
