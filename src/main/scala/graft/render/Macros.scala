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

  /** Spark-SQL text of the engine's text normalization
    * ([[graft.ops.TextAnalysis.normText]]): lowercase, collapse whitespace,
    * trim — the shared preamble of every content-keyed data op, emitted so
    * macro SQL and the Scala operators hash identical strings. */
  private def normSql(textCol: String): String =
    s"trim(regexp_replace(lower($textCol), '\\\\s+', ' '))"

  /** Spark-SQL text of the engine's portable md5 percent bucket
    * ([[graft.ops.Sampling.hashBucket]]) — deterministic on any engine. */
  private def hashBucketSql(idCol: String): String =
    s"cast(conv(substring(md5(cast($idCol as string)), 1, 8), 16, 10) as bigint) % 100"

  /** EXACT-DEDUP summary over a relation — the asset-surface face of
    * [[graft.ops.Dedup.exact]]: one row per normalized-content hash with
    * the kept (smallest) id and the copy count. One map-side-combinable
    * GROUP BY; scale notes identical to the operator. */
  def dedupExact(relation: String, idCol: String = "doc_id",
                 textCol: String = "text"): String =
    s"""select
       |        md5(${normSql(textCol)}) as content_hash,
       |        min($idCol) as keep_id,
       |        count(*) as n_docs
       |    from $relation
       |    group by 1""".stripMargin

  /** DETERMINISTIC train/valid/test split — the asset-surface face of
    * [[graft.ops.Sampling.split]]: every row tagged by its portable md5
    * bucket, so the split is stable across runs, engines, and re-shuffles
    * of the input (the contamination-safety property a random() split
    * loses). Pure projection: no shuffle, runs at scan speed. */
  def stratifiedSplit(relation: String, idCol: String = "doc_id",
                      trainPct: Int = 80, validPct: Int = 10): String = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"split percentages must be sane: train=$trainPct valid=$validPct")
    val b = hashBucketSql(idCol)
    s"""select
       |        _inner.*,
       |        case when $b < $trainPct then 'train'
       |             when $b < ${trainPct + validPct} then 'valid'
       |             else 'test'
       |        end as split
       |    from $relation as _inner""".stripMargin
  }

  /** TRAINING-WINDOW CHUNKING — the asset-surface face of
    * [[graft.ops.TextAnalysis.chunk]]: fixed token windows advancing by
    * (chunk − overlap), short tail kept, empty texts dropped. The explode
    * is a per-document Generate — no shuffle anywhere. */
  def tokenChunk(relation: String, idCol: String = "doc_id",
                 textCol: String = "text",
                 chunkTokens: Int = 128, overlapTokens: Int = 16): String = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0,
      s"chunk_tokens ($chunkTokens) must exceed overlap_tokens ($overlapTokens)")
    val step = chunkTokens - overlapTokens
    s"""select
       |        $idCol,
       |        cast(__pos as int) as chunk_id,
       |        concat_ws(' ', __chunk) as chunk_text,
       |        cast(size(__chunk) as bigint) as n_tokens
       |    from (
       |        select $idCol, split(${normSql(textCol)}, ' ') as __ws
       |        from $relation
       |    ) __tokenized
       |    lateral view posexplode(transform(
       |        sequence(0, size(__ws) - 1, $step),
       |        s -> slice(__ws, s + 1, $chunkTokens))) __t as __pos, __chunk
       |    where concat_ws('', __ws) != ''""".stripMargin
  }

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
    "dedup_exact" -> ((a, kw) => dedupExact(s(a(0)),
      idCol = kw.get("id_col").map(s).getOrElse(if (a.length > 1) s(a(1)) else "doc_id"),
      textCol = kw.get("text_col").map(s).getOrElse(if (a.length > 2) s(a(2)) else "text"))),
    "stratified_split" -> ((a, kw) => stratifiedSplit(s(a(0)),
      idCol = kw.get("id_col").map(s).getOrElse(if (a.length > 1) s(a(1)) else "doc_id"),
      trainPct = kw.get("train_pct").map(s(_).toDouble.toInt)
        .getOrElse(if (a.length > 2) s(a(2)).toDouble.toInt else 80),
      validPct = kw.get("valid_pct").map(s(_).toDouble.toInt)
        .getOrElse(if (a.length > 3) s(a(3)).toDouble.toInt else 10))),
    "token_chunk" -> ((a, kw) => tokenChunk(s(a(0)),
      idCol = kw.get("id_col").map(s).getOrElse(if (a.length > 1) s(a(1)) else "doc_id"),
      textCol = kw.get("text_col").map(s).getOrElse(if (a.length > 2) s(a(2)) else "text"),
      chunkTokens = kw.get("chunk_tokens").map(s(_).toDouble.toInt)
        .getOrElse(if (a.length > 3) s(a(3)).toDouble.toInt else 128),
      overlapTokens = kw.get("overlap_tokens").map(s(_).toDouble.toInt)
        .getOrElse(if (a.length > 4) s(a(4)).toDouble.toInt else 16))),
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
