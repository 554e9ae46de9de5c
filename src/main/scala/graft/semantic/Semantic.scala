package graft.semantic

/** Semantic layer: dimensions/metrics/windows/filters/segments compiled to
  * SQL (reference semantic-engine/: model.go:4-110; engine.go GenerateSQL
  * :251-283, generateSimple :345-424, generateWrapped :426-493, windowSQL
  * :526-566). The generated SQL is dialect-portable (ordinal GROUP BY,
  * standard window functions) and executed by Spark SQL.
  */
object Semantic {

  final case class Dimension(name: String, expr: String)

  /** Window metric spec: running_total | lag | lead | rank | percent_of_total. */
  final case class WindowSpec(typ: String, orderBy: String,
                              partitionBy: Seq[String] = Nil, offset: Int = 0)

  /** `expression` is an aggregate ("SUM(x)") or a derived expr over metric
    * refs ("{revenue} / {orders}"). `filter` restricts the aggregate's input. */
  final case class Metric(name: String, expression: String,
                          filter: Option[String] = None,
                          window: Option[WindowSpec] = None)

  final case class Model(
      table: String,
      dimensions: Seq[Dimension],
      metrics: Seq[Metric],
      segments: Map[String, String] = Map.empty) {
    def dimension(name: String): Dimension =
      dimensions.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"unknown dimension: $name"))
    def metric(name: String): Metric =
      metrics.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"unknown metric: $name"))
  }

  /** Filter ops (reference model.go:90). */
  final case class Filter(field: String, op: String, values: Seq[String] = Nil)

  final case class Query(
      dimensions: Seq[String] = Nil,
      metrics: Seq[String] = Nil,
      filters: Seq[Filter] = Nil,
      segments: Seq[String] = Nil,
      sort: Seq[(String, String)] = Nil, // (field, asc|desc)
      limit: Option[Int] = None)

  private val RefPattern = """\{([a-zA-Z0-9_]+)\}""".r

  def isDerived(m: Metric): Boolean = RefPattern.findFirstIn(m.expression).nonEmpty

  def generateSql(model: Model, q: Query): String = {
    validate(model, q)
    if (needsWindowWrap(model, q.metrics)) generateWrapped(model, q)
    else generateSimple(model, q)
  }

  def validate(model: Model, q: Query): Unit = {
    q.dimensions.foreach(model.dimension)
    q.metrics.foreach(n => expandRefs(model, model.metric(n).expression, Set(n)))
    q.segments.foreach(s => require(model.segments.contains(s), s"unknown segment: $s"))
    q.filters.foreach { f =>
      require(Set("equals", "not_equals", "gt", "gte", "lt", "lte", "in",
        "not_in", "between", "is_null", "is_not_null")(f.op), s"unknown operator: ${f.op}")
    }
  }

  private def needsWindowWrap(model: Model, names: Seq[String]): Boolean =
    names.exists { n =>
      val m = model.metric(n)
      m.window.nonEmpty ||
        (isDerived(m) && RefPattern.findAllMatchIn(m.expression)
          .exists(r => model.metric(r.group(1)).window.nonEmpty))
    }

  /** Cycle-safe {ref} expansion (engine.go expandRefs/expandSimple). */
  private def expandRefs(model: Model, expr: String, visited: Set[String]): String =
    RefPattern.replaceAllIn(expr, rm => {
      val ref = rm.group(1)
      require(!visited(ref), s"circular metric dependency at: $ref")
      val m = model.metric(ref)
      val e = expandMetric(model, m, visited + ref)
      java.util.regex.Matcher.quoteReplacement(if (e.exists("+-*/".contains(_))) s"($e)" else e)
    })

  private def expandMetric(model: Model, m: Metric, visited: Set[String]): String = {
    val base =
      if (isDerived(m)) expandRefs(model, m.expression, visited)
      else m.expression
    m.filter match {
      case Some(f) if !isDerived(m) => applyMetricFilter(base, f)
      case _ => base
    }
  }

  /** SUM(x) + filter f → SUM(CASE WHEN f THEN x END) (engine.go:605+). */
  def applyMetricFilter(expr: String, filter: String): String = {
    val t = expr.trim
    val open = t.indexOf('(')
    if (open < 0) return t
    val close = t.lastIndexOf(')')
    val fn = t.substring(0, open).trim
    val arg = t.substring(open + 1, close).trim
    s"$fn(CASE WHEN $filter THEN $arg END)"
  }

  private def filterSql(model: Model, f: Filter, metricNames: Set[String]): (String, Boolean) = {
    val isMetric = metricNames.contains(f.field)
    val lhs =
      if (isMetric) expandMetric(model, model.metric(f.field), Set(f.field))
      else model.dimension(f.field).expr
    def v(i: Int) = quote(f.values(i))
    val cond = f.op match {
      case "equals"      => s"$lhs = ${v(0)}"
      case "not_equals"  => s"$lhs <> ${v(0)}"
      case "gt"          => s"$lhs > ${v(0)}"
      case "gte"         => s"$lhs >= ${v(0)}"
      case "lt"          => s"$lhs < ${v(0)}"
      case "lte"         => s"$lhs <= ${v(0)}"
      case "in"          => s"$lhs IN (${f.values.map(quote).mkString(", ")})"
      case "not_in"      => s"$lhs NOT IN (${f.values.map(quote).mkString(", ")})"
      case "between"     => s"$lhs BETWEEN ${v(0)} AND ${v(1)}"
      case "is_null"     => s"$lhs IS NULL"
      case "is_not_null" => s"$lhs IS NOT NULL"
    }
    (cond, isMetric)
  }

  private def quote(v: String): String =
    if (v.matches("-?\\d+(\\.\\d+)?") || v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")) v
    else "'" + v.replace("'", "''") + "'"

  private def whereHaving(model: Model, q: Query): (String, String) = {
    val metricNames = model.metrics.map(_.name).toSet
    val (having, where) = q.filters.map(f => filterSql(model, f, metricNames)).partition(_._2)
    val segs = q.segments.map(model.segments)
    val whereAll = where.map(_._1) ++ segs
    (whereAll.mkString(" AND "), having.map(_._1).mkString(" AND "))
  }

  private def orderAndLimit(q: Query, qualify: Boolean): String = {
    val sort =
      if (q.sort.isEmpty) ""
      else " ORDER BY " + q.sort.map { case (f, dir) =>
        s"${if (qualify) "" else ""}$f ${dir.toUpperCase}"
      }.mkString(", ")
    sort + q.limit.map(l => s" LIMIT $l").getOrElse("")
  }

  private def generateSimple(model: Model, q: Query): String = {
    val dimSel = q.dimensions.map(d => s"${model.dimension(d).expr} AS $d")
    val metSel = q.metrics.map(n => s"${expandMetric(model, model.metric(n), Set(n))} AS $n")
    val (where, having) = whereHaving(model, q)
    val sb = new StringBuilder(s"SELECT ${(dimSel ++ metSel).mkString(", ")} FROM ${model.table}")
    if (where.nonEmpty) sb.append(s" WHERE $where")
    if (q.dimensions.nonEmpty) sb.append(" GROUP BY " + (1 to q.dimensions.size).mkString(", "))
    if (having.nonEmpty) sb.append(s" HAVING $having")
    sb.append(orderAndLimit(q, qualify = false))
    sb.toString
  }

  /** Window path: inner aggregate (base metrics), outer window functions
    * (engine.go:426-493 + windowSQL :526-566). */
  private def generateWrapped(model: Model, q: Query): String = {
    val innerMetrics = q.metrics.flatMap { n =>
      val m = model.metric(n)
      if (m.window.nonEmpty) RefPattern.findAllMatchIn(m.expression).map(_.group(1)).toSeq
      else Seq(n)
    }.distinct
    val dimSel = q.dimensions.map(d => s"${model.dimension(d).expr} AS $d")
    val metSel = innerMetrics.map(n => s"${expandMetric(model, model.metric(n), Set(n))} AS $n")
    val (where, having) = whereHaving(model, q)
    val inner = new StringBuilder(s"SELECT ${(dimSel ++ metSel).mkString(", ")} FROM ${model.table}")
    if (where.nonEmpty) inner.append(s" WHERE $where")
    if (q.dimensions.nonEmpty) inner.append(" GROUP BY " + (1 to q.dimensions.size).mkString(", "))
    if (having.nonEmpty) inner.append(s" HAVING $having")

    val outerSel = q.dimensions.map(d => s"base.$d") ++ q.metrics.map { n =>
      val m = model.metric(n)
      (if (m.window.nonEmpty) windowSql(m) else s"base.$n") + s" AS $n"
    }
    s"SELECT ${outerSel.mkString(", ")} FROM (${inner.toString}) base" + orderAndLimit(q, qualify = true)
  }

  def windowSql(m: Metric): String = {
    val w = m.window.get
    val ref = RefPattern.findFirstMatchIn(m.expression).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"window metric ${m.name} needs a {ref}"))
    val part = if (w.partitionBy.nonEmpty)
      "PARTITION BY " + w.partitionBy.map("base." + _).mkString(", ") + " " else ""
    val orderBy = s"base.${w.orderBy}"
    w.typ match {
      case "running_total" =>
        s"SUM(base.$ref) OVER (${part}ORDER BY $orderBy ROWS UNBOUNDED PRECEDING)"
      case "lag" => s"LAG(base.$ref, ${math.max(1, w.offset)}) OVER (${part}ORDER BY $orderBy)"
      case "lead" => s"LEAD(base.$ref, ${math.max(1, w.offset)}) OVER (${part}ORDER BY $orderBy)"
      case "rank" => s"RANK() OVER (${part}ORDER BY $orderBy)"
      case "percent_of_total" =>
        s"base.$ref / NULLIF(SUM(base.$ref) OVER (${part.trim}), 0)"
      case other => throw new IllegalArgumentException(s"unknown window type: $other")
    }
  }
}
