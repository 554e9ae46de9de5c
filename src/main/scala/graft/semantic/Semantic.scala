package graft.semantic

/** Semantic layer: dimensions/metrics/windows/filters/segments compiled to
  * SQL (reference semantic-engine/: model.go:4-110; engine.go GenerateSQL
  * :251-283, generateSimple :345-424, generateWrapped :426-493, windowSQL
  * :526-566). The generated SQL is dialect-portable (ordinal GROUP BY,
  * standard window functions) and executed by Spark SQL.
  */
object Semantic {

  final case class Dimension(name: String, expr: String)

  /** Join to another model (reference model.go:22-29). Only `one_to_one` /
    * `many_to_one` relationships are traversable for dimensions — a
    * one_to_many/many_to_many join would fan out the base grain and corrupt
    * every aggregate, so the engine refuses them (reference
    * graph.go:381-399 safeEdgesFrom / isSafeRelationship). */
  final case class Join(
      name: String,
      relationship: String,
      foreignKey: String,
      model: String = "",       // defaults to `name`
      targetKey: String = "") { // defaults to the target model's primary_key
    def modelName: String = if (model.nonEmpty) model else name
  }

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
      segments: Map[String, String] = Map.empty,
      name: String = "",
      primaryKey: String = "",
      joins: Seq[Join] = Nil) {
    def dimension(name: String): Dimension =
      dimensions.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"unknown dimension: $name"))
    def metric(name: String): Metric =
      metrics.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"unknown metric: $name"))
    def join(name: String): Join =
      joins.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"unknown join: $name"))
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

  /** Load a semantic model (and optional joined models) from YAML —
    * the reference's model.yaml surface (semantic-engine/model.go). */
  def parseModel(text: String): (Model, Map[String, Model]) = {
    import scala.jdk.CollectionConverters._
    def asMap(v: Any): Map[String, Any] = graft.model.YamlUtil.asMap(v)
    def seqOf(m: Map[String, Any], k: String): Seq[Map[String, Any]] = m.get(k) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(asMap)
      case _ => Nil
    }
    def str(m: Map[String, Any], k: String): String =
      m.get(k).map(String.valueOf).getOrElse("")
    def parseOne(m: Map[String, Any]): Model = Model(
      table = str(m, "table"),
      name = str(m, "name"),
      primaryKey = str(m, "primary_key"),
      dimensions = seqOf(m, "dimensions").map(d =>
        Dimension(str(d, "name"), if (str(d, "expression").nonEmpty) str(d, "expression") else str(d, "name"))),
      metrics = seqOf(m, "metrics").map { mm =>
        val w = Option(mm.getOrElse("window", null)).map(asMap).map(wm =>
          WindowSpec(str(wm, "type"), str(wm, "order_by"),
            wm.get("partition_by") match {
              case Some(l: java.util.List[_]) => l.asScala.toSeq.map(String.valueOf(_))
              case _ => Nil
            },
            mm.get("offset").map(String.valueOf(_).toInt).getOrElse(0)))
        Metric(str(mm, "name"), str(mm, "expression"),
          filter = Some(str(mm, "filter")).filter(_.nonEmpty), window = w)
      },
      segments = seqOf(m, "segments").map(s0 => str(s0, "name") -> str(s0, "filter")).toMap,
      joins = seqOf(m, "joins").map(j => Join(str(j, "name"), str(j, "relationship"),
        foreignKey = str(j, "foreign_key"), model = str(j, "model"),
        targetKey = str(j, "target_key"))))
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))
    val main = parseOne(root)
    val others = seqOf(root, "models").map(parseOne).map(m => m.name -> m).toMap
    (main, others)
  }

  private val RefPattern = """\{([a-zA-Z0-9_]+)\}""".r

  def isDerived(m: Metric): Boolean = RefPattern.findFirstIn(m.expression).nonEmpty

  def generateSql(model: Model, q: Query, models: Map[String, Model] = Map.empty): String = {
    val plan = new Plan(model, models, q)
    plan.validate()
    if (needsWindowWrap(model, q.metrics)) generateWrapped(plan)
    else generateSimple(plan)
  }

  def validate(model: Model, q: Query, models: Map[String, Model] = Map.empty): Unit =
    new Plan(model, models, q).validate()

  /** Resolved query plan: which joins are used, how refs qualify
    * (reference graph.go planQuery/fromSQL/dimensionSQL). */
  private final class Plan(val model: Model, models: Map[String, Model], val q: Query) {
    private val metricNames = model.metrics.map(_.name).toSet

    /** joins referenced by qualified `rel.dim` fields, in first-use order. */
    val usedJoins: Seq[Join] = {
      val fields = q.dimensions ++
        q.filters.filterNot(f => metricNames(f.field)).map(_.field) ++
        q.sort.map(_._1).filterNot(metricNames)
      fields.filter(_.contains('.')).map(_.takeWhile(_ != '.')).distinct.map(model.join)
    }
    def hasJoins: Boolean = usedJoins.nonEmpty

    def target(j: Join): Model = models.getOrElse(j.modelName,
      throw new IllegalArgumentException(s"join ${j.name}: unknown model '${j.modelName}'"))

    def targetKeyOf(j: Join): String =
      if (j.targetKey.nonEmpty) j.targetKey
      else {
        val pk = target(j).primaryKey
        require(pk.nonEmpty,
          s"join ${j.name} requires target_key or primary_key on model '${j.modelName}'")
        pk
      }

    def validate(): Unit = {
      usedJoins.foreach { j =>
        require(Set("one_to_one", "many_to_one", "one_to_many", "many_to_many")(j.relationship),
          s"join ${j.name}: invalid relationship '${j.relationship}'")
        // fan-out validation: a to-many join multiplies base rows, corrupting
        // every aggregate (reference graph.go isSafeRelationship)
        require(Set("one_to_one", "many_to_one")(j.relationship),
          s"join ${j.name} (${j.relationship}) would fan out the base grain; " +
            "only one_to_one/many_to_one dimensions are queryable")
        require(j.foreignKey.nonEmpty, s"join ${j.name} requires foreign_key")
        targetKeyOf(j)
      }
      q.dimensions.foreach(dimOf)
      q.metrics.foreach(n => expandRefs(model, model.metric(n).expression, Set(n)))
      q.segments.foreach(s => require(model.segments.contains(s), s"unknown segment: $s"))
      q.filters.foreach { f =>
        require(Set("equals", "not_equals", "gt", "gte", "lt", "lte", "in",
          "not_in", "between", "is_null", "is_not_null")(f.op), s"unknown operator: ${f.op}")
        if (!metricNames(f.field)) dimOf(f.field)
      }
    }

    def dimOf(ref: String): Dimension =
      if (ref.contains('.')) {
        val Array(rel, d) = ref.split("\\.", 2)
        target(model.join(rel)).dimension(d)
      } else model.dimension(ref)

    /** output alias: `customers.country` → `customers_country`
      * (reference QueryColumn sanitization, model.go:104-110). */
    def outName(ref: String): String = ref.replace('.', '_')

    def dimExpr(ref: String): String =
      if (ref.contains('.')) {
        val Array(rel, _) = ref.split("\\.", 2)
        qualify(dimOf(ref).expr, rel)
      } else if (hasJoins) qualify(dimOf(ref).expr, "base")
      else dimOf(ref).expr

    def metricSql(expanded: String): String =
      if (hasJoins) qualify(expanded, "base") else expanded

    def segmentSql(name: String): String =
      if (hasJoins) qualify(model.segments(name), "base") else model.segments(name)

    /** reference graph.go fromSQL:199-216. */
    def fromSql: String =
      if (!hasJoins) s" FROM ${model.table}"
      else s" FROM (SELECT * FROM ${model.table}) base" + usedJoins.map { j =>
        s" LEFT JOIN (SELECT * FROM ${target(j).table}) ${j.name}" +
          s" ON base.${j.foreignKey} = ${j.name}.${targetKeyOf(j)}"
      }.mkString
  }

  private val SqlKeywords: Set[String] = Set(
    "AND", "OR", "NOT", "NULL", "CASE", "WHEN", "THEN", "ELSE", "END", "IS",
    "IN", "LIKE", "BETWEEN", "AS", "TRUE", "FALSE", "DISTINCT", "INTERVAL",
    "ASC", "DESC", "DATE", "TIMESTAMP", "STRING", "INT", "BIGINT", "DOUBLE",
    "DECIMAL", "BOOLEAN", "OVER", "PARTITION", "BY", "ORDER", "ROWS",
    "UNBOUNDED", "PRECEDING", "CURRENT", "ROW", "DAY", "MONTH", "YEAR",
    "HOUR", "MINUTE", "SECOND", "WEEK", "QUARTER")

  /** Prefix bare column identifiers with `alias.` — function names, already-
    * qualified refs, keywords and string literals untouched (reference
    * graph.go qualifySQLIdentifiers + keyword set :528). */
  def qualify(expr: String, alias: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < expr.length) {
      val c = expr.charAt(i)
      if (c == '\'') { // string literal: copy verbatim (''-escaped)
        var j = i + 1
        var closed = false
        while (j < expr.length && !closed) {
          if (expr.charAt(j) == '\'') {
            if (j + 1 < expr.length && expr.charAt(j + 1) == '\'') j += 2 // escaped ''
            else { j += 1; closed = true }
          } else j += 1
        }
        sb.append(expr.substring(i, j))
        i = j
      } else if (c == '`') { // backtick-quoted identifier: copy verbatim
        var j = i + 1
        while (j < expr.length && expr.charAt(j) != '`') j += 1
        if (j < expr.length) j += 1
        sb.append(expr.substring(i, j))
        i = j
      } else if (c.isDigit) { // numeric literal incl. scientific notation
        var j = i
        while (j < expr.length && (expr.charAt(j).isDigit || expr.charAt(j) == '.')) j += 1
        if (j < expr.length && (expr.charAt(j) == 'e' || expr.charAt(j) == 'E')) {
          var k = j + 1
          if (k < expr.length && (expr.charAt(k) == '+' || expr.charAt(k) == '-')) k += 1
          if (k < expr.length && expr.charAt(k).isDigit) {
            while (k < expr.length && expr.charAt(k).isDigit) k += 1
            j = k
          }
        }
        sb.append(expr.substring(i, j))
        i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < expr.length && (expr.charAt(j).isLetterOrDigit || expr.charAt(j) == '_')) j += 1
        val word = expr.substring(i, j)
        var k = j
        while (k < expr.length && expr.charAt(k).isWhitespace) k += 1
        val nextNonWs = if (k < expr.length) expr.charAt(k) else ' '
        val adjacentNext = if (j < expr.length) expr.charAt(j) else ' '
        val prev = if (i > 0) expr.charAt(i - 1) else ' '
        val isFunction = nextNonWs == '('
        val isQualified = prev == '.' || adjacentNext == '.'
        if (!isFunction && !isQualified && !SqlKeywords.contains(word.toUpperCase))
          sb.append(alias).append('.').append(word)
        else sb.append(word)
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
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

  private def filterSql(plan: Plan, f: Filter): (String, Boolean) = {
    val model = plan.model
    val isMetric = model.metrics.exists(_.name == f.field)
    val lhs =
      if (isMetric) plan.metricSql(expandMetric(model, model.metric(f.field), Set(f.field)))
      else plan.dimExpr(f.field)
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

  private def whereHaving(plan: Plan): (String, String) = {
    val (having, where) = plan.q.filters.map(f => filterSql(plan, f)).partition(_._2)
    val segs = plan.q.segments.map(plan.segmentSql)
    val whereAll = where.map(_._1) ++ segs
    (whereAll.mkString(" AND "), having.map(_._1).mkString(" AND "))
  }

  private def orderAndLimit(plan: Plan): String = {
    val q = plan.q
    val sort =
      if (q.sort.isEmpty) ""
      else " ORDER BY " + q.sort.map { case (f, dir) =>
        s"${plan.outName(f)} ${dir.toUpperCase}"
      }.mkString(", ")
    sort + q.limit.map(l => s" LIMIT $l").getOrElse("")
  }

  private def generateSimple(plan: Plan): String = {
    val model = plan.model; val q = plan.q
    val dimSel = q.dimensions.map(d => s"${plan.dimExpr(d)} AS ${plan.outName(d)}")
    val metSel = q.metrics.map(n =>
      s"${plan.metricSql(expandMetric(model, model.metric(n), Set(n)))} AS $n")
    val (where, having) = whereHaving(plan)
    val sb = new StringBuilder(s"SELECT ${(dimSel ++ metSel).mkString(", ")}${plan.fromSql}")
    if (where.nonEmpty) sb.append(s" WHERE $where")
    if (q.dimensions.nonEmpty) sb.append(" GROUP BY " + (1 to q.dimensions.size).mkString(", "))
    if (having.nonEmpty) sb.append(s" HAVING $having")
    sb.append(orderAndLimit(plan))
    sb.toString
  }

  /** Window path: inner aggregate (base metrics), outer window functions
    * (engine.go:426-493 + windowSQL :526-566). */
  private def generateWrapped(plan: Plan): String = {
    val model = plan.model; val q = plan.q
    val innerMetrics = q.metrics.flatMap { n =>
      val m = model.metric(n)
      if (m.window.nonEmpty) RefPattern.findAllMatchIn(m.expression).map(_.group(1)).toSeq
      else Seq(n)
    }.distinct
    val dimSel = q.dimensions.map(d => s"${plan.dimExpr(d)} AS ${plan.outName(d)}")
    val metSel = innerMetrics.map(n =>
      s"${plan.metricSql(expandMetric(model, model.metric(n), Set(n)))} AS $n")
    val (where, having) = whereHaving(plan)
    val inner = new StringBuilder(s"SELECT ${(dimSel ++ metSel).mkString(", ")}${plan.fromSql}")
    if (where.nonEmpty) inner.append(s" WHERE $where")
    if (q.dimensions.nonEmpty) inner.append(" GROUP BY " + (1 to q.dimensions.size).mkString(", "))
    if (having.nonEmpty) inner.append(s" HAVING $having")

    val outerSel = q.dimensions.map(d => s"base.${plan.outName(d)}") ++ q.metrics.map { n =>
      val m = model.metric(n)
      (if (m.window.nonEmpty) windowSql(m) else s"base.$n") + s" AS $n"
    }
    s"SELECT ${outerSel.mkString(", ")} FROM (${inner.toString}) base" + orderAndLimit(plan)
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
