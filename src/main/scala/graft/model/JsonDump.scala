package graft.model

/** Machine-readable pipeline dump (reference `bruin internal
  * parse-pipeline`, cmd/internal.go — the contract the VS Code extension
  * consumes): stable-keyed JSON of the parsed model, no execution. */
object JsonDump {

  private[graft] def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")

  private def column(c: Column): String = obj(Seq(
    "name" -> q(c.name),
    "type" -> q(c.typ),
    "description" -> q(c.description),
    "primary_key" -> c.primaryKey.toString,
    "update_on_merge" -> c.updateOnMerge.toString,
    "nullable" -> c.nullable.toString,
    "checks" -> arr(c.checks.map(ck => q(ck.name)))) ++
    (if (c.extendsRef.nonEmpty) Seq("extends" -> q(c.extendsRef)) else Nil))

  private def asset(a: Asset): String = obj(Seq(
    "name" -> q(a.name),
    "type" -> q(a.assetType),
    "description" -> q(a.description),
    "upstreams" -> arr(a.upstreams.map(u => obj(Seq(
      "value" -> q(u.value), "type" -> q(u.typ), "mode" -> q(u.mode))))),
    "materialization" -> obj(Seq(
      "type" -> q(a.materialization.typ.toString.toLowerCase),
      "strategy" -> q(a.materialization.strategy.map(_.name).getOrElse("")),
      "partition_by" -> arr(a.materialization.partitionBy.map(q)),
      "cluster_by" -> arr(a.materialization.clusterBy.map(q)),
      "incremental_key" -> q(a.materialization.incrementalKey.getOrElse("")))),
    "columns" -> arr(a.columns.map(column)),
    "custom_checks" -> arr(a.customChecks.map(c => q(c.name))),
    "parameters" -> obj(a.parameters.toSeq.sortBy(_._1).map { case (k, v) => k -> q(v) }),
    "tags" -> arr(a.tags.map(q)),
    "owner" -> q(a.owner),
    "tier" -> a.tier.toString))

  def pipeline(p: Pipeline): String = obj(Seq(
    "name" -> q(p.name),
    "schedule" -> q(p.schedule),
    "start_date" -> q(p.startDate),
    "concurrency" -> p.concurrency.toString,
    "retries" -> p.retries.toString,
    "variables" -> obj(p.variables.toSeq.sortBy(_._1).map { case (k, v) =>
      k -> q(String.valueOf(v)) }),
    "variants" -> arr(p.variants.keys.toSeq.sorted.map(q)),
    "assets" -> arr(p.assets.map(asset))))
}
