package graft.model

/** Canonical asset re-serialization (reference cmd/format.go +
  * Asset.FormatContent, pipeline.go:1884-1984): emit the @bruin header YAML
  * in a stable key order and re-wrap it around the executable content, so
  * formatting is idempotent and diffs stay minimal. */
object Formatter {

  def formatAsset(asset: Asset): String = {
    val sb = new StringBuilder
    sb.append(s"name: ${asset.name}\n")
    if (asset.assetType.nonEmpty) sb.append(s"type: ${asset.assetType}\n")
    if (asset.description.nonEmpty) sb.append(s"description: ${quote(asset.description)}\n")
    if (asset.owner.nonEmpty) sb.append(s"owner: ${asset.owner}\n")
    if (asset.tier > 0) sb.append(s"tier: ${asset.tier}\n")
    if (asset.tags.nonEmpty) sb.append(s"tags: [${asset.tags.mkString(", ")}]\n")

    if (asset.upstreams.nonEmpty) {
      sb.append("\ndepends:\n")
      asset.upstreams.foreach { u =>
        if (u.typ == "asset" && u.mode == "full") sb.append(s"  - ${u.value}\n")
        else {
          sb.append(s"  - ${if (u.typ == "uri") "uri" else "asset"}: ${u.value}\n")
          if (u.mode != "full") sb.append(s"    mode: ${u.mode}\n")
        }
      }
    }

    val mat = asset.materialization
    if (mat.typ != MaterializationType.None || mat.strategy.nonEmpty) {
      sb.append("\nmaterialization:\n")
      sb.append(s"  type: ${mat.typ.toString.toLowerCase}\n")
      mat.strategy.foreach(s0 => sb.append(s"  strategy: ${s0.name}\n"))
      mat.incrementalKey.foreach(k => sb.append(s"  incremental_key: $k\n"))
      mat.incrementalPredicate.foreach(p => sb.append(s"  incremental_predicate: ${quote(p)}\n"))
      if (mat.partitionBy.nonEmpty) sb.append(s"  partition_by: [${mat.partitionBy.mkString(", ")}]\n")
      if (mat.clusterBy.nonEmpty) sb.append(s"  cluster_by: [${mat.clusterBy.mkString(", ")}]\n")
      if (mat.timeGranularity == TimeGranularity.Date) sb.append("  time_granularity: date\n")
    }

    if (asset.columns.nonEmpty) {
      sb.append("\ncolumns:\n")
      asset.columns.foreach { c =>
        sb.append(s"  - name: ${c.name}\n")
        if (c.typ.nonEmpty) sb.append(s"    type: ${c.typ}\n")
        if (c.description.nonEmpty) sb.append(s"    description: ${quote(c.description)}\n")
        if (c.primaryKey) sb.append("    primary_key: true\n")
        if (c.updateOnMerge) sb.append("    update_on_merge: true\n")
        if (!c.nullable) sb.append("    nullable: false\n")
        if (c.mask.nonEmpty) sb.append(s"    mask: ${c.mask}\n")
        if (c.mergeSql.nonEmpty) sb.append(s"    merge_sql: ${quote(c.mergeSql)}\n")
        if (c.extendsRef.nonEmpty) sb.append(s"    extends: ${c.extendsRef}\n")
        if (c.checks.nonEmpty) {
          val simple = c.checks.forall(ck => ck.value.isEmpty && ck.blocking)
          if (simple) sb.append(s"    checks: [${c.checks.map(_.name).mkString(", ")}]\n")
          else {
            sb.append("    checks:\n")
            c.checks.foreach { ck =>
              sb.append(s"      - name: ${ck.name}\n")
              ck.value.foreach(v => sb.append(s"        value: ${CheckValue.toSql(v)}\n"))
              if (!ck.blocking) sb.append("        blocking: false\n")
            }
          }
        }
      }
    }

    if (asset.customChecks.nonEmpty) {
      sb.append("\ncustom_checks:\n")
      asset.customChecks.foreach { ck =>
        sb.append(s"  - name: ${ck.name}\n")
        sb.append(s"    query: ${quote(ck.query)}\n")
        ck.value.foreach(v => sb.append(s"    value: $v\n"))
        ck.count.foreach(v => sb.append(s"    count: $v\n"))
        if (!ck.blocking) sb.append("    blocking: false\n")
      }
    }

    if (asset.parameters.nonEmpty) {
      sb.append("\nparameters:\n")
      asset.parameters.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb.append(s"  $k: ${quote(v)}\n")
      }
    }

    if (asset.secrets.nonEmpty) {
      sb.append("\nsecrets:\n")
      asset.secrets.foreach { s0 =>
        sb.append(s"  - key: ${s0.key}\n")
        if (s0.injectAs != s0.key) sb.append(s"    inject_as: ${s0.injectAs}\n")
      }
    }

    if (asset.intervalModifiers != IntervalModifiers()) {
      sb.append("\ninterval_modifiers:\n")
      asset.intervalModifiers.start.foreach(m => sb.append(s"  start: ${quote(m)}\n"))
      asset.intervalModifiers.end.foreach(m => sb.append(s"  end: ${quote(m)}\n"))
    }

    if (!asset.notifications.isEmpty) {
      sb.append("\nnotifications:\n")
      if (asset.notifications.slack.nonEmpty) {
        sb.append("  slack:\n")
        asset.notifications.slack.foreach(c => sb.append(s"    - channel: ${quote(c)}\n"))
      }
      if (asset.notifications.emails.nonEmpty) {
        sb.append("  email:\n")
        asset.notifications.emails.foreach(g =>
          sb.append(s"    - recipients: [${g.mkString(", ")}]\n"))
      }
    }

    if (asset.hooks != Hooks()) {
      sb.append("\nhooks:\n")
      if (asset.hooks.pre.nonEmpty) {
        sb.append("  pre:\n")
        asset.hooks.pre.foreach(h => sb.append(s"    - ${quote(h)}\n"))
      }
      if (asset.hooks.post.nonEmpty) {
        sb.append("  post:\n")
        asset.hooks.post.foreach(h => sb.append(s"    - ${quote(h)}\n"))
      }
    }

    val header = sb.toString.stripSuffix("\n")
    asset.assetType match {
      case AssetType.SparkPython =>
        "\"\"\" @bruin\n\n" + header + "\n\n@bruin \"\"\"\n\n" + asset.content.trim + "\n"
      case _ if asset.content.trim.nonEmpty =>
        "/* @bruin\n\n" + header + "\n\n@bruin */\n\n" + asset.content.trim + "\n"
      case _ => header + "\n"
    }
  }

  /** Quote a YAML scalar when it needs it. */
  private def quote(s: String): String =
    if (s.matches("[A-Za-z0-9_./ -]*") && !s.contains("\n") && s.trim == s && s.nonEmpty) s
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
}
