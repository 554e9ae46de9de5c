package graft.model

/** Pipeline documentation generator (reference cmd/docs.go): one markdown
  * page per pipeline — assets, dependencies, columns, checks. */
object Docs {

  def markdown(pipeline: Pipeline): String = {
    val sb = new StringBuilder
    sb.append(s"# Pipeline: ${pipeline.name}\n\n")
    if (pipeline.schedule.nonEmpty) sb.append(s"- schedule: `${pipeline.schedule}`\n")
    if (pipeline.startDate.nonEmpty) sb.append(s"- start date: ${pipeline.startDate}\n")
    if (pipeline.variables.nonEmpty)
      sb.append(s"- variables: ${pipeline.variables.toSeq.sortBy(_._1)
        .map { case (k, v) => s"`$k`=$v" }.mkString(", ")}\n")
    if (pipeline.variants.nonEmpty)
      sb.append(s"- variants: ${pipeline.variants.keys.toSeq.sorted.map(v => s"`$v`").mkString(", ")}\n")
    sb.append(s"\n${pipeline.assets.size} assets.\n")

    pipeline.assets.foreach { a =>
      sb.append(s"\n## ${a.name}\n\n")
      if (a.description.nonEmpty) sb.append(s"${a.description}\n\n")
      sb.append(s"- type: `${a.assetType}`\n")
      val mat = a.materialization
      if (mat.typ != MaterializationType.None)
        sb.append(s"- materialization: ${mat.typ.toString.toLowerCase}" +
          mat.strategy.map(s0 => s" / ${s0.name}").getOrElse("") + "\n")
      if (a.dependsOn.nonEmpty)
        sb.append(s"- depends: ${a.dependsOn.map(d => s"`$d`").mkString(", ")}\n")
      if (a.owner.nonEmpty) sb.append(s"- owner: ${a.owner}\n")
      if (a.tier > 0) sb.append(s"- tier: ${a.tier}\n")
      if (a.tags.nonEmpty) sb.append(s"- tags: ${a.tags.mkString(", ")}\n")
      if (a.columns.nonEmpty) {
        sb.append("\n| column | type | description | checks |\n|---|---|---|---|\n")
        a.columns.foreach { c =>
          sb.append(s"| ${c.name} | ${c.typ} | ${c.description.replace("|", "\\|")} " +
            s"| ${c.checks.map(_.name).mkString(", ")} |\n")
        }
      }
      if (a.customChecks.nonEmpty)
        sb.append(s"\ncustom checks: ${a.customChecks.map(c => s"`${c.name}`").mkString(", ")}\n")
    }
    sb.toString
  }
}
