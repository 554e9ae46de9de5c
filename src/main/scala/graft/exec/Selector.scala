package graft.exec

import scala.collection.mutable
import graft.model.Pipeline

/** Asset selectors (reference pkg/pipeline/selector.go:29-250):
  * terms are unioned; each term is
  *   - `name`        just the asset
  *   - `+name`       asset + all upstreams (or `n+name` limited depth)
  *   - `name+`       asset + all downstreams (or `name+n`)
  *   - `+name+`      both
  *   - `tag:x`       assets carrying tag x
  *   - `@name`       the whole connected component containing the asset
  */
object Selector {

  private val Term = """^(?:(\d*)(\+))?([^+@][^+]*?)(?:(\+)(\d*))?$""".r

  def select(pipeline: Pipeline, terms: Seq[String]): Set[String] = {
    val names = pipeline.assets.map(_.name).toSet
    val up = mutable.Map[String, Set[String]]().withDefaultValue(Set.empty)
    val down = mutable.Map[String, Set[String]]().withDefaultValue(Set.empty)
    pipeline.assets.foreach { a =>
      a.dependsOn.filter(names).foreach { u =>
        up(a.name) += u
        down(u) += a.name
      }
    }

    def walk(start: String, edges: String => Set[String], depth: Int): Set[String] = {
      val seen = mutable.Set(start)
      var frontier = Set(start)
      var d = 0
      while (frontier.nonEmpty && (depth < 0 || d < depth)) {
        frontier = frontier.flatMap(edges).diff(seen)
        seen ++= frontier
        d += 1
      }
      seen.toSet
    }

    terms.flatMap { raw =>
      val t = raw.trim
      if (t.startsWith("tag:")) {
        val tag = t.stripPrefix("tag:")
        pipeline.assets.filter(_.tags.contains(tag)).map(_.name)
      } else if (t.startsWith("@")) {
        val name = t.stripPrefix("@")
        if (!names(name)) Nil
        else walk(name, n => up(n) ++ down(n), -1).toSeq
      } else t match {
        case Term(upDepth, upPlus, name, downPlus, downDepth) if names(name) =>
          val ups =
            if (upPlus != null) walk(name, up, if (upDepth == null || upDepth.isEmpty) -1 else upDepth.toInt)
            else Set(name)
          val downs =
            if (downPlus != null) walk(name, down, if (downDepth == null || downDepth.isEmpty) -1 else downDepth.toInt)
            else Set(name)
          (ups ++ downs).toSeq
        case _ => Nil
      }
    }.toSet
  }
}
