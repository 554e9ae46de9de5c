package graft.model

import scala.jdk.CollectionConverters._

/** One snakeyaml→Scala conversion for every YAML reader in the engine, so
  * identical YAML yields identically-typed values regardless of which parser
  * read it (Integer widens to Long everywhere). */
object YamlUtil {

  def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> (vv: Any) }.toMap
    case _ => Map.empty
  }

  def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> toScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.toSeq.map(toScala)
    case i: java.lang.Integer => i.toLong
    case other => other
  }
}
