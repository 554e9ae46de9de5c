package graft.model

import java.nio.file.{Files, Path, Paths}
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Repo-level glossary (reference pkg/glossary/entity.go:28-62): named
  * entities with typed, described attributes. Columns declaring
  * `extends: Entity.Attribute` inherit name/type/description for fields they
  * leave empty (reference EnrichFromEntityAttributes, pipeline.go:1747-1784).
  */
final case class GlossaryAttribute(name: String, typ: String = "", description: String = "")

final case class GlossaryEntity(
    name: String,
    description: String = "",
    attributes: Map[String, GlossaryAttribute] = Map.empty)

final case class Glossary(entities: Seq[GlossaryEntity] = Nil) {
  private val byName = entities.map(e => e.name -> e).toMap
  def entity(name: String): Option[GlossaryEntity] = byName.get(name)
  def isEmpty: Boolean = entities.isEmpty
}

object Glossary {

  val FileNames: Seq[String] = Seq("glossary.yml", "glossary.yaml")

  def load(dir: String): Glossary =
    FileNames.map(Paths.get(dir, _)).find(Files.exists(_)) match {
      case Some(p) => parse(Files.readString(p))
      case scala.None => Glossary()
    }

  def parse(text: String): Glossary = {
    val root = Option(new Yaml().load[Any](text)).map(asMap).getOrElse(Map.empty)
    val entities = root.get("entities") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(parseEntity(_))
      case Some(m: java.util.Map[_, _]) => // map form: name -> body
        asMap(m).map { case (n, body) => parseEntity(body, Some(n)) }.toSeq
      case _ => Nil
    }
    Glossary(entities)
  }

  private def parseEntity(raw: Any, nameHint: Option[String] = scala.None): GlossaryEntity = {
    val m = asMap(raw)
    val attrs = m.get("attributes") match {
      case Some(am: java.util.Map[_, _]) =>
        asMap(am).map { case (an, av) =>
          val a = asMap(av)
          an -> GlossaryAttribute(
            name = a.get("name").map(String.valueOf).getOrElse(an),
            typ = a.get("type").map(String.valueOf).getOrElse(""),
            description = a.get("description").map(String.valueOf).getOrElse(""))
        }
      case Some(al: java.util.List[_]) =>
        al.asScala.toSeq.map { av =>
          val a = asMap(av)
          val an = a.get("name").map(String.valueOf).getOrElse("")
          an -> GlossaryAttribute(an,
            typ = a.get("type").map(String.valueOf).getOrElse(""),
            description = a.get("description").map(String.valueOf).getOrElse(""))
        }.toMap
      case _ => Map.empty[String, GlossaryAttribute]
    }
    GlossaryEntity(
      name = nameHint.getOrElse(m.get("name").map(String.valueOf).getOrElse("")),
      description = m.get("description").map(String.valueOf).getOrElse(""),
      attributes = attrs)
  }

  /** Enrich a column from its `extends: Entity.Attribute` declaration —
    * empty name/type/description inherit; declared values win. */
  def enrichColumn(c: Column, g: Glossary): Column =
    if (c.extendsRef.isEmpty || g.isEmpty) c
    else c.extendsRef.split("\\.", 2) match {
      case Array(en, an) =>
        val attr = g.entity(en).getOrElse(
          throw new IllegalArgumentException(s"entity '$en' not found in glossary"))
          .attributes.getOrElse(an,
            throw new IllegalArgumentException(s"attribute '$an' not found in entity '$en'"))
        c.copy(
          name = if (c.name.nonEmpty) c.name else attr.name,
          typ = if (c.typ.nonEmpty) c.typ else attr.typ,
          description = if (c.description.nonEmpty) c.description else attr.description)
      case _ =>
        throw new IllegalArgumentException(s"bad extends reference: '${c.extendsRef}'")
    }

  def enrich(asset: Asset, g: Glossary): Asset =
    if (g.isEmpty) asset
    else asset.copy(columns = asset.columns.map(enrichColumn(_, g)))

  private def asMap(v: Any): Map[String, Any] = YamlUtil.asMap(v)
}
