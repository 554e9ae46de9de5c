package graft.config

import java.nio.file.{Files, Path, Paths}
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Named connection (reference pkg/config/manager.go Connections): for the
  * Spark-native engine a connection is either the warehouse itself (the
  * session catalog) or an ingestion source (JDBC url / file root).
  * `concurrency` caps parallel tasks against this connection (reference
  * scheduler.go:387-493). */
final case class Connection(
    name: String,
    typ: String = "",
    uri: String = "",
    options: Map[String, String] = Map.empty,
    concurrency: Int = 0)

/** One environment of `.graft.yml` (reference Environment,
  * pkg/config/manager.go:277-285): named connections plus the dev
  * schema_prefix that redirects writes/reads to prefixed schemas. */
final case class Environment(
    name: String = "default",
    schemaPrefix: String = "",
    connections: Map[String, Connection] = Map.empty,
    fullRefreshRestricted: Boolean = false) {

  def connection(name: String): Option[Connection] = connections.get(name)

  /** Physical table name under this environment: the schema segment gets the
    * prefix (reference devenv/modifier.go:108-140); unqualified names are
    * prefixed directly. */
  def physicalName(logical: String): String =
    if (schemaPrefix.isEmpty) logical
    else {
      val parts = logical.split('.')
      if (parts.length == 1) schemaPrefix + logical
      else {
        val i = parts.length - 2
        (parts.take(i) :+ (schemaPrefix + parts(i)) :+ parts.last).mkString(".")
      }
    }

  /** logical → physical map over a set of asset names (identity prefix ⇒ empty). */
  def renameMapping(names: Seq[String]): Map[String, String] =
    if (schemaPrefix.isEmpty) Map.empty
    else names.map(n => n -> physicalName(n)).toMap
}

/** `.graft.yml` — environments/connections (reference `.bruin.yml`,
  * pkg/config/manager.go:296-303), with `${ENV_VAR}` interpolation like the
  * reference's configEnvVarRegex. */
final case class Config(
    defaultEnvironment: String = "default",
    environments: Map[String, Environment] = Map.empty) {

  def environment(name: Option[String] = scala.None): Environment = {
    val n = name.getOrElse(defaultEnvironment)
    environments.getOrElse(n,
      // only a missing config file yields the implicit default; a config
      // whose default_environment names nothing is a typo, not a fallback
      if (name.isEmpty && environments.isEmpty) Environment()
      else throw new IllegalArgumentException(
        s"unknown environment '$n' (have: ${environments.keys.mkString(", ")})"))
  }
}

object Config {

  val FileName = ".graft.yml"

  def load(dir: String): Config = {
    val p = Paths.get(dir).resolve(FileName)
    if (!Files.exists(p)) Config()
    else parse(Files.readString(p))
  }

  /** Serialize back to `.graft.yml` text (reference pkg/config/manager.go
    * persists via yaml.Marshal). Stable key order so repeated add/delete
    * round-trips diff minimally; `parse(toYaml(c)) == c` is spec-enforced.
    * Values are emitted quoted whenever they stray outside the safe scalar
    * set, so URIs with `${...}` placeholders that were already interpolated
    * away survive as literals. */
  def toYaml(cfg: Config): String = {
    def q(s: String): String =
      if (s.nonEmpty && s.matches("[A-Za-z0-9_./:@-]+")) s
      else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val sb = new StringBuilder
    sb.append(s"default_environment: ${q(cfg.defaultEnvironment)}\n")
    sb.append("environments:\n")
    cfg.environments.toSeq.sortBy(_._1).foreach { case (name, e) =>
      sb.append(s"  ${q(name)}:\n")
      if (e.schemaPrefix.nonEmpty) sb.append(s"    schema_prefix: ${q(e.schemaPrefix)}\n")
      if (e.fullRefreshRestricted) sb.append("    config:\n      full_refresh_restricted: true\n")
      if (e.connections.isEmpty) sb.append("    connections: {}\n")
      else {
        sb.append("    connections:\n")
        e.connections.toSeq.sortBy(_._1).foreach { case (cn, c) =>
          sb.append(s"      ${q(cn)}:\n")
          if (c.typ.nonEmpty) sb.append(s"        type: ${q(c.typ)}\n")
          if (c.uri.nonEmpty) sb.append(s"        uri: ${q(c.uri)}\n")
          if (c.concurrency > 0) sb.append(s"        concurrency: ${c.concurrency}\n")
          if (c.options.nonEmpty) {
            sb.append("        options:\n")
            c.options.toSeq.sortBy(_._1).foreach { case (k, v) =>
              sb.append(s"          ${q(k)}: ${q(v)}\n")
            }
          }
        }
      }
    }
    sb.toString
  }

  def save(dir: String, cfg: Config): Path = {
    val p = Paths.get(dir).resolve(FileName)
    Files.writeString(p, toYaml(cfg))
    p
  }

  def parse(text: String, env: Map[String, String] = sys.env): Config = {
    val interpolated = "\\$\\{([^}]+)\\}".r.replaceAllIn(text,
      m => java.util.regex.Matcher.quoteReplacement(env.getOrElse(m.group(1), "")))
    val root = asMap(new Yaml().load[Any](interpolated))
    val envs = root.get("environments").map(asMap).getOrElse(Map.empty).map {
      case (name, raw) =>
        val m = asMap(raw)
        val conns = m.get("connections").map(asMap).getOrElse(Map.empty).map {
          case (cn, craw) =>
            val cm = asMap(craw)
            cn -> Connection(
              name = cn,
              typ = cm.get("type").map(String.valueOf).getOrElse(""),
              uri = cm.get("uri").map(String.valueOf).getOrElse(""),
              options = cm.get("options").map(asMap).getOrElse(Map.empty)
                .map { case (k, v) => k -> String.valueOf(v) },
              concurrency = cm.get("concurrency").map(String.valueOf(_).toInt).getOrElse(0))
        }
        val cfg = m.get("config").map(asMap).getOrElse(Map.empty)
        name -> Environment(
          name = name,
          schemaPrefix = m.get("schema_prefix").map(String.valueOf).getOrElse(""),
          connections = conns,
          fullRefreshRestricted = cfg.get("full_refresh_restricted")
            .exists(v => String.valueOf(v).equalsIgnoreCase("true")))
    }
    Config(
      defaultEnvironment = root.get("default_environment")
        .map(String.valueOf).getOrElse("default"),
      environments = envs)
  }

  private def asMap(v: Any): Map[String, Any] = graft.model.YamlUtil.asMap(v)
}
