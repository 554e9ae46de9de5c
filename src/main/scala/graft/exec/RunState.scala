package graft.exec

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Persisted run state for `--continue` (reference cmd/run.go:948,1575-1589:
  * state under logs/runs/<pipeline>; on continue, previously
  * Succeeded/Skipped instances are not re-run — scheduler.go:1205-1229).
  * Stored as a flat instance-id → status YAML map under the pipeline dir. */
object RunState {

  private def statePath(baseDir: String, pipelineName: String): Path =
    Paths.get(baseDir, "logs", "runs", s"$pipelineName.yml")

  def save(baseDir: String, pipelineName: String,
           results: Map[String, Scheduler.Result]): Path = {
    val p = statePath(baseDir, pipelineName)
    Files.createDirectories(p.getParent)
    // merge over the prior state: a subset (--select) run must not erase the
    // completion record of instances it didn't touch
    val merged = load(baseDir, pipelineName) ++
      results.map { case (id, r) => id -> r.status.toString }
    val body = merged.toSeq.sortBy(_._1).map { case (id, st) =>
      s""""${id.replace("\"", "")}": $st"""
    }.mkString("", "\n", "\n")
    Files.writeString(p, body)
    p
  }

  def load(baseDir: String, pipelineName: String): Map[String, String] = {
    val p = statePath(baseDir, pipelineName)
    if (!Files.exists(p)) Map.empty
    else
      new org.yaml.snakeyaml.Yaml().load[Any](Files.readString(p)) match {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => String.valueOf(k) -> String.valueOf(v) }.toMap
        case _ => Map.empty
      }
  }

  /** Instance ids a `--continue` run can skip: everything that already
    * reached a successful terminal state last run. */
  def completedIds(baseDir: String, pipelineName: String): Set[String] =
    load(baseDir, pipelineName).collect {
      case (id, "Succeeded") => id
      case (id, "Skipped")   => id
    }.toSet

  def clear(baseDir: String, pipelineName: String): Unit =
    Files.deleteIfExists(statePath(baseDir, pipelineName))
}
