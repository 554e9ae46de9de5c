package graft.exec

import org.apache.spark.sql.SparkSession

/** Sensors (reference pkg/ansisql/operator.go:23-241): poll a condition until
  * it holds or a timeout elapses. Modes: `skip` (check once, skip asset when
  * unmet), `once` (check once, fail when unmet), `wait` (poll). */
object Sensors {

  sealed trait Outcome
  case object Met     extends Outcome
  case object SkipRun extends Outcome

  final case class SensorTimeout(msg: String) extends RuntimeException(msg)

  /** query sensor: condition = first cell of `query` is > 0. */
  def querySensor(spark: SparkSession, query: String, mode: String = "wait",
                  pokeIntervalMs: Long = 30000, timeoutMs: Long = 8 * 3600 * 1000,
                  sleep: Long => Unit = Thread.sleep): Outcome =
    poll(mode, pokeIntervalMs, timeoutMs, sleep, s"query sensor: $query") { () =>
      val v = spark.sql(query).head().get(0)
      v match {
        case null => false
        case n: Number => n.doubleValue() > 0
        case b: Boolean => b
        case other => String.valueOf(other).toDouble > 0
      }
    }

  /** table sensor: condition = table exists in the catalog. */
  def tableSensor(spark: SparkSession, table: String, mode: String = "wait",
                  pokeIntervalMs: Long = 30000, timeoutMs: Long = 8 * 3600 * 1000,
                  sleep: Long => Unit = Thread.sleep): Outcome =
    poll(mode, pokeIntervalMs, timeoutMs, sleep, s"table sensor: $table") { () =>
      spark.catalog.tableExists(table)
    }

  private def poll(mode: String, pokeMs: Long, timeoutMs: Long,
                   sleep: Long => Unit, what: String)(cond: () => Boolean): Outcome = {
    mode match {
      case "skip" => if (cond()) Met else SkipRun
      case "once" => if (cond()) Met else throw SensorTimeout(s"unmet (mode=once): $what")
      case _ =>
        var waited = 0L
        while (!cond()) {
          if (waited >= timeoutMs) throw SensorTimeout(s"timed out after ${timeoutMs}ms: $what")
          sleep(pokeMs)
          waited += pokeMs
        }
        Met
    }
  }
}
