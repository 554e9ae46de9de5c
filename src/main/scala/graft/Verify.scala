package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local spot checks;
    // the driver's two-arg invocation runs everything)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Set.empty[String])
      case Array(s, o, f) => (s, o, f.split(',').map(_.trim).toSet)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // object-agg sort-fallback valve at the session default; per-query
      // raises via graft.core.HeapAgg (see Bench.scala)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query status envelope: a void or partial run must be
    // machine-distinguishable from a clean one (an empty artifact reads as
    // "zero failures" to round-diffing tools — r8 advice)
    val status = scala.collection.mutable.LinkedHashMap[String, String]()
    val raisedStreaming = SparkEntry.heapRaisedStreaming
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          // k-bounded-heap plans run rebound onto a raised CLONE session —
          // streaming keys pre-listed (their heap executes inside fn, so
          // the whole builder runs on the clone), batch keys sniffed from
          // the analyzed plan's aggregate classes
          if (raisedStreaming(name))
            fn(graft.core.HeapAgg.raisedClone(spark), sfDir)
              .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          else
            graft.core.HeapAgg.maybeRebound(fn(spark, sfDir))
              .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          status(name) = "ok"
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          status(name) = s"err: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        } finally
          // drop any persisted serving folds the query left behind — the
          // 213-key pass otherwise accumulates corpus-sized cache entries
          graft.streaming.ServingCache.releaseAll()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val nErr = status.valuesIterator.count(_ != "ok")
    val statusJson = s"""{"status": ${q(if (nErr == 0) "ok" else "partial")}, """ +
      s""""n_queries": ${status.size}, "n_err": $nErr, "queries": """ +
      status.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}") + "}"
    Files.writeString(Paths.get(s"$outDir/verify_status.json"), statusJson)
    spark.stop()
  }
}
