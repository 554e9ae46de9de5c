package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExplainMode, FormattedMode}

/** Optimization-round plan snapshots (guide §1.1/§7.2).
  *
  * For each bench key: build the DataFrame exactly as Bench does (raised
  * clone for pre-listed streaming keys, maybeRebound for batch), execute it
  * through the noop sink (guide §1.4 — times the computation, not the sink,
  * and finalizes AQE so the dumped plan is the plan that actually ran), then
  * write `.explain("formatted")` + the isolated wall time to
  * plans/r20/<key>_<suffix>.txt.
  *
  *   sbt "Test/runMain graft.PlanDumpR20 before [key1,key2,...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val only: Set[String] =
      if (args.length > 1) args(1).split(',').map(_.trim).toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = Paths.get("plans/r20")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-plandump-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raisedStreaming = SparkEntry.heapRaisedStreaming
    lazy val raisedSession = graft.core.HeapAgg.raisedClone(spark)
    val selected = SparkEntry.benchQueries
      .filter { case (k, _) => only.isEmpty || only(k) }
    for (name <- selected.keys.toSeq.sorted) {
      try {
        spark.sparkContext.setJobDescription(s"plandump:$name")
        val df =
          if (raisedStreaming(name)) selected(name)(raisedSession, sfDir)
          else graft.core.HeapAgg.maybeRebound(selected(name)(spark, sfDir))
        // Execute THIS DataFrame's own QueryExecution (a .write would plan a
        // fresh one), so the explain below is the FINAL adaptive plan — the
        // one with runtime join downgrades, coalesced reads and any
        // ReusedExchange visible. The RDD count materializes every row like
        // the noop sink but keeps the QueryExecution identity.
        val t0 = System.nanoTime()
        df.queryExecution.executedPlan.execute().count()
        val secs = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val header =
          s"== $name ==\nsf_dir: $sfDir  cpus: $cpus\n" +
            f"full-materialization wall (post-build, single pass): $secs%.3f s\n" +
            "note: streaming keys run their stream inside the builder; the plan\n" +
            "below is the returned (result-table) read for those keys.\n\n"
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), header + plan)
        println(f"[plandump] $name%-40s $secs%8.3f s")
      } catch { case e: Throwable =>
        val msg = s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
        System.err.println(msg)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), msg + "\n")
      } finally graft.streaming.ServingCache.releaseAll()
    }
    spark.stop()
  }
}
