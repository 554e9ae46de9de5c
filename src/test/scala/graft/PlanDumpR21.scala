package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** r21 plan snapshots — same methodology as [[PlanDumpR20]] (execute each
  * bench key's own QueryExecution to full materialization, then dump the
  * FINAL adaptive plan), writing to plans/r21/.
  *
  *   sbt "Test/runMain graft.PlanDumpR21 before [key1,key2,...]"
  */
object PlanDumpR21 {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val only: Set[String] =
      if (args.length > 1) args(1).split(',').map(_.trim).toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = Paths.get("plans/r21")
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
