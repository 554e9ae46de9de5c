package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (round 13, stream_cdc_* sidecar chase):
  * job-level decomposition of one cdcApply run — which jobs inside the
  * three micro-batches carry the wall-clock. */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.register(spark, sfDir)

    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val rows = scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), desc.take(110))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          rows.synchronized { rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, d)) }
        }
    })

    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"  batch ${p.batchId}: ${p.durationMs}")
      }
    })

    val which = sys.env.getOrElse("CDC_KEY", "stream_cdc_apply")
    // pass 1: stages the feed + warms; pass 2 is the measured one
    SparkEntry.queries(which)(spark, sfDir).count()
    rows.synchronized(rows.clear())
    val t0 = System.nanoTime()
    SparkEntry.queries(which)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL $which: $total%.2f s over ${rows.size} jobs; job-time sum ${rows.map(_._2).sum}%.2f s")
    rows.sortBy(-_._2).take(30).foreach { case (id, s, d) =>
      println(f"  job $id%4d  $s%7.3f s  $d")
    }
  }
}
