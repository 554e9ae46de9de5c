package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r21 re-witness harness (VERDICT r20 #1): `text_bigram_lm` and
  * `dedup_minhash_oph` landed r20 materialize-contract changes whose focused
  * same-JVM wins were contradicted by both independent records (sidecar and
  * driver tails). Settle it the way the verdict prescribes: ONE JVM, idle
  * host, interleaved min-of-N, old plan (materialize = false) vs new plan
  * (materialize = true), under the bench's own `.count()` action and the
  * exact Bench session config.
  *
  *   sbt "Test/runMain graft.ReWitnessR21 [runs]"
  */
object ReWitnessR21 {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-rewitness-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.register(spark, sfDir)
    def docs = spark.table("documents")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "bigram_lm/lazy" -> (() =>
        graft.ops.TextAnalysis.bigramLogProb(docs, materialize = false)),
      "bigram_lm/ckpt" -> (() =>
        graft.ops.TextAnalysis.bigramLogProb(docs)),
      "minhash_oph/lazy" -> (() =>
        graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
          rowsPerBand = 2, threshold = 0.5, maxBucket = 20, oph = true,
          materialize = false)),
      "minhash_oph/ckpt" -> (() =>
        graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
          rowsPerBand = 2, threshold = 0.5, maxBucket = 20, oph = true)),
      // VERDICT r20 #4: struct-ordered argmax (SortAggregate) vs the
      // packed-long form (HashAggregate)
      "keep_best/struct" -> (() =>
        graft.ops.Dedup.exactKeepBest(docs)),
      "keep_best/packed" -> (() =>
        graft.ops.Dedup.exactKeepBest(docs, packedArgmax = true)))

    // one uncounted warm-up per variant: JIT + parquet footer cache, so the
    // first timed pass isn't charged for session bring-up (Bench warms too)
    variants.foreach { case (name, mk) =>
      spark.sparkContext.setJobDescription(s"warmup:$name")
      mk().count()
    }
    val times = scala.collection.mutable.LinkedHashMap(
      variants.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    for (r <- 1 to runs; (name, mk) <- variants) {
      spark.sparkContext.setJobDescription(s"rewitness:$name:$r")
      val t0 = System.nanoTime()
      mk().count()
      times(name) += (System.nanoTime() - t0) / 1e9
    }
    times.foreach { case (name, ts) =>
      println(f"[rewitness] $name%-18s min=${ts.min}%6.3f  " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
