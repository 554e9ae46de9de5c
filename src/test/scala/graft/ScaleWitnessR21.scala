package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 scale witness (VERDICT r20 #3): the three r20 materialize contracts
  * — incremental dedup, minhashLsh, the tfIdf family — were proven at sf0.1
  * only, and the pins grow linearly with corpus size. Re-witness each one
  * lazy-vs-checkpoint on the ScaleProbeSpec corpus construction (boilerplate
  * -skewed structural copies of the sf0.1 documents) one and two decades up,
  * interleaved min-of-N in one JVM, and record the localCheckpoint block
  * footprint (memory + disk) the pin costs.
  *
  *   sbt "Test/runMain graft.ScaleWitnessR21 <copies> [runs]"
  *     copies: 10 = sf1 (50k docs), 100 = sf10 (500k docs)
  */
object ScaleWitnessR21 {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val runs = if (args.length > 1) args(1).toInt else 3
    val base0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-scalewitness-${ProcessHandle.current().pid()}")
      .getOrCreate()
    base0.sparkContext.setLogLevel("ERROR")
    // the capped dedup operators aggregate with k-bounded heaps — run on the
    // raised clone exactly like Bench / ScaleProbeSpec
    val spark = graft.core.HeapAgg.raisedClone(base0)
    graft.core.Tables.register(spark, "/root/testdata/sf0.1")
    val boiler = "this document is provided under the standard terms of " +
      "service all content herein is offered without warranty of any kind " +
      "either expressed or implied including fitness for purpose "
    val corpusDir = s"/tmp/graft-scalewitness-docs-$copies"
    val base = spark.table("documents").select("doc_id", "text")
    (0 until copies).map(k => base.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 3, concat(lit(boiler), col("text")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir)
    println(s"[scalewitness] corpus: ${docs.count()} docs ($copies copies)")
    val batch10 = docs.where(pmod(col("doc_id"), lit(10)) === 3)
    val corpus90 = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
    // caps follow the ScaleProbeSpec rule: 2x the structural copy count
    // (minhash maxBucket stays 20 at every decade — see the sf10 note there)
    val cap = 2 * copies

    val variants: Seq[(String, Boolean => DataFrame)] = Seq(
      "minhash_oph" -> (m =>
        graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
          rowsPerBand = 2, threshold = 0.5, maxBucket = 20, oph = true,
          materialize = m)),
      "incr_dedup" -> (m =>
        graft.ops.Dedup.jaccardAgainst(batch10, corpus90, n = 3,
          threshold = 0.5, maxDocFreq = cap, materialize = m)),
      "tfidf_cosine" -> (m =>
        graft.ops.TextAnalysis.tfIdfCosine(docs, topTerms = 10,
          threshold = 0.3, maxKeptDf = cap, materialize = m)))

    def storageBytes(): (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    val times = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    val footprint = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    for (r <- 0 to runs; (name, mk) <- variants; m <- Seq(false, true)) {
      val label = s"$name/${if (m) "ckpt" else "lazy"}"
      spark.sparkContext.setJobDescription(s"scalewitness:$label:$r")
      val t0 = System.nanoTime()
      val df = mk(m)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (m) footprint(name) = storageBytes()
      if (r > 0) // run 0 is the uncounted warm-up
        times.getOrElseUpdate(label,
          scala.collection.mutable.ArrayBuffer.empty[Double]) += sec
    }
    times.foreach { case (label, ts) =>
      println(f"[scalewitness] copies=$copies $label%-22s min=${ts.min}%7.2f  " +
        ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }
    footprint.foreach { case (name, (mem, disk)) =>
      println(f"[scalewitness] copies=$copies $name%-22s checkpoint footprint: " +
        f"mem=${mem / 1048576.0}%.1f MiB disk=${disk / 1048576.0}%.1f MiB")
    }
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(corpusDir))
    base0.stop()
  }
}
