package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off DECOMPOSITION PROBE for the float streaming-ANN spill tier's
  * sf10 gap (VERDICT r17 "what's wrong" #2: 48.7 s spill vs 24.0 s
  * broadcast on identical 200k x 800k work). Not part of `sbt test` —
  * run with `sbt "Test/runMain graft.ProbeAnnSpillDecomp"` on an idle
  * host. Prices the tier's stages separately:
  *   - fold build (corpus scan + groupByKey pack + persist)
  *   - stream-static join WITHOUT scoring (batch analog)
  *   - join + in-place kernel (batch analog)
  *   - the two full streaming tiers (reference numbers)
  * and dumps per-stage task-time distributions (max vs median task) to
  * test the join-key skew hypothesis: scoring work in the spill tier is
  * distributed by __list (256 keys into 32 shuffle partitions), while the
  * broadcast tier repartitions query rows evenly. */
/** Experimental expression for the probe: same semantics as
  * [[graft.functions.AnnListTopK]] but with a per-task 1-entry LIST CACHE —
  * joined rows arrive grouped by __list (the SMJ sort), so the list's
  * arrays are copied to primitives once per (task, list) and every query
  * row scores at primitive-loop speed. Interpreted eval only (per-row
  * fallback overhead is negligible next to the per-element work). */
case class ProbeListCacheTopK(list: org.apache.spark.sql.catalyst.expressions.Expression,
                              qv: org.apache.spark.sql.catalyst.expressions.Expression,
                              ids: org.apache.spark.sql.catalyst.expressions.Expression,
                              flat: org.apache.spark.sql.catalyst.expressions.Expression,
                              norms: org.apache.spark.sql.catalyst.expressions.Expression,
                              dim: org.apache.spark.sql.catalyst.expressions.Expression,
                              k: Int)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  override def children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    Seq(list, qv, ids, flat, norms, dim)
  override def nullable: Boolean = true
  override def dataType: org.apache.spark.sql.types.DataType =
    graft.functions.AnnListTopK.OutType
  override def eval(input: InternalRow): Any = {
    val l = list.eval(input)
    val q = qv.eval(input)
    val d = dim.eval(input)
    if (l == null || q == null || d == null) return null
    val lid = l.asInstanceOf[Int]
    var c = ProbeListCacheTopK.cache.get()
    if (c == null || c.listId != lid) {
      val i = ids.eval(input); val f = flat.eval(input); val n = norms.eval(input)
      if (i == null || f == null || n == null) return null
      c = new ProbeListCacheTopK.Entry(lid,
        i.asInstanceOf[ArrayData].toLongArray(),
        f.asInstanceOf[ArrayData].toFloatArray(),
        n.asInstanceOf[ArrayData].toDoubleArray())
      ProbeListCacheTopK.cache.set(c)
    }
    val qa = q.asInstanceOf[ArrayData].toFloatArray()
    val top = new graft.ops.Similarity.TopK(k)
    graft.functions.AnnListTopK.scoreInto(top, qa, graft.ops.Similarity.normP(qa),
      c.ids, c.flat, c.norms, d.asInstanceOf[Int])
    new GenericArrayData(top.iterator.map { case (b, cs) => InternalRow(b, cs) }.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]): ProbeListCacheTopK =
    copy(list = newChildren(0), qv = newChildren(1), ids = newChildren(2),
      flat = newChildren(3), norms = newChildren(4), dim = newChildren(5))
}
object ProbeListCacheTopK {
  final class Entry(val listId: Int, val ids: Array[Long],
                    val flat: Array[Float], val norms: Array[Double])
  val cache = new ThreadLocal[Entry]
}

object ProbeAnnSpillDecomp {

  // per-stage: (name, numTasks, durations ms, shuffle read/write bytes)
  private val stages = scala.collection.mutable.LinkedHashMap
    .empty[Int, (String, scala.collection.mutable.ArrayBuffer[Long], Array[Long])]

  private class L extends SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val e = stages.getOrElseUpdate(t.stageId,
        ("", scala.collection.mutable.ArrayBuffer.empty[Long], Array(0L, 0L)))
      e._2 += t.taskInfo.duration
      if (t.taskMetrics != null) {
        e._3(0) += t.taskMetrics.shuffleReadMetrics.totalBytesRead
        e._3(1) += t.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages.get(s.stageInfo.stageId).foreach { e =>
        stages(s.stageInfo.stageId) =
          (s.stageInfo.name.takeWhile(_ != '\n').take(90), e._2, e._3)
      }
    }
  }

  private def dumpStages(tag: String): Unit = synchronized {
    println(s"== stages [$tag] (top by total task time) ==")
    stages.toSeq
      .map { case (id, (name, ds, sh)) =>
        val sorted = ds.sorted
        (id, name, ds.size, ds.sum, if (ds.isEmpty) 0L else sorted(ds.size / 2),
          if (ds.isEmpty) 0L else sorted.last, sh(0), sh(1))
      }
      .sortBy(-_._4).take(12)
      .foreach { case (id, name, n, sum, med, mx, rd, wr) =>
        println(f"  stage $id%4d  tasks=$n%4d  taskSum=${sum / 1000.0}%8.1fs  " +
          f"med=${med / 1000.0}%6.2fs max=${mx / 1000.0}%6.2fs  " +
          f"shufR=${rd / 1e6}%8.1fMB shufW=${wr / 1e6}%8.1fMB  $name")
      }
    stages.clear()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-spill-decomp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-decomp-wh-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new L)
    val raised = graft.core.HeapAgg.raisedClone(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decomp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      dumpStages(label); r
    }

    // same data as the ScaleProbeSpec sf10 rows
    val embDir = "/tmp/graft-decomp-emb"
    spark.range(1000000).selectExpr("id AS vec_id",
      "transform(sequence(0,63), j -> CAST(sin((id % 20000) * (j+1)) " +
        "+ 0.001*sin(id*(j+1)) AS FLOAT)) AS embedding")
      .write.mode("overwrite").parquet(embDir)
    val emb = raised.read.parquet(embDir)
    val q10 = emb.where(col("vec_id") % 5 === 0)
    val c10 = emb.where(col("vec_id") % 5 =!= 0)
    val cents = graft.ops.Similarity.ivfCentroids(c10, nlist = 256)
    val bc = raised.sparkContext.broadcast(cents)
    val feed = "/tmp/graft-decomp-feed"
    q10.select(col("vec_id"), col("embedding"),
        (lit("2024-01-01 00:00:00").cast("timestamp") + make_dt_interval(
          lit(0), lit(0), lit(0), pmod(col("vec_id"), lit(7200)))).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(feed)
    stages.clear()

    // ---- batch analogs of the spill tier's pieces ----
    import raised.implicits._
    val corp = c10.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (graft.ops.Similarity.nearestCentroid(v, bc.value), id, v) }
      .toDF("__list", "b", "__bv")
    val packed = corp.select(col("__list").cast("int"), col("b"), col("__bv"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .mapGroups { (l, it) =>
        val items = it.toArray
        val n = items.length
        var dim = 0
        var i = 0
        while (i < n) { if (items(i)._3.length > dim) dim = items(i)._3.length; i += 1 }
        val ids = new Array[Long](n)
        val flat = new Array[Float](n * dim)
        val norms = new Array[Double](n)
        i = 0
        while (i < n) {
          val v = items(i)._3
          ids(i) = items(i)._2
          System.arraycopy(v, 0, flat, i * dim, v.length)
          norms(i) = graft.ops.Similarity.normP(v)
          i += 1
        }
        (l, ids, flat, norms, dim)
      }
      .toDF("__list", "__ids", "__flat", "__norms", "__dim")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("A fold build + persist (corpus assign + pack, one-time)") {
      packed.count()
    }
    val routed = q10
      .select(col("vec_id").cast("long"), col("embedding"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("ts"))
      .repartition(raised.sparkContext.defaultParallelism)
      .as[(Long, Array[Float], java.sql.Timestamp)]
      .flatMap { case (id, v, ts) =>
        graft.ops.Similarity.nearestCentroids(v, bc.value, 8).iterator
          .map(c => (c, id, v, ts))
      }
      .toDF("__list", "q", "__qv", "ts")
    t("B join only, no kernel (route + join, project __dim)") {
      routed.join(packed, Seq("__list")).select(col("q"), col("__dim"))
        .agg(sum(col("__dim"))).head()
    }
    import org.apache.spark.sql.graft.SqlBridge
    val topHits = SqlBridge.column(graft.functions.AnnListTopK(
      SqlBridge.expression(col("__list")),
      SqlBridge.expression(col("__qv")), SqlBridge.expression(col("__ids")),
      SqlBridge.expression(col("__flat")), SqlBridge.expression(col("__norms")),
      SqlBridge.expression(col("__dim")), 5))
    t("C join + cached-primitive kernel + explode (the r18 spill scoring plan, batch)") {
      routed.join(packed, Seq("__list"))
        .select(col("q"), col("ts"), explode(topHits).as("__hit"))
        .count()
    }
    // kernel work distributed by QUERY instead of by list: broadcast-map
    // scoring analog (what the broadcast tier does), batch form
    val lists = corp.select(col("__list").cast("int"), col("b"), col("__bv"))
      .as[(Int, Long, Array[Float])].collect()
      .groupBy(_._1)
      .map { case (l, rows) =>
        val n = rows.length
        var dim = 0
        var i = 0
        while (i < n) { if (rows(i)._3.length > dim) dim = rows(i)._3.length; i += 1 }
        val ids = new Array[Long](n)
        val flat = new Array[Float](n * dim)
        val norms = new Array[Double](n)
        i = 0
        while (i < n) {
          val v = rows(i)._3
          ids(i) = rows(i)._2
          System.arraycopy(v, 0, flat, i * dim, v.length)
          norms(i) = graft.ops.Similarity.normP(v)
          i += 1
        }
        l -> (ids, flat, norms, dim)
      }
    val bcLists = raised.sparkContext.broadcast(lists)
    t("D broadcast-map scoring analog (kernel distributed by query)") {
      q10.select(col("vec_id").cast("long"), col("embedding"))
        .repartition(raised.sparkContext.defaultParallelism)
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val ls = bcLists.value
          it.flatMap { case (q, vq) =>
            val nq = graft.ops.Similarity.normP(vq)
            val top = new graft.ops.Similarity.TopK(5)
            graft.ops.Similarity.nearestCentroids(vq, bc.value, 8).foreach { c =>
              ls.get(c).foreach { case (ids, flat, norms, dim) =>
                graft.functions.AnnListTopK.scoreInto(top, vq, nq, ids, flat, norms, dim)
              }
            }
            top.iterator.map { case (b, cos) => (q, b, cos) }
          }
        }.count()
    }
    // ---- candidate squeezes, batch analogs ----
    // C4: skew fix only — one list per partition (256 partitions), same
    // in-place kernel
    val nParts = 256
    t("C4 join + in-place kernel, repartitioned one-list-per-partition") {
      routed.repartition(nParts, col("__list"))
        .join(packed.repartition(nParts, col("__list")), Seq("__list"))
        .select(col("q"), col("ts"), explode(topHits).as("__hit"))
        .count()
    }
    // C5: per-task LIST CACHE — copy each list's arrays to primitives once
    // per (task, list), score every joined query row at primitive speed
    val cachedHits = SqlBridge.column(ProbeListCacheTopK(
      SqlBridge.expression(col("__list")),
      SqlBridge.expression(col("__qv")), SqlBridge.expression(col("__ids")),
      SqlBridge.expression(col("__flat")), SqlBridge.expression(col("__norms")),
      SqlBridge.expression(col("__dim")), 5))
    t("C5 join + list-cached primitive kernel (32 partitions)") {
      routed.join(packed, Seq("__list"))
        .select(col("q"), col("ts"), explode(cachedHits).as("__hit"))
        .count()
    }
    t("C6 join + list-cached primitive kernel + one-list-per-partition") {
      routed.repartition(nParts, col("__list"))
        .join(packed.repartition(nParts, col("__list")), Seq("__list"))
        .select(col("q"), col("ts"), explode(cachedHits).as("__hit"))
        .count()
    }
    packed.unpersist()

    // ---- the two full streaming tiers, for reference on this host ----
    def annStream(label: String, bcBytes: Long): Unit = t(label) {
      val qs = raised.readStream
        .schema(raised.read.parquet(feed).schema).parquet(feed)
      val hits = graft.streaming.Streams.streamingAnnTopK(qs, c10, cents,
        k = 5, nprobe = 8, windowLen = "1 minute", watermark = "1 minute",
        maxBroadcastBytes = bcBytes)
      hits.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-decomp-cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      graft.streaming.ServingCache.releaseAll()
    }
    annStream("E full spill tier stream (reference 48.7 s)", 0L)
    annStream("F full broadcast tier stream (reference 24.0 s)", 1L << 32)

    // ADC + rerank spill twins with the same cache/granularity treatment
    val books = graft.ops.Pq.residualCodebooks(c10, cents, m = 8, k = 16)
    graft.ops.Pq.savePqIndex(raised, c10, cents, books, "decomp_adc_idx")
    val adcIdx = graft.ops.Pq.loadPqIndex(raised, "decomp_adc_idx")
    def adcStream(label: String, bcBytes: Long): Unit = t(label) {
      val qs = raised.readStream
        .schema(raised.read.parquet(feed).schema).parquet(feed)
      val hits = graft.streaming.Streams.streamingAnnAdcTopK(qs, adcIdx,
        cents, books, k = 5, nprobe = 8, windowLen = "1 minute",
        watermark = "1 minute", maxBroadcastBytes = bcBytes)
      hits.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-decomp-cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      graft.streaming.ServingCache.releaseAll()
    }
    adcStream("G ADC spill tier stream (reference 10.8 s)", 0L)
    def rerankStream(label: String, bcBytes: Long): Unit = t(label) {
      val qs = raised.readStream
        .schema(raised.read.parquet(feed).schema).parquet(feed)
      val hits = graft.streaming.Streams.streamingAnnRerankTopK(qs, adcIdx,
        c10, cents, books, k = 5, shortlist = 50, nprobe = 8,
        windowLen = "1 minute", watermark = "1 minute",
        maxBroadcastBytes = bcBytes)
      hits.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-decomp-cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      graft.streaming.ServingCache.releaseAll()
    }
    rerankStream("H rerank spill shortlist stream (reference 23.4 s)", 0L)
    graft.materialize.SessionCatalogWarehouse.dropAny(raised, "decomp_adc_idx")

    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(embDir))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(feed))
    spark.stop()
  }
}
