package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** DIFFERENTIAL properties for the STREAMING RESUME contracts — the
  * correctness surfaces where a re-run, restart, or compaction must
  * converge to the same state a single straight-line pass would produce.
  * Randomized inputs with fixed seeds, checked against in-test reference
  * folds (same discipline as [[OperatorPropertySpec]]); these are the
  * contracts the r12 fixes touch: broker-ingest offset resume, CDC
  * overlay restart after compaction, and the incremental sessionizer's
  * sentinel-replay double-run. */
class StreamingResumePropertySpec extends AnyFunSuite {
  import SparkTestSession._

  test("broker ingest resume: re-runs land zero duplicates, deltas land exactly once") {
    import spark.implicits._
    import graft.model.{Asset, AssetType, Column}
    import graft.sources.Ingest
    import graft.streaming.{StreamSource, StreamSources}
    import graft.materialize.SessionCatalogWarehouse

    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val envSchema = Seq((Array[Byte](0), Array[Byte](0), "t", 0, 0L, ts, 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType").schema
    val stage = java.nio.file.Files.createTempDirectory("resume-broker").toString
    val mock = new StreamSource {
      override val scheme = "resumekafka"
      override def load(s: org.apache.spark.sql.SparkSession, uri: java.net.URI,
                        options: Map[String, String]) =
        s.readStream.schema(envSchema).parquet(s"$stage${uri.getPath}")
    }
    StreamSources.register(mock)
    val wh = new SessionCatalogWarehouse(spark)

    for (seed <- Seq(13, 77)) {
      val rnd = new scala.util.Random(seed)
      var offset = 0L
      def envBatch(n: Int): org.apache.spark.sql.DataFrame = {
        val rows = (0 until n).map { _ =>
          offset += 1
          val id = offset
          val v = s"v${rnd.nextInt(1000)}"
          (s"k$id".getBytes("UTF-8"),
            s"""{"id": $id, "v": "$v"}""".getBytes("UTF-8"),
            "t", 0, id, ts, 0)
        }
        rows.toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
      }
      val topic = s"t$seed"
      val target = s"resume_tgt_$seed"
      SessionCatalogWarehouse.dropAny(spark, target)
      def asset = Asset(name = target, assetType = AssetType.Ingest,
        columns = Seq(Column("id", "BIGINT", primaryKey = true), Column("v", "STRING")),
        parameters = Map("source_uri" -> s"resumekafka://broker/$topic",
          "incremental_strategy" -> "append"))

      val n1 = 20 + rnd.nextInt(60)
      envBatch(n1).write.mode("overwrite").parquet(s"$stage/$topic")
      Ingest.run(wh, asset)
      assert(spark.table(target).count() == n1)

      // idle re-run: committed offsets mean ZERO new rows, not a re-drain
      Ingest.run(wh, asset)
      assert(spark.table(target).count() == n1,
        s"seed $seed: idle re-run duplicated rows")

      // delta lands exactly once, old rows exactly once — full multiset
      val n2 = 10 + rnd.nextInt(40)
      envBatch(n2).write.mode("append").parquet(s"$stage/$topic")
      Ingest.run(wh, asset)
      val got = spark.table(target).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got.map(_._1) == (1L to (n1 + n2)).toSeq,
        s"seed $seed: resume landed ${got.size} rows, ids ${got.map(_._1).take(5)}…")
      SessionCatalogWarehouse.dropAny(spark, target)
    }
  }

  test("CDC overlay restart after compaction converges to the straight-line LWW fold") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.materialize.SessionCatalogWarehouse

    val wh = new SessionCatalogWarehouse(spark)
    val w = Window.partitionBy(col("id")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")

    for (seed <- Seq(5, 31, 101)) {
      val rnd = new scala.util.Random(seed)
      val state = s"resume_cdc_state_$seed"
      SessionCatalogWarehouse.dropAny(spark, state)
      val nKeys = 40 + rnd.nextInt(40)
      var seq = 0L
      val all = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      def batch(): org.apache.spark.sql.DataFrame = {
        // mostly LOCALIZED batches (narrow key range → chain folds at
        // maxOverlays=2), occasionally WIDE (→ full compaction): both
        // compaction tiers run before AND after the restart below
        val wide = rnd.nextInt(4) == 0
        val lo = if (wide) 0 else rnd.nextInt(nKeys - 5)
        val hi = if (wide) nKeys else math.min(nKeys, lo + 5)
        val rows = (0 until 5 + rnd.nextInt(25)).map { _ =>
          seq += 1
          val id = (lo + rnd.nextInt(hi - lo)).toLong
          val op = if (rnd.nextInt(5) == 0) "d" else Seq("c", "u", "r")(rnd.nextInt(3))
          (id, s"val$seq", op, seq)
        }
        rows.foreach(all += _)
        rows.toDF("id", "v", "op", "seq")
      }
      // phase 1: one writer instance, enough batches to exercise chain
      // fold and (probabilistically) full compaction
      val w1 = new Streams.OverlayStateWriter(Seq("id"), Some(8), maxOverlays = 2)
      (0 until 6).foreach { _ =>
        w1.upsert(wh, state, latestOf(batch()), latestOf, Nil, Nil)
      }
      // phase 2: a FRESH writer = a restarted stream — the composition must
      // be recovered from the view text alone (deriveComp), mid-chain
      val w2 = new Streams.OverlayStateWriter(Seq("id"), Some(8), maxOverlays = 2)
      (0 until 6).foreach { _ =>
        w2.upsert(wh, state, latestOf(batch()), latestOf, Nil, Nil)
      }
      // reference: straight-line LWW fold over the WHOLE op stream — per
      // key the max (seq, op) row wins, tombstones included (seq is unique
      // by construction, so the winner is unambiguous)
      val expect = all.groupBy(_._1).map { case (_, ops) =>
        ops.maxBy(o => (o._4, o._3))
      }.toSet
      val got = wh.table(state).select("id", "v", "op", "seq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(got == expect, s"seed $seed: state diverged after restart — " +
        s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
      SessionCatalogWarehouse.dropAny(spark, state)
    }
  }

  test("incremental sessionizer double-run: identical visits both times, equal to the fold") {
    import java.sql.Timestamp
    for (seed <- Seq(19, 88)) {
      val rnd = new scala.util.Random(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"resume-visits-$seed")
      val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime
      val gapUs = 30L * 60L * 1000000L
      val rows = (0 until 600).map { i =>
        val step = if (rnd.nextBoolean()) rnd.nextInt(1700) else 1900 + rnd.nextInt(4000)
        (i.toLong, new Timestamp(base + i.toLong * step * 1000L),
          rnd.nextInt(9).toLong, "e", rnd.nextInt(500) / 100.0, "")
      }
      spark.createDataFrame(rows)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(dir.toString)

      def run(name: String): Set[(Long, Long, Long, Long, Long)] = {
        val inc = Streams.userVisitsComplete(spark, dir.toString, incremental = true)
        val q = inc.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
      }
      // run TWICE: the second run reuses the content-keyed sentinel dir
      // (the `touch` branch) — both runs must flush every open visit and
      // agree exactly
      val first = run(s"t_resume_visits_a_$seed")
      val second = run(s"t_resume_visits_b_$seed")
      assert(first == second,
        s"seed $seed: double-run diverged — a=${(first -- second).take(3)} b=${(second -- first).take(3)}")

      // straight-line reference fold (same rule as the batch sessionizer
      // property: per-user sort by micros, strict >gap split, integer cents)
      val expect = rows.groupBy(_._3).flatMap { case (user, evs) =>
        val sorted = evs.map(e => (e._2.getTime * 1000L, math.round(e._5 * 100))).sortBy(_._1)
        val visits = scala.collection.mutable.ArrayBuffer.empty[List[(Long, Long)]]
        sorted.foreach { e =>
          if (visits.nonEmpty && e._1 - visits.last.last._1 <= gapUs)
            visits(visits.size - 1) = visits.last :+ e
          else visits += List(e)
        }
        visits.map(v => (user, v.size.toLong, v.map(_._2).sum, v.head._1, v.last._1))
      }.toSet
      assert(first == expect, s"seed $seed: visits diverged from the fold — " +
        s"missing=${(expect -- first).take(3)} extra=${(first -- expect).take(3)}")
      graft.core.Fs.deleteRecursively(dir)
    }
  }

  test("hamming near-dup resume: batch 2 resumes the checkpoint, flags only vs the frozen index, no duplicates") {
    import spark.implicits._
    import graft.ops.Dedup
    import graft.streaming.Streams
    import graft.materialize.SessionCatalogWarehouse
    Seq("rsm_sig_idx", "rsm_hnd_sink").foreach(t =>
      SessionCatalogWarehouse.dropAny(spark, t))
    val rnd = new scala.util.Random(5)
    def randSig() = rnd.nextLong() & ((1L << 62) - 1)
    val base = Array.fill(40)(randSig())
    val corpus = base.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq
    Dedup.saveSignatureIndex(spark, corpus.toDF("doc_id", "simhash"),
      "rsm_sig_idx", maxHamming = 7, bands = 8, sigBits = 63)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Int) = new java.sql.Timestamp(t0 + sec * 1000L)
    // evens are 2-bit edits of a corpus signature (true near-dups), odds
    // random; a trailing late row advances the watermark so each run
    // closes its own windows
    def mkRows(ids: Range, sec: Int) = ids.map { i =>
      val sig = if (i % 2 == 0) base(i % 40) ^ (1L << (i % 50)) ^ (1L << ((i + 17) % 50))
                else randSig()
      (100L + i, sig, ts(sec + (i % 10)))
    }
    val batch1 = mkRows(0 until 20, 0) :+ ((990L, randSig(), ts(120)))
    val batch2 = mkRows(20 until 40, 180) :+ ((991L, randSig(), ts(600)))
    val feed = java.nio.file.Files.createTempDirectory("rsm-hnd-feed").toString
    val cp = java.nio.file.Files.createTempDirectory("rsm-hnd-cp").toString
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(feed).schema).parquet(feed)
      Streams.runAppendToTable(spark,
        Streams.streamingHammingNearDup(stream,
          Dedup.loadSignatureIndex(spark, "rsm_sig_idx"), maxHamming = 7,
          bands = 8, sigBits = 63, windowLen = "1 minute", watermark = "1 minute"),
        "rsm_hnd_sink", checkpoint = Some(cp))
    }
    batch1.toDF("doc_id", "simhash", "ts").coalesce(1)
      .write.mode("append").parquet(feed)
    runOnce()
    assert(spark.table("rsm_hnd_sink").count() > 0,
      "run 1 must flag the planted batch-1 near-dups")
    batch2.toDF("doc_id", "simhash", "ts").coalesce(1)
      .write.mode("append").parquet(feed)
    runOnce() // resumes the SAME checkpoint: only the new file is processed
    val got = spark.table("rsm_hnd_sink")
      .select("a", "b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == got.distinct.length, "resume must never duplicate a flag")
    // expected: brute-force cross-hamming for every stream row whose
    // 1-minute window closed under the FINAL watermark (max ts - 1 min)
    val all = batch1 ++ batch2
    val wmFinal = all.map(_._3.getTime).max - 60000L
    val expected = (for {
      (a, sa, _) <- all.filter { case (_, _, t) =>
        t.getTime / 60000L * 60000L + 60000L <= wmFinal }
      (b, sb) <- corpus
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 7 && a != b
    } yield (a, b, h)).toSet
    assert(got.toSet == expected,
      s"missing=${(expected -- got.toSet).take(4)} extra=${(got.toSet -- expected).take(4)}")
    assert(expected.exists(_._1 >= 120L), "batch-2 near-dups must be flagged after resume")
    Seq("rsm_sig_idx", "rsm_hnd_sink").foreach(t =>
      SessionCatalogWarehouse.dropAny(spark, t))
  }
}
