package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DIFFERENTIAL property tests at the operator level: generated inputs,
  * one Spark job per seed, outputs checked row-for-row against a
  * straight-line in-test reference implementation. Complements the
  * fixed-fixture specs (which pin known shapes) and the DuckDB oracle
  * (which pins one dataset): randomized inputs walk the edge cases no
  * fixture author thought of — tie-heavy timestamps, duplicate
  * signatures, single-event visits, exactly-at-threshold counts. Seeds
  * are fixed so failures reproduce. */
class OperatorPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  test("batch sessionizer matches a straight-line fold on random event sets") {
    import java.sql.Timestamp
    val gapMinutes = 30
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
      // tie-heavy: timestamps snap to a 10-min lattice so equal-ts events
      // and exactly-at-gap spacings both occur; values exercise rounding
      val rows = (0 until 1500).map { i =>
        val user = rnd.nextInt(40).toLong
        val ts = new Timestamp(base + rnd.nextInt(400) * 600000L)
        (i.toLong, ts, user, "e", rnd.nextInt(1000) / 100.0, "")
      }
      val df = spark.createDataFrame(rows)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = graft.ops.Sessions.visits(df, gapMinutes).collect()
        .map(v => (v.user_id, v.n_events, v.total_cents, v.first_us, v.last_us)).toSet

      // reference: per-user sort by micros, strict >gap split, integer cents
      val expect = rows.groupBy(_._3).flatMap { case (user, evs) =>
        val sorted = evs.map(e => (e._2.getTime * 1000L,
          math.round(e._5 * 100))).sortBy(_._1)
        val visits = scala.collection.mutable.ArrayBuffer.empty[List[(Long, Long)]]
        sorted.foreach { e =>
          if (visits.nonEmpty && e._1 - visits.last.last._1 <= gapUs)
            visits(visits.size - 1) = visits.last :+ e
          else visits += List(e)
        }
        visits.map(v => (user, v.size.toLong, v.map(_._2).sum,
          v.head._1, v.last._1))
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${got -- expect} " +
        s"only-expect=${expect -- got}")
    }
  }

  test("banded hamming join matches brute force on random signature sets") {
    import spark.implicits._
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      def randSig(): Long = rnd.nextLong() & ((1L << 60) - 1)
      def flip(s: Long, k: Int): Long =
        (0 until k).foldLeft(s)((acc, _) => acc ^ (1L << rnd.nextInt(60)))
      // clusters of near-identical signatures + exact-duplicate cliques +
      // uniform noise — the three regimes the distinct-sig join must agree
      // with brute force on
      val centers = Array.fill(12)(randSig())
      val sigs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var id = 0L
      centers.foreach { c =>
        (0 until 2 + rnd.nextInt(6)).foreach { _ =>
          sigs += ((id, flip(c, rnd.nextInt(10)))); id += 1
        }
        // exact-duplicate clique on the center itself
        (0 until rnd.nextInt(4)).foreach { _ => sigs += ((id, c)); id += 1 }
      }
      (0 until 150).foreach { _ => sigs += ((id, randSig())); id += 1 }
      val df = sigs.toSeq.toDF("doc_id", "simhash")
      val maxH = 1 + rnd.nextInt(7)
      val got = graft.ops.Dedup.hammingPairs(df, maxHamming = maxH, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = (for {
        (a, sa) <- sigs; (b, sb) <- sigs
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
      assert(got == brute, s"seed $seed maxH=$maxH: " +
        s"missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("exact heavy hitters match naive counting on random zipf-ish streams") {
    import spark.implicits._
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val items = (0 until 20000).map { _ =>
        // zipf-ish over ~400 distinct items with a few sharp heads
        val r = rnd.nextDouble()
        if (r < 0.3) s"head${rnd.nextInt(4)}"
        else s"tail${(1.0 / (rnd.nextDouble() + 0.0026)).toInt}"
      }
      val phi = 0.01
      val df = items.toDF("item").repartition(8)
      val got = graft.ops.Sketches.heavyHitters(df, "item", phi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val counts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val minCount = math.ceil(phi * items.size).toLong.max(1L)
      val expect = counts.filter(_._2 >= minCount).toSet
      assert(got == expect, s"seed $seed: only-got=${got -- expect} " +
        s"only-expect=${expect -- got}")
    }
  }
}
