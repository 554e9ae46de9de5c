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
      val gotRows = graft.ops.Dedup.hammingPairs(df, maxHamming = maxH, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val got = gotRows.toSet
      // each-pair-exactly-once is part of the contract — a set compare
      // would hide duplicate emission
      assert(gotRows.size == got.size,
        s"seed $seed maxH=$maxH: duplicated pairs emitted")
      val brute = (for {
        (a, sa) <- sigs; (b, sb) <- sigs
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
      assert(got == brute, s"seed $seed maxH=$maxH: " +
        s"missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("hamming join: an id carrying two within-distance signatures emits no self-pair") {
    import spark.implicits._
    // the distinct() in hammingPairs tolerates one id appearing with TWO
    // distinct signatures (an accidental union of signature batches); when
    // both sigs fall within maxHamming of each other the two expansion
    // joins meet on the same id — the degenerate a == b row must be
    // filtered, and genuine cross-id pairs must survive untouched
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      def randSig(): Long = rnd.nextLong() & ((1L << 60) - 1)
      val maxH = 2 + rnd.nextInt(4)
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      (0 until 10).foreach { i =>
        val s = randSig()
        // id 100+i carries s AND a 1-bit flip of s: within maxHamming
        rows += ((100L + i, s))
        rows += ((100L + i, s ^ (1L << rnd.nextInt(60))))
        // a neighbor id near the same signature — the pair that must stay
        rows += ((200L + i, s ^ (1L << rnd.nextInt(60))))
      }
      (0 until 50).foreach(j => rows += ((j.toLong, randSig())))
      val got = graft.ops.Dedup.hammingPairs(
        rows.toSeq.toDF("doc_id", "simhash"), maxHamming = maxH, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(!got.exists(p => p._1 == p._2),
        s"seed $seed: self-pairs emitted: ${got.filter(p => p._1 == p._2).toSeq}")
      // cross-id coverage: every (a, b) with some sig-pair within maxH is
      // present (hamming values may differ per sig-pair, so compare id sets)
      val expectIds = (for {
        (a, sa) <- rows; (b, sb) <- rows
        if a != b && java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (math.min(a, b), math.max(a, b))).toSet
      val gotIds = got.map(p => (p._1, p._2)).toSet
      assert(gotIds == expectIds, s"seed $seed maxH=$maxH: " +
        s"missing=${expectIds -- gotIds} extra=${gotIds -- expectIds}")
    }
  }

  test("OPH signatures match a straight-line one-permutation + densification fold") {
    import spark.implicits._
    // pins the densification ARITHMETIC, not just recall: every bin's
    // routed minimum, the cyclic rightward borrow, the hops·C offset, and
    // the all-empty (gramless) signature are checked value-for-value
    // against an independent in-test implementation of Li/Owen/Zhang OPH
    // with Shrivastava-Li rotation
    val RotC = 0x9e3779b97f4a7c15L
    def hash64(gram: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xffL))
    }
    def refSig(grams: Set[String], k: Int): Seq[Long] = {
      val mins = Array.fill(k)(Long.MaxValue)
      grams.foreach { g =>
        val x = hash64(g)
        val bin = java.lang.Math.floorMod(x, k.toLong).toInt
        if (x < mins(bin)) mins(bin) = x
      }
      val empty = mins.map(_ == Long.MaxValue)
      if (empty.exists(!_)) {
        (0 until k).foreach { i =>
          if (empty(i)) {
            var hops = 1
            var j = (i + 1) % k
            while (empty(j)) { j = (j + 1) % k; hops += 1 }
            mins(i) = mins(j) + hops.toLong * RotC
          }
        }
      }
      mins.toSeq
    }
    def norm(s: String) = s.toLowerCase.trim.replaceAll("\\s+", " ")
    def grams3(s: String): Set[String] = {
      val w = norm(s).split(' ').filter(_.nonEmpty)
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (seed <- Seq(4, 29)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(40)(i => s"w$i")
      // lengths skewed SHORT on purpose: docs with fewer grams than bins
      // are the densification regime (consecutive empty bins, wraparound);
      // plus gramless docs (< 3 words) for the all-MaxValue signature
      val docs = (0 until 80).map { i =>
        val len = rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val k = Seq(8, 16, 32)(rnd.nextInt(3))
      val got = graft.ops.Dedup.minhashSignaturesOph(
        graft.ops.Dedup.shingleArray(docs.toDF("doc_id", "text")), k)
        .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
      docs.foreach { case (id, text) =>
        val expect = refSig(grams3(text), k)
        assert(got(id) == expect,
          s"seed $seed k=$k doc $id: got ${got(id)} expect $expect (text '$text')")
      }
    }
  }

  test("jaccard pairs (uncapped and capped) match set arithmetic on random corpora") {
    import spark.implicits._
    def norm(s: String) = s.toLowerCase.trim.replaceAll("\\s+", " ")
    def grams(s: String, n: Int): Set[String] = {
      val w = norm(s).split(' ').filter(_.nonEmpty)
      if (w.length < n) Set.empty
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    for (seed <- Seq(2, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(60)(i => s"w$i")
      def doc(): String =
        Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val originals = Seq.fill(60)(doc())
      // mutations: drop/replace a few words — the near-dup regime around
      // the threshold; plus verbatim duplicates and sub-n-word docs
      val mutated = originals.take(25).map { d =>
        val w = d.split(' ').toBuffer
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          val i = rnd.nextInt(w.length)
          if (rnd.nextBoolean() && w.length > 3) w.remove(i)
          else w(i) = vocab(rnd.nextInt(vocab.length))
        }
        w.mkString(" ")
      }
      val texts = originals ++ mutated ++ originals.take(5) ++ Seq("one two", "")
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")

      val gsets = docs.map { case (id, t) => id -> grams(t, 3) }.toMap
      def jac(a: Set[String], b: Set[String]): Double =
        if (a.isEmpty && b.isEmpty) 0.0
        else a.intersect(b).size.toDouble / a.union(b).size
      def refPairs(eligible: String => Boolean): Map[(Long, Long), Double] =
        (for {
          (a, ga) <- gsets.toSeq; (b, gb) <- gsets.toSeq
          if a < b && ga.intersect(gb).exists(eligible) && jac(ga, gb) >= 0.5
        } yield (a, b) -> jac(ga, gb)).toMap

      def check(got: Array[org.apache.spark.sql.Row],
                expect: Map[(Long, Long), Double], label: String): Unit = {
        val g = got.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        // one row per pair — a toMap compare alone would mask duplicates
        assert(got.length == g.size, s"seed $seed $label: duplicated pairs emitted")
        assert(g.keySet == expect.keySet, s"seed $seed $label: " +
          s"missing=${expect.keySet -- g.keySet} extra=${g.keySet -- expect.keySet}")
        g.foreach { case (k, v) =>
          assert(math.abs(v - expect(k)) < 1e-6, s"seed $seed $label $k: $v vs ${expect(k)}")
        }
      }
      check(graft.ops.Dedup.jaccardPairs(df, n = 3, threshold = 0.5).collect(),
        refPairs(_ => true), "uncapped")
      // capped: candidates must share an ELIGIBLE (df <= cap) gram; the
      // verbatim-duplicate clique makes several grams sit exactly at the cap
      val cap = 5
      val dfCount = gsets.values.toSeq.flatMap(_.toSeq)
        .groupBy(identity).map { case (k, v) => k -> v.size }
      check(graft.ops.Dedup.jaccardPairs(df, n = 3, threshold = 0.5,
          maxDocFreq = cap).collect(),
        refPairs(g => dfCount(g) <= cap), "capped")
      // prefix-filtered form: IDENTICAL contract to capped — the
      // heavy-corrected prefix must lose no pair, including those whose
      // kept overlap is minimal but heavy overlap carries them over the
      // threshold (the regime the cmin correction exists for)
      check(graft.ops.Dedup.jaccardPairsPrefix(df, n = 3, threshold = 0.5,
          maxDocFreq = cap).collect(),
        refPairs(g => dfCount(g) <= cap), "prefix")

      // batch-vs-corpus: docs split 30/70, eligibility = CORPUS-side df
      val (batchDocs, corpusDocs) = docs.partition(_._1 % 10 < 3)
      val corpusDf = corpusDocs.flatMap(d => gsets(d._1).toSeq)
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val againstExpect = (for {
        (a, _) <- batchDocs; (b, _) <- corpusDocs
        shared = gsets(a).intersect(gsets(b))
        if shared.exists(g => corpusDf(g) <= cap) && jac(gsets(a), gsets(b)) >= 0.5
      } yield (a, b) -> jac(gsets(a), gsets(b))).toMap
      check(graft.ops.Dedup.jaccardAgainst(
          batchDocs.toDF("doc_id", "text"), corpusDocs.toDF("doc_id", "text"),
          n = 3, threshold = 0.5, maxDocFreq = cap).collect(),
        againstExpect, "against")
      // two-sided prefix form: IDENTICAL contract to `against` — including
      // batch docs whose texts carry grams the corpus never saw (sentinel
      // df: sorts last, dropped after slicing) and pairs whose corpus-side
      // heavy overlap carries them over the threshold
      check(graft.ops.Dedup.jaccardAgainstPrefix(
          batchDocs.toDF("doc_id", "text"), corpusDocs.toDF("doc_id", "text"),
          n = 3, threshold = 0.5, maxDocFreq = cap).collect(),
        againstExpect, "against-prefix")
    }
  }

  test("containment pairs match set arithmetic on subset-heavy corpora") {
    import spark.implicits._
    def norm(s: String) = s.toLowerCase.trim.replaceAll("\\s+", " ")
    def grams(s: String): Set[String] = {
      val w = norm(s).split(' ').filter(_.nonEmpty)
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(60)(i => s"w$i")
      def doc(len: Int): String =
        Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val originals = Seq.fill(40)(doc(10 + rnd.nextInt(30)))
      // the containment regime: contiguous slices (containment exactly 1.0
      // at any size disparity) and lightly mutated slices (near-threshold)
      val slices = originals.take(20).map { d =>
        val w = d.split(' ')
        val len = 4 + rnd.nextInt(w.length - 4)
        val start = rnd.nextInt(w.length - len + 1)
        w.slice(start, start + len).mkString(" ")
      }
      val mutatedSlices = slices.take(10).map { s =>
        val w = s.split(' ').toBuffer
        w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.length))
        w.mkString(" ")
      }
      val texts = originals ++ slices ++ mutatedSlices ++
        originals.take(3) ++ Seq("one two", "")
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val gsets = docs.map { case (id, t) => id -> grams(t) }.toMap
      def cont(a: Set[String], b: Set[String]): Double =
        a.intersect(b).size.toDouble / math.min(a.size, b.size)
      def refPairs(eligible: String => Boolean): Map[(Long, Long), Double] =
        (for {
          (a, ga) <- gsets.toSeq; (b, gb) <- gsets.toSeq
          if a < b && ga.intersect(gb).exists(eligible) && cont(ga, gb) >= 0.8
        } yield (a, b) -> cont(ga, gb)).toMap
      def check(got: Array[org.apache.spark.sql.Row],
                expect: Map[(Long, Long), Double], label: String): Unit = {
        val g = got.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        assert(got.length == g.size, s"seed $seed $label: duplicated pairs emitted")
        assert(g.keySet == expect.keySet, s"seed $seed $label: " +
          s"missing=${expect.keySet -- g.keySet} extra=${g.keySet -- expect.keySet}")
        g.foreach { case (k, v) =>
          assert(math.abs(v - expect(k)) < 1e-6, s"seed $seed $label $k: $v vs ${expect(k)}")
        }
      }
      val cap = 5
      val dfCount = gsets.values.toSeq.flatMap(_.toSeq)
        .groupBy(identity).map { case (k, v) => k -> v.size }
      check(graft.ops.Dedup.containmentPairs(df, n = 3, threshold = 0.8,
          maxDocFreq = cap).collect(),
        refPairs(g => dfCount(g) <= cap), "capped")
      // asymmetric-prefix form: IDENTICAL contract to capped — the
      // smaller-side prefix must lose no pair, including the extreme size
      // disparities (a 4-gram slice inside a 30-gram original) where the
      // smaller doc's cmin bound is doing all the pruning
      check(graft.ops.Dedup.containmentPairsPrefix(df, n = 3, threshold = 0.8,
          maxDocFreq = cap).collect(),
        refPairs(g => dfCount(g) <= cap), "prefix")
      // a loose cap admits every gram — the pure uncapped contract
      check(graft.ops.Dedup.containmentPairs(df, n = 3, threshold = 0.8,
          maxDocFreq = 10000).collect(),
        refPairs(_ => true), "loose-cap")
      // batch-vs-corpus: eligibility = CORPUS-side df; a batch doc's grams
      // unseen by the corpus generate no candidates, heavy corpus overlap
      // must still count toward the exact score
      val (batchDocs, corpusDocs) = docs.partition(_._1 % 10 < 3)
      val corpusDf = corpusDocs.flatMap(d => gsets(d._1).toSeq)
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val againstExpect = (for {
        (a, _) <- batchDocs; (b, _) <- corpusDocs
        shared = gsets(a).intersect(gsets(b))
        if shared.exists(g => corpusDf.getOrElse(g, 0) > 0 && corpusDf(g) <= cap) &&
          cont(gsets(a), gsets(b)) >= 0.8
      } yield (a, b) -> cont(gsets(a), gsets(b))).toMap
      check(graft.ops.Dedup.containmentAgainst(
          batchDocs.toDF("doc_id", "text"), corpusDocs.toDF("doc_id", "text"),
          n = 3, threshold = 0.8, maxDocFreq = cap).collect(),
        againstExpect, "against")
      // two-sided prefix form: IDENTICAL contract to `against` — either
      // side of a pair may be the smaller (a short batch doc subsumed by a
      // long corpus page AND a short corpus doc quoted inside a long batch
      // doc), and corpus-unseen batch grams hold prefix slots without
      // emitting
      check(graft.ops.Dedup.containmentAgainstPrefix(
          batchDocs.toDF("doc_id", "text"), corpusDocs.toDF("doc_id", "text"),
          n = 3, threshold = 0.8, maxDocFreq = cap).collect(),
        againstExpect, "against-prefix")
    }
  }

  test("group top-k matches per-group sort-and-take on random skewed data") {
    import spark.implicits._
    for (seed <- Seq(5, 41)) {
      val rnd = new scala.util.Random(seed)
      // skewed group sizes (one giant group — the window-shape pathology),
      // heavy score ties to exercise the total-order tiebreak
      val rows = (0 until 3000).map { i =>
        val grp = if (rnd.nextInt(10) < 6) "giant" else s"g${rnd.nextInt(20)}"
        (grp, i.toLong, rnd.nextInt(12).toDouble)
      }
      for (k <- Seq(1, 4, 17)) {
        val got = graft.ops.Sampling.groupTopK(
            rows.toDF("grp", "id", "score").repartition(23),
            Seq("grp"), Seq((-col("score")).as("ns"), col("id").as("i")), k)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .groupBy(_._1).view.mapValues(_.toSeq).toMap
        val expect = rows.groupBy(_._1).view.mapValues(
          _.sortBy { case (_, id, sc) => (-sc, id) }.take(k)).toMap
        assert(got.keySet == expect.keySet, s"seed $seed k $k: group sets differ")
        expect.foreach { case (g, ex) =>
          assert(got(g) == ex, s"seed $seed k $k group $g: ${got(g)} vs $ex")
        }
      }
    }
  }

  test("drift monitors match direct share arithmetic on random snapshots") {
    import spark.implicits._
    for (seed <- Seq(13, 37)) {
      val rnd = new scala.util.Random(seed)
      val nBuckets = 8; val width = 10.0
      // signed metrics + nulls: the clamp and the null filter are part of
      // the contract
      def snap(n: Int): Seq[(Long, Option[Double])] =
        (0 until n).map(i => (i.toLong,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextGaussian() * 30)))
      val a = snap(400); val b = snap(300)
      def bucketOf(m: Double) = math.max(math.min(
        math.floor(m / width).toLong, (nBuckets - 1).toLong), 0L)
      def counts(s: Seq[(Long, Option[Double])]) =
        s.flatMap(_._2).groupBy(bucketOf).view.mapValues(_.size.toLong).toMap

      val caM = counts(a); val cbM = counts(b)
      val na = a.count(_._2.isDefined).toDouble
      val nb = b.count(_._2.isDefined).toDouble
      val expect = (caM.keySet ++ cbM.keySet).map { bk =>
        val pa = (caM.getOrElse(bk, 0L) + 1).toDouble / (na + nBuckets)
        val pb = (cbM.getOrElse(bk, 0L) + 1).toDouble / (nb + nBuckets)
        bk -> ((pa, pb, (pa - pb) * math.log(pa / pb)))
      }.toMap
      val got = graft.diff.DataDiff.distributionDrift(
          a.toDF("id", "m"), b.toDF("id", "m"), "m", width, nBuckets)
        .collect().map(r => r.getLong(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(got.keySet == expect.keySet, s"seed $seed: bucket sets differ")
      expect.foreach { case (bk, (pa, pb, psi)) =>
        val (ga, gb, gp) = got(bk)
        assert(math.abs(ga - pa) < 1e-6 && math.abs(gb - pb) < 1e-6 &&
          math.abs(gp - psi) < 1e-6, s"seed $seed bucket $bk")
      }
      // categorical twin: random value mixes with one-sided values
      val va = (0 until 300).map(i => (i.toLong, s"v${rnd.nextInt(6)}"))
      val vb = (0 until 300).map(i => (i.toLong, s"v${2 + rnd.nextInt(6)}"))
      val cA = va.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cB = vb.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val card = (cA.keySet ++ cB.keySet).size.toDouble
      val expectCat = (cA.keySet ++ cB.keySet).map { v =>
        val pa = (cA.getOrElse(v, 0L) + 1).toDouble / (va.size + card)
        val pb = (cB.getOrElse(v, 0L) + 1).toDouble / (vb.size + card)
        v -> (pa - pb) * math.log(pa / pb)
      }.toMap
      val gotCat = graft.diff.DataDiff.categoricalDrift(
          va.toDF("id", "v"), vb.toDF("id", "v"), "v")
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(gotCat.keySet == expectCat.keySet, s"seed $seed: value sets differ")
      expectCat.foreach { case (v, psi) =>
        assert(math.abs(gotCat(v) - psi) < 1e-6, s"seed $seed value $v") }

      // directional twin: K cosine projections in one pass must match the
      // same per-direction share arithmetic over independently-computed
      // cosines (CosineSim's min-length/zero-norm conventions), and a
      // snapshot against itself is flat on EVERY direction
      val dims = 6; val nDirs = 3; val dBuckets = 10
      def vecs(n: Int): Seq[Array[Float]] =
        (0 until n).map(_ => Array.fill(dims)((rnd.nextGaussian() * 0.7).toFloat))
      val ea = vecs(150); val eb = vecs(120)
      val dirSet = (0 until nDirs).map(_ =>
        Array.fill(dims)((rnd.nextGaussian()).toFloat))
      def cosTo(v: Array[Float], d: Array[Float]): Double = {
        var dot = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
        while (i < dims) {
          dot += v(i).toDouble * d(i).toDouble
          sa += v(i).toDouble * v(i).toDouble
          sb += d(i).toDouble * d(i).toDouble; i += 1
        }
        val den = math.sqrt(sa) * math.sqrt(sb)
        if (den == 0 || den.isNaN) 0.0 else dot / den
      }
      def dBucket(m: Double) = math.max(math.min(
        math.floor(m / (2.0 / dBuckets)).toLong, (dBuckets - 1).toLong), 0L)
      def dCounts(s: Seq[Array[Float]]) = (for { v <- s; (d, di) <- dirSet.zipWithIndex }
        yield (di, dBucket(cosTo(v, d) + 1))).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val cda = dCounts(ea); val cdb = dCounts(eb)
      val expectDir = (cda.keySet ++ cdb.keySet).map { case key @ (di, bk) =>
        val pa = (cda.getOrElse(key, 0L) + 1).toDouble / (ea.size + dBuckets)
        val pb = (cdb.getOrElse(key, 0L) + 1).toDouble / (eb.size + dBuckets)
        (di, bk) -> (pa - pb) * math.log(pa / pb)
      }.toMap
      val gotDir = graft.diff.DataDiff.directionalDrift(
          ea.map(Tuple1(_)).toDF("embedding"), eb.map(Tuple1(_)).toDF("embedding"),
          dirSet, nBuckets = dBuckets)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(4)).toMap
      assert(gotDir.keySet == expectDir.keySet,
        s"seed $seed: (direction, bucket) sets differ")
      expectDir.foreach { case (key, psi) =>
        assert(math.abs(gotDir(key) - psi) < 1e-6, s"seed $seed $key") }
      val flat = graft.diff.DataDiff.directionalDrift(
          ea.map(Tuple1(_)).toDF("embedding"), ea.map(Tuple1(_)).toDF("embedding"),
          dirSet, nBuckets = dBuckets).collect()
      assert(flat.nonEmpty && flat.forall(_.getDouble(4) == 0.0),
        s"seed $seed: self-drift must be flat on every direction")
    }
  }

  test("signature bit drift matches direct per-bit share arithmetic") {
    // the hamming serving tier's drift statistic: per-bit Bernoulli counts
    // through the shared directional smoothing (nBuckets = 2) must equal
    // straight-line per-(bit, value) share arithmetic — including bits
    // where one side is constant (a bucket absent from one snapshot)
    import spark.implicits._
    for (seed <- Seq(11, 29)) {
      val rnd = new scala.util.Random(seed)
      val bits = 12
      // skew the high bits so several are constant on one side
      val sa = Seq.fill(80)(rnd.nextLong() & ((1L << bits) - 1))
      val sb = Seq.fill(60)(rnd.nextLong() & ((1L << 7) - 1))
      def cnt(s: Seq[Long]) =
        (for { b <- 0 until bits; v <- s } yield (b, (v >> b) & 1L))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ca = cnt(sa); val cb = cnt(sb)
      val expect = (ca.keySet ++ cb.keySet).map { key =>
        val pa = (ca.getOrElse(key, 0L) + 1).toDouble / (sa.size + 2)
        val pb = (cb.getOrElse(key, 0L) + 1).toDouble / (sb.size + 2)
        key -> (pa - pb) * math.log(pa / pb)
      }.toMap
      val got = graft.diff.DataDiff.directionalDriftFromCounts(
          graft.diff.DataDiff.signatureBitCounts(sa.map(Tuple1(_)).toDF("sig"), bits),
          graft.diff.DataDiff.signatureBitCounts(sb.map(Tuple1(_)).toDF("sig"), bits),
          nBuckets = 2)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(4)).toMap
      assert(got.keySet == expect.keySet, s"seed $seed: (bit, value) sets differ")
      expect.foreach { case (key, psi) =>
        assert(math.abs(got(key) - psi) < 1e-6, s"seed $seed $key") }
      // self-drift is flat on every bit
      val flat = graft.diff.DataDiff.directionalDriftFromCounts(
          graft.diff.DataDiff.signatureBitCounts(sa.map(Tuple1(_)).toDF("sig"), bits),
          graft.diff.DataDiff.signatureBitCounts(sa.map(Tuple1(_)).toDF("sig"), bits),
          nBuckets = 2).collect()
      assert(flat.nonEmpty && flat.forall(_.getDouble(4) == 0.0),
        s"seed $seed: self-drift must be flat")
    }
  }

  test("matryoshka truncation matches straight-line slice-and-normalize") {
    import spark.implicits._
    for (seed <- Seq(19, 47)) {
      val rnd = new scala.util.Random(seed)
      val dims = 6
      val vecs = (0 until 200).map { i =>
        val len = 1 + rnd.nextInt(12)
        // plant zero prefixes occasionally (passthrough path)
        val v = Array.fill(len)(
          if (rnd.nextInt(8) == 0) 0.0f else (rnd.nextGaussian() * 2).toFloat)
        (i.toLong, v)
      }
      val got = graft.ops.Quantize.matryoshka(vecs.toDF("vec_id", "embedding"), dims)
        .collect().map(r => r.getLong(0) ->
          ((r.getSeq[Float](1), r.getDouble(2), r.getLong(3)))).toMap
      vecs.foreach { case (id, v) =>
        val pre = v.take(dims)
        val nrm = math.sqrt(pre.map(x => x.toDouble * x.toDouble).sum)
        val expect = if (nrm == 0.0) pre.toSeq
          else pre.map(x => (x.toDouble / nrm).toFloat).toSeq
        val (gv, gn, gd) = got(id)
        assert(gd == pre.length && math.abs(gn - nrm) < 1e-9 && gv == expect,
          s"seed $seed vec $id: ($gv, $gn, $gd) vs ($expect, $nrm)")
      }
    }
  }

  test("novelty matches per-doc set arithmetic on random corpora") {
    import spark.implicits._
    def grams(s: String): Set[String] = {
      val w = s.toLowerCase.trim.replaceAll("\\s+", " ").split(' ').filter(_.nonEmpty)
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (seed <- Seq(11, 29)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(40)(i => s"w$i")
      def doc(): String =
        Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      // originals + verbatim dups (all-shared grams) + short/empty docs
      val texts = Seq.fill(80)(doc()) ++ Seq.fill(10)(doc()).flatMap(t => Seq(t, t)) ++
        Seq("a b", "")
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val gsets = docs.map { case (id, t) => id -> grams(t) }.toMap
      val df1 = gsets.values.toSeq.flatMap(_.toSeq)
        .groupBy(identity).collect { case (g, v) if v.size == 1 => g }.toSet
      val expect = gsets.collect { case (id, gs) if gs.nonEmpty =>
        id -> ((gs.count(df1).toLong, gs.size.toLong))
      }
      val got = graft.ops.TextAnalysis.novelty(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == expect.keySet,
        s"seed $seed: missing=${expect.keySet -- got.keySet} extra=${got.keySet -- expect.keySet}")
      expect.foreach { case (id, (novel, n)) =>
        val (gn, gt, gf) = got(id)
        assert(gn == novel && gt == n, s"seed $seed doc $id: ($gn,$gt) vs ($novel,$n)")
        assert(math.abs(gf - novel.toDouble / n) < 1e-5, s"seed $seed doc $id frac")
      }
    }
  }

  test("as-of join matches per-row lookup on random tie-heavy feeds") {
    import java.sql.Timestamp
    for (seed <- Seq(4, 31)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime
      // lattice times force exact left==right and right==right ties
      def ts(): Timestamp = new Timestamp(base + rnd.nextInt(50) * 60000L)
      val left = (0 until 400).map(i =>
        (i.toLong, rnd.nextInt(12).toLong, ts()))
      val right = (0 until 300).map(i =>
        (1000L + i, rnd.nextInt(12).toLong, ts(), rnd.nextInt(500) / 100.0))
      val ldf = spark.createDataFrame(left).toDF("event_id", "user_id", "ts")
      val rdf = spark.createDataFrame(right)
        .toDF("p_event_id", "user_id", "p_ts", "p_value")
      for (strict <- Seq(false, true)) {
        val got = graft.ops.AsOf.asofJoin(ldf, rdf, Seq("user_id"), "ts", "p_ts",
            payload = Seq("p_event_id", "p_value"), tieCol = "p_event_id",
            strict = strict)
          .collect().map { r =>
            (r.getLong(0),
              if (r.isNullAt(r.fieldIndex("p_event_id"))) None
              else Some((r.getLong(r.fieldIndex("p_event_id")),
                r.getDouble(r.fieldIndex("p_value")))))
          }.toSet
        // reference: latest right at-or-before (strictly before under
        // strict) the left time, ties broken by the greatest tie column;
        // None when no predecessor exists
        val expect = left.map { case (eid, u, t) =>
          val cand = right.filter(r => r._2 == u &&
            (if (strict) r._3.before(t) else !r._3.after(t)))
          (eid,
            if (cand.isEmpty) None
            else { val w = cand.maxBy(r => (r._3.getTime, r._1)); Some((w._1, w._4)) })
        }.toSet
        assert(got == expect, s"seed $seed strict=$strict: " +
          s"only-got=${(got -- expect).take(4)} only-expect=${(expect -- got).take(4)}")
      }
    }
  }

  test("contamination gram counts match set intersection on random corpora") {
    import spark.implicits._
    def grams(s: String, n: Int): Set[String] = {
      val w = s.toLowerCase.trim.replaceAll("\\s+", " ").split(' ').filter(_.nonEmpty)
      if (w.length < n) Set.empty else w.sliding(n).map(_.mkString(" ")).toSet
    }
    for (seed <- Seq(12, 44)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(40)(i => s"w$i")
      def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val eval = (0 until 10).map(i => (i.toLong, doc(8 + rnd.nextInt(10))))
      // half the train docs embed a random eval fragment (the leak), the
      // rest are independent; some are shorter than n words
      val train = (0 until 60).map { i =>
        val t =
          if (i % 2 == 0) doc(3 + rnd.nextInt(25))
          else {
            val frag = eval(rnd.nextInt(eval.size))._2.split(' ')
              .slice(0, 5 + rnd.nextInt(6)).mkString(" ")
            doc(rnd.nextInt(10)) + " " + frag + " " + doc(rnd.nextInt(10))
          }
        (100L + i, t.trim)
      }
      val evalSet = eval.flatMap(e => grams(e._2, 5)).toSet
      val expect = train.map { case (id, t) => id -> grams(t, 5).count(evalSet) }
        .filter(_._2 > 0).toMap
      val got = graft.ops.Dedup.contamination(
          train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"), n = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == expect, s"seed $seed: only-got=${got.toSet -- expect.toSet} " +
        s"only-expect=${expect.toSet -- got.toSet}")
    }
  }

  test("MAD outliers match interpolated-percentile arithmetic on random groups") {
    for (seed <- Seq(19, 73)) {
      val rnd = new scala.util.Random(seed)
      // three regimes: normal-ish groups, a constant group (MAD = 0, the
      // no-usable-scale branch), and a group where >= half the values sit
      // exactly at the median
      val rows = (0 until 400).map { i =>
        val grp = rnd.nextInt(6)
        val v = grp match {
          case 5 => 7.0
          case 4 => if (rnd.nextBoolean()) 10.0 else rnd.nextInt(100).toDouble
          case _ => math.floor(rnd.nextGaussian() * 50 + grp * 10) / 4.0
        }
        (i.toLong, s"g$grp", v)
      }
      val df = spark.createDataFrame(rows).toDF("id", "grp", "v")
      val k = 2.5
      val got = graft.ops.Outliers.byMad(df, "v", Seq("grp"), k)
        .collect().map { r =>
          (r.getLong(r.fieldIndex("id")),
            if (r.isNullAt(r.fieldIndex("robust_z"))) None
            else Some(r.getDouble(r.fieldIndex("robust_z"))),
            r.getBoolean(r.fieldIndex("is_outlier")))
        }.toSet

      def p50(xs: Seq[Double]): Double = {
        val s = xs.sorted
        val pos = 0.5 * (s.length - 1)
        val lo = s(pos.toInt)
        val hi = s(math.ceil(pos).toInt)
        lo + (hi - lo) * (pos - pos.toInt)
      }
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      val expect = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val med = p50(grp.map(_._3))
        val mad = p50(grp.map(r => math.abs(r._3 - med)))
        grp.map { case (id, _, v) =>
          if (mad > 0) {
            val z = r6(math.abs(v - med) / (1.4826 * mad))
            (id, Some(z), z > k)
          } else (id, None, v != med)
        }
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(4)} " +
        s"only-expect=${(expect -- got).take(4)}")
    }
  }

  test("point-in-interval range join matches the nested-loop on random windows") {
    import java.sql.Timestamp
    for (seed <- Seq(6, 13)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-07-01 00:00:00").getTime
      val points = (0 until 500).map(i =>
        (i.toLong, new Timestamp(base + rnd.nextInt(200) * 1800000L)))
      // windows from minutes to days, including empty and inverted ones;
      // half-open [start, end) boundaries land exactly on point times
      val windows = (0 until 40).map { i =>
        val s = base + rnd.nextInt(200) * 1800000L
        val len = (rnd.nextInt(5000) - 200) * 60000L
        (i.toLong, new Timestamp(s), new Timestamp(s + len))
      }
      val pdf = spark.createDataFrame(points).toDF("event_id", "ts")
      val wdf = spark.createDataFrame(windows).toDF("win_id", "win_start", "win_end")
      val gotRows = graft.ops.RangeJoin.pointInInterval(pdf, wdf,
          widthSeconds = 3600L)
        .select("event_id", "win_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = gotRows.toSet
      // the bucket scheme's no-dedup-needed claim: each (point, interval)
      // pair must meet exactly once
      assert(gotRows.size == got.size, s"seed $seed: duplicated pairs emitted")
      val expect = (for {
        (pid, pt) <- points; (wid, s, e) <- windows
        if !pt.before(s) && pt.before(e)
      } yield (pid, wid)).toSet
      assert(got == expect, s"seed $seed: missing=${expect -- got} " +
        s"extra=${got -- expect}")
    }
  }

  test("near-dup clustering matches union-find on random graphs, both paths") {
    import spark.implicits._
    for (seed <- Seq(8, 27)) {
      val rnd = new scala.util.Random(seed)
      val nDocs = 300
      // random edges + one explicit 50-node path: multi-hop label
      // propagation has to converge over the long diameter, not just
      // star-shaped clusters
      val path = (200 until 249).map(i => (i.toLong, i + 1L))
      val randEdges = Seq.fill(120)((rnd.nextInt(nDocs).toLong, rnd.nextInt(nDocs).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val edges = (path ++ randEdges).distinct
      val docs = (0 until nDocs).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("a", "b").withColumn("jaccard", lit(1.0))

      // reference union-find, component label = min member id
      val parent = Array.tabulate(nDocs)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = (0 until nDocs).map(i => (i.toLong, find(i).toLong)).toSet

      // driver fast path (edges under the cap) and the distributed
      // pointer-jumping loop (cap forced to 0) must agree with it exactly
      for (cap <- Seq(1000000L, 0L)) {
        val got = graft.ops.Dedup.clusters(docs, pairs, driverEdgeCap = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expect, s"seed $seed cap=$cap: " +
          s"wrong=${(got -- expect).take(10)}")
      }
    }
  }

  test("line dedup matches per-line df arithmetic on random multi-line docs") {
    import spark.implicits._
    for (seed <- Seq(9, 35)) {
      val rnd = new scala.util.Random(seed)
      val pool = Array.tabulate(30)(i => s"line content $i")
      // docs of 0-10 lines drawn from a small pool (guaranteed heavy
      // lines), some with the same line REPEATED inside one doc — df
      // counts distinct docs, removal drops every occurrence
      val docs = (0 until 80).map { i =>
        val k = rnd.nextInt(11)
        val ls = Seq.fill(k)(pool(rnd.nextInt(pool.length)))
        val withRepeat = if (k > 0 && rnd.nextBoolean()) ls ++ ls.take(1) else ls
        (i.toLong, withRepeat.mkString("\n"))
      }
      val minDf = 10
      val lineDf = docs.flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).distinct.size }
      val expect = docs.map { case (id, t) =>
        val all = t.split("\n", -1)
        val kept = all.filter(l => lineDf.getOrElse(l, 0) < minDf)
        (id, kept.mkString("\n"), kept.length.toLong, (all.length - kept.length).toLong)
      }.toSet
      for (hashKeys <- Seq(false, true)) {
        val got = graft.ops.TextAnalysis.lineDedup(
            docs.toDF("doc_id", "text"), minDf = minDf, hashKeys = hashKeys)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == expect, s"seed $seed hashKeys=$hashKeys: " +
          s"only-got=${(got -- expect).take(3)} only-expect=${(expect -- got).take(3)}")
      }
    }
  }

  test("funnel ladder matches first-step-after-previous lookup on random streams") {
    import java.sql.Timestamp
    val steps = Seq("view", "click", "purchase")
    for (seed <- Seq(14, 58)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-08-01 00:00:00").getTime
      // lattice times so same-timestamp step bursts occur (the
      // strictOrder=false regime) plus out-of-order arrivals and noise types
      val types = steps ++ Seq("scroll", "hover")
      val events = (0 until 2000).map { i =>
        (i.toLong, new Timestamp(base + rnd.nextInt(60) * 60000L),
          rnd.nextInt(60).toLong, types(rnd.nextInt(types.length)), 0.0, "")
      }
      val df = spark.createDataFrame(events)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

      def ref(strict: Boolean): Set[(Long, Int, Seq[Option[Long]])] =
        events.filter(e => steps.contains(e._4)).groupBy(_._3).flatMap {
          case (user, evs) =>
            val byStep = steps.map(s =>
              evs.filter(_._4 == s).map(_._2.getTime * 1000L).sorted)
            val times = scala.collection.mutable.ArrayBuffer.empty[Long]
            var k = 0
            var continue = true
            while (continue && k < steps.size) {
              val cands =
                if (k == 0) byStep(0)
                else byStep(k).filter(t =>
                  if (strict) t > times(k - 1) else t >= times(k - 1))
              if (cands.isEmpty) continue = false
              else { times += cands.min; k += 1 }
            }
            if (times.isEmpty) None
            else Some((user, times.size,
              (0 until steps.size).map(i => times.lift(i)).toSeq))
        }.toSet[(Long, Int, Seq[Option[Long]])]

      for (strict <- Seq(true, false)) {
        val got = graft.ops.Funnel.funnel(df, steps, strictOrder = strict)
          .collect().map { r =>
            (r.getLong(0), r.getInt(1), (0 until steps.size).map(i =>
              if (r.isNullAt(2 + i)) None else Some(r.getLong(2 + i))).toSeq)
          }.toSet[(Long, Int, Seq[Option[Long]])]
        assert(got == ref(strict), s"seed $seed strict=$strict: " +
          s"only-got=${(got -- ref(strict)).take(3)} " +
          s"only-expect=${(ref(strict) -- got).take(3)}")
      }
    }
  }

  test("int8 quantization: code range, endpoint codes, reconstruction error bound") {
    import spark.implicits._
    for (seed <- Seq(21, 63)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until 120).map { i =>
        val dim = 4 + rnd.nextInt(28)
        val v =
          if (i % 10 == 0) Array.fill(dim)(rnd.nextFloat() * 10 - 5) // varied
          else if (i % 10 == 1) Array.fill(dim)(3.25f)               // constant
          else Array.fill(dim)((rnd.nextGaussian() * 2).toFloat)
        (i.toLong, v.toSeq)
      }
      val got = graft.ops.Quantize.int8(vecs.toDF("vec_id", "embedding"))
        .collect().map { r =>
          (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
            r.getSeq[Int](4))
        }
      val byId = vecs.toMap
      got.foreach { case (id, qmin, qmax, scale, codes) =>
        val v = byId(id).map(_.toDouble)
        assert(qmin == v.min && qmax == v.max, s"vec $id header")
        assert(codes.length == v.length, s"vec $id dims")
        if (scale == 0.0) assert(codes.forall(_ == 0), s"constant vec $id codes")
        else {
          assert(codes.forall(c => c >= 0 && c <= 255), s"vec $id code range")
          // the min and max elements must hit the endpoint codes exactly
          assert(codes(v.indexOf(v.min)) == 0 && codes(v.indexOf(v.max)) == 255,
            s"vec $id endpoints")
          // affine reconstruction within half a step of every element
          v.zip(codes).foreach { case (x, c) =>
            assert(math.abs(x - (qmin + c * scale)) <= scale / 2 + 1e-9,
              s"vec $id: $x vs ${qmin + c * scale} (scale $scale)")
          }
        }
      }
    }
  }

  test("merge strategy matches a keyed fold over random batch sequences") {
    import graft.materialize.{Materializer, SessionCatalogWarehouse}
    import graft.model._
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "prop_merge_t",
      columns = Seq(
        Column("k", "INT", primaryKey = true),
        Column("v", "STRING", updateOnMerge = true),
        Column("w", "INT", updateOnMerge = false)),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.Merge)))
    for (seed <- Seq(16, 52)) {
      val rnd = new scala.util.Random(seed)
      wh.drop("prop_merge_t")
      // reference state: pk (None = NULL key, matched null-safely) ->
      // (v updates on match, w never does after insert)
      val state = scala.collection.mutable.LinkedHashMap.empty[Option[Int], (String, Int)]
      (0 until 4).foreach { batch =>
        // unique keys per batch (the materializer dedupes source on pk with
        // an arbitrary winner — ambiguity would test nondeterminism, not
        // semantics); one NULL key appears across batches to pin <=>
        val keys = rnd.shuffle((0 until 30).map(Option(_)) :+ Option.empty[Int])
          .take(8 + rnd.nextInt(8))
        val rows = keys.map(k => (k, s"v$batch-${rnd.nextInt(100)}", rnd.nextInt(1000)))
        import spark.implicits._
        val df = rows.toDF("k", "v", "w")
        Materializer.executeDf(wh, asset, df)
        rows.foreach { case (k, v, w) =>
          state.get(k) match {
            case Some((_, w0)) => state(k) = (v, w0) // v merges, w keeps
            case None => state(k) = (v, w)           // insert
          }
        }
        val got = spark.table("prop_merge_t").collect()
          .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
            r.getString(1), r.getInt(2))).toSet
        val expect = state.map { case (k, (v, w)) => (k, v, w) }.toSet
        assert(got == expect, s"seed $seed batch $batch: " +
          s"only-got=${got -- expect} only-expect=${expect -- got}")
      }
    }
    SessionCatalogWarehouse.dropAny(spark, "prop_merge_t")
  }

  test("delete+insert matches keyed replacement over random batch sequences") {
    import graft.materialize.{Materializer, SessionCatalogWarehouse}
    import graft.model._
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "prop_di_t",
      columns = Seq(Column("k", "INT"), Column("v", "STRING")),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.DeleteInsert),
        incrementalKey = Some("k")))
    for (seed <- Seq(29, 71)) {
      val rnd = new scala.util.Random(seed)
      wh.drop("prop_di_t")
      // multiset state: duplicate keys and NULL keys are both legal here —
      // the delete clears a key's rows wholesale, NULL-keyed rows survive
      // every delete (IN-list semantics)
      var state = Vector.empty[(Option[Int], String)]
      (0 until 4).foreach { batch =>
        val rows = (0 until 6 + rnd.nextInt(10)).map { _ =>
          val k = if (rnd.nextInt(10) == 0) Option.empty[Int] else Some(rnd.nextInt(12))
          (k, s"b$batch-${rnd.nextInt(1000)}")
        }
        import spark.implicits._
        val df = rows.toDF("k", "v")
        Materializer.executeDf(wh, asset, df)
        if (batch == 0) state = rows.toVector
        else {
          val deleted = rows.flatMap(_._1).toSet
          state = state.filter(r => r._1.forall(!deleted.contains(_))) ++ rows
        }
        val got = spark.table("prop_di_t").collect()
          .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getString(1)))
          .groupBy(identity).map { case (k, v) => k -> v.size }
        val expect = state.groupBy(identity).map { case (k, v) => k -> v.size }
        assert(got == expect, s"seed $seed batch $batch: " +
          s"only-got=${got.toSet -- expect.toSet} only-expect=${expect.toSet -- got.toSet}")
      }
    }
    SessionCatalogWarehouse.dropAny(spark, "prop_di_t")
  }

  test("scd2_by_column matches a versioned-dimension fold over random batches") {
    import graft.materialize.{Materializer, SessionCatalogWarehouse}
    import graft.model._
    val wh = new SessionCatalogWarehouse(spark)
    val asset = Asset(name = "prop_scd2_t",
      columns = Seq(
        Column("k", "INT", primaryKey = true),
        Column("attr", "STRING"),
        Column("amt", "INT")),
      materialization = Materialization(
        typ = MaterializationType.Table, strategy = Some(Strategy.SCD2ByColumn)))
    val MaxTs = "9999-12-31 00:00:00"
    for (seed <- Seq(26, 88)) {
      val rnd = new scala.util.Random(seed)
      wh.drop("prop_scd2_t")
      // reference: full version history per key —
      // (k, attr, amt, valid_from, valid_until, is_current)
      final case class Ver(attr: String, amt: Int, from: String,
                           until: String, current: Boolean)
      val history = scala.collection.mutable.ArrayBuffer.empty[(Option[Int], Ver)]
      (0 until 4).foreach { batch =>
        val now = s"2024-02-0${batch + 1} 00:00:00"
        // small attr space forces all regimes: unchanged rows (no new
        // version), changed rows (expire + insert), vanished keys
        // (expire only), re-appearing keys, plus one NULL key
        val keys = rnd.shuffle((0 until 10).map(Option(_)) :+ Option.empty[Int])
          .take(5 + rnd.nextInt(5))
        val rows = keys.map(k => (k, s"a${rnd.nextInt(3)}", rnd.nextInt(3)))
        import spark.implicits._
        Materializer.executeDf(wh, asset, rows.toDF("k", "attr", "amt"),
          Materializer.Context(now = now))

        if (batch == 0)
          rows.foreach { case (k, a, m) =>
            history += ((k, Ver(a, m, now, MaxTs, current = true))) }
        else {
          val srcByK = rows.map(r => r._1 -> (r._2, r._3)).toMap
          val currIdx = history.zipWithIndex.filter(_._1._2.current)
          currIdx.foreach { case ((k, v), i) =>
            srcByK.get(k) match {
              case Some((a, m)) if a == v.attr && m == v.amt => () // unchanged
              case Some(_) | None => // changed or vanished: expire
                history(i) = (k, v.copy(until = now, current = false))
            }
          }
          rows.foreach { case (k, a, m) =>
            val wasCurrent = currIdx.find(_._1._1 == k).map(_._1._2)
            val unchanged = wasCurrent.exists(v => v.attr == a && v.amt == m)
            if (!unchanged)
              history += ((k, Ver(a, m, now, MaxTs, current = true)))
          }
        }
        val got = spark.table("prop_scd2_t")
          .selectExpr("k", "attr", "amt",
            "CAST(_valid_from AS STRING)", "CAST(_valid_until AS STRING)",
            "_is_current")
          .collect().map { r =>
            (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getString(1),
              r.getInt(2), r.getString(3), r.getString(4), r.getBoolean(5))
          }.groupBy(identity).map { case (k, v) => k -> v.size }
        val expect = history.map { case (k, v) =>
          (k, v.attr, v.amt, v.from, v.until, v.current)
        }.groupBy(identity).map { case (k, v) => k -> v.size }
        assert(got == expect, s"seed $seed batch $batch ($now): " +
          s"only-got=${(got.toSet -- expect.toSet).take(4)} " +
          s"only-expect=${(expect.toSet -- got.toSet).take(4)}")
      }
    }
    SessionCatalogWarehouse.dropAny(spark, "prop_scd2_t")
  }

  test("CDC apply matches last-writer-wins folding on shuffled change streams") {
    import graft.materialize.SessionCatalogWarehouse
    import graft.model._
    import graft.streaming.Streams
    val wh = new SessionCatalogWarehouse(spark)
    // all three state writers must converge to the same LWW image from the
    // same shuffled multi-micro-batch feed
    for ((writerName, seed) <- Seq(("overlay", 38), ("bucketed", 61), ("rebuild", 94))) {
      val rnd = new scala.util.Random(seed)
      val name = s"prop_cdc_$writerName"
      spark.sql(s"DROP VIEW IF EXISTS $name")
      SessionCatalogWarehouse.dropAny(spark, s"${name}__cdc_state")
      // random change history: per key, a create then random updates and
      // possibly a delete, with globally unique seq; arrival order SHUFFLED
      // so later-seq changes routinely land in earlier micro-batches
      var seq = 0L
      val changes = (0 until 25).flatMap { k =>
        val n = 1 + rnd.nextInt(5)
        (0 until n).map { i =>
          seq += 1
          val op = if (i == 0) "c"
            else if (i == n - 1 && rnd.nextInt(4) == 0) "d" else "u"
          (k, s"val-$k-$seq", op, seq)
        }
      }
      val shuffled = rnd.shuffle(changes)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prop-cdc-$writerName")
      // three part files in one dir => with maxFilesPerTrigger=1, three
      // micro-batches in whatever order the source lists them
      shuffled.grouped((shuffled.size + 2) / 3).foreach { g =>
        spark.createDataFrame(g).toDF("id", "v", "op", "seq")
          .coalesce(1).write.mode("append").parquet(s"$dir/events")
      }
      val events = spark.readStream
        .schema("id INT, v STRING, op STRING, seq BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/events")
      val asset = Asset(name = name,
        columns = Seq(Column("id", "INT", primaryKey = true), Column("v", "STRING")),
        parameters = Map("cdc_writer" -> writerName))
      Streams.cdcApply(wh, asset, events).awaitTermination()

      val got = spark.table(name).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      // reference: per key the max-seq change wins; deletes tombstone
      val expect = changes.groupBy(_._1).flatMap { case (k, ch) =>
        val w = ch.maxBy(_._4)
        if (w._3 == "d") None else Some((k, w._2))
      }.toSet
      assert(got == expect, s"$writerName seed $seed: " +
        s"only-got=${got -- expect} only-expect=${expect -- got}")
      SessionCatalogWarehouse.dropAny(spark, s"${name}__cdc_state")
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }

  test("BPE merges match the classic single-machine induction on random corpora") {
    import spark.implicits._
    for (seed <- Seq(33, 77)) {
      val rnd = new scala.util.Random(seed)
      // small alphabet + repeated morphemes so merges chain into multi-char
      // symbols and ties genuinely occur (the lexicographic tie-break path)
      val morphemes = Array("ab", "abc", "bca", "cab", "aa", "b")
      val docs = (0 until 50).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(8))(
          morphemes(rnd.nextInt(morphemes.length)) * (1 + rnd.nextInt(2)))
          .mkString(" "))
      }
      val numMerges = 10
      val got = graft.ops.Bpe.bpeMerges(docs.toDF("doc_id", "text"), numMerges)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))

      // reference: weighted word-frequency vocab, overlapping adjacent pair
      // counts, argmax by (freq desc, l asc, r asc), greedy left-to-right
      // non-overlapping merge application
      val EOW = graft.ops.Bpe.EndOfWord
      var vocab: Map[List[String], Long] = docs
        .flatMap(_._2.toLowerCase.trim.replaceAll("\\s+", " ").split(' '))
        .filter(_.nonEmpty)
        .groupBy(identity).map { case (w, v) =>
          (w.map(_.toString).toList :+ EOW) -> v.size.toLong }
      def mergeApply(syms: List[String], l: String, r: String): List[String] = {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList
      }
      val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      var rank = 0
      var stop = false
      while (rank < numMerges && !stop) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        vocab.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) stop = true
        else {
          val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
          if (f < 2) stop = true
          else {
            expect += ((rank, l, r, l + r, f))
            vocab = vocab.map { case (syms, c) => mergeApply(syms, l, r) -> c }
              .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
            rank += 1
          }
        }
      }
      assert(got.toSeq.sortBy(_._1) == expect.toSeq,
        s"seed $seed:\n got=${got.toSeq.sortBy(_._1)}\n exp=${expect.toSeq}")
    }
  }

  test("hash-based sampling matches direct md5 arithmetic and is partition-invariant") {
    import spark.implicits._
    def md5bucket(id: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    def md5frac(id: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0
    }
    for (seed <- Seq(41, 67)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 800).map { i =>
        (i.toLong, Seq("en", "de", "fr")(rnd.nextInt(3)))
      }
      val df = docs.toDF("doc_id", "lang")

      // split: same row, same split, forever — and equal to the md5 rule
      val got = graft.ops.Sampling.split(df, trainPct = 70, validPct = 20)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val expect = docs.map { case (id, _) =>
        val b = md5bucket(id.toString)
        id -> (if (b < 70) "train" else if (b < 90) "valid" else "test")
      }.toMap
      assert(got == expect, s"seed $seed split: ${(got.toSet -- expect.toSet).take(5)}")
      // partition-invariance: layout must never change an assignment
      val rep = graft.ops.Sampling.split(df.repartition(7), trainPct = 70, validPct = 20)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(rep == got, "split changed under repartition")

      // stratified: per-stratum keep-rate over the same bucket
      val rates = Map("en" -> 30, "de" -> 100)
      val sGot = graft.ops.Sampling.stratified(df, "lang", rates)
        .collect().map(_.getLong(0)).toSet
      val sExpect = docs.filter { case (id, l) =>
        md5bucket(id.toString) < rates.getOrElse(l, 0) }.map(_._1).toSet
      assert(sGot == sExpect, s"seed $seed stratified")

      // mixture: capacity-bound thinning with the 6-decimal rate rule
      val weights = Map("en" -> 0.5, "de" -> 0.5)
      // the broadcast rate join puts the stratum column first: (lang, doc_id)
      val mGot = graft.ops.Sampling.mixture(df, "lang", weights)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val byLang = docs.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
      val cap = weights.collect { case (l, w) if w > 0 => byLang(l) / w }.min
      val mExpect = docs.filter { case (id, l) =>
        weights.get(l).filter(_ > 0).exists { w =>
          val rate = BigDecimal(math.min(1.0, w * cap / byLang(l)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          md5frac(id.toString) < rate
        }
      }.map(_._1).toSet
      assert(mGot == mExpect, s"seed $seed mixture: " +
        s"only-got=${(mGot -- mExpect).take(5)} only-expect=${(mExpect -- mGot).take(5)}")
    }
  }

  test("substring dup spans match naive window counting + interval merge") {
    import spark.implicits._
    val w = 12
    for (seed <- Seq(48, 85)) {
      val rnd = new scala.util.Random(seed)
      // small alphabet => natural accidental repeats on top of the planted
      // ones; texts are pre-normalized so positions map 1:1
      def randText(n: Int): String =
        (0 until n).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      val base = (0 until 25).map(i => (i.toLong, randText(rnd.nextInt(120))))
      // plant cross-doc and in-doc duplicated fragments longer than w
      val docs = base.map { case (id, t) =>
        if (id % 3 == 1 && t.length > w) {
          val donor = base((id.toInt + 5) % base.size)._2
          val frag = if (donor.length >= w + 8) donor.substring(0, w + 8) else donor
          (id, t.substring(0, t.length / 2) + frag + t.substring(t.length / 2))
        } else if (id % 3 == 2 && t.length > w + 4) {
          val frag = t.substring(0, w + 4)
          (id, t + frag) // in-doc repeat
        } else (id, t)
      }
      val got = graft.ops.Dedup.substringDupSpans(
          docs.toDF("doc_id", "text"), windowChars = w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet

      // reference: corpus-wide window multiset, mark positions whose
      // w-substring occurs >= 2, merge touching-or-overlapping [i, i+w)
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      docs.foreach { case (_, t) =>
        (0 to t.length - w).foreach { i =>
          val s = t.substring(i, i + w)
          counts(s) = counts.getOrElse(s, 0) + 1
        }
      }
      val expect = docs.flatMap { case (id, t) =>
        val marked = (0 to t.length - w).filter(i => counts(t.substring(i, i + w)) >= 2)
        val islands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        marked.foreach { i =>
          if (islands.nonEmpty && i - islands.last._2 <= w)
            islands(islands.size - 1) = (islands.last._1, i)
          else islands += ((i, i))
        }
        islands.zipWithIndex.map { case ((s, e), idx) =>
          (id, idx, s.toLong, (e + w).toLong) }
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(5)} " +
        s"only-expect=${(expect -- got).take(5)}")

      // surgery: cutting the spans back out must equal direct substring
      // removal, and docs with no spans pass through untouched
      val spansBySorted = expect.groupBy(_._1)
        .view.mapValues(_.toSeq.sortBy(_._3)).toMap
      val cutExpect = docs.map { case (id, t) =>
        val spans = spansBySorted.getOrElse(id, Nil)
        val sb = new StringBuilder
        var from = 0
        spans.foreach { case (_, _, s, e) =>
          sb.append(t.substring(from, s.toInt)); from = e.toInt
        }
        sb.append(t.substring(from))
        (id, sb.toString, spans.map(s => s._4 - s._3).sum)
      }.toSet
      val cutGot = graft.ops.Dedup.removeSpans(
          docs.toDF("doc_id", "text"),
          graft.ops.Dedup.substringDupSpans(docs.toDF("doc_id", "text"), windowChars = w))
        .select("doc_id", "clean_text", "n_removed_chars")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(cutGot == cutExpect, s"seed $seed surgery: " +
        s"only-got=${(cutGot -- cutExpect).take(3)} " +
        s"only-expect=${(cutExpect -- cutGot).take(3)}")
    }
  }

  test("tf-idf and unigram LM match direct arithmetic on random corpora") {
    import spark.implicits._
    def toks(s: String): Seq[String] =
      s.toLowerCase.trim.replaceAll("\\s+", " ").split(' ').filter(_.nonEmpty).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- Seq(55, 91)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(25)(i => s"t$i")
      val docs = (0 until 40).map { i =>
        (i.toLong, Seq.fill(2 + rnd.nextInt(20))(
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")

      // tf-idf: exact (tf, df, score) per emitted term, deterministic rank
      val topK = 3
      val tGot = graft.ops.TextAnalysis.tfIdf(df, topK).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getInt(5))).toSet
      val nDocs = docs.size
      val wdf = docs.flatMap(d => toks(d._2).distinct).groupBy(identity)
        .map { case (w, v) => w -> v.size }
      val tExpect = docs.flatMap { case (id, t) =>
        val tf = toks(t).groupBy(identity).map { case (w, v) => w -> v.size }
        tf.toSeq.map { case (w, c) =>
          (w, c, r6(c * math.log((nDocs + 1).toDouble / (wdf(w) + 1)))) }
          .sortBy { case (w, _, s) => (-s, w) }
          .take(topK).zipWithIndex
          .map { case ((w, c, s), i) =>
            (id, w, c.toLong, wdf(w).toLong, s, i + 1) }
      }.toSet
      assert(tGot == tExpect, s"seed $seed tfidf: " +
        s"only-got=${(tGot -- tExpect).take(4)} only-expect=${(tExpect -- tGot).take(4)}")

      // unigram LM: mean corpus NLL per doc
      val lGot = graft.ops.TextAnalysis.unigramLogProb(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val cf = docs.flatMap(d => toks(d._2)).groupBy(identity)
        .map { case (w, v) => w -> v.size }
      val nTotal = cf.values.sum
      val lExpect = docs.flatMap { case (id, t) =>
        val ts = toks(t)
        if (ts.isEmpty) None
        else Some((id, ts.size.toLong,
          r6(-ts.map(w => math.log(cf(w).toDouble / nTotal)).sum / ts.size)))
      }.toSet
      assert(lGot == lExpect, s"seed $seed lm: " +
        s"only-got=${(lGot -- lExpect).take(4)} only-expect=${(lExpect -- lGot).take(4)}")
    }
  }

  test("ccnet exact tertiles match ntile arithmetic over the rounded-NLL order") {
    import spark.implicits._
    def toks(s: String): Seq[String] =
      s.toLowerCase.trim.replaceAll("\\s+", " ").split(' ').filter(_.nonEmpty).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- Seq(46, 83)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(20)(i => s"t$i")
      // uneven language sizes (incl. n % 3 != 0 and an n < 3 language) so
      // the ntile boundary arithmetic is exercised, not just even thirds
      val langs = Seq.fill(37)("en") ++ Seq.fill(14)("de") ++ Seq.fill(2)("fr")
      val docs = rnd.shuffle(langs).zipWithIndex.map { case (l, i) =>
        (i.toLong, l, Seq.fill(1 + rnd.nextInt(15))(
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      val got = graft.ops.TextAnalysis.ccnetBucketsScoped(df, buckets = 5)(
        _.select("doc_id", "tertile", "ppl_bucket").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet)

      // reference: per-language (rounded avg_nll asc, id asc) rank → ntile(3)
      val cf = docs.flatMap(d => toks(d._3)).groupBy(identity)
        .map { case (w, v) => w -> v.size }
      val nTotal = cf.values.sum
      val nll = docs.map { case (id, l, t) =>
        val ts = toks(t)
        (id, l, r6(-ts.map(w => math.log(cf(w).toDouble / nTotal)).sum / ts.size))
      }
      def ntile3(r: Int, n: Int): Int = {
        val q = n / 3; val m = n % 3
        if (r <= (q + 1) * m) (r - 1) / (q + 1) + 1
        else m + (r - 1 - (q + 1) * m) / q + 1
      }
      val expect = nll.groupBy(_._2).flatMap { case (_, group) =>
        val sorted = group.sortBy { case (id, _, s) => (s, id) }
        sorted.zipWithIndex.map { case ((id, _, _), i) =>
          val t = ntile3(i + 1, sorted.size)
          (id, t, Seq("head", "middle", "tail")(t - 1))
        }
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(5)} " +
        s"only-expect=${(expect -- got).take(5)}")
    }
  }

  test("cohort retention matches week arithmetic on random activity") {
    import java.sql.Timestamp
    for (seed <- Seq(18, 64)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-01-03 12:00:00").getTime
      val events = (0 until 1200).map { i =>
        (i.toLong, new Timestamp(base + rnd.nextInt(90).toLong * 86400000L),
          rnd.nextInt(40).toLong, "e", 0.0, "")
      }
      val df = spark.createDataFrame(events)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = graft.ops.Funnel.retention(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val weekly = events.map(e =>
        (e._3, e._2.getTime * 1000L / (7L * 86400L * 1000000L))).distinct
      val cohort = weekly.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
      val expect = weekly.map { case (u, w) => (cohort(u), w - cohort(u), u) }
        .groupBy(t => (t._1, t._2)).map { case ((cw, off), v) =>
          (cw, off, v.map(_._3).distinct.size.toLong) }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(5)} " +
        s"only-expect=${(expect -- got).take(5)}")
    }
  }

  test("manual and native sessionization agree on random event sets") {
    import java.sql.Timestamp
    for (seed <- Seq(24, 70)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-04-01 00:00:00").getTime
      // 7-minute lattice: never lands exactly on the 30-minute gap, where
      // the two formulations legitimately differ (manual keeps diff == gap
      // in-session, session_window's exclusive end starts a new one)
      val events = (0 until 900).map { i =>
        (i.toLong, new Timestamp(base + rnd.nextInt(300).toLong * 420000L),
          rnd.nextInt(25).toLong, "e", rnd.nextInt(500) / 100.0, "")
      }
      val df = spark.createDataFrame(events)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // two independent formulations of the same sessions — the two-window
      // program and Spark's native session_window — must agree on
      // (user, first-event, n_events, sum)
      val manual = graft.ops.Sessions.sessionize(df, gapMinutes = 30).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(4),
          BigDecimal(r.getDouble(5)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val native = graft.ops.Sessions.sessionizeNative(df, gapMinutes = 30)
        .selectExpr("user_id", "CAST(timestamp_micros(start_us) AS STRING)",
          "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      // compare on (user, session start, n_events, sum): the manual rollup
      // keys sessions by start, the native one by window start — equal
      // sessions have equal first events
      def massage(m: Map[(Long, String, Long, BigDecimal), Int]) =
        m.map { case ((u, s, n, v), c) => ((u, s.take(19), n, v), c) }
      assert(massage(native) == massage(manual),
        s"seed $seed: native=${(massage(native).toSet -- massage(manual).toSet).take(4)} " +
          s"manual=${(massage(manual).toSet -- massage(native).toSet).take(4)}")
    }
  }

  test("DSIR importance scores match direct log-ratio arithmetic") {
    import spark.implicits._
    def md5mod(s: String, m: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % m
    }
    def gramsOf(t: String): Seq[String] = {
      val w = t.toLowerCase.trim.replaceAll("\\s+", " ").split(' ').toSeq
      val bi = if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Nil
      w ++ bi
    }
    for (seed <- Seq(28, 76)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(30)(i => s"w$i")
      def doc(skew: Int) = Seq.fill(1 + rnd.nextInt(15))(
        vocab(rnd.nextInt(skew))).mkString(" ")
      // target uses a narrower slice of the vocabulary, so the log-ratio
      // genuinely separates; one empty raw doc pins the [""]-unigram rule
      val raw = (0 until 50).map(i => (i.toLong, doc(30))) :+ (50L, "")
      val target = (100 until 120).map(i => (i.toLong, doc(8)))
      val B = 64
      val got = graft.ops.Dsir.scores(
          raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"), buckets = B)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap

      def bucketCounts(docs: Seq[(Long, String)]): (Map[Long, Long], Long) = {
        val c = docs.flatMap(d => gramsOf(d._2)).map(g => md5mod(g, B))
          .groupBy(identity).map { case (b, v) => b -> v.size.toLong }
        (c, c.values.sum)
      }
      val (rc, rn) = bucketCounts(raw)
      val (tc, tn) = bucketCounts(target)
      def lam(b: Long): Double =
        math.log((tc.getOrElse(b, 0L) + 1).toDouble / (tn + B)) -
          math.log((rc.getOrElse(b, 0L) + 1).toDouble / (rn + B))
      raw.foreach { case (id, t) =>
        val gs = gramsOf(t)
        val (n, li, gk) = got(id)
        assert(n == gs.size, s"seed $seed doc $id n_grams: $n vs ${gs.size}")
        val liRef = gs.map(g => lam(md5mod(g, B))).sum
        assert(math.abs(li - liRef) < 1e-8, s"seed $seed doc $id: $li vs $liRef")
        val u = (md5mod(id.toString, 1000000L).toDouble + 0.5) / 1000000.0
        val gkRef = liRef - math.log(-math.log(u))
        assert(math.abs(gk - gkRef) < 1e-8, s"seed $seed doc $id gumbel: $gk vs $gkRef")
      }
    }
  }

  test("sequence packing matches a sequential prefix sum on random token counts") {
    import spark.implicits._
    for (seed <- Seq(37, 82)) {
      val rnd = new scala.util.Random(seed)
      // sparse, shuffled, GAPPY ids (the bucket-by-id-range distribution
      // must not assume density) with token counts straddling seqTokens
      val rows = rnd.shuffle((0 until 500).map(_ * (1 + rnd.nextInt(7))).distinct
        .map(id => (id.toLong, (rnd.nextInt(900) + 1).toLong)))
      val seqTokens = 512
      val got = graft.ops.TextAnalysis.packSequences(
          rows.toDF("doc_id", "n_tokens"), seqTokens)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      var cum = 0L
      val expect = rows.sortBy(_._1).map { case (id, n) =>
        val out = (id, (cum / seqTokens).toInt, cum % seqTokens, n)
        cum += n
        out
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(5)} " +
        s"only-expect=${(expect -- got).take(5)}")
    }
  }

  test("interval overlap join matches the nested loop, each pair exactly once") {
    import java.sql.Timestamp
    for (seed <- Seq(43, 87)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-09-01 00:00:00").getTime
      def iv(n: Int, tag: String) = (0 until n).map { i =>
        val s = base + rnd.nextInt(400) * 900000L
        // lengths from sub-bucket to many-bucket, plus empty/inverted
        val len = (rnd.nextInt(6000) - 300) * 60000L
        (s"$tag$i", new Timestamp(s), new Timestamp(s + len))
      }
      val ls = iv(35, "L")
      val rs = iv(35, "R")
      import spark.implicits._
      val gotRows = graft.ops.RangeJoin.intervalOverlap(
          ls.toDF("l_id", "l_start", "l_end"), rs.toDF("r_id", "r_start", "r_end"),
          widthSeconds = 3600L)
        .select("l_id", "r_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val got = gotRows.toSet
      assert(gotRows.size == got.size,
        s"seed $seed: duplicated pairs (canonical-bucket emission broken)")
      val expect = (for {
        (li, lsT, leT) <- ls; (ri, rsT, reT) <- rs
        if leT.after(lsT) && reT.after(rsT) && lsT.before(reT) && rsT.before(leT)
      } yield (li, ri)).toSet
      assert(got == expect, s"seed $seed: missing=${(expect -- got).take(5)} " +
        s"extra=${(got -- expect).take(5)}")
    }
  }

  test("corpus overlap matrix matches pairwise gram-set arithmetic") {
    import spark.implicits._
    def grams3(s: String): Set[String] = {
      val w = s.toLowerCase.trim.replaceAll("\\s+", " ").split(' ').filter(_.nonEmpty)
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (seed <- Seq(53, 96)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(25)(i => s"w$i")
      def doc() = Seq.fill(2 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.length))).mkString(" ")
      // strata share a planted paragraph pairwise; one stratum is all
      // short docs (empty gram set) to pin the emitZeros contract
      val shared = doc() + " " + doc()
      val docs = (0 until 60).map { i =>
        val src = s"s${i % 5}"
        val t = if (src == "s4") "too short" // < 3 words after norm
          else if (i % 7 == 0) doc() + " " + shared
          else doc()
        (i.toLong, src, t)
      }
      // a stratum whose every doc is sub-n-gram contributes no gram rows,
      // so it is absent from the sizes table and emits no pairs at all —
      // even under emitZeros (there is no size to report for it)
      val bySrc = docs.groupBy(_._2).map { case (s, v) =>
        s -> v.flatMap(d => grams3(d._3)).toSet }
        .filter(_._2.nonEmpty)
      def refRows(emitZeros: Boolean) = (for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
        inter = bySrc(a).intersect(bySrc(b)).size
        if emitZeros || inter > 0
      } yield {
        val (na, nb) = (bySrc(a).size.toLong, bySrc(b).size.toLong)
        val j = BigDecimal(inter.toDouble / (na + nb - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, na, nb, inter.toLong, j)
      }).toSet
      for (emitZeros <- Seq(false, true)) {
        val got = graft.ops.Dedup.corpusOverlap(
            docs.toDF("doc_id", "source", "text"), groupCol = "source",
            emitZeros = emitZeros)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
        val expect = refRows(emitZeros)
        assert(got == expect, s"seed $seed emitZeros=$emitZeros: " +
          s"only-got=${(got -- expect).take(4)} only-expect=${(expect -- got).take(4)}")
      }
    }
  }

  test("salted skew join is row-for-row the plain join, hot key and left rows included") {
    import spark.implicits._
    for (seed <- Seq(2, 17); salt <- Seq(1, 3, 8);
         joinType <- Seq("inner", "left")) {
      val rnd = new scala.util.Random(seed)
      // one hot key owns ~half the fact rows — the layout salting targets
      val fact = (0 until 4000).map { i =>
        val k = if (rnd.nextBoolean()) 7L else rnd.nextInt(50).toLong
        (i.toLong, k, rnd.nextInt(1000))
      }.toDF("fid", "fk", "amt").repartition(8)
      // dim has gaps (unmatched fact keys) and keys fact never hits
      val dim = (0 until 50 by 2).map(k => (k.toLong, s"d$k")).toDF("fk", "name")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("fid", "fk", "amt", "name")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            if (r.isNullAt(3)) "" else r.getString(3))).toSeq.sorted
      val got = rows(graft.ops.SkewJoin.saltedJoin(fact, dim, Seq("fk"),
        salt = salt, joinType = joinType))
      val expect = rows(fact.join(dim, Seq("fk"), joinType))
      assert(got == expect, s"seed $seed salt $salt $joinType: " +
        s"sizes ${got.size}/${expect.size}")
    }
  }

  test("weighted sampling without replacement matches the local A-ES draw") {
    import spark.implicits._
    def md5Frac(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0
    }
    def round6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    for (seed <- Seq(4, 29)) {
      val rnd = new scala.util.Random(seed)
      // zero and negative weights must be excluded, not sampled
      val rows = (0 until 3000).map { i =>
        (i.toLong, if (rnd.nextInt(10) == 0) -rnd.nextInt(3).toDouble
        else rnd.nextInt(500).toDouble + 1.0)
      }
      val k = 150
      val got = graft.ops.Sampling.weightedTopK(
        rows.toDF("doc_id", "w").repartition(8), k, "w")
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      val expect = rows.filter(_._2 > 0).map { case (id, w) =>
        val u = (md5Frac(id) * 1000000.0 + 0.5) / 1000000.0
        (id, round6(math.log(u) / w))
      }.sortBy { case (id, key) => (-key, id) }.take(k).toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(4)} " +
        s"only-expect=${(expect -- got).take(4)}")
    }
  }

  test("embedding decontamination matches the brute-force bipartite argmax") {
    import spark.implicits._
    def round6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0 || denom.isNaN) 0.0 else round6(dot / denom)
    }
    for (seed <- Seq(6, 31)) {
      val rnd = new scala.util.Random(seed)
      def vec(): Array[Float] = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
      val evalVecs = (0L until 40L).map(i => (i, vec()))
      // duplicate eval vectors force cosine TIES — the smaller eval id must win
      val evalAll = evalVecs ++ Seq((100L, evalVecs(3)._2), (101L, evalVecs(3)._2))
      // corpus: some rows are near-copies of eval rows (contaminated)
      val corpus = (1000L until 1400L).map { i =>
        val v = if (rnd.nextInt(4) == 0) evalVecs(rnd.nextInt(40))._2.clone() else vec()
        (i, v)
      }
      val t = 0.7
      val got = graft.ops.Similarity.contaminationAgainst(
        corpus.toDF("vec_id", "embedding").repartition(6),
        evalAll.toDF("vec_id", "embedding"), threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expect = corpus.flatMap { case (a, va) =>
        val scored = evalAll.map { case (b, vb) => (b, cos(va, vb)) }
        val best = scored.minBy { case (b, c) => (-c, b) }
        if (best._2 >= t) Some((a, best._1, best._2)) else None
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(4)} " +
        s"only-expect=${(expect -- got).take(4)}")
      // ties resolved to the smallest eval id, never 100/101's duplicates
      assert(!got.exists(r => r._2 == 100L || r._2 == 101L))
    }
    // over-cap eval fails fast instead of collecting unbounded
    val big = (0L until 50L).map(i => (i, Array.fill(4)(1f)))
    val err = intercept[IllegalArgumentException] {
      graft.ops.Similarity.contaminationAgainst(
        big.toDF("vec_id", "embedding"), big.toDF("vec_id", "embedding"),
        maxEvalVectors = 10)
    }
    assert(err.getMessage.contains("maxEvalVectors"))
  }

  test("winsorize clamps to the exact interpolated group quantiles") {
    import spark.implicits._
    def pct(sorted: Array[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
    }
    def round6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    for (seed <- Seq(8, 37)) {
      val rnd = new scala.util.Random(seed)
      // a NULL group key is a real group; null values stay null, never clipped
      val rows = (0 until 2000).map { i =>
        val g: java.lang.Long = if (rnd.nextInt(20) == 0) null
        else rnd.nextInt(4).toLong.asInstanceOf[java.lang.Long]
        val v: java.lang.Double = if (rnd.nextInt(50) == 0) null
        else rnd.nextGaussian() * 100.0
        (i.toLong, g, v)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)), 6),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("g",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
      val got = graft.ops.Outliers.winsorize(df, "v", Seq("g"))
        .select("id", "winsorized", "is_clipped")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getDouble(1), r.getBoolean(2))).toSet
      val bounds = rows.filter(_._3 != null).groupBy(_._2).map { case (g, rs) =>
        val sorted = rs.map(_._3.doubleValue()).toArray.sorted
        g -> (pct(sorted, 0.05), pct(sorted, 0.95))
      }
      val expect = rows.map { case (id, g, v) =>
        val (lo, hi) = bounds(g)
        if (v == null) (id, null, false)
        else (id, round6(math.min(math.max(v.doubleValue(), lo), hi)).asInstanceOf[Any],
          v.doubleValue() < lo || v.doubleValue() > hi)
      }.toSet
      assert(got == expect, s"seed $seed: only-got=${(got -- expect).take(4)} " +
        s"only-expect=${(expect -- got).take(4)}")
    }
  }

  test("epoch mixture replicates the exact multiset the md5 fraction dictates") {
    import spark.implicits._
    def md5Frac(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0
    }
    val epochs = Map("a" -> 2.5, "b" -> 1.0, "c" -> 0.25)
    for (seed <- Seq(9, 41)) {
      val rnd = new scala.util.Random(seed)
      val strata = Array("a", "b", "c", "d") // d is undeclared: must drop
      val rows = (0 until 2000).map(i => (i.toLong, strata(rnd.nextInt(4))))
      val got = graft.ops.Sampling.epochMixture(
        rows.toDF("doc_id", "s").repartition(7), "s", epochs)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSeq.sorted
      val expect = rows.flatMap { case (id, s) =>
        val e = epochs.getOrElse(s, 0.0)
        val n = math.floor(e).toInt + (if (md5Frac(id) < e - math.floor(e)) 1 else 0)
        (0 until n).map(c => (id, s, c))
      }.sorted
      assert(got == expect, s"seed $seed: sizes ${got.size}/${expect.size}")
      // whole-epoch floor: every declared-stratum row appears >= floor(e) times
      val byId = got.groupBy(_._1).view.mapValues(_.size).toMap
      rows.filter(r => epochs.getOrElse(r._2, 0.0) >= 1.0).foreach { case (id, s) =>
        assert(byId.getOrElse(id, 0) >= math.floor(epochs(s)).toInt)
      }
    }
  }

  test("keyed row diff counts added/removed/changed exactly, nulls included") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k1", LongType), StructField("k2", StringType),
      StructField("v1", DoubleType), StructField("v2", StringType)))
    for (seed <- Seq(13, 47)) {
      val rnd = new scala.util.Random(seed)
      def mkRow(i: Long): Row = Row(
        i,
        if (i % 17 == 0) null else s"g${i % 5}", // NULL key component
        if (rnd.nextInt(20) == 0) null else rnd.nextInt(100).toDouble,
        if (rnd.nextInt(20) == 0) null else s"s${rnd.nextInt(6)}")
      val aRows = (0L until 800L).filter(_ % 19 != 0).map(mkRow)
      val bRows = (0L until 900L).filter(_ % 23 != 0).map { i =>
        val r = mkRow(i) // independent rnd draws: values differ freely
        Row(r.get(0), r.get(1), r.get(2), r.get(3))
      }
      val a = spark.createDataFrame(
        spark.sparkContext.parallelize(aRows, 5), schema)
      val b = spark.createDataFrame(
        spark.sparkContext.parallelize(bRows, 5), schema)
      val got = graft.diff.DataDiff.keyedDiff(a, b, Seq("k1", "k2"),
        Seq("v1", "v2")).head()
      val am = aRows.map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3))).toMap
      val bm = bRows.map(r => (r.get(0), r.get(1)) -> (r.get(2), r.get(3))).toMap
      val added = bm.keySet -- am.keySet
      val removed = am.keySet -- bm.keySet
      val matched = am.keySet & bm.keySet
      val changed = matched.filter(k => am(k) != bm(k))
      assert(got.getLong(0) == added.size, "n_added")
      assert(got.getLong(1) == removed.size, "n_removed")
      assert(got.getLong(2) == changed.size, "n_changed")
      assert(got.getLong(3) == (matched.size - changed.size), "n_unchanged")
      assert(got.getLong(4) == matched.count(k => am(k)._1 != bm(k)._1), "changed_v1")
      assert(got.getLong(5) == matched.count(k => am(k)._2 != bm(k)._2), "changed_v2")
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

  test("KMV distinct matches direct k-minima arithmetic on random multisets") {
    import spark.implicits._
    val k = 32
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp60(v: String): Long = java.lang.Long.parseLong(
      md.digest(v.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15), 16)
    def estOf(hs: Seq[Long]): (Long, Boolean) = {
      val mins = hs.distinct.sorted.take(k)
      if (mins.length < k) (mins.length.toLong, true)
      else (math.round((k - 1).toDouble /
        (mins.last.toDouble / 1152921504606846976.0)), false)
    }
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      // groups straddle the exact/estimator boundary; heavy duplication
      val rows = (0 until 4000).map { _ =>
        val g = s"g${rnd.nextInt(6)}"
        val v = s"v${rnd.nextInt(if (g == "g0") 10 else 500)}"
        (g, v)
      }
      val got = graft.ops.Sketches.kmvDistinct(rows.toDF("grp", "v"), "grp", "v", k)
        .collect().map(r => (Option(r.getString(0)).getOrElse("__all"),
          r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toSet
      val byGrp = rows.groupBy(_._1).map { case (g, vs) =>
        val (e, ex) = estOf(vs.map(r => fp60(r._2)))
        (g, e, ex, false)
      }.toSet
      val (re, rex) = estOf(rows.map(r => fp60(r._2)))
      val expect = byGrp + (("__all", re, rex, true))
      assert(got == expect, s"seed $seed: only-got=${got -- expect} " +
        s"only-expect=${expect -- got}")
    }
  }

  test("knn join and hard negatives match brute force on random labeled vectors") {
    import spark.implicits._
    def r6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0) 0.0 else r6(d / den)
    }
    for (seed <- Seq(5, 21)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until 120).map { i =>
        (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1), rnd.nextInt(3))
      }
      val df = vecs.map { case (id, v, l) => (id, v.toSeq, l) }
        .toDF("vec_id", "embedding", "label")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding", "label")
      val kk = 4

      // knn join: queries = label 0, corpus = label != 0
      val gotKnn = graft.ops.Similarity.knnJoin(
          df.where(col("label") === 0), df.where(col("label") =!= 0), k = kk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val queries = vecs.filter(_._3 == 0); val corpus = vecs.filter(_._3 != 0)
      val expKnn = queries.flatMap { case (q, vq, _) =>
        corpus.map { case (b, vb, _) => (b, cos(vq, vb)) }
          .sortBy { case (b, c) => (-c, b) }.take(kk).zipWithIndex
          .map { case ((b, _), i) => (q, b, i + 1) }
      }.toSet
      assert(gotKnn == expKnn, s"seed $seed knn: only-got=${gotKnn -- expKnn} " +
        s"only-expect=${expKnn -- gotKnn}")

      // IVF-routed knn at full probe: the routed plan (train -> assign ->
      // probe-replicate -> per-list top-k -> bounded merge) must reproduce
      // the exact bipartite rank on ANY vector set, not just the fixture —
      // the oracle premise as a randomized property
      val gotIvf = graft.ops.Similarity.knnJoinIvf(
          df.where(col("label") === 0), df.where(col("label") =!= 0),
          k = kk, nlist = 4, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(gotIvf == expKnn, s"seed $seed ivf-knn: only-got=${gotIvf -- expKnn} " +
        s"only-expect=${expKnn -- gotIvf}")

      // hard negatives: per anchor, top-k among DIFFERENT labels
      val gotHn = graft.ops.Similarity.hardNegatives(df, k = kk)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(5))).toSet
      val expHn = vecs.flatMap { case (a, va, la) =>
        vecs.filter(v => v._1 != a && v._3 != la)
          .map { case (b, vb, _) => (b, cos(va, vb)) }
          .sortBy { case (b, c) => (-c, b) }.take(kk).zipWithIndex
          .map { case ((b, _), i) => (a, b, i + 1) }
      }.toSet
      assert(gotHn == expHn, s"seed $seed hn: only-got=${gotHn -- expHn} " +
        s"only-expect=${expHn -- gotHn}")
    }
  }

  test("histogram quantiles match direct rank arithmetic on random groups") {
    import spark.implicits._
    val width = 3.0; val nBuckets = 50; val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    for (seed <- Seq(13, 77)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 3000).map { _ =>
        (s"g${rnd.nextInt(4)}", rnd.nextDouble() * 200 - 20) // spills both clamps
      }
      val got = graft.ops.Sketches.histogramQuantiles(rows.toDF("grp", "v"),
          "grp", "v", width, nBuckets, qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      rows.groupBy(_._1).foreach { case (g, vs) =>
        val buckets = vs.map(r =>
            math.max(0L, math.min(nBuckets - 1L, math.floor(r._2 / width).toLong)))
          .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
          .toSeq.sortBy(_._1)
        val n = vs.size.toLong
        qs.foreach { q =>
          val target = q * n
          var cum = 0L
          val (b, cnt, before) = buckets.collectFirst {
            case (bk, c) if { cum += c; cum >= target } => (bk, c, cum - c)
          }.get
          val est = new java.math.BigDecimal(
            b * width + width * ((target - before) / cnt))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
          assert(got((g, q)) == ((n, est)),
            s"seed $seed $g q=$q: ${got((g, q))} vs ($n, $est)")
        }
      }
    }
  }
}
