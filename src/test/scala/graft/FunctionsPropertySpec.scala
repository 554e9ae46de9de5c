package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native Catalyst expressions' JVM kernels — the
  * algebraic invariants the operators rely on, checked over generated
  * inputs instead of hand-picked fixtures. These exercise the shared
  * static helpers directly (the same code both interpreted eval and
  * generated code call), so no SparkSession is needed and hundreds of
  * cases run in milliseconds. */
class FunctionsPropertySpec extends AnyFunSuite {

  /** Bare-scalacheck bridge (scalatestplus isn't on the classpath): run
    * 200 cases and surface the failing args through ScalaTest. The initial
    * seed is FIXED so a failing case reproduces on re-run. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }

  private val P1 = graft.functions.RollingHashWindows.P1
  private val P2 = graft.functions.RollingHashWindows.P2

  private def directWindowHash(s: String, from: Int, w: Int): Long = {
    // reference implementation: hash each window from scratch
    val win = s.codePoints().toArray.slice(from, from + w)
    val h1 = win.foldLeft(0L)((h, cp) => (h * 31 + cp) % P1)
    val h2 = win.foldLeft(0L)((h, cp) => (h * 31 + cp) % P2)
    h1 * P2 + h2
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 200)
    // mix ASCII with supplementary-plane codepoints (surrogate pairs) so
    // the codepoint iteration is exercised, not just char indexing
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      1 -> Gen.const(" "),
      1 -> Gen.oneOf("é", "中", new String(Character.toChars(0x1F600)))))
  } yield cs.mkString

  test("cosine kernel equals direct double arithmetic, length-mismatch and zero cases") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen: Gen[Array[Float]] = for {
      n <- Gen.choose(0, 48)
      xs <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    } yield xs.toArray
    def ad(v: Array[Float]) = new GenericArrayData(v.map(x => x: Any))
    check(forAll(vecGen, vecGen) { (a: Array[Float], b: Array[Float]) =>
      // reference: dot over the common prefix, norms over the FULL arrays
      // (the kernel's documented length-mismatch contract), 0 on zero norms
      val n = math.min(a.length, b.length)
      val dot = (0 until n).map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      val expect = if (na * nb == 0 || (na * nb).isNaN) 0.0 else dot / (na * nb)
      val got = graft.functions.CosineSim.cosine(ad(a), ad(b))
      math.abs(got - expect) < 1e-9 &&
        (a.isEmpty || !a.exists(_ != 0f) ||
          math.abs(graft.functions.CosineSim.cosine(ad(a), ad(a)) - 1.0) < 1e-9)
    })
  }

  test("rolling window hashes equal from-scratch hashes on arbitrary unicode") {
    check(forAll(textGen, Gen.choose(1, 40)) { (s: String, w: Int) =>
      val n = s.codePointCount(0, s.length)
      val rolled = graft.functions.RollingHashWindows.hashes(s, w).toLongArray()
      if (n < w) rolled.isEmpty
      else rolled.length == n - w + 1 &&
        rolled.indices.forall(i => rolled(i) == directWindowHash(s, i, w))
    })
  }

  test("window hash equals whole-string rolling hash when the window is the string") {
    check(forAll(textGen.suchThat(_.nonEmpty)) { s =>
      val n = s.codePointCount(0, s.length)
      val rolled = graft.functions.RollingHashWindows.hashes(s, n).toLongArray()
      // h1 component of the combined hash must match RollingHash (same
      // base and modulus) — ties the two expressions' definitions together
      rolled.length == 1 && rolled.head / P2 == graft.functions.RollingHash.hash(s)
    })
  }

  test("ann_list_top_k kernel equals the typed flat-packed scoring loop") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import graft.ops.Similarity
    val dimGen = Gen.choose(1, 8)
    val listGen = for {
      dim <- dimGen
      n <- Gen.choose(0, 12)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray))
      q <- Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray)
      k <- Gen.choose(1, 6)
    } yield (dim, vs.toArray, q, k)
    check(forAll(listGen) { case (dim, vs, q, k) =>
      val ids = vs.indices.map(_.toLong + 100).toArray
      val flat = vs.flatten
      val norms = vs.map(Similarity.normP)
      val got = graft.functions.AnnListTopK.topK(
        new GenericArrayData(q.map(x => x: Any)),
        new GenericArrayData(ids.map(x => x: Any)),
        new GenericArrayData(flat.map(x => x: Any)),
        new GenericArrayData(norms.map(x => x: Any)), dim, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      // reference: the typed kernel the expression replaced
      val top = new Similarity.TopK(k)
      val nq = Similarity.normP(q)
      vs.indices.foreach(i =>
        top.offer(ids(i), Similarity.cosineOfFlat(q, nq, flat, i * dim, dim, norms(i))))
      got == top.iterator.toSeq
    })
  }

  test("topKCached equals topK, and cache entries are tag/list isolated") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import graft.ops.Similarity
    // the r18 per-(task, list) primitive cache must be semantics-free:
    // bit-identical output, with a poisoned cache entry (same list id,
    // DIFFERENT tag or different list) never leaking across calls
    val listGen = for {
      dim <- Gen.choose(1, 8)
      n <- Gen.choose(0, 12)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray))
      vs2 <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray))
      q <- Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray)
      k <- Gen.choose(1, 6)
    } yield (dim, vs.toArray, vs2.toArray, q, k)
    check(forAll(listGen) { case (dim, vs, vs2, q, k) =>
      def arr(vsx: Array[Array[Float]]) = (
        new GenericArrayData(vsx.indices.map(i => (i.toLong + 100): Any).toArray),
        new GenericArrayData(vsx.flatten.map(x => x: Any)),
        new GenericArrayData(vsx.map(v => Similarity.normP(v): Any)))
      def run(tag: Long, list: Int, vsx: Array[Array[Float]]) = {
        val (ids, flat, norms) = arr(vsx)
        graft.functions.AnnListTopK.topKCached(tag, list,
          new GenericArrayData(q.map(x => x: Any)), ids, flat, norms, dim, k)
          .array.map { r =>
            val row = r.asInstanceOf[InternalRow]
            (row.getLong(0), row.getDouble(1))
          }.toSeq
      }
      val (ids1, flat1, norms1) = arr(vs)
      val expect1 = graft.functions.AnnListTopK.topK(
        new GenericArrayData(q.map(x => x: Any)), ids1, flat1, norms1, dim, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      val (ids2, flat2, norms2) = arr(vs2)
      val expect2 = graft.functions.AnnListTopK.topK(
        new GenericArrayData(q.map(x => x: Any)), ids2, flat2, norms2, dim, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      // fresh tags per iteration — in production a tag is unique per plan
      // construction, so the LRU can never see one tag with two contents
      val t1 = graft.functions.AnnListTopK.nextTag()
      val t2 = graft.functions.AnnListTopK.nextTag()
      val a = run(t1, 7, vs)   // fills cache
      val b = run(t1, 7, vs)   // cache HIT — must still equal topK(vs)
      // same list id, different TAG (another plan): must NOT reuse vs
      val c = run(t2, 7, vs2)
      // same tag, different list: must NOT reuse vs2
      val d = run(t2, 9, vs)
      a == expect1 && b == expect1 && c == expect2 && d == expect1
    })
  }

  test("ann_adc_list_top_k kernel equals Pq.adcTopK on packed codes") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import graft.ops.Pq
    val caseGen = for {
      m <- Gen.choose(1, 4)
      dsub <- Gen.choose(1, 4)
      kk <- Gen.choose(1, 6) // codes per book
      nc <- Gen.choose(1, 3) // coarse centroids
      books <- Gen.listOfN(m, Gen.listOfN(kk,
        Gen.listOfN(dsub, Gen.chooseNum(-5f, 5f)).map(_.toArray)).map(_.toArray)).map(_.toArray)
      cents <- Gen.listOfN(nc, Gen.listOfN(m * dsub, Gen.chooseNum(-5f, 5f)).map(_.toArray)).map(_.toArray)
      cell <- Gen.choose(0, nc - 1)
      n <- Gen.choose(0, 10)
      codes <- Gen.listOfN(n, Gen.listOfN(m, Gen.choose(0, kk - 1)).map(_.toArray)).map(_.toArray)
      q <- Gen.listOfN(m * dsub, Gen.chooseNum(-5f, 5f)).map(_.toArray)
      k <- Gen.choose(1, 5)
    } yield (books, cents, cell, codes, q, k)
    check(forAll(caseGen) { case (books, cents, cell, codes, q, k) =>
      val ids = codes.indices.map(_.toLong + 7).toArray
      val got = graft.functions.AnnAdcListTopK.topK(
        new GenericArrayData(q.map(x => x: Any)), -1L, cell,
        new GenericArrayData(ids.map(x => x: Any)),
        new GenericArrayData(codes.flatten.map(x => x: Any)),
        cents, books, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      val dt = Pq.distTable(Pq.residualOf(q, cents(cell)), books)
      val expect = Pq.adcTopK(-1L, dt, k,
        ids.zip(codes).iterator).map { case (_, b, d) => (b, d) }.toSeq
      // the r18 per-(task, cell) code cache must be semantics-free too,
      // including a poisoned entry from another tag on the same cell id
      def cached(tag: Long) = graft.functions.AnnAdcListTopK.topKCached(tag,
        new GenericArrayData(q.map(x => x: Any)), -1L, cell,
        new GenericArrayData(ids.map(x => x: Any)),
        new GenericArrayData(codes.flatten.map(x => x: Any)),
        cents, books, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      val t1 = graft.functions.AnnListTopK.nextTag()
      val t2 = graft.functions.AnnListTopK.nextTag()
      val first = cached(t1)  // fill
      val hit = cached(t1)    // cache hit
      val fresh = cached(t2)  // same cell id, different tag — must re-extract
      got == expect && first == expect && hit == expect && fresh == expect
    })
  }

  test("scoreInto (flat broadcast scorer) equals the ann_list_top_k kernel") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import graft.ops.Similarity
    // the r17 broadcast tier packs its map to the spill fold's layout and
    // scores with scoreInto — per probed list it must produce exactly the
    // kernel's candidates when offered into a fresh heap
    val listGen = for {
      dim <- Gen.choose(1, 8)
      n <- Gen.choose(0, 12)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray))
      q <- Gen.listOfN(dim, Gen.chooseNum(-10f, 10f)).map(_.toArray)
      k <- Gen.choose(1, 6)
    } yield (dim, vs.toArray, q, k)
    check(forAll(listGen) { case (dim, vs, q, k) =>
      val ids = vs.indices.map(_.toLong + 100).toArray
      val flat = vs.flatten
      val norms = vs.map(Similarity.normP)
      val top = new Similarity.TopK(k)
      graft.functions.AnnListTopK.scoreInto(top, q, Similarity.normP(q),
        ids, flat, norms, dim)
      val expect = graft.functions.AnnListTopK.topK(
        new GenericArrayData(q.map(x => x: Any)),
        new GenericArrayData(ids.map(x => x: Any)),
        new GenericArrayData(flat.map(x => x: Any)),
        new GenericArrayData(norms.map(x => x: Any)), dim, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      top.iterator.toSeq == expect
    })
  }

  test("topKFlat (flat broadcast ADC scorer) equals the ann_adc_list_top_k kernel") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import graft.ops.Pq
    val caseGen = for {
      m <- Gen.choose(1, 4)
      dsub <- Gen.choose(1, 4)
      kk <- Gen.choose(1, 6)
      nc <- Gen.choose(1, 3)
      books <- Gen.listOfN(m, Gen.listOfN(kk,
        Gen.listOfN(dsub, Gen.chooseNum(-5f, 5f)).map(_.toArray)).map(_.toArray)).map(_.toArray)
      cents <- Gen.listOfN(nc, Gen.listOfN(m * dsub, Gen.chooseNum(-5f, 5f)).map(_.toArray)).map(_.toArray)
      cell <- Gen.choose(0, nc - 1)
      n <- Gen.choose(0, 10)
      codes <- Gen.listOfN(n, Gen.listOfN(m, Gen.choose(0, kk - 1)).map(_.toArray)).map(_.toArray)
      q <- Gen.listOfN(m * dsub, Gen.chooseNum(-5f, 5f)).map(_.toArray)
      k <- Gen.choose(1, 5)
      qid <- Gen.oneOf(Gen.const(-1L), Gen.choose(7L, 7L + math.max(0, n - 1)))
    } yield (books, cents, cell, codes, q, k, qid)
    check(forAll(caseGen) { case (books, cents, cell, codes, q, k, qid) =>
      val ids = codes.indices.map(_.toLong + 7).toArray
      val dt = Pq.distTable(Pq.residualOf(q, cents(cell)), books)
      val got = graft.functions.AnnAdcListTopK
        .topKFlat(qid, dt, ids, codes.flatten, k).toSeq
      val expect = graft.functions.AnnAdcListTopK.topK(
        new GenericArrayData(q.map(x => x: Any)), qid, cell,
        new GenericArrayData(ids.map(x => x: Any)),
        new GenericArrayData(codes.flatten.map(x => x: Any)),
        cents, books, k)
        .array.map { r =>
          val row = r.asInstanceOf[InternalRow]
          (row.getLong(0), row.getDouble(1))
        }.toSeq
      got == expect
    })
  }

  test("NaN ADC distances are skipped, never evicting finite candidates") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    // code 0's sub-distance is NaN (a NaN input vector); candidate 0 must
    // be SKIPPED by both kernel forms while finite candidate 1 survives —
    // the r16 heap inserted the NaN at the worst slot and could evict a
    // finite candidate (ADVICE r16)
    val books = Array(Array(Array(Float.NaN), Array(1f)))
    val cents = Array(Array(0f))
    val ids = Array(10L, 11L)
    val codes = Array(0, 1)
    val q = Array(0f)
    val dt = graft.ops.Pq.distTable(graft.ops.Pq.residualOf(q, cents(0)), books)
    val flatGot = graft.functions.AnnAdcListTopK.topKFlat(-1L, dt, ids, codes, 2).toSeq
    val kernelGot = graft.functions.AnnAdcListTopK.topK(
      new GenericArrayData(q.map(x => x: Any)), -1L, 0,
      new GenericArrayData(ids.map(x => x: Any)),
      new GenericArrayData(codes.map(x => x: Any)),
      cents, books, 2)
      .array.map { r =>
        val row = r.asInstanceOf[InternalRow]
        (row.getLong(0), row.getDouble(1))
      }.toSeq
    assert(flatGot.map(_._1) == Seq(11L), s"flat scorer admitted NaN: $flatGot")
    assert(kernelGot.map(_._1) == Seq(11L), s"kernel admitted NaN: $kernelGot")
  }

  test("identical windows collide, and values stay within the 62-bit range") {
    check(forAll(textGen, Gen.choose(1, 20)) { (s: String, w: Int) =>
      val doubled = s + s
      val n = s.codePointCount(0, s.length)
      val h = graft.functions.RollingHashWindows.hashes(doubled, w).toLongArray()
      // window starting at 0 and at n see the same content
      val repeatOk = n < w || h.isEmpty || h(0) == h(n)
      repeatOk && h.forall(v => v >= 0 && v < P1 * P2)
    })
  }
}
