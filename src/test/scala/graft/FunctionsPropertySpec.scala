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
