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
    * 200 cases and surface the failing args through ScalaTest. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
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
