package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL fixed-width window hashes of a string in
  * one O(n) pass — `rolling_hash_windows(s, w)` returns the array
  * `[h(s[0..w)), h(s[1..w+1)), …]` over unicode codepoints.
  *
  * Each value combines two independent polynomial rolling hashes
  * (base 31, moduli 2³¹−1 and 2³¹−19, both prime) into one 62-bit long —
  * a single 31-bit hash would birthday-collide by the hundreds on a
  * 10⁶-window corpus slice, manufacturing false duplicate spans. The
  * rolling update (add head, drop tail via precomputed 31^w) keeps the
  * whole array O(n) instead of the O(n·w) of hashing every substring
  * separately, and doGenCode inlines a static helper call so the array is
  * built inside WholeStageCodegen with no UDF boxing. */
case class RollingHashWindows(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"rolling_hash_windows requires a STRING argument, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "rolling_hash_windows requires a literal INT window size")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash_windows"

  override protected def nullSafeEval(str: Any, w: Any): Any =
    RollingHashWindows.hashes(
      str.asInstanceOf[UTF8String].toString, w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w) =>
      s"${ev.value} = graft.functions.RollingHashWindows.hashes($s.toString(), $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHashWindows =
    copy(left = newLeft, right = newRight)
}

object RollingHashWindows {

  val P1: Long = 2147483647L // 2^31 - 1, prime
  val P2: Long = 2147483629L // 2^31 - 19, prime
  val B: Long = 31L

  /** Shared by interpreted eval and generated code. Intermediate products
    * stay under 2^52 (codepoint < 2^21, modulus < 2^31) — no overflow. */
  def hashes(s: String, w: Int): GenericArrayData = {
    if (w <= 0) return new GenericArrayData(Array.emptyLongArray)
    val n = s.codePointCount(0, s.length)
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    var pw1 = 1L
    var pw2 = 1L
    var j = 0
    while (j < w) { pw1 = pw1 * B % P1; pw2 = pw2 * B % P2; j += 1 }
    val out = new Array[Long](n - w + 1)
    var h1 = 0L
    var h2 = 0L
    j = 0
    while (j < n) {
      h1 = (h1 * B + cps(j)) % P1
      h2 = (h2 * B + cps(j)) % P2
      if (j >= w) {
        h1 = (h1 - cps(j - w) * pw1) % P1
        if (h1 < 0) h1 += P1
        h2 = (h2 - cps(j - w) * pw2) % P2
        if (h2 < 0) h2 += P2
      }
      if (j >= w - 1) out(j - w + 1) = h1 * P2 + h2
      j += 1
    }
    new GenericArrayData(out)
  }
}
