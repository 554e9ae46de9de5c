package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** [[AnnListTopK]]'s IVFADC twin: score one query vector against one
  * FLAT-PACKED inverted list of PQ CODES — (ids, codes flattened m per
  * vector) — and return only the top-k (b, dist2) pairs by ADC distance.
  *
  * The quantizer artifacts (coarse centroids + codebooks) ride as
  * CONSTRUCTOR FIELDS, not children: they are build-time constants of the
  * serving stream, shipped to generated code via `addReferenceObj`. Per
  * row the kernel builds the m×k residual distance table once (the
  * query's residual against ITS probed cell — `cell` is a child column),
  * then each candidate costs m table lookups, read IN PLACE from the
  * join's build-side row (no per-row deserialization of the list arrays —
  * the [[AnnListTopK]] measurement). Semantics match
  * [[graft.ops.Pq.adcTopK]] for finite distances: (dist asc, id asc)
  * deterministic order, and the qid self-pair (b == q id) IS excluded,
  * exactly as adcTopK excludes it — re-ingest of an indexed id never
  * reports itself as its own neighbor. NaN distances (possible only from
  * NaN inputs, which the quantizer never produces) are SKIPPED rather
  * than inheriting adcTopK's Ordering[Double] NaN placement. NULL in →
  * NULL out. */
case class AnnAdcListTopK(qv: Expression, qid: Expression, cell: Expression,
                          ids: Expression, codes: Expression,
                          centroids: Array[Array[Float]],
                          books: Array[Array[Array[Float]]],
                          k: Int, tag: Long = AnnListTopK.nextTag())
    extends Expression {

  require(k >= 1, s"k must be >= 1: $k")

  override def children: Seq[Expression] = Seq(qv, qid, cell, ids, codes)
  override def nullable: Boolean = true
  override def dataType: DataType = AnnAdcListTopK.OutType
  override def prettyName: String = "ann_adc_list_top_k"

  override def checkInputDataTypes(): TypeCheckResult = {
    def elemOk(e: Expression, el: DataType) = e.dataType match {
      case ArrayType(`el`, _) => true
      case _ => false
    }
    if (elemOk(qv, FloatType) && qid.dataType == LongType &&
        cell.dataType == IntegerType && elemOk(ids, LongType) &&
        elemOk(codes, IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ann_adc_list_top_k requires (ARRAY<FLOAT>, BIGINT, INT, " +
        s"ARRAY<BIGINT>, ARRAY<INT>), got (${children.map(_.dataType.sql).mkString(", ")})")
  }

  override def eval(input: InternalRow): Any = {
    val q = qv.eval(input)
    val qi = qid.eval(input)
    val c = cell.eval(input)
    val i = ids.eval(input)
    val cd = codes.eval(input)
    if (q == null || qi == null || c == null || i == null || cd == null) null
    else AnnAdcListTopK.topKCached(tag, q.asInstanceOf[ArrayData],
      qi.asInstanceOf[Long], c.asInstanceOf[Int], i.asInstanceOf[ArrayData],
      cd.asInstanceOf[ArrayData], centroids, books, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qC = qv.genCode(ctx)
    val qiC = qid.genCode(ctx)
    val cC = cell.genCode(ctx)
    val iC = ids.genCode(ctx)
    val cdC = codes.genCode(ctx)
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val bks = ctx.addReferenceObj("books", books, "float[][][]")
    ev.copy(code = code"""
      |${qC.code}
      |${qiC.code}
      |${cC.code}
      |${iC.code}
      |${cdC.code}
      |boolean ${ev.isNull} = ${qC.isNull} || ${qiC.isNull} || ${cC.isNull} ||
      |  ${iC.isNull} || ${cdC.isNull};
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.AnnAdcListTopK.topKCached(${tag}L, ${qC.value},
      |    ${qiC.value}, ${cC.value}, ${iC.value}, ${cdC.value}, $cents, $bks, $k);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AnnAdcListTopK =
    copy(qv = newChildren(0), qid = newChildren(1), cell = newChildren(2),
      ids = newChildren(3), codes = newChildren(4))
}

object AnnAdcListTopK {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("dist2", DoubleType, nullable = false))), containsNull = false)

  /** Shared by interpreted eval and generated code. Candidate ids/codes
    * are read IN PLACE; the per-row work is one m×k distance table + n·m
    * lookups. Ordering and tie-breaks are [[graft.ops.Pq.adcTopK]]'s
    * (dist asc, id asc); the qid self-exclusion matches it too. NaN
    * distances are skipped (dist == dist guard) — see the class doc. */
  def topK(qv: ArrayData, qid: Long, cell: Int, ids: ArrayData, codes: ArrayData,
           centroids: Array[Array[Float]], books: Array[Array[Array[Float]]],
           k: Int): ArrayData = {
    import graft.ops.Pq
    val q = qv.toFloatArray()
    val dt = Pq.distTable(Pq.residualOf(q, centroids(cell)), books)
    val m = dt.length
    val n = ids.numElements()
    // reuse the deterministic bounded heap with dist mapped to a
    // descending key: TopK keeps (score desc, id asc), so offer -dist
    val top = new graft.ops.Similarity.TopK(k)
    var i = 0
    while (i < n) {
      val bid = ids.getLong(i)
      if (bid != qid) {
        var dist = 0.0
        var sub = 0
        val off = i * m
        while (sub < m) { dist += dt(sub)(codes.getInt(off + sub)); sub += 1 }
        if (dist == dist) top.offer(bid, -dist)
      }
      i += 1
    }
    new GenericArrayData(top.iterator
      .map { case (b, negD) => InternalRow(b, -negD) }.toArray[Any])
  }

  private[functions] final class CachedCodes(val ids: Array[Long],
                                             val codes: Array[Int]) {
    def bytes: Long = ids.length * 8L + codes.length * 4L
  }

  /** [[topK]] with [[AnnListTopK.topKCached]]'s per-thread byte-bounded
    * LRU over extracted lists (shared budget — see [[AnnListTopK.ListLru]]
    * for why a single-entry slot thrashes under a shuffled-hash join).
    * The ids/codes extraction amortizes over every query row probing the
    * cell and the lookup loop runs over primitive arrays ([[topKFlat]],
    * the broadcast tier's exact scorer). `tag` is unique per expression
    * construction and entries live one task attempt
    * ([[AnnListTopK.forTask]]) — within a task the joined rows come from
    * one consistent fold snapshot, so equal (tag, cell) always means
    * identical arrays even if the fold is evicted and recomputed against
    * a grown index between tasks. Result ≡ [[topK]], property-pinned. */
  def topKCached(tag: Long, qv: ArrayData, qid: Long, cell: Int,
                 ids: ArrayData, codes: ArrayData,
                 centroids: Array[Array[Float]],
                 books: Array[Array[Array[Float]]], k: Int): ArrayData = {
    import graft.ops.Pq
    val cache = AnnListTopK.forTask()
    var c = cache.get(tag, cell).asInstanceOf[CachedCodes]
    if (c == null) {
      c = new CachedCodes(ids.toLongArray(), codes.toIntArray())
      cache.put(tag, cell, c)
    }
    val q = qv.toFloatArray()
    val dt = Pq.distTable(Pq.residualOf(q, centroids(cell)), books)
    new GenericArrayData(topKFlat(qid, dt, c.ids, c.codes, k)
      .map { case (b, d) => InternalRow(b, d) }.toArray[Any])
  }

  /** Broadcast-tier twin of [[topK]] over plain primitive arrays, taking
    * the query's PREBUILT per-cell distance table (so a shortlist caller
    * builds it once per probed cell): same lookup loop, qid
    * self-exclusion, NaN skip, and (dist asc, id asc) order. Codes are
    * flat-packed at stride dt.length. Returns ≤ k (b, dist2) pairs. */
  def topKFlat(qid: Long, dt: Array[Array[Double]], ids: Array[Long],
               codes: Array[Int], k: Int): Iterator[(Long, Double)] = {
    val m = dt.length
    val n = ids.length
    val top = new graft.ops.Similarity.TopK(k)
    var i = 0
    while (i < n) {
      val bid = ids(i)
      if (bid != qid) {
        var dist = 0.0
        var sub = 0
        val off = i * m
        while (sub < m) { dist += dt(sub)(codes(off + sub)); sub += 1 }
        if (dist == dist) top.offer(bid, -dist)
      }
      i += 1
    }
    top.iterator.map { case (b, negD) => (b, -negD) }
  }
}
