package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the streaming ANN spill tier: score one
  * query vector against one FLAT-PACKED inverted list — (ids, flattened
  * vectors, norms, dim), the [[graft.streaming.Streams.streamingAnnTopK]]
  * packed-list layout — and return only the top-k (b, cos) pairs.
  *
  * Why an expression and not the typed mapPartitions kernel: after the
  * stream-static join, every one of the Q·nprobe query rows carries its
  * probed list's arrays (~C/nlist vectors). The Dataset encoder
  * DESERIALIZES those arrays per row before a typed kernel can see them —
  * ~1.4 TB of copies at the sf10 probe config (200k×800k, nprobe 8),
  * measured at 94 s vs the broadcast tier's ~35 s on identical work. This
  * expression evaluates inside WholeStageCodegen against the join's
  * build-side row IN PLACE: the list arrays are read through UnsafeArrayData
  * accessors (zero copy — only the small query vector is extracted once per
  * row), and only ≤ k tiny (b, cos) structs are ever materialized.
  *
  * Semantics are bit-identical to the typed kernel it replaces:
  * [[graft.ops.Similarity.cosineOfFlat]]'s zero-norm/round6/min-length
  * conventions and [[graft.ops.Similarity.TopK]]'s deterministic
  * (cos desc, id asc) order. NULL in → NULL out. */
case class AnnListTopK(qv: Expression, ids: Expression, flat: Expression,
                       norms: Expression, dim: Expression, k: Int)
    extends Expression {

  require(k >= 1, s"k must be >= 1: $k")

  override def children: Seq[Expression] = Seq(qv, ids, flat, norms, dim)
  override def nullable: Boolean = true
  override def dataType: DataType = AnnListTopK.OutType
  override def prettyName: String = "ann_list_top_k"

  override def checkInputDataTypes(): TypeCheckResult = {
    def elemOk(e: Expression, el: DataType) = e.dataType match {
      case ArrayType(`el`, _) => true
      case _ => false
    }
    if (elemOk(qv, FloatType) && elemOk(ids, LongType) &&
        elemOk(flat, FloatType) && elemOk(norms, DoubleType) &&
        dim.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ann_list_top_k requires (ARRAY<FLOAT>, ARRAY<BIGINT>, ARRAY<FLOAT>, " +
        s"ARRAY<DOUBLE>, INT), got (${children.map(_.dataType.sql).mkString(", ")})")
  }

  override def eval(input: InternalRow): Any = {
    val q = qv.eval(input)
    val i = ids.eval(input)
    val f = flat.eval(input)
    val n = norms.eval(input)
    val d = dim.eval(input)
    if (q == null || i == null || f == null || n == null || d == null) null
    else AnnListTopK.topK(q.asInstanceOf[ArrayData], i.asInstanceOf[ArrayData],
      f.asInstanceOf[ArrayData], n.asInstanceOf[ArrayData],
      d.asInstanceOf[Int], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qC = qv.genCode(ctx)
    val iC = ids.genCode(ctx)
    val fC = flat.genCode(ctx)
    val nC = norms.genCode(ctx)
    val dC = dim.genCode(ctx)
    ev.copy(code = code"""
      |${qC.code}
      |${iC.code}
      |${fC.code}
      |${nC.code}
      |${dC.code}
      |boolean ${ev.isNull} = ${qC.isNull} || ${iC.isNull} || ${fC.isNull} ||
      |  ${nC.isNull} || ${dC.isNull};
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.AnnListTopK.topK(${qC.value},
      |    ${iC.value}, ${fC.value}, ${nC.value}, ${dC.value}, $k);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AnnListTopK =
    copy(qv = newChildren(0), ids = newChildren(1), flat = newChildren(2),
      norms = newChildren(3), dim = newChildren(4))
}

object AnnListTopK {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  /** Broadcast-tier twin of [[topK]]: identical cosine arithmetic
    * ([[graft.ops.Similarity.cosineOfFlat]] conventions) and offer order
    * over plain primitive arrays, accumulating into the CALLER'S heap so
    * multiple probed lists merge into one per-query top-k. This is the
    * scorer the broadcast tier shares with the spill kernel — the r16
    * broadcast map iterated Array[(Long, Array[Float], Double)] tuples
    * and lost to its own packed spill twin on identical work. */
  def scoreInto(top: graft.ops.Similarity.TopK, q: Array[Float], nq: Double,
                ids: Array[Long], flat: Array[Float], norms: Array[Double],
                dim: Int): Unit = {
    import graft.ops.Similarity
    val n = ids.length
    var i = 0
    while (i < n) {
      top.offer(ids(i), Similarity.cosineOfFlat(q, nq, flat, i * dim, dim, norms(i)))
      i += 1
    }
  }

  /** Shared by interpreted eval and generated code. The list arrays are
    * read IN PLACE through the ArrayData accessors; only the (small) query
    * vector is extracted once. */
  def topK(qv: ArrayData, ids: ArrayData, flat: ArrayData, norms: ArrayData,
           dim: Int, k: Int): ArrayData = {
    import graft.ops.Similarity
    val q = qv.toFloatArray()
    val nq = Similarity.normP(q)
    val top = new Similarity.TopK(k)
    val n = ids.numElements()
    val m = math.min(q.length, dim)
    var i = 0
    while (i < n) {
      val nb = norms.getDouble(i)
      val denom = nq * nb
      val cos =
        if (denom == 0 || denom.isNaN) 0.0
        else {
          var s = 0.0
          var j = 0
          val off = i * dim
          while (j < m) { s += q(j).toDouble * flat.getFloat(off + j).toDouble; j += 1 }
          Similarity.round6(s / denom)
        }
      top.offer(ids.getLong(i), cos)
      i += 1
    }
    new GenericArrayData(top.iterator
      .map { case (b, c) => InternalRow(b, c) }.toArray[Any])
  }
}
