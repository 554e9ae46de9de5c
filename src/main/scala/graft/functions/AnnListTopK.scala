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
  * (cos desc, id asc) order. NULL in → NULL out.
  *
  * PER-TASK LIST CACHE (r18): the ArrayData accessor form reads every
  * vector element through `Platform.getFloat`, which the JIT will not
  * SIMD-vectorize — the sf10 decomposition probe measured the accessor
  * kernel at ~750 CPU-s vs ~495 CPU-s for the identical arithmetic over
  * primitive arrays (the broadcast tier's loop). Joined rows arrive
  * GROUPED by list (the stream-static join sorts/partitions on the list
  * key), so the expression now extracts each list's arrays to primitives
  * ONCE per (task, list) — a (`tag`, list-id)-keyed byte-bounded LRU per
  * task thread ([[AnnListTopK.ListLru]]), ~one 1/nlist-of-corpus copy per
  * list touched — and every query row scores through the shared
  * vectorizable [[AnnListTopK.scoreInto]] loop. `tag` is unique per
  * expression construction, so two plans (or a restarted stream) can
  * never read each other's entries, and entries live ONE task attempt
  * ([[AnnListTopK.forTask]]): within a task the joined rows come from one
  * consistent fold snapshot, so equal (tag, list) always means identical
  * arrays — even if the persisted fold is evicted and recomputed against
  * an index table a maintenance append has since grown. */
case class AnnListTopK(list: Expression, qv: Expression, ids: Expression,
                       flat: Expression, norms: Expression, dim: Expression,
                       k: Int, tag: Long = AnnListTopK.nextTag())
    extends Expression {

  require(k >= 1, s"k must be >= 1: $k")

  override def children: Seq[Expression] = Seq(list, qv, ids, flat, norms, dim)
  override def nullable: Boolean = true
  override def dataType: DataType = AnnListTopK.OutType
  override def prettyName: String = "ann_list_top_k"

  override def checkInputDataTypes(): TypeCheckResult = {
    def elemOk(e: Expression, el: DataType) = e.dataType match {
      case ArrayType(`el`, _) => true
      case _ => false
    }
    if (list.dataType == IntegerType && elemOk(qv, FloatType) &&
        elemOk(ids, LongType) && elemOk(flat, FloatType) &&
        elemOk(norms, DoubleType) && dim.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ann_list_top_k requires (INT, ARRAY<FLOAT>, ARRAY<BIGINT>, ARRAY<FLOAT>, " +
        s"ARRAY<DOUBLE>, INT), got (${children.map(_.dataType.sql).mkString(", ")})")
  }

  override def eval(input: InternalRow): Any = {
    val l = list.eval(input)
    val q = qv.eval(input)
    val i = ids.eval(input)
    val f = flat.eval(input)
    val n = norms.eval(input)
    val d = dim.eval(input)
    if (l == null || q == null || i == null || f == null || n == null || d == null) null
    else AnnListTopK.topKCached(tag, l.asInstanceOf[Int],
      q.asInstanceOf[ArrayData], i.asInstanceOf[ArrayData],
      f.asInstanceOf[ArrayData], n.asInstanceOf[ArrayData],
      d.asInstanceOf[Int], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lC = list.genCode(ctx)
    val qC = qv.genCode(ctx)
    val iC = ids.genCode(ctx)
    val fC = flat.genCode(ctx)
    val nC = norms.genCode(ctx)
    val dC = dim.genCode(ctx)
    ev.copy(code = code"""
      |${lC.code}
      |${qC.code}
      |${iC.code}
      |${fC.code}
      |${nC.code}
      |${dC.code}
      |boolean ${ev.isNull} = ${lC.isNull} || ${qC.isNull} || ${iC.isNull} ||
      |  ${fC.isNull} || ${nC.isNull} || ${dC.isNull};
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.AnnListTopK.topKCached(${tag}L, ${lC.value},
      |    ${qC.value}, ${iC.value}, ${fC.value}, ${nC.value}, ${dC.value}, $k);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AnnListTopK =
    copy(list = newChildren(0), qv = newChildren(1), ids = newChildren(2),
      flat = newChildren(3), norms = newChildren(4), dim = newChildren(5))
}

object AnnListTopK {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  private val tagCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Unique per expression construction — the cache-isolation key. */
  def nextTag(): Long = tagCounter.incrementAndGet()

  /** One cached list's primitive extraction, keyed by (tag, listId). */
  final class CachedList(val ids: Array[Long],
                         val flat: Array[Float], val norms: Array[Double]) {
    def bytes: Long = ids.length * 8L + flat.length * 4L + norms.length * 8L
  }

  /** Per-thread byte-bounded LRU over extracted lists. A single-entry slot
    * THRASHES when the join is a shuffled-hash join (no sort — probe rows
    * interleave lists within a partition), re-extracting a whole list per
    * row: measured 2.75 → 3.9 s on the sf0.1 bench keys. The LRU absorbs
    * interleaving of however many lists share a partition, within a fixed
    * byte budget per task thread; with the float tier's one-list-per-
    * partition join the working set is one entry either way.
    *
    * LIFETIME: entries live for ONE task attempt (see [[forTask]]) — the
    * amortization the cache exists for is within-task by construction
    * (extract each joined list once per (task, list); probe rows arrive
    * grouped), so the bound costs nothing, and it closes two hazards a
    * JVM-lifetime thread cache has: dead-tag entries of finished plans
    * stranding up to the budget per thread forever, and a persisted fold
    * evicted and recomputed mid-stream against an index table that
    * streamingIndexAppend has since GROWN serving pre-recompute arrays
    * (within one task the joined rows come from one consistent fold
    * snapshot — exactly the cache's new lifetime). */
  final class ListLru(budget: Long) {
    private var bytes = 0L
    private[functions] var ownerTask: Long = -1L
    private val map =
      new java.util.LinkedHashMap[(Long, Int), AnyRef](16, 0.75f, true)
    def get(tag: Long, listId: Int): AnyRef = map.get((tag, listId))
    def put(tag: Long, listId: Int, v: AnyRef): Unit = {
      bytes += ListLru.sizeOf(v)
      map.put((tag, listId), v)
      // evict LRU-first until back under budget; the entry just added is
      // MRU and always kept (a single over-budget list still serves)
      val it = map.entrySet().iterator()
      while (bytes > budget && map.size() > 1) {
        val e = it.next()
        bytes -= ListLru.sizeOf(e.getValue)
        it.remove()
      }
    }
    def clear(): Unit = { map.clear(); bytes = 0L; ownerTask = -1L }
  }
  object ListLru {
    private[functions] def sizeOf(v: AnyRef): Long = v match {
      case c: CachedList                => c.bytes
      case c: AnnAdcListTopK.CachedCodes => c.bytes
      case _                            => 0L
    }
  }

  /** 64 MB of extracted lists per task thread — covers every measured
    * working set (small-SF: all lists fit; sf10 float: one ~800 KB list
    * per partition; sf10 codes: the full 256-list code fold is ~25 MB)
    * while staying a bounded slice of executor memory at any scale. */
  private val lru: ThreadLocal[ListLru] =
    ThreadLocal.withInitial(() => new ListLru(64L << 20))

  /** The calling TASK's cache: on first touch by a new task attempt the
    * thread's entries (a previous task's) are cleared and a
    * TaskCompletionListener clears them again when this task ends — see
    * the lifetime note on [[ListLru]]. Driver-local evaluation (no
    * TaskContext: constant folding, unit calls) keeps the plain
    * thread-local behavior. */
  private[functions] def forTask(): ListLru = {
    val cache = lru.get()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && cache.ownerTask != tc.taskAttemptId()) {
      cache.clear()
      cache.ownerTask = tc.taskAttemptId()
      tc.addTaskCompletionListener[Unit](_ => cache.clear())
    }
    cache
  }

  /** [[topK]] with the per-(task, list) primitive cache described in the
    * class doc. Joined rows arrive mostly grouped by list, so the
    * extraction (three bulk `toXxxArray` copies) amortizes over every
    * query row that probes the list; scoring runs the same SIMD-friendly
    * primitive loop as the broadcast tier ([[scoreInto]]). Result is
    * bit-identical to [[topK]] — property-pinned. */
  def topKCached(tag: Long, listId: Int, qv: ArrayData, ids: ArrayData,
                 flat: ArrayData, norms: ArrayData, dim: Int, k: Int): ArrayData = {
    import graft.ops.Similarity
    val cache = forTask()
    var c = cache.get(tag, listId).asInstanceOf[CachedList]
    if (c == null) {
      c = new CachedList(ids.toLongArray(), flat.toFloatArray(), norms.toDoubleArray())
      cache.put(tag, listId, c)
    }
    val q = qv.toFloatArray()
    val top = new Similarity.TopK(k)
    scoreInto(top, q, Similarity.normP(q), c.ids, c.flat, c.norms, dim)
    new GenericArrayData(top.iterator
      .map { case (b, cos) => InternalRow(b, cos) }.toArray[Any])
  }

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
