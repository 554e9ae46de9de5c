package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** The k SMALLEST child values per group (child's natural ordering;
  * structs compare field-by-field), as an ascending array — a bounded-heap
  * aggregate, so per-group top-k runs as ONE map-side-combinable
  * aggregation.
  *
  * Why it exists: the idiomatic per-group top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`) hash-partitions
  * by group and SORTS EACH GROUP ON A SINGLE TASK — with few huge groups
  * (strata, sources, languages) that is a full per-group sort on one
  * executor, the classic 100 TB scale-killer. This aggregate keeps a
  * ≤ k-element heap in every partial buffer, so each map task ships at most
  * k elements per group it saw and the merge side combines heaps — shuffled
  * volume is O(k · groups · map-tasks) worst case, never the input, and no
  * task ever sorts more than k elements at once.
  *
  * Exactness at merge: a value belongs to the global k smallest only if it
  * is among the k smallest of every partial that saw it, so evicting
  * anything below a full buffer's max loses nothing.
  *
  * Same ObjectHashAggregate cost class as [[CappedCollectList]] (boxed
  * buffers, no whole-stage codegen for the agg) — the price of the bound.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    sortFields: Int = 0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  require(k >= 1, "bounded_top_k requires k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_top_k"

  // the compared type: with sortFields > 0 on a struct child, only the
  // first sortFields fields are sort keys — the rest is opaque payload
  // (carried, serialized, returned, but never compared, so a map-typed or
  // otherwise non-orderable payload column is fine)
  private def orderedType: DataType = child.dataType match {
    case st: StructType if sortFields > 0 => StructType(st.fields.take(sortFields))
    case dt => dt
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (RowOrdering.isOrderable(orderedType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_top_k sort key type ${orderedType.simpleString} is not orderable")

  // max-heap over the sort-key interpreted ordering: head = current worst
  // of the kept k, the eviction candidate. InterpretedOrdering walks the
  // schema it was built from by ordinal, so the prefix ordering applied to
  // the full struct row compares exactly the first sortFields fields.
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderedType)

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord)

  private def offer(buffer: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buffer.size < k) buffer.enqueue(v)
    else if (ord.lt(v, buffer.head)) { buffer.dequeue(); buffer.enqueue(v) }

  override def update(buffer: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // skip nulls (collect_list semantics); a full buffer whose worst is
    // already <= v never copies the value at all
    if (v != null && (buffer.size < k || ord.lt(v, buffer.head)))
      offer(buffer, InternalRow.copyValue(v))
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(v => offer(buffer, v))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buffer.toArray.sorted(ord))

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(obj: mutable.PriorityQueue[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(obj.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val buffer = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buffer.enqueue(v))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}
