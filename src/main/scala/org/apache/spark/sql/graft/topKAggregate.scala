/** Graft's first native AGGREGATE kernel (the scalar kernels live in
  * vectorExpressions.scala / textHashExpressions.scala). Placed under
  * org.apache.spark.sql for the same reason: access to Spark's
  * expression utilities, the standard third-party extension pattern.
  */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap of the k LARGEST doubles seen so far — the
  * aggregation buffer behind [[TopKValues]]. Fixed k-slot footprint per
  * group regardless of group size (the property that makes the
  * aggregate safe on 100 TB groups: state is O(k), not O(n), and the
  * partial/final split means each map task ships at most k doubles per
  * group across the exchange). Merge is insertion of the other side's
  * elements, so the result — the top-k MULTISET — is independent of
  * partition count and merge order; sorting at eval makes the emitted
  * array bit-deterministic too.
  */
final class TopKBuffer(val k: Int) {
  private val heap = new Array[Double](k) // min-heap over current top-k
  private var n = 0

  def add(v: Double): Unit = {
    if (n < k) {
      heap(n) = v
      n += 1
      var i = n - 1 // sift up
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v > heap(0)) {
      heap(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && heap(l) < heap(m)) m = l
        if (r < n && heap(r) < heap(m)) m = r
        if (m == i) done = true
        else {
          val t = heap(m); heap(m) = heap(i); heap(i) = t
          i = m
        }
      }
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.heap(i)); i += 1 }
  }

  /** The top-k values, sorted descending. */
  def result(): Array[Double] = {
    val out = java.util.Arrays.copyOf(heap, n)
    java.util.Arrays.sort(out)
    var i = 0
    var j = n - 1 // descending
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    out
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(heap(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.add(bb.getDouble); i += 1 }
    b
  }
}

/** `topk_values(value, k)` — exact top-k values per group as a
  * descending-sorted array<double>.
  *
  * A [[TypedImperativeAggregate]], the same contract Spark's own
  * `percentile`/`collect_list` use: an opaque typed buffer with
  * update/merge/serialize, which is what a bounded-state custom
  * aggregate needs (a DeclarativeAggregate can't express a heap).
  * Unlike `collect_list` + `slice` — whose buffer grows with GROUP size
  * and whose exchange ships every value — this keeps O(k) state per
  * group on both sides of the partial/final split. Top-k of a multiset
  * is merge-order independent, so results are deterministic under any
  * partitioning (ties are equal VALUES — which duplicate survives is
  * unobservable in the output).
  */
case class TopKValues(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_values"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("topk_values: k must be a literal")
    } else if (kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("topk_values: k must not be null")
    } else if (k < 1 || k > 65536) {
      // the buffer is driver/executor heap per GROUP — bound it loudly
      TypeCheckResult.TypeCheckFailure(
        s"topk_values: k must be in [1, 65536], got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, row: InternalRow): TopKBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.merge(o); b
  }

  override def eval(b: TopKBuffer): Any = new GenericArrayData(b.result())

  override def serialize(b: TopKBuffer): Array[Byte] = b.serialize()

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKValues =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKValues =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}
