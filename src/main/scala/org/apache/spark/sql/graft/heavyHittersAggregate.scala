package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary with k-1 counters — the
  * aggregation buffer behind [[HeavyHittersSketch]].
  *
  * Guarantee (the whole point): ANY item whose true count exceeds n/k
  * is present in the summary, and each stored count understates the
  * true count by at most n/k. State is O(k) per group regardless of
  * stream length or distinct count, and the summary is MERGEABLE with
  * the same bound (Agarwal et al., "Mergeable Summaries": sum the
  * counter maps, then subtract the k-th largest combined count from
  * every counter and drop the non-positive ones). That mergeability is
  * what makes it a correct partial/final Spark aggregate: map tasks
  * ship k-1 (item, count) pairs — not the token stream — across the
  * exchange.
  *
  * Counts are LOWER BOUNDS and partitioning-dependent; the summary is
  * a CANDIDATE SET, not an answer. The deterministic production shape
  * is sketch → exact recount of the ≤ k-1 candidates (tx32).
  */
final class MGBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var processed: Long = 0L

  def add(s: String): Unit = {
    processed += 1L
    counts.get(s) match {
      case Some(c) => counts.update(s, c + 1L)
      case None if counts.size < k - 1 => counts.update(s, 1L)
      case None =>
        // classic MG decrement: every counter pays 1, zeros evicted.
        // O(k) on a miss, amortized O(1) per increment overall.
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1L)
        counts.foreach { case (key, c) => if (c <= 0L) dead += key }
        dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries combine: sum maps; if over k-1 counters,
    * subtract the k-th largest count from all and drop <= 0.
    */
  def merge(other: MGBuffer): Unit = {
    processed += other.processed
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k - 1) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val kth = sorted(counts.size - k) // k-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(counts.remove)
    }
  }

  /** (item, lower-bound count) sorted by count desc then item — a
    * deterministic rendering of this buffer's state (the STATE itself
    * depends on partitioning; see class doc).
    */
  def result(): Array[(String, Long)] =
    counts.toArray.sortBy { case (s, c) => (-c, s) }

  def serialize(): Array[Byte] = {
    val items = counts.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 8 + 4 + bytes.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(processed)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }
}

object MGBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MGBuffer(k)
    b.processed = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      b.counts.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    b
  }
}

/** `heavy_hitters(item, k)` — Misra-Gries frequent-items summary per
  * group: array<struct<item string, count_lo bigint>> (count-desc),
  * plus the n/k guarantee documented on [[MGBuffer]]. Use as the
  * candidate-generation pass of sketch → exact-recount; the stored
  * counts are lower bounds, not exact frequencies.
  */
case class HeavyHittersSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lo", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("heavy_hitters: k must be a literal")
    } else if (kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("heavy_hitters: k must not be null")
    } else if (k < 2 || k > 65536) {
      // k-1 counters of executor heap per GROUP — bound it loudly
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters: k must be in [2, 65536], got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(b: MGBuffer, row: InternalRow): MGBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = {
    b.merge(o); b
  }

  override def eval(b: MGBuffer): Any =
    new GenericArrayData(b.result().map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })

  override def serialize(b: MGBuffer): Array[Byte] = b.serialize()

  override def deserialize(bytes: Array[Byte]): MGBuffer =
    MGBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}
