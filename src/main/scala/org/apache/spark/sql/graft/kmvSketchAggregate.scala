/** Stored mergeable KMV (k-minimum-values) distinct-count sketches —
  * the "sketch once, query many" lakehouse pattern: fine-grain groups
  * are sketched at ingest and PERSISTED as a binary parquet column;
  * later rollups merge the stored sketches instead of rescanning raw
  * data. At 100 TB that turns "distinct users per region per month,
  * any rollup" from a full-corpus shuffle into a scan of a few KB of
  * sketch bytes per group.
  *
  * Three kernels:
  *   - [[KmvSketch]]     aggregate: LongType hashes → serialized sketch
  *   - [[KmvMergeSketch]] aggregate: sketches → merged sketch (union
  *                        of k-mins is the k-min of the union)
  *   - [[KmvEstimate]]   scalar: sketch → distinct-count estimate,
  *                        exact below k, (k-1)·2⁵²/h₍ₖ₎ above
  *
  * The hash is the CALLER's (the engine convention: low 52 bits of
  * md5, as in q27_kmv_distinct) so a DuckDB oracle can recompute the
  * identical estimate from raw data — the estimator itself is checked,
  * not just row counts. Buffer is a capped TreeSet: O(k) state per
  * group on both sides of the partial/final split, duplicates absorbed
  * by set semantics (KMV requires DISTINCT hash order statistics).
  */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Capped set of the k SMALLEST distinct longs seen. `k == 0` means
  * "not yet adopted" (a merge-side buffer before its first sketch).
  */
final class KmvBuffer(var k: Int) {
  val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    require(k > 0, "kmv add: buffer has no adopted width yet (k == 0); " +
      "merge a sized sketch in first")
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last()) {
      if (mins.add(h)) { mins.pollLast(); () }
    }
  }

  def merge(o: KmvBuffer): Unit = {
    if (k == 0) k = o.k
    else if (o.k != 0) require(k == o.k,
      s"kmv merge: mismatched sketch widths $k vs ${o.k}")
    val it = o.mins.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Wire/storage format: int k, int n, n ascending longs. */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * mins.size)
    bb.putInt(k).putInt(mins.size)
    val it = mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object KmvBuffer {
  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.mins.add(bb.getLong); i += 1 }
    b
  }
}

/** Aggregate: build a KMV sketch from pre-hashed LongType values. */
case class KmvSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable || kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("kmv_sketch: k must be a literal")
    } else if (k < 2 || k > 65536) {
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch: k must be in [2, 65536], got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, row: InternalRow): KmvBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    b.merge(o); b
  }

  override def eval(b: KmvBuffer): Any = b.serialize()
  override def serialize(b: KmvBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}

/** Aggregate: merge STORED sketches (binary column) into one. */
case class KmvMergeSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(0)

  override def update(b: KmvBuffer, row: InternalRow): KmvBuffer = {
    val v = child.eval(row)
    if (v != null) b.merge(KmvBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    b.merge(o); b
  }

  override def eval(b: KmvBuffer): Any = b.serialize()
  override def serialize(b: KmvBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
}

/** Scalar: distinct-count estimate from a serialized KMV sketch.
  * Exact when the sketch saw fewer than k distinct hashes; otherwise
  * floor((k-1)·2⁵² / h₍ₖ₎) — hashes are the engine's 52-bit md5
  * convention, so the space size is 2⁵² and the double arithmetic is
  * written EXACTLY as q27's oracle computes it (same rounding).
  */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_estimate"

  protected override def nullSafeEval(input: Any): Any = {
    val bb = ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    val k = bb.getInt
    val n = bb.getInt
    if (n < k || k == 0) n.toLong
    else {
      var i = 0
      var hk = 0L
      while (i < n) { hk = bb.getLong; i += 1 } // last = k-th smallest
      math.floor((k - 1).toDouble * 4503599627370496.0 /
        hk.toDouble).toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val cls = classOf[KmvEstimate].getName
      s"${ev.value} = $cls.estimate($bytes);"
    })

  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
}

object KmvEstimate {
  /** Codegen entry point. */
  def estimate(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    if (n < k || k == 0) n.toLong
    else {
      var i = 0
      var hk = 0L
      while (i < n) { hk = bb.getLong; i += 1 }
      math.floor((k - 1).toDouble * 4503599627370496.0 / hk.toDouble).toLong
    }
  }
}
