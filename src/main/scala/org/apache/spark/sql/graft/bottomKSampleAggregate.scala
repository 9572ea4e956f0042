/** Stored mergeable BOTTOM-K SAMPLE sketches — the quantile companion
  * to [[KmvSketch]]'s distinct counts, same lakehouse pattern: sketch
  * fine-grain groups once at ingest, persist the bytes, answer any
  * later rollup's quantiles by merging stored sketches instead of
  * rescanning raw data.
  *
  * The sketch is classic bottom-k sampling (Cohen & Kaplan, "Summarizing
  * data using bottom-k sketches", PODC 2007 — public): keep the k
  * entries with the SMALLEST content hashes, each carrying its row's
  * measure value. Because the hash is uniform in [0, 2⁵²), the kept
  * values are a uniform random sample without replacement of size
  * min(k, n) — and because "k smallest of a union is the k smallest of
  * the k-smallest halves", the sketch merges exactly (associative,
  * order-free). A quantile estimate is then just the nearest-rank
  * order statistic of the carried sample: EXACT below k, sampling
  * error O(1/√k) above it ([[graft.SketchQualitySpec]] gates the band).
  *
  * Determinism discipline (what makes the estimator ORACLE-CHECKABLE,
  * not just plausible): the hash is the CALLER's 52-bit md5 of the
  * row's unique key — the engine-wide convention q27/q33 share with
  * DuckDB — duplicate hashes keep the MINIMUM value (so partition
  * order can never show), and the rank is floor((m-1)·q), lower value
  * on ties. DuckDB recomputes the identical sample and the identical
  * rank from raw data; the q33 row hash-matches the ESTIMATE itself.
  *
  * Three kernels:
  *   - [[BkSampleSketch]]   aggregate: (hash, value) → serialized sketch
  *   - [[BkSampleMerge]]    aggregate: sketches → merged sketch
  *   - [[BkSampleQuantile]] scalar: (sketch, q) → value estimate
  *
  * O(k) state per group on both sides of the partial/final split.
  */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Capped map hash → value keeping the k SMALLEST distinct hashes;
  * a duplicate hash keeps the smaller value (deterministic under any
  * partitioning). `k == 0` = not yet adopted (merge-side buffer).
  */
final class BkBuffer(var k: Int) {
  val entries = new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  def add(h: Long, x: Long): Unit = {
    require(k > 0, "bksample add: buffer has no adopted width yet " +
      "(k == 0); merge a sized sketch in first")
    val existing = entries.get(h)
    if (existing != null) {
      if (x < existing) { entries.put(h, x); () }
    } else if (entries.size < k) {
      entries.put(h, x); ()
    } else if (h < entries.lastKey()) {
      entries.put(h, x)
      entries.pollLastEntry(); ()
    }
  }

  def merge(o: BkBuffer): Unit = {
    if (k == 0) k = o.k
    else if (o.k != 0) require(k == o.k,
      s"bksample merge: mismatched sketch widths $k vs ${o.k}")
    val it = o.entries.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
  }

  /** Wire/storage format: int k, int n, n ascending (long h, long x). */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * entries.size)
    bb.putInt(k).putInt(entries.size)
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey).putLong(e.getValue)
    }
    bb.array()
  }
}

object BkBuffer {
  def deserialize(bytes: Array[Byte]): BkBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BkBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.entries.put(bb.getLong, bb.getLong); i += 1 }
    b
  }
}

/** Aggregate: build a bottom-k sample sketch from (hash, value). */
case class BkSampleSketch(
    hashExpr: Expression,
    valueExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BkBuffer] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(hashExpr, valueExpr, kExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bksample_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable || kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("bksample_sketch: k must be a literal")
    } else if (k < 2 || k > 65536) {
      TypeCheckResult.TypeCheckFailure(
        s"bksample_sketch: k must be in [2, 65536], got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): BkBuffer = new BkBuffer(k)

  override def update(b: BkBuffer, row: InternalRow): BkBuffer = {
    val h = hashExpr.eval(row)
    val x = valueExpr.eval(row)
    if (h != null && x != null)
      b.add(h.asInstanceOf[Long], x.asInstanceOf[Long])
    b
  }

  override def merge(b: BkBuffer, o: BkBuffer): BkBuffer = { b.merge(o); b }
  override def eval(b: BkBuffer): Any = b.serialize()
  override def serialize(b: BkBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BkBuffer =
    BkBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BkSampleSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BkSampleSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(hashExpr = cs(0), valueExpr = cs(1), kExpr = cs(2))
}

/** Aggregate: merge STORED bottom-k sample sketches into one. */
case class BkSampleMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BkBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bksample_merge"

  override def createAggregationBuffer(): BkBuffer = new BkBuffer(0)

  override def update(b: BkBuffer, row: InternalRow): BkBuffer = {
    val v = child.eval(row)
    if (v != null) b.merge(BkBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: BkBuffer, o: BkBuffer): BkBuffer = { b.merge(o); b }
  override def eval(b: BkBuffer): Any = b.serialize()
  override def serialize(b: BkBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BkBuffer =
    BkBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BkSampleMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BkSampleMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
}

/** Scalar: nearest-rank quantile of the carried sample — value at
  * index floor((m-1)·q) of the sample sorted ascending (m = sample
  * size). Exact when the group had ≤ k rows; null on an empty sketch.
  */
case class BkSampleQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bksample_quantile"

  protected override def nullSafeEval(bytes: Any, q: Any): Any =
    BkSampleQuantile.quantile(bytes.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, q) => {
      val cls = BkSampleQuantile.getClass.getName.stripSuffix("$")
      val r = ctx.freshName("bkq")
      s"""Object $r = $cls.quantile($bytes, $q);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BkSampleQuantile = copy(left = l, right = r)
}

object BkSampleQuantile {
  /** Codegen + interpreted entry point; null for an empty sketch. */
  def quantile(bytes: Array[Byte], q: Double): java.lang.Long = {
    require(q >= 0.0 && q <= 1.0, s"bksample_quantile: q=$q not in [0,1]")
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // k
    val n = bb.getInt
    if (n == 0) return null
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) { bb.getLong; xs(i) = bb.getLong; i += 1 }
    java.util.Arrays.sort(xs)
    java.lang.Long.valueOf(xs(math.floor((n - 1) * q).toInt))
  }
}

/** Scalar: the carried sample ITSELF, values in ascending-HASH order —
  * i.e. the deterministic uniform-sample order, independent of the
  * value distribution. This is what makes the sketch a general
  * bounded-memory "sample k rows per group" operator (stratified
  * sampling, diversity selection), not only a quantile estimator:
  * carry the row's id as the value, explode the array back out.
  */
case class BkSampleValues(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bksample_values"

  protected override def nullSafeEval(bytes: Any): Any = {
    val bb = ByteBuffer.wrap(bytes.asInstanceOf[Array[Byte]])
    bb.getInt // k
    val n = bb.getInt
    val xs = new Array[Long](n)
    var i = 0
    // entries serialize in ascending-hash order already
    while (i < n) { bb.getLong; xs(i) = bb.getLong; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BkSampleValues = copy(child = newChild)
}
