/** Stored mergeable COUNT-MIN sketches — frequency POINT estimates,
  * the member of the sketch family Misra-Gries can't provide (heavy
  * hitters answers "what are the top keys"; count-min answers "how
  * often did THIS key occur" for any key, from O(w·d) state).
  * Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005
  * (public). Guarantees: estimate ≥ true count, and ≤ true + εN with
  * probability 1−δ for ε = e/w, δ = e^−d.
  *
  * Same lakehouse lifecycle as the KMV and bottom-k kernels: sketch a
  * stream once, persist the bytes, merge stored sketches (counter
  * matrices add element-wise — exact, associative), answer any later
  * point query without rescanning.
  *
  * Determinism discipline (what makes q37 oracle-checkable): the
  * input is the CALLER's 52-bit md5 hash h of the key (the engine
  * convention), and row j's bucket is the Carter–Wegman form
  *
  *   bucket_j = ((h · P_j + B_j) mod M) mod w
  *
  * with FIXED engine constants P = (641, 1097, 2039),
  * B = (31, 277, 1013), M = 2⁶¹−1. Every product stays below 2⁶³
  * (h < 2⁵², P_j < 2¹¹), so BIGINT arithmetic in DuckDB reproduces
  * the buckets — and therefore the counters and the min — exactly.
  *
  * Three kernels:
  *   - [[CmsSketch]] aggregate: hashes → serialized d×w counter matrix
  *   - [[CmsMerge]]  aggregate: sketches → element-wise sum
  *   - [[CmsQuery]]  scalar: (sketch, h) → min over rows of the
  *                   key's counters
  */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

object CmsBuffer {
  /** Fixed engine constants — mirrored verbatim by q37's oracle SQL. */
  val P: Array[Long] = Array(641L, 1097L, 2039L)
  val B: Array[Long] = Array(31L, 277L, 1013L)
  val M: Long = 2305843009213693951L // 2^61 - 1
  val MaxDepth: Int = P.length

  def bucket(h: Long, j: Int, w: Int): Int =
    (((h * P(j) + B(j)) % M) % w).toInt

  def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val w = bb.getInt
    val d = bb.getInt
    val b = new CmsBuffer(w, d)
    var i = 0
    while (i < w * d) { b.counters(i) = bb.getLong; i += 1 }
    b
  }
}

/** d×w counter matrix (row-major). `w == 0` = not yet adopted
  * (merge-side buffer before its first sketch).
  */
final class CmsBuffer(var w: Int, var d: Int) {
  var counters: Array[Long] =
    if (w == 0) Array.emptyLongArray else new Array[Long](w * d)

  def add(h: Long): Unit = {
    require(w > 0, "cms add: buffer has no adopted shape yet (w == 0); " +
      "merge a sized sketch in first")
    var j = 0
    while (j < d) {
      counters(j * w + CmsBuffer.bucket(h, j, w)) += 1L
      j += 1
    }
  }

  def merge(o: CmsBuffer): Unit = {
    if (o.w == 0) return
    if (w == 0) { w = o.w; d = o.d; counters = new Array[Long](w * d) }
    else require(w == o.w && d == o.d,
      s"cms merge: mismatched sketch shapes ${w}x$d vs ${o.w}x${o.d}")
    var i = 0
    while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
  }

  def query(h: Long): Long = {
    var res = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = counters(j * w + CmsBuffer.bucket(h, j, w))
      if (c < res) res = c
      j += 1
    }
    if (res == Long.MaxValue) 0L else res
  }

  /** Element-wise SUBTRACTION — the delete half of delta-only stats
    * maintenance ([[graft.operators.SketchStats.applyDelta]]). Sound
    * ONLY when `o` sketches a sub-multiset of what this sketch
    * absorbed: each key's contribution is deterministic (fixed
    * Carter–Wegman buckets), so counters of (corpus − deleted) =
    * counters(corpus) − counters(deleted) EXACTLY, byte-equal to a
    * from-scratch rebuild. A negative counter proves the caller
    * subtracted keys never added (or double-deleted) — fail loudly
    * rather than serve a corrupt sketch.
    */
  def subtract(o: CmsBuffer): Unit = {
    if (o.w == 0) return
    require(w == o.w && d == o.d,
      s"cms subtract: mismatched sketch shapes ${w}x$d vs ${o.w}x${o.d}")
    var i = 0
    while (i < counters.length) {
      counters(i) -= o.counters(i)
      require(counters(i) >= 0L,
        "cms subtract: counter went negative — the subtrahend sketches " +
          "keys this sketch never absorbed (wrong delta or double delete)")
      i += 1
    }
  }

  /** Wire/storage format: int w, int d, d·w row-major longs. */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(w).putInt(d)
    var i = 0
    while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
    bb.array()
  }
}

/** Aggregate: build a count-min sketch from pre-hashed LongType keys. */
case class CmsSketch(
    child: Expression,
    wExpr: Expression,
    dExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with ExpectsInputTypes {

  private lazy val w: Int = wExpr.eval().asInstanceOf[Number].intValue()
  private lazy val d: Int = dExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, wExpr, dExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!wExpr.foldable || !dExpr.foldable ||
        wExpr.eval() == null || dExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure(
        "cms_sketch: width and depth must be literals")
    } else if (w < 16 || w > (1 << 20)) {
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch: width must be in [16, 2^20], got $w")
    } else if (d < 1 || d > CmsBuffer.MaxDepth) {
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch: depth must be in [1, ${CmsBuffer.MaxDepth}], got $d")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(w, d)

  override def update(b: CmsBuffer, row: InternalRow): CmsBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    b.merge(o); b
  }

  override def eval(b: CmsBuffer): Any = b.serialize()
  override def serialize(b: CmsBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), wExpr = cs(1), dExpr = cs(2))
}

/** Aggregate: element-wise sum of STORED count-min sketches. */
case class CmsMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge"

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(0, 0)

  override def update(b: CmsBuffer, row: InternalRow): CmsBuffer = {
    val v = child.eval(row)
    if (v != null) b.merge(CmsBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    b.merge(o); b
  }

  override def eval(b: CmsBuffer): Any = b.serialize()
  override def serialize(b: CmsBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs(0))
}

/** Scalar: equi-join cardinality estimate from two stored sketches —
  * min over rows j of the inner product Σ_b A_j[b]·B_j[b] (Cormode &
  * Muthukrishnan §4.2: each row's inner product ≥ the true join size
  * Σ_k f_A(k)·f_B(k), collisions only ADD mass, so the min is a
  * one-sided upper estimate with ε‖A‖₁‖B‖₁ expected slack). This is
  * the query-planning primitive: |A ⋈ B| answered from O(w·d) stats
  * bytes without rescanning either table. Requires identical shapes —
  * the bucket function must agree for products to align.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner_product"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = CmsBuffer.deserialize(a.asInstanceOf[Array[Byte]])
    val y = CmsBuffer.deserialize(b.asInstanceOf[Array[Byte]])
    // An unadopted sketch (cms_merge over zero rows serializes w=0,d=0)
    // saw no keys: the true join size against it is 0, and the row loop
    // below would otherwise never run and leave the Long.MaxValue
    // sentinel as the answer. Short-circuit before the shape check so
    // empty-vs-sized also yields 0 rather than throwing.
    if (x.d == 0 || y.d == 0) return 0L
    require(x.w == y.w && x.d == y.d,
      s"cms_inner_product: mismatched sketch shapes ${x.w}x${x.d} vs " +
        s"${y.w}x${y.d}")
    var res = Long.MaxValue
    var j = 0
    while (j < x.d) {
      var s = 0L
      var b = 0
      while (b < x.w) {
        // exact arithmetic: at extreme scale (counters ~1e10, products
        // ~1e20 > 2^63) a wrapped sum would return a confidently wrong
        // cardinality — overflow must fail loudly, not estimate
        s = try Math.addExact(s, Math.multiplyExact(
          x.counters(j * x.w + b), y.counters(j * x.w + b)))
        catch { case _: ArithmeticException =>
          throw new ArithmeticException(
            "cms_inner_product overflowed Long — the join-size " +
              "estimate exceeds 2^63; shard the sketches (e.g. per " +
              "partition/day) and sum the estimates instead")
        }
        b += 1
      }
      if (s < res) res = s
      j += 1
    }
    res
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsInnerProduct = copy(left = l, right = r)
}

/** Scalar: point-frequency estimate — min over rows of the key's
  * counter. Once-per-probe-row over group-level sketch bytes, so
  * CodegenFallback costs nothing on the hot path.
  */
case class CmsQuery(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"

  protected override def nullSafeEval(bytes: Any, h: Any): Any =
    CmsBuffer.deserialize(bytes.asInstanceOf[Array[Byte]])
      .query(h.asInstanceOf[Long])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsQuery = copy(left = l, right = r)
}
