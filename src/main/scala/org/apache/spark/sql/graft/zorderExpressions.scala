package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static kernels behind the z-order expressions (also the codegen
  * call targets — Scala objects expose static forwarders).
  */
object ZOrderCore {

  /** Index of the bucket `v` falls in given ascending interior
    * boundaries (binary search; bucket = #boundaries <= v, so k-1
    * boundaries yield buckets 0..k-1). NaN sorts to the top bucket.
    */
  def bucket(v: Double, boundaries: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return boundaries.length
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def mask(bits: Int): Int =
    if (bits >= 32) -1 else (1 << bits) - 1

  /** Interleave the low `bits` bits of each id, round-robin from the
    * low end: bit b of dim d lands at position b*n + d. Equal-prefix
    * z-keys therefore bound EVERY dim's bucket range — the multi-dim
    * clustering property a range partition on the key inherits.
    */
  def interleave2(a: Int, b: Int, bits: Int): Long = {
    val m = mask(bits)
    val x = a & m; val y = b & m
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def interleave3(a: Int, b: Int, c: Int, bits: Int): Long = {
    val m = mask(bits)
    val x = a & m; val y = b & m; val w = c & m
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (3 * i)
      z |= ((y >> i) & 1L) << (3 * i + 1)
      z |= ((w >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  def interleave4(a: Int, b: Int, c: Int, d: Int, bits: Int): Long = {
    val m = mask(bits)
    val x = a & m; val y = b & m; val w = c & m; val v = d & m
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (4 * i)
      z |= ((y >> i) & 1L) << (4 * i + 1)
      z |= ((w >> i) & 1L) << (4 * i + 2)
      z |= ((v >> i) & 1L) << (4 * i + 3)
      i += 1
    }
    z
  }
}

/** Codegen'd quantile bucketizer: `quantile_bucket(v, boundaries)` →
  * the index of `v`'s bucket among the ascending interior boundaries
  * (computed once, driver-side, via approxQuantile — the Delta-style
  * range-bucket step of z-ordering). Boundaries ride along as a
  * broadcast-free literal reference: k is tiny (≤ a few hundred), the
  * per-row work is a binary search.
  */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"quantile_bucket needs DOUBLE input, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    ZOrderCore.bucket(v.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.ZOrderCore.bucket($v, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bit-interleave: `zorder_key(b0, b1[, b2[, b3]])` → LONG z-order
  * key from 2-4 INT bucket ids (low `63/n` bits each). Rows close in
  * z-key are close in EVERY dimension's bucket, so a range partition +
  * local sort on the key gives each output file a tight min/max box on
  * every z-ordered column at once — the layout that makes per-file
  * skipping effective on any single dimension. CodegenFallback is
  * deliberate: the key is computed once per row on the WRITE path
  * (layout time), never in a query hot loop.
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val n = children.size
  private val bits = 63 / math.max(n, 1)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (n < 2 || n > 4)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"zorder_key takes 2-4 dimensions, got $n")
    else if (children.exists(_.dataType != IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("zorder_key needs INT bucket ids")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Int]
      i += 1
    }
    n match {
      case 2 => ZOrderCore.interleave2(vs(0), vs(1), bits)
      case 3 => ZOrderCore.interleave3(vs(0), vs(1), vs(2), bits)
      case 4 => ZOrderCore.interleave4(vs(0), vs(1), vs(2), vs(3), bits)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
