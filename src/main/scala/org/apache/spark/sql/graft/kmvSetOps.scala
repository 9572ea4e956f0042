/** KMV set-operation scalars — the sketch ALGEBRA over stored KMV
  * bytes ([[KmvBuffer]] wire format): union two sketches, count the
  * co-occurring hashes inside the union's k-minimum window, read a
  * sketch's occupancy. Together with [[KmvEstimate]] they answer
  * "how many users do segments A and B share?" from a few KB of
  * stored sketch per segment — no raw-data rescan, no distinct-pair
  * shuffle — via the classic KMV Jaccard estimator (Beyer et al.,
  * "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD 2007 — public):
  *
  *   U        = k smallest of (A ∪ B)   — exactly kmv_union's content
  *   J_est    = |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U|
  *   |A ∩ B|  ≈ J_est · estimate(U)
  *
  * q35 computes the intersection estimate in PURE INTEGER arithmetic
  * (overlap · est_union DIV m) so the DuckDB oracle reproduces it
  * bit-exactly — the estimator is hash-checked, not just plausible.
  * All three are once-per-output-row scalars over group-level sketch
  * bytes (5 rows at q35's grain), so CodegenFallback costs nothing —
  * the per-row kernels that matter ([[KmvEstimate]]) stay codegen'd.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Scalar: union of two serialized sketches (k smallest of A ∪ B —
  * identical bytes to aggregating both inputs into one sketch).
  * Widths must match; null if either side is null.
  */
case class KmvUnion(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_union"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val m = KmvBuffer.deserialize(a.asInstanceOf[Array[Byte]])
    m.merge(KmvBuffer.deserialize(b.asInstanceOf[Array[Byte]]))
    m.serialize()
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KmvUnion = copy(left = l, right = r)
}

/** Scalar: |{h ∈ k-min(A ∪ B) : h ∈ A ∧ h ∈ B}| — the Jaccard
  * numerator of the KMV estimator. Divide by [[KmvSize]] of the union
  * for J, multiply by [[KmvEstimate]] of the union for |A ∩ B|.
  */
case class KmvOverlap(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_overlap"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val ba = KmvBuffer.deserialize(a.asInstanceOf[Array[Byte]])
    val bb = KmvBuffer.deserialize(b.asInstanceOf[Array[Byte]])
    val u = KmvBuffer.deserialize(a.asInstanceOf[Array[Byte]])
    u.merge(bb)
    var n = 0L
    val it = u.mins.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (ba.mins.contains(h) && bb.mins.contains(h)) n += 1L
    }
    n
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KmvOverlap = copy(left = l, right = r)
}

/** Scalar: a sketch's occupancy m = min(k, distinct seen) — the
  * denominator of the Jaccard estimator.
  */
case class KmvSize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_size"

  protected override def nullSafeEval(input: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    bb.getInt // k
    bb.getInt.toLong
  }

  override protected def withNewChildInternal(c: Expression): KmvSize =
    copy(child = c)
}
