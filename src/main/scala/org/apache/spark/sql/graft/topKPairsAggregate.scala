/** Bounded top-k (score, id) selection as a native aggregate — the
  * rerank-survivor kernel of the quantized ANN tier. Same packaging
  * rationale as topKAggregate.scala.
  */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded heap of the k BEST (score, id) pairs by
  * (score DESC, id ASC) — [[TopKPairs]]'s buffer. The heap root is the
  * WORST kept pair, so update is O(log k) and state is O(k) per group
  * regardless of group size; the partial/final split ships at most k
  * pairs per group across the exchange. The ordering carries the id
  * tie-break, so the kept SET equals exactly what
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id) <= k` keeps — but
  * without materializing, shuffling, or sorting the candidate set
  * (the 100 TB property: a window must sort every candidate; this
  * streams them through k slots map-side).
  */
final class TopKPairsBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // a is WORSE than b under (score DESC, id ASC)
  @inline private def worse(sa: Double, ia: Long, sb: Double,
      ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def add(s: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id
      n += 1
      var i = n - 1 // sift up (root = worst)
      while (i > 0 && worse(scores(i), ids(i),
          scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        val ts = scores(p); scores(p) = scores(i); scores(i) = ts
        val ti = ids(p); ids(p) = ids(i); ids(i) = ti
        i = p
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val ts = scores(m); scores(m) = scores(i); scores(i) = ts
          val ti = ids(m); ids(m) = ids(i); ids(i) = ti
          i = m
        }
      }
    }
  }

  def merge(other: TopKPairsBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** The kept pairs, best-first ((score DESC, id ASC)). */
  def result(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKPairsBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKPairsBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }
}

/** `topk_pairs(score, id, k)` — the exact top-k (score, id) pairs per
  * group by (score DESC, id ASC), as a best-first
  * array<struct<score, id>>.
  *
  * This is the bounded-state replacement for the rerank-survivor
  * window `ROW_NUMBER() OVER (PARTITION BY g ORDER BY score DESC, id)
  * <= k`: identical kept set (the ordering embeds the tie-break), but
  * the window SHUFFLES AND SORTS every candidate row — O(n log n) and
  * an n-row exchange per group — where this aggregate keeps O(k) state
  * map-side and ships k pairs per group (measured: the stored-SQ8
  * probe's 12M-candidate selection dropped from ~5 s of window
  * shuffle+sort to agg-scan cost). Merge-order independent by the
  * strict total order on (score, id).
  *
  * NULL SEMANTICS (deliberate, and a difference from the window it
  * replaces): a candidate whose score or id is NULL is SKIPPED — it
  * can never rank, never displaces a kept pair, and a group with
  * fewer than k non-null candidates returns fewer than k pairs. The
  * ROW_NUMBER window ranked NULL scores NULLS LAST, so it could emit
  * null-scored tail rows; here they are dropped, which is the
  * behavior a retrieval cut actually wants (a NULL score is "not
  * comparable", not "worst"). The flip side: upstream kernels that
  * signal corrupt rows BY returning NULL (e.g. [[ArrayDotQ8]] on a
  * length mismatch) have those rows silently pruned at this cut —
  * when debugging a missing candidate, check for NULL scores BEFORE
  * the topk_pairs aggregate, not after it.
  */
object TopKPairs {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.expressions.aggregate.Min

  /** The k=1 FAST PATH: `topk_pairs(score, id, 1)` is a pure top-1
    * selection, and a TypedImperativeAggregate is the wrong engine
    * for it — ObjectHashAggregate evaluates the interpreted `update`
    * per candidate (measured ~47 ns/candidate incl. join on the flat
    * ADC scan, the tier's linear term, BENCH_SCALE.md r19). This
    * composition is the float probe's max-struct shape instead: a
    * DECLARATIVE `min(struct(-score, id))` — codegen'd per-row
    * update, no per-row virtual eval, no buffer (de)serialization —
    * re-projected to the exact `array<struct<score, id>>` contract
    * (best pair or an empty array), so call sites need not care
    * which engine ran.
    *
    * Semantics parity with the heap: (score DESC, id ASC) via the
    * lexicographic struct order on (-score, id); NULL score/id pairs
    * are skipped (the `If` nulls them out and MIN ignores nulls); a
    * group with no rankable candidate returns an EMPTY array, never
    * a null-field struct. `-(-score)` is exact for every double, and
    * the `+ 0.0` normalizes a -0.0 score to 0.0 BEFORE negation so
    * the struct total order (-0.0 < 0.0) cannot diverge from the
    * heap's numeric compare (-0.0 == 0.0, tie to the smaller id).
    * NaN scores (0-norm vectors upstream) are malformed input with
    * unspecified rank on both engines.
    */
  def top1Composition(score: Expression, id: Expression): Expression = {
    val s = Cast(score, DoubleType)
    val i = Cast(id, LongType)
    val pair = If(Or(IsNull(s), IsNull(i)),
      Literal.create(null, StructType(Seq(
        StructField("ns", DoubleType), StructField("id", LongType)))),
      CreateNamedStruct(Seq(
        Literal("ns"), UnaryMinus(Add(s, Literal(0.0d))),
        Literal("id"), i)))
    val best = Min(pair).toAggregateExpression()
    val empty = Literal.create(new GenericArrayData(Array.empty[Any]),
      ArrayType(StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))),
        containsNull = false))
    If(IsNull(best), empty,
      CreateArray(Seq(CreateNamedStruct(Seq(
        Literal("score"),
        UnaryMinus(GetStructField(best, 0, Some("ns"))),
        Literal("id"), GetStructField(best, 1, Some("id")))))))
  }
}

/** r21 NOTE — why there is NO declarative small-k fast path here:
  * a DeclarativeAggregate with 2k sorted scalar slots (the k=1 trick
  * generalized; selection-identity merge) was built, spec-gated, and
  * MEASURED 25x slower than this heap on a 4M-candidate stream
  * (graft.tools.TopKMicro: 17.5 s vs 0.85 s). Two independent causes:
  * (1) the whole-stage-codegen'd update lands in ONE generated method
  * whose bytecode exceeds HotSpot's 8000-byte JIT ceiling
  * (-XX:+DontCompileHugeMethods, the default), so the hot loop runs
  * in the bytecode INTERPRETER — confirmed by re-running with the
  * flag flipped: 17.5 s -> 1.9 s; (2) even JIT-compiled it loses ~2x
  * to the heap, because a projection must evaluate ALL k slot
  * expressions per row while the heap's add() early-exits on one
  * root compare for every candidate that doesn't rank. The bounded
  * heap's ~47 ns/candidate interpreted update is the RIGHT engine
  * for k>1 survivor cuts.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("topk_pairs: k must be a literal")
    } else if (kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("topk_pairs: k must not be null")
    } else if (k < 1 || k > 65536) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs: k must be in [1, 65536], got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKPairsBuffer =
    new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, row: InternalRow): TopKPairsBuffer = {
    val s = scoreExpr.eval(row)
    val id = idExpr.eval(row)
    if (s != null && id != null)
      b.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, o: TopKPairsBuffer): TopKPairsBuffer = {
    b.merge(o); b
  }

  override def eval(b: TopKPairsBuffer): Any =
    new GenericArrayData(b.result().map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(b: TopKPairsBuffer): Array[Byte] = b.serialize()

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer =
    TopKPairsBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1), kExpr = cs(2))
}
