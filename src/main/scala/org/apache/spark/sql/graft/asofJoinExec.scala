/** Graft's first WHOLE-OPERATOR extension (SURVEY §2 preference order
  * (c)): an as-of join as a custom logical node + planner strategy +
  * physical merge-join operator, registered through
  * SparkSessionExtensions. The scalar/aggregate kernels in this package
  * extend Spark at the expression tier; this file extends it at the
  * operator tier, for a join shape Catalyst cannot express without
  * either a range-exploding theta-join or a union+window detour
  * (av1_asof_join keeps the union+window formulation as the composed
  * baseline; av2 runs this operator).
  *
  * Semantics (LEFT OUTER, both directions): for every left row, the
  * single right row with equal keys and — backward — the LARGEST
  * right-time <= left-time (right-time ties: the largest tie-break
  * value), or — forward — the SMALLEST right-time >= left-time (ties:
  * the smallest tie-break value). An optional tolerance nulls out
  * matches farther than `tolerance` time units — equivalent to
  * "nearest match within tolerance", because any non-nearest match is
  * strictly farther. Unmatched left rows survive with nulls (reference
  * behavior: DuckDB `ASOF LEFT JOIN`, the oracle used by av1/av2/av4).
  *
  * Scale design: both children are hash-clustered on the join keys and
  * sorted by (keys, time) — declared through requiredChildDistribution
  * / requiredChildOrdering, so EnsureRequirements plans ordinary
  * co-partitioned exchanges (AQE-coalescible, reusable) exactly as it
  * does for a sort-merge join. Execution is then a single O(n+m)
  * forward merge walk per partition holding ONE buffered right row and
  * ONE remembered candidate — no per-key grouping, no window state, no
  * range explosion, constant memory regardless of key cardinality.
  * That is the 100 TB shape: two shuffles (or zero, when the inputs are
  * already bucketed by key), then streaming merge.
  */
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Logical as-of join. Output is left ++ right(nullable) — standard
  * left-outer shape. Time expressions must share one of the
  * long-backed time types (LongType epoch counters, TIMESTAMP,
  * TIMESTAMP_NTZ); key expression types must match pairwise so the
  * two hash-clusterings are co-partition compatible.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUnits: Option[Long],
    forward: Boolean,
    /** Some(true)=force broadcast, Some(false)=force shuffle-merge,
      * None=strategy decides from right-side size statistics vs
      * spark.sql.autoBroadcastJoinThreshold (the SMJ-vs-BHJ rule).
      */
    broadcastHint: Option[Boolean])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = {
    def timeTypeOk(e: Expression) = e.dataType match {
      case LongType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    childrenResolved && expressions.forall(_.resolved) &&
      leftKeys.length == rightKeys.length && leftKeys.nonEmpty &&
      leftKeys.zip(rightKeys).forall { case (l, r) =>
        l.dataType.sameType(r.dataType) } &&
      timeTypeOk(leftTime) && leftTime.dataType.sameType(rightTime.dataType)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy — ONE logical operator, TWO physical plans, picked
  * the way Spark picks SMJ vs BHJ: a small right side broadcasts
  * ([[BroadcastAsOfJoinExec]]: zero shuffle, zero sort on the probe
  * side), a large one shuffle-merges ([[AsOfJoinExec]]). Injected via
  * `e.injectPlannerStrategy` in [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, tol, fwd, hint) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val broadcast = hint.getOrElse(
        threshold >= 0 && r.stats.sizeInBytes >= 0 &&
          r.stats.sizeInBytes <= threshold)
      if (broadcast) {
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          tb, tol, fwd) :: Nil
      } else {
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, tol,
          fwd) :: Nil
      }
    case _ => Nil
  }
}

/** Physical backward as-of join: co-partitioned, co-sorted merge walk.
  *
  * Per partition the walk keeps exactly one remembered candidate (the
  * latest right row at-or-before the current left time for the current
  * key) plus the buffered head of the right iterator. Right rows are
  * consumed once, left rows stream through once; rows with null keys
  * or null time never match (SQL join null semantics) but left rows
  * still surface (left-outer).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUnits: Option[Long],
    forward: Boolean)
  extends BinaryExecNode {

  // forward as-of is the time-mirrored walk: sort DESCENDING by time so
  // "last candidate consumed" is the EARLIEST right row at-or-after the
  // left time (ties: the smallest tie-break value, mirroring backward's
  // largest-wins) — one merge implementation, both directions
  private def timeDir = if (forward) Descending else Ascending

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // hash-cluster both sides on the join keys; EnsureRequirements makes
  // the two sides' shuffle specs compatible (same mechanism as SMJ)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (keys, time) per side; right additionally tie-broken so "last in
  // order wins" is deterministic under duplicate right times
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (rightTime +: rightTieBreak).map(SortOrder(_, timeDir)))

  // one output row per left row, in left order, left partitioning
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val tol = toleranceUnits
    val fwd = forward
    val keyTypes = leftKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeEval = BindReferences.bindReference(lTimeB, lOut)
      val rTimeEval = BindReferences.bindReference(rTimeB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against NULLABLE right attrs: an unmatched left row pairs
      // with an all-null placeholder, and a non-nullable input binding
      // would skip the null check and read garbage zeros instead
      val joiner = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val buffered = rIter.buffered

      // remembered candidate: latest right row seen with key ==
      // candidateKey and time <= the left time that consumed it
      var candRow: InternalRow = null
      var candKey: InternalRow = null
      var candTime: Long = 0L

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeVal = lTimeEval.eval(lRow)
        if (lKey.anyNull || lTimeVal == null) {
          joiner(joined(lRow, nullRight))
        } else {
          val lTime = lTimeVal.asInstanceOf[Long]
          // advance right up to (and including) rows at-or-before lTime
          var done = false
          while (!done && buffered.hasNext) {
            val rRow = buffered.head
            val rKey = rKeyProj(rRow)
            if (rKey.anyNull) { buffered.next() } // can never match
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { buffered.next() } // key already passed
              else if (c > 0) { done = true } // future key: stop
              else {
                val rTimeVal = rTimeEval.eval(rRow)
                val timeOk = rTimeVal != null && {
                  val rt = rTimeVal.asInstanceOf[Long]
                  if (fwd) rt >= lTime else rt <= lTime
                }
                if (rTimeVal == null) { buffered.next() }
                else if (timeOk) {
                  // newer valid candidate (sorted: each consumes the last)
                  candRow = rRow.copy()
                  candKey = rKey.copy()
                  candTime = rTimeVal.asInstanceOf[Long]
                  buffered.next()
                } else { done = true } // out of range: stop, keep for later
              }
            }
          }
          val hit = candRow != null && keyOrd.compare(candKey, lKey) == 0 &&
            tol.forall(t =>
              (if (fwd) candTime - lTime else lTime - candTime) <= t)
          joiner(joined(lRow, if (hit) candRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the small-right-side physical plan. The probe
  * (left) side is NEVER shuffled and NEVER sorted — it streams through
  * in place while each task answers point-in-time lookups against a
  * per-key time-sorted index built from the broadcast rows (O(R log R)
  * build per task, O(log n) binary search per probe row). At 100 TB
  * this is the difference between exchanging the whole fact table and
  * exchanging nothing: the standard quote/dimension case (right side =
  * a few MB of reference points) enriches a petabyte scan for free,
  * exactly as BroadcastHashJoin does for equi-joins.
  *
  * One sorted array serves BOTH directions: ascending (time, tie-break)
  * means "rightmost index with time <= t" is the backward answer (max
  * time, then max tie) and "leftmost index with time >= t" is the
  * forward answer (min time, then min tie).
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUnits: Option[Long],
    forward: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
    org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
      org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

  // probe side untouched: its partitioning AND ordering flow through
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val tieB = rightTieBreak
    val tol = toleranceUnits
    val fwd = forward
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val rTimeEval = BindReferences.bindReference(rTimeB, rOut)
      val tieProj = UnsafeProjection.create(tieB, rOut)
      val tieOrd =
        RowOrdering.createNaturalAscendingOrdering(tieB.map(_.dataType))
      // per-key (time, tie)-ascending arrays from the broadcast rows
      val index = new java.util.HashMap[InternalRow,
        scala.collection.mutable.ArrayBuffer[(Long, InternalRow, InternalRow)]]()
      bcast.value.foreach { rRow =>
        val k = rKeyProj(rRow)
        val t = rTimeEval.eval(rRow)
        if (!k.anyNull && t != null) {
          var buf = index.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer
              .empty[(Long, InternalRow, InternalRow)]
            index.put(k.copy(), buf)
          }
          buf += ((t.asInstanceOf[Long], tieProj(rRow).copy(), rRow))
        }
      }
      val sortedIndex = new java.util.HashMap[InternalRow,
        (Array[Long], Array[InternalRow])]()
      val keys = index.keySet().iterator()
      while (keys.hasNext) {
        val k = keys.next()
        val sorted = index.get(k).sortWith { case ((t1, x1, _), (t2, x2, _)) =>
          t1 < t2 || (t1 == t2 && tieOrd.compare(x1, x2) < 0)
        }
        sortedIndex.put(k,
          (sorted.map(_._1).toArray, sorted.map(_._3).toArray))
      }

      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val lTimeEval = BindReferences.bindReference(lTimeB, lOut)
      // bind against NULLABLE right attrs: an unmatched left row pairs
      // with an all-null placeholder, and a non-nullable input binding
      // would skip the null check and read garbage zeros instead
      val joiner = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeVal = lTimeEval.eval(lRow)
        var hit: InternalRow = null
        if (!lKey.anyNull && lTimeVal != null) {
          val entry = sortedIndex.get(lKey)
          if (entry != null) {
            val (times, rows) = entry
            val lTime = lTimeVal.asInstanceOf[Long]
            // backward: rightmost i with times(i) <= t;
            // forward:  leftmost  i with times(i) >= t
            var lo = 0
            var hi = times.length // search the boundary lo == hi
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              val goRight = if (fwd) times(mid) < lTime else times(mid) <= lTime
              if (goRight) lo = mid + 1 else hi = mid
            }
            val i = if (fwd) lo else lo - 1
            if (i >= 0 && i < times.length) {
              val ok = tol.forall(t =>
                (if (fwd) times(i) - lTime else lTime - times(i)) <= t)
              if (ok) hit = rows(i)
            }
          }
        }
        joiner(joined(lRow, if (hit != null) hit else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point (lives in this package for
  * `Dataset.ofRows`). Columns may be plain `col("name")` — the
  * analyzer's generic reference resolution binds them against the two
  * children — or `df("name")` to disambiguate.
  */
object AsOfJoinOps {

  /** Backward as-of LEFT OUTER join of `left` to `right`.
    *
    * @param tolerance max allowed (leftTime - rightTime), in the time
    *        column's own units; matches farther than this become nulls
    * @param rightTieBreak deterministic last-wins order among equal
    *        (key, rightTime) rows — REQUIRED to be a total order within
    *        such groups for cluster-reproducible output
    * @param broadcast Some(true) forces the broadcast plan, Some(false)
    *        the shuffle-merge plan; None (default) lets the strategy
    *        pick from right-side size stats (the SMJ-vs-BHJ rule)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Seq[Column] = Nil,
      tolerance: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    asofJoin(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTieBreak, tolerance, forward = false, broadcast)

  /** Forward as-of LEFT OUTER join: the EARLIEST right row with equal
    * keys and rightTime >= leftTime (within tolerance), ties broken by
    * the SMALLEST tie-break value — "next quote after the order".
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Seq[Column] = Nil,
      tolerance: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    asofJoin(left, right, leftKeys, rightKeys, leftTime, rightTime,
      rightTieBreak, tolerance, forward = true, broadcast)

  private def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Seq[Column],
      tolerance: Option[Long],
      forward: Boolean,
      broadcast: Option[Boolean]): DataFrame = {
    val classicLeft = left.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = classicLeft.sparkSession
    val lPlan = classicLeft.queryExecution.analyzed
    val rPlan =
      right.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed
    val shared = lPlan.outputSet.intersect(rPlan.outputSet)
    require(shared.isEmpty,
      s"asofJoinBackward: inputs share attributes $shared — self-joins " +
        "must alias one side (df.as / select) so attribute ids are disjoint")
    // Resolve each Column against ITS side up front (a Column in the 4.x
    // API is a lazy ColumnNode that only the analyzer's per-operator
    // conversion resolves; a custom node never gets that pass). Routing
    // through df.select(c) reuses the cached analyzed child, so the
    // resolved expression references the exact child attribute ids.
    def resolve(df: DataFrame, c: Column): Expression = {
      val analyzed = df.select(c)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed
      analyzed.expressions.head match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case other => other
      }
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark, AsOfJoin(lPlan, rPlan,
      leftKeys.map(resolve(left, _)), rightKeys.map(resolve(right, _)),
      resolve(left, leftTime), resolve(right, rightTime),
      rightTieBreak.map(resolve(right, _)), tolerance, forward, broadcast))
  }
}
