package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.operators.SketchStats

/** Sketch-driven join planning: stored key sketches
  * ([[graft.operators.SketchStats]]) choose broadcast-vs-shuffle and
  * gate runaway joins BEFORE execution.
  *
  * Spark's own broadcast decision reads bytes-on-disk
  * (`sizeInBytes`), which file-relation stats often misstate (raw
  * parquet compression ratios, post-write appends) and which says
  * nothing about join OUTPUT size — the quantity that decides whether
  * a join is safe to run at all at 100 TB. Engine-written stores carry
  * a 24 KB count-min sketch of their join key, maintained at write
  * time; this rule consults those stored stats on every inner,
  * left/right-outer, and left-semi/anti equi-join whose BOTH sides
  * are statted catalog tables (non-inner joins hint only their
  * build-broadcastable side, and the runaway gate stays inner-only —
  * the sketch bounds the MATCHED-pair count, which is all of an inner
  * output but only part or none of the others'):
  *
  *   - **strategy**: if a side's recorded size fits the broadcast
  *     budget (`spark.graft.sketchJoin.broadcastBytes`, default 10 MB),
  *     hint it BROADCAST — a filter above the scan only shrinks the
  *     side, so the stored size is an upper bound and the hint stays
  *     safe under pushed-down predicates;
  *   - **runaway gate**: the sketch inner product estimates |A ⋈ B|
  *     (one-sided ≥ exact, q38's estimator); if it exceeds
  *     `spark.graft.sketchJoin.failRows` (default off) and NEITHER
  *     side is filtered, the query fails at planning with the estimate
  *     in the message — the fan-out is diagnosed from 48 KB of sketch
  *     bytes instead of a cluster-melting shuffle. A filtered side
  *     downgrades the gate to a warning: table-level stats OVERSTATE a
  *     filtered join, and a planner must never kill a query on
  *     evidence that can't see the filter.
  *
  * Stand-down discipline: user hints win (any explicit strategy hint
  * on the join disables the rule for that join), missing stats on
  * either side leave the plan untouched, and only the analyzed key
  * column's equi-joins qualify — a join on some other column says
  * nothing about the sketched key distribution.
  */
case class SketchJoinRule(spark: SparkSession) extends Rule[LogicalPlan]
  with PredicateHelper {

  val EnabledConf = "spark.graft.sketchJoin.enabled"
  val BroadcastBytesConf = "spark.graft.sketchJoin.broadcastBytes"
  val FailRowsConf = "spark.graft.sketchJoin.failRows"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "true").equalsIgnoreCase("true"))
      return plan
    plan.transformUp {
      case j @ Join(l, r,
          jt @ (Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti),
          Some(cond), hint)
          if hint.leftHint.forall(_.strategy.isEmpty) &&
            hint.rightHint.forall(_.strategy.isEmpty) =>
        decide(j, l, r, jt, cond).getOrElse(j)
    }
  }

  /** (table name, was there a Filter above the scan, leaf outputs) for
    * a side that is one catalog table under Project/Filter chains —
    * anything else (joins, aggregates, unions, views that expanded to
    * more) is not a statted store side and stands down.
    */
  private def origin(p: LogicalPlan): Option[(String, Boolean,
      Seq[AttributeReference])] = p match {
    case rel: LogicalRelation =>
      rel.catalogTable.map { ct =>
        // fully-qualified lookup key: a same-named table in another
        // database must never resolve to this table's stats
        val name = ct.identifier.database
          .fold(ct.identifier.table)(_ + "." + ct.identifier.table)
        (name, false,
          rel.output.collect { case a: AttributeReference => a })
      }
    case Project(_, child) => origin(child)
    case Filter(_, child) =>
      origin(child).map { case (t, _, o) => (t, true, o) }
    case SubqueryAlias(_, child) => origin(child)
    case _ => None
  }

  private def decide(j: Join, l: LogicalPlan, r: LogicalPlan,
      jt: JoinType, cond: Expression): Option[Join] = {
    val (lTab, lFiltered, lOut) = origin(l).getOrElse(return None)
    val (rTab, rFiltered, rOut) = origin(r).getOrElse(return None)
    val ls = SketchStats.read(spark, lTab).getOrElse(return None)
    val rs = SketchStats.read(spark, rTab).getOrElse(return None)

    // the join must be on the ANALYZED keys: some equi-conjunct pairs
    // exactly the two sketched columns (matched by exprId against the
    // leaf relation output, so a renamed projection can't spoof it)
    def isKeyOf(e: Expression, out: Seq[AttributeReference],
        keyCol: String): Boolean = e match {
      case a: AttributeReference =>
        out.exists(o => o.exprId == a.exprId && o.name == keyCol)
      case _ => false
    }
    val onSketchedKeys = splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (isKeyOf(a, lOut, ls.keyCol) && isKeyOf(b, rOut, rs.keyCol)) ||
          (isKeyOf(b, lOut, ls.keyCol) && isKeyOf(a, rOut, rs.keyCol))
      case _ => false
    }
    if (!onSketchedKeys) return None

    val failRows = conf.getConfString(FailRowsConf, "-1").toLong
    // Estimate ONLY when the runaway gate is armed, and never let the
    // estimator kill planning: two tables analyzed with different w/d
    // make CmsInnerProduct throw on shape mismatch, and exact counter
    // arithmetic throws on Long overflow at extreme scale. Either way
    // the GATE stands down with a warning — the broadcast decision
    // below needs only sizeBytes and proceeds regardless.
    val est: Option[Long] =
      if (failRows <= 0) None
      else scala.util.Try(SketchStats.estimateJoinRows(ls, rs)) match {
        case scala.util.Success(v) => Some(v)
        case scala.util.Failure(e) =>
          logWarning(s"[GRAFT_SKETCH_JOIN] $lTab ⋈ $rTab: join-rows " +
            s"estimate unavailable (${e.getMessage}) — runaway gate " +
            "stands down; broadcast decision proceeds on stored sizes")
          None
      }
    // the gate stays INNER-only: the inner product one-sidedly bounds
    // the MATCHED-pair count, which equals inner output but only part
    // of an outer join's — failing an outer join on it would not be
    // evidence-sound
    if (jt == Inner && est.exists(_ > failRows)) {
      if (!lFiltered && !rFiltered)
        throw new AnalysisException(
          s"[GRAFT_SKETCH_JOIN] $lTab ⋈ $rTab on " +
            s"(${ls.keyCol}, ${rs.keyCol}): sketch-estimated output " +
            s"${est.get} rows exceeds $FailRowsConf=$failRows — a key is " +
            "fanning out; verify the join keys or raise the limit",
          None, None, None, None, Map.empty[String, String], Array.empty)
      else logWarning(s"[GRAFT_SKETCH_JOIN] $lTab ⋈ $rTab estimated " +
        s"${est.get} rows (> $failRows) from TABLE-level sketches; a filter " +
        "is present so the estimate is an upper bound — not failing")
    }

    val budget = conf.getConfString(BroadcastBytesConf,
      (10L * 1024 * 1024).toString).toLong
    // only the build-broadcastable side is hintable: LeftOuter/Semi/
    // Anti stream the left (right-only), RightOuter streams the right
    // (left-only) — JoinSelection's own constraint
    val leftHintable = jt == Inner || jt == RightOuter
    val rightHintable = jt != RightOuter
    val (lFits, rFits) = (
      leftHintable && ls.sizeBytes <= budget,
      rightHintable && rs.sizeBytes <= budget)
    if (!lFits && !rFits) return None
    // smaller recorded side wins when both fit
    val hintLeft = lFits && (!rFits || ls.sizeBytes <= rs.sizeBytes)
    logInfo(s"[GRAFT_SKETCH_JOIN] $lTab ⋈ $rTab: " +
      s"est=${est.map(_.toString).getOrElse("n/a (gate off)")} rows, " +
      s"sizes=(${ls.sizeBytes}, ${rs.sizeBytes}) bytes, budget=$budget" +
      s" — broadcasting ${if (hintLeft) lTab else rTab}")
    Some(if (hintLeft)
      j.copy(hint = j.hint.copy(leftHint =
        Some(HintInfo(strategy = Some(BROADCAST)))))
    else
      j.copy(hint = j.hint.copy(rightHint =
        Some(HintInfo(strategy = Some(BROADCAST))))))
  }
}
