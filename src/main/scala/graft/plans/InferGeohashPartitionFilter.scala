package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Storage-aware optimizer rule: infer `geohash3` partition predicates
  * from `geohash` point/prefix predicates.
  *
  * The engine's converted stores (reference layout,
  * `DatasetYearTrain.java:120-140` re-expressed in
  * [[graft.wod.WodPipeline]]) are hive-partitioned by `geohash3`, the
  * 3-char prefix of the row-level 12-char `geohash` column. A user who
  * filters on the full geohash —
  *
  *   `WHERE geohash = 'gfq5nsp2rj8k'`  ·  `WHERE geohash LIKE 'gfq%'`
  *
  * — has, by the store's construction, also constrained `geohash3`,
  * but Spark cannot know that: the scan reads EVERY partition
  * directory and filters rows. At 100 TB that is the difference
  * between a point lookup touching one directory and a full-store
  * scan. This rule encodes the layout invariant
  * (`geohash3 = substring(geohash, 1, 3)`, [[graft.wod.Transform]])
  * into the optimizer: any Filter whose input carries BOTH string
  * columns gains the implied `geohash3` conjunct, which the normal
  * pushdown rules then drive into `FileSourceScanExec.partitionFilters`
  * for directory-level pruning.
  *
  * Inference (per conjunct, recursing through OR):
  *   - `geohash = 'p…'` / `<=>` (len ≥ 3)  → `geohash3 = 'p'.take(3)`
  *   - `geohash LIKE 'p%'` i.e. StartsWith → prefix ≥ 3: equality;
  *     shorter: `geohash3 LIKE 'p%'` (still prunes directories)
  *   - `geohash IN (…)` / InSet            → OR of the per-value cells
  *   - `OR` infers only when BOTH branches infer (sound: a disjunction
  *     implies the disjunction of the implied cells)
  *   - `AND` infers when either branch infers
  *
  * Soundness: every added conjunct is IMPLIED by the original
  * predicate given the layout invariant, so rows are never lost; the
  * rule adds, never replaces, so even a store violating the invariant
  * (not produced by this engine) only risks wrong pruning there, and
  * the rule is scoped to inputs carrying the engine's column pair.
  * Idempotence (fixed-point batch): a condition already referencing
  * `geohash3` — user-supplied or added by a previous pass — is left
  * untouched.
  *
  * Registered via [[graft.GraftExtensions]]; disable with
  * `spark.sql.optimizer.excludedRules=graft.plans.InferGeohashPartitionFilter`.
  */
object InferGeohashPartitionFilter extends Rule[LogicalPlan]
    with PredicateHelper {

  private val CellLen = 3

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      def named(n: String): Option[Attribute] =
        child.output.find(a =>
          conf.resolver(a.name, n) && a.dataType == StringType)
      (named("geohash"), named("geohash3")) match {
        case (Some(gh), Some(gh3)) if !cond.references.contains(gh3) =>
          val extra = splitConjunctivePredicates(cond)
            .flatMap(infer(_, gh, gh3))
          if (extra.isEmpty) f
          else Filter(extra.foldLeft(cond)(And), child)
        case _ => f
      }
  }

  /** The `geohash3` predicate implied by `e`, when one exists. */
  private def infer(e: Expression, gh: Attribute,
      gh3: Attribute): Option[Expression] = e match {
    case EqualTo(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => cellOf(v, gh3, exact = true)
    case EqualTo(Literal(v, StringType), a: Attribute)
        if a.semanticEquals(gh) => cellOf(v, gh3, exact = true)
    case EqualNullSafe(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => cellOf(v, gh3, exact = true)
    case EqualNullSafe(Literal(v, StringType), a: Attribute)
        if a.semanticEquals(gh) => cellOf(v, gh3, exact = true)
    case StartsWith(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => cellOf(v, gh3, exact = false)
    case In(a: Attribute, vs)
        if a.semanticEquals(gh) && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
      anyCell(vs.map(_.asInstanceOf[Literal].value), gh3)
    case InSet(a: Attribute, hset) if a.semanticEquals(gh) =>
      anyCell(hset.toSeq, gh3)
    case Or(l, r) =>
      for (a <- infer(l, gh, gh3); b <- infer(r, gh, gh3)) yield Or(a, b)
    case And(l, r) =>
      infer(l, gh, gh3).orElse(infer(r, gh, gh3))
    case _ => None
  }

  /** Cell predicate for one geohash value. `exact` distinguishes a
    * full-value equality (any length ≥ CellLen pins the cell) from a
    * prefix match, where a short prefix only narrows the cell to its
    * own prefix.
    */
  private def cellOf(v: Any, gh3: Attribute,
      exact: Boolean): Option[Expression] = v match {
    case u: UTF8String =>
      val s = u.toString
      if (s.length >= CellLen)
        Some(EqualTo(gh3, Literal.create(s.take(CellLen), StringType)))
      else if (s.nonEmpty && !exact)
        Some(StartsWith(gh3, Literal.create(s, StringType)))
      else None // empty prefix implies nothing; short equality can't match a 12-char geohash anyway
    case _ => None // null: x = null is never true, nothing to narrow
  }

  /** OR of the cells for an IN list — only when EVERY non-null value
    * infers one (a value that implies nothing makes the union
    * unbounded). Nulls are droppable: `x IN (…, null)` matches x only
    * via the non-null values.
    */
  private def anyCell(vs: Seq[Any], gh3: Attribute): Option[Expression] = {
    val nonNull = vs.filter(_ != null)
    if (nonNull.isEmpty) return None
    val cells = nonNull.map(cellOf(_, gh3, exact = true))
    if (cells.exists(_.isEmpty)) None
    else Some(cells.flatten.distinct.reduce(Or))
  }
}
