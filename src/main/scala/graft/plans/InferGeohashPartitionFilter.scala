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
  *   - `geohash >= 'lo'` / `>`             → `geohash3 >= 'lo'.take(3)`
  *     (>= even for strict >: a value above 'lo' can still share its
  *     3-char prefix)
  *   - `geohash <= 'hi'`                   → `geohash3 <= 'hi'.take(3)`
  *   - `geohash < 'hi'` → `geohash3 < 'hi'` when `hi` is ≤ 3 chars
  *     (no longer value below 'hi' can reach the 'hi' cell — this is
  *     what makes a bbox decomposition's `gh >= 'gfq' AND gh < 'gfr'`
  *     prune to EXACTLY the gfq cell); `geohash3 <= 'hi'.take(3)`
  *     for longer bounds
  *   - `OR` infers only when BOTH branches infer (sound: a disjunction
  *     implies the disjunction of the implied cells)
  *   - `AND` infers when either branch infers
  *
  * Prefix-order soundness of the range cases: string comparison
  * decides on the first differing position, so if `take(3)(x) <
  * take(3)(lo)` the difference lies inside the first 3 chars and
  * forces `x < lo` — contrapositive: `x >= lo ⇒ take(3)(x) >=
  * take(3)(lo)` (and symmetrically for upper bounds). Prefixing is
  * order-preserving; that is the whole trick.
  *
  * PROVENANCE GATE: the layout invariant (`geohash3 =
  * substring(geohash, 1, 3)`) is a property of THIS ENGINE'S stores,
  * not of any pair of columns that happen to share the names. The rule
  * therefore fires only when
  *   - the `geohash` attribute carries the write-time column-metadata
  *     tag [[InferGeohashPartitionFilter.ProvenanceKey]] (stamped by
  *     [[graft.wod.WodPipeline]] on every store it writes; Spark
  *     round-trips field metadata through the parquet footer), or
  *   - the session opts in for a trusted external store via
  *     `spark.graft.geohash.assumePrefixLayout=true`.
  * External data with coincidentally-named columns never triggers the
  * rule (r7 ADVICE: no silent row loss on invariant-violating inputs).
  * In BOTH modes `geohash` and `geohash3` must additionally reach the
  * filter unrenamed from one leaf relation ([[sameOrigin]]) — a
  * `withColumn("geohash3", …)` replacement or a joined-in foreign
  * geohash3 disarms the rule (r8 ADVICE).
  *
  * Soundness: every added conjunct is IMPLIED by the original
  * predicate given the layout invariant, so rows are never lost; the
  * rule adds, never replaces. Idempotence (fixed-point batch): a
  * condition already referencing `geohash3` — user-supplied or added
  * by a previous pass — is left untouched.
  *
  * Registered via [[graft.GraftExtensions]]; disable with
  * `spark.sql.optimizer.excludedRules=graft.plans.InferGeohashPartitionFilter`.
  */
object InferGeohashPartitionFilter extends Rule[LogicalPlan]
    with PredicateHelper {

  private val CellLen = 3

  /** Column-metadata key stamped on `geohash` by the engine's store
    * writers; `true` asserts the sibling `geohash3` column/partition is
    * its 3-char prefix.
    */
  val ProvenanceKey = "graft.geohash3IsPrefix"

  /** Session opt-in for external stores known to satisfy the layout
    * invariant despite lacking the write-time tag.
    */
  val AssumeLayoutConf = "spark.graft.geohash.assumePrefixLayout"

  private def trusted(gh: Attribute): Boolean =
    (gh.metadata.contains(ProvenanceKey) &&
      scala.util.Try(gh.metadata.getBoolean(ProvenanceKey))
        .getOrElse(false)) ||
      conf.getConfString(AssumeLayoutConf, "false").equalsIgnoreCase("true")

  /** The tag on `geohash` asserts a layout invariant about its SIBLING
    * column — which only holds for the geohash3 the store was written
    * with. Column metadata survives arbitrary downstream transforms, so
    * the tag alone can't rule out a `withColumn("geohash3", …)`
    * replacement or a joined-in foreign geohash3 (r8 ADVICE). geohash3
    * is the store's PARTITION column, so it cannot carry its own
    * footer tag (partition values come from directory names); instead
    * require both attributes to reach the filter from the SAME leaf
    * relation, unrenamed — any replacement/rename mints a fresh exprId
    * in a Project and fails the leaf-output containment.
    */
  private def sameOrigin(child: LogicalPlan, gh: Attribute,
      gh3: Attribute): Boolean =
    child.collectLeaves().exists(l =>
      l.outputSet.contains(gh) && l.outputSet.contains(gh3))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      def named(n: String): Option[Attribute] =
        child.output.find(a =>
          conf.resolver(a.name, n) && a.dataType == StringType)
      (named("geohash"), named("geohash3")) match {
        case (Some(gh), Some(gh3))
            if trusted(gh) && sameOrigin(child, gh, gh3) &&
              !cond.references.contains(gh3) =>
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
    // range bounds: prefixing is order-preserving (see scaladoc), so a
    // bound on geohash implies the take(3) bound on geohash3
    case GreaterThan(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => lowerCell(v, gh3)
    case GreaterThanOrEqual(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => lowerCell(v, gh3)
    case LessThan(Literal(v, StringType), a: Attribute) // lit < gh ≡ gh > lit
        if a.semanticEquals(gh) => lowerCell(v, gh3)
    case LessThanOrEqual(Literal(v, StringType), a: Attribute)
        if a.semanticEquals(gh) => lowerCell(v, gh3)
    case LessThan(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => upperCell(v, gh3, strict = true)
    case LessThanOrEqual(a: Attribute, Literal(v, StringType))
        if a.semanticEquals(gh) => upperCell(v, gh3, strict = false)
    case GreaterThan(Literal(v, StringType), a: Attribute) // lit > gh ≡ gh < lit
        if a.semanticEquals(gh) => upperCell(v, gh3, strict = true)
    case GreaterThanOrEqual(Literal(v, StringType), a: Attribute)
        if a.semanticEquals(gh) => upperCell(v, gh3, strict = false)
    case Or(l, r) =>
      for (a <- infer(l, gh, gh3); b <- infer(r, gh, gh3)) yield Or(a, b)
    case And(l, r) =>
      // combine BOTH branches when both infer (a nested range like
      // `gh >= 'gfq' AND gh < 'gfr'` inside an OR keeps both bounds);
      // either alone is still sound
      (infer(l, gh, gh3), infer(r, gh, gh3)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
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

  /** `geohash >(=) lo` → `geohash3 >= lo.take(3)`. Always non-strict:
    * a geohash strictly above `lo` can still share its 3-char prefix
    * (e.g. 'gfq5…' > 'gfq'). Empty bound implies nothing.
    */
  private def lowerCell(v: Any, gh3: Attribute): Option[Expression] =
    v match {
      case u: UTF8String if u.toString.nonEmpty =>
        Some(GreaterThanOrEqual(gh3,
          Literal.create(u.toString.take(CellLen), StringType)))
      case _ => None // null/empty: x > null is never true / no bound
    }

  /** `geohash <(=) hi` → upper bound on `geohash3`. A STRICT bound of
    * ≤ 3 chars stays strict — no value below 'gfr' starts with 'gfr'
    * (a 'gfr…' string compares ≥ 'gfr'), so the boundary cell itself is
    * pruned; this is what turns a bbox decomposition's
    * `[gfq, gfr)` range into exactly the gfq cell. Longer or
    * non-strict bounds weaken to `<= hi.take(3)` ('gfq0…' < 'gfq5…'
    * shares the cell).
    */
  private def upperCell(v: Any, gh3: Attribute,
      strict: Boolean): Option[Expression] = v match {
    case u: UTF8String if u.toString.nonEmpty =>
      val s = u.toString
      val cell = Literal.create(s.take(CellLen), StringType)
      if (strict && s.length <= CellLen) Some(LessThan(gh3, cell))
      else Some(LessThanOrEqual(gh3, cell))
    case _ => None // null/empty: x < null never true; x < '' never true
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
