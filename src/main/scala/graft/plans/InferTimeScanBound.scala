package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Scan-bound inference for epoch-arithmetic time predicates.
  *
  * The engine canonicalizes `events.ts` to LongType epoch-nanos
  * ([[graft.queries.Tables.normalizeEventTs]]): on the `timestamp[us]`
  * testdata vintage the normalized column is
  * `unix_micros(cast(ts AS TIMESTAMP)) * 1000` over the raw
  * TIMESTAMP_NTZ attribute. A time-range predicate written against the
  * canonical column —
  *
  *   `WHERE ts_us < 1704240000000000`  (ts_us = ts DIV 1000)
  *   `WHERE ts >= lo AND ts < hi`      (staging slicers, windows)
  *
  * — reaches the optimizer as a comparison between an ARITHMETIC CHAIN
  * over the raw column and a literal. Parquet pushdown needs a bare
  * attribute, so the scan reads every row group and filters rows. At
  * 100 TB that is the difference between a 48-hour funnel window
  * pruning a month-partitioned corpus to ~3% of its row groups (parquet
  * min/max stats on `ts`) and a full scan.
  *
  * Every layer the engine composes is monotone nondecreasing in its
  * input, so the chain is invertible into a raw-column bound:
  *
  *   - `g * k`, `g + k`, `g - k` (integral literal `k > 0` for `*`)
  *   - `g DIV k`   (IntegralDivide, `k > 0`; truncation-toward-zero
  *                  semantics inverted exactly — see [[divLeBound]])
  *   - `unix_micros(t)` (bijection: TimestampType IS its micros long)
  *   - `cast(ntz AS TIMESTAMP)` under a UTC session zone (bijection on
  *     the micros value; non-UTC zones are not inverted — DST makes
  *     the wall→instant map non-injective)
  *
  * For each Filter conjunct `cmp(chain(x), literal)` the rule derives
  * the implied bare bound `cmp'(x, literal')` and ADDS it as a
  * conjunct (never replaces — rows are never lost; the derived bound
  * is implied by the original predicate, and both are null-rejecting
  * on the same attribute). Standard pushdown then drives the new
  * conjunct into the parquet scan's PushedFilters for row-group
  * pruning, while the original conjunct still evaluates exactly.
  *
  * DOMAIN CONTRACT (why inversion is sound): the arithmetic inversion
  * assumes the chain does not overflow Long at runtime. This is the
  * engine's events-domain contract — `ts` must be representable as
  * epoch-NANOS in a Long (1677..2262), exactly what the original
  * INT64 TIMESTAMP(NANOS) testdata format guarantees physically and
  * what `normalizeEventTs` requires of the `timestamp[us]` vintage.
  * Outside that domain the non-ANSI `Multiply` wraps and the bound
  * could drop rows; disable with
  * `spark.sql.optimizer.excludedRules=graft.plans.InferTimeScanBound`
  * or `spark.graft.inferTimeScanBounds=false` when scanning data that
  * violates the contract.
  *
  * Idempotence (fixed-point batch): inference requires at least one
  * chain layer (`depth >= 1`), so a derived bare bound never
  * re-infers; a derived conjunct already present (semantically) is
  * not added again.
  */
object InferTimeScanBound extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.inferTimeScanBounds"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "true").equalsIgnoreCase("true"))
      return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val derived = conjuncts.flatMap(infer)
          .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
          .distinct
        if (derived.isEmpty) f
        else Filter(derived.foldLeft(cond)(And), child)
    }
  }

  /** Literal with a discrete, totally ordered long-valued domain:
    * integral types, plus timestamps (physically micros longs).
    */
  private object DiscreteLit {
    def unapply(e: Expression): Option[BigInt] = e match {
      case Literal(v: Byte, ByteType) => Some(BigInt(v))
      case Literal(v: Short, ShortType) => Some(BigInt(v))
      case Literal(v: Int, IntegerType) => Some(BigInt(v))
      case Literal(v: Long, LongType) => Some(BigInt(v))
      case Literal(v: Long, TimestampType) => Some(BigInt(v))
      case Literal(v: Long, TimestampNTZType) => Some(BigInt(v))
      case _ => None
    }
  }

  private object PosLit {
    def unapply(e: Expression): Option[BigInt] = e match {
      case DiscreteLit(k) if k > 0 => Some(k)
      case _ => None
    }
  }

  private object AnyLit {
    def unapply(e: Expression): Option[BigInt] = DiscreteLit.unapply(e)
  }

  private def discrete(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The bare-column bound implied by one conjunct, when one exists.
    * Strict comparisons tighten to non-strict on the discrete domain
    * (`e < C` ≡ `e <= C-1` for integer/micros-valued `e`).
    */
  private def infer(e: Expression): Option[Expression] = e match {
    case LessThan(l, DiscreteLit(c)) if discrete(l) => invertLe(l, c - 1, 0)
    case LessThanOrEqual(l, DiscreteLit(c)) if discrete(l) => invertLe(l, c, 0)
    case GreaterThan(l, DiscreteLit(c)) if discrete(l) => invertGe(l, c + 1, 0)
    case GreaterThanOrEqual(l, DiscreteLit(c)) if discrete(l) =>
      invertGe(l, c, 0)
    case LessThan(DiscreteLit(c), r) if discrete(r) => invertGe(r, c + 1, 0)
    case LessThanOrEqual(DiscreteLit(c), r) if discrete(r) => invertGe(r, c, 0)
    case GreaterThan(DiscreteLit(c), r) if discrete(r) => invertLe(r, c - 1, 0)
    case GreaterThanOrEqual(DiscreteLit(c), r) if discrete(r) =>
      invertLe(r, c, 0)
    case EqualTo(l, DiscreteLit(c)) if discrete(l) => both(l, c)
    case EqualTo(DiscreteLit(c), r) if discrete(r) => both(r, c)
    case EqualNullSafe(l, DiscreteLit(c)) if discrete(l) => both(l, c)
    case EqualNullSafe(DiscreteLit(c), r) if discrete(r) => both(r, c)
    case _ => None
  }

  private def both(l: Expression, c: BigInt): Option[Expression] =
    (invertLe(l, c, 0), invertGe(l, c, 0)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (a, b) => a.orElse(b)
    }

  /** `e <= c` ⇒ bare upper bound on the chain's base attribute. */
  private def invertLe(e: Expression, c: BigInt,
      depth: Int): Option[Expression] = e match {
    case a: Attribute if depth > 0 =>
      boundLit(a, c).map(LessThanOrEqual(a, _))
    case m: Multiply => (m.left, m.right) match {
      case (g, PosLit(k)) => invertLe(g, floorDiv(c, k), depth + 1)
      case (PosLit(k), g) => invertLe(g, floorDiv(c, k), depth + 1)
      case _ => None
    }
    case d: IntegralDivide => (d.left, d.right) match {
      case (g, PosLit(k)) => invertLe(g, divLeBound(c, k), depth + 1)
      case _ => None
    }
    case ad: Add => (ad.left, ad.right) match {
      case (g, AnyLit(k)) => invertLe(g, c - k, depth + 1)
      case (AnyLit(k), g) => invertLe(g, c - k, depth + 1)
      case _ => None
    }
    case s: Subtract => (s.left, s.right) match {
      case (g, AnyLit(k)) => invertLe(g, c + k, depth + 1)
      case (AnyLit(k), g) => invertGe(g, k - c, depth + 1) // k-g <= c ⇔ g >= k-c
      case _ => None
    }
    case u: UnixMicros => invertLe(u.child, c, depth + 1)
    case cc: Cast if utcNtzToTz(cc) => invertLe(cc.child, c, depth + 1)
    case _ => None
  }

  /** `e >= c` ⇒ bare lower bound on the chain's base attribute. */
  private def invertGe(e: Expression, c: BigInt,
      depth: Int): Option[Expression] = e match {
    case a: Attribute if depth > 0 =>
      boundLit(a, c).map(GreaterThanOrEqual(a, _))
    case m: Multiply => (m.left, m.right) match {
      case (g, PosLit(k)) => invertGe(g, ceilDiv(c, k), depth + 1)
      case (PosLit(k), g) => invertGe(g, ceilDiv(c, k), depth + 1)
      case _ => None
    }
    case d: IntegralDivide => (d.left, d.right) match {
      case (g, PosLit(k)) => invertGe(g, divGeBound(c, k), depth + 1)
      case _ => None
    }
    case ad: Add => (ad.left, ad.right) match {
      case (g, AnyLit(k)) => invertGe(g, c - k, depth + 1)
      case (AnyLit(k), g) => invertGe(g, c - k, depth + 1)
      case _ => None
    }
    case s: Subtract => (s.left, s.right) match {
      case (g, AnyLit(k)) => invertGe(g, c + k, depth + 1)
      case (AnyLit(k), g) => invertLe(g, k - c, depth + 1) // k-g >= c ⇔ g <= k-c
      case _ => None
    }
    case u: UnixMicros => invertGe(u.child, c, depth + 1)
    case cc: Cast if utcNtzToTz(cc) => invertGe(cc.child, c, depth + 1)
    case _ => None
  }

  /** `trunc(g/k) <= c` (k>0, truncation toward zero) ⇔ `g <= bound`:
    * for c >= 0 the largest admissible g is `c*k + k - 1`
    * (`trunc((c*k+k-1)/k) = c`, one more reaches c+1); for c < 0 it is
    * `c*k` (`trunc(c*k/k) = c`, and `c*k + 1 .. c*k + k - 1` already
    * truncate to c+1 — toward-zero rounds negatives UP).
    */
  private[plans] def divLeBound(c: BigInt, k: BigInt): BigInt =
    if (c >= 0) c * k + k - 1 else c * k

  /** `trunc(g/k) >= c` (k>0) ⇔ `g >= bound`: for c > 0 the smallest
    * admissible g is `c*k`; for c <= 0 it is `c*k - k + 1` (negatives
    * truncate toward zero, so `c*k - k + 1 .. c*k` all reach c).
    */
  private[plans] def divGeBound(c: BigInt, k: BigInt): BigInt =
    if (c > 0) c * k else c * k - k + 1

  private[plans] def floorDiv(a: BigInt, b: BigInt): BigInt = {
    val (q, r) = a /% b // b > 0 here
    if (r.signum < 0) q - 1 else q
  }

  private[plans] def ceilDiv(a: BigInt, b: BigInt): BigInt =
    -floorDiv(-a, b)

  /** `cast(ntz AS TIMESTAMP)` under a UTC zone: bijection on micros. */
  private def utcNtzToTz(c: Cast): Boolean =
    c.dataType == TimestampType &&
      c.child.dataType == TimestampNTZType &&
      c.timeZoneId.exists { z =>
        try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
        catch { case _: java.time.DateTimeException => false }
      }

  /** Literal of the attribute's own type for a derived bound; None when
    * the bound exceeds the type's Long domain (the constraint is then
    * vacuous or impossible — either way no useful scan bound).
    */
  private def boundLit(a: Attribute, c: BigInt): Option[Literal] = {
    if (c < BigInt(Long.MinValue) || c > BigInt(Long.MaxValue)) return None
    a.dataType match {
      case LongType => Some(Literal(c.toLong, LongType))
      case TimestampType => Some(Literal(c.toLong, TimestampType))
      case TimestampNTZType => Some(Literal(c.toLong, TimestampNTZType))
      case IntegerType
          if c >= BigInt(Int.MinValue) && c <= BigInt(Int.MaxValue) =>
        Some(Literal(c.toInt, IntegerType))
      case _ => None
    }
  }
}
