/** SQL-syntax surface for the as-of join operator.
  *
  * DuckDB (the correctness oracle), Snowflake, and QuestDB all expose
  * point-in-time joins as SQL text (`ASOF JOIN ... ON k = k AND t <= t`);
  * until now the graft operator tier was reachable only from the
  * DataFrame API ([[AsOfJoinOps]]). This file closes that gap the way
  * Spark extensions are meant to: a DELEGATING parser that rewrites the
  * `ASOF [LEFT] JOIN` dialect into stock Spark SQL carrying a marker
  * function around the ON-condition, plus an analyzer resolution rule
  * that converts the marked (fully resolved) `Join` into the existing
  * [[AsOfJoin]] logical node — from there the planner strategy picks
  * the shuffle-merge or broadcast physical plan exactly as it does for
  * the DataFrame entry point. No ANTLR fork, no grammar copy: the stock
  * parser still parses everything, the rewrite only touches the four
  * characters of `ASOF` and wraps one ON-expression.
  *
  * Supported dialect (mirrors DuckDB semantics):
  *   - `A ASOF JOIN B ON <cond>`       — inner: unmatched left rows drop
  *   - `A ASOF LEFT [OUTER] JOIN B ON <cond>` — left outer: they null-pad
  *   - `<cond>` = one or more equi-key conjuncts between the sides plus
  *     EXACTLY ONE non-strict time inequality (`l.t >= r.t` backward,
  *     `l.t <= r.t` forward, either operand order)
  *   - `/*+ BROADCAST(right) */` pins the broadcast physical plan
  * Unsupported, rejected with a loud AnalysisException: ASOF RIGHT/FULL,
  * USING keys, strict `<`/`>` time bounds, disjunctions / non-equi
  * extras in the condition.
  *
  * Reference parity note: the reference pipeline has no SQL surface at
  * all (CI-CMG/wod-ascii-to-parquet-spark is a conversion ETL); this is
  * engine-native capability measured against DuckDB's own ASOF JOIN.
  */
package org.apache.spark.sql.graft

import java.util.Locale

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** Analysis-time marker wrapping the ON-condition of a rewritten ASOF
  * join. Unevaluable ON PURPOSE: it is created only by the parser
  * rewrite and must be consumed by [[ResolveAsOfJoin]] during analysis
  * — if one ever escaped to execution the query would fail loudly
  * instead of silently running plain left-join (keep-ALL-matches)
  * semantics where the user asked for keep-latest.
  */
case class AsOfMarker(child: Expression, inner: Boolean)
  extends Expression with Unevaluable {
  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfMarker =
    copy(child = newChildren.head)
}

/** Minimal SQL lexer for the rewrite: word tokens and paren tokens with
  * byte offsets and nesting depth; string literals ('', "" with \\ and
  * doubled-quote escapes), backticked identifiers, `--` line comments
  * and (nested) bracketed comments are skipped so a literal `'ASOF'`
  * or a commented-out join can never trigger a rewrite.
  */
private[graft] object AsOfSqlLexer {
  final case class Tok(word: String, start: Int, end: Int, depth: Int)

  def lex(s: String): IndexedSeq[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val n = s.length
    var i = 0
    var depth = 0
    def isWordStart(c: Char) = c.isLetter || c == '_'
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') { depth += 1; out += Tok("(", i, i + 1, depth - 1); i += 1 }
      else if (c == ')') {
        depth -= 1; out += Tok(")", i, i + 1, depth); i += 1
      } else if (c == '\'' || c == '"') {
        val q = c; i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '\\') i += 2
          else if (s.charAt(i) == q) {
            if (i + 1 < n && s.charAt(i + 1) == q) i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '`') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '`') {
            if (i + 1 < n && s.charAt(i + 1) == '`') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        var lvl = 1; i += 2
        while (i < n && lvl > 0) {
          if (s.charAt(i) == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
            lvl += 1; i += 2
          } else if (s.charAt(i) == '*' && i + 1 < n &&
              s.charAt(i + 1) == '/') {
            lvl -= 1; i += 2
          } else i += 1
        }
      } else if (isWordStart(c)) {
        val st = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        out += Tok(s.substring(st, i).toUpperCase(Locale.ROOT), st, i, depth)
      } else i += 1
    }
    out.toIndexedSeq
  }
}

/** Text-level rewrite: each `ASOF [LEFT [OUTER]|INNER] JOIN ... ON c`
  * becomes `LEFT JOIN ... ON _graft_asof[_inner](c)` — same length for
  * the keyword splice (ASOF→LEFT or ASOF→spaces) so offsets before the
  * condition stay valid. Re-lexed after each splice; loops until no
  * ASOF-join shape remains, so multiple and nested as-of joins all
  * rewrite.
  */
object AsOfSqlRewrite {
  import AsOfSqlLexer._

  /** words that end an ON-condition at the join's own nesting depth */
  private val terminators = Set(
    "WHERE", "GROUP", "HAVING", "WINDOW", "ORDER", "LIMIT", "OFFSET",
    "UNION", "EXCEPT", "INTERSECT", "MINUS", "QUALIFY", "JOIN",
    "NATURAL", "CLUSTER", "DISTRIBUTE", "SORT", "FETCH", "ON", "USING")

  /** LEFT/RIGHT/etc. are also scalar functions; they terminate only as
    * part of a join-starter word pair.
    */
  private def isJoinStarter(toks: IndexedSeq[Tok], i: Int): Boolean = {
    def next = if (i + 1 < toks.length) toks(i + 1).word else ""
    toks(i).word match {
      case "JOIN" => true
      case "INNER" | "CROSS" | "SEMI" | "ANTI" => next == "JOIN"
      case "LEFT" | "RIGHT" | "FULL" =>
        next == "JOIN" || next == "OUTER" || next == "SEMI" || next == "ANTI"
      case "ASOF" =>
        next == "JOIN" || next == "LEFT" || next == "INNER" ||
          next == "RIGHT" || next == "FULL"
      case _ => false
    }
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_ASOF] $msg", None, None, None,
      None, Map.empty[String, String], Array.empty)

  def apply(sql: String): String = {
    var cur = sql
    var guard = 0
    var changed = true
    while (changed) {
      require(guard < 64, "ASOF rewrite did not converge")
      guard += 1
      rewriteFirst(cur) match {
        case Some(next) => cur = next
        case None => changed = false
      }
    }
    cur
  }

  private def rewriteFirst(s: String): Option[String] = {
    val toks = AsOfSqlLexer.lex(s)
    var i = 0
    while (i < toks.length) {
      if (toks(i).word == "ASOF") {
        def w(k: Int) = if (k < toks.length) toks(k).word else ""
        // (joinTokIdx, inner) for a recognized ASOF join head
        val head: Option[(Int, Boolean)] = w(i + 1) match {
          case "JOIN" => Some((i + 1, true))
          case "INNER" if w(i + 2) == "JOIN" => Some((i + 2, true))
          case "LEFT" if w(i + 2) == "JOIN" => Some((i + 2, false))
          case "LEFT" if w(i + 2) == "OUTER" && w(i + 3) == "JOIN" =>
            Some((i + 3, false))
          case "RIGHT" | "FULL" =>
            fail(s"ASOF ${w(i + 1)} JOIN is not supported — as-of " +
              "probes from the left side; swap the sides and use " +
              "ASOF [LEFT] JOIN")
          case _ => None // identifier that happens to be named asof
        }
        head match {
          case Some((joinIdx, inner)) =>
            return Some(spliceOne(s, toks, toks(i), joinIdx, inner))
          case None => ()
        }
      }
      i += 1
    }
    None
  }

  private def spliceOne(s: String, toks: IndexedSeq[Tok], asofTok: Tok,
      joinIdx: Int, inner: Boolean): String = {
    val d = toks(joinIdx).depth
    // find THIS join's ON at the same depth (right-side subquery
    // innards sit deeper and are skipped)
    var k = joinIdx + 1
    var onIdx = -1
    while (onIdx < 0) {
      if (k >= toks.length || toks(k).depth < d)
        fail("ASOF JOIN requires an ON condition")
      else if (toks(k).depth == d) {
        toks(k).word match {
          case "ON" => onIdx = k
          case "USING" =>
            fail("ASOF JOIN ... USING is not supported — spell the " +
              "keys in ON (k1 = k2 AND t1 <= t2)")
          case _ if isJoinStarter(toks, k) =>
            fail("another join between ASOF JOIN and its ON condition " +
              "— parenthesize the right side")
          case _ => ()
        }
      }
      k += 1
    }
    // condition extends to the next clause/join keyword or scope close
    val condStart = toks(onIdx).end
    var condEnd = s.length
    k = onIdx + 1
    var scanning = true
    while (scanning && k < toks.length) {
      val t = toks(k)
      if (t.depth < d ||
          (t.depth == d &&
            (terminators.contains(t.word) || isJoinStarter(toks, k)))) {
        condEnd = t.start
        scanning = false
      }
      k += 1
    }
    val marker = if (inner) "_graft_asof_inner" else "_graft_asof"
    val sb = new StringBuilder(s)
    sb.insert(condEnd, ")")
    sb.insert(condStart, s" $marker(")
    // equal-length keyword splice keeps every later offset valid
    sb.replace(asofTok.start, asofTok.end, if (inner) "LEFT" else "    ")
    sb.toString
  }
}

/** Delegating parser injected via `e.injectParser`: pre-rewrites the
  * ASOF dialect and the store time-travel clauses
  * ([[StoreTimeTravelRewrite]] — catalog-consulting, so it needs the
  * session), then hands the (now stock-grammar) text to Spark's own
  * parser. Everything else is untouched — one uppercase-word scan
  * over the text is the entire overhead.
  */
class GraftSqlParser(session: => SparkSession, delegate: ParserInterface)
  extends ParserInterface {
  private def rewrite(sqlText: String): String =
    StoreTimeTravelRewrite(session,
      AsOfSqlRewrite(GraftBm25Rewrite(session,
        GraftAnnRewrite(session, sqlText))))
  override def parsePlan(sqlText: String): LogicalPlan =
    // the GRAFT command namespace (maintenance verbs) dispatches on
    // the first token, before any rewrite; everything else flows on
    GraftCommandParser(sqlText)
      .getOrElse(delegate.parsePlan(rewrite(sqlText)))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Resolution rule: a fully-resolved LEFT Join whose condition is the
  * as-of marker becomes the [[AsOfJoin]] logical operator. Runs inside
  * the analyzer's main fixed point (injectResolutionRule), so by
  * CheckAnalysis time no marker survives; any condition shape the
  * operator can't honor is a loud AnalysisException, never a silent
  * fallback to keep-all-matches join semantics.
  */
object ResolveAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j @ Join(l, r, LeftOuter, Some(m: AsOfMarker), hint)
          if j.resolved =>
        convert(l, r, m, hint)
    }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_ASOF] $msg", None, None, None,
      None, Map.empty[String, String], Array.empty)

  private def convert(l: LogicalPlan, r: LogicalPlan, m: AsOfMarker,
      hint: JoinHint): LogicalPlan = {
    val lset = l.outputSet
    val rset = r.outputSet
    def leftOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(lset)
    def rightOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(rset)

    val keys = scala.collection.mutable.ArrayBuffer
      .empty[(Expression, Expression)]
    var time: Option[(Expression, Expression, Boolean)] = None
    def setTime(lt: Expression, rt: Expression, forward: Boolean): Unit = {
      if (time.isDefined)
        fail("exactly ONE time inequality is allowed in an ASOF JOIN " +
          "condition; fold extra bounds into WHERE or pre-filters")
      time = Some((lt, rt, forward))
    }

    splitConjunctivePredicates(m.child).foreach {
      case EqualTo(a, b) if leftOnly(a) && rightOnly(b) => keys += ((a, b))
      case EqualTo(a, b) if rightOnly(a) && leftOnly(b) => keys += ((b, a))
      // l.t >= r.t — latest right at-or-before left: BACKWARD
      case GreaterThanOrEqual(a, b) if leftOnly(a) && rightOnly(b) =>
        setTime(a, b, forward = false)
      case GreaterThanOrEqual(a, b) if rightOnly(a) && leftOnly(b) =>
        setTime(b, a, forward = true)
      // l.t <= r.t — earliest right at-or-after left: FORWARD
      case LessThanOrEqual(a, b) if leftOnly(a) && rightOnly(b) =>
        setTime(a, b, forward = true)
      case LessThanOrEqual(a, b) if rightOnly(a) && leftOnly(b) =>
        setTime(b, a, forward = false)
      case e @ (_: GreaterThan | _: LessThan)
          if (leftOnly(e.children.head) && rightOnly(e.children(1))) ||
            (rightOnly(e.children.head) && leftOnly(e.children(1))) =>
        fail("strict as-of bounds (< / >) are not supported — the " +
          "operator matches at-or-before/at-or-after; use <= or >=")
      case other =>
        fail("unsupported ASOF JOIN conjunct " +
          s"'${other.sql}' — the condition must be equi-keys between " +
          "the two sides plus one non-strict time inequality")
    }
    if (keys.isEmpty)
      fail("ASOF JOIN needs at least one equi-key conjunct " +
        "(k_left = k_right) so the match is per-key, not global")
    val (lt, rt, forward) = time.getOrElse(
      fail("ASOF JOIN needs a time inequality (t_left >= t_right for " +
        "backward, t_left <= t_right for forward)"))

    val broadcastHint =
      if (hint.rightHint.flatMap(_.strategy).contains(BROADCAST)) Some(true)
      else None
    val asof = AsOfJoin(l, r, keys.map(_._1).toSeq, keys.map(_._2).toSeq,
      lt, rt, rightTieBreak = Nil, toleranceUnits = None, forward,
      broadcastHint)
    // inner variant: matched rows have a non-null right time by
    // construction (null-time right rows never match), so the
    // left-outer result filtered on it IS the inner as-of join
    if (m.inner) Filter(IsNotNull(rt), asof) else asof
  }
}
