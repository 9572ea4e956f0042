/** SQL command surface for the engine's store-maintenance verbs.
  *
  * Lakehouses expose their maintenance as SQL statements (Delta's
  * `VACUUM`/`OPTIMIZE`, Iceberg's `CALL` procedures, every warehouse's
  * `ANALYZE`); until now graft's equivalents were API-only. The
  * delegating parser claims ONE first-token namespace — statements
  * beginning with `GRAFT` — and parses a deliberately tiny grammar
  * into stock [[org.apache.spark.sql.execution.command
  * .LeafRunnableCommand]]s (planned by Spark's own command strategy,
  * no custom physical operator needed):
  *
  *   GRAFT ANALYZE <table> KEY <column>
  *     → [[graft.operators.SketchStats.analyzeKey]]: one scan, writes
  *       `<table>__kstats`, returns the recorded stats row — the
  *       opt-in that arms [[graft.plans.SketchJoinRule]] for a table.
  *   GRAFT VACUUM '<root>' [OLDER THAN <n> HOURS]
  *     → [[graft.operators.BucketedStores.vacuumOrphans]]: reclaims
  *       retired store directories by catalog reachability, returns
  *       one row per deleted path (default grace 24 h — the same
  *       crash-consistency knob as the API).
  *
  * Everything not starting with the GRAFT keyword takes the stock
  * path untouched; malformed GRAFT statements fail loudly with the
  * expected shape in the message.
  */
package org.apache.spark.sql.graft

import java.util.Locale

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

case class GraftAnalyzeKeyCommand(table: String, keyCol: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("key_col", StringType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("sketch_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val s = graft.operators.SketchStats.analyzeKey(spark, table, keyCol)
    Seq(Row(s.table, s.keyCol, s.nRows, s.sizeBytes, s.cms.length.toLong))
  }
}

case class GraftVacuumCommand(root: String, olderThanMs: Long)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.operators.BucketedStores
      .vacuumOrphans(spark, root, olderThanMs).map(Row(_))
}

/** First-token dispatcher + mini-grammar for the GRAFT namespace. */
object GraftCommandParser {
  import AsOfSqlLexer._

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_COMMAND] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  /** Some(plan) iff the statement's first word is GRAFT. */
  def apply(sql: String): Option[LogicalPlan] = {
    // fast path: the vast majority of statements don't start with the
    // namespace keyword — no lexing for them
    val t = sql.dropWhile(_.isWhitespace)
    if (t.length < 6 ||
        !t.substring(0, 5).equalsIgnoreCase("GRAFT") ||
        t(5).isLetterOrDigit || t(5) == '_')
      return None
    val toks = AsOfSqlLexer.lex(sql)
    if (toks.isEmpty || toks.head.word != "GRAFT") return None
    def w(i: Int) = if (i < toks.length) toks(i).word else ""
    w(1) match {
      case "ANALYZE" =>
        // GRAFT ANALYZE <table> KEY <column> — the table may be
        // db-qualified (`db.t` lexes as two words around a skipped
        // dot), so the table text is everything between ANALYZE and
        // the KEY keyword
        val keyIdx = toks.indexWhere(_.word == "KEY", 2)
        if (keyIdx < 3 || toks.length != keyIdx + 2)
          fail("expected GRAFT ANALYZE <table> KEY <column>, got: " +
            sql.trim)
        val table = sql.substring(toks(1).end, toks(keyIdx).start)
          .trim.toLowerCase(Locale.ROOT)
        if (table.isEmpty || !table.matches("[a-z0-9_]+(\\.[a-z0-9_]+)?"))
          fail(s"GRAFT ANALYZE wants a plain or db-qualified table " +
            s"name, got '$table'")
        Some(GraftAnalyzeKeyCommand(table,
          sql.substring(toks(keyIdx + 1).start, toks(keyIdx + 1).end)))
      case "VACUUM" =>
        // GRAFT VACUUM '<root>' [OLDER THAN <n> HOURS] — the quoted
        // path is skipped by the lexer and sits in the gap after
        // VACUUM; the hour count sits in the gap before HOURS
        val pathEnd =
          if (toks.length > 2) toks(2).start else sql.length
        val rawPath = sql.substring(toks(1).end, pathEnd).trim
        if (rawPath.length < 3 || rawPath.head != '\'' ||
            rawPath.last != '\'')
          fail("expected GRAFT VACUUM '<root>' [OLDER THAN <n> " +
            s"HOURS], got: ${sql.trim}")
        val root = rawPath.substring(1, rawPath.length - 1)
        val olderMs =
          if (toks.length == 2) 24L * 3600 * 1000
          else if (w(2) == "OLDER" && w(3) == "THAN" && w(4) == "HOURS"
              && toks.length == 5) {
            val n = sql.substring(toks(3).end, toks(4).start).trim
            val hours = try n.toLong catch {
              case _: NumberFormatException =>
                fail(s"OLDER THAN wants an integer hour count, got '$n'")
            }
            if (hours < 0) fail("OLDER THAN hours must be >= 0")
            hours * 3600 * 1000
          } else fail("expected GRAFT VACUUM '<root>' [OLDER THAN <n> " +
            s"HOURS], got: ${sql.trim}")
        Some(GraftVacuumCommand(root, olderMs))
      case other =>
        fail(s"unknown GRAFT command '$other' — supported: " +
          "GRAFT ANALYZE <table> KEY <col>, " +
          "GRAFT VACUUM '<root>' [OLDER THAN <n> HOURS]")
    }
  }
}
