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
  *   GRAFT STATS <table>
  *     → the stored `__kstats` row WITHOUT a rescan (key column, row
  *       count, size estimate, sketch bytes, last folded batch) —
  *       empty result when the table has none or they were
  *       invalidated; the cheap observability companion to ANALYZE.
  *   GRAFT COMPACT <store> [RETAIN <n>]
  *     → the store-appropriate compaction, with every parameter read
  *       from the catalog instead of re-asked: a merge-on-read store
  *       folds its tombstones in ([[graft.operators.BucketedStores
  *       .morCompact]] — topology from the serving view's
  *       `graft.mor.*` properties, bucket/sort spec from the current
  *       generation's own metadata); a plain versioned store rewrites
  *       its generation ([[graft.operators.BucketedStores
  *       .compactAtomic]], where RETAIN keeps <n> previous generations
  *       readable for time travel). Served content is unchanged by
  *       contract; returns (store, mode, new generation).
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

case class GraftStatsCommand(table: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("key_col", StringType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("sketch_bytes", LongType, nullable = false)(),
    AttributeReference("last_batch", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.operators.SketchStats.read(spark, table).toSeq.map(s =>
      Row(s.table, s.keyCol, s.nRows, s.sizeBytes, s.cms.length.toLong,
        s.lastBatch))
}

case class GraftCompactCommand(store: String, retain: Int)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("store", StringType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("generation", LongType, nullable = false)())

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_COMPACT] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.operators.BucketedStores
    if (scala.util.Try(
        BucketedStores.generations(spark, store)).isFailure)
      fail(s"$store is not a versioned store (no __v<k> generations)" +
        " — GRAFT COMPACT serves versioned and merge-on-read stores;" +
        " compact a plain bucketed table via BucketedStores.compact")
    val gen = BucketedStores.currentGeneration(spark, store)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(gen))
    val bs = meta.bucketSpec.getOrElse(
      fail(s"generation $gen carries no bucket spec — graft stores " +
        "are bucketed by construction; rebuild the store"))
    val sortCols =
      if (bs.sortColumnNames.nonEmpty) bs.sortColumnNames
      else bs.bucketColumnNames
    val isMor = scala.util.Try(
      BucketedStores.currentTombstones(spark, store)).isSuccess
    val mode =
      if (isMor) {
        if (retain > 0)
          fail("RETAIN applies to copy-on-write generation compaction" +
            " only — a merge-on-read compaction folds history in and" +
            " resets the sequence clock (pair MoR with the API's" +
            " retain knob on the copy-on-write path if builds must" +
            " stay reproducible)")
        val (idCols, tombIdCol) = BucketedStores
          .morTopology(spark, store)
          .getOrElse(fail(s"$store has tombstones but no graft.mor.*" +
            " topology properties on its serving view — re-run" +
            " morEnable"))
        BucketedStores.morCompact(spark, store, idCols, tombIdCol,
          bs.bucketColumnNames, sortCols, bs.numBuckets)
        "merge-on-read"
      } else {
        BucketedStores.compactAtomic(spark, store,
          bs.bucketColumnNames, sortCols, bs.numBuckets,
          retain = retain)
        "versioned"
      }
    val newGen = BucketedStores.generations(spark, store).max.toLong
    Seq(Row(store, mode, newGen))
  }
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
      case "STATS" =>
        // GRAFT STATS <table> — same qualified-name shape as ANALYZE
        val table = sql.substring(toks(1).end).trim
          .toLowerCase(Locale.ROOT)
        if (table.isEmpty || !table.matches("[a-z0-9_]+(\\.[a-z0-9_]+)?"))
          fail(s"expected GRAFT STATS <table>, got: ${sql.trim}")
        Some(GraftStatsCommand(table))
      case "COMPACT" =>
        // GRAFT COMPACT <store> [RETAIN <n>]
        if (w(2).isEmpty ||
            !(toks.length == 3 ||
              (toks.length == 4 && w(3) == "RETAIN")))
          fail("expected GRAFT COMPACT <store> [RETAIN <n>], got: " +
            sql.trim)
        val store = sql.substring(toks(2).start, toks(2).end)
          .toLowerCase(Locale.ROOT)
        val retain =
          if (toks.length == 3) 0
          else {
            val n = sql.substring(toks(3).end).trim
            val r = try n.toInt catch {
              case _: NumberFormatException =>
                fail(s"RETAIN wants an integer generation count, " +
                  s"got '$n'")
            }
            if (r < 0) fail("RETAIN must be >= 0")
            r
          }
        Some(GraftCompactCommand(store, retain))
      case other =>
        fail(s"unknown GRAFT command '$other' — supported: " +
          "GRAFT ANALYZE <table> KEY <col>, " +
          "GRAFT STATS <table>, " +
          "GRAFT VACUUM '<root>' [OLDER THAN <n> HOURS], " +
          "GRAFT COMPACT <store> [RETAIN <n>]")
    }
  }
}
