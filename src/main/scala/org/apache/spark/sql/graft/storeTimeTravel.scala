/** SQL time travel over graft versioned stores.
  *
  * [[graft.operators.BucketedStores]] retains store generations as
  * immutable physical tables (`name__v<k>`) behind a serving view —
  * readable through `readGeneration`, but until now API-only. Every
  * lakehouse exposes the same capability as SQL text
  * (`VERSION AS OF` / `TIMESTAMP AS OF`: Delta, Iceberg, BigQuery),
  * and Spark 4's STOCK grammar already parses both clauses — but its
  * analyzer hard-rejects them for session-catalog (v1) tables
  * (`UNSUPPORTED_FEATURE.TIME_TRAVEL` thrown by the built-in
  * ResolveRelations, BEFORE any injected resolution rule can run; an
  * analyzer-rule implementation was tried and is unreachable by
  * construction). So this surface follows the asofSqlSurface
  * discipline instead: the DELEGATING parser resolves the clause at
  * parse time against the catalog —
  *
  *   SELECT ... FROM store VERSION AS OF 3
  *     → the retained generation table `store__v3`; an
  *       AnalysisException listing the live generations if 3 was
  *       retired (maintenance ran with a smaller `retain` than the
  *       lookback).
  *   SELECT ... FROM store TIMESTAMP AS OF '2026-08-15 12:00:00'
  *     → the NEWEST generation whose catalog creation time is at or
  *       before the cutoff — i.e. the generation a reader resolving
  *       the serving view at that wall-clock instant would have seen.
  *
  * Stand-down discipline: the rewrite fires ONLY when the preceding
  * identifier is a graft versioned store (the catalog has
  * `name__v<k>` generations) — `AS OF` over DSv2 catalogs that
  * support native time travel, or over plain tables (Spark's own
  * error), passes through untouched. Merge-on-read stores version by
  * SEQUENCE within a compaction era, not by generation — a raw
  * generation read would silently include tombstoned rows — so on a
  * MoR store `VERSION AS OF s` expands instead to the seq-consistent
  * derived table (`readMorAsOfSeq`'s semantics, topology read from
  * the serving view's `graft.mor.*` properties), and `TIMESTAMP
  * AS OF` fails with guidance (tombstones carry sequence, not
  * wall-clock).
  *
  * Reference parity note: the reference pipeline
  * (CI-CMG/wod-ascii-to-parquet-spark) has no store tier or SQL
  * surface; semantics here follow the public lakehouse dialect.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types.TimestampType

object StoreTimeTravelRewrite {
  import AsOfSqlLexer._

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_TIME_TRAVEL] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  /** Clause-head keywords of the stock temporal clause. */
  private val VersionWords = Set("VERSION", "SYSTEM_VERSION")
  private val TimestampWords = Set("TIMESTAMP", "SYSTEM_TIME")

  /** Words that can never be the relation identifier preceding a
    * temporal clause (clause keywords, join words, punctuation-ish).
    */
  private val NonIdent = Set("SELECT", "FROM", "JOIN", "ON", "WHERE",
    "AS", "OF", "FOR", "AND", "OR", "UNION", "ALL", "BY", "GROUP",
    "ORDER", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "LATERAL",
    "USING", "(", ")")

  def apply(spark: SparkSession, sql: String): String = {
    // cheap pre-screen: both clauses contain the two words AS OF
    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    if (!upper.contains("AS") || !upper.contains("OF")) return sql
    var cur = sql
    var guard = 0
    var changed = true
    while (changed) {
      require(guard < 64, "time-travel rewrite did not converge")
      guard += 1
      rewriteFirst(spark, cur) match {
        case Some(next) => cur = next
        case None => changed = false
      }
    }
    cur
  }

  private def rewriteFirst(spark: SparkSession,
      s: String): Option[String] = {
    val toks = AsOfSqlLexer.lex(s)
    var i = 1
    while (i + 2 < toks.length) {
      val w = toks(i).word
      val isVer = VersionWords.contains(w)
      val isTs = TimestampWords.contains(w)
      if ((isVer || isTs) && toks(i + 1).word == "AS" &&
          toks(i + 2).word == "OF") {
        // the relation identifier: the word before the clause,
        // skipping the grammar's optional FOR
        val identIdx = if (toks(i - 1).word == "FOR" && i >= 2) i - 2
          else i - 1
        val identTok = toks(identIdx)
        if (identIdx >= 0 && !NonIdent.contains(identTok.word) &&
            identTok.depth == toks(i).depth) {
          // the session catalog lowercases identifiers at creation, so
          // match the store case-insensitively the way resolution would
          val name = s.substring(identTok.start, identTok.end)
            .toLowerCase(java.util.Locale.ROOT)
          // an explicit `db.store` qualifier: the lexer skips the dot,
          // so the qualifier is the immediately-adjacent previous word
          // (dot between them in the raw text). Unqualified stores
          // resolve against the session's CURRENT database, exactly as
          // table resolution would.
          val qualTok: Option[Tok] =
            if (identTok.start > 0 && s.charAt(identTok.start - 1) == '.'
                && identIdx > 0 &&
                toks(identIdx - 1).end == identTok.start - 1 &&
                !NonIdent.contains(toks(identIdx - 1).word))
              Some(toks(identIdx - 1))
            else None
          val db = qualTok.map(t => s.substring(t.start, t.end)
            .toLowerCase(java.util.Locale.ROOT))
            .getOrElse(spark.sessionState.catalog.getCurrentDatabase)
          val gens = liveGenerations(spark, db, name)
          if (gens.nonEmpty) {
            // the value: raw text from OF to the next token (the
            // lexer skips literals, so a quoted value sits wholly in
            // the gap); constant literal values only. The splice ends
            // at the literal's LAST non-space char so a following
            // alias keeps its separating whitespace.
            val valueEnd =
              if (i + 3 < toks.length) toks(i + 3).start else s.length
            val seg = s.substring(toks(i + 2).end, valueEnd)
            val trail = seg.lastIndexWhere(!_.isWhitespace)
            if (trail < 0)
              fail(s"$w AS OF on graft store $name needs a constant " +
                "literal value (an expression with identifiers is " +
                "not supported on the store surface)")
            val raw = seg.trim
            val isMor = tombstonesExist(spark, db, name)
            val target =
              if (isMor) morAsOf(spark, db, name, isVer, raw)
              else if (isVer) byVersion(spark, db, name, gens,
                stripQuotes(raw))
              else byTimestamp(spark, db, name, gens, raw)
            // a MoR expansion is a derived table `(SELECT …) name` — a
            // leading `db.` prefix in the original text must splice
            // away with it; a plain generation splice keeps the
            // qualifier (`db.store__v3` resolves in db as intended)
            val spliceStart =
              if (isMor) qualTok.map(_.start).getOrElse(identTok.start)
              else identTok.start
            val sb = new StringBuilder(s)
            sb.replace(spliceStart, toks(i + 2).end + trail + 1,
              target)
            return Some(sb.toString)
          }
        }
      }
      i += 1
    }
    None
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 && (v.head == '\'' || v.head == '"') &&
        v.last == v.head)
      v.substring(1, v.length - 1)
    else v

  /** graft store generations are `name__v<k>` physical tables in the
    * store's own database (the identifier's qualifier, or the
    * session's current database when unqualified).
    */
  private def liveGenerations(spark: SparkSession, db: String,
      name: String): Seq[Int] = {
    if (name.isEmpty || !name.forall(c => c.isLetterOrDigit || c == '_'))
      return Seq.empty
    if (!spark.sessionState.catalog.databaseExists(db)) return Seq.empty
    val p = name + "__v"
    spark.sessionState.catalog.listTables(db, p + "*")
      .map(_.table)
      .filter(t => t.startsWith(p) && t.stripPrefix(p).nonEmpty &&
        t.stripPrefix(p).forall(_.isDigit))
      .map(_.stripPrefix(p).toInt).sorted
  }

  private def tombstonesExist(spark: SparkSession, db: String,
      name: String): Boolean =
    spark.sessionState.catalog.listTables(db, name + "__t*")
      .exists(_.table.matches(
        java.util.regex.Pattern.quote(name) + "__t\\d+"))

  /** A MERGE-ON-READ store versions by SEQUENCE within its compaction
    * era: `VERSION AS OF s` expands to the seq-consistent derived
    * table — generation rows stamped `_seq <= s`, minus rows a
    * tombstone with `t.seq <= s` kills under the strictly-greater
    * rule (exactly `BucketedStores.readMorAsOfSeq`, whose anti-join
    * topology the serving view records as `graft.mor.*` properties).
    * Aliased to the store name so qualified column refs keep working.
    * `TIMESTAMP AS OF` has no MoR meaning (tombstones carry sequence,
    * not wall-clock) and fails with guidance.
    */
  private def morAsOf(spark: SparkSession, db: String, name: String,
      isVer: Boolean, raw: String): String = {
    if (!isVer)
      fail(s"$name is a merge-on-read store — its history is " +
        "sequence-within-era, so TIMESTAMP AS OF has no meaning " +
        "here; use VERSION AS OF <seq> (0 = the as-built state)")
    val seq = try stripQuotes(raw).trim.toLong catch {
      case _: NumberFormatException =>
        fail(s"VERSION AS OF $raw on merge-on-read store $name — " +
          "the version is the integer batch sequence (0 = as-built)")
    }
    val props = scala.util.Try(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(name, Some(db))).properties)
      .getOrElse(Map.empty[String, String])
    val (idCols, tombIdCol) = (for {
      ids <- props.get("graft.mor.idCols")
      tid <- props.get("graft.mor.tombIdCol")
    } yield (ids.split(',').toSeq, tid))
      .getOrElse(fail(s"$name is a merge-on-read store but its " +
        "serving view carries no graft.mor.* topology properties — " +
        "re-run morEnable (or read via BucketedStores.readMorAsOfSeq)"))
    val cat = spark.sessionState.catalog
    def newest(suffix: String): String = {
      val p = name + "__" + suffix
      val vs = cat.listTables(db, p + "*").map(_.table)
        .filter(t => t.startsWith(p) && t.stripPrefix(p).nonEmpty &&
          t.stripPrefix(p).forall(_.isDigit))
      require(vs.nonEmpty, s"$db.$name has no __$suffix tables")
      db + "." + vs.maxBy(_.stripPrefix(p).toInt)
    }
    val gen = newest("v")
    val tomb = newest("t")
    val clauses = idCols.map(c =>
      s"NOT EXISTS (SELECT 1 FROM $tomb t WHERE t.$tombIdCol = g.$c " +
        s"AND t.seq <= $seq AND g._seq < t.seq)")
    s"(SELECT g.* FROM $gen g WHERE g._seq <= $seq AND " +
      s"${clauses.mkString(" AND ")}) $name"
  }

  private def byVersion(spark: SparkSession, db: String, name: String,
      gens: Seq[Int], v: String): String = {
    val k = try v.trim.toInt catch {
      case _: NumberFormatException =>
        fail(s"VERSION AS OF $v on graft store $name — generations " +
          s"are integers (live: ${gens.mkString(", ")})")
    }
    if (!gens.contains(k))
      fail(s"generation $k of $name is not retained — it was retired " +
        "by maintenance with a smaller retention window (live " +
        s"generations: ${gens.mkString(", ")}; raise `retain` on " +
        "maintenance ops to keep a longer lookback)")
    s"${name}__v$k"
  }

  /** Newest generation created at or before the cutoff: catalog
    * creation time is the instant the generation's swap made it
    * resolvable, so this is what a reader of the serving view saw at
    * `t`. Ties (same millisecond) break to the higher generation, the
    * one the view served after the swap.
    */
  private def byTimestamp(spark: SparkSession, db: String, name: String,
      gens: Seq[Int], raw: String): String = {
    val micros = Cast(Literal(stripQuotes(raw)), TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval() match {
      case l: java.lang.Long => l.longValue()
      case _ => fail(s"TIMESTAMP AS OF $raw on $name did not evaluate " +
        "to a timestamp — use a constant timestamp-formatted string")
    }
    val cutoffMs = Math.floorDiv(micros, 1000L)
    val cat = spark.sessionState.catalog
    val atOrBefore = gens.filter { k =>
      cat.getTableMetadata(TableIdentifier(s"${name}__v$k", Some(db)))
        .createTime <= cutoffMs
    }
    if (atOrBefore.isEmpty)
      fail(s"no generation of $name existed at or before $raw — " +
        s"oldest live generation is ${gens.head} (earlier history " +
        "was retired; raise `retain` to keep it)")
    s"${name}__v${atOrBefore.max}"
  }
}
