/** SQL surface for stored-index BM25 lexical retrieval.
  *
  * [[GraftAnnRewrite]]'s discipline applied to the lexical tier
  * ([[graft.operators.TextRetrievalOps.writeTextIndex]] — a
  * term-bucketed posting-list table + a doc-length companion + a
  * one-row meta table):
  *
  *   SELECT * FROM GRAFT_BM25('<index>', '<space separated terms>', <k>)
  *
  * expands AT PARSE TIME into the stock-grammar derived table that
  * scores textbook BM25 (k1 = 1.2, b = 0.75, the exact constant/
  * rounding/decimal-sum discipline of
  * [[graft.operators.TextRetrievalOps.bm25TopK]]) over the stored
  * postings. Output: `doc_id, score`, top-k by (score DESC, doc_id).
  *
  * The expansion's term predicate is an IN-list on the bucketed
  * `term` column, so the posting scan BUCKET-PRUNES to the query
  * terms' buckets — the corpus-scale side reads only matching
  * buckets, document frequencies fold out of the candidates, and the
  * length join is candidate-scale. Terms are a SET (the IN-list
  * dedups); a merge-on-read index serves through its tombstone view
  * unchanged.
  *
  * BATCH (table-driven) form, at parity with GRAFT_ANN's shape:
  *
  *   SELECT * FROM GRAFT_BM25('<index>', '<queries_table>', <k>)
  *
  * where the relation carries `(query_id, terms)` — terms a
  * space-separated string per query. Chosen when the second argument
  * names an existing relation with exactly those columns (documented
  * preference: the batch form wins over a same-named single term —
  * real term tokens and catalog names colliding is a naming bug, not
  * a dispatch ambiguity worth a second macro — the collision is
  * logged when it happens). Output:
  * `query_id, doc_id, score, rank` (rank 1..k per query by
  * (score DESC, doc_id)). A batch row whose terms string tokenizes
  * to NOTHING fails the statement loudly (naming the query_id) — the
  * same contract as the literal form's empty-terms error; a silently
  * absent query_id would be indistinguishable from "no matches".
  *
  * The batch expansion keeps the injection guard BY CONSTRUCTION:
  * terms are tokenized INSIDE the SQL (split + lateral explode of the
  * `terms` column — data flows through a join, never a spliced
  * literal), and the only spliced token is the relation name, held to
  * word characters. The candidate selection joins the postings on the
  * BUCKETED `term` column against the (query × terms)-scale exploded
  * side: the corpus-scale postings never shuffle (the tiny term set
  * broadcasts), document frequencies fold out of the candidates
  * (count distinct doc per term), and per-query top-k plans through
  * WindowGroupLimit. Batch scoring is the pipeline shape: one pass
  * over the postings serves every query in the batch.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSession}

object GraftBm25Rewrite extends org.apache.spark.internal.Logging {
  import AsOfSqlLexer._

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_BM25] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  private val ArgShape =
    """^\s*'([A-Za-z0-9_.]+)'\s*,\s*'([^']*)'\s*,\s*(\d+)\s*$""".r

  def apply(spark: SparkSession, sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("GRAFT_BM25"))
      return sql
    var cur = sql
    var guard = 0
    var changed = true
    while (changed) {
      require(guard < 64, "GRAFT_BM25 rewrite did not converge")
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
    var i = 0
    while (i + 1 < toks.length) {
      if (toks(i).word == "GRAFT_BM25" && toks(i + 1).word == "(") {
        val open = toks(i + 1)
        val closeIdx = toks.indexWhere(t =>
          t.word == ")" && t.depth == open.depth, i + 2)
        if (closeIdx < 0)
          fail("unbalanced parentheses in GRAFT_BM25(...)")
        val close = toks(closeIdx)
        val rawArgs = s.substring(open.end, close.start)
        val (index, termsRaw, k) = rawArgs match {
          case ArgShape(ix, ts, kk) =>
            (ix.toLowerCase(java.util.Locale.ROOT), ts, kk.toInt)
          case _ => fail("expected GRAFT_BM25('<index>', " +
            s"'<space separated terms>', <k>), got args: $rawArgs")
        }
        if (k < 1) fail(s"k must be >= 1, got $k")
        // batch dispatch: a single word-token naming a relation with
        // exactly (query_id, terms) columns is the table-driven form
        val trimmed = termsRaw.trim
        val batch = trimmed.matches("[A-Za-z0-9_.]+") && {
          val cols = scala.util.Try(spark.table(trimmed).columns
            .map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
            .getOrElse(Set.empty[String])
          cols.contains("query_id") && cols.contains("terms")
        }
        if (batch) {
          // dispatch-collision visibility: a single word token that
          // names a (query_id, terms) relation ALSO reads as a valid
          // one-term literal query — the batch form wins (documented
          // preference), but say so, in case the collision is a
          // naming accident rather than intent
          if (!trimmed.contains(".") && trimmed.matches("[A-Za-z0-9_]+"))
            logWarning(s"[GRAFT_BM25] '$trimmed' names a " +
              "(query_id, terms) relation AND reads as a single-term " +
              "literal query — dispatching to the BATCH form (the " +
              "documented preference). Rename the relation or quote " +
              "a multi-term string if you meant the literal form.")
          Seq(index, index + "_docs", index + "_meta")
            .find(!spark.catalog.tableExists(_)).foreach(missing =>
              fail(s"$index is not a stored text index — catalog " +
                s"table $missing is missing (write one with " +
                "TextRetrievalOps.writeTextIndex)"))
          // the literal form fails loudly on an empty terms string;
          // the batch form matches it — a row whose terms tokenize to
          // nothing would otherwise just VANISH from the output
          // (query_id absent), indistinguishable from "no matches".
          // The batch relation is query-scale by design, so the probe
          // is a bounded parse-time check, not a corpus scan.
          // `terms IS NULL` first: size(...) on a NULL terms string
          // evaluates to NULL, not true, so without the explicit
          // disjunct a NULL-terms row slips past the guard and
          // vanishes — exactly the silent case the guard exists for
          val emptyIds = spark.table(trimmed)
            .where("terms IS NULL OR " +
              "size(array_distinct(filter(split(trim(terms), " +
              "' +'), x -> x <> ''))) = 0")
            .select("query_id").limit(3).collect()
          if (emptyIds.nonEmpty)
            fail(s"batch relation $trimmed has row(s) whose terms " +
              "string is NULL or empty (query_id " +
              emptyIds.map(_.get(0)).mkString(", ") +
              ", first 3 shown) — the literal form fails loudly on " +
              "empty terms and the batch form matches it; filter " +
              "those rows out or fix the input")
          val sb = new StringBuilder(s)
          sb.replace(toks(i).start, close.end,
            batchExpansion(index, trimmed, k))
          return Some(sb.toString)
        }
        val terms = trimmed.split("\\s+").filter(_.nonEmpty)
          .distinct.toSeq
        if (terms.isEmpty) fail("the terms string is empty")
        // the terms splice into a SQL IN-list — keep them to word
        // characters so the splice can never escape its literal
        terms.find(!_.matches("[A-Za-z0-9_\\-.]+")).foreach(t =>
          fail(s"term '$t' — terms are word tokens " +
            "([A-Za-z0-9_-.]); the tokenizer never produces quotes"))
        Seq(index, index + "_docs", index + "_meta")
          .find(!spark.catalog.tableExists(_)).foreach(missing =>
            fail(s"$index is not a stored text index — catalog table " +
              s"$missing is missing (write one with " +
              "TextRetrievalOps.writeTextIndex)"))
        val sb = new StringBuilder(s)
        sb.replace(toks(i).start, close.end, expansion(index, terms, k))
        return Some(sb.toString)
      }
      i += 1
    }
    None
  }

  /** bm25TopK's exact arithmetic as stock SQL: same constants, same
    * operation order, 6 dp rounding, decimal-routed sum — the IN-list
    * candidate scan bucket-prunes the postings.
    */
  private def expansion(index: String, terms: Seq[String],
      k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""(WITH graft_bm25_meta AS (
       |  SELECT CAST(n_docs AS DOUBLE) AS nd,
       |         CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |           AS avgdl
       |  FROM ${index}_meta),
       |graft_bm25_cand AS (
       |  SELECT term, doc_id, tf FROM $index
       |  WHERE term IN ($inList)),
       |graft_bm25_dft AS (
       |  SELECT term, count(1) AS df FROM graft_bm25_cand GROUP BY term),
       |graft_bm25_sc AS (
       |  SELECT c.doc_id,
       |         round(ln((m.nd - CAST(d.df AS DOUBLE) + 0.5) /
       |                  (CAST(d.df AS DOUBLE) + 0.5) + 1.0) *
       |               (CAST(c.tf AS DOUBLE) * 2.2) /
       |               (CAST(c.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |                 (CAST(l.dl AS DOUBLE) / m.avgdl))), 6) AS s
       |  FROM graft_bm25_cand c
       |  JOIN graft_bm25_dft d ON c.term = d.term
       |  JOIN ${index}_docs l ON c.doc_id = l.doc_id
       |  CROSS JOIN graft_bm25_meta m)
       |SELECT doc_id,
       |       CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS score
       |FROM graft_bm25_sc GROUP BY doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $k)""".stripMargin
  }

  /** The batch form's expansion: same constants, operation order,
    * 6 dp rounding and decimal-routed sum as the single-query form —
    * but candidates come from ONE join of the postings against the
    * lateral-exploded (query_id, term) set (terms tokenized in SQL;
    * nothing from the data splices into the statement). The postings
    * side keys on the BUCKETED `term` column and the exploded side is
    * query-batch-scale, so the corpus never shuffles; df is
    * per-corpus-term (distinct docs over the term's candidates —
    * identical to the single form's count even when queries share a
    * term); top-k is a per-query window (WindowGroupLimit bounds it).
    */
  private def batchExpansion(index: String, queries: String,
      k: Int): String = {
    s"""(WITH graft_bm25_meta AS (
       |  SELECT CAST(n_docs AS DOUBLE) AS nd,
       |         CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |           AS avgdl
       |  FROM ${index}_meta),
       |graft_bm25_qt AS (
       |  SELECT query_id, qterm
       |  FROM $queries
       |  LATERAL VIEW explode(array_distinct(filter(
       |    split(trim(terms), ' +'), x -> x <> ''))) gq AS qterm),
       |graft_bm25_cand AS (
       |  SELECT q.query_id, p.term, p.doc_id, p.tf
       |  FROM $index p JOIN graft_bm25_qt q ON p.term = q.qterm),
       |graft_bm25_dft AS (
       |  SELECT term, count(DISTINCT doc_id) AS df
       |  FROM graft_bm25_cand GROUP BY term),
       |graft_bm25_sc AS (
       |  SELECT c.query_id, c.doc_id,
       |         round(ln((m.nd - CAST(d.df AS DOUBLE) + 0.5) /
       |                  (CAST(d.df AS DOUBLE) + 0.5) + 1.0) *
       |               (CAST(c.tf AS DOUBLE) * 2.2) /
       |               (CAST(c.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |                 (CAST(l.dl AS DOUBLE) / m.avgdl))), 6) AS s
       |  FROM graft_bm25_cand c
       |  JOIN graft_bm25_dft d ON c.term = d.term
       |  JOIN ${index}_docs l ON c.doc_id = l.doc_id
       |  CROSS JOIN graft_bm25_meta m),
       |graft_bm25_agg AS (
       |  SELECT query_id, doc_id,
       |         CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS score
       |  FROM graft_bm25_sc GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, score, rank FROM (
       |  SELECT query_id, doc_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, doc_id) AS rank
       |  FROM graft_bm25_agg)
       |WHERE rank <= $k)""".stripMargin
  }
}
