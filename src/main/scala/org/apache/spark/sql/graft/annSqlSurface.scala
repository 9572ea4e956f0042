/** SQL surface for stored-index ANN serving.
  *
  * The similarity tier's stored IVF indexes
  * ([[graft.operators.SimilarityOps.writeIvfIndex]] — cid-bucketed
  * inverted lists + a k-row centroid companion) were API-only while
  * as-of joins, time travel, and the maintenance verbs all gained SQL
  * spellings. This closes the asymmetry with a table-valued macro in
  * the same delegating-parser discipline:
  *
  *   SELECT * FROM GRAFT_ANN('<index>', '<queries_table>', <k>, <nprobe>)
  *
  * expands AT PARSE TIME into the stock-grammar derived table that
  * probes the stored index — semantically identical to
  * [[graft.operators.SimilarityOps.probeIvfIndex]] (same rounded-
  * cosine probe selection `(cos DESC, cid)`, same candidate scoring,
  * same `(score DESC, id)` tie-break), generalized to top-k. Output
  * columns: `id_a, ann_id, score, rank` (rank 1..k per query).
  *
  * The expansion is pure SQL over the engine's registered kernels
  * (`array_dot`, `array_norm` — native codegen'd expressions), so the
  * plan is exactly the API plan class: the corpus-scale inverted lists
  * come off the bucket-aligned scan, only the (query × nprobe)-scale
  * side shuffles, and the k-row centroid companion joins broadcast.
  * No driver collect at all — the SQL form trades probeIvfIndex's
  * centroid literal for a broadcast join, which is the same bytes.
  *
  * Contract (documented, loudly enforced): the queries relation
  * exposes `vec_id` and `embedding` (the engine's embedding-table
  * shape); the index store and its `_centroids` companion must exist
  * in the catalog at parse time. A merge-on-read index store works
  * unchanged — `<index>` resolves to its serving view, so tombstoned
  * vectors are already subtracted.
  *
  * Reference parity note: the reference pipeline
  * (CI-CMG/wod-ascii-to-parquet-spark) has no similarity tier; the
  * table-valued-function shape follows the public warehouse dialects
  * (DuckDB/BigQuery TVFs, pgvector's SQL serving).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSession}

object GraftAnnRewrite {
  import AsOfSqlLexer._

  private def fail(msg: String): Nothing =
    throw new AnalysisException(s"[GRAFT_ANN] $msg", None, None,
      None, None, Map.empty[String, String], Array.empty)

  private val ArgShape =
    ("""^\s*'([A-Za-z0-9_.]+)'\s*,\s*'([A-Za-z0-9_.]+)'\s*,""" +
      """\s*(\d+)\s*,\s*(\d+)\s*$""").r

  def apply(spark: SparkSession, sql: String): String = {
    // cheap pre-screen: the macro name must appear at all
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("GRAFT_ANN"))
      return sql
    var cur = sql
    var guard = 0
    var changed = true
    while (changed) {
      require(guard < 64, "GRAFT_ANN rewrite did not converge")
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
      if (toks(i).word == "GRAFT_ANN" && toks(i + 1).word == "(") {
        val open = toks(i + 1)
        // the matching close paren: first ")" back at the open's depth
        val closeIdx = toks.indexWhere(t =>
          t.word == ")" && t.depth == open.depth, i + 2)
        if (closeIdx < 0)
          fail("unbalanced parentheses in GRAFT_ANN(...)")
        val close = toks(closeIdx)
        val rawArgs = s.substring(open.end, close.start)
        val (store, queries, k, nprobe) = rawArgs match {
          case ArgShape(st, q, kk, np) =>
            (st.toLowerCase(java.util.Locale.ROOT),
              q.toLowerCase(java.util.Locale.ROOT), kk.toInt, np.toInt)
          case _ => fail("expected GRAFT_ANN('<index_store>', " +
            s"'<queries_table>', <k>, <nprobe>), got args: $rawArgs")
        }
        if (k < 1) fail(s"k must be >= 1, got $k")
        if (nprobe < 1) fail(s"nprobe must be >= 1, got $nprobe")
        if (!spark.catalog.tableExists(store) ||
            !spark.catalog.tableExists(store + "_centroids"))
          fail(s"$store is not a stored IVF index — expected catalog " +
            s"tables $store (inverted lists) and ${store}_centroids " +
            "(write one with SimilarityOps.writeIvfIndex)")
        val sb = new StringBuilder(s)
        sb.replace(toks(i).start, close.end,
          expansion(store, queries, k, nprobe))
        return Some(sb.toString)
      }
      i += 1
    }
    None
  }

  /** The stock-grammar probe: CTE names are macro-prefixed and scoped
    * to the derived table, so two GRAFT_ANN calls in one statement
    * can't collide.
    */
  private def expansion(store: String, queries: String, k: Int,
      nprobe: Int): String =
    s"""(WITH graft_ann_q AS (
       |  SELECT vec_id AS id_a,
       |         transform(embedding, gx -> CAST(gx AS DOUBLE)) AS ea
       |  FROM $queries),
       |graft_ann_qn AS (
       |  SELECT id_a, ea, array_norm(ea) AS na FROM graft_ann_q),
       |graft_ann_probe AS (
       |  SELECT id_a, ea, na, cid FROM (
       |    SELECT q.id_a, q.ea, q.na, c.cid,
       |           ROW_NUMBER() OVER (PARTITION BY q.id_a
       |             ORDER BY round(array_dot(q.ea, c.ce)
       |               / (q.na * array_norm(c.ce)), 6) DESC, c.cid
       |           ) AS grn
       |    FROM graft_ann_qn q CROSS JOIN ${store}_centroids c)
       |  WHERE grn <= $nprobe),
       |graft_ann_cand AS (
       |  SELECT p.id_a, i.vid AS ann_id,
       |         round(array_dot(p.ea, i.e) / (p.na * i.nrm), 6) AS score
       |  FROM graft_ann_probe p JOIN $store i
       |    ON i.cid = p.cid AND i.vid <> p.id_a)
       |SELECT id_a, ann_id, score, rank FROM (
       |  SELECT id_a, ann_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY id_a
       |           ORDER BY score DESC, ann_id) AS rank
       |  FROM graft_ann_cand)
       |WHERE rank <= $k)""".stripMargin
}
