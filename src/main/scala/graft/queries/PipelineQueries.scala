package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.GraftPipeline
import Q._
import Tables._

/** The [[graft.operators.GraftPipeline]] builder under the oracle: two
  * full-chain configurations, each hash-checked against a DuckDB
  * recompute of the ENTIRE composition (quality → decontaminate/dedup
  * → shard → pack). tx36 proved the inline composition once; these
  * prove the reusable API computes the same thing under different
  * configs — including the stages tx36 doesn't exercise
  * (decontamination, near-dedup).
  */
object PipelineQueries {

  /** pl1: quality(≥100 chars) → EXACT DECONTAMINATION against a
    * deterministic "benchmark" slice (doc_id % 11 == 5 — any corpus
    * doc sharing a contaminated content hash is dropped, including
    * the slice itself) → exact dedup → 4-shard packing at 512. The
    * oracle recomputes every stage; contamination REALLY bites (the
    * eval slice's own members must vanish from the packed output).
    */
  val pl1PipelineDecon = Q(
    "pl1_pipeline_decontaminated",
    (s, d) => {
      val docs = documents(s, d)
      GraftPipeline.run(docs, "doc_id", "text",
          GraftPipeline.Config(minChars = 100, exactDedup = true),
          evalDocs = Some(docs.filter(col("doc_id") % 11 === 5)))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some("""
      WITH q AS (
        SELECT doc_id, text, md5(text) AS h
        FROM documents WHERE n_chars >= 100),
      ev AS (SELECT DISTINCT md5(text) AS eh
             FROM documents WHERE doc_id % 11 = 5),
      dq AS (SELECT * FROM q WHERE h NOT IN (SELECT eh FROM ev)),
      k AS (SELECT h, MIN(doc_id) AS doc_id FROM dq GROUP BY h),
      kept AS (
        SELECT dq.doc_id, dq.text FROM dq
        WHERE EXISTS (SELECT 1 FROM k WHERE k.doc_id = dq.doc_id)),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""),
    bench = true)

  /** pl2: quality(≥100 chars) → NEAR dedup (banded minhash, jaccard ≥
    * 0.2, connected components, min-id canonical — subsumes exact
    * dedup) → 4-shard packing at 512. The oracle recomputes the LSH
    * pipeline, the RECURSIVE component closure, the keep rule, and the
    * packing arithmetic in one statement.
    */
  val pl2PipelineNearDedup = Q(
    "pl2_pipeline_near_dedup",
    (s, d) =>
      GraftPipeline.run(spread(documents(s, d)), "doc_id", "text",
          GraftPipeline.Config(minChars = 100, nearDedup = true))
        .orderBy(col("shard"), col("pos")),
    sql = Some(s"""
      WITH RECURSIVE
      base AS (
        SELECT doc_id, text FROM documents WHERE n_chars >= 100),
      docs AS (
        SELECT doc_id, ${DedupQueries.shingleSql} AS sh
        FROM (SELECT doc_id,
                regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM base) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${DedupQueries.hash60Sql
                     .format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                AS DOUBLE) /
              (len(a.sh) + len(b.sh)
                - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
              6) >= 0.2),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id
             FROM reach GROUP BY id),
      kept AS (
        SELECT b.doc_id, b.text
        FROM base b LEFT JOIN cl ON b.doc_id = cl.doc_id
        WHERE COALESCE(cl.cluster_id, b.doc_id) = b.doc_id),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""))

  /** pl3: the INCREMENTAL nightly pipeline run. The expensive stage of
    * a nightly re-run at 100 TB is re-hashing the corpus for the dedup
    * decision; pl3 stores that decision's inputs once — every
    * (doc_id, content hash) pair in a versioned hash-bucketed index —
    * then flows dd20's changelog (hard deletes: doc_id % 7 == 3;
    * upserts: surviving doc_id % 5 == 0 with " upd" appended) through
    * [[graft.operators.BucketedStores.applyDeltaAtomic]] (only the
    * DELTA texts are hashed; one view-flip swap) and derives the keep
    * list FROM THE INDEX ALONE — GraftPipelineSpec gates that the
    * keep-list plan contains no corpus scan. The packed output is
    * oracle-checked against a full DuckDB rebuild over the
    * post-changelog corpus, so the row is a cross-engine
    * REBUILD-EQUIVALENCE proof for the whole composed pipeline, with
    * quality gating on CURRENT text length (an upsert can cross the
    * quality boundary; both engines must agree on the new length).
    */
  val pl3PipelineIncremental = Q(
    "pl3_pipeline_incremental",
    (s, d) => {
      val t = s"pl3_exidx_${Integer.toHexString(d.hashCode)}"
      val base = documents(s, d)
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildExactIndex(base, "doc_id", "text", t)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyExactIndexDelta(s, t, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text")
      val newCorpus = documents(s, d)
        .filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" upd")))
            .otherwise(col("text")).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      GraftPipeline.runIncremental(s, t, newCorpus, "doc_id", "text",
          GraftPipeline.Config(minChars = 100, exactDedup = true))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some(exactIncrementalOracleSql))

  /** The full exact-dedup rebuild over the post-changelog corpus —
    * shared by pl3 (copy-on-write maintenance), pl6 (merge-on-read
    * maintenance + compaction) and st22 (streamed merge-on-read
    * maintenance): all must land on this same answer.
    */
  private[queries] def exactIncrementalOracleSql: String = """
      WITH newdocs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' upd' ELSE text END
                 AS text
        FROM documents WHERE doc_id % 7 <> 3),
      q AS (
        SELECT doc_id, text, md5(text) AS h
        FROM newdocs WHERE len(text) >= 100),
      k AS (SELECT h, MIN(doc_id) AS doc_id FROM q GROUP BY h),
      kept AS (
        SELECT q.doc_id, q.text FROM q
        WHERE EXISTS (SELECT 1 FROM k WHERE k.doc_id = q.doc_id)),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""

  /** pl4: the incremental nightly run, NEAR-dedup form. Two stores
    * stand between runs — the LSH band index AND the verified-pair
    * set. dd20's changelog costs only delta-scale work: the delta is
    * banded and probed against the post-delta index (the corpus is
    * never re-banded), every pair touching a changed doc dies with its
    * endpoint ([[graft.operators.BucketedStores.applyEdgeDeltaAtomic]]),
    * the probe's surviving pairs are added, and the keep list is
    * connected components over the PAIR STORE alone. The oracle
    * rebuilds the whole near-dedup pipeline (LSH, recursive component
    * closure, canonical-min keep, packing) from the post-changelog
    * corpus in DuckDB — cross-engine rebuild-equivalence for the
    * hardest maintenance path this engine has.
    */
  val pl4PipelineIncrementalNear = Q(
    "pl4_pipeline_incremental_near",
    (s, d) => {
      val hex = Integer.toHexString(d.hashCode)
      val (lsh, pairs) = (s"pl4_lsh_$hex", s"pl4_pairs_$hex")
      val cfg = GraftPipeline.Config(minChars = 100, nearDedup = true)
      val baseQ = spread(documents(s, d))
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildNearIndexes(baseQ, "doc_id", "text", lsh, pairs,
        cfg)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyNearIndexDelta(s, lsh, pairs, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text", cfg)
      val newCorpus = documents(s, d)
        .filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" upd")))
            .otherwise(col("text")).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      GraftPipeline.runIncrementalNear(s, pairs, newCorpus, "doc_id",
          "text", cfg)
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some(nearIncrementalOracleSql))

  /** The full near-dedup rebuild over the post-changelog corpus —
    * shared by pl4 (copy-on-write maintenance), pl5 (merge-on-read
    * maintenance) and st23 (streamed merge-on-read maintenance): all
    * must land on this same answer.
    */
  private[queries] def nearIncrementalOracleSql: String = s"""
      WITH RECURSIVE
      nd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' upd' ELSE text END
                 AS text
        FROM documents WHERE doc_id % 7 <> 3),
      base AS (
        SELECT doc_id, text FROM nd WHERE len(text) >= 100),
      docs AS (
        SELECT doc_id, ${DedupQueries.shingleSql} AS sh
        FROM (SELECT doc_id,
                regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM base) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${DedupQueries.hash60Sql
                     .format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                AS DOUBLE) /
              (len(a.sh) + len(b.sh)
                - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
              6) >= 0.2),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id
             FROM reach GROUP BY id),
      kept AS (
        SELECT b.doc_id, b.text
        FROM base b LEFT JOIN cl ON b.doc_id = cl.doc_id
        WHERE COALESCE(cl.cluster_id, b.doc_id) = b.doc_id),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""

  /** pl5: pl4's nightly run under MERGE-ON-READ maintenance. Measuring
    * pl4's copy-on-write delta on the scale-stress corpora
    * (BENCH_INCR.json) showed the generation rewrite costs 1.2–1.5×
    * the full rebuild at 100× — so the stores here stay append-only
    * between compactions: the changelog appends (id, seq) tombstones
    * and `_seq`-stamped delta rows, the serving views subtract
    * tombstones with the strictly-greater-seq rule (an upsert's
    * replacement rows survive their own tombstone), and the probe runs
    * against the live view. Same oracle as pl4 — the two maintenance
    * disciplines must land on the identical packed output.
    */
  val pl5PipelineIncrementalMor = Q(
    "pl5_pipeline_incremental_mor",
    (s, d) => {
      val hex = Integer.toHexString(d.hashCode)
      val (lsh, pairs) = (s"pl5_lsh_$hex", s"pl5_pairs_$hex")
      val cfg = GraftPipeline.Config(minChars = 100, nearDedup = true)
      val baseQ = spread(documents(s, d))
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildNearIndexesMor(baseQ, "doc_id", "text", lsh,
        pairs, cfg)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyNearIndexDeltaMor(s, lsh, pairs, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text", cfg)
      val newCorpus = documents(s, d)
        .filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" upd")))
            .otherwise(col("text")).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      GraftPipeline.runIncrementalNear(s, pairs, newCorpus, "doc_id",
          "text", cfg)
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some(nearIncrementalOracleSql))

  /** pl6: pl3's nightly run under MERGE-ON-READ maintenance WITH a
    * mid-stream compaction. The exact-dedup index stays append-only
    * through the changelog (tombstones + `_seq`-stamped delta rows,
    * [[GraftPipeline.applyExactIndexDeltaMor]]), then
    * [[GraftPipeline.morCompactExactIndex]] folds the tombstones into
    * a fresh one-file-per-bucket generation BEFORE the keep list is
    * derived — so this row proves, cross-engine, that compaction is
    * observation-invisible: the packed output still equals pl3's
    * DuckDB rebuild over the post-changelog corpus.
    */
  val pl6PipelineIncrementalMorExact = Q(
    "pl6_pipeline_incremental_mor_exact",
    (s, d) => {
      val t = s"pl6_exidx_${Integer.toHexString(d.hashCode)}"
      val base = documents(s, d)
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildExactIndexMor(base, "doc_id", "text", t)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyExactIndexDeltaMor(s, t, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text")
      GraftPipeline.morCompactExactIndex(s, t, "doc_id")
      val newCorpus = documents(s, d)
        .filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" upd")))
            .otherwise(col("text")).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      GraftPipeline.runIncremental(s, t, newCorpus, "doc_id", "text",
          GraftPipeline.Config(minChars = 100, exactDedup = true))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some(exactIncrementalOracleSql))

  /** pl7: the PROVENANCE audit of pl1's exact run — one row per INPUT
    * document stating its fate (`kept` / `quality` / `contaminated` /
    * `duplicate`), the canonical id its content resolved to, and the
    * packed (shard, pos) for kept rows. A curation run ships this next
    * to the dataset: every exclusion is attributable and re-derivable.
    * The oracle recomputes all four dispositions and the packing
    * coordinates; the row count equals the full input corpus by
    * construction, so silent drops are structurally impossible.
    */
  val pl7PipelineProvenance = Q(
    "pl7_pipeline_provenance",
    (s, d) => {
      val docs = documents(s, d)
      GraftPipeline.runWithProvenance(docs, "doc_id", "text",
          GraftPipeline.Config(minChars = 100, exactDedup = true),
          evalDocs = Some(docs.filter(col("doc_id") % 11 === 5)))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      WITH d AS (
        SELECT doc_id, text, n_chars, md5(text) AS h FROM documents),
      ev AS (SELECT DISTINCT md5(text) AS eh
             FROM documents WHERE doc_id % 11 = 5),
      m AS (
        SELECT d.doc_id, d.text, d.h,
               (d.n_chars >= 100) AS qual,
               (ev.eh IS NOT NULL) AS cont
        FROM d LEFT JOIN ev ON d.h = ev.eh),
      k AS (
        SELECT h, MIN(doc_id) AS keep_id FROM m
        WHERE qual AND NOT cont GROUP BY h),
      disp AS (
        SELECT m.doc_id,
               CASE WHEN NOT m.qual THEN 'quality'
                    WHEN m.cont THEN 'contaminated'
                    WHEN m.doc_id = k.keep_id THEN 'kept'
                    ELSE 'duplicate' END AS disposition,
               CASE WHEN m.qual AND NOT m.cont THEN k.keep_id END
                 AS keep_id
        FROM m LEFT JOIN k ON m.h = k.h),
      kept AS (
        SELECT m.doc_id, m.text FROM m
        WHERE EXISTS (SELECT 1 FROM k WHERE k.keep_id = m.doc_id)),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p % 4 AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT disp.doc_id, disp.disposition, disp.keep_id,
             o.shard, o.pos
      FROM disp LEFT JOIN o ON disp.doc_id = o.doc_id
      ORDER BY disp.doc_id"""))

  /** pl8: pl7's audit trail for the NEAR-dedup chain — a dropped doc's
    * `keep_id` is its LSH CLUSTER's canonical (the doc it was judged a
    * near-duplicate of, diffable by an auditor), disposition
    * `near_duplicate`. The oracle recomputes the banded-minhash
    * pipeline, the recursive component closure, all dispositions, and
    * the packing coordinates; full-input row count by construction.
    */
  val pl8PipelineProvenanceNear = Q(
    "pl8_pipeline_provenance_near",
    (s, d) =>
      GraftPipeline.runWithProvenanceNear(spread(documents(s, d)),
          "doc_id", "text",
          GraftPipeline.Config(minChars = 100, nearDedup = true))
        .orderBy(col("doc_id")),
    sql = Some(s"""
      WITH RECURSIVE
      m AS (
        SELECT doc_id, text, (n_chars >= 100) AS qual FROM documents),
      base AS (SELECT doc_id, text FROM m WHERE qual),
      docs AS (
        SELECT doc_id, ${DedupQueries.shingleSql} AS sh
        FROM (SELECT doc_id,
                regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM base) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${DedupQueries.hash60Sql
                     .format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                AS DOUBLE) /
              (len(a.sh) + len(b.sh)
                - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
              6) >= 0.2),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id
             FROM reach GROUP BY id),
      disp AS (
        SELECT m.doc_id,
               CASE WHEN NOT m.qual THEN 'quality'
                    WHEN m.doc_id = COALESCE(cl.cluster_id, m.doc_id)
                      THEN 'kept'
                    ELSE 'near_duplicate' END AS disposition,
               CASE WHEN m.qual
                 THEN COALESCE(cl.cluster_id, m.doc_id) END AS keep_id
        FROM m LEFT JOIN cl ON m.doc_id = cl.doc_id),
      kept AS (
        SELECT b.doc_id, b.text
        FROM base b LEFT JOIN cl ON b.doc_id = cl.doc_id
        WHERE COALESCE(cl.cluster_id, b.doc_id) = b.doc_id),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p % 4 AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT disp.doc_id, disp.disposition, disp.keep_id,
             o.shard, o.pos
      FROM disp LEFT JOIN o ON disp.doc_id = o.doc_id
      ORDER BY disp.doc_id"""))

  /** pl9: REPRODUCIBILITY through time travel. The nightly changelog
    * runs with `retain = 1`, then yesterday's training set is rebuilt
    * from the RETAINED index snapshot + yesterday's corpus — packed
    * output byte-equal to a from-scratch DuckDB rebuild over the
    * pre-changelog corpus, even though the live view already serves
    * the post-changelog state. This is the audit/repro property a
    * curation platform must have: any past build re-derivable as long
    * as its snapshot is within the retention window (the live-path
    * equivalence is pl3's row; this is the AS-OF half).
    */
  val pl9PipelineTimeTravel = Q(
    "pl9_pipeline_time_travel",
    (s, d) => {
      val t = s"pl9_exidx_${Integer.toHexString(d.hashCode)}"
      val base = documents(s, d)
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildExactIndex(base, "doc_id", "text", t)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyExactIndexDelta(s, t, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text", retain = 1)
      // the index now serves the post-changelog state; rebuild
      // YESTERDAY's set from the retained snapshot (generation 1)
      GraftPipeline.pack(
        base.join(GraftPipeline.keepListFromSnapshot(s, t, 1, "doc_id"),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some("""
      WITH q AS (
        SELECT doc_id, text, md5(text) AS h
        FROM documents WHERE len(text) >= 100),
      k AS (SELECT h, MIN(doc_id) AS doc_id FROM q GROUP BY h),
      kept AS (
        SELECT q.doc_id, q.text FROM q
        WHERE EXISTS (SELECT 1 FROM k WHERE k.doc_id = q.doc_id)),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""))

  /** pl10: pl9's reproducibility property through the SQL surface —
    * the retained snapshot is read with the stock grammar's
    * `VERSION AS OF` (resolved by
    * [[org.apache.spark.sql.graft.StoreTimeTravelRewrite]] to the
    * retained generation) instead of the `readGeneration` API. Same
    * from-scratch DuckDB rebuild oracle as pl9: the SQL path must
    * reproduce yesterday's keep list bit-exactly after today's
    * changelog has already moved the live view.
    */
  val pl10SqlTimeTravel = Q(
    "pl10_sql_time_travel",
    (s, d) => {
      val t = s"pl10_exidx_${Integer.toHexString(d.hashCode)}"
      val base = documents(s, d)
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildExactIndex(base, "doc_id", "text", t)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyExactIndexDelta(s, t, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text", retain = 1)
      // yesterday's keep list via SQL time travel over the retained
      // generation — the API-free spelling of keepListFromSnapshot
      val keep = s.sql(
        s"""SELECT MIN(doc_id) AS doc_id
            FROM $t VERSION AS OF 1
            GROUP BY h""")
      GraftPipeline.pack(
        base.join(keep, Seq("doc_id"), "left_semi"),
        "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some("""
      WITH q AS (
        SELECT doc_id, text, md5(text) AS h
        FROM documents WHERE len(text) >= 100),
      k AS (SELECT h, MIN(doc_id) AS doc_id FROM q GROUP BY h),
      kept AS (
        SELECT q.doc_id, q.text FROM q
        WHERE EXISTS (SELECT 1 FROM k WHERE k.doc_id = q.doc_id)),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""))

  /** pl11: the MERGE-ON-READ half of SQL time travel. The MoR exact
    * index takes a changelog batch at seq 1 (tombstones + `_seq`-
    * stamped appends, no generation rewrite), then YESTERDAY's keep
    * list is read with `VERSION AS OF 0` — which
    * [[org.apache.spark.sql.graft.StoreTimeTravelRewrite]] expands to
    * the seq-consistent derived table (`readMorAsOfSeq` semantics,
    * topology from the serving view's `graft.mor.*` properties) —
    * and packed. Oracle: the same from-scratch DuckDB rebuild over the
    * pre-changelog corpus as pl9/pl10, so the CoW-generation
    * (pl10) and MoR-sequence (here) spellings of `VERSION AS OF` are
    * held to one cross-engine truth.
    */
  val pl11SqlMorTimeTravel = Q(
    "pl11_sql_mor_time_travel",
    (s, d) => {
      val t = s"pl11_exidx_${Integer.toHexString(d.hashCode)}"
      val base = documents(s, d)
        .filter(length(col("text")) >= 100)
        .select(col("doc_id"), col("text"))
      GraftPipeline.buildExactIndexMor(base, "doc_id", "text", t)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      GraftPipeline.applyExactIndexDeltaMor(s, t, deleteIds,
        Some(upserts.filter(length(col("text")) >= 100)),
        "doc_id", "text")
      val keep = s.sql(
        s"""SELECT MIN(doc_id) AS doc_id
            FROM $t VERSION AS OF 0
            GROUP BY h""")
      GraftPipeline.pack(
        base.join(keep, Seq("doc_id"), "left_semi"),
        "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
        .orderBy(col("shard"), col("pos"))
    },
    sql = pl10SqlTimeTravel.sql)

  val all: Seq[Q] =
    Seq(pl1PipelineDecon, pl2PipelineNearDedup, pl3PipelineIncremental,
      pl4PipelineIncrementalNear, pl5PipelineIncrementalMor,
      pl6PipelineIncrementalMorExact, pl7PipelineProvenance,
      pl8PipelineProvenanceNear, pl9PipelineTimeTravel, pl10SqlTimeTravel,
      pl11SqlMorTimeTravel)
}
