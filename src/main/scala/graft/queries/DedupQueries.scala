package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TextDedupOps._
import Q._
import Tables._

/** Near-duplicate detection over `documents` — every pipeline is
  * mirrored in DuckDB SQL (same md5-prefix hashes, same shingling), so
  * even the LSH ops get full oracle hash-checks, not rows-only checks.
  */
object DedupQueries {

  private[queries] val shingleSql =
    """CASE WHEN len(toks) >= 3
         THEN list_distinct(list_transform(range(0, len(toks) - 2),
              i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
         ELSE [] END"""

  private[queries] val hash60Sql =
    "CAST(('0x' || substr(md5(%s), 1, 15)) AS BIGINT)"

  /** MinHash signatures (8 hashes) per document. */
  val dd1Minhash = Q(
    "dd1_minhash_signature",
    (s, d) =>
      spread(documents(s, d))
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          minhashSignature(col("sh"), 8).as("sig"))
        .select(col("doc_id") +: (0 until 8).map(i =>
          element_at(col("sig"), i + 1).as(s"h$i")): _*)
        .orderBy(col("doc_id")),
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0)
      SELECT doc_id, sig[1] AS h0, sig[2] AS h1, sig[3] AS h2, sig[4] AS h3,
             sig[5] AS h4, sig[6] AS h5, sig[7] AS h6, sig[8] AS h7
      FROM sigs
      ORDER BY doc_id"""))

  /** MinHash-LSH candidate pairs with exact-Jaccard verification — the
    * scalable near-dup pipeline (band-keyed shuffle only).
    */
  val dd2LshPairs = Q(
    "dd2_minhash_lsh_pairs",
    (s, d) =>
      minhashLshPairs(spread(documents(s, d)), "doc_id", "text",
        numHashes = 8, bands = 2)
        .orderBy(col("id_a"), col("id_b")),
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                   AS DOUBLE) /
                 (len(a.sh) + len(b.sh)
                   - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
                 6) AS jaccard
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, MAX(jaccard) AS jaccard
      FROM pairs
      GROUP BY id_a, id_b
      ORDER BY id_a, id_b"""),
    bench = true)

  /** SimHash (60-bit) fingerprints + grouping key for near-dup
    * bucketing.
    */
  val dd3Simhash = Q(
    "dd3_simhash_fingerprint",
    (s, d) =>
      spread(documents(s, d))
        .select(col("doc_id"), simhash(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
    sql = Some(s"""
      WITH th AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\\s+'),
                 t -> ${hash60Sql.format("t")}) AS hashes
        FROM documents)
      SELECT doc_id,
             list_sum(list_transform(range(0, 60), bit ->
               CASE WHEN list_sum(list_transform(hashes, h ->
                      CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
                    THEN (1::BIGINT << bit) ELSE 0 END))::BIGINT AS fingerprint
      FROM th
      ORDER BY doc_id"""))

  /** Exact n-gram Jaccard over the non-boilerplate shingle space, via
    * inverted shingle index with a document-frequency cap: a shingle
    * appearing in > `dfCap` documents is boilerplate — an inverted
    * self-join would emit df² candidate rows for it (the quadratic
    * blowup of heavy hitters at corpus scale) while contributing no
    * dedup signal. Both the index and the per-doc set sizes are
    * computed over kept (df ≤ cap) shingles, so the Jaccard is a true
    * set similarity over the filtered universe — and the oracle
    * mirrors the cap with the same HAVING, so both sides move
    * together. At the test SFs max df is 25, so the cap drops nothing
    * and the result equals unfiltered Jaccard; at corpus scale it
    * bounds every shingle group to ≤ cap² pairs.
    *
    * The dropped set (heavy hitters) is small by construction —
    * broadcast anti-join, so the inverted index never reshuffles for
    * the filter; one exchange on shingle feeds both sides of the
    * self-join.
    */
  val dd4NgramJaccard = Q(
    "dd4_ngram_jaccard_pairs",
    (s, d) => {
      val dfCap = 64
      val docs = spread(documents(s, d))
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val inv0 = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val dropped = inv0.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap)
        .select(col("shingle"))
      val inv = inv0.join(broadcast(dropped), Seq("shingle"), "left_anti")
        .repartition(col("shingle")) // shared exchange for the self-join
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = inv.select(col("shingle"), col("doc_id").as("id_a"))
      val b = inv.select(col("shingle"), col("doc_id").as("id_b"))
      a.join(b, Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")),
          Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (col("shared").cast("double") /
            (col("n_a") + col("n_b") - col("shared")).cast("double"))
            .as("jraw"))
        .filter(col("jraw") >= 0.2) // filter on the raw value like the oracle
        .select(col("id_a"), col("id_b"), round(col("jraw"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      inv0 AS (
        SELECT doc_id, unnest(sh) AS shingle
        FROM docs WHERE len(sh) > 0),
      kept AS (
        SELECT doc_id, shingle FROM inv0
        WHERE shingle NOT IN (SELECT shingle FROM inv0
                              GROUP BY shingle HAVING COUNT(*) > 64)),
      sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
      co AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM kept a JOIN kept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             ROUND(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6)
               AS jaccard
      FROM co
      JOIN sizes sa ON co.id_a = sa.doc_id
      JOIN sizes sb ON co.id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.2
      ORDER BY id_a, id_b"""))

  /** Duplicate clusters from LSH candidate pairs: distributed min-label
    * propagation on Spark vs a recursive-CTE transitive closure in
    * DuckDB — two different algorithms, hash-identical output.
    * dd18 runs a THIRD algorithm (alternating star contraction —
    * [[graft.operators.ClusterOps.connectedComponentsStar]], the
    * O(log n)-round shape for high-diameter components) against the
    * SAME oracle, so all three must agree cell-for-cell.
    */
  val dd5Clusters = Q(
    "dd5_dup_clusters",
    (s, d) =>
      graft.operators.ClusterOps.connectedComponents(
        minhashLshPairs(spread(documents(s, d)), "doc_id", "text",
          numHashes = 8, bands = 2, minJaccard = 0.2))
        .orderBy(col("doc_id")),
    sql = Some(s"""
      WITH RECURSIVE
      docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
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
        SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
      SELECT id AS doc_id, MIN(r) AS cluster_id
      FROM reach
      GROUP BY id
      ORDER BY doc_id"""))

  /** MinHash estimation quality: for every LSH candidate pair, the
    * signature-agreement estimate of Jaccard (matching components / 8)
    * next to the exact shingle Jaccard and the absolute error — the
    * calibration readout that tells an operator whether the signature
    * width is adequate before scaling a dedup run. Scale shape: the
    * candidate-pair relation is orders of magnitude smaller than the
    * corpus, so the pair side broadcasts into the two signature
    * lookups; signatures are computed once per doc (scan-local native
    * expression), never per pair.
    */
  val dd6EstVsExact = Q(
    "dd6_minhash_est_vs_exact",
    (s, d) => {
      val docs = spread(documents(s, d))
      val sigs = docs
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), minhashSignature(col("sh"), 8).as("sig"))
      val pairs = minhashLshPairs(docs, "doc_id", "text",
        numHashes = 8, bands = 2)
      broadcast(pairs)
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
          "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
          "id_b")
        .withColumn("est_jaccard", round(
          aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / 8, 6))
        .select(col("id_a"), col("id_b"), col("jaccard"),
          col("est_jaccard"),
          round(abs(col("jaccard") - col("est_jaccard")), 6)
            .as("est_abs_err"))
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                   AS DOUBLE) /
                 (len(a.sh) + len(b.sh)
                   - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
                 6) AS jaccard
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
      best AS (
        SELECT id_a, id_b, MAX(jaccard) AS jaccard
        FROM pairs GROUP BY id_a, id_b),
      est AS (
        SELECT p.id_a, p.id_b, p.jaccard,
               ROUND(CAST(len(list_filter(range(0, 8),
                   i -> sa.sig[i+1] = sb.sig[i+1])) AS DOUBLE) / 8, 6)
                 AS est_jaccard
        FROM best p
        JOIN sigs sa ON sa.doc_id = p.id_a
        JOIN sigs sb ON sb.doc_id = p.id_b)
      SELECT id_a, id_b, jaccard, est_jaccard,
             ROUND(ABS(jaccard - est_jaccard), 6) AS est_abs_err
      FROM est
      ORDER BY id_a, id_b"""))

  /** The dedup capstone: corpus shrink report. LSH candidate pairs →
    * connected components → keep one representative per cluster (the
    * min-id label IS the representative under min-label propagation)
    * → one summary row: how much near-dup dedup shrinks the corpus.
    * The number a data lead reads before green-lighting a dedup run.
    */
  val dd7Shrink = Q(
    "dd7_dedup_shrink_report",
    (s, d) => {
      val docs = spread(documents(s, d))
      val clusters = graft.operators.ClusterOps.connectedComponents(
        minhashLshPairs(docs, "doc_id", "text",
          numHashes = 8, bands = 2, minJaccard = 0.2))
      // n_docs folds into the plan as a 1-row broadcast (q15/q20
      // pattern) instead of a separate driver count() job.
      val nDocs = docs.agg(cnt.as("n_docs"))
      clusters.agg(
        cnt.as("n_clustered"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(when(col("doc_id") =!= col("cluster_id"), 1L).otherwise(0L))
          .as("n_removed"))
        .crossJoin(broadcast(nDocs))
        .select(col("n_docs"), col("n_clustered"), col("n_clusters"),
          col("n_removed"), (col("n_docs") - col("n_removed")).as("n_kept"),
          round(col("n_removed").cast("double") / col("n_docs"), 6)
            .as("shrink_ratio"))
    },
    sql = Some(s"""
      WITH RECURSIVE
      docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
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
      clusters AS (
        SELECT id AS doc_id, MIN(r) AS cluster_id
        FROM reach GROUP BY id)
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             COUNT(*) AS n_clustered,
             COUNT(DISTINCT cluster_id) AS n_clusters,
             CAST(SUM(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_removed,
             (SELECT COUNT(*) FROM documents)
               - CAST(SUM(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
             ROUND(CAST(SUM(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END)
                 AS DOUBLE)
               / (SELECT COUNT(*) FROM documents), 6) AS shrink_ratio
      FROM clusters"""))

  /** Benchmark decontamination — the train/eval n-gram overlap check
    * every serious training-data pipeline runs (the public GPT-3/C4
    * reports describe the same shape with 13-grams): take a held-out
    * eval set (here the deterministic doc_id % 50 == 0 slice), build
    * its distinct shingle set, and flag any training document whose
    * shingles overlap it above threshold. Scale shape: the eval
    * shingle set is benchmark-sized — a broadcast — so the training
    * corpus is scanned once with a map-side semi-join; no shuffle
    * touches corpus-scale data until the per-doc aggregation.
    */
  val dd8Decontaminate = Q(
    "dd8_decontamination",
    (s, d) => {
      val docs = spread(documents(s, d))
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val evalSh = docs.filter(col("doc_id") % 50 === 0)
        .select(explode(col("sh")).as("shingle")).distinct()
      docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          explode(col("sh")).as("shingle"))
        .join(broadcast(evalSh), Seq("shingle"))
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(cnt.as("n_hits"))
        .withColumn("contamination",
          round(col("n_hits").cast("double") / col("n_shingles"), 6))
        .filter(col("contamination") >= 0.5)
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          col("contamination"))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      nz AS (SELECT * FROM docs WHERE len(sh) > 0),
      eval_sh AS (
        SELECT DISTINCT unnest(sh) AS shingle FROM nz
        WHERE doc_id % 50 = 0),
      train AS (
        SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS shingle
        FROM nz WHERE doc_id % 50 <> 0),
      hits AS (
        SELECT t.doc_id, t.n_shingles, COUNT(*) AS n_hits
        FROM train t JOIN eval_sh e USING (shingle)
        GROUP BY 1, 2)
      SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles, n_hits,
             ROUND(CAST(n_hits AS DOUBLE) / n_shingles, 6) AS contamination
      FROM hits
      WHERE ROUND(CAST(n_hits AS DOUBLE) / n_shingles, 6) >= 0.5
      ORDER BY doc_id"""))

  /** Bloom-filter decontamination — dd8's scale twin. dd8 broadcasts
    * the eval set's DISTINCT SHINGLES, which grows with the eval
    * corpus; here the broadcast is a Bloom filter over them — m = 32 Ki
    * positions, k = 3 md5-derived probes per shingle — whose size is
    * FIXED no matter how many benchmarks the suite holds. The training
    * corpus is scanned once: each shingle's k probe positions are
    * checked against the broadcast bit set MAP-SIDE, so rows that miss
    * (the overwhelming majority) never reach an exchange — only
    * bloom-positive probes (fill ≈ 5% ⇒ ~0.01% of shingles) shuffle to
    * the per-doc aggregation. By construction the filter cannot miss
    * (every truly contaminated doc appears); the query also joins the
    * exact eval set back on the candidates only, labelling each as a
    * true hit or a false positive — the calibration readout for
    * choosing m and k. (At production scale the position set would be
    * a bitmask in a broadcast variable / native expression; the
    * position-set join here is semantically identical and keeps the
    * oracle SQL-expressible.)
    */
  val dd9BloomDecontaminate = Q(
    "dd9_bloom_decontamination",
    (s, d) => {
      import org.apache.spark.sql.Column
      val m = 32768L
      val k = 3
      def pos(c: Column, i: Int): Column =
        pmod(conv(substring(md5(concat(lit(s"$i|"), c)), 1, 15), 16, 10)
          .cast("long"), lit(m))
      def probeBits(c: Column): Column =
        explode(array((0 until k).map(i => pos(c, i)): _*))
      val docs = spread(documents(s, d))
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val evalSh = docs.filter(col("doc_id") % 50 === 0)
        .select(explode(col("sh")).as("shingle")).distinct()
      val evalBits = evalSh
        .select(probeBits(col("shingle")).as("bit")).distinct()
      val train = docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
          explode(col("sh")).as("shingle"))
      // a shingle is bloom-positive iff ALL k probe positions are set:
      // each probe row survives the (broadcast, map-side) join iff its
      // bit is set, so surviving-count == k is exactly that
      val bloomHits = train
        .select(col("doc_id"), col("n_shingles"), col("shingle"),
          probeBits(col("shingle")).as("bit"))
        .join(broadcast(evalBits), Seq("bit"))
        .groupBy(col("doc_id"), col("n_shingles"), col("shingle"))
        .agg(cnt.as("n_set"))
        .filter(col("n_set") === k)
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(cnt.as("n_bloom_hits"))
      val exactHits = train.join(broadcast(evalSh), Seq("shingle"))
        .groupBy(col("doc_id")).agg(cnt.as("n_exact_hits"))
      bloomHits.join(exactHits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
          coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"))
        .withColumn("false_positive", col("n_exact_hits") === 0L)
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      nz AS (SELECT * FROM docs WHERE len(sh) > 0),
      eval_sh AS (
        SELECT DISTINCT unnest(sh) AS shingle FROM nz
        WHERE doc_id % 50 = 0),
      eval_bits AS (
        SELECT DISTINCT
               ${hash60Sql.format("i.i::VARCHAR || '|' || shingle")} % 32768
                 AS bit
        FROM eval_sh, (SELECT unnest(range(0, 3)) AS i) i),
      train AS (
        SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS shingle
        FROM nz WHERE doc_id % 50 <> 0),
      probes AS (
        SELECT t.doc_id, t.n_shingles, t.shingle,
               ${hash60Sql.format("i.i::VARCHAR || '|' || t.shingle")} % 32768
                 AS bit
        FROM train t, (SELECT unnest(range(0, 3)) AS i) i),
      pos_sh AS (
        SELECT doc_id, n_shingles, shingle
        FROM probes p JOIN eval_bits e USING (bit)
        GROUP BY doc_id, n_shingles, shingle
        HAVING COUNT(*) = 3),
      bloom AS (
        SELECT doc_id, n_shingles, COUNT(*) AS n_bloom_hits
        FROM pos_sh GROUP BY 1, 2),
      exact AS (
        SELECT doc_id, COUNT(*) AS n_exact_hits
        FROM train JOIN eval_sh USING (shingle) GROUP BY 1)
      SELECT b.doc_id, CAST(b.n_shingles AS BIGINT) AS n_shingles,
             b.n_bloom_hits,
             COALESCE(e.n_exact_hits, 0) AS n_exact_hits,
             COALESCE(e.n_exact_hits, 0) = 0 AS false_positive
      FROM bloom b LEFT JOIN exact e USING (doc_id)
      ORDER BY b.doc_id"""))

  /** Cross-snapshot INCREMENTAL dedup — the refresh shape a production
    * pipeline actually runs when a new crawl lands: tx23's
    * hash-compare delta (added/updated docs) probes dd2's LSH band
    * buckets over the current corpus, instead of re-running pair
    * generation over everything. Fixture snapshots are tx23's exactly
    * (old = doc_id%10 < 8; new = doc_id%10 >= 2 with every third doc's
    * text mutated), so "changed" is decided by CONTENT HASH compare,
    * not id arithmetic. The oracle is the independent formulation:
    * full-corpus dd2 pair generation restricted to pairs touching a
    * changed doc. Plan gate (`PlanQualitySpec`): ONE band-keyed join,
    * no self-joined exchange — the unchanged corpus partition appears
    * only on the index side.
    */
  /** tx23's fixture snapshots: the current corpus (`newSnap`) and the
    * content-hash-compare delta ids — shared by dd10 (on-the-fly index)
    * and dd11 (stored index).
    */
  private[queries] def snapshotDelta(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val oldSnap = base.filter(col("doc_id") % 10 < 8)
      .select(col("doc_id"), md5(col("text")).as("old_md5"))
    val newSnap = base.filter(col("doc_id") % 10 >= 2)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    val changedIds = newSnap
      .select(col("doc_id"), md5(col("text")).as("new_md5"))
      .join(oldSnap, Seq("doc_id"), "left")
      .filter(col("old_md5").isNull || col("old_md5") =!= col("new_md5"))
      .select(col("doc_id"))
    (newSnap, changedIds)
  }

  val dd10IncrementalDedup = Q(
    "dd10_incremental_dedup",
    (s, d) => {
      val (newSnap, changedIds) = snapshotDelta(s, d)
      incrementalLshPairs(spread(newSnap), changedIds, "doc_id", "text",
        numHashes = 8, bands = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = Some(s"""
      WITH newdocs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END
                 AS text
        FROM documents WHERE doc_id % 10 >= 2),
      old AS (
        SELECT doc_id, md5(text) AS old_md5
        FROM documents WHERE doc_id % 10 < 8),
      changed AS (
        SELECT n.doc_id
        FROM (SELECT doc_id, md5(text) AS new_md5 FROM newdocs) n
        LEFT JOIN old o USING (doc_id)
        WHERE o.old_md5 IS NULL OR o.old_md5 <> n.new_md5),
      docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM newdocs) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                   AS DOUBLE) /
                 (len(a.sh) + len(b.sh)
                   - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
                 6) AS jaccard
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        WHERE a.doc_id IN (SELECT doc_id FROM changed)
           OR b.doc_id IN (SELECT doc_id FROM changed))
      SELECT id_a, id_b, MAX(jaccard) AS jaccard
      FROM pairs
      GROUP BY id_a, id_b
      ORDER BY id_a, id_b"""))

  /** Idempotently build the STORED banded index for `d`'s current
    * snapshot (dd11 probes it; the index-reuse spec probes it twice).
    * Keyed on CATALOG existence, not a JVM memo — test suites stop and
    * recreate the SparkContext, and a memo outliving its catalog would
    * hand out dangling table names.
    */
  def ensureLshIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"dd_lsh_index_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t)) {
      val (newSnap, _) = snapshotDelta(s, d)
      writeLshIndex(spread(newSnap), "doc_id", "text", t,
        numHashes = 8, bands = 2,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_lsh_idx").toString))
    }
    t
  }

  /** dd10 with the index half made real: the standing banded index is
    * a BUCKETED (band, bhash) parquet table written once per snapshot
    * ([[graft.operators.TextDedupOps.writeLshIndex]]), and the delta
    * probes it FROM DISK — the corpus text is never read and never
    * re-banded (plan-gated: the only text scan is the delta fetch; the
    * index side is a bucket-aligned table scan with NO shuffle). Same
    * semantics as dd10, so the oracle is dd10's SQL verbatim — two
    * independent formulations, one result.
    */
  val dd11StoredIndexDedup = Q(
    "dd11_stored_index_dedup",
    (s, d) => {
      val table = ensureLshIndex(s, d)
      val (newSnap, changedIds) = snapshotDelta(s, d)
      val deltaDocs = newSnap
        .join(broadcast(changedIds), Seq("doc_id"), "left_semi")
      probeLshIndex(s, table, deltaDocs, "doc_id", "text",
        numHashes = 8, bands = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = dd10IncrementalDedup.sql)

  /** The ACTIONABLE dedup output (dd12): a full-corpus keep/drop list —
    * what the downstream pipeline actually consumes. dd5's clusters
    * assign every near-dup doc its min-id canonical; singletons (the
    * overwhelming majority at corpus scale) are their own canonical via
    * a LEFT join + coalesce, never entering the cluster computation.
    * `keep` is emitted as 1/0 BIGINT (cross-engine boolean hashing is
    * not worth the risk). Scale: the cluster relation is dup-scale ≪
    * corpus-scale, so the left join broadcasts it; the corpus is
    * touched once, scan-local.
    */
  val dd12KeepList = Q(
    "dd12_dedup_keep_list",
    (s, d) => {
      val clusters = graft.operators.ClusterOps.connectedComponents(
        minhashLshPairs(spread(documents(s, d)), "doc_id", "text",
          numHashes = 8, bands = 2, minJaccard = 0.2))
      documents(s, d).select(col("doc_id"))
        .join(broadcast(clusters), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("canonical_id"))
        .withColumn("keep",
          when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH RECURSIVE
      docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
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
             FROM reach GROUP BY id)
      SELECT d.doc_id,
             COALESCE(cl.cluster_id, d.doc_id) AS canonical_id,
             CAST(CASE WHEN d.doc_id = COALESCE(cl.cluster_id, d.doc_id)
                  THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
      ORDER BY d.doc_id"""))

  /** PageRank over the near-dup graph (dd13) — graph ANALYTICS on the
    * dedup output: which documents sit at the center of duplication
    * mass (template pages, boilerplate hubs — the docs whose removal
    * collapses whole clusters). Three damped iterations (d = 0.85) in
    * EXACT fixed-point integer arithmetic (ranks in parts-per-billion;
    * em7's nano-exact discipline): every contribution is `rank DIV
    * degree`, every update `(15·r0) DIV 100 + (85·Σ) DIV 100` — all
    * BIGINT, so both engines carry bit-identical state through all
    * three iterations and the hash match is exact, not
    * rounding-coincident. Scale shape: edges are cached once
    * (scoped), each iteration is one (src)-keyed join + one (dst)
    * hash agg — bounded lineage, no driver-side graph; the node count
    * enters as a broadcast 1-row scalar, not a driver action (which
    * would materialize-and-release the scoped edge cache early).
    */
  val dd13PageRank = Q(
    "dd13_dup_graph_pagerank",
    (s, d) => {
      val pairs = minhashLshPairs(spread(documents(s, d)), "doc_id", "text",
        numHashes = 8, bands = 2, minJaccard = 0.2)
        .select(col("id_a"), col("id_b"))
      val edges = org.apache.spark.sql.graft.ScopedCaches.scoped(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(
            pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nDf = deg.agg(count(lit(1)).as("n"))
      var ranks = deg.crossJoin(broadcast(nDf))
        .select(col("src").as("node"), col("deg"),
          expr("1000000000 DIV n").as("rank"))
      for (_ <- 1 to 3) {
        val acc = edges.join(ranks, edges("src") === ranks("node"))
          .select(col("dst"), expr("rank DIV deg").as("contrib"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("acc"))
        ranks = deg.join(acc, deg("src") === acc("dst"))
          .crossJoin(broadcast(nDf))
          .select(deg("src").as("node"), col("deg"),
            expr("(15 * (1000000000 DIV n)) DIV 100 + (85 * acc) DIV 100")
              .as("rank"))
      }
      ranks.select(col("node").as("doc_id"), col("deg").as("degree"),
        col("rank").as("rank_ppb"))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                AS DOUBLE) /
              (len(a.sh) + len(b.sh)
                - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
              6) >= 0.2),
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      deg AS MATERIALIZED (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      nn AS (SELECT COUNT(*) AS n FROM deg),
      r0 AS MATERIALIZED (
        SELECT d.src AS node, d.deg, 1000000000 // nn.n AS rank
        FROM deg d, nn),
      r1 AS MATERIALIZED (
        SELECT d.src AS node, d.deg,
               (15 * (1000000000 // nn.n)) // 100 + (85 * s.acc) // 100
                 AS rank
        FROM deg d, nn,
             (SELECT e.dst, SUM(r.rank // r.deg) AS acc
              FROM edges e JOIN r0 r ON e.src = r.node GROUP BY e.dst) s
        WHERE s.dst = d.src),
      r2 AS MATERIALIZED (
        SELECT d.src AS node, d.deg,
               (15 * (1000000000 // nn.n)) // 100 + (85 * s.acc) // 100
                 AS rank
        FROM deg d, nn,
             (SELECT e.dst, SUM(r.rank // r.deg) AS acc
              FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst) s
        WHERE s.dst = d.src),
      r3 AS MATERIALIZED (
        SELECT d.src AS node, d.deg,
               (15 * (1000000000 // nn.n)) // 100 + (85 * s.acc) // 100
                 AS rank
        FROM deg d, nn,
             (SELECT e.dst, SUM(r.rank // r.deg) AS acc
              FROM edges e JOIN r2 r ON e.src = r.node GROUP BY e.dst) s
        WHERE s.dst = d.src)
      SELECT node AS doc_id, CAST(deg AS BIGINT) AS degree,
             CAST(rank AS BIGINT) AS rank_ppb
      FROM r3
      ORDER BY doc_id"""))

  /** Blocked EDIT-DISTANCE near-dup (dd14) — the entity-resolution
    * discipline for the string-metric family jaccard/minhash can't
    * express (character-level edits): candidates come from a
    * (prefix-8, length-band) BLOCKING key, the standard ER move that
    * turns O(n²) verify into block-local work — the fixture's 16,095
    * length-compatible pairs collapse to ~90 candidates — then exact
    * Levenshtein verifies, keeping pairs whose distance is ≤ 10% of
    * the longer text. Length bands are 32 wide and each doc posts to
    * (band, band+1), so any pair with |len_a − len_b| ≤ 32 meets; the
    * `(pos_a, pos_b) ≠ (1,1)` guard makes each pair meet EXACTLY once
    * (no distinct over text payloads). One keyed shuffle; the DP
    * verify runs only on block-collocated candidates.
    */
  val dd14EditDistance = Q(
    "dd14_editdist_near_dup",
    (s, d) => {
      val docs = spread(documents(s, d))
        .select(col("doc_id"), col("text"), length(col("text")).as("len"),
          substring(col("text"), 1, 8).as("pfx"))
      val bd = docs.select(col("doc_id"), col("text"), col("len"),
        col("pfx"),
        posexplode(array(expr("len DIV 32"), expr("len DIV 32 + 1")))
          .as(Seq("pos", "lband")))
      val a = bd.select(col("pfx"), col("lband"), col("pos").as("pos_a"),
        col("doc_id").as("id_a"), col("text").as("t_a"),
        col("len").as("l_a"))
      val b = bd.select(col("pfx"), col("lband"), col("pos").as("pos_b"),
        col("doc_id").as("id_b"), col("text").as("t_b"),
        col("len").as("l_b"))
      a.join(b, Seq("pfx", "lband"))
        .filter(col("id_a") < col("id_b") &&
          !(col("pos_a") === 1 && col("pos_b") === 1) &&
          abs(col("l_a") - col("l_b")) <= 32)
        .withColumn("lev", levenshtein(col("t_a"), col("t_b")))
        .filter(col("lev") * 10 <= greatest(col("l_a"), col("l_b")))
        .select(col("id_a"), col("id_b"),
          col("lev").cast("long").as("edit_distance"))
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = Some("""
      WITH docs AS (
        SELECT doc_id, text, length(text) AS len,
               substr(text, 1, 8) AS pfx
        FROM documents),
      banded AS (
        SELECT doc_id, text, len, pfx, p.pos, len // 32 + p.pos AS lband
        FROM docs, (SELECT unnest(range(0, 2)) AS pos) p),
      cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.text AS t_a, b.text AS t_b, a.len AS l_a, b.len AS l_b
        FROM banded a JOIN banded b
          ON a.pfx = b.pfx AND a.lband = b.lband AND a.doc_id < b.doc_id
         AND NOT (a.pos = 1 AND b.pos = 1)
        WHERE abs(a.len - b.len) <= 32)
      SELECT id_a, id_b,
             CAST(levenshtein(t_a, t_b) AS BIGINT) AS edit_distance
      FROM cand
      WHERE levenshtein(t_a, t_b) * 10 <= GREATEST(l_a, l_b)
      ORDER BY id_a, id_b"""))

  /** N-gram contamination SCORING (dd15) — the graded refinement of
    * dd8/dd9's binary decontamination: a train doc is flagged not on
    * exact match or single-gram hit but on the FRACTION of its 3-gram
    * shingles that appear anywhere in the eval set (the containment
    * standard eval-decontamination actually uses — partial quote
    * contamination that exact hashing misses). Per-doc gram sets are
    * scan-local (the shingle expression already dedups in-row), the
    * eval gram universe is eval-scale so it BROADCASTS into a map-side
    * left join — the corpus never shuffles for the probe; the only
    * exchange is the per-doc count's partial-combined doc_id agg.
    * Fraction as integer ppm (exact DIV arithmetic both engines);
    * threshold ≥ 20% keeps the report contaminated-only.
    */
  val dd15Contamination = Q(
    "dd15_ngram_contamination",
    (s, d) => {
      val docs = spread(documents(s, d))
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val evalGrams = docs.filter(col("doc_id") % 10 >= 8)
        .select(explode(col("sh")).as("g"))
        .select(hash60(col("g")).as("gh")).distinct()
        .withColumn("m", lit(1))
      docs.filter(col("doc_id") % 10 < 8)
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"), hash60(col("g")).as("gh"))
        .join(broadcast(evalGrams), Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(cnt.as("n_grams"), count(col("m")).as("n_matched"))
        .withColumn("frac_ppm",
          expr("n_matched * 1000000 DIV n_grams"))
        .filter(col("frac_ppm") >= 200000)
        .select(col("doc_id"), col("n_grams"), col("n_matched"),
          col("frac_ppm"))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+')
                AS toks FROM documents) t),
      ne AS (SELECT doc_id, sh FROM docs WHERE len(sh) > 0),
      eg AS (
        SELECT DISTINCT ${hash60Sql.format("g")} AS gh
        FROM (SELECT unnest(sh) AS g FROM ne WHERE doc_id % 10 >= 8)),
      tg AS (
        SELECT doc_id, ${hash60Sql.format("g")} AS gh
        FROM (SELECT doc_id, unnest(sh) AS g FROM ne
              WHERE doc_id % 10 < 8)),
      scored AS (
        SELECT t.doc_id, COUNT(*) AS n_grams,
               COUNT(e.gh) AS n_matched
        FROM tg t LEFT JOIN eg e ON t.gh = e.gh
        GROUP BY t.doc_id)
      SELECT doc_id, n_grams, n_matched,
             n_matched * 1000000 // n_grams AS frac_ppm
      FROM scored
      WHERE n_matched * 1000000 // n_grams >= 200000
      ORDER BY doc_id"""))

  /** Leakage-safe train/val split (dd16): a hash split on doc_id
    * leaks — a near-duplicate of a validation document lands in train
    * and the eval is contaminated. The split unit must be the
    * NEAR-DUP CLUSTER: assign every doc its dd5 cluster representative
    * (its own id when unclustered), hash-split the REPRESENTATIVE
    * (tx9's portable md5 family, 90/10), and audit that zero candidate
    * pairs cross the boundary — the report a training pipeline gates
    * on before freezing a corpus. Scale shape: clusters come from the
    * LSH candidate graph (candidate scale, never all-pairs), the split
    * itself is a scan-local md5 over a broadcast-joined representative
    * map, and the audit joins the tiny pair relation against the
    * assignment twice (broadcast). The DuckDB oracle recomputes
    * clusters independently (recursive CC) and the same md5 split, so
    * a cross-engine match proves both the clustering and the
    * atomicity of the split.
    */
  val dd16LeakageSafeSplit = Q(
    "dd16_leakage_safe_split",
    (s, d) => {
      val docs = spread(documents(s, d))
      val pairs = minhashLshPairs(docs, "doc_id", "text",
        numHashes = 8, bands = 2, minJaccard = 0.2)
        .select(col("id_a"), col("id_b"))
      val clusters = graft.operators.ClusterOps.connectedComponents(pairs)
      val assigned = docs.select(col("doc_id"))
        .join(broadcast(clusters), Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("split",
          when(pmod(conv(substring(md5(concat(col("rep").cast("string"),
            lit("|split"))), 1, 15), 16, 10).cast("long"), lit(10L)) < 9,
            "train").otherwise("val"))
      val sizes = assigned.groupBy(col("split"))
        .agg(cnt.as("n")).select(
          concat(col("split"), lit("_docs")).as("metric"), col("n"))
      val crossPairs = pairs
        .join(broadcast(assigned.select(col("doc_id").as("id_a"),
          col("split").as("split_a"))), "id_a")
        .join(broadcast(assigned.select(col("doc_id").as("id_b"),
          col("split").as("split_b"))), "id_b")
        .filter(col("split_a") =!= col("split_b"))
        .agg(cnt.as("n"))
        .select(lit("cross_split_dup_pairs").as("metric"), col("n"))
      sizes.unionByName(crossPairs).orderBy(col("metric"))
    },
    sql = Some(s"""
      WITH RECURSIVE
      docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
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
      clusters AS (
        SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      assigned AS (
        SELECT d.doc_id,
               CASE WHEN CAST(('0x' || substr(md5(CAST(
                      COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)
                      || '|split'), 1, 15)) AS BIGINT) % 10 < 9
                    THEN 'train' ELSE 'val' END AS split
        FROM documents d LEFT JOIN clusters c USING (doc_id))
      SELECT metric, n FROM (
        SELECT split || '_docs' AS metric, COUNT(*) AS n
        FROM assigned GROUP BY split
        UNION ALL
        SELECT 'cross_split_dup_pairs',
               COUNT(*)
        FROM pairs p
        JOIN assigned a ON p.id_a = a.doc_id
        JOIN assigned b ON p.id_b = b.doc_id
        WHERE a.split <> b.split)
      ORDER BY metric"""))

  /** dd5's clustering re-run through STAR CONTRACTION
    * ([[graft.operators.ClusterOps.connectedComponentsStar]] —
    * alternating large-star/small-star, O(log n) rounds instead of
    * O(component diameter)): identical contract, identical oracle.
    * Registering it separately keeps BOTH distributed algorithms
    * under continuous cross-engine verification; star contraction is
    * the one to reach for when components may be deep chains (long
    * boilerplate families), propagation when they are shallow.
    */
  val dd18ClustersStar = Q(
    "dd18_dup_clusters_star",
    (s, d) =>
      graft.operators.ClusterOps.connectedComponentsStar(
        minhashLshPairs(spread(documents(s, d)), "doc_id", "text",
          numHashes = 8, bands = 2, minJaccard = 0.2))
        .orderBy(col("doc_id")),
    sql = dd5Clusters.sql)

  /** SEMANTIC dedup (SemDeDup-style, Abbas et al. 2023, public): the
    * embedding-space analogue of the text LSH pipeline — cluster the
    * corpus with a coarse quantizer, then look for near-duplicates
    * only WITHIN each cluster, so the pair space shrinks from n² to
    * Σ|cluster|² and every stage is an equi-join. Here: em6's
    * deterministic k=8 assignment (broadcast centroid relation,
    * max(struct) top-1 — the corpus never shuffles for assignment),
    * cid-keyed self-join for candidate pairs at cosine ≥ 0.35
    * (rounded to 6 before the compare, both engines), transitive
    * closure via [[graft.operators.ClusterOps.connectedComponents]],
    * keep = lowest vec_id per component. Report: per-cell members /
    * removed / kept — the shrink readout a curation run needs. The
    * oracle recomputes assignment, pairs, AND the recursive closure
    * independently, so the hash match proves the whole chain.
    *
    * Cross-cluster near-dup pairs are invisible by design — that is
    * SemDeDup's documented approximation; the quantizer's job is to
    * make misses rare, the win is that no stage is quadratic in the
    * corpus.
    */
  val dd17SemanticDedup = Q(
    "dd17_semantic_dedup",
    (s, d) => {
      import graft.functions.VectorFunctions.array_dot
      // in-row assignment off the centroid LITERAL (sim4's rule):
      // no shuffle, no array-keyed aggregate — the corpus only ever
      // exchanges on the cid cluster key below
      val assigned = graft.operators.SimilarityOps
        .assignFirstK(spread(embeddings(s, d)), "vec_id", "embedding",
          dims = 64, k = 8)
        .select(col("vid").as("vec_id"), col("e"), col("nrm"), col("cid"))
      val a = assigned.select(col("cid"), col("vec_id").as("id_a"),
        col("e").as("ea"), col("nrm").as("na"))
      val b = assigned.select(col("cid"), col("vec_id").as("id_b"),
        col("e").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(b, Seq("cid"))
        .filter(col("id_a") < col("id_b") &&
          round(array_dot(col("ea"), col("eb")) / (col("na") * col("nb")),
            6) >= 0.35)
        .select(col("id_a"), col("id_b"))
      val cc = graft.operators.ClusterOps.connectedComponents(pairs)
      assigned
        .join(cc.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
        .groupBy(col("cid"))
        .agg(cnt.as("n_members"),
          sum(when(col("cluster_id").isNotNull &&
            col("cluster_id") =!= col("vec_id"), 1L).otherwise(0L))
            .as("n_removed"))
        .select(col("cid"), col("n_members"), col("n_removed"),
          (col("n_members") - col("n_removed")).as("n_kept"))
        .orderBy(col("cid"))
    },
    sql = Some("""
      WITH RECURSIVE
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
      scored AS (
        SELECT v.vec_id, v.e, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS score
        FROM v CROSS JOIN c),
      assigned AS (
        SELECT vec_id, e, cid FROM (
          SELECT vec_id, e, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY score DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.35),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
      cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
      SELECT a.cid, COUNT(*) AS n_members,
             CAST(SUM(CASE WHEN cc.cluster_id IS NOT NULL
                            AND cc.cluster_id <> a.vec_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             CAST(COUNT(*) - SUM(CASE WHEN cc.cluster_id IS NOT NULL
                                       AND cc.cluster_id <> a.vec_id
                                      THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
      FROM assigned a LEFT JOIN cc ON a.vec_id = cc.id
      GROUP BY a.cid
      ORDER BY a.cid"""))

  /** EXACT high-threshold Jaccard join via PREFIX FILTERING (dd19) —
    * the deterministic complement to LSH (dd2: probabilistic recall)
    * and the df-capped index join (dd4: drops hot tokens). Under a
    * global rarity order, any pair with J ≥ θ must share a token in
    * each side's first n − ceil(θ·n) + 1 tokens (if all common tokens
    * sat in the suffix, the overlap would be < ceil(θ·n) ≤ the overlap
    * J ≥ θ forces) — so joining ONLY on prefix tokens has zero false
    * negatives, and at θ=0.7 the prefix is ~30% of each set built from
    * its RAREST tokens, collapsing the candidate space (25 true pairs
    * vs 11,533 co-occurring pairs at sf0.01). Verification and the
    * threshold test are pure integers (shared·10 ≥ 7·union) — no float
    * crosses the engine boundary. The oracle brute-forces all
    * co-occurring pairs, so the compare also proves the zero-miss
    * guarantee on real data.
    */
  val dd19PrefixFilter = Q(
    "dd19_prefix_filter_join",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = spread(documents(s, d))
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      // Candidate GENERATION runs entirely on 8-byte shingle HASHES:
      // the prefix theorem needs only a CONSISTENT global total order
      // over shingles (any order works — frequency order just prunes
      // best), and two docs sharing a true prefix shingle also share
      // its hash, so zero-false-negatives is preserved. A collision
      // can only ADD a candidate, which exact verification removes.
      // Measured at the 32× stress corpus: the string-keyed variant
      // shuffled ~30-char keys through the df join, window, and
      // candidate join and cliffed into spill (BENCH_SCALE.md); the
      // hashed variant moves a quarter of the bytes.
      val inv = docs.select(col("doc_id"),
        explode(expr("transform(sh, t -> xxhash64(t))")).as("hsh"))
      val sizes = docs.select(col("doc_id"),
        size(col("sh")).cast("long").as("n"))
      val dfs = inv.groupBy(col("hsh")).agg(cnt.as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("hsh"))
      val prefix = inv.join(dfs, Seq("hsh"))
        .withColumn("pos", row_number().over(w))
        .join(sizes, Seq("doc_id"))
        // p = n − ceil(0.7·n) + 1; ceil(7n/10) = (7n+9) DIV 10 exactly
        .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + lit(1))
      val cands = prefix
        .select(col("hsh"), col("doc_id").as("id_a"), col("n").as("n_a"))
        .join(prefix.select(col("hsh"), col("doc_id").as("id_b"),
          col("n").as("n_b")), Seq("hsh"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
        .distinct()
      // EXACT verification IN-ROW: two id-keyed joins fetch the real
      // shingle sets and `array_intersect` counts the overlap — the
      // old double explode-join shuffled |cands|·|sh| rows (~116 M at
      // the 32× stress corpus) where this ships each candidate pair
      // once with two array payloads. Exactness is untouched: the
      // final jaccard test runs on true shingles, never hashes.
      cands
        .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
          Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
            .as("shared"))
        .filter(col("shared") * 10 >=
          (col("n_a") + col("n_b") - col("shared")) * 7)
        .select(col("id_a"), col("id_b"), col("shared"),
          col("n_a"), col("n_b"))
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = Some(s"""
      WITH docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      inv AS (
        SELECT doc_id, unnest(sh) AS shingle
        FROM docs WHERE len(sh) > 0),
      sizes AS (
        SELECT doc_id, CAST(len(sh) AS BIGINT) AS n
        FROM docs WHERE len(sh) > 0),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM inv a JOIN inv b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT p.id_a, p.id_b, p.shared, sa.n AS n_a, sb.n AS n_b
      FROM pairs p
      JOIN sizes sa ON p.id_a = sa.doc_id
      JOIN sizes sb ON p.id_b = sb.doc_id
      WHERE p.shared * 10 >= (sa.n + sb.n - p.shared) * 7
      ORDER BY id_a, id_b"""))

  /** Changelog fixture shared by the delete-maintenance queries (dd20
    * here, tx41 in TextQueries): DELETES are the doc_id % 7 == 3 docs,
    * UPSERTS are the surviving doc_id % 5 == 0 docs with " upd"
    * appended — deterministic, overlapping neither way (a deleted doc
    * is never also upserted; delete wins).
    */
  private[queries] def indexChangelog(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val upserts = base
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
    val deleteIds = base.filter(col("doc_id") % 7 === 3)
      .select(col("doc_id"))
    (upserts, deleteIds)
  }

  /** DELETE-bearing index maintenance (dd20): the capability dd11's
    * append-only refresh cannot express. A full-corpus LSH index is
    * adopted into VERSIONED serving, a changelog with hard deletes and
    * upserts flows through [[graft.operators.BucketedStores
    * .applyDeltaAtomic]] (next generation = current − removed ids +
    * re-banded upserts, one-file-per-bucket rewrite, ONE view-flip
    * catalog op), and the upserts then probe the updated index. The
    * oracle re-derives the whole pipeline from the POST-changelog
    * corpus — so the row is a cross-engine REBUILD-EQUIVALENCE proof:
    * incremental maintenance must equal building fresh from the final
    * corpus, including every deleted doc being gone from the candidate
    * space (IndexDeleteSpec proves the deleted docs would otherwise
    * have matched, so the check is not vacuous). The store is rebuilt
    * per run: a delete makes the mutation non-idempotent, so tx37's
    * catalog-keyed ensure-cache discipline would serve a stale
    * generation on re-invocation.
    */
  val dd20IndexDeletes = Q(
    "dd20_index_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"dd_lsh_del_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      writeLshIndex(spread(documents(s, d)), "doc_id", "text", t,
        numHashes = 8, bands = 2,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_lsh_del").toString))
      BucketedStores.adoptVersioned(s, t)
      val (upserts, deleteIds) = indexChangelog(s, d)
      BucketedStores.applyDeltaAtomic(s, t,
        Seq("band", "bhash"), Seq("band", "bhash"), buckets = 8,
        idCol = "doc_id",
        removeIds = deleteIds.unionByName(upserts.select(col("doc_id"))),
        additions = Some(lshIndexRows(upserts, "doc_id", "text",
          numHashes = 8, bands = 2)))
      probeLshIndex(s, t, upserts, "doc_id", "text",
        numHashes = 8, bands = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    sql = Some(s"""
      WITH newdocs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' upd' ELSE text END
                 AS text
        FROM documents WHERE doc_id % 7 <> 3),
      changed AS (SELECT doc_id FROM newdocs WHERE doc_id % 5 = 0),
      docs AS (
        SELECT doc_id, $shingleSql AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM newdocs) t),
      sigs AS (
        SELECT doc_id, sh,
               list_transform(range(0, 8), seed ->
                 list_min(list_transform(sh, s ->
                   ${hash60Sql.format("seed::VARCHAR || '|' || s")}))) AS sig
        FROM docs WHERE len(sh) > 0),
      banded AS (
        SELECT doc_id, sh, b.band,
               md5(concat_ws(',', sig[band*4+1], sig[band*4+2],
                             sig[band*4+3], sig[band*4+4])) AS bhash
        FROM sigs, (SELECT unnest(range(0, 2)) AS band) b),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_filter(a.sh, s -> list_contains(b.sh, s)))
                   AS DOUBLE) /
                 (len(a.sh) + len(b.sh)
                   - len(list_filter(a.sh, s -> list_contains(b.sh, s)))),
                 6) AS jaccard
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
        WHERE a.doc_id IN (SELECT doc_id FROM changed)
           OR b.doc_id IN (SELECT doc_id FROM changed))
      SELECT id_a, id_b, MAX(jaccard) AS jaccard
      FROM pairs
      GROUP BY id_a, id_b
      ORDER BY id_a, id_b"""))

  val all: Seq[Q] = Seq(dd1Minhash, dd2LshPairs, dd3Simhash, dd4NgramJaccard,
    dd5Clusters, dd6EstVsExact, dd7Shrink, dd8Decontaminate,
    dd9BloomDecontaminate, dd10IncrementalDedup, dd11StoredIndexDedup,
    dd12KeepList, dd13PageRank, dd14EditDistance, dd15Contamination,
    dd16LeakageSafeSplit, dd17SemanticDedup, dd18ClustersStar,
    dd19PrefixFilter, dd20IndexDeletes)
}
