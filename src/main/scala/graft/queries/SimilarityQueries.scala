package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import Q._
import Tables._

/** ANN (approximate nearest neighbor) queries — the scale path for
  * similarity search, oracle-checked end to end: DuckDB re-derives the
  * same md5-seeded hyperplanes, buckets, and scores.
  */
object SimilarityQueries {

  private val planeSql =
    """(CAST(('0x' || substr(md5(p::VARCHAR || '|' || d::VARCHAR), 1, 15))
         AS BIGINT)::DOUBLE / 1152921504606846976.0 * 2 - 1)"""

  /** LSH-ANN top-1: 16 hyperplanes, 4 bands × 4 bits. */
  val sim1LshAnn = Q(
    "sim1_lsh_ann_top1",
    (s, d) =>
      SimilarityOps.annTop1(spread(embeddings(s, d)), "vec_id", "embedding",
        dims = 64, planes = 16, bands = 4)
        .orderBy(col("id_a")),
    sql = Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      vb AS (
        SELECT vec_id, e,
               list_transform(range(0, 16), p ->
                 CASE WHEN list_sum(list_transform(range(0, 64), d ->
                        e[d+1] * $planeSql)) >= 0
                      THEN 1 ELSE 0 END) AS bits
        FROM v),
      banded AS (
        SELECT vec_id, e, band,
               bits[band*4+1]*8 + bits[band*4+2]*4
                 + bits[band*4+3]*2 + bits[band*4+4] AS bucket
        FROM vb, (SELECT unnest(range(0, 4)) AS band) bd),
      cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.vec_id <> b.vec_id),
      best AS (
        SELECT id_a, id_b, MAX(score) AS score
        FROM cand GROUP BY id_a, id_b),
      ranked AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM best)
      SELECT id_a, id_b AS ann_id, score FROM ranked WHERE rn = 1
      ORDER BY id_a"""),
    bench = true)

  /** Multi-probe LSH (IVF-flavored) ANN, oracle-checked end to end:
    * DuckDB re-derives the 6-bit hyperplane cell, the Hamming-1 probe
    * fan-out (`xor(cell, 1<<b)`), and the same top-1 tie-break.
    */
  val sim2MultiProbe = Q(
    "sim2_multiprobe_ann_top1",
    (s, d) =>
      graft.operators.SimilarityOps.multiProbeTop1(
        spread(embeddings(s, d)), "vec_id", "embedding",
        dims = 64, cellBits = 6)
        .orderBy(col("id_a")),
    sql = Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      vb AS (
        SELECT vec_id, e,
               list_transform(range(0, 6), p ->
                 CASE WHEN list_sum(list_transform(range(0, 64), d ->
                        e[d+1] * $planeSql)) >= 0
                      THEN 1 ELSE 0 END) AS bits
        FROM v),
      vc AS (
        SELECT vec_id, e,
               bits[1]*32 + bits[2]*16 + bits[3]*8
                 + bits[4]*4 + bits[5]*2 + bits[6] AS cell
        FROM vb),
      probes AS (
        SELECT vec_id AS id_a, e AS ea,
               unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4),
                       xor(cell, 8), xor(cell, 16), xor(cell, 32)]) AS cell
        FROM vc),
      cand AS (
        SELECT p.id_a, i.vec_id AS id_b,
               ROUND(list_cosine_similarity(p.ea, i.e), 6) AS score
        FROM probes p JOIN vc i
          ON p.cell = i.cell AND p.id_a <> i.vec_id),
      ranked AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM cand)
      SELECT id_a, id_b AS ann_id, score FROM ranked WHERE rn = 1
      ORDER BY id_a"""))

  /** ANN calibration readout (the sim-side twin of dd6): LSH top-1
    * (sim1's exact parameters) scored against the brute-force exact
    * top-1 — coverage (how many vectors got any candidate) and
    * recall@1 over the covered set, as one summary row. This is the
    * number an operator checks before trusting the ANN path at scale;
    * at 100 TB only the two top-1 relations (1 row/vector) meet here,
    * never pair sets.
    */
  val sim3Recall = Q(
    "sim3_ann_recall",
    (s, d) => {
      import graft.functions.VectorFunctions.{array_dot, array_norm}
      val v = spread(embeddings(s, d))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", array_norm(col("e")))
      val a = v.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("nrm").as("na"))
      val b = v.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("nrm").as("nb"))
      val exact = a.join(b, col("id_a") =!= col("id_b"))
        .select(col("id_a"),
          struct(
            round(array_dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
              .as("score"),
            (-col("id_b")).as("neg_id")).as("cand"))
        .groupBy(col("id_a"))
        .agg(max(col("cand")).as("best"))
        .select(col("id_a"), (-col("best.neg_id")).as("exact_id"))
      val ann = SimilarityOps.annTop1(v, "vec_id", "e",
        dims = 64, planes = 16, bands = 4)
        .select(col("id_a"), col("ann_id"))
      val n = v.count()
      ann.join(exact, "id_a")
        .agg(cnt.as("n_ann_covered"),
          sum(when(col("ann_id") === col("exact_id"), 1L).otherwise(0L))
            .as("n_top1_match"))
        .select(lit(n).as("n_vectors"), col("n_ann_covered"),
          col("n_top1_match"),
          round(col("n_top1_match").cast("double") / col("n_ann_covered"), 6)
            .as("recall_at_1"),
          round(col("n_ann_covered").cast("double") / n, 6).as("coverage"))
    },
    sql = Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
        FROM v a JOIN v b ON a.vec_id <> b.vec_id),
      exact AS (
        SELECT id_a, id_b AS exact_id FROM (
          SELECT id_a, id_b,
                 ROW_NUMBER() OVER (PARTITION BY id_a
                   ORDER BY score DESC, id_b) AS rn
          FROM scored) WHERE rn = 1),
      vb AS (
        SELECT vec_id, e,
               list_transform(range(0, 16), p ->
                 CASE WHEN list_sum(list_transform(range(0, 64), d ->
                        e[d+1] * $planeSql)) >= 0
                      THEN 1 ELSE 0 END) AS bits
        FROM v),
      banded AS (
        SELECT vec_id, e, band,
               bits[band*4+1]*8 + bits[band*4+2]*4
                 + bits[band*4+3]*2 + bits[band*4+4] AS bucket
        FROM vb, (SELECT unnest(range(0, 4)) AS band) bd),
      cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.vec_id <> b.vec_id),
      cbest AS (
        SELECT id_a, id_b, MAX(score) AS score
        FROM cand GROUP BY id_a, id_b),
      ann AS (
        SELECT id_a, id_b AS ann_id FROM (
          SELECT id_a, id_b,
                 ROW_NUMBER() OVER (PARTITION BY id_a
                   ORDER BY score DESC, id_b) AS rn
          FROM cbest) WHERE rn = 1),
      joined AS (
        SELECT ann.id_a, ann.ann_id, exact.exact_id
        FROM ann JOIN exact ON ann.id_a = exact.id_a)
      SELECT (SELECT COUNT(*) FROM v) AS n_vectors,
             COUNT(*) AS n_ann_covered,
             CAST(SUM(CASE WHEN ann_id = exact_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_top1_match,
             ROUND(CAST(SUM(CASE WHEN ann_id = exact_id THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS recall_at_1,
             ROUND(CAST(COUNT(*) AS DOUBLE)
               / (SELECT COUNT(*) FROM v), 6) AS coverage
      FROM joined"""))

  /** IVF-Flat ANN top-1 (k=16 deterministic centroids, nprobe=3),
    * oracle-checked end to end: DuckDB re-derives the same coarse
    * quantizer (centroids = the 16 lowest vec_ids, the library's
    * actual selection rule — ORDER BY vec_id LIMIT 16, independent of
    * the fixture's id layout), the same (cosine DESC, cid)
    * centroid ranking for list assignment (rank 1) and probes
    * (rank ≤ 3), and the same top-1 tie-break. Unlike banded LSH a
    * (query, index) pair meets in at most one inverted list, so the
    * oracle needs no pair-dedup stage. Recall/coverage at these
    * parameters CI-gated in `AnnRecallSpec` (measured 0.442 / 1.000).
    */
  val sim4IvfAnn = Q(
    "sim4_ivf_ann_top1",
    (s, d) =>
      SimilarityOps.ivfTop1(spread(embeddings(s, d)), "vec_id", "embedding",
        dims = 64, k = 16, nprobe = 3)
        .orderBy(col("id_a")),
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v
           ORDER BY vec_id LIMIT 16),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 3),
      cand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN v va ON va.vec_id = p.vec_id
        JOIN v vb ON vb.vec_id = a.vec_id),
      best AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM cand)
      SELECT id_a, id_b AS ann_id, score FROM best WHERE rn = 1
      ORDER BY id_a"""),
    bench = true)

  /** sim4's candidates cut at top-5 per query (the k>1 retrieval
    * shape); same quantizer/probes, rank = (score DESC, id ASC).
    */
  val sim5IvfTopK = Q(
    "sim5_ivf_ann_topk",
    (s, d) =>
      SimilarityOps.ivfTopK(spread(embeddings(s, d)), "vec_id", "embedding",
        dims = 64, k = 16, nprobe = 3, topK = 5)
        .orderBy(col("id_a"), col("rank")),
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v
           ORDER BY vec_id LIMIT 16),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 3),
      cand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN v va ON va.vec_id = p.vec_id
        JOIN v vb ON vb.vec_id = a.vec_id),
      topk AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rank
        FROM cand)
      SELECT id_a, rank, id_b AS nn_id, score
      FROM topk WHERE rank <= 5
      ORDER BY id_a, rank"""))

  /** One Lloyd refinement block for the sim6 oracle: assign every
    * vector to its nearest c{i-1} centroid (score DESC, cid — the same
    * 6dp tie-break as the engine's in-row array_sort), then recompute
    * each live centroid as the nano-exact per-dimension mean (em7's
    * BIGINT-units arithmetic, bit-identical across engines).
    */
  private def lloydIterSql(i: Int): String = s"""
      s$i AS (SELECT v.vec_id, c.cid, v.e,
                     ROUND(list_cosine_similarity(v.e, c.ce), 6) AS score
              FROM v CROSS JOIN c${i - 1} c),
      a$i AS (SELECT cid, e FROM (
                SELECT cid, e, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY score DESC, cid) AS rn
                FROM s$i) WHERE rn = 1),
      ex$i AS (SELECT cid, generate_subscripts(e, 1) - 1 AS dim,
                      unnest(e) AS x
               FROM a$i),
      uval$i AS (SELECT cid, dim,
                        CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS BIGINT))
                          AS DOUBLE) / (COUNT(*) * 1e9) AS cval
                 FROM ex$i GROUP BY cid, dim),
      c$i AS (SELECT cid, list(cval ORDER BY dim) AS ce
              FROM uval$i GROUP BY cid)"""

  /** sim4 with a TRAINED coarse quantizer: two Lloyd refinements of
    * the first-16 seeding
    * ([[graft.operators.SimilarityOps.trainCentroids]]) before
    * indexing — the IVF trainer real systems run (train the coarse
    * quantizer, then quantize). The probe/join plan is byte-identical
    * to sim4's (single-scan cached projection, ONE cid-keyed join);
    * only the centroid literal changes. The oracle re-derives both
    * halves independently: the two Lloyd iterations (em7's nano-exact
    * arithmetic) and then sim4's IVF assignment/probe/top-1 against
    * the trained centroids. Recall delta vs the first-k quantizer is
    * recorded in AnnRecallSpec: 0.550 vs 0.442 recall@1 at nprobe=3 on
    * the sf0.01 fixture (+0.108 — better-centered lists, same probe
    * budget, same plan).
    */
  val sim6IvfTrained = Q(
    "sim6_ivf_trained_top1",
    (s, d) =>
      SimilarityOps.ivfTop1Trained(spread(embeddings(s, d)), "vec_id",
        "embedding", dims = 64, k = 16, nprobe = 3, trainIters = 2)
        .orderBy(col("id_a")),
    sql = Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c0 AS (SELECT vec_id AS cid, e AS ce FROM v
             ORDER BY vec_id LIMIT 16),
      ${lloydIterSql(1)},
      ${lloydIterSql(2)},
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c2 c),
      ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 3),
      cand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN v va ON va.vec_id = p.vec_id
        JOIN v vb ON vb.vec_id = a.vec_id),
      best AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM cand)
      SELECT id_a, id_b AS ann_id, score FROM best WHERE rn = 1
      ORDER BY id_a"""))

  /** Idempotently build the stored IVF index for `d` (sim7 probes
    * it). Keyed on CATALOG existence, not a JVM memo — suites stop and
    * recreate the SparkContext (see ensureLshIndex).
    */
  def ensureIvfIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"sim_ivf_index_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t) ||
        !s.catalog.tableExists(t + "_centroids")) {
      SimilarityOps.writeIvfIndex(embeddings(s, d), "vec_id", "embedding",
        dims = 64, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_ivf_idx").toString))
    }
    t
  }

  /** sim4 served from a STORED index — the ANN serving shape (build
    * the index once per corpus snapshot, probe forever):
    * [[graft.operators.SimilarityOps.writeIvfIndex]] materializes the
    * inverted lists as a cid-bucketed sorted table + a k-row centroid
    * companion; the probe scores queries in-row against the stored
    * centroids and joins the lists BUCKET-ALIGNED — zero index-side
    * shuffle, zero corpus re-assignment per query batch (plan-gated).
    * Same selection rule and semantics as sim4, so sim4's oracle
    * verbatim — storage is an execution detail, not a semantics
    * change (dd11's discipline, applied to vectors).
    */
  val sim7IvfStored = Q(
    "sim7_ivf_stored_top1",
    (s, d) => {
      val t = ensureIvfIndex(s, d)
      SimilarityOps.probeIvfIndex(s, t, spread(embeddings(s, d)),
        "vec_id", "embedding", dims = 64, nprobe = 3)
        .orderBy(col("id_a"))
    },
    sql = sim4IvfAnn.sql)

  /** IVF-SQ8 top-1 (sim8): sim4's quantizer/probes, but the inverted
    * lists carry INT8 absmax-quantized vectors — candidates score by
    * exact INTEGER dot rescaled by the two absmax scales, the
    * quantized top-10 per query survive, and only those fetch float
    * vectors for the exact re-rank (the faiss production shape: 4-8×
    * less scan bandwidth where it matters, floats only at candidate
    * scale). Every stage exact-reproducible: quantization is
    * sign·min(127, ⌊|x|·127/amax + ½⌋) (integral before the cast, so
    * DuckDB's rounding CAST and Spark's truncating cast agree), the
    * int dot is exact, and rescale/rank mirror the sim-family 6dp
    * discipline.
    */
  val sim8IvfSq8 = Q(
    "sim8_ivf_sq8_top1",
    (s, d) =>
      SimilarityOps.ivfSq8Top1(spread(embeddings(s, d)), "vec_id",
        "embedding", dims = 64, k = 16, nprobe = 3, rerank = 10)
        .orderBy(col("id_a")),
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v
           ORDER BY vec_id LIMIT 16),
      q AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm,
               list_max(list_transform(e, x -> abs(x))) AS amax,
               list_transform(e, x -> CAST(sign(x) *
                 least(127.0, floor(abs(x) *
                   (127.0 / list_max(list_transform(e, y -> abs(y))))
                   + 0.5)) AS BIGINT)) AS qv
        FROM v),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 3),
      qcand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(CAST(list_sum(list_transform(range(1, 65),
                     i -> qa.qv[i] * qb.qv[i])) AS DOUBLE)
                 / ((127.0 / qa.amax) * (127.0 / qb.amax))
                 / (qa.nrm * qb.nrm), 6) AS qscore
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN q qa ON qa.vec_id = p.vec_id
        JOIN q qb ON qb.vec_id = a.vec_id),
      surv AS (
        SELECT id_a, id_b FROM (
          SELECT id_a, id_b,
                 ROW_NUMBER() OVER (PARTITION BY id_a
                   ORDER BY qscore DESC, id_b) AS rn
          FROM qcand) WHERE rn <= 10),
      rr AS (
        SELECT s.id_a, s.id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM surv s
        JOIN v va ON va.vec_id = s.id_a
        JOIN v vb ON vb.vec_id = s.id_b),
      best AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM rr)
      SELECT id_a, id_b AS ann_id, score FROM best WHERE rn = 1
      ORDER BY id_a"""))

  /** PRODUCT QUANTIZATION with ADC scan (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011, public) —
    * the remaining production-ANN compression shape next to IVF (sim4–
    * sim7) and SQ8 (sim8): the 64-dim space splits into M=4 subspaces
    * of 16 dims; each subspace has a K=16-entry codebook (the first 16
    * vectors' subvectors — em6's deterministic-codebook discipline);
    * every corpus vector compresses to 4 code bytes. A query never
    * touches corpus floats: it precomputes a 4×16 distance table
    * (dist² from its subvectors to every code, 6dp), and the corpus
    * scan is FOUR TABLE LOOKUPS + a DECIMAL-exact add per vector
    * (asymmetric distance computation), then the same map-side
    * min(struct) top-1 as em1. Exact cosine of the reported pair is
    * appended as the quality readout.
    *
    * Scale shape: the codebook (64 rows) broadcasts into a scan-local
    * encode; the query tables (queries × 4 rows) broadcast into the
    * ADC scan; the corpus shuffles only the per-(vec, subspace) argmin
    * — O(4·corpus) narrow rows — and the final top-1 agg moves one
    * struct per query per partition. The oracle re-derives codebooks,
    * encodings, tables, and the ADC argmin independently.
    */
  val sim9PqAdc = Q(
    "sim9_pq_adc_top1",
    (s, d) => {
      val M = 4; val K = 16; val sub = 16
      val v = EmbeddingQueries.vecs(s, d)
        .select(col("vec_id"), col("e"), col("nrm"))
      def dist2(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      def subvecs(e: org.apache.spark.sql.Column) =
        transform(sequence(lit(0), lit(M - 1)),
          j => slice(e, j * sub + 1, lit(sub)))
      val cb = v.filter(col("vec_id") < K)
        .select(col("vec_id").cast("int").as("c"),
          posexplode(subvecs(col("e"))))
        .select(col("pos").as("j"), col("c"), col("col").as("ce"))
      // encode: per (vector, subspace) argmin over the 16 codes —
      // broadcast join, map-side struct-min, then a 4-row-per-vec pivot
      val enc = v
        .select(col("vec_id"), posexplode(subvecs(col("e"))))
        .select(col("vec_id"), col("pos").as("j"), col("col").as("sv"))
        .join(broadcast(cb), Seq("j"))
        .select(col("vec_id"), col("j"),
          struct(round(dist2(col("sv"), col("ce")), 6).as("d"),
            col("c")).as("cand"))
        .groupBy(col("vec_id"), col("j"))
        .agg(min(col("cand")).as("best"))
        .groupBy(col("vec_id"))
        .agg(
          max(when(col("j") === 0, col("best.c"))).as("c0"),
          max(when(col("j") === 1, col("best.c"))).as("c1"),
          max(when(col("j") === 2, col("best.c"))).as("c2"),
          max(when(col("j") === 3, col("best.c"))).as("c3"))
      // query distance tables: t_j[c] = dist²(query subvec j, code c)
      val qtab = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), posexplode(subvecs(col("e"))))
        .select(col("query_id"), col("pos").as("j"), col("col").as("qv"))
        .join(broadcast(cb), Seq("j"))
        .select(col("query_id"), col("j"), col("c"),
          round(dist2(col("qv"), col("ce")), 6).as("dd"))
        .groupBy(col("query_id"), col("j"))
        .agg(transform(
          array_sort(collect_list(struct(col("c").as("c"),
            col("dd").as("dd")))),
          x => x.getField("dd")).as("t"))
        .groupBy(col("query_id"))
        .agg(
          max(when(col("j") === 0, col("t"))).as("t0"),
          max(when(col("j") === 1, col("t"))).as("t1"),
          max(when(col("j") === 2, col("t"))).as("t2"),
          max(when(col("j") === 3, col("t"))).as("t3"))
      def lu(t: String, c: String) =
        element_at(col(t), col(c) + 1).cast("decimal(18,6)")
      val best = enc.crossJoin(broadcast(qtab))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), struct(
          (lu("t0", "c0") + lu("t1", "c1") + lu("t2", "c2")
            + lu("t3", "c3")).cast("double").as("adc"),
          col("vec_id")).as("cand"))
        .groupBy(col("query_id"))
        .agg(min(col("cand")).as("best"))
        .select(col("query_id"), col("best.vec_id").as("best_id"),
          col("best.adc").as("adc_dist"))
      // exact-cosine readout of the reported pair: the result stays
      // queries-sized, so IT broadcasts into each corpus-side vector
      // fetch (never the corpus into it)
      val withQ = v
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qn"))
        .join(broadcast(best), Seq("query_id"))
      v.select(col("vec_id").as("best_id"), col("e").as("be"),
          col("nrm").as("bn"))
        .join(broadcast(withQ), Seq("best_id"))
        .select(col("query_id"), col("best_id"), col("adc_dist"),
          round(graft.functions.VectorFunctions
            .array_dot(col("qe"), col("be")) / (col("qn") * col("bn")),
            6).as("cos_exact"))
        .orderBy(col("query_id"))
    },
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      sub AS (SELECT unnest(range(0, 4)) AS j),
      cb AS (
        SELECT j, vec_id AS c, list_slice(e, j*16 + 1, j*16 + 16) AS ce
        FROM v, sub WHERE vec_id < 16),
      encd AS (
        SELECT v.vec_id, cb.j, cb.c,
               ROUND(list_sum(list_transform(range(0, 16),
                 i -> (e[cb.j*16 + i + 1] - ce[i+1])
                      * (e[cb.j*16 + i + 1] - ce[i+1]))), 6) AS d2
        FROM v JOIN cb ON TRUE),
      enc AS (
        SELECT vec_id, j, c FROM (
          SELECT vec_id, j, c,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY d2, c) AS rn
          FROM encd) WHERE rn = 1),
      qtab AS (
        SELECT vec_id AS query_id, j, c, d2 AS dd
        FROM encd WHERE vec_id < 8),
      adcs AS (
        SELECT t.query_id, e.vec_id,
               CAST(SUM(CAST(t.dd AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e JOIN qtab t ON t.j = e.j AND t.c = e.c
        WHERE e.vec_id <> t.query_id
        GROUP BY t.query_id, e.vec_id),
      best AS (
        SELECT query_id, vec_id AS best_id, adc,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY adc, vec_id) AS rn
        FROM adcs)
      SELECT b.query_id, b.best_id, b.adc AS adc_dist,
             ROUND(list_cosine_similarity(qv.e, bv.e), 6) AS cos_exact
      FROM best b
      JOIN v qv ON qv.vec_id = b.query_id
      JOIN v bv ON bv.vec_id = b.best_id
      WHERE b.rn = 1
      ORDER BY b.query_id"""))

  /** DELETE-bearing maintenance of the stored IVF index (sim10): a
    * changelog with hard deletes flows into the versioned inverted
    * lists via [[graft.operators.BucketedStores.applyDeltaAtomic]]
    * (next generation = lists minus the deleted ids, ONE view-flip;
    * the k-row centroid companion is untouched — deletes never retrain
    * a coarse quantizer), and the surviving vectors then probe the
    * maintained index. The oracle re-derives the answer from the
    * POST-delete corpus against the ORIGINAL centroid definition
    * (first 16 of the full table — deletion does not move centroids):
    * a cross-engine rebuild-equivalence row proving no deleted vector
    * can ever be returned as a neighbor (IndexDeleteSpec proves they
    * otherwise would be, so the check is not vacuous). Rebuilt per
    * run: deletes make the mutation non-idempotent (sim7's
    * ensure-cache would serve a stale generation).
    */
  val sim10IvfDeletes = Q(
    "sim10_ivf_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_ivf_del_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_centroids")
      SimilarityOps.writeIvfIndex(embeddings(s, d), "vec_id", "embedding",
        dims = 64, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_ivf_del").toString))
      BucketedStores.adoptVersioned(s, t)
      val deleteIds = embeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("vid"))
      BucketedStores.applyDeltaAtomic(s, t, Seq("cid"), Seq("cid"),
        buckets = 8, idCol = "vid", removeIds = deleteIds,
        additions = None)
      val survivors = embeddings(s, d).filter(col("vec_id") % 7 =!= 3)
      SimilarityOps.probeIvfIndex(s, t, spread(survivors), "vec_id",
        "embedding", dims = 64, nprobe = 3)
        .orderBy(col("id_a"))
    },
    sql = Some(ivfDeleteOracleSql))

  /** The ANN answer rebuilt from the post-delete corpus against the
    * original centroids — shared by sim10 (copy-on-write delete) and
    * sim11 (merge-on-read tombstones): both must return it exactly.
    */
  private def ivfDeleteOracleSql: String = """
      WITH vall AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM vall
           ORDER BY vec_id LIMIT 16),
      v AS (SELECT * FROM vall WHERE vec_id % 7 <> 3),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 3),
      cand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN v va ON va.vec_id = p.vec_id
        JOIN v vb ON vb.vec_id = a.vec_id),
      best AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM cand)
      SELECT id_a, id_b AS ann_id, score FROM best WHERE rn = 1
      ORDER BY id_a"""

  /** sim10 under MERGE-ON-READ maintenance (sim11): the index is
    * built with `_seq`-stamped lists serving through the tombstone
    * view ([[graft.operators.SimilarityOps.writeIvfIndex]] `mor`),
    * and the delete changelog APPENDS (vid, seq) tombstones
    * ([[graft.operators.BucketedStores.morDelete]]) — no list
    * generation is rewritten, the centroid companion never changes.
    * Same oracle as sim10: both maintenance disciplines must return
    * the identical post-delete neighbors, and no tombstoned vector
    * may ever surface.
    */
  val sim11IvfMorDeletes = Q(
    "sim11_ivf_mor_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_ivf_mor_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_centroids")
      SimilarityOps.writeIvfIndex(embeddings(s, d), "vec_id", "embedding",
        dims = 64, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_ivf_mor").toString), mor = true)
      val deleteIds = embeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("vid"))
      BucketedStores.morDelete(s, t, deleteIds,
        BucketedStores.morNextSeq(s, t))
      val survivors = embeddings(s, d).filter(col("vec_id") % 7 =!= 3)
      SimilarityOps.probeIvfIndex(s, t, spread(survivors), "vec_id",
        "embedding", dims = 64, nprobe = 3)
        .orderBy(col("id_a"))
    },
    sql = Some(ivfDeleteOracleSql))

  /** sim12: sim7's stored-index serving as PURE SQL TEXT — the
    * `GRAFT_ANN('<index>', '<queries>', k, nprobe)` table-valued macro
    * ([[org.apache.spark.sql.graft.GraftAnnRewrite]]) expands at parse
    * time into the same probe plan class probeIvfIndex builds
    * (bucket-aligned list scan, broadcast centroid companion,
    * query-scale shuffle only). Same index, same nprobe, same
    * selection rule — so sim4's oracle verbatim, the third surface
    * (API → stored API → SQL text) over one semantics.
    */
  val sim12AnnSql = Q(
    "sim12_ann_sql_top1",
    (s, d) => {
      val t = ensureIvfIndex(s, d)
      spread(embeddings(s, d)).createOrReplaceTempView("sim12_queries")
      s.sql("SELECT id_a, ann_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim12_queries', 1, 3) ORDER BY id_a")
    },
    bench = true, // tracks the SQL macro's cost against sim4's API path
    sql = sim4IvfAnn.sql)

  /** Idempotently build the stored IVF-SQ8 index for `d` (sim13
    * probes it) — catalog-keyed like [[ensureIvfIndex]].
    */
  def ensureSq8Index(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"sim_sq8_index_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t) ||
        !s.catalog.tableExists(t + "_centroids") ||
        !s.catalog.tableExists(t + "_vecs")) {
      SimilarityOps.writeIvfSq8Index(embeddings(s, d), "vec_id",
        "embedding", dims = 64, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_sq8_idx").toString))
    }
    t
  }

  /** sim8 served from a STORED quantized index — the bandwidth-
    * optimized serving shape made durable
    * ([[graft.operators.SimilarityOps.writeIvfSq8Index]]): the
    * cid-bucketed lists carry 1-byte/dim INT8 vectors (4-8× less scan
    * bandwidth than the float lists — at 100 TB, memory-resident vs
    * disk-bound), probes join bucket-aligned with zero index-side
    * shuffle, the integer dot is exact, and only the quantized
    * top-`rerank` fetch floats from the vid-bucketed `_vecs`
    * companion. Same quantization/probe/tie-break as sim8, so sim8's
    * oracle verbatim — storage is an execution detail (sim7's
    * discipline, applied to the quantized tier).
    */
  val sim13Sq8Stored = Q(
    "sim13_ivf_sq8_stored_top1",
    (s, d) => {
      val t = ensureSq8Index(s, d)
      SimilarityOps.probeIvfSq8Index(s, t, spread(embeddings(s, d)),
        "vec_id", "embedding", dims = 64, nprobe = 3, rerank = 10)
        .orderBy(col("id_a"))
    },
    bench = true, // tracks the quantized tier's stored-probe cost
    sql = sim8IvfSq8.sql)

  /** sim14: the quantized tier's SQL serving — sim13's stored-SQ8
    * probe as PURE SQL TEXT via GRAFT_ANN's 5-arg form
    * (`GRAFT_ANN('<sq8_index>', '<queries>', k, nprobe, rerank)`):
    * int8 scan kernel + in-row quantization + exact-float re-rank,
    * all registered codegen'd expressions in stock grammar. Same
    * semantics as sim8/sim13, so sim8's oracle verbatim — the
    * quantized tier now has the full surface (in-memory API → stored
    * API → SQL text) the float tier has.
    */
  val sim14Sq8AnnSql = Q(
    "sim14_sq8_ann_sql_top1",
    (s, d) => {
      val t = ensureSq8Index(s, d)
      spread(embeddings(s, d)).createOrReplaceTempView("sim14_queries")
      s.sql("SELECT id_a, ann_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim14_queries', 1, 3, 10) ORDER BY id_a")
    },
    bench = true, // SQL form vs sim13's API path, sim12's discipline
    sql = sim8IvfSq8.sql)

  /** sim15: the QUANTIZED tier under sim10's delete-bearing
    * maintenance — lifecycle parity made checkable. The stored SQ8
    * index adopts into versioned serving, a hard-delete changelog
    * flows through [[graft.operators.BucketedStores
    * .applyDeltaAtomic]] (next generation = INT8 lists minus deleted
    * vids, ONE view flip; neither companion changes — deletes retrain
    * nothing, and every swap pins per-generation snapshots of BOTH
    * companions), and the survivors probe the maintained store with
    * rerank covering every candidate, where SQ8 == the float probe
    * EXACTLY (the correctness envelope: the quantized pass only
    * prunes, the exact re-rank decides). Oracle: sim10's
    * rebuild-equivalence SQL verbatim — the post-delete answer from
    * scratch, so no deleted vector can surface and the quantized
    * maintenance path equals a from-scratch float rebuild.
    */
  val sim15Sq8Deletes = Q(
    "sim15_sq8_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_sq8_del_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_centroids")
      s.sql(s"DROP TABLE IF EXISTS ${t}_vecs")
      SimilarityOps.writeIvfSq8Index(embeddings(s, d), "vec_id",
        "embedding", dims = 64, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_sq8_del").toString))
      BucketedStores.adoptVersioned(s, t)
      val deleteIds = embeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("vid"))
      BucketedStores.applyDeltaAtomic(s, t, Seq("cid"), Seq("cid"),
        buckets = 8, idCol = "vid", removeIds = deleteIds,
        additions = None)
      val survivors = embeddings(s, d).filter(col("vec_id") % 7 =!= 3)
      SimilarityOps.probeIvfSq8Index(s, t, spread(survivors), "vec_id",
        "embedding", dims = 64, nprobe = 3, rerank = 4096)
        .orderBy(col("id_a"))
    },
    sql = Some(ivfDeleteOracleSql))

  /** sim16: sim15 under MERGE-ON-READ — the quantized lists are
    * `_seq`-stamped and serve through the tombstone view
    * ([[SimilarityOps.writeIvfSq8Index]] `mor`), deletes APPEND
    * (vid, seq) tombstones ([[graft.operators.BucketedStores
    * .morDelete]]): no INT8 list generation is rewritten, no
    * companion changes. Same oracle as sim10/sim11/sim15: every
    * maintenance discipline across both tiers returns the identical
    * post-delete neighbors.
    */
  val sim16Sq8MorDeletes = Q(
    "sim16_sq8_mor_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_sq8_mor_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_centroids")
      s.sql(s"DROP TABLE IF EXISTS ${t}_vecs")
      SimilarityOps.writeIvfSq8Index(embeddings(s, d), "vec_id",
        "embedding", dims = 64, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_sq8_mor").toString), mor = true)
      val deleteIds = embeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("vid"))
      BucketedStores.morDelete(s, t, deleteIds,
        BucketedStores.morNextSeq(s, t))
      val survivors = embeddings(s, d).filter(col("vec_id") % 7 =!= 3)
      SimilarityOps.probeIvfSq8Index(s, t, spread(survivors), "vec_id",
        "embedding", dims = 64, nprobe = 3, rerank = 4096)
        .orderBy(col("id_a"))
    },
    sql = Some(ivfDeleteOracleSql))

  /** sim17: the stored PRODUCT-QUANTIZED tier end to end — sim9's PQ
    * (m = 4 subspaces × 16 codes, the exact argmin-of-6dp-L2 encode
    * rule) as DURABLE storage ([[SimilarityOps.writePqIndex]]: m
    * bytes/vector code rows, `_codebooks` + `_vecs` companions, all
    * build-stamped), probed by asymmetric distance (per-query
    * distance tables, m lookups per corpus row) with the exact-cosine
    * re-rank on the quantized survivors. With rerank covering every
    * candidate the ADC pass only PRUNES (nothing), so the answer IS
    * exact brute-force cosine top-1 — em1's oracle shape — proving
    * the full store→probe→refine pipeline against an independent
    * engine. The recall of BOUNDED rerank is gated separately
    * (AnnRecallSpec).
    */
  val sim17PqStored = Q(
    "sim17_pq_stored_top1",
    (s, d) => {
      val t = s"sim_pq_idx_${Integer.toHexString(d.hashCode)}"
      if (!s.catalog.tableExists(t) ||
          !s.catalog.tableExists(t + "_codebooks") ||
          !s.catalog.tableExists(t + "_vecs")) {
        SimilarityOps.writePqIndex(embeddings(s, d), "vec_id",
          "embedding", dims = 64, m = 4, codes = 16, table = t,
          location = Some(java.nio.file.Files
            .createTempDirectory("graft_pq_idx").toString))
      }
      SimilarityOps.probePqIndex(s, t, spread(embeddings(s, d)),
        "vec_id", "embedding", dims = 64, rerank = 4096)
        .orderBy(col("id_a"))
    },
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
        FROM v a JOIN v b ON a.vec_id <> b.vec_id),
      ranked AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM scored)
      SELECT id_a, id_b AS ann_id, score FROM ranked WHERE rn = 1
      ORDER BY id_a"""))

  /** sim18: the PQ tier under MERGE-ON-READ deletes — the code table
    * is `_seq`-stamped and serves through the tombstone view
    * ([[SimilarityOps.writePqIndex]] `mor`), the delete changelog
    * appends tombstones, no code row is rewritten and no companion
    * changes (PQ codes are self-contained per row). Full-rerank probe
    * of the survivors == exact cosine top-1 over the post-delete
    * corpus, from scratch, cross-engine.
    */
  val sim18PqMorDeletes = Q(
    "sim18_pq_mor_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_pq_mor_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_codebooks")
      s.sql(s"DROP TABLE IF EXISTS ${t}_vecs")
      SimilarityOps.writePqIndex(embeddings(s, d), "vec_id",
        "embedding", dims = 64, m = 4, codes = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_pq_mor").toString), mor = true)
      val deleteIds = embeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("vid"))
      BucketedStores.morDelete(s, t, deleteIds,
        BucketedStores.morNextSeq(s, t))
      val survivors = embeddings(s, d).filter(col("vec_id") % 7 =!= 3)
      SimilarityOps.probePqIndex(s, t, spread(survivors),
        "vec_id", "embedding", dims = 64, rerank = 4096)
        .orderBy(col("id_a"))
    },
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings WHERE vec_id % 7 <> 3),
      scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
        FROM v a JOIN v b ON a.vec_id <> b.vec_id),
      ranked AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM scored)
      SELECT id_a, id_b AS ann_id, score FROM ranked WHERE rn = 1
      ORDER BY id_a"""))

  /** sim19: the PQ tier's SQL serving — sim17's stored-PQ probe as
    * PURE SQL TEXT via GRAFT_ANN's PQ dispatch (a `codes` store with
    * nprobe pinned to 1: the ADC scan is flat). Same store, same
    * rerank, same selection rules — sim17's exact-top-1 oracle
    * verbatim, completing the API → stored → SQL surface symmetry
    * for the third quantization tier.
    */
  val sim19PqAnnSql = Q(
    "sim19_pq_ann_sql_top1",
    (s, d) => {
      val t = s"sim_pq_idx_${Integer.toHexString(d.hashCode)}"
      if (!s.catalog.tableExists(t) ||
          !s.catalog.tableExists(t + "_codebooks") ||
          !s.catalog.tableExists(t + "_vecs")) {
        SimilarityOps.writePqIndex(embeddings(s, d), "vec_id",
          "embedding", dims = 64, m = 4, codes = 16, table = t,
          location = Some(java.nio.file.Files
            .createTempDirectory("graft_pq_idx").toString))
      }
      spread(embeddings(s, d)).createOrReplaceTempView("sim19_queries")
      s.sql("SELECT id_a, ann_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim19_queries', 1, 1, 4096) ORDER BY id_a")
    },
    sql = sim17PqStored.sql)

  /** Idempotently build the stored IVF-PQ index for `d` (sim20/sim21
    * probe it) — catalog-keyed like [[ensureIvfIndex]].
    */
  def ensureIvfPqIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"sim_ivfpq_idx_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t) ||
        !s.catalog.tableExists(t + "_centroids") ||
        !s.catalog.tableExists(t + "_codebooks") ||
        !s.catalog.tableExists(t + "_vecs")) {
      SimilarityOps.writeIvfPqIndex(embeddings(s, d), "vec_id",
        "embedding", dims = 64, m = 4, codes = 16, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_ivfpq_idx").toString))
    }
    t
  }

  /** sim20: IVF-PQ — coarse inverted lists OVER the PQ codes
    * ([[graft.operators.SimilarityOps.writeIvfPqIndex]], the faiss
    * IndexIVFPQ composition that closes the flat ADC scan's
    * corpus-proportional serving cost: per-query candidates drop to
    * nprobe·n/k while the scan bytes stay m per candidate). Same
    * first-16 coarse quantizer and (cosine DESC, cid) probe rule as
    * every IVF tier; ADC prunes within the probed lists; exact-cosine
    * re-rank decides. With rerank covering every probed candidate the
    * ADC pass prunes NOTHING, so the answer equals the float IVF
    * probe over the same lists — sim4's oracle VERBATIM, proving the
    * coarse layout, the code path, and the refine pipeline in one
    * cross-engine row. Bounded-rerank recall is gated in
    * AnnRecallSpec.
    */
  val sim20IvfPqStored = Q(
    "sim20_ivf_pq_stored_top1",
    (s, d) => {
      val t = ensureIvfPqIndex(s, d)
      SimilarityOps.probeIvfPqIndex(s, t, spread(embeddings(s, d)),
        "vec_id", "embedding", dims = 64, nprobe = 3, rerank = 4096)
        .orderBy(col("id_a"))
    },
    bench = true, // tracks the probed-list PQ serving cost
    sql = sim4IvfAnn.sql)

  /** sim21: IVF-PQ's SQL serving — sim20's probe as PURE SQL TEXT via
    * GRAFT_ANN's IVF-PQ dispatch (a `codes` store WITH a `cid` column
    * probes its nprobe nearest lists, unlike the flat PQ store's
    * pinned nprobe=1). Same store, same nprobe/rerank, same selection
    * rules — sim4's oracle verbatim, completing the API → stored →
    * SQL symmetry for the fourth index layout.
    */
  val sim21IvfPqAnnSql = Q(
    "sim21_ivfpq_ann_sql_top1",
    (s, d) => {
      val t = ensureIvfPqIndex(s, d)
      spread(embeddings(s, d)).createOrReplaceTempView("sim21_queries")
      s.sql("SELECT id_a, ann_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim21_queries', 1, 3, 4096) ORDER BY id_a")
    },
    sql = sim4IvfAnn.sql)

  /** sim22: IVF-PQ under MERGE-ON-READ deletes — the code lists are
    * `_seq`-stamped and serve through the tombstone view, deletes
    * append (vid, seq) tombstones, and NEITHER quantizer changes
    * (codes encode the raw vector, so they are valid under any list
    * membership — the no-retrain contract holds on both quantizers at
    * once). Full-rerank probe of the survivors == the float IVF
    * probe over the post-delete corpus — sim10/11/15/16's oracle
    * verbatim: every maintenance discipline across ALL FOUR index
    * layouts returns the identical post-delete neighbors.
    */
  val sim22IvfPqMorDeletes = Q(
    "sim22_ivfpq_mor_delete_maintenance",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_ivfpq_mor_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_centroids")
      s.sql(s"DROP TABLE IF EXISTS ${t}_codebooks")
      s.sql(s"DROP TABLE IF EXISTS ${t}_vecs")
      SimilarityOps.writeIvfPqIndex(embeddings(s, d), "vec_id",
        "embedding", dims = 64, m = 4, codes = 16, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_ivfpq_mor").toString), mor = true)
      val deleteIds = embeddings(s, d)
        .filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("vid"))
      BucketedStores.morDelete(s, t, deleteIds,
        BucketedStores.morNextSeq(s, t))
      val survivors = embeddings(s, d).filter(col("vec_id") % 7 =!= 3)
      SimilarityOps.probeIvfPqIndex(s, t, spread(survivors), "vec_id",
        "embedding", dims = 64, nprobe = 3, rerank = 4096)
        .orderBy(col("id_a"))
    },
    sql = Some(ivfDeleteOracleSql))

  /** sim23: IVF-PQ's SQL serving at k>1 — the retrieval cut real
    * pipelines run, through GRAFT_ANN's bounded `topk_pairs` tail
    * (never a candidate window). With rerank covering every probed
    * candidate the exact-cosine scores and the (score DESC, id) cut
    * equal the float IVF top-5 over the same lists — sim5's oracle
    * verbatim (columns renamed to its shape).
    */
  val sim23IvfPqTopK = Q(
    "sim23_ivfpq_sql_topk",
    (s, d) => {
      val t = ensureIvfPqIndex(s, d)
      spread(embeddings(s, d)).createOrReplaceTempView("sim23_queries")
      s.sql("SELECT id_a, CAST(rank AS BIGINT) AS rank, " +
        "ann_id AS nn_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim23_queries', 5, 3, 4096) " +
        "ORDER BY id_a, rank")
    },
    sql = sim5IvfTopK.sql)

  /** sim24: IVF-PQ at BOUNDED rerank (nprobe=3, rerank=10) — the
    * production serving shape, where the ADC cut actually DECIDES the
    * answer (sim20/sim21 prove the tier only at full rerank, where ADC
    * prunes nothing). The oracle re-derives the entire composition
    * independently: sim4's coarse half (first-16 centroids, (cosine
    * DESC, cid) assignment rank 1 / probes rank ≤ 3) feeding sim9's
    * ADC half (first-16 codebooks, 6-dp subspace-L2 encode with
    * ties-to-smaller-code, per-query distance tables, DECIMAL-exact
    * 4-lookup sums), then the (adc ASC, id ASC) top-10 rerank cut and
    * the exact-cosine (score DESC, id ASC) winner. A hash match here
    * pins the ranking the codegen'd `pq_adc` kernel + bounded
    * `topk_pairs` survivors produce at rerank ≪ list size —
    * cross-engine, not just recall-gated.
    */
  val sim24IvfPqBoundedRerank = Q(
    "sim24_ivfpq_bounded_rerank",
    (s, d) => {
      val t = ensureIvfPqIndex(s, d)
      SimilarityOps.probeIvfPqIndex(s, t, spread(embeddings(s, d)),
        "vec_id", "embedding", dims = 64, nprobe = 3, rerank = 10)
        .orderBy(col("id_a"))
    },
    bench = true, // tracks the bounded-rerank (production) serving cost
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v
           ORDER BY vec_id LIMIT 16),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      cranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM cranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM cranked WHERE rn <= 3),
      sub AS (SELECT unnest(range(0, 4)) AS j),
      cb AS (
        SELECT j, vec_id AS c, list_slice(e, j*16 + 1, j*16 + 16) AS ce
        FROM v, sub WHERE vec_id < 16),
      encd AS (
        SELECT v.vec_id, cb.j, cb.c,
               ROUND(list_sum(list_transform(range(0, 16),
                 i -> (e[cb.j*16 + i + 1] - ce[i+1])
                      * (e[cb.j*16 + i + 1] - ce[i+1]))), 6) AS d2
        FROM v JOIN cb ON TRUE),
      enc AS (
        SELECT vec_id, j, c FROM (
          SELECT vec_id, j, c,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY d2, c) AS rn
          FROM encd) WHERE rn = 1),
      adcs AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               CAST(SUM(CAST(t.d2 AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN enc e ON e.vec_id = a.vec_id
        JOIN encd t ON t.vec_id = p.vec_id AND t.j = e.j AND t.c = e.c
        GROUP BY p.vec_id, a.vec_id),
      surv AS (
        SELECT id_a, id_b FROM (
          SELECT id_a, id_b,
                 ROW_NUMBER() OVER (PARTITION BY id_a
                   ORDER BY adc, id_b) AS rn
          FROM adcs) WHERE rn <= 10),
      rer AS (
        SELECT s.id_a, s.id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM surv s
        JOIN v va ON va.vec_id = s.id_a
        JOIN v vb ON vb.vec_id = s.id_b),
      best AS (
        SELECT id_a, id_b, score,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS rn
        FROM rer)
      SELECT id_a, id_b AS ann_id, score FROM best WHERE rn = 1
      ORDER BY id_a"""))

  /** sim25: the delta-ADD lifecycle on a merge-on-read IVF-PQ store —
    * the last manual edge of quantized maintenance closed. The store
    * is built over a PREFIX of the corpus (vec_id < 400, which
    * contains both first-16 quantizers, so the frozen quantizers
    * equal a one-shot build's), the remaining vectors arrive as a
    * delta through [[SimilarityOps.morAppendToIvfPqIndex]]
    * (frozen-quantizer encode + float companion + `_seq`-stamped
    * bucket-aligned code append — never a list rewrite), and the
    * appended store serves THROUGH THE SQL SURFACE. With rerank
    * covering every probed candidate the answer equals a fresh
    * one-shot index over the full corpus — sim4's oracle verbatim:
    * append maintenance is invisible to serving, cross-engine.
    */
  val sim25IvfPqMorAppend = Q(
    "sim25_ivfpq_mor_append_lifecycle",
    (s, d) => {
      import graft.operators.BucketedStores
      val t = s"sim_ivfpq_app_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      s.sql(s"DROP TABLE IF EXISTS ${t}_centroids")
      s.sql(s"DROP TABLE IF EXISTS ${t}_codebooks")
      s.sql(s"DROP TABLE IF EXISTS ${t}_vecs")
      val base = embeddings(s, d).filter(col("vec_id") < 400)
      val delta = embeddings(s, d).filter(col("vec_id") >= 400)
      SimilarityOps.writeIvfPqIndex(base, "vec_id", "embedding",
        dims = 64, m = 4, codes = 16, k = 16, table = t,
        location = Some(java.nio.file.Files
          .createTempDirectory("graft_ivfpq_app").toString), mor = true)
      SimilarityOps.morAppendToIvfPqIndex(s, t, delta, "vec_id",
        "embedding", dims = 64)
      spread(embeddings(s, d)).createOrReplaceTempView("sim25_queries")
      s.sql("SELECT id_a, ann_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim25_queries', 1, 3, 4096) ORDER BY id_a")
    },
    sql = sim4IvfAnn.sql)

  /** sim26: the SQ8 tier's SQL top-k (sim23's shape on the second
    * quantized layout): GRAFT_ANN's 5-arg SQ8 dispatch cut at k=5.
    * With rerank covering every probed candidate the exact-cosine
    * scores and (score DESC, id) ranking equal the float IVF top-5
    * over the same lists — sim5's oracle verbatim. Every quantized
    * tier now serves SQL top-k, not just top-1.
    */
  val sim26Sq8TopK = Q(
    "sim26_sq8_sql_topk",
    (s, d) => {
      val t = ensureSq8Index(s, d)
      spread(embeddings(s, d)).createOrReplaceTempView("sim26_queries")
      s.sql("SELECT id_a, CAST(rank AS BIGINT) AS rank, " +
        "ann_id AS nn_id, score FROM " +
        s"GRAFT_ANN('$t', 'sim26_queries', 5, 3, 4096) " +
        "ORDER BY id_a, rank")
    },
    sql = sim5IvfTopK.sql)

  val all: Seq[Q] = Seq(sim1LshAnn, sim2MultiProbe, sim3Recall, sim4IvfAnn,
    sim5IvfTopK, sim6IvfTrained, sim7IvfStored, sim8IvfSq8, sim9PqAdc,
    sim10IvfDeletes, sim11IvfMorDeletes, sim12AnnSql, sim13Sq8Stored,
    sim14Sq8AnnSql, sim15Sq8Deletes, sim16Sq8MorDeletes, sim17PqStored,
    sim18PqMorDeletes, sim19PqAnnSql, sim20IvfPqStored, sim21IvfPqAnnSql,
    sim22IvfPqMorDeletes, sim23IvfPqTopK, sim24IvfPqBoundedRerank,
    sim25IvfPqMorAppend, sim26Sq8TopK)
}
