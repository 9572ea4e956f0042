package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import Q._
import Tables._

/** Similarity / vector operators over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Everything computes in DOUBLE (floats widened first) so the DuckDB
  * oracle — also computing in DOUBLE — agrees; scores are rounded to 6
  * decimals on both sides, and orderings tie-break on ids AFTER
  * rounding, so a 1e-15 accumulation difference can never flip a row.
  *
  * Vector kernels are the codegen'd Catalyst expressions in
  * [[graft.functions.VectorFunctions]] (a tight primitive loop inside
  * whole-stage codegen), with norms computed once per vector, not per
  * pair — this is what makes the O(n²) baseline usable and the LSH
  * variant fast.
  *
  * Scale notes: brute-force k-NN is the O(n²) correctness baseline;
  * the 100 TB path is sim1_lsh_ann in [[SimilarityQueries]] (bucketed
  * candidate generation, near-linear).
  */
object EmbeddingQueries {

  /** vec_id, label, e (array<double>), nrm (L2 norm, computed once). */
  def vecs(s: SparkSession, d: String): DataFrame =
    spread(embeddings(s, d)).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", array_norm(col("e")))

  /** Brute-force nearest neighbor (top-1 by cosine) for every vector —
    * the exact baseline for ANN. Cross join is intentional here.
    */
  val em1Knn = Q(
    "em1_knn_top1",
    (s, d) => {
      val v = vecs(s, d)
      val a = v.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("nrm").as("na"))
      val b = v.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("nrm").as("nb"))
      // top-1 as max(struct(score, -id)) — a map-side-combinable hash
      // aggregate (n² pair rows never shuffle; only one struct per id_a
      // per partition does), vs a window that shuffles+sorts all pairs.
      // Tie-break equals the oracle's ORDER BY score DESC, id_b ASC.
      a.join(b, col("id_a") =!= col("id_b"))
        .select(col("id_a"),
          struct(
            round(array_dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
              .as("score"),
            (-col("id_b")).as("neg_id")).as("cand"))
        .groupBy(col("id_a"))
        .agg(max(col("cand")).as("best"))
        .select(col("id_a"), (-col("best.neg_id")).as("nn_id"),
          col("best.score").as("score"))
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
      SELECT id_a, id_b AS nn_id, score FROM ranked WHERE rn = 1
      ORDER BY id_a"""),
    bench = true)

  /** Embedding near-duplicate pairs: cosine above threshold, each pair
    * once (id_a < id_b). Routed through the blocked exact similarity
    * join — an equi-join on block-pair keys that spreads the inherent
    * O(n²) comparisons evenly across the cluster (no theta-join / no
    * BroadcastNestedLoopJoin; see
    * [[graft.operators.SimilarityOps.cosineThresholdJoin]] for why LSH
    * cannot prune at this threshold on this data).
    */
  val em2NearDup = Q(
    "em2_embedding_near_dup",
    (s, d) =>
      graft.operators.SimilarityOps.cosineThresholdJoin(
        spread(embeddings(s, d)), "vec_id", "embedding",
        threshold = 0.35, blocks = 8)
        .orderBy(col("id_a"), col("id_b")),
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.35
      ORDER BY id_a, id_b"""))

  /** Per-label centroids, one row per (label, dim): distributed via
    * posexplode + hash agg — no driver materialization, scales linearly
    * in rows × dims. DECIMAL-routed sums keep it order-independent.
    */
  val em3Centroids = Q(
    "em3_label_centroids",
    (s, d) =>
      vecs(s, d)
        .select(col("label"), posexplode(col("e")).as(Seq("dim", "x")))
        // explicit nano-unit quantization (floor(x·1e9 + 0.5), the em5
        // pattern) instead of a DECIMAL cast: a double sitting exactly
        // on a decimal's half-ulp boundary rounds HALF_UP in Spark but
        // can differ in other engines — floor arithmetic is identical
        // IEEE everywhere, and the BIGINT sum is exact
        .groupBy(col("label"), col("dim"))
        .agg(cnt.as("n"),
          sum(floor(col("x") * 1e9 + 0.5).cast("long")).as("units"))
        .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
          (col("units").cast("double") / (col("n") * 1e9)).as("centroid"))
        .orderBy(col("label"), col("dim")),
    sql = Some("""
      WITH ex AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               unnest(CAST(embedding AS DOUBLE[])) AS x
        FROM embeddings)
      SELECT label, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
             CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1e9) AS centroid
      FROM ex
      GROUP BY label, dim
      ORDER BY label, dim"""))

  /** Vector norms + per-label extremes — scan-only vector arithmetic
    * through the codegen'd norm kernel.
    */
  val em4Norms = Q(
    "em4_norm_stats",
    (s, d) =>
      vecs(s, d)
        .select(col("label"), round(col("nrm"), 6).as("nrm"))
        .groupBy(col("label"))
        .agg(cnt.as("n"), max(col("nrm")).as("max_norm"),
          min(col("nrm")).as("min_norm"))
        .orderBy(col("label")),
    sql = Some("""
      WITH v AS (SELECT label,
                   ROUND(sqrt(list_sum(list_transform(
                     CAST(embedding AS DOUBLE[]), x -> x*x))), 6) AS nrm
                 FROM embeddings)
      SELECT label, COUNT(*) AS n, MAX(nrm) AS max_norm,
             MIN(nrm) AS min_norm
      FROM v
      GROUP BY label
      ORDER BY label"""))

  /** Int8 scalar quantization of embeddings with reconstruction-error
    * accounting — the vector-compression step of an ANN/serving
    * pipeline (4× smaller than float32, 8× than float64). Per-vector
    * scale = 127/max|x|; quantized magnitude q = floor(|x|·scale+0.5)
    * clamped at 127. All reported stats are maxes or sums of
    * integer-valued doubles, so the result is bit-stable under any
    * partition order and the DuckDB oracle replays the identical floor
    * arithmetic (engine round() functions disagree on negative ties —
    * floor(x+0.5) on magnitudes does not). Single codegen'd pass via
    * [[graft.functions.VectorFunctions.int8_quant_stats]].
    */
  val em5Quant = Q(
    "em5_int8_quant_stats",
    (s, d) =>
      vecs(s, d)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.int8_quant_stats(col("e")).as("st"))
        .select(col("vec_id"),
          round(col("st")(0), 6).as("amax"),
          col("st")(1).cast("long").as("sum_abs_q"),
          col("st")(2).cast("long").as("err_units"))
        .orderBy(col("vec_id")),
    sql = Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      s AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) AS amax
        FROM v),
      q AS (
        SELECT vec_id, amax,
               CASE WHEN amax = 0 THEN 0.0 ELSE
                 list_sum(list_transform(e, x ->
                   least(floor(abs(x) * (127.0 / amax) + 0.5), 127.0)))
               END AS sum_abs_q,
               CASE WHEN amax = 0 THEN 0.0 ELSE
                 list_sum(list_transform(e, x ->
                   floor(abs(abs(x)
                     - least(floor(abs(x) * (127.0 / amax) + 0.5), 127.0)
                       / (127.0 / amax)) * 1e9 + 0.5)))
               END AS err_units
        FROM s)
      SELECT vec_id, ROUND(amax, 6) AS amax,
             CAST(sum_abs_q AS BIGINT) AS sum_abs_q,
             CAST(err_units AS BIGINT) AS err_units
      FROM q
      ORDER BY vec_id"""))

  /** One Lloyd (k-means) ASSIGNMENT step: every vector to its
    * nearest-by-cosine of k=8 deterministic centroids (the first 8
    * vectors), reported as per-centroid cluster sizes and mean
    * similarity. The full Lloyd loop is this exact plan iterated with
    * recomputed centroid literals: the corpus never shuffles — the
    * k-row centroid relation broadcasts into a map-side scored
    * projection, top-1 is the same max(struct) hash agg as em1 (no
    * window over n·k score rows), and only k rows cross the final
    * exchange. Mean similarity is DECIMAL-routed so partition order
    * can't show in the double sum.
    */
  val em6Kmeans = Q(
    "em6_kmeans_assign",
    (s, d) => {
      val v = vecs(s, d)
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("e").as("ce"),
          col("nrm").as("cn"))
      v.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(
            round(array_dot(col("e"), col("ce")) / (col("nrm") * col("cn")),
              6).as("score"),
            (-col("cid")).as("neg_cid")).as("cand"))
        .groupBy(col("vec_id"))
        .agg(max(col("cand")).as("best"))
        .select(col("vec_id"), (-col("best.neg_cid")).as("cid"),
          col("best.score").as("score"))
        .groupBy(col("cid"))
        .agg(cnt.as("n_assigned"), davg(col("score")).as("mean_cos"))
        .orderBy(col("cid"))
    },
    sql = Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
      scored AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS score
        FROM v CROSS JOIN c),
      assigned AS (
        SELECT vec_id, cid, score,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, cid) AS rn
        FROM scored)
      SELECT cid, COUNT(*) AS n_assigned,
             ${sqlDavg("score")} AS mean_cos
      FROM assigned WHERE rn = 1
      GROUP BY cid
      ORDER BY cid"""))

  /** Two full Lloyd iterations in one declarative plan — em6 is one
    * assignment step against FIXED centroids; this closes the loop:
    * assign → recompute centroids from the assignment (em3's
    * nano-exact per-dimension means) → re-assign against the refined
    * centroids → report per-cluster sizes, mean cosine, and how far
    * each centroid moved. The full k-means driver is THIS plan
    * iterated, each round broadcasting k freshly-aggregated centroids.
    *
    * Scale shape per iteration: the corpus never shuffles — centroids
    * broadcast into a map-side scored projection, the top-1 is a
    * map-side-combinable max(struct) agg, and the update aggregates
    * (cid, dim) pairs (k·dims rows out, corpus-scale rows combined
    * map-side). Determinism: centroid components are exact BIGINT
    * nano-unit sums divided once, diffs and scores round at 6dp with
    * id tie-breaks, so both engines derive bit-identical assignments.
    */
  val em7KmeansIter = Q(
    "em7_kmeans_iterate",
    (s, d) => {
      val v = vecs(s, d)
      val c1 = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("e").as("ce"),
          col("nrm").as("cn"))
      // iteration 1: nearest centroid, the vector riding the agg
      // buffer (score and neg_cid decide the max before e compares)
      val a1 = v.crossJoin(broadcast(c1))
        .select(col("vec_id"),
          struct(
            round(array_dot(col("e"), col("ce")) / (col("nrm") * col("cn")),
              6).as("score"),
            (-col("cid")).as("neg_cid"),
            col("e").as("e")).as("cand"))
        .groupBy(col("vec_id"))
        .agg(max(col("cand")).as("best"))
        .select((-col("best.neg_cid")).as("cid"), col("best.e").as("e"))
      // centroid update: nano-exact per-dimension means (em3 pattern)
      val upd = a1
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(cnt.as("n"),
          sum(floor(col("x") * 1e9 + 0.5).cast("long")).as("units"))
        .select(col("cid"), col("dim"),
          (col("units").cast("double") / (col("n") * 1e9)).as("c2val"))
      val c2 = upd.groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("c2val")))),
          p => p.getField("c2val")).as("ce2"))
        .select(col("cid"), col("ce2"), array_norm(col("ce2")).as("cn2"))
      // how far each centroid moved: exact per-dim diffs, nano-unit
      // squared sums (identical IEEE arithmetic in both engines)
      val c1ex = c1.select(col("cid"),
        posexplode(col("ce")).as(Seq("dim", "x1")))
      val shift = upd.join(c1ex, Seq("cid", "dim"))
        .select(col("cid"), (col("c2val") - col("x1")).as("diff"))
        .groupBy(col("cid"))
        .agg(round(sqrt(
          sum(floor(col("diff") * col("diff") * 1e9 + 0.5).cast("long"))
            .cast("double") / 1e9), 6).as("shift"))
      // iteration 2: re-assign against the refined centroids
      v.crossJoin(broadcast(c2))
        .select(col("vec_id"),
          struct(
            round(array_dot(col("e"), col("ce2")) / (col("nrm") * col("cn2")),
              6).as("score"),
            (-col("cid")).as("neg_cid")).as("cand"))
        .groupBy(col("vec_id"))
        .agg(max(col("cand")).as("best"))
        .select(col("vec_id"), (-col("best.neg_cid")).as("cid"),
          col("best.score").as("score"))
        .groupBy(col("cid"))
        .agg(cnt.as("n_assigned"), davg(col("score")).as("mean_cos"))
        .join(broadcast(shift), Seq("cid")) // k rows — never sort-merge
        .select(col("cid"), col("n_assigned"), col("mean_cos"),
          col("shift"))
        .orderBy(col("cid"))
    },
    sql = Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c1 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
      s1 AS (SELECT v.vec_id, c.cid, v.e,
                    ROUND(list_cosine_similarity(v.e, c.ce), 6) AS score
             FROM v CROSS JOIN c1 c),
      a1 AS (SELECT cid, e FROM (
               SELECT cid, e, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, cid) AS rn
               FROM s1) WHERE rn = 1),
      ex AS (SELECT cid, generate_subscripts(e, 1) - 1 AS dim,
                    unnest(e) AS x
             FROM a1),
      uval AS (SELECT cid, dim,
                      CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS BIGINT))
                        AS DOUBLE) / (COUNT(*) * 1e9) AS c2val
               FROM ex GROUP BY cid, dim),
      c2 AS (SELECT cid, list(c2val ORDER BY dim) AS ce2
             FROM uval GROUP BY cid),
      c1ex AS (SELECT cid, generate_subscripts(ce, 1) - 1 AS dim,
                      unnest(ce) AS x1
               FROM c1),
      shift AS (SELECT u.cid,
                       ROUND(sqrt(CAST(SUM(CAST(floor(
                         (u.c2val - x.x1) * (u.c2val - x.x1) * 1e9 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1e9), 6) AS shift
                FROM uval u JOIN c1ex x USING (cid, dim)
                GROUP BY u.cid),
      s2 AS (SELECT v.vec_id, c.cid,
                    ROUND(list_cosine_similarity(v.e, c.ce2), 6) AS score
             FROM v CROSS JOIN c2 c),
      a2 AS (SELECT vec_id, cid, score FROM (
               SELECT vec_id, cid, score,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY score DESC, cid) AS rn
               FROM s2) WHERE rn = 1)
      SELECT a.cid, COUNT(*) AS n_assigned, ${sqlDavg("score")} AS mean_cos,
             s.shift
      FROM a2 a JOIN shift s USING (cid)
      GROUP BY a.cid, s.shift
      ORDER BY a.cid"""))

  /** Semantic DIVERSITY sampling (em8): the cluster-stratified subset
    * selection step of training-data curation — cover the embedding
    * space by taking a uniform sample of m=10 vectors from EACH
    * k-means cluster rather than m·k from wherever density is highest.
    * Assignment is em6's broadcast-scored map-side top-1 (corpus never
    * shuffles for it); the per-cluster sample then uses the bottom-k
    * sample AGGREGATE carrying vec_id as the value — O(m) state per
    * cluster on both sides of the partial/final split, so a
    * billion-row cluster costs the same reducer memory as a
    * thousand-row one. No window over the corpus, no collect_list:
    * this is the scale shape (a window row_number per cid would sort
    * k=8 giant partitions). Sample membership is the k-smallest-md5
    * rule, so the oracle reproduces it exactly with a per-cluster
    * hash-ordered row_number.
    */
  val em8DiversitySample = Q(
    "em8_diversity_sample",
    (s, d) => {
      val v = vecs(s, d)
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("e").as("ce"),
          col("nrm").as("cn"))
      val assigned = v.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(
            round(array_dot(col("e"), col("ce")) / (col("nrm") * col("cn")),
              6).as("score"),
            (-col("cid")).as("neg_cid")).as("cand"))
        .groupBy(col("vec_id"))
        .agg(max(col("cand")).as("best"))
        .select(col("vec_id"), (-col("best.neg_cid")).as("cid"))
      import graft.functions.{VectorFunctions => F}
      assigned
        .select(col("cid"),
          conv(substring(md5(col("vec_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"),
          col("vec_id"))
        .groupBy(col("cid"))
        .agg(F.bksample_sketch(col("h"), col("vec_id"), 10).as("sk"))
        .select(col("cid"), posexplode(F.bksample_values(col("sk"))))
        .select(col("cid"), (col("pos") + 1).as("sample_rank"),
          col("col").as("vec_id"))
        .orderBy(col("cid"), col("sample_rank"))
    },
    sql = Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
      scored AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS score
        FROM v CROSS JOIN c),
      assigned AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, cid) AS rn
        FROM scored),
      hashed AS (
        SELECT cid, vec_id,
               CAST(('0x' || substr(md5(vec_id::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM assigned WHERE rn = 1),
      ranked AS (
        SELECT cid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY cid ORDER BY h)
                 AS sample_rank
        FROM hashed)
      SELECT cid, CAST(sample_rank AS INT) AS sample_rank, vec_id
      FROM ranked WHERE sample_rank <= 10
      ORDER BY cid, sample_rank"""))

  val all: Seq[Q] = Seq(em1Knn, em2NearDup, em3Centroids, em4Norms, em5Quant,
    em6Kmeans, em7KmeansIter, em8DiversitySample)
}
