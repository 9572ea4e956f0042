package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{ArrayDotProduct, ArrayDotQ8, ArrayNorm, Int8QuantStats, MinHashSignature, PHashFingerprint, RollingHashWindows, ShingleArray, SimHashFingerprint, TopKValues, GraftExpressionBridge => B}

/** User-facing API for Graft's native kernels (implemented in the
  * org.apache.spark.sql.graft bridge package).
  */
object VectorFunctions {

  /** MinHash signature (array<long>, one element per seed) over an
    * array<string> shingle column — native single-pass md5 hashing.
    */
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    B.column(MinHashSignature(B.expression(shingles), numHashes))

  /** SimHash 60-bit fingerprint over an array<string> token column. */
  def simhash_fingerprint(tokens: Column, bits: Int = 60): Column =
    B.column(SimHashFingerprint(B.expression(tokens), bits))

  /** Block-mean perceptual hash (60-bit) over a BINARY payload column —
    * the media-dedup fingerprint (see
    * [[org.apache.spark.sql.graft.PHashFingerprint]]).
    */
  def phash_fingerprint(content: Column, bits: Int = 60): Column =
    B.column(PHashFingerprint(B.expression(content), bits))

  /** Distinct k-shingles (first-occurrence order) from a token array —
    * native single pass.
    */
  def shingle_array(tokens: Column, k: Int): Column =
    B.column(ShingleArray(B.expression(tokens), k))

  /** Dot product of two array<double> columns (codegen'd). */
  def array_dot(a: Column, b: Column): Column =
    B.column(ArrayDotProduct(B.expression(a), B.expression(b)))

  /** EXACT integer dot of two array<tinyint> columns, long-accumulated
    * (codegen'd) — the stored-SQ8 probe's scan kernel.
    */
  def array_dot_q8(a: Column, b: Column): Column =
    B.column(ArrayDotQ8(B.expression(a), B.expression(b)))

  /** Asymmetric-distance lookup sum over (codes: array<tinyint>,
    * qtab: array<array<double>>) — the PQ tiers' codegen'd scan
    * kernel; bit-equal to the DECIMAL(20,6) routed HOF sum it
    * replaces (see [[org.apache.spark.sql.graft.PqAdcDistance]]).
    */
  def pq_adc(codes: Column, qtab: Column): Column =
    B.column(org.apache.spark.sql.graft.PqAdcDistance(
      B.expression(codes), B.expression(qtab)))

  /** sim8's int8 absmax quantization of an array<double> given its
    * scale denominator (codegen'd; amax evaluates once per row).
    */
  def int8_quantize(vec: Column, amax: Column): Column =
    B.column(org.apache.spark.sql.graft.Int8Quantize(
      B.expression(vec), B.expression(amax)))

  /** L2 norm of an array<double> column (codegen'd). */
  def array_norm(a: Column): Column =
    B.column(ArrayNorm(B.expression(a)))

  /** Int8 scalar-quantization stats `[amax, sum_abs_q, err_units]`
    * of an array<double> (codegen'd single pass; see
    * [[org.apache.spark.sql.graft.Int8QuantStats]]).
    */
  def int8_quant_stats(a: Column): Column =
    B.column(Int8QuantStats(B.expression(a)))

  /** Rabin-Karp rolling window hashes (array<long> per doc) over an
    * array<long> of token hashes — O(n) native pass; the winnowing
    * fingerprint primitive.
    */
  def rolling_hash(tokenHashes: Column, window: Int): Column =
    B.column(RollingHashWindows(B.expression(tokenHashes), window))

  /** Cosine similarity via the codegen'd kernels. */
  def cosine_sim(a: Column, b: Column): Column =
    array_dot(a, b) / (array_norm(a) * array_norm(b))

  /** Exact top-k values per group, descending array<double> — a native
    * [[org.apache.spark.sql.graft.TopKValues]] TypedImperativeAggregate
    * with O(k) state per group (collect_list+slice ships every value
    * across the exchange; this ships at most k per group per map task).
    */
  def topk_values(value: Column, k: Int): Column =
    B.column(TopKValues(B.expression(value),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** Exact top-k (score, id) pairs per group by (score DESC, id ASC)
    * as a best-first array<struct<score,id>> — the kept set of
    * `ROW_NUMBER() OVER (ORDER BY score DESC, id) <= k`, with O(k)
    * state per group and k pairs per group over the exchange instead
    * of a full candidate shuffle + sort.
    */
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    // k=1 routes the codegen'd declarative min-struct composition —
    // identical contract, none of the interpreted per-candidate
    // update cost (see TopKPairs.top1Composition). k>1 stays on the
    // bounded heap DELIBERATELY: a declarative sorted-slots variant
    // (TopKPairsSmall, r21) measured 25x SLOWER — its whole-stage-
    // codegen'd update method exceeds HotSpot's 8000-bytecode JIT
    // limit (DontCompileHugeMethods) and runs interpreted, and even
    // JIT-forced it loses ~2x to the heap's one-compare early exit
    // because every row must evaluate all k slot expressions
    // (TopKMicro: 17.5s interpreted / 1.9s JIT'd vs 0.85s heap on
    // 4M candidates).
    if (k == 1)
      B.column(org.apache.spark.sql.graft.TopKPairs
        .top1Composition(B.expression(score), B.expression(id)))
    else
      B.column(org.apache.spark.sql.graft.TopKPairs(
        B.expression(score), B.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** Misra-Gries frequent-items summary per group —
    * array<struct<item,count_lo>> with the n/k containment guarantee
    * (every item with true count > n/k is present; counts are lower
    * bounds). O(k) state per group, mergeable across partitions; the
    * candidate pass of sketch → exact-recount (see
    * [[org.apache.spark.sql.graft.HeavyHittersSketch]]).
    */
  def heavy_hitters(item: Column, k: Int): Column =
    B.column(org.apache.spark.sql.graft.HeavyHittersSketch(
      B.expression(item),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** KMV distinct sketch per group over pre-hashed longs (the engine's
    * 52-bit md5 hash convention) — BinaryType, storable in parquet,
    * mergeable later with [[kmv_merge]]. O(k) state per group.
    */
  def kmv_sketch(hash: Column, k: Int): Column =
    B.column(org.apache.spark.sql.graft.KmvSketch(B.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** Merge STORED KMV sketches (a binary column) into one — the rollup
    * that never rescans raw data.
    */
  def kmv_merge(sketch: Column): Column =
    B.column(org.apache.spark.sql.graft.KmvMergeSketch(B.expression(sketch))
      .toAggregateExpression())

  /** Distinct-count estimate from a KMV sketch (exact below k). */
  def kmv_estimate(sketch: Column): Column =
    B.column(org.apache.spark.sql.graft.KmvEstimate(B.expression(sketch)))

  /** Union of two STORED KMV sketches (k smallest of A ∪ B). */
  def kmv_union(a: Column, b: Column): Column =
    B.column(org.apache.spark.sql.graft.KmvUnion(
      B.expression(a), B.expression(b)))

  /** Jaccard numerator: hashes in the union's k-min window present in
    * BOTH sketches. With [[kmv_size]] and [[kmv_estimate]] of the
    * union this yields the intersection estimate.
    */
  def kmv_overlap(a: Column, b: Column): Column =
    B.column(org.apache.spark.sql.graft.KmvOverlap(
      B.expression(a), B.expression(b)))

  /** Sketch occupancy m = min(k, distinct seen). */
  def kmv_size(sketch: Column): Column =
    B.column(org.apache.spark.sql.graft.KmvSize(B.expression(sketch)))

  /** Count-min sketch per group over 52-bit md5 hashes: a d×w counter
    * matrix (BinaryType, storable, element-wise mergeable) answering
    * point-frequency queries for ANY key — estimate ≥ true,
    * ≤ true + (e/w)·N w.p. 1−e^−d.
    */
  def cms_sketch(hash: Column, w: Int, d: Int): Column =
    B.column(org.apache.spark.sql.graft.CmsSketch(
      B.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(w),
      org.apache.spark.sql.catalyst.expressions.Literal(d))
      .toAggregateExpression())

  /** Element-wise sum of STORED count-min sketches. */
  def cms_merge(sketch: Column): Column =
    B.column(org.apache.spark.sql.graft.CmsMerge(
      B.expression(sketch)).toAggregateExpression())

  /** Point-frequency estimate of a pre-hashed key from a sketch. */
  def cms_query(sketch: Column, hash: Column): Column =
    B.column(org.apache.spark.sql.graft.CmsQuery(
      B.expression(sketch), B.expression(hash)))

  /** Equi-join cardinality estimate from two same-shape sketches:
    * min over rows of the counter inner product — one-sided
    * (≥ true join size), answered from stats bytes alone.
    */
  def cms_inner_product(a: Column, b: Column): Column =
    B.column(org.apache.spark.sql.graft.CmsInnerProduct(
      B.expression(a), B.expression(b)))

  /** Bottom-k sample sketch per group over (52-bit md5 hash of the
    * row's unique key, long measure value): a uniform sample without
    * replacement carrying the values — BinaryType, storable,
    * mergeable with [[bksample_merge]]. O(k) state per group.
    */
  def bksample_sketch(hash: Column, value: Column, k: Int): Column =
    B.column(org.apache.spark.sql.graft.BkSampleSketch(
      B.expression(hash), B.expression(value),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** Merge STORED bottom-k sample sketches into one. */
  def bksample_merge(sketch: Column): Column =
    B.column(org.apache.spark.sql.graft.BkSampleMerge(
      B.expression(sketch)).toAggregateExpression())

  /** Nearest-rank quantile of a sketch's carried sample (exact when
    * the group had ≤ k rows).
    */
  def bksample_quantile(sketch: Column, q: Column): Column =
    B.column(org.apache.spark.sql.graft.BkSampleQuantile(
      B.expression(sketch), B.expression(q)))

  /** The carried sample itself, in ascending-hash (= deterministic
    * uniform-sample) order — the bounded-memory "sample k rows per
    * group" primitive.
    */
  def bksample_values(sketch: Column): Column =
    B.column(org.apache.spark.sql.graft.BkSampleValues(
      B.expression(sketch)))

  /** Register SQL names (per-session) so `expr("array_dot(a,b)")` and
    * spark.sql can use the kernels too.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("array_dot",
      es => ArrayDotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("array_norm",
      es => ArrayNorm(es.head), "scala_udf")
  }
}
