package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.{ArrayDotProduct, ArrayNorm, GeohashEncode, Int8QuantStats, MinHashSignature, PHashFingerprint, RollingHashWindows, ShingleArray, SimHashFingerprint, TopKValues}

/** SparkSessionExtensions wiring: makes the graft kernels available to
  * pure-SQL users via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`):
  *
  *   SELECT array_dot(a, b), array_norm(a),
  *          minhash_signature(shingles, 8),
  *          simhash(tokens), shingle_array(tokens, 3) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    // storage-aware optimizer rule: geohash predicates imply geohash3
    // partition predicates on converted stores (directory pruning)
    e.injectOptimizerRule(_ => graft.plans.InferGeohashPartitionFilter)
    // epoch-arithmetic time predicates imply bare ts scan bounds
    // (parquet row-group stats pruning on time-range queries)
    e.injectOptimizerRule(_ => graft.plans.InferTimeScanBound)
    // stored key sketches (SketchStats) choose broadcast-vs-shuffle
    // and fail runaway joins at planning time (SketchJoinRule.scala)
    e.injectOptimizerRule(s => graft.plans.SketchJoinRule(s))
    // whole-operator extension: backward as-of join planned as a
    // co-partitioned co-sorted O(n+m) merge walk (asofJoinExec.scala)
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    // SQL-syntax surface for the same operator: `A ASOF [LEFT] JOIN B
    // ON k = k AND t <= t` — a delegating parser rewrites the dialect
    // into a marked stock LEFT JOIN, and a resolution rule converts the
    // marked Join into the AsOfJoin logical node (asofSqlSurface.scala).
    // The same parser resolves `store VERSION|TIMESTAMP AS OF ...` to
    // the retained generation table (storeTimeTravel.scala — parse-time
    // because Spark's analyzer hard-rejects v1 time travel before any
    // injected resolution rule can run); it consults the catalog, so it
    // gets the session.
    e.injectParser((s, delegate) =>
      new org.apache.spark.sql.graft.GraftSqlParser(s, delegate))
    e.injectResolutionRule(_ => org.apache.spark.sql.graft.ResolveAsOfJoin)
    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
    e.injectFunction((FunctionIdentifier("array_dot"), info("array_dot"),
      (es: Seq[Expression]) => ArrayDotProduct(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("array_norm"), info("array_norm"),
      (es: Seq[Expression]) => ArrayNorm(es.head)))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("simhash"), info("simhash"),
      (es: Seq[Expression]) => SimHashFingerprint(es.head)))
    e.injectFunction((FunctionIdentifier("shingle_array"),
      info("shingle_array"),
      (es: Seq[Expression]) => ShingleArray(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("geohash_encode"),
      info("geohash_encode"),
      (es: Seq[Expression]) => GeohashEncode(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("int8_quant_stats"),
      info("int8_quant_stats"),
      (es: Seq[Expression]) => Int8QuantStats(es.head)))
    // quantized-tier kernels: exact int8 dot (long-accumulated) and
    // the sim8 quantization rule — the scan + probe kernels behind
    // GRAFT_ANN's stored-SQ8 serving
    e.injectFunction((FunctionIdentifier("array_dot_q8"),
      info("array_dot_q8"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.ArrayDotQ8(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("int8_quantize"),
      info("int8_quantize"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.Int8Quantize(es.head, es(1))))
    // the PQ tiers' ADC scan kernel (GRAFT_ANN's PQ expansions)
    e.injectFunction((FunctionIdentifier("pq_adc"),
      info("pq_adc"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.PqAdcDistance(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash"),
      (es: Seq[Expression]) => RollingHashWindows(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("phash"), info("phash"),
      (es: Seq[Expression]) => PHashFingerprint(es.head)))
    // aggregate kernel: the analyzer wraps a raw AggregateFunction in
    // an AggregateExpression itself (same path as built-in percentile)
    e.injectFunction((FunctionIdentifier("topk_values"),
      info("topk_values"),
      (es: Seq[Expression]) => TopKValues(es.head, es(1))))
    // bounded top-k (score, id) pairs — the rerank-survivor selection
    // without a candidate-set window sort; a literal k=1 routes the
    // codegen'd declarative min-struct fast path (same contract)
    e.injectFunction((FunctionIdentifier("topk_pairs"),
      info("topk_pairs"),
      (es: Seq[Expression]) => es(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(1, _) =>
          org.apache.spark.sql.graft.TopKPairs
            .top1Composition(es.head, es(1))
        // k>1 stays on the bounded heap deliberately — a declarative
        // sorted-slots variant measured 25x slower (JIT huge-method
        // cliff + no early exit; see VectorExpressions.topk_pairs)
        case _ =>
          org.apache.spark.sql.graft.TopKPairs(es.head, es(1), es(2))
      }))
    // z-order key from 2-4 int bucket ids (layout rewrites in SQL)
    e.injectFunction((FunctionIdentifier("zorder_key"),
      info("zorder_key"),
      (es: Seq[Expression]) => org.apache.spark.sql.graft.ZOrderKey(es)))
    // Misra-Gries frequent-items summary (aggregate; candidate pass
    // of sketch → exact-recount)
    e.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.HeavyHittersSketch(es.head, es(1))))
    // stored mergeable KMV distinct sketches (sketch / merge / estimate)
    e.injectFunction((FunctionIdentifier("kmv_sketch"), info("kmv_sketch"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.KmvSketch(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("kmv_merge"), info("kmv_merge"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.KmvMergeSketch(es.head)))
    e.injectFunction((FunctionIdentifier("kmv_estimate"),
      info("kmv_estimate"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.KmvEstimate(es.head)))
    // KMV set algebra over stored sketches (union / Jaccard numerator
    // / occupancy — q35's intersection estimator)
    e.injectFunction((FunctionIdentifier("kmv_union"),
      info("kmv_union"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.KmvUnion(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("kmv_overlap"),
      info("kmv_overlap"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.KmvOverlap(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("kmv_size"),
      info("kmv_size"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.KmvSize(es.head)))
    // count-min sketches (frequency point estimates from O(w·d) state)
    e.injectFunction((FunctionIdentifier("cms_sketch"),
      info("cms_sketch"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.CmsSketch(es.head, es(1), es(2))))
    e.injectFunction((FunctionIdentifier("cms_merge"),
      info("cms_merge"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.CmsMerge(es.head)))
    e.injectFunction((FunctionIdentifier("cms_query"),
      info("cms_query"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.CmsQuery(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("cms_inner_product"),
      info("cms_inner_product"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.CmsInnerProduct(es.head, es(1))))
    // stored mergeable bottom-k sample sketches (quantile companion
    // to kmv: sketch / merge / nearest-rank quantile)
    e.injectFunction((FunctionIdentifier("bksample_sketch"),
      info("bksample_sketch"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.BkSampleSketch(es.head, es(1), es(2))))
    e.injectFunction((FunctionIdentifier("bksample_merge"),
      info("bksample_merge"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.BkSampleMerge(es.head)))
    e.injectFunction((FunctionIdentifier("bksample_quantile"),
      info("bksample_quantile"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.BkSampleQuantile(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("bksample_values"),
      info("bksample_values"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.BkSampleValues(es.head)))
    // internal markers the ASOF parser rewrite emits around the ON
    // condition; consumed by ResolveAsOfJoin during analysis
    e.injectFunction((FunctionIdentifier("_graft_asof"),
      info("_graft_asof"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.AsOfMarker(es.head, inner = false)))
    e.injectFunction((FunctionIdentifier("_graft_asof_inner"),
      info("_graft_asof_inner"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.graft.AsOfMarker(es.head, inner = true)))
  }
}
