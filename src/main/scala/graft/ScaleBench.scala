package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Scale-stress harness (r12 verdict item 1): every per-query plan in
  * this engine is ARGUED scale-safe from its shape; this main MEASURES
  * it. It self-replicates the sf0.1 corpus 1×–100× (≈10 M events /
  * 500 k documents / 200 k embeddings at the top) with two injected
  * pathologies a real 100 TB corpus would have —
  *
  *   - a HOT KEY: 5% of all events collapse onto one `user_id`
  *     (999999937), so every user-keyed shuffle gets a partition ~5%
  *     of the table instead of ~1/n_users;
  *   - a HOT LSH BAND: ~1/997 of documents share one 40-token text
  *     (plus a unique trailing token), so one (band, bhash) bucket
  *     holds hundreds of near-identical docs;
  *
  * — then times the most shuffle-heavy registered queries at each
  * scale and records runtime-vs-scale curves (BENCH_SCALE.json; the
  * analysis lives in BENCH_SCALE.md). Replica documents are
  * token-ROTATED (cyclic shift by 7r+3) so replicas are not near-dups
  * of each other: without that, every doc would acquire n−1
  * near-identical copies and the LSH candidate space would grow
  * quadratically BY CONSTRUCTION, telling us nothing about the plans.
  *
  * em2 (exact blocked all-pairs cosine) is curved separately at small
  * scales: it is O(n²) BY CONTRACT — the measurement documents that
  * the quadratic cost is the operator's complexity model, not a plan
  * defect, and that sim4 (IVF) is the linear-scale path for the same
  * question.
  *
  * The harness also proves AQE's skew mitigation fires on the hot key
  * where the engine relies on it: a user-keyed SortMergeJoin over the
  * skewed corpus must show `skew=true` splits in its final adaptive
  * plan (thresholds lowered to match the corpus size — the point is
  * the MECHANISM fires on the injected skew, the absolute threshold is
  * a config knob).
  */
object ScaleBench {

  private val HotUser = 999999937L
  private val HotBandText =
    ("minhash band stress corpus common text block alpha beta gamma " +
      "delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron " +
      "pi rho sigma tau upsilon phi chi psi omega one two three four " +
      "five six seven eight nine ten")

  private val LinearQueries = Seq(
    "dd2_minhash_lsh_pairs", "dd19_prefix_filter_join", "tx37_bm25_topk",
    "av2_asof_exec", "ev16_resample_ffill", "sim4_ivf_ann_top1",
    // the COMPOSED pipeline (quality → broadcast decon → exact-dedup
    // agg → two-window pack): the chain a nightly build actually runs
    "pl1_pipeline_decontaminated",
    // r14 additions: the full-input provenance audit (adds the
    // hash-keyed disposition join + coordinate join-back on top of
    // pl1's chain), the bounded-state cluster-stratified sample, and
    // the two-table sketch build behind the join-size estimate
    "pl7_pipeline_provenance", "em8_diversity_sample",
    "q38_cms_join_size",
    // r15 additions: the stored phash index delta probe (media-family
    // stored-index tier; rep 1 pays the one-time index build, min-of-
    // reps is the probe) and the sketch-PLANNED join (rep 1 pays the
    // store + analyzeKey build; at large scales the stats say neither
    // side fits the broadcast budget, so the measured point is the
    // rule's graceful stand-down to SMJ)
    "md10_phash_index_probe", "q40_sketch_planned_join")
  private val QuadQuery = "em2_embedding_near_dup"

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0).split(',').map(_.trim.toInt)
      else Array(1, 4, 8, 32, 100)).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS").map(_.toInt).getOrElse(2)
    val results =
      scala.collection.mutable.LinkedHashMap.empty[(String, Int), Seq[Double]]
    val rowsOut =
      scala.collection.mutable.LinkedHashMap.empty[(String, Int), Long]
    val errors =
      scala.collection.mutable.LinkedHashMap.empty[(String, Int), String]

    // SPARK_GRAFT_SCALE_SKIP: comma-separated query names to skip —
    // lets a rerun drop a query whose measured exponent makes further
    // points uninformative (e.g. dd19 past 32×: the curve is already
    // established and a 100× rep is tens of minutes)
    val skip = sys.env.get("SPARK_GRAFT_SCALE_SKIP")
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty[String])
    for (n <- scales) {
      val dir = ensureStress(spark, base, n)
      val qs = (LinearQueries ++ (if (n <= 4) Seq(QuadQuery) else Nil))
        .filterNot(skip)
      for (qn <- qs) {
        val q = Registry.byName(qn)
        try {
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            val cnt = q.fn(spark, dir).count()
            rowsOut((qn, n)) = cnt
            (System.nanoTime() - t0) / 1e9
          }
          results((qn, n)) = times
          System.err.println(f"[scale] ${n}%3dx $qn%-28s " +
            f"min=${times.min}%8.2fs rows=${rowsOut((qn, n))}%d " +
            times.map(t => f"$t%.2f").mkString("[", ",", "]"))
        } catch {
          case e: Throwable =>
            errors((qn, n)) = Option(e.getMessage)
              .getOrElse(e.getClass.getName)
              .replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(200)
            System.err.println(s"[scale] ${n}x $qn FAILED: ${errors((qn, n))}")
        } finally {
          spark.sharedState.cacheManager.clearCache()
          System.gc()
        }
      }
    }

    // AQE skew-split proof on the injected hot key, at the top scale
    val (skewFired, skewExcerpt, skewSec) =
      skewProof(spark, ensureStress(spark, base, scales.max))
    System.err.println(
      s"[scale] skew-join proof: fired=$skewFired (${skewSec}s)")

    def j(m: collection.Map[(String, Int), Any]): String =
      m.map { kv =>
        val ((q, n), v) = kv
        val vs = v match {
          case s: Seq[_] => s.mkString("[", ",", "]")
          case x => x.toString
        }
        "\"" + q + "@" + n + "\":" + vs
      }.mkString("{", ",", "}")
    val line =
      s"""{"base":"$base","scales":${scales.mkString("[", ",", "]")},""" +
        s""""reps":$reps,"times":${j(results)},"rows":${j(rowsOut)},""" +
        s""""errors":${errors.map { case ((q, n), v) =>
          "\"" + q + "@" + n + "\":\"" + v + "\"" }.mkString("{", ",", "}")},""" +
        s""""skew_join_fired":$skewFired,"skew_join_sec":$skewSec,""" +
        s""""skew_plan_excerpt":"${skewExcerpt
          .replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(400)}"}"""
    Files.writeString(Paths.get("BENCH_SCALE.json"), line + "\n")
    println(line)
    spark.stop()
  }

  /** Build (or reuse — `_STRESS_OK` marker) the n× stress corpus. */
  def ensureStress(spark: SparkSession, base: String, n: Int): String = {
    val dir = s"/tmp/graft_scale_${n}x"
    if (Files.exists(Paths.get(s"$dir/_STRESS_OK"))) return dir
    val rep = broadcast(spark.range(n).toDF("r"))

    val e = spark.read.parquet(s"$base/events.parquet")
    val Row(eMax: Long, uMax: Long) =
      e.agg(max(col("event_id")), max(col("user_id"))).head()
    e.crossJoin(rep)
      .select(
        (col("event_id") + col("r") * lit(eMax + 1)).as("event_id"),
        col("ts"),
        // hot key: every 20th source event, in EVERY replica
        when(pmod(col("event_id"), lit(20)) === 0, lit(HotUser))
          .otherwise(col("user_id") + col("r") * lit(uMax + 1))
          .as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val d = spark.read.parquet(s"$base/documents.parquet")
    val Row(dMax: Long) = d.agg(max(col("doc_id"))).head()
    d.crossJoin(rep)
      .select((col("doc_id") + col("r") * lit(dMax + 1)).as("doc_id"),
        col("r"), col("text"), col("lang"), col("source"), col("n_chars"))
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      // replica vocabulary is SUFFIXED (`token_r`) except the shared
      // head terms the BM25 query probes. Why: naive replication keeps
      // one vocabulary, so (a) every replica of a doc is a mutual
      // near-dup (n² LSH candidates by construction — a rotation or
      // per-replica permutation leaks the same way through preserved
      // adjacency / canonicalized order), and (b) a base-frequency-1
      // token accumulates n copies, turning every rare-token posting
      // into an n²/2 prefix-filter candidate bucket. Real corpora grow
      // VOCABULARY with size (Heaps' law): suffixing models that —
      // cross-replica shingle/token overlap vanishes, each replica
      // keeps the base corpus's own dup structure, head-term postings
      // (the BM25 probe mass) still grow linearly, and the injected
      // hot band supplies the deliberate cross-replica candidate skew.
      .withColumn("rotated",
        when(col("r") === 0, col("text")).otherwise(concat_ws(" ",
          expr("""transform(toks,
            t -> IF(t IN ('spark', 'vector', 'hash', 'window'), t,
                    concat(t, '_', CAST(r AS STRING))))"""))))
      .select(col("doc_id"),
        // hot band: ~1/997 of docs share one text (unique tail token)
        when(pmod(col("doc_id"), lit(997)) === 0,
          concat(lit(HotBandText), lit(" x"), col("doc_id")))
          .otherwise(col("rotated")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val v = spark.read.parquet(s"$base/embeddings.parquet")
    val Row(vMax: Long) = v.agg(max(col("vec_id"))).head()
    v.crossJoin(rep)
      .select((col("vec_id") + col("r") * lit(vMax + 1)).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // orders + lineitem (q38's two-table sketch build): the SAME key
    // shift on BOTH tables keeps the FK relationship intact per
    // replica, so the true join size scales exactly linearly and the
    // sketch estimate is tested against a growing key universe
    val o = spark.read.parquet(s"$base/orders.parquet")
    val Row(oMax: Long) = o.agg(max(col("o_orderkey"))).head()
    o.crossJoin(rep)
      .select((col("o_orderkey") + col("r") * lit(oMax + 1))
          .as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    li.crossJoin(rep)
      .select((col("l_orderkey") + col("r") * lit(oMax + 1))
          .as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    Files.createFile(Paths.get(s"$dir/_STRESS_OK"))
    dir
  }

  /** User-keyed SortMergeJoin over the skewed corpus: enrich every
    * event with its user's aggregate — the join shape AQE's
    * OptimizeSkewedJoin handles. The dimension side is one row per
    * user, so the join can't explode; the probe side's hot partition
    * (~5% of the table on one key) must get split (`skew=true` in the
    * final adaptive plan). Thresholds are lowered to corpus scale —
    * the default 256 MB trigger is sized for real clusters; the
    * mechanism under test is the same.
    */
  private def skewProof(spark: SparkSession,
      dir: String): (Boolean, String, Double) = {
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k))
    // AQE's cost evaluator may reject the split when it judges the
    // plan "no cheaper" (shuffle-count tie); force settles the tie in
    // favor of splitting for the proof
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // detection compares the hot partition to the MEDIAN map-output
    // partition: at 32 partitions the median is ~1/32 of the table and
    // the 5% hot key only doubles it — realistic cluster configs run
    // hundreds of partitions, which is what makes a 5%-of-table key
    // stick out (median shrinks, the hot partition doesn't)
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    try {
      val e = graft.queries.Tables.events(spark, dir)
      // the per-user dimension is MATERIALIZED and re-read: with the
      // aggregate inline, the join's dim side is Sort(Agg(Shuffle)) and
      // OptimizeSkewedJoin's pattern (both sides Sort(ShuffleStage))
      // cannot match — a real pipeline's dimension is a stored table
      // anyway, which is exactly this shape
      val dimPath = java.nio.file.Files
        .createTempDirectory("graft_skew_dim").toString + "/dim"
      e.groupBy(col("user_id"))
        .agg(sum(col("value")).as("user_total"))
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
      // consume fact-side payload columns so column pruning can't
      // strip the probe shuffle down to bare user_ids — 500 k copies
      // of one 8-byte key compress to nearly nothing and the hot
      // partition never crosses the byte threshold (a real enrichment
      // carries the fact row, which is the case under test)
      val joined = e.join(dim, Seq("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("user_total")).as("s"),
          sum(col("value")).as("sv"), max(col("ts")).as("mt"),
          max(length(col("props"))).as("mp"),
          max(col("event_id")).as("me"))
      val t0 = System.nanoTime()
      joined.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = joined.queryExecution.executedPlan.toString
      if (sys.env.get("SPARK_GRAFT_SKEW_DEBUG").contains("1"))
        System.err.println(s"[skew-debug] final plan:\n$plan")
      val fired = plan.contains("skew=true")
      val excerpt = plan.linesIterator
        .filter(l => l.contains("SortMergeJoin") || l.contains("skew"))
        .take(4).mkString(" | ")
      (fired, excerpt, math.rint(sec * 100) / 100)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
