package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: these lock in the scale properties the
  * queries are designed around (predicate pushdown to parquet, column
  * pruning, broadcast joins for dims, two-phase aggregation, exchange
  * reuse for self-joins) so a regression in plan shape fails CI, not
  * just a benchmark.
  */
class PlanQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def executedPlan(name: String,
      session: SparkSession = spark): SparkPlan = {
    val df = Registry.byName(name).fn(session, dir)
    df.count() // materialize so AQE finalizes the plan
    // NOTE: count() derives its own QueryExecution, so this access
    // re-plans lazily AFTER the action — which keeps the tree fully
    // traversable (an EXECUTED adaptive plan hides operators inside
    // materialized query stages), but means ScopedCaches-released
    // caches are no longer visible here. Cache-hit gates must inspect
    // the PRE-ACTION logical optimizedPlan instead (see q20/sim4).
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("q2: filters pushed to the parquet scan, columns pruned") {
    val scans = executedPlan("q2_filter_pushdown").collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), pushed)
    assert(pushed.contains("LessThan(l_quantity,10.0)"), pushed)
    val readCols = scans.head.requiredSchema.fieldNames.toSet
    assert(!readCols.contains("l_tax") && !readCols.contains("l_partkey"),
      s"unreferenced columns must be pruned, read: $readCols")
  }

  test("q4: dimension join is broadcast, not shuffled") {
    val plan = executedPlan("q4_join_agg_segment").toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast in:\n$plan")
  }

  test("q1: aggregation is two-phase (map-side partial) and codegen'd") {
    val plan = executedPlan("q1_pricing_summary")
    val modes = plan.collect { case h: HashAggregateExec =>
      h.aggregateExpressions.map(_.mode)
    }.flatten
    assert(modes.contains(Partial) && modes.contains(Final),
      s"expected Partial+Final aggregation, got $modes")
    assert(plan.toString.contains("WholeStageCodegen") ||
      plan.collectLeaves().nonEmpty) // codegen visible in formatted string
  }

  test("q5: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = executedPlan("q5_topk_orders").toString
    assert(plan.contains("TakeOrderedAndProject"), s"got:\n$plan")
  }

  test("dd2: self-join reuses one exchange when not broadcast (AQE off)") {
    // AQE at toy scale legitimately turns the self-join into a broadcast
    // join (no exchange to reuse); the reuse property we designed for
    // shows in the static plan. getOrCreate() hands back the shared
    // session, so the AQE conf is saved and restored — otherwise every
    // later test in this JVM silently runs with AQE off.
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = Registry.byName("dd2_minhash_lsh_pairs").fn(spark, dir)
      val reused = df.queryExecution.executedPlan.collect {
        case r: ReusedExchangeExec => r
      }
      assert(reused.nonEmpty,
        s"expected ReusedExchange in:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set(key, saved)
  }

  test("md4: phash banding reuses ONE exchange for the self-join (AQE " +
      "off) — fingerprints shuffle, payloads never do") {
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = Registry.byName("md4_phash_near_dup").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val reused = plan.collect { case r: ReusedExchangeExec => r }
      assert(reused.nonEmpty,
        s"expected the dd2 band-join discipline (ReusedExchange):\n$plan")
      assert(!plan.toString.contains("CartesianProduct"),
        "candidate generation must never be all-pairs")
      // the exchanged rows are (media_id, fp, band, bkey) — the binary
      // payload is projected away BELOW the exchange
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val exchanged = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanged.forall(_.child.output.forall(a =>
        !a.dataType.isInstanceOf[org.apache.spark.sql.types.BinaryType.type]
          || a.name == "bkey")),
        s"payload bytes must not cross an exchange:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("md5: frame near-dup joins on the frame-key exchange, payloads " +
      "and frame slices never shuffle, asset counts join broadcast") {
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = Registry.byName("md5_frame_near_dup").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        s"expected the frame-key self-join to reuse one exchange:\n$plan")
      assert(!plan.toString.contains("CartesianProduct"),
        "pair generation must never be all-pairs")
      // nothing binary (payload OR frame slice) may cross an exchange —
      // only (media_id, 32-char md5) rows flow
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val exchanged = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanged.nonEmpty && exchanged.forall(_.child.output.forall(
        a => !a.dataType.isInstanceOf[
          org.apache.spark.sql.types.BinaryType.type])),
        s"frame bytes must not cross an exchange:\n$plan")
      // per-asset counts come back as broadcast joins
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.length >= 2,
        s"asset-count joins must broadcast:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("ev11: the salted join shuffles on (key, salt) — shuffle-hash " +
      "pinned, never broadcast, so the salt is load-bearing") {
    val df = Registry.byName("ev11_salted_join").fn(spark, dir)
    // pre-adaptive plan: AQE materialization hides the join inside
    // query stages (memory-note discipline)
    val plan = df.queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val shj = plan.collect { case j: ShuffledHashJoinExec => j }
    assert(shj.nonEmpty, s"expected a ShuffledHashJoin:\n$plan")
    assert(shj.exists(j => j.leftKeys.exists(_.toString.contains("__salt"))
        && j.leftKeys.size == 2),
      s"join keys must be (key, __salt):\n${shj.map(_.leftKeys)}")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
      s"salted join must not broadcast:\n$plan")
  }

  test("em1: top-1 is two-phase aggregation, not a window over all pairs") {
    val plan = executedPlan("em1_knn_top1")
    assert(!plan.toString.contains("Window"),
      "top-1 must not use a window sort")
    // max(struct) plans as SortAggregate (struct buffer), still with a
    // Partial mode — the pair rows collapse map-side before the shuffle,
    // which is the property that matters at n² pair counts.
    val modes = plan.collect {
      case h: HashAggregateExec => h.aggregateExpressions.map(_.mode)
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        s.aggregateExpressions.map(_.mode)
    }.flatten
    assert(modes.contains(Partial) && modes.contains(Final),
      s"expected two-phase aggregation, got $modes")
  }

  test("em2: near-dup join is a block-keyed equi-join, never nested-loop") {
    val plan = executedPlan("em2_embedding_near_dup")
    val loops = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(loops.isEmpty,
      s"em2 must distribute via block-pair equi-join, found:\n$plan")
  }

  test("q20: quartiles have NO window (global NTILE would single-task)") {
    val plan = executedPlan("q20_ntile_quartiles")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"q20 must not contain a Window node:\n$plan")
    assert(plan.toString.contains("rangepartitioning"),
      "expected a range repartition feeding the local rank computation")
  }

  test("q20: triple-consumed base is cached — scan+range exchange run once") {
    // PRE-ACTION logical plan: the scoped cache is registered during
    // construction and released right after the consuming action, so
    // the substitution is inspected before any action runs
    val df = Registry.byName("q20_ntile_quartiles").fn(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    val cached = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.size >= 3,
      s"expected the counts/offsets/final-join consumers to read the " +
        s"cached base, found ${cached.size}:\n$opt")
    // every orders access must go through the cache; a direct relation
    // outside it means the range exchange re-planned per consumer
    val rawScans = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(rawScans.isEmpty,
      s"base must not recompute; direct scans found:\n$opt")
  }

  test("q7: semi/anti joins stay broadcast at dim size") {
    val plan = executedPlan("q7_semi_anti_except").toString
    assert(plan.contains("BroadcastHashJoin") &&
      (plan.contains("LeftSemi") || plan.contains("LeftAnti")),
      s"expected broadcast semi/anti joins:\n$plan")
  }

  test("dd6: pair relation broadcasts into signature lookups") {
    val plan = executedPlan("dd6_minhash_est_vs_exact").toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pair->signature joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ev6: time-range join is a bucketed equi-join, never nested-loop") {
    val plan = executedPlan("ev6_range_join_bucketed").toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must decompose to an equi-join:\n$plan")
    assert(plan.contains("Join"), s"expected a join:\n$plan")
  }

  test("sim4: IVF probes in-row off literal centroids — no n×k join, " +
      "no window, never nested-loop") {
    val plan = executedPlan("sim4_ivf_ann_top1")
    val s = plan.toString
    // centroid ranking must be a projection over a literal array, so
    // the plan has NO join/window/exchange for the n×k scoring
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"centroid scoring must not materialize n×k rows:\n$s")
    assert(!s.contains("Window"),
      s"probe selection must be in-row array_sort, not a window:\n$s")
    // the candidate join is the cid-keyed equi-join
    assert(s.contains("Join"), s"expected the inverted-list join:\n$s")
  }

  test("sim4: IVF corpus scan + centroid scoring run ONCE — both join " +
      "sides read the cached projection") {
    val df = Registry.byName("sim4_ivf_ann_top1").fn(spark, dir)
    // PRE-ACTION logical plan (cache substitution already visible; an
    // action would let the ScopedCaches sweep release the projection).
    // Physical InMemoryTableScans hide inside AQE query stages anyway;
    // the optimized LOGICAL plan shows every consumer (memory-quirk note)
    val opt = df.queryExecution.optimizedPlan
    val cachedConsumers = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cachedConsumers.size >= 2,
      s"expected both IVF join sides to consume the cached (vid, e, nrm, " +
        s"probe_cids) projection, found ${cachedConsumers.size}:\n$opt")
    val rawScans = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(rawScans.isEmpty,
      s"no branch may re-scan the source outside the cache:\n$opt")
  }

  test("tx10/tx11: vocabulary-sized relations join as broadcasts, " +
      "never shuffling the token stream") {
    for (name <- Seq("tx10_tfidf_top_terms", "tx11_unigram_logprob")) {
      val plan = executedPlan(name).toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: vocab join must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name: token stream must not shuffle for the vocab join:\n$plan")
    }
  }

  test("em6: k-means assignment broadcasts the centroids — the " +
      "corpus never shuffles before its top-1 agg") {
    val plan = executedPlan("em6_kmeans_assign")
    val s = plan.toString
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"),
      s"centroid side must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
      s"corpus must not shuffle for the centroid join:\n$s")
  }

  test("ev10: native session_window keeps ev7's single-shuffle " +
      "topology — one user_id hash exchange feeds the session agg") {
    val plan = executedPlan("ev10_session_window")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashExchanges.length === 1,
      s"session_window must shuffle once on user_id:\n$plan")
  }

  test("em7: iterated k-means broadcasts BOTH centroid generations — " +
      "no sort-merge or cartesian anywhere in the two-iteration plan") {
    val plan = executedPlan("em7_kmeans_iterate")
    val s = plan.toString
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"),
      s"centroid sides must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
      s"the corpus must never shuffle for a centroid join:\n$s")
  }

  test("tx21: per-source cap scores scan-locally and shuffles the " +
      "corpus exactly once (source)") {
    val plan = executedPlan("tx21_per_source_quality_cap")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    // one hash exchange keyed source feeds the row_number window; the
    // final orderBy adds a range exchange, never a second hash one
    assert(hashExchanges.length === 1,
      s"cap must shuffle once on source:\n$plan")
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("SortMergeJoin"), plan.toString)
  }

  test("tx22: packing manifest shuffles the corpus exactly once " +
      "(source) — offset arithmetic is scan-local above the window") {
    val plan = executedPlan("tx22_sequence_packing")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashExchanges.length === 1,
      s"packing must shuffle once on source:\n$plan")
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("SortMergeJoin"), plan.toString)
  }

  test("dd9: bloom probes filter map-side — the eval bit set and the " +
      "exact verify both broadcast, nothing sort-merge joins") {
    val plan = executedPlan("dd9_bloom_decontamination")
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val broadcasts = plan.collect { case b: BroadcastHashJoinExec => b }
    // bit-set membership + exact-verify + candidate labelling
    assert(broadcasts.length >= 2,
      s"bloom membership and exact verify must broadcast:\n$plan")
    assert(!plan.toString.contains("CartesianProduct") &&
      !plan.toString.contains("SortMergeJoin"),
      s"corpus-scale side must never sort-merge:\n$plan")
  }

  test("ev8: funnel needs exactly one data shuffle (user_id) — the " +
      "fold is scan-local above it") {
    val plan = executedPlan("ev8_funnel")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    // one exchange on user_id; the 4-row histogram agg may add a tiny
    // single-partition exchange, never a second full-data one
    assert(hashExchanges.nonEmpty &&
      hashExchanges.count(_.outputPartitioning
        .asInstanceOf[HashPartitioning].numPartitions > 1) <= 2,
      s"funnel must not reshuffle the event stream:\n$plan")
  }

  test("ev8: the 48-hour window predicate reaches the parquet scan as " +
      "a bare ts bound (InferTimeScanBound — row-group pruning at scale)") {
    // ev8 filters `ts DIV 1000 < cut` over the NORMALIZED ts (an
    // epoch-arithmetic chain over the raw timestamp[us] column);
    // without the rule the scan reads every row group of a 100 TB
    // corpus for a 2-day window.
    val scans = executedPlan("ev8_funnel").collect {
      case s: FileSourceScanExec => s
    }
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", ""))
      .mkString(";")
    assert(pushed.contains("LessThanOrEqual(ts,"),
      s"ts bound must reach the scan, pushed: $pushed")
  }

  test("tx32: the token stream never shuffles at distinct-width — the " +
      "sketch pass ships k-1 summaries, candidates broadcast back, and " +
      "only candidate-filtered rows reach the recount exchange") {
    val plan = executedPlan("tx32_heavy_hitters")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"candidates must broadcast:\n$plan")
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] &&
            e.outputPartitioning
              .asInstanceOf[HashPartitioning].numPartitions > 1 => e
    }
    // the ONE data-bearing hash exchange is the exact recount of
    // candidate-filtered tokens; the sketch pass exchanges a single
    // summary row (SinglePartition), not the token stream
    assert(hashExchanges.size <= 1,
      s"token stream must not shuffle at distinct-width:\n$plan")
  }

  test("tx18: BPE pair counts are two hash aggs + TakeOrderedAndProject " +
      "(no window, no global sort)") {
    val plan = executedPlan("tx18_bpe_merge_step")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"pair ranking must not use a window:\n$plan")
  }

  test("dd10: incremental dedup probes the index with the DELTA only — " +
      "one band-keyed join, the corpus never self-joins (no reused " +
      "exchange feeding both sides)") {
    // static plan with AQE off (dd2's technique — materialized query
    // stages hide joins from collect otherwise)
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = Registry.byName("dd10_incremental_dedup").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
        ShuffledHashJoinExec, SortMergeJoinExec}
      def onBhash(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        keys.exists(_.references.exists(_.name == "bhash"))
      val bandJoins = plan.collect {
        case j: SortMergeJoinExec if onBhash(j.leftKeys) => (j.left, j.right)
        case j: ShuffledHashJoinExec if onBhash(j.leftKeys) => (j.left, j.right)
        case j: BroadcastHashJoinExec if onBhash(j.leftKeys) => (j.left, j.right)
      }
      assert(bandJoins.size === 1,
        s"exactly one (band, bhash)-keyed candidate join expected:\n$plan")
      // unlike dd2's full self-join (both sides the same banded corpus,
      // one reused exchange), EXACTLY ONE side must carry the delta
      // semi-join mark: probe = delta-filtered, index = whole corpus
      def hasSemi(p: SparkPlan): Boolean = p.collect {
        case s: BroadcastHashJoinExec if s.joinType.sql == "LEFT SEMI" => s
        case s: ShuffledHashJoinExec if s.joinType.sql == "LEFT SEMI" => s
        case s: SortMergeJoinExec if s.joinType.sql == "LEFT SEMI" => s
      }.nonEmpty
      val (l, r) = bandJoins.head
      assert(hasSemi(l) ^ hasSemi(r),
        s"one side must be the delta probe, the other the full index:\n$plan")
      assert(!plan.toString.contains("CartesianProduct"))
    } finally spark.conf.set(key, saved)
  }

  test("tx25: a BPE training iteration is two hash aggs + " +
      "TakeOrderedAndProject — merge application is scan-local " +
      "(no window, no join, no global sort)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.BpeOps
    // one iteration's composition, uncached so BOTH aggs are visible:
    // word count + (merged re-symbolization folded into the scan) +
    // pair count + top-k
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val st = BpeOps.words(docs)
      .select(col("freq"), BpeOps.charSyms(col("w")).as("syms"))
      .withColumn("syms", BpeOps.applyMerge(col("syms"), "e", "r"))
    val df = BpeOps.pairCounts(st)
      .orderBy(col("n").desc, col("pair")).limit(5)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$s")
    assert(!s.contains("Join"), s"no join anywhere in an iteration:\n$s")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"merge application must be scan-local:\n$s")
    val modes = plan.collect { case h: HashAggregateExec =>
      h.aggregateExpressions.map(_.mode)
    }.flatten
    assert(modes.contains(Partial) && modes.contains(Final),
      s"pair/word aggs must be two-phase hash aggs:\n$s")
  }

  test("dd11: the stored index is probed, never rebuilt — banding " +
      "runs once (delta side only) and the bucketed index scan feeds " +
      "the band join with NO shuffle") {
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val (savedB, savedA) = (spark.conf.get(bcast), spark.conf.get(aqe))
    spark.conf.set(bcast, "-1") // force the shuffle-topology decision
    spark.conf.set(aqe, "false")
    try {
      val df = Registry.byName("dd11_stored_index_dedup").fn(spark, dir)
      // ONE Generate total: the delta is banded on the fly; the corpus
      // NEVER is (its bands come from the stored index rows)
      import org.apache.spark.sql.catalyst.plans.logical.Generate
      val gens = df.queryExecution.optimizedPlan.collect {
        case g: Generate => g
      }
      assert(gens.size === 1,
        s"exactly one banding explode (the delta's), got ${gens.size}")
      // executedPlan: join exchanges exist only post-EnsureRequirements
      // (sparkPlan would make the no-shuffle assertion vacuous); AQE
      // is off so this is the real final plan
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      // the (band, bhash) join: the index side must be exchange-free —
      // its bucketed layout already satisfies the join's distribution
      val bandJoins = plan.collect {
        case j: SortMergeJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "band")) =>
          (j.left, j.right)
        case j: ShuffledHashJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "band")) =>
          (j.left, j.right)
      }
      assert(bandJoins.size === 1, s"expected ONE band join:\n$plan")
      def indexScans(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case s: FileSourceScanExec
              if s.relation.location.rootPaths
                .exists(_.toString.contains("graft_lsh_idx")) => s
        }
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case e: ShuffleExchangeExec => e }
      val (l, r) = bandJoins.head
      val indexSide = if (indexScans(l).nonEmpty) l else r
      val probeSide = if (indexScans(l).nonEmpty) r else l
      assert(indexScans(indexSide).nonEmpty,
        s"one side must read the stored index:\n$plan")
      assert(indexScans(indexSide).head.bucketedScan,
        "the index must be read AS BUCKETED (bucket-aligned, presorted)")
      assert(shuffles(indexSide).isEmpty,
        s"the corpus-scale index side must not shuffle:\n$indexSide")
      assert(indexScans(probeSide).isEmpty,
        s"the probe side must not re-read the index:\n$probeSide")
    } finally {
      spark.conf.set(bcast, savedB)
      spark.conf.set(aqe, savedA)
    }
  }

  test("md10: the stored phash index is probed, never rebuilt — " +
      "fingerprinting runs once (delta side only) and the bucketed " +
      "index scan feeds the band join with NO shuffle; payload bytes " +
      "never cross an exchange") {
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val (savedB, savedA) = (spark.conf.get(bcast), spark.conf.get(aqe))
    spark.conf.set(bcast, "-1")
    spark.conf.set(aqe, "false")
    try {
      val df = Registry.byName("md10_phash_index_probe").fn(spark, dir)
      // exactly ONE fingerprint computation (the delta's): the corpus
      // fingerprints come from the stored index rows
      import org.apache.spark.sql.graft.PHashFingerprint
      val fps = df.queryExecution.optimizedPlan.collect {
        case p if p.expressions.exists(_.exists(
          _.isInstanceOf[PHashFingerprint])) => p
      }
      assert(fps.size === 1,
        s"exactly one fingerprinting projection (the delta's), got " +
          s"${fps.size}")
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val bandJoins = plan.collect {
        case j: SortMergeJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "band")) =>
          (j.left, j.right)
        case j: ShuffledHashJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "band")) =>
          (j.left, j.right)
      }
      assert(bandJoins.size === 1, s"expected ONE band join:\n$plan")
      def indexScans(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case s: FileSourceScanExec
              if s.relation.location.rootPaths
                .exists(_.toString.contains("graft_phash_idx")) => s
        }
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case e: ShuffleExchangeExec => e }
      val (l, r) = bandJoins.head
      val indexSide = if (indexScans(l).nonEmpty) l else r
      val probeSide = if (indexScans(l).nonEmpty) r else l
      assert(indexScans(indexSide).nonEmpty,
        s"one side must read the stored index:\n$plan")
      assert(indexScans(indexSide).head.bucketedScan,
        "the index must be read AS BUCKETED (bucket-aligned, presorted)")
      assert(shuffles(indexSide).isEmpty,
        s"the corpus-scale index side must not shuffle:\n$indexSide")
      assert(indexScans(probeSide).isEmpty,
        s"the probe side must not re-read the index:\n$probeSide")
      // media payload bytes (the binary `content` column) must never
      // cross an exchange — only (band, bkey, media_id, fp) rows move
      plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        val cols = e.child.output.map(_.name.toLowerCase)
        assert(!cols.contains("content"),
          s"payload bytes crossed an exchange: $cols")
      }
    } finally {
      spark.conf.set(bcast, savedB)
      spark.conf.set(aqe, savedA)
    }
  }

  test("sim8: the SQ8 corpus-scale cid join moves ONLY int8 rows — no " +
      "double-array column crosses a cid exchange; floats flow at " +
      "candidate scale; one cached projection feeds every branch") {
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val (savedB, savedA) = (spark.conf.get(bcast), spark.conf.get(aqe))
    spark.conf.set(bcast, "-1")
    spark.conf.set(aqe, "false")
    try {
      val df = Registry.byName("sim8_ivf_sq8_top1").fn(spark, dir)
      // cache reuse: the quantized projection is persisted once and
      // read by index, probe, and both rerank branches
      import org.apache.spark.sql.execution.columnar.InMemoryRelation
      val imrs = df.queryExecution.optimizedPlan.collect {
        case r: InMemoryRelation => r
      }
      assert(imrs.size >= 4,
        s"all four branches must read the cached projection, " +
          s"got ${imrs.size}")
      // executedPlan, not sparkPlan: EnsureRequirements inserts the
      // join exchanges only at this level (AQE is off, so it is the
      // real final plan)
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      // the bandwidth claim, checked: every exchange whose key is cid
      // (the corpus-scale join) carries NO array<double> column — the
      // quantized array<long> + scalars only
      val allExchanges = plan.collect { case e: ShuffleExchangeExec => e }
      val cidExchanges = allExchanges.filter(
        _.outputPartitioning.toString.contains("cid"))
      assert(cidExchanges.nonEmpty,
        s"expected the cid-keyed exchange; partitionings were " +
          s"${allExchanges.map(_.outputPartitioning)}:\n$plan")
      cidExchanges.foreach { e =>
        val doubleArrays = e.child.output.filter(a => a.dataType ==
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)
          || a.dataType == org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = true))
        assert(doubleArrays.isEmpty,
          s"float vectors must not cross the corpus-scale cid " +
            s"exchange, found ${doubleArrays.map(_.name)}:\n$e")
      }
    } finally {
      spark.conf.set(bcast, savedB)
      spark.conf.set(aqe, savedA)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("sim7: the stored IVF index feeds the probe join bucket-aligned " +
      "— zero index-side shuffle, queries scored in-row off the " +
      "stored centroids") {
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val (savedB, savedA) = (spark.conf.get(bcast), spark.conf.get(aqe))
    spark.conf.set(bcast, "-1")
    spark.conf.set(aqe, "false")
    try {
      val df = Registry.byName("sim7_ivf_stored_top1").fn(spark, dir)
      // executedPlan: see the dd11 gate — exchange assertions are
      // vacuous at the sparkPlan level
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val cidJoins = plan.collect {
        case j: SortMergeJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "cid")) =>
          (j.left, j.right)
        case j: ShuffledHashJoinExec
            if j.leftKeys.exists(_.references.exists(_.name == "cid")) =>
          (j.left, j.right)
      }
      assert(cidJoins.size === 1, s"expected ONE cid join:\n$plan")
      def indexScans(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case s: FileSourceScanExec
              if s.relation.location.rootPaths
                .exists(_.toString.contains("graft_ivf_idx")) => s
        }
      val (l, r) = cidJoins.head
      val indexSide = if (indexScans(l).nonEmpty) l else r
      val probeSide = if (indexScans(l).nonEmpty) r else l
      assert(indexScans(indexSide).nonEmpty,
        s"one side must read the stored inverted lists:\n$plan")
      assert(indexScans(indexSide).head.bucketedScan,
        "the inverted lists must be read AS BUCKETED")
      assert(indexSide.collect {
        case e: ShuffleExchangeExec => e }.isEmpty,
        s"the corpus-scale index side must not shuffle:\n$indexSide")
      assert(indexScans(probeSide).isEmpty,
        s"the probe side must not re-read the index:\n$probeSide")
      assert(!plan.toString.contains("CartesianProduct") &&
        !plan.toString.contains("Window"),
        s"probe selection stays in-row:\n$plan")
    } finally {
      spark.conf.set(bcast, savedB)
      spark.conf.set(aqe, savedA)
    }
  }

  test("sim12: the GRAFT_ANN SQL macro keeps the stored-index plan " +
      "class — the corpus-scale inverted lists never sit under a " +
      "shuffle, the k-row centroid companion broadcasts, no cartesian") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE off so exchange subtrees stay traversable (sim7's gate
    // discipline); broadcast stays ON — the k-row centroid companion
    // is designed to broadcast
    val aqe = "spark.sql.adaptive.enabled"
    val savedA = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try {
      val df = Registry.byName("sim12_ann_sql_top1").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      def isIndexScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p match {
          case s: FileSourceScanExec =>
            // the inverted LISTS specifically — the k-row centroid
            // companion shares the index root under /cents
            s.relation.location.rootPaths.exists(r =>
              r.toString.contains("graft_ivf_idx") &&
                r.toString.contains("/lists"))
          case _ => false
        }
      assert(plan.exists(isIndexScan),
        s"the macro must read the STORED lists, not recompute:\n$plan")
      // the scale property: the corpus-scale list relation reaches the
      // cid join WITHOUT a shuffle on its own side (broadcast here,
      // bucket-aligned at scale) — post-join exchanges are
      // candidate-scale by construction and fine
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      def onCid(ks: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        ks.exists(_.references.exists(_.name == "cid"))
      val cidJoins = plan.collect {
        case j: BroadcastHashJoinExec if onCid(j.leftKeys) =>
          (j.left, j.right)
        case j: SortMergeJoinExec if onCid(j.leftKeys) =>
          (j.left, j.right)
        case j: ShuffledHashJoinExec if onCid(j.leftKeys) =>
          (j.left, j.right)
      }
      assert(cidJoins.size === 1, s"expected ONE cid join:\n$plan")
      val (l, r) = cidJoins.head
      val indexSide = Seq(l, r).find(_.exists(isIndexScan))
      assert(indexSide.isDefined,
        s"one side of the cid join must read the stored lists:\n$plan")
      assert(indexSide.get.collect {
        case e: ShuffleExchangeExec => e }.isEmpty,
        s"the inverted lists must not shuffle before the join:\n" +
          s"${indexSide.get}")
      assert(!plan.toString.contains("CartesianProduct"),
        s"the centroid companion must broadcast, not cartesian:\n$plan")
    } finally spark.conf.set(aqe, savedA)
  }

  test("tx26: trainer lineage is bounded — optimized-plan depth is " +
      "periodic in the epoch, never grows with the step count, and " +
      "each epoch base is an in-memory relation") {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import graft.operators.BpeOps
    def depth(p: LogicalPlan): Int =
      1 + p.children.foldLeft(0)((m, c) => math.max(m, depth(c)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val depths = scala.collection.mutable.Map.empty[Int, Int]
    var sawCachedBase = false
    BpeOps.trainMerges(docs, steps = 12, topK = 1, epochLen = 4,
      probe = (k, st) => {
        // optimizedPlan is where cache substitution lands: each epoch
        // base resolves to an InMemoryRelation LEAF, so bounded lineage
        // is visible here (analyzed plans keep full pre-cache lineage)
        depths(k) = depth(st.queryExecution.optimizedPlan)
        if (k > 4) sawCachedBase ||= st.queryExecution.optimizedPlan.collect {
          case r: InMemoryRelation => r
        }.nonEmpty
      })
    // nested formulation: depth(k) grows by one Project per step.
    // epoch formulation: depth depends only on the position WITHIN the
    // epoch (pending empty vs non-empty), so it is exactly periodic —
    // step k and step k+epochLen compile the same plan shape.
    for (k <- 2 to 8)
      assert(depths(k) === depths(k + 4),
        s"plan depth must be epoch-periodic, got $depths")
    assert(depths.values.max <= depths(2) + 2,
      s"no step may deepen lineage beyond one merge-table projection: $depths")
    assert(sawCachedBase,
      "after the first epoch the symbolization must read a cached base")
  }

  test("wod10: the polygon join is a broadcast CELL equi-join — the " +
      "point table never shuffles for the polygons and nothing plans " +
      "as |points|×|polygons|") {
    val plan = executedPlan("wod10_geo_polygon_join")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"),
      s"cell candidates must come from a broadcast equi-join:\n$s")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("SortMergeJoin"),
      s"the point-polygon pair space must stay cell-collocated:\n$s")
  }

  test("ev12: dynamic-gap session_window keeps the single-shuffle " +
      "topology — per-event gaps don't cost a second exchange") {
    val plan = executedPlan("ev12_dynamic_session")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashExchanges.length === 1,
      s"dynamic session_window must shuffle once on user_id:\n$plan")
  }

  test("dd13: PageRank iterations never shuffle the graph for scalars " +
      "— the node count enters as broadcast 1-row joins, and nothing " +
      "plans as a cartesian over the edge relation") {
    val plan = executedPlan("dd13_dup_graph_pagerank")
    val s = plan.toString
    assert(!s.contains("CartesianProduct"),
      s"no true cartesian anywhere in the 3-iteration plan:\n$s")
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    // r0 + three iterations: exactly the four 1-row scalar attaches
    assert(bnlj.length === 4,
      s"expected 4 broadcast scalar joins (r0 + 3 iterations), got " +
        s"${bnlj.length}:\n$s")
  }

  test("ev13: the SCD2 build runs on ONE user_id exchange — change " +
      "flags, run collapse, and the interval LEAD all reuse it") {
    val plan = executedPlan("ev13_scd2_intervals")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashExchanges.length === 1,
      s"SCD2 must shuffle once on user_id:\n$plan")
  }

  test("tx29: the changelog APPLY broadcasts the delta and the DIFF " +
      "runs ONCE — both apply consumers read the scoped changelog " +
      "cache, so the corpus-keyed full-outer never re-plans") {
    val plan = executedPlan("tx29_changelog_apply")
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val anti = plan.collect { case j: BroadcastHashJoinExec
        if j.joinType.toString == "LeftAnti" => j }
    assert(anti.nonEmpty,
      s"the apply-side anti join must broadcast the delta keys:\n$plan")
    // cache-hit half on the PRE-ACTION logical plan (the scoped cache
    // releases right after the consuming action — see the q20 note)
    val opt = Registry.byName("tx29_changelog_apply").fn(spark, dir)
      .queryExecution.optimizedPlan
    val cached = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.size == 2,
      s"both apply consumers (anti keys + payloads) must read the " +
        s"cached changelog, found ${cached.size}:\n$opt")
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType.toString == "FullOuter" => j
    }
    assert(joins.isEmpty,
      s"the full-outer DIFF must live inside the cache, not re-plan " +
        s"per consumer:\n$opt")
  }

  test("tx30: the view refresh is incremental — the merge joins two " +
      "GROUP-scale aggregates and the new snapshot is never " +
      "re-aggregated wholesale") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val opt = Registry.byName("tx30_incremental_agg").fn(spark, dir)
      .queryExecution.optimizedPlan
    val aggs = opt.collect { case a: Aggregate => a }
    assert(aggs.size == 2,
      s"exactly two aggregates (view + delta contributions), got " +
        s"${aggs.size}:\n$opt")
    val fo = opt.collect {
      case j: Join if j.joinType.toString == "FullOuter" => j }
    assert(fo.size == 2,
      s"exactly two full-outer joins (diff + merge), got ${fo.size}:\n$opt")
    // the TOP join is the refresh merge: both inputs must already be
    // aggregated (group-scale) — an engine that re-aggregated the new
    // snapshot would put a corpus-scale scan directly under it
    val top = fo.head
    Seq(top.left, top.right).foreach { side =>
      assert(side.collectFirst { case a: Aggregate => a }.isDefined,
        s"refresh-merge input must be an aggregate:\n$side")
    }
    // and the delta aggregate reads the diff join, not a raw scan
    val deltaAgg = aggs.find(_.collectFirst {
      case j: Join if j.joinType.toString == "FullOuter" => j }.isDefined)
    assert(deltaAgg.isDefined,
      s"one aggregate must sit above the changelog diff join:\n$opt")
  }

  test("tx31: the weighted sample never window-sorts the corpus — " +
      "the per-source threshold is an O(k) aggregate that broadcasts " +
      "back into a scan-local filter") {
    val plan = executedPlan("tx31_weighted_sample")
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"no corpus-wide window sort — the threshold comes from the " +
        s"topk_values kernel:\n$plan")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"the source-scale threshold relation must broadcast:\n$plan")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    // one partial/final agg exchange for the thresholds + the final
    // orderBy range exchange — the corpus itself never hash-shuffles
    assert(shuffles.size <= 2,
      s"corpus must not shuffle for the sample, found " +
        s"${shuffles.size} exchanges:\n$plan")
  }

  test("q28: unpivot is ONE pass — a single Expand over a single " +
      "scan, not four unioned scans of the fact table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Expand, Union}
    val opt = Registry.byName("q28_unpivot_measures").fn(spark, dir)
      .queryExecution.optimizedPlan
    assert(opt.collect { case e: Expand => e }.size == 1,
      s"melt must plan as one Expand:\n$opt")
    assert(opt.collect { case u: Union => u }.isEmpty,
      s"no union-of-scans:\n$opt")
    val scans = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 1,
      s"the fact table must be scanned once, found ${scans.size}:\n$opt")
  }

  test("dd15: the contamination probe broadcasts the eval grams — " +
      "the corpus shuffles only for the per-doc count") {
    val plan = executedPlan("dd15_ngram_contamination")
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"eval gram universe must broadcast:\n$plan")
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"no sort-merge join anywhere in the probe:\n$plan")
    // hash exchanges only: eval-side distinct (eval-scale) + the
    // doc_id count agg — spread()'s round-robin scan-spreads and the
    // final orderBy range exchange are not data shuffles of the probe
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.size <= 2,
      s"at most the eval distinct + doc_id agg hash exchanges, found " +
        s"${hashEx.size}:\n$plan")
  }

  test("ev7: sessionization runs on ONE hash exchange — both windows " +
      "and the session agg reuse the user_id partitioning") {
    val plan = executedPlan("ev7_sessionize")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashExchanges.size == 1,
      s"gap-sessionization needs exactly one data shuffle, got " +
        s"${hashExchanges.size}:\n$plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 2, s"expected lag + running-sum windows:\n$plan")
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    // one partition-local sort under the windows + the presentation
    // sort; a third would mean the windows stopped sharing their order
    assert(sorts.size <= 2, s"windows must share one sort:\n$plan")
  }

  test("wod11: the basin dim prunes store partitions at RUNTIME — " +
      "dynamicpruning expression on the partitioned scan") {
    val plan = executedPlan("wod11_dpp_scan")
    val storeScans = plan.collect {
      case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(
            _.toString.contains("bulkrun")) => sc
    }
    assert(storeScans.nonEmpty, s"expected the bulk-store scan:\n$plan")
    assert(storeScans.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"store scan must carry a dynamicpruning partition filter:\n" +
        storeScans.map(s => s.partitionFilters.mkString(", "))
          .mkString("\n"))
  }

  test("tx33: the perplexity filter ranks window-free — no Window node, " +
      "rank assembled on a range repartition") {
    val plan = executedPlan("tx33_perplexity_filter")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"tx33 must not contain a Window node (global ROW_NUMBER would " +
        s"single-task):\n$plan")
    assert(plan.toString.contains("rangepartitioning"),
      "expected a range repartition feeding the rank assembly")
  }

  test("dd17: semantic dedup assigns IN-ROW off literal centroids — " +
      "no nested-loop, no cartesian, no array-keyed aggregate") {
    // the cid-keyed candidate pair join runs inside the connected-
    // components checkpoint (its lineage is truncated to an RDD scan
    // in the final plan), so the visible gate is the assignment +
    // report path: in-row scoring means NO BroadcastNestedLoopJoin
    // (the old crossJoin shape), NO cartesian, and no SortAggregate
    // forced by array-typed grouping keys
    val plan = executedPlan("dd17_semantic_dedup")
    val cartesians = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cartesians.isEmpty,
      s"dd17 must never cartesian-join the corpus:\n$plan")
    val loops = plan.collect {
      case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
    }
    assert(loops.isEmpty,
      s"assignment must be in-row off the centroid literal, not a " +
        s"nested-loop centroid join:\n$plan")
    val arrayKeyedAggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if a.groupingExpressions.exists(
            _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        => a
    }
    assert(arrayKeyedAggs.isEmpty,
      s"no aggregate may group on the embedding array:\n$plan")
  }

  test("dq4: skew report scans ONCE — two hash aggregations, the table " +
      "total folded from the bucket agg, no second scan, no join") {
    val plan = executedPlan("dq4_skew_report")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashEx.size <= 2,
      s"per-key agg + bucket agg are the only data shuffles, got " +
        s"${hashEx.size}:\n$plan")
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1,
      s"the total must come off the bucket agg, not a second scan " +
        s"(found ${scans.size} scans):\n$plan")
  }

  test("tx35: deterministic shuffle windows PER SHARD — no empty " +
      "partition spec (global row_number would single-task 100 TB)") {
    val plan = executedPlan("tx35_deterministic_shuffle")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"expected the position window:\n$plan")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"the position window must partition by shard:\n$plan")
  }

  test("q29: the sketch stages are cached — every downstream consumer " +
      "reads the ≤1024-row histogram, never a re-scan of the data") {
    // PRE-ACTION logical plan (q20's discipline): the scoped caches
    // substitute during construction
    val df = Registry.byName("q29_histogram_quantiles").fn(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    val cached = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.size >= 3,
      s"expected cum/pick/readout consumers on the cached min-max + " +
        s"histogram, found ${cached.size}:\n$opt")
    val rawScans = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(rawScans.isEmpty,
      s"no consumer may re-scan lineitem; direct scans found:\n$opt")
    // and the cumulative/total windows exist over the tiny cached input
    val windows = executedPlan("q29_histogram_quantiles").collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the cumulative window")
  }

  test("md6/md7: the PCM decode and image resize are scan-local — zero " +
      "hash exchanges before the presentation sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    for (name <- Seq("md6_audio_energy", "md7_image_resize")) {
      val plan = executedPlan(name)
      val hashEx = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      assert(hashEx.isEmpty,
        s"$name is row-local; no data shuffle belongs here:\n$plan")
    }
  }

  test("runtime bloom filter: a selective dim on a shuffle join injects " +
      "a bloom probe into the fact side (the engine's runtime-filter " +
      "path for joins too big to broadcast)") {
    import org.apache.spark.sql.functions.col
    // session-isolated confs: force the shuffle join (no broadcast) and
    // drop the size thresholds to toy scale — on a real cluster the
    // defaults (10 MB build / 10 GB probe) make this fire exactly when
    // it pays
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "100MB")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
    val o = s2.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val l = s2.read.parquet(s"$dir/lineitem.parquet")
    val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(org.apache.spark.sql.functions.count(col("l_quantity")).as("n"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
      s"expected a runtime bloom filter on the fact side:\n$optimized")
  }

  test("AQE skew join: a pathologically hot key is SPLIT at runtime — " +
      "the straggler-task killer for skewed 100 TB joins (ev11's manual " +
      "salting is the pre-planned variant; this is the adaptive one)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // session-isolated confs: thresholds dropped to toy scale — the
    // defaults (256 MB advisory, median×5 factor) fire at real scale
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    // one key owns ~94% of the left side; the right side is uniform
    val left = s2.range(0, 48000).select(
      when(col("id") < 45000L, lit(0L)).otherwise(col("id") % 16).as("k"),
      col("id").as("payload"))
    val right = s2.range(0, 16).select(col("id").as("k"),
      (col("id") * 100).as("dim"))
    val joined = left.join(right, "k")
      .groupBy(col("k")).agg(org.apache.spark.sql.functions.sum("payload"))
    // collect() executes THIS df's QueryExecution (count() would plan
    // its own), so the adaptive plan below is the finalized one with
    // runtime skew decisions in it
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the skew-marked join sits INSIDE a materialized query stage,
    // which collect() does not descend into — the rendered plan is
    // the reliable witness ("SortMergeJoin(skew=true)" + an
    // AQEShuffleRead marked skewed)
    val rendered = plan.toString
    assert(rendered.contains("skew=true"),
      s"expected OptimizeSkewedJoin to mark the join skew-split:\n$rendered")
    assert(rendered.contains("skewed"),
      s"expected the AQEShuffleRead to be skew-split:\n$rendered")
  }

  test("tx37: BM25 serves off the STORED index — query terms broadcast " +
      "into the postings scan, and top-k plans as TakeOrderedAndProject " +
      "(no global sort of the scored candidates)") {
    val plan = executedPlan("tx37_bm25_topk")
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val bcasts = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bcasts.nonEmpty,
      s"the query term set (and per-term df) must broadcast:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort the candidates:\n$plan")
    // the postings relation is read from the bucketed store, never
    // re-derived from documents: no Generate (tokenizing explode) in
    // the probe plan
    import org.apache.spark.sql.execution.GenerateExec
    val gens = plan.collect { case g: GenerateExec => g }
    assert(gens.isEmpty,
      s"probe must not re-tokenize the corpus:\n$plan")
  }

  test("av2: the as-of join plans as the custom AsOfJoinExec merge " +
      "operator — no window state, no union, one clustering exchange " +
      "per side (the O(n+m) constant-memory temporal-join shape)") {
    val plan = executedPlan("av2_asof_exec")
    import org.apache.spark.sql.execution.UnionExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.graft.AsOfJoinExec
    assert(plan.collect { case e: AsOfJoinExec => e }.nonEmpty,
      s"expected the custom operator:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty &&
        plan.collect { case u: UnionExec => u }.isEmpty,
      s"must not fall back to av1's union+window formulation:\n$plan")
    // 2 clustering exchanges (one per side) + the final presentation
    // sort's range exchange = at most 3 shuffles total
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 3,
      s"expected ≤3 exchanges, got ${shuffles.size}:\n$plan")
  }

  test("dd19: prefix filtering prunes hard and never misses — the " +
      "candidate join touches a fraction of the co-occurring pairs, no " +
      "cartesian/nested-loop anywhere") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = executedPlan("dd19_prefix_filter_join")
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty &&
        plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"prefix filter must not degenerate to all-pairs:\n$plan")
    // the measured pruning claim: prefix candidates ≪ co-occurring pairs
    import org.apache.spark.sql.functions._
    import graft.operators.TextDedupOps.shingles
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val cooccur = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val sizes = docs.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = inv.join(inv.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")), Seq("shingle"))
      .withColumn("pos", row_number().over(w))
      .join(sizes, Seq("doc_id"))
      .filter(col("pos") <= col("n") - expr("(7 * n + 9) DIV 10") + lit(1))
    val cands = prefix.select(col("shingle"), col("doc_id").as("id_a"))
      .join(prefix.select(col("shingle"), col("doc_id").as("id_b")),
        Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().count()
    assert(cands * 4 <= cooccur,
      s"prefix filter should prune ≥4×: candidates=$cands vs all=$cooccur")
  }

  test("av6: the as-of over the sorted-bucketed store runs with ZERO " +
      "hash exchanges — bucketing satisfies the operator's clustering " +
      "requirement straight off disk") {
    val plan = executedPlan("av6_asof_bucketed")
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.graft.AsOfJoinExec
    assert(plan.collect { case e: AsOfJoinExec => e }.nonEmpty,
      s"expected the merge as-of operator:\n$plan")
    val hashShuffles = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashShuffles.isEmpty,
      s"the bucketed store must satisfy clustering with no exchange:\n$plan")
  }

  test("av5: the broadcast as-of never shuffles or sorts the probe " +
      "side — one broadcast exchange, and the only shuffle/sort pair " +
      "is the final presentation ORDER BY") {
    val plan = executedPlan("av5_asof_broadcast")
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.graft.BroadcastAsOfJoinExec
    assert(plan.collect { case e: BroadcastAsOfJoinExec => e }.nonEmpty,
      s"expected the broadcast as-of operator:\n$plan")
    assert(plan.collect { case e: BroadcastExchangeLike => e }.nonEmpty,
      s"the click side must broadcast:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeLike => e }.size <= 1,
      s"only the ORDER BY may shuffle:\n$plan")
    assert(plan.collect { case s: SortExec => s }.size <= 1,
      s"only the ORDER BY may sort:\n$plan")
  }

  test("av7: the SQL-text ASOF JOIN lands on the SAME custom operator " +
      "as the DataFrame API — parser extension + resolution rule, " +
      "no plain SortMergeJoin fallback") {
    val plan = executedPlan("av7_asof_sql")
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.graft.{AsOfJoinExec, BroadcastAsOfJoinExec}
    assert(plan.exists(p => p.isInstanceOf[AsOfJoinExec] ||
        p.isInstanceOf[BroadcastAsOfJoinExec]),
      s"expected an as-of exec from the SQL path:\n$plan")
    assert(!plan.exists(p => p.isInstanceOf[SortMergeJoinExec] ||
        p.isInstanceOf[BroadcastHashJoinExec]),
      s"the ASOF text must not plan an ordinary join:\n$plan")
  }

  test("q33: sketch aggregation is two-phase at BOTH grain levels — " +
      "raw rows combine map-side into O(k) sketches before any " +
      "exchange, and only sketch bytes cross the wire") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executedPlan("q33_bksample_quantile")
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode))
    assert(modes.count(_ == Partial) >= 2 && modes.count(_ == Final) >= 2,
      s"expected Partial+Final at both grain levels, got $modes")
    // every shuffle below a Final agg carries the binary sketch, not
    // the (hash, value) raw pairs — the property that caps exchange
    // bytes at groups×k regardless of row count
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    val aggShuffles = shuffles.filterNot(
      _.outputPartitioning.numPartitions == 1) // final ORDER BY
    assert(aggShuffles.nonEmpty)
    aggShuffles.foreach { e =>
      val cols = e.child.output.map(_.name.toLowerCase)
      assert(!cols.exists(c => c == "h" || c == "x"),
        s"raw (h, x) columns crossed an exchange: $cols")
    }
  }

  test("q38: both tables' key sketches combine map-side — only 24 KB " +
      "counter matrices cross any exchange, never raw hashed keys") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executedPlan("q38_cms_join_size")
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode))
    // two sketch aggregations (orders + lineitem), each Partial+Final
    assert(modes.count(_ == Partial) >= 2 && modes.count(_ == Final) >= 2,
      s"expected two two-phase sketch aggregations, got $modes")
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    shuffles.foreach { e =>
      val cols = e.child.output.map(_.name.toLowerCase)
      assert(!cols.contains("h"),
        s"raw hashed keys crossed an exchange: $cols")
    }
  }

  test("em8: the per-cluster sample is a bounded-state AGGREGATE — " +
      "no Window operator sorts the corpus inside k=8 giant " +
      "partitions, and raw (h, vec_id) rows never cross an exchange " +
      "after the sketch combine") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executedPlan("em8_diversity_sample")
    assert(!plan.exists(_.isInstanceOf[WindowExec]),
      s"a window over the corpus would sort k giant partitions:\n$plan")
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode))
    assert(modes.contains(Partial) && modes.contains(Final),
      s"expected the bottom-k sample agg two-phase, got $modes")
    // the exchange feeding the sample's Final agg carries sketch
    // bytes keyed by cid — not per-row (h, vec_id) pairs. The robust
    // plan signature for that is structural, not name-based: some
    // shuffle must sit ABOVE the Partial-mode sample agg (its input
    // subtree already combined rows into O(m)-state sketches before
    // anything crossed the wire).
    val sketchShuffles = plan.collect { case e: ShuffleExchangeExec
      if e.child.exists {
        case a: ObjectHashAggregateExec =>
          a.aggregateExpressions.exists(_.mode == Partial)
        case _ => false
      } => e }
    plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val cols = e.child.output.map(_.name.toLowerCase)
      assert(!cols.contains("h"),
        s"raw hash column crossed an exchange: $cols")
    }
    assert(sketchShuffles.nonEmpty,
      "no exchange carries the partial bottom-k sketch keyed by cid — " +
        "the sample's Final agg would be shuffling raw rows instead:\n" +
        plan)
  }
}
