package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The GraftPipeline builder: stage semantics (decontamination really
  * removes contaminated content, dedup keep rules match the standalone
  * queries' rules), config gating (a disabled stage leaves NO trace in
  * the plan), and the plan discipline the inline tx36 pipeline locks
  * (broadcast anti-join for decon; the packing tail's single hash
  * exchange feeding both window passes).
  */
class GraftPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  /** PlanQualitySpec's discipline: run a SEPARATE action first, then
    * read this df's own executedPlan lazily — an EXECUTED adaptive
    * plan hides operators inside materialized query-stage leaves and
    * becomes untraversable.
    */
  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.count()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("decontamination drops every doc sharing a contaminated hash " +
      "and nothing else") {
    val d = docs
    val eval = d.filter(col("doc_id") % 11 === 5)
    val out = GraftPipeline.run(d, "doc_id", "text",
      GraftPipeline.Config(minChars = 0, exactDedup = false),
      evalDocs = Some(eval))
    val outIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = d.join(
        eval.select(md5(col("text")).as("eh")).distinct(),
        md5(d("text")) === col("eh"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.nonEmpty)
    assert(outIds.intersect(contaminated).isEmpty,
      "contaminated docs must not survive")
    assert(outIds.size === d.count() - contaminated.size,
      "nothing beyond the contaminated set may be dropped")
  }

  test("near-dedup keep rule matches dd12's canonical-min-id rule") {
    val cfg = GraftPipeline.Config(minChars = 0, nearDedup = true)
    val keep = GraftPipeline.nearKeepList(docs, "doc_id", "text", cfg)
      .collect().map(_.getLong(0)).toSet
    val clusters = ClusterOps.connectedComponents(
      TextDedupOps.minhashLshPairs(docs, "doc_id", "text", 8, 2, 0.2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(id => clusters.getOrElse(id, id) == id).toSet
    assert(keep === expected)
    assert(keep.size < docs.count(), "some duplicate must be dropped")
  }

  test("the full chain equals the composition of its stages") {
    val cfg = GraftPipeline.Config(minChars = 100, exactDedup = true)
    val chained = GraftPipeline.run(docs, "doc_id", "text", cfg)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val q = GraftPipeline.qualityFilter(docs, cfg)
    val manual = GraftPipeline.pack(
      q.join(GraftPipeline.exactKeepList(q, "doc_id", "text"),
        Seq("doc_id"), "left_semi"), "doc_id", "text", cfg)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(chained === manual)
  }

  test("provenance is CONSISTENT with the packed run: kept ids == the " +
      "run's output ids with identical coordinates, dispositions " +
      "partition the input, and near-dup attribution points at the " +
      "cluster canonical") {
    val cfg = GraftPipeline.Config(minChars = 100, exactDedup = true)
    val ev = Some(docs.filter(col("doc_id") % 11 === 5))
    val prov = GraftPipeline.runWithProvenance(docs, "doc_id", "text",
      cfg, ev).collect().toSeq
    assert(prov.size.toLong === docs.count(), "one row per input doc")
    val packed = GraftPipeline.run(docs, "doc_id", "text", cfg, ev)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val kept = prov.filter(_.getString(1) == "kept")
    assert(kept.map(_.getLong(0)).toSet === packed.keySet,
      "kept set must equal the packed run's output ids")
    kept.foreach { r =>
      assert((r.getLong(3), r.getLong(4)) === packed(r.getLong(0)),
        s"coordinates must match the run for doc ${r.getLong(0)}")
    }
    // duplicates attribute to a kept doc with the same content
    val byId = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    prov.filter(_.getString(1) == "duplicate").foreach { r =>
      val keepId = r.getLong(2)
      assert(packed.contains(keepId) &&
        byId(keepId) == byId(r.getLong(0)),
        s"duplicate ${r.getLong(0)} must point at a kept identical doc")
    }
    // near form: same invariants against the near run
    val ncfg = GraftPipeline.Config(minChars = 100, nearDedup = true)
    val nprov = GraftPipeline.runWithProvenanceNear(docs, "doc_id",
      "text", ncfg).collect().toSeq
    assert(nprov.size.toLong === docs.count())
    val npacked = GraftPipeline.run(docs, "doc_id", "text", ncfg)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(nprov.filter(_.getString(1) == "kept").map(_.getLong(0)).toSet
      === npacked)
    nprov.filter(_.getString(1) == "near_duplicate").foreach { r =>
      assert(npacked.contains(r.getLong(2)),
        "a near-duplicate's canonical must itself be kept")
    }
  }

  test("provenance quality gate matches qualityFilter exactly: " +
      "minChars<=0 needs no n_chars column, and a NULL n_chars is a " +
      "quality drop, never a fall-through to duplicate/kept") {
    val cfg0 = GraftPipeline.Config(minChars = 0, exactDedup = true)
    // corpus WITHOUT n_chars: the disabled gate must not reference it
    val bare = docs.select(col("doc_id"), col("text"))
    val prov0 = GraftPipeline.runWithProvenance(bare, "doc_id", "text",
      cfg0).collect()
    assert(prov0.length.toLong === bare.count())
    assert(!prov0.exists(_.getString(1) == "quality"),
      "minChars=0 means the quality stage is off")
    // NULL n_chars with the gate ON: disposition must be `quality`,
    // exactly the rows qualityFilter would drop
    val withNulls = docs.withColumn("n_chars",
      when(col("doc_id") % 7 === 3, lit(null)).otherwise(col("n_chars")))
    val cfg = GraftPipeline.Config(minChars = 100, exactDedup = true)
    val prov = GraftPipeline.runWithProvenance(withNulls, "doc_id",
      "text", cfg).collect()
    val qualityDropped = prov.filter(_.getString(1) == "quality")
      .map(_.getLong(0)).toSet
    val keptByFilter = GraftPipeline.qualityFilter(withNulls, cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val allIds = withNulls.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(qualityDropped === (allIds -- keptByFilter),
      "provenance quality drops must equal qualityFilter's complement")
    // near form shares the flag helper — same two contracts hold
    val nprov0 = GraftPipeline.runWithProvenanceNear(bare, "doc_id",
      "text", GraftPipeline.Config(minChars = 0, nearDedup = true))
      .collect()
    assert(!nprov0.exists(_.getString(1) == "quality"))
  }

  test("plan discipline: decon is a BROADCAST anti-join; the pack tail " +
      "has ONE hash exchange; disabled stages leave no plan trace") {
    // assertions run on the FINAL adaptive plan's string (materialized
    // query stages print fully even though they are untraversable as
    // trees; the runtime-broadcast decisions only exist here)
    def finalPlanString(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
    }
    val eval = docs.filter(col("doc_id") % 11 === 5)
    val full = finalPlanString(GraftPipeline.run(docs, "doc_id", "text",
      GraftPipeline.Config(minChars = 100, exactDedup = true),
      evalDocs = Some(eval)))
    // decon: broadcast-built anti join (never a shuffled join, no NLJ)
    assert(full.contains("BroadcastHashJoin") && full.contains("LeftAnti"),
      s"expected a broadcast LeftAnti for decontamination:\n$full")
    assert(!full.contains("BroadcastNestedLoopJoin"))
    // hash exchanges: the dedup agg + the ONE pack exchange on shard —
    // nothing else may shuffle (the decon/semi joins must broadcast)
    val nEx = "Exchange hashpartitioning".r.findAllIn(full).length
    assert(nEx <= 2, s"pipeline must not grow extra exchanges:\n$full")

    // stages off ⇒ truly absent: no joins at all in a pack-only run
    val packOnly = finalPlanString(GraftPipeline.run(docs, "doc_id",
      "text", GraftPipeline.Config(minChars = 0, exactDedup = false)))
    assert(!packOnly.toLowerCase.contains("join"),
      s"disabled stages must leave no joins:\n$packOnly")
  }

  test("incremental run equals a fresh full run over the post-changelog " +
      "corpus, and its keep list never reads the corpus") {
    val cfg = GraftPipeline.Config(minChars = 100, exactDedup = true)
    val t = "plspec_exidx"
    // base corpus = quality-passing docs; changelog deletes doc_id%7==3
    // and upserts the surviving %5==0 docs with " upd" appended
    val base = docs.filter(length(col("text")) >= 100)
      .select(col("doc_id"), col("text"))
    GraftPipeline.buildExactIndex(base, "doc_id", "text", t)
    val upserts = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val preKeep = GraftPipeline.keepListFromIndex(spark, t, "doc_id")
      .collect().map(_.getLong(0)).toSet
    GraftPipeline.applyExactIndexDelta(spark, t, deletes,
      Some(upserts.filter(length(col("text")) >= 100)), "doc_id", "text",
      retain = 1)

    val newCorpus = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    val incremental = GraftPipeline.runIncremental(spark, t, newCorpus,
        "doc_id", "text", cfg)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val rebuilt = GraftPipeline.run(newCorpus, "doc_id", "text", cfg)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(incremental.nonEmpty)
    assert(incremental === rebuilt,
      "index-backed nightly run must equal the full rebuild")
    // the changelog must actually bite: a deleted doc may not survive,
    // and at least one upserted doc must be in the output
    val outIds = incremental.map(_.getLong(2)).toSet
    assert(outIds.forall(_ % 7 != 3), "deleted docs must be gone")
    assert(outIds.exists(_ % 5 == 0), "some upserted doc must survive")

    // keep-list plan: derived from the index ALONE — no corpus scan
    // (no parquet relation), and the bucketed-by-h scan satisfies the
    // agg's distribution so it plans ZERO exchanges even through the
    // serving view
    val keep = GraftPipeline.keepListFromIndex(spark, t, "doc_id")
    val plan = executed(keep)
    val planStr = plan.toString
    assert(!planStr.contains("documents"),
      s"keep list must not scan the corpus:\n$planStr")
    // string check, not tree collect: materialized query stages print
    // fully but are untraversable, so a tree collect could pass vacuously
    assert(!planStr.contains("Exchange"),
      s"keep list over the hash-bucketed index must not shuffle:\n$planStr")
    // the RETAINED snapshot re-derives the PRE-delta decision with the
    // same no-corpus-scan / no-shuffle plan (generation tables carry
    // the identical bucket spec)
    val snap = GraftPipeline.keepListFromSnapshot(spark, t, 1, "doc_id")
    assert(snap.collect().map(_.getLong(0)).toSet === preKeep,
      "snapshot keep list must equal the pre-delta decision")
    val snapStr = executed(snap).toString
    assert(!snapStr.contains("documents") && !snapStr.contains("Exchange"),
      s"snapshot keep list must stay index-only and shuffle-free:\n$snapStr")
    BucketedStores.dropVersioned(spark, t)
  }

  test("NEAR incremental run equals a fresh near-dedup rebuild, with " +
      "the keep list derived from the pair store (no re-banding)") {
    val cfg = GraftPipeline.Config(minChars = 100, nearDedup = true)
    val (lsh, pairs) = ("plspec_near_lsh", "plspec_near_pairs")
    val base = docs.filter(length(col("text")) >= 100)
      .select(col("doc_id"), col("text"))
    GraftPipeline.buildNearIndexes(base, "doc_id", "text", lsh, pairs, cfg)
    val upserts = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    GraftPipeline.applyNearIndexDelta(spark, lsh, pairs, deletes,
      Some(upserts.filter(length(col("text")) >= 100)), "doc_id", "text",
      cfg)

    val newCorpus = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    val incremental = GraftPipeline.runIncrementalNear(spark, pairs,
        newCorpus, "doc_id", "text", cfg)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val rebuilt = GraftPipeline.run(newCorpus, "doc_id", "text", cfg)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(incremental.nonEmpty)
    assert(incremental === rebuilt,
      "pair-store nightly run must equal the full near-dedup rebuild")

    // the maintained pair store itself must equal a fresh pair
    // computation over the post-changelog corpus (the decision's
    // inputs, not just the packed output)
    val stored = spark.table(pairs)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = TextDedupOps.minhashLshPairs(
        newCorpus.filter(col("n_chars") >= 100), "doc_id", "text",
        cfg.numHashes, cfg.bands, cfg.nearDedupMinJaccard)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored === fresh,
      "maintained pair store must equal the rebuilt pair set")

    // keep-list plan: components over the stored pairs — the corpus
    // contributes its id column only and the delta path never re-bands,
    // so no shingle/minhash kernel and no text column may appear
    val keep = GraftPipeline.nearKeepListFromStore(spark, pairs,
      newCorpus.select("doc_id"), "doc_id")
    val planStr = executed(keep).toString
    assert(!planStr.contains("minhash") && !planStr.contains("shingle"),
      s"keep list must not re-band any text:\n$planStr")
    assert(!planStr.contains("text"),
      s"no text column may reach the keep-list plan:\n$planStr")
    BucketedStores.dropVersioned(spark, lsh)
    BucketedStores.dropVersioned(spark, pairs)
  }

  test("merge-on-read maintenance: two delta batches and a compaction " +
      "all equal the fresh rebuild; tombstone subtraction broadcasts") {
    val cfg = GraftPipeline.Config(minChars = 100, nearDedup = true)
    val (lsh, pairs) = ("plspec_mor_lsh", "plspec_mor_pairs")
    val base = docs.filter(length(col("text")) >= 100)
      .select(col("doc_id"), col("text"))
    GraftPipeline.buildNearIndexesMor(base, "doc_id", "text", lsh, pairs,
      cfg)

    def corpusAfter(suffixes: Map[Long, String]) = {
      val marked = suffixes.foldLeft(
        docs.filter(col("doc_id") % 7 =!= 3)
          .select(col("doc_id"), col("text"))) { case (df, (m, sfx)) =>
        df.withColumn("text",
          when(col("doc_id") % m === 0, concat(col("text"), lit(sfx)))
            .otherwise(col("text")))
      }
      marked.withColumn("n_chars", length(col("text")).cast("long"))
    }
    def check(corpus: org.apache.spark.sql.DataFrame, what: String) = {
      val incr = GraftPipeline.runIncrementalNear(spark, pairs, corpus,
          "doc_id", "text", cfg)
        .orderBy(col("shard"), col("pos")).collect().toSeq
      val rebuilt = GraftPipeline.run(corpus, "doc_id", "text", cfg)
        .orderBy(col("shard"), col("pos")).collect().toSeq
      assert(incr.nonEmpty && incr === rebuilt, s"$what diverged")
    }

    // batch 1: delete %7==3, upsert %5==0 (" upd")
    val up1 = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    GraftPipeline.applyNearIndexDeltaMor(spark, lsh, pairs, deletes,
      Some(up1.filter(length(col("text")) >= 100)), "doc_id", "text", cfg)
    val corpus1 = corpusAfter(Map(5L -> " upd"))
    check(corpus1, "MoR batch 1")

    // batch 2 RE-upserts a subset of the same docs (%10==0, so their
    // batch-1 rows must die while batch-2 rows survive their own
    // tombstone — the strictly-greater-seq rule's edge case)
    val up2 = corpus1.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" more")).as("text"))
    GraftPipeline.applyNearIndexDeltaMor(spark, lsh, pairs,
      deletes.limit(0), Some(up2.filter(length(col("text")) >= 100)),
      "doc_id", "text", cfg)
    val corpus2 = corpusAfter(Map(5L -> " upd", 10L -> " more"))
    check(corpus2, "MoR batch 2")

    // tombstone subtraction must BROADCAST (bucket alignment of the
    // backing scan survives); a shuffled anti-join here would make
    // every probe corpus-scale again
    val viewPlan = executed(spark.table(lsh)).toString
    assert(viewPlan.contains("BroadcastHashJoin") &&
      !viewPlan.contains("SortMergeJoin"),
      s"MoR view must subtract tombstones via broadcast:\n$viewPlan")
    // and the DELTA PROBE keeps dd11's shape through the MoR view:
    // the index side scans its buckets in place (never shuffled, never
    // sort-merged) with the tiny delta broadcast into it
    val probePlan = executed(TextDedupOps.probeLshIndex(spark, lsh,
      docs.select(col("doc_id"), col("text")).limit(20),
      "doc_id", "text", cfg.numHashes, cfg.bands)).toString
    assert(probePlan.contains(s"${lsh}__") &&
      probePlan.contains("Bucketed: true") &&
      !probePlan.contains("SortMergeJoin"),
      s"MoR probe must keep the bucket-aligned index scan:\n$probePlan")

    // compaction folds tombstones in and changes NOTHING observable
    val beforePairs = spark.table(pairs)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    GraftPipeline.morCompactNearIndexes(spark, lsh, pairs)
    val afterPairs = spark.table(pairs)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(beforePairs === afterPairs, "compaction must be invisible")
    check(corpus2, "post-compaction")

    // and a delta AFTER compaction still lands correctly (seq clock
    // restarted together with the tombstone generation)
    val up3 = corpus2.filter(col("doc_id") % 15 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" again")).as("text"))
    GraftPipeline.applyNearIndexDeltaMor(spark, lsh, pairs,
      deletes.limit(0), Some(up3.filter(length(col("text")) >= 100)),
      "doc_id", "text", cfg)
    val corpus3 = corpusAfter(
      Map(5L -> " upd", 10L -> " more", 15L -> " again"))
    check(corpus3, "post-compaction delta")

    BucketedStores.dropVersioned(spark, lsh)
    BucketedStores.dropVersioned(spark, pairs)
  }

  test("EXACT index merge-on-read: delta batches, re-upsert edge case, " +
      "and compaction all equal the fresh rebuild") {
    val cfg = GraftPipeline.Config(minChars = 100, exactDedup = true)
    val t = "plspec_mor_exidx"
    val base = docs.filter(length(col("text")) >= 100)
      .select(col("doc_id"), col("text"))
    GraftPipeline.buildExactIndexMor(base, "doc_id", "text", t)

    def corpusAfter(suffixes: Map[Long, String]) = {
      val marked = suffixes.foldLeft(
        docs.filter(col("doc_id") % 7 =!= 3)
          .select(col("doc_id"), col("text"))) { case (df, (m, sfx)) =>
        df.withColumn("text",
          when(col("doc_id") % m === 0, concat(col("text"), lit(sfx)))
            .otherwise(col("text")))
      }
      marked.withColumn("n_chars", length(col("text")).cast("long"))
    }
    def check(corpus: org.apache.spark.sql.DataFrame, what: String) = {
      val incr = GraftPipeline.runIncremental(spark, t, corpus,
          "doc_id", "text", cfg)
        .orderBy(col("shard"), col("pos")).collect().toSeq
      val rebuilt = GraftPipeline.run(corpus, "doc_id", "text", cfg)
        .orderBy(col("shard"), col("pos")).collect().toSeq
      assert(incr.nonEmpty && incr === rebuilt, s"$what diverged")
    }

    // batch 1: delete %7==3, upsert %5==0 (" upd")
    val up1 = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    GraftPipeline.applyExactIndexDeltaMor(spark, t, deletes,
      Some(up1.filter(length(col("text")) >= 100)), "doc_id", "text")
    check(corpusAfter(Map(5L -> " upd")), "MoR batch 1")

    // batch 2 RE-upserts %10==0: batch-1 rows must die while batch-2
    // rows survive their own tombstone (strictly-greater-seq rule)
    val up2 = corpusAfter(Map(5L -> " upd"))
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" more")).as("text"))
    GraftPipeline.applyExactIndexDeltaMor(spark, t, deletes.limit(0),
      Some(up2.filter(length(col("text")) >= 100)), "doc_id", "text")
    val corpus2 = corpusAfter(Map(5L -> " upd", 10L -> " more"))
    check(corpus2, "MoR batch 2")

    // tombstone subtraction through the serving view must broadcast —
    // a shuffled anti-join would make every nightly probe corpus-scale
    val viewPlan = executed(spark.table(t)).toString
    assert(viewPlan.contains("BroadcastHashJoin") &&
      !viewPlan.contains("SortMergeJoin"),
      s"MoR view must subtract tombstones via broadcast:\n$viewPlan")
    // and the broadcast preserves the bucketed-by-h distribution, so
    // the keep-list aggregate plans ZERO hash exchanges even under
    // MoR serving — the nightly decision stays shuffle-free
    val keepPlan = executed(
      GraftPipeline.keepListFromIndex(spark, t, "doc_id")).toString
    assert(!keepPlan.contains("Exchange hashpartitioning"),
      s"MoR keep list must stay exchange-free:\n$keepPlan")

    // compaction is invisible, and a delta after it still lands
    val before = spark.table(t).select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    GraftPipeline.morCompactExactIndex(spark, t, "doc_id")
    val after = spark.table(t).select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before === after, "compaction must be invisible")
    check(corpus2, "post-compaction")
    val up3 = corpus2.filter(col("doc_id") % 15 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" again")).as("text"))
    GraftPipeline.applyExactIndexDeltaMor(spark, t, deletes.limit(0),
      Some(up3.filter(length(col("text")) >= 100)), "doc_id", "text")
    check(corpusAfter(Map(5L -> " upd", 10L -> " more", 15L -> " again")),
      "post-compaction delta")
    BucketedStores.dropVersioned(spark, t)
  }

  test("MoR replay safety: re-delivering the same changelog batch " +
      "leaves the served index unchanged (st22's at-least-once law)") {
    val t = "plspec_replay_exidx"
    val base = docs.filter(length(col("text")) >= 100)
      .select(col("doc_id"), col("text"))
    GraftPipeline.buildExactIndexMor(base, "doc_id", "text", t)
    val upserts = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
      .filter(length(col("text")) >= 100)
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    def served(): Set[(Long, String)] = spark.table(t)
      .select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    GraftPipeline.applyExactIndexDeltaMor(spark, t, deletes,
      Some(upserts), "doc_id", "text")
    val once = served()
    // the replay: identical batch, delivered again — the fresh-seq
    // tombstones kill the first delivery's rows, the re-appended rows
    // survive their own tombstone, and the served content is unchanged
    GraftPipeline.applyExactIndexDeltaMor(spark, t, deletes,
      Some(upserts), "doc_id", "text")
    assert(served() === once,
      "a replayed MoR batch must be served-content invisible")
    BucketedStores.dropVersioned(spark, t)
  }
}
