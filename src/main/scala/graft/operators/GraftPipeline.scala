package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data pipeline — quality gate → (exact)
  * decontamination → dedup (exact or near) → seeded sharding → greedy
  * sequence packing — as ONE reusable, configurable API instead of a
  * per-query copy of the chain (tx36 composes the same stages inline;
  * this is that shape promoted to a user-facing builder, the r12
  * verdict's "user-facing composition" item). Config mirrors
  * [[graft.wod.Cli]]'s explicit-knobs style: one case class, every
  * stage a plain function over DataFrames so callers can run the whole
  * chain ([[run]]) or any prefix of it.
  *
  * Scale shape (the same discipline the per-stage queries lock in
  * PlanQualitySpec): the quality gate is scan-local; decontamination
  * is a BROADCAST anti-join (eval sets are benchmark-scale);
  * exact dedup is one content-hash agg + a semi join; near dedup is
  * dd12's banded-LSH + bounded-iteration components (never all-pairs);
  * pack is ONE hash exchange on shard whose partition-local sort feeds
  * both window passes.
  */
object GraftPipeline {

  /** One knob per stage; stages off by default stay out of the plan
    * entirely (no no-op operators for Catalyst to chew through).
    */
  final case class Config(
      /** quality gate: minimum `n_chars` (0 disables) */
      minChars: Long = 100L,
      /** exact content-hash dedup (min-id keep rule) */
      exactDedup: Boolean = true,
      /** banded-minhash near dedup instead of exact (subsumes it:
        * identical texts share all shingles)
        */
      nearDedup: Boolean = false,
      nearDedupMinJaccard: Double = 0.2,
      numHashes: Int = 8,
      bands: Int = 2,
      /** shard/packing tail */
      shards: Long = 4L,
      seqLen: Long = 512L,
      shardSeed: String = "ts42")

  /** Scan-local quality gate. */
  def qualityFilter(docs: DataFrame, cfg: Config): DataFrame =
    if (cfg.minChars <= 0) docs
    else docs.filter(col("n_chars") >= cfg.minChars)

  /** [[qualityFilter]]'s verdict as a column, for the provenance runs.
    * Must match the filter's semantics exactly: minChars <= 0 means the
    * gate is off (so the corpus need not even HAVE an n_chars column),
    * and a NULL n_chars is a quality FAIL, not a null that would fall
    * through the disposition CASE to `duplicate`/`kept`.
    */
  private def provenanceQualFlag(cfg: Config): Column =
    if (cfg.minChars <= 0) lit(true)
    else coalesce(col("n_chars") >= cfg.minChars, lit(false))

  /** EXACT decontamination: drop every corpus doc whose content hash
    * appears in the eval/benchmark set — the leakage gate a training
    * build runs against its held-out benchmarks (dd8's semantics as a
    * pipeline stage). Broadcast anti-join: the eval side is
    * benchmark-scale, the corpus side never shuffles.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
      textCol: String): DataFrame =
    docs.join(
      // no distinct(): an anti-join is unaffected by duplicate build
      // rows and the dedup exchange it would cost is pure waste
      broadcast(evalDocs.select(md5(col(textCol)).as("_eval_h"))),
      md5(docs(textCol)) === col("_eval_h"), "left_anti")

  /** Exact-dedup keep list: the minimum id per content hash. */
  def exactKeepList(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("_h"))
      .groupBy(col("_h")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))

  /** Near-dedup keep list: banded-LSH candidate pairs → connected
    * components → each doc survives iff it IS its cluster's canonical
    * (minimum id); singletons — the overwhelming majority — never
    * enter the cluster computation (dd12's rule as a stage).
    */
  def nearKeepList(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    val clusters = ClusterOps.connectedComponents(
      TextDedupOps.minhashLshPairs(docs, idCol, textCol,
        cfg.numHashes, cfg.bands, cfg.nearDedupMinJaccard))
    docs.select(col(idCol))
      .join(broadcast(clusters), Seq(idCol), "left")
      .filter(coalesce(col("cluster_id"), col(idCol)) === col(idCol))
      .select(col(idCol))
  }

  /** Seeded shard assignment + greedy sequence packing (tx35/tx22's
    * arithmetic): deterministic md5 priority, shard = priority mod
    * `shards`, per-shard running token offsets, each doc's first/last
    * packed sequence at capacity `seqLen`. ONE hash exchange on shard;
    * the partition-local (priority, id) sort feeds both windows.
    */
  def pack(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    val pri = conv(substring(md5(concat(col(idCol).cast("string"),
      lit("|" + cfg.shardSeed))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("p"), col(idCol))
    docs.select(col(idCol), pri.as("p"),
        size(split(trim(col(textCol)), "\\s+")).cast("long")
          .as("n_tokens"))
      .withColumn("shard", pmod(col("p"), lit(cfg.shards)))
      .withColumn("end_off", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("shard"), col("pos"), col(idCol), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        expr(s"(end_off - n_tokens) DIV ${cfg.seqLen}").as("seq_first"),
        expr(s"(end_off - 1) DIV ${cfg.seqLen}").as("seq_last"))
  }

  // ---- Incremental nightly run: index-backed exact dedup -----------
  //
  // At 100 TB the expensive part of a nightly pipeline re-run is NOT
  // the packing tail (one exchange over the kept set) — it's re-hashing
  // the whole corpus to recompute the dedup decision. The index-backed
  // variant stores the decision's inputs once — every (id, content
  // hash) pair, bucketed by hash in a versioned BucketedStores table —
  // and each night only the CHANGELOG is hashed: deletes/upserts ride
  // [[BucketedStores.applyDeltaAtomic]]'s one-view-flip generation
  // rewrite, and the keep list is re-derived FROM THE INDEX ALONE
  // (a groupBy over (hash, id) pairs — no corpus text is read).
  // pl3 proves rebuild-equivalence: this path equals running [[run]]
  // fresh over the post-changelog corpus (GraftPipelineSpec gates the
  // no-corpus-scan property on the keep-list plan).

  /** Stand up the exact-dedup index for `docs`: every (idCol, content
    * hash) pair, bucketed+sorted by hash so the nightly groupBy scans
    * bucket-aligned, adopted into versioned serving ([[BucketedStores
    * .adoptVersioned]]) so every later delta is one atomic view flip.
    */
  def buildExactIndex(docs: DataFrame, idCol: String, textCol: String,
      name: String, buckets: Int = 8): Unit = {
    val s = docs.sparkSession
    BucketedStores.dropVersioned(s, name)
    docs.select(col(idCol), md5(col(textCol)).as("h"))
      .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
      .write.bucketBy(buckets, "h").sortBy("h", idCol)
      .option("path", java.nio.file.Files
        .createTempDirectory(s"graft_exidx_$name").toString)
      .saveAsTable(name)
    BucketedStores.adoptVersioned(s, name)
  }

  /** Nightly changelog into the exact-dedup index: remove the deleted
    * AND upserted ids, hash ONLY the upsert texts back in (the corpus
    * itself is never re-read), one-file-per-bucket rewrite, one
    * view-flip swap. `retain` keeps that many previous generations
    * readable AS OF their version ([[keepListFromSnapshot]]) — the
    * reproducibility window for past training-set builds.
    */
  def applyExactIndexDelta(spark: org.apache.spark.sql.SparkSession,
      name: String, deleteIds: DataFrame, upserts: Option[DataFrame],
      idCol: String, textCol: String, buckets: Int = 8,
      retain: Int = 0): Unit =
    BucketedStores.applyDeltaAtomic(spark, name,
      Seq("h"), Seq("h", idCol), buckets, idCol,
      removeIds = upserts.fold(deleteIds.select(col(idCol)))(u =>
        deleteIds.select(col(idCol))
          .unionByName(u.select(col(idCol)))),
      additions = upserts.map(
        _.select(col(idCol), md5(col(textCol)).as("h"))),
      retain = retain)

  /** [[buildExactIndex]], merge-on-read form: rows carry `_seq` = 0
    * and serve through the tombstone-subtracting view, so nightly
    * changelogs append instead of rewriting the generation
    * ([[applyExactIndexDeltaMor]]).
    */
  def buildExactIndexMor(docs: DataFrame, idCol: String,
      textCol: String, name: String, buckets: Int = 8): Unit = {
    val s = docs.sparkSession
    BucketedStores.dropVersioned(s, name)
    docs.select(col(idCol), md5(col(textCol)).as("h"))
      .withColumn("_seq", lit(0L))
      .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
      .write.bucketBy(buckets, "h").sortBy("h", idCol)
      .option("path", java.nio.file.Files
        .createTempDirectory(s"graft_exidx_$name").toString)
      .saveAsTable(name)
    BucketedStores.adoptVersioned(s, name)
    BucketedStores.morEnable(s, name, Seq(idCol), idCol)
  }

  /** [[applyExactIndexDelta]], merge-on-read form: tombstone the
    * changed ids at this batch's sequence, hash ONLY the upsert texts
    * and append them stamped with the same sequence. Delta-scale work;
    * the generation is never rewritten (compact with
    * [[BucketedStores.morCompact]] on schedule).
    */
  def applyExactIndexDeltaMor(spark: org.apache.spark.sql.SparkSession,
      name: String, deleteIds: DataFrame, upserts: Option[DataFrame],
      idCol: String, textCol: String, buckets: Int = 8): Unit = {
    val seq = BucketedStores.morNextSeq(spark, name)
    val removeIds = upserts.fold(deleteIds.select(col(idCol)))(u =>
      deleteIds.select(col(idCol)).unionByName(u.select(col(idCol))))
    BucketedStores.morDelete(spark, name, removeIds, seq)
    upserts.foreach(u => BucketedStores.morAppend(spark, name,
      u.select(col(idCol), md5(col(textCol)).as("h")), seq,
      Seq("h"), Seq("h", idCol), buckets))
  }

  /** Fold the exact index's tombstones in (one file per bucket again,
    * seq clock reset) — the amortized corpus-scale rewrite.
    */
  def morCompactExactIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, idCol: String, buckets: Int = 8): Unit =
    BucketedStores.morCompact(spark, name, Seq(idCol), idCol,
      Seq("h"), Seq("h", idCol), buckets)

  /** The exact-dedup keep list derived from the INDEX alone: min id
    * per content hash, computed over stored (id, hash) pairs — the
    * corpus text is not in this plan at all (spec-gated).
    */
  def keepListFromIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, idCol: String): DataFrame =
    spark.table(name).groupBy(col("h"))
      .agg(min(col(idCol)).as(idCol)).select(col(idCol))

  /** [[keepListFromIndex]] AS OF a retained generation — reproduce a
    * PAST build's dedup decision from the immutable snapshot, after
    * any number of later changelogs (within the retention window).
    */
  def keepListFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      name: String, generation: Int, idCol: String): DataFrame =
    BucketedStores.readGeneration(spark, name, generation)
      .groupBy(col("h"))
      .agg(min(col(idCol)).as(idCol)).select(col(idCol))

  /** The incremental nightly run: keep list from the maintained index,
    * semi-joined onto the (post-changelog) corpus, packed. Equals
    * [[run]] over the same corpus with `exactDedup = true` — pl3's
    * oracle row is exactly that rebuild-equivalence, cross-engine.
    */
  def runIncremental(spark: org.apache.spark.sql.SparkSession,
      indexName: String, corpus: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame =
    pack(
      qualityFilter(corpus, cfg)
        .join(keepListFromIndex(spark, indexName, idCol),
          Seq(idCol), "left_semi"),
      idCol, textCol, cfg)

  // ---- Incremental NEAR dedup: LSH index + verified-pair store ------
  //
  // The near-dup decision needs two stored artifacts: the LSH band
  // index (candidate generation — dd11/dd20's store) and the VERIFIED
  // PAIR SET (candidates that passed the exact-Jaccard check). With
  // both standing, a nightly changelog costs: band + probe the DELTA
  // against the index (delta-scale; the corpus is never re-banded),
  // drop every pair touching a changed/deleted doc (an edge dies with
  // either endpoint — [[BucketedStores.applyEdgeDeltaAtomic]]), add
  // the probe's surviving pairs, then re-run connected components over
  // the PAIR STORE alone — pair-store scale, not corpus scale, and no
  // text in the plan. pl4 proves the rebuild-equivalence cross-engine.

  /** Stand up both stores for `docs` (quality-gate upstream): the
    * (band, bhash)-bucketed LSH index and the id_a-bucketed verified
    * pair set, each versioned for atomic maintenance.
    */
  def buildNearIndexes(docs: DataFrame, idCol: String, textCol: String,
      lshName: String, pairName: String, cfg: Config = Config(),
      buckets: Int = 8): Unit = {
    val s = docs.sparkSession
    BucketedStores.dropVersioned(s, lshName)
    BucketedStores.dropVersioned(s, pairName)
    TextDedupOps.writeLshIndex(docs, idCol, textCol, lshName,
      cfg.numHashes, cfg.bands, buckets,
      location = Some(java.nio.file.Files
        .createTempDirectory(s"graft_nearidx_$lshName").toString))
    BucketedStores.adoptVersioned(s, lshName)
    s.sql(s"DROP TABLE IF EXISTS $pairName")
    TextDedupOps.minhashLshPairs(docs, idCol, textCol,
        cfg.numHashes, cfg.bands, cfg.nearDedupMinJaccard)
      .repartition(buckets, pmod(hash(col("id_a")), lit(buckets)))
      .write.bucketBy(buckets, "id_a").sortBy("id_a", "id_b")
      .option("path", java.nio.file.Files
        .createTempDirectory(s"graft_pairs_$pairName").toString)
      .saveAsTable(pairName)
    BucketedStores.adoptVersioned(s, pairName)
  }

  /** Nightly changelog into both near-dedup stores: the LSH index
    * swaps out removed/upserted ids and bands ONLY the delta back in;
    * the pair store drops every edge touching a changed doc and adds
    * the delta's probe pairs (probed against the POST-delta index, so
    * upsert↔upsert and upsert↔unchanged pairs are both found once).
    */
  def applyNearIndexDelta(spark: org.apache.spark.sql.SparkSession,
      lshName: String, pairName: String, deleteIds: DataFrame,
      upserts: Option[DataFrame], idCol: String, textCol: String,
      cfg: Config = Config(), buckets: Int = 8, retain: Int = 0): Unit = {
    val removeIds = upserts.fold(deleteIds.select(col(idCol)))(u =>
      deleteIds.select(col(idCol)).unionByName(u.select(col(idCol))))
    BucketedStores.applyDeltaAtomic(spark, lshName,
      Seq("band", "bhash"), Seq("band", "bhash"), buckets, idCol,
      removeIds,
      upserts.map(u => TextDedupOps.lshIndexRows(u, idCol, textCol,
        cfg.numHashes, cfg.bands)),
      retain = retain)
    BucketedStores.applyEdgeDeltaAtomic(spark, pairName,
      Seq("id_a"), Seq("id_a", "id_b"), buckets, "id_a", "id_b",
      removeIds,
      upserts.map(u => TextDedupOps.probeLshIndex(spark, lshName, u,
        idCol, textCol, cfg.numHashes, cfg.bands,
        cfg.nearDedupMinJaccard)),
      retain = retain)
  }

  // ---- Merge-on-read variants (pl5) --------------------------------
  //
  // [[applyNearIndexDelta]] is copy-on-write: correct, atomic, but the
  // generation rewrite is corpus-scale IO — BENCH_INCR measured the
  // nightly cost at 1.2–1.5× the full rebuild it replaces. These
  // variants keep the stores MERGE-ON-READ ([[BucketedStores
  // .morEnable]]): a changelog appends tombstones + delta rows only
  // (delta-scale), the serving views subtract tombstones with the
  // sequence rule, and [[morCompactNearIndexes]] folds them in on the
  // operator's schedule. Same rebuild-equivalence contract; different
  // (amortized) cost model.

  /** [[buildNearIndexes]], merge-on-read form: both stores carry
    * `_seq` = 0 and serve through tombstone-subtracting views.
    */
  def buildNearIndexesMor(docs: DataFrame, idCol: String,
      textCol: String, lshName: String, pairName: String,
      cfg: Config = Config(), buckets: Int = 8): Unit = {
    val s = docs.sparkSession
    BucketedStores.dropVersioned(s, lshName)
    BucketedStores.dropVersioned(s, pairName)
    TextDedupOps.lshIndexRows(docs, idCol, textCol, cfg.numHashes,
        cfg.bands)
      .withColumn("_seq", lit(0L))
      .repartition(buckets, pmod(hash(col("band"), col("bhash")),
        lit(buckets)))
      .write.bucketBy(buckets, "band", "bhash").sortBy("band", "bhash")
      .option("path", java.nio.file.Files
        .createTempDirectory(s"graft_nearidx_$lshName").toString)
      .saveAsTable(lshName)
    BucketedStores.adoptVersioned(s, lshName)
    BucketedStores.morEnable(s, lshName, Seq("doc_id"), "doc_id")
    TextDedupOps.minhashLshPairs(docs, idCol, textCol,
        cfg.numHashes, cfg.bands, cfg.nearDedupMinJaccard)
      .withColumn("_seq", lit(0L))
      .repartition(buckets, pmod(hash(col("id_a")), lit(buckets)))
      .write.bucketBy(buckets, "id_a").sortBy("id_a", "id_b")
      .option("path", java.nio.file.Files
        .createTempDirectory(s"graft_pairs_$pairName").toString)
      .saveAsTable(pairName)
    BucketedStores.adoptVersioned(s, pairName)
    BucketedStores.morEnable(s, pairName, Seq("id_a", "id_b"), "doc_id")
  }

  /** [[applyNearIndexDelta]], merge-on-read form: tombstone the
    * changed ids in both stores at this batch's sequence, append the
    * delta's band rows, probe the LIVE index view (tombstones applied,
    * this batch's appends visible), append the surviving pairs.
    * Delta-scale work only — no generation is rewritten.
    */
  def applyNearIndexDeltaMor(spark: org.apache.spark.sql.SparkSession,
      lshName: String, pairName: String, deleteIds: DataFrame,
      upserts: Option[DataFrame], idCol: String, textCol: String,
      cfg: Config = Config(), buckets: Int = 8): Unit = {
    val removeIds = upserts.fold(deleteIds.select(col(idCol)))(u =>
      deleteIds.select(col(idCol)).unionByName(u.select(col(idCol))))
    val seqL = BucketedStores.morNextSeq(spark, lshName)
    val seqP = BucketedStores.morNextSeq(spark, pairName)
    BucketedStores.morDelete(spark, lshName, removeIds, seqL)
    BucketedStores.morDelete(spark, pairName, removeIds, seqP)
    upserts.foreach { u =>
      BucketedStores.morAppend(spark, lshName,
        TextDedupOps.lshIndexRows(u, idCol, textCol, cfg.numHashes,
          cfg.bands),
        seqL, Seq("band", "bhash"), Seq("band", "bhash"), buckets)
      BucketedStores.morAppend(spark, pairName,
        TextDedupOps.probeLshIndex(spark, lshName, u, idCol, textCol,
          cfg.numHashes, cfg.bands, cfg.nearDedupMinJaccard),
        seqP, Seq("id_a"), Seq("id_a", "id_b"), buckets)
    }
  }

  /** Fold both stores' tombstones in (one file per bucket again, seq
    * clock reset) — the amortized corpus-scale rewrite.
    */
  def morCompactNearIndexes(spark: org.apache.spark.sql.SparkSession,
      lshName: String, pairName: String, buckets: Int = 8): Unit = {
    BucketedStores.morCompact(spark, lshName, Seq("doc_id"), "doc_id",
      Seq("band", "bhash"), Seq("band", "bhash"), buckets)
    BucketedStores.morCompact(spark, pairName, Seq("id_a", "id_b"),
      "doc_id", Seq("id_a"), Seq("id_a", "id_b"), buckets)
  }

  /** The near-dedup keep list from the PAIR STORE alone: connected
    * components over stored verified pairs (pair-store scale), then
    * [[nearKeepList]]'s canonical-min rule against the corpus id set —
    * id column only; no text reaches this plan (spec-gated).
    */
  def nearKeepListFromStore(spark: org.apache.spark.sql.SparkSession,
      pairName: String, corpusIds: DataFrame, idCol: String): DataFrame = {
    val clusters = ClusterOps.connectedComponents(spark.table(pairName))
      .withColumnRenamed("doc_id", idCol)
    corpusIds.select(col(idCol))
      .join(broadcast(clusters), Seq(idCol), "left")
      .filter(coalesce(col("cluster_id"), col(idCol)) === col(idCol))
      .select(col(idCol))
  }

  /** The incremental nightly run, NEAR-dedup form: keep list from the
    * maintained pair store, semi-joined onto the post-changelog
    * corpus, packed. Equals [[run]] with `nearDedup = true` over the
    * same corpus — pl4's cross-engine oracle row.
    */
  def runIncrementalNear(spark: org.apache.spark.sql.SparkSession,
      pairName: String, corpus: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame = {
    val q = qualityFilter(corpus, cfg)
    pack(
      q.join(nearKeepListFromStore(spark, pairName,
          q.select(col(idCol)), idCol),
        Seq(idCol), "left_semi"),
      idCol, textCol, cfg)
  }

  /** PROVENANCE-carrying run: one row per INPUT doc with its
    * disposition through the exact-dedup chain — `kept`, or the first
    * stage that dropped it (`quality`, `contaminated`, `duplicate`) —
    * plus the canonical keep id its content resolved to (for kept and
    * duplicate rows) and the packed (shard, pos) for kept rows. This
    * is the audit trail a curation run ships next to the dataset: why
    * each document is or isn't in the training set, attributable and
    * re-derivable.
    *
    * Scale shape: each stage's flag is computed ONCE over the corpus —
    * quality is scan-local, contamination is one broadcast join
    * against the (distinct) eval hash set, the dedup verdict is one
    * content-hash aggregate joined back by hash, and the packed
    * coordinates join back by id. Keyed exchanges only; no stage is
    * re-run per disposition.
    */
  def runWithProvenance(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame = {
    val withHash = docs
      .withColumn("_h", md5(col(textCol)))
      .withColumn("_qual", provenanceQualFlag(cfg))
    val marked = evalDocs.fold(withHash.withColumn("_cont", lit(false))) {
      e =>
        withHash.join(
          // distinct IS needed here (unlike the anti-join in
          // [[decontaminate]]): a duplicated eval row would multiply
          // matching corpus rows in a plain left join
          broadcast(e.select(md5(col(textCol)).as("_eval_h")).distinct()),
          col("_h") === col("_eval_h"), "left")
          .withColumn("_cont", col("_eval_h").isNotNull)
          .drop("_eval_h")
    }
    val clean = marked.filter(col("_qual") && !col("_cont"))
    val keep = clean.groupBy(col("_h"))
      .agg(min(col(idCol)).as("_keep_id"))
    val disp = marked.join(keep, Seq("_h"), "left")
      .select(col(idCol),
        when(!col("_qual"), lit("quality"))
          .when(col("_cont"), lit("contaminated"))
          .when(col(idCol) === col("_keep_id"), lit("kept"))
          .otherwise(lit("duplicate")).as("disposition"),
        // a dropped doc's hash can coincide with a kept one's —
        // attribution only applies to docs that reached the dedup stage
        when(col("_qual") && !col("_cont"), col("_keep_id"))
          .as("keep_id"))
    val packed = pack(
      clean.join(keep,
        clean(idCol) === keep("_keep_id"), "left_semi"),
      idCol, textCol, cfg)
    disp.join(packed.select(col(idCol), col("shard"), col("pos")),
        Seq(idCol), "left")
      .select(col(idCol), col("disposition"), col("keep_id"),
        col("shard"), col("pos"))
  }

  /** [[runWithProvenance]], NEAR-dedup form: the duplicate verdict
    * comes from the banded-LSH connected components instead of the
    * content hash, so a dropped doc's `keep_id` is its CLUSTER's
    * canonical (minimum id) — the doc it was judged a near-duplicate
    * of, which an auditor can actually diff against. Same full-input
    * coverage contract; same keyed-exchange-only shape (the cluster
    * map is dup-cluster-scale and broadcasts, dd12's rule).
    */
  def runWithProvenanceNear(docs: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame = {
    val withHash = docs
      .withColumn("_h", md5(col(textCol)))
      .withColumn("_qual", provenanceQualFlag(cfg))
    val marked = evalDocs.fold(withHash.withColumn("_cont", lit(false))) {
      e =>
        withHash.join(
          broadcast(e.select(md5(col(textCol)).as("_eval_h")).distinct()),
          col("_h") === col("_eval_h"), "left")
          .withColumn("_cont", col("_eval_h").isNotNull)
          .drop("_eval_h")
    }
    val clean = marked.filter(col("_qual") && !col("_cont"))
    val clusters = ClusterOps.connectedComponents(
      TextDedupOps.minhashLshPairs(clean, idCol, textCol,
        cfg.numHashes, cfg.bands, cfg.nearDedupMinJaccard))
      .withColumnRenamed("doc_id", "_cl_id")
    val disp = marked.join(broadcast(clusters),
        marked(idCol) === col("_cl_id"), "left")
      .withColumn("_keep_id",
        when(col("_qual") && !col("_cont"),
          coalesce(col("cluster_id"), col(idCol))))
      .select(col(idCol),
        when(!col("_qual"), lit("quality"))
          .when(col("_cont"), lit("contaminated"))
          .when(col(idCol) === col("_keep_id"), lit("kept"))
          .otherwise(lit("near_duplicate")).as("disposition"),
        col("_keep_id").as("keep_id"))
    // reuse the SAME (localCheckpoint-backed) cluster map for the keep
    // set — calling nearKeepList here would re-run banding + components
    val packed = pack(
      clean.join(broadcast(clusters),
          clean(idCol) === col("_cl_id"), "left")
        .filter(coalesce(col("cluster_id"), col(idCol)) === col(idCol))
        .drop("_cl_id", "cluster_id"),
      idCol, textCol, cfg)
    disp.join(packed.select(col(idCol), col("shard"), col("pos")),
        Seq(idCol), "left")
      .select(col(idCol), col("disposition"), col("keep_id"),
        col("shard"), col("pos"))
  }

  /** The full chain: quality → (decontaminate) → dedup → pack.
    * `evalDocs` present ⇒ the decontamination stage runs against it.
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame = {
    val q = qualityFilter(docs, cfg)
    val clean = evalDocs.fold(q)(e => decontaminate(q, e, textCol))
    val deduped =
      if (cfg.nearDedup)
        clean.join(nearKeepList(clean, idCol, textCol, cfg),
          Seq(idCol), "left_semi")
      else if (cfg.exactDedup)
        clean.join(exactKeepList(clean, idCol, textCol),
          Seq(idCol), "left_semi")
      else clean
    pack(deduped, idCol, textCol, cfg)
  }
}
