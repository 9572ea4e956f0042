package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextDedupOps

/** Streaming over the DOCUMENTS table: online ingestion dedup.
  *
  * The batch dedup story has three tiers — full refresh (dd2),
  * incremental refresh over a delta (dd10), and the delta probing a
  * STORED index (dd11). This is the fourth: documents ARRIVE as a
  * stream and are deduplicated at ingestion time, the shape a crawl
  * pipeline actually runs between snapshot refreshes.
  *
  * Per micro-batch (`foreachBatch`):
  *   1. PROBE — the batch's docs are shingled + banded (batch-scale
  *      map work) and joined against the stored LSH index
  *      ([[graft.operators.TextDedupOps.probeLshIndex]]): pairs
  *      against everything ingested so far plus the base corpus.
  *   2. WITHIN — the batch self-pairs through the same band discipline
  *      ([[graft.operators.TextDedupOps.minhashLshPairs]]), because
  *      step 1's index does not contain the in-flight batch yet.
  *   3. APPEND — the batch's banded rows append to the index
  *      ([[graft.operators.TextDedupOps.appendToLshIndex]]), so every
  *      LATER batch sees this one. Probe-before-append means each
  *      cross-batch pair is found exactly once (by the later side).
  *
  * The result provably equals the BATCH incremental refresh over the
  * same corpus+delta — st10's oracle is dd10's SQL verbatim, making
  * three independent formulations (on-the-fly index, stored index,
  * streamed ingestion) that must agree row-for-row.
  *
  * Scale: per-batch work is batch-scale banding + one (band, bhash)
  * equi-join against the bucket-aligned index scan (zero index-side
  * shuffle — dd11's plan) + a batch²/buckets self-join; the corpus is
  * never re-read and never re-banded. The final group-by collapse also
  * makes the at-least-once `foreachBatch` contract safe: a replayed
  * batch re-appends the same pairs with the same jaccard, and the
  * sink-side MAX-collapse dedups them — idempotence by construction,
  * not by sink transactions.
  */
object DocumentsStreaming {

  private val nameCounter = new AtomicInteger(0)

  /** Stage `docs` as `slices` id-ordered parquet files (one file
    * per micro-batch under `maxFilesPerTrigger=1`; file mtimes pin the
    * processing order). Deterministic: slice i = ids in
    * [min + span·i/slices, min + span·(i+1)/slices).
    */
  private[streaming] def stageIdSlices(docs: DataFrame, slices: Int,
      idCol: String = "doc_id"): String = {
    val Row(idMin: Long, idMax: Long) =
      docs.select(min(col(idCol)), max(col(idCol))).head()
    val staged = java.nio.file.Files.createTempDirectory("graft_docstage")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    val span = idMax - idMin + 1
    for (i <- 0 until slices) {
      val lo = idMin + span * i / slices
      val hi = idMin + span * (i + 1) / slices
      val slice = docs.filter(col(idCol) >= lo && col(idCol) < hi)
      val tmp = staged.resolve(s"tmp_$i")
      slice.coalesce(1).write.parquet(tmp.toString)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet")).head.getPath
      val dest = new org.apache.hadoop.fs.Path(
        staged.resolve(f"slice-$i%04d.parquet").toString)
      fs.rename(part, dest)
      fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
      fs.setTimes(dest, (i + 1) * 60000L, -1) // strict batch order
    }
    staged.toString
  }

  /** Ingest `delta` (id + text) as a `slices`-batch stream against a
    * fresh stored index seeded with `corpus` MINUS the delta ids;
    * returns all near-dup pairs touching the delta — dd10's result,
    * produced online. The index table is private to this run (the
    * stream MUTATES it batch by batch).
    */
  def ingestDedupStream(spark: SparkSession, corpus: DataFrame,
      deltaIds: DataFrame, slices: Int = 4, numHashes: Int = 8,
      bands: Int = 2): DataFrame = {
    val run = nameCounter.incrementAndGet()
    val table = s"graft_st10_idx_$run"
    val ids = deltaIds.select(col("doc_id"))
    val baseDocs = corpus.join(broadcast(ids), Seq("doc_id"), "left_anti")
    val deltaDocs = corpus.join(broadcast(ids), Seq("doc_id"), "left_semi")
    TextDedupOps.writeLshIndex(baseDocs, "doc_id", "text", table,
      numHashes, bands, location = Some(java.nio.file.Files
        .createTempDirectory(s"graft_st10_loc_$run").toString))
    val staged = stageIdSlices(deltaDocs, slices)
    val outDir = java.nio.file.Files
      .createTempDirectory(s"graft_st10_out_$run").toString
    val chk = java.nio.file.Files
      .createTempDirectory(s"graft_st10_chk_$run").toString
    val q = spark.readStream.schema(deltaDocs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.persist()
        try {
          // `batch` is bound to the streaming engine's CLONED session,
          // so the append below refreshes the CLONE's relation cache —
          // `spark`'s own tableRelationCache would keep serving the
          // PREVIOUS batch's file listing to this batch's probe.
          // Refresh in the probing session before reading the index.
          spark.catalog.refreshTable(table)
          val cross = TextDedupOps.probeLshIndex(spark, table, b,
            "doc_id", "text", numHashes, bands)
          val within = TextDedupOps.minhashLshPairs(b,
            "doc_id", "text", numHashes, bands)
          cross.unionByName(within)
            .groupBy(col("id_a"), col("id_b"))
            .agg(max(col("jaccard")).as("jaccard"))
            .write.mode("append").parquet(outDir)
          TextDedupOps.appendToLshIndex(spark, table, b, "doc_id", "text",
            numHashes, bands)
        } finally b.unpersist()
      }
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // the result below reads only the sink dir — the per-run index
    // table has served its purpose; don't leak it into the catalog
    // (table hygiene, same discipline as cache hygiene)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.read.parquet(outDir)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** st13: the `heavy_hitters` Misra-Gries kernel inside a STREAMING
    * aggregation — complete-mode global token summary over the staged
    * document replay. What this proves beyond tx32: the MG buffer's
    * opaque counter map must round-trip the streaming STATE STORE
    * between micro-batches (serialize after each batch, deserialize
    * into the next) — a kernel whose serialize loses counters would
    * pass every batch test and silently corrupt here. The sketch
    * STATE is replay-order dependent, so determinism comes from the
    * tx32 discipline applied at readout: the streamed sketch only
    * GENERATES candidates (a superset of the > n/k heavy set, by the
    * MG guarantee, which merging preserves); the exact BATCH recount
    * + threshold makes the emitted rows independent of slice order —
    * the same rows the DuckDB direct computation produces.
    */
  /** ONLINE repeated-span detection (st14) — tx34's cross-document
    * window census run at ingestion time: per micro-batch, every
    * 8-token rolling-hash window of the arriving docs probes the
    * standing census of all PRIOR batches' windows, each doc reports
    * how many of its windows were already seen, and the batch's
    * distinct hashes append to the census so later batches see them.
    * Probe-before-append (st10's discipline): a doc's count reflects
    * exactly the corpus ingested before its batch — deterministic
    * under the staged slice order, and the final per-doc collapse
    * makes at-least-once replay idempotent. Per-batch work is
    * batch-scale hashing + one narrow (h) semi-join against the
    * census; the census store is append-only distinct hashes (at
    * 100 TB: a bucketed store or Bloom tier, dd9/dd11's discipline).
    */
  def spanCensusStream(spark: SparkSession, dir: String,
      slices: Int = 4, window: Int = 8): DataFrame = {
    import graft.queries.Q.cnt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val staged = stageIdSlices(docs, slices)
    val run = nameCounter.incrementAndGet()
    val outDir = java.nio.file.Files
      .createTempDirectory(s"graft_st14_out_$run").toString
    val censusDir = java.nio.file.Files
      .createTempDirectory(s"graft_st14_census_$run").toString
    val chk = java.nio.file.Files
      .createTempDirectory(s"graft_st14_chk_$run").toString
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val w = batch
          .withColumn("th", expr(
            "transform(split(trim(text), '\\\\s+'), " +
              "t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"))
          .withColumn("rh", graft.functions.VectorFunctions
            .rolling_hash(col("th"), window))
          .select(col("doc_id"), col("rh"))
          .persist()
        try {
          val wx = w.select(col("doc_id"), explode(col("rh")).as("h"))
          // prior-batch census; explicit schema so batch 0's empty
          // directory reads as an empty relation
          val census = spark.read
            .schema("h BIGINT").parquet(censusDir)
          val prior = wx.join(census, Seq("h"), "left_semi")
            .groupBy(col("doc_id"))
            .agg(cnt.as("n_prior_repeated"))
          w.select(col("doc_id"), size(col("rh")).as("n_windows"))
            .join(prior, Seq("doc_id"), "left")
            .select(col("doc_id"), col("n_windows"),
              coalesce(col("n_prior_repeated"), lit(0L))
                .as("n_prior_repeated"))
            .write.mode("append").parquet(outDir)
          // append AFTER probing — later batches see this one
          wx.select(col("h")).distinct()
            .write.mode("append").parquet(censusDir)
        } finally w.unpersist()
      }
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // replayed batches rewrite identical rows; collapse keeps the
    // result idempotent (st10's sink discipline)
    spark.read.parquet(outDir)
      .groupBy(col("doc_id"))
      .agg(max(col("n_windows")).as("n_windows"),
        max(col("n_prior_repeated")).as("n_prior_repeated"))
      .orderBy(col("doc_id"))
  }

  def heavyHittersStream(spark: SparkSession, dir: String,
      slices: Int = 4, k: Int = 30): DataFrame = {
    import graft.queries.Q.cnt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val staged = stageIdSlices(docs, slices)
    val agg = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .agg(graft.functions.VectorFunctions
        .heavy_hitters(col("term"), k).as("hh"))
    val name = s"graft_st_hh_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val cands = spark.table(name)
      .select(explode(col("hh")).as("c"))
      .select(col("c.item").as("term"))
    val tok = docs.select(
      explode(split(trim(col("text")), "\\s+")).as("term"))
    tok.join(broadcast(cands), "term")
      .groupBy(col("term"))
      .agg(cnt.as("n_term"))
      .crossJoin(broadcast(tok.agg(cnt.as("n_total"))))
      .filter(col("n_term") * k > col("n_total"))
      .select(col("term"), col("n_term"), col("n_total"))
      .orderBy(col("n_term").desc, col("term"))
  }

  /** CONTINUOUS index maintenance (st22) — a changelog STREAM keeps a
    * standing merge-on-read exact-dedup index fresh: each micro-batch
    * splits into deletes (`op = 'delete'`) and upserts
    * (`op = 'upsert'`, already quality-gated by the caller) and rides
    * [[graft.operators.GraftPipeline.applyExactIndexDeltaMor]] —
    * tombstones at the batch's sequence + `_seq`-stamped delta rows,
    * all APPEND-shaped, no generation rewrite on any batch. This is
    * the production posture a crawl pipeline actually runs: the index
    * never goes offline for a nightly rebuild; dedup queries read the
    * serving view mid-stream and see every completed batch.
    *
    * Replay safety comes from the MoR upsert being SELF-SUPERSEDING:
    * a re-delivered batch re-tombstones its ids at a fresh sequence
    * (killing the first delivery's rows along with the originals) and
    * re-appends the same content — the served index is unchanged, so
    * the at-least-once `foreachBatch` contract needs no sink
    * transactions (GraftPipelineSpec proves the law directly).
    *
    * Scale: per-batch cost is changelog-scale (hash the upsert texts,
    * append one file per populated bucket + a tombstone append);
    * corpus-scale IO happens only at scheduled
    * [[graft.operators.GraftPipeline.morCompactExactIndex]].
    */
  /** CONTINUOUS key-stats maintenance (st26) — an append STREAM keeps
    * a table AND its [[graft.operators.SketchStats]] fresh together:
    * each micro-batch appends its rows and folds the batch's key
    * sketch into the stored stats delta-only
    * ([[graft.operators.SketchStats.applyDelta]] — counter matrices
    * are linear, so the maintained sketch stays BYTE-equal to a
    * from-scratch rescan). This is what makes the planning tier
    * ([[graft.plans.SketchJoinRule]]) live on a growing store: join
    * estimates stay current at changelog cost, no ANALYZE rescan ever.
    *
    * Replay safety, stated honestly: `foreachBatch` is at-least-once,
    * and the stored batch id makes a replayed COMPLETED batch a no-op
    * for both effects (the common restart case: the engine re-delivers
    * the last batch whose sink commit it can't prove). A crash INSIDE
    * the two-effect window is not transactional — rows append first,
    * stats second, so that failure mode is a re-appended (duplicated)
    * batch with singly-counted stats, which an invariant check
    * (`stats.nRows == count(table)`) DETECTS cheaply; the opposite
    * order would silently lose the append instead. Exactly-once here
    * needs what it needs everywhere: an atomically-committed sink
    * (the MoR index stream gets it from seq self-supersession; a
    * lakehouse sink from its transaction log), after which the stats
    * fold rides the same commit.
    */
  def statsMaintenanceStream(spark: SparkSession, table: String,
      rows: DataFrame, idCol: String, slices: Int = 4): Unit =
    drainStatsMaintenance(spark, table, rows.schema,
      stageIdSlices(rows, slices, idCol),
      java.nio.file.Files.createTempDirectory(
        s"graft_st26_chk_${nameCounter.incrementAndGet()}").toString)

  /** [[statsMaintenanceStream]]'s resumable core (the
    * [[drainIndexMaintenance]] discipline): drain whatever staged
    * files sit under `stagedDir`, tracking progress in `chk` — calling
    * again with the same checkpoint after a stop resumes from the
    * recorded offsets, and the batch whose sink commit the engine
    * can't prove is re-delivered, which the stats batch-id guard
    * absorbs (StreamingSpec proves stop/resume lands on the
    * uninterrupted run's stats, byte-equal).
    */
  def drainStatsMaintenance(spark: SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType, stagedDir: String,
      chk: String): Unit = {
    import graft.operators.SketchStats
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        // batch ids are CHECKPOINT-scoped (a fresh checkpoint restarts
        // at 0), so the replay guard carries the checkpoint path as the
        // batch id's LINEAGE: a second maintenance stream with a new
        // checkpoint always applies its batches (new lineage re-scopes
        // the guard), while a same-checkpoint resume's re-delivered
        // batch is the no-op it should be.
        val seen = SketchStats.read(spark, table)
          .exists(s => s.lineage == chk && s.lastBatch >= bid)
        if (!seen) {
          val b = batch.persist()
          try {
            b.write.mode("append").saveAsTable(table)
            spark.catalog.refreshTable(table)
            SketchStats.applyDelta(spark, table, added = Some(b.toDF()),
              deleted = None, batchId = Some(bid),
              lineage = Some(chk)): Unit
          } finally b.unpersist()
        }
      }
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.catalog.refreshTable(table)
  }

  def indexMaintenanceStream(spark: SparkSession, indexName: String,
      changelog: DataFrame, slices: Int = 4): Unit =
    drainIndexMaintenance(spark, indexName, changelog.schema,
      stageIdSlices(changelog, slices),
      java.nio.file.Files.createTempDirectory(
        s"graft_st22_chk_${nameCounter.incrementAndGet()}").toString)

  /** [[indexMaintenanceStream]]'s resumable core: drain whatever
    * changelog files sit under `stagedDir` through the maintenance
    * loop, tracking progress in `chk` — calling again with the same
    * checkpoint after a stop (or crash) resumes from the recorded
    * offsets, and any batch the crash cut mid-apply is re-delivered,
    * which the MoR seq rule absorbs (replay-safe; StreamingSpec
    * proves stop/resume lands on the uninterrupted run's index).
    */
  def drainIndexMaintenance(spark: SparkSession, indexName: String,
      schema: org.apache.spark.sql.types.StructType, stagedDir: String,
      chk: String): Unit = {
    import graft.operators.{BucketedStores, GraftPipeline}
    // the batch dataframes are bound to the streaming engine's CLONED
    // session, so the tombstone/delta appends land through the clone
    // and refresh only ITS relation cache — the outer session (which
    // morNextSeq and the final serving reads run on) would keep
    // serving stale file listings (st10's lesson). Refresh the
    // physical tables in the outer session before every batch's
    // sequence read and once after the stream drains.
    def refreshServing(): Unit = {
      spark.catalog.refreshTable(
        BucketedStores.currentGeneration(spark, indexName))
      spark.catalog.refreshTable(
        BucketedStores.currentTombstones(spark, indexName))
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.persist()
        try {
          refreshServing()
          GraftPipeline.applyExactIndexDeltaMor(spark, indexName,
            b.filter(col("op") === "delete").select(col("doc_id")),
            Some(b.filter(col("op") === "upsert")
              .select(col("doc_id"), col("text"))),
            "doc_id", "text")
        } finally b.unpersist()
      }
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    refreshServing()
  }

  /** st23 — [[indexMaintenanceStream]] for the NEAR-dedup store pair
    * (LSH band index + verified-pair set): per micro-batch the
    * changelog tombstones both stores, appends the delta's band rows,
    * probes the LIVE index view for the delta's surviving pairs and
    * appends those ([[graft.operators.GraftPipeline
    * .applyNearIndexDeltaMor]]) — the full near-dup decision stays
    * continuously fresh at changelog-scale cost per batch.
    *
    * Session discipline differs from st22 on purpose: the near delta
    * PROBES the index it just appended to mid-batch (within-batch
    * pairs), so a stale relation cache between the append and the
    * probe would silently lose pairs. Instead of refresh-juggling,
    * the micro-batch is REBOUND to the outer session through its RDD
    * (RDDs are SparkContext-level, session-free) — every read and
    * write then shares one session whose cache invalidates on its own
    * writes, exactly as in the batch path pl5 proves.
    */
  def nearIndexMaintenanceStream(spark: SparkSession, lshName: String,
      pairName: String, changelog: DataFrame,
      cfg: graft.operators.GraftPipeline.Config,
      slices: Int = 4): Unit =
    drainNearIndexMaintenance(spark, lshName, pairName, changelog.schema,
      stageIdSlices(changelog, slices),
      java.nio.file.Files.createTempDirectory(
        s"graft_st23_chk_${nameCounter.incrementAndGet()}").toString, cfg)

  /** [[nearIndexMaintenanceStream]]'s resumable core —
    * [[drainIndexMaintenance]]'s contract for the near store pair. */
  def drainNearIndexMaintenance(spark: SparkSession, lshName: String,
      pairName: String, schema: org.apache.spark.sql.types.StructType,
      stagedDir: String, chk: String,
      cfg: graft.operators.GraftPipeline.Config): Unit = {
    import graft.operators.GraftPipeline
    val staged = stagedDir
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = spark.createDataFrame(batch.rdd, schema).persist()
        try {
          GraftPipeline.applyNearIndexDeltaMor(spark, lshName, pairName,
            b.filter(col("op") === "delete").select(col("doc_id")),
            Some(b.filter(col("op") === "upsert")
              .select(col("doc_id"), col("text"))),
            "doc_id", "text", cfg)
        } finally b.unpersist()
      }
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
