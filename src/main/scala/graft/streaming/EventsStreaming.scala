package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state carried between micro-batches by the
  * sessionizers. Top-level (not object-nested) because the streaming
  * state store serializes it through the product encoder, whose
  * generated code needs a plainly-constructible class.
  */
private[streaming] final case class SessionState(n: Long, start: Long,
    last: Long, cents: Long)

/** Structured-streaming operators over the events table (SURVEY §2.4:
  * the reference has no streaming; this is engine capability the
  * training-data pipeline needs — incremental ingest with windowed
  * aggregation and keyed session state).
  *
  * The batch parquet dir doubles as a bounded stream (file source +
  * `processAllAvailable`), which lets the DuckDB oracle check the
  * STREAMING result: st1's windowed aggregate must equal the batch
  * ev1 aggregate bit-for-bit.
  */
object EventsStreaming {

  private val nameCounter = new AtomicInteger(0)

  /** Hourly per-type aggregate computed by a streaming query in
    * complete mode into a memory sink; returns the final table.
    * Mirrors ev1_hourly_agg exactly (same integer-bucket arithmetic,
    * same DECIMAL-routed sum).
    *
    * TOY-SCALE BY DESIGN — batch-equivalence check only. Complete mode
    * re-emits the entire aggregate every micro-batch and the memory
    * sink keeps it all on the driver; over unbounded time the
    * (hour × event_type) state grows without limit. The production
    * shape is [[hourlyAppendStream]] (st3): watermarked APPEND
    * mode, bounded state, finalized windows only.
    */
  /** st1: FULL-coverage streaming hourly aggregate with BOUNDED state.
    * Append mode + 1 h watermark, with a far-future `__sentinel__`
    * event staged as the final micro-batch: the sentinel pushes the
    * final watermark past every REAL window's end, so the full result
    * emits — then the sentinel is filtered out (its own window never
    * finalizes, and the filter would drop it regardless). This
    * replaces the r12 complete-mode memory sink, whose driver-resident
    * state grew with the aggregate domain: here the state store holds
    * only the still-open windows (the watermark evicts finalized ones)
    * and the memory sink holds exactly the query's own result rows.
    * The oracle stays ev1's FULL hourly aggregate — coverage is
    * unchanged, only the state bound improved.
    */
  def hourlyAggStream(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true,
      sentinelGapNs = Some(72L * 3600L * 1000000000L))
    val agg = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n_events"), col("total_value"))
    val name = s"graft_st1_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .filter(col("event_type") =!= "__sentinel__")
      .orderBy(col("hour_ts"), col("event_type"))
  }

  /** STREAM-STATIC join enrichment — the remaining Structured
    * Streaming join shape (st4 covers stream-stream): a streaming
    * event feed joined per micro-batch against a static dimension
    * (customer), rolled up per (market segment, event type). The
    * static side is BROADCAST — at 100 TB the stream never shuffles
    * for the dimension; each micro-batch is a map-side hash join plus
    * the one stateful aggregate exchange. Stream-static inner joins
    * are stateless on the join itself (the static side is re-resolved
    * per batch, no join state store), so only the rollup holds state.
    * Result must equal the batch join — oracle-enforced equivalence.
    */
  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(path).toAbsolutePath)
    val src = graft.queries.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(streamDir.toString))
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = src
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
    val name = s"graft_st_static_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Watermarked APPEND-mode hourly windows: stages the events into
    * ascending time-range files replayed one per micro-batch, so the
    * event-time watermark actually advances and closes windows — the
    * production shape of incremental ingest (late data beyond 1h
    * dropped, only finalized windows emitted).
    *
    * Deterministic by construction, so the result is oracle-checkable:
    * slice boundaries are equal subdivisions of [min ts, max ts] (pure
    * long arithmetic); each slice is one file with an explicitly set,
    * strictly increasing modification time (the file source's batch
    * order); slices are ts-disjoint and ascending, so no row ever
    * arrives behind the watermark and nothing is dropped. A trailing
    * EMPTY slice makes the final emission happen in a data batch
    * (independent of no-data-micro-batch timing): after it, the
    * watermark is max event-time − 1h, and the emitted set is exactly
    * the windows with end ≤ that — the predicate the DuckDB oracle
    * mirrors (st3).
    */
  /** Stage `batch` into ts-ascending, ts-disjoint single-file slices
    * (one per micro-batch via `maxFilesPerTrigger=1`, ordered by
    * explicit modification times) so event-time watermarks advance
    * deterministically across replay. `trailer` appends an EMPTY
    * slice so the final watermark advance lands in a data batch
    * (needed by append-mode AGGREGATES to emit their last windows;
    * inner joins emit eagerly and don't need it).
    */
  private[streaming] def stageTimeSlices(batch: DataFrame, slices: Int,
      trailer: Boolean,
      /** when set, the trailer is not empty but ONE synthetic
        * `__sentinel__` event at tsMax + gap — it pushes the final
        * watermark past every real window so append-mode queries can
        * emit FULL coverage (the consumer filters the sentinel out;
        * its own window never finalizes).
        */
      sentinelGapNs: Option[Long] = None): String = {
    val spark = batch.sparkSession
    val Row(tsMin: Long, tsMax: Long) =
      batch.select(min(col("ts")), max(col("ts"))).head()
    val staged = java.nio.file.Files.createTempDirectory("graft_stage")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val span = tsMax - tsMin + 1
    val last = if (trailer) slices else slices - 1
    for (i <- 0 to last) { // slice `slices` (if present) = the trailer
      val lo = tsMin + span * i / slices
      val hi = tsMin + span * (i + 1) / slices
      val slice =
        if (i == slices) sentinelGapNs match {
          case Some(gap) => batch.limit(1).select(batch.columns.map {
              case "ts" => lit(tsMax + gap).as("ts")
              case "event_type" => lit("__sentinel__").as("event_type")
              case c => col(c)
            }.toSeq: _*)
          case None => batch.filter(lit(false))
        }
        else batch.filter(col("ts") >= lo && col("ts") < hi)
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

  /** The st3/st5 watermarked hourly aggregate over a staged slice
    * dir (shared so the memory-sink check and the file-sink path run
    * the identical plan).
    */
  private[streaming] def hourlyWindowAgg(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n_events"))

  def hourlyAppendStream(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true)
    val agg = hourlyWindowAgg(spark, batch.schema, staged)
    val name = s"graft_st_append_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("hour_ts"), col("event_type"))
  }

  /** st11: ev14's SLIDING windows as a stream — watermarked
    * append-mode 2-hour/1-hour overlapping windows. Each event updates
    * TWO window states (the in-row expand happens before the keyed
    * state lookup, same as batch), and a window finalizes when the
    * watermark passes its END — so overlapping windows finalize one
    * slide apart, never together. The emitted subset is exactly the
    * windows whose end ≤ final watermark (max event time − 1h), which
    * the oracle mirrors with the same bucket arithmetic as ev14 plus
    * st3's watermark predicate.
    */
  def slidingAppendStream(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true)
    val agg = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "2 hours", "1 hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
          .as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
    val name = s"graft_st_slide_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("win_start_s"), col("event_type"))
  }

  /** st18: sessionization via the BUILT-IN `session_window` — the
    * second of the engine's two streaming-sessionization mechanisms
    * (st7 holds custom state in `flatMapGroupsWithState`; this one
    * lets the state store merge overlapping [t, t+gap) windows).
    * Append mode: a merged session emits when the watermark passes
    * its window end (= last event + gap) — unlike st7, EVERY session
    * is watermark-gated, not just each user's last, and the oracle
    * mirrors exactly that predicate over st2's batch reconstruction.
    * Merge rule equivalence: windows overlap iff t₂ − t₁ < gap,
    * which is st2's `diff >= gap ⇒ break` — the two mechanisms must
    * agree session-for-session.
    */
  /** The st18 session_window aggregate over a staged slice dir —
    * shared by the memory-sink query path and the file-sink
    * stop/resume proof so both run the identical plan.
    */
  private[streaming] def sessionWindowAgg(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("event_time"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .withWatermark("event_time", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("wend_us"),
        col("n_events"), col("total_cents"))

  /** st18's merged-session state through the durable file sink —
    * restartable with the same out/chk (StreamingSpec's stop/resume
    * proof: open session_window state crosses the restart).
    */
  private[streaming] def drainSessionWindowToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String): Unit = {
    val q = sessionWindowAgg(spark, schema, staged)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  def sessionWindowAppendStream(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true)
    val agg = sessionWindowAgg(spark, batch.schema, staged)
    val name = s"graft_st_sesswin_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("user_id"), col("start_us"))
  }

  /** st12: the `topk_values` kernel inside a STREAMING aggregation —
    * complete-mode per-type top-3 values. What this proves beyond q26:
    * a custom TypedImperativeAggregate's opaque buffer must round-trip
    * the streaming STATE STORE between micro-batches (serialize after
    * each batch, deserialize into the next), the same contract
    * collect_list relies on — a kernel whose serialize/deserialize
    * loses heap content would pass every batch test and silently
    * corrupt here. Top-k of a multiset is also replay-order
    * independent, so the slice order can't perturb the result.
    */
  def topkCompleteStream(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = false)
    val agg = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .groupBy(col("event_type"))
      .agg(graft.functions.VectorFunctions
          .topk_values(col("value"), 3).as("tk"),
        count(lit(1)).as("n_events"))
    val name = s"graft_st_topk_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("event_type") +: (0 until 3).map(i =>
        element_at(col("tk"), i + 1).as(s"top${i + 1}")) :+
        col("n_events"): _*)
      .orderBy(col("event_type"))
  }

  /** Drain whatever slices currently exist in `staged` into the
    * parquet FILE sink at `out` with checkpoint `chk`. Restartable:
    * calling again (same out/chk) after more slices appear resumes
    * from the checkpointed offsets + watermark state, emitting each
    * finalized window exactly once across runs — the recovery
    * contract `StreamingSpec` exercises.
    */
  private[streaming] def drainToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String): Unit = {
    import org.apache.spark.sql.streaming.OutputMode
    val q = hourlyWindowAgg(spark, schema, staged).writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** st5: the PRODUCTION sink shape — watermarked append windows
    * written to parquet FILES with a checkpoint (exactly-once via the
    * file-sink manifest `_spark_metadata` + WAL offsets), then read
    * back. Same windows as st3, so the same oracle applies; what st5
    * adds over st3 is the durable-sink path: at scale this is the
    * only shape that survives driver loss (the memory sink's state
    * dies with the driver; the file sink's manifest makes restart
    * idempotent).
    */
  def hourlyAppendFileSink(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true)
    val base = java.nio.file.Files.createTempDirectory("graft_filesink")
    val out = base.resolve("out").toString
    val chk = base.resolve("chk").toString
    drainToFileSink(spark, batch.schema, staged, out, chk)
    spark.read.parquet(out).orderBy(col("hour_ts"), col("event_type"))
  }

  /** Watermarked stream-stream INNER JOIN (st4): click→purchase
    * attribution — each purchase joined to every click by the same
    * user in the preceding 30 minutes. The remaining production
    * streaming shape after windowed aggregation (st3) and keyed state
    * (st2): two unbounded inputs joined on key + event-time range,
    * with watermarks bounding both sides' join state (a click is
    * evicted once the watermark passes click_time + 30 min — without
    * the time-range condition the state would grow forever).
    *
    * Deterministic on the replay harness: both sources stage the SAME
    * ts-disjoint ascending slices, so a cross-slice match's click is
    * at most 30 min behind the slice boundary while eviction lags a
    * full hour — nothing is dropped, and the emitted set equals the
    * batch join the DuckDB oracle runs. Inner joins emit on match
    * (no trailer slice needed).
    */
  /** The st4 two-sided join topology over a staged slice dir — shared
    * by the memory-sink query (st4) and the checkpointed file-sink
    * drain (the stop/resume spec).
    */
  private def clickPurchaseJoined(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String): DataFrame = {
    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
    val clicks = src()
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_time").as("click_time"),
        expr("ts DIV 1000").as("click_us"))
      .withWatermark("click_time", "1 hour")
    val purchases = src()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_time").as("purchase_time"),
        expr("ts DIV 1000").as("purchase_us"), col("value"))
      .withWatermark("purchase_time", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr("interval 30 minutes"))
      .select(col("user_id"), col("click_us"), col("purchase_us"),
        col("value"))
  }

  def clickPurchaseJoin(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = false)
    val joined = clickPurchaseJoined(spark, batch.schema, staged)
    val name = s"graft_st_join_${nameCounter.incrementAndGet()}"
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .orderBy(col("user_id"), col("click_us"), col("purchase_us"))
  }

  /** st4's topology as a LEFT OUTER stream-stream join — the hard
    * streaming-join semantics: a click with no purchase in its 30-min
    * window must STILL be emitted (null-extended), which the engine
    * can only do once the watermark proves no matching purchase can
    * arrive (left state eviction). Inner joins emit on match; outer
    * joins emit on WATERMARK PROGRESS — so this is the path that
    * exercises state eviction timing, not just match buffering.
    *
    * Determinism: the staged replay ends with an EMPTY trailer slice
    * (same device as st3/st7), so the final watermark advance — and
    * with it every evictable click's null row — happens in a data
    * batch. Clicks whose window is not yet below the final watermark
    * are withheld forever (the stream never ends); the oracle applies
    * the same predicate in ms (the engine's watermark domain),
    * checked tie-free on the fixtures like st7.
    */
  /** The st9 LEFT OUTER join topology over a staged slice dir — shared
    * by the memory-sink query (st9) and the checkpointed file-sink
    * drain (the eviction-across-restart spec).
    */
  private def clickPurchaseLeftJoined(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String): DataFrame = {
    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
    val clicks = src()
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_time").as("click_time"),
        expr("ts DIV 1000").as("click_us"))
      .withWatermark("click_time", "1 hour")
    val purchases = src()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_time").as("purchase_time"),
        expr("ts DIV 1000").as("purchase_us"), col("value"))
      .withWatermark("purchase_time", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr("interval 30 minutes"),
      "left_outer")
      .select(col("user_id"), col("click_us"), col("purchase_us"),
        col("value"))
  }

  def clickPurchaseLeftJoin(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true)
    val joined = clickPurchaseLeftJoined(spark, batch.schema, staged)
    val name = s"graft_st_ljoin_${nameCounter.incrementAndGet()}"
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .orderBy(col("user_id"), col("click_us"), col("purchase_us"))
  }

  /** [[clickPurchaseLeftJoin]]'s topology through the durable file
    * sink — restartable with the same out/chk: buffered left rows AND
    * the eviction clock resume from the checkpoint, so a matchless
    * click buffered before a stop still emits its null-extended row
    * when the post-restart watermark passes its window (exercised by
    * `StreamingSpec`; outer-join eviction is state the inner-join
    * resume test never touches).
    */
  private[streaming] def drainLeftJoinToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String): Unit = {
    import org.apache.spark.sql.streaming.OutputMode
    val q = clickPurchaseLeftJoined(spark, schema, staged)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** [[clickPurchaseJoin]]'s topology through the durable file sink
    * (parquet + checkpoint): restartable with the same out/chk — BOTH
    * sides' buffered join state resumes from the checkpointed state
    * store, so a click buffered before a stop still matches a purchase
    * that only arrives after the restart (exercised by
    * `StreamingSpec`; two-sided join-state recovery is the other place
    * state-store bugs hide, next to st8's timeout timestamps — r8
    * verdict item 7).
    */
  private[streaming] def drainJoinToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String): Unit = {
    val q = clickPurchaseJoined(spark, schema, staged)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** st6: streaming exact dedup — `dropDuplicatesWithinWatermark` on
    * `event_id` over a stream that delivers every event TWICE (the
    * batch unioned with itself before staging — the at-least-once
    * redelivery shape every ingest pipeline has to absorb).
    *
    * The watermark is what makes this viable at scale: a plain
    * streaming `dropDuplicates` holds every id seen FOREVER, so state
    * grows with the stream; `dropDuplicatesWithinWatermark` evicts an
    * id's entry once the watermark passes its event time + delay,
    * bounding state to one watermark window of ids. Duplicates here
    * carry identical event times, so both copies land in the same
    * micro-batch, the first is emitted, the second always falls
    * inside the live window and is dropped — the emitted set equals
    * batch DISTINCT, which the oracle checks via a per-type rollup.
    */
  def streamingDedup(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch.union(batch), slices,
      trailer = false)
    val deduped = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val name = s"graft_st_dedup_${nameCounter.incrementAndGet()}"
    val q = deduped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Q.dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** st6's dedup through the durable file sink (parquet + checkpoint):
    * restartable with the same out/chk — dedup state and offsets
    * resume from the checkpoint, so redelivered ids stay deduped
    * across a stop/restart (exercised by `StreamingSpec`).
    */
  private[streaming] def drainDedupToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** A closed user session: burst of events separated by < gap.
    * Money carried as exact cents (portable across engines).
    */
  final case class UserSession(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long, total_cents: Long)

  /** One streaming-sessionize input row; `event_time` carries the
    * event-time watermark that drives state timeout.
    */
  final case class SessionEvent(user_id: Long, event_time: Timestamp,
      cents: Long)

  /** Fold one user's new events (sorted by ts) into `st0`, emitting a
    * closed session each time a gap ≥ `gapUs` is crossed. Returns the
    * still-open trailing state (null iff no events ever arrived) plus
    * the sessions closed by this batch — shared by the batch and
    * streaming sessionizers so both split identically.
    */
  private def foldSessions(user: Long, st0: SessionState,
      sorted: Seq[(Long, Long)], gapUs: Long)
      : (SessionState, Seq[UserSession]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
    var st = st0
    for ((ts, c) <- sorted) {
      if (st == null) st = SessionState(1, ts, ts, c)
      else if (ts - st.last >= gapUs) {
        out += UserSession(user, st.n, st.start, st.last, st.cents)
        st = SessionState(1, ts, ts, c)
      } else st = SessionState(st.n + 1, st.start, ts, st.cents + c)
    }
    (st, out.toSeq)
  }

  /** Keyed stateful sessionization via flatMapGroupsWithState —
    * emits a session when a new event arrives `gapUs` or more after
    * the previous one (processing-time-independent, deterministic on
    * bounded input; the streaming twin of ev4's gap analysis).
    * Input rows: (user_id, ts_us, cents).
    *
    * ORACLE FIXTURE, not the production API: BOUNDED input only — the
    * trailing session closes at end-of-input, `NoTimeout` means a
    * quiet user's state would never be freed on an unbounded stream,
    * and the per-group sort materializes one user's whole history.
    * This exists as the batch-equivalence oracle for st2. ANY unbounded
    * or production use belongs on [[sessionizeStream]], whose
    * `EventTimeTimeout` + watermark close quiet users' sessions, bound
    * state to the active gap window, and survive checkpoint
    * stop/resume (st7/st8).
    */
  def sessionize(events: Dataset[(Long, Long, Long)], gapUs: Long)
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          // bounded-input batch call: rows arrive unordered; sort by ts
          val sorted = rows.map(r => (r._2, r._3)).toSeq.sorted
          val (st, closed) =
            foldSessions(user, state.getOption.orNull, sorted, gapUs)
          state.remove()
          val trailing = // close the trailing session on bounded input
            if (st == null) Nil
            else Seq(UserSession(user, st.n, st.start, st.last, st.cents))
          (closed ++ trailing).iterator
      }
  }

  /** PRODUCTION sessionization over an unbounded stream: same gap
    * split as [[sessionize]], but keyed state is closed by the
    * event-time WATERMARK, not end-of-input (an unbounded stream has
    * none). After a user's last event, `EventTimeTimeout` fires once
    * the watermark passes `last + gapUs` and the open session is
    * emitted and its state dropped — a quiet user costs one state
    * entry for one gap window, never forever. State size is bounded
    * by (active users in the current gap window), independent of
    * stream length.
    *
    * Late rows: flatMapGroupsWithState does NOT auto-drop rows behind
    * the watermark; a row arriving after its user's session timed out
    * starts a fresh session (at-least-once semantics downstream
    * dedups on (user_id, start_us)).
    */
  /** st7: [[sessionizeStream]] over the deterministic replay harness —
    * REAL streaming sessionization, oracle-checkable. Slices are
    * ts-ascending and ts-disjoint, so (a) a user's events always
    * arrive in time order, (b) no row is ever near the watermark
    * (each batch's data is a full delay ahead of the previous
    * watermark), and (c) the emitted set is exactly SQL-expressible:
    * every gap-closed session, plus each user's final (open) session
    * iff the watermark passed its `end + gap` — i.e. withheld iff
    * `end_ms + gap_ms >= max_event_ms - delay_ms` (the engine fires
    * on strict `<`; the fixtures have no exact-ms tie at any SF, so
    * the boundary convention is not load-bearing). The trailer slice
    * makes the final watermark advance land in a data batch, so the
    * last timeouts fire under `processAllAvailable`.
    */
  def sessionizeAppendStream(spark: SparkSession, dir: String,
      slices: Int = 4): DataFrame = {
    import spark.implicits._
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = true)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("event_time"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .as[SessionEvent]
    val sessions = sessionizeStream(src, gapUs = 1800000000L,
      watermarkDelay = "1 hour")
    val name = s"graft_st_sess_${nameCounter.incrementAndGet()}"
    val q = sessions.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("user_id"), col("start_us"))
  }

  /** [[sessionizeStream]] through the durable file sink (parquet +
    * checkpoint): restartable with the same out/chk — the keyed
    * session state AND its armed event-time timeout timestamps resume
    * from the checkpointed state store, so a session opened before a
    * stop still times out and emits exactly once after the restart
    * (exercised by `StreamingSpec`; timeout-timestamp recovery is
    * exactly where state-store bugs hide — r7 verdict item 4).
    */
  private[streaming] def drainSessionsToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String,
      gapUs: Long = 1800000000L): Unit = {
    import spark.implicits._
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("event_time"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .as[SessionEvent]
    val q = sessionizeStream(src, gapUs, watermarkDelay = "1 hour")
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** One input row of the streaming as-of enrichment: a tagged union of
    * reference rows (is_probe=0: clicks, whose latest instance is the
    * per-user state) and probe rows (is_probe=1: purchases, each
    * answered from that state). Times are epoch-nanos; `id` is the
    * row's event_id.
    */
  final case class AsOfIn(user_id: Long, t_ns: Long, is_probe: Int,
      id: Long)

  /** Keyed state of the streaming as-of: the latest click seen per
    * user. O(1) per user — the streaming twin of AsOfJoinExec's merge
    * candidate.
    */
  private[streaming] final case class LastClickState(click_id: Long,
      t_ns: Long)

  final case class AsOfOut(purchase_id: Long, user_id: Long,
      last_click_id: Option[Long])

  /** Streaming backward as-of enrichment: each arriving purchase is
    * answered with the user's latest click at-or-before it, from keyed
    * state that holds exactly ONE click per user (nothing buffers,
    * nothing replays — the enrichment-serving shape: state size is
    * #users, independent of stream length).
    *
    * Ordering contract: correctness against the batch as-of (av1/av2)
    * requires per-key event-time-nondecreasing arrival ACROSS batches
    * (within a batch rows are sorted here). The staged replay
    * guarantees it with ts-disjoint ascending slices; a production
    * deployment gets it from a per-key-ordered log (e.g. a keyed
    * Kafka topic). Out-of-order arrivals degrade gracefully: a probe
    * sees the latest reference row *ingested* so far, the standard
    * eventual-consistency semantics of streaming enrichment. State is
    * kept forever by design (a user's latest click IS the dimension
    * value); a TTL eviction would bolt on via ProcessingTimeTimeout.
    */
  def asofEnrich(rows: Dataset[AsOfIn]): Dataset[AsOfOut] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClickState, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[LastClickState]) =>
          // same-instant ties: clicks before purchases (ASOF's <= is
          // inclusive), equal-ts clicks resolved by max event_id —
          // the identical tie order av1's window and av2's tie-break use
          val sorted = it.toSeq.sortBy(r => (r.t_ns, r.is_probe, r.id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
          for (r <- sorted) {
            if (r.is_probe == 0) st = LastClickState(r.id, r.t_ns)
            else out += AsOfOut(r.id, user, Option(st).map(_.click_id))
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** The tagged click/purchase union the streaming as-of consumes
    * (st20's input; staged into ts-ascending ts-disjoint slices, one
    * file per micro-batch — equal-ts rows always share a slice, so the
    * within-batch sort fully determines tie order and the emitted
    * enrichment is exactly the batch as-of, same oracle as av1/av2).
    */
  private[streaming] def asofUnion(spark: SparkSession,
      dir: String): DataFrame = {
    val e = graft.queries.Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click").select(
      col("user_id"), col("ts"), lit(0).as("is_probe"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(1).as("is_probe"), col("event_id"))
    clicks.unionByName(purchases)
  }

  private def asofSource(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String): Dataset[AsOfIn] = {
    import spark.implicits._
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(col("user_id"), col("ts").as("t_ns"), col("is_probe"),
        col("event_id").as("id"))
      .as[AsOfIn]
  }

  def asofEnrichStream(spark: SparkSession, dir: String,
      slices: Int = 6): DataFrame = {
    val union = asofUnion(spark, dir)
    val staged = stageTimeSlices(union, slices, trailer = false)
    val name = s"graft_st_asof_${nameCounter.incrementAndGet()}"
    val q = asofEnrich(asofSource(spark, union.schema, staged))
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("purchase_id"))
  }

  /** [[asofEnrich]] through the durable file sink: restartable with the
    * same out/chk — the per-user "latest click" state resumes from the
    * checkpointed state store, so a purchase replayed-in AFTER a stop
    * still matches a click ingested BEFORE it (StreamingSpec proves
    * equality with the uninterrupted run).
    */
  private[streaming] def drainAsOfToFileSink(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, out: String, chk: String): Unit = {
    val q = asofEnrich(asofSource(spark, schema, staged))
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** st21: daily distinct-user estimates maintained in STREAMING
    * aggregation state by the same KMV sketch kernel q30 stores in
    * parquet — one code path, three lifecycles (batch agg, stored
    * column, streaming state). Sketch content is set-semantic, so the
    * final estimates are independent of slice arrival order, and the
    * state per day is O(k) regardless of event volume — the streaming
    * distinct-count shape that never holds a per-user set.
    */
  /** The st21 daily KMV aggregate over a staged slice dir — shared by
    * the query path and the stop/resume proof (the sketch buffers must
    * round-trip the CHECKPOINTED state store, not just the in-memory
    * inter-batch store).
    */
  private[streaming] def kmvDailyAgg(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, k: Int): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(expr("ts DIV 86400000000000").as("d"),
        conv(substring(md5(col("user_id").cast("string")), 1, 13),
          16, 10).cast("long").as("uh"))
      .groupBy(col("d"))
      .agg(graft.functions.VectorFunctions.kmv_sketch(col("uh"), k)
        .as("sk"))
      .select(col("d"),
        graft.functions.VectorFunctions.kmv_estimate(col("sk"))
          .as("est_users"))

  def kmvDistinctStream(spark: SparkSession, dir: String,
      slices: Int = 4, k: Int = 64): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = false)
    val agg = kmvDailyAgg(spark, batch.schema, staged, k)
    val name = s"graft_st_kmv_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("d"))
  }

  /** st24: daily value-quantile estimates maintained in STREAMING
    * aggregation state by the bottom-k sample kernel q33/q34 use in
    * batch and storage — the third lifecycle of the quantile sketch.
    * Sample content is determined by the hash order alone (set
    * semantics, duplicate hash keeps MIN value), so the estimates are
    * independent of slice arrival order, and state per day is O(k)
    * regardless of event volume — a streaming percentile that never
    * buffers the day's values.
    */
  private[streaming] def bkDailyAgg(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, k: Int): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(expr("ts DIV 86400000000000").as("d"),
        conv(substring(md5(col("event_id").cast("string")), 1, 13),
          16, 10).cast("long").as("h"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("x"))
      .groupBy(col("d"))
      .agg(graft.functions.VectorFunctions.bksample_sketch(
        col("h"), col("x"), k).as("sk"))
      .select(col("d"),
        graft.functions.VectorFunctions
          .bksample_quantile(col("sk"), lit(0.5)).as("est_median_cents"),
        graft.functions.VectorFunctions
          .bksample_quantile(col("sk"), lit(0.9)).as("est_p90_cents"))

  def bkQuantileStream(spark: SparkSession, dir: String,
      slices: Int = 4, k: Int = 256): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = false)
    val agg = bkDailyAgg(spark, batch.schema, staged, k)
    val name = s"graft_st_bk_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("d"))
  }

  /** st25: daily per-key frequency sketches maintained in STREAMING
    * aggregation state — the count-min kernel (q37/q38) in its third
    * lifecycle. Counter matrices add element-wise across micro-batch
    * updates (exact mergeability), so the checkpointed state is 24 KB
    * per day regardless of event volume and the resulting estimates
    * are arrival-order independent. Probes are fixed user ids, but
    * the live sketch column can answer ANY key after the fact — the
    * "per-entity rate stats" a streaming abuse/quota monitor keeps.
    */
  private[streaming] def cmsDailyAgg(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      staged: String, w: Int, d: Int): DataFrame = {
    import graft.functions.{VectorFunctions => F}
    def probeHash(u: String) =
      conv(substring(md5(lit(u)), 1, 13), 16, 10).cast("long")
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(expr("ts DIV 86400000000000").as("d"),
        conv(substring(md5(col("user_id").cast("string")), 1, 13),
          16, 10).cast("long").as("h"))
      .groupBy(col("d"))
      .agg(F.cms_sketch(col("h"), w, d).as("sk"))
      .select(col("d"),
        F.cms_query(col("sk"), probeHash("1")).as("est_events_u1"),
        F.cms_query(col("sk"), probeHash("2")).as("est_events_u2"),
        F.cms_query(col("sk"), probeHash("3")).as("est_events_u3"))
  }

  def cmsFreqStream(spark: SparkSession, dir: String,
      slices: Int = 4, w: Int = 1024, d: Int = 3): DataFrame = {
    val batch = graft.queries.Tables.events(spark, dir)
    val staged = stageTimeSlices(batch, slices, trailer = false)
    val agg = cmsDailyAgg(spark, batch.schema, staged, w, d)
    val name = s"graft_st_cms_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("d"))
  }

  def sessionizeStream(events: Dataset[SessionEvent], gapUs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: the open
            // session is final — emit it and free the user's state.
            val st = state.get
            state.remove()
            Iterator.single(
              UserSession(user, st.n, st.start, st.last, st.cents))
          } else {
            val sorted = rows
              .map(e => (DateTimeUtils.fromJavaTimestamp(e.event_time),
                e.cents))
              .toSeq.sorted
            val (st, closed) =
              foldSessions(user, state.getOption.orNull, sorted, gapUs)
            state.update(st)
            // arm the event-time timeout at last+gap; clamp above the
            // current watermark (setTimeoutTimestamp rejects a time
            // the watermark already passed — fire next batch instead).
            val fireMs = st.last / 1000L + gapUs / 1000L
            state.setTimeoutTimestamp(
              math.max(fireMs, state.getCurrentWatermarkMs() + 1L))
            closed.iterator
          }
      }
  }
}
