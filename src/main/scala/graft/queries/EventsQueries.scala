package graft.queries

import org.apache.spark.sql.functions._
import Q._
import Tables._

/** Queries over the `events` table.
  *
  * `Tables.events` canonicalizes `ts` to LongType epoch-NANOS
  * regardless of the parquet vintage (INT64 TIMESTAMP(NANOS) read via
  * `nanosAsLong`, or `timestamp[us]`/TIMESTAMP_NTZ — see
  * [[graft.queries.Tables.normalizeEventTs]]). Queries here therefore
  * bucket with integer arithmetic on epoch nanos, mirrored in DuckDB
  * as `epoch(date_trunc(...))` — identical for the post-1970
  * timestamps in this dataset.
  */
object EventsQueries {

  /** Hourly tumbling-window aggregate per event type — the batch shape of
    * the streaming windowed agg (see graft.streaming).
    */
  val q1Hourly = Q(
    "ev1_hourly_agg",
    (s, d) =>
      events(s, d)
        .withColumn("hour_ts", expr("ts DIV 3600000000000") * 3600L)
        .groupBy(col("hour_ts"), col("event_type"))
        .agg(cnt.as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour_ts"), col("event_type")),
    sql = Some(s"""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
             event_type,
             COUNT(*) AS n_events,
             ${sqlDsum("value")} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_ts, event_type"""),
    bench = true)

  /** Sessionization-lite: per-user event counts and value stats —
    * the batch equivalent of keyed streaming state. Timestamps are
    * reported in microseconds (`ts DIV 1000`): DuckDB's TIMESTAMP is
    * micro-precision, so the oracle can't see nanos.
    */
  val q2PerUser = Q(
    "ev2_user_rollup",
    (s, d) =>
      events(s, d)
        .withColumn("ts_us", expr("ts DIV 1000"))
        .groupBy(col("user_id"))
        .agg(cnt.as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          dsum(col("value")).as("total_value"),
          min(col("ts_us")).as("first_us"),
          max(col("ts_us")).as("last_us"))
        .orderBy(col("user_id")),
    sql = Some(s"""
      SELECT user_id, COUNT(*) AS n_events,
             COUNT(DISTINCT event_type) AS n_types,
             ${sqlDsum("value")} AS total_value,
             CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_us,
             CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** JSON extraction from the string `props` column (semi-structured
    * payload — the common event-log shape).
    */
  val q3Json = Q(
    "ev3_json_extract",
    (s, d) =>
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(cnt.as("n_events"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    sql = Some("""
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
             CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Event-order window: time delta to the previous event per user
    * (lag window) — gap analysis, the batch twin of stream
    * sessionization with timeouts.
    */
  val q4Gaps = Q(
    "ev4_user_gaps",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, d)
        .withColumn("ts_us", expr("ts DIV 1000"))
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
        .withColumn("gap_us", col("ts_us") - col("prev_ts"))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(cnt.as("n_gaps"), sum(col("gap_us")).as("total_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .orderBy(col("user_id"))
    },
    sql = Some("""
      SELECT user_id, COUNT(*) AS n_gaps,
             CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
             CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
      FROM (SELECT user_id,
                   epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events) t
      WHERE gap_us IS NOT NULL
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Salted (skew-aware) per-type rollup: two-stage aggregation on
    * (key, salt) then key — the hot-key mitigation pattern — whose
    * result must be bit-identical to the direct groupBy the oracle
    * runs (exactness proof of the salting rewrite).
    */
  val q5Salted = Q(
    "ev5_salted_rollup",
    (s, d) =>
      graft.operators.SkewOps.saltedCountSum(
        events(s, d), col("event_type"), col("value"),
        buckets = 16, col("event_id"))
        .withColumnRenamed("k", "event_type")
        .orderBy(col("event_type")),
    sql = Some(s"""
      SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Bucketed range join: every click within ±1 hour of each purchase
    * by the same user (purchase-attribution context window). A naive
    * time-range theta-join plans as a nested-loop (quadratic per user
    * at scale); the classic decomposition maps both sides onto hour
    * buckets — each purchase fans out to the 2-3 buckets its ±1h
    * interval overlaps, clicks keep their single bucket — turning it
    * into a plain (user, bucket) EQUI-join (one hash shuffle, linear
    * in matches) with the exact predicate as a post-filter. The
    * bucket dedup is free: a matching (purchase, click) pair meets in
    * exactly the click's bucket. PlanQualitySpec locks the
    * no-nested-loop shape. All arithmetic is exact integer micros on
    * both engines.
    */
  val q6RangeJoin = Q(
    "ev6_range_join_bucketed",
    (s, d) => {
      val HourUs = 3600000000L
      val clicks = events(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts DIV 1000").as("cts_us"))
        .withColumn("bucket", expr(s"cts_us DIV $HourUs"))
      val purchases = events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          expr("ts DIV 1000").as("pts_us"))
        .withColumn("bucket", explode(sequence(
          expr(s"(pts_us - $HourUs) DIV $HourUs"),
          expr(s"(pts_us + $HourUs) DIV $HourUs"))))
      purchases.join(clicks, Seq("user_id", "bucket"))
        .filter(abs(col("cts_us") - col("pts_us")) <= HourUs)
        .groupBy(col("purchase_id"))
        .agg(cnt.as("n_clicks_1h"),
          min(abs(col("cts_us") - col("pts_us"))).as("min_gap_us"))
        .orderBy(col("purchase_id"))
    },
    sql = Some("""
      SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks_1h,
             CAST(MIN(ABS(epoch_us(c.ts) - epoch_us(p.ts)))
               AS BIGINT) AS min_gap_us
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND ABS(epoch_us(c.ts) - epoch_us(p.ts)) <= 3600000000
      GROUP BY p.event_id
      ORDER BY purchase_id"""))

  /** Sessionization: split each user's event stream into sessions at
    * inactivity gaps > 12 h, emit one row per session. THE canonical
    * clickstream/agent-trace operator at pipeline scale.
    *
    * Shape: one hash shuffle on `user_id` + one sort per partition
    * serve BOTH window passes (lag for the gap, running sum for the
    * session index — same partition/order spec, so no second
    * exchange), then the per-(user, session) agg combines map-side on
    * data already clustered by user. At 100 TB this is shuffle-bound
    * on exactly one exchange of the events table — the minimum any
    * gap-based sessionization needs. Per-user data stays streaming
    * (no per-user materialization), so a power user with millions of
    * events costs sort time, not memory blowup.
    *
    * 12 h threshold: the synthetic stream is sparse (median per-user
    * gap ~7 h), so 30 min would make every event its own session;
    * 12 h yields a real mix of multi-event sessions and singletons.
    */
  val q7Sessionize = Q(
    "ev7_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val gapUs = 43200L * 1000000L // 12 h of inactivity ends a session
      events(s, d)
        .withColumn("ts_us", expr("ts DIV 1000"))
        .withColumn("gap_us",
          col("ts_us") - lag(col("ts_us"), 1).over(byTime))
        .withColumn("sess_seq", sum(
          when(col("gap_us").isNull || col("gap_us") > gapUs, 1L)
            .otherwise(0L))
          .over(byTime.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy(col("user_id"), col("sess_seq"))
        .agg(min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"),
          cnt.as("n_events"),
          (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
          dsum(col("value")).as("total_value"))
        .orderBy(col("user_id"), col("sess_seq"))
    },
    sql = Some(s"""
      SELECT user_id, sess_seq,
             MIN(ts_us) AS session_start_us,
             MAX(ts_us) AS session_end_us,
             COUNT(*) AS n_events,
             MAX(ts_us) - MIN(ts_us) AS duration_us,
             ${sqlDsum("value")} AS total_value
      FROM (
        SELECT user_id, value, ts_us,
               CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 43200000000
                             THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_seq
        FROM (
          SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                 epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events))
      GROUP BY user_id, sess_seq
      ORDER BY user_id, sess_seq"""),
    bench = true)

  /** Funnel analysis: how far does each user progress through the
    * ordered view → click → purchase funnel? One pass: events
    * collect per user in event-time order, a single fold advances the
    * stage counter only on the NEXT expected step (a purchase before
    * any click doesn't count), then a 4-row histogram. The canonical
    * product-analytics sequence operator.
    *
    * Scale shape: one hash exchange on `user_id` (the collect_list
    * agg combines map-side), per-user state is that user's events
    * only (bounded), and the fold is a scan-local HOF. The histogram
    * agg moves 1 row per user.
    *
    * Window: first 48 h of the stream — long enough that some users
    * complete the funnel, short enough that all four stages are
    * populated (the whole month degenerates to everyone at stage 3).
    */
  val q8Funnel = Q(
    "ev8_funnel",
    (s, d) =>
      events(s, d)
        .withColumn("ts_us", expr("ts DIV 1000"))
        .filter(col("ts_us") < 1704240000000000L) // < 2024-01-03 UTC
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"),
          col("event_type")))).as("evs"))
        .withColumn("stage", expr(
          """aggregate(
               transform(evs, e -> CASE e.event_type
                 WHEN 'view' THEN 1 WHEN 'click' THEN 2
                 WHEN 'purchase' THEN 3 ELSE 0 END),
               0,
               (a, b) -> CASE WHEN b = a + 1 THEN a + 1 ELSE a END)"""))
        .groupBy(col("stage"))
        .agg(cnt.as("n_users"))
        .orderBy(col("stage")),
    sql = Some("""
      WITH coded AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS pos,
               CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                 WHEN 'purchase' THEN 3 ELSE 0 END AS code
        FROM events
        WHERE epoch_us(ts) < 1704240000000000),
      -- the greedy stage fold equals the longest prefix 1..s present
      -- as an ORDERED SUBSEQUENCE; match each stage at its earliest
      -- position after the previous one. (list_reduce formulated this
      -- directly, but DuckDB 1.0.0 mis-evaluates list_reduce inside a
      -- multi-group aggregation — verified wrong vs its own
      -- single-group and literal-list answers — so the oracle uses
      -- the subsequence form.)
      s1 AS (SELECT user_id, MIN(pos) AS p FROM coded
             WHERE code = 1 GROUP BY user_id),
      s2 AS (SELECT c.user_id, MIN(c.pos) AS p
             FROM coded c JOIN s1 USING (user_id)
             WHERE c.code = 2 AND c.pos > s1.p GROUP BY c.user_id),
      s3 AS (SELECT c.user_id, MIN(c.pos) AS p
             FROM coded c JOIN s2 USING (user_id)
             WHERE c.code = 3 AND c.pos > s2.p GROUP BY c.user_id),
      folded AS (
        SELECT u.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    WHEN s1.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS stage
        FROM (SELECT DISTINCT user_id FROM coded) u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id)
      SELECT CAST(stage AS INT) AS stage, COUNT(*) AS n_users
      FROM folded
      GROUP BY stage
      ORDER BY stage"""))

  /** Cohort retention matrix: users grouped by first-activity day,
    * distinct active users (and event volume) per (cohort, day-offset)
    * cell — the engagement-decay readout of product analytics, and a
    * different aggregation topology from ev7 (per-user sessions) and
    * ev8 (global funnel).
    *
    * Scale shape: the cohort relation is ONE map-side-combinable
    * min-agg at user cardinality — orders of magnitude smaller than
    * the event stream — so it joins back as a broadcast (fixture) or a
    * co-partitioned user_id shuffle (cluster); the cell agg's distinct
    * count is Spark's two-phase partial-distinct expand. Day buckets
    * are integer epoch arithmetic: nanos DIV 86400e9 == DuckDB's
    * truncated-micros // 86400e6 (nested floor division).
    */
  val q9Cohort = Q(
    "ev9_cohort_retention",
    (s, d) => {
      val e = events(s, d).select(col("user_id"),
        expr("ts DIV 86400000000000").as("day"))
      val cohorts = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort").as("cohort_day"),
          (col("day") - col("cohort")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          cnt.as("n_events"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    sql = Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      c AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY user_id)
      SELECT c.cohort AS cohort_day, e.day - c.cohort AS day_offset,
             COUNT(DISTINCT e.user_id) AS n_users,
             COUNT(*) AS n_events
      FROM e JOIN c ON e.user_id = c.user_id
      GROUP BY 1, 2
      ORDER BY cohort_day, day_offset"""))

  /** ev7's declarative twin: the SAME 12 h-gap sessions through
    * Spark's native `session_window` operator instead of hand-built
    * lag + running-sum windows — the idiomatic form, and the one that
    * carries unchanged to Structured Streaming (watermark + merging
    * session state). Boundary semantics differ at EXACTLY the gap:
    * `session_window` starts a new session when the gap is >= 12 h
    * (windows are half-open), ev7's lag split keeps a gap == 12 h
    * in-session; the oracle mirrors the >= semantics (the fixture has
    * no exact-boundary gap at either sf, checked).
    *
    * Scale shape: one user_id hash exchange into a sort-based session
    * aggregation — the same single-shuffle topology as ev7, with the
    * session merging done by the operator rather than two window
    * passes; `session_window.end` = last event + gap by definition,
    * so the oracle re-derives it as max(ts)+gap.
    */
  val q10SessionWindow = Q(
    "ev10_session_window",
    (s, d) =>
      events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
        .groupBy(col("user_id"),
          session_window(col("t"), "12 hours").as("sw"))
        .agg(cnt.as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("start_us")),
    sql = Some(s"""
      WITH e AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        FROM events),
      m AS (
        SELECT user_id, value, ts_us,
               CASE WHEN LAG(ts_us) OVER w IS NULL
                      OR ts_us - LAG(ts_us) OVER w >= 43200000000
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      s AS (
        SELECT user_id, value, ts_us,
               CAST(SUM(brk) OVER (PARTITION BY user_id
                 ORDER BY ts_us, brk DESC ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS sess
        FROM m)
      SELECT user_id, MIN(ts_us) AS start_us,
             MAX(ts_us) + 43200000000 AS end_us,
             COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
      FROM s GROUP BY user_id, sess
      ORDER BY user_id, start_us"""))

  /** Salted skew JOIN (ev11) — ev5's hot-key mitigation applied to the
    * join itself ([[graft.operators.SkewOps.saltedJoin]]): the fact
    * side salts 8 ways on event_id, the dim replicates 8×, the join
    * key becomes (user_id, salt) so one hot user's rows spread over 8
    * reducers — pre-planned (unlike AQE's after-the-fact split),
    * shuffle_hash-pinned so the salt is actually load-bearing.
    * Exactness proof: the oracle is the PLAIN unsalted join — results
    * must be bit-identical (money in exact cents). PlanQualitySpec
    * gates the salted exchange + no-broadcast shape.
    */
  val q11SaltedJoin = Q(
    "ev11_salted_join",
    (s, d) => {
      val dim = customer(s, d).select(col("c_custkey").as("user_id"),
        col("c_mktsegment"))
      graft.operators.SkewOps.saltedJoin(
        events(s, d).select(col("user_id"), col("event_id"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents")),
        dim, "user_id", saltBuckets = 8, col("event_id"))
        .groupBy(col("c_mktsegment"))
        .agg(cnt.as("n_events"), sum(col("cents")).as("total_cents"))
        .orderBy(col("c_mktsegment"))
    },
    sql = Some("""
      SELECT c.c_mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1
      ORDER BY 1"""))

  /** DYNAMIC-gap session windows (ev12) — the `session_window`
    * capability ev10's fixed gap doesn't exercise: each event extends
    * its session by a PER-EVENT gap (clicks 30 min, everything else 2
    * h — the "purchases keep a visit alive longer" modeling). Merge
    * semantics: an event joins a session iff its time is inside the
    * running max of (t + gap) over the session so far; session end =
    * that max. The oracle reconstructs exactly that with a running
    * `MAX(t+gap) OVER (… 1 PRECEDING)` break test — a genuinely
    * different algorithm from the engine's window-merge. Exact µs
    * integer arithmetic end to end.
    */
  val q12DynamicSession = Q(
    "ev12_dynamic_session",
    (s, d) =>
      events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
        .groupBy(col("user_id"),
          session_window(col("t"), when(col("event_type") === "click",
            "30 minutes").otherwise("2 hours")).as("sw"))
        .agg(cnt.as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us")),
    sql = Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us,
               CASE WHEN event_type = 'click' THEN 1800000000
                    ELSE 7200000000 END AS gap_us
        FROM events),
      m AS (
        SELECT user_id, t_us, gap_us,
               MAX(t_us + gap_us) OVER (PARTITION BY user_id
                 ORDER BY t_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_end
        FROM e),
      b AS (
        SELECT user_id, t_us, gap_us,
               CASE WHEN prev_end IS NULL OR t_us >= prev_end
                    THEN 1 ELSE 0 END AS brk
        FROM m),
      s AS (
        SELECT user_id, t_us, gap_us,
               SUM(brk) OVER (PARTITION BY user_id
                 ORDER BY t_us, brk DESC ROWS UNBOUNDED PRECEDING) AS sess
        FROM b)
      SELECT user_id, MIN(t_us) AS start_us,
             MAX(t_us + gap_us) AS end_us,
             COUNT(*) AS n_events
      FROM s
      GROUP BY user_id, sess
      ORDER BY user_id, start_us"""))

  /** SCD2 interval build (ev13) — the CDC shape every warehouse
    * dimension load runs: collapse each user's consecutive runs of an
    * attribute (event_type here) into validity intervals
    * `[valid_from, valid_to)` with an open current row — gaps-and-
    * islands + LEAD, the standard slowly-changing-dimension type-2
    * derivation from an event log. One user_id exchange carries the
    * change-flag window, the run collapse, AND the interval LEAD (all
    * three share the partitioning). Exact µs integers; run ids are
    * change-flag prefix sums over the deterministic (t_us, event_id)
    * order, so both engines number runs identically even through
    * microsecond ties.
    */
  val q13Scd2 = Q(
    "ev13_scd2_intervals",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("event_id"))
      val marked = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("t_us"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run", sum(col("chg"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val runs = marked
        .groupBy(col("user_id"), col("run"), col("event_type"))
        .agg(min(col("t_us")).as("valid_from_us"),
          count(lit(1)).as("n_events"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from_us"), col("run"))
      runs
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
        .withColumn("is_current",
          when(col("valid_to_us").isNull, 1L).otherwise(0L))
        .select(col("user_id"), col("event_type"), col("valid_from_us"),
          col("valid_to_us"), col("n_events"), col("is_current"), col("run"))
        .orderBy(col("user_id"), col("valid_from_us"), col("run"))
        .drop("run")
    },
    sql = Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS t_us
        FROM events),
      m AS (
        SELECT user_id, event_id, t_us, event_type,
               CASE WHEN LAG(event_type) OVER w IS NULL
                      OR LAG(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      r AS (
        SELECT user_id, t_us, event_type,
               SUM(chg) OVER (PARTITION BY user_id
                 ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS run
        FROM m),
      runs AS (
        SELECT user_id, run, event_type,
               MIN(t_us) AS valid_from_us,
               COUNT(*) AS n_events
        FROM r GROUP BY user_id, run, event_type)
      SELECT user_id, event_type, valid_from_us,
             LEAD(valid_from_us) OVER w2 AS valid_to_us,
             CAST(n_events AS BIGINT) AS n_events,
             CAST(CASE WHEN LEAD(valid_from_us) OVER w2 IS NULL
                  THEN 1 ELSE 0 END AS BIGINT) AS is_current
      FROM runs
      WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us, run)
      ORDER BY user_id, valid_from_us, run"""))

  /** SLIDING windows (ev14) — the overlapping-window capability ev1's
    * tumbling hour can't express: 2-hour windows sliding by 1 hour,
    * so every event lands in exactly TWO windows (the moving-average
    * readout shape). Spark's native `window(…, "2 hours", "1 hour")`
    * expands in-row before one keyed exchange; the oracle derives the
    * same two covering window starts arithmetically (`t DIV 1h − k`
    * for k ∈ {0,1}) — different mechanism, same buckets. Value sums
    * DECIMAL-routed; window starts as epoch seconds.
    */
  val q14SlidingWindow = Q(
    "ev14_sliding_window",
    (s, d) =>
      events(s, d)
        .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
        .groupBy(window(col("t"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(cnt.as("n_events"), dsum(col("value")).as("total_value"))
        .select(expr("unix_micros(w.start) DIV 1000000").as("win_start_s"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy(col("win_start_s"), col("event_type")),
    sql = Some(s"""
      SELECT (epoch_us(ts) // 3600000000 - k.k) * 3600 AS win_start_s,
             event_type, COUNT(*) AS n_events,
             ${sqlDsum("value")} AS total_value
      FROM events, (SELECT unnest(range(0, 2)) AS k) k
      GROUP BY 1, 2
      ORDER BY win_start_s, event_type"""))

  /** Z-ordered layout + file-level skipping (ev15): rewrite events
    * clustered on (user_id, ts) via interleaved-bit quantile buckets
    * ([[graft.operators.ZOrderLayouts]]), then answer a user × time
    * box query by reading ONLY the files whose manifest min/max box
    * intersects it, with the exact predicate refining file-granular
    * over-selection — the OPTIMIZE ZORDER discipline a 100 TB corpus
    * queried on more than one dimension needs (a linear sort prunes
    * one dimension; z-order prunes all clustered ones). The oracle
    * answers the same box over the raw table — layout must never
    * change results.
    */
  val q15ZorderScan = Q(
    "ev15_zorder_scan",
    (s, d) => {
      val path = java.nio.file.Files.createTempDirectory("graft_zorder")
        .resolve("events_z").toString
      graft.operators.ZOrderLayouts.zorderWrite(
        events(s, d), Seq("user_id", "ts"), path, buckets = 64, files = 8)
      val tsLo = 1704240000000000000L // 2024-01-03 UTC, epoch ns
      val tsHi = 1705449600000000000L // 2024-01-17 UTC
      graft.operators.ZOrderLayouts.skippingRead(s, path, Seq(
          ("user_id", 0L, 6L), ("ts", tsLo, tsHi)))
        .filter(col("user_id").between(0L, 6L) &&
          col("ts") >= tsLo && col("ts") < tsHi)
        .groupBy(col("event_type"))
        .agg(cnt.as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    },
    sql = Some(s"""
      SELECT event_type, COUNT(*) AS n_events,
             ${sqlDsum("value")} AS total_value
      FROM events
      WHERE user_id BETWEEN 0 AND 6
        AND epoch_us(ts) >= 1704240000000000
        AND epoch_us(ts) < 1705449600000000
      GROUP BY 1
      ORDER BY event_type"""))

  /** Time-series resample: per-user hourly grid (first→last observed
    * hour) carrying the forward-filled last observation. The missing
    * half of the time-series story (av* answer "value as of an
    * arbitrary instant"; this answers "value on a regular grid" — the
    * feature-engineering shape for training on irregular event data).
    *
    * Scale: the grid explode is bounded by span/granularity per key
    * (720 rows/user for this 30-day corpus — NEVER events×hours); the
    * grid↔observations join is co-keyed on (user, hour); the fill is
    * one window pass per user. Hour value = last event in the hour by
    * (t_us, event_id) — deterministic under timestamp ties, hash-agg
    * `max_by(struct)`, no per-hour window sort.
    */
  val q16Resample = Q(
    "ev16_resample_ffill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(
        col("user_id"),
        expr("ts DIV 1000").as("t_us"),
        col("event_id"),
        // exact cents: float money never crosses an engine boundary
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      val hourly = e
        .withColumn("h", expr("t_us DIV 3600000000"))
        .groupBy(col("user_id"), col("h"))
        .agg(
          max_by(col("cents"), struct(col("t_us"), col("event_id")))
            .as("cents_last"),
          cnt.as("n_obs"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("cents_last"), ignoreNulls = true).over(w)
            .as("cents_ffill"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"))
        .orderBy(col("user_id"), col("h"))
    },
    sql = Some("""
      WITH e AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events),
      hourly AS (
        SELECT user_id, h, cents AS cents_last, n_obs FROM (
          SELECT user_id, t_us // 3600000000 AS h, cents,
                 ROW_NUMBER() OVER (PARTITION BY user_id, t_us // 3600000000
                                    ORDER BY t_us DESC, event_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id, t_us // 3600000000)
                   AS n_obs
          FROM e) WHERE rn = 1),
      grid AS (
        SELECT user_id, unnest(generate_series(MIN(h), MAX(h))) AS h
        FROM hourly GROUP BY user_id)
      SELECT g.user_id, g.h,
             last_value(hh.cents_last IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cents_ffill,
             CAST(COALESCE(hh.n_obs, 0) AS BIGINT) AS n_obs
      FROM grid g LEFT JOIN hourly hh
        ON g.user_id = hh.user_id AND g.h = hh.h
      ORDER BY g.user_id, g.h"""))

  /** Linear interpolation on the same per-user hourly grid — gap hours
    * get the value interpolated between the neighboring observed hours,
    * in EXACT integer arithmetic: cents + floor-division (pmod-adjusted
    * so Spark and DuckDB agree for negative slopes), so the oracle
    * compare is bit-exact with zero float drift. Same scale shape as
    * ev16 plus one extra frame direction: backward and forward window
    * frames share ONE (user, h) sort.
    */
  val q17Interpolate = Q(
    "ev17_interpolate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(
        col("user_id"),
        expr("ts DIV 1000").as("t_us"),
        col("event_id"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      val hourly = e
        .withColumn("h", expr("t_us DIV 3600000000"))
        .groupBy(col("user_id"), col("h"))
        .agg(max_by(col("cents"), struct(col("t_us"), col("event_id")))
          .as("cents_last"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val wb = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("vp", last(col("cents_last"), ignoreNulls = true).over(wb))
        .withColumn("hp", last(when(col("cents_last").isNotNull, col("h")),
          ignoreNulls = true).over(wb))
        .withColumn("vn", first(col("cents_last"), ignoreNulls = true).over(wf))
        .withColumn("hn", first(when(col("cents_last").isNotNull, col("h")),
          ignoreNulls = true).over(wf))
        .select(col("user_id"), col("h"),
          when(col("hn") === col("hp"), col("vp"))
            .otherwise(expr(
              "vp + (((vn - vp) * (h - hp) - pmod((vn - vp) * (h - hp)," +
                " hn - hp)) DIV (hn - hp))"))
            .as("cents_interp"))
        .orderBy(col("user_id"), col("h"))
    },
    sql = Some("""
      WITH e AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events),
      hourly AS (
        SELECT user_id, h, cents AS cents_last FROM (
          SELECT user_id, t_us // 3600000000 AS h, cents,
                 ROW_NUMBER() OVER (PARTITION BY user_id, t_us // 3600000000
                                    ORDER BY t_us DESC, event_id DESC) AS rn
          FROM e) WHERE rn = 1),
      grid AS (
        SELECT user_id, unnest(generate_series(MIN(h), MAX(h))) AS h
        FROM hourly GROUP BY user_id),
      j AS (
        SELECT g.user_id, g.h, hh.cents_last
        FROM grid g LEFT JOIN hourly hh
          ON g.user_id = hh.user_id AND g.h = hh.h),
      f AS (
        SELECT user_id, h, cents_last,
               last_value(cents_last IGNORE NULLS) OVER wb AS vp,
               last_value(CASE WHEN cents_last IS NOT NULL THEN h END
                 IGNORE NULLS) OVER wb AS hp,
               first_value(cents_last IGNORE NULLS) OVER wf AS vn,
               first_value(CASE WHEN cents_last IS NOT NULL THEN h END
                 IGNORE NULLS) OVER wf AS hn
        FROM j
        WINDOW wb AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, h,
             CASE WHEN hn = hp THEN vp
                  ELSE vp + (((vn - vp) * (h - hp)
                              - ((((vn - vp) * (h - hp)) % (hn - hp))
                                 + (hn - hp)) % (hn - hp)) // (hn - hp))
             END AS cents_interp
      FROM f
      ORDER BY user_id, h"""))

  val all: Seq[Q] = Seq(q1Hourly, q2PerUser, q3Json, q4Gaps, q5Salted,
    q6RangeJoin, q7Sessionize, q8Funnel, q9Cohort, q10SessionWindow,
    q11SaltedJoin, q12DynamicSession, q13Scd2, q14SlidingWindow,
    q15ZorderScan, q16Resample, q17Interpolate)
}
