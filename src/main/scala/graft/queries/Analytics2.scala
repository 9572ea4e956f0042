package graft.queries

import org.apache.spark.sql.functions._
import Q._
import Tables._

/** Second wave of relational coverage: rollup, set ops, correlated and
  * scalar subqueries, conditional aggregation, temporal trends, string
  * functions — each the portable (engine-identical) formulation.
  */
object Analytics2 {

  /** ROLLUP hierarchy totals. NULL ordering differs between engines by
    * default (Spark NULLS FIRST, DuckDB NULLS LAST) — pinned explicitly.
    */
  val q12Rollup = Q(
    "q12_rollup_region_nation",
    (s, d) => {
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(cnt.as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    sql = Some(s"""
      SELECT r_name, n_name, COUNT(*) AS n_customers,
             ${sqlDsum("c_acctbal")} AS total_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** UNION ALL of heterogeneous sources into one entity list. */
  val q13Union = Q(
    "q13_union_entities",
    (s, d) => {
      val c = customer(s, d).select(col("c_name").as("name"),
        lit("customer").as("kind"), col("c_acctbal").as("balance"))
      val su = supplier(s, d).select(col("s_name").as("name"),
        lit("supplier").as("kind"), col("s_acctbal").as("balance"))
      c.unionByName(su).orderBy(col("name"), col("kind"))
    },
    sql = Some("""
      SELECT c_name AS name, 'customer' AS kind, c_acctbal AS balance
      FROM customer
      UNION ALL
      SELECT s_name, 'supplier', s_acctbal FROM supplier
      ORDER BY name, kind"""))

  /** Correlated EXISTS: customers having a big order (left-semi with
    * inequality condition).
    */
  val q14Exists = Q(
    "q14_exists_big_order",
    (s, d) => {
      val c = customer(s, d)
      val o = orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    sql = Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c.c_custkey
                      AND o_totalprice > 400000.0)
      ORDER BY c_custkey"""))

  /** Scalar subquery: orders above the (decimal-exact) average price —
    * Spark side as a broadcast cross join of the 1-row aggregate (no
    * driver-side collect).
    */
  val q15ScalarSubquery = Q(
    "q15_above_avg_orders",
    (s, d) => {
      val o = orders(s, d)
      val avgDf = o.agg((sum(col("o_totalprice").cast("decimal(18,6)"))
        .cast("double") / cnt).as("avg_price"))
      o.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"),
          round(col("avg_price"), 6).as("avg_price"))
        .orderBy(col("o_orderkey"))
    },
    sql = Some(s"""
      SELECT o_orderkey, o_totalprice,
             ROUND((SELECT ${sqlDsum("o_totalprice")} / COUNT(*)
                    FROM orders), 6) AS avg_price
      FROM orders
      WHERE o_totalprice > (SELECT ${sqlDsum("o_totalprice")} / COUNT(*)
                            FROM orders)
      ORDER BY o_orderkey"""))

  /** CASE-based bucketing + grouped aggregation. */
  val q16CaseBuckets = Q(
    "q16_price_buckets",
    (s, d) =>
      orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 100000.0, "low")
            .when(col("o_totalprice") < 250000.0, "mid")
            .otherwise("high"))
        .groupBy(col("bucket"))
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("bucket")),
    sql = Some(s"""
      SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
                  WHEN o_totalprice < 250000.0 THEN 'mid'
                  ELSE 'high' END AS bucket,
             COUNT(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS total
      FROM orders
      GROUP BY 1
      ORDER BY bucket"""))

  /** Monthly order trend (year/month extraction on TIMESTAMP_NTZ). */
  val q17MonthlyTrend = Q(
    "q17_monthly_trend",
    (s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"))
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("y"), col("m")),
    sql = Some(s"""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
             CAST(month(o_orderdate) AS INTEGER) AS m,
             COUNT(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS total
      FROM orders
      GROUP BY 1, 2
      ORDER BY y, m"""))

  /** String function coverage: upper/substr/length/replace/concat. */
  val q18StringOps = Q(
    "q18_string_ops",
    (s, d) =>
      part(s, d)
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_type"), " ", "_").as("type_slug"),
          concat_ws("|", col("p_brand"), col("p_size").cast("string"))
            .as("brand_size"))
        .orderBy(col("p_partkey")),
    sql = Some("""
      SELECT p_partkey,
             upper(substr(p_name, 1, 8)) AS name_prefix,
             CAST(length(p_name) AS BIGINT) AS name_len,
             replace(p_type, ' ', '_') AS type_slug,
             p_brand || '|' || CAST(p_size AS VARCHAR) AS brand_size
      FROM part
      ORDER BY p_partkey"""))

  /** Conditional (pivot-style) aggregation: per-flag quantities in one
    * pass over lineitem.
    */
  val q19ConditionalAgg = Q(
    "q19_conditional_agg",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          dsum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(0.0)).as("qty_returned"),
          dsum(when(col("l_returnflag") === "A", col("l_quantity"))
            .otherwise(0.0)).as("qty_a"),
          dsum(when(col("l_returnflag") === "N", col("l_quantity"))
            .otherwise(0.0)).as("qty_n"),
          cnt.as("n_rows"))
        .orderBy(col("l_linestatus")),
    sql = Some(s"""
      SELECT l_linestatus,
             ${sqlDsum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} AS qty_returned,
             ${sqlDsum("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0 END")} AS qty_a,
             ${sqlDsum("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0.0 END")} AS qty_n,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus"""))

  /** NTILE quartiles computed DISTRIBUTIVELY — no global window. A
    * `Window.orderBy` with no partitionBy funnels every row through one
    * task (guaranteed OOM/straggler at 100 TB), so global rank is
    * assembled instead from
    *   range repartition (partitions follow the sort order)
    *   + partition-local sort + local row index
    *     (`monotonically_increasing_id` low bits — counts rows in
    *     partition-local order)
    *   + per-partition row counts → cumulative offsets (a partitions²
    *     self-join over ONE ROW PER PARTITION — metadata-sized at any
    *     data scale, and window-free itself)
    * and the NTILE bucket follows from rank arithmetic: with q = n/k,
    * rem = n%k, the first rem buckets take q+1 rows. Output is
    * bit-identical to NTILE(4) because (price DESC, orderkey) is a
    * total order. Plan gate: PlanQualitySpec asserts no Window node.
    */
  val q20Ntile = Q(
    "q20_ntile_quartiles",
    (s, d) => {
      val parts = math.max(s.sparkContext.defaultParallelism, 2)
      val base = org.apache.spark.sql.graft.ScopedCaches.scoped(orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .repartitionByRange(parts, col("o_totalprice").desc, col("o_orderkey"))
        .sortWithinPartitions(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_totalprice"), spark_partition_id().as("pid"),
          // low 33 bits = row index within the partition, in row order
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
            .as("lrn")))
        // three consumers (counts, offsets, final join) — without the
        // scoped cache the scan + range exchange re-plans per consumer
        // (4x the dominant shuffle; AQE does NOT reuse these stages,
        // measured). Persisting the narrow projection also pins pid/lrn
        // to one evaluation. Gate: PlanQualitySpec asserts the cache is
        // hit; CacheHygieneSpec asserts the consuming action releases it.
      val counts = base.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
        // lrn is the LOW 33 BITS of monotonically_increasing_id: a range
        // partition holding >= 2^33 rows would silently wrap and assign
        // wrong quartiles. Fail loud instead (mirrors ClusterOps); at
        // that size, raise `parts`.
        .withColumn("cnt", when(col("cnt") >= (1L << 33),
            raise_error(concat(lit("q20: range partition holds "),
              col("cnt").cast("string"),
              lit(" rows >= 2^33; monotonically_increasing_id" +
                " row index would wrap — raise `parts`"))))
          .otherwise(col("cnt")))
      // offset(p) = Σ cnt(p') for p' < p  — window-free cumulative sum
      val offs = counts.as("a")
        .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
      val tot = counts.agg(sum(col("cnt")).as("n"))
      base.join(broadcast(offs), Seq("pid"))
        .crossJoin(broadcast(tot)) // 1-row scalar, broadcast like q15
        .withColumn("grank", col("off") + col("lrn") + lit(1L))
        .withColumn("quartile", expr(
          """CASE WHEN grank <= ((n DIV 4) + 1) * (n % 4)
                  THEN ((grank - 1) DIV ((n DIV 4) + 1)) + 1
                  ELSE (n % 4)
                       + ((grank - ((n DIV 4) + 1) * (n % 4) - 1)
                          DIV greatest(n DIV 4, 1)) + 1 END""").cast("long"))
        .groupBy(col("quartile"))
        .agg(cnt.as("n_orders"),
          dsum(col("o_totalprice")).as("total"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("quartile"))
    },
    sql = Some(s"""
      SELECT quartile, COUNT(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS total,
             MIN(o_totalprice) AS min_price
      FROM (SELECT o_totalprice,
                   NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                     AS quartile
            FROM orders) t
      GROUP BY quartile
      ORDER BY quartile"""))

  /** CUBE with GROUPING() disambiguation (a real NULL vs subtotal NULL). */
  val q21Cube = Q(
    "q21_cube_status_priority",
    (s, d) =>
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(cnt.as("n_orders"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first,
          col("g_status"), col("g_priority")),
    sql = Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
               g_status, g_priority"""))

  /** Explicit GROUPING SETS (q24) — the asymmetric subtotal layout
    * CUBE/ROLLUP can't express: per-status, per-priority, and grand
    * total, but NO (status, priority) cross cells. One pass, one
    * Expand + one aggregate exchange (the same physical shape as cube
    * with fewer projections — Expand emits 3 rows per input, not 4).
    */
  val q24GroupingSets = Q(
    "q24_grouping_sets",
    (s, d) =>
      orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
            Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("total_price"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first,
          col("g_status"), col("g_priority")),
    sql = Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS total_price,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
               g_status, g_priority"""))

  /** PIVOT (q25) — long-to-wide reshaping: order counts and exact
    * totals per priority, one column pair per order status. The pivot
    * values are DECLARED (`Seq("F","O","P")`), which matters at scale:
    * without them Spark runs a separate distinct-collect job over the
    * pivot column before it can even plan; with them the whole reshape
    * is ONE pass — per-status conditional aggregates inside a single
    * (o_orderpriority)-keyed exchange, exactly the CASE-WHEN plan the
    * oracle spells out by hand. Counts coalesced to 0 so an absent
    * (priority, status) cell reads the same in both engines.
    */
  val q25Pivot = Q(
    "q25_pivot_status",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(cnt.as("n"), dsum(col("o_totalprice")).as("amt"))
        .select(col("o_orderpriority"),
          coalesce(col("F_n"), lit(0L)).as("f_n"), col("F_amt").as("f_amt"),
          coalesce(col("O_n"), lit(0L)).as("o_n"), col("O_amt").as("o_amt"),
          coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_amt").as("p_amt"))
        .orderBy(col("o_orderpriority")),
    sql = Some(s"""
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
             ${sqlDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")}
               AS f_amt,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
             ${sqlDsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")}
               AS o_amt,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n,
             ${sqlDsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")}
               AS p_amt
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Native top-k AGGREGATE (q26) — the first graft aggregate kernel:
    * `topk_values` ([[org.apache.spark.sql.graft.TopKValues]], a
    * TypedImperativeAggregate like Spark's own percentile) keeps an
    * O(k) bounded min-heap per group through partial aggregation, so
    * each map task ships at most k doubles per group across the
    * exchange. The composable alternative — collect_list + slice — has
    * O(group) buffers and ships EVERY value; a window rank (q5's shape)
    * shuffles every row to sort it. At 100 TB with heavy groups this
    * is the difference between a map-side-combined agg and a spill.
    * Oracle re-derives the same values via a rank window (ties are
    * equal values, so rank arbitration is unobservable).
    */
  val q26TopkAgg = Q(
    "q26_topk_agg",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.VectorFunctions
            .topk_values(col("l_extendedprice"), 5).as("tk"),
          cnt.as("n_rows"))
        .select(col("l_returnflag") +: (0 until 5).map(i =>
          element_at(col("tk"), i + 1).as(s"top${i + 1}")) :+
          col("n_rows"): _*)
        .orderBy(col("l_returnflag")),
    sql = Some("""
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC) AS r
        FROM lineitem)
      SELECT l_returnflag,
             MAX(CASE WHEN r = 1 THEN l_extendedprice END) AS top1,
             MAX(CASE WHEN r = 2 THEN l_extendedprice END) AS top2,
             MAX(CASE WHEN r = 3 THEN l_extendedprice END) AS top3,
             MAX(CASE WHEN r = 4 THEN l_extendedprice END) AS top4,
             MAX(CASE WHEN r = 5 THEN l_extendedprice END) AS top5,
             COUNT(*) AS n_rows
      FROM ranked
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** KMV distinct-count sketch (q27) — the k-minimum-values estimator
    * (Bar-Yossef et al.): hash every value uniformly, keep the k
    * smallest hashes per group; if fewer than k survive the count is
    * exact, else `est = (k−1)·M / h_k` (h_k = k-th minimum, M = hash
    * range). The min-k selection REUSES the `topk_values` kernel on
    * negated hashes — O(k) state per group, mergeable, the property
    * that lets 1000 executors sketch independently and combine.
    * Hashes are 52-bit md5 prefixes so they are EXACT as doubles
    * (2^52 < 2^53) — the kernel's double heap and the oracle's BIGINT
    * rank window select the identical multiset, and the estimate is
    * one exact product and one correctly-rounded division in both
    * engines. The oracle re-derives minima via a rank window and
    * checks the same arithmetic — plus the EXACT distinct count and
    * the estimator's ppm error, so accuracy is visible in the result,
    * not just asserted.
    */
  val q27KmvDistinct = Q(
    "q27_kmv_distinct",
    (s, d) => {
      val k = 64
      val m = 4503599627370496.0 // 2^52
      val dv = lineitem(s, d)
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .select(col("l_returnflag"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 13),
            16, 10).cast("long").as("h"))
      dv.groupBy(col("l_returnflag"))
        .agg(graft.functions.VectorFunctions
            .topk_values(-col("h").cast("double"), k).as("tk"),
          cnt.as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
          when(col("n_exact") < k, col("n_exact"))
            .otherwise(floor(lit((k - 1).toDouble * m) /
              -element_at(col("tk"), k)).cast("long")).as("est"))
        .withColumn("err_ppm",
          floor(abs(col("est") - col("n_exact")).cast("double") *
            1000000.0 / col("n_exact")).cast("long"))
        .orderBy(col("l_returnflag"))
    },
    sql = Some("""
      WITH dv AS (
        SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
      h AS (
        SELECT l_returnflag,
               CAST(('0x' || substr(md5(l_partkey::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM dv),
      r AS (
        SELECT l_returnflag, h,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY h)
                 AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
        FROM h),
      est AS (
        SELECT l_returnflag, MAX(nd) AS n_exact,
               CASE WHEN MAX(nd) < 64 THEN MAX(nd)
                    -- DOUBLE casts: bare x.0 literals are DECIMAL in
                    -- DuckDB and the decimal product overflows (and
                    -- wouldn't match Spark's double arithmetic anyway)
                    ELSE CAST(FLOOR(CAST(63 AS DOUBLE) *
                      CAST(4503599627370496 AS DOUBLE) /
                      MAX(CASE WHEN rn = 64 THEN h END)) AS BIGINT)
               END AS est
        FROM r GROUP BY l_returnflag)
      SELECT l_returnflag, n_exact, est,
             CAST(FLOOR(ABS(est - n_exact) * 1000000.0 / n_exact)
               AS BIGINT) AS err_ppm
      FROM est
      ORDER BY l_returnflag"""))

  /** UNPIVOT (q28) — the inverse reshape of q25: four measure columns
    * melt to (measure, value) long format, then aggregate per measure.
    * `Dataset.unpivot` plans as ONE Expand (4 rows per input, exactly
    * like cube's shape) feeding a single measure-keyed exchange — no
    * union of four scans, which is what the hand-written alternative
    * (and the oracle, which DuckDB runs over a single scan anyway)
    * would cost at 100 TB: one pass instead of four.
    */
  val q28Unpivot = Q(
    "q28_unpivot_measures",
    (s, d) =>
      lineitem(s, d)
        .select(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy(col("measure"))
        .agg(cnt.as("n_rows"), dsum(col("value")).as("total"))
        .orderBy(col("measure")),
    sql = Some(s"""
      SELECT 'l_quantity' AS measure, COUNT(*) AS n_rows,
             ${sqlDsum("l_quantity")} AS total FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(*), ${sqlDsum("l_extendedprice")}
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', COUNT(*), ${sqlDsum("l_discount")}
      FROM lineitem
      UNION ALL
      SELECT 'l_tax', COUNT(*), ${sqlDsum("l_tax")} FROM lineitem
      ORDER BY measure"""))

  /** INTERSECT (distinct set semantics): nations present on both the
    * customer and supplier side.
    */
  val q22Intersect = Q(
    "q22_intersect_nations",
    (s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(
          supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")),
    sql = Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey"""))

  /** Exact interpolated percentiles per group (the distribution
    * readout behind pricing/quality dashboards). Spark's `percentile`
    * buffers each group's value frequencies — right when per-group
    * cardinality is bounded (7-ish return-flag groups here, value
    * space ~100k); for unbounded groups at 100 TB the swap-in is
    * `approx_percentile` (GK sketch, fixed memory) — the exact form
    * is pinned here because the oracle can match it bit-for-bit
    * (both engines: linear interpolation at p·(n−1)).
    */
  val q23Percentiles = Q(
    "q23_price_percentiles",
    (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"),
          cnt.as("n_rows"))
        .orderBy(col("l_returnflag")),
    sql = Some("""
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
             ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
             ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Histogram quantile SKETCH (q29) — the quantile path that actually
    * scales, next to q23's exact `percentile` (which sorts every group
    * value into aggregation state): pass 1 = min/max scan-agg; pass 2 =
    * 1024-bin equi-width histogram (one map-side-combined hash agg —
    * ≤1024 rows of state on ANY input size, trivially mergeable across
    * partitions, the property that makes it a sketch); quantile p =
    * lower bound of the first bucket whose cumulative mass reaches p%
    * (integer compare — no interpolation float drift). The cumulative
    * window runs over ≤1024 bucket rows, not the data. Both engines
    * compute bin ids with the identical IEEE expression, so the report
    * hash-matches bit-for-bit.
    */
  val q29Histogram = Q(
    "q29_histogram_quantiles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = lineitem(s, d)
      // both sketch stages are tiny (1 row / ≤1024 rows) but consumed
      // more than once downstream — scope-cached so the DATA is
      // scanned exactly twice (min/max pass + histogram pass), never
      // once per consumer
      val mm = org.apache.spark.sql.graft.ScopedCaches.scoped(
        li.agg(min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi")))
      val hist = org.apache.spark.sql.graft.ScopedCaches.scoped(
        li.crossJoin(broadcast(mm))
          .select(least(floor((col("l_extendedprice") - col("lo")) *
              lit(1024.0d) / (col("hi") - col("lo"))), lit(1023.0d))
            .cast("long").as("bucket"))
          .groupBy(col("bucket")).agg(cnt.as("n")))
      val cum = hist
        .withColumn("cum", sum(col("n")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      val qb = cum
        .select(col("bucket"), col("cum"), col("total"),
          explode(array(lit(50), lit(90), lit(99))).as("pct"))
        .filter(col("cum") * 100 >= col("pct").cast("long") * col("total"))
        .groupBy(col("pct").cast("long").as("pct"))
        .agg(min(col("bucket")).as("bucket"))
      qb.join(cum.select(col("bucket"), col("cum")), Seq("bucket"))
        .crossJoin(broadcast(mm))
        .select(col("pct"), col("bucket"),
          round(col("lo") + col("bucket").cast("double") *
            (col("hi") - col("lo")) / lit(1024.0d), 6).as("est_value"),
          col("cum").as("cum_rows"))
        .orderBy(col("pct"))
    },
    sql = Some("""
      WITH mm AS (SELECT MIN(l_extendedprice) AS lo,
                         MAX(l_extendedprice) AS hi FROM lineitem),
      b AS (
        SELECT CAST(least(floor((l_extendedprice - lo) *
                 CAST(1024 AS DOUBLE) / (hi - lo)),
                 CAST(1023 AS DOUBLE)) AS BIGINT) AS bucket
        FROM lineitem, mm),
      h AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket),
      c AS (
        SELECT bucket, CAST(SUM(n) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum
        FROM h),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
      q AS (
        SELECT pct, MIN(bucket) AS bucket
        FROM c, t, (SELECT unnest([50, 90, 99]) AS pct)
        WHERE cum * 100 >= pct * total
        GROUP BY pct)
      SELECT CAST(q.pct AS BIGINT) AS pct, q.bucket,
             ROUND(lo + CAST(q.bucket AS DOUBLE) * (hi - lo) /
               CAST(1024 AS DOUBLE), 6) AS est_value,
             c.cum AS cum_rows
      FROM q JOIN c USING (bucket), mm
      ORDER BY pct"""),
    bench = true)

  /** Build-once KMV sketch store for q30: one binary sketch of the
    * distinct part keys per (returnflag, linestatus), persisted as
    * parquet — the ingest-time half of "sketch once, query many".
    */
  private def ensureKmvStore(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"q30_kmv_store_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t)) {
      val loc = java.nio.file.Files.createTempDirectory("graft_kmv").toString
      lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 13),
            16, 10).cast("long").as("h"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.functions.VectorFunctions.kmv_sketch(col("h"), 64)
          .as("sk"))
        .write.option("path", loc).saveAsTable(t)
    }
    t
  }

  /** Stored-sketch rollup (q30): distinct part keys per returnflag
    * estimated by MERGING the persisted per-(flag, status) KMV sketches
    * — the raw table is scanned ONCE at store-build time and never
    * again; every subsequent rollup reads a few KB of sketch bytes per
    * group. Union of per-group k-mins is the k-min of the union, so the
    * merged estimate is byte-identical to sketching the coarse group
    * directly — which is exactly what the oracle recomputes from raw
    * data (same 52-bit md5 hash space, same floor((k-1)·2⁵²/h₍ₖ₎)
    * double arithmetic): the ESTIMATOR is verified, not just row shape.
    */
  val q30KmvStored = Q(
    "q30_kmv_stored_rollup",
    (s, d) => {
      val store = s.table(ensureKmvStore(s, d))
      store.groupBy(col("l_returnflag"))
        .agg(graft.functions.VectorFunctions.kmv_merge(col("sk")).as("sk"),
          cnt.as("n_sketches"))
        .select(col("l_returnflag"),
          graft.functions.VectorFunctions.kmv_estimate(col("sk"))
            .as("est_partkeys"),
          col("n_sketches"))
        .orderBy(col("l_returnflag"))
    },
    sql = Some("""
      WITH h AS (
        SELECT DISTINCT l_returnflag,
               CAST(('0x' || substr(md5(l_partkey::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM lineitem),
      r AS (
        SELECT l_returnflag, h,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY h)
                 AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
        FROM h),
      g AS (
        SELECT l_returnflag,
               COUNT(DISTINCT l_linestatus) AS n_sketches
        FROM lineitem GROUP BY 1)
      SELECT r.l_returnflag,
             CASE WHEN MAX(r.nd) < 64 THEN MAX(r.nd)
                  ELSE CAST(FLOOR(CAST(63 AS DOUBLE)
                         * 4503599627370496.0
                         / CAST(MAX(CASE WHEN r.rn = 64 THEN r.h END)
                                AS DOUBLE)) AS BIGINT)
             END AS est_partkeys,
             MAX(g.n_sketches) AS n_sketches
      FROM r JOIN g ON r.l_returnflag = g.l_returnflag
      GROUP BY r.l_returnflag
      ORDER BY r.l_returnflag"""),
    bench = true)

  /** Incremental sketch-store maintenance (q31): a standing store of
    * per-event-type distinct-user sketches built from the corpus
    * through January 20 is brought up to date by merging ONLY the
    * delta days' sketches into the stored bytes — the delta is the
    * only raw data scanned at maintenance time. The oracle computes
    * the estimator over the FULL range from scratch, so the compare
    * proves fold(stored, delta) == rebuild exactly (KMV merge is
    * associative over row partitions — the property that makes a
    * standing sketch store maintainable at all).
    */
  private def ensureKmvBaseStore(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"q31_kmv_base_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t)) {
      val loc = java.nio.file.Files.createTempDirectory("graft_kmv31").toString
      Tables.events(s, d)
        .filter(expr("ts DIV 86400000000000") < lit(19742L)) // < Jan 20 '24
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.VectorFunctions.kmv_sketch(col("h"), 64)
          .as("sk"))
        .write.option("path", loc).saveAsTable(t)
    }
    t
  }

  val q31KmvIncremental = Q(
    "q31_kmv_incremental",
    (s, d) => {
      val base = s.table(ensureKmvBaseStore(s, d))
      val delta = Tables.events(s, d)
        .filter(expr("ts DIV 86400000000000") >= lit(19742L))
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.VectorFunctions.kmv_sketch(col("h"), 64)
          .as("sk"))
      base.unionByName(delta)
        .groupBy(col("event_type"))
        .agg(graft.functions.VectorFunctions.kmv_merge(col("sk")).as("sk"))
        .select(col("event_type"),
          graft.functions.VectorFunctions.kmv_estimate(col("sk"))
            .as("est_users"))
        .orderBy(col("event_type"))
    },
    sql = Some("""
      WITH e AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM events),
      dv AS (SELECT DISTINCT event_type, h FROM e),
      r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM dv)
      SELECT event_type,
             CASE WHEN MAX(nd) < 64 THEN MAX(nd)
                  ELSE CAST(FLOOR(CAST(63 AS DOUBLE)
                         * 4503599627370496.0
                         / CAST(MAX(CASE WHEN rn = 64 THEN h END)
                                AS DOUBLE)) AS BIGINT)
             END AS est_users
      FROM r GROUP BY event_type ORDER BY event_type"""))

  /** Mergeable QUANTILE sketch (q33) — the order-statistics companion
    * to q27/q30's distinct counts, completing the mergeable-sketch
    * family (distinct: KMV; frequency: Misra-Gries; quantiles: this).
    * Classic bottom-k sampling (Cohen & Kaplan 2007, public): per
    * group keep the k entries with the smallest 52-bit md5 hashes of
    * the row's unique key, each carrying its measure value — a uniform
    * sample without replacement that MERGES exactly (k smallest of a
    * union = k smallest of the halves' k-smallest). The query
    * exercises all three kernels in one lineage: sketch at
    * (priority, status) grain, merge up to priority, nearest-rank
    * median and p90 off the merged sample — by associativity the
    * merged sketch equals sketching the coarse group directly, which
    * is exactly what the oracle recomputes. Everything is
    * deterministic (duplicate hashes keep MIN value; rank =
    * floor((m−1)·q), same IEEE arithmetic both engines), so DuckDB
    * hash-matches the ESTIMATES themselves — the estimator is checked,
    * not just plausible. `SketchQualitySpec` gates the sampling-error
    * band against exact quantiles.
    */
  val q33BkSampleQuantile = Q(
    "q33_bksample_quantile",
    (s, d) => {
      val k = 256
      val base = orders(s, d).select(
        col("o_orderpriority").as("p"), col("o_orderstatus").as("st"),
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 13),
          16, 10).cast("long").as("h"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("x"))
      base.groupBy(col("p"), col("st"))
        .agg(graft.functions.VectorFunctions
            .bksample_sketch(col("h"), col("x"), k).as("sk"),
          cnt.as("n"))
        .groupBy(col("p"))
        .agg(graft.functions.VectorFunctions.bksample_merge(col("sk"))
            .as("sk"),
          sum(col("n")).as("n_orders"))
        .select(col("p").as("o_orderpriority"), col("n_orders"),
          graft.functions.VectorFunctions
            .bksample_quantile(col("sk"), lit(0.5))
            .as("est_median_cents"),
          graft.functions.VectorFunctions
            .bksample_quantile(col("sk"), lit(0.9))
            .as("est_p90_cents"))
        .orderBy(col("o_orderpriority"))
    },
    sql = Some("""
      WITH s AS (
        SELECT o_orderpriority AS p,
               CAST(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 13))
                 AS BIGINT) AS h,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
        FROM orders),
      d AS (SELECT p, h, MIN(x) AS x FROM s GROUP BY p, h),
      r AS (
        SELECT p, x,
               row_number() OVER (PARTITION BY p ORDER BY h) AS rn
        FROM d),
      keep AS (SELECT p, x FROM r WHERE rn <= 256),
      m AS (SELECT p, COUNT(*) AS msz FROM keep GROUP BY p),
      rv AS (
        SELECT p, x,
               row_number() OVER (PARTITION BY p ORDER BY x) AS vr
        FROM keep),
      q AS (
        SELECT rv.p,
               -- DOUBLE casts: bare 0.5/0.9 are DECIMAL in DuckDB
               -- (exact), the engine multiplies IEEE doubles — floors
               -- could differ at integer boundaries
               MAX(CASE WHEN vr = CAST(FLOOR((msz - 1)
                 * CAST(0.5 AS DOUBLE)) AS BIGINT) + 1 THEN x END)
                 AS est_median_cents,
               MAX(CASE WHEN vr = CAST(FLOOR((msz - 1)
                 * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1 THEN x END)
                 AS est_p90_cents
        FROM rv JOIN m ON rv.p = m.p GROUP BY rv.p),
      n AS (SELECT o_orderpriority AS p, COUNT(*) AS n_orders
            FROM orders GROUP BY 1)
      SELECT q.p AS o_orderpriority, n.n_orders,
             q.est_median_cents, q.est_p90_cents
      FROM q JOIN n ON q.p = n.p
      ORDER BY 1"""),
    bench = true)

  /** Incremental QUANTILE-store maintenance (q34) — q31's standing-
    * store discipline applied to the bottom-k sample sketch: a stored
    * table of per-event-type value sketches built from the corpus
    * through January 20 is brought up to date by sketching ONLY the
    * delta days and merging into the stored bytes. The oracle
    * recomputes the estimator over the FULL range from scratch, so the
    * compare proves fold(stored, delta) == rebuild exactly — the
    * associativity that makes a standing quantile store maintainable
    * without rescanning history. Hash = md5(event_id) (the row's
    * unique key); measure = integer cents of `value`.
    */
  private def ensureBkBaseStore(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"q34_bk_base_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t)) {
      val loc = java.nio.file.Files.createTempDirectory("graft_bk34").toString
      Tables.events(s, d)
        .filter(expr("ts DIV 86400000000000") < lit(19742L)) // < Jan 20 '24
        .select(col("event_type"),
          conv(substring(md5(col("event_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("x"))
        .groupBy(col("event_type"))
        .agg(graft.functions.VectorFunctions
          .bksample_sketch(col("h"), col("x"), 256).as("sk"))
        .write.option("path", loc).saveAsTable(t)
    }
    t
  }

  val q34BkIncremental = Q(
    "q34_bksample_incremental",
    (s, d) => {
      val base = s.table(ensureBkBaseStore(s, d))
      val delta = Tables.events(s, d)
        .filter(expr("ts DIV 86400000000000") >= lit(19742L))
        .select(col("event_type"),
          conv(substring(md5(col("event_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("x"))
        .groupBy(col("event_type"))
        .agg(graft.functions.VectorFunctions
          .bksample_sketch(col("h"), col("x"), 256).as("sk"))
      base.unionByName(delta)
        .groupBy(col("event_type"))
        .agg(graft.functions.VectorFunctions.bksample_merge(col("sk"))
          .as("sk"))
        .select(col("event_type"),
          graft.functions.VectorFunctions
            .bksample_quantile(col("sk"), lit(0.5)).as("est_median_cents"),
          graft.functions.VectorFunctions
            .bksample_quantile(col("sk"), lit(0.9)).as("est_p90_cents"))
        .orderBy(col("event_type"))
    },
    sql = Some("""
      WITH s AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(event_id::VARCHAR), 1, 13))
                 AS BIGINT) AS h,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events),
      d AS (SELECT event_type, h, MIN(x) AS x FROM s GROUP BY 1, 2),
      r AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM d),
      keep AS (SELECT event_type, x FROM r WHERE rn <= 256),
      m AS (SELECT event_type, COUNT(*) AS msz FROM keep GROUP BY 1),
      rv AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY x) AS vr
        FROM keep)
      SELECT rv.event_type,
             MAX(CASE WHEN vr = CAST(FLOOR((msz - 1)
               * CAST(0.5 AS DOUBLE)) AS BIGINT) + 1 THEN x END)
               AS est_median_cents,
             MAX(CASE WHEN vr = CAST(FLOOR((msz - 1)
               * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1 THEN x END)
               AS est_p90_cents
      FROM rv JOIN m ON rv.event_type = m.event_type
      GROUP BY rv.event_type ORDER BY rv.event_type"""))

  /** KMV set algebra (q35): audience-overlap estimates between every
    * pair of order priorities from STORED sketches alone — the Beyer
    * et al. SIGMOD'07 estimator (U = k-min of A∪B; J = overlap/|U|;
    * |A∩B| ≈ J·est(U)) over the kmv_union / kmv_overlap / kmv_size
    * scalars. The intersection estimate is computed in PURE INTEGER
    * arithmetic (overlap · est_union DIV m), so DuckDB reproduces the
    * ESTIMATE bit-exactly. At 100 TB the sketch path answers any
    * pairwise overlap from a few KB per segment; the exact column
    * (a distinct self-join the sketch replaces) is the test-scale
    * accuracy witness carried in the output, q27-style.
    */
  val q35KmvSetOps = Q(
    "q35_kmv_set_ops",
    (s, d) => {
      import graft.functions.{VectorFunctions => F}
      val base = orders(s, d).select(
        col("o_orderpriority").as("p"), col("o_custkey").as("c"),
        conv(substring(md5(col("o_custkey").cast("string")), 1, 13),
          16, 10).cast("long").as("h"))
      val sk = base.groupBy(col("p"))
        .agg(F.kmv_sketch(col("h"), 64).as("sk"))
      val est = sk.select(col("p").as("p1"), col("sk").as("ska"))
        .join(sk.select(col("p").as("p2"), col("sk").as("skb")),
          col("p1") < col("p2"))
        .select(col("p1"), col("p2"),
          F.kmv_overlap(col("ska"), col("skb")).as("n_overlap"),
          F.kmv_size(F.kmv_union(col("ska"), col("skb"))).as("m_union"),
          F.kmv_estimate(F.kmv_union(col("ska"), col("skb")))
            .as("est_union"))
        .withColumn("est_common",
          expr("n_overlap * est_union DIV m_union"))
      val pc = base.select(col("p"), col("c")).distinct()
      val exact = pc.select(col("p").as("p1"), col("c"))
        .join(pc.select(col("p").as("p2"), col("c")), Seq("c"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(cnt.as("n_exact"))
      est.join(exact, Seq("p1", "p2"))
        .withColumn("err_ppm",
          expr("abs(est_common - n_exact) * 1000000 DIV n_exact"))
        .orderBy(col("p1"), col("p2"))
    },
    sql = Some("""
      WITH h AS (
        SELECT DISTINCT o_orderpriority AS p, o_custkey AS c,
               CAST(('0x' || substr(md5(o_custkey::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM orders),
      r AS (
        SELECT p, h,
               row_number() OVER (PARTITION BY p ORDER BY h) AS rn
        FROM (SELECT DISTINCT p, h FROM h)),
      sk AS (SELECT p, h FROM r WHERE rn <= 64),
      pairs AS (
        SELECT a.p AS p1, b.p AS p2
        FROM (SELECT DISTINCT p FROM h) a
        JOIN (SELECT DISTINCT p FROM h) b ON a.p < b.p),
      uh AS (
        SELECT DISTINCT pr.p1, pr.p2, s.h
        FROM pairs pr JOIN sk s ON s.p = pr.p1 OR s.p = pr.p2),
      ur AS (
        SELECT p1, p2, h,
               row_number() OVER (PARTITION BY p1, p2 ORDER BY h) AS rn
        FROM uh),
      u64 AS (SELECT p1, p2, h, rn FROM ur WHERE rn <= 64),
      m AS (
        SELECT p1, p2, COUNT(*) AS msz,
               CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                    ELSE CAST(FLOOR(CAST(63 AS DOUBLE)
                           * 4503599627370496.0
                           / CAST(MAX(CASE WHEN rn = 64 THEN h END)
                                  AS DOUBLE)) AS BIGINT)
               END AS est_union
        FROM u64 GROUP BY p1, p2),
      ov AS (
        SELECT u.p1, u.p2, COUNT(*) AS n_overlap
        FROM u64 u
        JOIN sk a ON a.p = u.p1 AND a.h = u.h
        JOIN sk b ON b.p = u.p2 AND b.h = u.h
        GROUP BY u.p1, u.p2),
      ex AS (
        SELECT a.p AS p1, b.p AS p2, COUNT(*) AS n_exact
        FROM (SELECT DISTINCT p, c FROM h) a
        JOIN (SELECT DISTINCT p, c FROM h) b
          ON a.c = b.c AND a.p < b.p
        GROUP BY 1, 2)
      SELECT m.p1, m.p2,
             COALESCE(ov.n_overlap, 0) AS n_overlap,
             m.msz AS m_union, m.est_union,
             COALESCE(ov.n_overlap, 0) * m.est_union // m.msz
               AS est_common,
             ex.n_exact,
             abs(COALESCE(ov.n_overlap, 0) * m.est_union // m.msz
                 - ex.n_exact) * 1000000 // ex.n_exact AS err_ppm
      FROM m JOIN ex ON m.p1 = ex.p1 AND m.p2 = ex.p2
      LEFT JOIN ov ON m.p1 = ov.p1 AND m.p2 = ov.p2
      ORDER BY m.p1, m.p2"""))

  /** Rolling distinct over stored sketches (q36): 7-day rolling
    * distinct-user counts per day, answered by merging each day's
    * STORED KMV sketch across the window — time-windowed distinct
    * without rescanning raw data, the aggregation DISTINCT-COUNT
    * cannot do (distinct doesn't sum across days; sketches merge).
    * The window is a 7-row self-join on the tiny daily-sketch
    * relation (days×k bytes, broadcast), never on raw events; at
    * 100 TB the events scan happens once at store build, and any
    * window length is then a sketch-merge over a few KB per day.
    * Oracle recomputes each window's k-min estimator from raw rows.
    */
  val q36KmvRolling = Q(
    "q36_kmv_rolling_distinct",
    (s, d) => {
      import graft.functions.{VectorFunctions => F}
      val daily = Tables.events(s, d)
        .select(expr("ts DIV 86400000000000").as("day"),
          conv(substring(md5(col("user_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"))
        .groupBy(col("day"))
        .agg(F.kmv_sketch(col("h"), 64).as("sk"))
      val win = daily.select(col("day").as("d_end"))
        .join(broadcast(daily), col("day").between(col("d_end") - 6,
          col("d_end")))
        .groupBy(col("d_end"))
        .agg(F.kmv_merge(col("sk")).as("sk"),
          cnt.as("n_days"))
      win.select(col("d_end"), col("n_days"),
          F.kmv_estimate(col("sk")).as("est_users_7d"))
        .orderBy(col("d_end"))
    },
    sql = Some("""
      WITH e AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM events),
      days AS (SELECT DISTINCT day FROM e),
      -- per-day k-min windows (the stored sketch content)
      dk AS (
        SELECT day, h FROM (
          SELECT day, h,
                 row_number() OVER (PARTITION BY day ORDER BY h) AS rn
          FROM (SELECT DISTINCT day, h FROM e))
        WHERE rn <= 64),
      -- merged window sketch = 64 smallest of the member days' k-mins
      wh AS (
        SELECT DISTINCT d.day AS d_end, s.h
        FROM days d JOIN dk s
          ON s.day BETWEEN d.day - 6 AND d.day),
      wr AS (
        SELECT d_end, h,
               row_number() OVER (PARTITION BY d_end ORDER BY h) AS rn
        FROM wh),
      w64 AS (SELECT d_end, h, rn FROM wr WHERE rn <= 64),
      nd AS (
        SELECT d.day AS d_end, COUNT(*) AS n_days
        FROM days d JOIN days m ON m.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1)
      SELECT w.d_end, nd.n_days,
             CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                  ELSE CAST(FLOOR(CAST(63 AS DOUBLE)
                         * 4503599627370496.0
                         / CAST(MAX(CASE WHEN w.rn = 64 THEN w.h END)
                                AS DOUBLE)) AS BIGINT)
             END AS est_users_7d
      FROM w64 w JOIN nd ON w.d_end = nd.d_end
      GROUP BY w.d_end, nd.n_days
      ORDER BY w.d_end"""))

  /** Count-min point frequencies (q37): the token stream is sketched
    * ONCE into a single d×w counter matrix (two-phase aggregation:
    * partial matrices add element-wise map-side, only 24 KB crosses
    * the exchange), then any term's frequency is answered from the
    * stored bytes — the "how often did THIS key occur" query
    * Misra-Gries can't serve for non-heavy keys. Buckets are the
    * Carter–Wegman form ((h·P_j + B_j) mod 2⁶¹−1) mod w over fixed
    * engine constants (see [[org.apache.spark.sql.graft.CmsBuffer]]),
    * every product below 2⁶³ — so the oracle rebuilds the identical
    * counters in BIGINT SQL and the ESTIMATES hash-match. Probes are
    * the 20 alphabetically-first distinct terms; `overcount`
    * (est − exact, ≥ 0 by the sketch's one-sided guarantee) rides
    * along, q27-style, so accuracy is part of the checked output.
    */
  val q37CmsFreq = Q(
    "q37_cms_token_freq",
    (s, d) => {
      import graft.functions.{VectorFunctions => F}
      val hashed = documents(s, d)
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
        .select(col("term"),
          conv(substring(md5(col("term")), 1, 13), 16, 10)
            .cast("long").as("h"))
      val sk = hashed.agg(F.cms_sketch(col("h"), 1024, 3).as("sk"))
      val probes = hashed.groupBy(col("term"), col("h"))
        .agg(cnt.as("n_exact"))
        .orderBy(col("term")).limit(20)
      probes.crossJoin(broadcast(sk))
        .select(col("term"), col("n_exact"),
          F.cms_query(col("sk"), col("h")).as("est_cms"))
        .withColumn("overcount", expr("est_cms - n_exact"))
        .orderBy(col("term"))
    },
    sql = Some("""
      WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents),
      h AS (
        SELECT term,
               CAST(('0x' || substr(md5(term), 1, 13)) AS BIGINT) AS h
        FROM tok),
      js AS (SELECT unnest([0, 1, 2]) AS j),
      bk AS (
        SELECT js.j,
               ((h.h * CASE js.j WHEN 0 THEN 641 WHEN 1 THEN 1097
                       ELSE 2039 END
                 + CASE js.j WHEN 0 THEN 31 WHEN 1 THEN 277
                   ELSE 1013 END)
                % 2305843009213693951) % 1024 AS b,
               COUNT(*) AS c
        FROM h CROSS JOIN js GROUP BY 1, 2),
      probes AS (
        SELECT term, h, COUNT(*) AS n_exact
        FROM h GROUP BY term, h ORDER BY term LIMIT 20),
      est AS (
        SELECT p.term, p.n_exact, MIN(bk.c) AS est_cms
        FROM probes p CROSS JOIN js
        JOIN bk ON bk.j = js.j
               AND bk.b = ((p.h * CASE js.j WHEN 0 THEN 641
                            WHEN 1 THEN 1097 ELSE 2039 END
                            + CASE js.j WHEN 0 THEN 31 WHEN 1 THEN 277
                              ELSE 1013 END)
                           % 2305843009213693951) % 1024
        GROUP BY p.term, p.n_exact)
      SELECT term, n_exact, est_cms, est_cms - n_exact AS overcount
      FROM est ORDER BY term"""))

  /** Join-size estimation from stored sketches (q38): the classic
    * count-min application after point frequencies — |A ⋈ B| on an
    * equi-key estimated as min_j Σ_b A_j[b]·B_j[b] (Cormode &
    * Muthukrishnan §4.2) from two 24 KB sketches, never rescanning
    * either table. This is the stats-store primitive a cost-based
    * planner runs at 100 TB: per-table key sketches are maintained
    * once (mergeable across partitions/days, q30-style), and any
    * pairwise join cardinality is answered from bytes. Collisions
    * only add counter mass, so the estimate is one-sided (≥ exact);
    * the exact join count rides along q27-style so the error is part
    * of the checked output. Same fixed Carter–Wegman constants as
    * q37, so the oracle rebuilds both counter matrices and the row
    * inner products in BIGINT SQL, bit-exactly.
    */
  val q38CmsJoinSize = Q(
    "q38_cms_join_size",
    (s, d) => {
      import graft.functions.{VectorFunctions => F}
      def hashed(df: org.apache.spark.sql.DataFrame, key: String) =
        df.select(conv(substring(md5(col(key).cast("string")), 1, 13),
          16, 10).cast("long").as("h"))
      val skA = hashed(orders(s, d), "o_orderkey")
        .agg(F.cms_sketch(col("h"), 1024, 3).as("ska"))
      val skB = hashed(lineitem(s, d), "l_orderkey")
        .agg(F.cms_sketch(col("h"), 1024, 3).as("skb"))
      val exact = orders(s, d).join(lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .agg(cnt.as("exact_join_size"))
      skA.crossJoin(broadcast(skB)).crossJoin(broadcast(exact))
        .select(
          F.cms_inner_product(col("ska"), col("skb"))
            .as("est_join_size"),
          col("exact_join_size"))
        .withColumn("overcount", expr("est_join_size - exact_join_size"))
    },
    sql = Some("""
      WITH ha AS (
        SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                     1, 13)) AS BIGINT) AS h
        FROM orders),
      hb AS (
        SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                     1, 13)) AS BIGINT) AS h
        FROM lineitem),
      js AS (SELECT unnest([0, 1, 2]) AS j),
      ca AS (
        SELECT js.j,
               ((ha.h * CASE js.j WHEN 0 THEN 641 WHEN 1 THEN 1097
                        ELSE 2039 END
                 + CASE js.j WHEN 0 THEN 31 WHEN 1 THEN 277
                   ELSE 1013 END)
                % 2305843009213693951) % 1024 AS b,
               COUNT(*) AS c
        FROM ha CROSS JOIN js GROUP BY 1, 2),
      cb AS (
        SELECT js.j,
               ((hb.h * CASE js.j WHEN 0 THEN 641 WHEN 1 THEN 1097
                        ELSE 2039 END
                 + CASE js.j WHEN 0 THEN 31 WHEN 1 THEN 277
                   ELSE 1013 END)
                % 2305843009213693951) % 1024 AS b,
               COUNT(*) AS c
        FROM hb CROSS JOIN js GROUP BY 1, 2),
      ip AS (
        SELECT ca.j, CAST(SUM(ca.c * cb.c) AS BIGINT) AS s
        FROM ca JOIN cb ON ca.j = cb.j AND ca.b = cb.b
        GROUP BY ca.j),
      est AS (SELECT MIN(s) AS est_join_size FROM ip),
      ex AS (
        SELECT COUNT(*) AS exact_join_size
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      SELECT est.est_join_size, ex.exact_join_size,
             est.est_join_size - ex.exact_join_size AS overcount
      FROM est, ex"""),
    bench = true)

  /** Build-once CMS store for q39: one counter matrix of user activity
    * per (event_type, day), persisted as parquet — the ingest-time
    * half of the frequency-stats lifecycle (q30's pattern for the
    * count-min family).
    */
  private def ensureCmsStore(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"q39_cms_store_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t)) {
      val loc = java.nio.file.Files.createTempDirectory("graft_cms").toString
      Tables.events(s, d)
        .select(col("event_type"),
          expr("ts DIV 86400000000000").as("day"),
          conv(substring(md5(col("user_id").cast("string")), 1, 13),
            16, 10).cast("long").as("h"))
        .groupBy(col("event_type"), col("day"))
        .agg(graft.functions.VectorFunctions.cms_sketch(col("h"), 1024, 3)
          .as("sk"))
        .write.option("path", loc).saveAsTable(t)
    }
    t
  }

  /** Stored-CMS rollup (q39): per-user event frequencies per event
    * type answered by MERGING the persisted per-(type, day) counter
    * matrices — raw events are scanned once at store-build time, every
    * later rollup reads 24 KB of sketch bytes per (type, day). Counter
    * matrices add element-wise, so the merged sketch is byte-identical
    * to sketching the coarse group directly — which is exactly what the
    * oracle recomputes from raw data over a complete probe grid (absent
    * counters are true zeros). Completes the CMS lifecycle: q37 sketch
    * +query, q38 sketch algebra, st25 streaming state, q39 store+merge.
    */
  val q39CmsStored = Q(
    "q39_cms_stored_rollup",
    (s, d) => {
      import graft.functions.{VectorFunctions => F}
      def probeHash(u: String) =
        conv(substring(md5(lit(u)), 1, 13), 16, 10).cast("long")
      val store = s.table(ensureCmsStore(s, d))
      store.groupBy(col("event_type"))
        .agg(F.cms_merge(col("sk")).as("sk"), cnt.as("n_sketches"))
        .select(col("event_type"),
          F.cms_query(col("sk"), probeHash("1")).as("est_events_u1"),
          F.cms_query(col("sk"), probeHash("2")).as("est_events_u2"),
          F.cms_query(col("sk"), probeHash("3")).as("est_events_u3"),
          col("n_sketches"))
        .orderBy(col("event_type"))
    },
    sql = Some("""
      WITH e AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 13))
                 AS BIGINT) AS h
        FROM events),
      js AS (SELECT unnest([0, 1, 2]) AS j),
      bk AS (
        SELECT e.event_type, js.j,
               ((e.h * CASE js.j WHEN 0 THEN 641 WHEN 1 THEN 1097
                       ELSE 2039 END
                 + CASE js.j WHEN 0 THEN 31 WHEN 1 THEN 277
                   ELSE 1013 END)
                % 2305843009213693951) % 1024 AS b,
               COUNT(*) AS c
        FROM e CROSS JOIN js GROUP BY 1, 2, 3),
      ph AS (
        SELECT u, CAST(('0x' || substr(md5(u), 1, 13)) AS BIGINT) AS h
        FROM (SELECT unnest(['1', '2', '3']) AS u)),
      grid AS (
        SELECT t.event_type, ph.u, js.j,
               ((ph.h * CASE js.j WHEN 0 THEN 641 WHEN 1 THEN 1097
                        ELSE 2039 END
                 + CASE js.j WHEN 0 THEN 31 WHEN 1 THEN 277
                   ELSE 1013 END)
                % 2305843009213693951) % 1024 AS b
        FROM (SELECT DISTINCT event_type FROM e) t
        CROSS JOIN ph CROSS JOIN js),
      est AS (
        SELECT g.event_type, g.u, MIN(COALESCE(bk.c, 0)) AS est
        FROM grid g LEFT JOIN bk
          ON bk.event_type = g.event_type AND bk.j = g.j AND bk.b = g.b
        GROUP BY 1, 2),
      ns AS (
        SELECT event_type, COUNT(DISTINCT day) AS n_sketches
        FROM e GROUP BY 1)
      SELECT est.event_type,
             MAX(CASE WHEN u = '1' THEN est END) AS est_events_u1,
             MAX(CASE WHEN u = '2' THEN est END) AS est_events_u2,
             MAX(CASE WHEN u = '3' THEN est END) AS est_events_u3,
             MAX(ns.n_sketches) AS n_sketches
      FROM est JOIN ns ON est.event_type = ns.event_type
      GROUP BY est.event_type
      ORDER BY est.event_type"""))

  /** Build-once statted store pair for q40: the fact/dim tables as the
    * engine's writers would leave them — catalog tables carrying key
    * sketch stats ([[graft.operators.SketchStats.analyzeKey]], one
    * scan each at write time).
    */
  private def ensureSketchStore(s: org.apache.spark.sql.SparkSession,
      d: String): (String, String) = synchronized {
    val hex = Integer.toHexString(d.hashCode)
    val (tf, td) = (s"q40_fact_$hex", s"q40_dim_$hex")
    if (!s.catalog.tableExists(tf)) {
      def loc() = java.nio.file.Files.createTempDirectory("graft_q40")
        .toString
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"))
        .write.option("path", loc()).saveAsTable(tf)
      orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
        .write.option("path", loc()).saveAsTable(td)
      graft.operators.SketchStats.analyzeKey(s, tf, "l_orderkey")
      graft.operators.SketchStats.analyzeKey(s, td, "o_orderkey")
    }
    (tf, td)
  }

  /** Sketch-PLANNED join (q40): the join a cost-based 100 TB planner
    * actually runs — both sides are engine-written stores carrying key
    * sketch stats, and [[graft.plans.SketchJoinRule]] consults those
    * stored bytes to pick the physical strategy (broadcast here: the
    * dim side's recorded size fits the budget) and to pre-screen the
    * estimated output size, without scanning either table at planning
    * time. Results are strategy-invariant, which is exactly what the
    * oracle checks; the strategy FLIP itself (broadcast with stats,
    * shuffle when the budget says no, loud failure on a fanning-out
    * key) is plan-gated in SketchJoinRuleSpec.
    */
  val q40SketchPlannedJoin = Q(
    "q40_sketch_planned_join",
    (s, d) => {
      val (tf, td) = ensureSketchStore(s, d)
      s.table(tf)
        .join(s.table(td), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          cnt.as("n"))
        .orderBy(col("o_orderstatus"))
    },
    sql = Some(s"""
      SELECT o_orderstatus,
             ${sqlDsum("l_quantity")} AS sum_qty,
             ${sqlDsum("l_extendedprice")} AS sum_price,
             COUNT(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    bench = true)

  val all: Seq[Q] = Seq(q12Rollup, q13Union, q14Exists, q15ScalarSubquery,
    q16CaseBuckets, q17MonthlyTrend, q18StringOps, q19ConditionalAgg,
    q20Ntile, q21Cube, q22Intersect, q23Percentiles, q24GroupingSets,
    q25Pivot, q26TopkAgg, q27KmvDistinct, q28Unpivot, q29Histogram,
    q30KmvStored, q31KmvIncremental, q33BkSampleQuantile, q34BkIncremental,
    q35KmvSetOps, q36KmvRolling, q37CmsFreq, q38CmsJoinSize, q39CmsStored,
    q40SketchPlannedJoin)
}
