package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._
import Tables._

/** Relational analytics over the TPC-H-ish synthetic tables.
  *
  * Design rules (scale-first):
  *  - filters/projections are plain `Column` predicates so Catalyst pushes
  *    them into the parquet scan (verified via .explain PushedFilters);
  *  - dimension tables (region/nation/supplier/customer at low SF) are
  *    broadcast explicitly where they are guaranteed small;
  *  - all money aggregates use the DECIMAL-routed [[Q.dsum]] so results are
  *    independent of partition count / aggregation order (100 TB safe AND
  *    oracle-exact);
  *  - every query ends in a deterministic total ORDER BY for the oracle
  *    hash compare.
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: scan + hash-aggregate, map-side
    * partial agg, no shuffle besides the final 6-row exchange.
    */
  val q1PricingSummary = Q(
    "q1_pricing_summary",
    (s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          cnt.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    sql = Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlDsum("l_quantity")} AS sum_qty,
             ${sqlDsum("l_extendedprice")} AS sum_base_price,
             ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** Selective filter + narrow projection — exercises parquet predicate
    * pushdown and column pruning (ReadSchema is 6 of 11 columns).
    */
  val q2Filter = Q(
    "q2_filter_pushdown",
    (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    sql = Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_returnflag
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
        AND l_discount >= 0.05 AND l_quantity < 10
      ORDER BY l_orderkey, l_linenumber"""))

  /** TPC-H Q6-style: fully-pushed-down scan + single scalar aggregate —
    * the minimal-shuffle shape (partial agg per partition, 1-row merge).
    */
  val q3Revenue = Q(
    "q3_scan_agg_revenue",
    (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.09) && col("l_quantity") < 25)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          cnt.as("n_rows")),
    sql = Some(s"""
      SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
        AND l_discount BETWEEN 0.03 AND 0.09 AND l_quantity < 25"""),
    bench = true)

  /** 3-way join fact⋈dim⋈dim with explicit broadcast of the dimension
    * side — at 100 TB lineitem shuffles once on l_orderkey only if
    * orders is too big to broadcast; customer/segment rollup stays
    * map-side.
    */
  val q4JoinAgg = Q(
    "q4_join_agg_segment",
    (s, d) => {
      val li = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          cnt.as("n_lineitems"))
        .orderBy(col("c_mktsegment"))
    },
    sql = Some(s"""
      SELECT c_mktsegment,
             ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
             COUNT(*) AS n_lineitems
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    bench = true)

  /** Top-k: global sort with LIMIT — Spark plans TakeOrderedAndProject
    * (no full sort materialization; k rows per partition then merge).
    */
  val q5TopK = Q(
    "q5_topk_orders",
    (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    sql = Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10"""))

  /** 4-way dimension chain with broadcast joins: region⋈nation⋈customer
    * rollup. All dims broadcast → zero shuffles except the tiny final agg.
    */
  val q6RegionRollup = Q(
    "q6_broadcast_dims",
    (s, d) => {
      val r = region(s, d)
      val n = nation(s, d)
      val c = customer(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(cnt.as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"))
    },
    sql = Some(s"""
      SELECT r_name, COUNT(*) AS n_customers,
             ${sqlDsum("c_acctbal")} AS total_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name"""))

  /** Set-op semantics of the reference's completeness differ
    * (`OsPoolS3Lister.removeAll` → EXCEPT; SURVEY §2.4 S14): customers
    * that HAVE orders (left-semi) but none of them urgent (left-anti)
    * — the "present in A, absent from B" shape the differ runs, on a
    * pair of sets guaranteed non-empty at every SF.
    */
  val q7AntiJoin = Q(
    "q7_semi_anti_except",
    (s, d) => {
      val c = customer(s, d)
      val o = orders(s, d).select(col("o_custkey"))
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === o("o_custkey"), "left_semi")
        .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    sql = Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
        AND c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** Window function: latest order per customer via row_number over a
    * deterministic (tie-broken) ordering.
    */
  val q8Window = Q(
    "q8_window_latest_order",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    sql = Some("""
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) t
      WHERE rn = 1
      ORDER BY o_custkey"""))

  /** Multi-distinct aggregate (Spark expands to two-phase agg). */
  val q9Distinct = Q(
    "q9_count_distinct",
    (s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders")),
    sql = Some("""
      SELECT COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem"""))

  /** Running (cumulative) sum window over a small partition — frame-based
    * window agg with decimal-exact accumulation.
    */
  val q10RunningSum = Q(
    "q10_window_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
            .cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    sql = Some("""
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey"""))

  /** Grouped rollup on the part dimension: multi-column groupBy with
    * having-style post-filter.
    */
  val q11PartStats = Q(
    "q11_part_brand_stats",
    (s, d) =>
      part(s, d)
        .groupBy(col("p_brand"))
        .agg(cnt.as("n_parts"),
          dsum(col("p_retailprice")).as("total_price"),
          max(col("p_size")).as("max_size"),
          min(col("p_size")).as("min_size"))
        .filter(col("n_parts") > 1)
        .orderBy(col("p_brand")),
    sql = Some(s"""
      SELECT p_brand, COUNT(*) AS n_parts,
             ${sqlDsum("p_retailprice")} AS total_price,
             MAX(p_size) AS max_size, MIN(p_size) AS min_size
      FROM part
      GROUP BY p_brand
      HAVING COUNT(*) > 1
      ORDER BY p_brand"""))

  val all: Seq[Q] = Seq(q1PricingSummary, q2Filter, q3Revenue, q4JoinAgg,
    q5TopK, q6RegionRollup, q7AntiJoin, q8Window, q9Distinct, q10RunningSum,
    q11PartStats)
}
