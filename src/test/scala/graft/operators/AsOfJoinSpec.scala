package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinExec, AsOfJoinOps}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator as-of join: correctness on hand-checked
  * fixtures (matches, misses, tolerance, null keys, duplicate-time
  * tie-break), partition-count invariance, and the physical-plan
  * contract (AsOfJoinExec present; no window, no extra exchanges).
  */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtures: (DataFrame, DataFrame) = {
    import spark.implicits._
    // left: observations at times; right: reference quotes
    val left = Seq(
      (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-c"),
      (2L, 100L, "l-d"), (3L, 7L, "l-e")).toDF("k", "t", "ltag")
    val right = Seq(
      (1L, 8L, "r1"), (1L, 10L, "r2"), (1L, 15L, "r3"),
      (2L, 90L, "r4"), (4L, 1L, "r5")).toDF("rk", "rt", "rtag")
    (left, right)
  }

  // semantic tests drive the shuffle-MERGE plan (broadcast=false); the
  // broadcast plan is proven equal in its own test below
  private def run(left: DataFrame, right: DataFrame,
      tol: Option[Long] = None): Map[(Long, Long), Option[String]] =
    AsOfJoinOps.asofJoinBackward(left, right,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"),
        rightTieBreak = Seq(col("rtag")), tolerance = tol,
        broadcast = Some(false))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.getAs[String]("rtag"))).toMap

  test("backward as-of: latest right at-or-before each left time") {
    val (l, r) = fixtures
    val got = run(l, r)
    assert(got === Map(
      (1L, 10L) -> Some("r2"), // exact-time match counts (<=)
      (1L, 20L) -> Some("r3"),
      (1L, 5L) -> None,        // earliest left precedes all right
      (2L, 100L) -> Some("r4"),
      (3L, 7L) -> None))       // key absent on right
  }

  test("tolerance nulls out matches farther than the bound") {
    val (l, r) = fixtures
    val got = run(l, r, tol = Some(5L))
    assert(got((1L, 10L)) === Some("r2")) // gap 0
    assert(got((1L, 20L)) === Some("r3")) // gap 5 == tol: inclusive
    assert(got((2L, 100L)) === None)      // gap 10 > tol
  }

  test("null keys and null times never match but left rows survive") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "ltag")
    val r = Seq((Some(1L), Some(5L), "r1"), (None, Some(1L), "rnull"),
      (Some(1L), None, "rtnull")).toDF("rk", "rt", "rtag")
    val got = AsOfJoinOps.asofJoinBackward(l, r,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .select(col("ltag"), col("rtag")).collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(got === Map("a" -> Some("r1"), "b" -> None, "c" -> None))
  }

  test("duplicate right times: last in tie-break order wins") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "ltag")
    val r = Seq((1L, 10L, "dup-a"), (1L, 10L, "dup-b"), (1L, 10L, "dup-c"))
      .toDF("rk", "rt", "rtag")
    val got = run(l, r)
    assert(got((1L, 10L)) === Some("dup-c"))
  }

  test("result is invariant to input partitioning") {
    val (l, r) = fixtures
    val base = run(l, r)
    val scrambled = run(
      l.repartition(7, col("ltag")), r.repartition(3, col("rtag")))
    assert(scrambled === base)
    val single = run(l.coalesce(1), r.coalesce(1))
    assert(single === base)
  }

  test("empty right side: all left rows survive unmatched") {
    val (l, r) = fixtures
    val got = run(l, r.filter(col("rk") < 0))
    assert(got.size === 5 && got.values.forall(_.isEmpty))
  }

  private def runFwd(left: DataFrame, right: DataFrame,
      tol: Option[Long] = None): Map[(Long, Long), Option[String]] =
    AsOfJoinOps.asofJoinForward(left, right,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"),
        rightTieBreak = Seq(col("rtag")), tolerance = tol,
        broadcast = Some(false))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.getAs[String]("rtag"))).toMap

  test("forward as-of: earliest right at-or-after each left time") {
    val (l, r) = fixtures
    val got = runFwd(l, r)
    assert(got === Map(
      (1L, 10L) -> Some("r2"), // exact-time match counts (>=)
      (1L, 20L) -> None,       // nothing after 15
      (1L, 5L) -> Some("r1"),
      (2L, 100L) -> None,      // 90 precedes the left time
      (3L, 7L) -> None))
  }

  test("forward tolerance and duplicate-time ties (smallest wins)") {
    import spark.implicits._
    val (l, r) = fixtures
    assert(runFwd(l, r, tol = Some(2L)) === Map(
      (1L, 10L) -> Some("r2"), // gap 0
      (1L, 20L) -> None,
      (1L, 5L) -> None,        // gap 3 > tol
      (2L, 100L) -> None,
      (3L, 7L) -> None))
    val dup = Seq((1L, 10L, "dup-a"), (1L, 10L, "dup-b"))
      .toDF("rk", "rt", "rtag")
    val one = Seq((1L, 9L, "x")).toDF("k", "t", "ltag")
    assert(runFwd(one, dup) === Map((1L, 9L) -> Some("dup-a")))
  }

  test("broadcast plan: identical results to the merge plan on every " +
      "fixture (both directions, with and without tolerance)") {
    val (l, r) = fixtures
    def both(f: Option[Boolean] => Map[(Long, Long), Option[String]])
        : Unit = assert(f(Some(true)) === f(Some(false)))
    both(b => AsOfJoinOps.asofJoinBackward(l, r, Seq(col("k")),
      Seq(col("rk")), col("t"), col("rt"), Seq(col("rtag")), None, b)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        Option(x.getAs[String]("rtag"))).toMap)
    both(b => AsOfJoinOps.asofJoinBackward(l, r, Seq(col("k")),
      Seq(col("rk")), col("t"), col("rt"), Seq(col("rtag")), Some(5L), b)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        Option(x.getAs[String]("rtag"))).toMap)
    both(b => AsOfJoinOps.asofJoinForward(l, r, Seq(col("k")),
      Seq(col("rk")), col("t"), col("rt"), Seq(col("rtag")), None, b)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        Option(x.getAs[String]("rtag"))).toMap)
  }

  test("broadcast plan contract: BroadcastAsOfJoinExec, broadcast " +
      "exchange on the right, ZERO shuffle and ZERO sort on the probe") {
    val (l, r) = fixtures
    val df = AsOfJoinOps.asofJoinBackward(l, r,
      Seq(col("k")), Seq(col("rk")), col("t"), col("rt"),
      broadcast = Some(true))
    df.count()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = finalPlan(df.queryExecution.executedPlan)
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    import org.apache.spark.sql.graft.BroadcastAsOfJoinExec
    assert(plan.collect { case e: BroadcastAsOfJoinExec => e }.nonEmpty,
      s"expected the broadcast operator:\n$plan")
    assert(plan.collect { case e: BroadcastExchangeLike => e }.nonEmpty,
      s"right side must broadcast:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"the probe side must not shuffle:\n$plan")
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"the probe side must not sort:\n$plan")
  }

  test("strategy auto-picks broadcast for a small right side and " +
      "merge when broadcasting is disabled") {
    val (l, r) = fixtures
    import org.apache.spark.sql.graft.BroadcastAsOfJoinExec
    def finalPlan(df: DataFrame): SparkPlan = {
      df.count()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
    }
    val auto = AsOfJoinOps.asofJoinBackward(l, r,
      Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
    assert(finalPlan(auto).collect {
      case e: BroadcastAsOfJoinExec => e }.nonEmpty,
      "tiny right side should auto-broadcast")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merge = AsOfJoinOps.asofJoinBackward(l, r,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      assert(finalPlan(merge).collect {
        case e: AsOfJoinExec => e }.nonEmpty,
        "threshold -1 must fall back to the shuffle-merge plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plan contract: AsOfJoinExec, no window, one exchange per side") {
    val (l, r) = fixtures
    val df = AsOfJoinOps.asofJoinBackward(l, r,
      Seq(col("k")), Seq(col("rk")), col("t"), col("rt"),
      broadcast = Some(false))
    df.count()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = finalPlan(df.queryExecution.executedPlan)
    assert(plan.collect { case e: AsOfJoinExec => e }.nonEmpty,
      s"expected AsOfJoinExec in\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "as-of must not fall back to a window formulation")
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 2,
      s"expected at most one exchange per side, got ${exchanges.size}")
  }
}
