package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates [[InferTimeScanBound]]: epoch-arithmetic predicates over the
  * normalized events `ts` must yield a bare raw-column bound in the
  * parquet scan's PushedFilters, results must be identical with the
  * rule disabled, and the inversion arithmetic must match the JVM's
  * actual truncation semantics on the full sign range.
  */
class TimeBoundRuleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  // ---- inversion arithmetic vs ground truth (exhaustive small grid) --

  test("divLeBound/divGeBound are exact for truncation-toward-zero") {
    for (k <- 1 to 7; c <- -30 to 30; g <- -120 to 120) {
      val trunc = g / k // JVM division truncates toward zero, like DIV
      assert((trunc <= c) == (g <= InferTimeScanBound.divLeBound(c, k)),
        s"LE g=$g k=$k c=$c trunc=$trunc bound=${InferTimeScanBound.divLeBound(c, k)}")
      assert((trunc >= c) == (g >= InferTimeScanBound.divGeBound(c, k)),
        s"GE g=$g k=$k c=$c trunc=$trunc bound=${InferTimeScanBound.divGeBound(c, k)}")
    }
  }

  test("floorDiv/ceilDiv invert multiplication exactly") {
    for (k <- 1 to 7; c <- -50 to 50; g <- -30 to 30) {
      assert((g * k <= c) == (g <= InferTimeScanBound.floorDiv(c, k)),
        s"LE g=$g k=$k c=$c")
      assert((g * k >= c) == (g >= InferTimeScanBound.ceilDiv(c, k)),
        s"GE g=$g k=$k c=$c")
    }
  }

  test("Spark's DIV truncates toward zero (the semantics the rule inverts)") {
    import spark.implicits._
    val rows = Seq(-7L, -6L, -5L, -1L, 0L, 1L, 5L, 6L, 7L).toDF("g")
      .selectExpr("g", "g DIV 2 AS d").as[(Long, Long)].collect().toMap
    assert(rows(-7L) == -3L && rows(-6L) == -3L && rows(-5L) == -2L)
    assert(rows(7L) == 3L && rows(6L) == 3L && rows(5L) == 2L)
  }

  // ---- end-to-end: normalized events store, NTZ vintage -------------

  /** A tiny events store in the r9+ vintage: parquet timestamp[us]
    * (written as NTZ), hourly spread so a range predicate has row
    * groups to prune.
    */
  private lazy val store: String = {
    val dir = Files.createTempDirectory("ts_bound").resolve("store").toString
    import spark.implicits._
    (0 until 500).map { i =>
      val us = 1704067200000000L + i * 360000000L // 2024-01-01 + i*6min
      (i.toLong, us, s"t${i % 4}")
    }.toDF("event_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .repartition(8)
      .write.parquet(dir)
    dir
  }

  private def events: DataFrame =
    graft.queries.Tables.normalizeEventTs(spark.read.parquet(store))

  private def pushedFilters(df: DataFrame): String = {
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
      .map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
  }

  private val CutUs = 1704088800000000L // 2024-01-01T06:00 UTC

  test("a ts_us range predicate reaches the parquet scan as a bare " +
      "NTZ bound (row-group stats pruning at scale)") {
    val q = events
      .withColumn("ts_us", expr("ts DIV 1000"))
      .filter(col("ts_us") < CutUs)
    val pushed = pushedFilters(q)
    assert(pushed.contains("LessThanOrEqual(ts,"), s"pushed: $pushed")
  }

  test("a two-sided slice predicate on normalized ts pushes both bounds") {
    val lo = 1704070000000000000L // ns
    val hi = 1704080000000000000L
    val q = events.filter(col("ts") >= lo && col("ts") < hi)
    val pushed = pushedFilters(q)
    assert(pushed.contains("GreaterThanOrEqual(ts,"), s"pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,"), s"pushed: $pushed")
  }

  test("results are byte-identical with the rule disabled") {
    def run(): Seq[Long] = events
      .withColumn("ts_us", expr("ts DIV 1000"))
      .filter(col("ts_us") < CutUs)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val withRule = run()
    spark.conf.set(InferTimeScanBound.EnabledConf, "false")
    val without = try run()
    finally spark.conf.unset(InferTimeScanBound.EnabledConf)
    assert(withRule == without)
    assert(withRule.nonEmpty && withRule.size < 500) // predicate selective
  }

  test("rule is exact on adversarial boundary literals (off-by-one " +
      "sweep around a bucket edge, rule on vs off)") {
    val base = 1704067200000000L
    for (delta <- -2L to 2L) {
      val cut = base + 360000000L * 3 + delta // near event 3's micros
      def ids(enabled: Boolean): Seq[Long] = {
        if (!enabled) spark.conf.set(InferTimeScanBound.EnabledConf, "false")
        try events.withColumn("ts_us", expr("ts DIV 1000"))
          .filter(col("ts_us") <= cut)
          .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        finally if (!enabled)
          spark.conf.unset(InferTimeScanBound.EnabledConf)
      }
      assert(ids(true) == ids(false), s"delta=$delta")
    }
  }

  test("LongType vintage (pre-r9 nanos) also gains a bare scan bound") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts_bound").resolve("longstore").toString
    (0 until 100).map(i => (i.toLong, 1704067200000000000L + i * 1000000000L))
      .toDF("event_id", "ts").repartition(4).write.parquet(dir)
    val q = spark.read.parquet(dir)
      .withColumn("ts_us", expr("ts DIV 1000"))
      .filter(col("ts_us") < 1704067250000000L)
    val pushed = pushedFilters(q)
    assert(pushed.contains("LessThanOrEqual(ts,"), s"pushed: $pushed")
    assert(q.count() == 50)
  }

  test("non-UTC cast is NOT inverted (DST makes wall time non-injective)") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LocalRelation}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = AttributeReference("t", TimestampNTZType)()
    val rel = LocalRelation(ntz)
    def boundsAdded(zone: String): Boolean = {
      val chain = org.apache.spark.sql.catalyst.expressions.Multiply(
        org.apache.spark.sql.catalyst.expressions.UnixMicros(
          Cast(ntz, TimestampType, Some(zone))),
        Literal(1000L))
      val f = LFilter(
        org.apache.spark.sql.catalyst.expressions.LessThan(
          chain, Literal(42L)), rel)
      InferTimeScanBound(f) match {
        case LFilter(cond, _) =>
          cond.toString.contains("t#" + ntz.exprId.id + " <=") ||
            cond.references.size != f.condition.references.size ||
            cond != f.condition
        case _ => false
      }
    }
    assert(boundsAdded("UTC"))
    assert(!boundsAdded("America/New_York"))
  }
}
