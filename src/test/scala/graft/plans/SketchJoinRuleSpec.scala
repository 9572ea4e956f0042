package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchStats

/** Gates [[SketchJoinRule]]: the physical join strategy must provably
  * FLIP on the stored sketch stats (broadcast when the stats say a
  * side fits, shuffle when they say it doesn't), with Spark's own
  * broadcast decision disabled so the flip can only come from the
  * rule; missing stats and un-analyzed keys stand down; and the
  * runaway gate fails a fanning-out join at PLANNING time from sketch
  * bytes, except when a filter makes the table-level estimate an
  * upper bound.
  */
class SketchJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private def tmp() = Files.createTempDirectory("graft_sjr").toString

  override def beforeAll(): Unit = {
    // fact: 40k rows over 2k distinct keys; dim: one row per key
    spark.range(40000L)
      .select((col("id") % 2000).as("k"), col("id").as("payload"))
      .write.option("path", tmp()).saveAsTable("sjr_fact")
    spark.range(2000L)
      .select(col("id").as("k"), (col("id") * 7).as("attr"))
      .write.option("path", tmp()).saveAsTable("sjr_dim")
    // a twin dim with NO stats, for the stand-down case
    spark.range(2000L)
      .select(col("id").as("k"), (col("id") * 7).as("attr"))
      .write.option("path", tmp()).saveAsTable("sjr_dim_nostats")
    SketchStats.analyzeKey(spark, "sjr_fact", "k")
    SketchStats.analyzeKey(spark, "sjr_dim", "k")
  }

  override def afterAll(): Unit = {
    Seq("sjr_fact", "sjr_dim", "sjr_dim_nostats",
      "sjr_fact__kstats", "sjr_dim__kstats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }

  private def executed(df: DataFrame): SparkPlan = {
    df.count()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Spark's own broadcast path OFF — any BroadcastHashJoin in these
    * tests can only come from the rule's hint.
    */
  private def noAutoBroadcast[T](extra: (String, String)*)(f: => T): T = {
    val keys = ("spark.sql.autoBroadcastJoinThreshold" -> "-1") +: extra
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def theJoin(): DataFrame =
    spark.table("sjr_fact").join(spark.table("sjr_dim"), Seq("k"))
      .agg(sum(col("payload") * col("attr")).as("s"))

  test("broadcast direction: with Spark's own threshold at -1, the " +
      "stored stats alone flip the join to BroadcastHashJoin") {
    noAutoBroadcast() {
      val plan = executed(theJoin())
      assert(plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"expected the rule's hint to broadcast the dim side:\n$plan")
    }
  }

  test("shuffle direction: a budget below both stored sizes means no " +
      "hint — the same join sort-merges") {
    noAutoBroadcast("spark.graft.sketchJoin.broadcastBytes" -> "1") {
      val plan = executed(theJoin())
      assert(!plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"budget=1 byte must not broadcast:\n$plan")
      assert(plan.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"expected a shuffle join:\n$plan")
    }
  }

  test("stand-down: a side without stats leaves the plan to Spark") {
    noAutoBroadcast() {
      val j = spark.table("sjr_fact")
        .join(spark.table("sjr_dim_nostats"), Seq("k"))
        .agg(count(lit(1)).as("n"))
      val plan = executed(j)
      assert(!plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"no stats must mean no hint:\n$plan")
    }
  }

  test("stand-down: a join on a NON-analyzed column gets no hint") {
    noAutoBroadcast() {
      val j = spark.table("sjr_fact").as("f")
        .join(spark.table("sjr_dim").as("d"),
          col("f.payload") === col("d.attr"))
        .agg(count(lit(1)).as("n"))
      val plan = executed(j)
      assert(!plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"the sketch says nothing about payload=attr joins:\n$plan")
    }
  }

  test("outer joins hint only the non-preserved side: LEFT JOIN " +
      "broadcasts the dim on the right; with the dim on the LEFT of a " +
      "LEFT JOIN the rule must stand down (the preserved side can't " +
      "build-broadcast)") {
    // a budget that admits the dim but NOT the fact — at the default
    // 10 MB both fit and the rule could legitimately broadcast either
    val dimBytes = SketchStats.read(spark, "sjr_dim").get.sizeBytes
    val factBytes = SketchStats.read(spark, "sjr_fact").get.sizeBytes
    assert(dimBytes < factBytes)
    noAutoBroadcast(
      "spark.graft.sketchJoin.broadcastBytes" -> dimBytes.toString) {
      val leftOuter = spark.table("sjr_fact")
        .join(spark.table("sjr_dim"), Seq("k"), "left")
        .agg(count(lit(1)).as("n"))
      assert(executed(leftOuter)
        .exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "LEFT JOIN with the small side on the right must broadcast it")
      val dimPreserved = spark.table("sjr_dim")
        .join(spark.table("sjr_fact"), Seq("k"), "left")
        .agg(count(lit(1)).as("n"))
      val plan = executed(dimPreserved)
      assert(!plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"only the fact side is hintable here and it exceeds the " +
          s"budget:\n$plan")
      // the dedup keep-list shape: a LEFT SEMI probe of the fact
      // against the dim broadcasts the dim (build side)
      val semi = spark.table("sjr_fact")
        .join(spark.table("sjr_dim"), Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n"))
      val semiPlan = executed(semi)
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      assert(semiPlan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"LEFT SEMI must broadcast the statted right side:\n$semiPlan")
    }
  }

  test("user hints win: an explicit MERGE hint disables the rule") {
    noAutoBroadcast() {
      val j = spark.table("sjr_fact")
        .join(spark.table("sjr_dim").hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("n"))
      val plan = executed(j)
      assert(!plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"explicit user strategy must not be overridden:\n$plan")
    }
  }

  test("runaway gate: the sketch estimate fails a fanning-out join at " +
      "planning, names the estimate, and a filtered side downgrades " +
      "the gate to a warning") {
    noAutoBroadcast("spark.graft.sketchJoin.failRows" -> "10000") {
      // fact ⋈ dim on k produces 40k rows — over the 10k limit
      val ex = intercept[AnalysisException] { theJoin().collect() }
      assert(ex.getMessage.contains("GRAFT_SKETCH_JOIN") &&
        ex.getMessage.contains("exceeds"),
        s"unexpected message: ${ex.getMessage}")
      // the estimate is one-sided: reported ≥ exact (40000)
      val est = "output (\\d+) rows".r.findFirstMatchIn(ex.getMessage)
        .map(_.group(1).toLong)
      assert(est.exists(_ >= 40000L), s"estimate missing or below " +
        s"exact in: ${ex.getMessage}")
      // a filter on the fact side → table-level sketch is an upper
      // bound → must run, not throw
      val filtered = spark.table("sjr_fact").filter(col("k") < 10)
        .join(spark.table("sjr_dim"), Seq("k"))
        .agg(count(lit(1)).as("n"))
      assert(filtered.collect().head.getLong(0) === 200L)
    }
  }

  test("delta-only stats maintenance: applyDelta(added/deleted) is " +
      "BYTE-equal to a from-scratch analyzeKey rescan, and subtracting " +
      "keys the store never held fails loudly") {
    spark.range(1000L).select(col("id").as("k"))
      .write.option("path", tmp()).saveAsTable("sjr_delta")
    val s1 = SketchStats.analyzeKey(spark, "sjr_delta", "k")
    // append a batch, maintain stats from the delta alone
    val batch = spark.range(1000L, 1200L).select(col("id").as("k"))
    batch.write.mode("append").saveAsTable("sjr_delta")
    val incr = SketchStats.applyDelta(spark, "sjr_delta",
      added = Some(batch), deleted = None)
    val full = SketchStats.analyzeKey(spark, "sjr_delta", "k")
    assert(incr.nRows === full.nRows)
    assert(java.util.Arrays.equals(incr.cms, full.cms),
      "incremental sketch must be byte-equal to the rescan")
    // delete the same batch from the stats: back to the original
    val back = SketchStats.applyDelta(spark, "sjr_delta",
      added = None, deleted = Some(batch))
    assert(back.nRows === s1.nRows)
    assert(java.util.Arrays.equals(back.cms, s1.cms),
      "add-then-delete must restore the original sketch exactly")
    // a replayed batch id is a NO-OP — the at-least-once foreachBatch
    // guard: applying the same delta twice under one id leaves the
    // stats bit-identical
    val once = SketchStats.applyDelta(spark, "sjr_delta",
      added = Some(batch), deleted = None, batchId = Some(7L))
    val replay = SketchStats.applyDelta(spark, "sjr_delta",
      added = Some(batch), deleted = None, batchId = Some(7L))
    assert(replay.nRows === once.nRows &&
      java.util.Arrays.equals(replay.cms, once.cms) &&
      replay.lastBatch === 7L,
      "replayed batch id must not double-apply")
    SketchStats.applyDelta(spark, "sjr_delta", added = None,
      deleted = Some(batch), batchId = Some(8L)): Unit
    // subtracting keys never added drives a counter negative — the
    // loud-failure contract (deterministic: fixed md5 hashing)
    val ex = intercept[Exception] {
      SketchStats.applyDelta(spark, "sjr_delta", added = None,
        deleted = Some(spark.range(500000L, 500200L)
          .select(col("id").as("k"))))
    }
    assert(ex.getMessage.contains("negative"), ex.getMessage)
    Seq("sjr_delta", "sjr_delta__kstats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("the estimate itself: one-sided and within the CMS error band") {
    val f = SketchStats.read(spark, "sjr_fact").get
    val d = SketchStats.read(spark, "sjr_dim").get
    assert(f.nRows === 40000L && d.nRows === 2000L)
    val est = SketchStats.estimateJoinRows(f, d)
    val exact = 40000L // every fact row matches exactly one dim row
    assert(est >= exact, s"CMS inner product must be one-sided: $est")
    // error bound: e/w · |A|·|B| (Cormode & Muthukrishnan §4.2)
    val bound = exact +
      math.ceil(math.E / 1024.0 * 40000.0 * 2000.0).toLong
    assert(est <= bound, s"est=$est exceeds the ε·|A||B| band $bound")
  }
}
