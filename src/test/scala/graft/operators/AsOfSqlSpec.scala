package graft.operators

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinExec, AsOfJoinOps, AsOfSqlRewrite, BroadcastAsOfJoinExec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-text surface of the as-of join: the dialect rewriter in
  * isolation (pure string → string, no Spark session), then the full
  * `spark.sql("... ASOF JOIN ...")` path — plan landing on the same
  * AsOfJoinExec/BroadcastAsOfJoinExec as the DataFrame API, semantics
  * equal to AsOfJoinOps on the same fixtures, and every documented
  * unsupported shape failing loudly instead of degrading to plain-join
  * semantics.
  */
class AsOfSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- rewriter in isolation ----

  /** whitespace-normalized view: splices keep offsets, not spacing */
  private def n(s: String): String = s.replaceAll("\\s+", " ").trim

  test("ASOF LEFT JOIN rewrites to LEFT JOIN with marked condition") {
    val in = "SELECT * FROM a ASOF LEFT JOIN b ON a.k = b.k " +
      "AND a.t >= b.t WHERE a.x = 1"
    val out = AsOfSqlRewrite(in)
    assert(n(out) === "SELECT * FROM a LEFT JOIN b ON _graft_asof(" +
      " a.k = b.k AND a.t >= b.t )WHERE a.x = 1")
  }

  test("plain ASOF JOIN becomes LEFT JOIN with the inner marker") {
    val out = AsOfSqlRewrite(
      "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t")
    assert(n(out) === "SELECT * FROM a LEFT JOIN b ON _graft_asof_inner(" +
      " a.k = b.k AND a.t >= b.t)")
  }

  test("ASOF LEFT OUTER JOIN is accepted") {
    val out = AsOfSqlRewrite(
      "SELECT * FROM a ASOF LEFT OUTER JOIN b ON a.k = b.k AND a.t >= b.t")
    assert(out.contains("LEFT OUTER JOIN b ON _graft_asof("))
    assert(!out.toUpperCase.contains("ASOF LEFT"))
  }

  test("ASOF inside string literals and comments is never rewritten") {
    val in = "SELECT 'x ASOF JOIN y' AS s, b.c -- ASOF JOIN in comment\n" +
      "FROM /* ASOF LEFT JOIN */ t b"
    assert(AsOfSqlRewrite(in) === in)
  }

  test("an identifier merely named asof is untouched") {
    val in = "SELECT asof FROM t WHERE asof > 3"
    assert(AsOfSqlRewrite(in) === in)
  }

  test("two ASOF joins in one statement both rewrite") {
    val out = AsOfSqlRewrite(
      "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t " +
        "ASOF LEFT JOIN c ON a.k = c.k AND a.t >= c.t ORDER BY 1")
    assert(n(out).contains("_graft_asof_inner( a.k = b.k AND a.t >= b.t )"))
    assert(n(out).contains("_graft_asof( a.k = c.k AND a.t >= c.t )ORDER"))
    assert(!out.toUpperCase.contains("ASOF JOIN"))
  }

  test("the ON condition of a parenthesized-subquery right side is " +
      "found at the right depth") {
    val out = AsOfSqlRewrite(
      "SELECT * FROM a ASOF LEFT JOIN (SELECT k, t FROM raw " +
        "WHERE tag = 'on') c ON a.k = c.k AND a.t >= c.t LIMIT 5")
    assert(n(out).contains("c ON _graft_asof( a.k = c.k AND a.t >= c.t )"))
    assert(out.endsWith(")LIMIT 5"))
  }

  test("ASOF ... USING and ASOF RIGHT JOIN are rejected at rewrite") {
    val e1 = intercept[AnalysisException](AsOfSqlRewrite(
      "SELECT * FROM a ASOF JOIN b USING (k)"))
    assert(e1.getMessage.contains("USING"))
    val e2 = intercept[AnalysisException](AsOfSqlRewrite(
      "SELECT * FROM a ASOF RIGHT JOIN b ON a.k = b.k AND a.t >= b.t"))
    assert(e2.getMessage.contains("ASOF RIGHT"))
  }

  // ---- end-to-end through spark.sql ----

  private def mkViews(): Unit = {
    import spark.implicits._
    Seq((1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-c"),
      (2L, 100L, "l-d"), (3L, 7L, "l-e")).toDF("k", "t", "ltag")
      .createOrReplaceTempView("asof_l")
    Seq((1L, 8L, "r1"), (1L, 10L, "r2"), (1L, 15L, "r3"),
      (2L, 90L, "r4"), (4L, 1L, "r5")).toDF("rk", "rt", "rtag")
      .createOrReplaceTempView("asof_r")
  }

  private def collectTags(df: DataFrame): Map[String, Option[String]] =
    df.collect()
      .map(r => r.getAs[String]("ltag") ->
        Option(r.getAs[String]("rtag"))).toMap

  private def executed(df: DataFrame): SparkPlan = {
    val p = df.queryExecution.executedPlan
    p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(p)
  }

  test("SQL backward as-of (left outer) equals the DataFrame API and " +
      "plans the merge operator") {
    mkViews()
    // disable auto-broadcast so the strategy's size rule can't pick the
    // broadcast plan for the tiny fixture — this test pins the MERGE
    // exec (planning is lazy: the conf must hold until executedPlan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val sqlDf = spark.sql("""
      SELECT l.ltag, r.rtag
      FROM asof_l l ASOF LEFT JOIN asof_r r
        ON l.k = r.rk AND l.t >= r.rt""")
    try {
      assert(executed(sqlDf).exists(_.isInstanceOf[AsOfJoinExec]),
        s"expected AsOfJoinExec:\n${executed(sqlDf)}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val expected = collectTags(AsOfJoinOps.asofJoinBackward(
      spark.table("asof_l"), spark.table("asof_r"),
      Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .select(col("ltag"), col("rtag")))
    assert(collectTags(sqlDf) === expected)
    assert(collectTags(sqlDf) === Map(
      "l-a" -> Some("r2"), "l-b" -> Some("r3"), "l-c" -> None,
      "l-d" -> Some("r4"), "l-e" -> None))
  }

  test("SQL inner ASOF JOIN drops unmatched left rows") {
    mkViews()
    val got = collectTags(spark.sql("""
      SELECT l.ltag, r.rtag
      FROM asof_l l ASOF JOIN asof_r r
        ON l.k = r.rk AND l.t >= r.rt"""))
    assert(got === Map(
      "l-a" -> Some("r2"), "l-b" -> Some("r3"), "l-d" -> Some("r4")))
  }

  test("SQL forward as-of via l.t <= r.rt (either operand order)") {
    mkViews()
    val got = collectTags(spark.sql("""
      SELECT l.ltag, r.rtag
      FROM asof_l l ASOF LEFT JOIN asof_r r
        ON l.k = r.rk AND r.rt >= l.t"""))
    // earliest right at-or-after each left time
    assert(got === Map(
      "l-a" -> Some("r2"), "l-b" -> None, "l-c" -> Some("r1"),
      "l-d" -> None, "l-e" -> None))
  }

  test("a BROADCAST hint on the right side pins the broadcast plan") {
    mkViews()
    val df = spark.sql("""
      SELECT /*+ BROADCAST(r) */ l.ltag, r.rtag
      FROM asof_l l ASOF LEFT JOIN asof_r r
        ON l.k = r.rk AND l.t >= r.rt""")
    assert(executed(df).exists(_.isInstanceOf[BroadcastAsOfJoinExec]),
      s"expected BroadcastAsOfJoinExec:\n${executed(df)}")
    assert(collectTags(df)("l-a") === Some("r2"))
  }

  test("strict bounds, missing equi-key, and missing time bound all " +
      "fail loudly in analysis") {
    mkViews()
    val strict = intercept[AnalysisException](spark.sql(
      """SELECT * FROM asof_l l ASOF JOIN asof_r r
         ON l.k = r.rk AND l.t > r.rt""").queryExecution.analyzed)
    assert(strict.getMessage.contains("strict"))
    val noKey = intercept[AnalysisException](spark.sql(
      """SELECT * FROM asof_l l ASOF JOIN asof_r r
         ON l.t >= r.rt""").queryExecution.analyzed)
    assert(noKey.getMessage.contains("equi-key"))
    val noTime = intercept[AnalysisException](spark.sql(
      """SELECT * FROM asof_l l ASOF JOIN asof_r r
         ON l.k = r.rk""").queryExecution.analyzed)
    assert(noTime.getMessage.contains("time inequality"))
  }
}
