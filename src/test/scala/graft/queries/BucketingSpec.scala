package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the 100 TB co-located-join strategy. Writing both join
  * sides bucketed by the join key lets Spark plan a SortMergeJoin with
  * ZERO shuffle exchanges — the property this spec locks in (the local
  * warehouse stands in for the production lakehouse tables).
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft_wh").toString

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed join of lineitem and orders plans with no shuffle") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    joined.count()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joinShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      // the final tiny groupBy exchange is expected; the JOIN itself
      // must read bucketed data with no exchange below the join node
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, s"expected SortMergeJoin in:\n$plan")
    val shufflesBelowJoin = joinNode.get.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n$plan")
    // sanity: same result as the unbucketed join
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(spark.table("li_bucketed").join(spark.table("o_bucketed"),
      col("l_orderkey") === col("o_orderkey")).count() === expected)
  }
}
