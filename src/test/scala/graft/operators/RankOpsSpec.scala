package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[RankOps.withGlobalRank]] must be bit-equal to
  * `ROW_NUMBER() OVER (ORDER BY keys)` for any total order, any input
  * partitioning, and any `parts` — including parts > distinct keys
  * (empty range partitions) and heavy duplicate keys (tie-break
  * column carries the order).
  */
class RankOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("withGlobalRank == ROW_NUMBER over a total order, across " +
      "partitionings and parts settings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate-heavy scores force the doc_id tie-break to matter
    val rows = (1L to 997L).map(i => (i, rnd.nextInt(50).toDouble / 7.0))
    for (inputParts <- Seq(1, 3, 8); parts <- Seq(2, 5, 64)) {
      val df = rows.toDF("id", "score").repartition(inputParts)
      val got = RankOps.withGlobalRank(df,
          Seq(col("score"), col("id")), parts)
        .select(col("id"), col("grank"), col("n_total"))
        .as[(Long, Long, Long)].collect().toSet
      val want = rows.toDF("id", "score")
        .withColumn("grank", row_number()
          .over(Window.orderBy(col("score"), col("id"))).cast("long"))
        .withColumn("n_total", lit(rows.size.toLong))
        .select(col("id"), col("grank"), col("n_total"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want,
        s"rank mismatch at inputParts=$inputParts parts=$parts")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("descending keys work (order follows the Column's sort " +
      "direction)") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0))
      .toDF("id", "score")
    val got = RankOps.withGlobalRank(df,
        Seq(col("score").desc, col("id")), 3)
      .select(col("id"), col("grank"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 1L, 3L -> 2L, 1L -> 3L, 4L -> 4L))
    spark.sharedState.cacheManager.clearCache()
  }
}
