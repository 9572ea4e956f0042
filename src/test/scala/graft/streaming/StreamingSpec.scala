package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("append-mode watermarked windows emit a subset of complete mode") {
    import spark.implicits._
    val appended = EventsStreaming.hourlyAppendStream(spark, dir, slices = 4)
      .as[(Long, String, Long)].collect().toSet
    val complete = EventsStreaming.hourlyAggStream(spark, dir)
      .selectExpr("hour_ts", "event_type", "n_events")
      .as[(Long, String, Long)].collect().toSet
    // watermark advanced across micro-batches → finalized windows exist
    assert(appended.nonEmpty, "append mode emitted no closed windows")
    // every emitted window is final — identical to the batch/complete agg
    assert(appended.subsetOf(complete),
      s"append rows must match complete-mode values; extra: ${appended -- complete}")
    // and something was withheld (the tail windows still open)
    assert(appended.size < complete.size)
  }
}
