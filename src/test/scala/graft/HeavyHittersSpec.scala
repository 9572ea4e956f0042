package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MGBuffer
import org.scalatest.funsuite.AnyFunSuite

/** Gates the Misra-Gries kernel: the n/k containment guarantee must
  * hold on skewed data under ANY partitioning (partials + merges), the
  * lower-bound property must hold for every reported count, and the
  * buffer must survive the serialize/deserialize the exchange and the
  * streaming state store perform.
  */
class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  /** Zipf-ish skewed stream: item i (1-based) gets ~N/i occurrences —
    * few heavy items over a long tail, the adversarial shape for a
    * counter-eviction sketch.
    */
  private def zipf(items: Int, scale: Int): Seq[String] =
    (1 to items).flatMap(i => Seq.fill(scale / i)(s"item_$i"))

  private def trueCounts(data: Seq[String]): Map[String, Long] =
    data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("containment guarantee: every item with count > n/k is in the " +
      "sketch, single buffer") {
    val data = scala.util.Random.shuffle(zipf(200, 1000))
    val exact = trueCounts(data)
    for (k <- Seq(5, 10, 20)) {
      val b = new MGBuffer(k)
      data.foreach(b.add)
      val kept = b.counts.keySet
      val heavy = exact.filter(_._2 > data.size.toLong / k).keySet
      assert(heavy.subsetOf(kept),
        s"k=$k missing: ${heavy -- kept}")
      // and every reported count is a lower bound within n/k
      b.counts.foreach { case (item, c) =>
        assert(c <= exact(item), s"$item over-counted")
        assert(exact(item) - c <= data.size.toLong / k,
          s"$item error exceeds n/k")
      }
    }
  }

  test("guarantee survives partials + mergeable-summaries combine " +
      "(any partitioning)") {
    val data = scala.util.Random.shuffle(zipf(300, 2000))
    val exact = trueCounts(data)
    val k = 12
    for (parts <- Seq(2, 7, 32)) {
      val merged = data.grouped(math.max(data.size / parts, 1))
        .map { chunk => val b = new MGBuffer(k); chunk.foreach(b.add); b }
        .reduce { (a, b) => a.merge(b); a }
      val heavy = exact.filter(_._2 > data.size.toLong / k).keySet
      assert(heavy.subsetOf(merged.counts.keySet),
        s"parts=$parts missing: ${heavy -- merged.counts.keySet}")
      assert(merged.counts.size <= k - 1, "merge must re-bound state")
      merged.counts.foreach { case (item, c) =>
        assert(c <= exact(item), s"$item over-counted after merge")
      }
    }
  }

  test("serialize/deserialize round-trips state exactly") {
    val b = new MGBuffer(8)
    zipf(50, 300).foreach(b.add)
    val back = MGBuffer.deserialize(8, b.serialize())
    assert(back.processed == b.processed)
    assert(back.counts.toMap == b.counts.toMap)
  }

  test("sketch -> exact recount equals the direct computation on a " +
      "skewed DataFrame, across shuffle partitionings") {
    import spark.implicits._
    val data = scala.util.Random.shuffle(zipf(500, 3000))
    val k = 15
    val df = data.toDF("term").repartition(13) // adversarial split
    val direct = df.groupBy("term").count()
      .filter(col("count") * k > data.size.toLong)
      .select("term").collect().map(_.getString(0)).toSet
    val cands = df.agg(graft.functions.VectorFunctions
        .heavy_hitters(col("term"), k).as("hh"))
      .select(explode(col("hh")).as("c"))
      .select(col("c.item").as("term"))
    val sketchThenExact = df.join(broadcast(cands), "term")
      .groupBy("term").count()
      .filter(col("count") * k > data.size.toLong)
      .select("term").collect().map(_.getString(0)).toSet
    assert(sketchThenExact == direct)
    assert(direct.nonEmpty, "fixture must have heavy items")
  }

  test("SQL surface: heavy_hitters usable from spark.sql") {
    import spark.implicits._
    zipf(40, 200).toDF("t").createOrReplaceTempView("hh_in")
    val n = spark.sql(
      "SELECT size(heavy_hitters(t, 10)) FROM hh_in").head().getInt(0)
    assert(n > 0 && n <= 9)
  }
}
