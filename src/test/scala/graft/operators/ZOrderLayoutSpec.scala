package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates [[ZOrderLayouts]]: the z-ordered store must (a) preserve the
  * row multiset exactly, (b) skip files on EITHER clustered dimension
  * alone — the property a linear sort cannot give — and (c) never lose
  * rows to skipping (superset + exact refine == plain filter).
  */
class ZOrderLayoutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private lazy val events: DataFrame =
    graft.queries.Tables.events(spark, dir)

  private val Files_ = 8

  private lazy val zpath: String = {
    val p = Files.createTempDirectory("zorder_spec")
      .resolve("events_z").toString
    ZOrderLayouts.zorderWrite(events, Seq("user_id", "ts"), p,
      buckets = 64, files = Files_)
    p
  }

  /** A user-sorted (linear) rewrite of the same data — the contrast
    * layout: prunes user_id well, prunes ts not at all.
    */
  private lazy val linearPath: String = {
    val p = Files.createTempDirectory("zorder_spec")
      .resolve("events_linear").toString
    events.repartitionByRange(Files_, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.parquet(p)
    ZOrderLayouts.writeManifest(spark, p, Seq("user_id", "ts"))
    p
  }

  private def tsRange: (Long, Long) = {
    val r = events.agg(min(col("ts")), max(col("ts"))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("z-ordered store preserves the row multiset exactly") {
    val orig = events.groupBy(col("event_id"))
      .agg(sum(col("ts")).as("s")).count()
    assert(spark.read.parquet(zpath).count() == events.count())
    val joined = spark.read.parquet(zpath).as("z")
      .join(events.as("e"), Seq("event_id"))
      .filter(col("z.ts") === col("e.ts") &&
        col("z.user_id") === col("e.user_id"))
      .count()
    assert(joined == events.count(), "every row must round-trip")
    assert(orig > 0)
  }

  test("a ts-only slice skips most files on the z-ordered store") {
    val (lo, hi) = tsRange
    val span = hi - lo
    val narrow = (lo + span / 10, lo + span / 5) // ~10% of the time range
    val cand = ZOrderLayouts.candidateFiles(spark, zpath,
      Seq(("ts", narrow._1, narrow._2)))
    assert(cand.nonEmpty && cand.size < Files_,
      s"ts slice must skip files: ${cand.size} of $Files_")
  }

  test("a user-only slice skips most files on the z-ordered store") {
    val cand = ZOrderLayouts.candidateFiles(spark, zpath,
      Seq(("user_id", 0L, 2L)))
    assert(cand.nonEmpty && cand.size < Files_,
      s"user slice must skip files: ${cand.size} of $Files_")
  }

  test("the linear-sorted contrast store cannot skip on ts (why z-order)") {
    val (lo, hi) = tsRange
    val span = hi - lo
    val narrow = (lo + span / 10, lo + span / 5)
    val zCand = ZOrderLayouts.candidateFiles(spark, zpath,
      Seq(("ts", narrow._1, narrow._2))).size
    val linCand = ZOrderLayouts.candidateFiles(spark, linearPath,
      Seq(("ts", narrow._1, narrow._2))).size
    // users are active across the whole month, so every user-sorted
    // file spans ~the full ts range → no ts skipping
    assert(linCand == Files_,
      s"linear layout should not skip on ts, skipped to $linCand")
    assert(zCand < linCand,
      s"z-order must beat linear on the non-sort dim: $zCand vs $linCand")
  }

  test("skipping + exact refine equals the plain filter (no row loss, " +
      "boundary literals included)") {
    val (lo, hi) = tsRange
    val mid = lo + (hi - lo) / 2
    // adversarial: bounds exactly on existing row values
    val exact = events.filter(col("user_id").between(3L, 9L) &&
      col("ts") >= lo && col("ts") <= mid)
    val skipped = ZOrderLayouts.skippingRead(spark, zpath,
        Seq(("user_id", 3L, 9L), ("ts", lo, mid)))
      .filter(col("user_id").between(3L, 9L) &&
        col("ts") >= lo && col("ts") <= mid)
    assert(skipped.count() == exact.count())
    assert(skipped.join(exact, Seq("event_id"), "left_anti").count() == 0)
    assert(exact.count() > 0)
  }

  test("an empty box returns an empty frame with the store schema") {
    val df = ZOrderLayouts.skippingRead(spark, zpath,
      Seq(("user_id", 10000L, 20000L)))
    assert(df.count() == 0)
    assert(df.schema.fieldNames.contains("event_id"))
  }

  test("every file's manifest box is tight on BOTH dims (the layout " +
      "property itself)") {
    val (lo, hi) = tsRange
    val m = spark.read.parquet(s"$zpath/${ZOrderLayouts.ManifestDir}")
    val rows = m.collect()
    assert(rows.length == Files_)
    val tsSpans = rows.map(r =>
      (r.getAs[Long]("max_ts") - r.getAs[Long]("min_ts")).toDouble /
        (hi - lo))
    val uMax = events.agg(max(col("user_id"))).head().getLong(0)
    val uSpans = rows.map(r =>
      (r.getAs[Long]("max_user_id") - r.getAs[Long]("min_user_id"))
        .toDouble / math.max(uMax, 1L))
    // with 8 files over a 2-D z-curve, the AVERAGE per-file span on
    // each dim must be well under the full range (a linear sort puts
    // ~1.0 on the non-sort dim)
    assert(tsSpans.sum / tsSpans.length < 0.8,
      s"ts spans: ${tsSpans.mkString(", ")}")
    assert(uSpans.sum / uSpans.length < 0.8,
      s"user spans: ${uSpans.mkString(", ")}")
  }
}
