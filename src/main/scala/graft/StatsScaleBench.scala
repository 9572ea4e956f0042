package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{BucketedStores, SketchStats}

/** Scale probe for the r16 stats-maintenance claim: a statted
  * merge-on-read store's `morAppend` folds its key stats DELTA-ONLY,
  * so keeping the planner armed must cost ~the appended rows — never
  * the corpus — while the `analyzeKey` rescan it replaces grows with
  * the corpus. This main measures exactly that on the [[ScaleBench]]
  * stress corpora, with the delta held FIXED as the corpus scales:
  *
  *   t_analyze        — full from-scratch analyzeKey at n× (what the
  *                      fold avoids; expected ~linear in n)
  *   t_append_armed   — morAppend of the FIXED delta with stats
  *                      armed (append + delta fold + metadata size
  *                      re-read)
  *   t_append_unarmed — the same-size morAppend with no stats
  *                      (the raw append cost)
  *
  * The verdict is the `armed − unarmed` gap staying ~flat as n grows
  * (the fold prices the delta, not the store). Emits one JSON line to
  * BENCH_STATS_SCALE.json; analysis rides in BENCH_SCALE.md.
  */
object StatsScaleBench {

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0).split(',').map(_.trim.toInt)
      else Array(1, 8, 32)).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // synthetic corpus: the claim is mechanical (rescan cost grows
    // with the STORE, fold cost with the DELTA), so size the store to
    // where the separation is visible — the sf-corpus documents table
    // is overhead-dominated below ~1M rows
    val RowsPerScale = 4000000L
    val DeltaRows = 20000L
    for (n <- scales) {
      val name = s"ssb_store_$n"
      BucketedStores.dropVersioned(spark, name)
      val docs = spark.range(n * RowsPerScale)
        .select(col("id").as("doc_id"),
          conv(substring(md5(col("id").cast("string")), 1, 13), 16, 10)
            .cast("long").as("h"))
      // fixed-size delta at every scale, ids past any corpus range
      val delta = spark.range(DeltaRows)
        .select((col("id") + 2000000000L).as("doc_id"),
          conv(substring(md5(col("id").cast("string")), 1, 13), 16, 10)
            .cast("long").as("h"))
      rows(s"corpus_${n}x") = docs.count()
      rows(s"delta_${n}x") = delta.count()
      docs.withColumn("_seq", lit(0L))
        .repartition(8, pmod(hash(col("doc_id")), lit(8)))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path",
          Files.createTempDirectory(s"graft_ssb_$n").toString)
        .saveAsTable(name)
      BucketedStores.adoptVersioned(spark, name)
      BucketedStores.morEnable(spark, name, Seq("doc_id"), "doc_id")
      // the rescan the fold avoids, at this corpus scale
      val (tAnalyze, _) =
        timed(SketchStats.analyzeKey(spark, name, "doc_id"))
      out(s"analyze_${n}x") = tAnalyze
      // armed append: raw append + the delta-only stats fold
      val seq1 = BucketedStores.morNextSeq(spark, name)
      val (tArmed, _) = timed(BucketedStores.morAppend(spark, name,
        delta, seq1, Seq("doc_id"), Seq("doc_id"), 8))
      out(s"append_armed_${n}x") = tArmed
      require(SketchStats.read(spark, name).isDefined,
        s"$name stats must survive an armed morAppend")
      // unarmed append of the SAME-size delta (fresh ids again)
      SketchStats.dropStats(spark, name)
      val delta2 = delta.withColumn("doc_id", col("doc_id") + 500000000L)
      val seq2 = BucketedStores.morNextSeq(spark, name)
      val (tUnarmed, _) = timed(BucketedStores.morAppend(spark, name,
        delta2, seq2, Seq("doc_id"), Seq("doc_id"), 8))
      out(s"append_unarmed_${n}x") = tUnarmed
      BucketedStores.dropVersioned(spark, name)
      println(s"[stats-scale] ${n}x: analyze=$tAnalyze " +
        s"armed=$tArmed unarmed=$tUnarmed")
    }
    val js = out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rj = rows.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"stats_scale","times":$js,"rows":$rj,"base":"$base"}"""
    Files.writeString(Paths.get("BENCH_STATS_SCALE.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
