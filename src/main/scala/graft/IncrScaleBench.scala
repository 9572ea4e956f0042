package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{BucketedStores, GraftPipeline}

/** Scale probe for the INCREMENTAL pipeline claim (pl3/pl4): a nightly
  * changelog should cost delta-scale work, not corpus-scale work — so
  * as the corpus grows with the delta held FIXED, maintenance+run time
  * must grow far slower than the full rebuild it replaces. This main
  * measures exactly that on the [[ScaleBench]] stress corpora (hot key
  * + hot LSH band included):
  *
  *   t_build    — stand up LSH + pair stores over the n× corpus (paid
  *                once, amortized across nights)
  *   t_delta    — apply a FIXED changelog (the r=0 replica's
  *                doc_id % 37 == 0 upserts and % 41 == 0 deletes —
  *                the same absolute delta at every scale) to both
  *                stores
  *   t_incr     — the incremental packed run (components over the
  *                pair store, pack)
  *   t_rebuild  — `GraftPipeline.run(nearDedup)` over the same
  *                post-changelog corpus: what a nightly build pays
  *                WITHOUT the standing stores
  *
  * The verdict lives in the `t_delta+t_incr` vs `t_rebuild` ratio as n
  * grows. Emits one JSON line (BENCH_INCR.json); the analysis rides in
  * BENCH_SCALE.md.
  */
object IncrScaleBench {

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0).split(',').map(_.trim.toInt)
      else Array(1, 8, 32)).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = GraftPipeline.Config(minChars = 100, nearDedup = true)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for (n <- scales) {
      val dir = ScaleBench.ensureStress(spark, base, n)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("n_chars") >= 100)
        .select(col("doc_id"), col("text"), col("n_chars"))
      // fixed-size changelog: r=0 replica ids only — identical at
      // every scale (replica ids are offset past the base id range)
      val maxBaseId = spark.read.parquet(s"$base/documents.parquet")
        .agg(max(col("doc_id"))).head().getLong(0)
      val inBase = col("doc_id") <= maxBaseId
      val upserts = docs.filter(inBase && col("doc_id") % 37 === 0 &&
          col("doc_id") % 41 =!= 0)
        .withColumn("text", concat(col("text"), lit(" upd")))
        .withColumn("n_chars", (col("n_chars") + 4).cast("long"))
      val deletes = docs.filter(inBase && col("doc_id") % 41 === 0)
        .select("doc_id")
      val newCorpus = docs
        .join(deletes.withColumnRenamed("doc_id", "_del"),
          col("doc_id") === col("_del"), "left_anti")
        .withColumn("text",
          when(inBase && col("doc_id") % 37 === 0,
            concat(col("text"), lit(" upd"))).otherwise(col("text")))
        .withColumn("n_chars",
          when(inBase && col("doc_id") % 37 === 0,
            (col("n_chars") + 4)).otherwise(col("n_chars")).cast("long"))

      // copy-on-write maintenance (pl4's path)
      val (lsh, pairs) = (s"incr_lsh_$n", s"incr_pairs_$n")
      val (tBuild, _) = timed {
        GraftPipeline.buildNearIndexes(docs, "doc_id", "text", lsh,
          pairs, cfg)
      }
      val (tDelta, _) = timed {
        GraftPipeline.applyNearIndexDelta(spark, lsh, pairs, deletes,
          Some(upserts), "doc_id", "text", cfg)
      }
      val (tIncr, nIncr) = timed {
        GraftPipeline.runIncrementalNear(spark, pairs, newCorpus,
          "doc_id", "text", cfg).count()
      }
      BucketedStores.dropVersioned(spark, lsh)
      BucketedStores.dropVersioned(spark, pairs)

      // merge-on-read maintenance (pl5's path) — same changelog
      val (lshM, pairsM) = (s"incr_mlsh_$n", s"incr_mpairs_$n")
      val (tBuildM, _) = timed {
        GraftPipeline.buildNearIndexesMor(docs, "doc_id", "text", lshM,
          pairsM, cfg)
      }
      val (tDeltaM, _) = timed {
        GraftPipeline.applyNearIndexDeltaMor(spark, lshM, pairsM,
          deletes, Some(upserts), "doc_id", "text", cfg)
      }
      val (tIncrM, nIncrM) = timed {
        GraftPipeline.runIncrementalNear(spark, pairsM, newCorpus,
          "doc_id", "text", cfg).count()
      }
      BucketedStores.dropVersioned(spark, lshM)
      BucketedStores.dropVersioned(spark, pairsM)

      val (tRebuild, nRebuild) = timed {
        GraftPipeline.run(newCorpus, "doc_id", "text", cfg).count()
      }
      require(nIncr == nRebuild && nIncrM == nRebuild,
        s"incremental ($nIncr cow / $nIncrM mor) != rebuild " +
          s"($nRebuild) at ${n}x")
      out(s"build@$n") = tBuild; out(s"delta@$n") = tDelta
      out(s"incr@$n") = tIncr; out(s"rebuild@$n") = tRebuild
      out(s"mor_build@$n") = tBuildM; out(s"mor_delta@$n") = tDeltaM
      out(s"mor_incr@$n") = tIncrM
      rows(s"packed@$n") = nIncr
      System.err.println(f"[incr] ${n}%3dx build=$tBuild%7.2fs " +
        f"delta=$tDelta%6.2fs incr=$tIncr%6.2fs rebuild=$tRebuild%7.2fs " +
        f"cow_nightly/rebuild=${(tDelta + tIncr) / tRebuild}%5.2f " +
        f"rows=$nIncr")
      System.err.println(f"[incr] ${n}%3dx MOR  build=$tBuildM%7.2fs " +
        f"delta=$tDeltaM%6.2fs incr=$tIncrM%6.2fs " +
        f"mor_nightly/rebuild=${(tDeltaM + tIncrM) / tRebuild}%5.2f")

      // EXACT family (pl3/pl6's stores): same changelog, same corpus,
      // exact-dedup config — plus the compaction payoff (read-side
      // cost of the tombstone view vs a freshly folded generation)
      val exCfg = GraftPipeline.Config(minChars = 100, exactDedup = true)
      val exT = s"incr_ex_$n"
      val (tBuildE, _) = timed {
        GraftPipeline.buildExactIndex(docs, "doc_id", "text", exT)
      }
      val (tDeltaE, _) = timed {
        GraftPipeline.applyExactIndexDelta(spark, exT, deletes,
          Some(upserts), "doc_id", "text")
      }
      val (tIncrE, nIncrE) = timed {
        GraftPipeline.runIncremental(spark, exT, newCorpus, "doc_id",
          "text", exCfg).count()
      }
      BucketedStores.dropVersioned(spark, exT)
      val exM = s"incr_exm_$n"
      val (tBuildEM, _) = timed {
        GraftPipeline.buildExactIndexMor(docs, "doc_id", "text", exM)
      }
      val (tDeltaEM, _) = timed {
        GraftPipeline.applyExactIndexDeltaMor(spark, exM, deletes,
          Some(upserts), "doc_id", "text")
      }
      val (tIncrEM, nIncrEM) = timed {
        GraftPipeline.runIncremental(spark, exM, newCorpus, "doc_id",
          "text", exCfg).count()
      }
      val (tCompactE, _) = timed {
        GraftPipeline.morCompactExactIndex(spark, exM, "doc_id")
      }
      val (tIncrEC, nIncrEC) = timed {
        GraftPipeline.runIncremental(spark, exM, newCorpus, "doc_id",
          "text", exCfg).count()
      }
      BucketedStores.dropVersioned(spark, exM)
      val (tRebuildE, nRebuildE) = timed {
        GraftPipeline.run(newCorpus, "doc_id", "text", exCfg).count()
      }
      require(nIncrE == nRebuildE && nIncrEM == nRebuildE &&
        nIncrEC == nRebuildE,
        s"exact incremental ($nIncrE cow / $nIncrEM mor / $nIncrEC " +
          s"compacted) != rebuild ($nRebuildE) at ${n}x")
      out(s"ex_build@$n") = tBuildE; out(s"ex_delta@$n") = tDeltaE
      out(s"ex_incr@$n") = tIncrE; out(s"ex_rebuild@$n") = tRebuildE
      out(s"ex_mor_build@$n") = tBuildEM
      out(s"ex_mor_delta@$n") = tDeltaEM
      out(s"ex_mor_incr@$n") = tIncrEM
      out(s"ex_mor_compact@$n") = tCompactE
      out(s"ex_mor_incr_postcompact@$n") = tIncrEC
      System.err.println(f"[incr] ${n}%3dx EXACT cow delta=$tDeltaE%6.2fs " +
        f"incr=$tIncrE%6.2fs | mor delta=$tDeltaEM%6.2fs " +
        f"incr=$tIncrEM%6.2fs compact=$tCompactE%6.2fs " +
        f"postcompact_incr=$tIncrEC%6.2fs | rebuild=$tRebuildE%6.2fs")
      spark.sharedState.cacheManager.clearCache()
    }
    val line =
      s"""{"base":"$base","scales":${scales.mkString("[", ",", "]")},""" +
        s""""sec":${out.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}")},""" +
        s""""rows":${rows.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get("BENCH_INCR.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
