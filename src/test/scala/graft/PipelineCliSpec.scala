package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BucketedStores, GraftPipeline}

/** The PipelineCli option surface and both execution modes, driven
  * through `parse` + `execute` on a shared session (graft.wod.CliSpec's
  * discipline): the CLI must be a THIN shell — every mode's output
  * equals the corresponding GraftPipeline call, byte for byte.
  */
class PipelineCliSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private def docsPath = s"$dir/documents.parquet"

  private lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("parse: defaults, knobs, and loud failures") {
    val a = PipelineCli.parse(Array("-i", "in.parquet", "-o", "out"))
    assert(a.cfg.exactDedup && !a.cfg.nearDedup)
    assert(a.cfg.minChars == 100L && a.cfg.shards == 4L)

    val b = PipelineCli.parse(Array("--input", "i", "--output", "o",
      "--dedup", "near", "--near-min-jaccard", "0.5", "--shards", "8",
      "--seq-len", "1024", "--seed", "abc", "--min-chars", "0"))
    assert(b.cfg.nearDedup && !b.cfg.exactDedup)
    assert(b.cfg.nearDedupMinJaccard == 0.5 && b.cfg.shards == 8L)
    assert(b.cfg.seqLen == 1024L && b.cfg.shardSeed == "abc")

    intercept[RuntimeException](PipelineCli.parse(Array("--nope")))
    intercept[RuntimeException](PipelineCli.parse(Array("-i", "x")))
    intercept[RuntimeException](
      PipelineCli.parse(Array("-i", "x", "-o", "y", "--dedup", "fuzzy")))
    intercept[RuntimeException](PipelineCli.parse(
      Array("-i", "x", "-o", "y", "--shards", "eight")))
    intercept[RuntimeException](PipelineCli.parse(Array("-i", "x", "-o",
      "y", "--build-index", "t", "--index", "t")))
    intercept[RuntimeException](PipelineCli.parse(
      Array("-i", "x", "-o", "y", "--deletes", "d.parquet")))
  }

  test("batch mode writes exactly GraftPipeline.run's packed output") {
    val out = Files.createTempDirectory("plcli_batch").toString + "/p"
    val msg = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "-o", out, "--min-chars", "100",
      "--dedup", "exact")))
    assert(msg.contains("packed"))
    val got = spark.read.parquet(out)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val want = GraftPipeline.run(spark.read.parquet(docsPath),
        "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(got.nonEmpty && got === want)
  }

  test("--provenance writes exactly runWithProvenance's audit trail, " +
      "one row per input doc, and refuses non-exact modes") {
    val base = Files.createTempDirectory("plcli_prov").toString
    val (out, prov) = (s"$base/p", s"$base/a")
    val msg = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "-o", out, "--min-chars", "100",
      "--dedup", "exact", "--provenance", prov)))
    assert(msg.contains("provenance"))
    val got = spark.read.parquet(prov)
      .orderBy(col("doc_id")).collect().toSeq
    val want = GraftPipeline.runWithProvenance(
        spark.read.parquet(docsPath), "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
      .orderBy(col("doc_id")).collect().toSeq
    assert(got.nonEmpty && got === want)
    // audit covers the whole input — silent drops are impossible
    assert(got.size === spark.read.parquet(docsPath).count())
    // every kept row has packed coordinates; every dropped row doesn't
    val bad = spark.read.parquet(prov).filter(
      (col("disposition") === "kept") =!= col("shard").isNotNull)
    assert(bad.count() === 0)
    intercept[RuntimeException](PipelineCli.parse(Array(
      "-i", "x", "-o", "y", "--dedup", "near", "--provenance", "p")))
    intercept[RuntimeException](PipelineCli.parse(Array(
      "-i", "x", "-o", "y", "--index", "t", "--provenance", "p")))
    // --retain: copy-on-write --index changelogs only
    assert(PipelineCli.parse(Array("-i", "x", "-o", "y", "--index", "t",
      "--retain", "2")).retain === 2)
    intercept[RuntimeException](PipelineCli.parse(Array(
      "-i", "x", "-o", "y", "--retain", "2")))
    intercept[RuntimeException](PipelineCli.parse(Array(
      "-i", "x", "-o", "y", "--index", "t", "--mor", "--retain", "2")))
    // --as-of: snapshot read, incompatible with a changelog
    assert(PipelineCli.parse(Array("-i", "x", "-o", "y", "--index", "t",
      "--as-of", "1")).asOf === Some(1))
    intercept[RuntimeException](PipelineCli.parse(Array(
      "-i", "x", "-o", "y", "--as-of", "1")))
    intercept[RuntimeException](PipelineCli.parse(Array(
      "-i", "x", "-o", "y", "--index", "t", "--as-of", "1",
      "--deletes", "d.parquet")))
  }

  test("--as-of rebuilds the PRE-changelog training set from the " +
      "retained snapshot while the live index serves the new state") {
    val t = "plcli_asof_idx"
    BucketedStores.dropVersioned(spark, t)
    val tmp = Files.createTempDirectory("plcli_asof")
    val docs = spark.read.parquet(docsPath)
    // yesterday's build: full corpus, index stood up
    PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "--build-index", t, "--min-chars", "100")))
    val yesterday = GraftPipeline.runIncremental(spark, t, docs,
        "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
      .orderBy(col("shard"), col("pos")).collect().toSeq
    // nightly changelog WITH retention
    val del = s"$tmp/deletes"
    docs.filter(col("doc_id") % 7 === 3).select("doc_id")
      .write.parquet(del)
    val outNew = s"$tmp/new"
    PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "-o", outNew, "--index", t, "--deletes", del,
      "--retain", "1", "--min-chars", "100")))
    // as-of rebuild from generation 1 == yesterday's build, bit-equal
    val outOld = s"$tmp/old"
    val msg = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "-o", outOld, "--index", t, "--as-of", "1",
      "--min-chars", "100")))
    assert(msg.contains("packed"))
    val got = spark.read.parquet(outOld)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(got === yesterday)
    // ...and the live run really did change
    assert(spark.read.parquet(outNew).count() < yesterday.size)
    BucketedStores.dropVersioned(spark, t)
  }

  test("index lifecycle: build, changelog delta, incremental run " +
      "equals the full rebuild") {
    val t = "plcli_exidx"
    BucketedStores.dropVersioned(spark, t)
    val tmp = Files.createTempDirectory("plcli_incr")
    val docs = spark.read.parquet(docsPath)

    // changelog: delete doc_id%7==3, upsert surviving %5==0 (" upd")
    val upserts = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .withColumn("text", concat(col("text"), lit(" upd")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val newCorpus = docs.filter(col("doc_id") % 7 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val (upP, delP, corpusP, outP) = (s"$tmp/up", s"$tmp/del",
      s"$tmp/corpus", s"$tmp/out")
    upserts.write.parquet(upP)
    deletes.write.parquet(delP)
    newCorpus.write.parquet(corpusP)

    val built = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "--build-index", t)))
    assert(built.contains(s"index '$t' built"))

    val ran = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", corpusP, "-o", outP, "--index", t,
      "--deletes", delP, "--upserts", upP)))
    assert(ran.contains("packed"))

    val got = spark.read.parquet(outP)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val want = GraftPipeline.run(newCorpus, "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(got.nonEmpty && got === want)
    BucketedStores.dropVersioned(spark, t)
  }

  test("near-index lifecycle through the CLI equals the near rebuild") {
    val (lsh, pairs) = ("plcli_near_lsh", "plcli_near_pairs")
    BucketedStores.dropVersioned(spark, lsh)
    BucketedStores.dropVersioned(spark, pairs)
    val tmp = Files.createTempDirectory("plcli_near")
    val docs = spark.read.parquet(docsPath)
    val upserts = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .withColumn("text", concat(col("text"), lit(" upd")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val newCorpus = docs.filter(col("doc_id") % 7 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val (upP, delP, corpusP, outP) = (s"$tmp/up", s"$tmp/del",
      s"$tmp/corpus", s"$tmp/out")
    upserts.write.parquet(upP)
    deletes.write.parquet(delP)
    newCorpus.write.parquet(corpusP)

    val built = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "--build-near-index", s"$lsh,$pairs",
      "--dedup", "near")))
    assert(built.contains("near indexes"))

    val ran = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", corpusP, "-o", outP, "--near-index", s"$lsh,$pairs",
      "--dedup", "near", "--deletes", delP, "--upserts", upP)))
    assert(ran.contains("packed"))

    val got = spark.read.parquet(outP)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val want = GraftPipeline.run(newCorpus, "doc_id", "text",
        GraftPipeline.Config(minChars = 100, nearDedup = true))
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(got.nonEmpty && got === want)
    BucketedStores.dropVersioned(spark, lsh)
    BucketedStores.dropVersioned(spark, pairs)
  }

  test("--mor lifecycle: build + changelog append tombstones instead " +
      "of rewriting, and the run still equals the full rebuild") {
    val t = "plcli_mor_exidx"
    BucketedStores.dropVersioned(spark, t)
    val tmp = Files.createTempDirectory("plcli_mor")
    val docs = spark.read.parquet(docsPath)
    val upserts = docs
      .filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 === 0)
      .withColumn("text", concat(col("text"), lit(" upd")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val deletes = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val newCorpus = docs.filter(col("doc_id") % 7 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" upd")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val (upP, delP, corpusP, outP) = (s"$tmp/up", s"$tmp/del",
      s"$tmp/corpus", s"$tmp/out")
    upserts.write.parquet(upP)
    deletes.write.parquet(delP)
    newCorpus.write.parquet(corpusP)

    assert(PipelineCli.parse(Array("-i", "x", "-o", "y", "--mor")).mor)

    val built = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "--build-index", t, "--mor")))
    assert(built.contains(s"index '$t' built"))
    val gen0 = BucketedStores.currentGeneration(spark, t)

    val ran = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", corpusP, "-o", outP, "--index", t,
      "--deletes", delP, "--upserts", upP, "--mor")))
    assert(ran.contains("packed"))

    // merge-on-read really happened: same serving generation (no
    // rewrite), tombstones present
    assert(BucketedStores.currentGeneration(spark, t) === gen0,
      "MoR delta must not rewrite the generation")
    assert(spark.table(BucketedStores.currentTombstones(spark, t))
      .count() > 0, "MoR delta must write tombstones")

    val got = spark.read.parquet(outP)
      .orderBy(col("shard"), col("pos")).collect().toSeq
    val want = GraftPipeline.run(newCorpus, "doc_id", "text",
        GraftPipeline.Config(minChars = 100, exactDedup = true))
      .orderBy(col("shard"), col("pos")).collect().toSeq
    assert(got.nonEmpty && got === want)
    BucketedStores.dropVersioned(spark, t)
  }

  test("--compact folds a MoR index's tombstones (generation advances, " +
      "served content unchanged) and runs alone") {
    intercept[RuntimeException](PipelineCli.parse(
      Array("--compact", "t", "-i", "y")))
    intercept[RuntimeException](PipelineCli.parse(
      Array("--compact", "t", "--vacuum", "/tmp/x")))
    val t = "plcli_compact_exidx"
    BucketedStores.dropVersioned(spark, t)
    val docs = spark.read.parquet(docsPath)
    PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "--build-index", t, "--mor")))
    val tmp = Files.createTempDirectory("plcli_compact")
    val delP = s"$tmp/del"
    docs.filter(col("doc_id") % 7 === 3).select("doc_id")
      .write.parquet(delP)
    PipelineCli.execute(spark, PipelineCli.parse(Array(
      "-i", docsPath, "-o", s"$tmp/out", "--index", t,
      "--deletes", delP, "--mor")))
    val before = spark.table(t).select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val gen0 = BucketedStores.currentGeneration(spark, t)
    val msg = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "--compact", t)))
    assert(msg.contains(s"compacted exact index '$t'"))
    assert(BucketedStores.currentGeneration(spark, t) !== gen0,
      "compaction must advance the generation")
    val after = spark.table(t).select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after === before, "compaction must be invisible")
    assert(spark.table(BucketedStores.currentTombstones(spark, t))
      .count() === 0L, "compaction must start a fresh tombstone gen")
    BucketedStores.dropVersioned(spark, t)
  }

  test("--vacuum runs alone and reports what it reclaimed") {
    intercept[RuntimeException](PipelineCli.parse(
      Array("--vacuum", "/tmp/x", "-i", "y")))
    val root = Files.createTempDirectory("plcli_vac")
    Files.createDirectory(root.resolve("graft_retired_dir"))
    val msg = PipelineCli.execute(spark, PipelineCli.parse(Array(
      "--vacuum", root.toString, "--vacuum-retention-h", "0")))
    assert(msg.contains("vacuumed 1 retired dirs") &&
      msg.contains("graft_retired_dir"))
    assert(!root.resolve("graft_retired_dir").toFile.exists())
  }
}
