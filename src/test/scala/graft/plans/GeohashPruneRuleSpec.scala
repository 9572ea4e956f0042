package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates [[InferGeohashPartitionFilter]]: geohash point/prefix/IN/OR
  * predicates must prune a geohash3-partitioned store to the implied
  * partition DIRECTORIES (not just filter rows), results must be
  * byte-identical with the rule excluded, and the rule must stand down
  * when the user already constrains geohash3 or the layout columns are
  * absent.
  */
class GeohashPruneRuleSpec extends AnyFunSuite with PredicateHelper {

  // the rule ships in the session factory's extensions; other suites'
  // sessions are built the same way, so getOrCreate is safe here
  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private val cells = Seq("gfq", "gkp", "u4p", "9q8")

  private def fixtureRows = for {
    cell <- cells
    i <- 0 until 25
  } yield (s"$cell${"%09d".format(i)}", cell, i)

  private lazy val store: String = {
    val dir = Files.createTempDirectory("gh_prune_store").toString
    import spark.implicits._
    // engine-written stores carry the write-time provenance tag on
    // `geohash` (WodPipeline stamps it; the rule requires it)
    val tag = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean(InferGeohashPartitionFilter.ProvenanceKey, true).build()
    fixtureRows.toDF("geohash", "geohash3", "v")
      .withColumn("geohash", col("geohash").as("geohash", tag))
      .write.partitionBy("geohash3").mode("overwrite").parquet(dir)
    dir
  }

  /** Same layout, NO provenance tag — external data with
    * coincidentally-named columns.
    */
  private lazy val untaggedStore: String = {
    val dir = Files.createTempDirectory("gh_prune_untagged").toString
    import spark.implicits._
    fixtureRows.toDF("geohash", "geohash3", "v")
      .write.partitionBy("geohash3").mode("overwrite").parquet(dir)
    dir
  }

  private def read(): DataFrame = spark.read.parquet(store)

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case s: FileSourceScanExec => s }.get
  }

  /** Partition directories the scan actually touches after pruning. */
  private def dirsTouched(df: DataFrame): Int = {
    val s = scanOf(df)
    s.relation.location.listFiles(s.partitionFilters, s.dataFilters).size
  }

  test("full-geohash equality prunes to ONE partition directory") {
    val df = read().filter(col("geohash") === "gfq000000007")
    assert(df.count() === 1)
    assert(dirsTouched(df) === 1)
    assert(scanOf(df).partitionFilters.nonEmpty)
  }

  test("prefix LIKE prunes: 3-char prefix to one dir, shorter to the matching dirs") {
    val exact = read().filter(col("geohash").startsWith("u4p"))
    assert(exact.count() === 25)
    assert(dirsTouched(exact) === 1)
    // 'g' matches cells gfq and gkp but not u4p/9q8
    val short = read().filter(col("geohash").startsWith("g"))
    assert(short.count() === 50)
    assert(dirsTouched(short) === 2)
  }

  test("IN and OR of point lookups prune to the union of their cells") {
    val in = read().filter(
      col("geohash").isin("gfq000000001", "9q8000000002"))
    assert(in.count() === 2)
    assert(dirsTouched(in) === 2)
    val or = read().filter(
      col("geohash") === "gkp000000003" ||
        col("geohash") === "u4p000000004")
    assert(or.count() === 2)
    assert(dirsTouched(or) === 2)
  }

  test("range [gfq, gfr) prunes to EXACTLY the gfq cell — the strict " +
      "short upper bound drops the boundary cell") {
    // the bbox-decomposition shape from the r7 verdict
    val df = read().filter(
      col("geohash") >= "gfq" && col("geohash") < "gfr")
    assert(df.count() === 25)
    assert(dirsTouched(df) === 1)
    assert(scanOf(df).partitionFilters.nonEmpty)
  }

  test("range bounds prune independently; long bounds keep the " +
      "boundary cell (sound, not tight)") {
    // cells sorted: 9q8 < gfq < gkp < u4p
    // gh >= 'gfq5…' can still have prefix gfq → cells gfq, gkp, u4p
    val lower = read().filter(col("geohash") >= "gfq500000000")
    assert(dirsTouched(lower) === 3)
    // gh <= 'gkp' (non-strict) keeps the gkp cell → 9q8, gfq, gkp
    val upper = read().filter(col("geohash") <= "gkp")
    assert(dirsTouched(upper) === 3)
    // flipped literal order infers the same bound
    val flipped = read().filter(lit("gkp") >= col("geohash"))
    assert(dirsTouched(flipped) === 3)
    assert(flipped.count() === 50) // 9q8*, gfq* rows (gkp… > 'gkp')
  }

  test("mixed AND/OR: a nested range keeps BOTH bounds inside a " +
      "disjunction") {
    val df = read().filter(
      (col("geohash") >= "gfq" && col("geohash") < "gfr") ||
        col("geohash") === "u4p000000001")
    assert(df.count() === 26)
    assert(dirsTouched(df) === 2, "gfq + u4p, never gkp")
  }

  test("provenance: an untagged store with the same column names is " +
      "NEVER pruned — and the conf opt-in restores pruning") {
    val q = () => spark.read.parquet(untaggedStore)
      .filter(col("geohash") === "gfq000000007")
    val df = q()
    assert(df.count() === 1)
    assert(dirsTouched(df) === cells.size,
      "no provenance tag → the rule must not trust the layout")
    spark.conf.set(InferGeohashPartitionFilter.AssumeLayoutConf, "true")
    try {
      val opted = q()
      assert(opted.count() === 1)
      assert(dirsTouched(opted) === 1,
        "conf opt-in must restore pruning for trusted external stores")
    } finally
      spark.conf.unset(InferGeohashPartitionFilter.AssumeLayoutConf)
  }

  test("pure SQL gets the same pruning") {
    read().createOrReplaceTempView("gh_store")
    val df = spark.sql(
      "SELECT * FROM gh_store WHERE geohash LIKE 'gfq00000000%'")
    assert(df.count() === 10)
    assert(dirsTouched(df) === 1)
  }

  test("results are identical with the rule excluded; without it the scan reads every dir") {
    val key = "spark.sql.optimizer.excludedRules"
    // no orderBy: an exchange would wrap the scan in an AQE query
    // stage where dirsTouched can't see it; the single row needs none
    val q = () => read().filter(col("geohash") === "gfq000000007")
    val withRule = q().collect()
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.InferGeohashPartitionFilter")
    try {
      val without = q()
      assert(without.collect() === withRule)
      assert(dirsTouched(without) === cells.size,
        "excluding the rule must restore the unpruned scan")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("a user-supplied geohash3 conjunct is respected, not duplicated") {
    val df = read().filter(
      col("geohash") === "gfq000000007" && col("geohash3") === "gfq")
    assert(df.count() === 1)
    assert(dirsTouched(df) === 1)
    // count EQUALITY conjuncts only: constraint inference legitimately
    // adds isnotnull(geohash3), which also references the column
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, AttributeReference}
    val gh3Preds = df.queryExecution.optimizedPlan.collect {
      case LFilter(c, _) =>
        splitConjunctivePredicates(c).count {
          case EqualTo(a: AttributeReference, _) => a.name == "geohash3"
          case EqualTo(_, a: AttributeReference) => a.name == "geohash3"
          case _ => false
        }
    }.sum
    assert(gh3Preds === 1, "the rule must not add beside an existing geohash3 predicate")
  }

  test("wod6's bulk-store lookup gets partition filters from the rule " +
      "(the real store, not the synthetic fixture)") {
    val df = graft.queries.Registry.byName("wod6_geo_cell_lookup")
      .fn(spark, "/root/testdata/sf0.001")
    // pre-adaptive physical plan: partition filters are extracted at
    // planning time (FileSourceStrategy), and AQE's materialized query
    // stages would hide the scan from a plain collect
    val scans = df.queryExecution.sparkPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    val pruned = scans.filter(_.partitionFilters.exists(
      _.references.exists(_.name == "geohash3")))
    assert(pruned.nonEmpty,
      s"wod6's geohash prefix filter must prune geohash3 partitions:\n" +
        scans.map(_.partitionFilters).mkString("\n"))
  }

  test("wod7's range scan gets geohash3 partition filters from the " +
      "rule on the real bulk store") {
    val df = graft.queries.Registry.byName("wod7_geo_range_scan")
      .fn(spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.sparkPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    val pruned = scans.filter(_.partitionFilters.exists(
      _.references.exists(_.name == "geohash3")))
    assert(pruned.nonEmpty,
      s"wod7's geohash range filter must prune geohash3 partitions:\n" +
        scans.map(_.partitionFilters).mkString("\n"))
  }

  test("same-origin gate: a replaced or foreign geohash3 disarms the " +
      "rule even though the geohash tag survives the transform") {
    import spark.implicits._
    // the r8 ADVICE attack: the tag on `geohash` rides along while a
    // withColumn swaps geohash3 for a non-prefix value — firing here
    // would add a conjunct over junk values and silently drop rows
    val swapped = read()
      .withColumn("geohash3", lit("zzz"))
      .filter(col("geohash") === "gfq000000007")
    assert(swapped.count() === 1,
      "the rule must not filter on the replaced geohash3")
    // predicate pushdown legitimately lands the geohash filter BELOW
    // the replacement Project, where the rule may fire on the store's
    // ORIGINAL geohash3 (sound — the layout invariant holds there).
    // What must never happen is a conjunct on the REBUILT attribute:
    val rebuiltId = swapped.queryExecution.analyzed.output
      .find(_.name == "geohash3").get.exprId
    val rebuiltRefs = swapped.queryExecution.optimizedPlan.collect {
      case LFilter(c, _) => splitConjunctivePredicates(c).count(
        _.references.exists(a =>
          a.name == "geohash3" && a.exprId == rebuiltId))
    }.sum
    assert(rebuiltRefs === 0,
      "no inferred geohash3 conjunct may target a rebuilt column")
    // a joined-in foreign geohash3 (different leaf) must not arm it
    // either: drop the store's own geohash3 first, then join one in
    val foreign = Seq(("x", "zzz")).toDF("k", "geohash3")
    val joined = read().drop("geohash3").withColumn("k", lit("x"))
      .join(foreign, "k")
      .filter(col("geohash") === "gfq000000007")
    assert(joined.count() === 1,
      "a foreign geohash3 from another relation must be ignored")
  }

  test("bbox decomposition end-to-end: GeoOps ranges become geohash3 " +
      "partition filters and prune to exactly the box's cell") {
    import graft.operators.GeoOps
    // a box strictly inside the gfq cell → one range [gfq, gfr)
    val b = GeoOps.cellBounds("gfq")
    val ranges = GeoOps.bboxToGeohashRanges(
      b.latMin + 1e-6, b.latMax - 1e-6, b.lonMin + 1e-6, b.lonMax - 1e-6, 3)
    assert(ranges === Seq(("gfq", "gfr")))
    val pred = ranges.map { case (lo, hi) =>
      col("geohash") >= lo && col("geohash") < hi }.reduce(_ || _)
    val df = read().filter(pred)
    assert(df.count() === 25)
    assert(dirsTouched(df) === 1, "the range cover must prune to gfq only")
    assert(scanOf(df).partitionFilters.nonEmpty)
    // a box spanning two cells keeps both, never the others
    val b2 = GeoOps.cellBounds("gkp")
    val wide = GeoOps.bboxToGeohashRanges(
      math.min(b.latMin, b2.latMin) + 1e-6,
      math.max(b.latMax, b2.latMax) - 1e-6,
      math.min(b.lonMin, b2.lonMin) + 1e-6,
      math.max(b.lonMax, b2.lonMax) - 1e-6, 3)
    val widePred = wide.map { case (lo, hi) =>
      col("geohash") >= lo && col("geohash") < hi }.reduce(_ || _)
    val wdf = read().filter(widePred)
    val dirs = dirsTouched(wdf)
    assert(wdf.count() === 50, "both cells' rows must survive the cover")
    assert(dirs < cells.size,
      s"a two-cell box must prune at least the cells outside its cover " +
        s"(touched $dirs of ${cells.size})")
  }

  test("stands down without the layout column pair; short equality implies nothing") {
    import spark.implicits._
    // geohash present, geohash3 absent: no crash, plain row filter
    val bare = Seq(("gfq000000001", 1)).toDF("geohash", "v")
      .filter(col("geohash") === "gfq000000001")
    assert(bare.count() === 1)
    // a 2-char EQUALITY can never match a 12-char geohash; the rule
    // must not invent a prefix constraint from it
    val short = read().filter(col("geohash") === "gf")
    assert(short.count() === 0)
    assert(dirsTouched(short) === cells.size)
  }
}
