package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class WodDataSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val fixtures = "/root/reference/src/test/resources/wod"

  test("spark.read.format(wod) over a fixture file") {
    val df = spark.read.format("wod").load(s"$fixtures/XBT/OBS/XBTO1967.gz")
    assert(df.count() === 9390)
    assert(df.schema.fieldNames.contains("geohash3"))
    // column pruning + predicate work through the scan
    import spark.implicits._
    val years = df.filter($"country" === "US")
      .select($"year").distinct().as[Int].collect()
    assert(years.contains(1967))
  }

  test("directory load: one partition per gz member") {
    val df = spark.read.format("wod").load(fixtures)
    assert(df.rdd.getNumPartitions === 6) // six fixture files
    // dataset inferred from <DATASET>/<LEVEL>/<FILE> layout
    import spark.implicits._
    val ds = df.select($"dataset").distinct().as[String].collect().sorted
    assert(ds === Array("APB", "CTD", "DRB", "SUR", "XBT"))
  }

  test("column pruning reaches the wod scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("wod")
      .load(s"$fixtures/CTD/OBS/CTDO1971.gz")
      .select("castNumber", "geohash3")
    df.count()
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans.nonEmpty)
    assert(scans.head.toSet === Set("castNumber", "geohash3"),
      s"scan must read only required columns, got ${scans.head}")
    assert(df.head().getInt(0) === 19950762)
  }

  test("nested pruning at parse time: a header-only projection builds " +
      "ZERO per-depth structs, a depths projection builds them, and " +
      "the accepted-cast set is projection-independent") {
    import graft.wod.CastParser
    val f = s"$fixtures/CTD/OBS/CTDO1971.gz"
    CastParser.levelStructsBuilt.set(0L)
    val headerOnly = spark.read.format("wod").load(f)
      .select("castNumber", "geohash3")
    val nHeader = headerOnly.count()
    assert(CastParser.levelStructsBuilt.get() === 0L,
      "header-only scans must never build per-depth structs")
    // a depths-READING action (count() alone would prune depths away
    // again) must build exactly one struct per level
    val row = spark.read.format("wod").load(f)
      .selectExpr("count(*) AS n", "sum(size(depths)) AS levels")
      .head()
    val (nFull, totalLevels) = (row.getLong(0), row.getLong(1))
    assert(totalLevels > 0L &&
      CastParser.levelStructsBuilt.get() === totalLevels,
      s"a depths projection must build one struct per level " +
        s"(built ${CastParser.levelStructsBuilt.get()}, " +
        s"levels $totalLevels)")
    // validate-but-don't-allocate: the profile section is decoded in
    // both modes, so projection can never change the row set
    assert(nHeader === nFull,
      "the accepted-cast set must be identical in every projection")
    assert(headerOnly.head().getInt(0) === 19950762)
  }

  test("SQL over the wod source") {
    spark.read.format("wod").load(s"$fixtures/CTD/OBS/CTDO1971.gz")
      .createOrReplaceTempView("wod_casts")
    val row = spark.sql(
      """SELECT castNumber, size(depths) AS n_depths, geohash3
         FROM wod_casts""").head()
    assert(row.getInt(0) === 19950762)
    assert(row.getInt(1) === 562)
    assert(row.getString(2) ===
      graft.wod.Geohash.encode(67.3981, -6.3056).take(3))
  }
}
