package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BucketedStores, SketchStats, TextDedupOps}

/** Gates the GRAFT SQL command namespace
  * ([[org.apache.spark.sql.graft.GraftCommandParser]]): ANALYZE must
  * produce exactly the API's stats (and arm the join-planning rule),
  * VACUUM must reclaim exactly what the API reclaims under the same
  * guards, malformed statements must fail loudly with the expected
  * shape, and the namespace must not disturb any other SQL.
  */
class GraftCommandsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private def tmp() = Files.createTempDirectory("graft_cmd").toString

  override def afterAll(): Unit = spark.stop()

  test("GRAFT ANALYZE <table> KEY <col> writes the stats the API " +
      "writes and returns them as the result row") {
    spark.range(5000L).select((col("id") % 250).as("k"))
      .write.option("path", tmp()).saveAsTable("cmd_fact")
    val row = spark.sql("GRAFT ANALYZE cmd_fact KEY k").head()
    // stats identity is the FULLY-QUALIFIED name (db.table): an
    // unqualified ANALYZE resolves against the current database
    assert(row.getString(0) === "default.cmd_fact" &&
      row.getString(1) === "k")
    assert(row.getLong(2) === 5000L)
    assert(row.getLong(4) === 8L + 8L * 1024 * 3) // w=1024 d=3 matrix
    val s = SketchStats.read(spark, "cmd_fact").get
    assert(s.nRows === 5000L && s.keyCol === "k")
    assert(spark.catalog.tableExists("cmd_fact__kstats"))
    spark.sql("DROP TABLE cmd_fact")
    spark.sql("DROP TABLE cmd_fact__kstats")
  }

  test("GRAFT VACUUM reclaims exactly the unreferenced store dirs, " +
      "age guard spelled OLDER THAN <n> HOURS") {
    import spark.implicits._
    val root = Files.createTempDirectory("cmd_vac")
    val name = "cmd_vac_store"
    BucketedStores.dropVersioned(spark, name)
    TextDedupOps.writeLshIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", name, numHashes = 8, bands = 4, buckets = 2,
      location = Some(root.resolve("graft_cmd_a").toString))
    BucketedStores.adoptVersioned(spark, name)
    BucketedStores.compactAtomic(spark, name, Seq("band", "bhash"),
      Seq("band", "bhash"), buckets = 2,
      location = Some(root.resolve("graft_cmd_b").toString))
    // the retired generation's dir leaks until vacuumed; the age
    // guard holds it first
    assert(spark.sql(
      s"GRAFT VACUUM '${root}' OLDER THAN 1 HOURS").count() === 0L)
    val deleted = spark.sql(
      s"GRAFT VACUUM '${root}' OLDER THAN 0 HOURS")
      .collect().map(_.getString(0))
    assert(deleted.length === 1 && deleted.head.endsWith("graft_cmd_a"),
      s"exactly the retired generation reclaims, got ${deleted.toSeq}")
    assert(spark.table(name).count() > 0,
      "serving must be unaffected")
    BucketedStores.dropVersioned(spark, name)
  }

  test("malformed GRAFT statements fail loudly; the namespace claims " +
      "only a leading GRAFT token") {
    val ex1 = intercept[AnalysisException] {
      spark.sql("GRAFT ANALYZE missing_the_key_clause")
    }
    assert(ex1.getMessage.contains("GRAFT ANALYZE <table> KEY"),
      ex1.getMessage)
    val ex2 = intercept[AnalysisException] {
      spark.sql("GRAFT FROBNICATE x")
    }
    assert(ex2.getMessage.contains("unknown GRAFT command"),
      ex2.getMessage)
    val ex3 = intercept[AnalysisException] {
      spark.sql("GRAFT VACUUM unquoted/path")
    }
    assert(ex3.getMessage.contains("GRAFT VACUUM '<root>'"),
      ex3.getMessage)
    // a table NAMED graft is untouched (not a leading token)
    spark.range(3).select(col("id").as("k"))
      .write.option("path", tmp()).saveAsTable("graft")
    assert(spark.sql("SELECT count(*) c FROM graft").head()
      .getLong(0) === 3L)
    spark.sql("DROP TABLE graft")
  }
}
