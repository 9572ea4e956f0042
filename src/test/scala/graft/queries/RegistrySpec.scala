package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Registry contract: unique names, oracle keys subset of query keys,
  * and every query executes at sf0.001 (the driver's smoke scale).
  */
class RegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("names unique; every oracle key has a query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(graft.SparkEntry.oracleSql.keySet
      .subsetOf(graft.SparkEntry.queries.keySet))
  }

  test("every bench-headline query has an oracle (a benched query " +
      "without a correctness row would be an unverified number)") {
    val benched = Registry.all.filter(_.bench)
    assert(benched.nonEmpty)
    val missing = benched.filter(_.sql.isEmpty).map(_.name)
    assert(missing.isEmpty, s"bench queries without oracle: $missing")
  }

  test("every registered query runs at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = Registry.all.flatMap { q =>
      try { q.fn(spark, dir).count(); None }
      catch { case e: Exception => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver t1 smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
