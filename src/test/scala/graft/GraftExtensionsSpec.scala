package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("SQL users reach the graft kernels via spark.sql.extensions") {
    // getOrCreate would hand back another suite's live session, which
    // was built WITHOUT the extensions — force a fresh context (later
    // suites lazily getOrCreate their own again)
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
                  array_norm(array(3.0d, 4.0d)) AS nrm,
                  simhash(array('the', 'cat')) AS fp,
                  shingle_array(array('a','b','c','d'), 3) AS sh,
                  minhash_signature(array('a b c'), 2) AS sig,
                  geohash_encode(67.3981d, -6.3056d) AS gh""").head()
      assert(row.getDouble(0) === 11.0)
      assert(row.getDouble(1) === 5.0)
      assert(row.getLong(2) !== 0L)
      assert(row.getSeq[String](3) === Seq("a b c", "b c d"))
      assert(row.getSeq[Long](4).length === 2)
      assert(row.getString(5) === graft.wod.Geohash.encode(67.3981, -6.3056))
    } finally spark.stop()
  }
}
