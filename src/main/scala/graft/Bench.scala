package graft

import java.nio.file.{Files, Paths}

import graft.queries.Registry

/** Benchmark main: runs the headline (bench=true) queries at
  * SPARK_GRAFT_SF_DIR and emits one JSON metrics line for the driver.
  * Each query is fully executed (count() forces the whole plan); a
  * warm-up pass on sf0.001 primes the JVM/codegen so the measured
  * numbers reflect steady-state throughput, not JIT warmup.
  *
  * The metrics line is written to BENCH.json (cwd) in addition to
  * stdout — sbt interleaves its own logging with stdout, so a file is
  * the reliable channel for the driver's parser.
  *
  * A query that throws is recorded in an `errors` map (name → message)
  * and contributes NO timing — a failure must never masquerade as a
  * fast run.
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
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    headline.foreach { q =>
      val t0 = System.nanoTime()
      try {
        q.fn(spark, sfDir).count()
        timings(q.name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
      }
    }
    val qs = timings.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
