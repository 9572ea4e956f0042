package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // builder-side iteration: an optional 3rd arg restricts the run to
    // a comma-separated subset of query names (driver passes 2 args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q.split(',').toSet))
      case _ => sys.error("usage: Verify <sfDir> <outDir> [q1,q2,...]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must be VISIBLE, not vanish from the oracle
    // compare (r9/r10 lesson: a 22-query regression hid for two rounds
    // because the swallowed exception left no output to mismatch).
    // Failures → errors.json next to oracle_sql.json. The failed
    // query's OUTPUT DIR is removed entirely (a marker dir that isn't
    // parquet would crash a compare that globs outputs — worse than
    // one missing row is zero rows for the round).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        errors(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        val dir = new java.io.File(s"$outDir/$name") // drop partial output
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
          }
          rm(dir)
        }
      } finally
        // Queries that persist an intermediate (q20's triple-consumed
        // base) have no post-action hook to unpersist it; drop the
        // whole cache here so a 55-query session never accumulates
        // blocks across queries.
        spark.sharedState.cacheManager.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
    // loud but zero-exit: a nonzero code could make the driver discard
    // the 100+ GREEN results; errors.json carries the failures for
    // any compare that reads it (tools/crosscheck.py prints ERR rows
    // and exits nonzero).
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} of ${SparkEntry.queries.size} queries FAILED: "
          + errors.keys.mkString(", "))
  }
}
