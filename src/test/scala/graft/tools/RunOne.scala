package graft.tools

/** Run one or more registered queries (comma-separated names) and dump
  * their result parquet — the per-query slice of graft.Verify, for
  * fast iteration:
  * `Test/runMain graft.tools.RunOne <name>[,<name>…] <sfDir> <outDir>`.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oracle = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val query = graft.queries.Registry.byName(name)
      val df = query.fn(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      // queries that persist an intermediate have no unpersist hook
      // (q20/sim4 pattern) — drop caches between queries like Verify
      spark.sharedState.cacheManager.clearCache()
      query.sql.foreach(oracle(name) = _)
      println(s"RUNONE_ROWS $name=" +
        spark.read.parquet(s"$outDir/$name").count())
    }
    // oracle_sql.json over the dumped queries so tools/crosscheck.py
    // can compare just these (same escaping as graft.Verify)
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    if (oracle.nonEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        oracle.map { case (n, s) => s""""$n": "${esc(s)}"""" }
          .mkString("{", ", ", "}"))
    spark.stop()
  }
}
