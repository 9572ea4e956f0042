package graft.tools

/** Run a single registered query and dump its result parquet — the
  * per-query slice of graft.Verify, for fast iteration:
  * `Test/runMain graft.tools.RunOne <name> <sfDir> <outDir>`.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val query = graft.queries.Registry.byName(name)
    val df = query.fn(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // single-query oracle_sql.json so tools/crosscheck.py can compare
    // just this dump (same escaping as graft.Verify)
    query.sql.foreach { s =>
      val esc = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"""{"$name": "$esc"}""")
    }
    println(s"RUNONE_ROWS=${spark.read.parquet(s"$outDir/$name").count()}")
    spark.stop()
  }
}
