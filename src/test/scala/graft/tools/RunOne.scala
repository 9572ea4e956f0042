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
    val df = graft.queries.Registry.byName(name).fn(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(s"RUNONE_ROWS=${spark.read.parquet(s"$outDir/$name").count()}")
    spark.stop()
  }
}
