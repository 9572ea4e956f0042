package graft.tools

/** Optimization-round plan artifacts: writes the FULL
  * `explain("formatted")` output of every bench headline query to
  * `plans/<tag>/<name>_<suffix>.txt` (e.g. `plans/r20/q4_before.txt`)
  * so plan-shape claims in OPTIMIZATION_r*.md are checkable without
  * running Spark.
  *
  * Usage: `Test/runMain graft.tools.PlanSnap r20 before [q1,q2,...]`
  * — sf0.001 (same SF as PLANS.md; shapes, not sizes, are the claim).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val (tag, suffix, only) = args match {
      case Array(t, s)    => (t, s, None)
      case Array(t, s, q) => (t, s, Some(q.split(',').toSet))
      case _ => sys.error("usage: PlanSnap <tag> <suffix> [q1,q2,...]")
    }
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    for (q <- graft.queries.Registry.all.filter(_.bench)
        if only.forall(_.contains(q.name))) {
      try {
        val df = q.fn(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          dir.resolve(s"${q.name}_$suffix.txt"), plan)
        println(s"wrote ${q.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"FAILED ${q.name}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
