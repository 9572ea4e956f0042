package graft.tools

import org.apache.spark.sql.functions._

/** Scale evidence for the batch GRAFT_BM25 form: N queries served by
  * ONE table-driven statement vs N literal-form statements (the only
  * pre-batch option). Both forms produce identical per-query rows
  * (spec-gated in GraftCommandsSpec); this measures the cost shape —
  * the literal loop re-scans the postings and re-plans per query,
  * the batch form pays one plan and one postings pass for the batch.
  */
object BatchBm25Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(64)
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val idx = graft.queries.TextQueries.ensureTextIndex(spark, sfDir)
    // deterministic query batch: n two-term combinations cycled over
    // the corpus vocabulary (the synthetic corpus has a small fixed
    // word list, so distinct pairings, not distinct terms, scale n)
    val vocab = spark.table(idx).groupBy("term")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(2 * n)
      .select("term").as[String].collect()
    val v = vocab.length
    val qs = (0 until n).map(i =>
      (i.toLong, s"${vocab(i % v)} ${vocab((i * 7 + 3) % v)}"))
    qs.toDF("query_id", "terms").createOrReplaceTempView("bm25_bench_q")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    def literalLoop(): Long = qs.map { case (_, terms) =>
      spark.sql(
        s"SELECT doc_id, score FROM GRAFT_BM25('$idx', '$terms', 10)")
        .count()
    }.sum
    def batch(): Long = spark.sql(
      s"SELECT query_id, doc_id, score, rank FROM " +
        s"GRAFT_BM25('$idx', 'bm25_bench_q', 10)").count()

    // warm both paths once, then min-of-3
    literalLoop(); batch()
    val litRuns = (1 to 3).map(_ => time(literalLoop()))
    val batRuns = (1 to 3).map(_ => time(batch()))
    val lmin = litRuns.map(_._1).min
    val bmin = batRuns.map(_._1).min
    println(f"BATCH_BM25 n=$n literal_loop_min=$lmin%.3f " +
      f"batch_min=$bmin%.3f speedup=${lmin / bmin}%.2f " +
      s"literal_rows=${litRuns.head._2} batch_rows=${batRuns.head._2} " +
      s"lit=${litRuns.map(t => f"${t._1}%.3f").mkString(",")} " +
      s"bat=${batRuns.map(t => f"${t._1}%.3f").mkString(",")}")
    spark.stop()
  }
}
