package graft.wod

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Completeness differ (SURVEY §2.1 S14; reference
  * `OsPoolS3Lister.java:73-125`): the reference reads an expected
  * conversion list, pages the produced S3 listing, and set-diffs on
  * the driver. Here both sides are relations and the difference is a
  * left-anti join — the expected side comes straight from
  * [[WodPipeline.plan]] (the same metadata listing the conversion
  * itself plans from, so the two can never disagree on naming), and
  * "produced" means the store passes the resume predicate (`_SUCCESS`
  * present, no `_temporary` crash residue) — a store that half-wrote
  * counts as missing, exactly like a resume would treat it.
  */
object Differ {

  /** Expected conversions not complete in the output. One row per
    * missing (dataset, level, file) with its target store path.
    */
  def missing(spark: SparkSession, cfg: WodPipeline.Config): DataFrame = {
    import spark.implicits._
    val fs = new Path(cfg.output).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def qualified(s: String): String =
      fs.makeQualified(new Path(s)).toString
    val expected = WodPipeline.plan(spark, cfg)
      .map(t => (t.dataset, t.level, new Path(t.src).getName,
        qualified(t.outStore)))
      .toDF("dataset", "level", "file", "out_store")
    val glob = new Path(s"${cfg.output}/yearly/*/*/*.parquet/_SUCCESS")
    val produced = Option(fs.globStatus(glob)).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.getParent)
      .filter(p => !fs.exists(new Path(p, "_temporary")))
      .map(_.toString)
      .toDF("out_store")
    expected.join(produced, Seq("out_store"), "left_anti")
      .select("dataset", "level", "file", "out_store")
      .orderBy("dataset", "level", "file")
  }

  /** Bulk-store completeness: expected source files with NO cast (and
    * no error row) in a [[WodPipeline.convertBulk]] store. Bulk
    * commits per (dataset, level) sub-run, so the differ reads only
    * COMPLETED sub-stores (`_SUCCESS`, no `_temporary` residue) — a
    * partially-converted corpus reports exactly the files of the
    * sub-runs that have not committed, plus any file that committed
    * sub-runs somehow missed. Within a completed sub-store the
    * question is "did every planned input contribute rows", answered
    * from the `src_file` provenance column — a left-anti join of the
    * plan against the union of cast and error provenance. A file
    * whose every cast errored still counts as processed (it has error
    * rows); a file missing entirely (e.g. added after the run) shows
    * up here.
    */
  def missingInBulk(spark: SparkSession,
      cfg: WodPipeline.Config): DataFrame = {
    import spark.implicits._
    val fs = new Path(cfg.output).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def qualified(s: String): String =
      fs.makeQualified(new Path(s)).toString
    val expected = WodPipeline.plan(spark, cfg)
      .map(t => (t.dataset, t.level, new Path(t.src).getName,
        qualified(t.src)))
      .toDF("dataset", "level", "file", "src_file")
    val castStore = s"${cfg.output}/bulk/casts"
    val errStore = s"${cfg.output}/bulk/errors"
    val subGlob = new Path(s"$castStore/dataset=*/level=*/_SUCCESS")
    val done = Option(fs.globStatus(subGlob)).map(_.toSeq)
      .getOrElse(Seq.empty)
      .map(_.getPath.getParent)
      .filter(p => !fs.exists(new Path(p, "_temporary")))
    if (done.isEmpty)
      return expected.orderBy("dataset", "level", "file") // nothing done
    def relErr(sub: Path) = new Path(new Path(errStore,
      sub.getParent.getName), sub.getName) // dataset=DS/level=LVL
    val errDirs = done.map(relErr).filter(fs.exists(_)).map(_.toString)
    // basePath anchors partition discovery at the store root: the
    // sub-store roots passed here sit BELOW dataset=/level= segments,
    // and without it Spark infers conflicting partition roots and
    // throws CONFLICTING_DIRECTORY_STRUCTURES as soon as two sub-runs
    // have committed.
    val casts = spark.read.option("basePath", castStore)
      .parquet(done.map(_.toString): _*).select("src_file")
    val produced =
      if (errDirs.isEmpty) casts
      else casts.unionAll(
        spark.read.option("basePath", errStore)
          .parquet(errDirs: _*).select("src_file"))
    expected.join(produced.distinct(), Seq("src_file"), "left_anti")
      .select("dataset", "level", "file", "src_file")
      .orderBy("dataset", "level", "file")
  }

  /** Runnable tool: `Differ <input> <output> <reportFile>` writes one
    * `dataset,level,file` line per missing conversion (the reference's
    * report format), empty file = complete.
    */
  def main(args: Array[String]): Unit = {
    val (input, output, report) = args match {
      case Array(i, o, r) => (i, o, r)
      case _ => sys.error("usage: Differ <input> <output> <reportFile>")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // only stop the session if this main created it (getOrCreate may
    // hand back a caller's session, e.g. under the test runner)
    val preExisting =
      org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = missing(spark, WodPipeline.Config(input, output)).collect()
    val lines = rows.map(r =>
      s"${r.getString(0)},${r.getString(1)},${r.getString(2)}")
    val p = java.nio.file.Paths.get(report)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", if (lines.isEmpty) "" else "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[differ] ${lines.length} missing conversions -> $report")
    if (!preExisting) spark.stop()
  }
}
