package graft.wod

import org.apache.spark.scheduler.{JobFailed, SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** CLI mirroring the reference's `Sparkler` option surface
  * (`Sparkler.java:33-74`):
  *
  *   --input/-i <dir|s3a://...>   WOD ASCII root (DATASET/LEVEL/ .gz files)
  *   --output/-o <dir|s3a://...>  output root
  *   --datasets/-d CSV            default APB,...,XBT (Sparkler.java:41-42)
  *   --levels/-l CSV              default OBS (Sparkler.java:43-44)
  *   --subset/-s CSV              only these file names (DatasetTrain.java:73-86)
  *   --overwrite                  redo completed stores
  *   --no-geo                     skip GeoParquet footer stamping
  *   --max-files N                concurrent file conversions (default 4)
  *
  * The reference's `-bs` batch size has no equivalent: batching bounded
  * its driver-side parse loop; our parse is executor-side and streaming.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    var cfg = WodPipeline.Config(input = null, output = null)
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--input" | "-i"    => cfg = cfg.copy(input = args(i + 1)); i += 2
        case "--output" | "-o"   => cfg = cfg.copy(output = args(i + 1)); i += 2
        case "--datasets" | "-d" =>
          cfg = cfg.copy(datasets = args(i + 1).split(",").toSeq); i += 2
        case "--levels" | "-l"   =>
          cfg = cfg.copy(levels = args(i + 1).split(",").toSeq); i += 2
        case "--subset" | "-s"   =>
          cfg = cfg.copy(subset = args(i + 1).split(",").toSeq); i += 2
        case "--overwrite"       => cfg = cfg.copy(overwrite = true); i += 1
        case "--no-geo"          => cfg = cfg.copy(geoMetadata = false); i += 1
        case "--max-files"       =>
          cfg = cfg.copy(maxConcurrentFiles = args(i + 1).toInt); i += 2
        case other => sys.error(s"unknown option: $other")
      }
    }
    require(cfg.input != null && cfg.output != null,
      "usage: Cli --input <dir> --output <dir> [--datasets CSV] " +
        "[--levels CSV] [--subset CSV] [--overwrite] [--no-geo]")

    val spark = GraftSession.getOrCreate()
    attachFailFast(spark)
    val results = WodPipeline.run(spark, cfg)
    val (casts, errors) = (results.map(_.casts).sum, results.map(_.errors).sum)
    println(s"[wod] done: ${results.size} files, $casts casts, $errors errors")
    spark.stop()
  }

  /** Fail-fast listener (reference C4, `Sparkler.java:90-100`): any
    * failed Spark job aborts the application non-zero.
    */
  def attachFailFast(spark: SparkSession): Unit =
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(end: SparkListenerJobEnd): Unit = end.jobResult match {
        case JobFailed(e) =>
          System.err.println(s"[wod] job ${end.jobId} failed, aborting: $e")
          spark.sparkContext.stop(1)
        case _ => ()
      }
    })
}
