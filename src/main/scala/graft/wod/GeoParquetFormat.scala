package graft.wod

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.api.WriteSupport.WriteContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType

/** Parquet write-support that stamps the GeoParquet `geo` key-value
  * footer entry AT WRITE TIME, so the engine's core output path writes
  * each byte exactly once.
  *
  * The previous design (retained as a resume-safe fallback in
  * [[GeoParquet.addFooterMetadata]]) post-processed every part file
  * with `ParquetFileWriter.appendFile` — a full byte copy that doubled
  * write I/O on the conversion path: at 100 TB of output that is
  * 100 TB written twice. Injecting the footer through the standard
  * `WriteSupport.init` extra-metadata map costs nothing: parquet-mr
  * merges the map into the footer it writes anyway on `close()`.
  *
  * Reference parity: the reference gets the same footer from Sedona's
  * `geoparquet` format (`DatasetYearTrain.java:41-42,131-137`); this is
  * the Sedona-free equivalent with identical footer content.
  */
class GeoParquetWriteSupport extends ParquetWriteSupport {
  override def init(configuration: Configuration): WriteContext = {
    val ctx = super.init(configuration)
    val geo = configuration.get(GeoParquetFileFormat.GeoJsonConfKey)
    if (geo == null) ctx
    else {
      val md = new java.util.HashMap[String, String](ctx.getExtraMetaData)
      md.put("geo", geo)
      new WriteContext(ctx.getSchema, md)
    }
  }
}

/** A thin `parquet` FileFormat variant whose only delta is swapping in
  * [[GeoParquetWriteSupport]] and carrying the `geo` footer JSON from a
  * write option into the task-side Hadoop conf. Read path, compression,
  * committers, partitioning — all inherited untouched, so files it
  * produces are plain parquet readable by any engine.
  *
  * Use: `df.write.format(classOf[GeoParquetFileFormat].getName)
  * .option(GeoParquetFileFormat.GeoJsonOption, geoJson).save(path)`.
  */
class GeoParquetFileFormat extends ParquetFileFormat {

  override def shortName(): String = "geoparquet"

  override def toString: String = "GeoParquet"

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    // after super: overrides the write-support class super just set.
    // The job conf is serialized into the write description AFTER
    // prepareWrite returns, so task-side record writers see both.
    ParquetOutputFormat.setWriteSupportClass(job, classOf[GeoParquetWriteSupport])
    options.get(GeoParquetFileFormat.GeoJsonOption).foreach { json =>
      job.getConfiguration.set(GeoParquetFileFormat.GeoJsonConfKey, json)
    }
    factory
  }
}

object GeoParquetFileFormat {
  /** Write option (lower-case: datasource options are case-folded). */
  val GeoJsonOption = "geojson"
  /** Hadoop-conf key carrying the footer JSON to executor tasks. */
  val GeoJsonConfKey = "graft.wod.geoparquet.json"
}
