package graft.wod

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.api.WriteSupport.{FinalizedWriteContext, WriteContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.types.{DataType, DoubleType, StructType}

/** Parquet write-support that stamps the GeoParquet `geo` key-value
  * footer entry AT WRITE TIME, so the engine's core output path writes
  * each byte exactly once.
  *
  * Two modes:
  *
  *  - **explicit** (`geojson` option): the caller supplies the full
  *    footer JSON; it is injected through `WriteSupport.init`'s
  *    extra-metadata map — parquet-mr merges it into the footer it
  *    writes anyway on `close()`. Every part file gets the same
  *    (caller-computed, store-wide) bbox.
  *  - **auto** (`geobbox=auto` option): each part file accumulates the
  *    min/max of its own `longitude`/`latitude` columns as rows stream
  *    through `write()` and emits its TRUE per-file bbox from
  *    `finalizeWrite()` (parquet-mr merges finalized metadata into the
  *    footer too). This is both tighter metadata than a store-wide
  *    bbox — the GeoParquet spec's bbox is per-file — and removes the
  *    need for any pre-write extent pass: the conversion pipeline's
  *    separate stats job disappears (one Spark job per input file
  *    instead of two).
  *
  * The previous design (retained as a resume-safe fallback in
  * [[GeoParquet.addFooterMetadata]]) post-processed every part file
  * with `ParquetFileWriter.appendFile` — a full byte copy that doubled
  * write I/O on the conversion path: at 100 TB of output that is
  * 100 TB written twice.
  *
  * Reference parity: the reference gets the same footer from Sedona's
  * `geoparquet` format (`DatasetYearTrain.java:41-42,131-137`); this is
  * the Sedona-free equivalent with identical footer content.
  */
class GeoParquetWriteSupport extends ParquetWriteSupport {

  private var autoBbox = false
  private var lonOrdinal = -1
  private var latOrdinal = -1
  private var minLon = Double.PositiveInfinity
  private var minLat = Double.PositiveInfinity
  private var maxLon = Double.NegativeInfinity
  private var maxLat = Double.NegativeInfinity
  private var sawPoint = false

  override def init(configuration: Configuration): WriteContext = {
    val ctx = super.init(configuration)
    val geo = configuration.get(GeoParquetFileFormat.GeoJsonConfKey)
    if (configuration.getBoolean(GeoParquetFileFormat.GeoAutoConfKey, false)) {
      // Locate top-level double lon/lat columns in the file's data
      // schema (partition columns are already excluded by Spark).
      val schemaJson = configuration.get(
        ParquetWriteSupport.SPARK_ROW_SCHEMA)
      if (schemaJson != null) {
        DataType.fromJson(schemaJson) match {
          case st: StructType =>
            lonOrdinal = st.fieldNames.indexOf("longitude")
            latOrdinal = st.fieldNames.indexOf("latitude")
            autoBbox = lonOrdinal >= 0 && latOrdinal >= 0 &&
              st(lonOrdinal).dataType == DoubleType &&
              st(latOrdinal).dataType == DoubleType
          case _ => ()
        }
      }
    }
    if (geo == null) ctx
    else {
      val md = new java.util.HashMap[String, String](ctx.getExtraMetaData)
      md.put("geo", geo)
      new WriteContext(ctx.getSchema, md)
    }
  }

  override def write(row: InternalRow): Unit = {
    if (autoBbox && !row.isNullAt(lonOrdinal) && !row.isNullAt(latOrdinal)) {
      val lon = row.getDouble(lonOrdinal)
      val lat = row.getDouble(latOrdinal)
      if (lon < minLon) minLon = lon
      if (lon > maxLon) maxLon = lon
      if (lat < minLat) minLat = lat
      if (lat > maxLat) maxLat = lat
      sawPoint = true
    }
    super.write(row)
  }

  override def finalizeWrite(): FinalizedWriteContext = {
    if (autoBbox && sawPoint) {
      val md = new java.util.HashMap[String, String]()
      md.put("geo", GeoParquet.geoJson((minLon, minLat, maxLon, maxLat)))
      new FinalizedWriteContext(md)
    } else new FinalizedWriteContext(new java.util.HashMap[String, String]())
  }
}

/** A thin `parquet` FileFormat variant whose only delta is swapping in
  * [[GeoParquetWriteSupport]] and carrying the `geo` footer options
  * from write options into the task-side Hadoop conf. Read path,
  * compression, committers, partitioning — all inherited untouched, so
  * files it produces are plain parquet readable by any engine.
  *
  * Use: `df.write.format(classOf[GeoParquetFileFormat].getName)
  * .option(GeoParquetFileFormat.GeoAutoOption, "auto").save(path)`
  * (per-file true bbox) or `.option(GeoParquetFileFormat.GeoJsonOption,
  * json)` (explicit store-wide footer).
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
    if (options.get(GeoParquetFileFormat.GeoAutoOption).exists(
        _.equalsIgnoreCase("auto")))
      job.getConfiguration.setBoolean(GeoParquetFileFormat.GeoAutoConfKey, true)
    factory
  }
}

object GeoParquetFileFormat {
  /** Write option (lower-case: datasource options are case-folded). */
  val GeoJsonOption = "geojson"
  /** Write option: `auto` = per-file true bbox from the lon/lat data. */
  val GeoAutoOption = "geobbox"
  /** Hadoop-conf key carrying the footer JSON to executor tasks. */
  val GeoJsonConfKey = "graft.wod.geoparquet.json"
  /** Hadoop-conf key enabling per-file auto-bbox accumulation. */
  val GeoAutoConfKey = "graft.wod.geoparquet.auto"
}
