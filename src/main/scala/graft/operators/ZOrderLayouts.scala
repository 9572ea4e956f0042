package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExpressionBridge => B, QuantileBucket, ZOrderKey}

/** Multi-dimensional data layout: z-order clustering + file-level
  * skipping (the OPTIMIZE ZORDER story, engine-native).
  *
  * A store sorted linearly on ONE column prunes well on that column
  * and not at all on any other; a 100 TB training corpus is queried by
  * time AND by user/source/shard. Z-ordering range-partitions on an
  * interleaved-bit key over per-column quantile buckets, so every
  * output file gets a TIGHT min/max box on every clustered column at
  * once, and a predicate on any single one of them skips most files.
  *
  * Scale shape: quantile boundaries are a driver-side approxQuantile
  * over ≤ a few hundred cut points (one pass, sketch-merged); the key
  * itself is a scan-local projection; the layout write is ONE range
  * exchange on the key (`repartitionByRange`) + partition-local sort —
  * the same cost as any clustered rewrite. The manifest is one
  * aggregate over the written store grouped by file (at 100 TB one
  * would read parquet footers instead of the data; the manifest
  * CONTRACT — one row per file, min/max per clustered column — is the
  * same either way, and this implementation keeps it engine-checkable).
  *
  * Skipping discipline mirrors [[GeoOps]]' over-cover + refine: the
  * manifest selects a SUPERSET of files (file-granularity min/max can
  * only over-approximate), and the caller's exact row predicate
  * refines — rows are never lost, only scans avoided.
  */
object ZOrderLayouts {

  val ManifestDir = "_zorder_manifest" // '_' prefix: invisible to scans

  /** Write `df` z-ordered on `cols` (2-4 numeric columns). `buckets`
    * quantile buckets per dimension (power of two ≤ 2^(63/n) bits is
    * not required — ids are masked), `files` target output files.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
      buckets: Int = 256, files: Int = 8): Unit = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order needs 2-4 dims, got ${cols.size}")
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // one pass, sketch-based; relativeError trades boundary precision
    // (layout quality) against sample size — never correctness
    val bounds: Seq[Array[Double]] = {
      val doubled = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      cols.map(c => doubled.stat.approxQuantile(c, probes, 0.001)
        .distinct.sorted)
    }
    // Scale every dim's bucket id to a COMMON bit width before
    // interleaving: a low-cardinality dim (few distinct quantiles)
    // would otherwise occupy fewer bits and the wide dim's high bits
    // would dominate the key — degrading the curve to a linear sort
    // on the wide dim.
    val ScaleBits = 16
    val bucketCols: Seq[Column] = cols.zip(bounds).map { case (c, b) =>
      val k = b.length + 1 // actual bucket count after dedup
      val raw = B.column(QuantileBucket(
        B.expression(col(c).cast("double")), b))
      ((raw.cast("long") * (1L << ScaleBits)) / k).cast("int")
    }
    val zkey = B.column(ZOrderKey(bucketCols.map(B.expression)))
    df.withColumn("__z", zkey)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    writeManifest(df.sparkSession, path, cols)
  }

  /** (Re)build the per-file min/max manifest for `cols` over an
    * existing store. One row per file; `_`-prefixed dir keeps it out
    * of normal scans of `path`. Min/max keep the column's NATIVE type:
    * a double image would round 63-bit nanos (> 2^53) and a min
    * rounded UP could wrongly exclude a boundary file — skipping must
    * only ever over-select.
    */
  def writeManifest(spark: SparkSession, path: String,
      cols: Seq[String]): Unit =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        cols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).head,
        cols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")

  /** The file paths whose min/max box intersects every `[lo, hi]`
    * (inclusive; pass literals of the column's own type — comparisons
    * then stay in the native domain, no lossy double round-trip). The
    * manifest filter runs as a Spark job; only matching PATHS come to
    * the driver.
    */
  def candidateFiles(spark: SparkSession, path: String,
      ranges: Seq[(String, Any, Any)]): Seq[String] = {
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)
    }.reduce(_ && _)
    spark.read.parquet(s"$path/$ManifestDir")
      .filter(pred).select("file")
      .collect().map(_.getString(0)).toSeq
  }

  /** Read only the files that can contain rows matching the ranges —
    * a SUPERSET at file granularity; apply the exact row predicate on
    * the result. Empty candidate set returns an empty frame with the
    * store's schema.
    */
  def skippingRead(spark: SparkSession, path: String,
      ranges: Seq[(String, Any, Any)]): DataFrame = {
    val matched = candidateFiles(spark, path, ranges)
    if (matched.isEmpty) {
      val schema = spark.read.parquet(path).schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    } else spark.read.parquet(matched: _*)
  }
}
