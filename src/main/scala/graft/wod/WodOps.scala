package graft.wod

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Analytics views over converted WOD data (SURVEY §7.4: keep the
  * row-per-cast nested model as the storage contract, and provide an
  * exploded measurement view for analytics).
  */
object WodOps {

  /** Measurement-level view: one row per (cast, depth, variable)
    * observation. Two generator expansions, no shuffle — downstream
    * aggregations decide their own keys.
    */
  def measurements(casts: DataFrame): DataFrame =
    casts.select(col("dataset"), col("castNumber"), col("year"),
      col("latitude"), col("longitude"), col("geohash3"),
      explode(col("depths")).as("d"))
      .select(col("dataset"), col("castNumber"), col("year"),
        col("latitude"), col("longitude"), col("geohash3"),
        col("d.depth").as("depth"),
        col("d.depthErrorFlag").as("depthErrorFlag"),
        explode(col("d.data")).as("m"))
      .select(col("dataset"), col("castNumber"), col("year"),
        col("latitude"), col("longitude"), col("geohash3"), col("depth"),
        col("depthErrorFlag"),
        col("m.variableCode").as("variableCode"),
        col("m.value").as("value"),
        col("m.qcFlag").as("qcFlag"),
        col("m.originatorsFlag").as("originatorsFlag"))

  /** Completeness differ (SURVEY §2.1 S14, the reference's
    * `OsPoolS3Lister` set difference re-expressed relationally):
    * expected (dataset, year) conversions minus those present in the
    * output — EXCEPT semantics via left-anti join (no driver-side
    * set materialization; both sides can be arbitrarily large).
    */
  def missingConversions(expected: DataFrame, produced: DataFrame): DataFrame =
    expected.join(produced,
      expected("dataset") === produced("dataset") &&
        expected("year") === produced("year"),
      "left_anti")

  /** Depth-bucketed per-variable profile statistics (the classic
    * oceanographic rollup: mean measurement by depth layer).
    */
  def profileStats(casts: DataFrame, bucketMeters: Int = 100): DataFrame =
    measurements(casts)
      .filter(col("depth").isNotNull && col("qcFlag") === 0)
      .withColumn("depth_bucket",
        (floor(col("depth") / bucketMeters) * bucketMeters).cast("long"))
      .groupBy(col("dataset"), col("variableCode"), col("depth_bucket"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .withColumn("mean_value", col("sum_value") / col("n_obs"))
      .orderBy(col("dataset"), col("variableCode"), col("depth_bucket"))
}
