package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Reference-parity queries over the WOD ASCII fixtures (the
  * reference's own test inputs, read-only). No DuckDB oracle exists for
  * the WOD grammar (rows-only driver check); content correctness is
  * covered by CastParserSpec / RoundTripSpec / WodPipelineSpec. wod1 is
  * benched: it measures end-to-end parse+transform throughput of the
  * `wod` DataSource each round.
  */
object WodQueries {

  private val fixtures = "/root/reference/src/test/resources/wod"

  /** Parse all six fixtures through the DSv2 source; per-dataset cast
    * and measurement counts (sfDir is ignored — the WOD fixtures are
    * the dataset).
    */
  val wod1Convert = Q(
    "wod1_parse_fixtures",
    (s, _) =>
      s.read.format("wod").load(fixtures)
        .groupBy(col("dataset"))
        .agg(cnt.as("n_casts"),
          sum(size(col("depths"))).as("n_levels"),
          countDistinct(col("geohash3")).as("n_geohash3"),
          min(col("year")).as("min_year"),
          max(col("year")).as("max_year"))
        .orderBy(col("dataset")),
    sql = None,
    bench = true)

  /** Measurement-level analytics on the nested model: explode depths →
    * per-variable depth-bucket profile statistics (rows-only; content
    * gated by WodOpsSpec).
    */
  val wod2Profiles = Q(
    "wod2_profile_stats",
    (s, _) =>
      graft.wod.WodOps.profileStats(
        s.read.format("wod").load(fixtures)),
    sql = None)

  val all: Seq[Q] = Seq(wod1Convert, wod2Profiles)
}
