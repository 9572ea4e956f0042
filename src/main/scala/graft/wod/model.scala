package graft.wod

/** Parquet row model for a WOD cast — the canonical row-per-cast,
  * nested-array schema (SURVEY.md §1.2; mirrors the semantics of the
  * reference's `edu.colorado.cires.wod.parquet.model.Cast` bean used at
  * reference `DatasetYearTrain.java:14,214`, re-derived as a Scala
  * product for `Encoders.product`).
  *
  * One row per cast; per-depth measurements nested (NOT row-per-
  * measurement). `geohash` is the full-precision (12-char) geohash of
  * the cast location, `geohash3 = geohash.take(3)` is the output
  * partition key (reference `DatasetYearTrain.java:130-137`).
  * `geometry` is a WKB-encoded WGS-84 point (our Sedona-free GeoParquet
  * representation, SURVEY.md §7.4).
  */
final case class Cast(
    dataset: String,
    castNumber: Int,
    cruiseNumber: Int,
    country: String,
    originatorsCruise: String,      // character-data type 1 (null if absent)
    originatorsStationCode: String, // character-data type 2 (null if absent)
    latitude: Double,
    longitude: Double,
    year: Int,
    month: Int,
    day: Int,
    time: java.lang.Double,         // decimal hours UTC; nullable
    timestamp: java.lang.Long,      // epoch millis (midnight + time); nullable
    geohash: String,
    geohash3: String,
    geometry: Array[Byte],          // WKB point (lon, lat), WGS-84
    attributes: Seq[Attribute],             // secondary header entries
    biologicalAttributes: Seq[Attribute],   // biological header entries
    taxonomicDatasets: Seq[Seq[TaxonomicItem]],
    principalInvestigators: Seq[PrincipalInvestigator],
    variables: Seq[Variable],
    depths: Seq[Depth])

/** Coded numeric attribute (secondary / biological header entry). */
final case class Attribute(code: Int, value: Double)

/** One entry of one taxonomic set (code, value, QC + originator flags). */
final case class TaxonomicItem(code: Int, value: Double, qcFlag: Int,
    originatorsFlag: Int)

/** PI assignment: which measured variable, and the PI (WOD PI code,
  * carried as string per the reference row model).
  */
final case class PrincipalInvestigator(variable: Int, pi: String)

/** Variable-level metadata entry. */
final case class Metadata(code: Int, value: Double)

/** A measured variable of the cast: WOD variable code (1=temperature,
  * 2=salinity, ...), whole-profile QC flag, variable metadata.
  */
final case class Variable(code: Int, qcFlag: Int, metadata: Seq[Metadata])

/** One measurement of one variable at one depth. */
final case class ProfileData(variableCode: Int, value: Double, qcFlag: Int,
    originatorsFlag: Int)

/** One depth level: depth in meters, flags, and the per-variable
  * measurements present at this level.
  */
final case class Depth(depth: java.lang.Double, depthErrorFlag: Int,
    originatorsFlag: Int, data: Seq[ProfileData])

/** Error side-channel row (reference `CastError.java:16-22`): one row
  * per cast that failed parse or transform; the job continues
  * (C5 per-cast error isolation, `DatasetYearTrain.java:190-192`).
  */
final case class CastError(dataset: String, castNumber: Int, error: String)
