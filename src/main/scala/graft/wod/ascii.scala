package graft.wod

/** Wire-level model of one parsed WOD ASCII cast record, close to the
  * NOAA WOD native format (re-derived from the public WOD format
  * documentation + the reference's fixture files; the reference reads
  * this format via its external `wod-ascii-parquet-transformer` dep,
  * `DatasetYearTrain.java:141-146,182-185`).
  */
final case class AsciiCast(
    castNumber: Int,
    country: String,
    cruise: Int,
    year: Int,
    month: Int,
    day: Int,
    time: Option[Double],
    latitude: Option[Double],
    longitude: Option[Double],
    levels: Int,
    profileType: Int,
    variables: Seq[AsciiVariable],
    originatorsCruise: Option[String],
    originatorsStation: Option[String],
    pis: Seq[AsciiPi],
    secondary: Seq[AsciiAttr],
    biological: Seq[AsciiAttr],
    taxa: Seq[Seq[AsciiTaxon]],
    profile: Seq[AsciiLevel])

final case class AsciiVariable(code: Int, qcFlag: Int, metadata: Seq[AsciiAttr])
final case class AsciiAttr(code: Int, value: Double)
final case class AsciiPi(variable: Int, piCode: Int)
final case class AsciiTaxon(code: Int, value: Double, qcFlag: Int,
    originatorsFlag: Int)
final case class AsciiMeasurement(variableCode: Int, value: Double,
    qcFlag: Int, originatorsFlag: Int)
final case class AsciiLevel(depth: Option[Double], depthErrorFlag: Int,
    originatorsFlag: Int, data: Seq[AsciiMeasurement])

final class WodParseException(msg: String) extends RuntimeException(msg)
