package graft.wod

import java.nio.{ByteBuffer, ByteOrder}
import java.time.{LocalDate, ZoneOffset}

/** Pure per-cast transform: wire model → parquet row model (the role of
  * the reference's `WodAsciiParquetTransformer.parquetFromAscii`,
  * `DatasetYearTrain.java:185`): timestamp assembly, geohash encoding,
  * WKB geometry, flag/attribute mapping. Returns Left for casts that
  * cannot form a valid output row (error side-channel, C5).
  */
object Transform {

  /** WKB little-endian 2D point (lon, lat) — our Sedona-free GeoParquet
    * geometry representation (SURVEY.md §7.4).
    */
  def wkbPoint(lon: Double, lat: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte)      // little-endian
    bb.putInt(1)          // geometry type: Point
    bb.putDouble(lon)
    bb.putDouble(lat)
    bb.array()
  }

  /** Epoch millis for the cast's UTC date + decimal-hours time; None if
    * the date components are invalid.
    */
  def epochMillis(year: Int, month: Int, day: Int,
      time: Option[Double]): Option[Long] = {
    if (month < 1 || month > 12 || day < 1 || day > 31 || year < 1) None
    else
      try {
        val midnight = LocalDate.of(year, month, day)
          .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
        val hours = time.getOrElse(0.0)
        Some(midnight + math.round(hours * 3600 * 1000))
      } catch { case _: java.time.DateTimeException => None }
  }

  def toCast(dataset: String, a: AsciiCast): Either[CastError, Cast] = {
    (a.latitude, a.longitude) match {
      case (Some(lat), Some(lon))
          if lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180 =>
        val gh = Geohash.encode(lat, lon)
        Right(Cast(
          dataset = dataset,
          castNumber = a.castNumber,
          cruiseNumber = a.cruise,
          country = a.country,
          originatorsCruise = a.originatorsCruise.orNull,
          originatorsStationCode = a.originatorsStation.orNull,
          latitude = lat,
          longitude = lon,
          year = a.year,
          month = a.month,
          day = a.day,
          time = a.time.map(java.lang.Double.valueOf).orNull,
          timestamp = epochMillis(a.year, a.month, a.day, a.time)
            .map(java.lang.Long.valueOf).orNull,
          geohash = gh,
          geohash3 = gh.take(3),
          geometry = wkbPoint(lon, lat),
          attributes = a.secondary.map(s => Attribute(s.code, s.value)),
          biologicalAttributes = a.biological.map(b => Attribute(b.code, b.value)),
          taxonomicDatasets = a.taxa.map(_.map(t =>
            TaxonomicItem(t.code, t.value, t.qcFlag, t.originatorsFlag))),
          principalInvestigators = a.pis.map(p =>
            PrincipalInvestigator(p.variable, p.piCode.toString)),
          variables = a.variables.map(v =>
            Variable(v.code, v.qcFlag, v.metadata.map(m =>
              Metadata(m.code, m.value)))),
          depths = a.profile.map(l => Depth(
            l.depth.map(java.lang.Double.valueOf).orNull,
            l.depthErrorFlag, l.originatorsFlag,
            l.data.map(m => ProfileData(m.variableCode, m.value, m.qcFlag,
              m.originatorsFlag))))))
      case _ =>
        Left(CastError(dataset, a.castNumber,
          s"cast ${a.castNumber}: missing or out-of-range location " +
            s"(lat=${a.latitude}, lon=${a.longitude})"))
    }
  }
}
