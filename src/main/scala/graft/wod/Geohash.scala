package graft.wod

/** Standard base-32 geohash encoder (public algorithm: alternating
  * longitude/latitude interval bisection, 5 bits per character).
  * Pure function — usable from executors and from the Catalyst
  * expression wrapper in graft.functions.
  */
object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Encode (lat, lon) to a geohash of `precision` characters.
    * Default 12 ≈ 3.7 cm — full precision for stable within-partition
    * sort order (reference sorts by full geohash,
    * `DatasetYearTrain.java:131`).
    */
  def encode(lat: Double, lon: Double, precision: Int = 12): String = {
    val sb = new java.lang.StringBuilder(precision)
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    var isLon = true
    var bits = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonMin = mid }
        else { ch = ch << 1; lonMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latMin = mid }
        else { ch = ch << 1; latMax = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) {
        sb.append(Base32.charAt(ch))
        bits = 0; ch = 0
      }
    }
    sb.toString
  }
}
