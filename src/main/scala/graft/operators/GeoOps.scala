package graft.operators

/** Pure driver-side geo query planning: decompose a latitude/longitude
  * bounding box into a cover set of geohash PREFIX RANGES — the
  * `geohash >= lo AND geohash < hi` conjuncts that
  * [[graft.plans.InferGeohashPartitionFilter]]'s range inference turns
  * into geohash3 partition pruning (wod7 consumes such ranges; this is
  * the operator that emits them, closing the loop: a user asks for a
  * lat/lon box, the engine prunes the store to the touched cells).
  *
  * Standard public technique (geohash bbox covering, as in
  * Elasticsearch/Lucene geo queries and the original geohash.org
  * notes): recursively subdivide base-32 cells; a cell fully inside
  * the box is emitted whole (coarse prefix), a partially-overlapping
  * cell recurses to `depth`, where it is emitted as a sound
  * OVER-cover. Prefixing is lexicographic-order preserving (the
  * base-32 alphabet is ASCII-ascending), so prefix p covers exactly
  * the geohashes in [p, successor(p)).
  *
  * Everything here is driver-side planning math over at most
  * 32^depth cells — the data never moves; the emitted ranges become
  * scan predicates.
  */
object GeoOps {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Half-open cell box [latMin, latMax) × [lonMin, lonMax) — matching
    * the encoder's `>= mid` bisection (a point on a cell's upper edge
    * encodes into the NEXT cell, except at the +90/+180 extremes which
    * stay in the last cell).
    */
  final case class CellBounds(latMin: Double, latMax: Double,
      lonMin: Double, lonMax: Double)

  /** Decode the cell bounds of a geohash prefix (inverse of
    * [[graft.wod.Geohash.encode]]'s bisection walk).
    */
  def cellBounds(prefix: String): CellBounds = {
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    var isLon = true
    prefix.foreach { c =>
      val idx = Base32.indexOf(c)
      require(idx >= 0, s"'$c' is not a base-32 geohash character")
      var bit = 4
      while (bit >= 0) {
        val hi = ((idx >> bit) & 1) == 1
        if (isLon) {
          val mid = (lonMin + lonMax) / 2
          if (hi) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (hi) latMin = mid else latMax = mid
        }
        isLon = !isLon
        bit -= 1
      }
    }
    CellBounds(latMin, latMax, lonMin, lonMax)
  }

  /** Exclusive upper bound of prefix `p`'s range: the base-32
    * successor (increment the last non-'z' char, dropping trailing
    * 'z's). All-'z' has no base-32 successor; "{" sorts after every
    * base-32 string and keeps the range closed-form.
    */
  def prefixUpper(p: String): String = {
    val i = p.lastIndexWhere(_ != 'z')
    if (i < 0) "{"
    else p.substring(0, i) + Base32.charAt(Base32.indexOf(p.charAt(i)) + 1)
  }

  /** Cover the closed box [minLat, maxLat] × [minLon, maxLon] with
    * disjoint, sorted geohash ranges `[lo, hi)`:
    *
    *   - COVER: every point in the box has its (any-precision ≥ depth)
    *     geohash inside exactly one range — the ranges are a superset
    *     of the box (boundary cells over-cover; compose with the exact
    *     lat/lon predicate for exact semantics, the ranges' job is
    *     PRUNING).
    *   - DISJOINT: emitted prefixes are never nested (a fully-inside
    *     cell doesn't recurse), so ranges never overlap; exact-adjacent
    *     ranges are merged.
    *
    * `depth` bounds both the cover's resolution and its size (≤ the
    * box's boundary-cell count at that depth); match it to the store's
    * partition-cell length or coarser — the pruning rule infers
    * geohash3 bounds from ANY bound length.
    */
  def bboxToGeohashRanges(minLat: Double, maxLat: Double,
      minLon: Double, maxLon: Double,
      depth: Int = 3): Seq[(String, String)] = {
    require(depth >= 1 && depth <= 12, s"depth $depth out of [1,12]")
    require(minLat <= maxLat && minLon <= maxLon,
      s"degenerate box [$minLat,$maxLat]×[$minLon,$maxLon]")
    require(minLat >= -90 && maxLat <= 90 &&
      minLon >= -180 && maxLon <= 180,
      s"box [$minLat,$maxLat]×[$minLon,$maxLon] outside WGS-84 bounds")
    // non-strict on both edges: a box touching a cell boundary keeps
    // the neighbour cell — harmless over-cover, never an uncovered
    // point (the ±90/±180 encode-into-last-cell edge included)
    def touches(c: CellBounds): Boolean =
      c.latMin <= maxLat && minLat <= c.latMax &&
        c.lonMin <= maxLon && minLon <= c.lonMax
    def inside(c: CellBounds): Boolean =
      minLat <= c.latMin && c.latMax <= maxLat &&
        minLon <= c.lonMin && c.lonMax <= maxLon
    val prefixes = Seq.newBuilder[String]
    def visit(prefix: String): Unit = {
      val c = cellBounds(prefix)
      if (touches(c)) {
        if (inside(c) || prefix.length >= depth) prefixes += prefix
        else Base32.foreach(ch => visit(prefix + ch))
      }
    }
    Base32.foreach(ch => visit(ch.toString))
    val ranges = prefixes.result()
      .map(p => (p, prefixUpper(p)))
      .sortBy(_._1)
    ranges.foldLeft(Vector.empty[(String, String)]) {
      case (acc :+ ((lo, hi)), (lo2, hi2)) if hi == lo2 => acc :+ (lo -> hi2)
      case (acc, r) => acc :+ r
    }
  }

  /** FULL-DEPTH cell cover of a box: every depth-`depth` geohash cell
    * the box touches, as plain cell KEYS (no range collapsing) — the
    * join-key form a spatial EQUI-join needs: polygons explode to
    * their cover cells, points carry their cell, and the pair space
    * shrinks from |points|×|polygons| to cell-collocated candidates.
    * Bounded by 32^depth; callers use depth = the store's partition
    * cell length (3).
    */
  def bboxToCells(minLat: Double, maxLat: Double,
      minLon: Double, maxLon: Double, depth: Int = 3): Seq[String] = {
    require(depth >= 1 && depth <= 6, s"depth $depth out of [1,6]")
    require(minLat <= maxLat && minLon <= maxLon,
      s"degenerate box [$minLat,$maxLat]×[$minLon,$maxLon]")
    def touches(c: CellBounds): Boolean =
      c.latMin <= maxLat && minLat <= c.latMax &&
        c.lonMin <= maxLon && minLon <= c.lonMax
    val cells = Seq.newBuilder[String]
    def visit(prefix: String): Unit = {
      val c = cellBounds(prefix)
      if (touches(c)) {
        if (prefix.length >= depth) cells += prefix
        else Base32.foreach(ch => visit(prefix + ch))
      }
    }
    Base32.foreach(ch => visit(ch.toString))
    cells.result()
  }

  /** EXACT point-in-convex-polygon predicate as a Column, computed in
    * integer MICRODEGREES so every engine derives the identical
    * boolean from the same row: coordinates and vertices round to
    * BIGINT µ° (half-away-from-zero — Spark `round` and DuckDB `ROUND`
    * agree), and each edge test is an exact integer cross product
    * `(x2-x1)(py-y1) - (y2-y1)(px-x1) >= 0` (CCW edges; boundary
    * counts as inside). Magnitudes stay < 2⁶³: |coord µ°| ≤ 1.8×10⁸,
    * so each product ≤ ~1.3×10¹⁷. Scan-local arithmetic — pair it
    * with [[bboxToGeohashRanges]] over the polygon's bbox for
    * partition pruning and keep this as the exact refine.
    *
    * `polyMicro`: CCW (latµ, lonµ) vertices of a CONVEX polygon.
    */
  def convexPolygonContains(lat: org.apache.spark.sql.Column,
      lon: org.apache.spark.sql.Column,
      polyMicro: Seq[(Long, Long)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, round}
    require(polyMicro.length >= 3, "polygon needs >= 3 vertices")
    val py = round(lat * 1000000L).cast("long")
    val px = round(lon * 1000000L).cast("long")
    (polyMicro :+ polyMicro.head).sliding(2).map {
      case Seq((y1, x1), (y2, x2)) =>
        (lit(x2 - x1) * (py - lit(y1)) -
          lit(y2 - y1) * (px - lit(x1))) >= 0L
    }.reduce(_ && _)
  }

  /** The geohash PRUNING predicate for a bbox: OR of the cover's
    * `[lo, hi)` range conjuncts over `geohash`. Shape matters — each
    * disjunct is the two-sided comparison
    * [[graft.plans.InferGeohashPartitionFilter]] recognizes, so on a
    * geohash3-partitioned store the predicate turns into partition
    * pruning, and on any store it is a plain sargable parquet filter
    * (min/max row-group skipping).
    */
  def bboxRangePredicate(geohash: org.apache.spark.sql.Column,
      minLat: Double, maxLat: Double, minLon: Double, maxLon: Double,
      depth: Int = 2): org.apache.spark.sql.Column =
    bboxToGeohashRanges(minLat, maxLat, minLon, maxLon, depth)
      .map { case (lo, hi) => geohash >= lo && geohash < hi }
      .reduce(_ || _)

  /** USER-FACING bbox retrieval over a geohash-carrying store: rows of
    * `store` inside the closed box, computed as (geohash range cover →
    * partition/row-group pruning) AND (exact lat/lon refine). One call
    * replaces the plan-the-cover / AND-the-refine dance wod8 does by
    * hand; semantics are exactly the plain lat/lon predicate, the
    * ranges only PRUNE. At 100 TB the cover is what keeps this from
    * being a full scan: only the touched geohash directories /
    * row-groups are read.
    */
  def queryBbox(store: org.apache.spark.sql.DataFrame,
      minLat: Double, maxLat: Double, minLon: Double, maxLon: Double,
      geohashCol: String = "geohash", latCol: String = "latitude",
      lonCol: String = "longitude", depth: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    store.filter(
      bboxRangePredicate(col(geohashCol), minLat, maxLat, minLon,
        maxLon, depth) &&
        col(latCol) >= minLat && col(latCol) <= maxLat &&
        col(lonCol) >= minLon && col(lonCol) <= maxLon)
  }

  /** USER-FACING convex-polygon retrieval: the polygon's bbox drives
    * the same range pruning as [[queryBbox]], and
    * [[convexPolygonContains]] is the exact refine. `polyMicro`: CCW
    * (latµ, lonµ) vertices of a convex polygon.
    */
  def queryPolygon(store: org.apache.spark.sql.DataFrame,
      polyMicro: Seq[(Long, Long)],
      geohashCol: String = "geohash", latCol: String = "latitude",
      lonCol: String = "longitude", depth: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    require(polyMicro.length >= 3, "polygon needs >= 3 vertices")
    val minLat = polyMicro.map(_._1).min / 1e6
    val maxLat = polyMicro.map(_._1).max / 1e6
    val minLon = polyMicro.map(_._2).min / 1e6
    val maxLon = polyMicro.map(_._2).max / 1e6
    store.filter(
      bboxRangePredicate(col(geohashCol), minLat, maxLat, minLon,
        maxLon, depth) &&
        convexPolygonContains(col(latCol), col(lonCol), polyMicro))
  }
}
