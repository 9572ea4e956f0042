package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.wod.Geohash

/** Property gates for the bbox → geohash-range decomposition: COVER
  * (every point of the box encodes into some emitted range) and
  * DISJOINT + SORTED (no range overlaps another), across random boxes
  * and depths — plus hand cases for the edges (poles, antimeridian
  * touch, all-of-earth, 'z'-carry successors).
  */
class GeoOpsSpec extends AnyFunSuite {

  /** Deterministic property driver (scalacheck Gen sampled by seed;
    * no scalatestplus bridge in the offline dependency set).
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    var produced = 0
    var seed = 0L
    while (produced < n && seed < n * 10L) {
      gen.apply(Gen.Parameters.default, Seed(seed)).foreach { a =>
        produced += 1
        try body(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"failed for seed $seed: ${e.getMessage}", e)
        }
      }
      seed += 1
    }
    assert(produced >= n, s"generator produced only $produced/$n samples")
  }

  private val genBox = for {
    lat0 <- Gen.choose(-90.0, 89.0)
    lat1 <- Gen.choose(lat0, 90.0)
    lon0 <- Gen.choose(-180.0, 179.0)
    lon1 <- Gen.choose(lon0, 180.0)
    depth <- Gen.choose(1, 3)
  } yield (lat0, lat1, lon0, lon1, depth)

  private val genBoxWithPoints = for {
    box @ (lat0, lat1, lon0, lon1, _) <- genBox
    pts <- Gen.listOfN(20, for {
      lat <- Gen.choose(lat0, lat1)
      lon <- Gen.choose(lon0, lon1)
    } yield (lat, lon))
  } yield (box, pts)

  test("cover: every point in the box encodes into exactly one range") {
    forAllSeeded(genBoxWithPoints, 200) {
      case ((lat0, lat1, lon0, lon1, depth), pts) =>
        val ranges = GeoOps.bboxToGeohashRanges(lat0, lat1, lon0, lon1, depth)
        assert(ranges.nonEmpty)
        pts.foreach { case (lat, lon) =>
          val gh = Geohash.encode(lat, lon)
          val hits = ranges.count { case (lo, hi) => gh >= lo && gh < hi }
          assert(hits === 1,
            s"point ($lat,$lon) gh=$gh covered by $hits ranges in " +
              s"[$lat0,$lat1]x[$lon0,$lon1]@$depth: $ranges")
        }
    }
  }

  test("bboxToCells: every point in the box lands in exactly one " +
      "emitted cell, and every cell is distinct at the asked depth") {
    forAllSeeded(genBoxWithPoints, 200) {
      case ((lat0, lat1, lon0, lon1, depth), pts) =>
        val cells = GeoOps.bboxToCells(lat0, lat1, lon0, lon1, depth)
        assert(cells.nonEmpty)
        assert(cells.forall(_.length == depth))
        assert(cells.distinct.size === cells.size)
        pts.foreach { case (lat, lon) =>
          val cell = Geohash.encode(lat, lon).take(depth)
          assert(cells.contains(cell),
            s"point ($lat,$lon) cell=$cell missing from cover of " +
              s"[$lat0,$lat1]x[$lon0,$lon1]@$depth")
        }
    }
  }

  test("disjoint + sorted: ranges never overlap and are maximal-merged") {
    forAllSeeded(genBox, 300) { case (lat0, lat1, lon0, lon1, depth) =>
      val ranges = GeoOps.bboxToGeohashRanges(lat0, lat1, lon0, lon1, depth)
      ranges.foreach { case (lo, hi) => assert(lo < hi, s"empty range $lo..$hi") }
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          assert(hi <= lo2, s"overlap: ..$hi then $lo2.. in $ranges")
          assert(hi != lo2, s"unmerged adjacency $hi==$lo2 in $ranges")
        case _ => ()
      }
    }
  }

  test("whole earth collapses to the single unbounded range") {
    assert(GeoOps.bboxToGeohashRanges(-90, 90, -180, 180, 3) ===
      Seq(("0", "{")))
  }

  test("successor handles the z-carry") {
    assert(GeoOps.prefixUpper("gfq") === "gfr")
    assert(GeoOps.prefixUpper("gfz") === "gg")
    assert(GeoOps.prefixUpper("gzz") === "h")
    assert(GeoOps.prefixUpper("zzz") === "{")
    assert(GeoOps.prefixUpper("9") === "b")
  }

  test("cell bounds round-trip the encoder: a cell's own center " +
      "re-encodes to the same prefix") {
    forAllSeeded(Gen.listOfN(3, Gen.oneOf(
      "0123456789bcdefghjkmnpqrstuvwxyz".toSeq)), 100) { chars =>
      val p = chars.mkString
      val b = GeoOps.cellBounds(p)
      val gh = Geohash.encode((b.latMin + b.latMax) / 2,
        (b.lonMin + b.lonMax) / 2)
      assert(gh.startsWith(p),
        s"center of $p ($b) encoded to $gh")
    }
  }

  test("a box strictly inside one depth-3 cell emits exactly that cell") {
    val b = GeoOps.cellBounds("gfq")
    val pad = 1e-6
    val ranges = GeoOps.bboxToGeohashRanges(
      b.latMin + pad, b.latMax - pad, b.lonMin + pad, b.lonMax - pad, 3)
    assert(ranges === Seq(("gfq", "gfr")))
  }
}
