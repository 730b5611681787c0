package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Fixtures, Geo, MultiPolygon, Polygon, Pt, Ring}
import graft.plan.Planning

/** Driver-side planning probes (F10-F13 analogues). */
class PlanningSpec extends AnyFunSuite {

  test("area guard: passes under cap, rejects over cap (F12)") {
    val small = MultiPolygon(Seq(Polygon(Ring(Array(
      Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1))))))
    assert(Planning.checkArea(small) > 12000)
    val huge = MultiPolygon(Seq(Polygon(Ring(Array(
      Pt(-60, -40), Pt(60, -40), Pt(60, 40), Pt(-60, 40))))))
    intercept[IllegalArgumentException](Planning.checkArea(huge))
  }

  test("exact-region probe: matches itself after sub-grid jitter, rotation (F11)") {
    val r5 = Fixtures.regions.find(_.cid == 5).get.poly
    // identical polygon → match
    assert(Planning.exactRegionMatch(MultiPolygon(Seq(r5))).contains(5))
    // jitter below the snap grid (1e-6 < 1e-5) → still a match
    val jittered = Polygon(Ring(r5.shell.pts.map(p =>
      Pt(p.lon + 4e-7, p.lat - 4e-7))))
    assert(Planning.exactRegionMatch(MultiPolygon(Seq(jittered))).contains(5))
    // rotated vertex order → still a match
    val rotated = Polygon(Ring(r5.shell.pts.drop(3) ++ r5.shell.pts.take(3)))
    assert(Planning.exactRegionMatch(MultiPolygon(Seq(rotated))).contains(5))
    // a different polygon → no match
    assert(Planning.exactRegionMatch(
      MultiPolygon(Seq(Fixtures.requestPolygon))).isEmpty)
  }

  test("largest-overlap ordering is descending and consistent with PIP mass (F13)") {
    val geom = MultiPolygon(Seq(Fixtures.requestPolygon))
    val ranked = Planning.regionsByOverlap(geom)
    assert(ranked.nonEmpty)
    assert(ranked.map(_._2) == ranked.map(_._2).sorted.reverse)
    // sanity via Monte-Carlo point mass inside the request polygon
    val rng = new Fixtures.Lcg(7)
    val b = Fixtures.requestPolygon.bbox
    val hits = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    var n = 0
    while (n < 20000) {
      val lon = b.minLon + (b.maxLon - b.minLon) * rng.nextDouble()
      val lat = b.minLat + (b.maxLat - b.minLat) * rng.nextDouble()
      if (Geo.pointInPolygon(lon, lat, Fixtures.requestPolygon))
        Fixtures.regions.foreach(r =>
          if (Geo.pointInPolygon(lon, lat, r.poly)) hits(r.cid) += 1)
      n += 1
    }
    val mcTop = hits.toSeq.sortBy(-_._2).take(1).map(_._1)
    assert(ranked.head._1 == mcTop.head,
      s"cover-ranked ${ranked.take(3)} vs MC ${hits.toSeq.sortBy(-_._2).take(3)}")
  }
}
