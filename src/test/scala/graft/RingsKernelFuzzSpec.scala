package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Fixtures, Geo, Polygon, Pt, Ring}

/** Deterministic fuzz over the rings kernels (seeded LCG, no Spark):
  * algebraic invariants that hold for EVERY geometry, not just the fixture
  * family — reversal antisymmetry of the signed area, translation
  * covariance, part additivity, even-odd consistency with the literal-ring
  * raycast, and intersect containment relations. */
class RingsKernelFuzzSpec extends AnyFunSuite {

  private def rng(seed: Long) = new Fixtures.Lcg(seed)

  /** Random simple star polygon ring (flat xy), CCW, n in [3, 12]. */
  private def starRing(r: Fixtures.Lcg, cx: Double, cy: Double,
      rMin: Double, rMax: Double): Seq[Double] = {
    val n = 3 + (r.nextDouble() * 10).toInt
    (0 until n).flatMap { i =>
      val ang = 2 * math.Pi * i / n
      val rad = rMin + (rMax - rMin) * r.nextDouble()
      Seq(cx + rad * math.cos(ang), cy + rad * math.sin(ang))
    }
  }

  private def reverse(ring: Seq[Double]): Seq[Double] =
    (0 until ring.length / 2).reverseIterator
      .flatMap(i => Seq(ring(2 * i), ring(2 * i + 1))).toSeq

  private def translate(ring: Seq[Double], dx: Double, dy: Double): Seq[Double] =
    (0 until ring.length / 2).flatMap(i => Seq(ring(2 * i) + dx, ring(2 * i + 1) + dy))

  test("signed area: reversal antisymmetry, translation invariance, part additivity") {
    val r = rng(7001L)
    (1 to 300).foreach { _ =>
      val a = starRing(r, r.nextDouble() * 100 - 50, r.nextDouble() * 80 - 40, 0.5, 3.0)
      val b = starRing(r, r.nextDouble() * 100 - 50, r.nextDouble() * 80 - 40, 0.5, 3.0)
      val sa = Geo.areaRings(Seq(a))
      assert(sa > 0, "CCW star area positive")
      assert(math.abs(Geo.areaRings(Seq(reverse(a))) + sa) < 1e-9 * math.max(1, sa.abs),
        "reversal flips the sign")
      val both = Geo.areaRings(Seq(a, b))
      assert(math.abs(both - (sa + Geo.areaRings(Seq(b)))) < 1e-6,
        "parts add (within float re-association tolerance)")
      val t = Geo.areaRings(Seq(translate(a, 13.25, -7.5)))
      assert(math.abs(t - sa) < 1e-6, "translation invariance")
    }
  }

  test("even-odd over one ring agrees with the literal-ring raycast") {
    val r = rng(7002L)
    (1 to 300).foreach { _ =>
      val ring = starRing(r, 0, 0, 0.5, 3.0)
      val pts = (0 until ring.length / 2)
        .map(i => Pt(ring(2 * i), ring(2 * i + 1))).toArray
      (1 to 20).foreach { _ =>
        val px = r.nextDouble() * 8 - 4
        val py = r.nextDouble() * 8 - 4
        assert(Geo.pipEvenOdd(px, py, Seq(ring)) ==
          Geo.pointInRing(px, py, Ring(pts)),
          s"even-odd vs raycast at ($px,$py)")
      }
    }
  }

  test("even-odd with a contained hole: in-hole excluded, annulus included") {
    val r = rng(7003L)
    (1 to 200).foreach { _ =>
      val shell = starRing(r, 0, 0, 2.0, 3.0)
      val hole = reverse(starRing(r, 0, 0, 0.3, 0.8)) // CW, strictly inside
      val rings = Seq(shell, hole)
      assert(!Geo.pipEvenOdd(0, 0, rings), "hole center excluded")
      // a point on the positive x axis between hole max and shell min radius
      assert(Geo.pipEvenOdd(1.4, 0, rings), "annulus point included")
      assert(!Geo.pipEvenOdd(5.0, 0, rings), "outside excluded")
      assert(math.abs(Geo.areaRings(rings) -
        (Geo.areaRings(Seq(shell)) + Geo.areaRings(Seq(hole)))) < 1e-6,
        "hole area subtracts via its CW sign")
    }
  }

  test("length: translation invariance and part additivity") {
    val r = rng(7004L)
    (1 to 300).foreach { _ =>
      val a = starRing(r, 0, 0, 0.5, 2.0) // treated as open polyline
      val b = starRing(r, 10, 0, 0.5, 2.0)
      val la = Geo.lengthRings(Seq(a))
      assert(la > 0)
      assert(math.abs(Geo.lengthRings(Seq(translate(a, -3.5, 8.25))) - la) < 1e-6)
      assert(math.abs(Geo.lengthRings(Seq(a, b)) -
        (la + Geo.lengthRings(Seq(b)))) < 1e-6)
    }
  }

  test("centroid of a convex-ish star lies inside it; translation covariance") {
    val r = rng(7005L)
    (1 to 200).foreach { _ =>
      val ring = starRing(r, 0, 0, 2.0, 2.5) // near-circular: convex
      val (cx, cy) = Geo.centroidRings("polygon", 0, 0, Seq(ring))
      assert(Geo.pipEvenOdd(cx, cy, Seq(ring)), "centroid inside the shape")
      val (tx, ty) = Geo.centroidRings("polygon", 0, 0, Seq(translate(ring, 4.5, -2.25)))
      assert(math.abs(tx - (cx + 4.5)) < 1e-6 && math.abs(ty - (cy - 2.25)) < 1e-6,
        "translation covariance")
    }
  }

  test("intersect containment relations against the request polygon") {
    val r = rng(7006L)
    val poly: Polygon = Fixtures.requestPolygon
    (1 to 200).foreach { _ =>
      val cx = r.nextDouble() * 160 - 80
      val cy = r.nextDouble() * 120 - 60
      val ring = starRing(r, cx, cy, 0.2, 1.5)
      val n = ring.length / 2
      val anyVertexIn = (0 until n).exists(i =>
        Geo.pointInPolygon(ring(2 * i), ring(2 * i + 1), poly))
      // vertex-in implies the polygon-kind intersect fires
      if (anyVertexIn)
        assert(Geo.featureIntersectsRings(Seq(poly), "polygon", cx, cy, Seq(ring)))
      // line semantics can only fire if polygon semantics does (line tests
      // are a subset: no swallow term)
      if (Geo.featureIntersectsRings(Seq(poly), "line", cx, cy, Seq(ring)))
        assert(Geo.featureIntersectsRings(Seq(poly), "polygon", cx, cy, Seq(ring)),
          "line hit must imply polygon hit for the same ring")
    }
  }
}
