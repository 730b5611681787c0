package graft.geo

/** Deterministic fixture geometry shared by the engine plan and the DuckDB
  * oracle (both consume the same literal coordinates, so parity is by
  * construction). The region catalog mirrors the reference's `countries`
  * dimension table (backend/sql/countries.sql:5-12 — 254 polygons, GIST
  * indexed); ours is synthetic: star polygons seeded by an own LCG.
  */
object Fixtures {

  /** Tiny deterministic LCG (no java.util.Random — explicit algorithm so the
    * fixture is reproducible from the source alone). */
  final class Lcg(seed0: Long) {
    private var s = seed0
    def nextDouble(): Double = { // uniform [0,1)
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11) & ((1L << 53) - 1)).toDouble / (1L << 53).toDouble
    }
  }

  /** The custom-extract request polygon: non-convex (star) with a hole —
    * exercises the even-odd raycast the same way the reference's test
    * polygons exercise ST_Intersects (tests/test_app.py:24-71). Centered in
    * a dense derived-point area. */
  val requestPolygon: Polygon = {
    val rng = new Lcg(42L)
    val (cx, cy) = (10.0, 20.0)
    val n = 12
    val shell = Array.tabulate(n) { i =>
      val ang = 2 * math.Pi * i / n
      val r = 30.0 * (0.55 + 0.45 * rng.nextDouble())
      Pt(cx + r * math.cos(ang), cy + r * math.sin(ang) * 0.7)
    }
    val hole = Array.tabulate(6) { i =>
      val ang = 2 * math.Pi * i / 6
      Pt(cx + 5.0 * math.cos(ang), cy + 5.0 * math.sin(ang))
    }
    Polygon(Ring(shell), Seq(Ring(hole)))
  }

  /** A bbox request (reference F3, builder.py:744-751). */
  val requestBBox: BBox = BBox(-30.0, -15.0, 45.0, 40.0)

  /** Region dimension catalog: 16 star polygons; several overlap (so
    * multi-membership arrays occur, as in backend/field_update:192-199) and
    * they do not tile the globe (so the empty→default-0 path occurs,
    * update_countries.sql:1). */
  final case class Region(cid: Int, name: String, iso3: String, poly: Polygon)

  val regions: Seq[Region] = {
    val rng = new Lcg(1337L)
    (1 to 16).map { cid =>
      // centers on a jittered 4x4 grid spanning most of the globe; radii big
      // enough that neighbors overlap
      val gx = (cid - 1) % 4
      val gy = (cid - 1) / 4
      val cx = -135.0 + 90.0 * gx + (rng.nextDouble() - 0.5) * 30.0
      val cy = -60.0 + 40.0 * gy + (rng.nextDouble() - 0.5) * 16.0
      val n = 8 + (cid % 5)
      // radii large enough that several neighbors overlap (multi-membership
      // arrays, as in backend/field_update:192-199) while corners stay
      // uncovered (empty→default-0 path)
      val base = 30.0 + 25.0 * rng.nextDouble()
      val pts = Array.tabulate(n) { i =>
        val ang = 2 * math.Pi * i / n
        val r = base * (0.7 + 0.3 * rng.nextDouble())
        Pt(
          math.max(-179.9, math.min(179.9, cx + r * math.cos(ang))),
          math.max(-84.9, math.min(84.9, cy + r * math.sin(ang) * 0.6)))
      }
      Region(cid, s"region$cid", f"R${cid}%02d", Polygon(Ring(pts)))
    }
  }

  /** kNN query points (reference has no literal kNN; BASELINE.json north_star
    * requires it — cell-ring expansion + haversine refine). */
  val knnQueries: Seq[(Int, Double, Double)] = {
    val rng = new Lcg(4242L)
    (1 to 4).map { qid =>
      (qid, -160.0 + 320.0 * rng.nextDouble(), -80.0 + 160.0 * rng.nextDouble())
    }
  }
}
