package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoCols
import graft.geo.{Fixtures, Geo, MultiPolygon, Pt, Ring}
import graft.model.{GeomType, SnapshotRequest, TypeFilters}
import graft.plan.PlanBuilder

/** Non-point geometry: the Column expressions must agree with the pure-Scala
  * kernel row for row (the kernel is the third leg of the Column/SQL/kernel
  * parity triangle), and the expanded cover prefilter must stay a superset of
  * the exact intersect set. */
class GeometrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val poly = Fixtures.requestPolygon

  private lazy val rows = {
    val xs = (0 to 3).map(i => col(s"x$i")); val ys = (0 to 3).map(i => col(s"y$i"))
    val (clon, clat) = GeoCols.centroidCols(col("kind"), col("lon"), col("lat"), xs, ys)
    GeoCols.derivedFeatures(spark, sfDir)
      .withColumn("hit", GeoCols.featureIntersectsCol(poly, col("kind"),
        col("lon"), col("lat"), xs, ys))
      .withColumn("clon", clon).withColumn("clat", clat)
      .select((Seq("image_id", "kind", "lon", "lat") ++
        (0 to 3).flatMap(i => Seq(s"x$i", s"y$i")) ++
        Seq("hit", "clon", "clat")).map(col): _*)
      .collect()
  }

  private def verts(r: org.apache.spark.sql.Row): Array[Pt] =
    Array.tabulate(4)(i => Pt(r.getDouble(4 + 2 * i), r.getDouble(5 + 2 * i)))

  test("featureIntersectsCol equals the Scala kernel for every kind") {
    var (nPt, nLn, nPg) = (0, 0, 0)
    rows.foreach { r =>
      val kind = r.getString(1)
      val v = verts(r)
      val expect = kind match {
        case "point" => nPt += 1; Geo.pointInPolygon(r.getDouble(2), r.getDouble(3), poly)
        case "line" => nLn += 1; Geo.lineIntersectsPolygon(v.take(3), poly)
        case _ => nPg += 1; Geo.polygonIntersectsPolygon(Ring(v), poly)
      }
      assert(r.getBoolean(12) == expect, s"intersect mismatch for row $r")
    }
    assert(nPt > 0 && nLn > 0 && nPg > 0, "fixture must exercise all kinds")
  }

  test("boundary crossers with no vertex inside are extracted (not nominal kinds)") {
    import spark.implicits._
    // a segment from the hole's center (NOT in the polygon — it's the hole)
    // to far outside the shell: it intersects the annulus although neither
    // endpoint is inside — exactly what a point-only PIP misses
    val a = Pt(10.0, 20.0) // hole center of Fixtures.requestPolygon
    val b = Pt(60.0, 20.0) // outside the shell (max radius 30)
    assert(!Geo.pointInPolygon(a.lon, a.lat, poly) &&
      !Geo.pointInPolygon(b.lon, b.lat, poly))
    assert(Geo.lineIntersectsPolygon(Array(a, b, b), poly))
    val df = Seq(("line", a.lon, a.lat, a.lon, a.lat, b.lon, b.lat, b.lon, b.lat, b.lon, b.lat))
      .toDF("kind", "lon", "lat", "x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3")
    val xs = (0 to 3).map(i => col(s"x$i")); val ys = (0 to 3).map(i => col(s"y$i"))
    val hit = df.select(GeoCols.featureIntersectsCol(poly, col("kind"),
      col("lon"), col("lat"), xs, ys).as("hit")).head().getBoolean(0)
    assert(hit, "Column twin must detect the pure edge-crossing")
    // and a segment entirely inside the hole does NOT intersect
    val c = Pt(11.0, 20.5)
    assert(!Geo.lineIntersectsPolygon(Array(a, c, c), poly))
  }

  test("centroidCols equals the Scala kernel (identity/length-weighted/shoelace)") {
    rows.foreach { r =>
      val v = verts(r)
      val expect = r.getString(1) match {
        case "point" => Pt(r.getDouble(2), r.getDouble(3))
        case "line" => Geo.lineCentroid(v.take(3))
        case _ => Geo.centroid(graft.geo.Polygon(Ring(v)))
      }
      assert(r.getDouble(13) == expect.lon && r.getDouble(14) == expect.lat,
        s"centroid mismatch for row $r: expected $expect")
    }
  }

  test("expanded cover prefilter is a superset of the exact intersect set") {
    val xs = (0 to 3).map(i => col(s"x$i")); val ys = (0 to 3).map(i => col(s"y$i"))
    val feats = GeoCols.derivedFeatures(spark, sfDir)
    val exact = feats.filter(GeoCols.featureIntersectsCol(poly, col("kind"),
      col("lon"), col("lat"), xs, ys))
    val planned = feats.filter(PlanBuilder.geometryFilter(
      MultiPolygon(Seq(poly)), col("kind"), col("lon"), col("lat"), col("cell"), xs, ys))
    assert(exact.count() == planned.count(), "plan filter must equal exact semantics")
    // and the coarse part alone (without refine) admits every exact hit
    val coarseOnly = feats.filter(
      PlanBuilder.cellIn(col("cell"), {
        val (f, p) = graft.geo.Cell.cover(poly, PlanBuilder.CoverRes)
        val all = f ++ p
        all ++ all.flatMap(c => graft.geo.Cell.ring(c, 1))
      }))
    assert(exact.join(coarseOnly, Seq("image_id"), "left_anti").count() == 0)
  }

  test("centroid=true routes through build and differs from anchors on polygons") {
    val req = SnapshotRequest(
      geometry = MultiPolygon(Seq(poly)),
      geometryTypes = GeomType.all,
      centroid = true,
      allGeometry = Some(TypeFilters(attributes = Some(Seq("parity")))))
    val out = PlanBuilder.build(GeoCols.derivedFeatures(spark, sfDir), req)
      .filter(col("osm_type") === "polygon").limit(5).collect()
    assert(out.nonEmpty)
    // polygon centroids are shoelace results, not the anchor: E/W radii are
    // independent so clon == anchor lon would be a wiring bug
    val feats = GeoCols.derivedFeatures(spark, sfDir)
      .select(col("image_id"), col("lon")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.exists(r => math.abs(r.getDouble(3) - feats(r.getLong(0))) > 1e-9),
      "polygon centroid must differ from the anchor")
  }

  test("toGeoJsonFeature emits parseable real-geometry features") {
    import spark.implicits._
    val feats = GeoCols.derivedFeatures(spark, sfDir).limit(200)
    val json = PlanBuilder.toGeoJsonFeature(feats).as[String]
    val parsed = spark.read.json(json)
    assert(parsed.count() == 200)
    val types = parsed.select(col("geometry.type")).distinct()
      .as[String].collect().toSet
    assert(types == Set("Point", "LineString", "Polygon"), s"got $types")
  }
}
