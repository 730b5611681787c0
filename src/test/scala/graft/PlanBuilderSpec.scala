package graft

import org.apache.spark.sql.functions._
import graft.geo.{Fixtures, Geo, MultiPolygon}
import graft.model._
import graft.plan.PlanBuilder
import graft.sources.{ImageFixture, ImageTable}

/** Golden request tests: the plan builder's results vs a plain-Scala oracle
  * applying the reference's semantics to the same derived rows (the analogue
  * of the reference's byte-for-byte SQL-string tests, tests/test_app.py:24-272
  * — our IR is the result set, not SQL text). */
class PlanBuilderSpec extends SparkSpec {

  private val N = 1500L
  private lazy val images = ImageFixture.generate(spark, N, 4)

  /** Plain-Scala mirror of the derived columns incl. the rings geometry
    * (collected once from Spark — the location derivation is sealed inside
    * ImageTable; semantics on top are recomputed independently). */
  private lazy val derived: Seq[(String, Double, Double, Map[String, String], String, Seq[scala.collection.Seq[Double]])] =
    ImageTable.derive(images)
      .select(Seq("image_id", "lon", "lat", "tags", "kind", "rings").map(col): _*)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getMap[String, String](3).toMap, r.getString(4),
        r.getSeq[scala.collection.Seq[Double]](5)))
      .toSeq

  private val geom = MultiPolygon(Seq(Fixtures.requestPolygon))

  private def inGeom(lon: Double, lat: Double): Boolean =
    geom.polys.exists(p => Geo.pointInPolygon(lon, lat, p))

  /** Kind-aware kernel intersect — the oracle twin of the plan's exact
    * refine (real non-point semantics, not anchor PIP). */
  private def hitsGeom(kind: String, lon: Double, lat: Double,
      rings: Seq[scala.collection.Seq[Double]]): Boolean =
    Geo.featureIntersectsRings(geom.polys, kind, lon, lat, rings)

  test("snapshot_default: polygon only, all types, default projection") {
    val req = SnapshotRequest(geometry = geom)
    val got = PlanBuilder.build(images, req)
      .select("image_id").collect().map(_.getString(0)).toSet
    val expect = derived.filter(d => hitsGeom(d._5, d._2, d._3, d._6)).map(_._1).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("snapshot_tag_attr: join_or tag filter + attribute projection") {
    val req = SnapshotRequest(
      geometry = geom,
      geometryTypes = Seq(GeomType.Point),
      allGeometry = Some(TypeFilters(
        tags = Some(TagFilter.JoinOr(Map("amenity" -> Seq("shop", "toilet")))),
        attributes = Some(Seq("name")))))
    val df = PlanBuilder.build(images, req)
    // geometry (anchor + rings columns) always rides along, builder.py:533-535
    assert(df.columns.toSeq ==
      Seq("image_id", "osm_type", "name", "lon", "lat", "rings", "roles"))
    val got = df.collect().map(r => (r.getString(0), r.getString(2))).toSet
    val expect = derived.filter { case (_, lon, lat, tags, kind, _) =>
      kind == "point" && inGeom(lon, lat) &&
        tags.get("amenity").exists(Seq("shop", "toilet").contains)
    }.map(d => (d._1, d._4("name"))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("snapshot_join_and + existence term") {
    val req = SnapshotRequest(
      geometry = geom,
      allGeometry = Some(TypeFilters(tags = Some(TagFilter.JoinAnd(Map(
        "building" -> Seq("yes"), "name" -> Nil))))))
    val got = PlanBuilder.build(images, req)
      .select("image_id").collect().map(_.getString(0)).toSet
    val expect = derived.filter { case (_, lon, lat, tags, kind, v) =>
      hitsGeom(kind, lon, lat, v) && tags.get("building").contains("yes") && tags.contains("name")
    }.map(_._1).toSet
    assert(got == expect)
  }

  test("per-type filters with all_geometry precedence and branch grouping") {
    val req = SnapshotRequest(
      geometry = geom,
      geometryTypes = Seq(GeomType.Point, GeomType.Line, GeomType.Polygon),
      perType = Map(
        GeomType.Point -> TypeFilters(tags = Some(TagFilter.JoinOr(Map("highway" -> Nil)))),
        GeomType.Line -> TypeFilters(tags = Some(TagFilter.JoinOr(Map("highway" -> Nil)))),
        GeomType.Polygon -> TypeFilters(tags = Some(TagFilter.JoinOr(Map("building" -> Nil))))))
    val got = PlanBuilder.build(images, req)
      .select("image_id", "osm_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expect = derived.filter { case (_, lon, lat, tags, kind, v) =>
      hitsGeom(kind, lon, lat, v) && (kind match {
        case "point" | "line" => tags.contains("highway")
        case _ => tags.contains("building")
      })
    }.map(d => (d._1, d._5)).toSet
    assert(got == expect)
  }

  test("where-DSL: parse + compile tags['highway'] IS NOT NULL AND ...") {
    val req = SnapshotRequest(
      geometry = geom,
      where = Some("tags['highway'] IS NOT NULL AND tags['building'] != 'no'"))
    val got = PlanBuilder.build(images, req)
      .select("image_id").collect().map(_.getString(0)).toSet
    val expect = derived.filter { case (_, lon, lat, tags, kind, v) =>
      hitsGeom(kind, lon, lat, v) && tags.contains("highway") &&
        tags.get("building").exists(_ != "no") // != on NULL is NULL → filtered
    }.map(_._1).toSet
    assert(got == expect)
  }

  test("where parser: IN, parens, NOT, errors") {
    import WhereExpr._
    assert(WhereParser.parse("tags['a'] IN ('x', 'y')") ==
      In(TagRef("a"), Seq("x", "y")))
    assert(WhereParser.parse("NOT (tags['a'] = 'x' OR tags['b'] IS NULL)") ==
      Not(Or(Eq(TagRef("a"), Lit("x")), IsNull(TagRef("b")))))
    intercept[WhereParser.ParseError](WhereParser.parse("tags['a'] ="))
    intercept[WhereParser.ParseError](WhereParser.parse("; DROP TABLE x"))
  }

  test("csv projection emits longitude/latitude/geom_type") {
    val req = SnapshotRequest(geometry = geom)
    val df = PlanBuilder.build(images, req, csv = true)
    assert(df.columns.toSeq ==
      Seq("image_id", "osm_type", "tags", "longitude", "latitude", "geom_type"))
    val kinds = df.select("geom_type").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("POINT", "LINE", "POLYGON")))
  }

  test("GeoJSON feature sink emits REAL geometry through build()") {
    val req = SnapshotRequest(geometry = geom,
      allGeometry = Some(TypeFilters(attributes = Some(Seq("name")))))
    val feats = PlanBuilder.toGeoJsonFeature(PlanBuilder.build(images, req))
      .collect().map(_.getString(0))
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.startsWith("""{"type":"Feature","geometry":{"type":""""), f)
      assert(f.contains(""""properties":{"""), f)
    }
    // line/polygon features must serialize their true shapes, not the anchor
    val types = Set("Point", "LineString", "Polygon")
      .filter(t => feats.exists(_.contains(s""""type":"$t"""")))
    assert(types == Set("Point", "LineString", "Polygon"), s"got $types")
  }
}
