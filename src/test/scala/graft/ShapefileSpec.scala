package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sinks.{Shapefile, Sinks}
import graft.sources.{ImageFixture, ImageTable}

/** Round-trip validation of the binary GIS sinks against an independent
  * minimal parser (ESRI spec layout: header fields, record framing, bbox)
  * and the JDK XML parser for KML. */
class ShapefileSpec extends SparkSpec {

  private lazy val feats = {
    val images = ImageFixture.generate(spark, 400, 2)
    ImageTable.derive(images)
      .select(Seq("image_id", "kind", "lon", "lat").map(col) ++
        (0 to 3).flatMap(i => Seq(col(s"x$i"), col(s"y$i"))): _*)
  }

  private def readAll(p: String): ByteBuffer = {
    val b = ByteBuffer.wrap(Files.readAllBytes(Paths.get(p)))
    b.order(ByteOrder.LITTLE_ENDIAN)
    b
  }

  /** Parse .shp: (shapeType, declaredLengthWords, bbox, records as flat
    * coordinate lists). */
  private def parseShp(p: String): (Int, Int, (Double, Double, Double, Double), Seq[Seq[(Double, Double)]]) = {
    val b = readAll(p)
    b.order(ByteOrder.BIG_ENDIAN)
    assert(b.getInt(0) == 9994, "file code")
    val lenWords = b.getInt(24)
    b.order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = b.getInt(32)
    val bbox = (b.getDouble(36), b.getDouble(44), b.getDouble(52), b.getDouble(60))
    var pos = 100
    val recs = scala.collection.mutable.ArrayBuffer.empty[Seq[(Double, Double)]]
    while (pos < b.capacity()) {
      b.order(ByteOrder.BIG_ENDIAN)
      val contentWords = b.getInt(pos + 4)
      b.order(ByteOrder.LITTLE_ENDIAN)
      val st = b.getInt(pos + 8)
      assert(st == shapeType, "record type matches header")
      val pts =
        if (st == 1) Seq((b.getDouble(pos + 12), b.getDouble(pos + 20)))
        else {
          val numPoints = b.getInt(pos + 8 + 4 + 32 + 4)
          val ptsOff = pos + 8 + 4 + 32 + 4 + 4 + 4 // 1 part
          (0 until numPoints).map(i =>
            (b.getDouble(ptsOff + 16 * i), b.getDouble(ptsOff + 16 * i + 8)))
        }
      recs += pts
      pos += 8 + contentWords * 2
    }
    (shapeType, lenWords, bbox, recs.toSeq)
  }

  private def parseDbfCount(p: String): Int = readAll(p).getInt(4)

  test("shapefile triples round-trip: counts, framing, coordinates, bbox") {
    val dir = Files.createTempDirectory("shp").toString
    val counts = Shapefile.write(feats, dir)
    val byKind = feats.collect().groupBy(_.getString(1))
    for (kind <- Seq("point", "line", "polygon")) {
      val expectRows = byKind(kind)
      assert(counts(kind) == expectRows.length)
      val (st, lenWords, bbox, recs) = parseShp(s"$dir/$kind.shp")
      assert(st == (kind match { case "point" => 1; case "line" => 3; case _ => 5 }))
      assert(lenWords * 2 == Files.size(Paths.get(s"$dir/$kind.shp")),
        "declared length must equal actual file size")
      assert(recs.length == expectRows.length)
      assert(parseDbfCount(s"$dir/$kind.dbf") == expectRows.length)
      // shx frames every record
      assert((Files.size(Paths.get(s"$dir/$kind.shx")) - 100) / 8 == expectRows.length)
      // .prj sidecar: well-formed WGS84 ESRI WKT (balanced brackets, the
      // datum + unit every GIS tool needs to skip the "unknown CRS" prompt)
      val prj = new String(Files.readAllBytes(Paths.get(s"$dir/$kind.prj")), "US-ASCII")
      assert(prj.startsWith("GEOGCS[\"GCS_WGS_1984\""))
      assert(prj.contains("SPHEROID[\"WGS_1984\",6378137.0,298.257223563]"))
      assert(prj.contains("UNIT[\"Degree\",0.0174532925199433]"))
      assert(prj.count(_ == '[') == prj.count(_ == ']'))
      // coordinate content: every written point appears within the bbox
      val flat = recs.flatten
      assert(flat.forall { case (x, y) =>
        x >= bbox._1 - 1e-9 && x <= bbox._3 + 1e-9 &&
          y >= bbox._2 - 1e-9 && y <= bbox._4 + 1e-9 })
      // per-kind geometry arity: point 1, line 3, polygon 5 (closed ring)
      val arity = kind match { case "point" => 1; case "line" => 3; case _ => 5 }
      assert(recs.forall(_.length == arity))
      if (kind == "polygon") {
        // closed + clockwise (spec requirement for outer rings)
        assert(recs.forall(r => r.head == r.last))
        assert(recs.forall { r =>
          val s = r.dropRight(1)
          val area2 = s.indices.map { i =>
            val (x1, y1) = s(i); val (x2, y2) = s((i + 1) % s.length)
            (x2 - x1) * (y2 + y1)
          }.sum
          area2 > 0 // cw in screen convention: positive sum of (x2-x1)(y2+y1)
        })
      }
    }
    // exact coordinate spot-check for points
    val (_, _, _, ptRecs) = parseShp(s"$dir/point.shp")
    val expectPts = byKind("point").map(r => (r.getDouble(2), r.getDouble(3))).toSet
    assert(ptRecs.flatten.toSet == expectPts)
  }

  test("distributed shapefile is byte-identical to the driver-streamed writer") {
    val d1 = Files.createTempDirectory("shp_drv").toString
    val d2 = Files.createTempDirectory("shp_dist").toString
    val c1 = Shapefile.write(feats, d1)
    val c2 = Shapefile.writeDistributed(feats, d2)
    assert(c1 == c2)
    for (kind <- Seq("point", "line", "polygon"); ext <- Seq("shp", "shx", "dbf", "prj")) {
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$d1/$kind.$ext")),
        Files.readAllBytes(Paths.get(s"$d2/$kind.$ext"))),
        s"$kind.$ext must be byte-identical")
    }
    // resumable state cleaned after success (compacted lineage remains)
    assert(!Files.exists(Paths.get(s"$d2/.point.state/parts")))
  }

  test("distributed shapefile: kill mid-export, resume completes identically") {
    val d1 = Files.createTempDirectory("shp_k1").toString
    val d2 = Files.createTempDirectory("shp_k2").toString
    Shapefile.write(feats, d1)
    intercept[Exception] {
      Shapefile.writeDistributed(feats.repartition(6), d2, failAtPartition = 3)
    }
    assert(graft.lineage.Lineage.committedParts(s"$d2/.point.state").nonEmpty)
    val counts = Shapefile.writeDistributed(feats.repartition(6), d2)
    assert(counts.values.sum == feats.count())
    // same multiset of shape records as the driver writer (order differs
    // with the changed partitioning, so compare parsed record sets)
    for (kind <- Seq("point", "line", "polygon")) {
      val (_, _, _, r1) = parseShp(s"$d1/$kind.shp")
      val (_, _, _, r2) = parseShp(s"$d2/$kind.shp")
      assert(r1.map(_.toSet).toSet == r2.map(_.toSet).toSet, s"$kind records differ")
    }
  }

  test("sinks accept build() outputs (osm_type instead of kind) with real geometry") {
    import graft.geo.MultiPolygon
    import graft.model.{SnapshotRequest, TypeFilters}
    val images = ImageFixture.generate(spark, 300, 2)
    val req = SnapshotRequest(
      geometry = MultiPolygon(Seq(graft.geo.Fixtures.requestPolygon)),
      allGeometry = Some(TypeFilters(attributes = Some(Seq("name")))))
    val built = graft.plan.PlanBuilder.build(images, req)
    val dir = Files.createTempDirectory("shp_built").toString
    val counts = Shapefile.write(built, dir)
    assert(counts.values.sum == built.count())
    val kmlN = Sinks.kml(built, s"$dir/out.kml")
    assert(kmlN == built.count())
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(s"$dir/out.kml"))
    // real geometry flows through the projection: all three KML shapes appear
    assert(doc.getElementsByTagName("LineString").getLength > 0)
    assert(doc.getElementsByTagName("Polygon").getLength > 0)
    assert(doc.getElementsByTagName("Point").getLength > 0)
  }

  test("kml document is well-formed XML with one Placemark per feature") {
    val dir = Files.createTempDirectory("kml").toString
    val n = Sinks.kml(feats, s"$dir/out.kml")
    assert(n == feats.count())
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(s"$dir/out.kml"))
    assert(doc.getElementsByTagName("Placemark").getLength == n)
    assert(doc.getElementsByTagName("Point").getLength +
      doc.getElementsByTagName("LineString").getLength +
      doc.getElementsByTagName("Polygon").getLength == n)
  }

  test("distributed kml (placemarks serialized in the plan) matches the driver writer") {
    val dir = Files.createTempDirectory("kmld").toString
    val n = Sinks.kmlDistributed(feats, dir)
    assert(n == feats.count())
    def parse(p: String) = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(p))
    val doc = parse(s"$dir/export.kml")
    assert(doc.getElementsByTagName("Placemark").getLength.toLong == n)
    // structural equality with the driver-streamed writer: same multiset of
    // (name, geometry element) pairs
    val refDir = Files.createTempDirectory("kmlr").toString
    Sinks.kml(feats, s"$refDir/ref.kml")
    def placemarkSet(p: String): Set[(String, String)] = {
      val d = parse(p)
      val pms = d.getElementsByTagName("Placemark")
      (0 until pms.getLength).map { i =>
        val e = pms.item(i).asInstanceOf[org.w3c.dom.Element]
        val name = e.getElementsByTagName("name").item(0).getTextContent
        val geomKind = Seq("Point", "LineString", "Polygon")
          .find(k => e.getElementsByTagName(k).getLength > 0).get
        (name, geomKind)
      }.toSet
    }
    assert(placemarkSet(s"$dir/export.kml") == placemarkSet(s"$refDir/ref.kml"))
    // serialization happened in the plan: no parts left, codegen-able concat
    assert(!Files.exists(java.nio.file.Paths.get(dir, "parts")))
  }
}
