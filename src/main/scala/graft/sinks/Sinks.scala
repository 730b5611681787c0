package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.plan.PlanBuilder
import graft.lineage.Lineage

/** Export sinks — the reference's format matrix (ogr2ogr/DuckDB COPY,
  * app.py:549-616, :1431-1434) re-expressed as Spark writers. Formats are
  * sinks, not operators: each takes the already-built extract DataFrame.
  */
object Sinks {

  /** S4 — GeoJSON FeatureCollection as line-delimited features, written
    * resumably with per-partition lineage (the reference streams features
    * through a server-side cursor into one file, app.py:618-646; distributed
    * equivalent: feature-per-line part files + the lineage manifest). */
  def geojson(extract: DataFrame, outDir: String): Unit =
    Lineage.exportResumable(PlanBuilder.toGeoJsonFeature(extract), outDir)

  /** S4 — ONE valid GeoJSON FeatureCollection file, assembled by streaming
    * the committed per-partition parts (the reference's cursor path appends
    * rows into a single `{"type":"FeatureCollection","features":[...]}` file,
    * app.py:618-646). The distributed write stays resumable (lineage parts);
    * only the final concat is a driver-side sequential stream — exactly the
    * reference's boundary. Returns the assembled file path. */
  def featureCollection(extract: DataFrame, outDir: String): java.nio.file.Path = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths, StandardCopyOption}
    geojson(extract, outDir)
    val sorted = Lineage.committedPartFiles(outDir, "jsonl")
    val tmp = Paths.get(outDir, "export.geojson.tmp")
    val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    var first = true
    try {
      w.write("""{"type":"FeatureCollection","features":[""")
      sorted.foreach { p =>
        val r = Files.newBufferedReader(p, StandardCharsets.UTF_8)
        try {
          var line = r.readLine()
          while (line != null) {
            if (line.nonEmpty) {
              if (!first) w.write(",")
              w.write(line)
              first = false
            }
            line = r.readLine()
          }
        } finally r.close()
      }
      w.write("]}")
    } finally w.close()
    val out = Paths.get(outDir, "export.geojson")
    Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // compact the manifests into the lineage parquet (it survives the part
    // cleanup for accounting), then drop parts/ — a succeeded export must
    // not keep the dataset duplicated on disk or leave resumable state
    Lineage.finish(extract.sparkSession, outDir)
    Lineage.cleanParts(outDir)
    out
  }

  /** S5 — CSV with the reference's csv projection (lon/lat/geom_type columns
    * instead of geometry, builder.py:152-155). Caller passes the csv-shaped
    * extract (PlanBuilder.build(..., csv = true)); map columns are
    * json-encoded since CSV has no nested types. */
  def csv(extract: DataFrame, outDir: String): Unit = {
    val flat = extract.schema.fields.foldLeft(extract) { (df, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          df.withColumn(f.name, to_json(col(f.name)))
        case _ => df
      }
    }
    flat.write.mode(SaveMode.Overwrite).option("header", "true").csv(outDir)
  }

  /** Minimal RFC-4180 field quoting for the driver-written header (data
    * rows are quoted by `to_csv` in the plan). */
  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** S5 — ONE CSV file (the reference's csv export is a single file):
    * rows serialize in the PLAN via `to_csv` (codegen'd quoting/escaping)
    * into committed BYTE parts — raw byte concat on reassembly, so quoted
    * values containing newlines survive exactly (a line-oriented protocol
    * would mangle them). Driver writes header + parts. Returns row count. */
  def csvSingle(extract: DataFrame, outDir: String): Long = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val flat = extract.schema.fields.foldLeft(extract) { (df, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          df.withColumn(f.name, to_json(col(f.name)))
        case _ => df
      }
    }
    val lines = flat.select(
      to_csv(struct(flat.columns.map(col).toIndexedSeq: _*)).as("line"))
    Lineage.exportResumableBytes(lines, outDir,
      r => (r.getString(0) + "\n").getBytes(StandardCharsets.UTF_8),
      ext = "csvpart")
    val n = Lineage.finish(extract.sparkSession, outDir)
      .agg(coalesce(sum("rowCount"), lit(0L))).collect().head.getLong(0)
    val tmp = Paths.get(outDir, "export.csv.tmp")
    val w = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
    try {
      w.write((flat.columns.map(csvQuote).mkString(",") + "\n")
        .getBytes(StandardCharsets.UTF_8))
      Lineage.committedPartFiles(outDir, "csvpart").foreach { p =>
        Files.copy(p, w); ()
      }
    } finally w.close()
    Files.move(tmp, Paths.get(outDir, "export.csv"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Lineage.cleanParts(outDir)
    n
  }

  /** S5 — JSON lines (the FlatGeobuf/KML structural stand-in: one nested
    * record per row). */
  def json(extract: DataFrame, outDir: String): Unit =
    extract.write.mode(SaveMode.Overwrite).json(outDir)

  /** S8 — zstd parquet dump (the reference's DuckDB EXPORT DATABASE
    * (FORMAT PARQUET, COMPRESSION ZSTD), app.py:1742). */
  def parquetZstd(extract: DataFrame, outDir: String): Unit =
    extract.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(outDir)

  /** S5 — KML document (the reference's ogr2ogr -f KML, app.py:565-602):
    * one Placemark per feature with real Point/LineString/Polygon geometry.
    * Driver-side stream (single-XML-document boundary, like the shapefile
    * and FeatureCollection sinks). */
  def kml(extract: DataFrame, path: String): Long = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val prepared = FeatureModel.withKind(extract)
    val idx = prepared.columns.zipWithIndex.toMap
    val geomOf = FeatureModel.geomReader(prepared.columns.toIndexedSeq)
    val w = Files.newBufferedWriter(Paths.get(path), StandardCharsets.UTF_8)
    var n = 0L
    try {
      w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.write("""<kml xmlns="http://www.opengis.net/kml/2.2"><Document>""")
      val it = prepared.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        // honest name: the id column when present, empty otherwise (never a
        // silent substitute column)
        val name = idx.get("image_id")
          .flatMap(i => Option(r.get(i))).map(_.toString).getOrElse("")
        val geom = geomOf.map(g => kmlGeom(g(r))).getOrElse("")
        val esc = name.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        w.write(s"<Placemark><name>$esc</name>$geom</Placemark>")
        n += 1
      }
      w.write("</Document></kml>")
    } finally w.close()
    n
  }

  /** KML geometry per [[FeatureModel.Geom]] — Point / LineString / Polygon
    * with innerBoundaryIs holes / MultiGeometry for multi-part shapes. Pure
    * and serializable (shared by the driver loop and the executor-side
    * placemark UDF). */
  def kmlGeom(g: FeatureModel.Geom): String = {
    def coords(pts: Seq[(Double, Double)]): String =
      pts.map { case (x, y) => s"$x,$y" }.mkString(" ")
    def lineXml(pts: Seq[(Double, Double)]): String =
      s"<LineString><coordinates>${coords(pts)}</coordinates></LineString>"
    def polyXml(rings: Seq[IndexedSeq[(Double, Double)]]): String = {
      val outer = "<outerBoundaryIs><LinearRing><coordinates>" +
        coords(rings.head) + "</coordinates></LinearRing></outerBoundaryIs>"
      val inner = rings.tail.map(h => "<innerBoundaryIs><LinearRing><coordinates>" +
        coords(h) + "</coordinates></LinearRing></innerBoundaryIs>").mkString
      s"<Polygon>$outer$inner</Polygon>"
    }
    g.gtype match {
      case 1 =>
        val (x, y) = g.parts.head.head.head
        s"<Point><coordinates>$x,$y</coordinates></Point>"
      case 2 => lineXml(g.parts.head.head)
      case 3 => polyXml(g.parts.head)
      case 5 => "<MultiGeometry>" +
        g.parts.map(p => lineXml(p.head)).mkString + "</MultiGeometry>"
      case _ => "<MultiGeometry>" +
        g.parts.map(polyXml).mkString + "</MultiGeometry>"
    }
  }

  /** Placemark serialization as a Column EXPRESSION — KML's analogue of
    * `PlanBuilder.geoJsonFeatureCol`: the XML assembles inside whole-stage
    * codegen on the executors, not in a driver loop. The name is the id
    * column when present (XML-escaped), empty otherwise. */
  def kmlPlacemarkCol(df: DataFrame): org.apache.spark.sql.Column = {
    val have = df.columns.toSet
    val kindCol = if (have("kind")) Some(col("kind"))
      else if (have("osm_type")) Some(col("osm_type")) else None
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(
        c.cast("string"), lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val name = if (have("image_id")) esc(coalesce(col("image_id"), lit("")))
      else lit("")
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      concat(x.cast("string"), lit(","), y.cast("string"))
    val geom = kindCol match {
      case Some(k) if have("rings") =>
        // variable-arity geometry serializes through the executor-side
        // kernel UDF (same serializer as the driver loop); the XML envelope
        // around it stays pure-Column
        kmlGeomUdf(k, col("lon"), col("lat"), col("rings"),
          if (have("roles")) col("roles") else array().cast("array<int>"))
      case _ => concat(lit("<Point><coordinates>"),
        pt(col("lon"), col("lat")), lit("</coordinates></Point>"))
    }
    concat(lit("<Placemark><name>"), name, lit("</name>"), geom,
      lit("</Placemark>"))
  }

  /** Executor-side KML geometry UDF over the rings model — routes through
    * [[kmlGeom]] and [[FeatureModel.groupParts]] so the distributed path is
    * byte-identical to the driver loop. */
  private val kmlGeomUdf = udf((kind: String, lon: Double, lat: Double,
      rings: scala.collection.Seq[scala.collection.Seq[Double]],
      roles: scala.collection.Seq[Int]) =>
    kmlGeom(FeatureModel.fromRings(kind, lon, lat, rings, roles)))

  /** Distributed + resumable KML: placemarks serialize in the PLAN
    * (executor-side, [[kmlPlacemarkCol]]) into committed lineage parts; the
    * driver wraps header + parts + footer — the featureCollection boundary.
    * Returns the placemark count. */
  def kmlDistributed(extract: DataFrame, outDir: String): Long = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val lines = extract.select(kmlPlacemarkCol(extract).as("line"))
    // BYTE parts + raw concat: placemarks need no separators, and any
    // newline inside a <name> survives byte-exactly (a line protocol would
    // silently delete it)
    Lineage.exportResumableBytes(lines, outDir,
      r => r.getString(0).getBytes(StandardCharsets.UTF_8), ext = "kmlpart")
    val n = Lineage.finish(extract.sparkSession, outDir)
      .agg(coalesce(sum("rowCount"), lit(0L))).collect().head.getLong(0)
    val tmp = Paths.get(outDir, "export.kml.tmp")
    val w = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
    try {
      w.write(("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<kml xmlns="http://www.opengis.net/kml/2.2"><Document>""")
        .getBytes(StandardCharsets.UTF_8))
      Lineage.committedPartFiles(outDir, "kmlpart").foreach { p =>
        Files.copy(p, w); ()
      }
      w.write("</Document></kml>".getBytes(StandardCharsets.UTF_8))
    } finally w.close()
    Files.move(tmp, Paths.get(outDir, "export.kml"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Lineage.cleanParts(outDir)
    n
  }

  /** S7 — tile tree: one directory per (z, tx, ty), the pmtiles layout
    * analogue; partition pruning makes single-tile reads O(tile). */
  def tileTree(tiled: DataFrame, outDir: String): Unit =
    tiled.write.mode(SaveMode.Overwrite)
      .partitionBy("z", "tx", "ty").parquet(outDir)
}
