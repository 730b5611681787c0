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
    val partsDir = Paths.get(outDir, "parts")
    val sorted = {
      val st = Files.list(partsDir)
      try {
        val it = st.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        while (it.hasNext) { val p = it.next(); if (p.getFileName.toString.endsWith(".jsonl")) buf += p }
        buf.sortBy(_.getFileName.toString)
      } finally st.close()
    }
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
    val idx = extract.columns.zipWithIndex.toMap
    // `kind` on raw feature tables, `osm_type` on build() outputs
    val kindIdx = idx.get("kind").orElse(idx.get("osm_type"))
    val hasGeom = kindIdx.isDefined && idx.contains("x0")
    val w = Files.newBufferedWriter(Paths.get(path), StandardCharsets.UTF_8)
    var n = 0L
    try {
      w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.write("""<kml xmlns="http://www.opengis.net/kml/2.2"><Document>""")
      val it = extract.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        def d(c: String) = r.getDouble(idx(c))
        // honest name: the id column when present, empty otherwise (never a
        // silent substitute column)
        val name = idx.get("image_id")
          .flatMap(i => Option(r.get(i))).map(_.toString).getOrElse("")
        val geom =
          if (!hasGeom || r.getString(kindIdx.get) == "point")
            s"<Point><coordinates>${d("lon")},${d("lat")}</coordinates></Point>"
          else if (r.getString(kindIdx.get) == "line")
            "<LineString><coordinates>" +
              (0 to 2).map(i => s"${d(s"x$i")},${d(s"y$i")}").mkString(" ") +
              "</coordinates></LineString>"
          else
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>" +
              ((0 to 3) :+ 0).map(i => s"${d(s"x$i")},${d(s"y$i")}").mkString(" ") +
              "</coordinates></LinearRing></outerBoundaryIs></Polygon>"
        val esc = name.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        w.write(s"<Placemark><name>$esc</name>$geom</Placemark>")
        n += 1
      }
      w.write("</Document></kml>")
    } finally w.close()
    n
  }

  /** S7 — tile tree: one directory per (z, tx, ty), the pmtiles layout
    * analogue; partition pruning makes single-tile reads O(tile). */
  def tileTree(tiled: DataFrame, outDir: String): Unit =
    tiled.write.mode(SaveMode.Overwrite)
      .partitionBy("z", "tx", "ty").parquet(outDir)
}
