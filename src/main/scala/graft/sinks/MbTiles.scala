package graft.sinks

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From-scratch MBTiles sink — the reference's ENABLE_TILES export branch
  * (src/app.py:592-603). An MBTiles archive is a SQLite database (written by
  * [[Sqlite]]) with the spec's two tables:
  *
  *   metadata (name TEXT, value TEXT)
  *   tiles    (zoom_level, tile_column, tile_row, tile_data)
  *
  * Rows arrive from the same distributed tile pipeline as the PMTiles sink —
  * tileAssign explode + per-tile feature aggregation is the only shuffle —
  * and stream to the container in (z, x, y) order. Tile payloads are gzipped
  * GeoJSON FeatureCollections (PMTiles sink parity); tile_row uses the TMS
  * flip the MBTiles spec requires. */
object MbTiles {

  private def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** The reference-parity sink: feature DataFrame → gzip MVT payloads
    * ([[Mvt]]) → MBTiles with `format=pbf` and the spec-required `json`
    * metadata row describing the vector layer — what tippecanoe's mbtiles
    * output carries (src/app.py:592-603). Returns the tile count. */
  def writeMvt(features: DataFrame, path: String, zooms: (Int, Int),
      name: String): Long =
    writePayloads(Mvt.tilePayloads(features, zooms, name), path, name,
      format = "pbf",
      extraMeta = Seq("json" -> vectorLayersJson(features, zooms, name)))

  /** MBTiles 1.3 `json` metadata (required when format=pbf): the vector
    * layer inventory tile readers use for styling. Field types follow the
    * TileJSON vocabulary (Number/Boolean/String) and mirror what the MVT
    * encoder actually emits per Spark type — typed clients (MapLibre style
    * expressions) rely on this inventory. */
  def vectorLayersJson(features: DataFrame, zooms: (Int, Int), name: String): String = {
    import org.apache.spark.sql.types._
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val prepared = FeatureModel.prepare(features)
    val attrCols = prepared.columns.filterNot(FeatureModel.geomCols)
    def tileJsonType(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
          DoubleType | _: DecimalType => "Number"
      case BooleanType => "Boolean"
      case _ => "String"
    }
    val fields = attrCols
      .map(c => s""""${esc(c)}":"${tileJsonType(prepared.schema(c).dataType)}"""")
      .mkString(",")
    s"""{"vector_layers":[{"id":"${esc(name)}","minzoom":${zooms._1},"maxzoom":${zooms._2},"fields":{$fields}}]}"""
  }

  /** Legacy GeoJSON-payload variant (kept for the payload-agnostic container
    * tests; `format=json` is OUTSIDE the MBTiles 1.3 allowed set — a
    * stand-in, documented in COVERAGE.md; [[writeMvt]] is the matrix path). */
  def write(tiled: DataFrame, path: String, name: String = "export"): Long = {
    // payload assembly + gzip run map-side (PmTiles parity) — the driver
    // streams ready-made bytes into the container
    val gzipU = udf((fc: String) => gzip(
      ("""{"type":"FeatureCollection","features":[""" + fc + "]}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val perTile = tiled
      .groupBy(col("z"), col("tx"), col("ty"))
      .agg(concat_ws(",", sort_array(collect_list(col("feature")))).as("fc"))
      .select(col("z"), col("tx"), col("ty"), gzipU(col("fc")).as("payload"))
    writePayloads(perTile, path, name, format = "json", extraMeta = Nil)
  }

  /** Shared container assembly over ready-made (z, tx, ty, payload) rows. */
  def writePayloads(perTile0: DataFrame, path: String, name: String,
      format: String, extraMeta: Seq[(String, String)]): Long = {
    val perTile = perTile0.orderBy(col("z"), col("tx"), col("ty"))
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val db = new Sqlite(path)
    var minZ = Int.MaxValue; var maxZ = 0
    var n = 0L
    val it = perTile.toLocalIterator()
    val rows = new Iterator[(Long, Seq[Any])] {
      def hasNext: Boolean = it.hasNext
      def next(): (Long, Seq[Any]) = {
        val r = it.next()
        val z = r.getInt(0); val tx = r.getLong(1); val ty = r.getLong(2)
        if (z < minZ) minZ = z
        if (z > maxZ) maxZ = z
        n += 1
        val payload = r.getAs[Array[Byte]](3)
        // TMS row flip (MBTiles spec: row 0 is the southern edge)
        val tmsRow = (1L << z) - 1L - ty
        (n, Seq[Any](z.toLong, tx, tmsRow, payload))
      }
    }
    db.writeTable("tiles",
      "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, tile_data BLOB)",
      rows)
    val meta = Seq(
      "name" -> name,
      "format" -> format,
      "minzoom" -> (if (n == 0) "0" else minZ.toString),
      "maxzoom" -> (if (n == 0) "0" else maxZ.toString),
      "bounds" -> "-180.0,-85.0,180.0,85.0",
      "type" -> "overlay",
      "version" -> "1") ++ extraMeta
    db.writeTable("metadata",
      "CREATE TABLE metadata (name TEXT, value TEXT)",
      meta.zipWithIndex.iterator.map { case ((k, v), i) =>
        ((i + 1).toLong, Seq[Any](k, v))
      })
    db.finish()
    n
  }
}
