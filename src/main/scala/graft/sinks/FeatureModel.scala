package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.MapType

/** The one shared view of the engine's feature model for row-streaming
  * sinks: geometry-column set, the `kind`/`osm_type` alias, jsonb-style map
  * stringification, and the per-row kind → vertex extraction. FlatGeobuf,
  * GPKG and PGDump all consume this; a feature-model change (extra vertex,
  * new kind) lands here once. (The shapefile sink predates this helper and
  * keeps its own cw-rewound framing; `PlanBuilder.geoJsonFeatureCol` is the
  * Column-expression twin of the same model.)
  */
object FeatureModel {

  /** Geometry model columns — everything else is an attribute. */
  val geomCols: Set[String] = Set("kind", "lon", "lat", "cell") ++
    (0 to 3).flatMap(i => Seq(s"x$i", s"y$i"))

  /** `kind` on raw feature tables, `osm_type` on build() outputs. */
  def withKind(df0: DataFrame): DataFrame =
    if (df0.columns.contains("kind")) df0
    else if (df0.columns.contains("osm_type"))
      df0.withColumn("kind", df0.col("osm_type"))
    else df0

  /** jsonb-style map attributes stringify to JSON (ogr2ogr behavior for
    * hstore/jsonb columns) — applied before row streaming so every sink
    * writes `{"k":"v"}`, never a JVM toString. */
  def jsonifyMaps(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: MapType =>
          acc.withColumn(f.name, org.apache.spark.sql.functions.to_json(acc.col(f.name)))
        case _ => acc
      }
    }

  /** One row's geometry: WKB/FGB type id (1=Point, 2=LineString, 3=Polygon)
    * + vertices (polygon = CLOSED ccw quad ring). */
  final case class Geom(gtype: Int, pts: IndexedSeq[(Double, Double)])

  /** Row-side geometry reader over column POSITIONS (serializable, usable
    * map-side). None when the frame carries no anchor columns (csv/centroid
    * projections drop them) — sinks then write attribute-only records. */
  def geomReader(columns: Seq[String]): Option[Row => Geom] = {
    val idx = columns.zipWithIndex.toMap
    if (!idx.contains("lon") || !idx.contains("lat")) None
    else {
      val haveVerts = idx.contains("x0") && idx.contains("kind")
      val kindIdx = idx.getOrElse("kind", -1)
      Some { r =>
        def d(c: String): Double = r.getDouble(idx(c))
        val kind = if (haveVerts) r.getString(kindIdx) else "point"
        kind match {
          case "line" =>
            Geom(2, (0 to 2).map(i => (d(s"x$i"), d(s"y$i"))).toIndexedSeq)
          case "polygon" =>
            val q = (0 to 3).map(i => (d(s"x$i"), d(s"y$i")))
            Geom(3, (q :+ q.head).toIndexedSeq)
          case _ => Geom(1, Vector((d("lon"), d("lat"))))
        }
      }
    }
  }

  /** Standard sink preparation: kind alias + map stringification. */
  def prepare(df0: DataFrame): DataFrame = jsonifyMaps(withKind(df0))
}
