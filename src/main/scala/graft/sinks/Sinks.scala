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

  /** S7 — tile tree: one directory per (z, tx, ty), the pmtiles layout
    * analogue; partition pruning makes single-tile reads O(tile). */
  def tileTree(tiled: DataFrame, outDir: String): Unit =
    tiled.write.mode(SaveMode.Overwrite)
      .partitionBy("z", "tx", "ty").parquet(outDir)
}
