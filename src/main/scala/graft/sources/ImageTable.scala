package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoCols

/** The engine's one fact table (BASELINE.json input_hint):
  *   (image_id string, bytes binary, w int, h int, fmt string,
  *    caption string, phash long)
  * — the analogue of the reference's four feature tables (backend/raw.lua:
  * 29-96), with `caption` playing `tags jsonb` and derived location playing
  * `geom`.
  *
  * Derived columns (computed, never stored — the derivation IS the spec):
  *  - u1/u2: two independent uniform [0,1) draws from xxhash64(image_id)
  *    (codegen'd built-in, no UDF);
  *  - lon/lat: cubed-uniform transform — deliberately SKEWED toward (0,0)
  *    so dense-cell handling (salting/AQE) is exercised, the way the
  *    reference's planet data piles up in cities;
  *  - tags: k=v tokens of the caption as a map (reference tags jsonb,
  *    builder.py:148);
  *  - kind: point/line/polygon routing class (the reference routes features
  *    to nodes/ways_line/ways_poly by shape, backend/raw.lua:106-180);
  *  - cell: the res-`BucketRes` Z-order cell — write-time clustering key
  *    (CLUSTER ... USING geom_idx analogue, backend/sql/post_indexes.sql:57).
  */
object ImageTable {

  val BucketRes = 7

  private def unit(h: Column): Column =
    (pmod(h, lit(1000000000L))).cast("double") / lit(1.0e9)

  def u1Col(imageId: Column): Column = unit(xxhash64(imageId))
  def u2Col(imageId: Column): Column = unit(xxhash64(imageId, lit(1)))

  /** cube transform: skew mass toward 0 while staying in (-1,1) */
  private def cube(u: Column): Column = {
    val t = u * lit(2.0) - lit(1.0)
    t * t * t
  }

  def lonCol(imageId: Column): Column = cube(u1Col(imageId)) * lit(180.0)
  def latCol(imageId: Column): Column = cube(u2Col(imageId)) * lit(85.0)

  /** caption "k=v k=v word word" → map of the k=v tokens. */
  def tagsCol(caption: Column): Column = {
    val kv = filter(split(caption, " "), t => t.contains("="))
    map_from_entries(array_distinct(transform(kv, t =>
      struct(substring_index(t, "=", 1), substring_index(t, "=", -1)))))
  }

  /** geometry-type routing class from the id hash (reference raw.lua routing). */
  def kindCol(imageId: Column): Column = {
    val m = pmod(xxhash64(imageId, lit(2)), lit(10L))
    when(m < 6, lit("point")).when(m < 8, lit("line")).otherwise(lit("polygon"))
  }

  /** Arbitrary-vertex geometry columns (rings/roles — real multi-part
    * line/polygon shapes with holes, the reference routes genuine OSM
    * geometry, backend/raw.lua:128-180): hash-based draw providers feeding
    * the shared GeoCols.featureGeomCols shape spec. */
  def geomCols(imageId: Column, kind: Column, lon: Column, lat: Column): Seq[(String, Column)] =
    GeoCols.featureGeomCols(kind, lon, lat,
      k => unit(xxhash64(imageId, k)),
      (base, salt) => pmod(xxhash64(imageId, lit(1000 + salt)), lit(base.toLong)).cast("int"))

  def cellCol(imageId: Column): Column =
    GeoCols.cellCol(BucketRes, lonCol(imageId), latCol(imageId))

  /** Attach derived columns to a raw images DataFrame. Idempotent: columns
    * already materialized (ingest-time derivation, the reference's
    * precomputed `country`/`grid` pattern — backend/field_update:168-214)
    * are reused as plain attributes. That matters a lot at query time:
    * filter pushdown through a Project INLINES expressions into every
    * predicate reference, so deriving at scan time blows a 12-vertex raycast
    * into a ~4k-line codegen class (janino fails → interpreted re-evaluation
    * of the hash chain per term). Reading the stored column keeps predicates
    * attribute-sized AND enables parquet row-group min/max pruning on the
    * cell-clustered layout. */
  def derive(images: DataFrame): DataFrame = {
    val have = images.columns.toSet
    var df = images
    if (!have("lon")) df = df.withColumn("lon", lonCol(col("image_id")))
    if (!have("lat")) df = df.withColumn("lat", latCol(col("image_id")))
    if (!have("tags")) df = df.withColumn("tags", tagsCol(col("caption")))
    if (!have("kind")) df = df.withColumn("kind", kindCol(col("image_id")))
    if (!have("cell")) df = df.withColumn("cell", cellCol(col("image_id")))
    if (!have("rings"))
      geomCols(col("image_id"), col("kind"), col("lon"), col("lat"))
        .foreach { case (n, c) => df = df.withColumn(n, c) }
    df
  }
}
