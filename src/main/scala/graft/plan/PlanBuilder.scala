package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geo.{Cell, MultiPolygon}
import graft.functions.GeoCols
import graft.model._
import graft.sources.ImageTable

/** Compiles a [[SnapshotRequest]] into a DataFrame plan over the images
  * table — the Spark-native equivalent of the reference's SQL-string
  * generator `raw_currentdata_extraction_query` (builder.py:493-730).
  *
  * Shape of the produced plan, mirroring the reference stage by stage:
  *  - coarse cell prefilter (`cell IN cover`) && exact PIP refine — the
  *    reference's grid-index AND ST_Intersects pattern (builder.py:459-470);
  *    cells fully inside the polygon skip the refine;
  *  - per-geometry-type branches with per-type tag filters and attribute
  *    projections, `all_geometry` overriding per-type filters
  *    (builder.py:615-629);
  *  - branch dedup: adjacent types with identical filters+projection collapse
  *    into one `kind IN (...)` branch (the reference's
  *    use_geomtype_in_relation=False dedup, builder.py:668-671);
  *  - union assembly via unionByName (builder.py:94 UNION ALL).
  *
  * Everything stays declarative Column expressions → Catalyst pushes the tag
  * filters and the cell prefilter into the Parquet scan, prunes columns, and
  * whole-stage-codegens each branch.
  */
object PlanBuilder {

  val CoverRes = 7

  // ---- filter compilation ---------------------------------------------------

  /** TagFilter AST → Column (F4-F7). */
  def compileTags(f: TagFilter): Column = f match {
    case TagFilter.JoinOr(terms) =>
      terms.toSeq.sortBy(_._1).map((termCol _).tupled)
        .reduceOption(_ || _).getOrElse(lit(true))
    case TagFilter.JoinAnd(terms) =>
      terms.toSeq.sortBy(_._1).map((termCol _).tupled)
        .reduceOption(_ && _).getOrElse(lit(true))
    case TagFilter.And(l, r) => compileTags(l) && compileTags(r)
  }

  /** key with no values = existence (`tags ? 'k'`, builder.py:179); with
    * values = IN-list (builder.py:177). */
  private def termCol(key: String, values: Seq[String]): Column =
    if (values.isEmpty) map_contains_key(col("tags"), key)
    else col("tags")(key).isin(values: _*)

  /** WhereExpr AST → Column (F16 freeform where-DSL). */
  def compileWhere(e: WhereExpr): Column = e match {
    case WhereExpr.TagRef(k) => col("tags")(k)
    case WhereExpr.Lit(v) => lit(v)
    case WhereExpr.Eq(l, r) => compileWhere(l) === compileWhere(r)
    case WhereExpr.Ne(l, r) => compileWhere(l) =!= compileWhere(r)
    case WhereExpr.In(l, vs) => compileWhere(l).isin(vs: _*)
    case WhereExpr.IsNull(x) => compileWhere(x).isNull
    case WhereExpr.IsNotNull(x) => compileWhere(x).isNotNull
    case WhereExpr.And(l, r) => compileWhere(l) && compileWhere(r)
    case WhereExpr.Or(l, r) => compileWhere(l) || compileWhere(r)
    case WhereExpr.Not(x) => !compileWhere(x)
  }

  /** Geometry filter: coarse cover prefilter && exact refine (F1/F2/F9).
    * For points, ST_Within ≡ ST_Intersects (the useStWithin flag is kept for
    * parity but both compile identically, as in builder.py:237 vs :102).
    *
    * `cell` should be the materialized bucket column when the table has one
    * (ImageTable.BucketRes == CoverRes): the IN-prefilter then pushes into
    * the parquet scan and prunes row groups on the cell-clustered layout —
    * the reference's `grid = ...` index clause (builder.py:464-470). */
  def geometryFilter(geom: MultiPolygon, lon: Column, lat: Column,
      cell: Column): Column = {
    val covers = geom.polys.map(p => Cell.cover(p, CoverRes))
    val fullCells = covers.flatMap(_._1).toSet
    val partCells = covers.flatMap(_._2).toSet -- fullCells
    val inFull =
      if (fullCells.isEmpty) lit(false)
      else cell.isin(fullCells.toSeq: _*)
    val pip = geom.polys.map(p => GeoCols.pipCol(p, lon, lat))
      .reduceOption(_ || _).getOrElse(lit(false))
    val inPart =
      if (partCells.isEmpty) lit(false)
      else cell.isin(partCells.toSeq: _*) && pip
    // redundant top-level conjunct: a bare `cell IN cover` that Catalyst CAN
    // push into the parquet scan (the OR-of-branches below is unpushable as
    // a whole). Above the parquet In-threshold it degrades to a min/max
    // range filter — which still prunes row groups on the cell-clustered
    // layout (SURVEY §4 "coarse-index AND exact filter").
    val allCells = fullCells ++ partCells
    val pushable =
      if (allCells.isEmpty) lit(false) else cell.isin(allCells.toSeq: _*)
    pushable && (inFull || inPart)
  }

  def geometryFilter(geom: MultiPolygon, lon: Column, lat: Column): Column =
    geometryFilter(geom, lon, lat, GeoCols.cellCol(CoverRes, lon, lat))

  // ---- projection -----------------------------------------------------------

  /** Sanitize attribute names as the reference does (`:`/space/`-` → `_`,
    * builder.py:105-118). */
  def sanitize(name: String): String = name.replaceAll("[:\\s-]", "_")

  /** P1 default projection / P2 dynamic attribute projection / P3 csv /
    * P4 centroid. For points the centroid is the point itself. */
  private def projection(
      attrs: Option[Seq[String]], csv: Boolean): Seq[Column] = {
    val geomCols =
      if (csv) Seq(col("lon").as("longitude"), col("lat").as("latitude"),
        upper(col("kind")).as("geom_type")) // P3, builder.py:152-155
      else Seq(col("lon"), col("lat"))
    attrs match {
      case None => // P1: full default projection (builder.py:533-535)
        Seq(col("image_id"), col("kind").as("osm_type"), col("tags")) ++
          geomCols
      case Some(as) => // P2: osm_id, osm_type always prepended (builder.py:137)
        Seq(col("image_id"), col("kind").as("osm_type")) ++
          as.map(a => col("tags")(a).as(sanitize(a))) ++ geomCols
    }
  }

  // ---- plan assembly ----------------------------------------------------------

  private def kindName(g: GeomType): String = g match {
    case GeomType.Point => "point"
    case GeomType.Line => "line"
    case GeomType.Polygon => "polygon"
  }

  /** Effective filters for a type: all_geometry overrides per-type
    * (builder.py:615-629). */
  private def effective(req: SnapshotRequest, g: GeomType): TypeFilters =
    req.allGeometry.getOrElse(req.perType.getOrElse(g, TypeFilters()))

  def build(images: DataFrame, req: SnapshotRequest, csv: Boolean = false): DataFrame = {
    val derived = ImageTable.derive(images)
      .filter(geometryFilter(req.geometry, col("lon"), col("lat"), col("cell")))

    // group adjacent geometry types with identical effective filters (U3)
    val groups: Seq[(Seq[GeomType], TypeFilters)] =
      req.geometryTypes.foldLeft(Vector.empty[(Seq[GeomType], TypeFilters)]) {
        case (acc, g) =>
          val f = effective(req, g)
          acc.lastOption match {
            case Some((gs, pf)) if pf == f => acc.init :+ (gs :+ g, f)
            case _ => acc :+ (Seq(g), f)
          }
      }

    val branches = groups.map { case (gs, f) =>
      var b = derived.filter(col("kind").isin(gs.map(kindName): _*))
      f.tags.foreach(t => b = b.filter(compileTags(t)))
      req.where.foreach(w => b = b.filter(compileWhere(WhereParser.parse(w))))
      b.select(projection(f.attributes, csv): _*)
    }
    // schema may differ across branches when per-type attribute lists differ
    // → unionByName with null-fill (the reference merges attribute lists for
    // single-schema outputs instead, builder.py:557-578)
    branches.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** P5: serialize a result row as a GeoJSON Feature (ST_AsGeoJSON(t0.*),
    * builder.py:85-95) — pure column JSON assembly. */
  def toGeoJsonFeature(df: DataFrame): DataFrame = {
    val props = to_json(struct(df.columns.filter(c => c != "lon" && c != "lat")
      .map(col).toIndexedSeq: _*))
    df.select(concat(
      lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""),
      col("lon").cast("string"), lit(","), col("lat").cast("string"),
      lit("""]},"properties":"""), props, lit("}")).as("feature"))
  }
}
