package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.{MultiPolygon, Polygon, Pt}

/** Geo primitives as pure Catalyst Column expressions, each paired with a
  * structurally-identical ANSI/DuckDB SQL generator.
  *
  * Design: the reference evaluates spatial predicates inside Postgres
  * (ST_Intersects/ST_Within, builder.py:98-102; ST_MakeEnvelope bbox,
  * builder.py:744-751). We re-express them as *codegen'd column arithmetic* —
  * no UDFs on the hot path, so whole-stage codegen spans the scan → filter →
  * project pipeline. The `...Sql` twins emit the same expression tree as SQL
  * text for the DuckDB oracle; identical structure + IEEE-754 determinism
  * gives bit-identical results in both engines.
  */
object GeoCols {

  // ---- deterministic point derivation -------------------------------------
  // The driver's tables carry no geo columns; like the reference's fixture
  // strategy we derive a deterministic location per row key (SURVEY.md §1.3).
  // Pure integer arithmetic (no string hashing) so DuckDB reproduces it.
  val LonMul = 2654435761L // Knuth multiplicative-hash constants
  val LatMul = 2971215073L

  def pidCol(orderkey: Column, linenumber: Column): Column =
    orderkey * lit(8L) + linenumber.cast("long")

  def lonCol(pid: Column): Column =
    (pid * lit(LonMul) % lit(360000000L)).cast("double") / lit(1000000.0) - lit(180.0)

  def latCol(pid: Column): Column =
    (pid * lit(LatMul) % lit(170000000L)).cast("double") / lit(1000000.0) - lit(85.0)

  /** DuckDB SQL for the derived-point CTE over `lineitem`. DISTINCT because
    * (l_orderkey, l_linenumber) is not unique in the driver tables — the
    * point table must be keyed, like the reference's osm_id PK. */
  def pointsSql: String =
    s"""SELECT DISTINCT l_orderkey*8 + l_linenumber AS pid,
       |  ((l_orderkey*8 + l_linenumber)*$LonMul % 360000000)/1000000.0 - 180.0 AS lon,
       |  ((l_orderkey*8 + l_linenumber)*$LatMul % 170000000)/1000000.0 - 85.0 AS lat
       |FROM lineitem""".stripMargin

  /** Derived point table (pid, lon, lat) from lineitem — the engine-side twin
    * of [[pointsSql]]. */
  def derivedPoints(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"))
    val pid = pidCol(col("l_orderkey"), col("l_linenumber"))
    // distinct on pid only (lon/lat are functions of pid): hash-agg, and the
    // resulting exchange on pid is reused by downstream per-pid aggregations
    li.select(pid.as("pid")).groupBy("pid").agg(lit(1))
      .select(col("pid"), lonCol(col("pid")).as("lon"), latCol(col("pid")).as("lat"))
  }

  // ---- point-in-polygon (ray cast, even-odd) -------------------------------
  // Column twin of graft.geo.Geo.pointInRing; same half-open edge rule.
  // Crossing count parity as a sum of CASE indicators — fully codegen'd.

  def pipRingCol(poly: Array[Pt], lon: Column, lat: Column): Column = {
    val n = poly.length
    val terms = (0 until n).map { i =>
      val j = (i + n - 1) % n
      val (xi, yi) = (poly(i).lon, poly(i).lat)
      val (xj, yj) = (poly(j).lon, poly(j).lat)
      val crosses = (lit(yi) > lat) =!= (lit(yj) > lat)
      val xInt = lit(xj - xi) * (lat - lit(yi)) / lit(yj - yi) + lit(xi)
      when(crosses && lon < xInt, lit(1)).otherwise(lit(0))
    }
    terms.reduce(_ + _) % lit(2) === lit(1)
  }

  def pipCol(poly: Polygon, lon: Column, lat: Column): Column = {
    val inShell = pipRingCol(poly.shell.pts, lon, lat)
    poly.holes.foldLeft(inShell)((acc, h) => acc && !pipRingCol(h.pts, lon, lat))
  }

  def pipRingSql(poly: Array[Pt], lonE: String, latE: String): String = {
    val n = poly.length
    val terms = (0 until n).map { i =>
      val j = (i + n - 1) % n
      val (xi, yi) = (poly(i).lon, poly(i).lat)
      val (xj, yj) = (poly(j).lon, poly(j).lat)
      s"(CASE WHEN (($yi > $latE) <> ($yj > $latE)) AND " +
        s"($lonE < (${xj - xi}) * ($latE - ($yi)) / (${yj - yi}) + ($xi)) THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  def pipSql(poly: Polygon, lonE: String, latE: String): String = {
    val shell = pipRingSql(poly.shell.pts, lonE, latE)
    poly.holes.foldLeft(shell)((acc, h) =>
      s"($acc AND NOT ${pipRingSql(h.pts, lonE, latE)})")
  }

  // ---- cell id (Z-order quadtree, graft.geo.Cell encoding) -----------------

  private def clampIdx(raw: Column, n: Long): Column =
    least(lit(n - 1), greatest(lit(0L), raw))

  def cellXCol(res: Int, lon: Column): Column = {
    val n = 1L << res
    clampIdx(floor((lon + lit(180.0)) / lit(360.0) * lit(n.toDouble)).cast("long"), n)
  }

  def cellYCol(res: Int, lat: Column): Column = {
    val n = 1L << res
    clampIdx(floor((lat + lit(90.0)) / lit(180.0) * lit(n.toDouble)).cast("long"), n)
  }

  /** Morton interleave of two res-bit indices, unrolled (res ≤ 16 practical). */
  def mortonCol(res: Int, x: Column, y: Column): Column =
    (0 until res).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Full cell id: (morton(x,y) << 5) | res — matches graft.geo.Cell.cellAt. */
  def cellCol(res: Int, lon: Column, lat: Column): Column =
    shiftleft(mortonCol(res, cellXCol(res, lon), cellYCol(res, lat)), 5) + lit(res.toLong)

  def cellXSql(res: Int, lonE: String): String = {
    val n = 1L << res
    s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($lonE) + 180.0) / 360.0 * $n.0) AS BIGINT)))"
  }

  def cellYSql(res: Int, latE: String): String = {
    val n = 1L << res
    s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($latE) + 90.0) / 180.0 * $n.0) AS BIGINT)))"
  }

  def mortonSql(res: Int, xE: String, yE: String): String =
    (0 until res).map { i =>
      s"((($xE >> $i) & 1) << ${2 * i}) + ((($yE >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  def cellSql(res: Int, lonE: String, latE: String): String =
    s"((${mortonSql(res, "cx", "cy")} << 5) + $res)" // expects cx, cy bound in an enclosing CTE

  // ---- Web-Mercator tile (z/x/y) -------------------------------------------
  // The tippecanoe analogue (app.py:690-698): assign each point to its tile
  // per zoom. y uses the standard mercator formula.

  def tileXCol(z: Int, lon: Column): Column = {
    val n = 1L << z
    clampIdx(floor((lon + lit(180.0)) / lit(360.0) * lit(n.toDouble)).cast("long"), n)
  }

  def tileYCol(z: Int, lat: Column): Column = {
    val n = 1L << z
    val latRad = radians(lat)
    val merc = (lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / lit(math.Pi)) / lit(2.0)
    clampIdx(floor(merc * lit(n.toDouble)).cast("long"), n)
  }

  def tileXSql(z: Int, lonE: String): String = {
    val n = 1L << z
    s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($lonE) + 180.0) / 360.0 * $n.0) AS BIGINT)))"
  }

  def tileYSql(z: Int, latE: String): String = {
    val n = 1L << z
    s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((1.0 - LN(TAN(RADIANS($latE)) + 1.0/COS(RADIANS($latE))) / PI()) / 2.0 * $n.0) AS BIGINT)))"
  }

  // ---- non-point features (line / polygon) ----------------------------------
  // The reference routes real linestrings/polygons (backend/raw.lua:128-180)
  // and filters by geometrytype (builder.py:685, :713-714). Our features carry
  // four vertex columns (x0,y0..x3,y3) whose meaning depends on `kind`:
  //   point   — all vertices equal the anchor (lon, lat);
  //   line    — open polyline v0=anchor, v1, v2 (2 segments);
  //   polygon — a ccw star quad around the anchor (E, N, W, S points).
  // Vertex offsets are bounded (< one res-7 cell per axis) so the coarse cell
  // prefilter needs only a 1-ring expansion of the polygon cover.

  /** Vertex columns from generic offset providers: `du(i)` signed unit in
    * (-1,1], `uu(i)` unit in [0,1). Shared by the lineitem-derived features
    * (integer-arithmetic twins, [[derivedFeatures]]) and the images table
    * (hash-based, ImageTable). Returns x0,y0,...,x3,y3 in order. */
  def vertexCols(kind: Column, lon: Column, lat: Column,
      du: Int => Column, uu: Int => Column): Seq[(String, Column)] = {
    def r(i: Int) = lit(0.15) + lit(0.5) * uu(i) // quad radius in [0.15, 0.65)
    val isLine = kind === "line"
    val isPoly = kind === "polygon"
    val x1l = lon + lit(0.8) * du(1)
    val y1l = lat + lit(0.5) * du(2)
    Seq(
      "x0" -> when(isPoly, lon + r(1)).otherwise(lon),
      "y0" -> lat,
      "x1" -> when(isLine, x1l).otherwise(lon),
      "y1" -> when(isLine, y1l).when(isPoly, lat + lit(0.7) * r(2)).otherwise(lat),
      "x2" -> when(isLine, x1l + lit(0.8) * du(3)).when(isPoly, lon - r(3)).otherwise(lon),
      "y2" -> when(isLine, y1l + lit(0.5) * du(4)).otherwise(lat),
      "x3" -> lon,
      "y3" -> when(isPoly, lat - lit(0.7) * r(4)).otherwise(lat))
  }

  // deterministic offset constants for the lineitem-derived features (primes;
  // pid * C stays far from Long overflow at every test SF)
  val DuMuls: Seq[Long] = Seq(1299709L, 15485863L, 32452843L, 49979687L)
  val UuMuls: Seq[Long] = Seq(67867967L, 86028121L, 104395301L, 122949823L)

  private def duPid(pid: Column, i: Int): Column =
    ((pid * lit(DuMuls(i - 1))) % lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0)
  private def uuPid(pid: Column, i: Int): Column =
    ((pid * lit(UuMuls(i - 1))) % lit(1000000L)).cast("double") / lit(1000000.0)
  private def duPidSql(i: Int): String =
    s"((pid * ${DuMuls(i - 1)}) % 2000001)/1000000.0 - 1.0"
  private def uuPidSql(i: Int): String =
    s"((pid * ${UuMuls(i - 1)}) % 1000000)/1000000.0"

  def kindPidCol(pid: Column): Column =
    when(pid % 10 < 6, lit("point")).when(pid % 10 < 8, lit("line"))
      .otherwise(lit("polygon"))

  val kindPidSql: String =
    "(CASE WHEN pid % 10 < 6 THEN 'point' WHEN pid % 10 < 8 THEN 'line' ELSE 'polygon' END)"

  /** Feature table derived from lineitem keys: (image_id, lon, lat, kind,
    * x0..y3, tags, cell) — the non-point analogue of [[derivedPoints]], with
    * [[featuresSql]] as its DuckDB twin. `tags` carries a deterministic
    * parity attribute so tag filters/projections have an oracle. */
  def derivedFeatures(spark: SparkSession, sfDir: String, cellRes: Int = 7): DataFrame = {
    val p = derivedPoints(spark, sfDir)
    val kind = kindPidCol(col("pid"))
    val vs = vertexCols(kind, col("lon"), col("lat"),
      i => duPid(col("pid"), i), i => uuPid(col("pid"), i))
    val base = p.withColumn("kind", kind)
    val withVs = vs.foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
    withVs
      .withColumn("tags", map(lit("parity"), (col("pid") % 7).cast("string")))
      .withColumn("cell", cellCol(cellRes, col("lon"), col("lat")))
      .withColumnRenamed("pid", "image_id")
  }

  /** DuckDB CTE body for the derived feature table (columns: pid, lon, lat,
    * kind, x0..y3; tag values are emitted directly as expressions by gate
    * SQL, maps are a Spark-side representation detail). */
  def featuresSql: String = {
    def rS(i: Int) = s"(0.15 + 0.5 * (${uuPidSql(i)}))"
    val x1l = s"(lon + 0.8 * (${duPidSql(1)}))"
    val y1l = s"(lat + 0.5 * (${duPidSql(2)}))"
    s"""SELECT pid, lon, lat, $kindPidSql AS kind,
       |  (CASE WHEN pid % 10 >= 8 THEN lon + ${rS(1)} ELSE lon END) AS x0,
       |  lat AS y0,
       |  (CASE WHEN pid % 10 >= 6 AND pid % 10 < 8 THEN $x1l ELSE lon END) AS x1,
       |  (CASE WHEN pid % 10 >= 6 AND pid % 10 < 8 THEN $y1l
       |        WHEN pid % 10 >= 8 THEN lat + 0.7 * ${rS(2)} ELSE lat END) AS y1,
       |  (CASE WHEN pid % 10 >= 6 AND pid % 10 < 8 THEN $x1l + 0.8 * (${duPidSql(3)})
       |        WHEN pid % 10 >= 8 THEN lon - ${rS(3)} ELSE lon END) AS x2,
       |  (CASE WHEN pid % 10 >= 6 AND pid % 10 < 8 THEN $y1l + 0.5 * (${duPidSql(4)})
       |        ELSE lat END) AS y2,
       |  lon AS x3,
       |  (CASE WHEN pid % 10 >= 8 THEN lat - 0.7 * ${rS(4)} ELSE lat END) AS y3
       |FROM pts""".stripMargin
  }

  // ---- segment / region intersection predicates ------------------------------
  // Column/SQL twins of Geo.segmentsCross / lineIntersectsPolygon /
  // polygonIntersectsPolygon: strict-sign orientation tests, identical
  // operand order in kernel, Column, and SQL.

  /** Segment (a→b, column endpoints) properly crosses literal segment c→d. */
  def segCrossCol(ax: Column, ay: Column, bx: Column, by: Column,
      c: Pt, d: Pt): Column = {
    val abc = ((lit(c.lat) - ay) * (bx - ax) - (by - ay) * (lit(c.lon) - ax)) > lit(0.0)
    val abd = ((lit(d.lat) - ay) * (bx - ax) - (by - ay) * (lit(d.lon) - ax)) > lit(0.0)
    val cda = ((ay - lit(c.lat)) * lit(d.lon - c.lon) - lit(d.lat - c.lat) * (ax - lit(c.lon))) > lit(0.0)
    val cdb = ((by - lit(c.lat)) * lit(d.lon - c.lon) - lit(d.lat - c.lat) * (bx - lit(c.lon))) > lit(0.0)
    (abc =!= abd) && (cda =!= cdb)
  }

  def segCrossSql(axE: String, ayE: String, bxE: String, byE: String,
      c: Pt, d: Pt): String = {
    val abc = s"(((${c.lat}) - $ayE) * ($bxE - $axE) - ($byE - $ayE) * ((${c.lon}) - $axE)) > 0.0"
    val abd = s"(((${d.lat}) - $ayE) * ($bxE - $axE) - ($byE - $ayE) * ((${d.lon}) - $axE)) > 0.0"
    val cda = s"(($ayE - (${c.lat})) * (${d.lon - c.lon}) - (${d.lat - c.lat}) * ($axE - (${c.lon}))) > 0.0"
    val cdb = s"(($byE - (${c.lat})) * (${d.lon - c.lon}) - (${d.lat - c.lat}) * ($bxE - (${c.lon}))) > 0.0"
    s"((($abc) <> ($abd)) AND (($cda) <> ($cdb)))"
  }

  private def ringEdges(r: graft.geo.Ring): Seq[(Pt, Pt)] = {
    val pts = r.pts
    pts.indices.map(i => (pts((i + pts.length - 1) % pts.length), pts(i)))
  }

  private def polyEdges(poly: Polygon): Seq[(Pt, Pt)] =
    (poly.shell +: poly.holes.toSeq).flatMap(ringEdges)

  /** Segment (column endpoints) crosses any boundary edge of the polygon
    * (shell + holes). */
  def segCrossesBoundaryCol(poly: Polygon, ax: Column, ay: Column,
      bx: Column, by: Column): Column =
    polyEdges(poly).map { case (c, d) => segCrossCol(ax, ay, bx, by, c, d) }
      .reduce(_ || _)

  def segCrossesBoundarySql(poly: Polygon, axE: String, ayE: String,
      bxE: String, byE: String): String =
    polyEdges(poly).map { case (c, d) => segCrossSql(axE, ayE, bxE, byE, c, d) }
      .mkString("(", " OR ", ")")

  /** Literal point q inside the dynamic feature quad (x0..x3, y0..y3 column
    * ring) — raycast with the same half-open edge rule as pipRingCol. */
  def pipQuadCol(q: Pt, xs: Seq[Column], ys: Seq[Column]): Column = {
    val terms = (0 until 4).map { i =>
      val j = (i + 3) % 4
      val crosses = (ys(i) > lit(q.lat)) =!= (ys(j) > lit(q.lat))
      val xInt = (xs(j) - xs(i)) * (lit(q.lat) - ys(i)) / (ys(j) - ys(i)) + xs(i)
      when(crosses && lit(q.lon) < xInt, lit(1)).otherwise(lit(0))
    }
    terms.reduce(_ + _) % lit(2) === lit(1)
  }

  def pipQuadSql(q: Pt, xs: Seq[String], ys: Seq[String]): String = {
    val terms = (0 until 4).map { i =>
      val j = (i + 3) % 4
      s"(CASE WHEN ((${ys(i)} > ${q.lat}) <> (${ys(j)} > ${q.lat})) AND " +
        s"(${q.lon} < (${xs(j)} - ${xs(i)}) * ((${q.lat}) - ${ys(i)}) / (${ys(j)} - ${ys(i)}) + ${xs(i)}) " +
        s"THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** Kind-aware feature×polygon intersection (the exact refine of the extract
    * path): point → PIP; line → vertex-in OR edge-cross; polygon → vertex-in
    * OR edge-cross OR request-vertex swallowed by the feature quad. */
  def featureIntersectsCol(poly: Polygon, kind: Column, lon: Column, lat: Column,
      xs: Seq[Column], ys: Seq[Column]): Column = {
    val pointHit = pipCol(poly, lon, lat)
    val lineHit =
      (0 to 2).map(i => pipCol(poly, xs(i), ys(i))).reduce(_ || _) ||
        Seq((0, 1), (1, 2)).map { case (i, j) =>
          segCrossesBoundaryCol(poly, xs(i), ys(i), xs(j), ys(j)) }.reduce(_ || _)
    val quadHit =
      (0 to 3).map(i => pipCol(poly, xs(i), ys(i))).reduce(_ || _) ||
        Seq((0, 1), (1, 2), (2, 3), (3, 0)).map { case (i, j) =>
          segCrossesBoundaryCol(poly, xs(i), ys(i), xs(j), ys(j)) }.reduce(_ || _) ||
        pipQuadCol(poly.shell.pts.head, xs, ys)
    when(kind === "point", pointHit)
      .when(kind === "line", lineHit)
      .otherwise(quadHit)
  }

  def featureIntersectsSql(poly: Polygon, kindE: String, lonE: String, latE: String,
      xs: Seq[String], ys: Seq[String]): String = {
    val pointHit = pipSql(poly, lonE, latE)
    val lineHit = ((0 to 2).map(i => pipSql(poly, xs(i), ys(i))) ++
      Seq((0, 1), (1, 2)).map { case (i, j) =>
        segCrossesBoundarySql(poly, xs(i), ys(i), xs(j), ys(j)) })
      .mkString("(", " OR ", ")")
    val quadHit = ((0 to 3).map(i => pipSql(poly, xs(i), ys(i))) ++
      Seq((0, 1), (1, 2), (2, 3), (3, 0)).map { case (i, j) =>
        segCrossesBoundarySql(poly, xs(i), ys(i), xs(j), ys(j)) } ++
      Seq(pipQuadSql(poly.shell.pts.head, xs, ys)))
      .mkString("(", " OR ", ")")
    s"(CASE WHEN $kindE = 'point' THEN $pointHit " +
      s"WHEN $kindE = 'line' THEN $lineHit ELSE $quadHit END)"
  }

  def featureIntersectsCol(geom: MultiPolygon, kind: Column, lon: Column, lat: Column,
      xs: Seq[Column], ys: Seq[Column]): Column =
    geom.polys.map(p => featureIntersectsCol(p, kind, lon, lat, xs, ys))
      .reduce(_ || _)

  def featureIntersectsSql(geom: MultiPolygon, kindE: String, lonE: String, latE: String,
      xs: Seq[String], ys: Seq[String]): String =
    geom.polys.map(p => featureIntersectsSql(p, kindE, lonE, latE, xs, ys))
      .mkString("(", " OR ", ")")

  // ---- centroid (ST_Centroid analogue, builder.py:157) -----------------------
  // Twin of Geo.centroid (shoelace) and Geo.lineCentroid (length-weighted):
  // identical operand order, identical degenerate fallbacks.

  /** (clon, clat) centroid columns for the kind-aware feature model. */
  def centroidCols(kind: Column, lon: Column, lat: Column,
      xs: Seq[Column], ys: Seq[Column]): (Column, Column) = {
    // line: length-weighted midpoint of segments (0,1), (1,2)
    val l1 = sqrt((xs(1) - xs(0)) * (xs(1) - xs(0)) + (ys(1) - ys(0)) * (ys(1) - ys(0)))
    val l2 = sqrt((xs(2) - xs(1)) * (xs(2) - xs(1)) + (ys(2) - ys(1)) * (ys(2) - ys(1)))
    val lineX = ((xs(0) + xs(1)) / 2 * l1 + (xs(1) + xs(2)) / 2 * l2) / (l1 + l2)
    val lineY = ((ys(0) + ys(1)) / 2 * l1 + (ys(1) + ys(2)) / 2 * l2) / (l1 + l2)
    val lineDegenerate = (l1 + l2) === lit(0.0)
    // polygon quad: shoelace, same edge order (j = prev) and term order as
    // Geo.centroid's loop
    val crosses = (0 until 4).map { i =>
      val j = (i + 3) % 4
      xs(j) * ys(i) - xs(i) * ys(j)
    }
    val a = crosses.reduce(_ + _)
    val cxSum = (0 until 4).map { i =>
      val j = (i + 3) % 4
      (xs(j) + xs(i)) * crosses(i)
    }.reduce(_ + _)
    val cySum = (0 until 4).map { i =>
      val j = (i + 3) % 4
      (ys(j) + ys(i)) * crosses(i)
    }.reduce(_ + _)
    val quadDegenerate = abs(a) < lit(1e-12)
    val quadAvgX = (xs(0) + xs(1) + xs(2) + xs(3)) / 4
    val quadAvgY = (ys(0) + ys(1) + ys(2) + ys(3)) / 4
    val clon = when(kind === "point", lon)
      .when(kind === "line", when(lineDegenerate, xs(0)).otherwise(lineX))
      .otherwise(when(quadDegenerate, quadAvgX).otherwise(cxSum / (lit(3.0) * a)))
    val clat = when(kind === "point", lat)
      .when(kind === "line", when(lineDegenerate, ys(0)).otherwise(lineY))
      .otherwise(when(quadDegenerate, quadAvgY).otherwise(cySum / (lit(3.0) * a)))
    (clon, clat)
  }

  def centroidSql(kindE: String, lonE: String, latE: String,
      xs: Seq[String], ys: Seq[String]): (String, String) = {
    val l1 = s"SQRT((${xs(1)} - ${xs(0)}) * (${xs(1)} - ${xs(0)}) + (${ys(1)} - ${ys(0)}) * (${ys(1)} - ${ys(0)}))"
    val l2 = s"SQRT((${xs(2)} - ${xs(1)}) * (${xs(2)} - ${xs(1)}) + (${ys(2)} - ${ys(1)}) * (${ys(2)} - ${ys(1)}))"
    val lineX = s"(((${xs(0)} + ${xs(1)}) / 2 * $l1 + (${xs(1)} + ${xs(2)}) / 2 * $l2) / ($l1 + $l2))"
    val lineY = s"(((${ys(0)} + ${ys(1)}) / 2 * $l1 + (${ys(1)} + ${ys(2)}) / 2 * $l2) / ($l1 + $l2))"
    val crosses = (0 until 4).map { i =>
      val j = (i + 3) % 4
      s"(${xs(j)} * ${ys(i)} - ${xs(i)} * ${ys(j)})"
    }
    val a = crosses.mkString("(", " + ", ")")
    val cxSum = (0 until 4).map { i =>
      val j = (i + 3) % 4
      s"((${xs(j)} + ${xs(i)}) * ${crosses(i)})"
    }.mkString("(", " + ", ")")
    val cySum = (0 until 4).map { i =>
      val j = (i + 3) % 4
      s"((${ys(j)} + ${ys(i)}) * ${crosses(i)})"
    }.mkString("(", " + ", ")")
    val quadAvgX = s"((${xs(0)} + ${xs(1)} + ${xs(2)} + ${xs(3)}) / 4)"
    val quadAvgY = s"((${ys(0)} + ${ys(1)} + ${ys(2)} + ${ys(3)}) / 4)"
    val clon = s"(CASE WHEN $kindE = 'point' THEN $lonE " +
      s"WHEN $kindE = 'line' THEN (CASE WHEN ($l1 + $l2) = 0.0 THEN ${xs(0)} ELSE $lineX END) " +
      s"ELSE (CASE WHEN ABS($a) < 1e-12 THEN $quadAvgX ELSE ($cxSum / (3.0 * $a)) END) END)"
    val clat = s"(CASE WHEN $kindE = 'point' THEN $latE " +
      s"WHEN $kindE = 'line' THEN (CASE WHEN ($l1 + $l2) = 0.0 THEN ${ys(0)} ELSE $lineY END) " +
      s"ELSE (CASE WHEN ABS($a) < 1e-12 THEN $quadAvgY ELSE ($cySum / (3.0 * $a)) END) END)"
    (clon, clat)
  }

  /** Kernel-backed twins of featureIntersectsCol / centroidCols for the HOT
    * path: the full Column expression tree over 18 polygon edges × 4 feature
    * vertices explodes past whole-stage-codegen limits (observed 40 MB task
    * binaries + interpreted fallback — BENCH.md finding #2's disease), while
    * a compact UDF over the JIT-compiled kernel evaluates each vertex column
    * exactly once. Arithmetic is operand-for-operand identical to the Column
    * and SQL twins (GeometrySpec proves kernel ≡ Column row-for-row), so
    * oracle parity is preserved. Vertices are passed as one packed array
    * (x0,y0..x3,y3). */
  def featureIntersectsUdf(geom: MultiPolygon): (Column, Column, Column, Column) => Column =
    udf((kind: String, lon: Double, lat: Double, v: Seq[Double]) => {
      val pts = Array.tabulate(4)(i => Pt(v(2 * i), v(2 * i + 1)))
      kind match {
        case "point" => geom.polys.exists(p => graft.geo.Geo.pointInPolygon(lon, lat, p))
        case "line" => geom.polys.exists(p => graft.geo.Geo.lineIntersectsPolygon(pts.take(3), p))
        case _ => geom.polys.exists(p => graft.geo.Geo.polygonIntersectsPolygon(graft.geo.Ring(pts), p))
      }
    }).apply(_, _, _, _)

  /** Packed vertex array column (x0,y0..x3,y3) for the kernel UDFs. */
  def packedVerts(xs: Seq[Column], ys: Seq[Column]): Column =
    array((0 to 3).flatMap(i => Seq(xs(i), ys(i))): _*)

  /** Kernel-backed centroid (clon, clat) — same rationale as
    * [[featureIntersectsUdf]]; bit-identical to centroidCols/centroidSql
    * (same operand order, GeometrySpec-proven). */
  val centroidUdf = udf((kind: String, lon: Double, lat: Double, v: Seq[Double]) => {
    val pts = Array.tabulate(4)(i => Pt(v(2 * i), v(2 * i + 1)))
    kind match {
      case "point" => Array(lon, lat)
      case "line" =>
        val c = graft.geo.Geo.lineCentroid(pts.take(3))
        Array(c.lon, c.lat)
      case _ =>
        val c = graft.geo.Geo.centroid(Polygon(graft.geo.Ring(pts)))
        Array(c.lon, c.lat)
    }
  })

  /** GeoJSON geometry object per kind (Point / LineString / Polygon) — the
    * row-level half of ST_AsGeoJSON (builder.py:85-95) for real geometry. */
  def geoJsonGeomCol(kind: Column, lon: Column, lat: Column,
      xs: Seq[Column], ys: Seq[Column]): Column = {
    def pt(x: Column, y: Column) =
      concat(lit("["), x.cast("string"), lit(","), y.cast("string"), lit("]"))
    when(kind === "point",
      concat(lit("""{"type":"Point","coordinates":"""), pt(lon, lat), lit("}")))
      .when(kind === "line",
        concat(lit("""{"type":"LineString","coordinates":["""),
          pt(xs(0), ys(0)), lit(","), pt(xs(1), ys(1)), lit(","),
          pt(xs(2), ys(2)), lit("]}")))
      .otherwise(
        concat(lit("""{"type":"Polygon","coordinates":[["""),
          pt(xs(0), ys(0)), lit(","), pt(xs(1), ys(1)), lit(","),
          pt(xs(2), ys(2)), lit(","), pt(xs(3), ys(3)), lit(","),
          pt(xs(0), ys(0)), lit("]]}")))
  }

  // ---- haversine ------------------------------------------------------------

  def haversineMetersCol(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = lit(graft.geo.Geo.EarthRadiusM)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0) * r * asin(least(lit(1.0), sqrt(a)))
  }

  def haversineMetersSql(lon1: String, lat1: String, lon2: String, lat2: String): String = {
    val r = graft.geo.Geo.EarthRadiusM
    s"(2.0 * $r * ASIN(LEAST(1.0, SQRT(" +
      s"POW(SIN(RADIANS(($lat2) - ($lat1)) / 2), 2) + " +
      s"COS(RADIANS($lat1)) * COS(RADIANS($lat2)) * POW(SIN(RADIANS(($lon2) - ($lon1)) / 2), 2)))))"
  }
}
