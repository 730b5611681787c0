package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.{Polygon, Pt}

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
