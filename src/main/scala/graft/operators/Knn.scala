package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.{Cell, Geo}
import graft.functions.GeoCols

/** Exact k-nearest-neighbors via cell-ring candidate expansion + haversine
  * refine (BASELINE.json north_star; SURVEY.md J5 — no literal reference
  * analogue, the closest is the GIST-indexed planning probe builder.py:48-56).
  *
  * Algorithm (distributed, driver-coordinated):
  *  1. each query point q gets the cell disk of Chebyshev radius r around its
  *     res-`res` cell; the (qid, cell) candidate map is broadcast — the fact
  *     side is filtered by a broadcast hash join on its ONE cell id, so the
  *     scan stays shuffle-free;
  *  2. per query, top-k by exact haversine (window over the tiny candidate
  *     set);
  *  3. exactness check: the kth distance must be ≤ the great-circle distance
  *     from q to the nearest uncovered region (conservative bound from the
  *     disk's lon/lat box). Queries that fail expand r and repeat.
  *
  * At 10^12 rows the candidate join is the same broadcast shape as
  * [[SpatialJoin]]; the per-query top-k window shuffles only candidate rows
  * (thousands), never the fact table.
  */
object Knn {

  /** Conservative lower bound (meters) on the distance from (lon,lat) to any
    * point OUTSIDE the lon/lat box — 0 if q is outside or at the border. */
  private[operators] def distToBoxEdge(
      lon: Double, lat: Double,
      minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): Double = {
    if (lon < minLon || lon > maxLon || lat < minLat || lat > maxLat) return 0.0
    val degM = math.Pi * Geo.EarthRadiusM / 180.0 // meters per degree (meridian)
    val dLat = math.min(lat - minLat, maxLat - lat) * degM
    // distance to a meridian at lon offset d: R * asin(sin(d) * cos(lat))
    val dLonDeg = math.min(lon - minLon, maxLon - lon)
    val dLon = Geo.EarthRadiusM * math.asin(
      math.min(1.0, math.sin(math.toRadians(math.min(90.0, dLonDeg))) *
        math.cos(math.toRadians(lat))))
    math.min(dLat, dLon) * 0.999
  }

  /** Box of the cell disk of radius r around (x0,y0) at res. */
  private def diskBox(res: Int, lon: Double, lat: Double, r: Int): (Double, Double, Double, Double) = {
    val n = 1L << res
    val x = Cell.xOf(res, lon); val y = Cell.yOf(res, lat)
    val w = 360.0 / n; val h = 180.0 / n
    val minLon = if (2L * r + 1 >= n) -180.0 else (x - r) * w - 180.0
    val maxLon = if (2L * r + 1 >= n) 180.0 else (x + r + 1) * w - 180.0
    val minLat = math.max(-90.0, (y - r) * h - 90.0)
    val maxLat = math.min(90.0, (y + r + 1) * h - 90.0)
    (minLon, minLat, maxLon, maxLat)
  }

  /** points: (pid, lon, lat); queries: (qid, lon, lat) literals.
    * Returns (qid, rank, pid, dist_m) — exact k nearest per query. */
  def knn(
      spark: SparkSession,
      points: DataFrame,
      queries: Seq[(Int, Double, Double)],
      k: Int,
      res: Int = 4,
      maxRounds: Int = 8): DataFrame = {
    import spark.implicits._
    val fact = points
      .withColumn("cell", GeoCols.cellCol(res, col("lon"), col("lat")))
      .persist()
    try {
      var radius = Map(queries.map(q => q._1 -> 1): _*)
      var result: DataFrame = null
      var done = false
      var iter = 0
      while (!done && iter < maxRounds) {
        iter += 1
        val cand = queries.flatMap { case (qid, qlon, qlat) =>
          Cell.disk(Cell.cellAt(res, qlon, qlat), radius(qid)).map(c => (qid, c))
        }.toDF("qid", "cell")
        val qdf = queries.toDF("qid", "qlon", "qlat")
        val w = Window.partitionBy(col("qid")).orderBy(col("dist_m"), col("pid"))
        val topk = fact
          .join(broadcast(cand), Seq("cell"))
          .join(broadcast(qdf), Seq("qid"))
          .withColumn("dist_m", GeoCols.haversineMetersCol(
            col("lon"), col("lat"), col("qlon"), col("qlat")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("qid"), col("rank"), col("pid"),
            round(col("dist_m"), 3).as("dist_m"))
        val kth = topk.groupBy("qid")
          .agg(max(col("dist_m")).as("kd"), count(lit(1)).as("n"))
          .collect().map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
        val unsat = queries.filter { case (qid, qlon, qlat) =>
          val (minLon, minLat, maxLon, maxLat) = diskBox(res, qlon, qlat, radius(qid))
          val bound = distToBoxEdge(qlon, qlat, minLon, minLat, maxLon, maxLat)
          val wholeGlobe = minLon <= -180.0 && maxLon >= 180.0 &&
            minLat <= -90.0 && maxLat >= 90.0
          kth.get(qid) match {
            case Some((kd, n)) if (n >= k && kd <= bound) || wholeGlobe => false
            case Some((_, _)) => true
            case None => !wholeGlobe
          }
        }
        if (unsat.isEmpty) { result = topk; done = true }
        else radius = radius ++ unsat.map(q => q._1 -> (radius(q._1) * 2))
      }
      require(done, s"kNN did not converge in $maxRounds rounds")
      // materialize (k × |queries| rows) so callers don't recompute the
      // expansion plan after the candidate cache is unpersisted
      result.collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toDF("qid", "rank", "pid", "dist_m")
    } finally fact.unpersist()
  }

  /** DuckDB oracle: brute-force haversine + window top-k (identical rounding
    * and tiebreak). */
  def knnOracleSql(queries: Seq[(Int, Double, Double)], k: Int): String = {
    val qvals = queries.map { case (qid, qlon, qlat) => s"($qid, $qlon, $qlat)" }.mkString(", ")
    val hav = GeoCols.haversineMetersSql("p.lon", "p.lat", "q.qlon", "q.qlat")
    s"""WITH pts AS (${GeoCols.pointsSql}),
       |q(qid, qlon, qlat) AS (VALUES $qvals),
       |d AS (SELECT q.qid, p.pid, $hav AS dist_m FROM pts p CROSS JOIN q),
       |r AS (SELECT qid, pid, dist_m,
       |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_m, pid) AS rank
       |      FROM d)
       |SELECT qid, rank, pid, ROUND(dist_m, 3) AS dist_m FROM r WHERE rank <= $k""".stripMargin
  }
}
