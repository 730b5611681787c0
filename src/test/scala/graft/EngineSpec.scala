package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoCols
import graft.geo.{Cell, Fixtures, Geo}
import graft.operators.{Knn, SpatialJoin}

/** Column-expression ↔ Scala-kernel parity, and distributed operators vs
  * plain-Scala oracles on the derived point set. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val points = GeoCols.derivedPoints(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq

  test("entry() flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("derived points are in range and deterministic") {
    assert(points.nonEmpty)
    assert(points.forall { case (_, lon, lat) =>
      lon >= -180 && lon < 180 && lat >= -85 && lat < 85 })
    val again = GeoCols.derivedPoints(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(again == points.toSet)
  }

  test("pipCol matches the Scala kernel on all derived points") {
    val poly = Fixtures.requestPolygon
    val sparkIn = GeoCols.derivedPoints(spark, sfDir)
      .filter(GeoCols.pipCol(poly, col("lon"), col("lat")))
      .select("pid").collect().map(_.getLong(0)).toSet
    val oracleIn = points.filter { case (_, lon, lat) =>
      Geo.pointInPolygon(lon, lat, poly) }.map(_._1).toSet
    assert(sparkIn == oracleIn)
  }

  test("cellCol matches Cell.cellAt on all derived points") {
    val got = GeoCols.derivedPoints(spark, sfDir)
      .select(col("pid"), GeoCols.cellCol(7, col("lon"), col("lat")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    points.foreach { case (pid, lon, lat) =>
      assert(got(pid) == Cell.cellAt(7, lon, lat), s"pid=$pid")
    }
  }

  test("haversineMetersCol ≈ kernel haversine") {
    val (qlon, qlat) = (10.0, 20.0)
    val got = GeoCols.derivedPoints(spark, sfDir).limit(200)
      .select(col("pid"), col("lon"), col("lat"),
        GeoCols.haversineMetersCol(col("lon"), col("lat"), lit(qlon), lit(qlat)).as("d"))
      .collect()
    got.foreach { r =>
      val expect = Geo.haversineMeters(r.getDouble(1), r.getDouble(2), qlon, qlat)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6 * math.max(1.0, expect))
    }
  }

  test("assignRegions matches plain-Scala PIP oracle (incl. empty→0 default)") {
    val got = SpatialJoin.assignRegions(spark, GeoCols.derivedPoints(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    points.foreach { case (pid, lon, lat) =>
      val cids = Fixtures.regions
        .filter(r => Geo.pointInPolygon(lon, lat, r.poly)).map(_.cid).sorted
      val expect = if (cids.isEmpty) "0" else cids.mkString(",")
      assert(got(pid) == expect, s"pid=$pid ($lon,$lat)")
    }
    // fixture sanity: multi-membership and no-membership both occur
    assert(got.values.exists(_.contains(",")), "no overlapping regions exercised")
    assert(got.values.exists(_ == "0"), "no empty-default exercised")
  }

  test("shuffle-salted assignment equals the broadcast variant") {
    val pts = GeoCols.derivedPoints(spark, sfDir)
    val broadcastRes = SpatialJoin.assignRegions(spark, pts)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // force salting on every occupied cell (hotThreshold 0) to exercise the
    // replicate-and-join path end to end
    val salted = SpatialJoin.assignRegionsShuffleSalted(
        spark, pts, saltFactor = 4, hotThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == broadcastRes)
  }

  test("knn with a 100-query TABLE equals the brute oracle (mixed round retirement)") {
    // queries spread worldwide: different queries satisfy in different
    // expansion rounds, exercising the per-query radius state machine the
    // 4-query gate barely touches
    val rng = new Fixtures.Lcg(909L)
    val qs = (1 to 100).map(q =>
      (q, -179.0 + 358.0 * rng.nextDouble(), -84.0 + 168.0 * rng.nextDouble()))
    val k = 5
    val got = Knn.knn(GeoCols.derivedPoints(spark, sfDir), qs.toDF("qid", "qlon", "qlat"), k)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val expect = qs.flatMap { case (qid, qlon, qlat) =>
      points.map { case (pid, lon, lat) =>
        (qid, pid, Geo.haversineMeters(lon, lat, qlon, qlat)) }
        .sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, pid, _), i) => (qid, i + 1, pid) }
    }.toSet
    assert(got == expect)
  }

  test("knn k > |points| converges via the whole-globe bound and returns everything") {
    val few = points.take(7)
    val df = few.toDF("pid", "lon", "lat")
    val out = Knn.knn(df, Seq((1, 0.0, 0.0)).toDF("qid", "qlon", "qlat"), k = 50)
      .collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(2)).toSet == few.map(_._1).toSet)
  }

  test("knn equals brute-force linear-scan oracle") {
    val k = 8
    val got = Knn.knn(spark, GeoCols.derivedPoints(spark, sfDir),
        Fixtures.knnQueries, k)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val expect = Fixtures.knnQueries.flatMap { case (qid, qlon, qlat) =>
      points.map { case (pid, lon, lat) =>
        (qid, pid, Geo.haversineMeters(lon, lat, qlon, qlat)) }
        .sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, pid, _), i) => (qid, i + 1, pid) }
    }.toSet
    assert(got == expect)
  }

  test("tileAssign matches slippy-map formula") {
    val got = SpatialJoin.tileAssign(GeoCols.derivedPoints(spark, sfDir), 3, 3)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    points.foreach { case (pid, lon, lat) =>
      val n = 8 // 2^3
      val xt = math.min(n - 1, math.max(0, math.floor((lon + 180) / 360 * n))).toLong
      val latR = math.toRadians(lat)
      val yt = math.min(n - 1, math.max(0, math.floor(
        (1 - math.log(math.tan(latR) + 1 / math.cos(latR)) / math.Pi) / 2 * n))).toLong
      assert(got(pid) == ((3, xt, yt)), s"pid=$pid")
    }
  }
}
