package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Fixtures
import graft.operators.{Multimodal, SpatialJoin}
import graft.plan.PlanBuilder
import graft.model.{GeomType, SnapshotRequest}
import graft.sources.ImageFixture

/** Dev-only stage-by-stage profiler for the flagship pipeline. */
object BenchProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val order = if (args.nonEmpty && args(0) == "rev") Seq(32, 8) else Seq(8, 32)
    for (cpus <- order) {
      val s = session(cpus)
      println(s"=== local[$cpus] ===")
      val images = ImageFixture.read(s, Bench.FixtureDir)
      time(s"scan count")(images.count())
      val req = SnapshotRequest(
        geometry = graft.geo.MultiPolygon(Seq(Fixtures.requestPolygon)),
        geometryTypes = GeomType.all)
      val extracted = images
        .filter(PlanBuilder.geometryFilter(
          req.geometry, col("lon"), col("lat"), col("cell")))
        .select(col("image_id"), col("lon"), col("lat"), col("cell"),
          col("bytes"), col("phash"))
      time("extract (PIP)")(extracted.count())
      val decoded = Multimodal.verifyPayloadLite(extracted)
        .filter(col("phash_hamming") <= 8)
        .select(col("image_id").as("pid"), col("lon"), col("lat"), col("cell"))
      time("extract+decode")(decoded.count())
      val assigned = SpatialJoin.assignRegions(s, decoded)
      time("  +assignRegions")(assigned.count())
      val tiled = SpatialJoin.tileAssign(decoded, 2, 6)
      time("  +tileAssign")(tiled.count())
      for (i <- 1 to 3)
        time(s"full flagship rep$i")(
          SpatialJoin.tileAssign(decoded, 2, 6)
            .join(SpatialJoin.assignRegions(s, decoded), Seq("pid")).count())
      s.stop()
    }
  }
}
