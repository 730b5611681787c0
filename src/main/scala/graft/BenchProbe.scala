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
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
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

  private final class StageStats extends org.apache.spark.scheduler.SparkListener {
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
      val run = si.taskMetrics.executorRunTime / 1e3
      val cpu = si.taskMetrics.executorCpuTime / 1e9
      val gc = si.taskMetrics.jvmGCTime / 1e3
      println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d wall=$wall%6.2f run=$run%7.2f cpu=$cpu%7.2f gc=$gc%6.2f  ${si.name.take(60)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val order = if (args.nonEmpty && args(0) == "rev") Seq(16, 4) else Seq(4, 16)
    for (cpus <- order) {
      val s = session(cpus)
      s.sparkContext.addSparkListener(new StageStats)
      println(s"=== local[$cpus] ===")
      // derive() fills any columns a pre-vertex-era fixture lacks (idempotent
      // on current fixtures)
      val images = graft.sources.ImageTable.derive(
        ImageFixture.read(s, Bench.FixtureDir))
      time(s"scan count 1")(images.count())
      time(s"scan count 2")(images.count())
      time(s"scan count 3")(images.count())
      val req = SnapshotRequest(
        geometry = graft.geo.MultiPolygon(Seq(Fixtures.requestPolygon)),
        geometryTypes = GeomType.all)
      val extracted = images
        .filter(PlanBuilder.geometryFilter(
          req.geometry, col("kind"), col("lon"), col("lat"), col("cell"),
          col("rings")))
        .select(col("image_id"), col("lon"), col("lat"), col("cell"),
          col("bytes"), col("phash"))
      time("extract (PIP)")(extracted.count())
      val decoded = Multimodal.verifyPayloadLite(extracted)
        .filter(col("phash_hamming") <= 8)
        .select(col("image_id").as("pid"), col("lon"), col("lat"), col("cell"))
      time("extract+decode")(decoded.count())
      val assigned = SpatialJoin.assignRegionsKeep(s, decoded, keep = Seq("lon", "lat"))
      time("  +assign(keep)")(assigned.count())
      for (i <- 1 to 3)
        time(s"full flagship rep$i")(
          SpatialJoin.tileAssign(
            SpatialJoin.assignRegionsKeep(s, decoded, keep = Seq("lon", "lat")),
            2, 6).count())
      s.stop()
    }
  }
}
