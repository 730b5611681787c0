package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{ImageFixture, ImageTable}

/** Where does MVT tile-archive time go? Stages measured independently on
  * the same extract: tile explode only, + cap windows, + per-tile group,
  * full payload encode (protobuf+gzip), and the kernel alone off-Spark. */
object MvtMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val feats = ImageTable.derive(ImageFixture.generate(spark, n, 16))
      .drop("bytes").cache()
    feats.count()

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mvt-micro] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }

    val zooms = (2, 6)
    time("explode+group+count only") {
      graft.operators.SpatialJoin
        .tileAssign(feats.select(col("lon"), col("lat"), col("image_id")), zooms._1, zooms._2)
        .groupBy("z", "tx", "ty").count().count()
    }
    time("payloads cap=off") {
      graft.sinks.Mvt.tilePayloads(feats, zooms, "bench",
        maxFeaturesPerTile = 0).count()
    }
    time("payloads cap=10000 (default)") {
      graft.sinks.Mvt.tilePayloads(feats, zooms, "bench").count()
    }
    time("full pmtiles writeMvt") {
      graft.sinks.PmTiles.writeMvt(feats,
        java.nio.file.Files.createTempDirectory("mvtmicro").toString + "/t.pmtiles",
        zooms, "bench")._1
    }
    spark.stop()
  }
}
