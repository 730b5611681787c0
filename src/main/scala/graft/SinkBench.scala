package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{ImageFixture, ImageTable}

/** Format-sink micro-benchmark: one N-row feature extract written through
  * every format in the matrix; prints per-format wall time, output size and
  * MB/s. The reference's published anchors (tests/load/locustfile.py): 146 MB
  * GeoJSON in 15–19 s (~8–10 MB/s), 202 MB shapefile in 25–30 s (~7–8 MB/s).
  */
object SinkBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val feats = ImageTable.derive(ImageFixture.generate(spark, n, 16))
      .drop("bytes") // sink bench measures serialization, not image payloads
      .cache()
    feats.count()

    def dirSize(p: String): Long = {
      val path = Paths.get(p)
      if (!Files.exists(path)) 0L
      else {
        val s = Files.walk(path)
        try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
        finally s.close()
      }
    }

    val out = Files.createTempDirectory("sinkbench").toString
    val formats = Seq("geojson", "csv", "shp", "kml", "fgb", "sql", "gpkg",
      "pmtiles", "mbtiles", "parquet")
    formats.foreach { f =>
      val dir = s"$out/$f"
      val t0 = System.nanoTime()
      graft.plan.CustomExport.writeFormat(feats, f, dir, "bench")
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = dirSize(dir) / 1e6
      println(f"[sink] $f%-8s ${sec}%7.2f s  ${mb}%8.1f MB  ${mb / sec}%7.1f MB/s  ${n / sec}%9.0f rows/s")
    }
    spark.stop()
  }
}
