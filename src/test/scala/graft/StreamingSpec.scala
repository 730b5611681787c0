package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Incremental

/** Structured-streaming equivalence and incremental-maintenance semantics. */
class StreamingSpec extends SparkSpec {

  test("streaming geojson export: per-batch lineage commits, parseable union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double, Double)]
    val features = in.toDF().toDF("image_id", "lon", "lat")
    val outDir = Files.createTempDirectory("sgeo").toString
    val ckpt = Files.createTempDirectory("sgeo_ck").toString
    val q = Incremental.streamGeojsonExport(features, outDir, ckpt)
    try {
      in.addData(("s1", 1.0, 2.0), ("s2", 3.0, 4.0))
      q.processAllAvailable()
      in.addData(("s3", 5.0, 6.0))
      q.processAllAvailable()
    } finally q.stop()
    // two committed batch directories, 3 features total, each valid JSON
    val batches = Files.list(Paths.get(outDir)).toArray.map(_.toString)
      .filter(_.contains("batch=")).sorted
    assert(batches.length == 2, batches.mkString(","))
    val lines = batches.flatMap { b =>
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(b, "parts")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".jsonl"))
        .flatMap(p => Files.readAllLines(p).asScala)
        .filter(_.nonEmpty)
    }
    assert(lines.length == 3)
    val parsed = spark.read.json(lines.toSeq.toDS)
    assert(parsed.filter(col("type") === "Feature").count() == 3)
  }

  test("replication loop end-to-end: Iceberg append → incremental diff → latest-wins upsert") {
    import spark.implicits._
    import graft.sources.ImageFixture
    // snapshot 1: the base table
    val dir = java.nio.file.Files.createTempDirectory("repl").toString
    ImageFixture.write(spark, 200, dir, partitions = 4)
    val base = ImageFixture.readSnapshot(spark, dir, 1)
      .select(col("image_id"), col("caption"), lit(1L).as("version"))
    // snapshot 2: replication batch — 30 changed ids (same ids, new payloads)
    val changed = ImageFixture.generate(spark, 30, 2)
      .withColumn("caption", concat(lit("UPDATED "), col("caption")))
    ImageFixture.append(spark, changed, dir)
    // the diff read is a manifest filter — exactly the minutely diff source
    val diff = ImageFixture.readIncremental(spark, dir, fromExclusive = 1)
      .select(col("image_id"), col("caption"), lit(2L).as("version"))
    assert(diff.count() == 30)
    val merged = graft.streaming.Incremental.upsert(base, diff, "image_id", "version")
    assert(merged.count() == 200, "upsert replaces, never duplicates")
    val updated = merged.filter(col("caption").startsWith("UPDATED"))
    assert(updated.count() == 30)
    assert(merged.filter(col("version") === 2L).count() == 30)
  }

  test("streaming windowed agg over events == batch result") {
    // file source needs a directory; stage the events parquet into one
    val dir = Files.createTempDirectory("evstream")
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(src.toString).schema

    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts2", col("ts").cast("timestamp"))
      .withWatermark("ts2", "10 minutes")
      .groupBy(window(col("ts2"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ev_windows")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.sql(
      """SELECT unix_millis(window.start) AS ws, event_type, cnt, sum_value
        |FROM ev_windows""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = spark.read.parquet(src.toString)
      .groupBy(window(col("ts").cast("timestamp"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState replication stream suppresses stale versions across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Incremental.FeatureUpdate]
    val q = Incremental.latestWinsStream(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("repl_out").start()
    // batch 1: v1 then v3 for id 1 (one emit, the max), v2 for id 2
    in.addData(
      Incremental.FeatureUpdate(1, 1, "a1"),
      Incremental.FeatureUpdate(1, 3, "a3"),
      Incremental.FeatureUpdate(2, 2, "b2"))
    q.processAllAvailable()
    // batch 2: stale v2 for id 1 (suppressed by state), newer v4 (emitted),
    // duplicate v2 for id 2 (suppressed)
    in.addData(
      Incremental.FeatureUpdate(1, 2, "a2-stale"),
      Incremental.FeatureUpdate(2, 2, "b2-dup"))
    q.processAllAvailable()
    in.addData(Incremental.FeatureUpdate(1, 4, "a4"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT id, version, payload FROM repl_out")
      .as[Incremental.FeatureUpdate].collect().toSet
    assert(got == Set(
      Incremental.FeatureUpdate(1, 3, "a3"),
      Incremental.FeatureUpdate(2, 2, "b2"),
      Incremental.FeatureUpdate(1, 4, "a4")))
  }

  test("upsert: latest version wins, others pass through") {
    import spark.implicits._
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "v", "version")
    val updates = Seq((2L, "b2", 2L), (4L, "d", 1L)).toDF("id", "v", "version")
    val got = Incremental.upsert(base, updates, "id", "version")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
  }

  test("windowed reassignment is idempotent and touches only the window") {
    import spark.implicits._
    val t = (ms: Long) => new java.sql.Timestamp(ms)
    val pts = graft.functions.GeoCols.derivedPoints(spark, "/root/testdata/sf0.001")
      .withColumn("ts", when(col("pid") % 2 === 0,
        lit(t(1000000))).otherwise(lit(t(2000000))))
    val assigned = graft.operators.SpatialJoin.assignRegionsKeep(
      spark, pts, keep = Seq("lon", "lat", "ts"))
    // corrupt the in-window half, then reassign the window
    val corrupted = assigned.withColumn("cids",
      when(col("ts") === lit(t(1000000)), lit("CORRUPT")).otherwise(col("cids")))
    val repaired = Incremental.reassignWindow(
      spark, corrupted.select("pid", "lon", "lat", "ts", "cids"),
      t(0), t(1500000))
    val diff = repaired.select("pid", "cids")
      .except(assigned.select("pid", "cids")).count()
    assert(diff == 0)
  }

  test("watermark reads the snapshot high-water mark") {
    import spark.implicits._
    val snap = Seq((1L, 10L, 111L), (2L, 20L, 222L))
      .toDF("snapshot_id", "row_count", "committed_at")
    assert(Incremental.watermark(snap) == 222L)
  }
}
