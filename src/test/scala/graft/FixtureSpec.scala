package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.{ImageFixture, ImageTable}

/** Fixture invariants from BASELINE.json input_hint / FIXTURES.md: decoded
  * pixels PSNR≥40dB (exact for png), caption/tags parity, phash integrity,
  * Iceberg-emulated write layout. */
class FixtureSpec extends SparkSpec {

  private val N = 400L
  private lazy val rows = (0L until N).map(ImageFixture.row)

  test("payload: dims match, PSNR≥40dB (png exact), phash recomputable") {
    rows.foreach { r =>
      val decoded = Multimodal.decode(r.bytes)
      assert(decoded.getWidth == r.w && decoded.getHeight == r.h, r.image_id)
      val src = ImageFixture.pixels(r.image_id, r.w, r.h)
      val p = Multimodal.psnr(decoded, src)
      if (r.fmt == "png") assert(p == 99.0, s"${r.image_id}: png not lossless")
      else assert(p >= 40.0, s"${r.image_id}: jpeg PSNR $p < 40 dB")
      val hamming = java.lang.Long.bitCount(
        ImageFixture.avgHash64(decoded) ^ r.phash)
      if (r.fmt == "png") assert(hamming == 0, r.image_id)
      else assert(hamming <= 8, s"${r.image_id}: phash drift $hamming bits")
    }
    assert(rows.exists(_.fmt == "jpeg") && rows.exists(_.fmt == "png"))
  }

  test("captions parse to non-empty tag maps with name key") {
    rows.foreach { r =>
      val kv = r.caption.split(" ").filter(_.contains("=")).map { t =>
        val Array(k, v) = t.split("=", 2); (k, v)
      }.toMap
      assert(kv.contains("name"), r.caption)
      assert(kv.nonEmpty)
    }
  }

  test("generate/derive in Spark matches local rows; tagsCol parses captions") {
    val df = ImageTable.derive(ImageFixture.generate(spark, N, 4))
    val got = df.select(col("image_id"), col("caption"), col("tags"),
        col("lon"), col("lat"), col("kind"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == N)
    rows.foreach { r =>
      val row = got(r.image_id)
      assert(row.getString(1) == r.caption)
      val tags = row.getMap[String, String](2)
      val expect = r.caption.split(" ").filter(_.contains("="))
        .map { t => val Array(k, v) = t.split("=", 2); (k, v) }.toMap
      assert(tags.toMap == expect, r.image_id)
      val (lon, lat) = (row.getDouble(3), row.getDouble(4))
      assert(lon >= -180 && lon <= 180 && lat >= -85 && lat <= 85)
      assert(Seq("point", "line", "polygon").contains(row.getString(5)))
    }
  }

  test("verifyPayload over the distributed fixture") {
    val df = ImageFixture.generate(spark, N, 4)
    val bad = Multimodal.verifyPayload(df)
      .filter(!col("w_ok") || !col("h_ok") ||
        (col("fmt") === "png" && col("phash_hamming") > 0) ||
        (col("fmt") === "jpeg" && col("phash_hamming") > 8))
      .count()
    assert(bad == 0)
  }

  test("skewed location derivation: hottest res-4 cell ≫ uniform share") {
    val df = ImageTable.derive(ImageFixture.generate(spark, 2000, 4))
    val top = df.groupBy(
        graft.functions.GeoCols.cellCol(4, col("lon"), col("lat")).as("c"))
      .count().orderBy(desc("count")).limit(1)
      .collect().head.getLong(1)
    // uniform share would be ~2000/256 ≈ 8; the cube transform concentrates
    assert(top > 100, s"expected heavy skew, hottest cell has $top")
  }

  test("Iceberg-emulated write: clustered data + manifest + snapshot") {
    val dir = Files.createTempDirectory("imgtbl").toString
    ImageFixture.write(spark, N, dir, partitions = 4)
    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() == N)
    val manifest = spark.read.parquet(s"$dir/manifest")
    assert(manifest.count() >= 1)
    // manifest covers all rows and cell ranges are consistent
    val m = manifest.agg(sum("rows")).collect().head.getLong(0)
    assert(m == N)
    val snap = spark.read.parquet(s"$dir/snapshot").collect().head
    assert(snap.getLong(1) == N)
  }

  test("Iceberg-emulated append commit: snapshot isolation, time travel, incremental read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("imgtbl2").toString
    ImageFixture.write(spark, N, dir, partitions = 4)
    // append a second commit of 50 fresh ids (disjoint id range)
    val extra = ImageFixture.generate(spark, N + 50, 4)
      .filter(col("image_id") > ImageFixture.imageId(N - 1))
    val sid = ImageFixture.append(spark, extra, dir)
    assert(sid == 2L)
    // current read sees both commits; AS OF 1 sees only the first
    assert(ImageFixture.read(spark, dir).count() == N + 50)
    assert(ImageFixture.readSnapshot(spark, dir, 1).count() == N)
    assert(ImageFixture.readSnapshot(spark, dir, 2).count() == N + 50)
    // time travel excludes every appended id, not just the right count
    val oldIds = ImageFixture.readSnapshot(spark, dir, 1)
      .select("image_id").as[String].collect().toSet
    assert(!oldIds.exists(_ > ImageFixture.imageId(N - 1)))
    // incremental (1, 2] = exactly the appended rows (the R1 diff source)
    val inc = ImageFixture.readIncremental(spark, dir, fromExclusive = 1)
    assert(inc.count() == 50)
    assert(inc.select("image_id").as[String].collect()
      .forall(_ > ImageFixture.imageId(N - 1)))
    // empty diff beyond the head snapshot
    assert(ImageFixture.readIncremental(spark, dir, fromExclusive = 2).count() == 0)
    // snapshot log grew by one append entry with the added-row count
    val log = spark.read.parquet(s"$dir/snapshot").orderBy("snapshot_id").collect()
    assert(log.length == 2 && log(1).getLong(0) == 2L && log(1).getLong(1) == 50L)
  }

  test("manifest prunes data files before any parquet footer is opened") {
    val dir = Files.createTempDirectory("imgtbl3").toString
    ImageFixture.write(spark, N, dir, partitions = 8)
    val all = ImageFixture.read(spark, dir)
    val allFiles = all.inputFiles.length
    assert(allFiles >= 8, s"want ≥8 clustered files, got $allFiles")
    // a cell range spanning one cluster chunk: take the cell at the 10th
    // percentile row and a narrow band above it
    val cells = all.select("cell").orderBy("cell")
      .collect().map(_.getLong(0))
    val (lo, hi) = (cells(cells.length / 10), cells(cells.length / 8))
    val pruned = ImageFixture.readPrunedByCell(spark, dir, lo, hi)
    assert(pruned.inputFiles.length < allFiles,
      s"manifest must prune files: ${pruned.inputFiles.length} vs $allFiles")
    // pruning loses no rows vs the unpruned filter
    val expect = all.filter(col("cell") >= lo && col("cell") <= hi).count()
    assert(pruned.count() == expect)
  }
}
