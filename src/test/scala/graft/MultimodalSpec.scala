package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}
import graft.sources.ImageFixture

/** Multimodal → similarity integration: image payloads to feature vectors to
  * near-duplicate detection (the full training-data-pipeline path). */
class MultimodalSpec extends SparkSpec {

  test("extractFeatures: 64-dim vectors from real decode") {
    val images = ImageFixture.generate(spark, 200, 4)
    val feats = Multimodal.extractFeatures(images)
    val rows = feats.collect()
    assert(rows.length == 200)
    assert(rows.forall(_.getSeq[Float](1).length == 64))
    // deterministic: same id → same vector
    val again = Multimodal.extractFeatures(images).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getString(0)) == r.getSeq[Float](1)))
  }

  test("payload copies under new ids are found by feature-space near-dup LSH") {
    val images = ImageFixture.generate(spark, 150, 4)
    // plant 20 exact payload copies under shifted ids
    val copies = images.filter(
        col("image_id").isin((0L until 20L).map(ImageFixture.imageId): _*))
      .withColumn("image_id", concat(lit("copy_"), col("image_id")))
    val feats = Multimodal.extractFeatures(images.unionByName(copies))
      .withColumn("vec_id", xxhash64(col("image_id")))
    val emb = feats.select(col("vec_id"), col("embedding"), lit(0).as("label"))
    val pairs = Similarity.nearDupLsh(emb, tau = 0.999999)
    // identical payloads → identical vectors → cosine 1, same LSH bucket
    assert(pairs.count() >= 20, s"expected ≥20 exact-copy pairs, got ${pairs.count()}")
  }

  test("thumbnails: decode → resize → re-encode roundtrip with correct dims") {
    val images = ImageFixture.generate(spark, 60, 2)
    val thumbs = Multimodal.thumbnails(images, 8, 8).collect()
    assert(thumbs.length == 60)
    thumbs.foreach { r =>
      val img = Multimodal.decode(r.getAs[Array[Byte]]("thumb"))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
    // resize preserves overall brightness (area average): mean luma close
    val orig = ImageFixture.row(0L)
    val big = Multimodal.decode(orig.bytes)
    val small = Multimodal.resize(big, 8, 8)
    def meanLuma(i: java.awt.image.BufferedImage): Double = {
      var s = 0.0
      for (y <- 0 until i.getHeight; x <- 0 until i.getWidth) {
        val p = i.getRGB(x, y)
        s += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
      }
      s / (i.getWidth * i.getHeight)
    }
    assert(math.abs(meanLuma(big) - meanLuma(small)) < 3.0)
  }

  test("verifyPayload full variant flags dims and hamming") {
    val images = ImageFixture.generate(spark, 100, 2)
    val v = Multimodal.verifyPayload(images)
    assert(v.filter(!col("w_ok") || !col("h_ok")).count() == 0)
    assert(v.filter(col("fmt") === "png" && col("phash_hamming") > 0).count() == 0)
  }
}
