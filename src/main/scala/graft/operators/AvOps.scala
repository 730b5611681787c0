package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.ImageFixture

/** Audio/video multimodal columns: opaque `binary` payloads + typed
  * metadata, with decode / frame-sample / feature-extract as zero-shuffle
  * batched per-partition maps — the Scala analogue of `mapInPandas`
  * (Iterator[Row] in, Iterator[Row] out, one batch per partition, schema
  * declared up front).
  *
  * The CODECS ARE STUBS, deliberately: no video/audio decode library ships
  * in this container (the reference has none either — it serves vector
  * data), so the byte→frames / byte→PCM step is a clearly-marked
  * deterministic fake seeded from (id, timestamp). Everything AROUND the
  * stub is real and is what the engine actually owns at 100 TB: the typed
  * schemas, the timestamp lattice (a codegen'd `sequence()` column, not a
  * driver loop), the per-partition batch shape, the frame explode fan-out,
  * and the feature math over decoded samples. Swapping the stub for a real
  * codec changes one function.
  */
object AvOps {

  // ---- typed metadata (the `binary` column rides with its description) ------

  final case class VideoRow(video_id: String, bytes: Array[Byte],
      duration_ms: Long, fps: Double, w: Int, h: Int, codec: String)

  final case class AudioRow(audio_id: String, bytes: Array[Byte],
      sample_rate: Int, n_samples: Long, channels: Int, codec: String)

  final case class FrameRow(video_id: String, frame_idx: Int, ts_ms: Long,
      w: Int, h: Int, frame_png: Array[Byte], luma_mean: Double)

  final case class AudioFeatRow(audio_id: String, duration_ms: Long,
      rms: Double, zero_cross_rate: Double, peak: Double)

  // ---- deterministic fixtures ------------------------------------------------

  /** Deterministic video table: payload bytes are an opaque seeded blob (the
    * engine never interprets them — that is the codec's job). */
  def videoFixture(spark: SparkSession, n: Int): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, math.min(8, math.max(1, n / 4))).map { i =>
      val id = f"vid$i%08d"
      val h = ImageFixture.fnv64(id)
      val blob = Array.tabulate(256)(j => ((h >> (j % 56)) ^ j).toByte)
      VideoRow(id, blob,
        duration_ms = 1000L + math.abs(h) % 9000L,
        fps = Seq(24.0, 25.0, 30.0)((math.abs(h >> 7) % 3).toInt),
        w = 16 + 8 * (math.abs(h >> 11) % 3).toInt,
        h = 16 + 8 * (math.abs(h >> 13) % 3).toInt,
        codec = if (math.abs(h >> 17) % 2 == 0) "h264" else "vp9")
    }
  }

  /** Deterministic audio table. */
  def audioFixture(spark: SparkSession, n: Int): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, math.min(8, math.max(1, n / 4))).map { i =>
      val id = f"aud$i%08d"
      val h = ImageFixture.fnv64(id)
      val sr = Seq(8000, 16000, 44100)((math.abs(h >> 5) % 3).toInt)
      AudioRow(id, Array.tabulate(128)(j => ((h >> (j % 48)) ^ (j * 7)).toByte),
        sample_rate = sr,
        n_samples = sr.toLong * (1L + math.abs(h >> 9) % 4L),
        channels = 1 + (math.abs(h >> 15) % 2).toInt,
        codec = "pcm_s16le")
    }
  }

  // ---- STUB codecs (deterministic fakes — see object doc) --------------------

  /** STUB: "decode" one video frame at `tsMs`. Real implementation = a codec
    * call over the payload; the fake reuses the image fixture's seeded pixel
    * pattern keyed by (payload fingerprint, ts) — like a real decoder, output
    * depends on the CONTENT (identical payloads decode to identical frames),
    * is reproducible, and downstream image ops (resize/phash/PSNR) run on
    * REAL PNG bytes. */
  def decodeFrameStub(contentFp: Long, tsMs: Long, w: Int, h: Int): Array[Byte] = {
    val img = ImageFixture.pixels(s"v$contentFp@$tsMs", w, h)
    ImageFixture.encode(img, "png")
  }

  /** STUB: "decode" audio payload to PCM doubles in [-1, 1]. Real
    * implementation = a codec call; the fake is a seeded deterministic
    * waveform so the feature math is exercised on stable input. */
  def decodePcmStub(audioId: String, nSamples: Int): Array[Double] = {
    val seed = ImageFixture.fnv64(audioId)
    val freq = 2.0 + math.abs(seed) % 7
    Array.tabulate(nSamples) { i =>
      math.sin(2 * math.Pi * freq * i / nSamples) *
        (0.5 + 0.5 * (((seed >> (i % 31)) & 1L)).toDouble)
    }
  }

  // ---- the REAL Spark plumbing ----------------------------------------------

  /** Frame sampling: one output row per (video, lattice timestamp). The
    * lattice `0, everyMs, 2·everyMs, … < duration` is a codegen'd
    * `sequence()` explode — the fan-out happens in the plan, not in a
    * driver loop — and the decode runs batched per partition
    * (`mapPartitions`, the mapInPandas batch shape). Zero shuffle. */
  def sampleFrames(videos: Dataset[VideoRow], everyMs: Long = 1000L): Dataset[FrameRow] = {
    import videos.sparkSession.implicits._
    // the payload fingerprint (what the stub "decodes") is computed ONCE per
    // video before the explode, so the big binary column does not ride
    // through the frame fan-out
    val lattice = videos.toDF()
      .select(col("video_id"), xxhash64(col("bytes")).as("fp"),
        col("w"), col("h"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("ts_ms"))
    lattice.as[(String, Long, Int, Int, Long)].mapPartitions { it =>
      // batched: one decoder context per partition, reused across rows —
      // exactly where a real codec would amortize its setup
      it.map { case (vid, fp, w, h, ts) =>
        val png = decodeFrameStub(fp, ts, w, h)
        val (dw, dh, _) = Multimodal.payloadInfo(png)
        // real feature math over the decoded frame (8×8 gray block means)
        val luma = Multimodal.gray8x8(Multimodal.decode(png)).sum / 64.0
        FrameRow(vid, (ts / everyMs).toInt, ts, dw, dh, png, luma)
      }
    }
  }

  /** Video near-duplicate pairs — the multimodal×dedup composition: sample
    * frames on a shared lattice, perceptual-hash each frame (REAL phash over
    * the decoded PNGs, `PngCodec.lumaHash`), then band frames into
    * (frame_idx, phash) buckets so candidate generation is an EQUI-join (two
    * videos pair only if some aligned frame hashes collide exactly — the
    * frame-level analogue of MinHash banding; never an all-pairs video
    * comparison). Verify = fraction of aligned frames with hamming ≤ tol.
    * Output: (vid1, vid2, match_frac) with vid1 < vid2, match_frac ≥ minFrac.
    *
    * Hot buckets (boilerplate frames — intros, black frames — hashing
    * identically across many videos) are salt-capped exactly like the
    * text/embedding LSH joins: buckets above `cap` split into salt
    * sub-buckets so no candidate group is ever quadratic in the corpus; the
    * size histogram joins on the same key as the self-join (exchange
    * reused). Under-cap buckets are exhaustive.
    *
    * Cache lifecycle: frame hashes are released before returning; the
    * (pair-sized) returned frame is the only persisted survivor and its
    * lifecycle is caller-owned (the minhashLsh/knn convention). */
  def videoNearDup(videos: Dataset[VideoRow], everyMs: Long = 1000L,
      tol: Int = 4, minFrac: Double = 0.5, cap: Int = 1024): DataFrame = {
    import videos.sparkSession.implicits._
    // persist: the per-frame decode+phash pipeline feeds 4 DAG branches
    // (histogram, self-join sides, two verify sides) — the Dedup.minhashLsh
    // cache pattern: materialize once, release after the pair-sized result
    val hashes = sampleFrames(videos, everyMs)
      .map(f => (f.video_id, f.frame_idx,
        PngCodec.lumaHash(f.frame_png)._3))
      .toDF("video_id", "frame_idx", "phash")
      .persist()
    val sizes = hashes.groupBy(col("frame_idx"), col("phash")).count()
    val salted = hashes.join(sizes, Seq("frame_idx", "phash"))
      .withColumn("nsub",
        greatest(lit(1L), ceil(col("count").cast("double") / lit(cap.toDouble)).cast("long")))
      .withColumn("salt", pmod(xxhash64(col("video_id")), col("nsub")))
      .select(col("video_id"), col("frame_idx"), col("phash"), col("salt"))
    val l = salted.select(col("frame_idx"), col("phash"), col("salt"),
      col("video_id").as("vid1"))
    val r = salted.select(col("frame_idx"), col("phash"), col("salt"),
      col("video_id").as("vid2"))
    val cand = l.join(r, Seq("frame_idx", "phash", "salt"))
      .filter(col("vid1") < col("vid2"))
      .select(col("vid1"), col("vid2")).distinct()
    // verify candidates over their aligned frames: one equi-join per side,
    // hamming via bit_count(xor) — codegen'd, no UDF. The denominator is the
    // LONGER video's frame count (not the lattice intersection): a 1-frame
    // clip colliding with one boilerplate frame of a 10-frame video scores
    // 0.1, not 1.0
    val h1 = hashes.select(col("video_id").as("vid1"),
      col("frame_idx"), col("phash").as("p1"))
    val h2 = hashes.select(col("video_id").as("vid2"),
      col("frame_idx"), col("phash").as("p2"))
    val counts = hashes.groupBy(col("video_id")).agg(count(lit(1)).as("nf"))
    val matched = cand.join(h1, Seq("vid1")).join(h2, Seq("vid2", "frame_idx"))
      .groupBy(col("vid1"), col("vid2"))
      .agg(sum(when(bit_count(col("p1").bitwiseXOR(col("p2"))) <= tol, 1L)
        .otherwise(0L)).as("nmatch"))
    val result = matched
      .join(counts.select(col("video_id").as("vid1"), col("nf").as("nf1")), Seq("vid1"))
      .join(counts.select(col("video_id").as("vid2"), col("nf").as("nf2")), Seq("vid2"))
      .select(col("vid1"), col("vid2"),
        round(col("nmatch").cast("double") /
          greatest(col("nf1"), col("nf2")), 4).as("match_frac"))
      .filter(col("match_frac") >= minFrac)
      .persist()
    result.count()
    hashes.unpersist()
    result
  }

  /** Audio feature extraction: duration, RMS, zero-crossing rate, peak —
    * real math over the (stub-)decoded PCM, batched per partition, zero
    * shuffle. PCM length is capped so the fake decode stays O(batch). */
  def audioFeatures(audio: Dataset[AudioRow], maxSamples: Int = 4096): Dataset[AudioFeatRow] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { it =>
      it.map { a =>
        val n = math.min(a.n_samples, maxSamples.toLong).toInt
        val pcm = decodePcmStub(a.audio_id, n)
        var sum2 = 0.0; var peak = 0.0; var zc = 0
        var i = 0
        while (i < n) {
          val v = pcm(i)
          sum2 += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && (pcm(i - 1) >= 0) != (v >= 0)) zc += 1
          i += 1
        }
        AudioFeatRow(a.audio_id,
          duration_ms = a.n_samples * 1000L / a.sample_rate,
          rms = math.sqrt(sum2 / math.max(1, n)),
          zero_cross_rate = zc.toDouble / math.max(1, n - 1),
          peak = peak)
      }
    }
  }
}
