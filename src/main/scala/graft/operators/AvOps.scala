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
    * call; the fake reuses the image fixture's seeded pixel pattern keyed by
    * (video_id, ts) so output is reproducible and the downstream image ops
    * (resize/phash/PSNR) run on REAL PNG bytes. */
  def decodeFrameStub(videoId: String, tsMs: Long, w: Int, h: Int): Array[Byte] = {
    val img = ImageFixture.pixels(s"$videoId@$tsMs", w, h)
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
    val lattice = videos.toDF()
      .select(col("video_id"), col("w"), col("h"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("ts_ms"))
    lattice.as[(String, Int, Int, Long)].mapPartitions { it =>
      // batched: one decoder context per partition, reused across rows —
      // exactly where a real codec would amortize its setup
      it.map { case (vid, w, h, ts) =>
        val png = decodeFrameStub(vid, ts, w, h)
        val (dw, dh, _) = Multimodal.payloadInfo(png)
        // real feature math over the decoded frame (8×8 gray block means)
        val luma = Multimodal.gray8x8(Multimodal.decode(png)).sum / 64.0
        FrameRow(vid, (ts / everyMs).toInt, ts, dw, dh, png, luma)
      }
    }
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
