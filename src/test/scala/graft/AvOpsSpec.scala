package graft

import org.apache.spark.sql.functions._
import graft.operators.{AvOps, Multimodal}

/** Audio/video plumbing invariants: the codecs are declared stubs, so what
  * is tested is everything the engine owns — schemas, the timestamp lattice,
  * fan-out counts, zero-shuffle plans, determinism, and that the stub frames
  * are REAL PNG bytes the image pipeline can consume. */
class AvOpsSpec extends SparkSpec {
  import spark.implicits._

  test("frame sampling: lattice fan-out count, schema, real decodable frames") {
    val vids = AvOps.videoFixture(spark, 24).cache()
    val every = 700L
    val frames = AvOps.sampleFrames(vids, every).cache()
    // exact fan-out: one frame per lattice step per video
    val expect = vids.collect().map(v => (v.duration_ms + every - 1) / every).sum
    assert(frames.count() == expect)
    // per-video: indices dense from 0, timestamps on the lattice
    val byVid = frames.collect().groupBy(_.video_id)
    byVid.values.foreach { fs =>
      val idx = fs.map(_.frame_idx).sorted
      assert(idx.toSeq == (0 until fs.length))
      assert(fs.forall(f => f.ts_ms == f.frame_idx * every))
    }
    // stub frames are REAL PNGs: dims match metadata, image ops consume them
    val v0 = vids.collect().head
    val f0 = byVid(v0.video_id).head
    assert(f0.w == v0.w && f0.h == v0.h)
    val (dw, dh, ph) = Multimodal.payloadInfo(f0.frame_png)
    assert(dw == v0.w && dh == v0.h && ph != 0L)
    assert(f0.luma_mean > 0.0 && f0.luma_mean < 255.0)
    vids.unpersist(); frames.unpersist()
    ()
  }

  test("frame sampling is a zero-shuffle narrow plan with the explode in the plan") {
    val vids = AvOps.videoFixture(spark, 8)
    val plan = AvOps.sampleFrames(vids).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n${plan.take(1500)}")
    assert(plan.contains("Generate explode") || plan.contains("Generate"),
      "the lattice fan-out must be a plan-level explode, not driver code")
  }

  test("frame sampling and audio features are deterministic") {
    val vids = AvOps.videoFixture(spark, 6)
    val a = AvOps.sampleFrames(vids).collect().sortBy(f => (f.video_id, f.frame_idx))
    val b = AvOps.sampleFrames(vids).collect().sortBy(f => (f.video_id, f.frame_idx))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.video_id == y.video_id && x.ts_ms == y.ts_ms &&
        java.util.Arrays.equals(x.frame_png, y.frame_png))
    }
  }

  test("video near-dup: identical payloads pair via aligned-frame phash banding") {
    import org.apache.spark.sql.functions.col
    // 20 distinct videos + one EXACT duplicate pair (same payload bytes, new
    // id) + one near-miss (different payload): only the planted pair matches
    val base = AvOps.videoFixture(spark, 20).collect()
    val dup = base(3).copy(video_id = "vidDUPLICATE")
    val all = spark.createDataset(base.toIndexedSeq :+ dup)(
      org.apache.spark.sql.Encoders.product[AvOps.VideoRow])
    val pairs = AvOps.videoNearDup(all, everyMs = 900L).collect()
    assert(pairs.length == 1, pairs.mkString(","))
    val p = pairs.head
    assert(Set(p.getString(0), p.getString(1)) ==
      Set(base(3).video_id, "vidDUPLICATE"))
    assert(p.getDouble(2) == 1.0, "identical payloads → every aligned frame matches")
    // the candidate join is banded (equi-join), never an all-pairs video join
    val plan = AvOps.videoNearDup(all).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // the salt cap is a no-op when no bucket exceeds it
    val capped = AvOps.videoNearDup(all, everyMs = 900L, cap = 10000).collect()
    assert(capped.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet ==
      pairs.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet)
  }

  test("video near-dup salt cap bounds a boilerplate-frame hot bucket") {
    // 12 copies of one payload: every frame bucket holds all 12 videos —
    // cap=3 splits into 4 salt sub-buckets, so the candidate set shrinks from
    // C(12,2)=66 to within-sub-bucket pairs (nsub>1 path actually executed)
    val proto = AvOps.videoFixture(spark, 1).collect().head
    val clones = (0 until 12).map(i => proto.copy(video_id = f"clone$i%02d"))
    val all = spark.createDataset(clones)(
      org.apache.spark.sql.Encoders.product[AvOps.VideoRow])
    val uncapped = AvOps.videoNearDup(all, cap = 1000).count()
    assert(uncapped == 66, s"12 identical videos → all pairs, got $uncapped")
    val capped = AvOps.videoNearDup(all, cap = 3).count()
    assert(capped > 0 && capped < uncapped,
      s"cap must prune the quadratic bucket: $capped vs $uncapped")
  }

  test("audio features: real math over stub PCM, zero shuffle, sane ranges") {
    val audio = AvOps.audioFixture(spark, 32)
    val feats = AvOps.audioFeatures(audio)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "audio features must not shuffle")
    val rows = feats.collect()
    assert(rows.length == 32)
    val meta = audio.collect().map(a => a.audio_id -> a).toMap
    rows.foreach { f =>
      val a = meta(f.audio_id)
      assert(f.duration_ms == a.n_samples * 1000L / a.sample_rate)
      assert(f.rms > 0.0 && f.rms <= 1.0, s"rms ${f.rms}")
      assert(f.zero_cross_rate > 0.0 && f.zero_cross_rate < 1.0)
      assert(f.peak >= f.rms && f.peak <= 1.0)
    }
  }
}
