package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** Dedup/similarity recall properties on planted near-duplicates. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def word(i: Int) = s"w${i % 97}x${(i * 31) % 89}"

  /** 200 base docs + 40 planted near-dups (one word changed). */
  private lazy val docs = {
    val base = (0 until 200).map { i =>
      val words = (0 until 40).map(j => word(i * 131 + j * 7))
      (i.toLong, words.mkString(" "))
    }
    val dups = (0 until 40).map { i =>
      val (origId, text) = base(i * 3)
      val words = text.split(" ").toVector.updated(20, "CHANGED")
      (1000L + origId, words.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("minhashLsh finds planted near-dup pairs (banding recall ≥ 0.9)") {
    val pairs = Dedup.minhashLsh(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 40).map(i => ((i * 3).toLong, 1000L + i * 3)).toSet
    // one changed word of 40 → jac ≈ 0.85; P(pair survives 4 bands of 4)
    // ≈ 95%, so allow a small banding miss but require ≥90% recall
    val found = expected.intersect(pairs)
    assert(found.size >= 36, s"recall ${found.size}/40; missing ${expected -- pairs}")
    // precision is exact by construction: every reported pair is verified
    val jacs = Dedup.minhashLsh(docs, tau = 0.5).select("jac")
      .collect().map(_.getDouble(0))
    assert(jacs.forall(_ >= 0.5))
  }

  test("minhashLshCapped bounds hot buckets and is a no-op without skew") {
    // no skew: identical output
    val a = Dedup.minhashLsh(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.minhashLshCapped(docs, tau = 0.5, cap = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // hot bucket: 500 identical docs land in ONE bucket per band; the cap
    // must keep every join group ≤ ~cap and prune the quadratic pair set
    val hot = (0 until 500).map(i => (i.toLong, "same boilerplate text every time"))
      .toDF("doc_id", "text")
    val cap = 50
    val capped = Dedup.minhashLshCapped(hot, tau = 0.5, cap = cap).count()
    val full = 500L * 499 / 2
    assert(capped > 0 && capped < full / 4,
      s"cap must prune the quadratic bucket: $capped vs $full")
  }

  test("simhash: near-dups within small hamming distance, random docs far") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 40).foreach { i =>
      val d = hamming(sh((i * 3).toLong), sh(1000L + i * 3))
      assert(d <= 6, s"planted dup $i hamming $d")
    }
    val dRand = hamming(sh(1L), sh(101L))
    assert(dRand > 6, s"unrelated docs too close: $dRand")
  }

  test("exact dedup groups identical normalized text") {
    val withCopies = docs.union(docs.limit(10)) // 10 exact copies
    val d = TextOps.dedupExact(withCopies)
    assert(d.filter(col("n_copies") === 2).count() == 10)
    assert(d.agg(sum("n_copies")).collect().head.getLong(0) == 250)
  }

  test("LSH near-dup: precision exact; high recall on planted near-dups") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant 25 true near-duplicates: tiny perturbation of an existing vector
    val planted = emb.filter(col("vec_id") < 25)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + (i.cast("float") * lit(1e-5f))).as("embedding"),
        col("label"))
    val all = emb.unionByName(planted)
    val got = Similarity.nearDupLsh(all, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 25).map(i => (i.toLong, 100000L + i)).toSet
    // sign-LSH: each of 8 projections flips w.p. θ/π ≈ tiny for cos≈1;
    // expect near-total recall of the planted pairs
    val found = expected.intersect(got)
    assert(found.size >= 20, s"recall ${found.size}/25")
    // precision: every reported pair really has cosine ≥ 0.99 (verified by
    // the exact cosine filter inside the operator); no non-planted pair in
    // this data reaches 0.99
    assert(got.subsetOf(expected), s"false positives: ${got -- expected}")
  }
}
