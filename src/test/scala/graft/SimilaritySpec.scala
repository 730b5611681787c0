package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geo.Fixtures.Lcg
import graft.operators.Similarity

/** ANN/near-dup scale-shape and quality invariants:
  *  - the IVF candidate join must be an equi-join (BroadcastHashJoin), never
  *    a nested loop — the round-1 plan tested every fact row against every
  *    query row at the join operator;
  *  - LSH plane count scales with data size and hot buckets are salt-capped
  *    so no join group is ever quadratic in the table;
  *  - the trained quantizer must actually recall brute-force neighbors on
  *    clusterable data (untrained random centroids don't).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def clusteredEmb(n: Int, centers: Int = 8, noise: Double = 0.05): DataFrame = {
    val rng = new Lcg(77L)
    val cents = Array.fill(centers)(Array.fill(Similarity.Dims)(rng.nextDouble() * 2 - 1))
    (0L until n.toLong).map { id =>
      val c = cents((id % centers).toInt)
      val e = Array.tabulate(Similarity.Dims)(i =>
        (c(i) + noise * (rng.nextDouble() * 2 - 1)).toFloat)
      (id, e)
    }.toDF("vec_id", "embedding")
  }

  test("annIvf candidate join is BroadcastHashJoin, not a nested loop") {
    val emb = clusteredEmb(200)
    val plan = Similarity.annIvf(emb).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe join must be equi:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ means the probe list was not exploded")
    assert(!plan.contains("CartesianProduct"))
  }

  test("nearDupLsh self-join is an equi-join on bucket") {
    val emb = clusteredEmb(200)
    for (df <- Seq(Similarity.nearDupLsh(emb, 0.9),
        Similarity.nearDupLshCapped(emb, 0.9, cap = 50))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"near-dup join must be bucket-keyed:\n${plan.take(2000)}")
    }
  }

  test("planesFor grows bucket count with data size") {
    assert(Similarity.planesFor(1000L) == Similarity.Planes)
    assert(Similarity.planesFor(10000000L) > Similarity.planesFor(100000L))
    assert(Similarity.planesFor(Long.MaxValue) <= 24)
  }

  test("hot-bucket cap bounds every candidate group on skewed data") {
    // 600 near-identical vectors: one LSH bucket holds everything — the
    // uncapped self-join would be ~180k pairs; the cap must bound each
    // (bucket, salt) group to ~cap rows
    val base = Array.fill(Similarity.Dims)(0.5f)
    val emb = (0L until 600L).map(id =>
      (id, base.updated(0, 0.5f + (id % 7).toFloat * 1e-4f))).toDF("vec_id", "embedding")
    val cap = 50
    val bucketed = emb.select(col("vec_id"),
      Similarity.bucketCol(col("embedding")).as("bucket"))
      .withColumn("salt", pmod(xxhash64(col("vec_id")),
        lit(math.ceil(600.0 / cap).toLong)))
    val maxGroup = bucketed.groupBy("bucket", "salt").count()
      .agg(max("count")).as[Long].head()
    assert(maxGroup <= cap * 2, s"salted group of $maxGroup exceeds cap bound")
    val cappedPairs = Similarity.nearDupLshCapped(emb, 0.999, cap = cap).count()
    val uncappedPairs = Similarity.nearDupLsh(emb, 0.999).count()
    assert(cappedPairs > 0 && cappedPairs < uncappedPairs,
      s"cap must prune the quadratic bucket: $cappedPairs vs $uncappedPairs")
  }

  test("cap is a no-op when no bucket exceeds it") {
    val emb = clusteredEmb(150)
    val a = Similarity.nearDupLsh(emb, 0.9).orderBy("vid1", "vid2").collect()
    val b = Similarity.nearDupLshCapped(emb, 0.9, cap = 1000)
      .orderBy("vid1", "vid2").collect()
    assert(a.sameElements(b))
    // auto variant sizes planes from the table and still finds pairs
    assert(Similarity.nearDupLshAuto(emb, 0.9).count() > 0)
  }

  test("trained IVF recalls brute-force neighbors on clustered data") {
    val emb = clusteredEmb(400).cache()
    val k = 5
    val brute = Similarity.annBrute(emb, nQueries = 4, k = k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(emb, nQueries = 4, k = k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall@$k = $recall — quantizer failed to localize clusters")
    emb.unpersist()
    ()
  }

  test("kListFor/sampleModFor scale with n and stay bounded") {
    // floor at the gate defaults, growth ≈ √(n/listSize), hard caps
    assert(Similarity.kListFor(1000L) == Similarity.DefaultK)
    assert(Similarity.kListFor(1L << 30) > Similarity.kListFor(1L << 24))
    assert(Similarity.kListFor(1000000000000L) <= 65536)
    assert(Similarity.sampleModFor(1000L) == Similarity.SampleMod)
    // at 10^12 rows the per-iteration training scan stays ~2^18 rows
    val mod12 = Similarity.sampleModFor(1000000000000L).toLong
    assert(1000000000000L / mod12 <= (1L << 19))
    // probed fraction nprobe/k is sublinear: grows n 64×, fraction shrinks
    val f1 = Similarity.DefaultNProbe.toDouble / Similarity.kListFor(1L << 24)
    val f2 = Similarity.DefaultNProbe.toDouble / Similarity.kListFor(1L << 30)
    assert(f2 < f1, s"probed fraction must shrink with n: $f1 -> $f2")
  }

  test("auto-sized IVF probes a shrinking fraction of the table, recall held") {
    // two fixture sizes; small targetListSize so kListFor actually grows in
    // test range (same formula the 4096-default uses at 10^12)
    def probedFraction(n: Int): Double = {
      val emb = clusteredEmb(n, centers = 8).cache()
      val k = Similarity.kListFor(n.toLong, targetListSize = 16L)
      val cents = Similarity.trainCentroids(emb, k)
      val assigned = Similarity.ivfAssign(emb, cents)
      val probes = Similarity.ivfProbes(emb, cents, nQueries = 4)
        .select("qid", "bucket")
      val candidates = assigned.join(probes, Seq("bucket")).count()
      val frac = candidates.toDouble / (n.toLong * 4)
      emb.unpersist()
      frac
    }
    val fSmall = probedFraction(400)
    val fBig = probedFraction(4000)
    assert(fBig < fSmall,
      s"auto-sized IVF must touch a smaller fraction as n grows: $fSmall -> $fBig")
    // recall stays ≥0.9 with the grown list count
    val emb = clusteredEmb(4000, centers = 8).cache()
    val k = Similarity.kListFor(4000L, targetListSize = 16L)
    val brute = Similarity.annBrute(emb, nQueries = 4, k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(emb, nQueries = 4, k = 5, kList = k)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall = $recall at kList=$k")
    emb.unpersist()
    ()
  }

  test("k-means training is deterministic and drops empty clusters consistently") {
    val emb = clusteredEmb(200)
    val c1 = Similarity.trainCentroids(emb)
    val c2 = Similarity.trainCentroids(emb)
    assert(c1.map(_._1) == c2.map(_._1))
    assert(c1.zip(c2).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    assert(c1.nonEmpty && c1.size <= Similarity.DefaultK)
  }
}
