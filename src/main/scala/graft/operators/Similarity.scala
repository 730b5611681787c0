package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.Fixtures.Lcg

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * Array[Float] ×64, label).
  *
  * - brute-force cosine top-k: broadcast the (tiny) query set, one pass over
  *   the fact table, per-query window top-k — the exactness baseline;
  * - LSH-bucketed near-dup: sign-projection onto fixed hyperplanes buckets
  *   vectors so the candidate self-join touches only same-bucket pairs — the
  *   scale path (at 10^12 rows the bucket join replaces an impossible
  *   all-pairs cross join; bucket count grows with plane count).
  *
  * Dot products are unrolled per-dimension column sums (left-associated, in
  * double), structurally identical in the DuckDB oracle → bit-identical
  * floats.
  */
object Similarity {

  val Dims = 64

  /** Left-associated unrolled dot product of two array<float> columns. */
  def dotCol(a: Column, b: Column): Column =
    (0 until Dims).map(i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double"))
      .reduce(_ + _)

  def dotSql(aE: String, bE: String): String =
    (0 until Dims).map(i =>
      s"$aE[${i + 1}]::DOUBLE * $bE[${i + 1}]::DOUBLE").mkString("(", " + ", ")")

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (sqrt(dotCol(a, a)) * sqrt(dotCol(b, b)))

  def cosineSql(aE: String, bE: String): String =
    s"(${dotSql(aE, bE)} / (SQRT(${dotSql(aE, aE)}) * SQRT(${dotSql(bE, bE)})))"

  /** Exact top-k cosine neighbors for query vectors (vec_id < nQueries).
    * Output: (qid, rank, vec_id, cos). */
  def annBrute(emb: DataFrame, nQueries: Int = 4, k: Int = 5): DataFrame = {
    // norms are projected ONCE per side before the join (same arithmetic as
    // the per-pair oracle expression → identical doubles, 3× fewer flops)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        sqrt(dotCol(col("embedding"), col("embedding"))).as("qn"))
    val cand = emb.select(col("vec_id"), col("embedding"),
      sqrt(dotCol(col("embedding"), col("embedding"))).as("n"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos",
        round(dotCol(col("qe"), col("embedding")) / (col("qn") * col("n")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  def annBruteSql(nQueries: Int = 4, k: Int = 5): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $nQueries),
       |d AS (SELECT q.qid, e.vec_id,
       |        round(${cosineSql("q.qe", "e.embedding")}, 6) AS cos
       |      FROM embeddings e JOIN q ON e.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id, cos,
       |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |      FROM d)
       |SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $k""".stripMargin

  // ---- LSH bucketing ----------------------------------------------------------

  val Planes = 8
  val ProjDims = 16 // project on leading dims: keeps the oracle SQL compact

  /** Fixed random hyperplanes (literal coefficients, deterministic LCG). */
  val hyperplanes: Seq[Array[Double]] = {
    val rng = new Lcg(11L)
    Seq.fill(Planes)(Array.fill(ProjDims)(rng.nextDouble() * 2 - 1))
  }

  def bucketCol(e: Column): Column =
    (0 until Planes).map { j =>
      val proj = (0 until ProjDims).map(i =>
        element_at(e, i + 1).cast("double") * lit(hyperplanes(j)(i))).reduce(_ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def bucketSql(eE: String): String =
    (0 until Planes).map { j =>
      val proj = (0 until ProjDims).map(i =>
        s"$eE[${i + 1}]::DOUBLE * ${hyperplanes(j)(i)}").mkString(" + ")
      s"(CASE WHEN ($proj) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---- IVF (inverted-file) bucketing -----------------------------------------
  // Coarse quantizer: fixed literal centroids (deterministic LCG); every
  // vector goes to its nearest centroid's list; queries probe the nprobe
  // nearest lists. At 10^12 rows this is the classic ANN scale path: the
  // candidate join touches only probed lists, and the centroid assignment is
  // a narrow codegen'd map.

  val Centroids = 8

  val centroids: Seq[Array[Double]] = {
    val rng = new Lcg(21L)
    Seq.fill(Centroids)(Array.fill(Dims)(rng.nextDouble() * 0.2 - 0.1))
  }

  /** Squared-distance score to centroid c: cc - 2·(e·c) (the e·e term is
    * constant per row and argmin-irrelevant). */
  def centroidScoreCol(e: Column, c: Int): Column = {
    val cc = centroids(c).map(x => x * x).sum
    val dot = (0 until Dims).map(i =>
      element_at(e, i + 1).cast("double") * lit(centroids(c)(i))).reduce(_ + _)
    lit(cc) - lit(2.0) * dot
  }

  def centroidScoreSql(eE: String, c: Int): String = {
    val cc = centroids(c).map(x => x * x).sum
    val dot = (0 until Dims).map(i =>
      s"$eE[${i + 1}]::DOUBLE * ${centroids(c)(i)}").mkString(" + ")
    s"($cc - 2.0 * ($dot))"
  }

  /** first-index argmin over score columns s0..s{n-1} (ties → lowest index;
    * identical CASE shape in the SQL twin). */
  private def argminCol(scores: Seq[Column]): Column = {
    val m = least(scores: _*)
    scores.zipWithIndex.tail.foldLeft(when(scores.head === m, lit(0))) {
      case (acc, (s, i)) => acc.when(s === m, lit(i))
    }.otherwise(lit(-1))
  }

  /** (vec_id, embedding, bucket) — IVF list assignment. */
  def ivfAssign(emb: DataFrame): DataFrame = {
    val scored = (0 until Centroids).foldLeft(emb) { (df, c) =>
      df.withColumn(s"s$c", centroidScoreCol(col("embedding"), c))
    }
    val scores = (0 until Centroids).map(c => col(s"s$c"))
    scored.select(col("vec_id"), col("embedding"),
      argminCol(scores).as("bucket"))
  }

  /** IVF top-k: probe the 2 nearest lists per query, exact cosine rank
    * within candidates. Output (qid, rank, vec_id, cos). */
  def annIvf(emb: DataFrame, nQueries: Int = 4, k: Int = 5): DataFrame = {
    val assigned = ivfAssign(emb)
    val qScored = (0 until Centroids).foldLeft(
      emb.filter(col("vec_id") < nQueries)) { (df, c) =>
      df.withColumn(s"s$c", centroidScoreCol(col("embedding"), c))
    }
    val scores = (0 until Centroids).map(c => col(s"s$c"))
    val b1 = argminCol(scores)
    // second-nearest: mask the winner with +inf, argmin again
    val masked = scores.zipWithIndex.map { case (s, i) =>
      when(b1 === i, lit(Double.MaxValue)).otherwise(s)
    }
    val q = qScored.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      sqrt(dotCol(col("embedding"), col("embedding"))).as("qn"),
      b1.as("b1"), argminCol(masked).as("b2"))
    val cand = assigned.select(col("vec_id"), col("embedding"), col("bucket"),
      sqrt(dotCol(col("embedding"), col("embedding"))).as("n"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.join(broadcast(q),
        (col("bucket") === col("b1") || col("bucket") === col("b2")) &&
          col("vec_id") =!= col("qid"))
      .withColumn("cos",
        round(dotCol(col("qe"), col("embedding")) / (col("qn") * col("n")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  def annIvfSql(nQueries: Int = 4, k: Int = 5): String = {
    val scoreCols = (0 until Centroids).map(c =>
      s"${centroidScoreSql("embedding", c)} AS s$c").mkString(", ")
    val sNames = (0 until Centroids).map(c => s"s$c")
    val m = s"LEAST(${sNames.mkString(", ")})"
    val b1 = sNames.zipWithIndex.map { case (s, i) =>
      s"WHEN $s = m THEN $i" }.mkString("CASE ", " ", " ELSE -1 END")
    val maskedNames = (0 until Centroids).map(c =>
      s"(CASE WHEN b1 = $c THEN 1.7976931348623157E308 ELSE s$c END)")
    val m2 = s"LEAST(${maskedNames.mkString(", ")})"
    val b2 = maskedNames.zipWithIndex.map { case (s, i) =>
      s"WHEN $s = m2 THEN $i" }.mkString("CASE ", " ", " ELSE -1 END")
    s"""WITH scored AS (SELECT vec_id, embedding, $scoreCols FROM embeddings),
       |assigned AS (SELECT vec_id, embedding, $b1 AS bucket
       |             FROM (SELECT *, $m AS m FROM scored)),
       |q0 AS (SELECT *, $m AS m FROM scored WHERE vec_id < $nQueries),
       |q1 AS (SELECT vec_id AS qid, embedding AS qe, $b1 AS b1, ${sNames.mkString(", ")} FROM q0),
       |q AS (SELECT qid, qe, b1, $b2 AS b2
       |      FROM (SELECT *, $m2 AS m2 FROM q1)),
       |d AS (SELECT q.qid, a.vec_id,
       |        round(${cosineSql("q.qe", "a.embedding")}, 6) AS cos
       |      FROM assigned a JOIN q
       |        ON (a.bucket = q.b1 OR a.bucket = q.b2) AND a.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id, cos,
       |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |      FROM d)
       |SELECT qid, rank, vec_id, cos FROM r WHERE rank <= $k""".stripMargin
  }

  /** Near-duplicate pairs: same LSH bucket AND cosine ≥ tau. */
  def nearDupLsh(emb: DataFrame, tau: Double = 0.9): DataFrame = {
    val b = emb.select(col("vec_id"), col("embedding"),
      bucketCol(col("embedding")).as("bucket"),
      sqrt(dotCol(col("embedding"), col("embedding"))).as("n"))
    val left = b.select(col("bucket"), col("vec_id").as("vid1"),
      col("embedding").as("e1"), col("n").as("n1"))
    val right = b.select(col("bucket"), col("vec_id").as("vid2"),
      col("embedding").as("e2"), col("n").as("n2"))
    left.join(right, Seq("bucket"))
      .filter(col("vid1") < col("vid2"))
      .withColumn("cos",
        round(dotCol(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= tau)
      .select(col("vid1"), col("vid2"), col("cos"))
  }

  def nearDupLshSql(tau: Double = 0.9): String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
       |           FROM embeddings),
       |p AS (SELECT l.vec_id AS vid1, r.vec_id AS vid2,
       |        round(${cosineSql("l.embedding", "r.embedding")}, 6) AS cos
       |      FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
       |SELECT vid1, vid2, cos FROM p WHERE cos >= $tau""".stripMargin
}
