package graft

import org.apache.spark.sql.functions._
import graft.functions.{CellIdExpr, DotProductExpr, GeoCols, PidRingsExpr,
  PointInMultiPolygonExpr, SignBucketExpr}
import graft.geo.{Fixtures, MultiPolygon}
import graft.operators.{Dedup, Similarity}

/** r06 optimization round: every hot-path Column tree that was replaced by a
  * native kernel expression must produce EXACTLY the values of the tree it
  * replaced (null-safe equality, bit-exact doubles). The trees stay in the
  * codebase (GeoCols.mortonCol/pipCol/featureGeomCols, Dedup.minhashCol,
  * Similarity.dotSql's shape) precisely so this spec can hold the kernels to
  * them; the DuckDB oracle gates then prove the same end to end. */
class KernelParitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def mismatches(df: org.apache.spark.sql.DataFrame,
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): Long =
    df.filter(not(a <=> b)).count()

  test("PidRingsExpr ≡ featureGeomCols pid-provider rings tree") {
    val p = GeoCols.derivedPoints(spark, sfDir)
    val kind = GeoCols.kindPidCol(col("pid"))
    val treeRings = GeoCols.featureGeomCols(kind, col("lon"), col("lat"),
      GeoCols.uPidCol(col("pid")), GeoCols.mPidCol(col("pid")))
      .collectFirst { case ("rings", c) => c }.get
    val df = p.withColumn("kind", kind)
    assert(mismatches(df, treeRings,
      PidRingsExpr.column(col("pid"), col("lon"), col("lat"))) == 0)
  }

  test("CellIdExpr ≡ unrolled morton cell tree (res 4 and 7)") {
    val p = GeoCols.derivedPoints(spark, sfDir)
    for (res <- Seq(4, 7)) {
      val tree = shiftleft(GeoCols.mortonCol(res,
        GeoCols.cellXCol(res, col("lon")), GeoCols.cellYCol(res, col("lat"))),
        5) + lit(res.toLong)
      assert(mismatches(p, tree,
        CellIdExpr.column(res, col("lon"), col("lat"))) == 0, s"res $res")
    }
  }

  test("PointInMultiPolygonExpr ≡ pipCol ray-cast tree") {
    val p = GeoCols.derivedPoints(spark, sfDir)
    val geom = MultiPolygon(Seq(Fixtures.requestPolygon))
    val tree = geom.polys.map(GeoCols.pipCol(_, col("lon"), col("lat")))
      .reduce(_ || _)
    assert(mismatches(p, tree,
      PointInMultiPolygonExpr.column(geom, col("lon"), col("lat"))) == 0)
  }

  test("DotProductExpr ≡ unrolled 64-term dot tree") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tree = (0 until Similarity.Dims).map(i =>
      element_at(col("embedding"), i + 1).cast("double") *
        element_at(col("embedding"), i + 1).cast("double")).reduce(_ + _)
    assert(mismatches(emb, tree,
      Similarity.dotCol(col("embedding"), col("embedding"))) == 0)
    // cross product against a shifted copy (a ≠ b case)
    val pair = emb.select(col("vec_id"), col("embedding"))
      .withColumn("e2", reverse(col("embedding")))
    val treeAB = (0 until Similarity.Dims).map(i =>
      element_at(col("embedding"), i + 1).cast("double") *
        element_at(col("e2"), i + 1).cast("double")).reduce(_ + _)
    assert(mismatches(pair, treeAB,
      Similarity.dotCol(col("embedding"), col("e2"))) == 0)
  }

  test("SignBucketExpr ≡ unrolled hyperplane-sign tree") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val hp = Similarity.hyperplanes(Similarity.Planes)
    val tree = (0 until Similarity.Planes).map { j =>
      val proj = (0 until Similarity.ProjDims).map(i =>
        element_at(col("embedding"), i + 1).cast("double") * lit(hp(j)(i)))
        .reduce(_ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    assert(mismatches(emb, tree,
      SignBucketExpr.column(hp.toArray, col("embedding"))) == 0)
  }

  test("kernel minhash signature ≡ per-i array_min transform columns") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sig = Dedup.signatures(docs)
    val withIds = sig.withColumn("shids",
      transform(col("sh"), s => graft.operators.TextOps.tokenIdCol(s)))
    val bad = (0 until Dedup.NumHashes).map { i =>
      mismatches(withIds, col(s"mh$i"), Dedup.minhashCol(col("shids"), i))
    }.sum
    assert(bad == 0)
  }
}
