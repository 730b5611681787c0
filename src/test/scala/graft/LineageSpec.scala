package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.lineage.Lineage

/** Kill-and-resume: a failed export must resume from per-partition lineage
  * and produce output identical to a single-shot run (north_rule R4). */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def lines = spark.range(0, 1000, 1, 8)
    .select(concat(lit("""{"i":"""), col("id"), lit("}")).as("line"))

  test("clean export commits all partitions with metrics") {
    val dir = Files.createTempDirectory("exp").toString
    Lineage.exportResumable(lines, dir)
    val lineage = Lineage.finish(spark, dir)
    assert(lineage.count() == 8)
    assert(lineage.filter(col("status") =!= "committed").count() == 0)
    assert(lineage.agg(sum("rowCount")).collect().head.getLong(0) == 1000)
    assert(Lineage.readExport(spark, dir).count() == 1000)
  }

  test("kill mid-export, resume completes identically") {
    val dir = Files.createTempDirectory("exp2").toString
    // first attempt dies at partition 5
    intercept[Exception] {
      Lineage.exportResumable(lines, dir, failAtPartition = 5)
    }
    val committedBefore = Lineage.committedParts(dir)
    assert(committedBefore.nonEmpty && committedBefore.size < 8,
      s"expected partial commit, got $committedBefore")
    // resume: skips committed partitions, completes the rest
    Lineage.exportResumable(lines, dir)
    assert(Lineage.committedParts(dir).size == 8)
    val got = Lineage.readExport(spark, dir)
      .collect().map(_.getString(0)).sorted.toSeq
    val expect = (0 until 1000).map(i => s"""{"i":$i}""").sorted
    assert(got == expect)
    // idempotent: a third run does nothing and output is unchanged
    Lineage.exportResumable(lines, dir)
    assert(Lineage.readExport(spark, dir).count() == 1000)
  }
}
