package graft

import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness for the optimization rounds (guide §1):
  * times each declared query with the driver's exact methodology (same
  * session config as [[Bench]], same `.count()` action, same sf dir) but
  * with repeats, so before/after numbers are separable from host noise.
  * `Bench.scala` itself is frozen — this main exists so measurement can
  * iterate without touching it.
  *
  * Usage: sbt "runMain graft.BenchExtra [queryName,...] [reps]"
  *   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS   (default 32)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Option[Set[String]] =
      if (args.nonEmpty && args(0) != "all") Some(args(0).split(",").toSet) else None
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (8 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val rows = queryList.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name failed: $e"); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times)
    }
    println(f"${"query"}%-24s ${"run1"}%8s ${"min"}%8s  all")
    var tot1 = 0.0; var totMin = 0.0
    rows.foreach { case (name, ts) =>
      tot1 += ts.head; totMin += ts.min
      println(f"$name%-24s ${ts.head}%8.3f ${ts.min}%8.3f  ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    println(f"TOTAL                    $tot1%8.3f $totMin%8.3f")
    spark.stop()
  }
}
