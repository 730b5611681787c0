package graft.lineage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Resumable export with per-partition lineage + metrics (BASELINE.json
  * north_rule R4; the reference's nearest analogues are the celery task
  * status table polled at /tasks/status, API/tasks.py:23-82, and the
  * replication watermark, builder.py:733-735).
  *
  * Iceberg-emulated commit protocol (no Iceberg jar on the classpath):
  *  - each task writes its partition's rows to `parts/p<id>.tmp`, then
  *    atomically renames to `p<id>.jsonl` and drops a `p<id>.done` manifest
  *    row (partitionId, rowCount, bytes, status, wallMillis) — write-ahead +
  *    last-wins rename makes the per-partition commit idempotent;
  *  - resume lists committed partition ids and re-runs ONLY the missing ones
  *    (the anti-join of partitions against the lineage table);
  *  - `finish` compacts the .done rows into a lineage parquet table.
  *
  * On a real cluster `parts/` is object storage and the rename is a
  * PUT-if-absent; the protocol is unchanged.
  */
object Lineage {

  final case class PartMeta(partitionId: Int, rowCount: Long, bytes: Long,
      status: String, wallMillis: Long)

  // Files.list requires close; materialize the listing then release the handle
  private def listDir(d: Path): Seq[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Identity of a run for resume safety: partition count + input file set +
    * canonicalized plan hash. Parts are keyed by partition id, so resuming
    * against a DIFFERENT partitioning (changed maxPartitionBytes, AQE
    * re-plan, a grown staging table) would silently pair old parts with new
    * partition ids — wrong output with "committed" status. The run manifest
    * refuses that: a fingerprint mismatch discards all stale parts and
    * restarts clean. */
  def runFingerprint(df: DataFrame): String = {
    // df.rdd finalizes the plan (under AQE this materializes intermediate
    // query stages); callers pass the SAME Dataset instance they export, so
    // foreachPartition reuses this lazy rdd and its shuffle outputs — the
    // fingerprint does not cost a second execution
    val n = df.rdd.getNumPartitions
    val h = java.security.MessageDigest.getInstance("MD5")
    h.update(df.queryExecution.analyzed.semanticHash().toString
      .getBytes(StandardCharsets.UTF_8))
    h.update(df.inputFiles.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    s"$n-${h.digest().map("%02x".format(_)).mkString}"
  }

  /** Create parts/, validate the run manifest, and discard stale parts from
    * a run with a different fingerprint (or from a pre-manifest run — no
    * provenance means no safe resume). Returns the committed ids to skip. */
  private def prepareRun(df: DataFrame, outDir: String): Set[Int] = {
    val d = Paths.get(outDir, "parts")
    Files.createDirectories(d)
    val mf = d.resolve("_run.json")
    val json = s"""{"fingerprint":"${runFingerprint(df)}"}"""
    val existing =
      if (Files.exists(mf))
        Some(new String(Files.readAllBytes(mf), StandardCharsets.UTF_8))
      else None
    val stale = existing match {
      case Some(e) => e != json
      case None => listDir(d).nonEmpty
    }
    if (stale) listDir(d).foreach(Files.delete)
    Files.write(mf, json.getBytes(StandardCharsets.UTF_8))
    committedParts(outDir)
  }

  def committedParts(outDir: String): Set[Int] = {
    val d = Paths.get(outDir, "parts")
    if (!Files.exists(d)) Set.empty
    else listDir(d)
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("p") && n.endsWith(".done"))
      .map(n => n.stripPrefix("p").stripSuffix(".done").toInt)
      .toSet
  }

  /** Test-only fault hook: fire AFTER at least one sibling partition has
    * committed (bounded wait) — a fast failure cancels the stage before any
    * part lands, and the kill-and-resume tests then observe an empty (not
    * partial) commit, a race seen under full-suite load. */
  private def injectFault(outDir: String, pid: Int): Nothing = {
    val deadline = System.currentTimeMillis() + 10000
    while (committedParts(outDir).isEmpty &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    throw new RuntimeException(s"injected fault at partition $pid")
  }

  /** Export `lines` (single string column) to outDir, committing per
    * partition; skips partitions already committed by a previous (killed)
    * run. `failAtPartition` injects a fault for the kill-and-resume test. */
  def exportResumable(
      lines: DataFrame,
      outDir: String,
      failAtPartition: Int = -1): Unit = {
    require(lines.schema.fields.length == 1, "expected a single string column")
    val frame = lines.toDF("line")
    val done = prepareRun(frame, outDir)
    val doneBc = lines.sparkSession.sparkContext.broadcast(done)
    frame.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (!doneBc.value.contains(pid)) {
        if (pid == failAtPartition) injectFault(outDir, pid)
        val t0 = System.currentTimeMillis()
        // tmp is attempt-keyed: concurrent attempts of one partition
        // (speculation, zombie task) each stream to their own file; the
        // atomic rename stays last-wins
        val attempt = org.apache.spark.TaskContext.get.taskAttemptId()
        val tmp = Paths.get(outDir, "parts", s"p$pid.a$attempt.tmp")
        val fin = Paths.get(outDir, "parts", s"p$pid.jsonl")
        val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
        var n = 0L
        try it.foreach { r => w.write(r.getString(0)); w.write('\n'); n += 1 }
        finally w.close()
        val sz = Files.size(tmp)
        Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        val meta = s"""{"partitionId":$pid,"rowCount":$n,"bytes":$sz,""" +
          s""""status":"committed","wallMillis":${System.currentTimeMillis() - t0}}"""
        val mTmp = Paths.get(outDir, "parts", s"p$pid.done.tmp")
        Files.write(mTmp, meta.getBytes(StandardCharsets.UTF_8))
        Files.move(mTmp, Paths.get(outDir, "parts", s"p$pid.done"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }

  /** Binary sibling of [[exportResumable]]: each task encodes its rows with
    * the (serializable) `encode` closure and streams the bytes to
    * `parts/p<id>.<ext>`, with the same write-ahead + atomic-rename +
    * manifest commit protocol. Lets single-file binary formats (FlatGeobuf)
    * serialize map-side with only header+concat left on the driver. */
  def exportResumableBytes(
      df: DataFrame,
      outDir: String,
      encode: org.apache.spark.sql.Row => Array[Byte],
      ext: String = "bin",
      failAtPartition: Int = -1,
      coords: Option[org.apache.spark.sql.Row => Iterable[(Double, Double)]] = None): Unit = {
    val done = prepareRun(df, outDir)
    val doneBc = df.sparkSession.sparkContext.broadcast(done)
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (!doneBc.value.contains(pid)) {
        if (pid == failAtPartition) injectFault(outDir, pid)
        val t0 = System.currentTimeMillis()
        val attempt = org.apache.spark.TaskContext.get.taskAttemptId()
        val tmp = Paths.get(outDir, "parts", s"p$pid.a$attempt.tmp")
        val fin = Paths.get(outDir, "parts", s"p$pid.$ext")
        val w = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
        var n = 0L
        // per-partition bounds accumulate DURING the single export pass, so
        // callers needing a global envelope never re-scan the table
        var minX = Double.MaxValue; var minY = Double.MaxValue
        var maxX = Double.MinValue; var maxY = Double.MinValue
        try it.foreach { r =>
          w.write(encode(r)); n += 1
          coords.foreach(_(r).foreach { case (x, y) =>
            if (x < minX) minX = x; if (x > maxX) maxX = x
            if (y < minY) minY = y; if (y > maxY) maxY = y
          })
        }
        finally w.close()
        val sz = Files.size(tmp)
        Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        val envField =
          if (coords.isDefined && n > 0 && minX != Double.MaxValue)
            s""","env":[$minX,$minY,$maxX,$maxY]"""
          else ""
        val meta = s"""{"partitionId":$pid,"rowCount":$n,"bytes":$sz,""" +
          s""""status":"committed","wallMillis":${System.currentTimeMillis() - t0}$envField}"""
        val mTmp = Paths.get(outDir, "parts", s"p$pid.done.tmp")
        Files.write(mTmp, meta.getBytes(StandardCharsets.UTF_8))
        Files.move(mTmp, Paths.get(outDir, "parts", s"p$pid.done"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }

  /** Committed part payload files with extension `ext`, in partition order. */
  def committedPartFiles(outDir: String, ext: String): Seq[Path] = {
    val d = Paths.get(outDir, "parts")
    if (!Files.exists(d)) Nil
    else listDir(d)
      .filter { p =>
        val n = p.getFileName.toString
        // exclude the _run.json manifest and attempt-keyed tmp files
        n.startsWith("p") && n.endsWith(s".$ext") &&
          n.stripPrefix("p").stripSuffix(s".$ext").forall(_.isDigit)
      }
      .sortBy(_.getFileName.toString.stripPrefix("p").stripSuffix(s".$ext").toInt)
  }

  /** Merge the per-partition `env` bounds recorded by
    * [[exportResumableBytes]]; None when no partition recorded any. */
  def partEnvelope(outDir: String): Option[Array[Double]] = {
    val envs = listDir(Paths.get(outDir, "parts"))
      .filter(_.getFileName.toString.endsWith(".done"))
      .flatMap { p =>
        val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        val i = s.indexOf("\"env\":[")
        if (i < 0) None
        else Some(s.substring(i + 7, s.indexOf(']', i))
          .split(',').map(_.toDouble))
      }
    if (envs.isEmpty) None
    else Some(Array(envs.map(_(0)).min, envs.map(_(1)).min,
      envs.map(_(2)).max, envs.map(_(3)).max))
  }

  /** Remove the part payloads + manifests after the final artifact is
    * assembled — a SUCCEEDED export must not leave .done files that would
    * make a later export to the same path silently reuse stale data (and
    * must not keep the dataset duplicated on disk). The compacted `lineage`
    * parquet table survives for accounting. */
  def cleanParts(outDir: String): Unit = {
    val d = Paths.get(outDir, "parts")
    if (Files.exists(d)) {
      listDir(d).foreach(Files.delete)
      Files.delete(d)
    }
  }

  /** Compact per-partition manifests into the lineage parquet table; returns
    * the lineage DataFrame. */
  def finish(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val rows = listDir(Paths.get(outDir, "parts"))
      .filter(_.getFileName.toString.endsWith(".done"))
      .map { p =>
        val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        def f(k: String): String =
          s.split("\"" + k + "\":")(1).split("[,}]")(0).replaceAll("\"", "")
        PartMeta(f("partitionId").toInt, f("rowCount").toLong, f("bytes").toLong,
          f("status"), f("wallMillis").toLong)
      }.toSeq
    val df = rows.toDF()
    df.write.mode("overwrite").parquet(s"$outDir/lineage")
    df
  }

  /** Read back all committed lines (the export's logical output). */
  def readExport(spark: SparkSession, outDir: String): DataFrame =
    spark.read.text(s"$outDir/parts/*.jsonl")
}
