package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal from-scratch PMTiles v3 archive writer — the reference's actual
  * tile sink output (`tippecanoe ... -o out.pmtiles`, src/app.py:690-698).
  * Format per the public PMTiles v3 specification (protomaps/PMTiles):
  * 127-byte header, gzip varint-delta root directory keyed by Hilbert tile
  * ids (spilling to leaf directories past 16k entries), gzip JSON metadata,
  * concatenated tile payloads with run-length entries AND duplicate
  * coalescing (identical payloads stored once, content-addressed within a
  * bounded window — tile_contents < addressed_tiles, as tippecanoe writes
  * planet archives).
  *
  * Tile payloads on the default export-matrix path are gzip MVT
  * (tile_type 0x01 via [[writeMvt]] — tippecanoe output parity). The
  * payload-agnostic [[write]] entry keeps gzip GeoJSON FeatureCollections
  * (tile_type 0x00 = unspecified, allowed by the spec) for the
  * archive-layout tests.
  *
  * The heavy work (tile assignment, per-tile feature grouping) is the
  * distributed plan; this writer streams the per-tile groups on the driver —
  * the same single-archive boundary as tippecanoe itself.
  */
object PmTiles {

  // ---- Hilbert tile ids (spec: tileId = sum of tiles below z + hilbert d) --

  /** xy → Hilbert d on a 2^z × 2^z grid (standard bit-rotation walk). */
  def hilbertD(z: Int, x0: Long, y0: Long): Long = {
    var rx = 0L; var ry = 0L; var d = 0L
    var x = x0; var y = y0
    var s = 1L << (z - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def tileId(z: Int, x: Long, y: Long): Long = {
    // cumulative tile count for zooms < z: sum 4^i = (4^z - 1) / 3
    val base = ((1L << (2 * z)) - 1) / 3
    if (z == 0) 0L else base + hilbertD(z, x, y)
  }

  // ---- varint + directory encoding -------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  final case class Entry(tileId: Long, offset: Long, length: Int, runLength: Int = 1)

  /** Spec layout: n, tileId deltas, runLengths, lengths, offsets (offset 0 =
    * "previous entry's offset + length"). */
  def encodeDirectory(entries: Seq[Entry]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarint(out, entries.size)
    var last = 0L
    entries.foreach { e => writeVarint(out, e.tileId - last); last = e.tileId }
    entries.foreach(e => writeVarint(out, e.runLength))
    entries.foreach(e => writeVarint(out, e.length))
    var prevEnd = -1L
    entries.foreach { e =>
      if (e.offset == prevEnd) writeVarint(out, 0L)
      else writeVarint(out, e.offset + 1)
      prevEnd = e.offset + e.length
    }
    out.toByteArray
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** 127-byte v3 header. `tileType`: 1 = MVT, 0 = unspecified payloads. */
  private def header(rootOff: Long, rootLen: Long, metaOff: Long, metaLen: Long,
      leafOff: Long, leafLen: Long,
      dataOff: Long, dataLen: Long, nAddressed: Long, nEntries: Long,
      nContents: Long, minZ: Int, maxZ: Int, tileType: Byte): Array[Byte] = {
    val b = ByteBuffer.allocate(127).order(ByteOrder.LITTLE_ENDIAN)
    b.put("PMTiles".getBytes(StandardCharsets.US_ASCII)).put(3.toByte)
    b.putLong(rootOff).putLong(rootLen)
    b.putLong(metaOff).putLong(metaLen)
    b.putLong(leafOff).putLong(leafLen)
    b.putLong(dataOff).putLong(dataLen)
    b.putLong(nAddressed) // addressed tiles
    b.putLong(nEntries) // tile entries (runLength >= 1)
    b.putLong(nContents) // tile contents = distinct payload blobs
    b.put(1.toByte) // clustered: tile ids written ascending
    b.put(2.toByte).put(2.toByte) // internal compression gzip, tile compression gzip
    b.put(tileType)
    b.put(minZ.toByte).put(maxZ.toByte)
    // bounds E7: world
    b.putInt(-1800000000).putInt(-850000000).putInt(1800000000).putInt(850000000)
    b.put(minZ.toByte) // center zoom
    b.putInt(0).putInt(0) // center lon/lat E7
    b.array()
  }

  /** The reference-parity sink: feature DataFrame → MVT payloads ([[Mvt]]) →
    * PMTiles archive with tile_type 1, the same content tippecanoe emits
    * (src/app.py:690-698). Returns (tiles written, archive bytes). */
  def writeMvt(features: DataFrame, path: String, zooms: (Int, Int),
      layerName: String): (Long, Long) =
    writePayloads(Mvt.tilePayloads(features, zooms, layerName), path,
      tileType = 1)

  /** Legacy GeoJSON-payload variant (tile_type 0; kept for the payload-
    * agnostic archive tests): tiled (z, tx, ty, feature:string) rows, one
    * gzip FeatureCollection per tile. */
  def write(tiled: DataFrame, path: String): (Long, Long) = {
    // per-tile payload ASSEMBLY AND GZIP run in the executors (map step after
    // the per-tile agg); the driver only streams ready-made bytes — tile
    // compression is the dominant cost and must live where the data lives
    val gzipU = udf((fc: String) => gzip(
      ("""{"type":"FeatureCollection","features":[""" + fc + "]}")
        .getBytes(StandardCharsets.UTF_8)))
    val perTile = tiled
      .groupBy(col("z"), col("tx"), col("ty"))
      .agg(concat_ws(",", sort_array(collect_list(col("feature")))).as("fc"))
      .select(col("z"), col("tx"), col("ty"), gzipU(col("fc")).as("payload"))
    writePayloads(perTile, path, tileType = 0)
  }

  /** Entries per leaf directory. The v3 spec caps the root directory (it
    * must be fetchable in one ~16 KB read); archives beyond `LeafSize`
    * tiles spill entries into leaf directories — root entries with
    * runLength 0 point at gzip leaf chunks. Also the driver-memory bound:
    * with leaves the driver holds one chunk + one root entry per 16k
    * tiles, not 16 B × every tile (a planet pyramid has ~10^8 tiles). */
  val LeafSize: Int = 16384

  /** Shared archive assembly over ready-made (z, tx, ty, payload) rows:
    * group-per-tile already done, payloads already compressed — the driver
    * streams bytes in Hilbert order; directory entries chunk into leaf
    * directories once the archive outgrows a single root. */
  def writePayloads(perTile0: DataFrame, path: String, tileType: Byte,
      leafSize: Int = LeafSize): (Long, Long) = {
    val perTile = perTile0
      .withColumn("tile_id", udf(tileId _).apply(col("z"), col("tx"), col("ty")))
      .select(col("tile_id"), col("z"), col("payload"))
      .orderBy(col("tile_id"))
    val out = Paths.get(path)
    Files.createDirectories(out.getParent)
    // tile payloads stream to a sidecar file; leaf directories to a second
    val dataTmp = Files.createTempFile(out.getParent, "pmtiles-data", ".tmp")
    val leafTmp = Files.createTempFile(out.getParent, "pmtiles-leaf", ".tmp")
    try writePayloadsTo(perTile, out, dataTmp, leafTmp, tileType, leafSize)
    finally {
      // a failed job (stage kill, OOM in toLocalIterator) must not orphan
      // the sidecars — the data one can be archive-sized
      Files.deleteIfExists(dataTmp)
      Files.deleteIfExists(leafTmp)
      ()
    }
  }

  /** Distinct-payload window for duplicate coalescing: SHA-256 → (offset,
    * length) of the blob already in the data section. Bounded (content-
    * addressed entries are ~56 B each) so driver memory stays O(window) at
    * planet scale — beyond the window a repeated payload is stored again,
    * never corrupted. */
  val DedupWindow: Int = 1 << 19

  private def writePayloadsTo(perTile: DataFrame, out: java.nio.file.Path,
      dataTmp: java.nio.file.Path, leafTmp: java.nio.file.Path,
      tileType: Byte, leafSize: Int): (Long, Long) = {
    val dataOut = new java.io.BufferedOutputStream(Files.newOutputStream(dataTmp))
    val leafOut = new java.io.BufferedOutputStream(Files.newOutputStream(leafTmp))
    val it = perTile.toLocalIterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val rootEntries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    // duplicate coalescing: identical payloads share one data blob (the
    // spec's tile_contents < addressed_tiles case; what keeps ocean/empty
    // tiles cheap in planet archives — tippecanoe dedupes the same way)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val seen = new java.util.LinkedHashMap[scala.collection.immutable.ArraySeq[Byte], (Long, Int)](
      1024, 0.75f, true) { // access-order = LRU: hot blobs (ocean tiles) stay pinned
      override def removeEldestEntry(
          e: java.util.Map.Entry[scala.collection.immutable.ArraySeq[Byte], (Long, Int)]): Boolean =
        size() > DedupWindow
    }
    var leafMode = false
    var leafLen = 0L
    var nAddressed = 0L
    var nEntries = 0L
    var nContents = 0L
    var dataLen = 0L
    var minZ = 127; var maxZ = 0
    def flushLeaf(): Unit = if (entries.nonEmpty) {
      val enc = gzip(encodeDirectory(entries.toSeq))
      // runLength 0 marks a leaf pointer; offset is within the leaf section
      rootEntries += Entry(entries.head.tileId, leafLen, enc.length, runLength = 0)
      leafOut.write(enc)
      leafLen += enc.length
      entries.clear()
    }
    try {
      while (it.hasNext) {
        val r = it.next()
        val tid = r.getLong(0)
        val payload = r.getAs[Array[Byte]](2)
        val key = scala.collection.immutable.ArraySeq.unsafeWrapArray(
          sha.digest(payload))
        val (off, len) = Option(seen.get(key)) match {
          case Some(prior) => prior // coalesce: no new data bytes
          case None =>
            dataOut.write(payload)
            val blob = (dataLen, payload.length)
            dataLen += payload.length
            nContents += 1
            seen.put(key, blob)
            blob
        }
        // run-length: consecutive tile ids sharing one blob extend the
        // previous entry instead of adding a new one
        if (entries.nonEmpty && {
          val p = entries.last
          p.tileId + p.runLength == tid && p.offset == off && p.length == len
        }) entries(entries.length - 1) =
          entries.last.copy(runLength = entries.last.runLength + 1)
        else {
          entries += Entry(tid, off, len)
          nEntries += 1
        }
        nAddressed += 1
        val z = r.getInt(1)
        if (z < minZ) minZ = z; if (z > maxZ) maxZ = z
        if (entries.size >= leafSize) { leafMode = true; flushLeaf() }
      }
    } finally {
      if (leafMode) flushLeaf()
      leafOut.close()
      dataOut.close()
    }
    val root = gzip(encodeDirectory(
      if (leafMode) rootEntries.toSeq else entries.toSeq))
    val meta = gzip("""{"name":"graft tile export"}""".getBytes(StandardCharsets.UTF_8))
    val rootOff = 127L
    val metaOff = rootOff + root.length
    val leafOff = metaOff + meta.length
    val dataOff = leafOff + (if (leafMode) leafLen else 0L)
    val hdr = header(rootOff, root.length, metaOff, meta.length,
      if (leafMode) leafOff else 0L, if (leafMode) leafLen else 0L,
      dataOff, dataLen, nAddressed, nEntries, nContents,
      if (nAddressed == 0) 0 else minZ, if (nAddressed == 0) 0 else maxZ,
      tileType)
    val os = Files.newOutputStream(out)
    try {
      os.write(hdr); os.write(root); os.write(meta)
      if (leafMode) Files.copy(leafTmp, os)
      Files.copy(dataTmp, os)
    } finally os.close()
    (nAddressed, dataOff + dataLen)
  }
}
