package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import com.google.flatbuffers.FlatBufferBuilder
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** From-scratch FlatGeobuf (.fgb) writer — the reference's bulk vector
  * interchange format (`FLATGEOBUF = "fgb"` src/validation/models.py:63,
  * ogr2ogr options src/app.py:565-569, e2e tests/test_API.py
  * test_snapshot_feature_fgb). Layout per the public FlatGeobuf v3 spec
  * (flatgeobuf.org):
  *
  *   magic (8 bytes: fgb 0x03 fgb 0x00)
  *   size-prefixed flatbuffer Header  (name, envelope, geometry_type,
  *                                     columns, features_count, crs EPSG:4326,
  *                                     index_node_size = 0 → NO spatial index)
  *   size-prefixed flatbuffer Feature per row (Geometry xy + packed
  *                                             column-indexed properties)
  *
  * The spatial index is legitimately optional (index_node_size 0); the
  * reference itself passes VERIFY_BUFFERS=NO and doesn't rely on it — readers
  * stream features sequentially, which is also the only scalable write shape.
  *
  * The flatbuffers are assembled with the generic FlatBufferBuilder (vtable
  * slots straight from the published header.fbs / feature.fbs field order) —
  * no generated bindings, no schema compiler.
  *
  * Features stream to a sidecar file while the envelope and count accumulate,
  * then the final file is header + sidecar — one pass over the data, constant
  * memory, same pattern as the PMTiles writer. Driver-side stream over
  * `toLocalIterator` (single-file boundary, like the reference's ogr2ogr).
  */
object FlatGeobuf {

  val Magic: Array[Byte] =
    Array(0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00).map(_.toByte)

  // GeometryType enum (geometry.fbs)
  val GtUnknown = 0; val GtPoint = 1; val GtLineString = 2; val GtPolygon = 3

  // ColumnType enum (header.fbs)
  val CtBool = 2; val CtInt = 5; val CtLong = 7; val CtDouble = 10; val CtString = 11

  private def columnType(dt: DataType): Int = dt match {
    case LongType => CtLong
    case IntegerType | ShortType | ByteType => CtInt
    case DoubleType | FloatType => CtDouble
    case BooleanType => CtBool
    case _ => CtString
  }

  /** Column table (header.fbs): slots 0=name, 1=type, 7=nullable(default
    * true). Only name+type are written; defaults carry the rest. */
  private def columnOffset(b: FlatBufferBuilder, name: String, ctype: Int): Int = {
    val n = b.createString(name)
    b.startTable(11)
    b.addOffset(0, n, 0)
    b.addByte(1, ctype.toByte, 0)
    b.endTable()
  }

  /** Header table (header.fbs): 0=name 1=envelope 2=geometry_type 3..6=z/m/t/tm
    * 7=columns 8=features_count 9=index_node_size(default 16) 10=crs. */
  private def headerBytes(name: String, env: Array[Double], geometryType: Int,
      cols: Seq[(String, Int)], count: Long): Array[Byte] = {
    val b = new FlatBufferBuilder(1024)
    val nameOff = b.createString(name)
    val colOffs = cols.map { case (n, t) => columnOffset(b, n, t) }.toArray
    val colsVec = b.createVectorOfTables(colOffs)
    b.startVector(8, env.length, 8)
    env.reverse.foreach(b.addDouble)
    val envVec = b.endVector()
    // Crs table (header.fbs): 0=org 1=code 2=name 3=description 4=wkt 5=code_string
    val orgOff = b.createString("EPSG")
    b.startTable(6)
    b.addOffset(0, orgOff, 0)
    b.addInt(1, 4326, 0)
    val crsOff = b.endTable()
    b.startTable(11)
    b.addOffset(0, nameOff, 0)
    b.addOffset(1, envVec, 0)
    b.addByte(2, geometryType.toByte, 0)
    b.addOffset(7, colsVec, 0)
    b.addLong(8, count, 0L)
    b.addShort(9, 0.toShort, 16) // no spatial index
    b.addOffset(10, crsOff, 0)
    b.finishSizePrefixed(b.endTable())
    b.sizedByteArray()
  }

  /** Feature table (feature.fbs): 0=geometry 1=properties 2=columns.
    * Geometry table (geometry.fbs): 0=ends 1=xy ... 6=type. */
  private def featureBytes(gtype: Int, xy: Array[Double], props: Array[Byte]): Array[Byte] = {
    val b = new FlatBufferBuilder(512)
    b.startVector(8, xy.length, 8)
    xy.reverse.foreach(b.addDouble)
    val xyVec = b.endVector()
    b.startTable(8)
    b.addOffset(1, xyVec, 0)
    b.addByte(6, gtype.toByte, 0)
    val geomOff = b.endTable()
    val propsOff = if (props.nonEmpty) b.createByteVector(props) else 0
    b.startTable(3)
    b.addOffset(0, geomOff, 0)
    if (propsOff != 0) b.addOffset(1, propsOff, 0)
    b.finishSizePrefixed(b.endTable())
    b.sizedByteArray()
  }

  /** Packed property encoding (feature.fbs comment): per non-null value, a
    * LE ushort column index followed by the value — scalars raw LE, strings
    * u32-length-prefixed UTF-8. */
  private def propBytes(r: Row, attrs: Seq[(Int, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64)
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def leN(n: Int, v: Long): Unit = (0 until n).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    attrs.zipWithIndex.foreach { case ((rowIdx, ctype), colIdx) =>
      val v = r.get(rowIdx)
      if (v != null) {
        le16(colIdx)
        ctype match {
          case CtLong => leN(8, v.asInstanceOf[Long])
          case CtInt => leN(4, v.asInstanceOf[Number].intValue().toLong)
          case CtDouble => leN(8, java.lang.Double.doubleToLongBits(
            v.asInstanceOf[Number].doubleValue()))
          case CtBool => bos.write(if (v.asInstanceOf[Boolean]) 1 else 0)
          case _ =>
            val bytes = v.toString.getBytes(StandardCharsets.UTF_8)
            leN(4, bytes.length.toLong)
            bos.write(bytes)
        }
      }
    }
    bos.toByteArray
  }

  private def geomColSet: Set[String] = Set("kind", "lon", "lat", "cell") ++
    (0 to 3).flatMap(i => Seq(s"x$i", s"y$i"))

  private def withKind(df0: DataFrame): DataFrame =
    if (df0.columns.contains("kind")) df0
    else if (df0.columns.contains("osm_type"))
      df0.withColumn("kind", df0.col("osm_type"))
    else df0

  /** Per-row Feature serializer — a pure, serializable closure over column
    * positions only, so it runs identically driver-side (toLocalIterator in
    * [[write]]) and map-side in executors ([[writeDistributed]]). */
  def rowEncoder(columns: Seq[String],
      attrs: Seq[(Int, Int)]): Row => Array[Byte] = {
    val idx = columns.zipWithIndex.toMap
    val haveVerts = idx.contains("x0") && idx.contains("kind")
    val kindIdx = idx.getOrElse("kind", -1)
    (r: Row) => {
      def d(c: String): Double = r.getDouble(idx(c))
      val kind = if (haveVerts) r.getString(kindIdx) else "point"
      val (gtype, xy) = kind match {
        case "line" =>
          (GtLineString, (0 to 2).flatMap(i => Seq(d(s"x$i"), d(s"y$i"))).toArray)
        case "polygon" =>
          val q = (0 to 3).map(i => (d(s"x$i"), d(s"y$i")))
          (GtPolygon, (q :+ q.head).flatMap { case (x, y) => Seq(x, y) }.toArray)
        case _ => (GtPoint, Array(d("lon"), d("lat")))
      }
      featureBytes(gtype, xy, propBytes(r, attrs))
    }
  }

  private def prep(df0: DataFrame): (DataFrame, Seq[(String, Int)], Seq[(Int, Int)]) = {
    val df = withKind(df0)
    val idx = df.columns.zipWithIndex.toMap
    val attrFields = df.schema.fields.filterNot(f => geomColSet(f.name))
    val cols = attrFields.map(f => (f.name, columnType(f.dataType))).toSeq
    val attrs = attrFields.map(f => (idx(f.name), columnType(f.dataType))).toSeq
    (df, cols, attrs)
  }

  /** Layer envelope [minX, minY, maxX, maxY] as ONE narrow column
    * aggregation (covers anchor + vertex columns; for point rows the vertex
    * columns equal the anchor by construction). Empty input → empty. */
  private def envelope(df: DataFrame): Array[Double] = {
    import org.apache.spark.sql.functions._
    val haveVerts = df.columns.contains("x0")
    val xs = col("lon") +: (if (haveVerts) (0 to 3).map(i => col(s"x$i")) else Nil)
    val ys = col("lat") +: (if (haveVerts) (0 to 3).map(i => col(s"y$i")) else Nil)
    def least_(cs: Seq[org.apache.spark.sql.Column]) =
      if (cs.size == 1) cs.head else least(cs: _*)
    def greatest_(cs: Seq[org.apache.spark.sql.Column]) =
      if (cs.size == 1) cs.head else greatest(cs: _*)
    val r = df.agg(min(least_(xs)), min(least_(ys)),
      max(greatest_(xs)), max(greatest_(ys))).collect().head
    if (r.isNullAt(0)) Array.empty[Double]
    else Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  private def writeFinal(path: String, name: String, env: Array[Double],
      cols: Seq[(String, Int)], n: Long, parts: Seq[java.nio.file.Path]): Unit = {
    val tmp = Paths.get(path + ".tmp")
    val w = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
    try {
      w.write(Magic)
      w.write(headerBytes(name, env, GtUnknown, cols, n))
      parts.foreach { p => Files.copy(p, w); () }
    } finally w.close()
    Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write the extract as one .fgb file; returns the feature count. Mixed
    * per-row kinds → header geometry_type Unknown(0) with per-feature types,
    * exactly how ogr2ogr writes mixed-geometry layers. Driver-side stream
    * (single-writer boundary); see [[writeDistributed]] for the resumable
    * executor-side path. */
  def write(df0: DataFrame, path: String, name: String = "export"): Long = {
    val (df, cols, attrs) = prep(df0)
    val encode = rowEncoder(df.columns.toIndexedSeq, attrs)
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val sidecar = Paths.get(path + ".features.tmp")
    val out = new BufferedOutputStream(new FileOutputStream(sidecar.toFile))
    var n = 0L
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) { out.write(encode(it.next())); n += 1 }
    } finally out.close()
    writeFinal(path, name, envelope(df), cols, n, Seq(sidecar))
    Files.delete(sidecar)
    n
  }

  /** Distributed + RESUMABLE write: every executor serializes its
    * partition's Feature flatbuffers into a committed binary lineage part
    * (write-ahead + atomic rename, [[graft.lineage.Lineage]] protocol — a
    * killed export resumes by re-running only uncommitted partitions), the
    * envelope is one narrow aggregation, and the driver's only sequential
    * work is header + part concatenation — the same boundary as the
    * single-file FeatureCollection sink. This is the 100 TB shape: feature
    * serialization cost lives where the data lives. Returns the count. */
  def writeDistributed(df0: DataFrame, path: String, name: String = "export",
      failAtPartition: Int = -1): Long = {
    val (df, cols, attrs) = prep(df0)
    val encode = rowEncoder(df.columns.toIndexedSeq, attrs)
    val partsDir = path + ".export"
    graft.lineage.Lineage.exportResumableBytes(df, partsDir, encode,
      ext = "fgbpart", failAtPartition = failAtPartition)
    val manifest = graft.lineage.Lineage.finish(df.sparkSession, partsDir)
    val n = {
      import org.apache.spark.sql.functions._
      val r = manifest.agg(coalesce(sum("rowCount"), lit(0L))).collect().head
      r.getLong(0)
    }
    val parts = {
      val d = Paths.get(partsDir, "parts")
      val s = Files.list(d)
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".fgbpart")) buf += p
        }
        // partition order: numeric part id, a stable deterministic layout
        buf.sortBy(p => p.getFileName.toString.stripPrefix("p")
          .stripSuffix(".fgbpart").toInt).toSeq
      } finally s.close()
    }
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    writeFinal(path, name, envelope(df), cols, n, parts)
    n
  }
}
