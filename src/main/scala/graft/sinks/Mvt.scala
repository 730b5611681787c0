package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** From-scratch Mapbox Vector Tile (MVT) encoder — the payload format the
  * reference's tile path actually ships (`tippecanoe -zg --projection=
  * EPSG:4326 -o out.pmtiles`, src/app.py:690-698, emits MVT-in-PMTiles).
  *
  * Wire format per the public Mapbox Vector Tile specification v2.1
  * (mapbox/vector-tile-spec): a protobuf `Tile` message of `Layer`s, each
  * with a key/value dictionary and `Feature`s whose geometry is a
  * MoveTo/LineTo/ClosePath command stream over zigzag-encoded integer
  * deltas in tile-local coordinates. Encoded by hand (varint + tag bytes)
  * — no protobuf library in the container, and the message shape is small
  * enough that the explicit encoder doubles as documentation.
  *
  * Scale shape: [[tilePayloads]] is the distributed pipeline — the per-tile
  * groupBy is the only shuffle, and tile assembly + protobuf encode + gzip
  * all run as a narrow `Dataset.map` in the executors. The archive writers
  * ([[PmTiles]]/[[MbTiles]]) stream the ready-made payload bytes.
  */
object Mvt {

  val DefaultExtent = 4096

  // ---- protobuf primitives -------------------------------------------------

  final class Pbf {
    val out = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out.write(b)
    }
    def strField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes(StandardCharsets.UTF_8))
    def doubleField(field: Int, d: Double): Unit = {
      tag(field, 1)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def packedField(field: Int, vs: Seq[Long]): Unit = {
      val p = new Pbf
      vs.foreach(p.varint)
      bytesField(field, p.bytes)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** CommandInteger: id in the low 3 bits, repeat count above. */
  def command(id: Int, count: Int): Long = ((id & 0x7) | (count << 3)).toLong

  // ---- typed attribute values (Value message) ------------------------------

  /** Canonical deterministic string form of an attribute value — the JVM
    * toString of Array[Byte] is an identity hash (garbage that also differs
    * across runs), so anything that orders or dedups values goes through
    * this instead. */
  def canonicalString(v: Any): String = v match {
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
    case other => String.valueOf(other)
  }

  /** Value oneof: string=1, double=3, int=4, bool=7 — the four the engine's
    * attribute model produces (FlatGeobuf/Gpkg parity via Number). */
  def encodeValue(v: Any): Array[Byte] = {
    val p = new Pbf
    v match {
      case b: Boolean => p.varintField(7, if (b) 1L else 0L)
      case n: java.lang.Long => p.varintField(4, n.longValue())
      case n: java.lang.Integer => p.varintField(4, n.longValue())
      case n: java.lang.Short => p.varintField(4, n.longValue())
      case n: java.lang.Byte => p.varintField(4, n.longValue())
      case n: java.lang.Double => p.doubleField(3, n.doubleValue())
      case n: java.lang.Float => p.doubleField(3, n.doubleValue())
      case n: java.math.BigDecimal => p.doubleField(3, n.doubleValue())
      // MVT Value has no binary/list variants — encode the canonical string
      case b: Array[Byte] => p.strField(1, canonicalString(b))
      case s: scala.collection.Seq[_] => p.strField(1, canonicalString(s))
      case other => p.strField(1, String.valueOf(other))
    }
    p.bytes
  }

  // ---- geometry ------------------------------------------------------------

  /** One feature in tile-local integer coordinates. `rings`: one ring for
    * points (the points) / lines (the vertices) / polygon rings (UNclosed —
    * ClosePath closes them on the wire). */
  final case class Feature(
      id: Option[Long], gtype: Int, rings: Seq[IndexedSeq[(Long, Long)]],
      attrs: Seq[(String, Any)],
      /** per-ring exterior flags for polygons (multipolygon support);
        * None = the first ring is the only exterior */
      exterior: Option[Seq[Boolean]] = None)

  /** Signed area ×2 in screen coordinates (y down). MVT v2 requires exterior
    * rings CW on screen = positive shoelace sum under y-down. */
  def screenArea2(ring: Seq[(Long, Long)]): Long =
    ring.indices.map { i =>
      val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % ring.length)
      x1 * y2 - x2 * y1
    }.sum

  private def dedupConsecutive(pts: IndexedSeq[(Long, Long)]): IndexedSeq[(Long, Long)] =
    pts.foldLeft(IndexedSeq.empty[(Long, Long)]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }

  /** The MoveTo/LineTo/ClosePath command stream; the cursor starts at (0,0)
    * per feature and persists across rings.
    *
    * Sub-unit geometry: quantization at low zooms collapses building-scale
    * shapes onto repeated vertices — zero-length LineTo segments and
    * zero-area rings are invalid MVT (winding can't classify a zero-area
    * exterior ring). Like tippecanoe's tiny-geometry reduction, a collapsed
    * line becomes a one-unit segment and a collapsed polygon a one-unit
    * square at the quantized anchor: the feature (and its attributes)
    * survives in every tile it belongs to, as a minimal valid shape. */
  def geometryStream(f: Feature): Seq[Long] = {
    val cmds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cx = 0L; var cy = 0L
    def push(pt: (Long, Long)): Unit = {
      cmds += zigzag(pt._1 - cx); cmds += zigzag(pt._2 - cy)
      cx = pt._1; cy = pt._2
    }
    f.gtype match {
      case 1 =>
        cmds += command(1, f.rings.head.length)
        f.rings.head.foreach(push)
      case 2 =>
        f.rings.foreach { line0 =>
          val d = dedupConsecutive(line0)
          val line =
            if (d.length >= 2) d
            else IndexedSeq(d.head, (d.head._1 + 1, d.head._2))
          cmds += command(1, 1); push(line.head)
          cmds += command(2, line.length - 1); line.tail.foreach(push)
        }
      case 3 =>
        f.rings.zipWithIndex.foreach { case (raw, i) =>
          val d = dedupConsecutive(raw)
          val isExterior = f.exterior.map(_(i)).getOrElse(i == 0)
          val ring0 =
            if (d.length >= 3 && screenArea2(d) != 0) d
            else if (isExterior) {
              val (x, y) = d.head // unit square, CW in screen coords
              IndexedSeq((x, y), (x + 1, y), (x + 1, y + 1), (x, y + 1))
            } else IndexedSeq.empty // a collapsed HOLE simply vanishes
          // exterior rings CW on screen (positive y-down shoelace),
          // interior rings CCW — rewind when the source disagrees
          val wantPositive = isExterior
          if (ring0.nonEmpty) {
          val ring =
            if ((screenArea2(ring0) > 0) == wantPositive) ring0 else ring0.reverse
          cmds += command(1, 1); push(ring.head)
          cmds += command(2, ring.length - 1); ring.tail.foreach(push)
          cmds += command(7, 1)
          }
        }
    }
    cmds.toSeq
  }

  // ---- layer / tile assembly ----------------------------------------------

  /** Encode one layer (version 2, one key/value dictionary shared by all
    * features). Features are emitted in the given order. */
  def encodeLayer(name: String, extent: Int, features: Seq[Feature]): Array[Byte] = {
    val keys = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // dictionary keyed on the ENCODED value (value equality — Array[Byte]
    // attribute values would otherwise compare by reference and never dedup)
    val values = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], Int]
    val featBytes = features.map { f =>
      val p = new Pbf
      // id is optional in MVT v2.1 and must be unique within the layer when
      // present — omit it rather than emitting duplicate zeros
      f.id.foreach(p.varintField(1, _))
      val tags = f.attrs.flatMap { case (k, v) =>
        val ki = keys.getOrElseUpdate(k, keys.size)
        val vi = values.getOrElseUpdate(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(encodeValue(v)),
          values.size)
        Seq(ki.toLong, vi.toLong)
      }
      p.packedField(2, tags)
      p.varintField(3, f.gtype.toLong)
      p.packedField(4, geometryStream(f))
      p.bytes
    }
    val layer = new Pbf
    layer.varintField(15, 2L) // version (required, field 15)
    layer.strField(1, name)
    featBytes.foreach(layer.bytesField(2, _))
    keys.keys.foreach(layer.strField(3, _))
    values.keys.foreach(v => layer.bytesField(4, v.toArray))
    layer.varintField(5, extent.toLong)
    layer.bytes
  }

  /** Lexicographic walk over ring coordinates — the geometry tiebreak of
    * [[sortFeatures]] (allocation-free; never stringifies the geometry). */
  private def compareRings(ar: Seq[IndexedSeq[(Long, Long)]],
      br: Seq[IndexedSeq[(Long, Long)]]): Int = {
    var k = 0
    while (k < ar.length && k < br.length) {
      val ra = ar(k); val rb = br(k)
      var j = 0
      while (j < ra.length && j < rb.length) {
        var c = java.lang.Long.compare(ra(j)._1, rb(j)._1)
        if (c != 0) return c
        c = java.lang.Long.compare(ra(j)._2, rb(j)._2)
        if (c != 0) return c
        j += 1
      }
      val c = Integer.compare(ra.length, rb.length)
      if (c != 0) return c
      k += 1
    }
    Integer.compare(ar.length, br.length)
  }

  /** Deterministic feature order for byte-identical re-runs: id, canonical
    * attr values (precomputed ONCE per feature — never per comparison),
    * then the ring-coordinate walk for attr-less frames. */
  def sortFeatures(feats: Seq[Feature]): Seq[Feature] =
    feats
      .map(f => ((f.id.getOrElse(Long.MinValue),
        f.attrs.map(kv => canonicalString(kv._2)).mkString(" ")), f))
      .sorted(new Ordering[((Long, String), Feature)] {
        def compare(a: ((Long, String), Feature), b: ((Long, String), Feature)): Int = {
          var c = java.lang.Long.compare(a._1._1, b._1._1)
          if (c != 0) return c
          c = a._1._2.compareTo(b._1._2)
          if (c != 0) return c
          compareRings(a._2.rings, b._2.rings)
        }
      })
      .map(_._2)

  /** A Tile message with one layer. */
  def encodeTile(layerName: String, extent: Int, features: Seq[Feature]): Array[Byte] = {
    val p = new Pbf
    p.bytesField(3, encodeLayer(layerName, extent, features))
    p.bytes
  }

  // ---- Web-Mercator tile-local projection ----------------------------------

  /** lon/lat → tile-local integer coords for tile (z, tx, ty); same mercator
    * as GeoCols.tileX/YCol. Values may fall outside [0, extent] for vertices
    * beyond the tile edge — the spec's buffer convention, renderers clip. */
  def tileLocal(z: Int, tx: Long, ty: Long, extent: Int,
      lon: Double, lat: Double): (Long, Long) = {
    val n = (1L << z).toDouble
    val wx = (lon + 180.0) / 360.0 * n
    val latR = math.toRadians(lat)
    val wy = (1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n
    (math.round((wx - tx) * extent), math.round((wy - ty) * extent))
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  // ---- the distributed tile-payload pipeline -------------------------------

  /** Feature DataFrame (kind, lon, lat, rings, roles + attribute columns) →
    * (z, tx, ty, payload) with one gzip MVT tile per row. The per-tile
    * groupBy is the only shuffle (plus one more when the cap engages);
    * encode + gzip are a narrow typed map.
    *
    * `maxFeaturesPerTile`: a z2 tile sees ~1/16th of the WHOLE table, so at
    * 10^12 rows an uncapped per-tile group is a single-task scale-killer
    * (and no renderable tile wants 10^10 features). Like tippecanoe's
    * feature-dropping on over-full tiles, each tile keeps a deterministic
    * pseudo-random subset: phase 1 caps each of `CapSalt` hash sub-buckets
    * (bounds every task at cap rows even for planet-sized tiles), phase 2
    * caps the ≤ CapSalt·cap survivors. Under-cap tiles pass through
    * exactly. ≤ 0 disables. */
  def tilePayloads(df0: DataFrame, zooms: (Int, Int),
      layerName: String, extent: Int = DefaultExtent,
      maxFeaturesPerTile: Int = 10000): DataFrame = {
    val df = FeatureModel.prepare(df0)
    val haveVerts = df.columns.contains("rings") && df.columns.contains("kind")
    val geomStruct =
      if (haveVerts)
        struct(col("kind"), col("lon"), col("lat"), col("rings"),
          if (df.columns.contains("roles")) col("roles")
          else array().cast("array<int>"))
      else struct(lit("point").as("kind"), col("lon"), col("lat"))
    val attrCols = df.columns.filterNot(FeatureModel.geomCols).toSeq
    val packed = df.select(
      col("lon"), col("lat"), geomStruct.as("_geom"),
      struct(attrCols.map(col): _*).as("_attrs"))
    val tiled0 = graft.operators.SpatialJoin.tileAssign(packed, zooms._1, zooms._2)
    val tiled =
      if (maxFeaturesPerTile <= 0) tiled0
      else {
        import org.apache.spark.sql.expressions.Window
        val CapSalt = 16
        val h = xxhash64(col("_attrs"), col("_geom"))
        val w1 = Window
          .partitionBy(col("z"), col("tx"), col("ty"), pmod(h, lit(CapSalt)))
          .orderBy(h)
        val w2 = Window.partitionBy(col("z"), col("tx"), col("ty")).orderBy(h)
        tiled0
          .withColumn("_rn", row_number().over(w1))
          .filter(col("_rn") <= maxFeaturesPerTile).drop("_rn")
          .withColumn("_rn", row_number().over(w2))
          .filter(col("_rn") <= maxFeaturesPerTile).drop("_rn")
      }
    val grouped = tiled.groupBy(col("z"), col("tx"), col("ty"))
      .agg(collect_list(struct(col("_geom"), col("_attrs"))).as("feats"))
    val attrSchema = StructType(attrCols.map(c => df.schema(c)))
    val idIdx = attrCols.indexWhere { c =>
      c == "image_id" && (attrSchema(c).dataType == LongType ||
        attrSchema(c).dataType == IntegerType)
    }
    val enc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.BINARY)
    grouped.map { row =>
      val z = row.getInt(0); val tx = row.getLong(1); val ty = row.getLong(2)
      val feats = row.getSeq[Row](3).map { fr =>
        val g = fr.getStruct(0); val a = fr.getStruct(1)
        val kind = g.getString(0)
        val lon = g.getDouble(1); val lat = g.getDouble(2)
        def local(x: Double, y: Double): (Long, Long) =
          tileLocal(z, tx, ty, extent, x, y)
        def localRing(fl: scala.collection.Seq[Double]): IndexedSeq[(Long, Long)] =
          (0 until fl.length / 2).map(i => local(fl(2 * i), fl(2 * i + 1)))
        val storedRings =
          (if (g.length > 3 && !g.isNullAt(3)) g.getSeq[scala.collection.Seq[Double]](3)
           else Nil).filter(_.nonEmpty) // empty rings degrade, never crash
        val storedRoles0 =
          if (g.length > 4 && !g.isNullAt(4)) g.getSeq[Int](4) else Nil
        // missing/short roles mean all-outer, matching FeatureModel.fromRings
        val storedRoles =
          if (storedRoles0.length == storedRings.length) storedRoles0
          else Seq.fill(storedRings.length)(0)
        val (gtype, rings, exterior) = kind match {
          case "line" if storedRings.nonEmpty =>
            (2, storedRings.map(localRing), None)
          case "polygon" if storedRings.nonEmpty =>
            (3, storedRings.map(localRing),
              Some(storedRoles.map(_ == 0)))
          case _ => (1, Seq(IndexedSeq(local(lon, lat))), None)
        }
        // null attributes are OMITTED (absent tag), never encoded as ""
        // — the typed vector_layers inventory promises e.g. Number fields,
        // and a string "" value would contradict it
        val attrs = attrCols.indices.flatMap { i =>
          if (a.isNullAt(i)) None else Some(attrCols(i) -> a.get(i))
        }
        val id = if (idIdx >= 0 && !a.isNullAt(idIdx))
          a.get(idIdx) match {
            case l: Long => Some(l); case i: Int => Some(i.toLong); case _ => None }
        else None
        Feature(id, gtype, rings, attrs, exterior)
      // collect_list order is nondeterministic; fix it (id, canonical attr
      // values — binary attrs would toString to identity hashes — then
      // geometry for attr-less frames) so re-runs produce byte-identical
      // tiles. Geometry compares through an allocation-free lexicographic
      // walk: the old rings.toString key string-built every vertex of every
      // feature (measured 3-4x tile-encode regression on multi-ring data)
      }
      val ordered = sortFeatures(feats)
      (z, tx, ty, gzip(encodeTile(layerName, extent, ordered)))
    }(enc).toDF("z", "tx", "ty", "payload")
  }
}
