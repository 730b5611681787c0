package graft.sinks

import java.nio.ByteBuffer

/** Shared little-endian WKB encoder over [[FeatureModel.Geom]] — consumed by
  * the GeoPackage sink (raw WKB inside GeoPackageBinary) and the PG COPY
  * dump (hex EWKB). Types: 1=Point, 2=LineString, 3=Polygon,
  * 5=MultiLineString, 6=MultiPolygon — the geometrytype set the reference
  * emits (builder.py:685, :713-714). Rings arrive CLOSED from
  * [[FeatureModel.geomReader]]. */
object Wkb {

  /** Encoded size in bytes (without any EWKB SRID extension). */
  def size(g: FeatureModel.Geom): Int = g.gtype match {
    case 1 => 5 + 16
    case 2 => 5 + 4 + g.parts.head.head.length * 16
    case 3 => 5 + 4 + g.parts.head.map(r => 4 + r.length * 16).sum
    case 5 => 5 + 4 + g.parts.map(p => 5 + 4 + p.head.length * 16).sum
    case _ => 5 + 4 +
      g.parts.map(p => 5 + 4 + p.map(r => 4 + r.length * 16).sum).sum
  }

  private def putPts(b: ByteBuffer, pts: Seq[(Double, Double)]): Unit =
    pts.foreach { case (x, y) => b.putDouble(x).putDouble(y); () }

  private def putLineString(b: ByteBuffer, line: Seq[(Double, Double)]): Unit = {
    b.put(1.toByte).putInt(2).putInt(line.length)
    putPts(b, line)
  }

  private def putPolygon(b: ByteBuffer, rings: Seq[IndexedSeq[(Double, Double)]]): Unit = {
    b.put(1.toByte).putInt(3).putInt(rings.length)
    rings.foreach { r => b.putInt(r.length); putPts(b, r) }
  }

  /** Write the plain WKB (no SRID) into the buffer. `sridFlag`: when >= 0,
    * the TOP-level type int carries the PostGIS EWKB SRID extension
    * (0x20000000 | type, then the srid) — nested sub-geometries stay plain,
    * matching PostGIS. */
  def put(b: ByteBuffer, g: FeatureModel.Geom, sridFlag: Int = -1): Unit = {
    def header(t: Int): Unit =
      if (sridFlag >= 0) { b.put(1.toByte).putInt(0x20000000 | t).putInt(sridFlag); () }
      else { b.put(1.toByte).putInt(t); () }
    g.gtype match {
      case 1 =>
        header(1)
        val (x, y) = g.parts.head.head.head
        b.putDouble(x).putDouble(y)
      case 2 =>
        header(2); b.putInt(g.parts.head.head.length); putPts(b, g.parts.head.head)
      case 3 =>
        header(3); b.putInt(g.parts.head.length)
        g.parts.head.foreach { r => b.putInt(r.length); putPts(b, r) }
      case 5 =>
        header(5); b.putInt(g.parts.length)
        g.parts.foreach(p => putLineString(b, p.head))
      case _ =>
        header(6); b.putInt(g.parts.length)
        g.parts.foreach(p => putPolygon(b, p))
    }
    ()
  }
}
