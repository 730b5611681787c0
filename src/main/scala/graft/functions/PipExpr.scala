package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.geo.MultiPolygon

/** Native Catalyst expression for the point-in-request-polygon filter — the
  * point twin of [[FeatureIntersectsRingsExpr]].
  *
  * Why it exists (optimization round 6, guide §1.2/§4.1): the literal
  * [[GeoCols.pipCol]] Column tree (one CASE per polygon edge) is correct but,
  * once the optimizer pushes the filter below the derived-point projection,
  * every edge term re-inlines the full pid→lon/lat arithmetic — an 18-edge
  * request polygon became a single ~40 KB generated predicate that HotSpot
  * refuses to JIT (DontCompileHugeMethods), so the hot filter ran in the
  * bytecode interpreter (measured: geo_pip 5.3 s vs geo_bbox 0.24 s on the
  * same scan at sf0.1). This expression evaluates lon/lat once and makes one
  * virtual call into the JIT-compiled kernel.
  *
  * Correctness: [[graft.geo.Geo.pointInRing]] is operand-for-operand
  * identical to the pipCol/pipSql ray-cast ((yi > lat) != (yj > lat), xInt =
  * (xj−xi)·(lat−yi)/(yj−yi)+xi, same half-open rule — EngineSpec pins the
  * parity on every derived point), and the kernel's bbox short-circuit is
  * exact: a point outside the bbox can cross no edges. Null lon/lat → false
  * (the Column tree yielded null; both drop the row from a filter). */
final case class PointInMultiPolygonExpr(geom: MultiPolygon,
    lon: Expression, lat: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(lon, lat)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lon = newChildren(0), lat = newChildren(1))

  /** Entry shared by interpreted eval and generated code. */
  def invoke(lonV: Double, latV: Double): Boolean = {
    val ps = geom.polys
    var i = 0
    while (i < ps.length) {
      if (graft.geo.Geo.pointInPolygon(lonV, latV, ps(i))) return true
      i += 1
    }
    false
  }

  override def eval(input: InternalRow): Any = {
    val lo = lon.eval(input)
    val la = lat.eval(input)
    if (lo == null || la == null) false
    else invoke(lo.asInstanceOf[Double], la.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pipKernel", this,
      classOf[PointInMultiPolygonExpr].getName)
    val lonGen = lon.genCode(ctx)
    val latGen = lat.genCode(ctx)
    val resultCode =
      code"""
        ${lonGen.code}
        ${latGen.code}
        boolean ${ev.value} = false;
        if (!${lonGen.isNull} && !${latGen.isNull}) {
          ${ev.value} = $ref.invoke(${lonGen.value}, ${latGen.value});
        }
      """
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

object PointInMultiPolygonExpr {
  /** Column wrapper for plan assembly. */
  def column(geom: MultiPolygon, lon: Column, lat: Column): Column =
    ExprBridge.column(PointInMultiPolygonExpr(geom,
      ExprBridge.expression(lon), ExprBridge.expression(lat)))
}
