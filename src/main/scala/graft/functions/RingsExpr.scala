package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import graft.geo.MultiPolygon

/** Zero-copy [[scala.collection.Seq]] views over Catalyst [[ArrayData]] —
  * the rings kernels read them directly, so the hot refine path never pays
  * the UDF boundary's ArrayData→Seq materialization (CatalystTypeConverters
  * copies every ring of every candidate row). */
object RowGeom {

  private final class DoubleView(a: ArrayData)
      extends scala.collection.IndexedSeq[Double] {
    override def apply(i: Int): Double = a.getDouble(i)
    override def length: Int = a.numElements()
  }

  /** One materialized outer level (parts are tiny), inner rings stay views. */
  def ringsView(a: ArrayData): scala.collection.Seq[scala.collection.Seq[Double]] = {
    val n = a.numElements()
    val out = new Array[scala.collection.Seq[Double]](n)
    var i = 0
    while (i < n) { out(i) = new DoubleView(a.getArray(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}

/** Native Catalyst expression for the kind-aware feature × request-geometry
  * intersect refine — the (c)-tier of the brief's preference ladder where a
  * plain UDF was the previous fallback. Same JIT-compiled kernel
  * ([[graft.geo.Geo.featureIntersectsRings]], operand-for-operand twin of
  * the DuckDB oracle SQL), but:
  *
  *  - `eval`/generated code receive [[ArrayData]] directly and read the
  *    coordinates through zero-copy views — no per-row deep conversion of
  *    the rings column at the UDF boundary;
  *  - `doGenCode` stays inside whole-stage codegen: the request geometry is
  *    attached as a codegen reference object and the generated code is one
  *    virtual call, never a janino-sized expression tree (BENCH.md finding
  *    #2's disease is structurally impossible here).
  *
  * Null semantics: null kind/lon/lat → not intersecting (false, non-null);
  * null rings → treated as "no rings" (points never read them — same
  * behavior as the UDF twin). A malformed row drops out of the extract
  * instead of poisoning it. */
final case class FeatureIntersectsRingsExpr(geom: MultiPolygon,
    kind: Expression, lon: Expression, lat: Expression, rings: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(kind, lon, lat, rings)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(kind = newChildren(0), lon = newChildren(1), lat = newChildren(2),
      rings = newChildren(3))

  /** Entry shared by interpreted eval and generated code. A null rings
    * array means "no rings" (the point path never reads them — matching
    * the UDF twin, which passed null through untouched for points); kind
    * dispatches on cached UTF8String constants so the hot refine never
    * allocates a String per candidate row. */
  def invoke(kindU: UTF8String, lonV: Double, latV: Double,
      ringsA: ArrayData): Boolean = {
    val kindStr =
      if (kindU.equals(FeatureIntersectsRingsExpr.PointU)) "point"
      else if (kindU.equals(FeatureIntersectsRingsExpr.LineU)) "line"
      else "polygon"
    val view =
      if (ringsA == null) FeatureIntersectsRingsExpr.NoRings
      else RowGeom.ringsView(ringsA)
    graft.geo.Geo.featureIntersectsRings(geom.polys, kindStr, lonV, latV, view)
  }

  override def eval(input: InternalRow): Any = {
    val k = kind.eval(input)
    val lo = lon.eval(input)
    val la = lat.eval(input)
    if (k == null || lo == null || la == null) false
    else invoke(k.asInstanceOf[UTF8String],
      lo.asInstanceOf[Double], la.asInstanceOf[Double],
      rings.eval(input).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectKernel", this,
      classOf[FeatureIntersectsRingsExpr].getName)
    val kindGen = kind.genCode(ctx)
    val lonGen = lon.genCode(ctx)
    val latGen = lat.genCode(ctx)
    val ringsGen = rings.genCode(ctx)
    val resultCode =
      code"""
        ${kindGen.code}
        ${lonGen.code}
        ${latGen.code}
        ${ringsGen.code}
        boolean ${ev.value} = false;
        if (!${kindGen.isNull} && !${lonGen.isNull} && !${latGen.isNull}) {
          ${ev.value} = $ref.invoke(${kindGen.value}, ${lonGen.value},
            ${latGen.value}, ${ringsGen.isNull} ? null : ${ringsGen.value});
        }
      """
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

object FeatureIntersectsRingsExpr {
  private val PointU = UTF8String.fromString("point")
  private val LineU = UTF8String.fromString("line")
  private val NoRings: scala.collection.Seq[scala.collection.Seq[Double]] = Nil

  /** Column wrapper for plan assembly. */
  def column(geom: MultiPolygon, kind: Column, lon: Column, lat: Column,
      rings: Column): Column =
    ExprBridge.column(FeatureIntersectsRingsExpr(geom,
      ExprBridge.expression(kind), ExprBridge.expression(lon),
      ExprBridge.expression(lat), ExprBridge.expression(rings)))
}
