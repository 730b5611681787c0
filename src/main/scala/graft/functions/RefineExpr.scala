package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.geo.Polygon

/** Native per-region PIP refine for the broadcast-cover spatial join — the
  * kernel-expression successor of SpatialJoin.pipRefineUdf (r06,
  * guide §1.2): the UDF boundary boxed three primitives and did a Map[Int,
  * Polygon] hash lookup per joined row; this indexes the catalog by cid in
  * a plain array and calls the same JIT'd `Geo.pointInPolygon`. Null cid or
  * coordinates → null, exactly like the primitive-arg UDF (Spark skipped
  * the call and yielded null). */
final case class RegionRefineExpr(catalog: Array[Polygon],
    cid: Expression, lon: Expression, lat: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(cid, lon, lat)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(cid = newChildren(0), lon = newChildren(1), lat = newChildren(2))

  def invoke(cidV: Int, lonV: Double, latV: Double): Boolean =
    graft.geo.Geo.pointInPolygon(lonV, latV, catalog(cidV))

  override def eval(input: InternalRow): Any = {
    val c = cid.eval(input)
    if (c == null) return null
    val lo = lon.eval(input)
    if (lo == null) return null
    val la = lat.eval(input)
    if (la == null) return null
    invoke(c.asInstanceOf[Int], lo.asInstanceOf[Double],
      la.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("refineKernel", this,
      classOf[RegionRefineExpr].getName)
    val cGen = cid.genCode(ctx)
    val loGen = lon.genCode(ctx)
    val laGen = lat.genCode(ctx)
    val resultCode =
      code"""
        ${cGen.code}
        ${loGen.code}
        ${laGen.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${cGen.isNull} && !${loGen.isNull} && !${laGen.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = $ref.invoke(${cGen.value}, ${loGen.value}, ${laGen.value});
        }
      """
    ev.copy(code = resultCode)
  }
}

object RegionRefineExpr {
  /** Column wrapper; `catalog` must be indexable by every cid it will see. */
  def column(catalog: Array[Polygon], cid: Column, lon: Column,
      lat: Column): Column =
    ExprBridge.column(RegionRefineExpr(catalog, ExprBridge.expression(cid),
      ExprBridge.expression(lon), ExprBridge.expression(lat)))
}
