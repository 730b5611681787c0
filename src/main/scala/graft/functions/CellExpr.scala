package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order cell id — kernel twin of the unrolled
  * [[GeoCols.cellCol]] morton Column tree, calling the JIT-compiled
  * [[graft.geo.Cell.cellAt]] (EngineSpec pins cellCol ≡ Cell.cellAt on
  * every derived point).
  *
  * Why (r06, guide §1.2/§7.2): when a `cell IN cover` prefilter is pushed
  * below the derived-point projection, the morton tree re-inlines the
  * pid→lon/lat arithmetic into each of its 2·res bit terms — the single
  * generated predicate method grows past HotSpot's JIT limit and the whole
  * stage runs in the bytecode interpreter (measured: a cover-only filter at
  * sf0.1 cost 4.0–5.1 s vs 0.5 s once compact; same disease as the r06
  * geo_pip fix). One virtual call keeps the predicate JIT-able no matter
  * where the optimizer moves it. */
final case class CellIdExpr(res: Int, lon: Expression, lat: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(lon, lat)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lon = newChildren(0), lat = newChildren(1))

  def invoke(lonV: Double, latV: Double): Long =
    graft.geo.Cell.cellAt(res, lonV, latV)

  override def eval(input: InternalRow): Any = {
    val lo = lon.eval(input)
    if (lo == null) return null
    val la = lat.eval(input)
    if (la == null) return null
    invoke(lo.asInstanceOf[Double], la.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellKernel", this, classOf[CellIdExpr].getName)
    val loGen = lon.genCode(ctx)
    val laGen = lat.genCode(ctx)
    val resultCode =
      code"""
        ${loGen.code}
        ${laGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${loGen.isNull} && !${laGen.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = $ref.invoke(${loGen.value}, ${laGen.value});
        }
      """
    ev.copy(code = resultCode)
  }
}

object CellIdExpr {
  def column(res: Int, lon: Column, lat: Column): Column =
    ExprBridge.column(CellIdExpr(res,
      ExprBridge.expression(lon), ExprBridge.expression(lat)))
}
