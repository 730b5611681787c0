package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native generator for the pid-derived `rings` column — the kernel twin of
  * the [[GeoCols.featureGeomCols]] Column tree specialized to the pid
  * providers (uPidCol/mPidCol), i.e. exactly what
  * [[GeoCols.derivedFeatures]] used to assemble from nested
  * transform/sequence/flatten HOFs.
  *
  * Why (r06, guide §1.2): the HOF tree was ~2,000 expression nodes — every
  * features query paid ~0.3 s of analysis/planning just carrying it, and
  * HOF lambdas evaluate interpreted (measured 1.5–2.1 s to materialize
  * rings for 457k features at sf0.1; the kernel does it in a tight JIT'd
  * loop). The DuckDB oracle twin ([[GeoCols.featuresSql]]) is untouched, so
  * the 49 value-exact gates prove parity end to end.
  *
  * Arithmetic parity, operand for operand with the Column tree (and the SQL
  * twin):
  *  - u(k)   = ((pid·UA + k·UB) % 1000000) / 1000000.0   (Long ops, then
  *    int→double cast and division — same order);
  *  - m(b,s) = (pid + 37·s) % b                           (Long %, to int);
  *  - star ring vertex i: d0 = floor((i·16)/n) with double division (the
  *    Column `/` is fractional), d = d0 or 15−d0; r = rBase + rSpan·u(off+i);
  *    x = cx + r·DirX(d); y = cy + (0.7·r)·DirY(d) (left-assoc products);
  *  - zigzag vertex i: x = cx + ampX·(u(offX+i)·2.0 − 1.0), same for y;
  *    anchored ⇒ vertex 0 is exactly (cx, cy);
  *  - ring list assembly order: polygon shell, hole?, part2?; line main,
  *    part2? — identical concat order; points → empty list.
  */
final case class PidRingsExpr(pid: Expression, lon: Expression, lat: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(pid, lon, lat)
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = true)
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pid = newChildren(0), lon = newChildren(1), lat = newChildren(2))

  /** Called from generated code on null inputs (object-field access from
    * generated Java is awkward; a virtual call on the reference is not). */
  def emptyRings(): ArrayData = PidRingsExpr.Empty

  def invoke(pidV: Long, lonV: Double, latV: Double): ArrayData = {
    val parts = PidRingsExpr.ringsFor(pidV, lonV, latV)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = new GenericArrayData(parts(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val p = pid.eval(input)
    val lo = lon.eval(input)
    val la = lat.eval(input)
    if (p == null || lo == null || la == null) PidRingsExpr.Empty
    else invoke(p.asInstanceOf[Long], lo.asInstanceOf[Double],
      la.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ringsGen", this,
      classOf[PidRingsExpr].getName)
    val pGen = pid.genCode(ctx)
    val loGen = lon.genCode(ctx)
    val laGen = lat.genCode(ctx)
    val adCls = classOf[ArrayData].getName
    val resultCode =
      code"""
        ${pGen.code}
        ${loGen.code}
        ${laGen.code}
        $adCls ${ev.value};
        if (!${pGen.isNull} && !${loGen.isNull} && !${laGen.isNull}) {
          ${ev.value} = $ref.invoke(${pGen.value}, ${loGen.value}, ${laGen.value});
        } else {
          ${ev.value} = $ref.emptyRings();
        }
      """
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

object PidRingsExpr {

  val Empty: GenericArrayData = new GenericArrayData(Array.empty[Any])

  private val DirX: Array[Double] = GeoCols.DirX.toArray
  private val DirY: Array[Double] = GeoCols.DirY.toArray

  @inline private def u(pid: Long, k: Int): Double =
    ((pid * GeoCols.UA + k.toLong * GeoCols.UB) % 1000000L).toDouble / 1000000.0

  @inline private def m(pid: Long, base: Int, salt: Int): Int =
    ((pid + 37L * salt) % base.toLong).toInt

  private def starRing(pid: Long, cx: Double, cy: Double, n: Int,
      dirRev: Boolean, rBase: Double, rSpan: Double, uOff: Int): Array[Double] = {
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      val d0 = math.floor((i * 16).toDouble / n.toDouble).toInt
      val d = if (dirRev) 15 - d0 else d0
      val r = rBase + rSpan * u(pid, uOff + i)
      out(2 * i) = cx + r * DirX(d)
      out(2 * i + 1) = cy + 0.7 * r * DirY(d)
      i += 1
    }
    out
  }

  private def zigzagLine(pid: Long, cx: Double, cy: Double, n: Int,
      anchored: Boolean, ampX: Double, ampY: Double,
      uOffX: Int, uOffY: Int): Array[Double] = {
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      if (anchored && i == 0) {
        out(0) = cx; out(1) = cy
      } else {
        out(2 * i) = cx + ampX * (u(pid, uOffX + i) * 2.0 - 1.0)
        out(2 * i + 1) = cy + ampY * (u(pid, uOffY + i) * 2.0 - 1.0)
      }
      i += 1
    }
    out
  }

  /** The flat rings of the pid-derived feature (empty for points) — shape
    * spec identical to [[GeoCols.featureGeomCols]] with the pid providers. */
  def ringsFor(pid: Long, lon: Double, lat: Double): Array[Array[Double]] = {
    val sel = pid % 10
    if (sel < 6) Array.empty
    else if (sel < 8) {
      val main = zigzagLine(pid, lon, lat, 3 + m(pid, 7, 5), anchored = true,
        1.0, 0.5, 400, 500)
      if (m(pid, 3, 6) == 0)
        Array(main, zigzagLine(pid, lon + 0.6, lat + 0.3, 2 + m(pid, 3, 7),
          anchored = false, 0.8, 0.4, 600, 700))
      else Array(main)
    } else {
      val shell = starRing(pid, lon, lat, 5 + m(pid, 8, 0), dirRev = false,
        0.15, 0.5, 100)
      val hasHole = m(pid, 3, 1) == 0
      val hasPart2 = m(pid, 4, 3) == 0
      val out = new Array[Array[Double]](1 + (if (hasHole) 1 else 0) +
        (if (hasPart2) 1 else 0))
      out(0) = shell
      var idx = 1
      if (hasHole) {
        out(idx) = starRing(pid, lon, lat, 4 + m(pid, 4, 2), dirRev = true,
          0.03, 0.05, 200)
        idx += 1
      }
      if (hasPart2)
        out(idx) = starRing(pid, lon + 1.3, lat + 0.65, 4 + m(pid, 7, 4),
          dirRev = false, 0.1, 0.3, 300)
      out
    }
  }

  /** Column wrapper for plan assembly. */
  def column(pid: Column, lon: Column, lat: Column): Column =
    ExprBridge.column(PidRingsExpr(ExprBridge.expression(pid),
      ExprBridge.expression(lon), ExprBridge.expression(lat)))
}
