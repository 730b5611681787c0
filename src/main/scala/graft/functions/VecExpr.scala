package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding-vector hot paths
  * (optimization round 6, guide §1.2).
  *
  * The unrolled per-dimension Column trees ([[graft.operators.Similarity]]
  * dotCol: 64 products + 63 adds, each with element_at + cast, ×3 instances
  * per query; bucketCol: planes×16 terms) were correct but dominated both
  * janino compile time and stage eval at fixture scale, and their generated
  * methods grow with Dims. Each expression here emits ONE call into a
  * JIT-compiled loop that reads the Catalyst [[ArrayData]] directly (no UDF
  * boundary conversion).
  *
  * Bit parity with the Column twins is preserved operand for operand:
  *  - dot: left-associated double accumulation over i = 0..n-1 with the
  *    accumulator seeded by the FIRST term (not 0.0), exactly the shape of
  *    `terms.reduce(_ + _)` — identical IEEE results including signed zeros;
  *  - arrays shorter than the requested dim count produce NULL, matching
  *    element_at-out-of-range → null propagation through the product/sum;
  *  - sign-bucket: per-plane projection accumulated the same way; a short
  *    array makes every projection null, and `when(null > 0, …).otherwise(0)`
  *    summed to 0L in the Column twin — the kernel returns 0L then too.
  */
final case class DotProductExpr(dims: Int, a: Expression, b: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(a, b)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))

  /** Shared by interpreted eval and generated code; null = out-of-range or
    * null element (element_at's null propagates through the Column sum). */
  def invoke(aa: ArrayData, bb: ArrayData): Any = {
    if (aa.numElements() < dims || bb.numElements() < dims) return null
    var i = 0
    while (i < dims) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      i += 1
    }
    var acc = aa.getFloat(0).toDouble * bb.getFloat(0).toDouble
    i = 1
    while (i < dims) {
      acc += aa.getFloat(i).toDouble * bb.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input)
    if (av == null) return null
    val bv = b.eval(input)
    if (bv == null) return null
    invoke(av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotKernel", this,
      classOf[DotProductExpr].getName)
    val aGen = a.genCode(ctx)
    val bGen = b.genCode(ctx)
    val boxed = ctx.freshName("dotBoxed")
    val resultCode =
      code"""
        ${aGen.code}
        ${bGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${aGen.isNull} && !${bGen.isNull}) {
          Object $boxed = $ref.invoke(${aGen.value}, ${bGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
          }
        }
      """
    ev.copy(code = resultCode)
  }
}

object DotProductExpr {
  def column(dims: Int, a: Column, b: Column): Column =
    ExprBridge.column(DotProductExpr(dims,
      ExprBridge.expression(a), ExprBridge.expression(b)))
}

/** Sign-LSH bucket id over the leading `planes(j).length` dims — kernel twin
  * of [[graft.operators.Similarity.bucketCol]] (see header for parity). */
final case class SignBucketExpr(planes: Array[Array[Double]], child: Expression)
  extends Expression {

  private val projDims = planes(0).length

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  def invoke(e: ArrayData): Long = {
    if (e.numElements() < projDims) return 0L // Column twin: all terms → 0
    var k = 0
    while (k < projDims) { // a null element nulls every projection → all 0
      if (e.isNullAt(k)) return 0L
      k += 1
    }
    var bits = 0L
    var j = 0
    while (j < planes.length) {
      val row = planes(j)
      var acc = e.getFloat(0).toDouble * row(0)
      var i = 1
      while (i < projDims) {
        acc += e.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (acc > 0) bits += (1L << j)
      j += 1
    }
    bits
  }

  override def eval(input: InternalRow): Any = {
    val ev = child.eval(input)
    if (ev == null) 0L else invoke(ev.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketKernel", this,
      classOf[SignBucketExpr].getName)
    val cGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${cGen.code}
        long ${ev.value} = 0L;
        if (!${cGen.isNull}) {
          ${ev.value} = $ref.invoke(${cGen.value});
        }
      """
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

object SignBucketExpr {
  def column(planes: Array[Array[Double]], e: Column): Column =
    ExprBridge.column(SignBucketExpr(planes, ExprBridge.expression(e)))
}
