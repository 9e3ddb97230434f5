package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (aggregate/zip_with/transform) are
  * interpreted per element — they sit outside whole-stage codegen. For
  * ANN/near-dup the dot product runs once per candidate PAIR, so it is the
  * single hottest expression in the engine. These expressions generate a
  * tight primitive loop via doGenCode (and a matching interpreted eval for
  * completeness), keeping the pair stage fully inside WholeStageCodegen.
  *
  * Accumulation order is ascending index — identical to the sequential
  * fold they replace, so results (and the DuckDB oracle comparisons) are
  * bit-for-bit unchanged.
  */
object VectorExpressions {

  private def elemPrim(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "Float"
    case _ => "Double"
  }

  /** dot(a, b): float/double arrays, accumulated in double, index order. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val leftFloat = elemPrim(left.dataType) == "Float"
      val rightFloat = elemPrim(right.dataType) == "Float"
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val lGet = s"$x.get${elemPrim(left.dataType)}($i)"
        val rGet = s"$y.get${elemPrim(right.dataType)}($i)"
        s"""
           |int $n = Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $lGet) * ((double) $rGet);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** l2norm(a) = sqrt(sum a_i^2), double accumulation in index order. */
  case class L2Norm(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val isFloat = elemPrim(child.dataType) == "Float"
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        val get = s"$x.get${elemPrim(child.dataType)}($i)"
        s"""
           |int $n = $x.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = (double) $get;
           |  $acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def l2NormNative(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))
}
