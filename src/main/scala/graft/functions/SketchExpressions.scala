package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graft.ColumnBridge

/** Native base-2 sub-bucket assignment for the quantile sketch
  * ([[graft.operators.Sketches.qsketchBuckets]]).
  *
  * The engine-portable CONTRACT is defined by string ops both engines
  * share (floor(log2) = binary-string length - 1, then integer shifts) —
  * but evaluating that contract via `conv(v, 10, 2)` allocates a decimal
  * and a binary string per row. These expressions compute the identical
  * integers with `Long.numberOfLeadingZeros` + shifts inside whole-stage
  * codegen — zero allocation on the corpus-scan hot path; the DuckDB
  * oracle still replays the string formulation and must agree
  * bit-for-bit (pinned by the gated query and the driver-side replay
  * spec).
  *
  * Inputs must be non-null longs above Long.MinValue (the operator
  * filters; `Math.abs(Long.MinValue)` is the one undefined point). */
object SketchExpressions {

  private def bucketCode(x: String, subBits: Int, ctx: CodegenContext,
                         assign: (String, String, String) => String): String = {
    val a = ctx.freshName("qsAbs")
    val sh = ctx.freshName("qsSh")
    val w = ctx.freshName("qsW")
    val l = ctx.freshName("qsL")
    s"""
       |long $a = Math.abs((long) $x);
       |if ($a < ${1L << subBits}L) {
       |  ${assign(s"(long) $x", "1L", a)}
       |} else {
       |  int $sh = (63 - java.lang.Long.numberOfLeadingZeros($a)) - $subBits;
       |  long $w = 1L << $sh;
       |  long $l = ($a >>> $sh) << $sh;
       |  ${assign(s"(((long) $x) >= 0L ? $l : -($l + $w - 1L))", w, a)}
       |}
     """.stripMargin
  }

  /** The bucket's lower bound (sign-mirrored for negatives). */
  case class QsketchLo(child: Expression, subBits: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[Long]
      val ab = math.abs(v)
      if (ab < (1L << subBits)) v
      else {
        val sh = (63 - java.lang.Long.numberOfLeadingZeros(ab)) - subBits
        val w = 1L << sh
        val l = (ab >>> sh) << sh
        if (v >= 0) l else -(l + w - 1)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        bucketCode(x, subBits, ctx, (lo, _, _) => s"${ev.value} = $lo;"))

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The bucket's width (1 below 2^subBits, else 2^(e - subBits)). */
  case class QsketchWidth(child: Expression, subBits: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val ab = math.abs(a.asInstanceOf[Long])
      if (ab < (1L << subBits)) 1L
      else 1L << ((63 - java.lang.Long.numberOfLeadingZeros(ab)) - subBits)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        bucketCode(x, subBits, ctx, (_, w, _) => s"${ev.value} = $w;"))

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def qsketchLo(v: Column, subBits: Int): Column =
    ColumnBridge.column(QsketchLo(ColumnBridge.expression(v), subBits))

  def qsketchWidth(v: Column, subBits: Int): Column =
    ColumnBridge.column(QsketchWidth(ColumnBridge.expression(v), subBits))
}
