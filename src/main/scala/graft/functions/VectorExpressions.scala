package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Spark's `round(x, 6)` for doubles, replicated exactly (NaN/Infinity
    * pass through; BigDecimal.valueOf + HALF_UP + doubleValue) so a native
    * expression that rounds INSIDE its loop stays bit-identical to the
    * `round(fold, 6)` composition it replaces. */
  def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private val round6Java: String => String = acc =>
    s"""(Double.isNaN($acc) || Double.isInfinite($acc)) ? $acc :
       |  java.math.BigDecimal.valueOf($acc)
       |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()""".stripMargin

  /** PQ encode: for each subspace s, the id of the codeword minimizing the
    * 6-dp-ROUNDED squared L2 distance to the vector's s-th slice (smallest
    * code id on ties). One native expression replaces m x k' interpreted
    * `aggregate(zip_with(...))` folds plus the slice/cast staging
    * projections — this runs once per COLLECTION row, the PQ hot path.
    *
    * Distance accumulation is ascending index and the rounding is
    * [[round6]] (Spark's own double `round`), so codes are bit-identical
    * to the fold composition (see SimilaritySpec's cross-check).
    *
    * Returns array<long> of length m, or null when the vector is shorter
    * than m * subLen (the fold path yields nulls there too). */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val isFloat = elemPrim(child.dataType) == "Float"
      val m = codebooks.length
      val n = x.numElements()
      val codes = new Array[Long](m)
      var s = 0
      while (s < m) {
        val cws = codebooks(s)
        val subLen = cws(0).length
        val base = s * subLen
        if (base + subLen > n) return null
        var best = Double.PositiveInfinity
        var bestC = 0L
        var c = 0
        while (c < cws.length) {
          val cw = cws(c)
          var acc = 0.0
          var i = 0
          while (i < subLen) {
            val v = (if (isFloat) x.getFloat(base + i).toDouble
                     else x.getDouble(base + i)) - cw(i)
            acc += v * v
            i += 1
          }
          val dr = round6(acc)
          if (dr < best) { best = dr; bestC = c.toLong }
          c += 1
        }
        codes(s) = bestC
        s += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val codes = ctx.freshName("codes")
        val cws = ctx.freshName("cws")
        val cw = ctx.freshName("cw")
        val subLen = ctx.freshName("subLen")
        val base = ctx.freshName("base")
        val best = ctx.freshName("best")
        val bestC = ctx.freshName("bestC")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        val dr = ctx.freshName("dr")
        val bad = ctx.freshName("bad")
        val get = s"$x.get${elemPrim(child.dataType)}($base + $i)"
        s"""
           |int $n = $x.numElements();
           |long[] $codes = new long[$cb.length];
           |boolean $bad = false;
           |for (int $s = 0; $s < $cb.length && !$bad; $s++) {
           |  double[][] $cws = $cb[$s];
           |  int $subLen = $cws[0].length;
           |  int $base = $s * $subLen;
           |  if ($base + $subLen > $n) { $bad = true; break; }
           |  double $best = Double.POSITIVE_INFINITY;
           |  long $bestC = 0L;
           |  for (int $c = 0; $c < $cws.length; $c++) {
           |    double[] $cw = $cws[$c];
           |    double $acc = 0.0;
           |    for (int $i = 0; $i < $subLen; $i++) {
           |      double $v = ((double) $get) - $cw[$i];
           |      $acc += $v * $v;
           |    }
           |    double $dr = ${round6Java(acc)};
           |    if ($dr < $best) { $best = $dr; $bestC = (long) $c; }
           |  }
           |  $codes[$s] = $bestC;
           |}
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
           |    .UnsafeArrayData.fromPrimitiveArray($codes);
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC distance core: sum over s of dtab[s][codes[s]], ascending s —
    * the per-(query, candidate) m-lookup sum. Replaces the interpreted
    * `aggregate(zip_with(dtab, codes, element_at))` fold; callers keep the
    * outer `round(_, 6)` so results are bit-identical. */
  case class AdcLookupSum(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val dtab = a.asInstanceOf[ArrayData]
      val codes = b.asInstanceOf[ArrayData]
      val m = math.min(dtab.numElements(), codes.numElements())
      var acc = 0.0
      var s = 0
      while (s < m) {
        acc += dtab.getArray(s).getDouble(codes.getLong(s).toInt)
        s += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (dtab, codes) => {
        val m = ctx.freshName("m")
        val s = ctx.freshName("s")
        val acc = ctx.freshName("acc")
        s"""
           |int $m = Math.min($dtab.numElements(), $codes.numElements());
           |double $acc = 0.0;
           |for (int $s = 0; $s < $m; $s++) {
           |  $acc += $dtab.getArray($s).getDouble((int) $codes.getLong($s));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Binary (1-bit) quantization: sign bits packed into 64-bit words —
    * bit (i mod 64) of word (i / 64) is set iff v_i > 0 (strict: zeros
    * and negatives clear, the sign-random-projection convention of
    * Charikar 2002 applied to the raw dimensions, FAISS's
    * IndexBinaryFlat representation). 32x smaller than float32; hamming
    * distance between packed vectors approximates angular distance. */
  def signPack(x: ArrayData, isFloat: Boolean): ArrayData = {
    val n = x.numElements()
    val words = new Array[Any](((n + 63) >> 6).max(0))
    var w = 0L
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (v > 0) w |= 1L << (i & 63)
      if ((i & 63) == 63 || i == n - 1) { words(i >> 6) = w; w = 0L }
      i += 1
    }
    new GenericArrayData(words)
  }

  /** sign_pack(vec): array<float|double> -> array<long>, codegen'd. */
  case class SignPack(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private def isFloat: Boolean = elemPrim(child.dataType) == "Float"

    override def nullSafeEval(a: Any): Any =
      signPack(a.asInstanceOf[ArrayData], isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        s"""
           |${ev.value} = graft.functions.VectorExpressions.signPack($x, $isFloat);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Hamming distance between two packed sign-bit words arrays: sum of
    * bit_count(xor) in ascending word order — the entire per-candidate
    * cost of the binary ANN scan (one xor + popcount per 64 dims). */
  def hammingWords(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  /** hamming(a, b): array<long> x array<long> -> long, codegen'd. */
  case class HammingWords(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any =
      hammingWords(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def signPackNative(a: Column): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(a)))

  def hammingNative(a: Column, b: Column): Column =
    ColumnBridge.column(HammingWords(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def l2NormNative(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  def pqEncodeNative(vec: Column, codebooks: Seq[Seq[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec),
      codebooks.map(_.toArray).toArray))

  def adcNative(dtab: Column, codes: Column): Column =
    ColumnBridge.column(AdcLookupSum(ColumnBridge.expression(dtab),
      ColumnBridge.expression(codes)))
}
