package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions.
  *
  * SimHash in relational form explodes every (doc, token) into 64 bit-rows
  * and shuffles them through two groupBys — a 64x blowup of the token
  * volume, twice. But a document's simhash is a pure function of its text,
  * so here it is one codegen'd scalar expression: a single linear pass, no
  * explode, no shuffle. Semantics are bit-identical to the relational /
  * DuckDB form (md5 per token, +w/-w votes per bit, vote>0 -> 1): the md5
  * of the token's UTF-8 bytes is exactly Spark's and DuckDB's `md5()`.
  */
object TextHash {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** 64-bit SimHash of whitespace tokens as 16 lowercase hex chars; null
    * when the text has no tokens (mirrors the relational form, where a
    * token-less doc produces no row). Votes: each token occurrence adds
    * +1/-1 per bit of the first 8 bytes of md5(token); bit i of the output
    * is 1 iff its vote sum is > 0. */
  def simhash64Hex(text: UTF8String): UTF8String = {
    if (text == null) return null
    val votes = new Array[Int](64)
    val md = md5Local.get()
    var sawToken = false
    // equivalent to split(text, "\\s+") with empty tokens dropped; Java
    // regex \s is the ASCII class [ \t\n\x0B\f\r], NOT Unicode whitespace
    val s = text.toString
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      def isAsciiSpace(c: Char): Boolean =
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (i == len || isAsciiSpace(s.charAt(i))) {
        if (i > start) {
          sawToken = true
          md.reset()
          val digest = md.digest(s.substring(start, i).getBytes("UTF-8"))
          var b = 0
          while (b < 64) {
            val bit = (digest(b >> 3) >> (7 - (b & 7))) & 1
            if (bit == 1) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!sawToken) return null
    val out = new Array[Char](16)
    var nib = 0
    while (nib < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        if (votes(nib * 4 + b) > 0) v |= 8 >> b
        b += 1
      }
      out(nib) = HexChars(v)
      nib += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** simhash64(text): StringType -> StringType, stays in WholeStageCodegen. */
  case class SimHash64(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def nullSafeEval(t: Any): Any =
      simhash64Hex(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.TextHash.simhash64Hex($c);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Distinct word n-gram shingles in first-occurrence order — the native
    * twin of TextAnalysis.shingles (split on ASCII whitespace like Java's
    * \s+, slice windows of n, join with ' ', array_distinct). One linear
    * pass per row instead of an interpreted transform/slice/array_join
    * lambda chain; the dedup explode is the hottest scan in the
    * training-data queries. Fewer than n tokens -> empty array. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val s = text.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || isAsciiSpace(s.charAt(i))) {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(j))
      var m = 1
      while (m < n) { sb.append(' ').append(toks(j + m)); m += 1 }
      seen.add(sb.toString)
      j += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** word_shingles(text, n): StringType -> ArrayType(StringType), codegen'd. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(t: Any): Any =
      wordShingles(t.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.TextHash.wordShingles($c, $n);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
