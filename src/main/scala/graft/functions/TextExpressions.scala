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

  /** MinHash signature of a document's word n-gram shingles, one 32-hex md5
    * per seed j in 0 until numHashes: sig(j) = min over shingles of
    * md5(j + "|" + shingle). Hex strings compare like their digest bytes
    * (both ASCII/unsigned lexicographic), so the min is taken on the raw
    * digests and only the winners are hex-encoded.
    *
    * This is the map-only twin of the relational explode -> groupBy(doc)
    * signature build: a signature is a pure function of the text, so
    * computing it per row removes the full-corpus shingle shuffle from the
    * LSH pipeline — at 100 TB the candidate generator becomes scan +
    * project + tiny band self-join. Null when the doc has no shingles
    * (mirrors "no rows after explode"). */
  def minhashHex(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
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
    if (toks.length < n) return null
    val md = md5Local.get()
    val mins = new Array[Array[Byte]](numHashes)
    val prefixes = Array.tabulate(numHashes)(j => s"$j|".getBytes("UTF-8"))
    var j0 = 0
    while (j0 + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(j0))
      var m = 1
      while (m < n) { sb.append(' ').append(toks(j0 + m)); m += 1 }
      val shingleBytes = sb.toString.getBytes("UTF-8")
      var j = 0
      while (j < numHashes) {
        md.reset()
        md.update(prefixes(j))
        val d = md.digest(shingleBytes)
        val cur = mins(j)
        if (cur == null || unsignedLess(d, cur)) mins(j) = d
        j += 1
      }
      j0 += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = UTF8String.fromString(hex(mins(k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Double-hashed MinHash signature (Kirsch-Mitzenhauer): ONE md5 per
    * shingle, numHashes derived values h_j = (h1 + j*h2) mod 2^64 where
    * h1/h2 are the little-endian uint64 halves of the digest — exactly
    * DuckDB's `md5_number_lower`/`md5_number_upper`, so the oracle
    * recomputes the same family with HUGEINT arithmetic. 8x fewer digest
    * calls than the per-seed form ([[minhashHex]], kept as the relational
    * spec cross-check): the signature job dominated the LSH queries' CPU,
    * and md5 is the per-shingle cost. Elements are rendered as UNSIGNED
    * decimal strings (Long.toUnsignedString == DuckDB `::VARCHAR` on
    * UBIGINT/HUGEINT), so downstream band keys hash identical bytes on
    * both engines. Null when the doc has fewer than n tokens. */
  def minhashU64Dec(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
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
    if (toks.length < n) return null
    val md = md5Local.get()
    val mins = new Array[Long](numHashes)
    var first = true
    var j0 = 0
    while (j0 + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(j0))
      var m = 1
      while (m < n) { sb.append(' ').append(toks(j0 + m)); m += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val h2 = le64(d, 0) // md5_number_upper
      var v = le64(d, 8)  // md5_number_lower; then h1 + j*h2 incrementally
      var j = 0
      while (j < numHashes) {
        if (first || java.lang.Long.compareUnsigned(v, mins(j)) < 0) mins(j) = v
        v += h2 // Java long wrap-around IS mod 2^64
        j += 1
      }
      first = false
      j0 += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = UTF8String.fromString(java.lang.Long.toUnsignedString(mins(k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Little-endian uint64 from 8 digest bytes at `off`. */
  private def le64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(off + i) & 0xffL); i -= 1 }
    v
  }

  /** minhash_u64(text, n, numHashes): StringType -> ArrayType(StringType)
    * of unsigned-decimal derived hashes, codegen'd. */
  case class MinHashU64(child: Expression, n: Int, numHashes: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(t: Any): Any =
      minhashU64Dec(t.asInstanceOf[UTF8String], n, numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.TextHash.minhashU64Dec($c, $n, $numHashes);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def minhashU64(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashU64(ColumnBridge.expression(text), n, numHashes))

  /** minhash_hex(text, n, numHashes): StringType -> ArrayType(StringType). */
  case class MinHashHex(child: Expression, n: Int, numHashes: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(t: Any): Any =
      minhashHex(t.asInstanceOf[UTF8String], n, numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.TextHash.minhashHex($c, $n, $numHashes);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def minhash(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashHex(ColumnBridge.expression(text), n, numHashes))

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
    * algorithm): hash every word k-gram (md5_number_lower, the same
    * digest-half convention as [[minhashU64Dec]]), slide a window of `w`
    * consecutive k-gram hashes, and in each window select the MINIMUM
    * hash, rightmost occurrence on ties; a selection shared by
    * overlapping windows is recorded once. The guarantee that makes this
    * the content-defined fingerprint: any shared substring of at least
    * k + w - 1 tokens produces at least one IDENTICAL selected
    * fingerprint in both documents, at ~1/w the k-gram density.
    *
    * One linear pass per row (monotonic deque, O(1) amortized per
    * k-gram): a pure function of the text, so fingerprinting is scan +
    * project at 100 TB — no explode, no shuffle; only the tiny selected
    * set leaves the row. Fewer k-grams than `w` -> one window over all
    * of them; fewer than k tokens -> null (mirrors the shingle ops).
    *
    * Returns array<struct<pos: long, fp: string>>: 1-based k-gram
    * position and the uint64 hash as an unsigned-decimal string
    * (identical bytes to DuckDB's `md5_number_lower(...)::VARCHAR`). */
  def winnowSelect(text: UTF8String, k: Int, w: Int): ArrayData = {
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
    if (toks.length < k) return null
    val md = md5Local.get()
    val nGrams = toks.length - k + 1
    val hs = new Array[Long](nGrams)
    var j0 = 0
    while (j0 < nGrams) {
      val sb = new java.lang.StringBuilder(toks(j0))
      var m = 1
      while (m < k) { sb.append(' ').append(toks(j0 + m)); m += 1 }
      md.reset()
      hs(j0) = le64(md.digest(sb.toString.getBytes("UTF-8")), 8)
      j0 += 1
    }
    // monotonic deque of indices; back pops on >= so the rightmost of
    // equal minima survives at the front when its window arrives
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val selPos = new scala.collection.mutable.ArrayBuffer[Int]()
    var lastSel = -1
    val effW = math.min(w, nGrams)
    var idx = 0
    while (idx < nGrams) {
      while (tail > head &&
          java.lang.Long.compareUnsigned(hs(deque(tail - 1)), hs(idx)) >= 0)
        tail -= 1
      deque(tail) = idx; tail += 1
      if (deque(head) <= idx - effW) head += 1
      if (idx >= effW - 1 && deque(head) != lastSel) {
        lastSel = deque(head)
        selPos += lastSel
      }
      idx += 1
    }
    val out = new Array[Any](selPos.length)
    var p = 0
    while (p < selPos.length) {
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any]((selPos(p) + 1).toLong,
          UTF8String.fromString(java.lang.Long.toUnsignedString(hs(selPos(p))))))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** winnow(text, k, w): StringType -> array<struct<pos,fp>>, codegen'd. */
  case class Winnow(child: Expression, k: Int, w: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("fp", StringType,
          nullable = false))), containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(t: Any): Any =
      winnowSelect(t.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.TextHash.winnowSelect($c, $k, $w);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def winnow(text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"k-gram size must be >= 1, got $k")
    require(w >= 1, s"window size must be >= 1, got $w")
    ColumnBridge.column(Winnow(ColumnBridge.expression(text), k, w))
  }
}
