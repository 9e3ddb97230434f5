package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExpressions.{DotProduct, HammingWords, L2Norm, SignPack}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use, so `spark.sql("SELECT graft_dot(a, b) ...")`
  * works next to the Column API. Enable with:
  *
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * This is the (c)-tier extension surface of the build brief — the same
  * hook a custom Rule/Strategy would use; expressions are all the engine
  * needs today (SURVEY §4: no custom physical operators required).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions.TextHash

  // int parameters arrive as literal expressions in SQL calls
  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (children: Seq[Expression]) => L2Norm(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[TextHash.SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => TextHash.SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[TextHash.WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        TextHash.WordShingles(children(0), intArg(children(1), "graft_shingles"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[TextHash.MinHashHex].getName, "graft_minhash"),
      (children: Seq[Expression]) => TextHash.MinHashHex(children(0),
        intArg(children(1), "graft_minhash"), intArg(children(2), "graft_minhash"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_u64"),
      new ExpressionInfo(classOf[TextHash.MinHashU64].getName, "graft_minhash_u64"),
      (children: Seq[Expression]) => TextHash.MinHashU64(children(0),
        intArg(children(1), "graft_minhash_u64"),
        intArg(children(2), "graft_minhash_u64"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[TextHash.Winnow].getName, "graft_winnow"),
      (children: Seq[Expression]) => TextHash.Winnow(children(0),
        intArg(children(1), "graft_winnow"),
        intArg(children(2), "graft_winnow"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sign_pack"),
      new ExpressionInfo(classOf[SignPack].getName, "graft_sign_pack"),
      (children: Seq[Expression]) => SignPack(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingWords].getName, "graft_hamming"),
      (children: Seq[Expression]) => HammingWords(children(0), children(1))))

    // The scale-native scalar probes, composed from codegen'd Catalyst
    // built-ins (no new Expression classes; the Column API cannot be
    // used here — Spark 4 Column trees are ColumnNodes, which never
    // resolve when returned from an injectFunction builder) and exposed
    // to SQL so a SQL-only user can replay the sketch/sampling operators:
    // probe a CM counter table, test a Bloom word table, or run the
    // deterministic exponential race — each bit-identical to the
    // DataFrame operators in graft.operators (spec-asserted SQL==Column).
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

    def md5hex(v: Expression): Expression = Md5(Cast(v, StringType))
    def hexSlice(hex: Expression, pos: Int, len: Int): Expression =
      Cast(Conv(Substring(hex, Literal(pos), Literal(len)),
        Literal(16), Literal(10)), LongType)

    // graft_race_key(id, weight) -> bigint: Sampling.raceKey — NULL for
    // null/NaN/non-positive weights (zero mass), else the exact
    // integer-micro key weightedSample races on
    ext.injectFunction((
      new FunctionIdentifier("graft_race_key"),
      new ExpressionInfo(graft.operators.Sampling.getClass.getName, "graft_race_key"),
      (children: Seq[Expression]) => {
        val id = children(0)
        val w = children(1)
        val u = Divide(
          Add(Cast(hexSlice(md5hex(id), 1, 13), DoubleType), Literal(0.5)),
          Literal((1L << 52).toDouble))
        val lnW = Greatest(Seq(Least(Seq(Log(w), Literal(700.0))),
          Literal(-700.0)))
        val key = Cast(Round(Multiply(Subtract(Log(UnaryMinus(Log(u))), lnW),
          Literal(1e6)), Literal(0)), LongType)
        val live = And(And(IsNotNull(w), Not(IsNaN(Cast(w, DoubleType)))),
          GreaterThan(w, Literal(0)))
        CaseWhen(Seq(live -> key), None)
      }))

    // graft_cm_buckets(value, depth, width) -> array<struct<row,bucket>>:
    // the per-value probe coordinates of the Count-Min sketch (16-bit
    // slices of ONE md5 digest) — explode + join cnt-table + min(cnt)
    // in plain SQL is exactly Sketches.cmEstimate
    ext.injectFunction((
      new FunctionIdentifier("graft_cm_buckets"),
      new ExpressionInfo(graft.operators.Sketches.getClass.getName, "graft_cm_buckets"),
      (children: Seq[Expression]) => {
        val depth = intArg(children(1), "graft_cm_buckets")
        val width = intArg(children(2), "graft_cm_buckets")
        graft.operators.Sketches.requireCmShape(depth, width)
        val hex = md5hex(children(0))
        CreateArray((0 until depth).map { j =>
          val bucket = Cast(Remainder(hexSlice(hex, 4 * j + 1, 4),
            Literal(width.toLong)), IntegerType)
          CreateNamedStruct(Seq(Literal("row"), Literal(j),
            Literal("bucket"), bucket))
        })
      }))

    // graft_qsketch_lo / graft_qsketch_width (value, subBits): the exact
    // integer base-2 sub-bucket of the quantile sketch — groupBy(lo,
    // width) + count in plain SQL is exactly Sketches.qsketchBuckets
    ext.injectFunction((
      new FunctionIdentifier("graft_qsketch_lo"),
      new ExpressionInfo(
        classOf[graft.functions.SketchExpressions.QsketchLo].getName,
        "graft_qsketch_lo"),
      (children: Seq[Expression]) =>
        graft.functions.SketchExpressions.QsketchLo(children(0),
          intArg(children(1), "graft_qsketch_lo"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_qsketch_width"),
      new ExpressionInfo(
        classOf[graft.functions.SketchExpressions.QsketchWidth].getName,
        "graft_qsketch_width"),
      (children: Seq[Expression]) =>
        graft.functions.SketchExpressions.QsketchWidth(children(0),
          intArg(children(1), "graft_qsketch_width"))))

    // graft_normalize(text) -> string: TextAnalysis.normalizeText as a
    // pure catalyst RegExpReplace/StringTrim chain — the pre-dedup
    // unicode cleanup reachable from SQL (SQL==Column spec'd)
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(graft.operators.TextAnalysis.getClass.getName,
        "graft_normalize"),
      (children: Seq[Expression]) => {
        def rr(e: Expression, pat: String, rep: String): Expression =
          RegExpReplace(e, Literal(pat), Literal(rep))
        val noCtl = rr(children.head,
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
        val noZw = rr(noCtl, "[\\u200B\\u200C\\u200D\\uFEFF]", "")
        val sq = rr(noZw, "[\\u2018\\u2019]", "'")
        val dq = rr(sq, "[\\u201C\\u201D]", "\"")
        val dash = rr(dq, "[\\u2013\\u2014\\u2212]", "-")
        val ell = rr(dash, "\\u2026", "...")
        val nbsp = rr(ell, "\\u00A0", " ")
        StringTrim(rr(nbsp, "[ \\t]+", " "))
      }))

    // graft_bloom_positions(value, mBits, k) -> array<int>: the k
    // double-hashed bit positions of the Bloom filter (Kirsch-
    // Mitzenmacher from ONE digest) — explode + join word-table +
    // all-bits-set in plain SQL is exactly Sketches.bloomContains
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_positions"),
      new ExpressionInfo(graft.operators.Sketches.getClass.getName, "graft_bloom_positions"),
      (children: Seq[Expression]) => {
        val mBits = intArg(children(1), "graft_bloom_positions")
        val k = intArg(children(2), "graft_bloom_positions")
        require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
          s"graft_bloom_positions: mBits must be a power of two >= 64, got $mBits")
        require(k >= 1 && k <= 8, s"graft_bloom_positions: k in [1,8], got $k")
        val hex = md5hex(children(0))
        val h1 = hexSlice(hex, 1, 8)
        val h2 = Add(Multiply(hexSlice(hex, 9, 8), Literal(2L)), Literal(1L))
        CreateArray((0 until k).map(i => Cast(
          Remainder(Add(h1, Multiply(Literal(i.toLong), h2)),
            Literal(mBits.toLong)), IntegerType)))
      }))
  }
}
