package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, the public BPE
  * algorithm every modern LM tokenizer descends from), split Spark-first
  * into the two phases a 100 TB corpus actually needs. Both phases see
  * the corpus through the regex PRETOKENIZER ([[pretokens]]) — the
  * production-BPE front end that splits punctuation off letters and
  * whitespace-free scripts (CJK) per code point, keeping the
  * word-frequency table bounded on any real crawl:
  *
  *  1. FIT — one distributed pass builds the word-frequency table (explode +
  *     one groupBy shuffle, output bounded by the distinct-word count), a
  *     k-capped `TakeOrderedAndProject` keeps the `maxWords` most frequent
  *     words, and the merge loop runs driver-side over that CAPPED table —
  *     the same bounded-collect class as the IVF centroid / PQ codebook
  *     fits: the collect is ≤ `maxWords` rows by construction, never
  *     corpus-sized. (Production BPE trainers — HuggingFace, SentencePiece
  *     in BPE mode — fit on exactly this word-frequency dictionary, not on
  *     the raw corpus.)
  *  2. APPLY — fully distributed and shuffle-free: a word becomes its
  *     character list with DOUBLE-U+001F symbol boundaries (see [[Bpe.Sep]]
  *     for why double — it makes the string fold symbol-exact), and each
  *     learned merge is ONE codegen'd literal `replace` (leftmost,
  *     non-overlapping — the exact greedy semantics of a BPE merge sweep
  *     over a symbol sequence).
  *     K merges = K chained `replace` expressions inside whole-stage
  *     codegen; no UDF, no driver map, works on out-of-vocabulary words by
  *     construction (they just segment further toward characters).
  *
  * Determinism: pair selection is max count, ties broken by UTF-8 byte
  * order on (first, second) — the byte order DuckDB's default binary
  * collation sorts by, so the oracle replays the fit bit-for-bit. The
  * `maxWords` cap orders by (freq DESC, word ASC in Spark's UTF-16 order);
  * if the cap binds on a corpus with non-ASCII words right at the
  * boundary, the kept set can differ from a UTF-8-ordered engine — size
  * the cap above the vocabulary (the default keeps ~1M words) or accept
  * the boundary fuzz, which perturbs only near-tail pair counts. The
  * pretokenizer is what keeps the cap from BINDING in the first place:
  * distinct pretokens track character inventories and real lexicons,
  * not corpus cardinality, even on whitespace-free scripts.
  *
  * Scale: the fit's one shuffle is on the word (distinct-word cardinality,
  * not corpus rows); the apply is a pure projection that pipelines with
  * whatever scan feeds it. Nothing here is quadratic in anything.
  */
object Bpe {

  /** Symbol separator: U+001F (unit separator). Not whitespace (so it
    * survives the `\s+` tokenizer boundary) and vanishingly rare in text.
    *
    * REPRESENTATION — why boundaries are DOUBLE separators. A naive
    * single-separator encoding (`h|e|r` with `|` standing for U+001F,
    * merge (a,b) = replace of `a|b`) is NOT symbol-exact: after merge
    * (e,r) the word "her" is the symbols [h, er], string `h|er` — and
    * the later merge (h,e)'s pattern `h|e` string-matches ACROSS the
    * symbol boundary (e is a proper prefix of the symbol "er"),
    * corrupting the segmentation. Real merge tables hit this class
    * constantly (e learned before er, a before an, ...). Here every
    * boundary is `||` and a merge (a,b) is the replace of `|a||b|`
    * with `|ab|`: a false match would need a separator immediately
    * adjacent to characters INSIDE another symbol — impossible, since
    * symbols contain no separators. The pattern bounds consume only
    * the INNER separator of each `||` boundary, so adjacent
    * occurrences still match back-to-back and the replace remains
    * exactly leftmost-greedy non-overlapping — canonical BPE
    * merge-sweep semantics for arbitrary vocabularies. */
  val Sep = "\u001f"

  /** The double-separator symbol boundary. */
  private[operators] val SS: String = Sep + Sep

  // --- pretokenizer -----------------------------------------------------
  // Production BPE (GPT-2/LLaMA class, public knowledge) never fits on
  // raw whitespace words: a regex pretokenizer splits punctuation off
  // letters ("word." would otherwise be a distinct vocabulary entry per
  // trailing-punct variant) and bounds what a "word" can be in
  // whitespace-free scripts (a CJK sentence is ONE \s+ token — the
  // word-frequency table degenerates toward corpus cardinality with
  // freq≈1 and the maxWords cap silently drops most of the text).
  //
  // Two steps, both expressible identically in Spark (Java regex) and
  // the DuckDB twins (RE2) — cross-engine equality is spec-pinned and
  // gate-checked:
  //  1. PAD: every Han/Hiragana/Katakana code point gets a space on both
  //   sides, so each ideograph/kana is its own pretoken (the BERT-class
  //   CJK handling; Hangul is left alone — Korean is whitespace-
  //   delimited). This is what keeps the distinct-pretoken cardinality
  //   bounded by the script's character inventory instead of the corpus.
  //  2. RUNS: extract letter(+combining-mark) runs, digit runs, and
  //   other-non-space runs as separate pretokens ("v2.0" -> v|2|.|0).
  //   Whitespace is the explicit ASCII class [ \t\n\x0B\f\r] — Java's \s
  //   and RE2's \s disagree on \x0B, so neither engine's shorthand is
  //   used. Unicode spaces (U+00A0, U+3000) intentionally pretokenize as
  //   "other" runs — identical in both engines, and a visible signal.
  //
  // Base symbols stay Unicode CODE POINTS (char-fallback): any character
  // unseen at fit time simply remains its own token — there is no <unk>
  // and nothing is dropped. Byte-level base symbols (GPT-2's bijective
  // byte alphabet) are a declared boundary: the DuckDB twin cannot see
  // inside a VARCHAR's UTF-8 bytes, and code-point fallback loses no
  // text — it only spends vocabulary slots per distinct char instead of
  // per distinct byte.

  /** Script-pad pattern, Java-regex spelling (`\p{IsHan}` == RE2
    * `\p{Han}`: both are Unicode Script=Han). */
  private[operators] val PadPattern =
    "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])"

  /** Pretoken run classes, identical spelling in Java regex and RE2. */
  private[operators] val RunPattern =
    "[\\p{L}\\p{M}]+|\\p{N}+|[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{M}\\p{N}]+"

  /** The pretoken array of one document — ONE native codegen'd pass
    * ([[BpePretokensExpr]]): a single code-point walk classifying into
    * {ASCII whitespace, CJK pad, letter+mark, digit, other} replaces the
    * regex form's two full regex evaluations per row (a measurable CPU
    * term when every ingest tokenizes the whole corpus). Semantics are
    * IDENTICAL to [[pretokensRegex]] — the two-regex spelling both
    * engines share — pinned by spec on adversarial inputs plus a seeded
    * unicode fuzz, and by the `text_bpe_pretokens` gate against the
    * DuckDB twin. */
  def pretokens(text: Column): Column =
    ColumnBridge.column(BpePretokensExpr(ColumnBridge.expression(text)))

  /** The two-regex reference form of [[pretokens]] (translate +
    * regexp_replace + regexp_extract_all) — the spelling the DuckDB
    * twins mirror; kept as the cross-engine semantic definition the
    * native expression answers to. */
  private[graft] def pretokensRegex(text: Column): Column =
    regexp_extract_all(
      regexp_replace(translate(text, Sep, ""), lit(PadPattern), lit(" $1 ")),
      lit(RunPattern), lit(0))

  /** Driver-side reference of [[pretokens]], for specs and tooling —
    * same two regexes through `java.util.regex` directly. */
  private[graft] def pretokenize(s: String): Array[String] = {
    val padded = s.replace(Sep, "").replaceAll(PadPattern, " $1 ")
    val m = java.util.regex.Pattern.compile(RunPattern).matcher(padded)
    val out = Array.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One learned merge: at `rank` (1-based), adjacent symbol pair
    * (`first`, `second`) — which had weighted frequency `pairCount` at
    * selection time — fuses into `merged`. */
  final case class Merge(rank: Int, first: String, second: String,
                         merged: String, pairCount: Long)

  /** Distributed word-frequency table over PRETOKENS ([[pretokens]] —
    * punctuation split off, CJK per code point): one explode + one
    * groupBy. Output cardinality = distinct pretokens, which the
    * pretokenizer keeps bounded even on whitespace-free scripts — the
    * natural bound a tokenizer fit works from. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(pretokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Fit `numMerges` BPE merges from a word-frequency table.
    *
    * The table is capped to the `maxWords` most frequent words via
    * `TakeOrderedAndProject` (k-capped per partition, never a global
    * sort), then collected — a bounded collect of ≤ `maxWords` rows.
    *
    * The merge loop maintains pair counts INCREMENTALLY (the production
    * BPE-trainer shape): an inverted index pair -> word-ids and an
    * ordered selection set keyed on (count DESC, first, second in UTF-8
    * byte order). Each rank touches only the words that actually
    * contain the chosen pair, applying the same leftmost non-overlapping
    * sweep as the distributed apply and pushing count deltas for the
    * pairs that changed — per-rank cost is proportional to the affected
    * words, not the vocabulary, so production merge counts (10k-50k)
    * are O(total merge events), not O(ranks x vocabulary). Selection is
    * bit-identical to a full recount (spec-pinned against a naive
    * reference): max count, ties by UTF-8 byte order on (first, second).
    * Stops early when no adjacent pair remains. */
  def train(wordFreq: DataFrame, numMerges: Int,
            maxWords: Int = 1 << 20): Seq[Merge] = {
    val rows: Array[(String, Long)] = wordFreq
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .select(translate(col("word"), Sep, "").as("w"), col("freq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val syms: Array[Array[String]] = rows.map(r => codePointSplit(r._1))
    val freqs: Array[Long] = rows.map(_._2)

    // pair state: weighted count, word-id postings, ordered selection set
    val counts = new java.util.HashMap[(String, String), java.lang.Long]()
    val postings =
      new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    val order = new java.util.TreeSet[(String, String)](
      new java.util.Comparator[(String, String)] {
        def compare(x: (String, String), y: (String, String)): Int = {
          if (x == y) return 0
          val cx = counts.get(x).longValue()
          val cy = counts.get(y).longValue()
          if (cx != cy) return if (cx > cy) -1 else 1
          if (x._1 != y._1) { if (utf8Lt(x._1, y._1)) -1 else 1 }
          else { if (utf8Lt(x._2, y._2)) -1 else 1 }
        }
      })

    def pairCounts(s: Array[String]): java.util.HashMap[(String, String), java.lang.Long] = {
      val m = new java.util.HashMap[(String, String), java.lang.Long]()
      var i = 0
      while (i < s.length - 1) {
        val k = (s(i), s(i + 1))
        val c = m.get(k)
        m.put(k, if (c == null) 1L else c + 1L)
        i += 1
      }
      m
    }

    // the order set compares through `counts`, so every count mutation
    // must remove the key first and re-insert after — the TreeSet's
    // invariants only hold if a key's ordering never changes in place
    def addCount(pair: (String, String), delta: Long): Unit = {
      if (delta == 0) return
      val cur = counts.get(pair)
      if (cur != null) order.remove(pair)
      val next = (if (cur == null) 0L else cur.longValue()) + delta
      if (next == 0L) { counts.remove(pair); postings.remove(pair) }
      else { counts.put(pair, next); order.add(pair) }
    }

    // initial build: full adjacency counts + postings
    var idx = 0
    while (idx < syms.length) {
      val pc = pairCounts(syms(idx))
      val f = freqs(idx)
      val it = pc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        addCount(e.getKey, e.getValue.longValue() * f)
        var set = postings.get(e.getKey)
        if (set == null) { set = new java.util.HashSet[Integer](); postings.put(e.getKey, set) }
        set.add(idx)
      }
      idx += 1
    }

    val merges = Seq.newBuilder[Merge]
    var rank = 1
    while (rank <= numMerges && !order.isEmpty) {
      val best = order.first()
      val (a, b) = best
      merges += Merge(rank, a, b, a + b, counts.get(best).longValue())
      val affected = postings.get(best)
      val ids = new Array[Int](if (affected == null) 0 else affected.size())
      if (affected != null) {
        val it = affected.iterator(); var i = 0
        while (it.hasNext) { ids(i) = it.next().intValue(); i += 1 }
      }
      var j = 0
      while (j < ids.length) {
        val wi = ids(j)
        val oldSyms = syms(wi)
        val oldPc = pairCounts(oldSyms)
        val newSyms = sweep(oldSyms, a, b)
        val newPc = pairCounts(newSyms)
        val f = freqs(wi)
        // deltas over old ∪ new, postings kept exact both ways
        val oit = oldPc.entrySet().iterator()
        while (oit.hasNext) {
          val e = oit.next()
          val n = newPc.get(e.getKey)
          val d = (if (n == null) 0L else n.longValue()) - e.getValue.longValue()
          addCount(e.getKey, d * f)
          if (n == null) {
            val set = postings.get(e.getKey)
            if (set != null) { set.remove(wi); if (set.isEmpty) postings.remove(e.getKey) }
          }
        }
        val nit = newPc.entrySet().iterator()
        while (nit.hasNext) {
          val e = nit.next()
          if (!oldPc.containsKey(e.getKey)) {
            addCount(e.getKey, e.getValue.longValue() * f)
            var set = postings.get(e.getKey)
            if (set == null) { set = new java.util.HashSet[Integer](); postings.put(e.getKey, set) }
            set.add(wi)
          }
        }
        syms(wi) = newSyms
        j += 1
      }
      rank += 1
    }
    merges.result()
  }

  /** `split(word, "")` semantics driver-side: one element per Unicode
    * code point (Java's regex engine never splits inside a surrogate
    * pair, and neither does Spark's `split`). */
  private[operators] def codePointSplit(s: String): Array[String] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[String](n)
    var i = 0; var k = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      out(k) = s.substring(i, i + cc)
      k += 1; i += cc
    }
    out
  }

  /** One leftmost non-overlapping merge sweep over a symbol array — the
    * exact semantics of the chain's literal `replace`. */
  private[operators] def sweep(s: Array[String], a: String, b: String): Array[String] = {
    val out = new Array[String](s.length)
    var rd = 0; var w = 0
    while (rd < s.length) {
      if (rd < s.length - 1 && s(rd) == a && s(rd + 1) == b) {
        out(w) = a + b; rd += 2
      } else { out(w) = s(rd); rd += 1 }
      w += 1
    }
    if (w == s.length) s else java.util.Arrays.copyOf(out, w)
  }

  /** Merge-count ceiling for the literal replace-chain form of
    * [[segmented]]. K chained replaces make the Catalyst tree K nodes
    * deep: plan transforms recurse per node (a production merge table —
    * 10k-50k — overflows the stack) and the generated code for the
    * projection grows past JIT/codegen method limits. At or below the
    * ceiling the chain wins (each replace is inline codegen'd, zero
    * per-row table lookups); above it [[segmented]] switches to ONE
    * native [[BpeSegmentExpr]] over the compiled merge table — same
    * output bit for bit (spec-pinned at 1k+ merges), still inside
    * whole-stage codegen, O(symbols x successful-sweeps) per row
    * independent of table size. */
  val ChainLimit = 64

  /** A word as its boundary-separated symbol string after applying every
    * merge in rank order (see [[Sep]] for the double-separator boundary
    * that makes the fold symbol-exact). Pure projection; no shuffle, no
    * UDF. U+001F is the INTERNAL symbol separator, so it is stripped
    * from the input first — a crawl document carrying the control char
    * would otherwise corrupt the separator arithmetic (the oracle twins
    * mirror the strip). At or below [[ChainLimit]] merges this is K
    * chained codegen'd literal `replace`s; above it, one native
    * expression with identical semantics. */
  def segmented(word: Column, merges: Seq[Merge]): Column =
    if (merges.size <= ChainLimit) segmentedChain(word, merges)
    else segmentedNative(word, merges)

  /** The literal replace-chain form (small tables; inline codegen). */
  private[graft] def segmentedChain(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(
      concat(lit(SS),
        concat_ws(SS, split(translate(word, Sep, ""), "")), lit(SS))) { (c, m) =>
      replace(c, lit(Sep + m.first + SS + m.second + Sep),
        lit(Sep + m.merged + Sep))
    }

  /** The compiled-table form (production vocabularies; one expression). */
  private[graft] def segmentedNative(word: Column, merges: Seq[Merge]): Column =
    ColumnBridge.column(BpeSegmentExpr(ColumnBridge.expression(word),
      BpeMergeTable(merges)))

  /** The BPE token pieces of one word. */
  def segments(word: Column, merges: Seq[Merge]): Column =
    array_remove(split(segmented(word, merges), Sep + "+"), "")

  /** How many BPE tokens one word segments into. */
  def segmentCount(word: Column, merges: Seq[Merge]): Column =
    size(segments(word, merges))

  /** Persist a fitted merge table as parquet — the tokenizer artifact a
    * pipeline fits daily/weekly and consumes at every ingest. Staged
    * through a `.tmp` dir, then park-and-swapped over the target
    * ([[graft.core.Publish.swapArtifact]]): a consumer never reads a
    * half-written table and a crash mid-publish never loses the
    * previous one ([[load]] rolls the parked copy back); the path's own
    * filesystem is resolved from the Hadoop conf (works on hdfs:// /
    * s3a:// too). */
  def save(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
           path: String): Unit = {
    require(merges.nonEmpty, "refusing to persist an empty merge table")
    import spark.implicits._
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    // merge tables are K rows — one file, no point sharding
    merges.toDF().repartition(1).write.mode("overwrite").parquet(tmp.toString)
    // park-and-swap: the previous artifact survives a crash mid-publish
    graft.core.Publish.swapArtifact(fs, tmp, target)
  }

  /** Load a persisted merge table, validating it IS one: ranks must be
    * contiguous from 1 and every `merged` must equal `first + second` —
    * a torn write or a foreign parquet fails fast here, not as silent
    * mis-segmentation at apply time. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    import spark.implicits._
    val target = new org.apache.hadoop.fs.Path(path)
    // loader-side: retry through a publisher's mid-swap window instead
    // of mutating (healing here could race an in-flight swapArtifact)
    graft.core.Publish.awaitArtifact(
      target.getFileSystem(spark.sparkContext.hadoopConfiguration), target)
    val m = spark.read.parquet(path).as[Merge].collect().sortBy(_.rank).toSeq
    require(m.nonEmpty, s"empty BPE merge table at $path")
    m.zipWithIndex.foreach { case (mg, i) =>
      require(mg.rank == i + 1,
        s"non-contiguous merge ranks in $path: saw ${mg.rank} at position ${i + 1}")
      require(mg.merged == mg.first + mg.second,
        s"corrupt merge row ${mg.rank} in $path: " +
          s"'${mg.merged}' != '${mg.first}'+'${mg.second}'")
    }
    m
  }

  /** The token vocabulary a fitted tokenizer ships: every BPE piece the
    * corpus segments into, with its weighted occurrence count. Computed
    * from the word-frequency table, NOT the corpus — segmenting each
    * DISTINCT word once and weighting by its frequency is exactly the
    * corpus-wide count at distinct-word cost (two bounded shuffles:
    * the word groupBy upstream, the token groupBy here). */
  def vocabulary(wordFreq: DataFrame, merges: Seq[Merge]): DataFrame =
    wordFreq
      .select(explode(segments(col("word"), merges)).as("token"), col("freq"))
      .groupBy("token")
      .agg(sum(col("freq")).cast("long").as("n_occurrences"))

  /** Per-document true BPE token count under a learned merge table,
    * replacing the chars/4 estimate with the real number a data-loader
    * budget needs. Shuffle-free, HOF-free, fully whole-stage-codegen'd:
    *
    * instead of a per-word `transform`+`aggregate` (higher-order folds
    * are CodegenFallback — they'd kick the whole projection out of
    * codegen), the merge chain runs ONCE over the whole document with
    * PRETOKENS ([[pretokens]]) joined by a single space. That is exactly
    * equivalent to per-pretoken application: the space is its own
    * symbol, no trained pair ever contains it (training symbols come
    * from inside pretokens, which never contain ASCII space), so no
    * merge can cross a pretoken boundary, and `replace`'s left-to-right
    * sweep visits pretokens in order. Total symbols = pieces +
    * (n_words - 1) space symbols, so the token count falls out by
    * subtraction. (`n_words` is the PRETOKEN count — punctuation and
    * per-ideograph CJK pretokens each count one.) */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame =
    tokenCountsWith(docs, idCol, textCol, merges, segmented)

  /** [[tokenCounts]] with `passThrough` columns riding the same scan —
    * see [[tokenCountsWith]] for why callers aggregating by a document
    * column should use this instead of joining the corpus back. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge], passThrough: Seq[String]): DataFrame =
    tokenCountsWith(docs, idCol, textCol, merges, segmented, passThrough)

  /** [[tokenCounts]] forced through the native segmenter regardless of
    * table size — the gate uses it to hash-check [[BpeSegmentExpr]]
    * against the same DuckDB oracle the chain form answers to. */
  private[graft] def tokenCountsNative(docs: DataFrame, idCol: String,
                                       textCol: String,
                                       merges: Seq[Merge]): DataFrame =
    tokenCountsWith(docs, idCol, textCol, merges, segmentedNative)

  /** `passThrough` columns of `docs` ride the projection unchanged, so a
    * caller aggregating token counts BY one of the document's own
    * columns (language, source) gets them in the same single scan
    * instead of re-scanning the corpus and joining back on the id — at
    * 100 TB the second scan and the corpus-keyed join are real money. */
  private[graft] def tokenCountsWith(docs: DataFrame, idCol: String,
                              textCol: String,
                              merges: Seq[Merge],
                              seg: (Column, Seq[Merge]) => Column,
                              passThrough: Seq[String] = Nil,
                              encodeBase: Column => Column =
                                identity): DataFrame = {
    val pre = docs.select(
      col(idCol) +: passThrough.map(col) :+
        pretokens(col(textCol)).as("__pts"): _*)
    val joined = array_join(col("__pts"), " ")
    val nWords = when(joined === "", lit(0L))
      .otherwise(size(col("__pts")).cast("long"))
    // symbols n <-> separators 2(n+1): count separators by length
    // difference (translate deletes them) — no array materialization
    val segCol = seg(encodeBase(joined), merges)
    val pieces = shiftright(
      (length(segCol) - length(translate(segCol, Sep, ""))).cast("long"), 1) - 1L
    pre.select(
      col(idCol) +: passThrough.map(col) :+
        nWords.as("n_words") :+
        when(joined === "", lit(0L))
          .otherwise(pieces - nWords + lit(1L)).as("n_bpe_tokens"): _*)
  }

  // --- byte-level base encoding (GPT-2 class) ---------------------------
  // Production byte-level tokenizers (GPT-2/LLaMA class — public
  // knowledge) do not fall back to code points: they remap every UTF-8
  // BYTE of the input through a fixed bijection into 256 printable
  // unicode chars, so ANY input — unassigned code points, emoji ZWJ
  // sequences, mixed-encoding garbage from a real crawl — round-trips
  // through a 256-symbol floor vocabulary. The char-fallback base
  // instead spends a vocabulary slot per distinct code point (each ZWJ
  // emoji member its own symbol). A second win: the encoded alphabet
  // contains no combining marks, joiners or separators, so every
  // char-vs-grapheme and U+001F edge case vanishes on the encoded side.

  /** The GPT-2 byte -> unicode bijection: printable ASCII and Latin-1
    * bytes map to their own code points; the remaining 68 bytes map to
    * 256+n in ascending byte order. All images are BMP, single UTF-16
    * units, category L/S/P — never whitespace, marks, or U+001F. */
  private[graft] val ByteToChar: Array[Int] = {
    val self = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Int](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (self(b)) out(b) = b
      else { out(b) = 256 + n; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse map, indexed by code point (-1 = not in the image). */
  private[graft] val CharToByte: Array[Int] = {
    val out = Array.fill(ByteToChar.max + 1)(-1)
    var b = 0
    while (b < 256) { out(ByteToChar(b)) = b; b += 1 }
    out
  }

  /** Remap every UTF-8 byte of `text` through [[ByteToChar]] — the
    * byte-level BASE for the whole BPE family: fit on
    * [[wordFrequenciesBytes]], count with [[tokenCountsBytes]]. One
    * native codegen'd pass ([[BpeByteEncodeExpr]]). */
  def byteEncode(text: Column): Column =
    ColumnBridge.column(BpeByteEncodeExpr(ColumnBridge.expression(text)))

  /** Exact inverse of [[byteEncode]]: null when a code point is outside
    * the bijection's image (i.e. the input was never an encode output).
    * `byteDecode(byteEncode(x)) == x` for every string, spec-pinned and
    * gate-replayed — the round-trip guarantee the byte base exists for. */
  def byteDecode(text: Column): Column =
    ColumnBridge.column(BpeByteDecodeExpr(ColumnBridge.expression(text)))

  /** [[wordFrequencies]] with byte-level base symbols: the bijection is
    * applied AFTER the frequency groupBy (per distinct pretoken, not per
    * corpus row — frequencies are unchanged under a bijection), so the
    * byte base costs one narrow projection over the word table. Feed the
    * result to [[train]] unchanged: encoded chars are ordinary single
    * code points, so the trainer, the replace chain and the native
    * segmenter all work on byte symbols as-is. */
  def wordFrequenciesBytes(docs: DataFrame, textCol: String): DataFrame =
    wordFrequencies(docs, textCol)
      .withColumn("word", byteEncode(col("word")))

  /** [[tokenCounts]] under the byte-level base: pretokens join on a raw
    * space and the WHOLE document encodes once (byte 0x20 maps to
    * chr(288), which no trained symbol can contain — training pretokens
    * never hold a space byte — so merges still cannot cross pretoken
    * boundaries and the pieces arithmetic is unchanged). */
  def tokenCountsBytes(docs: DataFrame, idCol: String, textCol: String,
                       merges: Seq[Merge],
                       passThrough: Seq[String] = Nil): DataFrame =
    tokenCountsWith(docs, idCol, textCol, merges, segmented, passThrough,
      byteEncode)
}

/** A fitted merge table compiled for the native segmenter: rank-indexed
  * pair arrays plus a pair -> rank hash. Serializable (ships in the
  * task closure / codegen reference array once per partition, not per
  * row); the lookup map rebuilds lazily on the executor. */
final class BpeMergeTable private (val firsts: Array[String],
                                   val seconds: Array[String])
    extends Serializable {

  // Two-level pair -> ranks lookup: probing with the two symbol strings
  // directly avoids allocating a concatenated key per adjacent pair per
  // sweep scan — the scan is the segmenter's hot loop (documents x
  // symbols x sweeps probes at corpus scale). The value is the ASCENDING
  // rank LIST for the pair, not a single rank: a hand-built table may
  // repeat a (first, second) pair at a later rank, and the chain's later
  // replace DOES fire on occurrences created in between (an intermediate
  // merge can fuse to a string equal to `first` or `second`) — the scan
  // picks the smallest listed rank >= cursor, exactly the next chain
  // sweep that would see the pair. Trained tables never repeat a pair
  // (a swept pair cannot reappear), so the lists are length 1 there.
  @transient private lazy val rankOf
      : java.util.HashMap[String, java.util.HashMap[String, Array[Int]]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Array[Int]]]()
    var i = 0
    while (i < firsts.length) {
      var inner = m.get(firsts(i))
      if (inner == null) {
        inner = new java.util.HashMap[String, Array[Int]]()
        m.put(firsts(i), inner)
      }
      val cur = inner.get(seconds(i))
      inner.put(seconds(i),
        if (cur == null) Array(i + 1) else cur :+ (i + 1)) // ascending by construction
      i += 1
    }
    m
  }

  def size: Int = firsts.length

  /** Segment `text` into the SAME double-separator symbol string as the
    * replace-chain fold, bit for bit (U+001F code points are skipped —
    * the chain strips them up front).
    *
    * Replicates the chain's semantics exactly with a monotonic rank
    * cursor: repeatedly find the LOWEST rank >= cursor whose pair is
    * adjacent somewhere, run that rank's single leftmost non-overlapping
    * sweep, and advance the cursor past it. Equivalence to the chain,
    * rank by rank: ranks between the cursor and the chosen one were
    * absent when scanned, so their chain sweeps are no-ops; a sweep
    * never recreates ITS OWN pair (that would need `first+second` to
    * equal `first` or `second` — impossible for non-empty symbols), so
    * one sweep == the chain's one `replace`; and a new occurrence of an
    * already-passed EARLIER rank (possible when two merge paths fuse to
    * equal strings) is skipped by the cursor exactly as the chain skips
    * it — that rank's replace already ran. Cost: O(symbols) per
    * successful sweep, at most symbols-1 sweeps, independent of table
    * size. */
  def segment(text: UTF8String): UTF8String = {
    if (text == null) return null
    val s = text.toString
    // split(word, "") semantics: one symbol per code point, Sep skipped
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp != 0x1f) n += 1
      i += Character.charCount(cp)
    }
    var syms = new Array[String](n)
    i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      if (cp != 0x1f) { syms(k) = s.substring(i, i + cc); k += 1 }
      i += cc
    }
    var len = n
    var cursor = 1
    var scanning = len >= 2 && firsts.length > 0
    while (scanning) {
      var best = Int.MaxValue
      var bi = 0
      while (bi < len - 1) {
        val inner = rankOf.get(syms(bi))
        if (inner != null) {
          val ranks = inner.get(syms(bi + 1))
          if (ranks != null) {
            // smallest listed rank >= cursor (lists are length 1 for
            // trained tables; linear scan beats binary search here)
            var j = 0
            while (j < ranks.length && ranks(j) < cursor) j += 1
            if (j < ranks.length && ranks(j) < best) best = ranks(j)
          }
        }
        bi += 1
      }
      if (best == Int.MaxValue) scanning = false
      else {
        val a = firsts(best - 1)
        val b = seconds(best - 1)
        var rd = 0; var w = 0
        while (rd < len) {
          if (rd < len - 1 && syms(rd) == a && syms(rd + 1) == b) {
            syms(w) = a + b; rd += 2
          } else { syms(w) = syms(rd); rd += 1 }
          w += 1
        }
        len = w
        cursor = best + 1
        if (len < 2) scanning = false
      }
    }
    val sb = new java.lang.StringBuilder(s.length * 3 + 4)
    sb.append(Bpe.SS)
    var t = 0
    while (t < len) {
      sb.append(syms(t))
      sb.append(Bpe.SS)
      t += 1
    }
    // the chain's `split("", "")` yields one empty symbol, so an empty
    // input is SS + "" + SS — two boundaries, not one
    if (len == 0) sb.append(Bpe.SS)
    UTF8String.fromString(sb.toString)
  }
}

object BpeMergeTable {
  def apply(merges: Seq[Bpe.Merge]): BpeMergeTable = {
    val sorted = merges.sortBy(_.rank)
    sorted.zipWithIndex.foreach { case (m, i) =>
      require(m.rank == i + 1,
        s"merge ranks must be contiguous from 1; saw ${m.rank} at ${i + 1}")
    }
    new BpeMergeTable(sorted.map(_.first).toArray, sorted.map(_.second).toArray)
  }
}

/** The single-pass pretokenizer behind [[BpePretokensExpr]] — a
  * stateless, serializable runner (ships once in the codegen reference
  * array, like [[BpeMergeTable]]).
  *
  * Exact equivalence to the two-regex form, class by class (every code
  * point holds exactly ONE Unicode general category, so the run classes
  * partition the non-whitespace space and the regex alternation order
  * never matters):
  *  - U+001F is SKIPPED without breaking the current run — the regex
  *    form `translate`s it away BEFORE matching, so "ab&#31;cd" is one
  *    run there too;
  *  - the ASCII whitespace set is the regex form's explicit class;
  *  - a Han/Hiragana/Katakana code point closes the current run and
  *    emits alone — exactly what the pad regex's inserted spaces do
  *    (`UnicodeScript.of` is the same script property `\p{IsHan}`
  *    matches);
  *  - letter+mark runs are categories Lu/Ll/Lt/Lm/Lo/Mn/Me/Mc
  *    (== `[\p{L}\p{M}]`), digit runs Nd/Nl/No (== `\p{N}`), and
  *    everything else — including non-ASCII whitespace — is an "other"
  *    run (== the negated class). */
final class BpePretokenRunner extends Serializable {
  import java.lang.Character._

  private def runClass(cp: Int): Int = getType(cp) match {
    case UPPERCASE_LETTER | LOWERCASE_LETTER | TITLECASE_LETTER |
         MODIFIER_LETTER | OTHER_LETTER |
         NON_SPACING_MARK | ENCLOSING_MARK | COMBINING_SPACING_MARK => 1
    case DECIMAL_DIGIT_NUMBER | LETTER_NUMBER | OTHER_NUMBER => 2
    case _ => 3
  }

  private def isCjk(cp: Int): Boolean = {
    val s = UnicodeScript.of(cp)
    s == UnicodeScript.HAN || s == UnicodeScript.HIRAGANA ||
      s == UnicodeScript.KATAKANA
  }

  def pretokens(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    val run = new java.lang.StringBuilder(32)
    var runCls = 0 // 0 = no open run
    def close(): Unit = if (runCls != 0) {
      out.add(UTF8String.fromString(run.toString))
      run.setLength(0); runCls = 0
    }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = charCount(cp)
      if (cp == 0x1f) { /* stripped: run continues through it */ }
      else if (cp == 0x20 || cp == 0x09 || cp == 0x0a || cp == 0x0b ||
               cp == 0x0c || cp == 0x0d) close()
      else if (isCjk(cp)) {
        close()
        out.add(UTF8String.fromString(s.substring(i, i + cc)))
      } else {
        val c = runClass(cp)
        if (c != runCls) { close(); runCls = c }
        run.append(s, i, i + cc)
      }
      i += cc
    }
    close()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[UTF8String](out.size())))
  }
}

/** bpe_pretokens(text): StringType -> array<string>, one native pass;
  * stays inside WholeStageCodegen like [[BpeSegmentExpr]]. */
case class BpePretokensExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  private val runner = new BpePretokenRunner
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(t: Any): Any =
    runner.pretokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pretokenRunner", runner,
      classOf[BpePretokenRunner].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pretokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The byte <-> unicode codec behind [[BpeByteEncodeExpr]] /
  * [[BpeByteDecodeExpr]] — stateless, serializable, ships once in the
  * codegen reference array like [[BpePretokenRunner]]. */
final class BpeByteCodec extends Serializable {
  /** Every UTF-8 byte of `t` as its [[Bpe.ByteToChar]] image — output
    * length in chars == input length in bytes, all images BMP. */
  def encode(t: UTF8String): UTF8String = {
    val bytes = t.getBytes
    val sb = new java.lang.StringBuilder(bytes.length + (bytes.length >> 2))
    var i = 0
    while (i < bytes.length) {
      sb.appendCodePoint(Bpe.ByteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Inverse: null when any code point is outside the bijection's image
    * (the input was not an [[encode]] output). The reassembled bytes are
    * returned verbatim — on a genuine encode image they are the original
    * string's exact UTF-8. */
  def decode(t: UTF8String): UTF8String = {
    val s = t.toString
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= Bpe.CharToByte.length || Bpe.CharToByte(cp) < 0) return null
      out.write(Bpe.CharToByte(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** bpe_byte_encode(text): the GPT-2 byte-base remap as one codegen'd
  * native pass. */
case class BpeByteEncodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  private val codec = new BpeByteCodec
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(t: Any): Any =
    codec.encode(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteCodec", codec,
      classOf[BpeByteCodec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bpe_byte_decode(text): exact inverse of [[BpeByteEncodeExpr]]; null
  * on inputs outside the bijection's image. */
case class BpeByteDecodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  private val codec = new BpeByteCodec
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(t: Any): Any =
    codec.decode(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteCodec", codec,
      classOf[BpeByteCodec].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.decode($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bpe_segment(text): StringType -> StringType over a compiled merge
  * table; stays inside WholeStageCodegen (the generated code is one call
  * into the broadcast-once reference object, like [[graft.functions
  * .TextHash.SimHash64]]). */
case class BpeSegmentExpr(child: Expression, table: BpeMergeTable)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // non-string input fails at ANALYSIS, not as a runtime
  // ClassCastException (the result type is inferred — AbstractDataType
  // is private[sql] and cannot be named here)
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(t: Any): Any =
    table.segment(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
