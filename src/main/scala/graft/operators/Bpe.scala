package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, the public BPE
  * algorithm every modern LM tokenizer descends from), split Spark-first
  * into the two phases a 100 TB corpus actually needs:
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
  * the boundary fuzz, which perturbs only near-tail pair counts.
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

  /** One learned merge: at `rank` (1-based), adjacent symbol pair
    * (`first`, `second`) — which had weighted frequency `pairCount` at
    * selection time — fuses into `merged`. */
  final case class Merge(rank: Int, first: String, second: String,
                         merged: String, pairCount: Long)

  /** Distributed word-frequency table: one explode + one groupBy.
    * Output cardinality = distinct words, the natural bound a tokenizer
    * fit works from. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
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
    * The merge loop itself mirrors the distributed apply exactly: words
    * are separator-joined symbol strings, and a merge is a literal
    * leftmost non-overlapping `String.replace`. Stops early when no
    * adjacent pair remains (every word fused to one symbol). */
  def train(wordFreq: DataFrame, numMerges: Int,
            maxWords: Int = 1 << 20): Seq[Merge] = {
    val words: Array[(String, Long)] = wordFreq
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWords)
      .select(concat(lit(SS), concat_ws(SS, split(col("word"), "")), lit(SS))
        .as("ws"), col("freq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    var ws = words
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    while (rank <= numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      ws.foreach { case (w, f) =>
        val syms = w.split(Sep + "+").filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) return merges.result()
      var best: ((String, String), Long) = null
      counts.foreach { case (pair, cnt) =>
        if (best == null || cnt > best._2 ||
            (cnt == best._2 && (utf8Lt(pair._1, best._1._1) ||
              (pair._1 == best._1._1 && utf8Lt(pair._2, best._1._2)))))
          best = (pair, cnt)
      }
      val ((a, b), cnt) = best
      merges += Merge(rank, a, b, a + b, cnt)
      val pat = Sep + a + SS + b + Sep
      val rep = Sep + a + b + Sep
      ws = ws.map { case (w, f) => (w.replace(pat, rep), f) }
      rank += 1
    }
    merges.result()
  }

  /** A word as its boundary-separated symbol string after applying every
    * merge in rank order — K chained codegen'd literal `replace`s over
    * the char split (see [[Sep]] for the double-separator boundary that
    * makes the fold symbol-exact). Pure projection; no shuffle, no UDF. */
  def segmented(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(
      concat(lit(SS), concat_ws(SS, split(word, "")), lit(SS))) { (c, m) =>
      replace(c, lit(Sep + m.first + SS + m.second + Sep),
        lit(Sep + m.merged + Sep))
    }

  /** The BPE token pieces of one word. */
  def segments(word: Column, merges: Seq[Merge]): Column =
    array_remove(split(segmented(word, merges), Sep + "+"), "")

  /** How many BPE tokens one word segments into. */
  def segmentCount(word: Column, merges: Seq[Merge]): Column =
    size(segments(word, merges))

  /** Persist a fitted merge table as parquet — the tokenizer artifact a
    * pipeline fits daily/weekly and consumes at every ingest. Staged
    * through a `.tmp` dir and renamed (the boilerplate-dictionary /
    * warehouse publish discipline), so a concurrent consumer never reads
    * a half-written table; the path's own filesystem is resolved from
    * the Hadoop conf (works on hdfs:// / s3a:// too). */
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
    fs.delete(target, true)
    require(fs.rename(tmp, target), s"could not publish BPE merges to $target")
  }

  /** Load a persisted merge table, validating it IS one: ranks must be
    * contiguous from 1 and every `merged` must equal `first + second` —
    * a torn write or a foreign parquet fails fast here, not as silent
    * mis-segmentation at apply time. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    import spark.implicits._
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
    * words joined by a single space. That is exactly equivalent to
    * per-word application: the space is its own symbol, no trained pair
    * ever contains it (training symbols come from inside words), so no
    * merge can cross a word boundary, and `replace`'s left-to-right
    * sweep visits words in order. Total symbols = word pieces +
    * (n_words - 1) space symbols, so the token count falls out by
    * subtraction. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    // == array_join(TextAnalysis.tokens(text), " "), without the filter HOF
    val joined = trim(regexp_replace(col(textCol), "\\s+", " "))
    val nWords = when(joined === "", lit(0L))
      .otherwise(size(split(joined, " ")).cast("long"))
    // symbols n <-> separators 2(n+1): count separators by length
    // difference (translate deletes them) — no array materialization
    val seg = segmented(joined, merges)
    val pieces = shiftright(
      (length(seg) - length(translate(seg, Sep, ""))).cast("long"), 1) - 1L
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      when(joined === "", lit(0L))
        .otherwise(pieces - nWords + lit(1L)).as("n_bpe_tokens"))
  }
}
