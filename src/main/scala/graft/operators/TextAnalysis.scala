package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * language ID (stopword n-gram heuristic), quality scoring, document
  * fingerprinting. All pure Column expressions — codegen'd, shuffle-free,
  * linear scans at 100 TB.
  *
  * Determinism matters more than linguistic accuracy here: every scoring
  * rule is an explicit arithmetic formula mirrored 1:1 in the DuckDB
  * oracle SQL.
  */
object TextAnalysis {

  /** Whitespace tokenization (empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish length estimate: ~4 chars/token (public rule of thumb). */
  def estBpeTokens(nChars: Column): Column = ceil(nChars.cast("double") / 4.0).cast("long")

  /** Stopword tables per language for the lang-ID heuristic. */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "den"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "los", "que", "un", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Per-language stopword hit counts — one filter pass per language over a
    * token array the CALLER has already projected into its own column.
    * Materialize these as columns (see [[withLangId]]) before the argmax:
    * the array-filter lambdas are interpreted, so each must run exactly
    * once per row, not once per argmax comparison. */
  def langScores(toks: Column): Seq[(String, Column)] =
    StopwordsByLang.map { case (lang, words) => lang -> stopwordHits(toks, words) }

  /** Argmax over already-materialized per-language score columns, ties
    * broken by language code ascending (the order of StopwordsByLang). */
  def argmaxLang(scores: Seq[(String, Column)]): Column =
    scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, score)) =>
      val beats = scores.map { case (l2, s2) =>
        if (l2 < lang) score > s2 // later lang must strictly beat earlier ones
        else if (l2 > lang) score >= s2
        else lit(true)
      }.reduce(_ && _)
      when(acc.isNull && beats, lit(lang)).otherwise(acc)
    }

  /** Language ID over a whole frame: tokens -> 5 hit counts -> argmax, in
    * three projection layers so every interpreted lambda runs once per row.
    * (CollapseProject keeps the layers apart: the aliases are non-cheap and
    * multiply referenced.) */
  def withLangId(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val passthrough = df.columns.map(col).toSeq
    val scored = df
      .withColumn("__toks", tokens(col(textCol)))
      .select(passthrough ++ langScores(col("__toks")).map {
        case (l, c) => c.as(s"__s_$l")
      }: _*)
    scored
      .withColumn(outCol, argmaxLang(
        StopwordsByLang.map { case (l, _) => l -> col(s"__s_$l") }))
      .select(passthrough :+ col(outCol): _*)
  }

  /** Single-Column form of the lang-ID heuristic — convenient for ad-hoc
    * expressions, but it re-derives the scores inside every comparison;
    * anything per-row-hot should use [[withLangId]]. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    argmaxLang(langScores(toks))
  }

  /** Quality score in [0,1]: length component + stopword-density component
    * - punctuation-noise component, clamped. */
  def qualityScore(text: Column, nChars: Column): Column =
    qualityScoreFromTokens(tokens(text), text, nChars)

  /** Same, with the token array precomputed once by the caller (the
    * array-lambda ops are interpreted, so share them across features). */
  def qualityScoreFromTokens(toks: Column, text: Column, nChars: Column): Column = {
    val nToks = size(toks).cast("double")
    val enHits = stopwordHits(toks, StopwordsByLang.toMap.apply("en")).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    val lengthComp = least(nToks / 100.0, lit(1.0)) * 0.5
    qualityFormula(lengthComp, enHits, nToks, punct, nChars)
  }

  private def qualityFormula(lengthComp: Column, enHits: Column, nToks: Column,
                             punct: Column, nChars: Column): Column = {
    val stopComp = least(enHits / greatest(nToks, lit(1.0)) * 4.0, lit(1.0)) * 0.5
    val punctPenalty = least(punct / greatest(nChars.cast("double"), lit(1.0)) * 2.0, lit(0.5))
    greatest(lengthComp + stopComp - punctPenalty, lit(0.0))
  }

  /** Gopher-style quality-filter FLAGS (Rae et al. 2021 §A1.1 "repetition
    * and quality heuristics", the rule set every large-scale text pipeline
    * reimplements): per-document rule columns plus the conjunction. All
    * ratios derive from integer counts (exact in any engine) and round to
    * 4 dp BEFORE thresholding, so the flags reproduce bit-identically in
    * the DuckDB oracle. One projection pass over a shared token array —
    * no shuffle, composes with any other per-doc signal.
    *
    * Rules (thresholds scaled to the synthetic corpus's short docs; the
    * published bounds are minWords=50/maxWords=100k, meanWordLen in
    * [3,10], symbolRatio<0.1, alphaFrac>0.8, stopFrac>=0.06):
    * returns (idCol passthrough..., n_words, mean_word_len, symbol_ratio,
    * alpha_frac, stopword_frac, passes). */
  def gopherFlags(df: DataFrame, textCol: String,
                  minWords: Long = 10, maxWords: Long = 100000,
                  minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                  minStopFrac: Double = 0.0): DataFrame = {
    val passthrough = df.columns.map(col).toSeq
    // layer 1: token array once; layer 2: integer counts off it; layer 3:
    // exact ratios + flags (interpreted array lambdas run once per row)
    val counted = df
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__charsum",
        aggregate(transform(col("__toks"), t => length(t)), lit(0L),
          (acc, v) => acc + v))
      .withColumn("__alpha",
        size(filter(col("__toks"), t => t.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("__stop",
        stopwordHits(col("__toks"), StopwordsByLang.toMap.apply("en")).cast("long"))
      .withColumn("__sym",
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "[#@~^|\\\\]", ""))).cast("long"))
    val nW = col("n_words")
    counted
      .withColumn("n_words", col("__n"))
      .withColumn("mean_word_len",
        round(col("__charsum").cast("double") / greatest(nW, lit(1L)), 4))
      .withColumn("symbol_ratio",
        round(col("__sym").cast("double") / greatest(nW, lit(1L)), 4))
      .withColumn("alpha_frac",
        round(col("__alpha").cast("double") / greatest(nW, lit(1L)), 4))
      .withColumn("stopword_frac",
        round(col("__stop").cast("double") / greatest(nW, lit(1L)), 4))
      .withColumn("passes",
        nW >= minWords && nW <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("alpha_frac") >= minAlphaFrac &&
          col("stopword_frac") >= minStopFrac)
      .select(passthrough ++ Seq(col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("alpha_frac"), col("stopword_frac"),
        col("passes")): _*)
  }

  /** C4/RefinedWeb-style LINE-level quality flags (Raffel et al. 2020
    * §2.2 — the other canonical web-cleaning rule set beside
    * [[gopherFlags]]'s document-level Gopher rules; every modern corpus
    * build runs both): pages split into non-empty trimmed lines, then
    *
    *  - `terminal_line_frac` — share of lines ending in terminal
    *    punctuation (C4 keeps only such lines);
    *  - `short_line_frac` — share of lines under `shortLineWords` words
    *    (C4 drops pages made of fragments);
    *  - `has_curly` — any `{` on the page (C4's code-page drop);
    *  - `has_lorem` — case-insensitive "lorem ipsum" (placeholder text);
    *  - `n_js_lines` — lines mentioning "javascript" (C4 drops them);
    *
    * plus the conjunction `passes`. All ratios derive from integer line
    * counts and round to 4 dp BEFORE thresholding, so the flags reproduce
    * bit-identically in the DuckDB oracle. One projection pass — the line
    * array is computed once per row; no explode, no shuffle, composes
    * with any other per-doc signal at 100 TB. */
  def c4Flags(df: DataFrame, textCol: String,
              minLines: Long = 1, minTerminalFrac: Double = 0.0,
              maxShortFrac: Double = 1.0,
              shortLineWords: Int = 3): DataFrame = {
    require(shortLineWords >= 1, s"shortLineWords >= 1, got $shortLineWords")
    val passthrough = df.columns.map(col).toSeq
    val nL = col("n_lines")
    df
      .withColumn("__lines",
        filter(transform(split(col(textCol), "\n"), l => trim(l)),
          l => length(l) > 0))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("__term",
        size(filter(col("__lines"), l => l.rlike("[.!?\"']$"))).cast("long"))
      .withColumn("__short",
        size(filter(col("__lines"),
          l => size(tokens(l)) < shortLineWords)).cast("long"))
      .withColumn("terminal_line_frac",
        round(col("__term").cast("double") / greatest(nL, lit(1L)), 4))
      .withColumn("short_line_frac",
        round(col("__short").cast("double") / greatest(nL, lit(1L)), 4))
      .withColumn("has_curly", col(textCol).contains("{"))
      .withColumn("has_lorem", lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("n_js_lines",
        size(filter(col("__lines"),
          l => lower(l).contains("javascript"))).cast("long"))
      .withColumn("passes",
        nL >= minLines &&
          col("terminal_line_frac") >= minTerminalFrac &&
          col("short_line_frac") <= maxShortFrac &&
          !col("has_curly") && !col("has_lorem") && col("n_js_lines") === 0L)
      .select(passthrough ++ Seq(nL, col("terminal_line_frac"),
        col("short_line_frac"), col("has_curly"), col("has_lorem"),
        col("n_js_lines"), col("passes")): _*)
  }

  /** Corpus-level boilerplate LINE removal — the CCNet/RefinedWeb recipe
    * (C4 §2.2's cross-document span dedup at line granularity): a line
    * whose whitespace-normalized lowercased form appears in at least
    * `minDocFreq` DISTINCT documents is boilerplate (cookie banners,
    * navigation menus, license footers) and EVERY occurrence is dropped;
    * blank lines never count. Returns one row per input doc:
    * (idCol, clean_text — surviving lines rejoined in original order,
    * kept_lines, dropped_lines).
    *
    * 100 TB shape: two corpus passes over the exploded lines (the
    * distinct-doc frequency aggregate — map-side-combinable countDistinct,
    * a hot banner line is one big group but never one task's sort — and
    * the anti-join + per-doc reassembly, whose collect_list is bounded by
    * a single document's line count). The boilerplate dictionary is the
    * join's build side — tiny relative to the corpus, AQE broadcasts it.
    * total_lines comes from size(split(...)) on the doc row, not a third
    * explode. Deterministic and engine-replayable end-to-end. */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                             minDocFreq: Long): DataFrame =
    applyBoilerplateDictionary(docs, idCol, textCol,
      boilerplateDictionary(docs, idCol, textCol, minDocFreq))

  /** The boilerplate DICTIONARY alone — (line_norm) rows for every
    * normalized line in >= minDocFreq distinct docs. Built batch-side
    * (daily, over the corpus) and persisted; the at-ingest path applies
    * it per batch or per micro-batch without re-counting the corpus —
    * the same build/consume split as the dedup ledger. */
  def boilerplateDictionary(docs: DataFrame, idCol: String, textCol: String,
                            minDocFreq: Long): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    docs
      .select(col(idCol),
        explode(split(col(textCol), "\n")).as("line"))
      .select(col(idCol), lower(trim(col("line"))).as("line_norm"))
      .filter(length(col("line_norm")) > 0)
      .groupBy(col("line_norm"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocFreq)
      .select(col("line_norm"))
  }

  /** Apply a (line_norm) boilerplate dictionary: drop every matching
    * line, rejoin survivors in order — the consume half of
    * [[removeBoilerplateLines]], usable against a PERSISTED dictionary
    * and on streams (stateless given the dictionary; see the streaming
    * twin spec). */
  def applyBoilerplateDictionary(docs: DataFrame, idCol: String,
                                 textCol: String, dict: DataFrame): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
      .withColumn("line_norm", lower(trim(col("line"))))
    val kept = lines
      .join(dict.select(col("line_norm")), Seq("line_norm"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("kept_lines"))
    docs
      .select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("__total"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        (col("__total") - coalesce(col("kept_lines"), lit(0L)))
          .as("dropped_lines"))
  }

  /** Hashed-bag-of-words linear classifier INFERENCE — the fastText-
    * shaped scoring pass every production quality/toxicity filter runs
    * at corpus scale: each token hashes into a D-bucket weight table
    * (hashing trick; md5 32-bit prefix mod D) and the document's logit
    * is bias + the sum of its tokens' bucket weights, accumulated in
    * token order and rounded to 6 dp. The weight table arrives as a
    * driver array and enters the plan as ONE literal — no join, no
    * shuffle, no UDF: the whole scorer is a codegen'd higher-order fold
    * per row, composing with any corpus scan for free. Emits the raw
    * LOGIT (monotone in the probability; applying a sigmoid would pin
    * the gate to libm exp ulps — thresholds belong on the logit). */
  def hashedLinearScore(df: DataFrame, textCol: String,
                        weights: Array[Double], bias: Double,
                        outCol: String = "logit"): DataFrame = {
    require(weights.nonEmpty && weights.length <= 65536,
      s"weight table must have 1..65536 buckets, got ${weights.length}")
    val d = weights.length
    val wArr = array(weights.map(lit): _*)
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn(outCol, round(aggregate(col("__toks"), lit(bias),
        (acc, t) => acc + element_at(wArr,
          (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % d + 1)
            .cast("int"))), 6))
      .drop("__toks")
  }

  /** TRAIN the hashed linear quality filter in-engine — the fit half of
    * [[hashedLinearScore]]: full-batch gradient descent on SQUARED loss
    * over per-document bucket-fraction features (each token contributes
    * 1/n_tokens to its md5 bucket — features have bounded norm, so a
    * fixed small learning rate converges instead of oscillating on hot
    * buckets). No libm exp anywhere, matching the scorer's logit-only
    * discipline.
    *
    * Per iteration: ONE pass computes per-doc residuals (the same
    * codegen'd literal-weight fold the scorer uses) and the per-bucket
    * gradient (explode + groupBy over a d-sized domain, map-side
    * combined); only d gradient rows reach the driver. The corpus is
    * bucketed ONCE up front (ints, not text) and persisted across the
    * T iterations.
    *
    * Engine portability (the k-means discipline): residuals and
    * per-bucket gradient sums round to 6 dp each iteration — partition-
    * order float noise (~1e-15 relative) vanishes at the grid, so an
    * independent SQL engine replays the fit hash-exactly; the weight
    * update itself uses HALF_UP, the rounding `round()` applies in both
    * engines. */
  def trainHashedLinear(df: DataFrame, textCol: String, labelCol: String,
                        d: Int, lr: Double, iters: Int): Array[Double] = {
    require(d >= 1 && d <= 65536, s"bucket count must be 1..65536, got $d")
    require(iters >= 1, "need at least one iteration")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bucketOf = (t: Column) =>
      (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % d).cast("int")
    val base = df
      .select(transform(tokens(col(textCol)), t => bucketOf(t)).as("__bks"),
        col(labelCol).cast("double").as("__y"))
      .withColumn("__n", size(col("__bks")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = Array.fill(d)(0.0)
    try {
      for (_ <- 1 to iters) {
        val wArr = array(w.map(lit): _*)
        // Per-bucket gradient in integer MICRO units (the unigramLogLoss
        // discipline): each addend round(r * 1e6 / n) is an exact BIGINT,
        // so the cross-doc sum is order-free — a plain double sum(r/n)
        // flipped the 6-dp round against the oracle when a bucket's sum
        // landed within an ulp of a half (seen at sf0.001, bucket 61).
        // Each doc's residual r is itself 6-dp rounded from a SEQUENTIAL
        // fold (same order both engines), so the addends are bit-identical
        // cross-engine before quantization.
        val grads = base
          .withColumn("__r", round(
            col("__y") - when(col("__n") === 0, lit(0.0)).otherwise(
              aggregate(col("__bks"), lit(0.0),
                (acc, b) => acc + element_at(wArr, b + 1)) / col("__n")), 6))
          .filter(col("__n") > 0)
          .select(explode(col("__bks")).as("__b"),
            round(col("__r") * 1e6 / col("__n")).cast("long").as("__gm"))
          .groupBy(col("__b")).agg(sum(col("__gm")).as("__g"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        w = Array.tabulate(d)(j =>
          r6(w(j) + lr * (grads.getOrElse(j, 0L) / 1e6)))
      }
    } finally base.unpersist()
    w
  }

  /** Mean-feature score — the calibration [[trainHashedLinear]]'s
    * weights are fit for (bucket FRACTIONS, not counts): bias +
    * (Σ w[bucket(token)]) / n_tokens; empty docs score the bias.
    * Same codegen'd literal-table fold as [[hashedLinearScore]]. */
  def hashedMeanScore(df: DataFrame, textCol: String,
                      weights: Array[Double], bias: Double,
                      outCol: String = "score"): DataFrame = {
    require(weights.nonEmpty && weights.length <= 65536,
      s"weight table must have 1..65536 buckets, got ${weights.length}")
    val d = weights.length
    val wArr = array(weights.map(lit): _*)
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn(outCol, round(
        when(size(col("__toks")) === 0, lit(bias)).otherwise(
          lit(bias) + aggregate(col("__toks"), lit(0.0),
            (acc, t) => acc + element_at(wArr,
              (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % d + 1)
                .cast("int"))) / size(col("__toks"))), 6))
      .drop("__toks")
  }

  /** Persist a trained weight table (the [[trainHashedLinear]] output)
    * as the quality-filter artifact: parquet (bucket, weight) behind a
    * staged rename, `_params` recording d and the bias — the same
    * publish/validate discipline as the BPE merge table. */
  def saveWeights(spark: org.apache.spark.sql.SparkSession,
                  weights: Array[Double], bias: Double, path: String): Unit = {
    require(weights.nonEmpty, "refusing to persist an empty weight table")
    import spark.implicits._
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    weights.zipWithIndex.map { case (w, b) => (b, w) }.toSeq
      .toDF("bucket", "weight")
      .repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_params"), true)
    try out.write(s"d=${weights.length} bias=$bias\n".getBytes("UTF-8"))
    finally out.close()
    // park-and-swap: the previous artifact survives a crash mid-publish
    graft.core.Publish.swapArtifact(fs, tmp, target)
  }

  /** Load a persisted weight table, validating shape against `_params`
    * (bucket ids contiguous from 0, count == recorded d) — a torn or
    * foreign parquet fails fast. Returns (weights, bias). */
  def loadWeights(spark: org.apache.spark.sql.SparkSession,
                  path: String): (Array[Double], Double) = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // loader-side: retry through a publisher's mid-swap window instead
    // of mutating (healing here could race an in-flight swapArtifact)
    graft.core.Publish.awaitArtifact(fs, new org.apache.hadoop.fs.Path(path))
    val in = fs.open(new org.apache.hadoop.fs.Path(path, "_params"))
    val marker =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    val kv = marker.split("\\s+").map { t =>
      val Array(k, v) = t.split("=", 2); k -> v
    }.toMap
    val d = kv("d").toInt
    val bias = kv("bias").toDouble
    val rows = spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col("bucket"),
        org.apache.spark.sql.functions.col("weight"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    require(rows.length == d && rows.map(_._1).toSeq == (0 until d),
      s"weight table at $path does not match its _params (d=$d): " +
        s"got ${rows.length} rows")
    (rows.map(_._2), bias)
  }

  /** The deterministic demo weight table the gate uses (and any two
    * engines can re-derive): w(i) = round(md5("w|i")[0..8 hex] / 2^32
    * - 0.5, 6) — uniform in [-0.5, 0.5). Real deployments pass trained
    * weights; the SHAPE (literal table, hashed fold) is the product. */
  def md5Weights(d: Int, salt: String = "w"): Array[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(d) { i =>
      val hex = digest.digest(s"$salt|$i".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      math.rint((java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
        - 0.5) * 1e6) / 1e6
    }
  }

  /** Unicode text normalization — the standard pre-dedup cleanup pass
    * (stray control bytes, zero-width characters and typographic
    * punctuation variants defeat exact fingerprints and inflate shingle
    * vocabularies): strips C0/C1 control chars (newline/tab survive as
    * whitespace), zero-width space/joiners/BOM, maps curly single/double
    * quotes to ASCII, en/em dashes and the minus sign to '-', the
    * ellipsis to '...', NBSP to space, then collapses runs of
    * space/tab and trims. A pure regex projection — codegen'd,
    * engine-portable (the oracle replays the same character classes),
    * composes with any corpus scan for free at 100 TB. */
  def normalizeText(text: Column): Column = {
    val noCtl = regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val noZw = regexp_replace(noCtl, "[\\u200B\\u200C\\u200D\\uFEFF]", "")
    val sq = regexp_replace(noZw, "[\\u2018\\u2019]", "'")
    val dq = regexp_replace(sq, "[\\u201C\\u201D]", "\"")
    val dash = regexp_replace(dq, "[\\u2013\\u2014\\u2212]", "-")
    val ell = regexp_replace(dash, "\\u2026", "...")
    val nbsp = regexp_replace(ell, "\\u00A0", " ")
    trim(regexp_replace(nbsp, "[ \\t]+", " "))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercased text
    * (content-defined fingerprinting; 16-hex prefix as a compact key). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Contact-information signals — the corpus-safety pass that feeds PII
    * scrubbing/filtering decisions: per-document counts of email-like,
    * URL-like and long-digit-run spans. Pure regexp_count projections
    * (codegen'd), so the scan composes with any other per-doc signal; the
    * REDACTION itself is the same regex in regexp_replace, kept separate
    * so counting never mutates the corpus. */
  def contactSignals(text: Column): Column = struct(
    regexp_count(text, lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
      .as("n_emails"),
    regexp_count(text, lit("https?://[^\\s]+")).as("n_urls"),
    regexp_count(text, lit("[0-9]{7,}")).as("n_long_digit_runs"))

  /** Redact the matched contact spans with a fixed token (same regexes as
    * [[contactSignals]]). */
  def redactContacts(text: Column, token: String = "<REDACTED>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", token),
        "https?://[^\\s]+", token),
      "[0-9]{7,}", token)

  /** Within-document n-gram repetition (the Gopher-report style quality
    * signal): the share of a document's n-gram OCCURRENCES that repeat an
    * earlier n-gram — 1 - distinct/total, 0 for docs shorter than n
    * tokens. A pure projection (the distinct count rides on the codegen'd
    * shingle expression, which already dedups): no explode, no shuffle, so
    * the filter composes into any corpus scan for free at 100 TB. */
  def repetitionScore(text: Column, n: Int): Column = {
    val nToks = size(tokens(text))
    val total = greatest(nToks - (n - 1), lit(0))
    val distinctN = when(nToks >= n,
      size(graft.functions.TextHash.shingles(text, n))).otherwise(lit(0))
    round(when(total > 0,
      lit(1.0) - distinctN.cast("double") / total.cast("double"))
      .otherwise(lit(0.0)), 6)
  }

  def fingerprintPrefix(text: Column): Column = substring(fingerprint(text), 1, 16)

  /** Word n-gram shingles (space-joined), for Jaccard/MinHash dedup. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Intra-document line dedup — the C4/RefinedWeb "keep the first
    * occurrence of every line" pass, the WITHIN-doc sibling of the
    * corpus-level boilerplate removal: a line repeating inside one page
    * (nav rendered twice, list spam) keeps its first occurrence only.
    * Matching is on the lower+trim normalization; blank lines never
    * dedup (the boilerplate convention — they carry layout, not
    * content).
    *
    * Pure per-row column expression: no shuffle, no state, composes
    * with any scan. The prior-lines scan is O(lines^2) per DOCUMENT —
    * doc-bounded like winnowing's O(L*w), not corpus-bounded. The norm
    * array is materialized as its own column first (an unmaterialized
    * expression inside a lambda re-evaluates per element). Returns
    * (idCol, clean_text, n_lines, n_removed). */
  def dedupLinesWithinDoc(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), "\n").as("__lines"))
      .select(col(idCol), col("__lines"),
        transform(col("__lines"), l => lower(trim(l))).as("__norms"))
      .select(col(idCol), col("__lines"),
        filter(col("__lines"), (_, i) =>
          element_at(col("__norms"), i + 1) === "" ||
            !array_contains(slice(col("__norms"), lit(1), i),
              element_at(col("__norms"), i + 1))).as("__kept"))
      .select(col(idCol),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__lines")).cast("long").as("n_lines"),
        (size(col("__lines")) - size(col("__kept"))).cast("long")
          .as("n_removed"))

  /** HTML-to-text extraction — the first pass of a web-corpus pipeline
    * (raw crawl payload -> trainable text), as a deterministic regex
    * chain of Catalyst built-ins (codegen'd, engine-portable — RE2 and
    * Java regex agree on every pattern used):
    *   1. `<script>`/`<style>` blocks and `<!-- -->` comments removed
    *      whole (non-greedy dotall — their CONTENT is not text);
    *   2. line-structuring tags (`<br>`, closing `p/div/li/h1-6/tr/ul/
    *      ol/table/section/article`) become newlines, every other tag a
    *      space;
    *   3. the five standard entities + `&nbsp;`/`&#39;` decode, `&amp;`
    *      LAST so `&amp;lt;` yields the literal `&lt;`;
    *   4. lines trim, inner runs of spaces/tabs collapse, empties drop.
    * Not a DOM parser by design: malformed markup degrades to extra
    * whitespace, never to an error — the property a 100 TB crawl scan
    * needs. Output is line-shaped, feeding the boilerplate dictionary
    * and every downstream text op directly. */
  def htmlToText(html: Column): Column = {
    // CRLF / lone-CR normalize first: crawl payloads are \r\n-lined, and
    // the line-shaping below splits on \n only
    val unix = regexp_replace(html, "\\r\\n?", "\n")
    val noScript = regexp_replace(unix, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val breaks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table|/section|/article)\\b[^>]*>",
      "\n")
    val noTags = regexp_replace(breaks, "(?s)<[^>]*>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "), "&#39;", "'"), "&quot;", "\""),
        "&lt;", "<"), "&gt;", ">"), "&amp;", "&")
    val collapsed = regexp_replace(ent, "[ \\t]+", " ")
    array_join(
      filter(transform(split(collapsed, "\n"), l => trim(l)),
        l => length(l) > 0), "\n")
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    * the MOSS algorithm; see [[graft.functions.TextHash.winnowSelect]]):
    * one row per selected (position, fingerprint) — the content-defined
    * sparse fingerprint set with the coverage guarantee that any shared
    * run of >= k + w - 1 tokens yields at least one identical selected
    * fingerprint in both documents. ~1/w the density of the full k-gram
    * set, so the downstream index/groupBy sees a fraction of the shingle
    * volume. Fingerprinting itself is scan + codegen'd projection +
    * explode — a pure per-row function, no shuffle; docs with fewer than
    * k tokens yield no rows (the shingle-op convention). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.TextHash.winnow(col(textCol), k, w).as("__sel"))
      .select(col(idCol), explode_outer(col("__sel")).as("sel"))
      .filter(col("sel").isNotNull)
      .select(col(idCol), col("sel.pos").as("pos"), col("sel.fp").as("fp"))

  /** Fixed-size overlapping chunks for long-document preprocessing: chunk
    * i covers characters [i*stride, i*stride + chunkChars) with
    * stride = chunkChars - overlapChars; a doc shorter than one chunk
    * yields exactly one. Pure projection + explode — no shuffle, scales
    * linearly with the corpus; chunk ids are (doc, idx), deterministic. */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                chunkChars: Int, overlapChars: Int): DataFrame = {
    require(overlapChars >= 0 && chunkChars > overlapChars,
      s"need chunkChars > overlapChars >= 0: $chunkChars/$overlapChars")
    val stride = chunkChars - overlapChars
    val len = length(col(textCol))
    val n = greatest(
      ceil((len - lit(overlapChars)).cast("double") / stride).cast("long"),
      lit(1L))
    df.select(col(idCol), col(textCol),
        explode(sequence(lit(0L), n - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        col(textCol).substr(
          (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkChars)).as("chunk"))
  }
}
