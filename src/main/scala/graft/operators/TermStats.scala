package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus term statistics — TF-IDF and BM25 keyword extraction for
  * training-data curation (keyword-based filtering, topic hints, boilerplate
  * spotting).
  *
  * 100 TB shape: term frequencies are ONE map-side-combinable groupBy over
  * the exploded tokens; document frequency is a second aggregate over the
  * (doc, term) pairs (already sub-linear in token volume); the df join-back
  * is vocabulary-keyed (AQE turns it into a broadcast when the vocabulary
  * fits); the global scalars (doc count, avg doc length) broadcast. The
  * only window is per-document top-k — partitioned by doc_id, bounded by
  * each document's own vocabulary, never global.
  *
  * Determinism: scores are rounded to 6 dp BEFORE ranking, ties break on
  * the term string, integer sums stay exact — reproducible across engines
  * (the DuckDB oracle replays the exact formulas).
  */
object TermStats {

  /** (doc_id, term) exploded from lowercased whitespace tokens. */
  private def docTerms(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))

  /** Smoothed TF-IDF top-k terms per document:
    * idf = ln((N + 1) / (df + 1)) + 1, score = tf * idf.
    * Returns (doc_id, term, tf, df, tfidf, rank), rank <= k. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val total = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val tf = docTerms(docs, idCol, textCol)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** BM25 top-k terms per document (Robertson/Sparck Jones idf, k1/b from
    * the standard Okapi defaults):
    * idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    * score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)).
    * dl = document token count; avgdl = corpus mean dl (exact: an integer
    * sum divided by an integer count, so identical in any engine).
    * Returns (doc_id, term, tf, df, dl, bm25, rank), rank <= k. */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docTerms(docs, idCol, textCol)
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val globals = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("bm25").desc, col("term"))
    tf.join(dfreq, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(globals))
      .withColumn("bm25", round(idf * col("tf") * (k1 + 1.0) / norm, 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        col("bm25"), col("rank"))
  }

  /** DSIR hashed n-gram importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score how
    * much more likely each raw document is under a TARGET distribution
    * than under the RAW corpus distribution, using hashed unigram+bigram
    * bag-of-words models. Here the target subset is defined by a boolean
    * column the caller supplies (e.g. `gopherFlags(...).col("passes")` —
    * "select raw docs that look like the quality-filtered subset"), so
    * target fitting and scoring happen in the same corpus pass.
    *
    * Model: features = lowercased whitespace unigrams + adjacent bigrams,
    * hashed into `buckets` counts via the first 4 hex chars of md5 (the
    * paper's hashed n-gram generative model). Both models are
    * Laplace-smoothed over the SAME bucket space:
    * P_m(b) = (cnt_m(b) + 1) / (T_m + B). Importance weight
    * log w(x) = sum over features of [log2 P_tgt(b) - log2 P_raw(b)];
    * `keep` = log w > 0 (the doc is likelier under the target — the
    * deterministic log-likelihood-ratio gate; full Gumbel resampling is a
    * seeded md5 rank away via Sampling.deterministicShuffle).
    *
    * Determinism: each bucket's two log-probs are fixed to integer
    * MICRO-BITS independently (the [[unigramLogLoss]] discipline), so the
    * per-doc weight is an exact integer sum — engine-portable and
    * summation-order-free; the DuckDB oracle replays hash, counts and
    * rounding bit-for-bit.
    *
    * 100 TB shape: ONE feature explode over the corpus (the target flag
    * rides each row, so raw and target counts come out of the SAME
    * map-side-combinable aggregate — conditional sum, no second corpus
    * pass); the scored bucket table is exactly `buckets` rows (broadcast
    * join-back); the per-doc aggregate is map-side combinable. No windows,
    * no self-joins, no global sort.
    * Returns (doc_id, n_feats, logw_micro, keep); docs with zero tokens
    * drop (nothing to score). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 1024): DataFrame =
    dsirScore(docs, idCol, textCol,
      dsirModel(docs, idCol, textCol, isTarget, buckets), buckets)

  /** Exploded (doc_id [, __tgt], bucket) hashed unigram+bigram features —
    * the shared first stage of [[dsirModel]] and [[dsirScore]]. */
  private def dsirFeats(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Option[Column], buckets: Int): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    // adjacent bigrams WITH multiplicity (bag model — shingles() dedups,
    // so build inline); sequence needs the size>=2 guard: Spark's
    // sequence(1, 0) counts DOWN, it is not empty
    val bigrams = when(size(col("__t")) >= 2,
      transform(sequence(lit(1), size(col("__t")) - 1),
        i => concat(element_at(col("__t"), i), lit(" "),
          element_at(col("__t"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val tagged = isTarget.map(t => Seq(t.as("__tgt"))).getOrElse(Nil)
    docs
      .select(Seq(col(idCol).as("doc_id")) ++ tagged ++ Seq(toks.as("__t")): _*)
      .withColumn("feat", explode(concat(col("__t"), bigrams)))
      .withColumn("bucket",
        conv(substring(md5(col("feat")), 1, 4), 16, 10).cast("int") % buckets)
      .drop("__t", "feat")
  }

  /** Fit the DSIR bucket model: (bucket, delta_micro) with EXACTLY
    * `buckets` rows — delta_micro = micro-bit log P_tgt - log P_raw for
    * every feature hashing to that bucket. The model is DENSE over the
    * whole bucket domain: buckets no training feature hashed to carry
    * cnt = 0, i.e. the Laplace-smoothed unseen-bucket log-ratio
    * round(log2(1/(t_tgt+B))*1e6) - round(log2(1/(t_raw+B))*1e6) — so
    * scoring a NEW document whose feature hashes to a bucket unseen in
    * training gets the defined smoothed weight instead of silently
    * dropping the feature. A static frame this small is exactly what a
    * stream-static join wants: fit on the batch corpus, score live
    * documents with [[dsirScore]] unchanged. */
  def dsirModel(docs: DataFrame, idCol: String, textCol: String,
                isTarget: Column, buckets: Int = 1024): DataFrame = {
    val feats = dsirFeats(docs, idCol, textCol, Some(isTarget), buckets)
    // cnt is referenced twice (globals + scored): without materialization
    // Catalyst duplicates the subtree and the corpus explode runs twice
    // for the model alone. Lazy localCheckpoint — at most `buckets`
    // rows, and no Spark job until the caller's first action.
    val cnt = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("cnt_raw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("cnt_tgt"))
      .localCheckpoint(false)
    val globals = cnt.agg(sum(col("cnt_raw")).as("t_raw"),
      sum(col("cnt_tgt")).as("t_tgt"))
    // densify to the full domain (`buckets` rows total; absent -> 0, the
    // smoothing's defined unseen case). Tiny frames — driver-free join.
    val dense = docs.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
      .join(cnt, Seq("bucket"), "left")
      .na.fill(0L, Seq("cnt_raw", "cnt_tgt"))
    def lpMicro(c: Column, t: Column): Column =
      round(log2((c + 1.0) / (t + lit(buckets)).cast("double")) * 1e6)
        .cast("long")
    dense.crossJoin(broadcast(globals))
      .select(col("bucket"),
        (lpMicro(col("cnt_tgt"), col("t_tgt")) -
          lpMicro(col("cnt_raw"), col("t_raw"))).as("delta_micro"))
  }

  /** Score documents against a fitted [[dsirModel]]. `docs` may be a
    * STREAMING frame: every step is stateless (explode + broadcast
    * stream-static join) except the final per-doc aggregate, which
    * Structured Streaming runs as a standard stateful aggregation.
    * The model is dense over the bucket domain (see [[dsirModel]]), so
    * the inner join is total: every feature of a new/streaming document
    * scores, including those hashing to buckets unseen in training. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame, buckets: Int = 1024): DataFrame =
    dsirFeats(docs, idCol, textCol, None, buckets)
      .join(broadcast(model), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("delta_micro")).as("logw_micro"))
      .withColumn("keep", col("logw_micro") > 0L)
      .select(col("doc_id"), col("n_feats"), col("logw_micro"), col("keep"))

  /** Unigram-LM cross-entropy / perplexity per document — the CCNet-style
    * fluency signal every corpus pipeline runs (Wenzek et al. 2020 score
    * with a KenLM; the unigram LM here is the engine-portable floor of
    * that family, trained on the corpus itself in the same pass).
    *
    * Model: Laplace-smoothed unigram probabilities over the corpus token
    * counts, P(t) = (cnt(t) + 1) / (T + V) with T total tokens and V the
    * vocabulary size. Score: per-document mean negative log2 likelihood
    * (cross-entropy, bits/token) and its 2^H perplexity. Gibberish and
    * rare-token soup score high; repetitive boilerplate scores low — both
    * tails are the filter targets.
    *
    * Determinism (the hash-gate discipline): each term's NLL is fixed to
    * integer MICRO-BITS once — round(-log2(P) * 1e6) as BIGINT — so the
    * per-document sum is an exact integer aggregate, immune to float
    * summation order across partitions and engines. The per-token mean is
    * ALSO rounded in integer micro-bits (nll_micro/dl can land on an
    * exact .5 — e.g. 58903974/12 — where a 6-dp round of the chained
    * double division flipped between engines; the integer round sees the
    * exact half and both engines break it upward), then one exact
    * division by 1e6 and one pow, mirrored literally by the oracle.
    *
    * 100 TB shape: ONE token explode feeding a map-side-combinable vocab
    * aggregate; the two global scalars broadcast; the NLL join-back is
    * vocabulary-keyed (AQE broadcasts the scored vocab when it fits, and
    * skew-splits the join when a stop-word key is hot); the final per-doc
    * aggregate is map-side combinable. No windows, no self-joins.
    * Returns (doc_id, dl, nll_micro, cross_entropy, perplexity). */
  def unigramLogLoss(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docTerms(docs, idCol, textCol)
    // referenced twice (globals + scored): vocabulary-sized, so
    // materialize lazily instead of re-running the corpus explode
    val cnt = terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val globals = cnt.agg(sum(col("cnt")).as("t_tokens"),
      count(lit(1)).as("v_size"))
    val nll = round(-log2((col("cnt") + 1.0) /
      (col("t_tokens") + col("v_size")).cast("double")) * 1e6)
      .cast("long").as("nll_micro")
    val scored = cnt.crossJoin(broadcast(globals))
      .select(col("term"), nll)
    terms.join(scored, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), sum(col("nll_micro")).as("nll_micro"))
      .withColumn("cross_entropy",
        round(col("nll_micro").cast("double") / col("dl")).cast("long")
          / 1000000.0)
      .withColumn("perplexity", round(pow(lit(2.0), col("cross_entropy")), 4))
      .select(col("doc_id"), col("dl"), col("nll_micro"),
        col("cross_entropy"), col("perplexity"))
  }

  /** Stupid Backoff bigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale LM that
    * drops normalization for a fixed backoff factor because at corpus
    * scale counts beat smoothing). The model trains on the TARGET subset
    * (rows where `isTarget`, e.g. the Gopher-quality slice) and scores
    * EVERY document, so out-of-model bigrams genuinely exercise backoff:
    *
    *   S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})   if bigram seen
    *                    = 0.4 * (c(w_i)+1) / (T+V+1)     otherwise
    *
    * (the unigram floor is Laplace-smoothed over the target vocabulary so
    * fully-OOV words stay finite). Score = per-doc mean NLL in bits over
    * the n-1 bigram positions, plus the backoff count as its own column —
    * a high backoff fraction is itself a distribution-shift signal.
    *
    * Determinism: each position's NLL is fixed to integer MICRO-BITS
    * (the [[unigramLogLoss]] discipline — integer-ratio log2s and one
    * 0.4 product are bit-identical across engines), the per-doc sum is an
    * exact integer aggregate, and the mean rounds in integer micro-bits.
    *
    * 100 TB shape: model = two map-side-combinable aggregates over the
    * target subset's ONE bigram explode (unigram counts lazily
    * checkpointed — vocabulary-sized, far below corpus size — because
    * the global scalars AND the backoff join both read them); scoring =
    * ONE bigram explode over the full corpus, two vocabulary-keyed LEFT
    * joins (bigram table, then unigram backoff — shuffle joins AQE can
    * skew-split; neither side is forced broadcast because bigram
    * vocabulary grows with the corpus), one map-side-combinable per-doc
    * aggregate. No windows, no self-joins.
    * Returns (doc_id, n_bigrams, n_backoff, nll_micro, cross_entropy,
    * perplexity); docs with fewer than 2 tokens drop. */
  def stupidBackoffScore(docs: DataFrame, idCol: String, textCol: String,
                         isTarget: Column, alpha: Double = 0.4): DataFrame =
    bigramLmScore(docs, idCol, textCol,
      bigramLmModel(docs.filter(isTarget), idCol, textCol), alpha)

  /** A fitted bigram LM: bigram counts (w1, w2, c_bi), unigram counts
    * (w, c_uni), and the (t_tokens, v_size) scalar frame. All three are
    * static model tables a streaming [[bigramLmScore]] joins against. */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame,
                            globals: DataFrame)

  private def bigramsOf(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Fit bigram + unigram counts over `docs` (pre-filter to the target
    * subset; [[stupidBackoffScore]] does). The unigram table is lazily
    * checkpointed — vocabulary-sized, and read by the globals aggregate
    * plus both backoff joins. */
  def bigramLmModel(docs: DataFrame, idCol: String, textCol: String): BigramLm = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("__t"))
    val biCnt = base
      .select(explode(bigramsOf(col("__t"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bi"))
    // unigram counts must be the TOKEN counts, not sum(c_bi) over w1 —
    // a bigram sum undercounts every doc-final word
    val uniCnt = base
      .select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_uni"))
      .localCheckpoint(false)
    val globals = uniCnt.agg(sum(col("c_uni")).as("t_tokens"),
      count(lit(1)).as("v_size"))
    BigramLm(biCnt, uniCnt, globals)
  }

  /** Score documents against a fitted [[BigramLm]]. `docs` may be a
    * STREAMING frame: the explode and the three model joins are
    * stateless stream-static operations; the final per-doc aggregate is
    * a standard stateful streaming aggregation. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    model: BigramLm, alpha: Double = 0.4): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val biCnt = model.bigrams
    val uniCnt = model.unigrams
    val globals = model.globals
    // materialize the token array in its own projection FIRST: inlining
    // the tokens expression into bigramsOf re-runs split+filter at every
    // element_at access inside the transform lambda (measured 5x CPU)
    val scoreBase = docs
      .select(col(idCol).as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), explode(bigramsOf(col("__t"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val joined = scoreBase
      .join(biCnt, Seq("w1", "w2"), "left")
      .join(uniCnt.withColumnRenamed("w", "w1")
        .withColumnRenamed("c_uni", "c_prev"), Seq("w1"), "left")
      .join(uniCnt.withColumnRenamed("w", "w2")
        .withColumnRenamed("c_uni", "c_next"), Seq("w2"), "left")
      .crossJoin(broadcast(globals))
    val seen = col("c_bi").isNotNull
    val nllSeen = round(-log2(col("c_bi").cast("double") / col("c_prev")) * 1e6)
    val nllBack = round(-log2(lit(alpha) *
      ((coalesce(col("c_next"), lit(0L)) + 1.0) /
        (col("t_tokens") + col("v_size") + 1L).cast("double"))) * 1e6)
    joined
      .select(col("doc_id"), seen.as("__seen"),
        when(seen, nllSeen).otherwise(nllBack).cast("long").as("__nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__seen"), 0L).otherwise(1L)).as("n_backoff"),
        sum(col("__nll")).as("nll_micro"))
      .withColumn("cross_entropy",
        round(col("nll_micro").cast("double") / col("n_bigrams")).cast("long")
          / 1000000.0)
      .withColumn("perplexity", round(pow(lit(2.0), col("cross_entropy")), 4))
      .select(col("doc_id"), col("n_bigrams"), col("n_backoff"),
        col("nll_micro"), col("cross_entropy"), col("perplexity"))
  }
}
