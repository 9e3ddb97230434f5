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
    val cnt = terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
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
}
