package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators: deterministic stratified sampling and
  * token-budget sequence packing.
  *
  * Both are designed for the 100 TB shape of a training-data pipeline:
  * sampling is a pure filter (no shuffle, no state, reproducible across
  * engines and runs), packing is one range-partitioned sort plus a
  * broadcast of per-partition offsets — the same no-global-window pattern
  * as [[graft.core.Ids.denseIds]], so no single task ever sees the whole
  * corpus.
  */
object Sampling {

  /** Keep condition for one stratum: the first 4 hex chars of md5(key)
    * sort below the rate's cutoff. md5 hex compares identically in every
    * engine (and in DuckDB SQL), so the sample is reproducible and
    * joinable across runs — unlike `rand()`-based sampling. Granularity is
    * 1/65536 (~0.0015%). */
  def sampleCond(key: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(key.cast("string")), 1, 4) <
      lit(f"${math.round(rate * 65536).toInt}%04x")

  /** Per-stratum deterministic sampling: each stratum value gets its own
    * rate (e.g. downsample English, keep every low-resource-language doc).
    * Rows whose stratum is not in `rates` use `defaultRate`. A pure
    * filter — embarrassingly parallel at any scale. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val cond = rates.toSeq.sortBy(_._1)
      .foldRight(sampleCond(col(keyCol), defaultRate)) {
        case ((stratum, rate), els) =>
          when(col(stratumCol) === stratum, sampleCond(col(keyCol), rate))
            .otherwise(els)
      }
    df.filter(cond)
  }

  /** Temperature-flattened source mixing — the multi-source data-recipe
    * step of a training-set build (the GPT-3/LLaMA-style `p_l ∝ n_l^α`
    * mixture): source l with n_l documents is kept at a rate that makes
    * the sampled mixture follow n_l^alpha / Σ_k n_k^alpha. alpha < 1
    * flattens the distribution (upsamples tail sources, downsamples the
    * head); alpha = 1 keeps natural proportions. `targetFraction` sets
    * the expected kept fraction of the whole corpus; per-source rates
    * clamp at 1 (sampling only — no row duplication).
    *
    * Scale shape: ONE map-side-combinable per-source count (the collect
    * is source-cardinality-sized — tens of rows, like a centroid table),
    * rates fixed on the driver and compiled into the SAME md5 pure-filter
    * keep condition as [[stratifiedSample]] — the corpus itself never
    * shuffles. Rates round to 6 dp before the cutoff so independent
    * engines reproduce the sample bit for bit. */
  def temperatureSample(df: DataFrame, keyCol: String, sourceCol: String,
                        alpha: Double, targetFraction: Double,
                        rateCol: String = "mix_rate"): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    val total = counts.map(_._2).sum.toDouble
    val sumPow = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val rates = counts.map { case (src, n) =>
      val raw = targetFraction * total *
        math.pow(n.toDouble, alpha) / sumPow / n.toDouble
      src -> BigDecimal(math.min(1.0, raw))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val rateExpr = rates.toSeq.sortBy(_._1).foldRight(lit(0.0): Column) {
      case ((src, r), els) =>
        when(col(sourceCol) === src, lit(r)).otherwise(els)
    }
    stratifiedSample(df, keyCol, sourceCol, rates, defaultRate = 0.0)
      .withColumn(rateCol, rateExpr)
  }

  /** Epoch-mix repetition — the UPSAMPLING half of a data recipe
    * ([[temperatureSample]] can only downsample: its rates clamp at 1,
    * but real mixes run "2.5 epochs of the curated set against 1 of the
    * crawl"): each source s gets `factors(s)` epochs, so every row emits
    * floor(f) copies plus one more where its salted md5 band falls below
    * frac(f). Expected copies per row is exactly f, and the fractional
    * epoch is the same deterministic 1/65536 md5-band filter as
    * [[sampleCond]] (salted with "#epoch" so it never correlates with a
    * sampling decision on the same ids) — reproducible across engines,
    * runs and partitionings. Factors below 1 downsample by the same
    * rule; factor 0 drops the source. Output repeats each surviving row
    * with `copyCol` = 1..n, so a downstream [[deterministicShuffle]]
    * can spread the copies.
    *
    * 100 TB shape: a pure projection + explode — no shuffle, no state;
    * the output volume multiplier IS the point (the trainer reads one
    * mixed stream instead of fronting a mixing service). */
  def epochMix(df: DataFrame, idCol: String, sourceCol: String,
               factors: Map[String, Double], defaultFactor: Double = 1.0,
               copyCol: String = "epoch_copy"): DataFrame = {
    (factors.values.toSeq :+ defaultFactor).foreach(f =>
      require(f >= 0 && f < 1000, s"epoch factors must be in [0, 1000): $f"))
    val salted = concat(col(idCol).cast("string"), lit("#epoch"))
    def copiesOf(f: Double): Column = {
      val base = math.floor(f).toLong
      lit(base) + when(sampleCond(salted, f - base), 1L).otherwise(0L)
    }
    val nCopies = factors.toSeq.sortBy(_._1).foldRight(copiesOf(defaultFactor)) {
      case ((src, f), els) => when(col(sourceCol) === src, copiesOf(f)).otherwise(els)
    }
    df.withColumn("__n", nCopies)
      // plain explode drops n = 0 rows; the guarded branch keeps ANSI
      // sequence() from seeing a descending (1, 0) range
      .withColumn(copyCol,
        explode(when(col("__n") >= 1L, sequence(lit(1L), col("__n")))
          .otherwise(array().cast("array<long>"))))
      .drop("__n")
  }

  /** Deterministic dataset split (train/val/test): each row gets the
    * label of the md5-16-bit band its id falls in, with band widths
    * proportional to `fractions` (cumulative cutoffs on the same
    * 1/65536 grid as [[sampleCond]]). A pure projection — stable across
    * runs, partitionings and engines, so the split is reproducible and
    * leakage-checkable by anyone recomputing the hash; fractions must
    * cover the space (sum to 1 within the grid's resolution), and the
    * LAST label absorbs the rounding remainder so every row is labeled. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         fractions: Seq[(String, Double)],
                         labelCol: String = "split"): DataFrame = {
    require(fractions.size >= 2, "need at least two split labels")
    require(fractions.forall(_._2 > 0), s"fractions must be positive: $fractions")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"fractions must sum to 1, got $total")
    val hex = substring(md5(col(idCol).cast("string")), 1, 4)
    // Each cutoff must stay a 4-char hex string: a cumulative fraction
    // rounding to 65536 would emit the 5-char "10000", which the
    // fixed-width comparison misorders ("1abc" > "10000"), silently
    // starving every later label; a cutoff rounding to 0 (or colliding
    // with its neighbour) makes a label silently empty. Reject fractions
    // below the 1/65536 grid resolution instead.
    val cutInts = fractions.init.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 65536).toInt)
    cutInts.zip(fractions.init.map(_._1)).foreach { case (ci, name) =>
      require(ci >= 1 && ci <= 65535,
        s"cumulative cutoff after '$name' rounds to $ci/65536 — every " +
          "cutoff must land in [1, 65535]; fractions this close to 0 or 1 " +
          "are below the 1/65536 md5-band grid resolution")
    }
    require(cutInts.size < 2 ||
        cutInts.sliding(2).forall(p => p(1) > p(0)),
      s"cutoffs must be strictly increasing on the 1/65536 grid, got " +
        s"${cutInts.mkString(",")} — a fraction below the grid resolution " +
        "would leave its label silently empty")
    val cutoffs = cutInts.map(ci => f"$ci%04x")
    val label = fractions.init.zip(cutoffs).foldRight(
      lit(fractions.last._1): org.apache.spark.sql.Column) {
      case (((name, _), cut), els) => when(hex < cut, name).otherwise(els)
    }
    df.withColumn(labelCol, label)
  }

  /** Deterministic weighted sampling without replacement — the
    * importance-RESAMPLING step that consumes DSIR-style weights (Xie et
    * al. 2023 select by sampling proportional to w(x), not by
    * thresholding): keep the `ceil(rate * n)` rows winning an
    * exponential race, P(kept) ∝ weight, reproducible across engines
    * and runs.
    *
    * Race key (Gumbel/exponential-race, log form): with u =
    * (md5-52-bit-prefix + 0.5) / 2^52 ∈ (0,1) strictly,
    * key = ln(-ln u) - ln(weight), smallest keys win — order-equivalent
    * to the textbook -ln(u)/w but SAFE to micro-round: in ratio form a
    * tiny weight amplifies the libm ulp of ln into the rounding
    * threshold, in log form engine drift stays ~1e-14 absolute against
    * the 0.5 micro-unit boundary. Key is fixed to integer micro-units
    * with the id as total-order tiebreak, so the DuckDB oracle replays
    * the race exactly.
    *
    * 100 TB shape: the race key is a pure projection, and the global
    * rank pass is SKETCH-THRESHOLDED: one bounded map-combinable
    * aggregate (the [[Sketches.qsketchBuckets]] histogram of the race
    * keys — exact counts, ~14.6k rows max) yields both n and an upper
    * bound on the k-th smallest key; a pure filter cuts the corpus to
    * the candidates at-or-below that bound, and only the candidate set
    * (≈ k + one bucket's slack, at 2^-7 relative bucket resolution)
    * pays the exact dense-rank materialization (range partition +
    * per-partition offsets — no single-task global window). The bound
    * is an upper bound by construction — bucket counts are exact, so
    * every one of the k smallest keys is ≤ it — which makes the
    * threshold pass a PRUNE, never a change: the output is identical
    * to ranking the whole corpus. Project `df` down to (id, weight)
    * before sampling and join survivors back if the payload is wide.
    *
    * Rows with null, NaN or non-positive weight never sample (zero
    * mass) and are dropped before the race; an INFINITE weight wins
    * with certainty (ln clamps at +-700, past every finite double, so
    * the key stays integral instead of tripping the ANSI NaN/overflow
    * cast). Returns the surviving rows with `raceCol` (the integer race
    * key) and `rankCol` (1..k). */
  /** The shared race-key projection of [[weightedSample]] and
    * [[weightedSamplePerGroup]]: drop zero-mass rows, key survivors with
    * the integer-micro log-form exponential race. The ±700 clamp is a
    * no-op for every finite weight (|ln w| < 710) — it only keeps
    * ±Infinity weights integral instead of tripping the ANSI cast. */
  /** The integer-micro race key as a standalone Column expression — the
    * scalar heart of [[raceKeyed]], also registered for SQL as
    * `graft_race_key(id, weight)` (see [[graft.GraftExtensions]]). Null,
    * NaN and non-positive weights yield NULL (zero mass — the SQL
    * contract mirroring [[raceKeyed]]'s filter); positive weights get
    * the exact key the DataFrame path computes. */
  def raceKey(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(id.cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") + 0.5) / (1L << 52).toDouble
    val lnW = greatest(least(log(weight), lit(700.0)), lit(-700.0))
    when(weight.isNotNull && !isnan(weight.cast("double")) && weight > 0,
      round((log(-log(u)) - lnW) * 1e6).cast("long"))
  }

  private[graft] def raceKeyed(df: DataFrame, idCol: String, weightCol: String,
                        raceCol: String): DataFrame =
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        !isnan(col(weightCol).cast("double")))
      .withColumn(raceCol, raceKey(col(idCol), col(weightCol)))

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     rate: Double, raceCol: String = "race_micro",
                     rankCol: String = "sample_rank"): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, s"rate must be in (0,1], got $rate")
    // ONE linear materialization of the raced rows (no sort, no shuffle —
    // narrow if the caller projected as documented): the histogram pass
    // and the candidate filter both read these blocks, so the upstream
    // weight pipeline (often a multi-scan DSIR fit) runs exactly once.
    // Unlike the pre-r11 shape, the full corpus never enters the range
    // exchange behind the exact rank — only the candidate set does.
    val keyed = raceKeyed(df, idCol, weightCol, raceCol).localCheckpoint(false)
    val (n, bound) = raceBound(keyed, raceCol, rate)
    if (n == 0L) // empty input: schema only
      graft.core.Ids.denseIds(keyed, Seq(raceCol, idCol), rankCol)
    else {
      val k = math.ceil(rate * n).toLong
      // the bound admits >= k rows by construction, so ranks 1..k inside
      // the candidate set ARE the global ranks 1..k — the filter prunes,
      // the result is identical to ranking the whole corpus
      val cand = keyed.filter(col(raceCol) <= bound)
      graft.core.Ids.denseIds(cand, Seq(raceCol, idCol), rankCol)
        .filter(col(rankCol) <= k)
    }
  }

  /** The sketch-threshold pass of [[weightedSample]]: one bounded
    * [[Sketches.qsketchBuckets]] aggregate over the race keys returns
    * (n, an inclusive upper bound on the ceil(rate*n)-th smallest key).
    * Bucket counts are EXACT (the sketch approximates positions within
    * a bucket, never membership), so filtering to keys <= bound keeps a
    * superset of the k winners: at most one bucket's worth of extra
    * rows (2^-7 relative width) ever reaches the exact rank pass.
    * Package-visible so the spec can pin the candidate-set bound. */
  private[graft] def raceBound(keyed: DataFrame, raceCol: String,
                                   rate: Double): (Long, Long) = {
    val buckets = Sketches.qsketchBuckets(keyed, Seq.empty, raceCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // every race key is finite and non-null (raceKeyed drops zero-mass
    // rows; the ±700 clamp keeps infinite weights integral), so the
    // bucket counts sum to exactly n
    val n = buckets.iterator.map(_._3).sum
    if (n == 0L) return (0L, Long.MaxValue)
    val k = math.ceil(rate * n).toLong
    var cum = 0L
    var bound = Long.MaxValue
    var i = 0
    while (i < buckets.length && cum < k) {
      cum += buckets(i)._3
      if (cum >= k) bound = buckets(i)._1 + buckets(i)._2 - 1L
      i += 1
    }
    (n, bound)
  }

  /** Per-group weighted sampling without replacement — exactly k race
    * winners PER GROUP (the per-stratum form of [[weightedSample]]: keep
    * the 10 highest-importance documents of every language/domain). Same
    * deterministic log-form exponential race, P(kept) ∝ weight — but
    * ranks come from [[topKPerGroup]]'s k-capped aggregate instead of
    * the global dense-id pass, so there is NO global materialization, no
    * window, and no rank barrier: one map-side-combinable aggregate,
    * output groups x k rows. Groups with fewer than k live rows keep
    * them all. Returns (groupCols..., rankCol 1..k, idCol, raceCol). */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weightCol: String, k: Int,
                             raceCol: String = "race_micro",
                             rankCol: String = "sample_rank"): DataFrame =
    topKPerGroup(raceKeyed(df, idCol, weightCol, raceCol),
      groupCols, raceCol, idCol, k, descending = false, rankCol = rankCol)

  /** Leakage-safe dataset split: [[deterministicSplit]] keyed on the
    * near-dup CLUSTER instead of the document — every member of a
    * duplicate cluster lands in the SAME split, closing the classic
    * eval-leakage hole where a train doc's near-copy sits in test.
    * `pairs` is a verified near-dup pair list (doc_a, doc_b — e.g.
    * [[Dedup.minhashLsh]]'s output); singletons split by their own id.
    * Emits the input columns + `cluster_id` (null for singletons) +
    * the split label.
    *
    * 100 TB shape: the cluster labels come from [[Dedup.clusters]]
    * (driver union-find under the counted guard, distributed
    * min-label propagation above it). The join back carries NO forced
    * broadcast hint: labels are usually pair-list-sized, but a
    * high-dup crawl makes them a corpus fraction, where a forced hint
    * OOMs the driver — AQE upgrades to broadcast at runtime when the
    * measured size fits and shuffle-joins otherwise (results identical,
    * spec-pinned); the split itself stays a pure projection. */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                       fractions: Seq[(String, Double)],
                       labelCol: String = "split"): DataFrame = {
    val labels = Dedup.clusters(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val keyed = df.join(labels, Seq(idCol), "left")
      .withColumn("__gk",
        coalesce(col("cluster_id"), col(idCol)).cast("string"))
    deterministicSplit(keyed, "__gk", fractions, labelCol).drop("__gk")
  }

  /** Deterministic pseudorandom shuffle — the training-set ORDERING step
    * (corpus builds fix a shuffle seed so epochs are reproducible and
    * resumable): rank every row by md5(seed | id). Engine-portable (md5,
    * no JVM RNG) and distributed — positions come from the dense-id
    * machinery (range partition + per-partition offsets), so there is no
    * single-task global window at any scale and a different seed is a
    * different total order. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String): DataFrame =
    graft.core.Ids.denseIds(
      df.withColumn("__sk",
        md5(concat_ws("|", lit(seed), col(idCol).cast("string")))),
      Seq("__sk"), "shuffle_pos")
      .drop("__sk")

  /** One kept entry of [[topKPerGroup]]'s bounded buffer: score in race
    * order plus the row id (stringified — the engine-portable tiebreak). */
  final case class TopKRow(score: Double, id: String)
  final case class TopKRows(items: Seq[TopKRow])

  private final class TopKAgg(k: Int, desc: Boolean)
    extends org.apache.spark.sql.expressions.Aggregator[
      TopKRow, scala.collection.mutable.ArrayBuffer[String], TopKRows] {
    import scala.collection.mutable.ArrayBuffer
    // Each buffer entry packs (score, id) into ONE sortable string: 16
    // hex chars of the IEEE-754 total-order key (sign bit flipped so
    // lexicographic == numeric, complemented when descending) + "|" + id.
    // Plain string order IS (score [desc|asc], id asc) — and the buffer
    // stays an ArrayBuffer[String] of JDK-only classes, which Kryo
    // serializes under any classloader layout (an app case class inside
    // the buffer trips FieldSerializer in un-forked/embedded JVMs
    // without the java.nio add-opens).
    private def pack(v: TopKRow): String = {
      // SQL compares -0.0 == 0.0 (ties fall to the id); IEEE total order
      // does not — normalize so the packed key agrees with the oracle
      val score = if (v.score == 0.0) 0.0 else v.score
      val bits = java.lang.Double.doubleToLongBits(score)
      val sortable = if (bits < 0) ~bits else bits ^ Long.MinValue
      val key = if (desc) ~sortable else sortable
      f"$key%016x|${v.id}"
    }
    private def unpack(e: String): TopKRow = {
      val key = java.lang.Long.parseUnsignedLong(e.substring(0, 16), 16)
      val sortable = if (desc) ~key else key
      val bits =
        if (sortable < 0) sortable ^ Long.MinValue else ~sortable
      TopKRow(java.lang.Double.longBitsToDouble(bits), e.substring(17))
    }
    def zero: ArrayBuffer[String] = ArrayBuffer.empty
    // The declared contract orders tie ids by UTF-8 BINARY collation (the
    // row_number window and the DuckDB oracle both compare bytes), but
    // JVM `<` compares UTF-16 code units, which rank U+E000..U+FFFF above
    // supplementary characters. Compare in code-point order instead —
    // identical to UTF-8 byte order — via the classic surrogate fixup
    // (chars >= U+E000 shift down 0x800, surrogates shift up 0x2000), no
    // per-comparison byte-array allocation. The 16-hex-char score prefix
    // is ASCII, so the fixup only ever engages inside the id suffix.
    private def utf8Lt(a: String, b: String): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        var ca = a.charAt(i).toInt; var cb = b.charAt(i).toInt
        if (ca != cb) {
          if (ca >= 0xd800 && cb >= 0xd800) {
            ca = if (ca >= 0xe000) ca - 0x800 else ca + 0x2000
            cb = if (cb >= 0xe000) cb - 0x800 else cb + 0x2000
          }
          return ca < cb
        }
        i += 1
      }
      a.length < b.length
    }
    // capped rank-ordered insert; duplicates of the same (score, id) are
    // KEPT (row semantics — identical to row_number over identical rows)
    private def insert(b: ArrayBuffer[String], v: String): ArrayBuffer[String] = {
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (utf8Lt(b(mid), v)) lo = mid + 1 else hi = mid
      }
      if (lo >= k) b
      else {
        b.insert(lo, v)
        if (b.length > k) b.remove(k)
        b
      }
    }
    def reduce(b: ArrayBuffer[String], a: TopKRow): ArrayBuffer[String] =
      insert(b, pack(a))
    def merge(b1: ArrayBuffer[String],
              b2: ArrayBuffer[String]): ArrayBuffer[String] = {
      var i = 0
      while (i < b2.length) { insert(b1, b2(i)); i += 1 }
      b1
    }
    def finish(b: ArrayBuffer[String]): TopKRows =
      TopKRows(b.toSeq.map(unpack))
    def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[ArrayBuffer[String]]
    def outputEncoder = org.apache.spark.sql.Encoders.product[TopKRows]
  }

  /** Bounded top-k rows per group — the selection step of a curation
    * pipeline (best documents per domain, hardest examples per bucket)
    * WITHOUT the row_number window. A window's PARTITION BY makes each
    * group ONE unsplittable sorted partition — the same hazard class the
    * chunked as-of join removes, and AQE can split a skewed join but
    * never a window partition — so at corpus scale one hot group (half
    * the corpus in `lang = 'en'`) is a guaranteed straggler. Here each
    * partial buffer holds at most k (score, id) pairs, partials merge
    * map-side (ObjectHashAggregate — no sort, no group-sized state), and
    * the output is <= groups x k rows, broadcastable for the payload
    * join-back.
    *
    * Result contract (deterministic, engine-portable): identical to
    * row_number() OVER (PARTITION BY groupCols ORDER BY score
    * [DESC|ASC], CAST(id AS string)) filtered to rank <= k — or, with
    * `numericIdOrder = true` (integral id columns only), ties break on
    * the id's NATIVE numeric order (ORDER BY score, id), the contract
    * every ANN rank window uses. Null/NaN
    * scores and null ids never qualify. Scores compare as doubles, so
    * integral score columns above 2^53 lose tie precision — the same
    * declared boundary as the as-of join's float-timestamp rejection.
    *
    * Returns (groupCols..., rankCol 1..k, idCol, orderCol) with id and
    * score cast back to their input types; join back on (groupCols,
    * idCol) for the full payload — the survivor side is tiny. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   idCol: String, k: Int, descending: Boolean = true,
                   rankCol: String = "rank",
                   numericIdOrder: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    val scoreT = df.schema(orderCol).dataType
    require(scoreT.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"order column `$orderCol` must be numeric, got $scoreT")
    val idT = df.schema(idCol).dataType
    val integralIdTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(!numericIdOrder || integralIdTypes.contains(idT),
      s"numericIdOrder needs an integral id column, got $idT")
    // The aggregate's tiebreak is lexicographic on the id STRING. For the
    // numeric contract, encode the long id order-preservingly: flip the
    // sign bit (XOR Long.MinValue) and render 16 fixed-width hex chars —
    // lexicographic hex order IS signed numeric order. Decoded on output.
    val idEnc: Column =
      if (numericIdOrder)
        lpad(hex(col(idCol).cast("long").bitwiseXOR(Long.MinValue)), 16, "0")
      else col(idCol).cast("string")
    def idDec(c: Column): Column =
      if (numericIdOrder)
        conv(c, 16, -10).cast("long").bitwiseXOR(Long.MinValue).cast(idT)
      else c.cast(idT)
    val topk = udaf(new TopKAgg(k, descending))
    df.filter(col(orderCol).isNotNull && col(idCol).isNotNull &&
        !isnan(col(orderCol).cast("double")))
      .select(groupCols.map(col) ++ Seq(
        col(orderCol).cast("double").as("__score"),
        idEnc.as("__id")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(topk(col("__score"), col("__id")).as("__tk"))
      .select(groupCols.map(col) :+
        posexplode(col("__tk").getField("items")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as(rankCol),
        idDec(col("col").getField("id")).as(idCol),
        col("col").getField("score").cast(scoreT).as(orderCol)): _*)
  }

  /** Assign each document to a fixed-token-budget pack: documents are laid
    * out in `sortCols` order and pack_id = floor(tokens-before-this-doc /
    * budget) — contiguous, deterministic, and independent of partitioning
    * (a streaming packer, not a bin-packing optimizer; a doc can straddle
    * two budgets, the trainer's concatenate-and-chunk view).
    *
    * Scale shape: global cumulative sums are the textbook global-window
    * trap (every row through ONE task). Here: range-partition on the sort
    * key, run the running sum per partition (parallel windows), collect
    * only the per-partition TOTALS (numShufflePartitions rows) to the
    * driver, and broadcast the prefix offsets back. The result is exact
    * and the plan never has a single-partition exchange. */
  def packSequences(df: DataFrame, sortCols: Seq[String], tokensCol: String,
                    budget: Long, packCol: String = "pack_id"): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols.map(col): _*)
    val sorted = df
      .withColumn("__tok", col(tokensCol).cast("long"))
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cume", sum(col("__tok")).over(w))
      // Two jobs consume this frame (offset totals + final result), and
      // the __pid/__cume assignment is only meaningful within ONE
      // materialization (the range partitioner re-samples boundaries on
      // recompute). A LAZY localCheckpoint (the Ids.denseIds
      // discipline) truncates lineage: the totals collect below is the
      // materializing action, the final join reads the same frozen
      // blocks, and a lost block (executor
      // death on a cluster) FAILS the job instead of silently
      // recomputing a different row->partition assignment under the
      // already-collected offsets — the cluster-mode contract is
      // correct-or-failed, never silently wrong. (A persist() would
      // recompute through the nondeterministic seam on cache eviction.)
      .localCheckpoint(false)

    val totals = sorted.groupBy(col("__pid")).agg(max(col("__cume")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (p, t) => val o = (p, acc); acc += t; o }

    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    sorted.join(offDf, "__pid")
      .withColumn(packCol,
        floor((col("__off") + col("__cume") - col("__tok"))
          .cast("double") / budget))
      .drop("__pid", "__cume", "__off", "__tok")
  }

  /** PER-GROUP distributed running total — [[packSequences]]' two-phase
    * prefix-sum machinery generalized to grouped cumulative sums:
    * `outCol` = the exact sum of `valueCol` over all SAME-GROUP rows at
    * or before this row in `sortCols` order.
    *
    * Scale shape: the textbook form is `sum() OVER (PARTITION BY group
    * ORDER BY sort)`, and a HOT group (half the corpus in lang = 'en')
    * is one unsplittable sorted window partition — the same hazard
    * class topKPerGroup and the chunked as-of join remove. Here the
    * data range-partitions on (group, sort) — a hot group SPLITS across
    * partitions — the running sum is per (partition, group), only the
    * per-(partition, group) TOTALS reach the driver (≤ numPartitions +
    * activeGroups - 1 rows: ranges are contiguous), and the group's
    * cross-partition offsets broadcast back. Exact long arithmetic,
    * partitioning-invariant given unique (groupCols, sortCols).
    *
    * Intended for BOUNDED group domains (languages, sources, splits —
    * the hot-group regime); a guard refuses > 100k distinct groups,
    * where the plain per-group window splits fine anyway and this
    * two-phase form would collect a group-sized offset table. */
  def groupedRunningTotal(df: DataFrame, groupCols: Seq[String],
                          sortCols: Seq[String], valueCol: String,
                          outCol: String = "running_total"): DataFrame = {
    require(groupCols.nonEmpty && sortCols.nonEmpty,
      "groupedRunningTotal needs group and sort columns")
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val keys = (groupCols ++ sortCols).map(col)
    val w = Window.partitionBy((col("__pid") +: groupCols.map(col)): _*)
      .orderBy(sortCols.map(col): _*)
    val sorted = df
      .withColumn("__val", col(valueCol).cast("long"))
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cume", sum(col("__val")).over(w))
      // Same discipline as [[packSequences]]: lazy localCheckpoint, not
      // persist — the offsets collected below are only valid against
      // THIS materialization's __pid assignment, so lineage is cut; a
      // lost block fails the job (rerun) rather than silently joining
      // stale offsets onto a re-sampled range partitioning.
      .localCheckpoint(false)
    val totals = sorted
      .groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(max(col("__cume")).as("__t"))
      .collect()
    require(totals.length <= 100000 + n,
      s"groupedRunningTotal collected ${totals.length} (partition, group) " +
        "totals — group domain too large for the two-phase form; use a " +
        "per-group window (many small groups split fine)")
    // per group, offsets accumulate over partitions in ascending order
    val offsets = totals
      .map(r => (r.getInt(0), groupCols.map(g => r.getAs[Any](g)),
        r.getAs[Long]("__t")))
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, gvals, t) =>
          val o = (pid, gvals, acc); acc += t; o
        }
      }.toSeq
    val offRows = offsets.map { case (pid, gvals, off) =>
      org.apache.spark.sql.Row.fromSeq(pid +: gvals :+ off)
    }
    val gSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
        groupCols.map(g => df.schema(g)) :+
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType))
    import scala.jdk.CollectionConverters._
    val offDf = broadcast(spark.createDataFrame(offRows.asJava, gSchema))
    sorted.join(offDf, "__pid" +: groupCols)
      .withColumn(outCol, col("__off") + col("__cume"))
      .drop("__pid", "__cume", "__off", "__val")
  }

  /** Token-budget corpus mixing — the SELECTION half of a data recipe
    * with explicit per-source token budgets ("train on 50B tokens of
    * code, 30B of en web, everything of wiki"): each group's documents
    * are taken in deterministic pseudorandom order (md5(seed | id), the
    * [[deterministicShuffle]] key) until the group's token budget is
    * reached; the straddling document is INCLUDED (budget exhausts
    * AFTER it — [[packSequences]]' tokens-before convention), so every
    * budget is met, never undershot. Emits the surviving rows plus
    * `tokens_before` (the group's exact token count ahead of this doc —
    * the replayable admission evidence).
    *
    * Engine-portable and partitioning-invariant: the order key is md5,
    * the running total is [[groupedRunningTotal]]'s exact long
    * arithmetic, and an independent SQL engine replays admission
    * row-for-row. One corpus exchange (the range partition); no
    * per-group window. */
  def tokenBudgetMix(df: DataFrame, idCol: String, groupCol: String,
                     tokensCol: String, budgets: Map[String, Long],
                     defaultBudget: Long, seed: String): DataFrame = {
    (budgets.values.toSeq :+ defaultBudget).foreach(b =>
      require(b >= 0, s"token budgets must be non-negative: $b"))
    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBudget)) { case ((g, b), els) =>
        when(col(groupCol) === g, lit(b)).otherwise(els)
      }
    groupedRunningTotal(
      df.withColumn("__sk",
        md5(concat_ws("|", lit(seed), col(idCol).cast("string")))),
      Seq(groupCol), Seq("__sk"), tokensCol, "__rt")
      .withColumn("tokens_before", col("__rt") - col(tokensCol).cast("long"))
      .filter(col("tokens_before") < budget)
      .drop("__sk", "__rt")
  }
}
