package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketches for corpus-scale analytics — HyperLogLog
  * (Flajolet, Fusy, Gandouet, Meunier 2007) built engine-portable.
  *
  * Why not `approx_count_distinct`: Spark's built-in HLL++ is opaque
  * binary state — not mergeable across engines, not verifiable by an
  * external oracle, and its estimate depends on internal hashing. This
  * implementation fixes every bit: md5 bucketing, STRING-based
  * leading-zero ranks (no float log2 whose `floor` could differ at exact
  * powers of two between libm builds), and an exact INTEGER register sum
  * (sum of 2^(50-Mj) as BIGINT — summation-order-free where a float
  * sum of 2^-Mj is not), so the DuckDB oracle replays the whole sketch
  * value-for-value and two engines always agree on the estimate.
  *
  * 100 TB shape: ONE projection pass computes (bucket, rho) per row; the
  * register table is a map-side-combinable max aggregate bounded at
  * m = 2^p rows PER GROUP (4096 for p=12 — broadcastable, mergeable);
  * the estimate is a per-group fold over its registers. max() is
  * commutative/associative/idempotent, so registers merge freely across
  * partitions, batches, days or engines — [[hllMergeRegisters]] unions
  * register tables from incremental runs without rescanning anything.
  * No shuffle ever carries more than groups x m rows. */
object Sketches {

  /** Per-row (bucket, rho) + register max: one row per (group, bucket)
    * present in the data. p in [4, 14]: bucket = low p bits of the first
    * 16 md5 bits; rho = leading-zero count of the NEXT 48 bits + 1
    * (independent slices of the digest). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")
    val m = 1 << p
    val hex = md5(col(valueCol).cast("string"))
    val bucket = (conv(substring(hex, 1, 4), 16, 10).cast("int") % m)
      .as("bucket")
    // leading zeros of the 48-bit slice via string ops — exact on both
    // engines (a float floor(log2(v)) can disagree at 2^k boundaries)
    val stripped = regexp_replace(substring(hex, 5, 12), "^0+", "")
    val clz4 = when(substring(stripped, 1, 1) === "1", 3)
      .when(substring(stripped, 1, 1).isin("2", "3"), 2)
      .when(substring(stripped, 1, 1).isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(length(stripped) === 0, lit(49))
      .otherwise((lit(12) - length(stripped)) * 4 + clz4 + 1)
    df.select(groupCols.map(col) ++ Seq(bucket, rho.as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Merge register tables from independent runs (days, partitions,
    * engines): plain union + max — the HLL merge is lossless. */
  def hllMergeRegisters(regs: DataFrame*): DataFrame =
    regs.reduce(_ unionByName _)
      .groupBy(regs.head.columns.filter(_ != "mj").map(col): _*)
      .agg(max(col("mj")).as("mj"))

  /** Estimate from a register table: standard HLL with the small-range
    * linear-counting correction (the large-range correction is unneeded
    * with a 48-bit rho slice). Emits the exact integer `reg_sum` beside
    * the rounded estimate so a hash gate pins the whole register state,
    * not only the final float. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
                  p: Int = 12): DataFrame = {
    val m = 1 << p
    // S = sum over ALL m registers of 2^(50-Mj) as exact BIGINT (empty
    // registers have Mj=0 -> 2^50 each); max per-term 2^49, max total
    // 2^62 — no overflow
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("m_used"),
        sum(expr("shiftleft(cast(1 as bigint), 50 - mj)")).as("__s_present"))
      .withColumn("__v_empty", lit(m.toLong) - col("m_used"))
      .withColumn("reg_sum",
        col("__s_present") + col("__v_empty") * lit(1L << 50))
      // est_raw = alpha_m * m^2 / sum(2^-Mj); the division by 2^50 is an
      // exact exponent shift, every float op mirrored by the oracle
      .withColumn("__est_raw",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
          lit(m) * lit(m) / (col("reg_sum") / lit(1L << 50)))
      .withColumn("est_distinct",
        round(when(col("__est_raw") <= lit(2.5) * lit(m) &&
            col("__v_empty") > 0L,
          lit(m) * log(lit(m.toDouble) / col("__v_empty")))
          .otherwise(col("__est_raw")), 4))
      .select(groupCols.map(col) ++
        Seq(col("m_used"), col("reg_sum"), col("est_distinct")): _*)
  }

  /** One-call sketch: registers + estimate. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 12): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** KMV (bottom-k minimum values, Bar-Yossef et al. 2002) distinct
    * sketch as a BOUNDED custom typed Aggregator — the buffer holds at
    * most k sorted distinct md5 hex strings (k x 32 bytes), partial
    * buffers merge map-side, and NOTHING group-sized is ever collected
    * (contrast the window/rank formulation, which sorts each whole
    * group). Because md5 is fixed and bottom-k-of-distinct is a pure set
    * function, the result is partitioning- and order-invariant, and the
    * kept hashes double as a deterministic uniform sample of the group's
    * DISTINCT values (hash-order sampling) — the estimate and HLL
    * cross-check each other.
    *
    * Estimate: exact n when the group has fewer than k distincts
    * (the sketch IS the distinct set), else (k-1) / frac(kth smallest)
    * with frac = first 52 hash bits / 2^52 — integer-derived, every
    * float op mirrored by the oracle. */
  final case class Kmv(hashes: Seq[String])

  private final class BottomKAgg(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      String, scala.collection.mutable.ArrayBuffer[String], Kmv] {
    import scala.collection.mutable.ArrayBuffer
    def zero: ArrayBuffer[String] = ArrayBuffer.empty
    private def insert(b: ArrayBuffer[String], v: String): ArrayBuffer[String] = {
      // sorted-unique capped insert; hex strings compare numerically
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < b.length && b(lo) == v) b        // duplicate
      else if (b.length < k) { b.insert(lo, v); b }
      else if (lo < k) { b.insert(lo, v); b.remove(k); b }
      else b                                     // above the cap
    }
    def reduce(b: ArrayBuffer[String], a: String): ArrayBuffer[String] =
      insert(b, a)
    def merge(b1: ArrayBuffer[String],
              b2: ArrayBuffer[String]): ArrayBuffer[String] = {
      var i = 0
      while (i < b2.length) { insert(b1, b2(i)); i += 1 }
      b1
    }
    def finish(b: ArrayBuffer[String]): Kmv = Kmv(b.toSeq)
    def bufferEncoder = Encoders.kryo[ArrayBuffer[String]]
    def outputEncoder = Encoders.product[Kmv]
  }

  /** Count-Min sketch (Cormode, Muthukrishnan 2005): frequency counters
    * for heavy-hitter estimation without a vocabulary-sized aggregate.
    * The `depth` hash rows are SLICES of one md5 digest — 16 bits (4 hex
    * chars) per row, exactly uniform because `width` must divide 2^16 —
    * so each value hashes ONCE however deep the sketch is (the salted
    * md5-per-row form pays depth digests per value on every build and
    * probe pass; at web scale that is the dominant cost of the sketch).
    * The upper-bound property needs no independence between rows, and
    * distinct digest bits are as independent as distinct salted digests
    * for estimate quality. Counters are SUMS, so the sketch is
    * summation-order-invariant, partial-aggregates map-side, and two
    * sketches merge by adding counters. Returns (row, bucket, cnt) — at
    * most depth x width rows regardless of corpus size. */
  def cmSketch(df: DataFrame, valueCol: String, depth: Int = 4,
               width: Int = 8192): DataFrame = {
    requireCmShape(depth, width)
    // the digest is a projected column, so it evaluates once per value
    // (not once per depth row — see the HOF/CSE materialization rule)
    cmCounters(
      df.select(md5(col(valueCol).cast("string")).as("__cmh")), depth, width)
  }

  /** [[cmSketch]] over a frame that already carries the `__cmh` digest —
    * shared with [[cmHeavyHitters]], whose probe pass reuses the same
    * digest column instead of re-hashing the corpus. */
  private def cmCounters(hashed: DataFrame, depth: Int,
                         width: Int): DataFrame = {
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("row"), cmBucket(col("__cmh"), j, width).as("bucket")))
    hashed
      .select(explode(array(rows: _*)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  private[graft] def requireCmShape(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth in [1,8], got $depth")
    require(width >= 16 && width <= 65536 && 65536 % width == 0,
      s"width must be a power-of-two divisor of 65536 (16-bit slices stay exactly uniform), got $width")
  }

  /** The row-j bucket from a value's md5 hex: hex chars [4j+1, 4j+4]
    * (16 independent digest bits per row; depth <= 8 fits the 32-char
    * digest), mod width — exact because width divides 2^16. */
  private[graft] def cmBucket(hexCol: org.apache.spark.sql.Column, j: Int,
                       width: Int): org.apache.spark.sql.Column =
    (conv(substring(hexCol, 4 * j + 1, 4), 16, 10)
      .cast("long") % width).cast("int")

  /** Bloom filter (Bloom 1970) as a relational bit array: `mBits` bits
    * stored as 64-bit words, `k` double-hashed probes from ONE md5 digest
    * per value (see [[posExprs]]). Building is
    * ONE corpus scan into a bit_or aggregate — OR is
    * commutative/associative/idempotent, so the sketch is
    * order/partition/duplicate-invariant and filters from independent
    * runs merge by OR ([[bloomMergeBits]]). The word table is bounded at
    * ceil(mBits/63) rows (63 usable bits per word — see below; 2081
    * longs ~= 17 KB at the default), broadcastable —
    * the scale path for membership tests too big to broadcast exactly
    * (benchmark decontamination against a huge benchmark set, seen-URL
    * suppression). False-positive rate ~ (1 - e^(-kn/m))^k; never a
    * false negative. Engine-portable: same md5 positions, same integer
    * shifts — the DuckDB oracle replays the words bit-for-bit. */
  def bloomBits(df: DataFrame, valueCol: String, mBits: Int = 131072,
                k: Int = 5): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 8, s"k in [1,8], got $k")
    // 63 bits per word: bit 63 would be 1<<63, which overflows a SIGNED
    // BIGINT shift in engines that check (DuckDB) while Spark wraps —
    // capping the shift at 62 keeps the words bit-identical everywhere
    df.select(md5(col(valueCol).cast("string")).as("__bh"))
      .select(posExprs(col("__bh"), mBits, k).as("__pos"))
      .select(explode(col("__pos")).as("pos"))
      .select((col("pos") / 63).cast("int").as("word"),
        expr("shiftleft(cast(1 as bigint), pos % 63)").as("bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
  }

  /** The k probe positions from a value's md5 hex via double hashing
    * (Kirsch, Mitzenmacher 2006 — preserves the Bloom FP bound):
    * pos_i = (h1 + i*h2) mod m with h1 = first 8 hex chars, h2 = next 8
    * forced odd. ONE digest per value however large k is (the salted
    * md5-per-probe form pays k digests on every build and probe pass),
    * and h1 uniform mod a power-of-two m keeps every position exactly
    * uniform. Max magnitude h1 + 7*h2 < 2^36 — no BIGINT overflow. */
  private[graft] def posExprs(hexCol: org.apache.spark.sql.Column, mBits: Int,
                       k: Int): org.apache.spark.sql.Column = {
    val h1 = conv(substring(hexCol, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(hexCol, 9, 8), 16, 10).cast("long") * 2 + 1
    array((0 until k).map(i =>
      ((h1 + lit(i.toLong) * h2) % mBits).cast("int")): _*)
  }

  /** Merge Bloom word tables from independent runs: bits OR. */
  def bloomMergeBits(bits: DataFrame*): DataFrame =
    bits.reduce(_ unionByName _)
      .groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))

  /** Membership test: `maybe_member` is true iff ALL k probed bits are
    * set (no false negatives; false positives at the designed rate).
    * The word table broadcasts. Scratch columns are `__`-prefixed like
    * the rest of the file, so a probe frame may carry its own
    * `pos`/`word`/`bit`/`bits` columns without ambiguous-reference
    * errors; `bits_set`/`maybe_member` are the OUTPUT columns and remain
    * reserved.
    *
    * Output is one row per DISTINCT probe tuple. `bits_set` counts the
    * probe INDICES 0..k-1 whose bit is set (count-distinct over the
    * posexplode index), not a sum of hit rows — so fully-duplicated
    * probe rows, which collapse into one group, cannot inflate the count
    * to 2k and flip `maybe_member` false for a present value (that would
    * be a false negative, violating the Bloom contract). Two indices
    * colliding onto one set position still count as two, matching the
    * per-index semantics of the all-k test. */
  def bloomContains(bits: DataFrame, probes: DataFrame, probeCol: String,
                    mBits: Int = 131072, k: Int = 5): DataFrame = {
    val pCols = probes.columns.map(col).toSeq
    val words = bits.select(col("word").as("__word"), col("bits").as("__bits"))
    probes
      .select(pCols :+ md5(col(probeCol).cast("string")).as("__bh"): _*)
      .select(pCols :+ posExprs(col("__bh"), mBits, k).as("__pos"): _*)
      .select(pCols ++ Seq(posexplode(col("__pos")).as(Seq("__i", "__p"))): _*)
      .select(pCols ++ Seq(col("__i"),
        (col("__p") / 63).cast("int").as("__word"),
        (col("__p") % 63).as("__bit")): _*)
      .join(broadcast(words), Seq("__word"), "left")
      .withColumn("__hit",
        when(col("__bits").isNotNull &&
          expr("(__bits >> __bit) & 1") === 1L, col("__i")))
      .groupBy(pCols: _*)
      .agg(countDistinct(col("__hit")).as("bits_set"))
      .withColumn("maybe_member", col("bits_set") === k)
  }

  /** Merge Count-Min counter tables from independent runs: counters add. */
  def cmMergeCounters(counters: DataFrame*): DataFrame =
    counters.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of each probe value: the classic
    * min-over-rows upper bound (est >= true count always; over-estimates
    * shrink as width grows). `probes` is a small frame with `probeCol`;
    * the counter table broadcasts (depth x width rows). */
  def cmEstimate(counters: DataFrame, probes: DataFrame, probeCol: String,
                 depth: Int = 4, width: Int = 8192): DataFrame = {
    requireCmShape(depth, width)
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("row"), cmBucket(col("__cmh"), j, width).as("bucket")))
    // scratch columns __-prefixed so a probe frame named row/bucket/cnt
    // cannot collide with the sketch internals
    val cnts = counters.select(col("row").as("__row"),
      col("bucket").as("__bucket"), col("cnt").as("__cnt"))
    probes
      .withColumn("__cmh", md5(col(probeCol).cast("string")))
      .select(col(probeCol), explode(array(rows: _*)).as("__rb"))
      .select(col(probeCol), col("__rb.row").as("__row"),
        col("__rb.bucket").as("__bucket"))
      .join(broadcast(cnts), Seq("__row", "__bucket"), "left")
      .groupBy(col(probeCol))
      // a probe hashing to a counter no value touched reads 0, not null
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("est_count"))
  }

  /** Deterministic quantile sketch — a base-2 sub-bucketed histogram (the
    * DDSketch idea of Masson, Rim, Lee 2019, rebuilt on EXACT integer
    * bucketing so two engines agree bit-for-bit; same reason
    * [[hllRegisters]] avoids float log2). Completes the sketch family:
    * the exact median/Tukey Aggregators buffer whole groups — right for
    * the reference's ~30-sample probe groups, a scale cliff for
    * corpus-level stats — and `approx_percentile` is opaque non-mergeable
    * binary state.
    *
    * Bucketing: |v| < 2^subBits is its own exact bucket; otherwise with
    * e = floor(log2 |v|) (computed as binary-string length - 1 — exact
    * integer ops, never float log) the bucket keeps the top `subBits`
    * bits: width 2^(e-subBits), lower bound (|v| >> sh) << sh, mirrored
    * for negatives. Every step is integer shifts/div both engines
    * replay exactly.
    *
    * Guarantees: relative error of any quantile <= 2^-subBits (0.78% at
    * the default 7) — the answer lands in the true value's bucket and a
    * bucket's width is < 2^-subBits of its magnitude; exact below
    * 2^subBits. State is bounded at ~2^(subBits+1) x (64-subBits) rows
    * per group (~14.6k at the default) regardless of data volume —
    * broadcastable, and counts are SUMS: order/partition/duplicate-run
    * invariant, partials combine map-side, and sketches from independent
    * runs merge losslessly via [[qsketchMerge]].
    *
    * Values must cast to BIGINT (fix scale upstream for decimals);
    * nulls, NaNs, Long.MinValue and out-of-range doubles DROP (try_cast
    * — the reader-fuzz discipline: malformed cells never throw from
    * scan tasks under ANSI mode). */
  def qsketchBuckets(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     subBits: Int = 7): DataFrame = {
    require(subBits >= 2 && subBits <= 16, s"subBits in [2,16], got $subBits")
    // bucket bounds come from the native codegen expressions
    // (Long.numberOfLeadingZeros + shifts — zero allocation inside
    // whole-stage codegen); the CONTRACT they implement is the
    // string-formulated floor(log2) both engines share, which the DuckDB
    // oracle still replays bit-for-bit and the spec cross-checks
    // driver-side at every magnitude
    df.select(groupCols.map(col) :+
        expr(s"try_cast(`$valueCol` as bigint)").as("__v"): _*)
      .filter(col("__v").isNotNull && col("__v") =!= Long.MinValue)
      .groupBy(groupCols.map(col) :+
        graft.functions.SketchExpressions.qsketchLo(col("__v"), subBits)
          .as("blo") :+
        graft.functions.SketchExpressions.qsketchWidth(col("__v"), subBits)
          .as("bw"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge quantile-sketch bucket tables from independent runs (days,
    * partitions, engines): union + sum — the histogram merge is
    * lossless. */
  def qsketchMerge(bkts: DataFrame*): DataFrame =
    bkts.reduce(_ unionByName _)
      .groupBy(bkts.head.columns.filterNot(_ == "cnt").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantiles from a bucket table: for each q, target rank
    * t = max(1, ceil(q*n)), the covering bucket by cumulative count, and
    * a linear interpolation across the bucket's integer span
    * [blo, blo+bw-1] — integer inputs, one IEEE division (exactly
    * rounded, engine-portable), rounded to 4 dp like the rest of the
    * file. The windows partition per group over the BOUNDED bucket rows
    * (never the data). Returns (groupCols..., q, n, lo, est). */
  def qsketchQuantiles(bkts: DataFrame, groupCols: Seq[String],
                       qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ordered = byGroup.orderBy(col("blo"), col("bw"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bkts
      .withColumn("__cume", sum(col("cnt")).over(ordered))
      .withColumn("n", sum(col("cnt")).over(byGroup))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("__t", greatest(lit(1L), ceil(col("q") * col("n"))))
      .filter(col("__cume") - col("cnt") < col("__t") &&
        col("__t") <= col("__cume"))
      .withColumn("est", round(col("blo") +
        (col("bw") - lit(1L)).cast("double") *
          (col("__t") - (col("__cume") - col("cnt")) - lit(1L)).cast("double") /
          greatest(col("cnt") - lit(1L), lit(1L)).cast("double"), 4))
      .select(groupCols.map(col) ++
        Seq(col("q"), col("n"), col("blo").as("lo"), col("est")): _*)
  }

  /** One-call quantile sketch: buckets + quantiles. */
  def qsketchQuantilesOf(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, qs: Seq[Double],
                         subBits: Int = 7): DataFrame =
    qsketchQuantiles(qsketchBuckets(df, groupCols, valueCol, subBits),
      groupCols, qs)

  /** The raw per-group bottom-k sketch: (groupCols..., hashes) with
    * `hashes` the sorted bottom-k distinct md5 hex strings of the
    * group's values. The shared substrate for [[kmvDistinct]] and
    * [[kmvOverlap]] — one bounded aggregate, map-side combinable. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int = 256): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    val bottomK = udaf(new BottomKAgg(k))
    df.select(groupCols.map(col) :+
        md5(col(valueCol).cast("string")).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("__h")).as("__kmv"))
      .select(groupCols.map(col) :+
        col("__kmv").getField("hashes").as("hashes"): _*)
  }

  /** The (n_kept, kth_hash, est_distinct) estimate columns shared by the
    * per-group and union sketches: exact n below k, else
    * (k-1)/frac(kth smallest). */
  private def kmvEstimate(hashes: org.apache.spark.sql.Column,
                          k: Int): Seq[org.apache.spark.sql.Column] = {
    val nKept = size(hashes).cast("long")
    val kth = element_at(hashes, -1)
    Seq(nKept.as("n_kept"), kth.as("kth_hash"),
      round(when(nKept < k, nKept * lit(1.0))
        .otherwise(lit(k - 1) /
          (conv(substring(kth, 1, 13), 16, 10).cast("long")
            / lit(1L << 52))), 4).as("est_distinct"))
  }

  /** KMV distinct estimate per group: (groupCols..., n_kept, kth_hash,
    * est_distinct). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 256): DataFrame =
    kmvSketch(df, groupCols, valueCol, k)
      .select(groupCols.map(col) ++ kmvEstimate(col("hashes"), k): _*)

  /** Pairwise set-overlap estimates between the groups of one column —
    * corpus-overlap / contamination triage (how much does slice A share
    * with slice B?) WITHOUT ever joining the underlying data: each group
    * is reduced to its bounded KMV sketch first, and every pair estimate
    * is a pure array fold over two <=k-hash sketches.
    *
    * The union sketch K(A union B) is the bottom-k of the two sketches'
    * hash union (valid because the k smallest hashes of A union B are
    * each among the k smallest of their own side), and for any hash in
    * it, membership in A equals membership in K_A — so
    * `both_cnt = |K(A u B) n A n B|` is exact, and
    * `est_jaccard = both_cnt / |K(A u B)|` is the standard KMV Jaccard
    * estimator (exact when the union has fewer than k distincts).
    * est_intersection = est_jaccard * est_union.
    *
    * 100 TB shape: ONE bounded aggregate over the data (the sketch),
    * then a groups^2-row broadcast self-join of sketch rows — the
    * pair stage never touches the corpus, so 50 corpus slices cost 1225
    * pair rows of k-array arithmetic, not 1225 data joins. Deterministic
    * (md5) and engine-portable: the DuckDB oracle replays sketches,
    * union ranks and every estimate bit-for-bit.
    *
    * Returns one row per unordered group pair (groupCol_a < groupCol_b):
    * (groupCol_a, groupCol_b, n_kept, kth_hash, both_cnt, est_union,
    * est_jaccard, est_intersection). */
  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: String,
                 k: Int = 256): DataFrame = {
    val sk = kmvSketch(df, Seq(groupCol), valueCol, k)
    val a = sk.select(col(groupCol).as(s"${groupCol}_a"),
      col("hashes").as("__ha"))
    val b = sk.select(col(groupCol).as(s"${groupCol}_b"),
      col("hashes").as("__hb"))
    val ku = slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k)
    a.join(broadcast(b), col(s"${groupCol}_a") < col(s"${groupCol}_b"))
      // __ku is referenced three times below, so CollapseProject keeps it
      // a real projected column — the sort/union runs once per pair
      .withColumn("__ku", ku)
      .withColumn("both_cnt", size(filter(col("__ku"), h =>
        array_contains(col("__ha"), h) && array_contains(col("__hb"), h)))
        .cast("long"))
      .select(Seq(col(s"${groupCol}_a"), col(s"${groupCol}_b")) ++
        kmvEstimate(col("__ku"), k) :+ col("both_cnt"): _*)
      .withColumnRenamed("est_distinct", "est_union")
      .withColumn("est_jaccard",
        round(col("both_cnt") * lit(1.0) / col("n_kept"), 4))
      .withColumn("est_intersection",
        round(col("est_jaccard") * col("est_union"), 4))
  }

  /** EXACT heavy hitters (all values with count >= ceil(minShare * n))
    * without a vocabulary-sized shuffle: the classic two-pass CM filter.
    *
    * Pass 1 builds the bounded Count-Min counter table (depth x width
    * rows, map-side combinable) and collects it — the sketch, never the
    * data. The exact row count n is sum(cnt)/depth (each row increments
    * exactly one counter per hash row), so the threshold needs no extra
    * scan. Hot buckets (cnt >= threshold) become a depth x width BIT
    * MAP embedded as a literal — at the default 4 x 8192 that is 524
    * longs, ~4 KB of task binary.
    *
    * Pass 2 re-scans and keeps a row only if ALL depth of its buckets
    * are hot — a pure codegen'd filter, no join. CM estimates are upper
    * bounds (est >= true count), so every true heavy hitter survives
    * (no false negatives); false positives are removed by the exact
    * count + final HAVING. The result is therefore EXACT and identical
    * to a plain groupBy/HAVING — but the shuffle after the filter
    * carries only candidate rows. At 100 TB a token count shuffles a
    * web-scale long-tail vocabulary; here the tail dies map-side and
    * only near-threshold values shuffle at all.
    *
    * Returns (valueCol, exact_count), one row per heavy hitter. Nulls
    * are not candidates. Degenerate thresholds (minShare so low every
    * bucket is hot) fall back to plain-groupBy behavior — correct,
    * just unpruned. */
  def cmHeavyHitters(df: DataFrame, valueCol: String, minShare: Double,
                     depth: Int = 4, width: Int = 8192,
                     workTable: DataFrame => DataFrame = identity): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0,1), got $minShare")
    // ONE (value, digest) projection feeds BOTH passes. Before r16 each
    // pass re-derived the corpus (tokenize upstream + md5 here: two full
    // evaluations — §5 work-table discipline); `workTable` lets callers
    // materialize the shared frame once (size-gated at the call site so
    // the 100 TB plan keeps the plain two-pass shape — the recompute is
    // then scan-parallel and a corpus copy to executor storage is the
    // greater evil). Pass 1's driver collect is the first action, so a
    // lazy localCheckpoint materializes exactly once.
    val rows = workTable(df.filter(col(valueCol).isNotNull)
      .select(col(valueCol), md5(col(valueCol).cast("string")).as("__cmh")))
    // bounded driver collect: the counter table, <= depth*width rows
    val counters = cmCounters(rows.select(col("__cmh")), depth, width)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = counters.map(_._3).sum / depth
    val threshold = math.max(1L, math.ceil(minShare * total).toLong)
    // 63 usable bits per word, same layout rationale as bloomBits
    val wordsPerRow = (width + 62) / 63
    val words = Array.fill(depth * wordsPerRow)(0L)
    counters.foreach { case (j, bucket, cnt) =>
      if (cnt >= threshold)
        words(j * wordsPerRow + bucket / 63) |= (1L << (bucket % 63))
    }
    val wlit = typedLit(words.toSeq)
    // pass 2 probes off the SAME projected digest pass 1 counted from
    val withBuckets = rows
      .select(col(valueCol) +:
        (0 until depth).map(j =>
          cmBucket(col("__cmh"), j, width).as(s"__b$j")): _*)
    val probed = (0 until depth).foldLeft(withBuckets) { (d, j) =>
      d.withColumn(s"__w$j",
          element_at(wlit, expr(s"cast(__b$j div 63 as int) + ${j * wordsPerRow + 1}")))
        .withColumn(s"__s$j", expr(s"cast(__b$j % 63 as int)"))
    }
    val hot = (0 until depth)
      .map(j => expr(s"((__w$j >> __s$j) & 1) = 1"))
      .reduce(_ && _)
    probed.filter(hot)
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= threshold)
  }
}
