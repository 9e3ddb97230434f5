package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PathFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import PathFunctions._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("p").select(c.as("r")).collect()(0).get(0)

  test("normalizePath collapses, leads and terminates") {
    assert(one(normalizePath($"p"), "A\\\\B\\") == "\\A\\B\\")
    assert(one(normalizePath($"p"), "\\A\\B") == "\\A\\B\\")
    assert(one(normalizePath($"p"), "A") == "\\A\\")
  }

  test("components / hlevel / last / nth") {
    assert(one(hlevel($"p"), "\\A\\B\\C\\") == 3)
    assert(one(lastPathComponent($"p"), "\\A\\B\\C\\") == "C")
    assert(one(parseNthValue($"p", 2), "\\A\\B\\C\\") == "B")
    assert(one(parseNthValue($"p", 9), "\\A\\B\\C\\") == null)
  }

  test("ancestorPaths shortest-first, self included") {
    assert(one(ancestorPaths($"p"), "\\A\\B\\C\\")
      .asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("\\A\\", "\\A\\B\\", "\\A\\B\\C\\"))
    assert(one(properAncestorPaths($"p"), "\\A\\B\\C\\")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("\\A\\", "\\A\\B\\"))
  }

  test("replaceLastPathComponent") {
    assert(one(replaceLastPathComponent($"p", lit("X")), "\\A\\B\\C\\") == "\\A\\B\\X\\")
    assert(one(replaceLastPathComponent($"p", lit("X")), "\\A\\") == "\\X\\")
  }

  test("instrFromEnd matches Oracle instr(s, sub, -1, k)") {
    // '\A\B\C\' : backslashes at 1,3,5,7
    assert(one(instrFromEnd($"p", "\\", 1), "\\A\\B\\C\\") == 7)
    assert(one(instrFromEnd($"p", "\\", 2), "\\A\\B\\C\\") == 5)
    assert(one(instrFromEnd($"p", "\\", 4), "\\A\\B\\C\\") == 1)
    assert(one(instrFromEnd($"p", "\\", 5), "\\A\\B\\C\\") == 0)
    assert(one(instrFromEnd($"p", "x", 1), "abc") == 0)
  }
}

class CleansingSpec extends SparkSpec {
  import spark.implicits._
  import CleansingFunctions._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("v").select(c.as("r")).collect()(0).get(0)

  test("fixColumn chain (ClinicalDataProcessor.groovy:335-347 semantics)") {
    assert(one(fixColumn($"v"), "  \"a%b\\c*d&e\"  ") == "aPCTbcd and e")
    assert(one(fixColumn($"v"), "plain") == "plain")
    assert(one(fixColumn($"v"), "café") == "caf") // non-ASCII stripped
  }

  test("cleanseValue ordered sweep (I2B2_LOAD_CLINICAL_DATA.sql:236-474)") {
    assert(one(cleanseValue($"v"), "|a|b|") == "a-b")
    // values KEEP underscores (SQL:440 sweeps '_' in data_label only)
    assert(one(cleanseValue($"v"), "50%_done,,") == "50 Pct_done")
    assert(one(cleanseValue($"v"), "a+b&c") == "a and b and c")
    // literal '(plus)' escapes restore AFTER the '+' sweep
    assert(one(cleanseValue($"v"), "Spain+English+German(plus)") ==
      "Spain and English and German+")
    assert(one(cleanseValue($"v"), "x  y") == "x y")
  }

  test("usubjid collapse") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(("T", "", "S1"), ("T", "2", "S2")).toDF("t", "s", "u")
    val got = df.select(usubjid($"t", $"s", $"u").as("r")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("T:S1", "T:2:S2"))
  }

  test("isNumericInverted: 0 for numeric, 1 otherwise") {
    val got = Seq("1.5", "-2e3", ".7", "abc", "1.2.3", "")
      .toDF("v").select(isNumericInverted($"v").as("r")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 0, 1, 1, 1))
  }
}

class TimeFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TimeFunctions._

  private def label(secs: Long): String =
    Seq(secs).toDF("s").select(timepointLabel($"s").as("r")).collect()(0).getString(0)

  test("timepointLabel reference semantics (TIMESTAMP_TO_TIMEPOINT.sql)") {
    assert(label(0) == "Baseline")
    assert(label(60) == "1 minute")
    assert(label(120) == "2 minutes")
    assert(label(86400 + 3600 + 60 + 1) == "1 day 1 hour 1 minute 1 second")
    assert(label(2 * 86400 + 2 * 3600) == "2 days 2 hours")
    assert(label(-3600) == "-1 hour")
    assert(label(45) == "45 seconds")
  }

  test("timestampToTimepoint parses 'yyyy-MM-dd HH:mm:ss'") {
    val df = Seq(("2024-01-03 10:30:00", "2024-01-01 10:30:00")).toDF("ts", "base")
    assert(df.select(timestampToTimepoint($"ts", $"base")).collect()(0).getString(0) == "2 days")
  }

  test("unparseable component yields null, not '' (guards key on isNotNull)") {
    val df = Seq(
      ("not a ts", "2024-01-01 10:30:00"),
      ("2024-01-03 10:30:00", "garbage"),
      (null, "2024-01-01 10:30:00")).toDF("ts", "base")
    val got = df.select(timestampToTimepoint($"ts", $"base").as("r"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(None, None, None))
    val lbl = Seq[Option[Long]](None).toDF("s")
      .select(timepointLabel($"s")).collect()(0)
    assert(lbl.isNullAt(0))
  }
}

class StatAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("exactMedian: avg of middle two (median.sql semantics)") {
    val odd = Seq(5.0, 1.0, 3.0).toDF("v")
      .agg(StatAggregators.exactMedian($"v")).collect()(0).getDouble(0)
    assert(odd == 3.0)
    val even = Seq(4.0, 1.0, 3.0, 2.0).toDF("v")
      .agg(StatAggregators.exactMedian($"v")).collect()(0).getDouble(0)
    assert(even == 2.5)
  }

  test("tukeyHinges: halves include middle when n odd") {
    // 1..9: lower half 1..5 -> 3; upper half 5..9 -> 7
    val r = (1 to 9).map(_.toDouble).toDF("v")
      .agg(StatAggregators.tukeyHinges($"v").as("h"))
      .select("h.lower_hinge", "h.median", "h.upper_hinge").collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2)) == (3.0, 5.0, 7.0))
    // 1..8: halves of 4 -> hinges 2.5 / 6.5
    val r2 = (1 to 8).map(_.toDouble).toDF("v")
      .agg(StatAggregators.tukeyHinges($"v").as("h"))
      .select("h.lower_hinge", "h.median", "h.upper_hinge").collect()(0)
    assert((r2.getDouble(0), r2.getDouble(1), r2.getDouble(2)) == (2.5, 4.5, 6.5))
  }
}

/** The SparkSessionExtensions SQL surface: every registered native
  * expression callable from spark.sql, matching its Column-API twin. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* SQL functions resolve and match the Column API") {
    Seq((1L, "the quick brown fox jumps", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("gx")
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS d, graft_l2norm(a) AS n,
        |  graft_simhash64(text) AS sh, graft_shingles(text, 3) AS sg,
        |  graft_minhash(text, 3, 4) AS mh FROM gx""".stripMargin).collect()(0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(math.abs(r.getAs[Double]("n") - math.sqrt(5.0)) < 1e-12)
    val viaColumn = Seq("the quick brown fox jumps").toDF("text")
      .select(graft.functions.TextHash.simhash64($"text").as("sh"),
        graft.functions.TextHash.shingles($"text", 3).as("sg"),
        graft.functions.TextHash.minhash($"text", 3, 4).as("mh"))
      .collect()(0)
    assert(r.getAs[String]("sh") == viaColumn.getAs[String]("sh"))
    assert(r.getSeq[String](r.fieldIndex("sg")) == viaColumn.getSeq[String](1))
    assert(r.getSeq[String](r.fieldIndex("mh")) == viaColumn.getSeq[String](2))
  }

  test("graft_winnow / graft_sign_pack / graft_hamming: SQL == Column") {
    Seq((1L, "the quick brown fox jumps over the lazy dog",
        Array(1.0f, -2.0f, 0.0f, 3.0f), Array(-1.0f, 2.0f, 1.0f, 3.0f)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("gw")
    val r = spark.sql(
      """SELECT graft_winnow(text, 3, 2) AS wn,
        |  graft_sign_pack(a) AS pa, graft_sign_pack(b) AS pb,
        |  graft_hamming(graft_sign_pack(a), graft_sign_pack(b)) AS hm
        |FROM gw""".stripMargin).collect()(0)
    val viaColumn = Seq(("the quick brown fox jumps over the lazy dog",
        Array(1.0f, -2.0f, 0.0f, 3.0f), Array(-1.0f, 2.0f, 1.0f, 3.0f)))
      .toDF("text", "a", "b")
      .select(graft.functions.TextHash.winnow($"text", 3, 2).as("wn"),
        graft.functions.VectorExpressions.signPackNative($"a").as("pa"),
        graft.functions.VectorExpressions.hammingNative(
          graft.functions.VectorExpressions.signPackNative($"a"),
          graft.functions.VectorExpressions.signPackNative($"b")).as("hm"))
      .collect()(0)
    assert(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("wn")) ==
      viaColumn.getSeq[org.apache.spark.sql.Row](0))
    assert(r.getSeq[Long](r.fieldIndex("pa")) == viaColumn.getSeq[Long](1))
    // a: signs (+,-,0,+) -> bits {0,3}; b: (-,+,+,+) -> bits {1,2,3}
    assert(r.getSeq[Long](r.fieldIndex("pa")) == Seq(9L))
    assert(r.getSeq[Long](r.fieldIndex("pb")) == Seq(14L))
    assert(r.getAs[Long]("hm") == 3L && viaColumn.getAs[Long]("hm") == 3L)
  }

  test("BPE segmentation replays in PURE SQL == Column") {
    import graft.operators.Bpe
    val docs = Seq((1L, "spark sparks sorted  sort"), (2L, "resorted"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 4)
    docs.createOrReplaceTempView("gx_bpe")
    // the apply is plain SQL: the same char-split + chained literal
    // replace any engine can run — no custom expression needed
    val joined = "trim(regexp_replace(text, '\\\\s+', ' '))"
    val ss = "concat(char(31), char(31))"
    val chain = merges.foldLeft(
      s"concat($ss, concat_ws($ss, split($joined, '')), $ss)") { (acc, m) =>
      s"replace($acc, concat(char(31), '${m.first}', $ss, '${m.second}', " +
        s"char(31)), concat(char(31), '${m.merged}', char(31)))"
    }
    val viaSql = spark.sql(
      s"""SELECT doc_id,
         |  CASE WHEN $joined = '' THEN CAST(0 AS BIGINT)
         |    ELSE CAST((length($chain)
         |           - length(translate($chain, char(31), ''))) div 2 - 1
         |         - size(split($joined, ' ')) + 1 AS BIGINT) END AS n
         |FROM gx_bpe""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaColumn = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens")).toMap
    assert(viaSql == viaColumn)
    assert(viaSql(3L) == 0L)
  }

  test("graft_race_key: SQL == Column, zero-mass weights yield null") {
    val df = Seq((1L, Option(2.5)), (2L, Option(0.0)),
      (3L, Option(Double.NaN)), (4L, Option(8.0)), (5L, Option.empty[Double]))
      .toDF("doc_id", "w")
    df.createOrReplaceTempView("rk")
    val viaSql = spark.sql(
        "SELECT doc_id, graft_race_key(doc_id, w) AS k FROM rk")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val viaColumn = df.select($"doc_id",
        graft.operators.Sampling.raceKey($"doc_id", $"w").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaSql == viaColumn)
    assert(viaSql(1L).isDefined && viaSql(4L).isDefined)
    assert(viaSql(2L).isEmpty && viaSql(3L).isEmpty && viaSql(5L).isEmpty)
    // ...and the keys ARE what weightedSample races on
    val raced = graft.operators.Sampling.weightedSample(df, "doc_id", "w", 1.0)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("race_micro")).toMap
    assert(raced == viaSql.collect { case (id, Some(k)) => id -> k })
  }

  test("graft_cm_buckets / graft_bloom_positions: plain-SQL probe == operator") {
    import graft.operators.Sketches
    val vals = (0 until 300).map(i => s"tok-${i % 40}") // skewed tokens
    val df = vals.map(Tuple1(_)).toDF("term")
    val probes = Seq("tok-1", "tok-7", "unseen-x").toDF("term")
    probes.createOrReplaceTempView("gx_probes")

    // CM: explode the SQL probe coordinates, join the counter table,
    // min-over-rows — the textbook estimate, equal to Sketches.cmEstimate
    Sketches.cmSketch(df, "term", depth = 4, width = 512)
      .createOrReplaceTempView("gx_cm")
    val viaSql = spark.sql(
      """SELECT term, min(coalesce(cnt, 0L)) AS est_count
        |FROM (SELECT term, b.row AS row, b.bucket AS bucket
        |      FROM (SELECT term,
        |              explode(graft_cm_buckets(term, 4, 512)) AS b
        |            FROM gx_probes))
        |LEFT JOIN gx_cm USING (row, bucket)
        |GROUP BY term""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaOp = Sketches.cmEstimate(
        Sketches.cmSketch(df, "term", 4, 512), probes, "term", 4, 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaOp)
    assert(viaSql("tok-1") >= 8L && viaSql("unseen-x") >= 0L)

    // Bloom: posexplode the SQL positions, join the word table, all-k
    // test with the duplicate-safe distinct-index count — equal to
    // Sketches.bloomContains
    Sketches.bloomBits(df, "term", mBits = 4096, k = 5)
      .createOrReplaceTempView("gx_bloom")
    val bSql = spark.sql(
      """SELECT term,
        |  count(DISTINCT CASE WHEN bits IS NOT NULL
        |    AND (bits >> (pos % 63)) & 1 = 1 THEN i END) AS bits_set,
        |  count(DISTINCT CASE WHEN bits IS NOT NULL
        |    AND (bits >> (pos % 63)) & 1 = 1 THEN i END) = 5 AS maybe_member
        |FROM (SELECT term, p.i, p.pos,
        |        CAST(p.pos / 63 AS int) AS word
        |      FROM gx_probes
        |      LATERAL VIEW posexplode(graft_bloom_positions(term, 4096, 5))
        |        p AS i, pos)
        |LEFT JOIN gx_bloom USING (word)
        |GROUP BY term""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    val bOp = Sketches.bloomContains(
        Sketches.bloomBits(df, "term", 4096, 5), probes, "term", 4096, 5)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("bits_set"), r.getAs[Boolean]("maybe_member")))).toMap
    assert(bSql == bOp)
    assert(bSql("tok-1") == ((5L, true)) && bSql("tok-7") == ((5L, true)))

    // qsketch buckets: plain-SQL groupBy(lo, width) == Sketches.qsketchBuckets
    val nums = (1 to 500).map(i => Tuple1((i * i).toLong)).toDF("v")
    nums.createOrReplaceTempView("gx_nums")
    val qSql = spark.sql(
      """SELECT graft_qsketch_lo(v, 7) AS blo,
        |  graft_qsketch_width(v, 7) AS bw, count(1) AS cnt
        |FROM gx_nums GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qOp = Sketches.qsketchBuckets(nums, Seq.empty, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(qSql == qOp)
  }

  test("sketch_quantile_gate replays in PURE SQL: buckets, interpolation and gate == Column") {
    // the documented fold/probe recipe for SQL-only users: the bucket
    // exprs (graft_qsketch_lo/width) feed a per-group cumulation window,
    // the target rank t = max(1, ceil(q*n)) picks the covering bucket,
    // and the linear interpolation across [blo, blo+bw-1] is one rounded
    // IEEE division — line-for-line Sketches.qsketchQuantiles, with the
    // same gate join the sketch_quantile_gate query runs. Windows here
    // ride the BOUNDED bucket table (never the corpus), and the corpus
    // passes exactly twice (buckets + gate), same as the Column plan.
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("gx_docs")
    val sql = spark.sql(
      """WITH b AS (
        |  SELECT lang, graft_qsketch_lo(v, 7) AS blo,
        |    graft_qsketch_width(v, 7) AS bw, count(1) AS cnt
        |  FROM (SELECT lang, try_cast(n_chars AS BIGINT) AS v FROM gx_docs)
        |  WHERE v IS NOT NULL AND v != -9223372036854775808
        |  GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT lang, blo, bw, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY blo, bw
        |                   ROWS UNBOUNDED PRECEDING) AS cume,
        |    sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM b),
        |p AS (
        |  SELECT lang,
        |    round(cast(blo AS DOUBLE) + cast(bw - 1 AS DOUBLE) *
        |      cast(t - (cume - cnt) - 1 AS DOUBLE) /
        |      cast(greatest(cnt - 1, cast(1 AS BIGINT)) AS DOUBLE), 4) AS p50
        |  FROM (SELECT *, greatest(cast(1 AS BIGINT), ceil(0.5 * n)) AS t
        |        FROM c)
        |  WHERE cume - cnt < t AND t <= cume)
        |SELECT d.lang, p.p50, count(1) AS kept, min(d.n_chars) AS min_kept
        |FROM gx_docs d JOIN p ON d.lang = p.lang
        |WHERE cast(d.n_chars AS DOUBLE) >= p.p50
        |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val viaColumn = graft.SparkEntry.queries("sketch_quantile_gate")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sql == viaColumn, s"SQL replay diverged:\nsql=$sql\ncol=$viaColumn")
  }

  test("graft_normalize: SQL == Column on dirty unicode") {
    val dirty = "\u201Cq\u201D\u2026 a\u200Bb \u2014 c\u00A0\u00A0d\te "
    val df = Seq((1L, dirty)).toDF("id", "t")
    df.createOrReplaceTempView("gx_norm")
    val viaSql = spark.sql("SELECT graft_normalize(t) AS n FROM gx_norm")
      .collect()(0).getString(0)
    val viaCol = df.select(
        graft.operators.TextAnalysis.normalizeText($"t").as("n"))
      .collect()(0).getString(0)
    assert(viaSql == viaCol, s"sql=$viaSql col=$viaCol")
    assert(viaSql == "\"q\"... ab - c d e", viaSql)
  }

  test("HLL and KMV distinct estimates replay in PURE SQL == Column") {
    // the estimate (fold/probe) layer of the cardinality sketches as a
    // documented SQL recipe. Float literals carry the D suffix — Spark
    // SQL parses bare decimals as DECIMAL, whose division semantics
    // would drift from the Column API's doubles.
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("gx_docs")
    val hllSql = spark.sql(
      """WITH s AS (
        |  SELECT lang,
        |    cast(conv(substring(hex, 1, 4), 16, 10) AS INT) % 4096 AS bucket,
        |    regexp_replace(substring(hex, 5, 12), '^0+', '') AS stripped
        |  FROM (SELECT lang, md5(cast(text AS STRING)) AS hex FROM gx_docs)),
        |regs AS (
        |  SELECT lang, bucket, max(
        |    CASE WHEN length(stripped) = 0 THEN 49
        |    ELSE (12 - length(stripped)) * 4 +
        |      CASE WHEN substring(stripped, 1, 1) = '1' THEN 3
        |           WHEN substring(stripped, 1, 1) IN ('2','3') THEN 2
        |           WHEN substring(stripped, 1, 1) IN ('4','5','6','7') THEN 1
        |           ELSE 0 END + 1 END) AS mj
        |  FROM s GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, count(1) AS m_used,
        |    sum(shiftleft(cast(1 AS BIGINT), 50 - mj)) AS s_present
        |  FROM regs GROUP BY 1),
        |e AS (
        |  SELECT lang, m_used,
        |    s_present + (4096L - m_used) * shiftleft(cast(1 AS BIGINT), 50)
        |      AS reg_sum,
        |    4096L - m_used AS v_empty
        |  FROM agg)
        |SELECT lang, m_used, reg_sum,
        |  round(CASE WHEN est_raw <= 2.5D * 4096 AND v_empty > 0
        |    THEN 4096 * ln(cast(4096 AS DOUBLE) / v_empty)
        |    ELSE est_raw END, 4) AS est_distinct
        |FROM (SELECT *,
        |    0.7213D / (1.0D + 1.079D / 4096.0D) * 4096 * 4096 /
        |      (reg_sum / shiftleft(cast(1 AS BIGINT), 50)) AS est_raw
        |  FROM e)""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val hllCol = graft.operators.Sketches.hllDistinct(
        spark.read.parquet(s"$dir/documents.parquet"), Seq("lang"), "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(hllSql == hllCol, s"HLL SQL replay diverged:\n$hllSql\n$hllCol")

    // KMV: the bounded bottom-k aggregate replays as the k-slice of the
    // sorted distinct hash set; the estimate is the same integer-derived
    // fraction fold
    val kmvSql = spark.sql(
      """WITH s AS (
        |  SELECT lang, slice(array_sort(collect_set(
        |    md5(cast(text AS STRING)))), 1, 256) AS hashes
        |  FROM gx_docs GROUP BY lang)
        |SELECT lang, cast(size(hashes) AS BIGINT) AS n_kept,
        |  element_at(hashes, -1) AS kth_hash,
        |  round(CASE WHEN size(hashes) < 256 THEN size(hashes) * 1.0D
        |    ELSE 255 / (cast(conv(substring(element_at(hashes, -1), 1, 13),
        |      16, 10) AS BIGINT) / 4503599627370496L) END, 4)
        |    AS est_distinct
        |FROM s""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    val kmvCol = graft.operators.Sketches.kmvDistinct(
        spark.read.parquet(s"$dir/documents.parquet"), Seq("lang"), "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    assert(kmvSql == kmvCol, s"KMV SQL replay diverged:\n$kmvSql\n$kmvCol")
  }
}
