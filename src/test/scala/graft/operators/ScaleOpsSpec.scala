package graft.operators

import graft.SparkSpec
import graft.sources.AcghMelt
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedDistinctCount equals plain countDistinct") {
    val df = (1 to 500).map(i => ("hot", i % 37)) ++ Seq(("cold", 1), ("cold", 2))
    val in = df.toDF("k", "e")
    val salted = Skew.saltedDistinctCount(in, "k", "e", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = in.groupBy($"k").agg(countDistinct($"e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 37)
  }

  test("saltedJoin equals plain join") {
    val fact = (1 to 100).map(i => (if (i % 10 == 0) "k1" else "k2", i)).toDF("k", "v")
    val dim = Seq(("k1", "A"), ("k2", "B")).toDF("k", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", spreadCols = Seq("v"))
      .groupBy($"label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = fact.join(dim, "k")
      .groupBy($"label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}

class AcghMeltSpec extends SparkSpec {
  import spark.implicits._

  test("7-column group melt to per-sample rows") {
    val df = Seq(
      ("r1", "0.1", "0.2", "0", "0.0", "0.9", "0.1", "0.0",
             "1.1", "1.2", "1", "0.1", "0.8", "0.1", "0.0"))
      .toDF("region_id",
        "S1.chip", "S1.segmented", "S1.flag", "S1.probloss", "S1.probnorm",
        "S1.probgain", "S1.probamp",
        "S2.chip", "S2.segmented", "S2.flag", "S2.probloss", "S2.probnorm",
        "S2.probgain", "S2.probamp")
    val m = AcghMelt.melt(df)
    assert(m.count() == 2)
    val s2 = m.filter($"sample_id" === "S2").collect()(0)
    assert(s2.getAs[String]("chip") == "1.1" && s2.getAs[String]("flag") == "1")
    assert(m.columns.toSeq ==
      Seq("region_id", "sample_id") ++ AcghMelt.Metrics)
  }
}

class SecurityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("i2b2_secure tokens, upsert, token swap") {
    val i2b2 = Seq(("\\S\\A\\", 2)).toDF("c_fullname", "c_hlevel")
    val sec = SecurityOps.rebuildI2b2Secure(i2b2, "GS1", secure = true).collect()(0)
    assert(sec.getAs[String]("secure_obj_token") == "EXP:GS1")
    val pub = SecurityOps.rebuildI2b2Secure(i2b2, "GS1", secure = false).collect()(0)
    assert(pub.getAs[String]("secure_obj_token") == "EXP:PUBLIC")

    val existing = Seq(("GS1", "Old title"), ("GS2", "Other")).toDF("accession", "title")
    val up = SecurityOps.upsertBioExperiment(existing, "GS1", "New title")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(up == Map("GS1" -> "New title", "GS2" -> "Other"))

    val tokens = Seq(("EXP:GS1", 1), ("EXP:GS9", 2)).toDF("token", "x")
    val swapped = SecurityOps.swapSecurityTokens(tokens, "token", "GS1", "GS5")
      .collect().map(_.getString(0)).toSet
    assert(swapped == Set("EXP:GS5", "EXP:GS9"))
  }

  test("SECURITY facts refresh per trial; i2b2_secure rebuilt from facts (upload with SECURITY)") {
    // DataProcessorTest 'it should upload data with SECURITY': a secured
    // upload writes one SECURITY fact per trial patient and the
    // warehouse-level i2b2_secure rebuild keys every study's subtree off
    // those facts, defaulting EXP:PUBLIC
    val facts = Seq((101L, "C1", "T", "61", "GS1"), (201L, "SECURITY", "T", "EXP:PUBLIC", "GS2"))
      .toDF("patient_num", "concept_cd", "valtype_cd", "tval_char", "sourcesystem_cd")
    val pats = Seq(101L, 102L).toDF("patient_num")
    val refreshed = SecurityOps.refreshSecurityFacts(facts, pats, "patient_num",
      "GS1", secure = true)
    val sec = refreshed.filter($"concept_cd" === "SECURITY")
      .collect().map(r => (r.getAs[Long]("patient_num"), r.getAs[String]("tval_char"))).toSet
    assert(sec == Set((101L, "EXP:GS1"), (102L, "EXP:GS1"), (201L, "EXP:PUBLIC")))
    // re-running as unsecured replaces, never duplicates
    val again = SecurityOps.refreshSecurityFacts(refreshed, pats, "patient_num",
      "GS1", secure = false)
    assert(again.filter($"concept_cd" === "SECURITY" && $"sourcesystem_cd" === "GS1")
      .collect().map(_.getAs[String]("tval_char")).toSet == Set("EXP:PUBLIC"))

    val i2b2 = Seq(("\\S\\GS1\\", "GS1"), ("\\S\\GS1\\V\\", "GS1"),
      ("\\S\\GS2\\", "GS2"), ("\\S\\", null))
      .toDF("c_fullname", "sourcesystem_cd")
    val rebuilt = SecurityOps.rebuildI2b2SecureFromFacts(i2b2, refreshed)
      .collect().map(r => r.getAs[String]("c_fullname") ->
        r.getAs[String]("secure_obj_token")).toMap
    assert(rebuilt("\\S\\GS1\\") == "EXP:GS1")
    assert(rebuilt("\\S\\GS1\\V\\") == "EXP:GS1")
    assert(rebuilt("\\S\\GS2\\") == "EXP:PUBLIC")
    assert(rebuilt("\\S\\") == "EXP:PUBLIC")

    // the metadata-sized twin: the secure-object registry yields the same
    // tokens as the SECURITY-fact scan (they are written together)
    val sso = Seq("EXP:GS1", "OTHER:THING").toDF("bio_data_unique_id")
    val fromObjects = SecurityOps.rebuildI2b2SecureFromObjects(i2b2, sso)
      .collect().map(r => r.getAs[String]("c_fullname") ->
        r.getAs[String]("secure_obj_token")).toMap
    assert(fromObjects == rebuilt)
  }

  test("copy security from other study replays PostProcessingTest") {
    // COPY_SECURITY_FROM_OTHER_STUDY: the admin grant (principal 1, level
    // 8) on the FIRST study's secure object is replicated onto SECOND's
    val access = Seq((10L, 1L, 100L, 8L), (11L, 2L, 999L, 8L))
      .toDF("auth_sec_obj_access_id", "auth_principal_id",
        "secure_object_id", "secure_access_level_id")
    val secureObjects = Seq((100L, "EXP:GSE0"), (200L, "EXP:GSE0SECOND"))
      .toDF("search_secure_object_id", "bio_data_unique_id")
    val bioDataUid = Seq((1L, "EXP:GSE0"), (2L, "EXP:GSE0SECOND"))
      .toDF("bio_data_id", "unique_id")
    val bioExperiment = Seq((1L, "GSE0"), (2L, "GSE0SECOND"))
      .toDF("bio_experiment_id", "accession")

    val out = SecurityOps.copySecurityFromOtherStudy(access, secureObjects,
      bioDataUid, bioExperiment, studyId = "GSE0SECOND", studyIdFrom = "GSE0")
    val copied = out.filter($"secure_object_id" === 200L).collect()
    assert(copied.length == 1)
    assert(copied(0).getAs[Long]("auth_principal_id") == 1L)
    assert(copied(0).getAs[Long]("secure_access_level_id") == 8L)
    assert(copied(0).getAs[Long]("auth_sec_obj_access_id") == 12L) // max+1
    assert(out.count() == 3) // originals survive

    // unknown source study -> no-op (the proc inserts nothing)
    assert(SecurityOps.copySecurityFromOtherStudy(access, secureObjects,
      bioDataUid, bioExperiment, "GSE0SECOND", "MISSING").count() == 2)
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample: deterministic, per-stratum rates, filter-only") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 0.25), defaultRate = 1.0)
    // zh stratum untouched
    assert(s.filter($"lang" === "zh").count() == 2000)
    // en stratum near the rate (md5 is uniform; 2000 draws at p=.25)
    val en = s.filter($"lang" === "en").count()
    assert(en > 380 && en < 620, s"en sample $en far from 500")
    // byte-identical on a different partitioning
    val again = Sampling.stratifiedSample(docs.repartition(7), "doc_id", "lang",
      rates = Map("en" -> 0.25), defaultRate = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == s.select("doc_id").collect().map(_.getLong(0)).toSet)
    // rate edges
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.0, "zh" -> 1.0)).count() == 2000)
  }

  test("temperature mixing: alpha flattens sources, rates clamp, alpha=1 is natural") {
    // 3200 en vs 800 zh: alpha=0.5 keeps zh at a sqrt(3200/800) = 2x
    // higher RATE than en; overall expectation ~0.4 of the corpus
    val docs = ((0L until 3200L).map(i => (i, "en")) ++
      (10000L until 10800L).map(i => (i, "zh"))).toDF("doc_id", "lang")
    val s = Sampling.temperatureSample(docs, "doc_id", "lang",
      alpha = 0.5, targetFraction = 0.4)
    val rates = s.select($"lang", $"mix_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("zh") / rates("en") - 2.0) < 0.01)
    val kept = s.count().toDouble
    assert(kept > 0.3 * 4000 && kept < 0.5 * 4000, s"kept $kept of 4000")
    // alpha = 1 keeps natural proportions: every source at targetFraction
    val nat = Sampling.temperatureSample(docs, "doc_id", "lang",
      alpha = 1.0, targetFraction = 0.25)
      .select($"lang", $"mix_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(nat("en") == 0.25 && nat("zh") == 0.25)
    // a tiny tail source's boosted rate clamps at 1.0 (no duplication)
    val skew = ((0L until 5000L).map(i => (i, "en")) ++
      Seq((99999L, "xx"))).toDF("doc_id", "lang")
    val clamped = Sampling.temperatureSample(skew, "doc_id", "lang",
      alpha = 0.1, targetFraction = 0.9)
    assert(clamped.filter($"lang" === "xx").count() == 1)
    assert(clamped.filter($"lang" === "xx").select($"mix_rate")
      .collect()(0).getDouble(0) == 1.0)
    // deterministic across partitionings
    val again = Sampling.temperatureSample(docs.repartition(7), "doc_id",
      "lang", alpha = 0.5, targetFraction = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == s.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("deterministic shuffle: stable permutation, seed-sensitive, no global window") {
    import graft.operators.Sampling
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Sampling.deterministicShuffle(docs, "doc_id", "epoch0")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    val b = Sampling.deterministicShuffle(docs, "doc_id", "epoch0")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    assert(a == b) // same seed -> same order across runs
    assert(a.values.toSeq.sorted == (1L to 200L)) // a true permutation
    val c = Sampling.deterministicShuffle(docs, "doc_id", "epoch1")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    assert(a != c) // different seed -> different order
    // scale guard: position assignment must not be a global window
    val plan = Sampling.deterministicShuffle(docs, "doc_id", "epoch0")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("No Partition Defined"))
  }

  test("epochMix: exact per-row replay, integer/fractional/zero factors") {
    import graft.operators.Sampling
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = (1L to 1200L).map(i =>
      (i, Seq("en", "zh", "fr", "de", "es")((i % 5).toInt)))
      .toDF("doc_id", "lang")
    val out = Sampling.epochMix(docs, "doc_id", "lang",
        factors = Map("zh" -> 2.5, "fr" -> 2.0, "de" -> 0.25, "es" -> 0.0))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val counts = out.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    // exact driver replay of the salted band
    def extra(id: Long, frac: Double): Long =
      if (md5hex(s"$id#epoch").substring(0, 4) <
        f"${math.round(frac * 65536).toInt}%04x") 1L else 0L
    (1L to 1200L).foreach { i =>
      val lang = Seq("en", "zh", "fr", "de", "es")((i % 5).toInt)
      val want = lang match {
        case "zh" => 2L + extra(i, 0.5)
        case "fr" => 2L
        case "de" => extra(i, 0.25)
        case "es" => 0L
        case _    => 1L
      }
      val got = counts.get((i, lang)).map(_.size.toLong).getOrElse(0L)
      assert(got == want, s"doc $i ($lang): $got copies, want $want")
      if (want > 0)
        assert(counts((i, lang)) == (1L to want), s"copy indices for $i")
    }
    // realized mix lands near the factors (240 rows per lang)
    val byLang = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("en") == 240 && byLang("fr") == 480)
    assert(math.abs(byLang("zh") - 600) < 60, byLang.toString)
    assert(math.abs(byLang("de") - 60) < 30, byLang.toString)
    assert(!byLang.contains("es"))
    // partitioning never changes the mix
    val again = Sampling.epochMix(docs.repartition(7), "doc_id", "lang",
        factors = Map("zh" -> 2.5, "fr" -> 2.0, "de" -> 0.25, "es" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(again.toSeq == out.sorted.toSeq)
    // a pure projection + explode: no exchange anywhere
    val plan = Sampling.epochMix(docs, "doc_id", "lang",
        factors = Map("zh" -> 2.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epochMix grew a shuffle:\n$plan")
    intercept[IllegalArgumentException] {
      Sampling.epochMix(docs, "doc_id", "lang", Map("zh" -> -0.1))
    }
  }

  test("deterministic split: exact band replay, full cover, disjoint, stable") {
    import graft.operators.Sampling
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = (1L to 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Sampling.deterministicSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    // every row labeled; driver-side exact band replay
    assert(out.size == 2000)
    (1L to 2000L).foreach { i =>
      val h = md5hex(i.toString).substring(0, 4)
      val want = if (h < "cccd") "train" else if (h < "e666") "val" else "test"
      assert(out(i) == want, s"doc $i band $h")
    }
    // band proportions land near the fractions
    val counts = out.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(math.abs(counts("train") - 1600) < 80, counts.toString)
    assert(math.abs(counts("val") - 200) < 50, counts.toString)
    // repartitioning never moves a row between splits
    val again = Sampling.deterministicSplit(docs.repartition(7), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(again == out)
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // fractions below the 1/65536 grid resolution rejected, never
    // silently misordered: a tail fraction whose preceding cumulative
    // cutoff rounds to 65536 would emit the 5-char hex "10000" (which
    // the 4-char comparison misorders), a head fraction rounding to 0
    // would leave its label empty, and two cutoffs colliding on the
    // grid would empty the middle label
    intercept[IllegalArgumentException] {      // cutoff rounds to 65536
      Sampling.deterministicSplit(docs, "doc_id",
        Seq("a" -> (1.0 - 5e-6), "b" -> 5e-6))
    }
    intercept[IllegalArgumentException] {      // cutoff rounds to 0
      Sampling.deterministicSplit(docs, "doc_id",
        Seq("a" -> 5e-6, "b" -> (1.0 - 5e-6)))
    }
    intercept[IllegalArgumentException] {      // adjacent cutoffs collide
      Sampling.deterministicSplit(docs, "doc_id",
        Seq("a" -> 0.5, "b" -> 5e-6, "c" -> (0.5 - 5e-6)))
    }
    // the smallest representable fraction still works and labels rows
    val tiny = Sampling.deterministicSplit(docs, "doc_id",
        Seq("a" -> (1.0 / 65536), "b" -> (1.0 - 1.0 / 65536)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny.values.sum == 2000 && tiny.getOrElse("b", 0L) > 1900)
  }

  test("weighted sample: exact race replay, proportional-ish rates, invariances") {
    import graft.operators.Sampling
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // driver-side exact replay of the race key
    def race(id: Long, w: Double): Long = {
      val x = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 13), 16)
      val u = (x.toDouble + 0.5) / (1L << 52).toDouble
      BigDecimal((math.log(-math.log(u)) - math.log(w)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // weights: ids 1..300 get w=8, 301..900 get w=1, plus dead rows
    val rows = (1L to 900L).map(i => (i, if (i <= 300) 8.0 else 1.0)) ++
      Seq((901L, 0.0), (902L, -1.0))
    val df = rows.toDF("doc_id", "w") // null weight via union below
      .unionByName(Seq((903L, Option.empty[Double])).toDF("doc_id", "w"))
    val out = Sampling.weightedSample(df, "doc_id", "w", rate = 0.25)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("race_micro"),
        r.getAs[Long]("sample_rank"))).sortBy(_._3)
    // exact: the 225 smallest (race, id) among the 900 live rows
    val want = (1L to 900L).map(i =>
        (i, race(i, if (i <= 300) 8.0 else 1.0)))
      .sortBy { case (id, rm) => (rm, id) }.take(225)
      .zipWithIndex.map { case ((id, rm), ix) => (id, rm, ix + 1L) }
    assert(out.toSeq == want)
    // dead rows never sample
    assert(!out.exists(r => r._1 >= 901L))
    // weight-8 docs (1/3 of rows) dominate the kept set
    val heavy = out.count(_._1 <= 300L)
    assert(heavy > 120, s"w=8 docs under-sampled: $heavy of 225")
    // repartition invariance
    val again = Sampling.weightedSample(df.repartition(7), "doc_id", "w", 0.25)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("sample_rank"))).toSet
    assert(again == out.map(r => (r._1, r._3)).toSet)
    // an infinite weight wins with certainty; NaN weights drop silently
    val extreme = Seq((1L, 1.0), (2L, Double.PositiveInfinity),
      (3L, Double.NaN), (4L, 1.0), (5L, 1.0)).toDF("doc_id", "w")
    val kept = Sampling.weightedSample(extreme, "doc_id", "w", 0.25)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("sample_rank")))
    assert(kept.toSeq == Seq((2L, 1L))) // ceil(0.25 * 4 live) = 1, inf first
    // the sketch threshold PRUNES, never changes: the bound admits the
    // 225 winners plus at most a bucket's slack — far fewer than the 900
    // live rows reach the exact rank pass
    val keyed = Sampling.raceKeyed(df, "doc_id", "w", "race_micro")
    val (nLive, bound) = Sampling.raceBound(keyed, "race_micro", 0.25)
    assert(nLive == 900L)
    val candidates = keyed.filter($"race_micro" <= bound).count()
    assert(candidates >= 225L, s"bound must admit every winner: $candidates")
    assert(candidates < 450L,
      s"rank pass saw $candidates of 900 rows — the threshold stopped pruning")
  }

  test("pack sequences matches the single-window form; no global window in plan") {
    val docs = (0L until 997L).map(i => (i, 100L + i % 700)).toDF("doc_id", "n_toks")
    val packed = Sampling.packSequences(docs, Seq("doc_id"), "n_toks", budget = 4096)
      .select("doc_id", "pack_id")
    // naive single-window oracle
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs
      .withColumn("pack_id", floor((sum($"n_toks").over(w) - $"n_toks")
        .cast("double") / 4096))
      .select("doc_id", "pack_id")
    assert(packed.except(naive).count() == 0 && naive.except(packed).count() == 0)
    // packs are contiguous in doc order and within ~budget
    val sums = packed.join(docs, "doc_id")
      .groupBy("pack_id").agg(sum($"n_toks").as("t"), count(lit(1)).as("n"))
      .collect()
    assert(sums.forall(r => r.getAs[Long]("t") <= 4096 + 799)) // straddle <= max doc
    // the operator's own plan has no single-partition global Window
    val plan = Sampling.packSequences(docs, Seq("doc_id"), "n_toks", budget = 4096)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.contains("No Partition Defined"), "global window leaked into packSequences")
  }

  test("weightedSamplePerGroup: k race winners per group, window-order exact") {
    val rows = (1L to 300L).map(i =>
      ("g" + (i % 4), i, if (i % 7 == 0) 50.0 else 1.0)) ++
      Seq(("g0", 999L, 0.0), ("g1", 998L, Double.NaN)) // dead rows
    val df = rows.toDF("g", "doc_id", "w")
    val out = Sampling.weightedSamplePerGroup(df, Seq("g"), "doc_id", "w", k = 5)
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size == 4 && counts.values.forall(_ == 5))
    assert(out.filter($"doc_id" >= 998L).count() == 0)
    // the k winners are EXACTLY the per-group window over the same race
    // keys (weightedSample at rate 1 keeps every live row + its key)
    val keyed = Sampling.weightedSample(df, "doc_id", "w", rate = 1.0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy($"race_micro", $"doc_id".cast("string"))
    val want = keyed
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter($"sample_rank" <= 5)
      .select("g", "sample_rank", "doc_id", "race_micro")
    assert(out.except(want).count() == 0 && want.except(out).count() == 0)
    // an infinite weight's clamped race key stays integral and wins its
    // group with certainty; NaN weights never sample
    val extreme = Seq(("e", 1L, 1.0), ("e", 2L, Double.PositiveInfinity),
      ("e", 3L, Double.NaN), ("e", 4L, 2.0)).toDF("g", "doc_id", "w")
    val winners = Sampling.weightedSamplePerGroup(
        extreme, Seq("g"), "doc_id", "w", k = 2)
      .orderBy("sample_rank").collect().map(_.getLong(2)).toSeq
    assert(winners.head == 2L && winners.size == 2 && !winners.contains(3L))
  }

  test("topKPerGroup equals the row_number window; bounded plan, no window") {
    // hot group (g0: 800 rows, heavy ties), cold groups, short group
    // (< k), plus rows that must never qualify
    val rows = (1L to 800L).map(i => ("g0", i, (i % 13).toDouble)) ++
      (1L to 40L).map(i => ("g1", i, i.toDouble)) ++
      Seq(("g2", 1L, 5.0), ("g2", 2L, 5.0)) ++        // all-ties, < k
      Seq(("g3", 1L, -0.0), ("g3", 2L, 0.0)) ++       // -0.0 == 0.0: id ties
      Seq(("g4", 1L, Double.PositiveInfinity),         // infinities order
        ("g4", 2L, 1.0), ("g4", 3L, Double.NegativeInfinity)) ++
      Seq(("gx", 3L, Double.NaN))                      // NaN score drops
    val df = rows.toDF("g", "doc_id", "score")
      .unionByName(Seq(("gn", Option.empty[Long], Option(1.0)),
        ("gn", Option(1L), Option.empty[Double])).toDF("g", "doc_id", "score"))
    val k = 5
    val got = Sampling.topKPerGroup(df, Seq("g"), "score", "doc_id", k)
    // oracle: the exact contract — row_number over (score desc, string id)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy($"score".desc, $"doc_id".cast("string"))
    val want = df.filter($"score".isNotNull && !isnan($"score") &&
        $"doc_id".isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select("g", "rank", "doc_id", "score")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    assert(got.count() == k + k + 2 + 2 + 3)           // g2/g3/g4 keep all
    // the -0.0 tie resolved by id, and -0.0 surfaces as a plain zero
    val g3 = got.filter($"g" === "g3").orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(g3 == Seq((1L, 1L, 0.0), (2L, 2L, 0.0)))
    // infinities rank like any score: +Inf first, -Inf last
    val g4 = got.filter($"g" === "g4").orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(g4 == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    // output types survive the double round-trip
    assert(got.schema("doc_id").dataType.typeName == "long")
    // repartition invariance (merge path exercised across 7 partials)
    val again = Sampling.topKPerGroup(
      df.repartition(7), Seq("g"), "score", "doc_id", k)
    assert(again.except(got).count() == 0 && got.except(again).count() == 0)
    // ascending variant = bottom-k
    val asc = Sampling.topKPerGroup(df, Seq("g"), "score", "doc_id", 2,
        descending = false)
      .filter($"g" === "g1").collect().map(_.getLong(2)).sorted
    assert(asc.toSeq == Seq(1L, 2L))
    // plan: a bounded object-hash aggregate, never a window partition
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window ["), s"window leaked into topKPerGroup:\n$plan")
  }

  test("topKPerGroup tie ids compare in UTF-8 byte order, not UTF-16 code units") {
    import graft.operators.Sampling
    // JVM UTF-16 code-unit order ranks U+E000..U+FFFF ABOVE supplementary
    // characters (whose high surrogates sit at 0xD800..0xDBFF); UTF-8
    // byte order — the declared contract, and what both Spark's string
    // ordering and the DuckDB oracle use — ranks them BELOW. On an exact
    // score tie the k-capped aggregate must agree with the row_number
    // window bit for bit.
    val bmpPrivate = "\uE000"             // U+E000, 3 UTF-8 bytes
    val emoji = new String(Character.toChars(0x1f600)) // U+1F600, 4 bytes
    val df = Seq(("g", bmpPrivate, 1.0), ("g", emoji, 1.0),
      ("g", "ascii", 1.0)).toDF("g", "doc_id", "score")
    val got = Sampling.topKPerGroup(df, Seq("g"), "score", "doc_id", 2)
      .orderBy("rank").collect().map(_.getString(2)).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy($"score".desc, $"doc_id")
    val want = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2).orderBy("rank")
      .collect().map(_.getString(1)).toSeq
    assert(want == Seq("ascii", bmpPrivate), want.map(_.codePoints.toArray.toSeq))
    assert(got == want, s"got ${got.map(_.codePoints.toArray.toSeq)}")
  }

  test("groupedRunningTotal == per-group window; hot group splits; budget mix admits exactly") {
    import graft.operators.Sampling
    // skewed frame: one hot group (en, 4000 rows) + small groups
    val docs = (0L until 4500L).map { i =>
      val g = if (i < 4000) "en" else if (i < 4300) "zh" else "fr"
      (i, g, (i % 37) + 1)
    }.toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.groupedRunningTotal(docs.repartition(7),
        Seq("lang"), Seq("doc_id"), "n_tokens", "rt")
      .select("doc_id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = docs.withColumn("rt", sum($"n_tokens".cast("long")).over(w))
      .select("doc_id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "grouped prefix sum diverged from the window form")
    // a 300-group frame stays WELL under the bounded-domain guard
    assert(Sampling.groupedRunningTotal(
      (0L until 300L).map(i => (i, s"g$i", 1L)).toDF("id", "g", "v"),
      Seq("g"), Seq("id"), "v").count() == 300)
  }

  test("tokenBudgetMix: per-group budgets met, straddler included, partition-invariant") {
    import graft.operators.Sampling
    val docs = (0L until 2000L).map { i =>
      (i, if (i % 3 == 0) "en" else "zh", (i % 29) + 1)
    }.toDF("doc_id", "lang", "n_tokens")
    val mix = Sampling.tokenBudgetMix(docs, "doc_id", "lang", "n_tokens",
      budgets = Map("en" -> 500L, "zh" -> 300L), defaultBudget = 0L,
      seed = "s1")
    val rows = mix.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("tokens_before")))
    // every admitted doc's tokens_before is under its budget, and the
    // admitted set covers the budget (last admitted doc straddles)
    val byLang = rows.groupBy(_._2)
    for ((lang, rs) <- byLang) {
      val budget = if (lang == "en") 500L else 300L
      assert(rs.forall(_._4 < budget), s"$lang admitted past the budget")
      val total = rs.map(_._3).sum
      assert(total >= budget, s"$lang budget undershot: $total < $budget")
      val maxBefore = rs.map(r => r._4 + r._3).max
      assert(maxBefore == total, s"$lang prefix sums inconsistent")
    }
    // byte-identical admission on a different partitioning
    val again = Sampling.tokenBudgetMix(docs.repartition(13), "doc_id",
        "lang", "n_tokens", budgets = Map("en" -> 500L, "zh" -> 300L),
        defaultBudget = 0L, seed = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_._1).toSet)
    // a different seed is a different admission order
    val other = Sampling.tokenBudgetMix(docs, "doc_id", "lang", "n_tokens",
        budgets = Map("en" -> 500L, "zh" -> 300L), defaultBudget = 0L,
        seed = "s2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != rows.map(_._1).toSet)
  }

  test("topKPerGroup numericIdOrder == the row_number window on a tie-heavy random frame") {
    import graft.operators.Sampling
    // fixed-seed random frame engineered for ties: 6 groups, only 4
    // distinct scores (so id tiebreaks decide most ranks), ids spread
    // across the full signed range including negatives
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 600).map { _ =>
      ("g" + rnd.nextInt(6), rnd.nextLong(),
        (rnd.nextInt(4) * 10).toDouble)
    }.distinct
    val df = rows.toDF("g", "id", "score")
    for (desc <- Seq(true, false)) {
      val got = Sampling.topKPerGroup(df, Seq("g"), "score", "id", 7,
          descending = desc, numericIdOrder = true)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
        .orderBy(if (desc) $"score".desc else $"score".asc, $"id")
      val want = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 7)
        .select($"g", $"rank", $"id", $"score")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == want, s"desc=$desc diverged")
    }
  }

  test("leakageSafeSplit: every near-dup cluster member shares one split") {
    import graft.operators.Sampling
    val docs = (1L to 40L).map(i => (i, s"text $i")).toDF("doc_id", "txt")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val split = Sampling.leakageSafeSplit(docs, pairs, "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[Any]("cluster_id")), r.getAs[String]("split")))).toMap
    assert(split.size == 40) // the left join keeps every doc exactly once
    // chained cluster {1,2,3} and pair {10,11} each share one label
    assert(Set(split(1L), split(2L), split(3L)).size == 1)
    assert(split(1L)._1 == Some(1L))
    assert(split(10L) == split(11L) && split(10L)._1 == Some(10L))
    // singletons carry no cluster and split by their own id — same label
    // as the plain deterministic split
    val plain = Sampling.deterministicSplit(docs, "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    (4L to 9L).foreach { i =>
      assert(split(i)._1.isEmpty && split(i)._2 == plain(i))
    }
  }

  test("topKPerGroup numericIdOrder ties on the NATIVE long order, default on the string form") {
    import graft.operators.Sampling
    // ids 9 and 10 on an exact score tie: string order ranks "10" < "9",
    // numeric order 9 < 10 — the ANN contract (ORDER BY score, id).
    // Include negatives to exercise the sign-bit-flip hex encoding.
    val df = Seq(("g", 9L, 1.0), ("g", 10L, 1.0), ("g", -3L, 0.5))
      .toDF("g", "vec_id", "score")
    val numeric = Sampling.topKPerGroup(df, Seq("g"), "score", "vec_id", 3,
        numericIdOrder = true)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(numeric == Seq(9L, 10L, -3L), s"numeric tiebreak broke: $numeric")
    val stringy = Sampling.topKPerGroup(df, Seq("g"), "score", "vec_id", 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(stringy == Seq(10L, 9L, -3L), s"string tiebreak broke: $stringy")
    // full-range round trip: Long.MinValue/MaxValue survive encode+decode
    val edges = Seq(("g", Long.MinValue, 2.0), ("g", Long.MaxValue, 1.0))
      .toDF("g", "vec_id", "score")
    val back = Sampling.topKPerGroup(edges, Seq("g"), "score", "vec_id", 2,
        numericIdOrder = true)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(back == Seq(Long.MinValue, Long.MaxValue), s"edge ids mangled: $back")
    // non-integral ids are a declared boundary
    val strIds = Seq(("g", "a", 1.0)).toDF("g", "doc_id", "score")
    intercept[IllegalArgumentException] {
      Sampling.topKPerGroup(strIds, Seq("g"), "score", "doc_id", 1,
        numericIdOrder = true)
    }
  }

  test("cluster-label joins survive the above-broadcast-threshold path") {
    import graft.operators.{Dedup, Sampling}
    // Force the shuffle-join fallback: kill both the static and the AQE
    // broadcast thresholds, so the label join runs exactly as it would
    // when cluster labels are a corpus fraction (the web-scale high-dup
    // case where a forced broadcast hint would OOM the driver).
    val docs = (1L to 60L).map(i => (i, s"text $i")).toDF("doc_id", "txt")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (40L, 41L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.clusters(pairs)
    def runBoth[A](f: => A): (A, A) = {
      val dflt = f
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try (dflt, f)
      finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    val (applyB, applyS) = runBoth {
      Dedup.applyClusters(docs, labels, "doc_id")
        .collect().map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.getAs[Any]("kept_id")))).toSet
    }
    assert(applyS == applyB, "applyClusters diverged on the shuffle path")
    assert(applyS.count(!_._2) == 4) // docs 2,3,11,41 dropped either way
    val (splitB, splitS) = runBoth {
      Sampling.leakageSafeSplit(docs, pairs, "doc_id",
          Seq("train" -> 0.5, "test" -> 0.5))
        .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("cluster_id")),
          r.getAs[String]("split"))).toSet
    }
    assert(splitS == splitB, "leakageSafeSplit diverged on the shuffle path")
    // and the operators carry no forced hint that would defeat the
    // threshold: with broadcasts disabled the physical plan must not
    // contain a BroadcastHashJoin on the label join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.applyClusters(docs, labels, "doc_id")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"forced broadcast survived the disabled threshold:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("groupedRunningTotal/packSequences survive a mid-flight cache wipe (frozen materialization)") {
    import graft.operators.Sampling
    // A NONDETERMINISTIC upstream: rand() re-evaluates on every
    // recompute, so any consumer that silently re-materializes the
    // internal range-partitioned frame (the pre-fix persist() hazard:
    // eviction between the offsets collect and the final join) joins
    // stale offsets onto different rows and the output's running total
    // stops being the cumulative sum of its own value column. The eager
    // localCheckpoint freezes one materialization; wiping every cache
    // and persisted RDD between construction and collection must not
    // change anything.
    val base = spark.range(0, 2000)
      .withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("s", col("id"))
      .withColumn("v", floor(rand() * 97).cast("long"))
    val out = Sampling.groupedRunningTotal(base, Seq("g"), Seq("s"), "v")
    spark.catalog.clearCache() // unpersists anything persist()-registered
    val rows = out.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("s"),
        r.getAs[Long]("v"), r.getAs[Long]("running_total")))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      var acc = 0L
      rs.sortBy(_._2).foreach { case (_, s, v, rt) =>
        acc += v
        assert(rt == acc, s"group $g seq $s: running_total $rt != cumsum $acc")
      }
    }
    // stable across repeated actions too (the second collect is a fresh job)
    val again = out.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("s"),
        r.getAs[Long]("v"), r.getAs[Long]("running_total")))
    assert(again.toSet == rows.toSet, "second action diverged from the first")

    val packed = Sampling.packSequences(
      base.withColumn("t", floor(rand() * 50 + 1).cast("long")),
      Seq("s"), "t", budget = 500L)
    spark.catalog.clearCache()
    val ps = packed.collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("t"), r.getAs[Long]("pack_id")))
      .sortBy(_._1)
    var cum = 0L
    ps.foreach { case (s, t, pid) =>
      assert(pid == cum / 500L, s"seq $s: pack_id $pid != floor($cum/500)")
      cum += t
    }
  }
}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunks overlap correctly and reassemble to the original text") {
    val text = (1 to 300).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkText(docs, "doc_id", "text",
        chunkChars = 100, overlapChars = 20)
      .orderBy("doc_id", "chunk_idx").collect()
    val doc1 = chunks.filter(_.getLong(0) == 1L).map(_.getAs[String]("chunk"))
    // ceil((300-20)/80) = 4 chunks
    assert(doc1.length == 4)
    // consecutive chunks share the 20-char overlap
    doc1.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(20) == b.take(20))
    }
    // stripping the overlap from every chunk after the first rebuilds the doc
    assert((doc1.head +: doc1.tail.map(_.drop(20))).mkString == text)
    // a short doc yields exactly one whole chunk
    val doc2 = chunks.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1 && doc2(0).getAs[String]("chunk") == "short")
  }
}
