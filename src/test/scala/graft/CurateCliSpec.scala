package graft

import org.apache.spark.sql.functions._

class CurateCliSpec extends SparkSpec {
  import spark.implicits._

  test("two ingest cycles: cycle 2 consumes the ledger cycle 1 wrote") {
    val root = java.nio.file.Files.createTempDirectory("curate").toString
    val corpusDir = s"$root/corpus"
    val ledgerDir = s"$root/ledger"

    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different historical content about spark plans"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),   // exact
      (11L, "a genuinely novel document unlike anything in history today"), // keep
      (12L, "another fresh document with its own unique words entirely")) // keep
      .toDF("doc_id", "text").write.parquet(s"$root/batch1")
    Seq(
      (20L, "a genuinely novel document unlike anything in history today"), // exact vs KEPT 11
      (21L, "completely different historical content about spark plans"), // exact vs corpus 2
      (22L, "a genuinely novel document unlike anything in history tonight"), // near vs KEPT 11
      (23L, "a third wave document sharing nothing with prior cycles"))    // keep
      .toDF("doc_id", "text").write.parquet(s"$root/batch2")

    def opts(batch: String, ingest: String) = CurateCli.Options(
      corpus = corpusDir, batch = s"$root/$batch", ledger = ledgerDir,
      out = s"$root/out_$ingest", ingest = ingest)

    val (kept1, exact1, near1) = CurateCli.runCycle(spark, opts("batch1", "day1"))
    assert((kept1, exact1, near1) == ((2L, 1L, 0L)))
    // the corpus and ledger both grew by the kept docs
    assert(spark.read.parquet(corpusDir).count() == 4)
    assert(spark.read.parquet(s"$ledgerDir/fp")
      .filter($"ingest" === "day1").count() == 2)

    val (kept2, exact2, near2) = CurateCli.runCycle(spark, opts("batch2", "day2"))
    assert((kept2, exact2, near2) == ((1L, 2L, 1L)))
    val v2 = spark.read.parquet(s"$root/out_day2")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    // 20 matched the doc cycle 1 KEPT — proof cycle 2 read what 1 wrote
    assert(v2(20L) == (("exact", Some(11L))))
    assert(v2(21L) == (("exact", Some(2L))))
    assert(v2(22L)._1 == "near" && v2(22L)._2 == Some(11L))
    assert(v2(23L) == (("keep", None)))

    // the ledger-fed cycle-2 verdicts equal a from-scratch recompute over
    // the grown corpus (minus batch2's own appended rows)
    val corpusBefore2 = spark.read.parquet(corpusDir)
      .filter($"doc_id" < 20L)
    val recompute = graft.operators.Dedup.incrementalDedup(corpusBefore2,
        spark.read.parquet(s"$root/batch2"), "doc_id", "text", 3, 8, 2, 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(v2 == recompute)

    // three ingest partitions: bootstrap + the two cycles
    assert(spark.read.parquet(s"$ledgerDir/fp")
      .select($"ingest").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("bootstrap", "day1", "day2"))
  }

  test("--boilerplate-dict: dictionary strips before the screen; corpus gets cleaned text") {
    val root = java.nio.file.Files.createTempDirectory("curate-bp").toString
    val corpusDir = s"$root/corpus"
    // yesterday's corpus: real content, every page wears the same banner
    val banner = "Accept all cookies"
    Seq(
      (1L, s"the quick brown fox jumps over the lazy dog\n$banner"),
      (2L, s"completely different historical content about plans\n$banner"),
      (3L, s"a third corpus document with its own words\n$banner"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    // dictionary built batch-side over the corpus via the CLI build mode
    val dictDir = s"$root/dict"
    val nLines = CurateCli.buildDictionary(spark, CurateCli.Options(
      corpus = corpusDir, boilerplateDict = dictDir, minDocFreq = 3L))
    assert(nLines == 1L)
    assert(spark.read.parquet(dictDir).collect()
      .map(_.getString(0)).toSeq == Seq(banner.toLowerCase))
    // a rebuild republishes atomically over the existing dictionary
    assert(CurateCli.buildDictionary(spark, CurateCli.Options(
      corpus = corpusDir, boilerplateDict = dictDir, minDocFreq = 2L)) == 1L)
    // parse: --build-dict requires corpus + dict path, valid threshold
    assert(CurateCli.parse(Seq("--build-dict", "--corpus", corpusDir)).isLeft)
    assert(CurateCli.parse(Seq("--build-dict", "--corpus", corpusDir,
      "--boilerplate-dict", dictDir, "--min-doc-freq", "1")).isLeft)
    assert(CurateCli.parse(Seq("--build-dict", "--corpus", corpusDir,
      "--boilerplate-dict", dictDir, "--min-doc-freq", "50")).isRight)
    // the corpus itself must hold CLEANED text for the screen to match
    // cleaned batch docs — rewrite it through the same dictionary (the
    // one-time migration a production adopter runs)
    val cleanedCorpus = graft.operators.TextAnalysis
      .applyBoilerplateDictionary(spark.read.parquet(corpusDir),
        "doc_id", "text", spark.read.parquet(dictDir))
      .select($"doc_id", $"clean_text".as("text"))
    val corpus2 = s"$root/corpus_clean"
    cleanedCorpus.write.parquet(corpus2)

    // today's batch: doc 10 is corpus doc 1 wearing a DIFFERENT banner
    // spelling of itself plus the known one — only the dictionary line
    // strips; doc 11 is novel content plus the banner
    Seq(
      (10L, s"$banner\nthe quick brown fox jumps over the lazy dog"),
      (11L, s"a genuinely novel document unlike anything before\n$banner"))
      .toDF("doc_id", "text").write.parquet(s"$root/batch")
    val o = CurateCli.Options(corpus = corpus2, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      boilerplateDict = dictDir)
    val (kept, exact, near) = CurateCli.runCycle(spark, o)
    // WITH the dictionary, doc 10 deduplicates exactly against doc 1
    assert((kept, exact, near) == ((1L, 1L, 0L)), s"$kept/$exact/$near")
    val v = spark.read.parquet(s"$root/out").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v(10L) == (("exact", Some(1L))))
    assert(v(11L)._1 == "keep")
    // the corpus received doc 11's CLEANED text (banner gone)
    val appended = spark.read.parquet(corpus2)
      .filter($"doc_id" === 11L).collect()(0).getString(1)
    assert(appended == "a genuinely novel document unlike anything before")
    // control: the same cycle WITHOUT the dictionary keeps both docs
    // (the banner makes doc 10 differ from corpus doc 1)
    val corpus3 = s"$root/corpus_raw"
    spark.read.parquet(corpusDir).write.parquet(corpus3)
    // (the reordered banner still shares shingles, so it may flag as
    // near — the dictionary is what upgrades it to a clean exact match)
    val (k2, e2, _) = CurateCli.runCycle(spark, o.copy(corpus = corpus3,
      ledger = s"$root/ledger2", out = s"$root/out2",
      boilerplateDict = null))
    assert(e2 == 0L, s"control run must see no exact dup, got exact=$e2")
  }

  test("--decontaminate: leaked docs verdicted terminal, never reach corpus or ledger") {
    val root = java.nio.file.Files.createTempDirectory("curate-dc").toString
    val corpusDir = s"$root/corpus"
    Seq((1L, "completely different historical content about spark plans"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    // the quarantined benchmark set
    Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(s"$root/bench")
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // fully leaked
      (11L, "a genuinely novel document unlike anything else"), // keep
      (12L, "completely different historical content about spark plans")) // exact
      .toDF("doc_id", "text").write.parquet(s"$root/batch")
    val o = CurateCli.Options(corpus = corpusDir, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      decontaminate = s"$root/bench", contamThreshold = 0.5)
    val (kept, exact, near) = CurateCli.runCycle(spark, o)
    assert((kept, exact, near) == ((1L, 1L, 0L)))
    val v = spark.read.parquet(s"$root/out").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v(10L) == (("contaminated", None)))
    assert(v(11L)._1 == "keep" && v(12L)._1 == "exact")
    // the leaked doc is in neither the corpus nor the ledger
    assert(spark.read.parquet(corpusDir)
      .filter($"doc_id" === 10L).count() == 0)
    assert(spark.read.parquet(s"$root/ledger/fp")
      .filter($"doc_id" === 10L).count() == 0)
    // without the gate, the same doc is a plain keep
    val corpus2 = s"$root/corpus2"
    Seq((1L, "completely different historical content about spark plans"))
      .toDF("doc_id", "text").write.parquet(corpus2)
    val (k2, _, _) = CurateCli.runCycle(spark, o.copy(corpus = corpus2,
      ledger = s"$root/ledger2", out = s"$root/out2", decontaminate = null))
    assert(k2 == 2L)
  }

  test("--html: full web-ingest chain — extract, dictionary strip, decontaminate, screen") {
    val root = java.nio.file.Files.createTempDirectory("curate-web").toString
    val corpusDir = s"$root/corpus"
    // the curated corpus is TEXT (prior cycles extracted already)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq((100L, "never train on this benchmark sentence ever"))
      .toDF("doc_id", "text").write.parquet(s"$root/bench")
    // dictionary on extracted text: 'accept cookies' is in >= 2 docs
    Seq((50L, "accept cookies\nreal a"), (51L, "accept cookies\nreal b"))
      .toDF("doc_id", "text").write.parquet(s"$root/hist")
    CurateCli.buildDictionary(spark, CurateCli.Options(
      corpus = s"$root/hist", boilerplateDict = s"$root/dict",
      minDocFreq = 2L))
    def page(body: String): String =
      s"<html><head><script>track(1<2)</script></head><body>" +
        s"<div>Accept Cookies</div><p>$body</p></body></html>"
    Seq(
      (10L, page("the quick brown fox jumps over the lazy dog")), // exact dup
      (11L, page("never train on this benchmark sentence ever")), // leaked
      (12L, page("a genuinely novel crawl document body")))       // keep
      .toDF("doc_id", "text").write.parquet(s"$root/batch")
    val o = CurateCli.Options(corpus = corpusDir, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      html = true, boilerplateDict = s"$root/dict",
      decontaminate = s"$root/bench", contamThreshold = 0.5)
    val (kept, exact, near) = CurateCli.runCycle(spark, o)
    assert((kept, exact, near) == ((1L, 1L, 0L)))
    val v = spark.read.parquet(s"$root/out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "exact", 11L -> "contaminated", 12L -> "keep"))
    // the corpus received extracted, dictionary-stripped TEXT: no markup,
    // no banner — exactly the body line
    val stored = spark.read.parquet(corpusDir)
      .filter($"doc_id" === 12L).collect()(0).getString(1)
    assert(stored == "a genuinely novel crawl document body", stored)
  }

  test("kitchen-sink cycle: every ingest stage composes in its documented order") {
    val root = java.nio.file.Files.createTempDirectory("curate-all").toString
    val corpusDir = s"$root/corpus"
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    // the leaked sentence carries en stopwords so it survives the
    // language gate and reaches decontamination (stage-order matters)
    val leak = "never train on the benchmark of a sentence ever"
    Seq((100L, leak)).toDF("doc_id", "text").write.parquet(s"$root/bench")
    Seq((50L, "accept cookies\nreal a"), (51L, "accept cookies\nreal b"))
      .toDF("doc_id", "text").write.parquet(s"$root/hist")
    CurateCli.buildDictionary(spark, CurateCli.Options(
      corpus = s"$root/hist", boilerplateDict = s"$root/dict",
      minDocFreq = 2L))
    // artifacts: BPE merges from the corpus, quality weights from labels
    CurateCli.fitBpeMerges(spark, CurateCli.Options(
      corpus = corpusDir, bpeMerges = s"$root/merges", fitBpe = true,
      bpeNumMerges = 4))
    // positive class = the real docs' vocabulary (quality gates BEFORE
    // dedup/decontamination, so dup and leaked docs must pass it too);
    // negative class = the spam vocabulary of doc 13
    val posTexts = Seq(
      "the quick brown fox jumps over the lazy dog",
      leak,
      "the of a genuinely useful and novel document to keep today")
    ((0 until 30).map(i => (posTexts(i % 3), 1)) ++
      (0 until 30).map(_ => ("zz buy zz now zz offer spam cheap", 0)))
      .toDF("text", "label").write.parquet(s"$root/labeled")
    CurateCli.fitQualityWeights(spark, CurateCli.Options(
      fitQuality = s"$root/labeled", qualityWeights = s"$root/weights",
      qualityBuckets = 256, qualityLr = 0.05, qualityIters = 6))

    def page(body: String): String =
      s"<html><head><script>t(1<2)</script></head><body>" +
        s"<div>Accept Cookies</div><p>$body</p></body></html>"
    Seq(
      (10L, page("the quick brown fox jumps over the lazy dog")),   // exact dup
      (11L, page(leak)),                                          // leaked
      (12L, page("der und der ein eine zu den der und das ein")),   // wrong lang
      (13L, page("the of to a zz buy zz now zz offer spam cheap")), // low quality
      (14L, page("the of a genuinely useful and novel document to keep today")))
      .toDF("doc_id", "text").write.parquet(s"$root/batch")
    // data-derived threshold: midway between the spam doc's score and
    // the lowest real doc's score under the trained weights
    val (wts, wbias) =
      graft.operators.TextAnalysis.loadWeights(spark, s"$root/weights")
    val qscores = graft.operators.TextAnalysis.hashedMeanScore(
        Seq((13L, "the of to a zz buy zz now zz offer spam cheap"),
          (10L, "the quick brown fox jumps over the lazy dog"),
          (11L, leak),
          (14L, "the of a genuinely useful and novel document to keep today"))
          .toDF("doc_id", "text"), "text", wts, wbias)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val thr = (qscores(13L) +
      Seq(qscores(10L), qscores(11L), qscores(14L)).min) / 2
    assert(qscores(13L) < Seq(qscores(10L), qscores(11L), qscores(14L)).min,
      s"filter must separate: $qscores")
    val o = CurateCli.Options(corpus = corpusDir, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      html = true, boilerplateDict = s"$root/dict",
      redactContacts = true, lang = "en",
      qualityWeights = s"$root/weights", qualityThreshold = thr,
      decontaminate = s"$root/bench", contamThreshold = 0.5,
      spanEvidence = true, bpeMerges = s"$root/merges")
    val (kept, exact, _) = CurateCli.runCycle(spark, o)
    val v = spark.read.parquet(s"$root/out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "exact", 11L -> "contaminated",
      12L -> "lang_filtered", 13L -> "low_quality", 14L -> "keep"), v.toString)
    assert(kept == 1 && exact == 1)
    // every sidecar written: span evidence + the BPE token account of
    // exactly the kept doc
    assert(new java.io.File(s"$root/out_spans").exists())
    val account = spark.read.parquet(s"$root/out_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(account.map(_._1) == Seq(14L) && account.head._3 > 0)
    // the corpus stored the fully-prepared text (extracted, stripped,
    // redacted) for the keeper
    val stored = spark.read.parquet(corpusDir)
      .filter($"doc_id" === 14L).collect()(0).getString(1)
    assert(!stored.contains("<") && !stored.contains("Accept Cookies"))
    // a rerun reproduces verdicts and adds nothing (torn-cycle discipline)
    val (k2, e2, _) = CurateCli.runCycle(spark, o)
    assert(k2 == kept && e2 == exact)
    assert(spark.read.parquet(corpusDir).count() == 2)
  }

  test("--redact-contacts / --lang: corpus stores redacted text, wrong-language terminal") {
    val root = java.nio.file.Files.createTempDirectory("curate-rl").toString
    val corpusDir = s"$root/corpus"
    Seq((1L, "the fox and the dog of the farm"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq(
      (10L, "contact me at bob@example.com about the deal and the offer"),
      (11L, "der hund und die katze ist das tier im haus"))
      .toDF("doc_id", "text").write.parquet(s"$root/batch")
    val o = CurateCli.Options(corpus = corpusDir, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      redactContacts = true, lang = "en")
    val (kept, exact, near) = CurateCli.runCycle(spark, o)
    assert((kept, exact, near) == ((1L, 0L, 0L)))
    val v = spark.read.parquet(s"$root/out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "keep", 11L -> "lang_filtered"), v.toString)
    val stored = spark.read.parquet(corpusDir)
      .filter($"doc_id" === 10L).collect()(0).getString(1)
    assert(stored.contains("<REDACTED>") && !stored.contains("bob@example.com"),
      stored)
    // the German doc never reached the corpus or the ledger
    assert(spark.read.parquet(corpusDir).filter($"doc_id" === 11L).count() == 0)
    assert(spark.read.parquet(s"$root/ledger/fp")
      .filter($"doc_id" === 11L).count() == 0)
  }

  test("--warc: a cycle ingests raw crawl files end-to-end") {
    def http(status: String, body: String): Array[Byte] =
      (s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n" + body)
        .getBytes("UTF-8")
    def record(wtype: String, uri: String, payload: Array[Byte]): Array[Byte] = {
      val head = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
      head ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val root = java.nio.file.Files.createTempDirectory("curate-warc").toString
    val corpusDir = s"$root/corpus"
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    val warcDir = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(root, "crawl"))
    java.nio.file.Files.write(warcDir.resolve("seg-0.warc"),
      record("response", "http://a",
        http("200 OK", "<p>the quick brown fox jumps over the lazy dog</p>")) ++
      record("request", "http://a",
        "GET /a HTTP/1.1\r\n\r\n".getBytes("ISO-8859-1")) ++
      record("response", "http://gone", http("404 Not Found", "<p>miss</p>")) ++
      record("response", "http://b",
        http("200 OK", "<p>a genuinely novel crawl page body</p>")))
    // --warc + --stream is rejected at parse (the stream source is parquet)
    assert(CurateCli.parse(Seq("--warc", "--stream", "--corpus", corpusDir,
      "--batch", warcDir.toString, "--ledger", s"$root/l",
      "--out", s"$root/o", "--ingest", "d")).isLeft)
    val o = CurateCli.Options(corpus = corpusDir, batch = warcDir.toString,
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      warc = true, html = true)
    val (kept, exact, near) = CurateCli.runCycle(spark, o)
    // 2 eligible responses (request + 404 excluded): the fox page dedups
    // exactly against the corpus, the novel page is kept as clean text
    assert((kept, exact, near) == ((1L, 1L, 0L)))
    val texts = spark.read.parquet(corpusDir).collect()
      .map(_.getString(1)).toSet
    assert(texts.contains("a genuinely novel crawl page body"), texts.toString)
    assert(!texts.exists(_.contains("<p>")))
  }

  test("--span-evidence: winnow ledger grows per cycle; evidence names the kept run") {
    val run = "the quick brown fox jumps over the lazy dog again today"
    val root = java.nio.file.Files.createTempDirectory("curate-span").toString
    val corpusDir = s"$root/corpus"
    Seq((1L, s"corpus doc containing $run from the start"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq(
      (10L, "a genuinely novel first-day document kept whole"),
      (11L, s"submission repeating $run with a fresh tail"))
      .toDF("doc_id", "text").write.parquet(s"$root/b1")
    Seq(
      (20L, "novel first-day document kept whole — near variant"),
      (21L, "a genuinely novel first-day document kept whole extended"))
      .toDF("doc_id", "text").write.parquet(s"$root/b2")
    def opts(batch: String, ingest: String) = CurateCli.Options(
      corpus = corpusDir, batch = s"$root/$batch", ledger = s"$root/ledger",
      out = s"$root/out_$ingest", ingest = ingest, spanEvidence = true)
    CurateCli.runCycle(spark, opts("b1", "day1"))
    // day-1 evidence: batch doc 11 repeats corpus doc 1's run (bootstrap
    // healed the pre-existing corpus into the winnow ledger)
    val ev1 = spark.read.parquet(s"$root/out_day1_spans").collect()
      .map(r => (r.getLong(0), r.getLong(2))).distinct
    assert(ev1.toSet == Set((11L, 1L)), ev1.mkString(","))
    // the ledger grew by day-1's KEPT docs
    val wfp = spark.read.parquet(s"$root/ledger/winnow/wfp")
    assert(wfp.filter($"doc_id" === 10L).count() > 0)
    // day 2: doc 21 shares a run with doc 10 — a doc KEPT by cycle 1,
    // proof cycle 2's evidence reads what cycle 1 wrote
    CurateCli.runCycle(spark, opts("b2", "day2"))
    val ev2 = spark.read.parquet(s"$root/out_day2_spans").collect()
      .map(r => (r.getLong(0), r.getLong(2))).distinct
    assert(ev2.contains((21L, 10L)), ev2.mkString(","))
    assert(ev2.forall(_._2 != 20L) && ev2.forall(_._2 != 21L),
      "batch docs must never appear on the history side")
    // mismatched winnowing parameters are rejected, not silently empty
    val bad = intercept[IllegalArgumentException] {
      CurateCli.runCycle(spark, opts("b2", "day3").copy(spanK = 7))
    }
    assert(bad.getMessage.contains("k=5|w=4"))
  }

  test("torn cycles self-heal: ledger reconcile + idempotent corpus append") {
    val root = java.nio.file.Files.createTempDirectory("curate_torn").toString
    val corpusDir = s"$root/corpus"
    val ledgerDir = s"$root/ledger"
    Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    def opts(batch: String, ingest: String) = CurateCli.Options(
      corpus = corpusDir, batch = s"$root/$batch", ledger = ledgerDir,
      out = s"$root/out_$ingest", ingest = ingest)

    // clean cycle 1 bootstraps the ledger
    Seq((10L, "a first-wave document with plainly original content today"))
      .toDF("doc_id", "text").write.parquet(s"$root/batch1")
    assert(CurateCli.runCycle(spark, opts("batch1", "day1")) == ((1L, 0L, 0L)))

    // TORN cycle: a doc lands in the corpus but never in the ledger
    // (crash between the corpus append and the ledger append)
    Seq((30L, "an orphaned document the ledger never heard about today"))
      .toDF("doc_id", "text").write.mode("append").parquet(corpusDir)

    // cycle 2 must heal first: a batch dup of the orphan flags exact
    Seq(
      (40L, "an orphaned document the ledger never heard about today"),
      (50L, "a genuinely fresh second-wave document kept this cycle"))
      .toDF("doc_id", "text").write.parquet(s"$root/batch2")
    assert(CurateCli.runCycle(spark, opts("batch2", "day2")) == ((1L, 1L, 0L)))
    val v2 = spark.read.parquet(s"$root/out_day2").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v2(40L) == (("exact", Some(30L))), v2.toString) // healed match
    assert(v2(50L)._1 == "keep")
    // the healed rows landed under their own ingest partition
    assert(spark.read.parquet(s"$ledgerDir/fp")
      .filter($"ingest" === "day2_healed").collect()
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(30L))

    // RERUN of cycle 2 (crash-after-corpus-append rerun): the corpus
    // must not grow again AND the rerun's verdicts must REPRODUCE the
    // original cycle's — the batch's own ids are excluded from the
    // history side, so a previously-kept doc does not self-match as
    // 'exact' with matched_id = its own id
    val before = spark.read.parquet(corpusDir).count()
    CurateCli.runCycle(spark, opts("batch2", "day2"))
    assert(spark.read.parquet(corpusDir).count() == before,
      "rerun duplicated kept docs into the corpus")
    val v2b = spark.read.parquet(s"$root/out_day2").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v2b(50L) == (("keep", None)), v2b.toString) // NOT a self-match
    assert(v2b(40L) == (("exact", Some(30L))))         // real dup still flags
  }

  test("option parsing: required args, unknowns, help") {
    assert(CurateCli.parse(Seq("--corpus", "c")).isLeft)
    assert(CurateCli.parse(Seq("--bogus")).isLeft)
    assert(CurateCli.parse(Seq("-h")).exists(_.showHelp))
    val o = CurateCli.parse(Seq("--corpus", "c", "--batch", "b",
      "--ledger", "l", "--out", "o", "--ingest", "day1",
      "--threshold", "0.7", "--hashes", "16", "--force-start")).toOption.get
    assert(o.threshold == 0.7 && o.numHashes == 16 && o.n == 3 && o.forceStart)
    // --fit-bpe is a standalone mode like --build-dict
    assert(CurateCli.parse(Seq("--fit-bpe", "--corpus", "c")).isLeft)
    assert(CurateCli.parse(Seq("--fit-bpe", "--corpus", "c",
      "--bpe-merges", "m", "--bpe-num-merges", "0")).isLeft)
    val f = CurateCli.parse(Seq("--fit-bpe", "--corpus", "c",
      "--bpe-merges", "m", "--bpe-num-merges", "6")).toOption.get
    assert(f.fitBpe && f.bpeNumMerges == 6 && f.bpeMerges == "m")
  }

  test("--fit-bpe publishes the tokenizer; cycles account the tokens they add") {
    val root = java.nio.file.Files.createTempDirectory("curate-bpe").toString
    val corpusDir = s"$root/corpus"
    Seq(
      (1L, "spark sorts rows and spark scans rows"),
      (2L, "sorted scans over sorted rows win"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq(
      (10L, "spark sorts rows and spark scans rows"),        // exact dup
      (11L, "a wholly new document about window functions"), // keep
      (12L, "another new document about hash aggregates"))   // keep
      .toDF("doc_id", "text").write.parquet(s"$root/batch")

    // batch-side fit publishes the artifact through the staged rename
    val mergesPath = s"$root/merges"
    val n = CurateCli.fitBpeMerges(spark, CurateCli.Options(
      corpus = corpusDir, bpeMerges = mergesPath, fitBpe = true,
      bpeNumMerges = 4))
    assert(n == 4)
    val merges = graft.operators.Bpe.load(spark, mergesPath)

    // at-ingest cycle with --bpe-merges writes the per-cycle account
    val o = CurateCli.Options(corpus = corpusDir, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      bpeMerges = mergesPath)
    val (kept, exact, _) = CurateCli.runCycle(spark, o)
    assert(kept == 2 && exact == 1)
    val account = spark.read.parquet(s"$root/out_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(account.map(_._1) == Seq(11L, 12L))
    // the account equals a direct recompute over the same docs/merges
    val direct = graft.operators.Bpe.tokenCounts(
        spark.read.parquet(s"$root/batch").filter($"doc_id" > 10L),
        "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(account == direct)

    // recovery rerun: nothing newly appended -> empty account, same verdicts
    val (keptAgain, exactAgain, _) = CurateCli.runCycle(spark, o)
    assert(keptAgain == 2 && exactAgain == 1) // verdicts reproduce
    assert(spark.read.parquet(s"$root/out_tokens").count() == 0)
  }

  test("--stream with --bpe-merges: per-micro-batch token accounts") {
    val root = java.nio.file.Files.createTempDirectory("curate_sbpe").toString
    val corpusDir = s"$root/corpus"; val batchDir = s"$root/inbox"
    Seq((1L, "spark sorts rows and spark scans rows"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(batchDir))
    val mergesPath = s"$root/merges"
    CurateCli.fitBpeMerges(spark, CurateCli.Options(
      corpus = corpusDir, bpeMerges = mergesPath, fitBpe = true,
      bpeNumMerges = 3))
    val merges = graft.operators.Bpe.load(spark, mergesPath)

    def stage(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = s"$root/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(batchDir).resolve(name))
    }
    val b0 = Seq((10L, "a fresh streaming document about windows"))
    val b1 = Seq(
      (20L, "a fresh streaming document about windows"), // dup of streamed keeper
      (21L, "another fresh streaming document about aggregates"))
    stage(b0, "f0.parquet")
    stage(b1, "f1.parquet")

    val o = CurateCli.Options(corpus = corpusDir, batch = batchDir,
      ledger = s"$root/ledger", out = s"$root/out", ingest = "s1",
      bpeMerges = mergesPath)
    CurateCli.runStream(spark, o, s"$root/chk", maxFilesPerTrigger = 1)
      .awaitTermination()

    // each micro-batch wrote its own account of newly appended docs
    val a0 = spark.read.parquet(s"$root/out/batch=0_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    val a1 = spark.read.parquet(s"$root/out/batch=1_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a0.map(_._1) == Seq(10L) && a1.map(_._1) == Seq(21L))
    // accounts equal the direct batch recompute under the same artifact
    val direct = graft.operators.Bpe.tokenCounts(
        (b0 ++ b1.tail).toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert((a0 ++ a1).sortBy(_._1) == direct)
  }

  test("--fit-quality publishes the filter; cycles drop low-quality docs terminally") {
    val root = java.nio.file.Files.createTempDirectory("curate-qual").toString
    val corpusDir = s"$root/corpus"
    Seq((1L, "good clean prose about engines"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    // separable labeled set: 'spam' tokens mark the low-quality class
    (0 until 40).map { i =>
      if (i % 2 == 0) (s"useful informative article number$i", 1)
      else (s"spam spam buy now number$i", 0)
    }.toDF("text", "label").write.parquet(s"$root/labeled")

    val wPath = s"$root/weights"
    val n = CurateCli.fitQualityWeights(spark, CurateCli.Options(
      fitQuality = s"$root/labeled", qualityWeights = wPath,
      qualityBuckets = 32, qualityLr = 0.05, qualityIters = 6))
    assert(n == 32)
    val (wts, bias) = graft.operators.TextAnalysis.loadWeights(spark, wPath)

    // the trained filter separates held-out docs of the two styles
    val probe = Seq((100L, "useful informative article fresh"),
        (101L, "spam spam buy now fresh")).toDF("doc_id", "text")
    val scores = graft.operators.TextAnalysis
      .hashedMeanScore(probe, "text", wts, bias)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(scores(100L) > scores(101L))
    val thr = (scores(100L) + scores(101L)) / 2

    Seq(
      (10L, "useful informative article kept today"),
      (11L, "spam spam buy now dropped today"))
      .toDF("doc_id", "text").write.parquet(s"$root/batch")
    val o = CurateCli.Options(corpus = corpusDir, batch = s"$root/batch",
      ledger = s"$root/ledger", out = s"$root/out", ingest = "day1",
      qualityWeights = wPath, qualityThreshold = thr)
    val (kept, _, _) = CurateCli.runCycle(spark, o)
    assert(kept == 1)
    val v = spark.read.parquet(s"$root/out")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "keep", 11L -> "low_quality"))
    // the low-quality doc reached neither corpus nor ledger
    assert(spark.read.parquet(corpusDir).as[(Long, String)]
      .collect().map(_._1).sorted.toSeq == Seq(1L, 10L))
    assert(spark.read.parquet(s"$root/ledger/fp")
      .filter($"doc_id" === 11L).count() == 0)
  }

  test("ledger lock: second holder refused, force clears, lock released") {
    val dir = java.nio.file.Files.createTempDirectory("curate_lock").toString
    val inner = CurateCli.withLedgerLock(dir) {
      // a concurrent acquisition while held is refused with guidance
      val nested = CurateCli.withLedgerLock(dir)(42)
      assert(nested.isLeft && nested.swap.toOption.get.contains("--force-start"))
      "done"
    }
    assert(inner == Right("done"))
    // released on exit: a fresh acquisition works
    assert(CurateCli.withLedgerLock(dir)(1) == Right(1))
    // a leftover lock (crashed run) blocks until forced
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir).resolve(".graft-curate.lock"))
    assert(CurateCli.withLedgerLock(dir)(1).isLeft)
    assert(CurateCli.withLedgerLock(dir, force = true)(1) == Right(1))
    // ...and the body's exception still releases the lock
    intercept[RuntimeException] {
      CurateCli.withLedgerLock(dir)(throw new RuntimeException("boom"))
    }
    assert(CurateCli.withLedgerLock(dir)(2) == Right(2))
  }

  test("--stream: per-file micro-batches screen like cycles; a mid-stream kill replays clean") {
    val root = java.nio.file.Files.createTempDirectory("curate_stream").toString
    val corpusDir = s"$root/corpus"; val batchDir = s"$root/inbox"
    Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(batchDir))
    // file 1: one exact dup of the corpus, one novel keeper
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "a genuinely novel streaming document kept in micro-batch one"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$root/f1")
    // stage as single files so maxFilesPerTrigger=1 => one file per batch
    def stageFile(from: String, name: String): Unit = {
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(from))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(batchDir).resolve(name))
    }
    stageFile(s"$root/f1", "f1.parquet")
    val o = CurateCli.Options(corpus = corpusDir, batch = batchDir,
      ledger = s"$root/ledger", out = s"$root/out", ingest = "stream1")
    val chk = s"$root/chk"

    val q1 = CurateCli.runStream(spark, o, chk, maxFilesPerTrigger = 1)
    q1.awaitTermination()
    val v0 = spark.read.parquet(s"$root/out/batch=0").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v0 == Map(10L -> "exact", 11L -> "keep"), v0.toString)
    assert(spark.read.parquet(corpusDir).count() == 2)

    // file 2 arrives: an exact dup OF THE STREAMED KEEPER (proof each
    // micro-batch consumes what the previous one committed), a near-dup,
    // and a keeper — and the cycle is KILLED between its corpus append
    // and its ledger write (the torn window)
    Seq(
      (20L, "a genuinely novel streaming document kept in micro-batch one"),
      (21L, "a genuinely novel streaming document kept in micro-batch two"),
      (22L, "wholly unrelated follow-up content arriving in the second file"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/f2")
    stageFile(s"$root/f2", "f2.parquet")
    CurateCli.testFailBeforeLedgerWriteOnce = true
    val q2 = CurateCli.runStream(spark, o, chk, maxFilesPerTrigger = 1)
    val killed =
      try { q2.awaitTermination(); false }
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          var c: Throwable = e; var hit = false
          while (c != null) {
            hit ||= c.getMessage != null &&
              c.getMessage.contains("test kill between corpus append")
            c = c.getCause
          }
          assert(hit, s"unexpected stream failure: $e"); true
      } finally CurateCli.testFailBeforeLedgerWriteOnce = false
    assert(killed, "the kill hook never fired")
    // the kill landed AFTER the corpus append: the kept doc (22) is in
    // the corpus but its ledger rows are missing — the torn window
    assert(spark.read.parquet(corpusDir).count() == 3)

    // restart with the same checkpoint: the file source REDELIVERS the
    // uncommitted micro-batch; reconcile heals the ledger and the redo's
    // verdicts reproduce the original screen (no self-matches)
    val q3 = CurateCli.runStream(spark, o, chk, maxFilesPerTrigger = 1)
    q3.awaitTermination()
    val v1 = spark.read.parquet(s"$root/out/batch=1").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v1(20L) == (("exact", Some(11L))), v1.toString)
    assert(v1(21L)._1 == "near" && v1(21L)._2 == Some(11L), v1.toString)
    assert(v1(22L) == (("keep", None)), v1.toString)
    // no duplicate corpus rows from the replay; ledger healed + complete
    assert(spark.read.parquet(corpusDir).count() == 3)
    val ledgerIds = spark.read.parquet(s"$root/ledger/fp")
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ledgerIds == Set(1L, 11L, 22L), ledgerIds.toString)
    // stream == batch: a fresh BATCH screen of file 2 against the
    // pre-file-2 state gives the same verdicts (parity of the unit)
    // (10/11 were already committed, so only batch=1 is comparable; its
    // oracle is the incrementalDedup recompute over corpus-before-f2)
    val recompute = graft.operators.Dedup.incrementalDedup(
        spark.read.parquet(corpusDir).filter($"doc_id" < 20L),
        spark.read.parquet(s"$root/f2"), "doc_id", "text", 3, 8, 2, 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v1 == recompute, s"stream diverged from batch:\n$v1\n$recompute")
  }

  // --- ledger compaction -------------------------------------------------

  /** Three-cycle fixture: corpus + ledger with partitions
    * bootstrap/day1/day2, plus a probe batch whose screen exercises all
    * three verdicts. Returns (corpusDir, ledgerDir, probeDir). */
  private def compactFixture(root: String): (String, String, String) = {
    val corpusDir = s"$root/corpus"; val ledgerDir = s"$root/ledger"
    Seq((1L, "seed corpus document with some stable historical words here"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq((10L, "first day document entirely novel content about minhash bands today"))
      .toDF("doc_id", "text").write.parquet(s"$root/b1")
    Seq((20L, "second day document with fresh material on parquet compaction"))
      .toDF("doc_id", "text").write.parquet(s"$root/b2")
    def opts(b: String, ing: String) = CurateCli.Options(corpus = corpusDir,
      batch = s"$root/$b", ledger = ledgerDir, out = s"$root/out_$ing",
      ingest = ing)
    assert(CurateCli.runCycle(spark, opts("b1", "day1")) == ((1L, 0L, 0L)))
    assert(CurateCli.runCycle(spark, opts("b2", "day2")) == ((1L, 0L, 0L)))
    Seq(
      (30L, "first day document entirely novel content about minhash bands today"), // exact vs 10
      (31L, "second day document with fresh material on parquet compactions"), // near vs 20
      (32L, "a wholly unrelated probe document nothing resembles anywhere"))   // keep
      .toDF("doc_id", "text").write.parquet(s"$root/probe")
    (corpusDir, ledgerDir, s"$root/probe")
  }

  private def screenVerdicts(corpusDir: String, ledgerDir: String,
                             probeDir: String): Map[Long, (String, Option[Long])] = {
    val (fp, bands) = graft.operators.DedupLedger.read(spark, ledgerDir, 3, 8, 2)
    graft.operators.Dedup.incrementalDedupLedgered(
        spark.read.parquet(corpusDir), fp, bands,
        spark.read.parquet(probeDir), "doc_id", "text", 3, 8, 2, 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
  }

  test("compacted ledger yields identical verdicts; partitions fold respecting keep-labels") {
    val root = java.nio.file.Files.createTempDirectory("curate_cmp").toString
    val (corpusDir, ledgerDir, probeDir) = compactFixture(root)
    import graft.operators.DedupLedger
    assert(DedupLedger.ingestLabels(spark, ledgerDir)
      == Seq("bootstrap", "day1", "day2"))
    val before = screenVerdicts(corpusDir, ledgerDir, probeDir)
    assert(before(30L)._1 == "exact" && before(31L)._1 == "near" &&
      before(32L) == (("keep", None)), before.toString)

    // fold bootstrap+day1, keep day2 individually replayable
    DedupLedger.compact(spark, ledgerDir, 3, 8, 2,
      keepLabels = Set("day2"))
    assert(DedupLedger.ingestLabels(spark, ledgerDir)
      == Seq("compacted", "day2"))
    assert(screenVerdicts(corpusDir, ledgerDir, probeDir) == before,
      "compaction changed screen verdicts")

    // full fold (retention horizon passed): one partition, same verdicts
    DedupLedger.compact(spark, ledgerDir, 3, 8, 2)
    assert(DedupLedger.ingestLabels(spark, ledgerDir) == Seq("compacted"))
    assert(screenVerdicts(corpusDir, ledgerDir, probeDir) == before)

    // param mismatch is refused before any write
    intercept[IllegalArgumentException] {
      DedupLedger.compact(spark, ledgerDir, 4, 8, 2)
    }

    // and the CLI flag drives the same path (fresh fixture)
    val root2 = java.nio.file.Files.createTempDirectory("curate_cmp2").toString
    val (c2, l2, p2) = compactFixture(root2)
    val before2 = screenVerdicts(c2, l2, p2)
    val o = CurateCli.parse(Seq("--compact", "--ledger", l2,
      "--keep-label", "day2")).toOption.get
    assert(o.compact && o.keepLabels == Seq("day2"))
    CurateCli.withLedgerLock(o.ledger) {
      graft.operators.DedupLedger.compact(spark, o.ledger, o.n, o.numHashes,
        o.rowsPerBand, o.compactInto, o.keepLabels.toSet)
    }
    assert(graft.operators.DedupLedger.ingestLabels(spark, l2)
      == Seq("compacted", "day2"))
    assert(screenVerdicts(c2, l2, p2) == before2)
  }

  test("--retract: takedown removes the doc from corpus and ledgers; no ghost matches") {
    val root = java.nio.file.Files.createTempDirectory("curate_ret").toString
    val (corpusDir, ledgerDir, _) = compactFixture(root)
    import graft.operators.DedupLedger
    // doc 10 (day1's kept doc) is retracted
    Seq(Tuple1(10L)).toDF("doc_id").write.parquet(s"$root/takedown")
    val o = CurateCli.parse(Seq("--retract", s"$root/takedown",
      "--corpus", corpusDir, "--ledger", ledgerDir)).toOption.get
    assert(o.retractIds == s"$root/takedown")
    val (removed, fpP, bandP, _) = CurateCli.withLedgerLock(o.ledger) {
      CurateCli.runRetract(spark, o)
    }.toOption.get
    assert(removed == 1L && fpP > 0 && bandP > 0)
    // gone from the corpus...
    assert(spark.read.parquet(corpusDir)
      .filter($"doc_id" === 10L).count() == 0)
    // ...and from the ledger: re-ingesting its exact text now KEEPS
    // (previously "exact vs 10"); other history is untouched (31 still
    // near vs 20)
    val after = screenVerdicts(corpusDir, ledgerDir, s"$root/probe")
    assert(after(30L) == (("keep", None)), s"ghost exact match: ${after(30L)}")
    assert(after(31L)._1 == "near" && after(31L)._2 == Some(20L))
    // idempotent: retracting again is a no-op
    val (r2, f2, b2, _) = CurateCli.withLedgerLock(o.ledger) {
      CurateCli.runRetract(spark, o)
    }.toOption.get
    assert(r2 == 0L && f2 == 0 && b2 == 0)
  }

  test("retract kill-point sweep: interrupted ledger swap refuses reads, rolls forward") {
    val root0 = java.nio.file.Files.createTempDirectory("curate_ks0").toString
    val (c0, l0, p0) = compactFixture(root0)
    Seq(Tuple1(10L)).toDF("doc_id").write.parquet(s"$root0/takedown")
    graft.operators.DedupLedger.delete(spark,
      l0, spark.read.parquet(s"$root0/takedown"), 3, 8, 2)
    val want = screenVerdicts(c0, l0, p0)

    var ops = 1
    var sawCompletion = false
    while (!sawCompletion && ops < 40) {
      val root = java.nio.file.Files.createTempDirectory(s"curate_ks$ops").toString
      val (_, ledgerDir, probeDir) = compactFixture(root)
      val corpusDir = s"$root/corpus"
      Seq(Tuple1(10L)).toDF("doc_id").write.parquet(s"$root/takedown")
      graft.core.PartitionSwap.testFailAfterOps = Some(ops)
      val killed =
        try {
          graft.operators.DedupLedger.delete(spark, ledgerDir,
            spark.read.parquet(s"$root/takedown"), 3, 8, 2)
          false
        }
        catch { case _: IllegalStateException => true }
        finally graft.core.PartitionSwap.testFailAfterOps = None
      if (killed) {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        val pend = graft.core.PartitionSwap.pending(fs,
          new org.apache.hadoop.fs.Path(ledgerDir))
        if (pend) {
          // readers refuse the half-swapped ledger...
          intercept[IllegalArgumentException] {
            graft.operators.DedupLedger.read(spark, ledgerDir, 3, 8, 2)
          }
          // ...recovery rolls FORWARD to the deleted state
          assert(graft.operators.DedupLedger.recoverDelete(spark, ledgerDir))
        } else {
          // killed before the commit point: ledger intact; re-run completes
          graft.operators.DedupLedger.delete(spark, ledgerDir,
            spark.read.parquet(s"$root/takedown"), 3, 8, 2)
        }
        assert(screenVerdicts(corpusDir, ledgerDir, probeDir) == want,
          s"kill at op $ops: post-recovery screen diverged")
      } else sawCompletion = true
      ops += 1
    }
    assert(sawCompletion, "sweep never reached an uninterrupted delete")
  }

  test("--compact and --compact-corpus combine under one lock (neither silently skipped)") {
    // parse accepts the combination (the dispatch runs BOTH compactions
    // under the single ledger lock — see CurateCli.main)
    val o = CurateCli.parse(Seq("--compact", "--compact-corpus",
      "--corpus", "/c", "--ledger", "/l")).toOption.get
    assert(o.compact && o.compactCorpus)
    // --compact-corpus still demands its corpus path even when combined
    assert(CurateCli.parse(
      Seq("--compact", "--compact-corpus", "--ledger", "/l")).isLeft)
    // and --compact alone still only needs the ledger
    assert(CurateCli.parse(Seq("--compact", "--ledger", "/l")).isRight)
  }

  test("compaction kill-point sweep: every interrupted swap recovers to identical verdicts") {
    val root = java.nio.file.Files.createTempDirectory("curate_kill").toString
    val (corpusDir, ledgerDir, probeDir) = compactFixture(root)
    import graft.operators.DedupLedger
    val want = screenVerdicts(corpusDir, ledgerDir, probeDir)

    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    }

    var k = 1
    var clean = false
    while (!clean && k <= 20) {
      val lk = java.nio.file.Files
        .createTempDirectory(s"curate_kill_l$k").resolve("ledger")
      copyTree(java.nio.file.Paths.get(ledgerDir), lk)
      DedupLedger.testFailAfterSwapOps = Some(k)
      val killed =
        try { DedupLedger.compact(spark, lk.toString, 3, 8, 2); false }
        catch { case _: IllegalStateException => true }
        finally DedupLedger.testFailAfterSwapOps = None
      if (!killed) clean = true
      else {
        // next cycle's opening recovery (runCycle calls this first)
        DedupLedger.recoverCompact(spark, lk.toString)
      }
      // post-recovery the ledger reads cleanly and screens identically,
      // whatever the kill index left behind
      assert(screenVerdicts(corpusDir, lk.toString, probeDir) == want,
        s"k=$k verdicts diverged")
      // and no staging debris survives
      assert(!java.nio.file.Files.exists(lk.resolve("_compacting")), s"k=$k")
      assert(!java.nio.file.Files.exists(lk.resolve(".compact-tmp")), s"k=$k")
      assert(!java.nio.file.Files.exists(lk.resolve(".compact-old")), s"k=$k")
      k += 1
    }
    assert(clean, "sweep never reached a kill-free compaction — raise the bound")
    assert(k >= 4, s"sweep exercised too few kill points (clean at k=${k - 1})")
  }

  // ---- winnow-ledger compaction (span evidence retention) ----

  /** Three-ingest winnow ledger + a probe batch whose evidence set the
    * compaction must preserve bit-for-bit. */
  private def winnowCompactFixture(root: String): (String, org.apache.spark.sql.DataFrame) = {
    val run = "the quick brown fox jumps over the lazy dog again today"
    val wPath = s"$root/ledger/winnow"
    def day(docs: Seq[(Long, String)], ingest: String): Unit =
      graft.operators.WinnowLedger.write(docs.toDF("doc_id", "text"),
        "doc_id", "text", 5, 4, wPath, ingest)
    day(Seq((1L, s"bootstrap doc containing $run from the start")), "bootstrap")
    day(Seq((10L, "a genuinely novel first-day document kept whole")), "day1")
    day(Seq((20L, "novel second-day material on parquet compactions here")), "day2")
    val probe = Seq(
      (30L, s"submission repeating $run with a fresh tail"),
      (31L, "novel first-day document kept whole — a near variant"),
      (32L, "a wholly unrelated probe document nothing resembles anywhere"))
      .toDF("doc_id", "text")
    (wPath, probe)
  }

  private def winnowEvidence(wPath: String,
                             probe: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    graft.operators.Dedup.winnowingMatchesAgainst(
        graft.operators.WinnowLedger.read(spark, wPath, 5, 4),
        probe, "doc_id", "text", 5, 4)
      .select("batch_id", "pos_b", "hist_id", "pos_h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("winnow compaction folds partitions, keeps labels, preserves evidence") {
    import graft.operators.WinnowLedger
    val root = java.nio.file.Files.createTempDirectory("winnow_cmp").toString
    val (wPath, probe) = winnowCompactFixture(root)
    assert(WinnowLedger.ingestLabels(spark, wPath)
      == Seq("bootstrap", "day1", "day2"))
    val before = winnowEvidence(wPath, probe)
    assert(before.exists(_._3 == 1L), "fixture must produce shared runs")

    // fold bootstrap+day1, keep day2 individually replayable
    WinnowLedger.compact(spark, wPath, 5, 4, keepLabels = Set("day2"))
    assert(WinnowLedger.ingestLabels(spark, wPath) == Seq("compacted", "day2"))
    assert(winnowEvidence(wPath, probe) == before,
      "compaction changed span evidence")

    // full fold: one partition, same evidence
    WinnowLedger.compact(spark, wPath, 5, 4)
    assert(WinnowLedger.ingestLabels(spark, wPath) == Seq("compacted"))
    assert(winnowEvidence(wPath, probe) == before)

    // param mismatch is refused before any write
    intercept[IllegalArgumentException] {
      WinnowLedger.compact(spark, wPath, 7, 4)
    }

    // the CLI --compact branch covers <ledger>/winnow under the same lock
    val root2 = java.nio.file.Files.createTempDirectory("winnow_cmp2").toString
    val (wPath2, probe2) = winnowCompactFixture(root2)
    val before2 = winnowEvidence(wPath2, probe2)
    val o = CurateCli.parse(Seq("--compact", "--ledger", s"$root2/ledger",
      "--keep-label", "day2")).toOption.get
    CurateCli.withLedgerLock(o.ledger) {
      if (graft.operators.WinnowLedger.exists(s"${o.ledger}/winnow"))
        WinnowLedger.compact(spark, s"${o.ledger}/winnow",
          o.spanK, o.spanW, o.compactInto, o.keepLabels.toSet)
    }
    assert(WinnowLedger.ingestLabels(spark, wPath2) == Seq("compacted", "day2"))
    assert(winnowEvidence(wPath2, probe2) == before2)
  }

  test("winnow compaction kill-point sweep: every interrupted swap recovers") {
    import graft.operators.WinnowLedger
    val root = java.nio.file.Files.createTempDirectory("winnow_kill").toString
    val (wPath, probe) = winnowCompactFixture(root)
    val want = winnowEvidence(wPath, probe)

    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    }

    var k = 1
    var clean = false
    while (!clean && k <= 15) {
      val lk = java.nio.file.Files
        .createTempDirectory(s"winnow_kill_l$k").resolve("winnow")
      copyTree(java.nio.file.Paths.get(wPath), lk)
      WinnowLedger.testFailAfterSwapOps = Some(k)
      val killed =
        try { WinnowLedger.compact(spark, lk.toString, 5, 4); false }
        catch { case _: IllegalStateException => true }
        finally WinnowLedger.testFailAfterSwapOps = None
      if (!killed) clean = true
      else WinnowLedger.recoverCompact(spark, lk.toString) // next cycle's opening recovery
      assert(winnowEvidence(lk.toString, probe) == want, s"k=$k evidence diverged")
      assert(!java.nio.file.Files.exists(lk.resolve("_compacting")), s"k=$k")
      assert(!java.nio.file.Files.exists(lk.resolve(".compact-tmp")), s"k=$k")
      assert(!java.nio.file.Files.exists(lk.resolve(".compact-old")), s"k=$k")
      k += 1
    }
    assert(clean, "sweep never reached a kill-free compaction — raise the bound")
    assert(k >= 4, s"sweep exercised too few kill points (clean at k=${k - 1})")
  }

  test("--stream --span-evidence: micro-batches write span evidence + winnow ledger; mid-kill heals") {
    val run = "the quick brown fox jumps over the lazy dog again today"
    val root = java.nio.file.Files.createTempDirectory("curate_stream_span").toString
    val corpusDir = s"$root/corpus"; val batchDir = s"$root/inbox"
    Seq((1L, s"corpus doc containing $run from the start"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(batchDir))
    def stageFile(from: String, name: String): Unit = {
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(from))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(batchDir).resolve(name))
    }
    // file 1: a keeper repeating the corpus run (span evidence vs doc 1)
    // and a novel keeper whose text seeds batch 2's evidence
    Seq(
      (10L, "a genuinely novel streaming document kept in micro-batch one"),
      (11L, s"submission repeating $run with a fresh tail"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/f1")
    stageFile(s"$root/f1", "f1.parquet")
    val o = CurateCli.Options(corpus = corpusDir, batch = batchDir,
      ledger = s"$root/ledger", out = s"$root/out", ingest = "stream1",
      spanEvidence = true)
    val chk = s"$root/chk"

    CurateCli.runStream(spark, o, chk, maxFilesPerTrigger = 1).awaitTermination()
    val ev0 = spark.read.parquet(s"$root/out/batch=0_spans").collect()
      .map(r => (r.getLong(0), r.getLong(2))).distinct.toSet
    assert(ev0 == Set((11L, 1L)), ev0.toString)
    // the winnow ledger grew by micro-batch 0's kept docs
    assert(spark.read.parquet(s"$root/ledger/winnow/wfp")
      .filter($"doc_id" === 10L).count() > 0)

    // file 2: an exact dup of streamed keeper 10 (its evidence must name
    // 10 — proof batch 1 reads the winnow rows batch 0 committed) plus a
    // novel keeper; the cycle is KILLED between the corpus append and
    // the ledger writes, so BOTH ledgers (dedup + winnow) are torn
    Seq(
      (20L, "a genuinely novel streaming document kept in micro-batch one"),
      (22L, "wholly unrelated follow-up content arriving in the second file"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/f2")
    stageFile(s"$root/f2", "f2.parquet")
    CurateCli.testFailBeforeLedgerWriteOnce = true
    val q2 = CurateCli.runStream(spark, o, chk, maxFilesPerTrigger = 1)
    val killed =
      try { q2.awaitTermination(); false }
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          var c: Throwable = e; var hit = false
          while (c != null) {
            hit ||= c.getMessage != null &&
              c.getMessage.contains("test kill between corpus append")
            c = c.getCause
          }
          assert(hit, s"unexpected stream failure: $e"); true
      } finally CurateCli.testFailBeforeLedgerWriteOnce = false
    assert(killed, "the kill hook never fired")
    // torn: 22 reached the corpus but neither ledger
    assert(spark.read.parquet(corpusDir).count() == 4)
    assert(spark.read.parquet(s"$root/ledger/winnow/wfp")
      .filter($"doc_id" === 22L).count() == 0)

    // restart: redelivered micro-batch heals both ledgers, reproduces
    // the evidence, and keeps the replay idempotent
    CurateCli.runStream(spark, o, chk, maxFilesPerTrigger = 1).awaitTermination()
    val ev1 = spark.read.parquet(s"$root/out/batch=1_spans").collect()
      .map(r => (r.getLong(0), r.getLong(2))).distinct.toSet
    assert(ev1.contains((20L, 10L)), ev1.toString)
    assert(ev1.forall(e => e._2 != 20L && e._2 != 22L),
      "batch docs leaked onto the history side")
    assert(spark.read.parquet(corpusDir).count() == 4) // no dup appends
    // winnow ledger complete again: one fingerprint set per corpus doc
    val wIds = spark.read.parquet(s"$root/ledger/winnow/wfp")
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(wIds == Set(1L, 10L, 11L, 22L), wIds.toString)

    // stream == batch: recomputing the evidence from the pre-file-2
    // corpus state reproduces batch 1's spans row set exactly
    val histBefore = spark.read.parquet(corpusDir).filter($"doc_id" < 20L)
    val recompute = graft.operators.Dedup.winnowingMatchesAgainst(
        graft.operators.TextAnalysis.winnowFingerprints(
          histBefore, "doc_id", "text", 5, 4),
        spark.read.parquet(s"$root/f2"), "doc_id", "text", 5, 4)
      .select("batch_id", "pos_b", "hist_id", "pos_h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val spans1 = spark.read.parquet(s"$root/out/batch=1_spans")
      .select("batch_id", "pos_b", "hist_id", "pos_h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(spans1 == recompute, "stream spans diverged from batch recompute")
  }

  test("--compact-corpus: fewer files, identical content, crash-safe swap, cycles keep screening") {
    val root = java.nio.file.Files.createTempDirectory("curate_ccorp").toString
    val corpusDir = s"$root/corpus"; val ledgerDir = s"$root/ledger"
    Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text").write.parquet(corpusDir)
    def opts(b: String, ing: String) = CurateCli.Options(corpus = corpusDir,
      batch = s"$root/$b", ledger = ledgerDir, out = s"$root/out_$ing",
      ingest = ing)
    // several cycles, each appending its own file set (texts genuinely
    // distinct — shared shingles would near-dup them away)
    val texts = Map(
      1 -> "glacier mapping expedition notes from the northern fjord survey",
      2 -> "sourdough fermentation chemistry and crumb structure analysis",
      3 -> "distributed consensus protocols under partial network partitions",
      4 -> "baroque counterpoint voice leading in late keyboard fugues")
    for (i <- 1 to 4) {
      Seq((10L * i, texts(i)))
        .toDF("doc_id", "text").repartition(3).write.parquet(s"$root/b$i")
      CurateCli.runCycle(spark, opts(s"b$i", s"day$i"))
    }
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def files() = fs.listStatus(new org.apache.hadoop.fs.Path(corpusDir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    def content() = spark.read.parquet(corpusDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val before = content()
    assert(before.size == 5 && files() >= 5, s"fixture: ${files()} files")

    val (rows, fb, fa) = CurateCli.compactCorpus(spark, corpusDir)
    assert(rows == 5 && fa < fb && fa == 1, s"rows=$rows files $fb -> $fa")
    assert(content() == before, "compaction changed the corpus")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$corpusDir.tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$corpusDir.old")))

    // mid-swap crash window: corpus parked, nothing live — the next
    // cycle heals it back and screens as if nothing happened
    assert(fs.rename(new org.apache.hadoop.fs.Path(corpusDir),
      new org.apache.hadoop.fs.Path(s"$corpusDir.old")))
    Seq(
      (90L, "sourdough fermentation chemistry and crumb structure analysis"), // exact dup of 20
      (91L, "a wholly fresh post-compaction document arriving now"))
      .toDF("doc_id", "text").write.parquet(s"$root/b5")
    val (kept, exact, near) = CurateCli.runCycle(spark, opts("b5", "day5"))
    assert((kept, exact, near) == ((1L, 1L, 0L)), s"$kept/$exact/$near")
    val v = spark.read.parquet(s"$root/out_day5").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v(90L) == (("exact", Some(20L))), v.toString)
    assert(v(91L) == (("keep", None)))
    assert(content() == before +
      ((91L, "a wholly fresh post-compaction document arriving now")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$corpusDir.old")))

    // the CLI path parses and validates
    val o = CurateCli.parse(Seq("--compact-corpus", "--corpus", corpusDir,
      "--ledger", ledgerDir, "--target-file-mb", "64")).toOption.get
    assert(o.compactCorpus && o.targetFileMb == 64)
    assert(CurateCli.parse(Seq("--compact-corpus", "--corpus", corpusDir))
      .isLeft) // the cycle lock (--ledger) is required
  }

  test("--retract-watch: takedowns drain between micro-batches; mid-drain kill recovers") {
    def setup(tag: String): (String, CurateCli.Options) = {
      val root = java.nio.file.Files.createTempDirectory(tag).toString
      val corpusDir = s"$root/corpus"
      Seq((1L, "seed corpus document with some stable historical words here"))
        .toDF("doc_id", "text").write.parquet(corpusDir)
      Seq((10L, "first day document entirely novel content about minhash bands today"))
        .toDF("doc_id", "text").write.parquet(s"$root/b1")
      val day1 = CurateCli.Options(corpus = corpusDir, batch = s"$root/b1",
        ledger = s"$root/ledger", out = s"$root/out_day1", ingest = "day1")
      assert(CurateCli.runCycle(spark, day1) == ((1L, 0L, 0L)))
      // queue the takedown of day1's kept doc
      val watch = s"$root/watch"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(watch))
      Seq(Tuple1(10L)).toDF("doc_id").coalesce(1).write.parquet(s"$root/rq")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/rq"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(watch).resolve("takedown1.parquet"))
      // inbox: an exact re-submission of the retracted text + a keeper
      val inbox = s"$root/inbox"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
      Seq(
        (30L, "first day document entirely novel content about minhash bands today"),
        (31L, "wholly unrelated follow-up content arriving after the takedown"))
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/f1")
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/f1"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(f,
        java.nio.file.Paths.get(inbox).resolve("f1.parquet"))
      (root, day1.copy(batch = inbox, out = s"$root/out_stream",
        ingest = "stream1", stream = true, retractWatch = watch))
    }

    // clean path: the stream drains the takedown BEFORE screening, so
    // the re-submitted text is a keep (no ghost match), and the request
    // file lands in done/
    val (root1, o1) = setup("curate_rw")
    CurateCli.runStream(spark, o1, s"$root1/chk").awaitTermination()
    val v = spark.read.parquet(s"${o1.out}/batch=0").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(30L -> "keep", 31L -> "keep"), v.toString)
    assert(spark.read.parquet(o1.corpus)
      .filter($"doc_id" === 10L).isEmpty, "corpus kept the retracted doc")
    assert(new java.io.File(s"${o1.retractWatch}/done/takedown1.parquet")
      .isFile, "drained request not moved to done/")
    assert(!new java.io.File(s"${o1.retractWatch}/takedown1.parquet")
      .exists())

    // kill path: the ledger delete inside the drain dies mid-commit —
    // the stream start fails loudly; the restart re-drains (roll-forward
    // + idempotent re-run) and converges to the same state
    val (root2, o2) = setup("curate_rwk")
    graft.core.PartitionSwap.testFailAfterOps = Some(2)
    val failed =
      try { CurateCli.runStream(spark, o2, s"$root2/chk"); false }
      catch { case _: IllegalStateException => true }
      finally graft.core.PartitionSwap.testFailAfterOps = None
    assert(failed, "the kill hook never fired")
    // request file still queued (not moved), corpus half already done
    assert(new java.io.File(s"${o2.retractWatch}/takedown1.parquet").isFile)
    CurateCli.runStream(spark, o2, s"$root2/chk").awaitTermination()
    val v2 = spark.read.parquet(s"${o2.out}/batch=0").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2 == Map(30L -> "keep", 31L -> "keep"), v2.toString)
    assert(spark.read.parquet(o2.corpus).filter($"doc_id" === 10L).isEmpty)
    assert(new java.io.File(s"${o2.retractWatch}/done/takedown1.parquet")
      .isFile)

    // parse surface
    assert(CurateCli.parse(Seq("--retract-watch", "/w", "--corpus", "/c",
      "--batch", "/b", "--ledger", "/l", "--out", "/o", "--ingest", "i"))
      .isLeft) // requires --stream
  }

  test("--bucket-corpus: cycles and retract on the bucketed layout, compaction preserves it") {
    val root = java.nio.file.Files.createTempDirectory("curate_bkt").toString
    val (corpusDir, ledgerDir, probeDir) = compactFixture(root)
    val want = screenVerdicts(corpusDir, ledgerDir, probeDir)

    // CLI parse + migration under the lock (the main-dispatch shape)
    val po = CurateCli.parse(Seq("--bucket-corpus", "8", "--corpus",
      corpusDir, "--ledger", ledgerDir)).toOption.get
    assert(po.bucketCorpus == 8)
    assert(CurateCli.parse(Seq("--bucket-corpus", "8", "--corpus",
      corpusDir)).isLeft) // the cycle lock (--ledger) is required
    val (rows, b) = CurateCli.withLedgerLock(ledgerDir) {
      graft.core.CorpusStore.bucketize(spark, corpusDir, "doc_id", 8)
    }.toOption.get
    assert(rows == 3L && b == 8)
    assert(graft.core.CorpusStore.isBucketed(corpusDir))
    // screen keys unchanged by the layout: identical verdicts
    assert(screenVerdicts(corpusDir, ledgerDir, probeDir) == want)

    // a third cycle appends INTO the bucket layout (no flat root files)
    // and later batches screen against what it kept
    Seq((40L, "a wholly unrelated probe document nothing resembles anywhere"))
      .toDF("doc_id", "text").write.parquet(s"$root/b3")
    val o3 = CurateCli.Options(corpus = corpusDir, batch = s"$root/b3",
      ledger = ledgerDir, out = s"$root/out_day3", ingest = "day3")
    assert(CurateCli.runCycle(spark, o3) == ((1L, 0L, 0L)))
    assert(!new java.io.File(corpusDir).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")),
      "cycle append wrote flat files into a bucketed corpus")
    val after3 = screenVerdicts(corpusDir, ledgerDir, probeDir)
    assert(after3(32L)._1 == "exact" && after3(32L)._2 == Some(40L),
      s"bucketed-corpus cycle's kept doc not screening: ${after3(32L)}")

    // surgical retract: only the bucket dirs the ids hash into move
    def dirFiles(): Map[String, Set[String]] =
      new java.io.File(corpusDir).listFiles().filter(f =>
          f.isDirectory && f.getName.startsWith("docb=")).map { d =>
        d.getName -> d.listFiles().map(_.getName).toSet
      }.toMap
    val beforeRetract = dirFiles()
    Seq(Tuple1(10L)).toDF("doc_id").write.parquet(s"$root/takedown")
    val o = CurateCli.parse(Seq("--retract", s"$root/takedown",
      "--corpus", corpusDir, "--ledger", ledgerDir)).toOption.get
    val (removed, fpP, bandP, _) = CurateCli.withLedgerLock(o.ledger) {
      CurateCli.runRetract(spark, o)
    }.toOption.get
    assert(removed == 1L && fpP > 0 && bandP > 0)
    val afterRetract = dirFiles()
    val touched = beforeRetract.keySet.filter(d =>
      afterRetract.get(d) != beforeRetract.get(d))
    assert(touched.size <= 1, s"retract rewrote $touched")
    assert(graft.core.CorpusStore.read(spark, corpusDir)
      .filter($"doc_id" === 10L).isEmpty)
    // no ghost matches: re-ingesting doc 10's exact text now keeps
    val afterR = screenVerdicts(corpusDir, ledgerDir, probeDir)
    assert(afterR(30L) == (("keep", None)), s"ghost: ${afterR(30L)}")

    // --compact-corpus preserves the bucket layout and the verdicts
    val (cRows, _, _) = CurateCli.compactCorpus(spark, corpusDir, 64)
    assert(cRows == 3L) // 1 seed + day2's 20 + day3's 40 (10 retracted)
    assert(graft.core.CorpusStore.isBucketed(corpusDir),
      "compaction dropped the bucket layout")
    assert(new java.io.File(corpusDir).listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("docb=")))
    assert(screenVerdicts(corpusDir, ledgerDir, probeDir) == afterR)
  }
}
