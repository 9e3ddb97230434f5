package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzz coverage for the VCF reader — VCF uploads are user-shaped input,
  * so the reader's contract mirrors TsvReader's: malformed `##INFO`
  * declarations are skipped (never mis-parsed into a crash), a file
  * without a `#CHROM` header fails with a named error (not a bare
  * NoSuchElementException), and NO data-line malformation — non-numeric
  * or overflowing positions, ragged sample columns, garbage genotypes,
  * unparsable INFO values — may ever throw out of a scan task: bad cells
  * become nulls (the reference's permissive parse), bad rows at worst
  * contribute nonsense values, and the pipeline completes. */
class VcfReaderFuzzSpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9177L + i)))

  // cell soup for data fields: digits, letters, separators VCF cares about
  private val cellChar = Gen.frequency(
    4 -> Gen.numChar, 4 -> Gen.alphaChar,
    1 -> Gen.const('.'), 1 -> Gen.const(','), 1 -> Gen.const(';'),
    1 -> Gen.const(':'), 1 -> Gen.const('/'), 1 -> Gen.const('|'),
    1 -> Gen.const('='), 1 -> Gen.const('<'), 1 -> Gen.const('>'))
  private val cell = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, cellChar)).map(_.mkString)

  // ##-meta lines: some well-formed INFO declarations, some truncated or
  // scrambled ones, some unrelated meta
  private val metaLine = Gen.frequency(
    3 -> Gen.oneOf(
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
      "##INFO=<ID=AF,Number=A,Type=Float,Description=\"freq\">",
      "##INFO=<ID=DB,Number=0,Type=Flag>",
      "##INFO=<ID=VT,Number=1,Type=String,Description=\"type\">"),
    3 -> Gen.oneOf(
      "##INFO=<ID=BROKEN",                         // truncated
      "##INFO=<Number=1,Type=Integer>",            // no ID
      "##INFO=garbage-without-angle-brackets",
      "##INFO=<ID=,Number=,Type=>",                // empty fields
      "##fileformat=VCFv4.2",
      "##contig=<ID=1,length=249250621>",
      "##=",
      "###"),
    1 -> cell.map(c => s"##$c"))

  private val sampleCount = Gen.choose(0, 4)

  // data lines: sometimes the right arity for the declared samples,
  // sometimes ragged (too few / too many fields), cells are soup with a
  // bias toward plausible values so deep branches (GT parse, allele
  // resolution, INFO typing) also run on well-formed rows
  private def dataLine(nSamples: Int): Gen[String] = for {
    plausible <- Gen.prob(0.5)
    chrom <- Gen.oneOf("1", "2", "X", "chr7", "")
    pos <- if (plausible) Gen.choose(1L, 300000000L).map(_.toString)
           else Gen.oneOf("", ".", "abc", "12x", "99999999999999999999999", "-5")
    rs <- Gen.oneOf(".", "rs1;rs2", "rs42", "", ";;")
    ref <- Gen.oneOf("A", "ACGT", "", ".")
    alt <- Gen.oneOf("T", "T,G", ".", "", ",,")
    qual <- Gen.oneOf("50", ".", "", "high")
    filt <- Gen.oneOf("PASS", ".", "q10;s50", "")
    info <- Gen.oneOf("DP=14;AF=0.5;DB", "DP=abc;AF=xyz", ".", "", ";=;",
      "DB;DB=0", "AF=0.1,0.2", "DP=99999999999999999999999")
    fmt <- Gen.oneOf("GT:DP", "GT", "DP", "", ":::")
    gts <- Gen.listOfN(nSamples,
      if (plausible) Gen.oneOf("0/1:12", "0|0", "./.", "1", ".", "2/1")
      else cell)
    ragged <- Gen.choose(-2, 2)
    all = Seq(chrom, pos, rs, ref, alt, qual, filt, info, fmt) ++ gts
    cut = if (ragged < 0) all.dropRight(-ragged)
          else if (ragged > 0) all ++ Seq.fill(ragged)("x")
          else all
  } yield cut.mkString("\t")

  private def fileGen: Gen[(String, Int)] = for {
    nMeta <- Gen.choose(0, 6)
    metas <- Gen.listOfN(nMeta, metaLine)
    nSamp <- sampleCount
    nData <- Gen.choose(0, 12)
    data <- Gen.listOfN(nData, dataLine(nSamp))
    header = (Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
      "INFO", "FORMAT") ++ (1 to nSamp).map(i => s"S$i")).mkString("\t")
  } yield ((metas :+ header) ++ data).mkString("\n") -> nSamp

  private def write(content: String): String = {
    val f = Files.createTempFile("vcffuzz", ".vcf")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("random VCF-ish files: the full read pipeline never throws from a scan") {
    sample(fileGen, 40).foreach { case (content, _) =>
      val path = write(content)
      val fields = VcfReader.infoFields(spark, path) // must never throw
      val ids = VcfReader.samples(spark, path)
      val v = VcfReader.variants(spark, path)
      // every stage collects: any ANSI cast / parse error inside a task
      // surfaces here as a SparkException and fails the fuzz
      v.collect()
      VcfReader.explodeSamples(v, ids).collect()
      VcfReader.subjectSummary(v, ids, "FUZZ").collect()
      VcfReader.explodeInfo(v, fields).collect()
    }
  }

  test("malformed ##INFO declarations are skipped, well-formed ones kept") {
    val path = write(Seq(
      "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
      "##INFO=<ID=BROKEN",
      "##INFO=<Number=1,Type=Integer>",
      "##INFO=<ID=,Number=,Type=>",
      "##INFO=<ID=AF,Number=A,Type=Float>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
      "1\t10\trs1\tA\tT\tPASS\t.\tDP=4\tGT\t0/1").mkString("\n"))
    val ids = VcfReader.infoFields(spark, path).map(_.id)
    assert(ids == Seq("DP", "AF"))
  }

  test("header-less file: named error, not NoSuchElementException") {
    val path = write("##fileformat=VCFv4.2\n##INFO=<ID=DP,Number=1,Type=Integer>")
    val e = intercept[IllegalArgumentException](VcfReader.samples(spark, path))
    assert(e.getMessage.contains(path))
  }

  test("non-numeric and overflowing positions become null rows, not scan errors") {
    val path = write(Seq(
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
      "1\tabc\trs1\tA\tT\t.\t.\t.\tGT\t0/1",
      "1\t99999999999999999999999\trs2\tA\tT\t.\t.\t.\tGT\t0/1",
      "1\t42\trs3\tA\tT\t.\t.\t.\tGT\t0/1").mkString("\n"))
    val pos = VcfReader.variants(spark, path).select("pos")
      .collect().map(r => Option(r.get(0)))
    assert(pos.toSet == Set(None, Some(42L)))
  }

  test("ragged sample columns and GT-less FORMAT drop to null/no rows") {
    val path = write(Seq(
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
      "1\t10\trs1\tA\tT\t.\t.\t.\tGT\t0/1",            // missing S2 cell
      "1\t11\trs2\tA\tT\t.\t.\t.\tDP\t12\t13",          // FORMAT without GT
      "1\t12\trs3\tA\tT\t.\t.\t.\tGT\t0/1\t1/1\textra" // extra cell
    ).mkString("\n"))
    val ids = VcfReader.samples(spark, path)
    val v = VcfReader.variants(spark, path)
    val ss = VcfReader.subjectSummary(v, ids, "T")
    // rs2's FORMAT lacks GT -> no rows (the reference's contract);
    // rs1 contributes only its present sample; rs3's extra cell is ignored
    val byProbe = ss.collect().groupBy(_.getAs[String]("probeset_id"))
    assert(!byProbe.contains("rs2"))
    assert(byProbe("rs1").length == 1)
    assert(byProbe("rs3").length == 2)
  }
}
