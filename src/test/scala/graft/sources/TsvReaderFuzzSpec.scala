package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Fuzz coverage for the TSV reader — upload files are user-shaped input,
  * so the permissive path's contract is: ANY text file with at least one
  * non-comment line parses into rows of exactly header-width cells (short
  * rows padded, repairable long rows trimmed, irreparable rows dropped),
  * and nothing ever throws out of a scan task. Strict mode may only fail
  * with the named irreparable-row error; an empty/all-comment file fails
  * with a message naming the file, not a bare NoSuchElementException. */
class TsvReaderFuzzSpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4321L + i)))

  // printable-ish soup incl. tabs, quotes, hash, unicode, and empties —
  // newlines excluded (they are the line separator under test)
  private val cellChar =
    Gen.frequency(6 -> Gen.alphaNumChar, 1 -> Gen.const('\t'),
      1 -> Gen.const('"'), 1 -> Gen.const('#'), 1 -> Gen.const('多'),
      1 -> Gen.const(' '), 1 -> Gen.const(','))
  private val lineGen = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, cellChar)).map(_.mkString)
  private val fileGen = Gen.choose(1, 25)
    .flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))

  private def write(content: String): String = {
    val f = Files.createTempFile("tsvfuzz", ".tsv")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("random text files: permissive read never throws, rows are header-width") {
    sample(fileGen, 40).foreach { content =>
      val path = write(content)
      val hasHeader = content.split("\n", -1)
        .exists(l => !l.startsWith("#") && l.trim.nonEmpty)
      if (!hasHeader) {
        val e = intercept[IllegalArgumentException](
          TsvReader.read(spark, path, strict = false))
        assert(e.getMessage.contains(path))
      } else {
        val df = TsvReader.read(spark, path, strict = false)
        val width = df.columns.length
        // collect forces every task; any per-line throw would surface here
        df.collect().foreach(r => assert(r.length == width))
      }
      Files.delete(java.nio.file.Paths.get(path))
    }
  }

  test("empty and all-comment files fail with the named-file error") {
    Seq("", "#only\n# comments", "\n  \n\t\n").foreach { content =>
      val path = write(content)
      val e = intercept[IllegalArgumentException](
        TsvReader.read(spark, path))
      assert(e.getMessage.contains("no header row"), e.getMessage)
      Files.delete(java.nio.file.Paths.get(path))
    }
  }

  test("pathological quoting round-trips without a throw") {
    // unterminated quotes, quote-only cells, embedded doubled quotes
    val content = "a\tb\tc\n\"\t\"\"\t\"x\n\"q\"\"q\"\tplain\t\"\"\n"
    val path = write(content)
    val rows = TsvReader.read(spark, path).collect()
    assert(rows.forall(_.length == 3))
    // commons-csv TDF semantics: "q""q" unwraps to q"q
    assert(rows.exists(r => r.getString(0) == "q\"q"))
    Files.delete(java.nio.file.Paths.get(path))
  }

  test("strict mode names only the irreparable-row condition") {
    val bad = "h1\th2\nok\tok\nextra\tcells\there\n"
    val path = write(bad)
    val e = intercept[IllegalArgumentException](
      TsvReader.read(spark, path, strict = true))
    assert(e.getMessage.contains("extra non-empty cells"))
    Files.delete(java.nio.file.Paths.get(path))
  }
}
