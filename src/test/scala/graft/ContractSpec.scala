package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every gated query must carry a DuckDB
  * oracle twin (a missing entry silently downgrades that key to the
  * driver's weaker rows-only check), and no oracle may go stale against
  * a removed query. Pure map comparison — no Spark session. */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle twin: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"orphan oracles: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("oracle SQL entries are non-empty and control-clean") {
    // (no dollar-interpolation lint: legitimate oracles carry dollars
    // both as regex anchors and as the reference's tag-substitution
    // placeholder syntax)
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      // (HUGEINT/DECIMAL output lint lives in the DuckDB-backed test below)
      assert(!sql.contains("\u0000"), s"$k: NUL byte in oracle SQL")
    }
  }

  /** The round-12 hash break: DuckDB widens integer SUMs to HUGEINT
    * (and some arithmetic to DECIMAL); pyarrow surfaces both as
    * float64, so a value-identical oracle still fails the driver's
    * stringified hash. DESCRIBE every twin in DuckDB and assert no
    * output column lands on HUGEINT/UHUGEINT/DECIMAL. Runs only where
    * the driver-side toolchain (python3 + duckdb + sf tables) exists
    * and cancels cleanly elsewhere, so the library itself never
    * depends on it. */
  test("no oracle twin emits HUGEINT/DECIMAL output columns") {
    import scala.sys.process._
    val sfDir = new java.io.File("/root/testdata/sf0.001")
    val duckOk =
      try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
      catch { case _: java.io.IOException => false }
    assume(duckOk && sfDir.isDirectory &&
      new java.io.File("scripts/lint_oracle_types.py").isFile,
      "driver-side duckdb toolchain not available here")

    def jsonEsc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + jsonEsc(k) + "\": \"" + jsonEsc(v) + "\"" }
      .mkString("{", ",\n", "}")
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))
    val out = new StringBuilder
    val rc = Process(Seq("python3", "scripts/lint_oracle_types.py",
      tmp.toString, sfDir.getPath)).!(ProcessLogger(l => out.append(l).append('\n')))
    java.nio.file.Files.deleteIfExists(tmp)
    assert(rc == 0, s"oracle type lint failed:\n$out")
  }
}
