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
      assert(!sql.contains("\u0000"), s"$k: NUL byte in oracle SQL")
    }
  }
}
