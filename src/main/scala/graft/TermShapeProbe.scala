package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of text_tfidf / text_bm25's read shapes at a chosen SF —
  * plain one-split read vs the round-robin spread. The spread was
  * measured a LOSS at sf0.1 (r6, re-measured r15: the extra exchange plus
  * 32-way tiny-block fetches across the explode->agg->join->window chain
  * exceed the serial map side's cost); this probe re-checks the crossover
  * at sf1 (VERDICT r15 item 8). Min-of-3 each form, identical results
  * asserted.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/repo/target/sf1probe \
  *        sbt "runMain graft.TermShapeProbe"
  */
object TermShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def plain = spark.read.parquet(s"$dir/documents.parquet")
    def par = plain.repartition(cpus.toInt)

    def time(label: String)(mk: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shape] $label%-14s min-of-3 ${runs.min}%7.3f s  (all: ${runs.map(r => f"$r%.3f").mkString(", ")})")
      runs.min
    }
    spark.range(10).count()

    def tfidf(docs: DataFrame) =
      graft.operators.TermStats.tfidfTopTerms(docs, "doc_id", "text", k = 5)
    def bm25(docs: DataFrame) =
      graft.operators.TermStats.bm25TopTerms(docs, "doc_id", "text", k = 5)

    val a = time("tfidf-plain")(tfidf(plain))
    val b = time("tfidf-spread")(tfidf(par))
    require(tfidf(plain).collect().map(_.toString).sorted.toSeq ==
      tfidf(par).collect().map(_.toString).sorted.toSeq, "tfidf shapes disagree")
    println(f"[shape] tfidf identical; spread/plain = ${b / a}%.2f")

    val c = time("bm25-plain")(bm25(plain))
    val d = time("bm25-spread")(bm25(par))
    require(bm25(plain).collect().map(_.toString).sorted.toSeq ==
      bm25(par).collect().map(_.toString).sorted.toSeq, "bm25 shapes disagree")
    println(f"[shape] bm25 identical; spread/plain = ${d / c}%.2f")
    spark.stop()
  }
}
