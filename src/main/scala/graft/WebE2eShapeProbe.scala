package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Same-JVM A/B of pipeline_web_e2e's two shapes — plan-duplicated
  * extraction vs the lazily-checkpointed frame (not part of the library
  * surface; the IvfShapeProbe discipline: min-of-3 each, identical
  * result sets asserted). */
object WebE2eShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def page = concat(
      lit("<html><head><style>nav{x:1}</style><script>t(1<2)</script></head><body>"),
      lit("<div>Accept all cookies</div><div>home | products | contact</div>"),
      lit("<p>"), col("text"), lit("</p></body></html>"))
    def extracted: DataFrame = spark.read
      .parquet(s"$dir/documents.parquet")
      .repartition(cpus.toInt)
      .select(col("doc_id"), TextAnalysis.htmlToText(page).as("text"))
    def chain(ex: DataFrame): DataFrame =
      Dedup.winnowingPairs(
        TextAnalysis.removeBoilerplateLines(ex, "doc_id", "text", 3L)
          .select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", k = 5, w = 4, minShared = 2L)

    def time(label: String)(mk: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"[shape] $label%-14s min-of-3 $best%7.3f s  (all: ${runs.map(r => f"$r%.3f").mkString(", ")})")
      best
    }
    spark.range(10).count()
    val dup = time("duplicated")(chain(extracted))
    val chk = time("checkpointed")(chain(extracted.localCheckpoint(false)))
    val a = chain(extracted).collect().map(_.toString).sorted.toSeq
    val b = chain(extracted.localCheckpoint(false)).collect().map(_.toString).sorted.toSeq
    require(a == b, "shapes disagree on results")
    println(f"[shape] identical results; checkpointed/duplicated = ${chk / dup}%.2f")
    spark.stop()
  }
}
