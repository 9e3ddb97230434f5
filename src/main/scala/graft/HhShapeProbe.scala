package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of sketch_heavy_hitters' read shapes — plain one-split
  * read vs the round-robin parallel read (the sample_dsir fix applied to
  * the CM passes). Min-of-3 each, identical results asserted. */
object HhShapeProbe {
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

    def hh(docs: DataFrame): DataFrame =
      graft.operators.Sketches.cmHeavyHitters(
        docs.select(explode(graft.operators.TextAnalysis
          .tokens(lower(col("text")))).as("term")),
        "term", minShare = 0.02)
    def plain = spark.read.parquet(s"$dir/documents.parquet")
    def par = plain.repartition(cpus.toInt)

    def time(label: String)(mk: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shape] $label%-10s min-of-3 ${runs.min}%7.3f s  (all: ${runs.map(r => f"$r%.3f").mkString(", ")})")
      runs.min
    }
    spark.range(10).count()
    val a = time("plain")(hh(plain))
    val b = time("parallel")(hh(par))
    val ra = hh(plain).collect().map(_.toString).sorted.toSeq
    val rb = hh(par).collect().map(_.toString).sorted.toSeq
    require(ra == rb, "shapes disagree on results")
    println(f"[shape] identical results; parallel/plain = ${b / a}%.2f")

    // the same A/B for the CM token sketch (the other 1-task profile hit)
    import spark.implicits._
    def cm(docs: DataFrame): DataFrame = {
      val toks = docs.select(explode(graft.operators.TextAnalysis
        .tokens(lower(col("text")))).as("term"))
      graft.operators.Sketches.cmEstimate(
        graft.operators.Sketches.cmSketch(toks, "term"),
        Seq("the", "a", "of", "and", "to", "in", "is", "it",
          "zzz-unseen").toDF("term"), "term")
    }
    val c = time("cm-plain")(cm(plain))
    val d = time("cm-parallel")(cm(par))
    require(cm(plain).collect().map(_.toString).sorted.toSeq ==
      cm(par).collect().map(_.toString).sorted.toSeq, "cm shapes disagree")
    println(f"[shape] cm identical; parallel/plain = ${d / c}%.2f")
    spark.stop()
  }
}
