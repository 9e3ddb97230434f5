package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierFitSpec extends SparkSpec {
  import spark.implicits._

  test("trainHashedLinear: hand-computed two-iteration fit, d = 1") {
    // d=1 -> every token hits bucket 0; docs: ("a a", y=1), ("b", y=0)
    // iter1: w=0 -> r1=1, r2=0; g = 2*(1/2)*1 + 0 = 1      -> w = 0.1
    // iter2: r1 = 1-0.1 = 0.9, r2 = -0.1; g = 0.9 - 0.1 = 0.8 -> w = 0.18
    val df = Seq(("a a", 1), ("b", 0)).toDF("text", "y")
    val w = TextAnalysis.trainHashedLinear(df, "text", "y",
      d = 1, lr = 0.1, iters = 2)
    assert(w.toSeq == Seq(0.18))
  }

  test("empty documents contribute residual-free; weights stay finite") {
    val df = Seq(("spark rows", 1), ("", 0), ("   ", 1)).toDF("text", "y")
    val w = TextAnalysis.trainHashedLinear(df, "text", "y",
      d = 8, lr = 0.01, iters = 3)
    assert(w.length == 8)
    assert(w.forall(x => !x.isNaN && !x.isInfinite))
    // only the non-empty doc's buckets move
    assert(w.count(_ != 0.0) <= 2)
  }

  test("fit is invariant to input partitioning (order-free gradient sum)") {
    // the r15 micro-unit gradient: each addend round(r*1e6/n) is an exact
    // integer, so the per-bucket sum cannot depend on partition/merge
    // order — 1-partition and 13-partition fits must be bit-identical
    val docs = (0 until 300).map { i =>
      (s"tok${i % 7} tok${i % 31} tok${i % 13} filler$i", i % 2)
    }.toDF("text", "y")
    val w1 = TextAnalysis.trainHashedLinear(docs.coalesce(1), "text", "y",
      d = 64, lr = 2e-3, iters = 3)
    val w13 = TextAnalysis.trainHashedLinear(docs.repartition(13), "text", "y",
      d = 64, lr = 2e-3, iters = 3)
    assert(w1.toSeq == w13.toSeq)
  }

  test("squared loss decreases over iterations on a separable corpus") {
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0) (s"alpha beta gamma token$i", 1)
      else (s"delta epsilon zeta token$i", 0)
    }.toDF("text", "y")
    def loss(iters: Int): Double = {
      val w = TextAnalysis.trainHashedLinear(docs, "text", "y",
        d = 32, lr = 0.05, iters = iters)
      // the trainer scores bucket FRACTIONS (mean, not sum): recompute
      // the mean score directly for the loss
      docs.select(col("y").cast("double").as("y"),
          TextAnalysis.tokens(col("text")).as("t"))
        .withColumn("s", when(size(col("t")) === 0, 0.0).otherwise(
          aggregate(col("t"), lit(0.0), (acc, tk) => acc +
            element_at(array(w.map(lit): _*),
              (conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % 32 + 1)
                .cast("int"))) / size(col("t"))))
        .select(sum(pow(col("y") - col("s"), 2)).as("l"))
        .collect()(0).getDouble(0)
    }
    val l1 = loss(1); val l3 = loss(3); val l6 = loss(6)
    assert(l3 < l1 && l6 < l3, s"loss must decrease: $l1, $l3, $l6")
  }
}
