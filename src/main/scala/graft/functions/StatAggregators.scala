package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Custom typed aggregators for the statistics the reference computes with
  * sort-based SQL aggregates / Groovy streaming collectors.
  *
  * - Exact median: avg of the middle one-or-two sorted values
  *   (median.sql:1-54 — array_append state + sorted middle).
  * - Tukey hinges: quartiles where each half INCLUDES the middle element
  *   when n is odd (VariableStatistic.groovy:57-103) — this differs from
  *   interpolated percentile(0.25/0.75), so Spark's built-in percentile
  *   cannot express it.
  *
  * Both collect the group's values (the reference does the same — its
  * median state is an array). Intended for bounded groups (per-variable /
  * per-probe stats: group size = #samples or #subjects, never #facts).
  * For unbounded groups use [[graft.operators.Sketches.qsketchBuckets]]
  * (bounded-state, mergeable, oracle-replayable quantiles — prefer it
  * over approx_percentile, whose state is opaque binary and not
  * cross-engine mergeable); at 100 TB the per-group arrays here stay
  * small because the grouping key is the variable, and partial
  * aggregation merges buffers, not rows.
  */
object StatAggregators {

  private def medianOfSorted(xs: Array[Double]): Double = {
    val n = xs.length
    if (n == 0) Double.NaN
    else if (n % 2 == 1) xs(n / 2)
    else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
  }

  /** Exact median with the reference's avg-of-middle-two tie rule. */
  object ExactMedian extends Aggregator[Double, ArrayBuffer[Double], Double] {
    def zero: ArrayBuffer[Double] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = { b += a; b }
    def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = b1 ++= b2
    def finish(b: ArrayBuffer[Double]): Double = medianOfSorted(b.toArray.sorted)
    def bufferEncoder: Encoder[ArrayBuffer[Double]] =
      Encoders.kryo[ArrayBuffer[Double]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  case class Hinges(lower_hinge: Double, median: Double, upper_hinge: Double)

  /** Tukey hinges + median. Lower hinge = median of the lower half where
    * the half includes the overall middle element when n is odd. */
  object TukeyHinges extends Aggregator[Double, ArrayBuffer[Double], Hinges] {
    def zero: ArrayBuffer[Double] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = { b += a; b }
    def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = b1 ++= b2
    def finish(b: ArrayBuffer[Double]): Hinges = {
      val xs = b.toArray.sorted
      val n = xs.length
      if (n == 0) Hinges(Double.NaN, Double.NaN, Double.NaN)
      else {
        val h = (n + 1) / 2 // half size, middle included when odd
        Hinges(
          medianOfSorted(xs.slice(0, h)),
          medianOfSorted(xs),
          medianOfSorted(xs.slice(n - h, n)))
      }
    }
    def bufferEncoder: Encoder[ArrayBuffer[Double]] =
      Encoders.kryo[ArrayBuffer[Double]]
    def outputEncoder: Encoder[Hinges] = Encoders.product[Hinges]
  }

  private lazy val exactMedianUdaf = org.apache.spark.sql.functions.udaf(ExactMedian)
  private lazy val tukeyHingesUdaf = org.apache.spark.sql.functions.udaf(TukeyHinges)

  def exactMedian(c: Column): Column = exactMedianUdaf(c)

  /** Struct column (lower_hinge, median, upper_hinge). */
  def tukeyHinges(c: Column): Column = tukeyHingesUdaf(c)
}
