package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Explicit runtime join-pruning: build a Bloom filter over the SMALL
  * side of an equi-join driver-side, broadcast it in the task closure,
  * and filter the BIG side's scan before its exchange.
  *
  * This is the shape Spark's own runtime bloom-filter join optimization
  * produces, made explicit because the optimizer cannot see through a
  * persisted-artifact boundary: the incremental-dedup ledger's history
  * tables are parquet written in previous cycles, and the per-cycle
  * screen joins them against a batch that is orders of magnitude
  * smaller. Without the prescreen the FULL history shuffles every cycle
  * (at years of daily 100 TB cycles the history exchange dominates the
  * screen); with it the exchange carries only true matches plus the
  * designed false-positive rate. Correctness is untouched — a Bloom has
  * no false negatives, so every row that could join survives the
  * prescreen, and extra survivors are removed by the exact join.
  *
  * Sizing: `expectedItems` at or above the small side's cardinality
  * keeps `fpp` honest (1M items at fpp 0.001 is a ~1.8 MB filter —
  * task-closure sized). Undersizing only degrades the filter toward
  * pass-through; it can never drop a match. */
object RuntimeFilter {

  /** Build a driver-held Bloom over `df.colName` (one aggregate pass of
    * the SMALL side — the batch, never the history). Nulls are skipped,
    * matching join semantics (a null key never equi-joins). An EMPTY or
    * all-null input returns an empty filter (contains nothing) — the
    * aggregate's null buffer would otherwise crash the read-back, and
    * "every batch doc was an exact dup" is a ROUTINE screen state, not
    * an error (it is exactly what a re-delivered batch looks like). */
  def bloomOf(df: DataFrame, colName: String,
              expectedItems: Long = 1L << 20,
              fpp: Double = 0.001): BloomFilter = {
    val rows = df.filter(df(colName).isNotNull)
    if (rows.isEmpty) BloomFilter.create(math.max(1L, expectedItems), fpp)
    else rows.stat.bloomFilter(colName, expectedItems, fpp)
  }

  /** Predicate column: might `c` (string) be in the filter? Codegen'd
    * single call into the closure-shipped filter, like
    * [[BpeSegmentExpr]] — no UDF, stays inside WholeStageCodegen. */
  def mightContain(bf: BloomFilter, c: Column): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(c), bf))
}

/** might_contain(string) over a closure-shipped
  * [[org.apache.spark.util.sketch.BloomFilter]]. Bytes-of-UTF8 probes
  * match the builder's string handling (putString == putBinary of the
  * UTF-8 bytes), spec-pinned by the no-false-negative test. */
case class BloomMightContainExpr(child: Expression, bf: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(t: Any): Any =
    bf.mightContainBinary(t.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
