package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Step-audit log — the functional stand-in for cz_job_audit /
  * cz_job_error (AUDIT_FUNCTIONS.sql:5-241, polled by
  * AuditableJobRunner.groovy:33-78). Each pipeline stage appends
  * (job_id, step, description, rowcount, status, elapsed); the log
  * becomes a DataFrame for persistence next to the outputs.
  *
  * Row counts are taken lazily ONLY when requested — counting every
  * intermediate would double-execute the plan; pass `countRows = false`
  * (default) to log plan-only steps, the way Spark's own metrics would
  * report them post-hoc.
  */
object Audit {
  final case class Step(jobId: String, step: Int, description: String,
                        rowCount: Long, status: String, elapsedSecs: Double)
}

final class Audit(jobId: String) {
  import Audit.Step

  private val steps = ArrayBuffer.empty[Step]
  private var n = 0

  def logStep[T](description: String, countRows: Boolean = false)
                (body: => T): T = {
    val t0 = System.nanoTime()
    try {
      val out = body
      val rows = out match {
        case df: DataFrame if countRows => df.count()
        case _ => -1L
      }
      n += 1
      steps += Step(jobId, n, description, rows, "Done", (System.nanoTime() - t0) / 1e9)
      out
    } catch {
      case e: Throwable =>
        n += 1
        steps += Step(jobId, n, s"$description: ${e.getMessage}", -1L, "FAIL",
          (System.nanoTime() - t0) / 1e9)
        throw e
    }
  }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    steps.toSeq.toDF()
  }

  def entries: Seq[Step] = steps.toSeq
}
