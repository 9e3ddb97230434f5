package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial hot-key probe for the as-of join (not library surface).
  *
  * The per-key carry-forward window is the one operator shape AQE can
  * never split: one hot key = one unsplittable sorted window partition.
  * This main builds a stream where ONE key holds 90% of the rows (the
  * popular-instrument / null-ish-key shape at web scale), runs
  * [[operators.TimeJoins.asofBackward]] in both forms, and reports:
  *
  *  - exact result equality (row count + order-free checksum) — the
  *    chunked rewrite must be a pure plan change;
  *  - per-task flatness: max task duration under the chunked form must
  *    collapse vs the keyed baseline, because the hot key now spreads
  *    across ts-div-chunkWidth window partitions.
  *
  * Results land in SCALE_PROBE.md alongside the sf1 sweep.
  */
object AsofSkewProbe {

  private final class MaxTask extends SparkListener {
    @volatile var maxMs = 0L
    @volatile var tasks = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null) {
        tasks += 1
        maxMs = math.max(maxMs, t.taskInfo.duration)
      }
    }
    def reset(): Unit = { maxMs = 0L; tasks = 0L }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTask
    spark.sparkContext.addSparkListener(listener)

    val n = sys.env.getOrElse("SPARK_GRAFT_ASOF_ROWS", "5000000").toLong
    // 90% of rows on key 0, the rest uniform over 1000 cold keys; ts
    // uniform over [0, 30 days of nanos), deterministic via xxhash64
    def side(tag: String) = spark.range(n).select(
      when(pmod(xxhash64(col("id"), lit(tag), lit("k")), lit(100)) < 90, 0L)
        .otherwise(pmod(xxhash64(col("id"), lit(tag), lit("k2")), lit(1000)) + 1)
        .as("user_id"),
      pmod(xxhash64(col("id"), lit(tag), lit("t")),
        lit(30L * 86400L * 1000000000L)).as("ts"),
      col("id").as("event_id"))
    val right = side("r").withColumn("value",
      pmod(xxhash64(col("event_id"), lit("v")), lit(1000000L)).cast("double"))
    val left = side("l")

    def run(label: String, chunk: Option[Long]): (Long, Long, Long, Double) = {
      listener.reset()
      val t0 = System.nanoTime()
      val out = operators.TimeJoins.asofBackward(
        left, right, Seq("user_id"), "ts", "ts",
        rightPrefix = "view_", chunkWidth = chunk)
      // order-free checksum over every output column (nulls included)
      val row = out.withColumn("__h", xxhash64(out.columns.map(col): _*))
        .agg(count(lit(1)).as("rows"), expr("bit_xor(__h)").as("xor_hash"))
        .collect().head
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain task-end events
      println(f"[asof-probe] $label%-8s rows=${row.getLong(0)} " +
        f"checksum=${row.getLong(1)} wall=$wall%7.2f s " +
        f"max_task=${listener.maxMs / 1000.0}%7.2f s tasks=${listener.tasks}")
      (row.getLong(0), row.getLong(1), listener.maxMs, wall)
    }

    // warm JIT/shuffle paths once on the cold shape
    run("warmup", Some(86400L * 1000000000L))
    val keyed = run("keyed", None)
    val chunked = run("chunked", Some(86400L * 1000000000L)) // 30 chunks

    assert(keyed._1 == chunked._1 && keyed._2 == chunked._2,
      s"chunked result diverged: $keyed vs $chunked")
    println(f"[asof-probe] max-task ratio keyed/chunked = ${keyed._3.toDouble / math.max(chunked._3, 1)}%5.2f x")
    assert(chunked._3 * 2 <= keyed._3,
      s"chunked max task ${chunked._3} ms not flat vs keyed ${keyed._3} ms")
    spark.stop()
  }
}
