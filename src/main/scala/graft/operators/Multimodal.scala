package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * The real media codecs are NOT in this container — the decode step is a
  * clearly-marked stub (`FakeDecoder`) producing deterministic features
  * from the bytes. Everything around it is real and tested: the schema,
  * the batch iteration shape (mapPartitions over a typed Dataset — the
  * Scala twin of mapInPandas: one JVM-side batch per partition, vectorized
  * by Tungsten under the hood), the repartitioning contract (media blobs
  * are large -> partition by byte budget, not row count), and the
  * downstream feature columns.
  */
object Multimodal {

  /** The canonical multimodal row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      mime: String,
      width: Int, height: Int, duration_ms: Long,
      payload: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  final case class MediaFeatures(
      media_id: Long, modality: String,
      feature: Array[Float], n_frames: Int, ok: Boolean)

  /** Decoder contract — the pluggable step that would call the real codec
    * (PIL/libav/...) in production. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB: deterministic fake decode. Features are a 16-dim byte histogram
    * (stable across runs/engines); frame count derives from duration.
    * Replace with a real codec-backed Decoder outside this container. */
  object FakeDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      val hist = new Array[Float](16)
      val bytes = Option(row.payload).getOrElse(Array.emptyByteArray)
      bytes.foreach(b => hist((b & 0xFF) >> 4) += 1f)
      val n = math.max(bytes.length, 1).toFloat
      MediaFeatures(row.media_id, row.modality, hist.map(_ / n),
        n_frames = math.max(1, (row.duration_ms / 1000L).toInt),
        ok = bytes.nonEmpty)
    }
  }

  /** Batch feature extraction: one decoder instance per partition (the
    * mapInPandas batch shape — amortizes codec init across the batch). */
  def extractFeatures(media: Dataset[MediaRow],
                      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup happens here in a real codec
      rows.map(decoder.decode)
    }
  }

  /** Media-aware repartitioning: blobs are MBs, rows are not the right
    * unit — size partitions by a byte budget so executor memory holds a
    * bounded number of frames in flight. */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val stats = media.agg(
      sum(coalesce(length(col("payload")), lit(0))).as("total")).collect()(0)
    val total = Option(stats.getAs[java.lang.Long]("total")).map(_.toLong).getOrElse(0L)
    val parts = math.max(1, (total / math.max(targetBytesPerPartition, 1L)).toInt)
    media.repartition(parts)
  }

  /** Frame sampling plan for video rows: deterministic frame indices at
    * `fps` over the clip duration (the sampling schedule is computed in
    * the plan; actual frame extraction happens in the Decoder). */
  def frameSampleSchedule(media: DataFrame, fps: Double): DataFrame =
    media
      .filter(col("modality") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(((col("duration_ms") / 1000.0) * fps).cast("int") - 1, lit(0)))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") / fps * 1000.0).cast("long").as("frame_ts_ms"))

  /** Image resize request plumbing: records the target geometry per row;
    * the Decoder honors it batch-side. Aspect-preserving shortest-side. */
  def resizePlan(media: DataFrame, shortestSide: Int): DataFrame =
    media.filter(col("modality") === "image")
      .withColumn("scale",
        when(col("width") <= col("height"),
          lit(shortestSide) / col("width").cast("double"))
          .otherwise(lit(shortestSide) / col("height").cast("double")))
      .withColumn("target_width", round(col("width") * col("scale"), 0).cast("int"))
      .withColumn("target_height", round(col("height") * col("scale"), 0).cast("int"))
      .drop("payload", "scale")
}
