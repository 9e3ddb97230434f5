package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * IMAGES decode for real: the JDK ships ImageIO codecs (PNG, JPEG, BMP,
  * GIF, WBMP), so [[ImageIoDecoder]] performs actual decode, RGB-histogram
  * feature extraction and aspect-preserving resize with no external
  * libraries. AUDIO decodes for real too: javax.sound.sampled parses
  * WAV/AIFF/AU and converts the PCM family (signed/unsigned 8/16-bit,
  * U-law, A-law) — [[JavaSoundDecoder]] extracts an RMS energy envelope
  * from the actual samples. VIDEO decodes for real where a pure JVM can:
  * [[MjpegAviDecoder]] walks the RIFF/AVI chunk tree directly and decodes
  * MJPEG frames (complete JPEGs) through ImageIO. Only inter-frame video
  * codecs (H.264/VP9/...) and compressed audio (MP3/AAC/...), whose
  * codecs are not in the JDK, go through the clearly-marked stub
  * (`FakeDecoder`) — the declared permanent boundary (SURVEY §8);
  * [[routingDecoder]] dispatches per modality.
  * Everything around the decoders is real and tested: the schema, the
  * batch iteration shape (mapPartitions over a typed Dataset — the Scala
  * twin of mapInPandas: one JVM-side batch per partition), the
  * repartitioning contract (media blobs are large -> partition by byte
  * budget, not row count), and the downstream feature columns.
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

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF/WBMP —
    * codecs bundled with the JVM, no external deps). Feature = 48-dim
    * L1-normalized RGB histogram (16 bins per channel); unreadable or
    * empty payloads come back ok=false rather than throwing, so one bad
    * blob cannot kill a 100 TB scan. */
  object ImageIoDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = Option(row.payload).getOrElse(Array.emptyByteArray)
      val img =
        if (bytes.isEmpty) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
      if (img == null)
        MediaFeatures(row.media_id, row.modality, new Array[Float](48), 0, ok = false)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val hist = new Array[Float](48)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          hist(((p >> 16) & 0xFF) >> 4) += 1f
          hist(16 + (((p >> 8) & 0xFF) >> 4)) += 1f
          hist(32 + ((p & 0xFF) >> 4)) += 1f
          i += 1
        }
        val n = math.max(px.length, 1).toFloat
        MediaFeatures(row.media_id, row.modality, hist.map(_ / n),
          n_frames = 1, ok = true)
      }
    }

    /** Aspect-preserving shortest-side resize, re-encoded as PNG (the
      * batch-side realization of [[resizePlan]]'s geometry). Returns None
      * for unreadable payloads. */
    def resize(payload: Array[Byte], shortestSide: Int): Option[Array[Byte]] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val scale =
          if (img.getWidth <= img.getHeight) shortestSide.toDouble / img.getWidth
          else shortestSide.toDouble / img.getHeight
        val tw = math.max(1, math.round(img.getWidth * scale).toInt)
        val th = math.max(1, math.round(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    }
  }

  /** REAL audio decode via the JDK's javax.sound.sampled — WAV/AIFF/AU
    * containers with the PCM encoding family (signed/unsigned 8/16-bit,
    * U-law, A-law; non-16-bit-signed input is converted by the JDK's own
    * codec chain). Feature = 16-bucket RMS energy envelope over the clip
    * (each bucket is the RMS of its time slice, normalized to full scale,
    * channels averaged); n_frames = PCM frame count. Compressed formats
    * (MP3/OGG/AAC) have no JDK codec: they, and any unreadable payload,
    * come back ok=false rather than throwing — one bad blob cannot kill a
    * 100 TB scan. */
  object JavaSoundDecoder extends Decoder {
    private val Buckets = 16

    def decode(row: MediaRow): MediaFeatures = {
      val bytes = Option(row.payload).getOrElse(Array.emptyByteArray)
      val samples = try decodeSamples(bytes) catch { case _: Exception => null }
      if (samples == null || samples.isEmpty)
        MediaFeatures(row.media_id, row.modality, new Array[Float](Buckets), 0,
          ok = false)
      else {
        val n = samples.length
        val hist = new Array[Float](Buckets)
        var b = 0
        while (b < Buckets) {
          val from = (n.toLong * b / Buckets).toInt
          val until = math.max((n.toLong * (b + 1) / Buckets).toInt, from + 1)
          var acc = 0.0
          var i = from
          while (i < until) { val s = samples(i); acc += s * s; i += 1 }
          hist(b) = (math.sqrt(acc / (until - from)) / 32768.0).toFloat
          b += 1
        }
        MediaFeatures(row.media_id, row.modality, hist, n_frames = n, ok = true)
      }
    }

    /** Channel-averaged 16-bit samples, one per PCM frame; null when the
      * container/encoding is not JDK-decodable. */
    private def decodeSamples(bytes: Array[Byte]): Array[Double] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      if (bytes.isEmpty) return null
      val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val src = raw.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        src.getChannels * 2, src.getSampleRate, false) // little-endian
      val in =
        if (src.matches(target)) raw
        else AudioSystem.getAudioInputStream(target, raw)
      val data = in.readAllBytes()
      val ch = target.getChannels
      val frames = data.length / (2 * ch)
      val out = new Array[Double](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = (f * ch + c) * 2
          acc += ((data(off) & 0xFF) | (data(off + 1) << 8)).toShort
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      out
    }
  }

  /** REAL video decode for the one container+codec pair the JDK can carry
    * end-to-end: AVI (a RIFF chunk tree, parsed here directly) holding
    * MJPEG — every frame is a complete JPEG, which ImageIO decodes. This
    * covers the archival/scientific MJPEG corpora a JVM-only deployment
    * can actually read; inter-frame codecs (H.264/VP9...) have no JDK
    * codec and remain [[FakeDecoder]]-routed by [[routingDecoder]] — the
    * declared permanent boundary (SURVEY §8). Feature = RGB histogram of
    * the FIRST decodable frame; n_frames counts all decodable frames. */
  object MjpegAviDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      val frames = decodedFrames(row.payload)
      if (frames.isEmpty)
        MediaFeatures(row.media_id, row.modality, new Array[Float](48), 0, ok = false)
      else {
        val first = ImageIoDecoder.decode(
          row.copy(modality = "image", payload = frames.head))
        MediaFeatures(row.media_id, row.modality, first.feature,
          n_frames = frames.length, ok = first.ok)
      }
    }

    /** Raw JPEG payloads of the video-stream chunks (`##dc`/`##db`) in a
      * RIFF/AVI byte stream, in container order. Walks LIST/RIFF nodes
      * recursively (the `movi` list may nest `rec ` groups); malformed
      * input yields the frames parsed so far — never throws, one bad blob
      * cannot kill a scan. */
    def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def u32(off: Int): Long =
        (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
          ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def walk(from: Int, until: Int, depth: Int): Unit = {
        var off = from
        var done = false
        while (!done && off + 8 <= until) {
          val id = fourcc(off)
          // chunk size stays a Long: a lying 32-bit length >= 2^31 must not
          // wrap negative, or the word-aligned advance below could stall on
          // the same offset forever (a hung task, not an exception)
          val size = u32(off + 4)
          val body = off + 8
          val end = math.min(body.toLong + size, until.toLong).toInt
          if (id == "RIFF" || id == "LIST") {
            // real AVIs nest ~3 deep (RIFF/hdrl/movi/rec ); the cap turns a
            // crafted million-level LIST tree into "no frames", not a
            // StackOverflowError the Exception handler below can't catch
            if (body + 4 <= end && depth < 64) walk(body + 4, end, depth + 1)
          } else if (id.endsWith("dc") || id.endsWith("db")) {
            if (size > 0 && end > body) out += bytes.slice(body, end)
          }
          val next = body.toLong + size + (size & 1L) // chunks are word-aligned
          if (next > off && next <= Int.MaxValue) off = next.toInt
          else done = true // malformed length that fails to advance → stop the walk
        }
      }
      try walk(0, bytes.length, 0) catch { case _: Exception => () }
      out.toSeq
    }

    private def decodedFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
      val bytes = Option(payload).getOrElse(Array.emptyByteArray)
      if (bytes.isEmpty) Seq.empty
      else aviMjpegFrames(bytes).filter { f =>
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)) != null
        catch { case _: Exception => false }
      }
    }
  }

  /** Dispatch per modality: images, PCM audio and MJPEG/AVI video decode
    * for real; inter-frame video codecs and compressed audio (no codec in
    * the JDK) fall back to the stub. */
  def routingDecoder(videoFallback: Decoder = FakeDecoder): Decoder = new Decoder {
    def decode(row: MediaRow): MediaFeatures =
      if (row.modality == "image") ImageIoDecoder.decode(row)
      else if (row.modality == "audio") {
        val real = JavaSoundDecoder.decode(row)
        // compressed audio the JDK can't parse still gets the stub's
        // deterministic byte features instead of an empty row
        if (real.ok) real else videoFallback.decode(row).copy(ok = false)
      } else if (row.modality == "video") {
        val real = MjpegAviDecoder.decode(row)
        if (real.ok) real else videoFallback.decode(row).copy(ok = false)
      } else videoFallback.decode(row)
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

  /** Perceptual average-hash (aHash) of a decoded image: the image is
    * box-averaged onto a deterministic 8x8 grayscale grid (explicit pixel
    * sums — no platform scaler, so the hash is bit-stable across JVMs),
    * each cell votes 1 when brighter than the grid mean, and the 64 bits
    * render as 16 hex chars — the same 64-bit-hex currency as the text
    * SimHash, so [[Dedup.hammingPairs64]] pairs images with the identical
    * banded plan. Returns null for unreadable payloads. */
  def aHash64(payload: Array[Byte]): String = {
    val img =
      if (payload == null || payload.isEmpty) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
    if (img == null) null
    else {
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val gy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val gx = math.min(7, x * 8 / w)
          val p = px(y * w + x)
          val gray = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
          val cell = gy * 8 + gx
          sums(cell) += gray
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val cells = Array.tabulate(64)(i =>
        if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
      val mean = cells.sum / 64.0
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (cells(i) > mean) bits |= (1L << (63 - i))
        i += 1
      }
      f"$bits%016x"
    }
  }

  /** Deterministic synthetic image payload: a 32x32 PNG of 8x8
    * bright/dark blocks drawn from md5(`group`)'s 64 bits, plus a uniform
    * `brightness` offset. The offset shifts every cell AND the grid mean
    * equally, so [[aHash64]] is bit-identical for every brightness
    * variant of a group (hamming 0), while two groups' hashes differ in
    * ~32 bits — which makes the whole decode→aHash→banded-pair pipeline
    * oracle-checkable: the expected pairs are a pure function of the
    * group key. PNG encoding is lossless; the decoder sees exact pixels. */
  def syntheticPatternPng(group: Long, brightness: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(group.toString.getBytes("UTF-8"))
    val bits = java.nio.ByteBuffer.wrap(md, 0, 8).getLong
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val cell = (y / 4) * 8 + (x / 4)
        val base = if (((bits >>> (63 - cell)) & 1L) == 1L) 200 else 40
        val v = math.min(255, math.max(0, base + brightness))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic synthetic MJPEG-AVI payload: `nFrames` copies of the
    * md5(`group`)-patterned frame (the [[syntheticPatternPng]] pattern,
    * JPEG-encoded) inside a minimal RIFF tree (hdrl/avih + movi/00dc).
    * Every frame of a group is byte-identical, so the first-frame aHash is
    * bit-equal across the group's videos regardless of frame count — the
    * decode→hash→banded-pair pipeline stays oracle-checkable as a pure
    * function of the group key, while the parser and JPEG decode are real. */
  def syntheticMjpegAvi(group: Long, nFrames: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(group.toString.getBytes("UTF-8"))
    val bits = java.nio.ByteBuffer.wrap(md, 0, 8).getLong
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val cell = (y / 4) * 8 + (x / 4)
        val v = if (((bits >>> (63 - cell)) & 1L) == 1L) 200 else 40
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", jb)
    val jpeg = jb.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      ascii(id) ++ u32(body.length.toLong) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      ascii("LIST") ++ u32(body.length + 4L) ++ ascii(listType) ++ body
    // minimal honest main header: µs/frame, flags zeroed, frame count,
    // 32x32 — enough for a structural reader; our parser keys on movi
    val avih = chunk("avih", u32(33333L) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
      u32(nFrames.toLong) ++ u32(0L) ++ u32(1L) ++ u32(0L) ++
      u32(32L) ++ u32(32L) ++ Array.fill(16)(0.toByte))
    val movi = list("movi",
      Array.fill(nFrames)(chunk("00dc", jpeg)).flatten)
    val body = ascii("AVI ") ++ list("hdrl", avih) ++ movi
    out.write(ascii("RIFF"))
    out.write(u32(body.length.toLong))
    out.write(body)
    out.toByteArray
  }

  /** (media_id, ahash-of-first-frame, n_frames) over the video rows via
    * the REAL RIFF walk + JPEG decode; videos with no decodable frame
    * yield a null hash (dropped by the pairing step). One linear pass. */
  def videoFrameHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video")
      .map { r =>
        val frames = MjpegAviDecoder.aviMjpegFrames(
          Option(r.payload).getOrElse(Array.emptyByteArray))
        (r.media_id,
          frames.headOption.map(aHash64).orNull,
          frames.length.toLong)
      }
      .toDF("media_id", "ahash", "n_frames")
  }

  /** Video near-dup pairs at hamming <= `maxHamming` over the first-frame
    * perceptual hash, carrying each side's decoded frame count — the video
    * twin of [[imageNearDupPairs]] on the same banded candidate plan. */
  def videoNearDupPairs(media: Dataset[MediaRow],
                        maxHamming: Int = 3): DataFrame = {
    // LAZY localCheckpoint: the hash frame is consumed three times (band
    // explode + both frame-count joins) and each reference would re-run
    // the full video decode pass behind it; the checkpointed rows are
    // (id, hash, count) — tiny at any corpus scale — and the blocks
    // auto-release with the frame (the Ids pattern)
    val hashes = videoFrameHashes(media).localCheckpoint(false)
    val frames = hashes.select(col("media_id"), col("n_frames"))
    // no broadcast hint on the per-video frame counts: bounded here, but
    // corpus-sized in general — AQE broadcasts at runtime when the
    // checkpointed hash frame is actually small
    Dedup.hammingPairs64(hashes.select(col("media_id"), col("ahash")),
        "media_id", "ahash", maxHamming)
      .join(frames.withColumnRenamed("media_id", "doc_a")
        .withColumnRenamed("n_frames", "frames_a"), "doc_a")
      .join(frames.withColumnRenamed("media_id", "doc_b")
        .withColumnRenamed("n_frames", "frames_b"), "doc_b")
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"), col("frames_a"), col("frames_b"))
  }

  /** (media_id, ahash) over the image rows; undecodable payloads yield a
    * null hash (dropped by the pairing step). One linear decode pass. */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image")
      .map(r => (r.media_id, aHash64(r.payload)))
      .toDF("media_id", "ahash")
  }

  /** Image near-dup pairs at hamming <= `maxHamming` over the perceptual
    * hash — the image-side twin of text SimHash pairing, sharing the
    * banded candidate plan (no all-pairs of images anywhere). */
  def imageNearDupPairs(media: Dataset[MediaRow],
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(imageHashes(media), "media_id", "ahash", maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Amplitude-invariant 64-bit audio fingerprint from the 16-bucket RMS
    * envelope ([[JavaSoundDecoder]]'s feature): each bucket normalizes by
    * the PEAK bucket and quantizes to a nibble (round(norm * 15)), 16
    * nibbles packing to the same 16-hex-char currency as [[aHash64]] /
    * text SimHash, so [[Dedup.hammingPairs64]] pairs audio on the
    * identical banded plan. Normalizing by the peak makes the
    * fingerprint invariant to uniform gain (a re-levelled copy of a
    * clip fingerprints identically — the audio analogue of aHash's
    * brightness invariance) and to waveform inversion (RMS is sign-
    * blind). Silence (peak 0) and empty envelopes return null — no
    * shape to fingerprint — and are dropped by the pairing step. */
  def audioHash64(envelope: Array[Float]): String = {
    if (envelope == null || envelope.length != 16) return null
    var peak = 0.0f
    var i = 0
    while (i < 16) { if (envelope(i) > peak) peak = envelope(i); i += 1 }
    if (!(peak > 0.0f)) return null
    var bits = 0L
    i = 0
    while (i < 16) {
      val nib = math.round(envelope(i) / peak * 15.0f).toLong
      bits |= nib << (60 - 4 * i)
      i += 1
    }
    f"$bits%016x"
  }

  /** (media_id, ahash) over the audio rows via the REAL javax.sound
    * decode; undecodable or silent payloads yield a null hash (dropped by
    * the pairing step). One linear decode pass. */
  def audioHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "audio")
      .map { r =>
        val f = JavaSoundDecoder.decode(r)
        (r.media_id, if (f.ok) audioHash64(f.feature) else null)
      }
      .toDF("media_id", "ahash")
  }

  /** Audio near-dup pairs at hamming <= `maxHamming` over the
    * gain-invariant envelope fingerprint — completes the multimodal
    * dedup family beside [[imageNearDupPairs]] / [[videoNearDupPairs]]
    * on the same banded candidate plan (no all-pairs of clips). */
  def audioNearDupPairs(media: Dataset[MediaRow],
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(audioHashes(media), "media_id", "ahash", maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Deterministic synthetic WAV payload (PCM mono 16-bit 8 kHz, 1600
    * samples = 200 ms): 16 envelope buckets of 100 samples each, bucket b
    * a ±(a_b * amplitudeStep * 1000) square wave with a_b in 1..8 drawn
    * from md5(`group`)'s byte b. A square wave's RMS is its amplitude
    * EXACTLY in IEEE arithmetic (integer squares < 2^53 sum and divide
    * exactly; sqrt of a perfect square is exact; /32768 is a power-of-two
    * scale), so the peak-normalized ratio a_b/a_max — and therefore
    * [[audioHash64]] — is bit-identical across the four amplitude
    * variants (hamming 0), while two groups' md5-drawn envelopes differ
    * in many nibbles. That makes the whole decode→fingerprint→banded-pair
    * pipeline oracle-checkable: the expected pairs are a pure function of
    * the group key, exactly like [[syntheticPatternPng]]. Max sample
    * 8*4*1000 = 32000 < 32767 — no clipping at any step. */
  def syntheticWavPcm(group: Long, amplitudeStep: Int): Array[Byte] = {
    require(amplitudeStep >= 1 && amplitudeStep <= 4,
      s"amplitudeStep in [1,4], got $amplitudeStep")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(group.toString.getBytes("UTF-8"))
    val n = 1600
    val data = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < 16) {
      val a = 1 + ((md(b) & 0x7F) % 8)
      val s = (a * amplitudeStep * 1000).toShort
      var i = 0
      while (i < 100) {
        data.putShort(if (i % 2 == 0) s else (-s).toShort)
        i += 1
      }
      b += 1
    }
    val body = data.array()
    val out = java.nio.ByteBuffer.allocate(44 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(8000).putInt(16000)       // sample rate, byte rate
      .putShort(2).putShort(16)         // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(body.length)
      .put(body)
    out.array()
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
