package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: images/audio/video travel as opaque
  * `binary` columns plus typed metadata, exactly as a 100 TB training
  * -data pipeline stores them (the bytes never deserialize into JVM
  * objects until a kernel touches them).
  *
  * The Spark-side plumbing here is real — schema, partition sizing,
  * batched per-partition iteration, deterministic outputs. IMAGE
  * dimension/format decode is also real ([[ImageCodec]], JDK
  * `javax.imageio` — header-only reads). What remains stubbed behind
  * [[StubCodec]] is the model forward pass for feature extraction and
  * the audio/video codecs (no AV libraries in this environment);
  * swapping in a real decoder changes one function, not the pipeline
  * shape.
  */
object Multimodal {

  /** Canonical media-table schema: id, source uri, modality tag, raw
    * bytes, sidecar metadata. */
  val mediaSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, uri STRING, media_type STRING, content BINARY, " +
        "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: BIGINT>")

  /** Exact binary dedup key: content hash, computed codegen-side. */
  def contentHash(content: Column): Column = sha2(content, 256)

  def exactDupGroups(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(contentHash(content).as("content_sha"))
      .agg(count(lit(1)).as("n_dups"), min(id).as("keep_id"))

  /** Byte size without deserializing. */
  def byteSize(content: Column): Column = length(content)

  /** STUB codec: deterministic pseudo-decode derived from the bytes.
    * A real implementation calls the image/audio library here — the
    * signature (bytes in, fixed-shape features out) is the contract
    * the rest of the pipeline compiles against. */
  object StubCodec {
    /** Pretend-decode image dimensions from content bytes. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      (256 + math.abs(h % 1024), 256 + math.abs((h >> 10) % 1024))
    }
    /** Pretend feature vector (`dim` floats in [-0.5, 0.5]) — a
      * deterministic hash-seeded embedding standing in for a model
      * forward pass. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes))
      Array.fill(dim)(rnd.nextFloat() - 0.5f)
    }
  }

  /** REAL image codec over JDK `javax.imageio` — no added dependency.
    * Dimension decode is HEADER-ONLY: the matching `ImageReader`
    * parses width/height from the container header without rasterizing
    * pixels, so a 50 MB JPEG costs a stream open + a few KB of reads,
    * not a full decode — the property that makes a metadata pass over
    * 100 TB of media affordable. Bytes no installed reader recognizes
    * (or truncated headers) return None rather than throwing: corrupt
    * media is data, not an exception, in a corpus-scale pipeline. */
  object ImageCodec {
    /** (format, width, height) from the header; None if undecodable.
      * Formats are lowercase ImageIO names ("png", "jpeg", "gif", …). */
    def decodeDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
        // the factory's default disk cache writes each image to a temp
        // file (one create/delete per row — not a header-only pass) and
        // turns a full or read-only tmpdir into silent None-decodes of
        // valid images. The bytes are already in memory; cache there.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** (format, width, height, frameCount) in ONE reader session —
      * the multi-frame/video-ish variant of [[decodeDims]] for
      * animated containers (GIF is what the JDK readers support).
      * Counting frames walks the container's block structure (the
      * reader needs a seekable, non-forward-only input) but still
      * never rasterizes pixels, so a frame-count pass over an
      * animation corpus stays metadata-priced. Single-frame formats
      * report 1. None for unrecognized/truncated bytes, as ever. */
    def decodeFrames(bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              // seekForwardOnly = false: getNumImages(true) must scan
              // the whole block sequence and rewind.
              r.setInput(iis, false, true)
              val n = r.getNumImages(true)
              if (n <= 0) None
              else Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                r.getWidth(0), r.getHeight(0), n))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic multi-frame GIF fixture written by the real
      * ImageIO sequence writer — the encode side of
      * [[decodeFrames]] round-trips. Each frame is a flat color
      * varying by index so bytes are reproducible. */
    def encodeAnimated(width: Int, height: Int, frames: Int): Array[Byte] = {
      require(width > 0 && height > 0 && frames > 0,
        s"bad animation fixture params: ${width}x$height x$frames")
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var i = 0
        while (i < frames) {
          val img = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          g.setColor(new java.awt.Color((i * 40) % 256, 64, 128))
          g.fillRect(0, 0, width, height)
          g.dispose()
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          i += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** Deterministic single-color test image, encoded with the real
      * ImageIO writer — the fixture generator for decode round-trips
      * (`format`: "png", "jpeg", "gif", "bmp"). */
    def encode(width: Int, height: Int, rgb: Int, format: String): Array[Byte] = {
      require(width > 0 && height > 0, s"need positive dims, got ${width}x$height")
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, format, out),
        s"no ImageIO writer for format '$format'")
      out.toByteArray
    }
  }

  case class FrameMeta(media_id: Long, format: Option[String],
                       width: Option[Int], height: Option[Int],
                       n_frames: Option[Int], n_bytes: Long)

  /** Per-partition batched multi-frame decode via
    * [[ImageCodec.decodeFrames]] — the video-ish metadata pass:
    * format, dims, and REAL frame count per media row, nulls for
    * undecodable content. Feed the result into a `sequence`-explode
    * to plan frame sampling (every k-th frame) as pure column math —
    * the downstream per-frame decode is then a bounded, pre-sized
    * work list instead of a blind scan. Input needs
    * (media_id BIGINT, content BINARY). */
  def decodeFrameMeta(df: DataFrame): Dataset[FrameMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = if (bytes == null) 0L else bytes.length.toLong
        ImageCodec.decodeFrames(bytes) match {
          case Some((fmt, w, h, fc)) =>
            FrameMeta(id, Some(fmt), Some(w), Some(h), Some(fc), n)
          case None => FrameMeta(id, None, None, None, None, n)
        }
      })
  }

  case class DecodedMeta(media_id: Long, width: Int, height: Int, n_bytes: Long)
  case class ImageMeta(media_id: Long, format: Option[String],
                       width: Option[Int], height: Option[Int], n_bytes: Long)
  case class MediaFeatures(media_id: Long, embedding: Array[Float])

  /** Per-partition batched decode (the mapInPandas analog in Scala:
    * one iterator pass per partition, no per-row task overhead, bytes
    * stay off-heap until touched). Input needs (media_id BIGINT,
    * content BINARY). */
  def decodeMeta(df: DataFrame): Dataset[DecodedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h) = StubCodec.decodeDims(bytes)
        DecodedMeta(id, w, h, bytes.length.toLong)
      })
  }

  /** Per-partition batched REAL image decode: header-only
    * format/dimension extraction via [[ImageCodec]]; undecodable
    * content yields null format/dims (never a task failure). Input
    * needs (media_id BIGINT, content BINARY). Pair with
    * [[repartitionForDecode]] upstream so each task holds a bounded
    * byte volume. */
  def decodeImageMeta(df: DataFrame): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = if (bytes == null) 0L else bytes.length.toLong
        ImageCodec.decodeDims(bytes) match {
          case Some((fmt, w, h)) => ImageMeta(id, Some(fmt), Some(w), Some(h), n)
          case None => ImageMeta(id, None, None, None, n)
        }
      })
  }

  /** Per-partition batched feature extraction → embedding column that
    * feeds directly into [[Similarity]] / [[Dedup]] operators. */
  def extractFeatures(df: DataFrame, dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeatures(id, StubCodec.features(bytes, dim))
      })
  }

  /** Real audio metadata codec over the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU — the containers the built-in providers read), the
    * audio sibling of [[ImageCodec]]: header-only parse — channels,
    * sample rate, bit depth, frame count — without decoding samples,
    * so a metadata pass over a media corpus costs stream opens.
    * Unrecognized or truncated bytes return None: corrupt media is
    * data, never a task failure. */
  object AudioCodec {
    /** (encoding, channels, sampleRateHz, bitsPerSample, nFrames,
      * durationMs) from the container header; None if undecodable.
      * durationMs floors (nFrames × 1000) / sampleRate. */
    def decodeMeta(bytes: Array[Byte])
        : Option[(String, Int, Int, Int, Long, Long)] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = aff.getFormat
        val rate = f.getSampleRate.toInt
        val frames = aff.getFrameLength.toLong
        if (rate <= 0 || frames < 0) None
        else Some((f.getEncoding.toString.toLowerCase(java.util.Locale.ROOT),
          f.getChannels, rate, f.getSampleSizeInBits,
          frames, frames * 1000L / rate))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic PCM-16 WAV fixture, written by the real
      * AudioSystem WAVE writer — the encode side of decode
      * round-trips. Samples are a fixed sawtooth so output bytes are
      * reproducible. */
    def encode(sampleRateHz: Int, channels: Int, nFrames: Int): Array[Byte] = {
      require(sampleRateHz > 0 && channels > 0 && nFrames >= 0,
        s"bad WAV fixture params: $sampleRateHz/$channels/$nFrames")
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRateHz.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * channels * 2)
      var i = 0
      while (i < pcm.length / 2) {
        val v = ((i * 257) % 65536 - 32768).toShort
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  case class AudioMeta(media_id: Long, encoding: Option[String],
                       channels: Option[Int], sample_rate: Option[Int],
                       n_frames: Option[Long], duration_ms: Option[Long],
                       n_bytes: Long)

  /** Per-partition batched REAL audio decode via [[AudioCodec]];
    * undecodable content yields null meta (never a task failure).
    * Input needs (media_id BIGINT, content BINARY); pair with
    * [[repartitionForDecode]] upstream. */
  def decodeAudioMeta(df: DataFrame): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = if (bytes == null) 0L else bytes.length.toLong
        AudioCodec.decodeMeta(bytes) match {
          case Some((enc, ch, rate, _, frames, durMs)) =>
            AudioMeta(id, Some(enc), Some(ch), Some(rate),
              Some(frames), Some(durMs), n)
          case None =>
            AudioMeta(id, None, None, None, None, None, n)
        }
      })
  }

  /** Frame-sampling plan for video content: evenly spaced offsets —
    * pure column math, the decode of each frame is the stubbed part. */
  def frameOffsets(durationMs: Column, everyMs: Long): Column =
    sequence(lit(0L), greatest(durationMs - 1L, lit(0L)), lit(everyMs))

  /** Right-size partitions for binary payloads before a decode pass:
    * target ~`targetMb` of content per task so executor memory is
    * bounded regardless of media size skew. */
  def repartitionForDecode(df: DataFrame, content: Column, targetMb: Int = 64): DataFrame = {
    val totalBytes = df.select(sum(length(content)).cast("long")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, (totalBytes / (targetMb.toLong * 1024 * 1024)).toInt)
    df.repartition(parts)
  }
}
