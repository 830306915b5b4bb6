package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column handling for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, decoded /
  * feature-extracted per partition.
  *
  * The Spark-side plumbing is real — schema contracts, per-partition
  * batched iteration (`mapPartitions`, the Scala analog of PySpark's
  * `mapInPandas`), partitioning behavior — and so is the decode for the
  * formats the JDK ships codecs for: PNG/JPEG/BMP/GIF via
  * `javax.imageio` (luminance block means in [0,1]) and PCM WAV via
  * `javax.sound.sampled` (sample block means mapped to [0,1]).
  * Payloads that are not decodable media fall back to a deterministic
  * hash-mix fake, so synthetic corpora keep working and a corrupt blob
  * never kills a 100 TB pipeline mid-stage. Video decode stays out
  * (no JDK codec); [[sampleFrames]] plans the row explosion from
  * metadata so the shape is exercised.
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Decode a media payload into a fixed-length feature vector in
    * [0,1]^dim: real JDK codec when the payload is recognizable media
    * ([[realDecode]]), deterministic hash-mix fake otherwise — the
    * fallback keeps the operator total and reproducible on arbitrary
    * bytes.
    */
  private[graft] def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] =
    realDecode(bytes, dim).getOrElse(fakeDecode(bytes, dim))

  /** Real codec path, JDK built-ins only. Magic-sniffed so non-media
    * payloads skip the codec attempt; decode failures (truncated file,
    * unsupported encoding) return None rather than throw — at scale a
    * corrupt payload must degrade, not fail the stage.
    */
  private[operators] def realDecode(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      if (bytes == null || bytes.length < 12) None
      else if (isWav(bytes)) decodeWav(bytes, dim)
      else if (isImage(bytes)) decodeImage(bytes, dim)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  private def isImage(b: Array[Byte]): Boolean =
    // PNG | JPEG | BMP | GIF
    ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F')

  private def isWav(b: Array[Byte]): Boolean =
    b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Image -> dim luminance block means: pixels scan row-major, split
    * into `dim` contiguous blocks, each averaged (Rec.601 luma, [0,1]).
    * Decode(encode(pixels)) is lossless for PNG/BMP/GIF-gray, so the
    * features are a pure function of the pixel content, not the byte
    * stream.
    */
  private def decodeImage(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    javax.imageio.ImageIO.setUseCache(false) // memory-only streams on executors
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      if (n == 0) return None
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var y = 0; var idx = 0L
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000.0 / 255.0
          val d = ((idx * dim) / n).toInt
          sums(d) += lum; counts(d) += 1
          x += 1; idx += 1
        }
        y += 1
      }
      Some(Array.tabulate(dim)(d =>
        if (counts(d) > 0) (sums(d) / counts(d)).toFloat else 0f))
    }
  }

  /** PCM WAV -> dim sample block means: channel-0 samples normalized to
    * [-1,1], mapped to [0,1] (same cube as the image path), split into
    * `dim` contiguous blocks, each averaged. 16-bit signed and 8-bit
    * PCM; anything else returns None.
    */
  private def decodeWav(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || (bits != 8 && bits != 16)) return None
      val raw = ais.readAllBytes()
      val frameSize = fmt.getFrameSize
      val n = raw.length / frameSize
      if (n == 0) return None
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < n) {
        val off = i * frameSize // channel 0 sits first in each frame
        val v =
          if (bits == 16) {
            val lo = raw(off + (if (fmt.isBigEndian) 1 else 0)) & 0xFF
            val hi = raw(off + (if (fmt.isBigEndian) 0 else 1))
            ((hi << 8) | lo).toShort / 32768.0
          } else if (signed) raw(off) / 128.0
          else ((raw(off) & 0xFF) - 128) / 128.0
        val d = ((i.toLong * dim) / n).toInt
        sums(d) += (v + 1.0) / 2.0; counts(d) += 1
        i += 1
      }
      Some(Array.tabulate(dim)(d =>
        if (counts(d) > 0) (sums(d) / counts(d)).toFloat else 0f))
    } finally ais.close()
  }

  /** Deterministic pseudo-decode fallback for non-media payloads:
    * xxhash-like byte mixing so tests are reproducible and collision
    * behavior is realistic.
    */
  private[operators] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = -7046029254386353131L // xxhash64 prime seed
    var i = 0
    while (i < bytes.length) {
      h = java.lang.Long.rotateLeft(h ^ (bytes(i) * -4417276706812531889L), 27) * -8796714831421723037L
      i += 1
    }
    var d = 0
    while (d < dim) {
      h = java.lang.Long.rotateLeft(h * -4417276706812531889L, 31)
      out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** Per-partition decode + feature-extract: (id, content: binary) ->
    * (id, features: array<float>). Batched iteration, no driver
    * round-trip; output schema declared up front so downstream pruning
    * and codegen see real types.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = ExpressionEncoder(outSchema)
    val src = df.select(col(idCol).cast(LongType).as("id"), col(binCol).as("content"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), decodeBytes(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** STUB image resize: metadata transform is real (width/height updated),
    * payload passthrough (a real impl would re-encode pixels).
    */
  def resize(df: DataFrame, metaCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(metaCol,
      col(metaCol).withField("width", lit(w)).withField("height", lit(h)))

  /** Frame sampling plan for video payloads: emits (id, frame_idx) rows at
    * `everyMs` intervals from the metadata duration — the row-explosion
    * shape of real frame extraction with the decode stubbed.
    */
  def sampleFrames(df: DataFrame, idCol: String, metaCol: String, everyMs: Long): DataFrame =
    df.select(col(idCol).as("id"),
      explode(sequence(lit(0L),
        greatest(coalesce(col(s"$metaCol.duration_ms"), lit(0L)) - 1, lit(0L)),
        lit(everyMs))).as("frame_ms"))

  /** Synthesize a REAL-image multimodal table over the documents corpus:
    * the container ships no media files, but the JDK ships an encoder —
    * each doc gets a deterministic `side`x`side` grayscale PNG whose
    * pixels derive from doc_id (block-constant values via a splitmix64
    * finalizer, so downstream block-mean features spread uniformly over
    * [0,1] instead of concentrating at 0.5). Downstream
    * [[extractFeatures]] then exercises the real `javax.imageio` decode
    * end to end: PNG is lossless, so the features are an exact function
    * of the generated pixels.
    */
  def syntheticPngTable(docs: DataFrame, idCol: String = "doc_id",
      side: Int = 16, blocks: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = ExpressionEncoder(outSchema)
    val s = side; val b = blocks
    docs.select(col(idCol).cast(LongType).as("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, pngFor(id, s, s, b), Row("image/png", s, s, null))
      }
    }(enc)
  }

  /** Deterministic grayscale PNG: pixels are block-constant (row-major
    * blocks matching [[decodeBytes]]'s block mapping), each block's
    * value a splitmix64 mix of (id, block).
    */
  private[operators] def pngFor(id: Long, w: Int, h: Int, blocks: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val n = w.toLong * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = y.toLong * w + x
        val block = ((idx * blocks) / n).toInt
        var z = id * -7046029254386353131L + block * -4417276706812531889L
        z = (z ^ (z >>> 30)) * -4658895280553007687L
        z = (z ^ (z >>> 27)) * -7723592293110705685L
        z ^= (z >>> 31)
        img.getRaster.setSample(x, y, 0, (z & 0xFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a REAL-audio multimodal table over the documents corpus:
    * each doc gets a deterministic 16-bit PCM mono WAV (the JDK encoder:
    * `AudioSystem.write`) whose samples are block-constant values derived
    * from (doc_id, block) — the audio sibling of [[syntheticPngTable]].
    * PCM WAV is lossless, so [[extractFeatures]]'s `javax.sound.sampled`
    * decode recovers the block means exactly: the q32b pipeline gates the
    * real audio codec end to end.
    */
  def syntheticWavTable(docs: DataFrame, idCol: String = "doc_id",
      samples: Int = 2048, blocks: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = ExpressionEncoder(outSchema)
    val n = samples; val b = blocks
    docs.select(col(idCol).cast(LongType).as("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // 8 kHz mono: duration_ms = samples / 8
        Row(id, wavFor(id, n, b), Row("audio/wav", null, null, (n / 8).toLong))
      }
    }(enc)
  }

  /** Deterministic 16-bit PCM mono WAV (8 kHz, little-endian): samples are
    * block-constant (block mapping matching [[decodeBytes]]'s), each
    * block's amplitude a splitmix64 mix of (id, block) — the same mixing
    * as [[pngFor]] so features spread uniformly instead of piling at 0.5.
    */
  private[graft] def wavFor(id: Long, nSamples: Int, blocks: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val block = ((i.toLong * blocks) / nSamples).toInt
      var z = id * -7046029254386353131L + block * -4417276706812531889L
      z = (z ^ (z >>> 30)) * -4658895280553007687L
      z = (z ^ (z >>> 27)) * -7723592293110705685L
      z ^= (z >>> 31)
      val v = (z & 0xFFFFL).toShort
      raw(2 * i) = (v & 0xFF).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthesize a small multimodal table over the documents corpus (the
    * container ships no media files): binary payload derived from text
    * bytes + plausible metadata. Used by tests and demos.
    */
  def syntheticMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("fake/raw").as("format"),
        (pmod(xxhash64(col("text")), lit(640)) + 32).cast(IntegerType).as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(480)) + 32).cast(IntegerType).as("height"),
        (pmod(xxhash64(col("text"), lit(2)), lit(10000)) + 1000).as("duration_ms")
      ).as("meta"))
}
