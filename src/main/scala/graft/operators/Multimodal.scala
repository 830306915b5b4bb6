package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}

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
  * never kills a 100 TB pipeline mid-stage. Video rides MJPEG-in-AVI:
  * the JDK ships no video *codec*, but AVI is a plain RIFF container
  * and its MJPEG frames are JPEGs — which `javax.imageio` does decode —
  * so [[decodeAviFrames]] walks the container and decodes real frames,
  * [[sampleFrameFeatures]] turns a video column into per-frame feature
  * rows, and [[sampleFrames]] remains the metadata-only planning
  * variant (the row-explosion shape without touching payload bytes).
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** The one id contract every Multimodal entry point shares: project
    * `idCol` to a non-null BIGINT `as`, where a genuinely NULL id drops
    * the row (no identity to decode or synthesize against — and the
    * declared output schemas are non-nullable), while a non-null id the
    * Long cast nulls out (non-numeric string, overflowing decimal)
    * fails LOUDLY. The loud half matches the DuckDB oracles' ANSI
    * `CAST(doc_id AS BIGINT)`, which throws on such values — silently
    * dropping them here would diverge from the oracle corpus-by-corpus.
    * Under Spark's default ANSI mode the cast itself already throws
    * (CAST_INVALID_INPUT); the raise_error branch is the safety net for
    * sessions running with spark.sql.ansi.enabled=false, where the cast
    * nulls out instead. Callers apply [[idIsNotNull]] (the pre-cast
    * filter) first so only cast FAILURES reach the error branch.
    */
  private def idAs(idCol: String, as: String): Column = {
    val casted = col(idCol).cast(LongType)
    when(casted.isNull && col(idCol).isNotNull,
      raise_error(concat(
        lit(s"Multimodal: id column '$idCol' value '"),
        col(idCol).cast(StringType),
        lit("' is not castable to BIGINT"))).cast(LongType))
      .otherwise(casted).as(as)
  }

  /** Pre-cast null filter paired with [[idAs]]. */
  private def idIsNotNull(df: DataFrame, idCol: String): DataFrame =
    df.where(col(idCol).isNotNull)

  /** Id projection spread to cluster parallelism before a per-row codec
    * `mapPartitions`: the synthetic corpora derive from a SINGLE parquet
    * split at test scale, which serialized every encode/decode into ONE
    * task on a 32-core session (measured: the q32c AVI synthesis — 30k
    * JPEG encodes — ran single-threaded at ~2.5 s). `Partitioning.spread`
    * is a no-op once the scan already carries >= defaultParallelism
    * splits, so the 100 TB path never pays the extra exchange; the rows
    * moved here are slim (id only / id + payload about to be replaced).
    */
  private def spreadIds(df: DataFrame, idCol: String, as: String): DataFrame =
    Partitioning.spread(idIsNotNull(df, idCol).select(idAs(idCol, as)))

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
      else if (isAvi(bytes)) decodeAviMean(bytes, dim)
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

  private[operators] def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Image -> dim luminance block means: pixels scan row-major, split
    * into `dim` contiguous blocks, each averaged (Rec.601 luma, [0,1]).
    * Decode(encode(pixels)) is lossless for PNG/BMP/GIF-gray, so the
    * features are a pure function of the pixel content, not the byte
    * stream.
    */
  private def decodeImage(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    boundedImageRead(bytes, 0, bytes.length).flatMap(imageBlockMeans(_, dim))

  /** Raster cap for decoding UNTRUSTED payloads: 64M pixels (~256 MB
    * ARGB). Far above any real thumbnail/frame this engine feeds, far
    * below executor-killing.
    */
  private final val MaxImagePixels = 64L * 1024 * 1024

  /** Header-bounded image decode: read ONLY the header for dimensions
    * and reject oversized rasters BEFORE the full decode. A plain
    * `ImageIO.read` on a ~100-byte payload whose header declares
    * 60000x60000 allocates a multi-GB raster — `OutOfMemoryError` is an
    * Error, which the NonFatal degrade path never catches, so one
    * crafted/corrupt blob would kill the executor. Decompression bombs
    * are routine in crawled corpora; at 100 TB one WILL appear.
    */
  private[operators] def boundedImageRead(
      bytes: Array[Byte], off: Int, len: Int): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false) // memory-only streams on executors
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes, off, len))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > MaxImagePixels) None
        else Option(reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Row-major luminance block means of one decoded image (the shared
    * feature kernel of the image and video paths).
    */
  private[graft] def imageBlockMeans(
      img: java.awt.image.BufferedImage, dim: Int): Option[Array[Float]] = {
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

  /** The JDK's registered audio SPI providers, resolved ONCE per JVM.
    * `AudioSystem.getAudioInputStream` / `AudioSystem.write` re-run the
    * provider lookup per call through a SYNCHRONIZED registry
    * (JDK13Services), which anti-scales under executor-thread
    * parallelism: the parallel WAV decode measured 2-3x SLOWER than
    * single-threaded purely from that lock (guide §4.5 — initialize
    * heavyweight state once, not per row). Caching the provider list
    * keeps the identical codec classes (the real `javax.sound.sampled`
    * path) and makes the per-row call lock-free.
    */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
    // Order WAV-capable readers FIRST, decided by ONE probe at init: the
    // JDK's registration order is Aiff, Au, SoftMidi, Wave..., so the
    // first-supporting-provider loop paid three thrown
    // UnsupportedAudioFileExceptions per payload before reaching the
    // wave reader — measured 0.16 s vs 0.01 s per 5000 lookups (~16x of
    // pure exception overhead). Non-WAV payloads still reach every
    // reader; only the order changes, and order among SUPPORTING
    // readers is preserved within each group.
    val probe = new java.io.ByteArrayInputStream(wavFor(0L, 8, 1))
    val (wav, rest) = all.partition { r =>
      probe.reset()
      try { r.getAudioInputStream(probe).close(); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }
    wav ++ rest
  }

  private[operators] lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toList
  }

  /** `AudioSystem.getAudioInputStream` minus the synchronized registry:
    * the same first-supporting-provider loop over the same providers.
    */
  private def audioInputStream(
      in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    audioReaders.foreach { r =>
      try return r.getAudioInputStream(in)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** PCM WAV -> dim sample block means: channel-0 samples normalized to
    * [-1,1], mapped to [0,1] (same cube as the image path), split into
    * `dim` contiguous blocks, each averaged. 16-bit signed and 8-bit
    * PCM; anything else returns None.
    */
  private def decodeWav(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    val ais = audioInputStream(new java.io.ByteArrayInputStream(bytes))
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

  // ------------------------------------------------------------- video

  /** Walk an AVI (RIFF) container and decode its MJPEG frames via
    * `javax.imageio` — `00dc`/`xxdc` compressed-video chunks hold plain
    * JPEG streams in MJPEG files. Pure JDK: RIFF is length-prefixed
    * fourcc chunks (word-aligned), no codec needed for the container
    * itself. Undecodable chunks are skipped, a malformed container
    * returns None — corrupt payloads degrade, never fail the stage.
    */
  private[graft] def decodeAviFrames(
      bytes: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    decodeAviFramesEvery(bytes, 1).map(_.map(_._2))

  /** [[decodeAviFrames]] with frame sampling pushed INTO the container
    * walk: only every `everyN`-th video chunk reaches the JPEG decoder
    * (the skipped chunks cost a length-prefix hop each, no codec work) —
    * at everyN=2 that halves the decode cost of frame sampling. Returns
    * (frame_idx, image) pairs; the index counts ALL video chunks, so
    * sampled indices are stable regardless of everyN.
    */
  private[graft] def decodeAviFramesEvery(bytes: Array[Byte], everyN: Int)
      : Option[Vector[(Int, java.awt.image.BufferedImage)]] =
    try {
      if (!isAvi(bytes)) return None
      javax.imageio.ImageIO.setUseCache(false)
      def u32(off: Int): Long =
        (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
          ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val frames = Vector.newBuilder[(Int, java.awt.image.BufferedImage)]
      var frameIdx = 0
      // AGGREGATE budget across kept frames: the per-frame cap alone is
      // defeatable by a crafted container of many just-under-cap frames
      // (50 x 64M-pixel JPEGs accumulate ~12 GB of rasters -> the same
      // fatal OutOfMemoryError the per-frame guard exists to prevent).
      // Real MJPEG sampling workloads stay far below both limits.
      var pixelBudget = 4L * MaxImagePixels
      var keptFrames = 0
      val maxKeptFrames = 4096
      val riffEnd = math.min(bytes.length.toLong, 8L + u32(4)).toInt
      def walk(from: Int, to: Int, insideMovi: Boolean, depth: Int): Unit = {
        // depth bound: a crafted chain of nested 12-byte LIST headers
        // otherwise recurses once per level -> StackOverflowError, a
        // VirtualMachineError the NonFatal degrade path never catches.
        // Real AVI nesting is ~3 (RIFF > movi > rec).
        if (depth > 16) return
        var pos = from
        while (pos + 8 <= to) {
          val id = fourcc(pos)
          val size = u32(pos + 4)
          val dataStart = pos + 8
          val dataEnd = dataStart + size
          if (dataEnd > to) return // truncated chunk: stop this level
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(dataStart)
            walk(dataStart + 4, dataEnd.toInt, insideMovi || listType == "movi",
              depth + 1)
          } else if (insideMovi && id.length == 4 && id.endsWith("dc") && size > 0) {
            if (frameIdx % everyN == 0 && pixelBudget > 0 &&
                keptFrames < maxKeptFrames) {
              // bounded: an embedded frame is as untrusted as the container
              boundedImageRead(bytes, dataStart, size.toInt).foreach { img =>
                frames += ((frameIdx, img))
                pixelBudget -= img.getWidth.toLong * img.getHeight
                keptFrames += 1
              }
            }
            frameIdx += 1
          }
          pos = (dataEnd + (size & 1)).toInt // chunks are word-aligned
        }
      }
      walk(12, riffEnd, insideMovi = false, depth = 0)
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Whole-video features for [[extractFeatures]]: the mean of the
    * per-frame luminance block means (every decodable frame weighted
    * equally).
    */
  private def decodeAviMean(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeAviFrames(bytes).flatMap { frames =>
      val per = frames.flatMap(imageBlockMeans(_, dim))
      if (per.isEmpty) None
      else Some(Array.tabulate(dim)(d => (per.map(_(d).toDouble).sum / per.size).toFloat))
    }

  /** REAL frame sampling: decode the AVI payload per partition, keep
    * every `everyN`-th frame, emit one `(id, frame_idx, features)` row
    * per kept frame — the row-explosion shape of [[sampleFrames]] with
    * the decode actually performed. Payloads that are not decodable
    * video emit zero rows (a 100 TB scrape is full of junk; dropping is
    * the production behavior, and the emitted row count is how the drop
    * rate is monitored).
    */
  def sampleFrameFeatures(
      df: DataFrame, idCol: String, binCol: String,
      everyN: Int = 1, dim: Int = 64): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = ExpressionEncoder(outSchema)
    val n = everyN; val d = dim
    // null ids drop, uncastable ids throw (idAs contract) — previously a
    // null id here NPE'd at getLong despite the non-nullable out schema
    idIsNotNull(df, idCol)
      .select(idAs(idCol, "id"), col(binCol).as("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodeAviFramesEvery(bytes, n).toSeq.flatMap(_.flatMap {
            case (idx, img) =>
              imageBlockMeans(img, d).map(f => Row(r.getLong(0), idx, f.toSeq))
          })
        }
      }(enc)
  }

  /** Deterministic MJPEG-in-AVI payload: `frames` JPEG frames (the
    * [[grayTileImageFor]] 8x8-tile pattern, frame index folded into the
    * seed) wrapped in a minimal spec-shaped RIFF: `hdrl` (avih + one
    * `vids` stream with an MJPG `strh`/`strf`), `movi` with `00dc`
    * chunks, `idx1`. 10 fps.
    *
    * The frames are DC-exact by construction: each 8x8 JPEG macroblock
    * is a single gray value, so every AC coefficient is exactly zero
    * (each is a weighted sum of differences of equal values, in integer
    * and float DCTs alike), the quantized DC entropy-codes losslessly,
    * and the IDCT of a DC-only block is constant — the JDK's
    * grayscale-JPEG round-trip of such frames is measured IDENTITY
    * (d(g) == g for all 256 grays, neighbor-independent; pinned in
    * StreamingMultimodalSpec). That is what lets the q32c oracle derive
    * the decoded features in closed form even though MJPEG is a lossy
    * codec: the synth only drives it through its lossless subspace.
    */
  private[graft] def aviFor(
      id: Long, frames: Int, w: Int, h: Int): Array[Byte] = {
    val jpegs = Array.tabulate(frames) { f =>
      val img = grayTileImageFor(id * 1000003L + f, w, h)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(idCc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(idCc) ++ le32(body.length) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(listType) ++ body)
    // MainAVIHeader: 10 fps, one video stream
    val avih = chunk("avih", le32(100000L) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    // AVIStreamHeader: vids/MJPG, scale 1 rate 10, length = frame count
    val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(frames) ++ le32(0) ++
      le32(0xFFFFFFFFL) ++ le32(0) ++
      Array(0, 0, 0, 0).map(_.toByte) ++ le32((h.toLong << 16) | w))
    // BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++
      Array(1, 0, 24, 0).map(_.toByte) ++ cc("MJPG") ++ le32(w.toLong * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frameChunks = jpegs.map(chunk("00dc", _))
    val movi = list("movi", frameChunks.flatten)
    // idx1 offsets are relative to the 'movi' fourcc
    val idx1 = {
      var off = 4L
      chunk("idx1", jpegs.zip(frameChunks).flatMap { case (j, fc) =>
        val e = cc("00dc") ++ le32(0x10) ++ le32(off) ++ le32(j.length)
        off += fc.length
        e
      })
    }
    val payload = cc("AVI ") ++ hdrl ++ movi ++ idx1
    cc("RIFF") ++ le32(payload.length) ++ payload
  }

  /** Synthesize a REAL-video multimodal table over the documents corpus:
    * each doc gets a deterministic MJPEG-in-AVI clip ([[aviFor]]) whose
    * frames vary by (doc_id, frame). [[sampleFrameFeatures]] /
    * [[extractFeatures]] then exercise the real container walk + JPEG
    * decode end to end — the video sibling of [[syntheticPngTable]].
    */
  def syntheticAviTable(docs: DataFrame, idCol: String = "doc_id",
      frames: Int = 6, side: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = ExpressionEncoder(outSchema)
    val f = frames; val s = side
    // null-id rows synthesize nothing (see syntheticPngTable); spread so
    // the per-row JPEG encodes parallelize (single-split input otherwise
    // serializes the whole synthesis into one task)
    spreadIds(docs, idCol, "doc_id")
      .mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // memory-only output streams
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, aviFor(id, f, s, s), Row("video/avi", s, s, f * 100L))
      }
    }(enc)
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
    // null ids drop, uncastable ids throw (idAs contract)
    val src = idIsNotNull(df, idCol)
      .select(idAs(idCol, "id"), col(binCol).as("content"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), decodeBytes(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Image resize, for real: decodable image payloads are scaled to
    * `w`x`h` (Graphics2D bilinear — pure JDK) and re-encoded as PNG;
    * metadata updates to the new dimensions either way, and
    * `meta.format` flips to "image/png" EXACTLY where the re-encode
    * fired — a payload the resize replaced must not keep metadata
    * claiming the original container (a downstream consumer routing on
    * format would mis-decode it). Non-image / corrupt payloads pass
    * through bytes-and-format untouched with the dimensions-only
    * update (the degrade-don't-fail contract of [[realDecode]]).
    * Per-partition `mapPartitions`, preserving every other column.
    */
  def resize(df: DataFrame, binCol: String, metaCol: String, w: Int, h: Int): DataFrame = {
    val enc = ExpressionEncoder(df.schema)
    val binIdx = df.schema.fieldIndex(binCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    // format surgery happens row-side (only the map knows whether the
    // re-encode fired); tolerate meta structs WITHOUT a format field —
    // the declarative width/height withField below adds-or-replaces
    // either way
    val fmtIdx = df.schema(metaIdx).dataType match {
      case s: StructType if s.fieldNames.contains("format") =>
        s.fieldIndex("format")
      case _ => -1
    }
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val resized = resizeImageBytes(bytes, w, h)
        var seq = r.toSeq
        resized.foreach { png =>
          seq = seq.updated(binIdx, png)
          if (fmtIdx >= 0 && !r.isNullAt(metaIdx))
            seq = seq.updated(metaIdx, Row.fromSeq(
              r.getStruct(metaIdx).toSeq.updated(fmtIdx, "image/png")))
        }
        Row.fromSeq(seq)
      }
    }(enc).withColumn(metaCol,
      col(metaCol).withField("width", lit(w)).withField("height", lit(h)))
  }

  /** Decode → bilinear scale → PNG re-encode; None when the payload is
    * not a decodable image.
    */
  private[graft] def resizeImageBytes(
      bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      if (bytes == null || bytes.length < 12 || !isImage(bytes)) None
      else {
        val img = boundedImageRead(bytes, 0, bytes.length).orNull
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling plan for video payloads: emits (id, frame_idx) rows at
    * `everyMs` intervals from the metadata duration — the row-explosion
    * shape of real frame extraction with the decode stubbed.
    *
    * `duration_ms` is UNTRUSTED metadata: one dirty row (a year-long or
    * Long.MaxValue "duration") would otherwise make `sequence` build a
    * multi-hundred-million-element array in one row or die with an
    * opaque size error naming no id. `maxFramesPerItem` (default 100k ~
    * an hour of video at 25 ms sampling) bounds it: exceeding the
    * budget raises a clear id-naming error; `skipOversizedItems = true`
    * drops such rows instead (explicit opt-in — silent loss is worse
    * than a loud stop). Same contract as GapFill's grid budget.
    */
  def sampleFrames(df: DataFrame, idCol: String, metaCol: String, everyMs: Long,
      maxFramesPerItem: Long = 100000L,
      skipOversizedItems: Boolean = false): DataFrame = {
    require(everyMs > 0, "everyMs must be positive")
    require(maxFramesPerItem > 0, "maxFramesPerItem must be positive")
    val durMs = greatest(coalesce(col(s"$metaCol.duration_ms"), lit(0L)), lit(0L))
    val base = df.select(col(idCol).as("id"), durMs.as("_dur"))
      // ceil(dur / every) in exact long arithmetic (Column `/` is
      // double division and would fuzz the count at extreme durations).
      // Floored at 1: the generator below always emits the frame_ms=0
      // frame, even for a 0/null/negative duration (sequence(0, 0) is
      // one element), so the budget must count the actual emitted
      // cardinality — otherwise a degenerate row undercounts by one and
      // skipOversizedItems keeps a row the count says is empty.
      .withColumn("_n",
        expr(s"greatest((_dur + ${everyMs - 1}L) div ${everyMs}L, 1L)"))
    val bounded =
      if (skipOversizedItems) base.filter(col("_n") <= maxFramesPerItem)
      else base.withColumn("_dur",
        // assert_true rides inside the bound so pruning cannot drop it
        col("_dur") + coalesce(
          assert_true(col("_n") <= maxFramesPerItem, format_string(
            s"sampleFrames: item %s declares %d ms of video = %d frames at " +
              s"every ${everyMs} ms, exceeding maxFramesPerItem=$maxFramesPerItem " +
              "— dirty metadata usually causes this; clean the duration, raise " +
              "the budget, or pass skipOversizedItems=true",
            col("id"), col("_dur"), col("_n"))).cast("long"),
          lit(0L)))
    bounded.select(col("id"),
      explode(sequence(lit(0L), greatest(col("_dur") - 1, lit(0L)),
        lit(everyMs))).as("frame_ms"))
  }

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
    // a null id carries no identity to derive pixels from, and the output
    // schema declares doc_id non-nullable: such rows synthesize nothing;
    // an uncastable id throws (idAs contract). Spread so the per-row PNG
    // encodes parallelize (see [[spreadIds]]).
    spreadIds(docs, idCol, "doc_id")
      .mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // memory-only output streams
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, pngFor(id, s, s, b), Row("image/png", s, s, null))
      }
    }(enc)
  }

  /** The ONE splitmix64 (seed, block) finalizer behind every synthetic
    * payload — PNG blocks, JPEG macroblock tiles, WAV amplitude blocks.
    * Single definition on purpose: the DuckDB oracles embed the same
    * mixing, so a constant edited in one inlined copy would silently
    * desynchronize the other synthesizers from the oracle corpus.
    */
  private[graft] def mix64(seed: Long, block: Long): Long = {
    var z = seed * -7046029254386353131L + block * -4417276706812531889L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  /** Deterministic grayscale image: pixels are block-constant (row-major
    * blocks matching [[decodeBytes]]'s block mapping), each block's
    * value a splitmix64 mix of (id, block) ([[mix64]]). Shared by the
    * PNG and MJPEG-AVI synthesizers.
    */
  private[graft] def grayImageFor(
      id: Long, w: Int, h: Int, blocks: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val n = w.toLong * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = y.toLong * w + x
        val block = ((idx * blocks) / n).toInt
        img.getRaster.setSample(x, y, 0, (mix64(id, block) & 0xFF).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic grayscale image whose constant regions are JPEG
    * MACROBLOCKS: each 8x8 tile (row-major tile index) carries a single
    * gray value from the same splitmix64 (seed, tile) mixing as
    * [[grayImageFor]]. Feeding the JPEG encoder only tile-constant
    * frames keeps every macroblock DC-only, which makes the (lossy)
    * MJPEG round-trip exactly reproducible — see [[aviFor]].
    */
  private[graft] def grayTileImageFor(
      seed: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    require(w % 8 == 0 && h % 8 == 0, "tiles must align with JPEG 8x8 blocks")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val tilesPerRow = w / 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val tile = (y / 8) * tilesPerRow + (x / 8)
        img.getRaster.setSample(x, y, 0, (mix64(seed, tile) & 0xFF).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic grayscale PNG over [[grayImageFor]]'s pixels. */
  private[graft] def pngFor(id: Long, w: Int, h: Int, blocks: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(grayImageFor(id, w, h, blocks), "png", bos)
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
    // null-id rows synthesize nothing (see syntheticPngTable). NOT
    // spread, deliberately (measured, unlike the PNG/AVI siblings): a
    // WAV encode+decode is ~50 us/row once the registry lookup is
    // amortized ([[audioWriters]]), and the q32b A/B measured the spread
    // variant consistently SLOWER (2.1-2.4 s vs 1.1-1.8 s) — per-task
    // overhead across the downstream checkpoint/IVF stages exceeds the
    // parallelizable codec work at this payload cost.
    idIsNotNull(docs, idCol).select(idAs(idCol, "doc_id"))
      .mapPartitions { rows =>
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
      val v = (mix64(id, block) & 0xFFFFL).toShort
      raw(2 * i) = (v & 0xFF).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    // AudioSystem.write minus the synchronized per-call registry lookup
    // (see [[audioReaders]]): same provider, same bytes, lock-free
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, bos)
      case None => javax.sound.sampled.AudioSystem.write(ais, wave, bos)
    }
    bos.toByteArray
  }

  /** Ground-truth feature LUT for the q32 oracle: the feature value the
    * real PNG encode→decode→block-mean path produces for a uniform gray
    * value at [[syntheticPngTable]]'s geometry (16x16, 32 blocks — 8
    * pixels per block, and the synth's block-constant pixels make every
    * block uniform). Computed by running the ACTUAL pipeline per gray
    * value — `ImageIO.write`/`read` round-trip, then
    * [[imageBlockMeans]]'s own kernel — so every codec detail (the JDK's
    * gray→sRGB conversion table) and every FP detail (the sequential
    * 8-addition block sum of a non-dyadic luminance, then the float
    * narrowing) is captured, not modeled. 256 doubles; embedded as
    * literals in the DuckDB oracle the way q45/q28 embed centroids.
    */
  private[graft] lazy val pngGrayFeatureLut: Array[Double] = Array.tabulate(256) { g =>
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) { img.getRaster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    imageBlockMeans(dec, 32).get.apply(0).toDouble
  }

  /** Ground-truth feature LUT for the q32c oracle: the feature value the
    * real JPEG encode→decode→block-mean path produces for a uniform gray
    * value at [[syntheticAviTable]]'s frame geometry (16x16; dim=32
    * block means are 8-pixel half-rows, each lying inside ONE 8x8 JPEG
    * tile, so every feature block is uniform). Captured by running the
    * ACTUAL codec per gray value, like [[pngGrayFeatureLut]]. The JDK's
    * grayscale-JPEG round-trip of a DC-only macroblock is measured
    * identity (d(g) == g), so this coincides numerically with the PNG
    * LUT — but it is captured through the real JPEG codec so the oracle
    * depends on measurement, not on that identity holding.
    */
  private[graft] lazy val jpegGrayFeatureLut: Array[Double] = Array.tabulate(256) { g =>
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) { img.getRaster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    imageBlockMeans(dec, 32).get.apply(0).toDouble
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
