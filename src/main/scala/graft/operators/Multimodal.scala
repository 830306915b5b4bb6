package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column handling for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, decoded /
  * feature-extracted per partition.
  *
  * The Spark-side plumbing here is real — schema contracts, per-partition
  * batched iteration (`mapPartitions`, the Scala analog of PySpark's
  * `mapInPandas`), partitioning behavior — while the pixel/sample decode
  * itself is STUBBED with a deterministic fake (media codecs are not in
  * this environment). Swap [[decodeBytes]] for a real codec (javacv /
  * ffmpeg bindings) to productionize; every signature stays unchanged.
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** STUB decode: deterministic pseudo-decode of a media payload into a
    * fixed-length feature vector. Real implementation would decode pixels
    * / samples; the fake derives bytes via xxhash-like mixing so tests
    * are reproducible and collision behavior is realistic.
    */
  private[operators] def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
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
