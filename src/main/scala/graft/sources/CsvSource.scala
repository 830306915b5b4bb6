package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Hardened CSV source/sink pairing — the engine's one CSV surface.
  * The reference's raw ingest is delimited text (the UCI HAR
  * whitespace-delimited `.txt` files, staged into the metastore tables
  * read at `Team11-Project.py:43`); the gate round-trips this source in
  * q74.
  *
  * The READ defaults encode two silent-corruption fixes found by the
  * round-11 source-format fuzz:
  *
  *   - `multiLine=true`: the default reader splits records on raw
  *     newlines BEFORE parsing quotes, so a quoted field containing
  *     `\n` shears into malformed rows (nulled under PERMISSIVE — group
  *     counts silently migrate into the null-key group).
  *   - `nullValue=\N` (MySQL convention): the default null token is the
  *     bare empty string, which the reader ALSO produces by unquoting a
  *     written `""` — conflating empty-vs-null on read-back.
  *
  * Cost of `multiLine=true` at scale: each FILE becomes one parse unit
  * (a quote state machine cannot start mid-file), so intra-file split
  * parallelism is lost. A many-part-file corpus — what [[write]]
  * produces naturally — parallelizes per file and doesn't care; a
  * SINGLE huge CSV file would serialize onto one task.
  *
  * `splittable = true` is the documented escape hatch for that shape:
  * it restores the default newline-split reader, which chunks a single
  * file at `spark.sql.files.maxPartitionBytes` boundaries. It is ONLY
  * correct for corpora guaranteed newline-free inside fields (e.g.
  * machine-written exports that strip/escape newlines) — on data with
  * quoted embedded newlines it re-introduces the shearing above, which
  * is exactly why the safe mode is the default and this is an opt-in.
  */
object CsvSource {

  /** Read a headered CSV directory/file with the hardened defaults.
    *
    * @param schema     explicit schema (no inference pass over the data)
    * @param splittable opt-in single-huge-file fast path; requires
    *                   fields to contain no newlines (see class doc)
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      splittable: Boolean = false): DataFrame =
    reader(spark, splittable).schema(schema).csv(path)

  /** The configured reader, for callers that need extra options. */
  def reader(spark: SparkSession, splittable: Boolean = false): DataFrameReader =
    spark.read
      .option("header", "true")
      .option("multiLine", (!splittable).toString)
      .option("nullValue", "\\N")

  /** Write `df` as headered CSV, quoting as needed, with the `\N` null
    * marker [[read]] expects. Natural partitioning: each task writes its
    * own part file (with header) — a coalesce(1) staging write would
    * serialize to one task, the wrong shape at any scale.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(path)
}
