package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table sink — the reference's I/O surface is the metastore
  * (`saveAsTable` at `Team11-Project.py:199`, `:381`; `spark.table` at
  * `:243`, `:397`). With an in-memory catalog (tests, the driver
  * harness), `mode("overwrite")` cannot reclaim a warehouse location
  * left by a PREVIOUS session (the catalog entry died with that session,
  * the directory didn't) — so overwrite here means: drop the catalog
  * entry if present, clear the orphan location, then write.
  */
object TableSink {

  /** Overwrite-write `df` as managed parquet table `name` and return the
    * re-read `spark.table(name)` frame.
    */
  def overwriteTable(df: DataFrame, name: String): DataFrame = {
    prepareOverwrite(df.sparkSession, name)
    df.write.format("parquet").mode("overwrite").saveAsTable(name)
    df.sparkSession.table(name)
  }

  /** Drop `name` from the catalog AND clear any orphan warehouse
    * location a previous session left behind — call before any
    * `saveAsTable` that must be re-runnable (bucketed writers included).
    */
  def prepareOverwrite(spark: SparkSession, name: String): Unit = {
    // Validated BEFORE the DROP and the filesystem delete: a '/' or '..'
    // would make the orphan-location delete escape the warehouse dir, a
    // backtick would break out of the DROP quoting, and a qualified
    // db.tbl name would resolve to the wrong local path (db.db/tbl).
    require(name.matches("[A-Za-z0-9_]+"),
      s"table name must match [A-Za-z0-9_]+ (unqualified, no separators): $name")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    clearOrphanLocation(spark, name)
  }

  /** Only LOCAL warehouse locations are cleared: for a remote warehouse
    * (hdfs://, s3a://, ...) the URI's path would name an unrelated LOCAL
    * directory — deleting it would destroy data that was never the
    * table's location. Remote orphans surface as the original
    * LOCATION_ALREADY_EXISTS error, which is the safe failure. Paths
    * that don't parse as URIs (spaces, etc.) are treated as raw local
    * paths.
    */
  private def clearOrphanLocation(spark: SparkSession, name: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    val localBase: Option[String] =
      try {
        val uri = new java.net.URI(wh)
        uri.getScheme match {
          case null | "file" =>
            Some(if (uri.getPath == null || uri.getPath.isEmpty) wh else uri.getPath)
          case _ => None // remote warehouse: never touch local disk
        }
      } catch {
        case _: java.net.URISyntaxException => Some(wh.stripPrefix("file:"))
      }
    localBase.foreach { base =>
      val dir = new java.io.File(base, name.toLowerCase(java.util.Locale.ROOT))
      if (dir.exists()) delete(dir)
    }
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }
}
