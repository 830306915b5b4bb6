package graft

import org.apache.spark.sql.DataFrame

/** Shared staging helper for the metamorphic fuzz suites: write each
  * table as ONE parquet file named `<name>.parquet` inside a scratch
  * dir — the exact layout `SparkEntry.queries` (and
  * `StreamingOracle.stageStream`, which `Files.copy`s that path) load
  * from. Extracted from six per-spec copies so a change to the staging
  * contract lands once.
  */
private[graft] object FuzzStage {

  /** Stage `tables` under a fresh scratch dir; returns the dir path. */
  def stage(prefix: String, tables: (String, DataFrame)*): String = {
    val dir = graft.core.TempDirs.scratch(prefix)
    tables.foreach { case (name, df) =>
      val tmp = graft.core.TempDirs.scratch(s"${prefix}_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val walk = java.nio.file.Files.list(tmp)
      val part =
        try walk.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally walk.close()
      java.nio.file.Files.move(part, dir.resolve(s"$name.parquet"))
    }
    dir.toString
  }
}
