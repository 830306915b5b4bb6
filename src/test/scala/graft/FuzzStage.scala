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

  /** RNG-stream offset for fresh-seed fuzz campaigns:
    * `SPARK_GRAFT_FUZZ_OFFSET=<long>` shifts every metamorphic
    * generator's RNG base so the whole corpus re-rolls, while the
    * seed-INDEX-keyed planted constructions (deep-chain placement,
    * per-seed id spaces) stay in place and the engine-vs-brute
    * assertions recompute their expectations from the new data. The
    * default 0 is the pinned regression corpus every CI run uses; a
    * campaign run is `SPARK_GRAFT_FUZZ_OFFSET=N sbt "testOnly
    * graft.Metamorphic*"`. Vacuity guards (minimum planted-case
    * counts measured from the generated data) may trip on an unlucky
    * offset — that reads as a corpus problem, not an engine bug.
    */
  val seedOffset: Long = {
    val off = sys.env.get("SPARK_GRAFT_FUZZ_OFFSET")
      .flatMap(_.toLongOption).getOrElse(0L)
    // announce a campaign run so its log proves the offset reached the
    // forked test JVM (a lost env var would silently re-run the pinned
    // corpus and report a vacuous "fresh" pass)
    if (off != 0L)
      System.err.println(s"[fuzz] SPARK_GRAFT_FUZZ_OFFSET=$off — " +
        "fresh-corpus campaign, NOT the pinned regression corpus")
    off
  }

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
