package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Partitioning helpers: stream-side spreading for pair operators, salted
  * joins for skewed keys, bucketed tables for shuffle-free co-located
  * joins.
  */
object Partitioning {

  /** Skew-resistant equi join: replicate each right-side row `salt` ways
    * and scatter left-side rows uniformly across the replicas, so one hot
    * key spreads over `salt` tasks instead of melting one. Inner/left
    * semantics preserved (each left row meets exactly one replica).
    * AQE's skew-join handles the sort-merge case at runtime; salting is
    * the explicit form that also covers hash aggregation feeding joins.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val l = left.withColumn("_salt",
      pmod(pmod(hash(monotonically_increasing_id()), lit(salt)) + salt, lit(salt)))
    val r = right.withColumn("_salt_arr",
      sequence(lit(0), lit(salt - 1)))
      .withColumn("_salt", explode(col("_salt_arr")))
      .drop("_salt_arr")
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Write a bucketed+sorted table: joins and aggregations on the bucket
    * keys then run shuffle-free (`SortMergeJoin` with no `Exchange`).
    * The table lands in the session warehouse under `name`.
    */
  def writeBucketed(df: DataFrame, name: String, bucketCols: Seq[String], buckets: Int): Unit = {
    graft.sources.TableSink.prepareOverwrite(df.sparkSession, name)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Ensure a frame has at least `target` partitions (default: the
    * cluster's parallelism). Small inputs — a single parquet split —
    * otherwise serialize an entire crossJoin distance loop into ONE task.
    * No-op when the input is already wide enough (the 100 TB case: scans
    * arrive with thousands of splits).
    */
  def spread(df: DataFrame, target: Int = 0): DataFrame = {
    if (df.isStreaming) return df // micro-batch planner owns partitioning
    val t =
      if (target > 0) target
      else df.sparkSession.sparkContext.defaultParallelism
    // Width check WITHOUT forcing physical planning of the subtree (an
    // `rdd.getNumPartitions` probe would plan it once per call): a
    // file-backed frame with >= t input files already scans wide — skip
    // the shuffle (the 100 TB case: thousands of splits). Fewer files, or
    // a non-file source (range, localCheckpoint, in-memory), gets the
    // tiny repartition — stream sides passed here are small by contract.
    val files = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (files >= t) df else df.repartition(t)
  }
}
