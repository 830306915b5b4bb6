package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared partitioning helpers for pair-generating operators. */
private[operators] object Partitioning {

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
    if (df.rdd.getNumPartitions < t) df.repartition(t) else df
  }
}
