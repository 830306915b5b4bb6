package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the materialized-runtime-filter shape.
  *
  * A plain `LEFT SEMI` join of a 100 TB probe table against a large
  * build side shuffles the ENTIRE probe side on the join key. When the
  * build side's key set is too big to broadcast as an in-list but its
  * bloom fingerprint (KBs–MBs for millions of keys) is not, the right
  * plan is: aggregate a bloom filter over the build keys (one
  * distributed pass, partial + final merge), ship the single binary to
  * every probe task, and drop definite-non-members AT THE SCAN — only
  * the surviving sliver shuffles into the exact semi join that removes
  * the bloom's false positives.
  *
  * Exactness: a bloom filter has no false negatives, so the prefilter
  * keeps every true match; the residual equi semi join removes the false
  * positives — output is bit-for-bit the plain semi join (the DuckDB
  * EXISTS oracle checks this end to end). Spark's own
  * InjectRuntimeFilter applies the same idea automatically when stats
  * line up; this operator is the explicit, always-on form with the
  * filter materialized driver-side (one binary scalar collect — bounded,
  * like a coarse-quantizer fit) so the probe-side predicate is a
  * foldable literal that reaches the scan.
  */
object BloomJoin {

  /** `probe ⋉ build` on `probeKey = buildKey` (long keys), bloom-pruned.
    *
    * @param expectedItems sizing hint for the filter (distinct build
    *                      keys); ~10 bits/item ≈ 1% false positives
    */
  def semiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val spark = probe.sparkSession
    GraftFunctions.register(spark)
    // clamp to the session's bloom budget: beyond it BloomFilterAggregate
    // clamps internally anyway, so make the sizing explicit — a build
    // side past ~maxNumBits/10 items degrades the ~1% fpp (more residual
    // join work, never wrong results: no false negatives either way)
    val maxNumBits =
      try spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
      catch { case _: NumberFormatException => 67108864L }
    val numBits = math.min(maxNumBits, math.max(64L, expectedItems * 10L))
    val bloomRow = build
      .agg(call_function("graft_bloom_agg",
        col(buildKey), lit(expectedItems), lit(numBits)).as("bf"))
      .head()
    val bytes =
      if (bloomRow.isNullAt(0)) null else bloomRow.getAs[Array[Byte]](0)
    if (bytes == null) {
      // empty build side: the semi join is empty; skip the probe scan
      probe.limit(0)
    } else {
      probe
        .filter(call_function("graft_might_contain",
          lit(bytes), col(probeKey)))
        .join(build.select(col(buildKey).as(probeKey)),
          Seq(probeKey), "left_semi")
    }
  }
}
