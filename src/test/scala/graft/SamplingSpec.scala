package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hexThreshold maps rates to 4-hex boundaries, 1.0 above every digest") {
    assert(Sampling.hexThreshold(0.0) === "0000")
    assert(Sampling.hexThreshold(0.25) === "4000")
    assert(Sampling.hexThreshold(0.5) === "8000")
    assert(Sampling.hexThreshold(1.0) === "zzzz")
    assert("ffff" < Sampling.hexThreshold(1.0)) // lexicographic keep-all
  }

  test("hash sample is deterministic and partitioning-invariant") {
    val df = spark.range(5000).select(col("id"))
    val a = Sampling.hashSample(df, "id", 0.3).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(df.repartition(7), "id", 0.3)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("uniform rate lands near the target fraction") {
    val df = spark.range(20000).select(col("id"))
    val kept = Sampling.hashSample(df, "id", 0.25).count().toDouble / 20000
    assert(kept > 0.22 && kept < 0.28, s"kept fraction $kept")
  }

  test("rate 0 drops everything, rate 1 keeps everything") {
    val df = spark.range(1000).select(col("id"))
    assert(Sampling.hashSample(df, "id", 0.0).count() === 0)
    assert(Sampling.hashSample(df, "id", 1.0).count() === 1000)
  }

  test("stratified sample honors per-stratum rates and drops unmatched strata") {
    val df = spark.range(30000)
      .select(col("id"),
        element_at(array(lit("a"), lit("b"), lit("c")),
          (pmod(col("id"), lit(3)) + 1).cast("int")).as("s"))
    val out = Sampling.stratifiedHashSample(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.1))
    val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("c"))
    assert(math.abs(counts("a") / 10000.0 - 0.5) < 0.03)
    assert(math.abs(counts("b") / 10000.0 - 0.1) < 0.03)
    // stratum at rate 1.0 keeps every row ("10000" literal would not)
    val all = Sampling.stratifiedHashSample(df, "id", "s", Map("a" -> 1.0))
    assert(all.count() === 10000)
  }
}
