package graft

import graft.operators.Partitioning
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin matches plain join results under heavy key skew") {
    // 10k rows on one hot key + a long tail
    val left = spark.range(0, 10000).select(
      when($"id" < 9000, lit(1L)).otherwise($"id" % 50).as("k"),
      $"id".as("payload"))
    val right = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Partitioning.saltedJoin(left, right, "k", salt = 8)
      .groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin left join keeps unmatched left rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = Partitioning.saltedJoin(left, right, "k", salt = 4, "left")
      .collect()
    assert(out.length === 3)
    assert(out.count(_.isNullAt(2)) === 1)
  }

  test("saltedJoin rejects right/full outer join types loudly") {
    // an unmatched right row would be null-extended once per unmatched
    // replica (up to `salt` duplicates) — the construction cannot
    // preserve right-rooted semantics, so it must say so, not return
    // silently wrong multiplicities
    val left = Seq((1L, "a")).toDF("k", "v")
    val right = Seq((2L, "x")).toDF("k", "w")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Partitioning.saltedJoin(left, right, "k", salt = 4, jt)
      }
      assert(e.getMessage.contains("duplicates per"), s"$jt: ${e.getMessage}")
    }
    // the left-rooted family stays accepted under its aliases
    for (jt <- Seq("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"))
      Partitioning.saltedJoin(left, right, "k", salt = 2, jt)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    val whBase = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      .stripPrefix("file:")
    Seq("orders_b", "customer_b").foreach { t =>
      val p = java.nio.file.Paths.get(whBase, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    Partitioning.writeBucketed(
      orders.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      "orders_b", Seq("o_custkey"), 4)
    Partitioning.writeBucketed(
      customer.select($"c_custkey".as("o_custkey"), $"c_name"),
      "customer_b", Seq("o_custkey"), 4)
    // r21: the pre-write cluster-by-bucket-key repartition bounds the
    // file count at exactly `buckets` — an unclustered bucketed write
    // emits one file per (task x bucket), i.e. 8N files at scale (guide
    // §6 small-files hazard)
    Seq("orders_b", "customer_b").foreach { t =>
      val files = java.nio.file.Files.list(
        java.nio.file.Paths.get(whBase, t)).iterator()
      import scala.jdk.CollectionConverters._
      val dataFiles = files.asScala.count(_.getFileName.toString.startsWith("part-"))
      assert(dataFiles === 4,
        s"$t: expected exactly 4 bucket files (one per bucket), got $dataFiles")
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so bucketing (not broadcast) is what
      // eliminates the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() === orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("zorder2: known bit interleavings") {
    import spark.implicits._
    val df = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L))
      .toDF("x", "y")
      .select(graft.operators.Partitioning.zorder2(col("x"), col("y"), 8).as("z"))
    // x bits land at even positions, y bits at odd ones
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(7L, 0L, 21845L, 43690L, 65535L))
  }

  test("zorder2: within one x, z is monotonic in y (locality sanity)") {
    import spark.implicits._
    val df = (0L until 16L).map(y => (5L, y)).toDF("x", "y")
      .select(col("y"),
        graft.operators.Partitioning.zorder2(col("x"), col("y"), 4).as("z"))
      .orderBy("y")
    val zs = df.collect().map(_.getLong(1))
    assert(zs.sliding(2).forall(p => p(0) < p(1)))
  }
}
