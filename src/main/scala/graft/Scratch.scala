package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    if (args.contains("__probe")) {
      import org.apache.spark.sql.functions._
      import graft.functions.{SeriesFunctions, TextFunctions}
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      def hs(c: org.apache.spark.sql.Column) =
        sort_array(array_distinct(transform(
          array_distinct(TextFunctions.wordShingles(c, 2)), t => xxhash64(t))))
      var t0 = System.nanoTime()
      val docs = docs0.select(col("doc_id").as("id"), hs(col("text")).as("sh")).cache()
      println(s"[probe] shingle+hash materialize: ${docs.count()} rows, ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val a = docs.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = docs.select(col("id").as("id_b"), col("sh").as("sh_b"))
      val pairs = a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(SeriesFunctions.jaccardSorted(col("sh_a"), col("sh_b")), 6).as("j"))
        .filter(col("j") >= 0.3)
      println(s"[probe] pair jaccard on cached: ${pairs.count()} pairs, ${(System.nanoTime()-t0)/1e9}s")
      pairs.explain("formatted")
      spark.stop(); return
    }
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan // forces analysis+optimization+planning
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[scratch] $name plan=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
