package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    if (args.contains("__q33")) {
      import org.apache.spark.sql.functions._
      import graft.core.KnnParams
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val train = e.filter(col("vec_id") % 2 === 0).select(
        col("vec_id").as("train_id"),
        col("embedding").cast("array<double>").as("train_series"), col("label"))
      val test = e.filter(col("vec_id") % 2 === 1).select(
        col("vec_id").as("test_id"),
        col("embedding").cast("array<double>").as("test_series"))
      val exact = graft.operators.Knn.classify(train, test,
        KnnParams(k = 5, distance = "manhattan"))
        .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
      for (coarsen <- Seq(1, 2, 4); factor <- Seq(24, 48, 96)) {
        val pruned = graft.operators.Knn.classify(train, test,
          KnnParams(k = 5, distance = "dtw", band = 0, lbPruning = true,
            pruneRanker = "paa", coarsenFactor = coarsen, candidateFactor = factor))
          .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
        val diff = exact.keys.count(k => exact(k) != pruned(k))
        println(s"[q33] coarsen=$coarsen factor=$factor mismatched=$diff/${exact.size}")
      }
      // q25 reworked: pruned banded DTW k=5 on HAR-shaped series
      def synthH(n: Int, offset: Int, idCol: String, seriesCol: String) =
        spark.range(n).select(
          (col("id") + offset).as(idCol),
          pmod(col("id") + offset, lit(6)).cast("double").as("label"),
          call_function("graft_har_series", col("id") + offset, lit(561)).as(seriesCol))
      val trainH = synthH(735, 0, "train_id", "train_series").localCheckpoint()
      val testH = synthH(294, 1000000, "test_id", "test_series")
        .select(col("test_id"), col("test_series")).localCheckpoint()
      val exactH = graft.operators.Knn.classify(trainH, testH,
        KnnParams(k = 5, distance = "dtw", band = 8))
        .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
      val truthOk = exactH.count { case (id, p) => p.toDouble == (id % 6).toDouble }
      println(s"[q25h] exact k=5 band=8: truth-match $truthOk/${exactH.size}")
      for ((ranker, coarsen, factor) <- Seq(
        ("paa", 8, 8), ("paa", 8, 16), ("paa_dtw", 8, 8), ("lb_keogh", 1, 8))) {
        val pruned = graft.operators.Knn.classify(trainH, testH,
          KnnParams(k = 5, distance = "dtw", band = 8, lbPruning = true,
            pruneRanker = ranker, coarsenFactor = coarsen, candidateFactor = factor))
          .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
        val diff = exactH.keys.count(k => exactH(k) != pruned(k))
        println(s"[q25h] ranker=$ranker coarsen=$coarsen factor=$factor mismatched=$diff/${exactH.size}")
      }
      spark.stop(); return
    }
    if (args.contains("__lsh")) {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val brute = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 2, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      println(s"[lsh] brute pairs=${brute.size} minJ=${if (brute.nonEmpty) brute.values.min else -1}")
      for ((nh, nb) <- Seq((128, 64), (96, 48), (64, 32), (128, 32))) {
        val t0 = System.nanoTime()
        val lsh = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
          shingleSize = 2, numHashes = nh, numBands = nb, threshold = 0.3, roundDp = 6)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[lsh] nh=$nh nb=$nb pairs=${lsh.size} equal=${lsh == brute} $sec%.2fs")
      }
      spark.stop(); return
    }
    if (args.contains("__check26")) {
      // Does the LB_Keogh cascade stay EXACT on the q26 workload?
      // band=56 with a ~57-sample signal period makes the envelope span
      // the whole amplitude range, so lb may be ~0 for every pair and
      // candidate selection collapses to the tie-break.
      import org.apache.spark.sql.functions._
      import graft.functions.{SeriesFunctions => SF}
      import graft.core.KnnParams
      val L = 561
      def synth(n: Int, offset: Int, idCol: String, seriesCol: String) =
        spark.range(n).select(
          (col("id") + offset).as(idCol),
          pmod(col("id") + offset, lit(6)).cast("double").as("label"),
          transform(sequence(lit(0), lit(L - 1)),
            t => sin(t.cast("double") * 0.11 +
              pmod(col("id") + offset, lit(6)).cast("double")) +
              (pmod(xxhash64(col("id") + offset, t), lit(1000)).cast("double")
                / 1000.0 - 0.5) * 0.4).as(seriesCol))
      val train = synth(500, 0, "train_id", "train_series").localCheckpoint()
      val test = synth(200, 1000000, "test_id", "test_series")
        .select(col("test_id"), col("test_series")).localCheckpoint()
      // lb distribution
      val env = test.withColumn("env", SF.barrier(SF.envelope(col("test_series"), 56)))
      val lb = env.crossJoin(broadcast(train))
        .select(SF.lbKeogh(col("env"), col("train_series")).as("lb"))
      lb.agg(min("lb"), max("lb"), avg("lb"),
        avg(when(col("lb") === 0.0, 1.0).otherwise(0.0)).as("frac_zero")).show(false)
      val exact = graft.operators.Knn.classify1NN(train, test,
        KnnParams(distance = "dtw", band = 56))
        .select(col("test_id"), col("predicted_label").as("p_exact"))
        .localCheckpoint()
      val pruned = graft.operators.Knn.classify1NN(train, test,
        KnnParams(distance = "dtw", band = 56, lbPruning = true, candidateFactor = 8))
        .select(col("test_id"), col("predicted_label").as("p_pruned"))
      val cmp = exact.join(pruned, "test_id")
      val total = cmp.count()
      val diff = cmp.filter(col("p_exact") =!= col("p_pruned")).count()
      println(s"[check26] lb_keogh f=8: total=$total mismatched=$diff")
      // candidate-ranker shootout: rank all pairs by a cheap proxy, keep
      // F per test, exact banded DTW on survivors, compare vs exact-all
      import spark.implicits._
      def rankerCheck(name: String, scoreF: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column, f: Int): Unit = {
        val slim = test.crossJoin(broadcast(train))
          .select(col("test_id"), col("train_id"),
            scoreF(col("test_series"), col("train_series")).as("s"))
          .as[(Long, Long, Double)]
        val agg = new graft.operators.BoundedTopKByScore(f)
        val surv = slim.groupByKey(_._1).agg(agg.toColumn)
          .flatMap { case (tid, ids) => ids.map(tid -> _) }.toDF("test_id", "train_id")
        val nn = surv.join(test, "test_id").join(broadcast(train), "train_id")
          .withColumn("dist", SF.barrier(SF.dtw(col("test_series"), col("train_series"), 56)))
          .filter(col("dist") =!= 0.0)
          .groupBy(col("test_id"))
          .agg(min_by(col("label"), struct(col("dist"), col("train_id"))).as("p_pruned"))
        val c = exact.join(nn, "test_id")
        val d = c.filter(col("p_exact") =!= col("p_pruned")).count()
        println(s"[check26] $name f=$f: mismatched=$d / ${c.count()}")
      }
      val pf = 8
      rankerCheck("manhattan_paa8", (a, b) =>
        SF.manhattan(SF.paa(a, pf), SF.paa(b, pf)), 8)
      rankerCheck("manhattan_paa8", (a, b) =>
        SF.manhattan(SF.paa(a, pf), SF.paa(b, pf)), 32)
      rankerCheck("dtw_paa8_band8", (a, b) =>
        SF.dtw(SF.paa(a, pf), SF.paa(b, pf), 8), 8)
      rankerCheck("dtw_paa8_band8", (a, b) =>
        SF.dtw(SF.paa(a, pf), SF.paa(b, pf), 8), 32)
      spark.stop(); return
    }
    if (args.contains("__probe26b")) {
      import org.apache.spark.sql.functions._
      import graft.functions.{SeriesFunctions => SF}
      import spark.implicits._
      var t0 = System.nanoTime()
      def synth(n: Int, offset: Int, idCol: String, seriesCol: String) =
        spark.range(n).select(
          (col("id") + offset).as(idCol),
          pmod(col("id") + offset, lit(6)).cast("double").as("label"),
          call_function("graft_har_series", col("id") + offset, lit(561)).as(seriesCol))
      val train = synth(7352, 0, "train_id", "train_series").localCheckpoint()
      val test = synth(2947, 1000000, "test_id", "test_series")
        .select(col("test_id"), col("test_series")).localCheckpoint()
      println(s"[p26b] native synth+checkpoint: ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val testSk = graft.operators.Partitioning.spread(test)
        .withColumn("sk", SF.barrier(SF.paa(col("test_series"), 8)))
        .select(col("test_id"), col("sk"))
      val trainSk = train
        .withColumn("tsk", SF.barrier(SF.paa(col("train_series"), 8)))
        .select(col("train_id"), col("tsk"))
      val sampled = train.filter(pmod(xxhash64(col("train_id")), lit(16)) === 0)
        .withColumn("tsk", SF.barrier(SF.paa(col("train_series"), 8)))
        .select(col("train_id"), col("tsk"))
      val tau = testSk.crossJoin(broadcast(sampled))
        .select(col("test_id"), SF.barrier(SF.manhattan(col("sk"), col("tsk"))).as("score"))
        .groupBy(col("test_id"))
        .agg(sort_array(collect_list(col("score"))).as("ss"))
        .select(col("test_id"), coalesce(get(col("ss"), lit(15)), lit(Double.MaxValue)).as("tau"))
      val testTau = testSk.join(broadcast(tau), Seq("test_id"), "left")
      val slim = testTau.crossJoin(broadcast(trainSk))
        .select(col("test_id"), col("train_id"),
          SF.barrier(SF.manhattan(col("sk"), col("tsk"))).as("score"), col("tau"))
        .filter(col("score") <= coalesce(col("tau"), lit(Double.MaxValue)))
        .select("test_id", "train_id", "score")
      println(s"[p26b] fused filtered count: ${slim.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val agg = new graft.operators.BoundedTopKByScore(16)
      val surv = slim.as[(Long, Long, Double)].groupByKey(_._1).agg(agg.toColumn)
        .flatMap { case (tid, ids) => ids.map(tid -> _) }.toDF("test_id", "train_id")
      println(s"[p26b] fused+heap: ${surv.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val surv2 = surv.localCheckpoint()
      println(s"[p26b] surv checkpoint: ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val withDist = surv2
        .join(test, "test_id")
        .join(broadcast(train), "train_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("dist", SF.barrier(SF.dtw(col("test_series"), col("train_series"), 56)))
        .filter(col("dist") =!= 0.0)
        .groupBy(col("test_id"))
        .agg(min_by(col("label"), struct(col("dist"), col("train_id"))).as("p"))
      println(s"[p26b] exact phase: ${withDist.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val pred = graft.operators.Knn.classify1NN(train, test,
        graft.core.KnnParams(distance = "dtw", band = 56, lbPruning = true,
          candidateFactor = 16, coarsenFactor = 8))
      pred.write.format("noop").mode("overwrite").save()
      println(s"[p26b] classify1NN on materialized inputs: ${(System.nanoTime()-t0)/1e9}s")
      spark.stop(); return
    }
    if (args.contains("__probe26")) {
      import org.apache.spark.sql.functions._
      import graft.functions.{SeriesFunctions => SF}
      import org.apache.spark.sql.expressions.Window
      val L = 561
      def synth(n: Int, offset: Int, idCol: String, seriesCol: String) =
        spark.range(n).select(
          (col("id") + offset).as(idCol),
          pmod(col("id") + offset, lit(6)).cast("double").as("label"),
          transform(sequence(lit(0), lit(L - 1)),
            t => sin(t.cast("double") * 0.11 +
              pmod(col("id") + offset, lit(6)).cast("double")) +
              (pmod(xxhash64(col("id") + offset, t), lit(1000)).cast("double")
                / 1000.0 - 0.5) * 0.4).as(seriesCol))
      var t0s = System.nanoTime()
      val train = synth(7352, 0, "train_id", "train_series").localCheckpoint()
      val test = synth(2947, 1000000, "test_id", "test_series")
        .select(col("test_id"), col("test_series")).localCheckpoint()
      println(s"[p26] synth+checkpoint: ${(System.nanoTime()-t0s)/1e9}s")
      val testSk = graft.operators.Partitioning.spread(test)
        .withColumn("sk", SF.barrier(SF.paa(col("test_series"), 8)))
        .select(col("test_id"), col("sk"))
      val trainSk = train
        .withColumn("tsk", SF.barrier(SF.paa(col("train_series"), 8)))
        .select(col("train_id"), col("tsk"))
      val slim = testSk.crossJoin(broadcast(trainSk))
        .select(col("test_id"), col("train_id"),
          SF.manhattan(col("sk"), col("tsk")).as("score"))
      var t0 = System.nanoTime()
      println(s"[p26] score-only count: ${slim.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      println(s"[p26] score agg-min: ${slim.groupBy("test_id").agg(min("score")).count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      import spark.implicits._
      val agg = new graft.operators.BoundedTopKByScore(16)
      val surv = slim.as[(Long, Long, Double)].groupByKey(_._1).agg(agg.toColumn)
        .flatMap { case (tid, ids) => ids.map(tid -> _) }.toDF("test_id", "train_id")
      println(s"[p26] score+heapagg: ${surv.count()} in ${(System.nanoTime()-t0)/1e9}s")
      // prefilter stages
      t0 = System.nanoTime()
      val sampled = train.filter(pmod(xxhash64(col("train_id")), lit(16)) === 0)
        .withColumn("tsk", SF.barrier(SF.paa(col("train_series"), 8)))
        .select(col("train_id"), col("tsk"))
      val tau = testSk.crossJoin(broadcast(sampled))
        .select(col("test_id"), SF.manhattan(col("sk"), col("tsk")).as("score"))
        .groupBy(col("test_id"))
        .agg(sort_array(collect_list(col("score"))).as("ss"))
        .select(col("test_id"), coalesce(get(col("ss"), lit(15)), lit(Double.MaxValue)).as("tau"))
      println(s"[p26] tau pass: ${tau.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val slimB = testSk.crossJoin(broadcast(trainSk))
        .select(col("test_id"), col("train_id"),
          SF.barrier(SF.manhattan(col("sk"), col("tsk"))).as("score"))
      val filtered = slimB.join(broadcast(tau), Seq("test_id"), "left")
        .filter(col("score") <= coalesce(col("tau"), lit(Double.MaxValue)))
        .select("test_id", "train_id", "score")
      println(s"[p26] filtered count: ${filtered.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val surv2 = filtered.as[(Long, Long, Double)].groupByKey(_._1).agg(agg.toColumn)
        .flatMap { case (tid, ids) => ids.map(tid -> _) }.toDF("test_id", "train_id")
      println(s"[p26] filtered+heapagg: ${surv2.count()} in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val full = SparkEntry.queries("q26_har_model2_1nn")(spark, "/root/testdata/sf0.1")
      full.write.format("noop").mode("overwrite").save()
      println(s"[p26] full: ${(System.nanoTime()-t0)/1e9}s")
      spark.stop(); return
    }
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
    if (args.contains("__q37")) {
      // round-11 directive #5: decompose q37's 2.5 s — is it the
      // VectorAssembler transform (ML row overhead), the norm kernel,
      // the global orderBy, or the scan? Median of 3 after one warmup,
      // noop-forced, at the bench tier.
      import org.apache.spark.sql.functions._
      import org.apache.spark.ml.feature.VectorAssembler
      import org.apache.spark.ml.functions.vector_to_array
      import org.apache.spark.sql.DataFrame
      def li = graft.sources.EventTime.nanos(
        spark.read.parquet(s"$dir/lineitem.parquet"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double"), col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"), col("l_tax").cast("double"))
      def assembled = new VectorAssembler()
        .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .setOutputCol("features").transform(li)
      def normOf(arr: org.apache.spark.sql.Column) =
        round(sqrt(graft.functions.SeriesFunctions.dotProduct(arr, arr)), 6).as("norm")
      val variants: Seq[(String, () => DataFrame)] = Seq(
        "scan+project only" -> (() => li),
        "assembler only" -> (() => assembled.select(col("l_orderkey"), col("features"))),
        "full q37 (assembler+norm+sort)" -> (() =>
          assembled.select(col("l_orderkey"), col("l_linenumber"),
            normOf(vector_to_array(col("features")).cast("array<double>")))
            .orderBy("l_orderkey", "l_linenumber")),
        "q37 minus sort" -> (() =>
          assembled.select(col("l_orderkey"), col("l_linenumber"),
            normOf(vector_to_array(col("features")).cast("array<double>")))),
        "array path (no ML) + sort" -> (() =>
          li.select(col("l_orderkey"), col("l_linenumber"),
            normOf(array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax"))))
            .orderBy("l_orderkey", "l_linenumber")))
      variants.foreach { case (name, build) =>
        val times = (0 to 3).map { _ =>
          val t0 = System.nanoTime()
          build().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.drop(1).sorted
        println(f"[q37] $name%-32s median=${times(1)}%.2fs (${times.mkString("/").take(40)})")
      }
    }
    for (name <- args.drop(1) if !name.startsWith("__")) {
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
