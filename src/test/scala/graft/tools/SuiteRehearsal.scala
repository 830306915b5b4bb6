package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-SUITE 10x scale rehearsal (round-9 directive #2): every
  * individual operator family has a 10x-600x rehearsal, but the 82-query
  * suite as a whole had never run above sf0.1 — AQE decisions (broadcast
  * thresholds, skew splits, `Partitioning.spread`'s stats paths) can flip
  * at 10x and nothing checked that every plan survives the flip.
  *
  * What it does:
  *   1. synthesizes a 10x tier at /tmp/graft_suite10x/sf0.1x10 (10
  *      id-shifted copies of every sf0.1 table; shift units are multiples
  *      of 10^6 so every `% 10` / `% 50` query split is preserved; nation
  *      and region stay fixed — they are fixed-size dimensions at every
  *      TPC-H scale). The dir name deliberately contains "sf0.1" so
  *      harSynth keeps the FULL published HAR size — the cascade already
  *      has its own dedicated 10x rehearsal (`ScaleRehearsal har`).
  *   2. runs every SparkEntry query once at sf0.1 and once at the 10x
  *      tier through the ADAPTIVE executor (qe.toRdd consumed, so AQE
  *      re-plans with real runtime stats), captures the final executed
  *      plan's operator histogram, and prints a per-query diff of the
  *      decisions that changed.
  *
  * Reading the output: a broadcast->sortmerge flip on a side that grew
  * 10x is AQE degrading CORRECTLY (that side would not fit at 100 TB
  * either); what must NOT appear is a new CartesianProduct, a broadcast
  * of something that grew past the threshold, or a query that fails
  * outright at 10x.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "Test/runMain graft.tools.SuiteRehearsal"
  * Optional args: query-name prefixes to subset (e.g. q20 q65);
  * `--json PATH` additionally writes the per-query machine-readable
  * rehearsal record (timings, plan-shape diff, failures) that
  * `tools/scalecheck.py` merges with the 10x Verify+DuckDB gate into
  * the standing per-round `SCALECHECK_rN.json` artifact (round-9
  * directive #2: the rehearsal ran once by hand; now it's an artifact
  * the next round's judge can diff like CORRECTNESS).
  */
object SuiteRehearsal {

  private val tier01 = "/root/testdata/sf0.1"
  private val tier10 = "/tmp/graft_suite10x/sf0.1x10"

  private def timedSec[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** `reps` id-shifted copies of each scalable table. Shifts are
    * multiples of 10^6 (orderkeys 10^7) so modulus-based query splits
    * (% 10, % 50, % 100) land identically on every copy, and foreign
    * keys shift in lockstep so join fan-outs scale linearly (N x rows,
    * same per-key match counts) rather than quadratically.
    *
    * `only` restricts which tables are written (ScaleRehearsal's
    * tier100 linearity case synthesizes a 100x tier of just the tables
    * its linear-path queries read); None writes every table.
    */
  private def generate(spark: SparkSession): Unit =
    generateTier(spark, 10, tier10, None)

  private[tools] def generateTier(spark: SparkSession, nReps: Int,
      dest: String, only: Option[Set[String]]): Unit = {
    val src = tier01
    val reps = spark.range(nReps.toLong).select(col("id").as("rep"))
    def shifted(table: String, shifts: Map[String, Long]): DataFrame = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val cols = df.columns.map { c =>
        shifts.get(c) match {
          case Some(unit) => (col(c) + col("rep") * lit(unit)).as(c)
          case None => col(c)
        }
      }
      df.crossJoin(reps).select(cols.toIndexedSeq: _*)
    }
    val plans: Seq[(String, () => DataFrame)] = Seq(
      "region" -> (() => spark.read.parquet(s"$src/region.parquet")),
      "nation" -> (() => spark.read.parquet(s"$src/nation.parquet")),
      "customer" -> (() => shifted("customer", Map("c_custkey" -> 1000000L))),
      "supplier" -> (() => shifted("supplier", Map("s_suppkey" -> 1000000L))),
      "part" -> (() => shifted("part", Map("p_partkey" -> 1000000L))),
      "orders" -> (() => shifted("orders",
        Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))),
      "lineitem" -> (() => shifted("lineitem",
        Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
          "l_suppkey" -> 1000000L))),
      // user_id shifts -> 10x users with unchanged per-user history
      // (sessionize/window/gap-fill shapes scale in keys, not density);
      // ts passes through whatever encoding the source tier carries
      // (micros timestamp since round 10; consumers normalize to the
      // epoch-nanos-long contract via EventTime.nanos either way)
      "events" -> (() => shifted("events",
        Map("event_id" -> 10000000L, "user_id" -> 1000000L))),
      // text/embedding payloads stay — every doc gains 9 exact
      // duplicates, the duplicate-heavy shape dedup exists for
      "documents" -> (() => shifted("documents", Map("doc_id" -> 1000000L))),
      "embeddings" -> (() => shifted("embeddings", Map("vec_id" -> 1000000L))))
    plans.filter(p => only.forall(_.contains(p._1))).foreach { case (name, build) =>
      val (_, dt) = timedSec {
        // testdata contract: each table is ONE parquet FILE (consumers
        // like StreamingOracle.stageStream Files.copy it); write to a
        // temp dir and move the single part file into place
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_gen_$name")
        build().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = {
          val walk = java.nio.file.Files.list(tmp)
          try walk.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally walk.close()
        }
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest))
        java.nio.file.Files.move(part,
          java.nio.file.Paths.get(s"$dest/$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val walk2 = java.nio.file.Files.walk(tmp)
        try walk2.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        finally walk2.close()
      }
      println(f"[suite10x] generated $name ($dt%.1f s)")
    }
  }

  /** Operator histogram of a FINAL (post-AQE) plan. Query stages unwrap
    * to their materialized subtree; the stage wrapper itself is not
    * counted (its inner exchange is).
    */
  private[tools] def shape(root: SparkPlan): Map[String, Int] = {
    val buf = scala.collection.mutable.Map.empty[String, Int]
    val tracked = Set(
      "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct",
      "ShuffleExchange", "BroadcastExchange", "ReusedExchange",
      "WholeStageCodegen", "HashAggregate", "ObjectHashAggregate",
      "SortAggregate", "Window", "WindowGroupLimit", "Expand", "Generate")
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ =>
        val raw = p.getClass.getSimpleName.stripSuffix("Exec")
        val name = if (raw.startsWith("WholeStageCodegen")) "WholeStageCodegen" else raw
        if (tracked(name)) buf(name) = buf.getOrElse(name, 0) + 1
        p.children.foreach(walk)
    }
    walk(root)
    buf.toMap
  }

  /** Build the query and execute it through its OWN QueryExecution (so
    * the adaptive plan we inspect is the one that ran); returns
    * (shape, seconds). Construction is timed too: the streaming queries
    * run their bounded replay eagerly inside the builder, and that IS
    * their workload (the returned frame is the drained sink).
    */
  private[tools] def runOnce(
      build: => DataFrame, explain: Boolean = false): (Map[String, Int], Double) = {
    val (qe, dt) = timedSec {
      val df = build
      val qe = df.queryExecution
      val rdd = qe.toRdd
      df.sparkSession.sparkContext.runJob(rdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
        })
      qe
    }
    if (explain) println(qe.executedPlan.toString)
    (shape(qe.executedPlan), dt)
  }

  private[tools] def fmt(m: Map[String, Int]): String =
    m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" ")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    if (!new java.io.File(s"$tier10/embeddings.parquet").exists())
      generate(spark)
    else println(s"[suite10x] reusing existing $tier10")

    // --explain: print each selected query's FINAL executed plan tree per
    // tier (flip auditing)
    val explain = args.contains("--explain")
    val jsonOut = args.toSeq.sliding(2).collectFirst {
      case Seq("--json", p) => p
    }
    val only = args.toSeq.filterNot(_.startsWith("--"))
      .filterNot(p => jsonOut.contains(p)).filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.isEmpty || only.exists(n.startsWith)
    }
    // input warmup for both tiers (synthesis is setup, not workload —
    // same contract as Bench)
    SparkEntry.warmup(spark, tier01)
    SparkEntry.warmup(spark, tier10)

    var flips = 0
    var failures = 0
    val summary = scala.collection.mutable.ArrayBuffer.empty[String]
    val records = scala.collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      try {
        if (explain) println(s"[suite10x] ==== $name @ sf0.1 ====")
        val (s01, t01) = runOnce(fn(spark, tier01), explain)
        if (explain) println(s"[suite10x] ==== $name @ 10x ====")
        val (s10, t10) = runOnce(fn(spark, tier10), explain)
        val keys = (s01.keySet ++ s10.keySet).toSeq.sorted
        val diff = keys.flatMap { k =>
          val (a, b) = (s01.getOrElse(k, 0), s10.getOrElse(k, 0))
          if (a != b) Some(s"$k $a->$b") else None
        }
        val flag = if (diff.isEmpty) "SAME" else { flips += 1; "FLIP" }
        println(f"[suite10x] $name%-28s $t01%7.2f s -> $t10%7.2f s  $flag  ${diff.mkString(" ")}")
        if (diff.nonEmpty) {
          println(s"[suite10x]   sf0.1: ${fmt(s01)}")
          println(s"[suite10x]   10x  : ${fmt(s10)}")
          summary += s"$name: ${diff.mkString(" ")}"
        }
        val flipJson =
          if (diff.isEmpty) "null" else "\"" + diff.mkString(" ") + "\""
        // Locale.ROOT, not the f-interpolator: under a comma-decimal
        // default locale f"$t01%.2f" emits "2,52" — invalid JSON that
        // breaks tools/scalecheck.py's json.load.
        def num(d: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
        records += s"""  "$name": {"tenx_ran": true, "sf01_s": ${num(t01)}, "tenx_s": ${num(t10)}, "plan_flip": $flipJson}"""
      } catch {
        case e: Throwable =>
          failures += 1
          println(s"[suite10x] $name FAILED at 10x: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}")
          summary += s"$name: FAILED ${e.getClass.getSimpleName}"
          records += s"""  "$name": {"tenx_ran": false, "error": "${e.getClass.getSimpleName}"}"""
      }
    }
    println(s"[suite10x] === ${selected.size} queries, $flips plan flips, $failures failures ===")
    summary.foreach(s => println(s"[suite10x] FLIP $s"))
    jsonOut.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        records.mkString("{\n", ",\n", "\n}\n"))
      println(s"[suite10x] wrote $p")
    }
    spark.stop()
  }
}
