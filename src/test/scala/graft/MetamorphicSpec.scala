package graft

import org.apache.spark.sql.Row

/** Randomized metamorphic oracle fuzz (round-11 directive #4).
  *
  * BoundarySpec pins HAND-CHOSEN boundary fixtures; this spec hunts the
  * same bug class (oracle comparator vs engine semantics — the q42
  * `>=`-vs-`>` session-gap bug that survived 8 rounds) GENERATIVELY:
  * 100 seeded random event sets whose time deltas are concentrated on
  * every oracle inequality boundary (0 s ties, 300 s session gap /
  * tumbling-window edge, 600 s range-join edge, 1800 s interval-join
  * edge, each also probed ±1 nanosecond, plus sub-second edges at
  * x.999999999 and exact day-grid instants), with null bursts in
  * `value` and occasional null `event_type`.
  *
  * The combined set is staged as a real single-file events.parquet and
  * driven through the REAL gate surface — `SparkEntry.queries(name)` —
  * so the full path runs: parquet read, EventTime nanos normalization,
  * the operator itself, and for q67/q70/q71 the actual Structured
  * Streaming bounded replay. Results are compared against brute-force
  * Scala references computed here from the same generated rows —
  * independent of BOTH Spark and DuckDB (independence is the point: a
  * DuckDB-replayed reference could share a comparator misreading with
  * the oracle SQL).
  *
  * Seeds are fixed (0 until 100 from a constant base) so CI is
  * deterministic; any future disagreement should be minimized by seed
  * and pinned as a named BoundarySpec fixture.
  *
  * Value domain: multiples of 0.25 (exactly representable), so every
  * group sum is exact in double and mean/round comparisons are
  * order-free — the fuzz targets comparator semantics, not float
  * accumulation order (q67's 4 dp rounding contract covers that).
  */
/** Top-level (not nested in the suite): Spark's product encoder cannot
  * instantiate an inner class without its outer scope.
  */
private[graft] case class MetaEv(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: java.lang.Double, props: String)

class MetamorphicSpec extends SparkTestBase {
  import spark.implicits._

  private type Ev = MetaEv
  private def Ev(event_id: Long, ts: Long, user_id: Long, event_type: String,
      value: java.lang.Double, props: String): MetaEv =
    MetaEv(event_id, ts, user_id, event_type, value, props)

  private val SEEDS = 100

  /** Boundary-concentrated per-user time walk. Deltas in whole seconds
    * land EXACTLY on the oracle inequality constants; the ±1 ns and
    * .999999999 variants probe the integral nanos→seconds truncation
    * both engines must agree on.
    */
  private def genSeed(seed: Int): Vector[Ev] = {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 0xC0FFEEL + seed)
    val nUsers = 1 + rng.nextInt(3)
    val users = (0 until nUsers).map(u => seed.toLong * 10 + u)
    val n = 20 + rng.nextInt(41)
    val boundarySecs = Array(0L, 1L, 299L, 300L, 301L, 599L, 600L, 601L,
      1799L, 1800L, 1801L)
    val cur = scala.collection.mutable.Map(
      users.map(u => u -> (1700000000L + seed * 10000000L + rng.nextInt(100)) * 1000000000L): _*)
    var id = seed.toLong * 100000L
    var nullBurst = 0
    val out = Vector.newBuilder[Ev]
    (0 until n).foreach { _ =>
      val u = users(rng.nextInt(nUsers))
      val d = rng.nextInt(10) match {
        case 0 | 1 | 2 => boundarySecs(rng.nextInt(boundarySecs.length)) * 1000000000L
        case 3 => boundarySecs(rng.nextInt(boundarySecs.length)) * 1000000000L +
          (rng.nextInt(3) - 1) // boundary ±1 ns
        case 4 => 999999999L + rng.nextInt(3) // sub-second truncation edge
        case 5 => (43200L + rng.nextInt(200000)) * 1000000000L // multi-day jump (q62 grid)
        case 6 => 0L // exact (user, ts) tie
        case _ => rng.nextLong(4000L * 1000000000L)
      }
      val ts = if (rng.nextInt(20) == 0) {
        // snap forward onto an exact day-grid or 5-min-window instant
        val unit = if (rng.nextBoolean()) 86400000000000L else 300000000000L
        ((cur(u) + d + unit - 1) / unit) * unit
      } else cur(u) + d
      cur(u) = ts
      val types = Array("click", "view", "purchase", "error", "signup")
      val et = if (rng.nextInt(20) == 0) null else types(rng.nextInt(5))
      if (nullBurst == 0 && rng.nextInt(30) == 0) nullBurst = 2 + rng.nextInt(4)
      // null bursts hit EVERY event type, purchases included: the
      // streaming as-of and state operators carry nullable values
      // through their typed boundaries as Option (a null-valued
      // purchase still matches and blocks earlier ones — this corpus
      // is what gates that path; the driver corpus has no nulls)
      val v: java.lang.Double =
        if (nullBurst > 0) { nullBurst -= 1; null }
        else java.lang.Double.valueOf(rng.nextInt(2001) * 0.25)
      out += Ev(id, ts, u, et, v, "")
      id += 1
    }
    out.result()
  }

  private lazy val events: Vector[Ev] = (0 until SEEDS).flatMap(genSeed).toVector

  /** The combined set staged exactly like driver testdata: ONE parquet
    * file named events.parquet (StreamingOracle.stageStream Files.copy's
    * that exact path), ts as int64 epoch-nanos — one of the physical
    * encodings EventTime.nanos owns.
    */
  private def stageEvents(evs: Vector[Ev]): String =
    FuzzStage.stage("graft_metamorphic", "events" -> evs.toDF())

  private lazy val fuzzDir: String = stageEvents(events)
  private lazy val permDir: String =
    stageEvents(new scala.util.Random(FuzzStage.seedOffset + 20260814L).shuffle(events))

  private def run(name: String, dir: String = null): Array[Row] =
    SparkEntry.queries(name)(spark, if (dir == null) fuzzDir else dir).collect()

  private def sec(ns: Long): Long = Math.floorDiv(ns, 1000000000L)

  /** Spark round(col, n) semantics: shortest-decimal BigDecimal, HALF_UP. */
  private def roundN(d: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  private def seedOf(user: Long) = s"seed ${user / 10}"

  private def assertRows[T](name: String, got: Seq[T], want: Seq[T]): Unit = {
    val g = got.toSet
    val w = want.toSet
    val extra = (g -- w).take(5)
    val missing = (w -- g).take(5)
    assert(g == w,
      s"$name disagreed with brute reference: engine-only=$extra brute-only=$missing")
    assert(got.size == want.size, // same set but multiplicity drift
      s"$name row-count drift: engine=${got.size} brute=${want.size}")
  }

  // ---- generator adequacy: a fuzz that never lands on a boundary would
  //      pass vacuously; pin that the corpus actually contains the cases
  //      each comparator is being probed with ----
  test("fuzz generator: the corpus exercises every probed boundary") {
    val byUser = events.groupBy(_.user_id).view.mapValues(_.sortBy(_.ts))
    def gapCount(p: (Long, Long) => Boolean): Int = byUser.values.map(evs =>
      evs.zip(evs.tail).count { case (a, b) => p(a.ts, b.ts) }).sum
    val secGap300 = gapCount((a, b) => sec(b) - sec(a) == 300L)
    val ties = gapCount((a, b) => a == b)
    val nsGap600 = gapCount((a, b) => b - a == 600000000000L)
    val secGap1800 = gapCount((a, b) => sec(b) - sec(a) == 1800L)
    val subSecEdge = events.count(e => e.ts % 1000000000L == 999999999L)
    val onDayGrid = events.count(e => e.ts % 86400000000000L == 0L)
    val nullValues = events.count(_.value == null)
    val nullTypes = events.count(_.event_type == null)
    val nullPurchases = events.count(e =>
      e.event_type == "purchase" && e.value == null)
    val counts = Map("gap==300s" -> secGap300, "(user,ts) ties" -> ties,
      "gap==600e9ns" -> nsGap600, "gap==1800s" -> secGap1800,
      ".999999999 edges" -> subSecEdge, "on-day-grid ts" -> onDayGrid,
      "null values" -> nullValues, "null event_types" -> nullTypes,
      "null purchase values" -> nullPurchases)
    info(counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    counts.foreach { case (k, v) =>
      assert(v > 0, s"generator never produced '$k' — the fuzz is vacuous there")
    }
    // and the references must have real work on both branches:
    val clicks = events.count(_.event_type == "click")
    assert(clicks > 100 && events.size > 2000,
      s"corpus too thin: ${events.size} events, $clicks clicks")
  }

  // ---- q42: session_window sessionization (merge at EXACTLY the gap) ----
  test("fuzz q42: sessionize agrees with brute gaps-and-islands over 100 seeds") {
    val brute = events.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val secs = evs.map(e => sec(e.ts)).sorted
      val sessions = secs.tail.foldLeft(Vector(Vector(secs.head))) { (acc, s) =>
        if (s - acc.last.last > 300L) acc :+ Vector(s)
        else acc.init :+ (acc.last :+ s)
      }
      sessions.map(ss => (u, ss.head, ss.size.toLong))
    }
    val got = run("q42_sessionize").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assertRows("q42", got, brute)
  }

  // ---- q47: backward as-of join (r.ts <= l.ts, ties -> greatest id) ----
  test("fuzz q47: as-of join agrees with brute latest-preceding over 100 seeds") {
    val views = events.filter(_.event_type == "view")
    val byUser = views.groupBy(_.user_id)
    val brute = events.filter(_.event_type == "click").map { c =>
      val cand = byUser.getOrElse(c.user_id, Vector.empty)
        .filter(_.ts <= c.ts)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(v => (v.ts, v.event_id)))
      (c.event_id, c.user_id, best.map(_.event_id),
        best.flatMap(v => Option(v.value).map(_.doubleValue)))
    }
    val got = run("q47_asof_join").map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    assertRows("q47", got, brute)
  }

  // ---- as-of VARIANTS: the gate (q47) covers backward/inclusive/
  //      unbounded only; this pins the OTHER seven API combinations
  //      (forward x strict x tolerance) against brute picks, including
  //      the two non-obvious contracts: ties at identical (key, ts)
  //      break by the (ts, event_id, value) payload struct — GREATEST
  //      wins backward, SMALLEST forward — and tolerance is POST-pick
  //      (the nearest match is NULLED when out of range, never replaced
  //      by a farther within-range candidate). The corpus's planted
  //      exact ties and 600 s gaps land on every boundary. ----
  test("fuzz as-of variants: forward/strict/tolerance agree with brute picks") {
    import graft.operators.AsofJoin
    import org.apache.spark.sql.functions.col
    val evDf = graft.sources.EventTime.nanos(
      spark.read.parquet(s"$fuzzDir/events.parquet"))
    val leftDf = evDf.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val rightDf = evDf.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id", "value")
    val clicks = events.filter(_.event_type == "click")
    val viewsByUser = events.filter(_.event_type == "view").groupBy(_.user_id)
    val tol = 600L * 1000000000L
    for {
      forward <- Seq(false, true)
      strict <- Seq(false, true)
      tolOpt <- Seq(None: Option[Long], Some(tol))
    } {
      val name = s"${if (forward) "fwd" else "bwd"}/" +
        s"${if (strict) "strict" else "incl"}/${tolOpt.fold("inf")(_ => "600s")}"
      val gotDf =
        if (forward) AsofJoin.asofForward(leftDf, rightDf, Seq("user_id"),
          "ts", Seq("event_id", "value"), strict, tolOpt)
        else AsofJoin.asofBackward(leftDf, rightDf, Seq("user_id"),
          "ts", Seq("event_id", "value"), strict, tolOpt)
      val got = gotDf.collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.toSeq
      val brute = clicks.map { c =>
        val cand0 = viewsByUser.getOrElse(c.user_id, Vector.empty)
        val cand = (forward, strict) match {
          case (false, false) => cand0.filter(_.ts <= c.ts)
          case (false, true) => cand0.filter(_.ts < c.ts)
          case (true, false) => cand0.filter(_.ts >= c.ts)
          case (true, true) => cand0.filter(_.ts > c.ts)
        }
        val pick = if (cand.isEmpty) None
          else Some(if (forward) cand.minBy(v => (v.ts, v.event_id))
            else cand.maxBy(v => (v.ts, v.event_id)))
        val bounded = pick.filter { v =>
          tolOpt.forall(t => (if (forward) v.ts - c.ts else c.ts - v.ts) <= t)
        }
        (c.event_id, c.user_id, c.ts, bounded.map(_.event_id),
          bounded.flatMap(v => Option(v.value).map(_.doubleValue())))
      }
      assertRows(s"asof-$name", got, brute)
    }
  }

  // ---- range-pair window VARIANTS: q49 gates only the symmetric
  //      +-600 s configuration; these pin the bucket-explode arithmetic
  //      (width = upper - lower, floor-div alignment, fanout-2 probe)
  //      for asymmetric, one-sided, and strictly-past windows against
  //      brute pair enumeration. The planted 600 s gaps land exactly on
  //      the inclusive window edges in every configuration. ----
  test("fuzz range-pair windows: asymmetric/offset windows agree with brute") {
    import graft.operators.RangeJoin
    import org.apache.spark.sql.functions.col
    val evDf = graft.sources.EventTime.nanos(
      spark.read.parquet(s"$fuzzDir/events.parquet"))
    val leftDf = evDf.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val rightDf = evDf.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val clicks = events.filter(_.event_type == "click")
    val errsByUser = events.filter(_.event_type == "error").groupBy(_.user_id)
    val S = 1000000000L
    for ((lo, hi) <- Seq((-600 * S, 600 * S), (0L, 600 * S), (-600 * S, 0L),
      (-1800 * S, -600 * S), (300 * S, 900 * S))) {
      // join-key columns lead the equi-join output: (user_id, event_id,
      // ts, range_event_id) — reorder to (event_id, user_id, ...)
      val got = RangeJoin.rangePairs(leftDf, rightDf, Seq("user_id"), "ts",
        lo, hi, Seq("event_id"))
        .collect().map(r =>
          (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
      val brute = clicks.flatMap { c =>
        errsByUser.getOrElse(c.user_id, Vector.empty)
          .filter(e => e.ts >= c.ts + lo && e.ts <= c.ts + hi)
          .map(e => (c.event_id, c.user_id, c.ts, e.event_id))
      }
      assertRows(s"range[${lo / S}s,${hi / S}s]", got, brute)
    }
  }

  // ---- q49: range join count (nanos BETWEEN +-600e9 inclusive) ----
  test("fuzz q49: range-join error counts agree with brute over 100 seeds") {
    val errors = events.filter(_.event_type == "error").groupBy(_.user_id)
    val w = 600000000000L
    val brute = events.filter(_.event_type == "click").map { c =>
      val n = errors.getOrElse(c.user_id, Vector.empty)
        .count(e => e.ts >= c.ts - w && e.ts <= c.ts + w)
      (c.event_id, c.user_id, n.toLong)
    }
    val got = run("q49_range_join").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assertRows("q49", got, brute)
  }

  // ---- q62: gap-fill linear resample onto the day grid (micro space) ----
  test("fuzz q62: gap-fill agrees with brute interpolation over 100 seeds") {
    val step = 86400000000L // µs
    val brute = bruteGapFill(
      events.map(e => (e.user_id, Math.floorDiv(e.ts, 1000L),
        Option(e.value).map(_.doubleValue))), step)
    val got = run("q62_gapfill").map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assertRows("q62", got, brute)
  }

  /** Brute replica of GapFill.resampleLinear's CONTRACT (dedup-by-mean
    * at 6 dp, ceil/floor grid in integer space, exact hits pass
    * through, interpolation in the operator's exact IEEE op order).
    */
  private def bruteGapFill(
      points: Seq[(Long, Long, Option[Double])], step: Long): Seq[(Long, Long, Option[Double])] =
    points.groupBy(_._1).toSeq.flatMap { case (u, ps) =>
      val dedup = ps.groupBy(_._2).map { case (t, rows) =>
        val vs = rows.flatMap(_._3)
        t -> (if (vs.isEmpty) None else Some(roundN(vs.sum / vs.size, 6)))
      }
      val tsSorted = dedup.keys.toVector.sorted
      val (tmin, tmax) = (tsSorted.head, tsSorted.last)
      def pmod(x: Long, m: Long) = ((x % m) + m) % m
      val g0 = (tmin + step - 1) - pmod(tmin + step - 1, step)
      val g1 = tmax - pmod(tmax, step)
      (g0 to g1 by step).map { g =>
        val pt = tsSorted.filter(_ <= g).lastOption
        val nt = tsSorted.find(_ >= g)
        val v: Option[Double] = (pt, nt) match {
          case (Some(p), _) if p == g => dedup(p)
          case (Some(p), Some(q)) =>
            for (pv <- dedup(p); nv <- dedup(q)) yield
              math.floor((pv + (nv - pv) *
                ((g - p).toDouble / (q - p).toDouble)) * 1000000.0 + 0.5) / 1000000.0
          case _ => None
        }
        (u, g, v)
      }
    }

  // ---- q67: streaming tumbling-window stats (REAL micro-batch replay) ----
  test("fuzz q67: stream window stats agree with brute over 100 seeds") {
    val brute = events.groupBy(e => (sec(e.ts) / 300 * 300, Option(e.event_type)))
      .toSeq.map { case ((w, et), evs) =>
        val vs = evs.flatMap(e => Option(e.value).map(_.doubleValue))
        (w, et, evs.size.toLong,
          if (vs.isEmpty) None else Some(roundN(vs.sum / vs.size, 4)))
      }
    val got = run("q67_stream_window").map { r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    assertRows("q67", got, brute)
  }

  // ---- q70: stream-stream interval join (second precision, +-1800 incl.) ----
  test("fuzz q70: stream interval join agrees with brute over 100 seeds") {
    val views = events.filter(_.event_type == "view").groupBy(_.user_id)
    val brute = events.filter(_.event_type == "click").flatMap { c =>
      val cs = sec(c.ts)
      views.getOrElse(c.user_id, Vector.empty)
        .filter(v => sec(v.ts) >= cs - 1800L && sec(v.ts) <= cs + 1800L)
        .map(v => (c.event_id, v.event_id, c.user_id, cs, sec(v.ts)))
    }
    val got = run("q70_stream_interval_join").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assertRows("q70", got, brute)
  }

  // ---- q71: online as-of enrichment (latest purchase <= ts, ties -> max) ----
  test("fuzz q71: stream as-of enrichment agrees with brute over 100 seeds") {
    val refs = events.filter(_.event_type == "purchase").groupBy(_.user_id)
    val brute = events.map { e =>
      val es = sec(e.ts)
      val cand = refs.getOrElse(e.user_id, Vector.empty).filter(r => sec(r.ts) <= es)
      // max over (ts, Option value): greatest ts wins regardless of its
      // value (a null-valued purchase still blocks earlier ones), and
      // within a ts tie None < every Some — the engine's sort order
      val v = if (cand.isEmpty) None
        else cand.map(r => (sec(r.ts), Option(r.value).map(_.doubleValue))).max._2
      (e.event_id, e.user_id, es, v)
    }
    val got = run("q71_stream_asof").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assertRows("q71", got, brute)
  }

  // ---- q68: watermarked streaming dedup — distinct (user, type) keys.
  //      The staged corpus is ONE file -> one micro-batch, so (like the
  //      driver gate) within-batch dedup sees every row and the key set
  //      equals batch DISTINCT; eviction across batches is exercised by
  //      ScaleRehearsal's stream case. Null event_type rides the fuzz
  //      corpus (a dedup KEY column the driver corpus never nulls). ----
  test("fuzz q68: stream dedup key set equals brute distinct keys") {
    val brute = events.map(e => (e.user_id, Option(e.event_type))).distinct
    val got = run("q68_stream_dedup").map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getString(1)))).toSeq
    assertRows("q68", got, brute)
  }

  // ---- q69: mapGroupsWithState running totals — the typed
  //      Dataset[(Long, Double)] path meeting NULL values (the driver
  //      corpus has none, so this path is otherwise ungated). Contract:
  //      COUNT(*) counts every row, a null value contributes 0 cents —
  //      identical to the oracle's SUM-skips-NULL semantics. ----
  test("fuzz q69: stream state totals agree with brute per-user cents") {
    val brute = events.groupBy(_.user_id).toSeq.map { case (u, evs) =>
      val cents = evs.map(e =>
        if (e.value == null) 0L else math.round(e.value.doubleValue * 100)).sum
      (u, evs.size.toLong, cents / 100.0)
    }
    val got = run("q69_stream_state").map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assertRows("q69", got, brute)
  }

  // ---- q69 across REAL micro-batches: the gate's bounded replay is a
  //      single batch (one staged file), so cross-batch state
  //      persistence is otherwise only exercised at rehearsal scale.
  //      Round-robin split -> every user's events span all 4 batches;
  //      the final update-mode emission per user must equal the
  //      whole-corpus totals (integer-cents state is batch-split-free
  //      BY DESIGN — this pins it generatively, nulls included). ----
  test("fuzz q69-multibatch: state accumulates across micro-batches to the same totals") {
    val dir = graft.core.TempDirs.scratch("graft_meta_multibatch")
    events.zipWithIndex.groupBy(_._2 % 4).toSeq.sortBy(_._1).foreach {
      case (i, part) =>
        val tmp = graft.core.TempDirs.scratch(s"graft_meta_mb_$i")
        part.map(_._1).toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val walk = java.nio.file.Files.list(tmp)
        val f = try walk.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally walk.close()
        java.nio.file.Files.move(f, dir.resolve(f"part$i%02d.parquet"))
    }
    val schema = spark.read.parquet(dir.toString).schema
    val stream = graft.sources.EventTime.nanos(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir.toString))
    val out = graft.streaming.StreamingClassify.runningUserStatsCents(stream)
    val qname = "graft_meta_mb_sink"
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName(qname).start()
    val batches = try { q.processAllAvailable(); q.recentProgress.count(_.numInputRows > 0) }
      finally q.stop()
    val sink = spark.table(qname).collect()
    spark.catalog.dropTempView(qname)
    assert(batches >= 3, s"expected a genuinely multi-batch run, got $batches")
    // memory sink in update mode APPENDS each batch's emissions: the
    // final state per user is its row with the greatest running count
    val finals = sink.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSeq
    val brute = events.groupBy(_.user_id).toSeq.map { case (u, evs) =>
      val cents = evs.map(e =>
        if (e.value == null) 0L else math.round(e.value.doubleValue * 100)).sum
      (u, evs.size.toLong, cents / 100.0)
    }
    assertRows("q69-multibatch", finals, brute)
    // and every user must have emitted MORE than once (state really
    // crossed batch boundaries rather than arriving in one batch)
    val multi = sink.map(r => r.getLong(0)).groupBy(identity)
      .count(_._2.length > 1)
    assert(multi > brute.size / 2,
      s"only $multi of ${brute.size} users emitted across multiple batches")
  }

  // ---- permutation metamorphism over the events-analytics family:
  //      row order must not matter. The corpus's 495 (user, ts) ties
  //      make this bite — a window ordered by ts alone, a
  //      partitioning-dependent sample, or arrival-order-sensitive
  //      bounded streaming state would all diverge here (q64's
  //      hash-membership sampling CLAIMS reproducibility across
  //      partitionings; this is the generative test of that claim). ----
  test("fuzz permutation: every events-family query is invariant to input row order") {
    val names = Seq("q42_sessionize", "q47_asof_join", "q49_range_join",
      "q56_json", "q57_daily", "q58_moving_window", "q62_gapfill",
      "q64_sample", "q67_stream_window", "q68_stream_dedup",
      "q69_stream_state", "q70_stream_interval_join", "q71_stream_asof")
    names.foreach { n =>
      val a = run(n).toSeq
      val b = run(n, permDir).toSeq
      assert(a == b, s"$n changed under an input permutation " +
        s"(sizes ${a.size}/${b.size}; first diff: ${
          a.zip(b).find { case (x, y) => x != y }})")
    }
  }

  // ---- direct GapFill micro-fuzz: negative spans, sub-step spans,
  //      on-grid singles, duplicate-ts collapse (q62b's edge family) ----
  test("fuzz gapfill-direct: resampleLinear agrees with brute on adversarial micro sets") {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 0xBEEF)
    val pts = (0 until SEEDS).flatMap { seed =>
      val n = 1 + rng.nextInt(6)
      (0 until n).map { _ =>
        val t = rng.nextInt(10) match {
          case 0 | 1 | 2 => (rng.nextInt(11) - 5) * 100L // exactly on-grid, incl. negative
          case 3 => (rng.nextInt(11) - 5) * 100L + (if (rng.nextBoolean()) 1L else -1L)
          case _ => rng.nextInt(1001) - 500L
        }
        val v: java.lang.Double = if (rng.nextInt(12) == 0) null
          else java.lang.Double.valueOf(rng.nextInt(401) * 0.25)
        (seed.toLong, t, v)
      }
    }
    val got = graft.operators.GapFill.resampleLinear(
      pts.toDF("user_id", "ts", "value"), Seq("user_id"), "ts", "value", step = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val brute = bruteGapFill(
      pts.map { case (u, t, v) => (u, t, Option(v).map(_.doubleValue)) }, 100L)
    assertRows("gapfill-direct", got, brute)
  }
}
