package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The bench measurement protocol's cross-round trigger inputs — pure
  * JVM, no Spark session. BENCH_r12 published q37 at 6.69 s (isolated
  * truth 2.04 s) because the re-measure trigger was intra-window-spread
  * only; the fix compares first-pass medians against the PRIOR round's
  * official artifact, so the artifact parsing here is itself part of
  * the measurement protocol's correctness.
  */
class BenchProtocolSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tmp(content: String): String = {
    val f = Files.createTempFile("graft_bench_prior", ".json")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("loadPriorBench parses the engine's raw one-line artifact") {
    val raw = """{"metric":"total","value":85.198,"value_min":68.615,""" +
      """"unit":"sec","queries":{"q1_filter_project":0.50,""" +
      """"q37_vector_assembler":6.69,"q9_knn_eu_k1":0.90},""" +
      """"remeasured":17,"noise":0.516,"sf":"sf0.1"}"""
    val (qs, noise) = Bench.loadPriorBench(tmp(raw))
    assert(qs === Map("q1_filter_project" -> 0.50,
      "q37_vector_assembler" -> 6.69, "q9_knn_eu_k1" -> 0.90))
    assert(noise === 0.516)
  }

  test("loadPriorBench parses the driver wrapper and ignores the " +
      "escaped copy inside its stdout tail") {
    // the tail carries \"-escaped JSON whose numbers DIFFER from the
    // parsed block — a parser that matched the escaped copy would read
    // 9.99 instead of 6.69
    val wrapper =
      """{
        |  "n": 12,
        |  "tail": "{\"metric\":\"total\",\"queries\":{\"q37_vector_assembler\":9.99},\"noise\":0.9}",
        |  "parsed": {
        |    "metric": "total",
        |    "queries": {
        |      "q37_vector_assembler": 6.69,
        |      "q9_knn_eu_k1": 0.9
        |    },
        |    "noise": 0.516
        |  }
        |}""".stripMargin
    val (qs, noise) = Bench.loadPriorBench(tmp(wrapper))
    assert(qs === Map("q37_vector_assembler" -> 6.69, "q9_knn_eu_k1" -> 0.9))
    assert(noise === 0.516)
  }

  test("loadPriorBench returns empty on malformed or missing input " +
      "(a bad prior must never kill the current round's bench)") {
    assert(Bench.loadPriorBench("/nonexistent/x.json") === ((Map.empty, 0.0)))
    assert(Bench.loadPriorBench(tmp("not json at all")) === ((Map.empty, 0.0)))
    assert(Bench.loadPriorBench(tmp("{\"value\":1.0}")) === ((Map.empty, 0.0)))
  }

  private def qs(name: String, median: Double, spread: Option[Double],
      range: Double, prior: Option[Double]) =
    Bench.QuerySummary(name, median, spread, range, prior)

  test("selectSuspects: cross-round movers queue FIRST, largest move " +
      "first, before any spread-only suspect") {
    // the round-13 rehearsal starvation shape: many loud-spread queries
    // plus two movers; the movers must head the queue so a finite
    // budget always adjudicates them
    val summaries = Seq(
      qs("spread_worst", 1.0, Some(2.0), 1.5, None),
      qs("spread_mid", 1.0, Some(1.0), 0.9, None),
      qs("mover_small", 1.0, Some(0.1), 0.05, Some(2.5)), // |d|=1.5, rel 0.6
      qs("mover_big", 2.0, Some(0.1), 0.05, Some(8.4)))   // |d|=6.4, rel 0.76
    val (suspects, movers) =
      Bench.selectSuspects(summaries, band = 0.5, spreadThresh = 0.45)
    assert(movers === Seq("mover_big", "mover_small"))
    assert(suspects === Seq("mover_big", "mover_small",
      "spread_worst", "spread_mid"))
  }

  test("selectSuspects: a query that is both a mover and loud-spread " +
      "appears once, in mover position") {
    val summaries = Seq(
      qs("both", 3.0, Some(1.0), 2.0, Some(9.0)),
      qs("spread_only", 1.0, Some(2.0), 1.5, None))
    val (suspects, movers) =
      Bench.selectSuspects(summaries, band = 0.5, spreadThresh = 0.45)
    assert(movers === Seq("both"))
    assert(suspects === Seq("both", "spread_only"))
  }

  test("selectSuspects: the 0.15s absolute floor and the relative band " +
      "both gate the cross-round trigger") {
    val summaries = Seq(
      // huge relative move, 0.10s absolute: scheduler quantization, not
      // a regression signal
      qs("tiny_abs", 0.20, Some(0.1), 0.01, Some(0.10)),
      // 0.5s absolute but only 10% relative under a 0.5 band
      qs("small_rel", 5.5, Some(0.1), 0.01, Some(5.0)),
      // both thresholds cleared
      qs("real_move", 4.0, Some(0.1), 0.01, Some(2.0)))
    val (suspects, movers) =
      Bench.selectSuspects(summaries, band = 0.5, spreadThresh = 0.45)
    assert(movers === Seq("real_move") && suspects === Seq("real_move"))
  }

  test("selectSuspects: spread trigger needs BOTH spread above threshold " +
      "and a 0.15s run range; single-run queries never spread-trigger") {
    val summaries = Seq(
      qs("loud_but_tiny", 0.10, Some(3.0), 0.12, None), // range under floor
      qs("single_run", 9.0, None, 0.0, None),           // no spread info
      qs("real_spread", 1.0, Some(0.8), 0.5, None))
    val (suspects, movers) =
      Bench.selectSuspects(summaries, band = 0.5, spreadThresh = 0.45)
    assert(movers.isEmpty && suspects === Seq("real_spread"))
  }

  test("comparisonBand: wider of the two measured noises; the floor " +
      "applies only when NEITHER window carries spread info") {
    assert(Bench.comparisonBand(0.516, 0.3, 0.45) === 0.516)
    assert(Bench.comparisonBand(0.2, 0.3, 0.45) === 0.3)
    assert(Bench.comparisonBand(0.0, 0.0, 0.45) === 0.45)
    assert(Bench.comparisonBand(0.2, 0.0, 0.45) === 0.2,
      "one measured window beats the historical fallback")
  }

  /** The expectations the two discovery tests compare against, built
    * from the same directory — but filtered through the SAME
    * git-tracked-only contract the production discovery applies (r19
    * directive #1: the raw-listing expectation turned the suite red on
    * exactly the tree the judge sees, where the driver's per-round
    * BENCH_rN.json is present but not yet committed).
    */
  private def trackedBenchNamesNewestFirst: Seq[String] = {
    val re = """BENCH_r(\d+)\.json""".r
    val tracked = Bench.gitTrackedBenchNames
    Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f.getName)); case _ => None
      })
      .filter { case (_, name) => tracked.forall(_.contains(name)) }
      .sortBy(-_._1).map(_._2)
  }

  test("priorBenchPath picks the highest-numbered git-tracked " +
      "BENCH_r*.json in cwd (r19 directive #1: tracked-only, so an " +
      "uncommitted per-round artifact cannot flip this test)") {
    // env-independent expectation computed from the same directory,
    // through the same tracked-only filter as the code under test
    val expected = trackedBenchNamesNewestFirst.headOption
    assume(expected.nonEmpty, "repo root carries committed BENCH artifacts")
    assert(Bench.priorBenchPath().map(p => new java.io.File(p).getName)
      === expected)
    // and the prior it finds actually parses to a full query map
    val (qs, _) = Bench.loadPriorBench(Bench.priorBenchPath().get)
    assert(qs.size > 50, s"prior artifact parsed only ${qs.size} queries")
  }

  test("priorMarker: \"prior\":\"none\" on the total line when the " +
      "cross-round trigger ran with no usable prior; quiet when a " +
      "prior parsed or the pass is off (round-17 directive #1)") {
    assert(Bench.priorMarker(priorParsed = false, crossRoundEnabled = true)
      === ""","prior":"none"""",
      "a vacuous cross-round gate must be visible on the artifact itself")
    assert(Bench.priorMarker(priorParsed = true, crossRoundEnabled = true)
      === "", "a parsed prior keeps the quiet path — no marker")
    assert(Bench.priorMarker(priorParsed = false, crossRoundEnabled = false)
      === "", "with the re-measurement pass off there is no trigger to " +
        "be inert (hl:\"off\" already marks that state)")
  }

  private def suite(vs: (String, Double)*): Map[String, Bench.PriorQuery] =
    vs.map { case (n, v) => n -> Bench.PriorQuery(v, None, isolated = false) }
      .toMap

  test("volatileNames: >rel AND >abs movement in EITHER consecutive " +
      "pair of the newest-first history; largest mover first; " +
      "name-tiebroken (round-17 directive #2)") {
    val r17 = suite("q25" -> 2.68, "q37" -> 2.26, "q62" -> 1.42,
      "q1" -> 0.50, "tiny" -> 0.30, "big_small_rel" -> 5.5)
    val r16 = suite("q25" -> 2.20, "q37" -> 1.99, "q62" -> 1.15,
      "q1" -> 0.51, "tiny" -> 0.10, "big_small_rel" -> 5.0)
    val r15 = suite("q25" -> 2.25, "q37" -> 1.50, "q62" -> 1.18,
      "q1" -> 0.50, "tiny" -> 0.11, "big_small_rel" -> 5.1)
    // shiftFrac = 0 disables the window-shift detector: this fixture's
    // movers all move UP, which a live detector would (correctly) call
    // a window-level event — the per-query semantics are under test
    val vol = Bench.volatileNames(Seq(r17, r16, r15),
      relThresh = 0.20, absFloor = 0.15, shiftFrac = 0)
    // q25: r16->r17 +21.8% / +0.48s -> in. q37: r16->r17 only +13.6%
    // BUT r15->r16 +32.7% / +0.49s -> in ("either of the last two
    // rounds"). q62: +23.5% / +0.27s -> in. q1: flat -> out. tiny:
    // 200% rel AND 0.20s abs (both strict >) -> in. Order by worst rel
    // desc: tiny (2.0), q37 (0.327), q62 (0.235), q25 (0.218).
    assert(vol === Seq("tiny", "q37", "q62", "q25"), s"got: $vol")
    // big_small_rel moved 0.5s but only 10% -> out (rel gate)
    assert(!vol.contains("big_small_rel") && !vol.contains("q1"))
    // single-artifact history: no pair to compare -> empty
    assert(Bench.volatileNames(Seq(r17), 0.20, 0.15, 0) === Seq.empty)
    assert(Bench.volatileNames(Seq.empty, 0.20, 0.15, 0) === Seq.empty)
    // a query present in only one artifact of a pair never triggers
    val partial = Bench.volatileNames(
      Seq(suite("new_q" -> 9.0), suite("old_q" -> 1.0)), 0.20, 0.15, 0)
    assert(partial === Seq.empty)
  }

  test("comparablePair: like-for-like protocol matching — officials " +
      "for same-protocol queries, sm substitution for mixed pairs, " +
      "skip when the isolated side's sm is unrecoverable (r18 advisory)") {
    import Bench.PriorQuery
    val newer = Map(
      "both_suite" -> PriorQuery(1.0, None, isolated = false),
      "both_iso" -> PriorQuery(2.0, Some(2.6), isolated = true),
      "new_iso_sm" -> PriorQuery(3.0, Some(3.5), isolated = true),
      "new_iso_nosm" -> PriorQuery(4.0, None, isolated = true),
      "old_iso_sm" -> PriorQuery(5.0, None, isolated = false),
      "old_iso_nosm" -> PriorQuery(6.0, None, isolated = false))
    val older = Map(
      "both_suite" -> PriorQuery(1.1, None, isolated = false),
      "both_iso" -> PriorQuery(2.2, Some(2.9), isolated = true),
      "new_iso_sm" -> PriorQuery(3.3, None, isolated = false),
      "new_iso_nosm" -> PriorQuery(4.4, None, isolated = false),
      "old_iso_sm" -> PriorQuery(5.5, Some(5.8), isolated = true),
      "old_iso_nosm" -> PriorQuery(6.6, None, isolated = true),
      "older_only" -> PriorQuery(9.9, None, isolated = false))
    val cmp = Bench.comparablePair(newer, older)
    assert(cmp === Map(
      "both_suite" -> ((1.0, 1.1)),   // suite/suite: officials
      "both_iso" -> ((2.0, 2.2)),     // iso/iso: officials (like-for-like)
      "new_iso_sm" -> ((3.5, 3.3)),   // mixed: newer's sm vs older official
      "old_iso_sm" -> ((5.0, 5.8))),  // mixed: newer official vs older's sm
      s"got: $cmp")
    // mixed-protocol queries without a recoverable sm are SKIPPED —
    // the iso-vs-suite offset must not register as movement
    assert(!cmp.contains("new_iso_nosm") && !cmp.contains("old_iso_nosm"))
    assert(!cmp.contains("older_only"), "unshared queries never compare")
  }

  test("volatileNames: a sticky isolated query stops flagging once " +
      "compared like-for-like (r18 advisory: the iso-vs-suite offset " +
      "must not read as movement)") {
    import Bench.PriorQuery
    // q_sticky: isolated in the newer round with official 0.60 but
    // suite median 0.95; prior round's suite official 0.90. Officials
    // differ 33% (would flag); sm-vs-official differs 5.6% (must not).
    val newer = Map(
      "q_sticky" -> PriorQuery(0.60, Some(0.95), isolated = true),
      "q_real" -> PriorQuery(2.0, Some(2.05), isolated = true))
    val older = Map(
      "q_sticky" -> PriorQuery(0.90, None, isolated = false),
      "q_real" -> PriorQuery(1.0, None, isolated = false))
    val vol = Bench.volatileNames(Seq(newer, older), 0.20, 0.15, 0)
    // q_real genuinely doubled even like-for-like (sm 2.05 vs 1.0)
    assert(vol === Seq("q_real"), s"got: $vol")
  }

  test("windowShift: detects a population-wide same-direction shift, " +
      "stays quiet on symmetric chaos and on small populations " +
      "(round-18 directive #3)") {
    def cmp(pairs: (Double, Double)*): Map[String, (Double, Double)] =
      pairs.zipWithIndex.map { case (p, i) => s"q$i" -> p }.toMap
    // 12 queries, 4 significant movers all UP (rel > 0.20 strict AND
    // abs > 0.15), typical query +16%
    val up = cmp((1.16, 1.0), (1.17, 1.0), (1.15, 1.0), (1.2, 1.0),
      (2.42, 2.0), (2.5, 2.0), (3.7, 3.0), (3.8, 3.0),
      (1.18, 1.0), (1.14, 1.0), (1.16, 1.0), (1.15, 1.0))
    val r = Bench.windowShift(up, 0.20, 0.15, 0.20)
    assert(r.exists(v => v > 1.10 && v < 1.25), s"got: $r")
    // a DOWN shift detects too (movers' rel is measured against the
    // OLDER value, so the down fixture needs deeper moves to clear the
    // same strict gates)
    val down = cmp((1.4, 2.0), (1.5, 2.0), (2.1, 3.0), (2.2, 3.0),
      (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0),
      (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0))
    assert(Bench.windowShift(down, 0.20, 0.15, 0.20).exists(_ < 0.90))
    // symmetric chaos: equal significant movers both directions,
    // median flat
    val chaos = cmp((2.5, 2.0), (2.45, 2.0), (1.55, 2.0), (1.5, 2.0),
      (1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (1.0, 1.0),
      (1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (1.0, 1.0))
    assert(Bench.windowShift(chaos, 0.20, 0.15, 0.20).isEmpty,
      "symmetric movement is not a window-level shift")
    // a few loud movers over a flat population: median gate holds
    val fewLoud = cmp((3.0, 1.0), (3.0, 1.0), (3.0, 1.0),
      (1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (1.0, 1.0),
      (1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (1.0, 1.0))
    assert(Bench.windowShift(fewLoud, 0.20, 0.15, 0.20).isEmpty,
      "a flat typical query means per-query adjudication, not window")
    // under 10 shared queries: no population claim
    val tiny = cmp((2.0, 1.0), (2.0, 1.0), (2.0, 1.0), (2.0, 1.0))
    assert(Bench.windowShift(tiny, 0.20, 0.15, 0.20).isEmpty)
  }

  test("suiteComparable: a prior isolated query compares via its suite " +
      "median against a suite window, skips when sm is unrecoverable, " +
      "and a suite-protocol prior compares via its official " +
      "(r19 self-review: the mover trigger's stickiness fix)") {
    import Bench.PriorQuery
    assert(Bench.suiteComparable(PriorQuery(0.60, Some(0.95), true)) ===
      Some(0.95), "isolated with sm -> the suite median")
    assert(Bench.suiteComparable(PriorQuery(0.60, None, true)) === None,
      "isolated without sm -> no cross-protocol comparison")
    assert(Bench.suiteComparable(PriorQuery(0.90, None, false)) ===
      Some(0.90), "suite protocol -> official")
  }

  test("windowShift randomized invariants: uniform scale-up detects at " +
      "~the factor, in-band jitter never detects, and an inverted pair " +
      "can never detect in the same direction") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 200) {
      val n = 10 + rnd.nextInt(70)
      // base medians in [0.75, 4.75): every uniform >20% move also
      // clears the 0.15 s absolute floor
      val base = (0 until n).map(i => s"q$i" -> (0.75 + 4.0 * rnd.nextDouble()))
      // (a) uniform scale-up by f in (1.25, 2.0): every query is a
      // significant mover the same way -> must detect at ratio ~f
      val f = 1.25 + 0.75 * rnd.nextDouble()
      val up = base.map { case (q, v) => q -> ((v * f, v)) }.toMap
      val det = Bench.windowShift(up, 0.20, 0.15, 0.20)
      assert(det.exists(r => math.abs(r - f) < 1e-9), s"n=$n f=$f -> $det")
      // (b) the inverted pair (old and new swapped) must never detect
      // UP — at most a DOWN shift (ratio < 0.90)
      val inv = up.map { case (q, (nv, ov)) => q -> ((ov, nv)) }
      assert(Bench.windowShift(inv, 0.20, 0.15, 0.20).forall(_ < 0.90),
        "a swapped pair cannot report the same direction")
      // (c) per-query jitter within +/-10%: no query clears the 20%
      // mover gate, so no detection regardless of jitter direction
      val jit = base.map { case (q, v) =>
        q -> ((v * (0.9 + 0.2 * rnd.nextDouble()), v))
      }.toMap
      assert(Bench.windowShift(jit, 0.20, 0.15, 0.20).isEmpty,
        "in-band jitter is not a window-level shift")
    }
  }

  test("windowShift on the REAL committed artifacts: detects the " +
      "r17->r18 tenancy window (median ratio ~1.16), does not detect " +
      "r16->r17 or r15->r16 (round-18 directive #3)") {
    def art(n: Int): Map[String, Bench.PriorQuery] =
      Bench.loadPriorArtifact(f"BENCH_r$n%02d.json")._1
    val (r18, r17, r16, r15) = (art(18), art(17), art(16), art(15))
    assume(r18.size > 50 && r17.size > 50 && r16.size > 50 && r15.size > 50,
      "repo root carries the committed BENCH artifacts")
    val shifted = Bench.windowShift(
      Bench.comparablePair(r18, r17), 0.20, 0.15, 0.20)
    assert(shifted.exists(v => v > 1.10 && v < 1.30),
      s"the r17->r18 host-tenancy window must detect, got: $shifted")
    assert(Bench.windowShift(
      Bench.comparablePair(r17, r16), 0.20, 0.15, 0.20).isEmpty,
      "r16->r17 was a normal window — must not detect")
    assert(Bench.windowShift(
      Bench.comparablePair(r16, r15), 0.20, 0.15, 0.20).isEmpty,
      "r15->r16 was a normal window — must not detect")
  }

  test("windowShift tie + decisive-median relaxation (r19 advisory + " +
      "directive #3): an up/down mover tie never detects, and a " +
      "decisively-moved median fires below the base mover fraction") {
    def cmp(pairs: (Double, Double)*): Map[String, (Double, Double)] =
      pairs.zipWithIndex.map { case (p, i) => s"q$i" -> p }.toMap
    // 3 significant movers up, 3 down, over a population whose median
    // is skewed up past 1.10: the old up>=down tie-break would have
    // stamped an up-shift; a tie is no dominant direction at all
    val tie = cmp((2.5, 2.0), (2.6, 2.0), (2.55, 2.0),
      (1.5, 2.0), (1.45, 2.0), (1.55, 2.0),
      (1.12, 1.0), (1.12, 1.0), (1.12, 1.0), (1.12, 1.0),
      (1.12, 1.0), (1.12, 1.0))
    assert(Bench.windowShift(tie, 0.20, 0.15, 0.20).isEmpty,
      "a symmetric mover split is not a window-level shift, whatever " +
        "the population median says")
    // 12 queries, median ratio 0.85 (decisive: deviation 0.15), but
    // only 2/12 = 0.167 significant movers — below the base 0.20
    // gate, above the relaxed 0.20*0.10/0.15 = 0.133
    val relaxedDown = cmp((0.7, 1.0), (0.7, 1.0),
      (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0),
      (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0))
    assert(Bench.windowShift(relaxedDown, 0.20, 0.15, 0.20).exists(_ < 0.90),
      "a typical-query move of 15% IS the window event the detector " +
        "exists for, even with few individually-significant movers")
    // the floor holds: same decisive median, but only 1/12 = 0.083
    // movers — under fracThresh/2 = 0.10, must NOT detect
    val floored = cmp((0.7, 1.0),
      (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0),
      (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0), (0.85, 1.0),
      (0.85, 1.0))
    assert(Bench.windowShift(floored, 0.20, 0.15, 0.20).isEmpty,
      "a freak median cannot fire on a single mover")
    // an in-band median (deviation <= 0.10) keeps the FULL fraction
    // gate: 2/12 movers with a 1.08 median stays per-query business
    val inBand = cmp((1.3, 1.0), (1.3, 1.0),
      (1.08, 1.0), (1.08, 1.0), (1.08, 1.0), (1.08, 1.0), (1.08, 1.0),
      (1.08, 1.0), (1.08, 1.0), (1.08, 1.0), (1.08, 1.0), (1.08, 1.0))
    assert(Bench.windowShift(inBand, 0.20, 0.15, 0.20).isEmpty)
  }

  test("windowShift margin pinned on the REAL r18->r19 recovery pair " +
      "(r19 directive #3): the pair that clears the base fraction " +
      "gate by ONE mover stays excluded even if one mover flips") {
    def art(n: Int): Map[String, Bench.PriorQuery] =
      Bench.loadPriorArtifact(f"BENCH_r$n%02d.json")._1
    val (r19, r18, r17) = (art(19), art(18), art(17))
    assume(r19.size > 50 && r18.size > 50 && r17.size > 50,
      "repo root carries the committed BENCH artifacts")
    val cmp = Bench.comparablePair(r19, r18)
    val det = Bench.windowShift(cmp, 0.20, 0.15, 0.20)
    assert(det.exists(v => v > 0.80 && v < 0.90),
      s"the r18->r19 recovery is a DOWN window-level shift, got: $det")
    // the margin: judge-measured 17/82 movers vs the 0.20 gate — one
    // mover from flipping under the pre-r20 policy. Remove the single
    // largest down-mover from the pair; the relaxed gate must STILL
    // adjudicate the remainder as a window shift (median ~0.88 is
    // decisive), so one noisy query cannot re-admit ~16 vl flags.
    val largestDown = cmp.minBy { case (_, (nv, ov)) => nv / ov }._1
    val det2 = Bench.windowShift(cmp - largestDown, 0.20, 0.15, 0.20)
    assert(det2.exists(_ < 0.90),
      s"dropping mover '$largestDown' flipped the adjudication: $det2")
    // steady state entering r20 (judge-simulated, now pinned): BOTH
    // history pairs are window-shift-excluded and the per-query
    // volatility policy flags ZERO queries
    val shifts = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val vol = Bench.volatileNames(Seq(r19, r18, r17), 0.20, 0.15, 0.20,
      onShift = (i, r) => shifts.append((i, r)))
    assert(shifts.map(_._1).sorted === Seq(0, 1),
      s"both pairs entering r20 are window-level events: $shifts")
    assert(vol.isEmpty,
      s"r20's volatility set must be empty, got: $vol")
  }

  test("volatileNames entering r19 on the REAL artifacts: the shifted " +
      "r17->r18 pair is excluded (no cap flood), the r16->r17 pair " +
      "still contributes (round-18 directive #3)") {
    def art(n: Int): Map[String, Bench.PriorQuery] =
      Bench.loadPriorArtifact(f"BENCH_r$n%02d.json")._1
    val hist = Seq(art(18), art(17), art(16))
    assume(hist.forall(_.size > 50), "committed BENCH artifacts present")
    val shifts = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val vol = Bench.volatileNames(hist, 0.20, 0.15, 0.20,
      onShift = (i, r) => shifts.append((i, r)))
    assert(shifts.map(_._1) === Seq(0),
      s"exactly the r17->r18 pair (index 0) is window-shifted: $shifts")
    // the judge-simulated un-excluded history flooded the cap-16 pass
    // with 26 names; with the shifted pair excluded the r16->r17 pair
    // alone stays well inside the cap
    assert(vol.size <= 16, s"${vol.size} volatile names would flood " +
      s"the cap-16 isolated pass: $vol")
    // and the detector being active does NOT blind the policy: the
    // pair that contributes is exactly r16->r17's movers
    val unshifted = Bench.volatileNames(Seq(art(17), art(16)), 0.20, 0.15, 0.20)
    assert(vol === unshifted, "r19's volatility set == the r16->r17 movers")
  }

  test("loadPriorArtifact: prov.im decodes the isolation set over the " +
      "queries-map key order, exec sm recovers suite medians, and " +
      "escaped tail copies never match (r18 advisory)") {
    // 5 queries; im bits 01101 -> q25,q26,q50 isolated (matches the
    // provenanceFragment fixture); exec carries sm for q25 only
    val raw = """{"metric":"total","value":9.0,"unit":"sec",""" +
      """"queries":{"q1_agg":0.50,"q25_knn":2.00,"q26_har":3.00,""" +
      """"q3_window":0.70,"q50_tfidf":1.10},""" +
      """"exec":{"q1_agg":{"jobs":1,"min":0.49,"runs":[0.50,0.49,0.51]},""" +
      """"q25_knn":{"jobs":2,"min":1.9,"rm":5,"sm":2.45,"hl":1,"runs":[2.5,2.0]}},""" +
      """"prov":{"hl":"q25,q26,q50","im":"68"},"noise":0.4,"sf":"sf0.1"}"""
    val (qs, noise) = Bench.loadPriorArtifact(tmp(raw))
    assert(noise === 0.4)
    assert(qs("q25_knn") === Bench.PriorQuery(2.00, Some(2.45), true))
    assert(qs("q26_har") === Bench.PriorQuery(3.00, None, true))
    assert(qs("q50_tfidf") === Bench.PriorQuery(1.10, None, true))
    assert(qs("q1_agg") === Bench.PriorQuery(0.50, None, false))
    assert(qs("q3_window") === Bench.PriorQuery(0.70, None, false))
    // the driver wrapper: escaped copies in the tail carry a DIFFERENT
    // im and a bogus sm — neither may leak into the parse
    val wrapper = """{"n":19,""" +
      """"tail":"{\"queries\":{\"q1_agg\":9.9},\"exec\":{\"q1_agg\":{\"sm\":9.9}},\"prov\":{\"im\":\"f0\"}}",""" +
      """"parsed":{"queries":{"q1_agg":0.5,"q2_b":1.0},""" +
      """"prov":{"hl":"","im":"80"},"noise":0.3}}"""
    val (wqs, wnoise) = Bench.loadPriorArtifact(tmp(wrapper))
    assert(wqs === Map(
      "q1_agg" -> Bench.PriorQuery(0.5, None, true),
      "q2_b" -> Bench.PriorQuery(1.0, None, false)), s"got: $wqs")
    assert(wnoise === 0.3)
    // artifacts that predate prov (r01-r13): everything suite-protocol
    val old = """{"metric":"total","queries":{"q1":1.0},"noise":0.2}"""
    assert(Bench.loadPriorArtifact(tmp(old))._1 ===
      Map("q1" -> Bench.PriorQuery(1.0, None, false)))
    // malformed input stays harmless (same contract as loadPriorBench)
    assert(Bench.loadPriorArtifact("/nonexistent/x.json") ===
      ((Map.empty, 0.0)))
  }

  test("loadPriorArtifact on the REAL committed full artifact: every " +
      "isolated query recovers its suite median (the like-for-like " +
      "path's production input), non-isolated queries carry none") {
    val path = "BENCH_FULL_r19_rehearsal.json"
    assume(new java.io.File(path).isFile, "r19 full rehearsal committed")
    val (qs, noise) = Bench.loadPriorArtifact(path)
    assume(qs.size > 50)
    assert(noise > 0.0)
    val iso = qs.filter(_._2.isolated)
    assert(iso.nonEmpty, "the rehearsal remeasured queries by policy")
    // full artifacts carry the exec map, so EVERY isolated query's sm
    // must be recoverable — this is what keeps next round's volatility
    // comparison like-for-like instead of skipping
    val missing = iso.collect { case (n, q) if q.sm.isEmpty => n }
    assert(missing.isEmpty, s"isolated queries without sm: $missing")
    // and a non-isolated query must NOT carry an sm or the iso flag
    val suiteOnly = qs.filter(!_._2.isolated)
    assert(suiteOnly.nonEmpty && suiteOnly.values.forall(_.sm.isEmpty))
    // isolation count equals the artifact's own remeasured count
    assert(iso.size === 49, s"expected 49 isolated, got ${iso.size}")
  }

  test("benchHistoryPaths: a round-numbered env prior drops discovered " +
      "artifacts from the same or newer rounds instead of keeping " +
      "them behind it (r18 advisory: out-of-order history)") {
    // copy the committed r17 artifact to a temp round-numbered name;
    // discovered history in cwd reaches r18, which must be DROPPED
    val dir = Files.createTempDirectory("graft_benchab")
    val prior = dir.resolve("BENCH_r17.json")
    Files.copy(java.nio.file.Paths.get("BENCH_r17.json"), prior)
    prior.toFile.deleteOnExit(); dir.toFile.deleteOnExit()
    val hist = Bench.benchHistoryPaths(3, envPrior = Some(prior.toString))
      .map(p => new java.io.File(p).getName)
    assert(hist === Seq("BENCH_r17.json", "BENCH_r16.json", "BENCH_r15.json"),
      s"got: $hist (r18+ must be dropped, history in round order)")
    // an env prior OUTSIDE the naming convention keeps the full
    // discovered list behind it (round order undefined -> unchanged)
    val odd = dir.resolve("my_prior.json")
    Files.copy(java.nio.file.Paths.get("BENCH_r17.json"), odd)
    odd.toFile.deleteOnExit()
    val oddHist = Bench.benchHistoryPaths(3, envPrior = Some(odd.toString))
      .map(p => new java.io.File(p).getName)
    // the hard-coded "BENCH_r18.json" this expected until r20 was
    // itself tree-coupled (stale the round after it was written);
    // the contract is "newest TRACKED artifact follows the odd prior"
    assert(oddHist.head === "my_prior.json" &&
      oddHist.tail.headOption === trackedBenchNamesNewestFirst.headOption,
      s"got: $oddHist")
  }

  test("benchHistoryPaths: newest-first, capped, committed artifacts " +
      "(expectation tracked-only, r19 directive #1)") {
    val expected = trackedBenchNamesNewestFirst.take(3)
    assume(expected.size >= 3, "repo root carries committed BENCH artifacts")
    assert(Bench.benchHistoryPaths(3)
      .map(p => new java.io.File(p).getName) === expected)
    // head of the history IS the cross-round trigger's prior
    assert(Bench.benchHistoryPaths(1).headOption === Bench.priorBenchPath())
    // and the last-3 history parses into maps the volatility policy
    // can actually compare (each >50 queries)
    val hist = Bench.benchHistoryPaths(3).map(p => Bench.loadPriorBench(p)._1)
    assert(hist.forall(_.size > 50),
      s"history artifacts parsed to sizes ${hist.map(_.size)}")
  }

  test("discovery regression guard: an UNTRACKED BENCH_r99.json decoy " +
      "in the cwd changes neither the prior nor the history — the " +
      "exact mid-round tree the driver and judge see (r19 directive " +
      "#1)") {
    assume(Bench.gitTrackedBenchNames.nonEmpty,
      "git index available — the tracked-only contract is active")
    val before = Bench.benchHistoryPaths(3)
    val beforePrior = Bench.priorBenchPath()
    assume(before.size >= 3 && beforePrior.nonEmpty)
    val decoy = new java.io.File("BENCH_r99.json")
    assume(!decoy.exists(), "no stale decoy from an aborted run")
    try {
      val w = new java.io.PrintWriter(decoy)
      try w.print("""{"metric":"total","value":1.0,"unit":"sec",""" +
        """"queries":{"q_decoy":1.0},"noise":0.1,"sf":"sf0.1"}""")
      finally w.close()
      assert(Bench.priorBenchPath() === beforePrior,
        "an untracked artifact must not become the cross-round prior")
      assert(Bench.benchHistoryPaths(3) === before,
        "an untracked artifact must not enter the volatility history")
      assert(!Bench.discoveredBenchPaths().exists(_.contains("r99")),
        "discovery itself must drop the untracked name")
    } finally decoy.delete()
  }

  test("headlineNames: judged headliners by default, env overrides, " +
      "empty disables (round-14 directive #1)") {
    val default = Bench.headlineNames(None)
    assert(default === Seq("q25_knn_dtw_pruned", "q26_har_model2_1nn",
      "q32_multimodal_ann", "q50_tfidf"),
      "the default allowlist is exactly the queries the verdict named")
    assert(Bench.headlineNames(Some("")) === Seq.empty,
      "an empty env value disables the headline pass")
    assert(Bench.headlineNames(Some(" q1_filter_project , q4_agg ")) ===
      Seq("q1_filter_project", "q4_agg"),
      "a custom list parses with whitespace tolerance")
  }

  test("provenanceFragment: MSB-first hex bitmask over the queries-map " +
      "key order, short headline names, off/empty/count-only forms " +
      "(round-15 directive #1)") {
    val names = Seq("q1_agg", "q25_knn_dtw_pruned", "q26_har_model2_1nn",
      "q3_window", "q50_tfidf")
    // isolated = positions 1,2,4 -> bits 01101, padded to 01101000+ ->
    // nibbles 0110 1 -> "01101" pad to 8 bits "01101000" = 0x68
    val frag = Bench.provenanceFragment(names,
      Set("q25_knn_dtw_pruned", "q26_har_model2_1nn", "q50_tfidf"),
      Seq("q25_knn_dtw_pruned", "q26_har_model2_1nn", "q50_tfidf"),
      hlDisabled = false)
    assert(frag === ""","prov":{"hl":"q25,q26,q50","im":"68"}""",
      s"got: $frag")
    // popcount(im) = the re-measured count: 0x68 = 01101000 -> 3 bits
    assert(Integer.bitCount(Integer.parseInt("68", 16)) === 3)
    // count-only degrade tier keeps hl and the count, drops the mask
    val count = Bench.provenanceFragment(names,
      Set("q25_knn_dtw_pruned", "q50_tfidf"), Seq("q50_tfidf"),
      hlDisabled = false, countOnly = true)
    assert(count === ""","prov":{"hl":"q50","rm":2}""", s"got: $count")
    // a shared short prefix among headliners falls back to full names
    val collide = Bench.provenanceFragment(
      Seq("q9_a_x", "q9_b_y"), Set("q9_a_x", "q9_b_y"),
      Seq("q9_a_x", "q9_b_y"), hlDisabled = false, countOnly = true)
    assert(collide === ""","prov":{"hl":"q9_a_x,q9_b_y","rm":2}""",
      "ambiguous prefixes must print in full")
    // headline-allowlist-configured-but-remeasure-disabled: "off"
    // (round-15 advisory: SPARK_GRAFT_RUNS=1 silently skipped the
    // 'always isolated' policy with no marker)
    val off = Bench.provenanceFragment(names, Set.empty, Seq.empty,
      hlDisabled = true)
    assert(off === ""","prov":{"hl":"off","im":"00"}""", s"got: $off")
    // nothing to declare -> nothing printed
    assert(Bench.provenanceFragment(names, Set.empty, Seq.empty,
      hlDisabled = false) === "")
  }

  test("firstFitting: the total line degrades prov tiers until it fits " +
      "the tail cap, never truncating from the front") {
    def render(prov: String): String = "HEAD" + prov + "TAIL"
    assert(Bench.firstFitting(render, Seq("-longest-", "-mid-", ""), 30) ===
      "HEAD-longest-TAIL", "the full tier wins when it fits")
    assert(Bench.firstFitting(render, Seq("-longest-", "-mid-", ""), 14) ===
      "HEAD-mid-TAIL", "an overflowing tier degrades to the next")
    assert(Bench.firstFitting(render, Seq("-longest-", "-mid-", ""), 10) ===
      "HEADTAIL", "the empty tier always fits")
    // when even the LAST tier exceeds the cap, the line still renders
    // but a LOUD warning fires (r16 advisory: a silent overflow means
    // the driver's tail window truncates the line's FRONT and loses
    // "value" — exactly the failure the tiering exists to prevent)
    val warned = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(Bench.firstFitting(render, Seq("-a-"), 2, warned.append) ===
      "HEAD-a-TAIL",
      "when nothing fits the last tier still renders (callers end " +
        "with one that always fits)")
    assert(warned.size === 1 && warned.head.contains("WARNING") &&
      warned.head.contains("truncate"),
      s"an un-fittable line must warn loudly, got: $warned")
    // ... and no warning when a tier fits
    val quiet = scala.collection.mutable.ArrayBuffer.empty[String]
    Bench.firstFitting(render, Seq("-a-", ""), 30, quiet.append)
    assert(quiet.isEmpty, "a fitting line must not warn")
  }
}
