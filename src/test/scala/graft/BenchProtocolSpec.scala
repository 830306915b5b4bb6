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

  test("priorBenchPath picks the highest-numbered BENCH_r*.json in cwd") {
    // env-independent expectation computed from the same directory
    val re = """BENCH_r(\d+)\.json""".r
    val expected = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f.getName)); case _ => None
      }).sortBy(_._1).lastOption.map(_._2)
    assume(expected.nonEmpty, "repo root carries committed BENCH artifacts")
    assert(Bench.priorBenchPath().map(p => new java.io.File(p).getName)
      === expected)
    // and the prior it finds actually parses to a full query map
    val (qs, _) = Bench.loadPriorBench(Bench.priorBenchPath().get)
    assert(qs.size > 50, s"prior artifact parsed only ${qs.size} queries")
  }
}
