package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("docGrams: strict distinct n-grams; short docs contribute none") {
    val g = Decontaminate
      .docGrams(docs(
        1L -> "a b c d",   // 3 bigrams: "a b","b c","c d"
        2L -> "x y x y x", // bigrams "x y","y x" (deduped from 4)
        3L -> "solo"),     // 1 token < n=2: nothing
        "doc_id", "text", 2)
      .as[(Long, String)].collect().toSet
    assert(g === Set(
      (1L, "a b"), (1L, "b c"), (1L, "c d"),
      (2L, "x y"), (2L, "y x")))
  }

  test("contaminated: set-intersection counts against the eval side") {
    val train = docs(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "quick brown fox runs quick brown fox runs",
      12L -> "completely disjoint words here today")
    val eval = docs(
      100L -> "a quick brown fox appears",
      101L -> "brown fox runs away")
    // n=3 grams. eval grams: {a quick brown, quick brown fox, brown fox
    // appears, brown fox runs, fox runs away}
    // doc 10 shares {quick brown fox}; doc 11 shares {quick brown fox,
    // brown fox runs}; doc 12 none.
    val out = Decontaminate.contaminated(train, eval, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(10L -> 1L, 11L -> 2L))
  }

  test("repeated shared grams within one train doc count once") {
    val train = docs(20L -> "p q r s p q r")
    val eval = docs(200L -> "p q r")
    val out = Decontaminate.contaminated(train, eval, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(20L -> 1L)) // "p q r" occurs twice, counts once
  }

  test("small eval set joins broadcast; corpus grams never shuffle to it") {
    val train = docs((0L until 50L).map(i => i -> s"w$i x$i y$i z$i q$i r$i s$i t$i"): _*)
    val eval = docs(999L -> "w7 x7 y7 z7 q7 r7 s7 t7")
    val out = Decontaminate.contaminated(train, eval, n = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast gram join, got:\n$plan")
    assert(out.as[(Long, Long)].collect().toMap === Map(7L -> 1L))
  }
}
