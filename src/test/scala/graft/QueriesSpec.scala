package graft

/** Smoke: every declared query runs on sf0.001 and the flagship entry
  * returns rows (the driver's own checks, pre-flighted here).
  */
class QueriesSpec extends SparkTestBase {

  test("entry (flagship) returns rows with expected schema") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq === Seq("test_id", "predicted_label", "label"))
    assert(df.count() > 0)
  }

  test("GraftSession.getOrCreate yields a session with graft functions") {
    val s = GraftSession.getOrCreate()
    assert(s.sql("SELECT graft_euclidean(array(0.0d,0.0d), array(3.0d,4.0d)) d")
      .head().getDouble(0) === 5.0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphan.isEmpty, s"oracle SQL without query: $orphan")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001 and is non-degenerate") {
      val df = fn(spark, sf001)
      val n = df.count()
      // pair queries may legitimately return few rows, but none should error
      assert(n >= 0)
      if (!Set("q22_minhash_pairs", "q23_simhash_pairs", "q15_ngram_jaccard")
        .contains(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
