package graft

import graft.operators.Tfidf
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Static eval counter for the one-pass pin (same local-mode pattern as
  * IngestSpec: executors share the driver JVM, so task closures see the
  * static map).
  */
object TfidfSpec {
  val evalCounts = new java.util.concurrent.ConcurrentHashMap[
    Int, java.util.concurrent.atomic.AtomicInteger]()
}

class TfidfSpec extends SparkTestBase {
  import spark.implicits._

  test("N counts token-less documents (empty/blank/null text) exactly " +
      "like the oracle's count(*) — the explode_outer null-term rows") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha"),
      (3L, ""),            // token-less: must still count toward N
      (4L, "   "),         // blank: ditto
      (5L, null.asInstanceOf[String]) // null text: ditto
    ).toDF("doc_id", "text")
    val got = Tfidf.topTerms(docs, "doc_id", "text", 5).collect()
    // no null terms may surface
    assert(got.forall(_.getString(2) != null), "null terms must be filtered")
    assert(got.map(_.getLong(0)).toSet === Set(1L, 2L),
      "token-less docs produce no output rows but still count toward N")
    // N = 5 (not 2): alpha df=2, beta df=1; tf=1 everywhere
    val byTerm = got.map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(3)).toMap
    def score(df: Int): Double =
      BigDecimal(1.0 * (math.log((5 + 1.0) / (df + 1.0)) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byTerm((1L, "alpha")) === score(2))
    assert(byTerm((1L, "beta")) === score(1))
    assert(byTerm((2L, "alpha")) === score(2))
  }

  test("one pass over the corpus: the tf materialization is the ONLY " +
      "evaluation of the input, the persist is graft-owned (released " +
      "eagerly, recomputes after release) — round-15 directive #2") {
    TfidfSpec.evalCounts.clear()
    val nParts = 4
    val base = spark.sparkContext.parallelize(1 to 40, nParts)
      .mapPartitionsWithIndex { case (i, it) =>
        TfidfSpec.evalCounts
          .computeIfAbsent(i, _ => new java.util.concurrent.atomic.AtomicInteger())
          .incrementAndGet()
        it.map(j => Row(j.toLong, if (j % 7 == 0) "" else s"w${j % 5} common"))
      }
    val docs = spark.createDataFrame(base, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))))
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val out = Tfidf.topTerms(docs, "doc_id", "text", 2)
    // topTerms is EAGER (tf materialization + N in one action): the
    // input has already been evaluated exactly once per partition
    assert(TfidfSpec.evalCounts.values().stream()
      .mapToInt(_.get()).sum() === nParts,
      "the eager tf materialization must evaluate the corpus exactly once")
    val rows1 = out.collect()
    assert(rows1.nonEmpty)
    // consuming the result reads the persisted tf blocks — no re-scan
    assert(TfidfSpec.evalCounts.values().stream()
      .mapToInt(_.get()).sum() === nParts,
      "scoring must read the persisted tf table, not re-run the corpus " +
        "scan (the pre-r16 shape re-scanned the source for N)")
    val newPersists =
      spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(newPersists.nonEmpty, "the tf table must be persisted")
    // eager release through the result frame: graft-owned, so
    // releaseOwned frees it (and would touch nothing else); lineage is
    // kept, so the result RECOMPUTES instead of dying (and only then
    // re-reads the corpus)
    graft.core.Materialize.releaseOwned(out)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore)
      .isEmpty, "releaseOwned(result) must free the tf persist")
    val rows2 = out.collect()
    assert(rows2.map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq ===
      rows1.map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq,
      "a released result must recompute to the same rows")
  }
}
