package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Function registration for graft's custom Catalyst expressions.
  *
  * Two entry points:
  *  - [[GraftExtensions]]: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` — the clean path for production sessions.
  *  - [[GraftFunctions.register]]: post-hoc registration on an existing
  *    session (used by tests and the driver harness).
  *
  * After registration the functions are usable from SQL and from
  * `functions.call_function`.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _)  => v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _)  => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$name must be an integer literal, got: $other")
  }

  /** name -> (builder, usage) */
  val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_euclidean",
      (es: Seq[Expression]) => EuclideanDistance(es(0), es(1)),
      "graft_euclidean(a, b) - Euclidean (L2) distance between array<double>"),
    ("graft_sqdist",
      (es: Seq[Expression]) => SquaredDistance(es(0), es(1)),
      "graft_sqdist(a, b) - squared L2 distance between array<double>"),
    ("graft_cosine",
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1)),
      "graft_cosine(a, b) - cosine similarity between array<double>"),
    ("graft_dot",
      (es: Seq[Expression]) => DotProduct(es(0), es(1)),
      "graft_dot(a, b) - dot product of array<double>"),
    ("graft_manhattan",
      (es: Seq[Expression]) => ManhattanDistance(es(0), es(1)),
      "graft_manhattan(a, b) - L1 distance between array<double>"),
    ("graft_dtw",
      (es: Seq[Expression]) =>
        DtwDistance(es(0), es(1),
          if (es.length > 2) intArg(es(2), "band") else -1),
      "graft_dtw(a, b[, band]) - exact DTW distance (|x-y| cost), optional Sakoe-Chiba band"),
    ("graft_fastdtw",
      (es: Seq[Expression]) =>
        FastDtwDistance(es(0), es(1),
          if (es.length > 2) intArg(es(2), "radius") else 1),
      "graft_fastdtw(a, b[, radius]) - FastDTW approximate DTW distance (Salvador & Chan 2007)"),
    ("graft_shingle_hashes",
      (es: Seq[Expression]) =>
        WordShingleHashes(es(0), intArg(es(1), "n")),
      "graft_shingle_hashes(tokens, n) - sorted distinct xxhash64 of word n-grams"),
    ("graft_word_ngrams",
      (es: Seq[Expression]) =>
        WordNgrams(es(0), intArg(es(1), "n")),
      "graft_word_ngrams(tokens, n) - distinct word n-gram strings (strict: <n tokens -> empty)"),
    ("graft_envelope",
      (es: Seq[Expression]) =>
        SeriesEnvelope(es(0), if (es.length > 1) intArg(es(1), "band") else -1),
      "graft_envelope(series[, band]) - Sakoe-Chiba envelope packed [lower ++ upper]"),
    ("graft_paa",
      (es: Seq[Expression]) =>
        SeriesPaa(es(0), intArg(es(1), "factor")),
      "graft_paa(series, factor) - Piecewise Aggregate Approximation (block means)"),
    ("graft_lb_keogh",
      (es: Seq[Expression]) => LbKeogh(es(0), es(1)),
      "graft_lb_keogh(envelope, candidate) - LB_Keogh lower bound on banded DTW"),
    ("graft_barrier",
      (es: Seq[Expression]) => Barrier(es(0)),
      "graft_barrier(x) - identity; blocks predicate pushdown through it"),
    ("graft_minhash",
      (es: Seq[Expression]) =>
        MinHashSignature(es(0), intArg(es(1), "k")),
      "graft_minhash(hashedSet, k) - MinHash signature (k mins of seeded long-hashes)"),
    ("graft_minhash_bands",
      (es: Seq[Expression]) =>
        MinHashBandKeys(es(0), intArg(es(1), "numBands")),
      "graft_minhash_bands(sig, numBands) - LSH band keys from a minhash signature"),
    ("graft_jaccard_sorted",
      (es: Seq[Expression]) => SortedLongJaccard(es(0), es(1)),
      "graft_jaccard_sorted(a, b) - Jaccard similarity of two sorted array<long> sets"),
    ("graft_topk_ids",
      (es: Seq[Expression]) =>
        BoundedTopKIdsAgg(es(0), es(1), intArg(es(2), "k")),
      "graft_topk_ids(score, id, k) - ids of the k smallest (score, id) pairs, as array<long>"),
    ("graft_topk_scores",
      (es: Seq[Expression]) =>
        BoundedTopKIdsAgg(es(0), es(1), intArg(es(2), "k"), emitScores = true),
      "graft_topk_scores(score, id, k) - scores of the k smallest (score, id) pairs, as array<double>"),
    ("graft_topk_scan",
      (es: Seq[Expression]) => {
        val kind = es(3) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"kind must be a string literal, got: $other")
        }
        TopKScanIds(es(0), es(1), intArg(es(2), "k"), kind, intArg(es(4), "band"))
      },
      "graft_topk_scan(sk, trainArr, k, kind, band) - ids of the k best-ranked broadcast train entries for one test sketch"),
    ("graft_topk_pairs",
      (es: Seq[Expression]) =>
        BoundedTopKIdsAgg(es(0), es(1), intArg(es(2), "k"), emitPairs = true),
      "graft_topk_pairs(score, id, k) - the k smallest (score, id) pairs as array<struct<score,id>> (ONE heap for both)"),
    ("graft_simhash59",
      (es: Seq[Expression]) => PortableSimHash59(es(0)),
      "graft_simhash59(tokens) - 59-bit SimHash over portable charfold token hashes"),
    ("graft_charfold_fingerprint",
      (es: Seq[Expression]) => CharFoldFingerprint(es(0)),
      "graft_charfold_fingerprint(tokens) - rotate-xor codepoint-fold fingerprint (SQL-portable)"),
    ("graft_har_series",
      (es: Seq[Expression]) =>
        HarSyntheticSeries(es(0), intArg(es(1), "length")),
      "graft_har_series(id, length) - deterministic HAR-shaped benchmark series"),
    ("graft_repetition",
      (es: Seq[Expression]) => RepetitionStats(es(0)),
      "graft_repetition(tokens) - [unigram, bigram] repetition ratios (1 - distinct/total)"),
    ("graft_simhash64",
      (es: Seq[Expression]) => SimHash64(es(0)),
      "graft_simhash64(tokens) - 64-bit SimHash of an array<string>"),
    ("graft_hamming64",
      (es: Seq[Expression]) => HammingDistance64(es(0), es(1)),
      "graft_hamming64(a, b) - Hamming distance between 64-bit signatures"),
    ("graft_cosine_i8",
      (es: Seq[Expression]) => CosineSimilarityI8(es(0), es(1)),
      "graft_cosine_i8(a, b) - cosine similarity over array<tinyint> (no widening copies)"),
    // Spark's own runtime-filter machinery (BloomFilterAggregate /
    // BloomFilterMightContain, used by InjectRuntimeFilter) surfaced as
    // callable functions, so BloomJoin can materialize an explicit
    // bloom-pruned semi join (exact: no false negatives + residual join).
    ("graft_bloom_agg",
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es(0), es(1), es(2)),
      "graft_bloom_agg(key, items, bits) - bloom filter over long keys, as binary"),
    ("graft_might_contain",
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(es(0), es(1)),
      "graft_might_contain(bloom, key) - bloom membership probe (no false negatives)"),
  )

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  def installInto(registry: FunctionRegistry): Unit =
    builders.foreach { case (name, b, usage) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id))
        registry.registerFunction(id, info(name, usage), b)
    }

  /** Idempotent post-hoc registration on a live session: functions via
    * the registry bridge, optimizer rules via the public
    * `experimental.extraOptimizations` hook.
    */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.RegistryBridge.install(spark, installInto)
    val rule = graft.plans.EuclideanThresholdToSqdist
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions`-compatible hook. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b, usage) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), b))
    }
    e.injectOptimizerRule(_ => graft.plans.EuclideanThresholdToSqdist)
  }
}
