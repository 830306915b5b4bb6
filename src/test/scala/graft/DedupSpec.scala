package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (4L, "spark catalyst optimizer rewrites logical plans into physical plans"),
    (5L, "completely unrelated text about databases and storage engines"),
    (6L, "")
  ).toDF("doc_id", "text")

  test("exact: duplicate groups keyed by digest, min id kept") {
    val groups = Dedup.exact(docs, "doc_id", "text").collect()
    val dupGroup = groups.find(_.getLong(2) == 2L)
    assert(dupGroup.isDefined && dupGroup.get.getLong(1) === 1L) // keep_id = 1
    assert(groups.map(_.getLong(2)).sum === 6L) // every row accounted for
  }

  test("dropExactDuplicates keeps first id per text") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 5L, 6L))
  }

  test("dropExactDuplicates preserves the input schema, nullability included") {
    // the min_by(struct)/getField form would widen every column to
    // nullable; schema-sensitive sinks (parquet append, schema equality)
    // must see the exact input shape
    val out = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    assert(out.schema === docs.schema)
  }

  test("dropExactDuplicates: null ids sort first and never fabricate rows") {
    // min_by's bare ordering value ignores null rows — the struct-wrapped
    // key keeps them (nulls first, the window form's asc_nulls_first):
    // an all-null-id group returns a REAL row, and a mixed group keeps
    // the null-id row, not an all-NULL struct
    val withNulls = Seq(
      (Some(7L), "dup text"), (None: Option[Long], "dup text"),
      (None: Option[Long], "only null ids")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(withNulls, "doc_id", "text")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
      .toSet
    assert(kept === Set((None, "dup text"), (None, "only null ids")))
  }

  test("dropExactDuplicates carries dotted payload column names through") {
    // payload columns ride the kept struct and are re-extracted by
    // getField, which must not re-parse "meta.lang" as a path
    val dotted = docs.withColumn("meta.lang", lit("en"))
    val kept = Dedup.dropExactDuplicates(dotted, "doc_id", "text")
    assert(kept.columns.toSeq === Seq("doc_id", "text", "meta.lang"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 4L, 5L, 6L))
    // ... and a dotted ID column: the min_by ordering key must quote it
    // like the payload refs do, not re-parse it as a struct-field path
    val dottedId = docs.withColumnRenamed("doc_id", "doc.id")
    val keptId = Dedup.dropExactDuplicates(dottedId, "doc.id", "text")
    assert(keptId.columns.toSeq === Seq("doc.id", "text"))
    assert(keptId.select(col("`doc.id`")).collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 4L, 5L, 6L))
  }

  test("ngramJaccardPairs finds exact and near duplicates") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exactPair = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exactPair.isDefined && exactPair.get._3 === 1.0)
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 > 0.5))
    assert(!pairs.exists(p => p._2 == 5L && p._1 == 4L))
  }

  test("minhashLshPairs finds the planted near-dups (high-sim recall)") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 64, numBands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
  }

  test("minhash candidates' jaccard equals brute-force jaccard") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 64, numBands = 16, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (k, v) =>
      assert(brute.contains(k) && math.abs(brute(k) - v) < 1e-6)
    }
  }

  test("simhashPairs: exact dups at hamming 0; unrelated docs not paired") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 === 0)
    assert(!pairs.exists(p => p._1 == 4L && p._2 == 5L))
  }

  test("portable simhash59: exact dups at hamming 0; near-dups close; unrelated apart") {
    val pairs = Dedup.simhashPairsPortable(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 === 0)
    assert(!pairs.exists(p => p._1 == 4L && p._2 == 5L))
    // signature bits are balanced enough to discriminate (not constant)
    val sigs = docs.select(
      graft.functions.SeriesFunctions.simhash59(
        graft.functions.TextFunctions.tokens(col("text")))).collect().map(_.getLong(0))
    assert(sigs.distinct.length >= 4)
  }

  test("simhash banding pigeonhole at the radius edge: planted signatures") {
    // Planted 64-bit signatures, 4 chunks x 16 bits:
    //  id 1: all-zero.
    //  id 2: bits {0,16,32} set — differs from id 1 in chunks 0,1,2 and
    //        shares ONLY chunk 3 (hamming 3, the radius edge spread one
    //        bit per chunk: the exact pair a dropped/narrowed band loses).
    //  id 4: bits {17,33,49} set — differs from id 1 in chunks 1,2,3 and
    //        shares ONLY chunk 0 (the mirror: lost if chunk 0 is skipped).
    //  id 3: bits {1,17,33,49} — one bit in EVERY chunk vs id 1: no
    //        shared chunk, so (1,3) must NOT surface even at
    //        maxHamming = 4 (the banding is doing the pruning, not an
    //        all-pairs scan); vs id 4 it differs only in bit 1
    //        (hamming 1, chunks 1-3 agree) and must surface.
    val sigs = Seq(
      (1L, 0L),
      (2L, 1L | (1L << 16) | (1L << 32)),
      (3L, (1L << 1) | (1L << 17) | (1L << 33) | (1L << 49)),
      (4L, (1L << 17) | (1L << 33) | (1L << 49))
    ).toDF("id", "sig")
    val got = Dedup.simhashBandPairs(sigs, nChunks = 4, chunkBits = 16, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 4L), (3L, 4L)))
  }

  test("duplicateClusters: components labeled by smallest member; singletons kept") {
    val clustered = Dedup.duplicateClusters(docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered.size === 6) // every doc labeled
    assert(clustered(1L) === 1L && clustered(2L) === 1L && clustered(3L) === 1L)
    assert(clustered(4L) === 4L && clustered(5L) === 5L && clustered(6L) === 6L)
  }

  test("duplicateClusters handles transitive chains (A~B, B~C, A!~C)") {
    import spark.implicits._
    // B shares half its text with A and the other half with C
    val chain = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "epsilon zeta eta theta iota kappa lambda mu"),
      (12L, "iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    // edges sit AT jaccard 4/12 = 0.33 — the borderline-recall regime the
    // operator's scaladoc warns about (default r=3 banding misses ~30% of
    // j=0.33 pairs), so closure semantics are tested on brute-force edges
    val clustered = Dedup.duplicateClusters(chain, "doc_id", "text",
      shingleSize = 1, threshold = 0.3, useLsh = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
    // the documented mitigation for borderline-j workloads: lower
    // rowsPerBand (more bands per hash) restores recall
    val denser = Dedup.duplicateClusters(chain, "doc_id", "text",
      shingleSize = 1, threshold = 0.3, useLsh = true,
      numHashes = 96, numBands = 96)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(denser === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("duplicateClusters converges on a deep chain (diameter >> maxIterations)") {
    import spark.implicits._
    // 60-doc chain via stride-2 token windows: doc i and i+1 share
    // exactly one 2-shingle (jaccard 1/5 = 0.2), non-adjacent pairs
    // share none — ONE component of diameter 59, the incremental-edit
    // shape a web corpus produces. The plain edge-hop loop moved the
    // minimum one step per round and silently returned 40 fragmented
    // labels at the 20-iteration cap; pointer-jumping compression
    // converges in ~log2(59) rounds (the r11 fuzz program's 8th real
    // engine bug).
    val chain = (0 until 60).map { i =>
      (i.toLong, (0 until 4).map(j => s"t${2 * i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    val clustered = Dedup.duplicateClusters(chain, "doc_id", "text",
      shingleSize = 2, threshold = 0.2, useLsh = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered.size === 60)
    assert(clustered.values.toSet === Set(0L), "every doc labels to the chain minimum")
  }

  test("duplicateClusters: fixed point reached on the FINAL permitted round passes") {
    import spark.implicits._
    // Convergence used to require a full observed no-change round, so a
    // labeling done exactly on iteration == maxIterations threw a
    // false-positive non-convergence. The verification pass checks the
    // fixed-point property directly before declaring failure.
    val pair = Seq((10L, "alpha beta gamma"), (11L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    // the duplicate pair converges IN round 1 (11 adopts 10); with
    // maxIterations = 1 no zero-change round is ever observed
    val tight = Dedup.duplicateClusters(pair, "doc_id", "text",
      shingleSize = 1, threshold = 0.5, useLsh = false, maxIterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tight === Map(10L -> 10L, 11L -> 10L))
    // edge-free input is trivially converged even at maxIterations = 0
    val singles = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val zero = Dedup.duplicateClusters(singles, "doc_id", "text",
      shingleSize = 1, threshold = 0.5, useLsh = false, maxIterations = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === Map(1L -> 1L, 2L -> 2L))
    // a genuinely unconverged labeling still fails loud: a 60-chain
    // cannot finish label propagation in one round
    val chain = (0 until 60).map { i =>
      (i.toLong, (0 until 4).map(j => s"t${2 * i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, "doc_id", "text",
        shingleSize = 2, threshold = 0.2, useLsh = false, maxIterations = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("full-recall LSH pairs == brute-force pairs (sf0.001 documents)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleSize = 2, numHashes = 96, numBands = 32, threshold = 0.3,
      roundDp = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      shingleSize = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh === brute)
  }

  test("LSH-edge clusters == brute-force-edge clusters (sf0.001 documents)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaLsh = Dedup.duplicateClusters(corpus, "doc_id", "text",
      shingleSize = 2, threshold = 0.3, useLsh = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBrute = Dedup.duplicateClusters(corpus, "doc_id", "text",
      shingleSize = 2, threshold = 0.3, useLsh = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLsh === viaBrute)
  }

  test("LSH embedding near-dup: verified subset of brute force, high recall on near-dups") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val brute = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.9, roundDp = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupPairsLsh(e, "vec_id", "embedding", dim,
      threshold = 0.9, roundDp = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute)) // verification removes all false positives
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.9, s"recall=$recall (${lsh.size}/${brute.size})")
    }
  }

  test("embeddingNearDupPairs finds duplicate vectors") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.99f, 0.1f, 0.0f)),
      (4L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(_._2 == 4L))
  }

  test("editDistancePairs: typo pairs found within blocks, blocking respected") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "en"),
      (2L, "the quick brown fox jumpz", "en"),   // 1 edit from doc 1
      (3L, "the quick brown fox jumps", "de"),   // identical text, other block
      (4L, "a completely different doc", "en"),
      (5L, "the quick brown fox jumps over the lazy dog and keeps going", "en") // other length bucket
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lengthBucket = 10, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 1)))
  }

  test("editDistancePairs: bucket-boundary pairs are not missed") {
    // lengths 49 and 51 land in buckets 4 and 5 at width 10 — the
    // round-5 same-bucket blocking silently dropped this distance-2
    // pair; adjacent-bucket probing must keep it, exactly once
    val t49 = "x" * 49
    val t51 = "x" * 51
    val docs = Seq(
      (1L, t49, "en"),
      (2L, t51, "en")
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lengthBucket = 10, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 2)))
  }

  test("editDistancePairs: dist is the full-text distance, not a prefix's") {
    // identical 40-char head, divergent tails: the round-5 prefix kernel
    // reported these as distance-0 duplicates; the full-text kernel must
    // measure the tail (distance 4) and exclude them at maxDist = 3
    val head = "the very same first forty characters !!"
    val docs = Seq(
      (1L, head + "aaaa", "en"),
      (2L, head + "bbbb", "en")
    ).toDF("doc_id", "text", "lang")
    assert(Dedup.editDistancePairs(docs, "doc_id", "text",
      Seq("lang"), lengthBucket = 100, maxDist = 3).count() === 0)
    val loose = Dedup.editDistancePairs(docs, "doc_id", "text",
      Seq("lang"), lengthBucket = 100, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(loose.toSeq === Seq((1L, 2L, 4)))
  }

  test("editDistancePairs: identical texts in one block pair at distance 0, once") {
    val docs = Seq(
      (1L, "same text here", "en"),
      (2L, "same text here", "en"),
      (3L, "same text here", "en")
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lengthBucket = 10, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("editDistancePairs: distances beyond maxDist are excluded") {
    val docs = Seq(
      (1L, "aaaaaaaaaa", "en"),
      (2L, "aaaaaaabbb", "en")  // distance 3
    ).toDF("doc_id", "text", "lang")
    val strict = Dedup.editDistancePairs(docs, "doc_id", "text",
      Seq("lang"), lengthBucket = 100, maxDist = 2)
    assert(strict.count() === 0)
    val loose = Dedup.editDistancePairs(docs, "doc_id", "text",
      Seq("lang"), lengthBucket = 100, maxDist = 3)
    assert(loose.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      === Set((1L, 2L, 3)))
  }
}
