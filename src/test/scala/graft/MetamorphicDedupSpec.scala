package graft

import org.apache.spark.sql.Row

/** Randomized metamorphic fuzz for the DEDUP / ANN family — the second
  * half of round-11 directive #4 (MetamorphicSpec covers the temporal
  * operators). Same design: ~100 seeded corpora concentrated on every
  * comparator boundary and representation edge the operators own, staged
  * as real single-file parquet tables and driven through the REAL gate
  * surface (`SparkEntry.queries`), compared against brute-force Scala
  * references computed here from the same rows — independent of both
  * Spark and DuckDB.
  *
  * Boundary classes this generator concentrates on:
  *  - jaccard EXACTLY == the 0.3 threshold (3/10 via shared-prefix
  *    construction: the `>=` inclusion edge), plus just-below (5/17)
  *    and just-above (5/16) neighbors;
  *  - the padded-shingle contract ([[graft.functions.WordShingleHashes]]):
  *    an EMPTY token list yields the singleton set {hash("")}, and a
  *    doc with fewer than n tokens yields ONE shingle of all tokens —
  *    so empty-text and whitespace-only docs are jaccard-1.0 near-dups
  *    of each other while remaining DISTINCT rows for exact dedup;
  *  - token-identical but text-different docs (whitespace / ASCII-case
  *    variants): jaccard 1.0 and simhash hamming 0 without being exact
  *    duplicates;
  *  - null texts (excluded from every pair operator, a group of their
  *    own in exact dedup);
  *  - cosine ties (duplicate corpus vectors — the heap's (−cos, id)
  *    tie-break), zero vectors (the kernel's 0.0 zero-norm branch),
  *    NaN components (Spark's NaN-is-greatest predicate semantics in
  *    q24, NaN-ranks-worst heap semantics in q20), length-mismatched
  *    vectors (min-length dot / full-length norm contract), and pairs
  *    planted within ~1e-6 of the 0.3 cosine threshold (the 6-dp
  *    round-then-compare edge).
  *
  * Engine-vs-engine invariants complete the value checks: q27's
  * cluster labels must equal union-find over q22's own edge list
  * (isolates the min-label propagation loop from LSH recall), and every
  * query must be invariant under a permutation of input row order.
  */
private[graft] case class MetaDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)
private[graft] case class MetaEmb(vec_id: Long, embedding: Array[Float],
    label: Int)

class MetamorphicDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val SEEDS = 100
  private val DIM = 8

  private val vocab = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
    // pre-lowercase unicode (locale-stable under both Spark's UTF8String
    // lowercase and Locale.ROOT — no Turkish-I class characters)
    "émile", "naïve", "日本語", "données")

  private val seps = Vector(" ", "  ", "\t", " \n ", "   ")

  /** Random whitespace rendering: the same token list can print as many
    * different raw texts (q14 groups raw text; q15/q22/q23 see tokens).
    */
  private def render(toks: Vector[String], rng: scala.util.Random,
      messy: Boolean): String =
    if (toks.isEmpty) ""
    else if (!messy) toks.mkString(" ")
    else {
      val lead = if (rng.nextBoolean()) seps(rng.nextInt(seps.size)) else ""
      val trail = if (rng.nextBoolean()) seps(rng.nextInt(seps.size)) else ""
      lead + toks.map(t => t + seps(rng.nextInt(seps.size))).mkString.stripSuffix(" ") + trail
    }

  private def mkDoc(id: Long, text: String) =
    MetaDoc(id, text, "en", "fuzz", if (text == null) 0L else text.length.toLong)

  /** Shared-prefix jaccard construction: two docs sharing a P-token
    * prefix followed by globally-unique tails of Ta / Tb tokens have
    * exactly (P-1) shared bigram shingles out of (P-1)+Ta+Tb total
    * (the junction shingle differs because tail heads differ).
    */
  private def prefixPair(s: Int, tag: String, p: Int, ta: Int, tb: Int):
      (Vector[String], Vector[String]) = {
    val pre = (0 until p).map(i => s"p$s${tag}x$i").toVector
    (pre ++ (0 until ta).map(i => s"a$s${tag}x$i"),
      pre ++ (0 until tb).map(i => s"b$s${tag}x$i"))
  }

  private def genDocsSeed(s: Int): Vector[MetaDoc] = {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 0xDEDB10CL + s)
    var idx = 0
    def nid(): Long = { val i = s.toLong * 1000 + idx; idx += 1; i }
    val out = Vector.newBuilder[MetaDoc]
    val baseToks = Vector.newBuilder[Vector[String]]
    val nBase = 5 + rng.nextInt(4)
    (0 until nBase).foreach { _ =>
      val n = rng.nextInt(12) match {
        case 0 => 0
        case 1 => 1 // below shingle size: ONE whole-doc shingle
        case 2 => 2
        case _ => 3 + rng.nextInt(12)
      }
      val toks = Vector.fill(n)(vocab(rng.nextInt(vocab.size)))
      baseToks += toks
      out += mkDoc(nid(), render(toks, rng, rng.nextInt(4) == 0))
    }
    val bases = baseToks.result()
    def pick(): Vector[String] = bases(rng.nextInt(bases.size))
    // exact duplicates: same RAW text under a new id
    (0 until 1 + rng.nextInt(2)).foreach { _ =>
      val t = pick()
      val text = render(t, rng, false)
      out += mkDoc(nid(), text)
      out += mkDoc(nid(), text)
    }
    // token-identical, text-different: whitespace re-render + ASCII-case
    // variant (jaccard 1.0 / hamming 0 WITHOUT exact-text equality)
    locally {
      val t = pick()
      out += mkDoc(nid(), render(t, rng, false))
      val cased = t.map(tok =>
        if (tok.forall(c => c >= 'a' && c <= 'z') && rng.nextBoolean())
          tok.toUpperCase(java.util.Locale.ROOT)
        else tok)
      out += mkDoc(nid(), render(cased, rng, true))
    }
    // near-duplicate: one token mutated
    locally {
      val t = pick()
      if (t.nonEmpty) {
        out += mkDoc(nid(), render(t, rng, false))
        val i = rng.nextInt(t.size)
        out += mkDoc(nid(), render(t.updated(i, vocab(rng.nextInt(vocab.size))),
          rng, false))
      }
    }
    // jaccard threshold boundary constructions (bigram shingles):
    //   (P-1)/((P-1)+Ta+Tb):  3/10 = 0.3 exactly (included: >= edge),
    //   5/17 ~ 0.294118 (excluded), 5/16 = 0.3125 (included).
    // The [0.8,1) LSH high-recall band is PLANTED too (16/20 = 0.8
    // exactly — the q22 recall bound's own edge — and 27/30 = 0.9):
    // before round 12 that band was only covered by incidental random
    // vocab overlaps, and a re-rolled corpus (SPARK_GRAFT_FUZZ_OFFSET=
    // 2468) produced ZERO such pairs — tripping the vacuity guard and
    // leaving the q22 recall assertion empty. Planting makes the band
    // offset-proof.
    Seq(("eq", 4, 4, 3), ("lo", 6, 6, 6), ("hi", 6, 6, 5),
      ("v8", 17, 2, 2), ("v9", 28, 2, 1)).foreach {
      case (tag, p, ta, tb) =>
        val (a, b) = prefixPair(s, tag, p, ta, tb)
        out += mkDoc(nid(), render(a, rng, false))
        out += mkDoc(nid(), render(b, rng, false))
    }
    // duplicate CHAIN: sliding windows (length 6, stride 2) over a
    // dedicated per-seed token namespace — adjacent jaccard 3/7 (~0.43,
    // an edge at the gate's 0.3 threshold), skip pairs 1/9 (non-edge):
    // ONE path component whose diameter (up to 22) exceeds what the
    // pre-fix one-hop propagation loop could close within its 20-round
    // cap (engine bug #8 returned fragmented labels on exactly this
    // shape); the q27 union-find reference walks it exactly.
    if (s % 3 == 2) {
      val len = 8 + (s % 16)
      val chainToks = Vector.tabulate(2 * len + 4)(k => s"ch${s}x$k")
      (0 until len).foreach { i =>
        out += mkDoc(nid(), render(chainToks.slice(2 * i, 2 * i + 6), rng, false))
      }
    }
    if (s % 5 == 0) out += mkDoc(nid(), null)
    if (s % 3 == 0) out += mkDoc(nid(), "")
    if (s % 3 == 1) out += mkDoc(nid(), "  \t  ")
    out.result()
  }

  private def genEmbSeed(s: Int): Vector[MetaEmb] = {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 0xE3BEDL + s)
    var idx = 0
    def nid(): Long = { val i = s.toLong * 100 + idx; idx += 1; i }
    def lbl(): Int = rng.nextInt(5)
    def baseVec(): Array[Float] =
      Array.fill(DIM)((rng.nextInt(33) - 16) * 0.25f)
    val out = Vector.newBuilder[MetaEmb]
    val kept = Vector.newBuilder[Array[Float]]
    val nBase = 6 + rng.nextInt(4)
    (0 until nBase).foreach { _ =>
      val v = baseVec()
      kept += v
      out += MetaEmb(nid(), v, lbl())
    }
    val bases = kept.result().filter(v => v.exists(_ != 0f))
    def pickNZ(): Array[Float] =
      if (bases.isEmpty) Array.fill(DIM)(1f) else bases(rng.nextInt(bases.size))
    // exact duplicate vector (cos == 1.0 tie) and a negation (cos -1)
    out += MetaEmb(nid(), pickNZ().clone(), lbl())
    out += MetaEmb(nid(), pickNZ().map(x => -x), lbl())
    if (s % 4 == 0) out += MetaEmb(nid(), Array.fill(DIM)(0f), lbl())
    if (s % 5 == 0) {
      val v = pickNZ().clone(); v(rng.nextInt(DIM)) = Float.NaN
      out += MetaEmb(nid(), v, lbl())
    }
    if (s % 6 == 0) out += MetaEmb(nid(),
      Array.fill(DIM - 3)((rng.nextInt(33) - 16) * 0.25f), lbl())
    // KNN-family plants (vec_id parity splits train=even / test=odd):
    //  - an identical vector on BOTH parities: the resulting dist==0.0
    //    pair must be dropped by excludeZeroDistance;
    //  - an equidistance triple (test t with trains t+d and t-d —
    //    quarter-multiple floats make the two distances bit-identical):
    //    the (dist, train_id) rank and the vote comparator must decide.
    def pad(parity: Int): Unit =
      if (idx % 2 != parity) out += MetaEmb(nid(), baseVec(), lbl())
    locally {
      val v = pickNZ()
      pad(0); out += MetaEmb(nid(), v.clone(), lbl())
      pad(1); out += MetaEmb(nid(), v.clone(), lbl())
    }
    locally {
      val t = baseVec()
      val d = Array.fill(DIM)((rng.nextInt(9) - 4) * 0.25f)
      pad(1); out += MetaEmb(nid(), t, lbl())
      pad(0); out += MetaEmb(nid(), t.zip(d).map { case (a, b) => a + b }, lbl())
      pad(0); out += MetaEmb(nid(), t.zip(d).map { case (a, b) => a - b }, lbl())
    }
    // threshold-skimming pair: b = t*â + sqrt(1-t²)*û with û ⊥ a, then
    // FLOAT-rounded — cos(a, b) lands within ~1e-6 of t, probing the
    // 6-dp round-then-compare edge from both sides across seeds
    locally {
      val a = pickNZ().map(_.toDouble)
      val na = math.sqrt(a.map(x => x * x).sum)
      val e0 = Array.tabulate(DIM)(i => if (i == 0) 1.0 else 0.0)
      val proj = a(0) / (na * na)
      var u = e0.zip(a).map { case (e, ai) => e - proj * ai }
      if (math.sqrt(u.map(x => x * x).sum) < 1e-9)
        u = Array.tabulate(DIM)(i => if (i == 1) 1.0 else 0.0)
      val nu = math.sqrt(u.map(x => x * x).sum)
      val t = Vector(0.3, 0.299999, 0.300001, 0.2999987)(rng.nextInt(4))
      val b = Array.tabulate(DIM)(i =>
        (t * a(i) / na + math.sqrt(1 - t * t) * u(i) / nu).toFloat)
      out += MetaEmb(nid(), a.map(_.toFloat), lbl())
      out += MetaEmb(nid(), b, lbl())
    }
    out.result()
  }

  private lazy val docs: Vector[MetaDoc] = (0 until SEEDS).flatMap(genDocsSeed).toVector
  private lazy val embs: Vector[MetaEmb] = (0 until SEEDS).flatMap(genEmbSeed).toVector

  private def stage(d: Vector[MetaDoc], e: Vector[MetaEmb]): String =
    FuzzStage.stage("graft_meta_dedup",
      "documents" -> d.toDF(), "embeddings" -> e.toDF())

  private lazy val fuzzDir: String = stage(docs, embs)
  private lazy val permDir: String = {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 20260814L)
    stage(rng.shuffle(docs), rng.shuffle(embs))
  }

  private def run(name: String, dir: String = null): Array[Row] =
    SparkEntry.queries(name)(spark, if (dir == null) fuzzDir else dir).collect()

  /** Spark round(col, n) semantics: shortest-decimal BigDecimal, HALF_UP. */
  private def roundN(d: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  private def assertRows[T](name: String, got: Seq[T], want: Seq[T]): Unit = {
    val g = got.toSet
    val w = want.toSet
    val extra = (g -- w).take(5)
    val missing = (w -- g).take(5)
    assert(g == w,
      s"$name disagreed with brute reference: engine-only=$extra brute-only=$missing")
    assert(got.size == want.size,
      s"$name row-count drift: engine=${got.size} brute=${want.size}")
  }

  // ------------------------------------------------------- brute kernels

  /** Spark-side tokenization contract: lower, split \s+, drop empties.
    * (`trim` in the engine only strips ASCII spaces, which split+remove
    * subsumes — see TextFunctions.tokens.)
    */
  private def toks(text: String): Vector[String] =
    if (text == null) null
    else text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toVector.filter(_.nonEmpty)

  /** WordShingleHashes semantics in string space: empty token list ->
    * {""}; fewer than n tokens -> one whole-doc shingle; else distinct
    * space-joined n-grams. Collision-free stand-in for the hashed sets.
    */
  private def shingleSet(t: Vector[String], n: Int): Set[String] =
    if (t.isEmpty) Set("")
    else if (t.length < n) Set(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val inter = a.intersect(b).size
    if (a.isEmpty && b.isEmpty) 0.0
    else inter.toDouble / (a.size + b.size - inter)
  }

  /** Non-null docs with their bigram shingle sets, id-ascending. */
  private lazy val docShingles: Vector[(Long, Set[String])] =
    docs.filter(_.text != null)
      .map(d => d.doc_id -> shingleSet(toks(d.text), 2)).sortBy(_._1)

  /** All pairs with NONZERO rounded bigram jaccard at 6 dp (id_a <
    * id_b). Zero-similarity pairs are omitted (they cannot pass any
    * positive threshold and would inflate the map ~10x).
    */
  private lazy val brutePairs: Map[(Long, Long), Double] = {
    val arr = docShingles
    val out = Map.newBuilder[(Long, Long), Double]
    var i = 0
    while (i < arr.length) {
      var j = i + 1
      while (j < arr.length) {
        val jac = roundN(jaccard(arr(i)._2, arr(j)._2), 6)
        if (jac > 0.0) out += ((arr(i)._1, arr(j)._1) -> jac)
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** Kernels.cosine replicated bit-for-bit: min-length dot, full-length
    * norms, 0.0 when either norm is zero (same accumulation order).
    */
  private def bruteCos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      val n = math.min(x.length, y.length)
      var s = 0.0; var i = 0
      while (i < n) { s += x(i) * y(i); i += 1 }
      s
    }
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val na = math.sqrt(dot(ad, ad)); val nb = math.sqrt(dot(bd, bd))
    if (na == 0.0 || nb == 0.0) 0.0 else dot(ad, bd) / (na * nb)
  }

  /** Heap selection order: k smallest (−cos, id) with SQL double
    * ordering — NaN greatest (ranks worst), ±0.0 ties.
    */
  private def negCmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    if (xn && yn) 0 else if (xn) 1 else if (yn) -1
    else if (x < y) -1 else if (x > y) 1 else 0
  }

  // ---- generator adequacy: assert the corpus actually contains every
  //      boundary class the tests below claim to probe ----
  test("dedup fuzz generator: the corpus exercises every probed class") {
    val textsById = docs.map(d => d.doc_id -> d.text).toMap
    val exactDupGroups = docs.filter(_.text != null).groupBy(_.text)
      .count(_._2.size > 1)
    val tokIdentNotExact = brutePairs.count { case ((a, b), j) =>
      j == 1.0 && textsById(a) != textsById(b) }
    val atThreshold = brutePairs.count(_._2 == 0.3)
    val justBelow = brutePairs.count(p => p._2 >= 0.25 && p._2 < 0.3)
    val highSim = brutePairs.count(p => p._2 >= 0.8 && p._2 < 1.0)
    val emptyTok = docs.count(d => d.text != null && toks(d.text).isEmpty)
    val oneTok = docs.count(d => d.text != null && toks(d.text).size == 1)
    val nullTexts = docs.count(_.text == null)
    val unicodeDocs = docs.count(d => d.text != null && d.text.exists(_ > 127))
    val dupVecPairs = embs.groupBy(_.embedding.toSeq).count(_._2.size > 1)
    val zeroVecs = embs.count(_.embedding.forall(_ == 0f))
    val nanVecs = embs.count(_.embedding.exists(_.isNaN))
    val shortVecs = embs.count(_.embedding.length != DIM)
    val nearCos = {
      val fin = embs.filter(!_.embedding.exists(_.isNaN))
      (for { a <- fin; b <- fin if a.vec_id < b.vec_id
        c = bruteCos(a.embedding, b.embedding)
        if !c.isNaN && math.abs(roundN(c, 6) - 0.3) <= 2e-6 } yield 1).size
    }
    val nQueries = embs.count(_.vec_id % 10 == 0)
    val crossParityDups = {
      val even = embs.filter(_.vec_id % 2 == 0).map(_.embedding.toSeq).toSet
      embs.count(e => e.vec_id % 2 == 1 && even(e.embedding.toSeq))
    }
    // deep-chain components: count docs in the dedicated chain token
    // namespace and pin that at least one seed's chain has diameter > 20
    // (the pre-fix propagation cap) — else the bug-#8 class goes unprobed
    // dedicated chain namespace (ch<seed>x<k>), not just any "ch" prefix:
    // the vocab contains words like "charlie", which would keep this
    // count nonzero even if the chain branch silently stopped generating
    val chainRe = java.util.regex.Pattern.compile("^ch\\d+x\\d+\\b")
    val chainDocs = docs.count(d =>
      d.text != null && chainRe.matcher(d.text).lookingAt())
    val deepChains = (0 until SEEDS).count(s => s % 3 == 2 && 8 + (s % 16) >= 22)
    val counts = Map("exact-dup groups" -> exactDupGroups,
      "chain docs" -> chainDocs, "chains with diameter > 20" -> deepChains,
      "token-identical text-different pairs" -> tokIdentNotExact,
      "jaccard == 0.3" -> atThreshold, "jaccard in [0.25,0.3)" -> justBelow,
      "jaccard in [0.8,1)" -> highSim, "empty-token docs" -> emptyTok,
      "one-token docs" -> oneTok, "null texts" -> nullTexts,
      "unicode docs" -> unicodeDocs, "duplicate vectors" -> dupVecPairs,
      "zero vectors" -> zeroVecs, "NaN vectors" -> nanVecs,
      "short vectors" -> shortVecs, "cos within 1e-6 of 0.3" -> nearCos,
      "ANN queries" -> nQueries,
      "cross-parity identical vectors" -> crossParityDups)
    info(counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    counts.foreach { case (k, v) =>
      assert(v > 0, s"generator never produced '$k' — the fuzz is vacuous there")
    }
    assert(docs.size > 1000 && embs.size > 800,
      s"corpus too thin: ${docs.size} docs, ${embs.size} vectors")
  }

  // ---- q14: exact dedup groups over raw text ----
  test("fuzz q14: exact-dup groups agree with brute raw-text grouping") {
    val brute = docs.groupBy(d => Option(d.text)).values
      .map(g => (g.map(_.doc_id).min, g.size.toLong)).toSeq
    val got = run("q14_dedup_exact").map(r => (r.getLong(0), r.getLong(1))).toSeq
    assertRows("q14", got, brute)
  }

  // ---- q15: brute-force bigram jaccard pairs at the 0.3 threshold ----
  test("fuzz q15: ngram jaccard pairs agree with brute shingle sets") {
    val brute = brutePairs.toSeq.collect {
      case ((a, b), j) if j >= 0.3 => (a, b, j) }
    val got = run("q15_ngram_jaccard").map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assertRows("q15", got, brute)
  }

  // ---- q22: LSH pairs — verified subset of brute, full recall >= 0.8 ----
  test("fuzz q22: minhash LSH pairs are a verified subset with high-sim recall") {
    val got = run("q22_minhash_pairs").map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // no false positives, and every emitted jaccard matches brute exactly
    got.foreach { case (a, b, j) =>
      val bj = brutePairs.getOrElse((a, b),
        fail(s"q22 emitted unknown pair ($a,$b)"))
      assert(j == bj && j >= 0.3, s"q22 pair ($a,$b) jaccard $j != brute $bj")
    }
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size,
      "q22 emitted a duplicate pair")
    // banding r=3/b=32: miss probability at j>=0.8 is <= (1-0.512)^32
    // ~ 1e-10 — deterministic under the fixed corpus, so assert FULL
    // recall there (a miss would be a real banding bug, not bad luck)
    val gotSet = got.map(p => (p._1, p._2)).toSet
    val missed = brutePairs.filter { case (k, j) => j >= 0.8 && !gotSet(k) }
    assert(missed.isEmpty, s"q22 missed high-similarity pairs: ${missed.take(5)}")
  }

  // ---- q23: simhash — hamming-0 completeness for token-identical docs ----
  test("fuzz q23: simhash pairs include every token-identical pair at hamming 0") {
    val got = run("q23_simhash_pairs").map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size,
      "q23 emitted a duplicate pair")
    got.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 3, s"q23 invalid row ($a,$b,$h)") }
    val gotMap = got.map(p => (p._1, p._2) -> p._3).toMap
    // identical token lists -> identical signatures -> hamming 0; the
    // generator plants these as whitespace/case re-renders
    val byToks = docs.filter(_.text != null).groupBy(d => toks(d.text))
    byToks.values.filter(_.size > 1).foreach { g =>
      val ids = g.map(_.doc_id).sorted
      for (i <- ids.indices; j <- i + 1 until ids.size) {
        val k = (ids(i), ids(j))
        assert(gotMap.get(k).contains(0),
          s"q23 missing hamming-0 token-identical pair $k (got ${gotMap.get(k)})")
      }
    }
  }

  // ---- q24: embedding cosine near-dup pairs (round 6, >= 0.3) ----
  test("fuzz q24: embedding near-dup pairs agree with brute cosine") {
    // Pinned by this fuzz: a NaN cosine is INCLUDED — Spark comparison
    // predicates on doubles use the nan-safe SQL ordering (NaN greater
    // than every value), so round(NaN, 6) = NaN passes `>= 0.3`.
    // Compare via doubleToLongBits: Scala's cooperative equality makes
    // NaN != NaN even inside boxed tuples, so raw (id, id, cos) triples
    // would never match on the NaN rows (bits canonicalize NaN and no
    // emitted cos can be ±0.0 — everything passing the filter is >= 0.3
    // or NaN).
    val brute = (for {
      a <- embs; b <- embs if a.vec_id < b.vec_id
      c = bruteCos(a.embedding, b.embedding)
      r = if (c.isNaN) Double.NaN else roundN(c, 6)
      if r.isNaN || r >= 0.3
    } yield (a.vec_id, b.vec_id, java.lang.Double.doubleToLongBits(r))).toSeq
    val got = run("q24_embedding_neardup").map(r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    assertRows("q24", got, brute)
  }

  // ---- q20: brute-force cosine top-k with ties, NaN and zero vectors ----
  test("fuzz q20: ANN top-5 agrees with brute heap order (ties, NaN, zero)") {
    val queries = embs.filter(_.vec_id % 10 == 0)
    val corpus = embs.filter(_.vec_id % 10 != 0)
    val brute = queries.flatMap { q =>
      val scored = corpus.map(c => (c.vec_id, -bruteCos(q.embedding, c.embedding)))
      val ord = new Ordering[(Long, Double)] {
        def compare(x: (Long, Double), y: (Long, Double)): Int = {
          val c = negCmp(x._2, y._2)
          if (c != 0) c else java.lang.Long.compare(x._1, y._1)
        }
      }
      scored.sorted(ord).take(5).zipWithIndex.map { case ((id, _), i) =>
        (q.vec_id, i + 1, id) }
    }
    val got = run("q20_ann_cosine").map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // ranks carry meaning and both sides sort by (query_id, rank):
    // compare the ORDERED triples, not just sets
    assert(got == brute,
      s"q20 drifted from brute heap order (sizes ${got.size}/${brute.size}; " +
        s"first diff: ${got.zip(brute).find { case (x, y) => x != y }}")
  }

  // ---- q9/q10: flagship KNN — brute 1-NN min-by and k=5 majority vote
  //      with planted exact distance ties (t±d trains), cross-parity
  //      identical vectors (the excludeZeroDistance drop), NaN and
  //      length-mismatched vectors ----
  // shared KNN brute kernel (q9/q10/q38): Kernels.sqdist replica —
  // common-prefix squared deltas, missing tail as distance-to-zero,
  // then sqrt; candidate rank = (dist, train_id) under SQL double
  // ordering (NaN greatest); zero-distance pairs dropped
  // (excludeZeroDistance; NaN != 0.0 -> kept)
  private lazy val knnTrain: Vector[MetaEmb] = embs.filter(_.vec_id % 2 == 0)
  private lazy val knnTest: Vector[MetaEmb] = embs.filter(_.vec_id % 2 == 1)
  private def knnDist(a: Array[Float], b: Array[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val n = math.min(ad.length, bd.length)
    var s = 0.0; var i = 0
    while (i < n) { val d = ad(i) - bd(i); s += d * d; i += 1 }
    var j = n
    while (j < ad.length) { s += ad(j) * ad(j); j += 1 }
    while (j < bd.length) { s += bd(j) * bd(j); j += 1 }
    math.sqrt(s)
  }
  private lazy val knnOrd = new Ordering[(Double, Long, Int)] {
    def compare(x: (Double, Long, Int), y: (Double, Long, Int)): Int = {
      val c = negCmp(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }
  private def knnCandidates(te: MetaEmb): Seq[(Double, Long, Int)] =
    knnTrain.map(tr => (knnDist(te.embedding, tr.embedding), tr.vec_id, tr.label))
      .filter(_._1 != 0.0)
      .sorted(knnOrd)

  /** Majority vote over the first `k` ranked candidates: (votes desc,
    * best_rank asc, label asc) — the engine's A5 comparator.
    */
  private def knnVote(te: MetaEmb, k: Int): Int = {
    val topk = knnCandidates(te).take(k).zipWithIndex
    val votes = topk.groupBy(_._1._3).toSeq.map { case (lbl, g) =>
      (g.size, g.map(_._2 + 1).min, lbl) } // (votes, best_rank, label)
    votes.sortBy { case (v, br, l) => (-v, br, l) }.head._3
  }

  test("fuzz q9/q10: KNN classification agrees with brute vote semantics") {
    val brute9 = knnTest.map { te =>
      (te.vec_id, knnCandidates(te).head._3) // min (dist, train_id) -> label
    }
    val got9 = run("q9_knn_eu_k1").map(r => (r.getLong(0), r.getInt(1))).toSeq
    assertRows("q9", got9, brute9)
    val brute10 = knnTest.map(te => (te.vec_id, knnVote(te, 5)))
    val got10 = run("q10_knn_eu_k5").map(r => (r.getLong(0), r.getInt(1))).toSeq
    assertRows("q10", got10, brute10)
  }

  // ---- q38: the k-sweep — three k values voted from ONE pair pass.
  //      The rank-prefix reformulation (explode k >= rank, per-(test,
  //      k, label) counts) must reproduce the independent per-k brute
  //      vote over the tie-dense fuzz corpus, and the grouped accuracy
  //      must match exactly per k. ----
  test("fuzz q38: per-k rank-prefix votes match independent brute sweeps") {
    val truth = knnTest.map(te => te.vec_id -> te.label).toMap
    val want = Seq(1, 3, 5).map { k =>
      val correct = knnTest.map(te =>
        if (knnVote(te, k) == truth(te.vec_id)) 1.0 else 0.0)
      (k, roundN(correct.sum / knnTest.size, 6), knnTest.size.toLong)
    }
    val got = run("q38_ksweep").map(r =>
      (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == want,
      s"q38 k-sweep drifted from brute: engine=$got brute=$want")
  }

  // ---- q27: labels == union-find over the engine's OWN q22 edge set ----
  test("fuzz q27: cluster labels equal union-find over the engine's edges") {
    val edges = run("q22_minhash_pairs").map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val allIds = docs.map(_.doc_id)
    val roots = allIds.map(id => id -> find(id)).toMap
    val minByRoot = allIds.groupBy(roots).view.mapValues(_.min).toMap
    val brute = allIds.map(id => (id, minByRoot(roots(id))))
    val got = run("q27_dedup_clusters").map(r => (r.getLong(0), r.getLong(1))).toSeq
    assertRows("q27", got, brute)
  }

  // ---- q16: token counting over whitespace/unicode/null edges ----
  test("fuzz q16: token counts agree with brute tokenization") {
    val bpeRe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    def bpeCount(t: String): Int = {
      val m = bpeRe.matcher(t); var c = 0; while (m.find()) c += 1; c
    }
    val brute = docs.sortBy(_.doc_id).map { d =>
      if (d.text == null)
        (d.doc_id, None: Option[Int], None: Option[Int], None: Option[String])
      else {
        val t = toks(d.text)
        (d.doc_id, Some(t.size), Some(bpeCount(d.text)), t.headOption)
      }
    }
    val got = run("q16_token_count").map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getString(3)))
    }.toSeq
    assert(got == brute, s"q16 drifted from brute tokenization (sizes " +
      s"${got.size}/${brute.size}; first diff: ${
        got.zip(brute).find { case (x, y) => x != y }})")
  }

  // ---- permutation metamorphism: row order must not matter ----
  // The text-analysis family rides along: q50's top-3-per-doc runs over
  // a corpus FULL of duplicate texts (massive tf-idf ties), so this
  // pins the round-before-rank + tie-break-by-term determinism claim
  // under far denser ties than the driver corpus ever produces.
  test("fuzz permutation: every dedup/ANN/text query is invariant to input row order") {
    val names = Seq("q14_dedup_exact", "q15_ngram_jaccard", "q20_ann_cosine",
      "q22_minhash_pairs", "q23_simhash_pairs", "q24_embedding_neardup",
      "q27_dedup_clusters", "q16_token_count", "q17_quality", "q18_langid",
      "q19_fingerprint", "q50_tfidf", "q72_pii_redact", "q73_repetition",
      "q9_knn_eu_k1", "q10_knn_eu_k5", "q38_ksweep")
    names.foreach { n =>
      val a = run(n).toSeq
      val b = run(n, permDir).toSeq
      assert(a == b, s"$n changed under an input permutation " +
        s"(sizes ${a.size}/${b.size}; first diff: ${
          a.zip(b).find { case (x, y) => x != y }.orElse(
            Some((a.size, b.size))).get})")
    }
  }
}
