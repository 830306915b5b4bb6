package graft

import org.apache.spark.sql.Row

/** Randomized metamorphic fuzz for the TEXT-ANALYSIS family — the third
  * family extension of round-11 directive #4 (MetamorphicSpec owns the
  * temporal/streaming operators, MetamorphicDedupSpec the dedup/ANN/KNN
  * families). Same design: ~100 seeded corpora concentrated on every
  * comparator boundary and cap edge the operators own, staged as a real
  * single-file `documents.parquet` and driven through the REAL gate
  * surface (`SparkEntry.queries`), compared against brute-force Scala
  * references computed here from the same rows — independent of both
  * Spark and DuckDB.
  *
  * Boundary classes this generator concentrates on:
  *  - language-ID argmax TIES (equal distinct-marker hits for two
  *    languages → the lexicographically-smallest-code tie-break must
  *    decide), zero-marker docs ("und"), and repeated marker words
  *    (hits count DISTINCT tokens — repetition must not inflate);
  *  - quality-score cap edges: docs with EXACTLY 50 tokens (the
  *    `least(n/50, 1)` length cap lands exactly on 1.0), docs whose
  *    distinct-stopword ratio is exactly 0.25 (the `least(stop*4, 1)`
  *    cap lands exactly on 1.0), all-punctuation and punctuation-free
  *    texts (the `1 − punct` term's ends);
  *  - PII redaction at pattern boundaries: emails whose local part
  *    contains phone-shaped digit runs (ordering: the email pass must
  *    consume them first), `user@IP`-shaped strings (the `[A-Za-z]{2,}`
  *    TLD requirement rejects the email so the IP pass fires inside
  *    it), 4-digit-octet decoys (`1234.5.6.7`, `10.0.0.1234` — the
  *    `\b\d{1,3}` word boundaries reject both), phones with mixed
  *    `-. ` separators, and PII at string start/end;
  *  - word-8-gram decontamination edges: train docs with EXACTLY 8
  *    tokens all shared (one gram), 7-token subsets (no gram — below
  *    the window), the same shared gram repeated inside one train doc
  *    (distinctness: counted once), a phrase shared with MULTIPLE eval
  *    docs (eval-side dedup: still one gram), and uppercase/whitespace
  *    re-renders of sharing docs (tokenization lowercases → still hit);
  *  - repetition-ratio edges: single-token and two-identical-token
  *    docs (the n<2 one-shingle fallback pins rep2 = 0), alternating
  *    `a b a b` chains (every bigram distinct until the cycle repeats),
  *    and the `rep2 > 0.2` flag threshold approached from both sides;
  *  - tf-idf ranking ties: vocab overlap dense enough that rounded
  *    scores collide and the round-then-rank + term tie-break decides;
  *  - null / empty / whitespace-only texts through every query (the
  *    driver corpus has none — the fuzz owns these paths; nulls'
  *    engine-defined outputs are pinned explicitly below).
  *
  * Input-permutation invariance completes the checks: every query must
  * return the identical ordered result from a shuffled staging of the
  * same corpus.
  */
private[graft] case class TxtDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

class MetamorphicTextSpec extends SparkTestBase {

  private val SEEDS = 100

  // vocab: neutral words + stopwords + language markers + punctuation
  // carriers + unicode (pre-lowercase, no Turkish-I class)
  private val neutral = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "émile", "naïve", "日本語", "données", "w1th", "d1g1ts")
  private val puncty = Vector(
    "end.", "a,b", "(paren)", "semi;colon", "d-a-s-h", "!!!", "q?",
    "quote\"d", "[br]", "{x}", "#tag", "x~y")
  private val stopTok = graft.functions.TextFunctions.stopwordsEn.toVector
  private val markers: Map[String, Vector[String]] =
    graft.functions.TextFunctions.langMarkers.map {
      case (l, ws) => l -> ws.toVector }.toMap

  private val seps = Vector(" ", "  ", "\t", " \n ", "   ")

  private def render(toks: Vector[String], rng: scala.util.Random,
      messy: Boolean): String =
    if (toks.isEmpty) ""
    else if (!messy) toks.mkString(" ")
    else {
      val lead = if (rng.nextBoolean()) seps(rng.nextInt(seps.size)) else ""
      lead + toks.map(t => t + seps(rng.nextInt(seps.size)))
        .mkString.stripSuffix(" ")
    }

  private def mkDoc(id: Long, text: String) =
    TxtDoc(id, text, "en", "fuzz",
      if (text == null) 0L else text.length.toLong)

  /** Globally-shared 8-token phrase: planted in MANY seeds' eval docs
    * and other seeds' train docs — the eval-side gram dedup must still
    * count it once per train doc.
    */
  private val glob8 = Vector.tabulate(8)(i => s"globphrase$i")

  private def genSeed(s: Int): Vector[TxtDoc] = {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 0x7E47F077L + s)
    var idx = 0
    def nid(): Long = { val i = s.toLong * 1000 + idx; idx += 1; i }
    def pick(v: Vector[String]): String = v(rng.nextInt(v.size))
    def randToks(n: Int): Vector[String] = Vector.fill(n) {
      rng.nextInt(10) match {
        case 0 | 1 => pick(stopTok)
        case 2 => pick(puncty)
        case 3 => pick(markers(Vector("en", "de", "es", "fr", "zh")(rng.nextInt(5))))
        case _ => pick(neutral)
      }
    }
    val out = Vector.newBuilder[TxtDoc]

    // ---- idx 0: the eval doc (id ≡ 0 mod 50 exactly when idx == 0) ----
    val evalToks = Vector.tabulate(9 + rng.nextInt(5))(i => s"ev${s}t$i") ++
      (if (s % 7 == 0) glob8 else Vector.empty)
    out += mkDoc(nid(), render(evalToks, rng, false))

    // q79 plants against this seed's eval doc
    val w8 = evalToks.take(8)
    // embedded verbatim window inside noise
    out += mkDoc(nid(), render(randToks(3) ++ w8 ++ randToks(3), rng, false))
    // exactly 8 tokens, all shared: exactly one gram
    out += mkDoc(nid(), render(w8, rng, false))
    // 7-token subset: below the window, NO gram
    out += mkDoc(nid(), render(w8.take(7), rng, false))
    // the shared window twice: distinctness — counted once
    out += mkDoc(nid(), render(w8 ++ randToks(2) ++ w8, rng, false))
    // uppercase + messy-whitespace re-render of a sharing doc
    out += mkDoc(nid(), render(
      w8.map(t => if (rng.nextBoolean()) t.toUpperCase(java.util.Locale.ROOT) else t),
      rng, true))
    // cross-seed: train doc carrying the globally-shared phrase
    if (s % 5 == 0) out += mkDoc(nid(), render(randToks(2) ++ glob8, rng, false))

    // ---- language-ID boundary docs ----
    // argmax tie: equal distinct-marker hits for two languages
    locally {
      val la = Vector("en", "de", "es", "fr", "zh")(rng.nextInt(5))
      val lb = Vector("en", "de", "es", "fr", "zh")(rng.nextInt(5))
      val k = 1 + rng.nextInt(3)
      out += mkDoc(nid(), render(
        rng.shuffle(markers(la).take(k) ++ markers(lb).take(k) ++
          Vector.fill(2)(pick(neutral))), rng, false))
    }
    // zero markers -> "und"
    out += mkDoc(nid(), render(Vector.fill(3 + rng.nextInt(4))(pick(neutral)),
      rng, false))
    // repeated markers: distinct-hit counting must not inflate
    locally {
      val m = markers("fr")(rng.nextInt(3))
      val other = markers("de").take(2)
      out += mkDoc(nid(), render(Vector.fill(6)(m) ++ other, rng, false))
    }

    // ---- quality cap edges ----
    // exactly 50 tokens: length cap lands exactly on 1.0
    out += mkDoc(nid(), render(randToks(50), rng, false))
    // 4 distinct tokens, exactly one a stopword: stop*4 == 1.0 cap edge
    out += mkDoc(nid(), render(
      rng.shuffle(Vector(pick(stopTok), s"u${s}a", s"u${s}b", s"u${s}c")),
      rng, false))
    // all punctuation (punct ratio 1), punctuation-free doc
    out += mkDoc(nid(), "!!! ??? ;;; ...")
    out += mkDoc(nid(), render(Vector.fill(4)(pick(neutral)), rng, false))

    // ---- PII boundary docs (raw strings, not token-rendered) ----
    val piiHost = render(randToks(2 + rng.nextInt(3)), rng, false)
    out += mkDoc(nid(), pick(Vector(
      // phone-shaped digits inside an email local part: email pass first
      s"$piiHost 555-123-4567@corp.example.org tail",
      // user@IP: TLD regex rejects the email, IP pass fires inside it
      s"$piiHost root@192.168.1.1 logged",
      // 4-digit octet decoys: \b rejects both
      s"$piiHost 1234.5.6.7 and 10.0.0.1234 stay",
      // mixed phone separators + string-end PII
      s"$piiHost call 555.123 4567 or mail a.b-c%d@ex-1.co",
      // string-START email, adjacent punctuation
      s"x+y_z@sub.domain.io, then ip 8.8.8.8."
    )))

    // ---- repetition edges ----
    out += mkDoc(nid(), s"solo$s")                     // n=1: rep2 fallback
    out += mkDoc(nid(), s"twin$s twin$s")              // rep1=0.5, rep2=0
    locally { // alternating chain: a b a b ... (length 4..9)
      val a = pick(neutral); val b = s"alt$s"
      val n = 4 + rng.nextInt(6)
      out += mkDoc(nid(), render(Vector.tabulate(n)(i => if (i % 2 == 0) a else b),
        rng, false))
    }
    // rep2 just-around the 0.2 flag: 10 bigrams, 8 distinct = 0.2 (not >)
    // and 10 bigrams, 7 distinct = 0.3 (flagged). Construction: x1..xk
    // distinct run + the run's FIRST bigram repeated via wraparound.
    locally {
      val base = Vector.tabulate(9)(i => s"r$s${i}q")
      out += mkDoc(nid(), render(base ++ base.take(2), rng, false))
      out += mkDoc(nid(), render(base.take(8) ++ base.take(3), rng, false))
    }

    // ---- generic random docs (tf-idf tie density) + degenerates ----
    (0 until 2 + rng.nextInt(3)).foreach { _ =>
      out += mkDoc(nid(), render(randToks(1 + rng.nextInt(20)), rng,
        rng.nextInt(3) == 0))
    }
    if (s % 5 == 0) out += mkDoc(nid(), null)
    if (s % 3 == 0) out += mkDoc(nid(), "")
    if (s % 3 == 1) out += mkDoc(nid(), "  \t  ")
    out.result()
  }

  private lazy val docs: Vector[TxtDoc] = (0 until SEEDS).flatMap(genSeed).toVector

  private def stage(d: Vector[TxtDoc]): String = {
    import spark.implicits._
    FuzzStage.stage("graft_meta_text", "documents" -> d.toDF())
  }

  private lazy val fuzzDir: String = stage(docs)
  private lazy val permDir: String =
    stage(new scala.util.Random(FuzzStage.seedOffset + 20260814L).shuffle(docs))

  private def run(name: String, dir: String = null): Array[Row] =
    SparkEntry.queries(name)(spark, if (dir == null) fuzzDir else dir).collect()

  /** Spark round(col, 6): shortest-decimal BigDecimal, HALF_UP. */
  private def r6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // ------------------------------------------------------- brute kernels

  /** TextFunctions.tokens contract: lower, split \s+, drop empties. */
  private def toks(text: String): Vector[String] =
    if (text == null) null
    else text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toVector.filter(_.nonEmpty)

  private val punctSet: Set[Char] = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet

  private def assertRows[T](name: String, got: Seq[T], want: Seq[T]): Unit = {
    val g = got.toSet; val w = want.toSet
    assert(g == w, s"$name disagreed with brute reference: " +
      s"engine-only=${(g -- w).take(5)} brute-only=${(w -- g).take(5)}")
    assert(got.size == want.size,
      s"$name row-count drift: engine=${got.size} brute=${want.size}")
  }

  private lazy val nonNull: Vector[TxtDoc] = docs.filter(_.text != null)

  // ---- generator adequacy ----
  test("text fuzz generator: the corpus exercises every probed class") {
    def dtoks(t: String) = toks(t).distinct
    def langHits(t: String): Map[String, Int] =
      markers.map { case (l, ws) => l -> dtoks(t).count(ws.contains) }
    val ties = nonNull.count { d =>
      val h = langHits(d.text); val mx = h.values.max
      mx > 0 && h.values.count(_ == mx) >= 2
    }
    val und = nonNull.count(d => langHits(d.text).values.max == 0)
    val exact50 = nonNull.count(d => toks(d.text).size == 50)
    val stopCap = nonNull.count { d =>
      val dt = dtoks(d.text)
      dt.nonEmpty && dt.count(stopTok.contains) * 4 == dt.size
    }
    val eightTok = nonNull.count(d => toks(d.text).size == 8)
    val sevenTok = nonNull.count(d => toks(d.text).size == 7)
    val nullTexts = docs.count(_.text == null)
    val emptyTok = nonNull.count(d => toks(d.text).isEmpty)
    val singleTok = nonNull.count(d => toks(d.text).size == 1)
    // PII classes present
    val emailP = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.emailRe)
    val ipP = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.ipv4Re)
    val phoneP = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.phoneRe)
    def hits(p: java.util.regex.Pattern, t: String): Int = {
      val m = p.matcher(t); var c = 0; while (m.find()) c += 1; c
    }
    val emails = nonNull.map(d => hits(emailP, d.text)).sum
    val ips = nonNull.map(d => hits(ipP, d.text)).sum
    val phones = nonNull.map(d => hits(phoneP, d.text)).sum
    val decoys = nonNull.count(d => d.text.contains("1234.5.6.7"))
    assert(ties > 0, s"no lang-tie docs")
    assert(und > 0, s"no und docs")
    assert(exact50 > 0, "no 50-token docs")
    assert(stopCap > 0, "no stopword-cap-edge docs")
    assert(eightTok > 0 && sevenTok > 0, "no 8/7-token q79 edge docs")
    assert(nullTexts > 0 && emptyTok > 0 && singleTok > 0,
      "missing null/empty/single-token docs")
    assert(emails > 0 && ips > 0 && phones > 0,
      s"PII classes missing: emails=$emails ips=$ips phones=$phones")
    assert(decoys > 0, "no 4-digit-octet IP decoys")
    info(s"adequacy: ties=$ties und=$und exact50=$exact50 stopCap=$stopCap " +
      s"8tok=$eightTok 7tok=$sevenTok nulls=$nullTexts empty=$emptyTok " +
      s"single=$singleTok emails=$emails ips=$ips phones=$phones decoys=$decoys")
  }

  // ---- q17 quality ----
  test("q17 quality: engine matches brute stop/punct/length/diversity refs") {
    val got = run("q17_quality").map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any],
      if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[Any],
      if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[Any],
      if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[Any])).toVector
    val want = docs.sortBy(_.doc_id).map { d =>
      if (d.text == null)
        (d.doc_id, null, 0.0.asInstanceOf[Any], null, null)
      else {
        val t = toks(d.text)
        val dt = t.distinct
        val stopRaw = if (dt.isEmpty) 0.0
          else dt.count(stopTok.contains).toDouble / dt.size
        val len = d.text.length
        val punctRaw = if (len == 0) 0.0
          else d.text.count(punctSet.contains).toDouble / len
        val meanLen = if (t.isEmpty) 0.0
          else t.map(_.length).sum.toDouble / t.size
        val n = t.size.toDouble
        val lengthScore = math.min(n / 50.0, 1.0)
        val diversity = if (t.isEmpty) 0.0 else dt.size.toDouble / n
        val quality = r6(lengthScore * 0.3 + diversity * 0.3 +
          math.min(stopRaw * 4.0, 1.0) * 0.2 + (1.0 - punctRaw) * 0.2)
        (d.doc_id, r6(stopRaw).asInstanceOf[Any], r6(punctRaw).asInstanceOf[Any],
          r6(meanLen).asInstanceOf[Any], quality.asInstanceOf[Any])
      }
    }
    assertRows("q17", got, want)
  }

  // ---- q18 langid ----
  test("q18 langid: argmax + lex tie-break + und match the brute reference") {
    val got = run("q18_langid").map(r => (r.getLong(0), r.getString(1))).toVector
    val want = docs.sortBy(_.doc_id).map { d =>
      if (d.text == null) (d.doc_id, bruteLangNull)
      else {
        val dt = toks(d.text).distinct
        val hits = markers.map { case (l, ws) => l -> dt.count(ws.contains) }
        val mx = hits.values.max
        (d.doc_id,
          if (mx == 0) "und" else hits.filter(_._2 == mx).keys.min)
      }
    }
    assertRows("q18", got, want)
  }

  /** langId(null): tokens→null, every per-language hit is null, so every
    * scored struct is (neg=null, lang); array_min's struct ordering puts
    * null first within the neg field, ties fall to lang, and the
    * lexicographically smallest code wins; the `neg === 0` null-guard
    * then evaluates null → otherwise branch. Pinned engine-defined
    * behavior (the gate corpus has no null texts).
    */
  private val bruteLangNull: String = markers.keys.min

  // ---- q72 PII ----
  test("q72 pii: chained redaction + hit counts match java-regex brute") {
    val emailP = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.emailRe)
    val ipP = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.ipv4Re)
    val phoneP = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.phoneRe)
    def count(p: java.util.regex.Pattern, t: String): Int = {
      val m = p.matcher(t); var c = 0; while (m.find()) c += 1; c
    }
    val got = run("q72_pii_redact").map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      if (r.isNullAt(2)) null else r.getInt(2).asInstanceOf[Any],
      if (r.isNullAt(3)) null else r.getInt(3).asInstanceOf[Any],
      if (r.isNullAt(4)) null else r.getInt(4).asInstanceOf[Any])).toVector
    val want = docs.sortBy(_.doc_id).map { d =>
      if (d.text == null) (d.doc_id, null, null, null, null)
      else {
        val aug = if (d.doc_id % 3 == 0)
          d.text + " contact user" + d.doc_id +
            "@mail.example.com srv 10.0." + (d.doc_id % 256) + "." +
            (d.doc_id * 7 % 256) + " call 555-123-4567"
        else d.text
        val clean = phoneP.matcher(
          ipP.matcher(
            emailP.matcher(aug).replaceAll("<EMAIL>"))
            .replaceAll("<IP>"))
          .replaceAll("<PHONE>")
        (d.doc_id, clean, count(emailP, aug).asInstanceOf[Any],
          count(ipP, aug).asInstanceOf[Any],
          count(phoneP, aug).asInstanceOf[Any])
      }
    }
    assertRows("q72", got, want)
  }

  // ---- q73 repetition ----
  test("q73 repetition: native kernel matches brute distinct ratios + flag") {
    val got = run("q73_repetition").map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any],
      if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[Any],
      if (r.isNullAt(3)) null else r.getBoolean(3).asInstanceOf[Any])).toVector
    val want = docs.sortBy(_.doc_id).map { d =>
      if (d.text == null) (d.doc_id, null, null, null)
      else {
        val t = toks(d.text)
        val rep1 = if (t.isEmpty) 0.0 else 1.0 - t.distinct.size.toDouble / t.size
        val rep2 = if (t.size < 2) 0.0
          else 1.0 - t.sliding(2).map(_.mkString(" ")).toSet.size.toDouble / (t.size - 1)
        val (r1, r2) = (r6(rep1), r6(rep2))
        (d.doc_id, r1.asInstanceOf[Any], r2.asInstanceOf[Any],
          (r2 > 0.2).asInstanceOf[Any])
      }
    }
    assertRows("q73", got, want)
  }

  // ---- q79 decontamination ----
  test("q79 decontaminate: shared-8-gram counts match brute set intersection") {
    def gramSet(t: Vector[String]): Set[String] =
      if (t.size < 8) Set.empty else t.sliding(8).map(_.mkString(" ")).toSet
    val evalGrams: Set[String] = nonNull.filter(_.doc_id % 50 == 0)
      .flatMap(d => gramSet(toks(d.text))).toSet
    val want = nonNull.filter(_.doc_id % 50 != 0).flatMap { d =>
      val shared = gramSet(toks(d.text)).intersect(evalGrams)
      if (shared.isEmpty) None else Some((d.doc_id, shared.size.toLong))
    }
    val got = run("q79_decontaminate").map(r => (r.getLong(0), r.getLong(1))).toVector
    assertRows("q79", got, want)
    assert(want.nonEmpty, "q79 fuzz vacuous: no contaminated docs planted")
  }

  // ---- q50 tfidf ----
  test("q50 tfidf: scores and round-then-rank term tie-break match brute") {
    val n = docs.size
    val termCounts: Vector[(Long, Map[String, Int])] =
      nonNull.map(d => d.doc_id ->
        toks(d.text).groupBy(identity).map { case (k, v) => k -> v.size })
    val dfreq: Map[String, Int] =
      termCounts.flatMap(_._2.keys).groupBy(identity).map {
        case (k, v) => k -> v.size }
    val want = termCounts.flatMap { case (id, tfs) =>
      val scored = tfs.toVector.map { case (term, tf) =>
        (term, r6(tf.toDouble * (math.log((n + 1.0) / (dfreq(term) + 1.0)) + 1.0)))
      }.sortBy { case (term, s) => (-s, term) }
      scored.take(3).zipWithIndex.map { case ((term, s), i) =>
        (id, i + 1, term, s)
      }
    }
    val got = run("q50_tfidf").map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toVector
    assertRows("q50", got, want)
  }

  // ---- q43 vocab ----
  test("q43 vocab: corpus-wide distinct/total token counts match brute") {
    val all = nonNull.flatMap(d => toks(d.text))
    val r = run("q43_vocab").head
    assert((r.getLong(0), r.getLong(1)) ==
      (all.distinct.size.toLong, all.size.toLong),
      s"q43 drift: engine=(${r.getLong(0)},${r.getLong(1)}) " +
        s"brute=(${all.distinct.size},${all.size})")
  }

  // ---- q61 normalize ----
  test("q61 normalize: stopword-strip + single-space rejoin matches brute") {
    val got = run("q61_normalize").map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      if (r.isNullAt(2)) null else r.getInt(2).asInstanceOf[Any])).toVector
    val stopSet = stopTok.toSet
    val want = docs.sortBy(_.doc_id).map { d =>
      if (d.text == null) (d.doc_id, null, null)
      else {
        val norm = toks(d.text).filterNot(stopSet).mkString(" ")
        (d.doc_id, norm, norm.length.asInstanceOf[Any])
      }
    }
    assertRows("q61", got, want)
  }

  // ---- permutation invariance ----
  test("text family is invariant under input row-order permutation") {
    for (q <- Seq("q17_quality", "q18_langid", "q72_pii_redact",
        "q73_repetition", "q79_decontaminate", "q50_tfidf", "q43_vocab",
        "q61_normalize")) {
      val a = run(q).toSeq
      val b = run(q, permDir).toSeq
      assert(a == b, s"$q changed under input permutation")
    }
  }
}
