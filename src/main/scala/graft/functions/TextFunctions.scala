package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, and
  * fingerprinting. All pure built-in expressions (codegen'd, no UDF, no
  * shuffle) so they run at scan speed over 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased, empties dropped. `array_remove` is
    * value-identical to the higher-order `filter(_ =!= "")` but stays
    * codegen'd — the HOF form pays an interpreted lambda call per token,
    * which at ~400 tokens/doc dominated every text query's profile.
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(trim(text)), "\\s+"), "")

  /** Whitespace token count (0 for empty/blank text). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary token count: words, numbers, punctuation
    * runs counted separately (GPT-2-style pre-tokenizer regex, simplified
    * to what both Spark and external SQL engines support).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** English-ish stopword list used by quality scoring and language ID.
    * Deliberately tiny + fixed: deterministic, broadcastable as literals.
    */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** Normalized text for dedup/embedding pipelines: lowercase, collapse
    * whitespace, strip the fixed stopword list, rejoin with single
    * spaces. Pure per-row projection (tokenize → filter → join), so it
    * runs scan-side with no shuffle; the token-level filter replays
    * verbatim as a SQL list_filter, which puts normalization itself
    * under an exact oracle. (The HOFs are interpreted per element — fine
    * for a once-per-document pass; a per-PAIR hot path would want a
    * native expression instead, see `graft_shingle_hashes`.)
    */
  def normalize(text: Column): Column =
    array_join(
      filter(tokens(text),
        t => !array_contains(array(stopwordsEn.map(lit): _*), t)),
      " ")

  /** Fraction of distinct tokens that are stopwords — a fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val t = array_distinct(tokens(text))
    when(size(t) === 0, lit(0.0))
      .otherwise(hitCount(t, stopwordsEn).cast("double") / size(t))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0 || len.isNull, lit(0.0)).otherwise(
      (len - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / len)
  }

  /** Mean token length (0 for empty). */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
  }

  /** Composite document quality score in [0, 1]: length sweet-spot,
    * stopword presence, low punctuation noise, non-degenerate token
    * diversity. Heuristic in the C4/Gopher-rules family (public data-
    * cleaning literature), simplified and fully deterministic.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    val lengthScore = least(n / 50.0, lit(1.0))
    val diversity = when(n === 0, lit(0.0))
      .otherwise(size(array_distinct(t)).cast("double") / n)
    val stop = stopwordRatio(text)
    val punct = punctRatio(text)
    round(
      lengthScore * 0.3 + diversity * 0.3 +
        least(stop * 4.0, lit(1.0)) * 0.2 + (lit(1.0) - punct) * 0.2,
      6)
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Matches the synthetic corpus languages (en/de/es/fr/zh).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "en", "que", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "dans", "pour"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "bu4", "ren2"))

  /** Language-ID: argmax of marker-word hits over distinct tokens;
    * deterministic tie-break = lexicographically smallest language code;
    * "und" (undetermined) when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val t = array_distinct(tokens(text))
    // struct(-hits, lang) and array_min gives (max hits, min lang) argmax
    val scored = array(langMarkers.map { case (lang, words) =>
      struct((-hitCount(t, words)).as("neg"), lit(lang).as("lang"))
    }: _*)
    val best = array_min(scored)
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** PII patterns for the scrub pass every public-web training corpus
    * runs before anything else (C4/CCNet-style cleaning): emails, IPv4
    * addresses, NANP-style phone numbers. Kept to syntax BOTH Java
    * regex and RE2-family engines support (no backrefs, no lookaround)
    * so the redaction replays verbatim in external SQL oracles.
    *
    * The email quantifiers are BOUNDED to the RFC 5321 limits (64-char
    * local part, 255-char domain), not `+`: with unbounded greedy
    * classes, java.util.regex's find() rescans O(n) per start offset
    * inside a long class-char run — measured 133 s on a 200 KB
    * adversarial document (quadratic; a crafted multi-MB doc pins a
    * task for HOURS — the ReDoS straggler class). Bounds cap the work
    * per offset at the RFC constants, restoring linear scanning; only
    * RFC-invalid over-long runs change behavior (partial instead of
    * full-run redaction). Same pattern string feeds the SQL oracles, so
    * both engines shift together.
    */
  val emailRe = "[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"
  val phoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Redact emails → `<EMAIL>`, IPv4 → `<IP>`, phones → `<PHONE>`.
    * Order matters: emails first (their local/domain parts can contain
    * digit runs the narrower patterns would tear), then IPs (dotted
    * digits), then phones. Three chained codegen'd `regexp_replace`
    * projections — scan-side, no shuffle, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Count of pattern hits (for PII monitoring dashboards). */
  def piiHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Token-level repetition: 1 − distinct/total tokens (0 for empty).
    * The Gopher-rules repetition family — high values flag the
    * boilerplate/spam documents a pretraining pipeline drops.
    */
  def unigramRepetition(text: Column): Column =
    unigramRepetitionFromTokens(tokens(text))

  /** [[unigramRepetition]] over a pre-tokenized array column. */
  def unigramRepetitionFromTokens(t: Column): Column =
    when(size(t) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(t)).cast("double") / size(t))

  /** Word-bigram repetition: 1 − distinct/total bigram shingles —
    * catches looped phrases unigram diversity misses.
    *
    * Tokenize ONCE per row and pair adjacent tokens with `zip_with` over
    * two shifted slices (O(n)). The generic [[wordShingles]] shape —
    * `transform(sequence, i => ... slice(tokens(text), i, n))` — is
    * O(n²) WITH a regex re-split per position when evaluated inside a
    * higher-order lambda (subexpressions referencing only the outer row
    * are re-evaluated per element in interpreted HOF eval), which
    * measured ~7 ms/doc on ~400-token documents. At 100 TB that
    * difference is the whole job.
    */
  def bigramRepetition(text: Column): Column =
    bigramRepetitionFromTokens(tokens(text))

  /** [[bigramRepetition]] over a pre-tokenized array column — use this
    * form inside queries (project the tokens first so they bind as a
    * row attribute, not a recomputed expression).
    */
  def bigramRepetitionFromTokens(t: Column): Column = {
    val sh = when(size(t) < 2, array(concat_ws(" ", t)))
      .otherwise(zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws(" ", a, b)))
    when(size(sh) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
  }

  /** Character n-gram shingles (for MinHash / Jaccard dedup). Uses
    * `Column.substr` inside a higher-order `transform` (column start
    * positions).
    */
  def charShingles(text: Column, n: Int): Column =
    filter(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))),
      s => length(s) === n)

  /** Word n-gram shingles over the whitespace tokens. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n)))))
  }
}
