package graft.operators

import graft.functions.{SeriesFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines at 100 TB scale.
  * The reference has no dedup surface; these are the standard public
  * techniques (exact hash, MinHash+LSH per Broder 1997 / Leskovec et al.
  * "Mining of Massive Datasets" ch.3, SimHash per Charikar 2002)
  * expressed Spark-first.
  *
  * Scale notes:
  *  - exact: one hash-shuffle on a 128-bit digest pair (two
 *    independently-seeded xxhash64s — a single 64-bit key collides with
 *    near-certainty at billions of rows), never on the full text.
  *  - MinHash LSH: signatures are computed scan-side (codegen, no
  *    shuffle); the only shuffle keys are (band, bandHash) — candidate
  *    pairs are generated per bucket, so cost is sum(bucket^2), not n^2.
  *  - SimHash: one 64-bit signature per doc; banding on 16-bit chunks
  *    finds all pairs within Hamming distance 3 exactly (pigeonhole).
  */
object Dedup {

  /** Exact duplicate groups keyed by a 128-bit content digest: keeps the
    * smallest id as canonical representative. Shuffles (digests) not text.
    *
    * TWO independently-seeded 64-bit digests, not one: grouping on a
    * single xxhash64 silently MERGES different texts that collide — at
    * the billion-document scale this engine targets, the 64-bit
    * birthday bound makes that a certainty, not a tail risk (~50% at
    * ~5B distinct texts), and a merged group DELETES a non-duplicate
    * document with no error path. The second digest hashes the text
    * under a different effective seed (the prepended literal shifts
    * xxhash64's running state BEFORE the text bytes — prepended, not
    * appended, because appending would make digest2 a pure function of
    * digest1's collision), putting a joint collision at the 128-bit
    * bound (~1e-20 at 5B docs). The exposed `digest` column stays the
    * primary 64-bit hash; two groups that collide on it simply emit two
    * rows with equal `digest` and distinct members.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), xxhash64(col(textCol)).as("digest"),
        xxhash64(lit(1L), col(textCol)).as("_digest2"))
      .groupBy("digest", "_digest2")
      .agg(min("id").as("keep_id"), count(lit(1)).as("dup_count"))
      .select("digest", "keep_id", "dup_count")

  /** Rows of `df` minus exact duplicates (first id wins). min_by over
    * the digest, not a window: partial aggregation combines map-side, so
    * at most one row per (digest, map partition) enters the exchange.
    * Measured HONESTLY (ScaleRehearsal `dedupskew`, 4M x 400 B rows with
    * one text duplicated 2M-fold): the former `row_number <= 1` window
    * ties this form at 4.1 s, because Spark 4's WindowGroupLimit rewrite
    * also prunes to 1 row per key map-side. The aggregate is still the
    * better shape — no per-partition sort, and it does not depend on the
    * optimizer recognizing the rank-filter pattern to stay skew-safe.
    */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns
    // ordering key wrapped in a struct: min_by IGNORES rows whose bare
    // ordering value is null (an all-null-id group would collapse to a
    // fabricated all-NULL row), while a one-field struct is never null
    // and orders its null field first — matching the window form's
    // asc_nulls_first. Payload columns enter the struct via backtick-
    // quoted refs and exit via getField, so a column NAMED "meta.lang"
    // survives instead of being re-parsed as a path.
    // 128-bit group key (two independently-seeded digests), same
    // rationale as [[exact]]: a single-xxhash64 key merges colliding
    // texts and silently DROPS a non-duplicate document — near-certain
    // at billion-row scale
    df.groupBy(xxhash64(col(textCol)).as("_digest"),
        xxhash64(lit(1L), col(textCol)).as("_digest2"))
      .agg(min_by(struct(cols.map(c => col(s"`$c`")).toIndexedSeq: _*),
        struct(col(s"`$idCol`"))).as("_kept"))
      // getField re-extraction marks every column nullable (the agg
      // output is); every kept row is a real input row, so restore the
      // input schema's non-nullable columns via AssertNotNull (provably
      // unreachable throw: groups are non-empty and the field was
      // non-nullable on input) — downstream schema-sensitive sinks
      // (parquet append, schema equality) see the exact input shape
      .select(cols.map { c =>
        val f = col("_kept").getField(c)
        if (df.schema(c).nullable) f.as(c)
        else org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
            org.apache.spark.sql.graft.ColumnBridge.expression(f))).as(c)
      }.toIndexedSeq: _*)
  }

  /** Hashed shingle set: distinct word n-grams -> xxhash64 -> sorted
    * array<long>. Computed scan-side ONCE per document; every downstream
    * set comparison is then a primitive merge ([[graft.functions.SortedLongJaccard]])
    * instead of string-array intersection — the representation that keeps
    * pair verification cheap at candidate-join scale.
    */
  private def hashedShingles(text: org.apache.spark.sql.Column, shingleSize: Int) =
    SeriesFunctions.shingleHashes(TextFunctions.tokens(text), shingleSize)

  /** MinHash+LSH near-duplicate candidate pairs, verified with exact
    * Jaccard over hashed word-shingle sets. Output: (id_a, id_b, jaccard)
    * with id_a < id_b, jaccard >= threshold, restricted to pairs sharing
    * >= 1 LSH band bucket.
    *
    * Shape at scale: signatures/bands are computed scan-side; the only
    * wide rows ever shuffled are (band, bucket, id) triples; candidate
    * ids join back to the (id, hashed-shingles) table for verification.
    *
    * Recall is 1 - (1 - j^r)^b for rowsPerBand r = numHashes/numBands and
    * b bands. r = 1 maximizes recall but does NOT scale on homogeneous
    * corpora: a band key is then one minhash value, and every document
    * whose shingle set contains the globally-minimal common shingle for
    * that hash function lands in ONE bucket — bucket sizes grow O(n) and
    * the bucket join degenerates toward n^2 (measured: 30x slowdown at
    * sf0.1). Higher r damps collision probability to j^r per band, which
    * matters on BOTH ends: common-shingle buckets shrink, and — the
    * dominant verification cost — mid-similarity pairs far below the
    * threshold stop colliding by chance across many bands (at r=2/b=48
    * the sf0.1 corpus passed 624k of its 12.5M pairs to exact
    * verification; r=3/b=32 on the same 96-hash signature passes 21k
    * with measured-identical verified output). Recall at r=3/b=32:
    * miss 8e-12 at j=0.82, 4e-4 at j=0.6, 1.4e-2 at j=0.5; verification
    * removes all false positives.
    *
    * @param roundDp when >= 0, ROUND the verified jaccard to this many
    *                decimals BEFORE applying the threshold — matches
    *                [[ngramJaccardPairs]]'s boundary behavior so the two
    *                operators agree pair-for-pair at full recall.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, numBands: Int = 16,
      threshold: Double = 0.5, roundDp: Int = -1): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    // materialize the (id, hashed-shingles) table ONCE (graft-owned
    // persist, lineage kept, InternalRow layer): the subtree is
    // referenced THREE times below — the bucket generation and both
    // verification join-backs — and each reference re-ran the
    // tokenize+shingle corpus scan (measured 3x the single-scan input
    // bytes in the byte census; the same corpus-proportional-redundancy
    // class the r16 TF-IDF fix closed). EAGER warm (count()): all three
    // references sit under one action whose independent subtrees AQE
    // schedules concurrently, and a cold persist lets them race to
    // compute the same partitions. Callers free the blocks eagerly with
    // Materialize.releaseOwned(result); eviction recomputes (lineage
    // kept).
    val docs = graft.core.Materialize.persistInternal(
      df.select(col(idCol).as("id"),
        hashedShingles(col(textCol), shingleSize).as("hs")))
    val nDocs = docs.count()
    // the persisted LogicalRDD reports no usable Catalyst size estimate
    // (the r12 lying-stats class), so the broadcast decisions the file
    // scans used to get for free are re-made here: verify join-backs
    // broadcast the shingle table while its MEASURED block-manager size
    // fits an executor (Knn.fitsBroadcast), and the bucket self-join
    // broadcasts one side while the EXACT banded row count — the warm
    // count() x numBands, at ~48 B per slim (band, bucket, id) row —
    // fits the same cap (gating that side on docs' measured bytes would
    // overestimate by the shingle-array width and flip it to sort-merge
    // decades early). Beyond the caps all three degrade to partitioned
    // sort-merge, the only executable shape at corpus scale.
    val bcDocs = Knn.fitsBroadcast(docs)
    val bcBuckets = Knn.broadcastCapBytes(df.sparkSession)
      .exists(nDocs * numBands * 48L <= _)
    def hint(frame: DataFrame, bc: Boolean) = if (bc) broadcast(frame) else frame
    val buckets = docs
      .select(col("id"),
        posexplode(SeriesFunctions.minhashBands(
          SeriesFunctions.minhash(col("hs"), numHashes), numBands))
          .as(Seq("band", "bucket")))
    val cand = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(hint(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
        bcBuckets), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val raw = SeriesFunctions.jaccardSorted(col("hs_a"), col("hs_b"))
    val verified = if (roundDp >= 0) round(raw, roundDp) else raw
    cand
      .join(hint(docs.select(col("id").as("id_a"), col("hs").as("hs_a")), bcDocs), "id_a")
      .join(hint(docs.select(col("id").as("id_b"), col("hs").as("hs_b")), bcDocs), "id_b")
      .select(col("id_a"), col("id_b"),
        SeriesFunctions.barrier(verified).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Band a `(id, sig)` frame into `nChunks` chunks of `chunkBits` bits
    * each, join candidates that agree on at least one exact chunk, and
    * verify to `hamming <= maxHamming`. Pigeonhole: any pair with
    * hamming <= nChunks - 1 differs in at most nChunks - 1 chunks, so it
    * MUST share one — exact recall at radius nChunks - 1 as long as the
    * chunks cover the signature. Shared by the 64-bit and portable
    * 59-bit variants; DedupSpec pins the guarantee with planted
    * signatures (a hamming-3 pair spread one-bit-per-chunk is only
    * reachable through a specific single chunk's band).
    */
  private[graft] def simhashBandPairs(
      docs: DataFrame, nChunks: Int, chunkBits: Int,
      maxHamming: Int): DataFrame = {
    val mask = (1L << chunkBits) - 1
    // materialize (id, sig) ONCE: the chunked frame below is consumed
    // by BOTH sides of the candidate self-join, and each side re-ran
    // the tokenize+simhash corpus scan (measured 2x single-scan input
    // bytes in the byte census — the corpus-proportional-redundancy
    // class the minhash/TF-IDF persists close). Slim rows (two longs);
    // lineage kept; callers free via Materialize.releaseOwned(result).
    val d = graft.core.Materialize.persistInternal(docs)
    val nSigs = d.count()
    val chunked = d.select(col("id"), col("sig"),
      posexplode(array((0 until nChunks).map { c =>
        shiftright(col("sig"), c * chunkBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    // exact-row-count broadcast re-decision (see minhashLshPairs): the
    // chunked frame is nChunks slim (chunk_idx, chunk, id, sig) rows per
    // signature, ~48 B each
    val bSide = if (Knn.broadcastCapBytes(docs.sparkSession)
        .exists(nSigs * nChunks * 48L <= _)) broadcast(b) else b
    a.join(bSide, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SeriesFunctions.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-duplicate pairs within a Hamming radius. Banding on
    * 4 x 16-bit chunks guarantees every pair with hamming <= 3 shares at
    * least one exact chunk (pigeonhole) — exact recall for radius <= 3.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      SeriesFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("sig"))
    simhashBandPairs(docs, nChunks = 4, chunkBits = 16, maxHamming)
  }

  /** [[simhashPairs]] with the PORTABLE 59-bit signature
    * ([[graft.functions.PortableSimHash59]]): banding on 4 x 15-bit
    * chunks keeps the pigeonhole guarantee (hamming <= 3 pairs share at
    * least one chunk), and every step is SQL-replayable — this variant
    * is driver-oracle-verified (q23); the xxhash64 one is the
    * better-mixed production default.
    */
  def simhashPairsPortable(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      SeriesFunctions.simhash59(TextFunctions.tokens(col(textCol))).as("sig"))
    simhashBandPairs(docs, nChunks = 4, chunkBits = 15, maxHamming)
  }

  /** Brute-force n-gram Jaccard similarity pairs (the exact oracle the
    * LSH paths approximate). O(n^2) — correctness baseline and small-table
    * path; at scale use [[minhashLshPairs]].
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    // spread BEFORE the shingle projection, not after: with the spread
    // above the projection the repartition exchange's map side ran the
    // whole tokenize+shingle pass in the one scan task; below it, the
    // shingle kernel runs post-exchange at cluster parallelism (and the
    // broadcast b-side build parallelizes the same way). barrier() on
    // the shingle expression is LOAD-BEARING: without it CollapseProject
    // inlines the single-use alias through the cross join and the
    // tokenize+shingle kernel re-runs once per PAIR — measured 20 s vs
    // 1.5 s on the sf0.1 corpus (the Knn prune cascade documents the
    // same hazard on its sketch projections).
    val docs = Partitioning.spread(
      df.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), SeriesFunctions.barrier(
        hashedShingles(col("_text"), shingleSize)).as("sh"))
    val a = docs.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SeriesFunctions.barrier(
          round(SeriesFunctions.jaccardSorted(col("sh_a"), col("sh_b")), 6)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance (Levenshtein) near-duplicate pairs under standard
    * BLOCKING: candidates are generated only within (blockCols,
    * length-bucket) groups, then verified with the exact kernel.
    * Blocking is part of the operator's DEFINITION (the universal
    * fuzzy-matching scale pattern — an unblocked O(n^2 * m^2) edit
    * distance over a corpus is not a plan): rows in non-adjacent length
    * buckets are never compared, and the oracle replays the same block
    * predicate.
    *
    * RECALL IS COMPLETE under `lengthBucket > maxDist`: every doc probes
    * its own AND the next length bucket, so a true pair (|Δlen| <=
    * maxDist, since |Δlen| lower-bounds the distance) can never straddle
    * a bucket boundary out of comparison — docs of length 49 and 51 at
    * bucket width 50 DO meet. Each pair is generated exactly once with
    * no dedup shuffle: same-bucket pairs via the id order, adjacent
    * pairs via the shorter doc's +1 probe only.
    *
    * `dist` is the FULL-TEXT distance: the sound `|Δlen| <= maxDist`
    * length prune runs first (free — lengths ride the block key), then
    * Spark's threshold-bounded `levenshtein(a, b, k)` abandons a pair
    * the moment its running distance exceeds `maxDist` — O(k * m) per
    * pair instead of O(m^2), with the exact distance as the output (a
    * prefix distance is neither a lower bound nor the advertised
    * semantics).
    *
    * Within a block the candidate join is equi (shuffles by block key +
    * bucket, no cross product across blocks); the probe-side explode
    * costs 2x candidate rows, not 2x comparisons (adjacent buckets only
    * meet where lengths allow).
    *
    * Output: (id_a, id_b, dist), id_a < id_b, dist <= maxDist.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], lengthBucket: Int,
      maxDist: Int = 3): DataFrame = {
    require(lengthBucket > maxDist,
      s"lengthBucket ($lengthBucket) must exceed maxDist ($maxDist): " +
        "adjacent-bucket probing is complete only when a true pair's " +
        "length gap (<= maxDist) cannot span a whole bucket")
    val base = df.select(
      (col(idCol).as("id") +:
        col(textCol).as("txt") +:
        length(col(textCol)).as("len") +:
        expr(s"length($textCol) div $lengthBucket").as("len_bucket") +:
        blockCols.map(col)): _*)
    // probe side: own + next bucket, so boundary pairs always meet
    val a = Partitioning.spread(base
      .withColumn("bucket", explode(array(col("len_bucket"), col("len_bucket") + 1)))
      .select((col("id").as("id_a") +: col("txt").as("txt_a") +:
        col("len").as("len_a") +: col("len_bucket").as("lb_a") +:
        col("bucket") +: blockCols.map(col)): _*))
    val b = base.select(
      (col("id").as("id_b") +: col("txt").as("txt_b") +:
        col("len").as("len_b") +: col("len_bucket").as("bucket") +:
        blockCols.map(col)): _*)
    a.join(b, "bucket" +: blockCols)
      // exactly-once orientation: same-bucket pairs once by id order,
      // boundary pairs once via the lower doc's +1 probe (the reverse
      // orientation's probe set misses by construction)
      .filter((col("lb_a") === col("bucket") && col("id_a") < col("id_b")) ||
        col("lb_a") + 1 === col("bucket"))
      // sound prune: |Δlen| lower-bounds the edit distance
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        levenshtein(col("txt_a"), col("txt_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Duplicate CLUSTERS: connected components over the near-duplicate
    * pair graph, labeled by the smallest member id. Iterative min-label
    * propagation (Pregel-style) with pointer-jumping label compression
    * each round, so convergence is O(log component diameter) — a
    * duplicate CHAIN (incremental edits of one document, diameter ~n)
    * converges in ~log2(n) rounds where the plain edge-hop loop needed
    * n and silently returned fragmented labels past `maxIterations`
    * (now a loud IllegalStateException instead). `localCheckpoint` per
    * round keeps the lineage flat at scale.
    *
    * Edge generation defaults to the LSH path ([[minhashLshPairs]] at
    * rowsPerBand=2: sum-of-bucket-squared candidate cost with
    * quadratically-damped bucket sizes, exact-Jaccard-verified edges) —
    * the 100 TB shape. `useLsh = false` selects the O(n^2) brute-force
    * generator for small-table / oracle-parity runs; both produce
    * identical edges on real near-dup profiles (pinned in DedupSpec and
    * by q27's oracle hash-match).
    *
    * Recall caveat: the default banding's per-pair miss probability is
    * (1 - j^3)^numBands — negligible above j ~ 0.6, but a LOW threshold
    * with many pairs sitting near it fragments clusters silently. For
    * such workloads lower rowsPerBand by raising numBands (numHashes =
    * 2 * numBands) or pass `useLsh = false`.
    *
    * Output: (id, cluster_id) for EVERY input row (singletons keep their
    * own id).
    */
  def duplicateClusters(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 2, threshold: Double = 0.5,
      maxIterations: Int = 20, useLsh: Boolean = true,
      numHashes: Int = 96, numBands: Int = 32): DataFrame = {
    val edges = (
      if (useLsh)
        minhashLshPairs(df, idCol, textCol, shingleSize,
          numHashes = numHashes, numBands = numBands,
          threshold = threshold, roundDp = 6)
      else ngramJaccardPairs(df, idCol, textCol, shingleSize, threshold))
      .select(col("id_a"), col("id_b"))
    // ONE evaluation of the edge pipeline, not two: the two-direction
    // union referenced `edges` twice, re-running the whole candidate
    // join + exact verification per direction — explode emits both
    // orientations from a single pass
    val und = edges.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // und is materialized (localCheckpoint is eager): the LSH path's
    // internal shingle-table persist has served all its readers — free
    // it now (registry-only; a no-op for the brute-force path)
    graft.core.Materialize.releaseOwned(edges)
    var labels = df.select(col(idCol).as("id"))
      .withColumn("label", col("id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val neighborMin = und
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      val hop = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // Pointer-jumping compression: label := min(label, label(label)).
      // Labels are always node ids, so one self-join per round resolves
      // each node's label through its label's OWN current label — the
      // edge hop alone moves the component minimum ONE step per round,
      // which on a duplicate CHAIN of diameter d (incremental edits of
      // one document) needs d rounds and silently exceeded
      // maxIterations; with compression the path halves each round and
      // convergence is O(log d) (60-chain: 40 wrong labels before, 1
      // after, regression-pinned in DedupSpec).
      // localCheckpoint is eager: once `next` exists its blocks are
      // materialized, so round N-1's labels can release immediately —
      // without this every iteration leaks a block set into the session
      val next = hop
        .join(hop.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.filter(col("label") =!= col("old")).isEmpty
      graft.core.Materialize.releaseCheckpoint(labels)
      labels = next.select("id", "label")
      iter += 1
    }
    if (!converged) {
      // Convergence above is only OBSERVED by a full no-change round, so
      // a labeling that reaches its fixed point exactly on the final
      // permitted iteration (or a trivially-converged input under
      // maxIterations = 0) arrives here correct. One verification pass
      // checks the fixed-point property directly — no node has a
      // neighbor with a smaller label — before declaring failure, so
      // only genuinely unconverged labelings throw.
      val neighborMin = und
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      converged = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "inner")
        .filter(col("nmin") < col("label")).isEmpty
    }
    if (!converged) {
      graft.core.Materialize.releaseCheckpoint(und)
      graft.core.Materialize.releaseCheckpoint(labels)
      // a partially-propagated labeling is silently WRONG (nodes far
      // from their component's minimum keep interim labels) — fail loud
      throw new IllegalStateException(
        s"duplicateClusters: label propagation did not converge within " +
          s"$maxIterations iterations (component diameter > ~2^$maxIterations " +
          "after compression — raise maxIterations)")
    }
    // the edge set is loop-internal — the returned frame references only
    // the final labels checkpoint, so und's blocks release here
    graft.core.Materialize.releaseCheckpoint(und)
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Embedding near-duplicate pairs by cosine similarity. Brute-force
    * pair generation with broadcast — the exact baseline;
    * [[embeddingNearDupPairsLsh]] is the billion-row path.
    *
    * @param roundDp when >= 0, round the cosine before thresholding (so
    *                boundary pairs match oracle rounding semantics)
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, roundDp: Int = -1): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val a = Partitioning.spread(v.select(col("id").as("id_a"), col("v").as("v_a")))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"))
    val raw = SeriesFunctions.cosine(col("v_a"), col("v_b"))
    val sim = if (roundDp >= 0) round(raw, roundDp) else raw
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SeriesFunctions.barrier(sim).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Scale path for embedding near-dup: sign-LSH bucketed candidate
    * generation (Charikar 2002 random hyperplanes — collision
    * probability per table is (1 - theta/pi)^bits, so HIGH-similarity
    * pairs collide reliably), exact cosine verification of candidates.
    * Shuffle keys are (table, bucket, id) — vectors join back by id only
    * for the verification of candidate pairs, never all-pairs.
    *
    * Recall for a pair at angle theta: 1 - (1 - (1-theta/pi)^bits)^tables.
    * Defaults (bits=6, tables=8) give ~99.8% at cos 0.95 and ~97% at
    * cos 0.9; raise `tables` to tighten. Output is a verified SUBSET of
    * [[embeddingNearDupPairs]] (no false positives, by construction).
    */
  def embeddingNearDupPairsLsh(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, bits: Int = 6, tables: Int = 8,
      seed: Long = 42L, roundDp: Int = -1): DataFrame = {
    // materialize (id, vector) ONCE — this is the billion-row path, and
    // the frame is referenced by the bucketing subtree AND both
    // verification join-backs; without the persist each reference
    // re-scans the embedding corpus (same redundancy class as the
    // minhash/simhash persists above). Lineage kept; callers free via
    // Materialize.releaseOwned(result).
    val v = graft.core.Materialize.persistInternal(
      df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")))
    val nVecs = v.count()
    // measured-size broadcast re-decision for the vector join-backs and
    // exact-row-count gate for the slim bucket self-join (see
    // minhashLshPairs): one ~48 B (table, bucket, id) row per table per
    // vector — gating on v's measured bytes would overestimate by the
    // vector width
    val bcV = Knn.fitsBroadcast(v)
    val bcSlim = Knn.broadcastCapBytes(df.sparkSession)
      .exists(nVecs * tables * 48L <= _)
    def hint(frame: DataFrame, bc: Boolean) = if (bc) broadcast(frame) else frame
    val bucketed = Partitioning.spread(v).select(col("id"), col("v"),
      posexplode(array((0 until tables).map(t =>
        SimilaritySearch.signBucket(col("v"), dim, bits, seed + t)): _*))
        .as(Seq("table", "bucket")))
    val slim = bucketed.select(col("table"), col("bucket"), col("id"))
    val cand = slim.select(col("table"), col("bucket"), col("id").as("id_a"))
      .join(hint(slim.select(col("table"), col("bucket"), col("id").as("id_b")),
        bcSlim), Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val raw = SeriesFunctions.cosine(col("v_a"), col("v_b"))
    val sim = if (roundDp >= 0) round(raw, roundDp) else raw
    cand
      .join(hint(v.select(col("id").as("id_a"), col("v").as("v_a")), bcV), "id_a")
      .join(hint(v.select(col("id").as("id_b"), col("v").as("v_b")), bcV), "id_b")
      .select(col("id_a"), col("id_b"), SeriesFunctions.barrier(sim).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
