package graft

import org.apache.spark.sql.Row

/** Randomized metamorphic fuzz for the VECTOR-SEMANTICS leftovers —
  * q34 (series stats), q36 (whole-vector-equality join), q65 (k-fold
  * CV), q66 (z-order layout key) — completing the fuzz program's
  * coverage of every generatively-testable gate family. The driver's
  * embeddings are clean fixed-width NaN-free vectors, so the
  * representation edges these operators own were pinned only by
  * construction:
  *
  *  - q36 joins on EQUALITY of an array<double> key: ±0.0 and NaN
  *    planted in otherwise-identical vectors probe Catalyst's
  *    floating-point key normalization (NormalizeFloatingNumbers:
  *    -0.0 → 0.0 and NaN == NaN inside join keys — the OPPOSITE of
  *    scalar SQL comparison semantics), and a null vector must match
  *    nothing;
  *  - q66 quantizes embedding dims through `floor(least(greatest(
  *    (v+1)/2*256, 0), 255))`: NaN flows NaN through greatest (NaN is
  *    greatest) and then LOSES least against 255 → bucket 255; an
  *    out-of-range index on a short/null vector yields a null that
  *    greatest SKIPS (Spark and DuckDB alike) — the clamp resurrects it
  *    as bucket 0, never null; ±1.0 and ±1.25 pin the clamp edges
  *    exactly (quarter multiples keep the arithmetic exact);
  *  - q65's min_by over struct(dist, tid): a NULL distance (null
  *    vector on either side) sorts FIRST and silently WINS the
  *    nearest-neighbor pick — pinned, plus NaN-distance ranks last,
  *    cross-fold identical vectors (dist 0.0 exact, tid tie-break),
  *    and fold-residue assignment via pmod;
  *  - q34's max(size): null embeddings skipped, empty arrays count 0.
  *
  * Brute references replicate the engine kernels bit-for-bit
  * (Kernels.sqdist's min-length prefix + tail-to-zero extension on
  * float→double-cast values) — independent of Spark and DuckDB.
  */
private[graft] case class FzVec(vec_id: Long, embedding: Array[Float],
    label: Int)

class MetamorphicVectorSpec extends SparkTestBase {

  private val SEEDS = 80
  private val FOLDS = 5

  private def genSeed(s: Int): Vector[FzVec] = {
    val rng = new scala.util.Random(FuzzStage.seedOffset + 0x7EC70A5L + s)
    var idx = 0
    def nid(): Long = { val i = s.toLong * 100 + idx; idx += 1; i }
    def lbl(): Int = rng.nextInt(4)
    def qv(): Float = (rng.nextInt(11) - 5) * 0.25f // [-1.25, 1.25]
    def vec(n: Int): Array[Float] = Array.fill(n)(qv())
    val out = Vector.newBuilder[FzVec]
    val bases = Vector.fill(3 + rng.nextInt(3))(vec(4 + rng.nextInt(5)))
    bases.foreach(b => out += FzVec(nid(), b, lbl()))
    // exact duplicate vectors (q36 pair counting; q65 zero-dist tie) —
    // idx advance puts the clones in different fold residues
    locally {
      val b = bases(rng.nextInt(bases.size))
      out += FzVec(nid(), b.clone(), lbl())
      out += FzVec(nid(), b.clone(), lbl())
    }
    // ±0.0 pair: identical but for the sign of zero at position 0
    locally {
      val b = vec(4 + rng.nextInt(3)); b(0) = 0.0f
      val c = b.clone(); c(0) = -0.0f
      out += FzVec(nid(), b, lbl())
      out += FzVec(nid(), c, lbl())
    }
    // NaN pair: identical vectors both carrying NaN at the same slot
    if (s % 2 == 0) {
      val b = vec(5); b(s % b.length) = Float.NaN
      out += FzVec(nid(), b, lbl())
      out += FzVec(nid(), b.clone(), lbl())
    }
    // clamp edges for q66: first two dims at exactly ±1.0 / ±1.25
    out += FzVec(nid(), Array(1.0f, -1.0f) ++ vec(2), lbl())
    out += FzVec(nid(), Array(1.25f, -1.25f) ++ vec(2), lbl())
    // short vectors: q66's get(embedding, 1) (and 0) go null
    out += FzVec(nid(), vec(1), lbl())
    if (s % 3 == 0) out += FzVec(nid(), Array.empty[Float], lbl())
    // null embedding: q36 matches nothing; q65 null-dist pairs
    if (s % 4 == 0) out += FzVec(nid(), null, lbl())
    out.result()
  }

  private lazy val vecs: Vector[FzVec] = (0 until SEEDS).flatMap(genSeed).toVector

  private def stage(vs: Vector[FzVec]): String = {
    import spark.implicits._
    FuzzStage.stage("graft_meta_vec", "embeddings" -> vs.toDF())
  }

  private lazy val fuzzDir: String = stage(vecs)
  private lazy val permDir: String =
    stage(new scala.util.Random(FuzzStage.seedOffset + 20260814L).shuffle(vecs))

  private def run(name: String, dir: String = null): Array[Row] =
    SparkEntry.queries(name)(spark, if (dir == null) fuzzDir else dir).collect()

  private def r6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("vector fuzz generator: the corpus exercises every probed class") {
    val nan = vecs.count(v => v.embedding != null && v.embedding.exists(_.isNaN))
    val negZero = vecs.count(v => v.embedding != null &&
      v.embedding.exists(x => x == 0.0f && (1f / x) < 0f))
    val dups = vecs.filter(_.embedding != null)
      .groupBy(_.embedding.toSeq).count(_._2.size > 1)
    val short1 = vecs.count(v => v.embedding != null && v.embedding.length == 1)
    val empty = vecs.count(v => v.embedding != null && v.embedding.isEmpty)
    val nulls = vecs.count(_.embedding == null)
    val clampHi = vecs.count(v => v.embedding != null && v.embedding.headOption.contains(1.25f))
    val folds = vecs.map(_.vec_id % FOLDS).distinct.size
    assert(nan > 0 && negZero > 0 && dups > 0, "q36 key classes missing")
    assert(short1 > 0 && empty > 0 && nulls > 0, "short/empty/null classes missing")
    assert(clampHi > 0, "clamp-edge plants missing")
    assert(folds == FOLDS, s"only $folds fold residues populated")
    info(s"adequacy: nan=$nan negZero=$negZero dupGroups=$dups short1=$short1 " +
      s"empty=$empty null=$nulls clampHi=$clampHi folds=$folds")
  }

  test("q34 series stats: max length skips nulls, counts every row") {
    val r = run("q34_series_stats").head
    val lens = vecs.filter(_.embedding != null).map(_.embedding.length)
    assert((r.getLong(0), r.getLong(1)) ==
      (lens.max.toLong, vecs.size.toLong),
      s"q34 drift: engine=(${r.getLong(0)},${r.getLong(1)}) " +
        s"brute=(${lens.max},${vecs.size})")
  }

  /** Join-key canonicalization under NormalizeFloatingNumbers: -0.0 →
    * +0.0 and NaN one canonical value, element-wise.
    */
  private def canon(v: Array[Float]): Seq[Long] =
    v.toSeq.map { f =>
      val d = f.toDouble
      java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d) // NaN canonical via doubleToLongBits
    }

  test("q36 vector-equality join: ±0.0 and NaN normalize inside the key") {
    val groups = vecs.filter(_.embedding != null).groupBy(v => canon(v.embedding))
    val want = groups.values.map(g => g.size.toLong * g.size).sum
    val got = run("q36_vector_equality_join").head.getLong(0)
    assert(got == want, s"q36 pair count drift: engine=$got brute=$want")
  }

  test("q66 z-order: clamps, NaN->255, missing dims resurrect as bucket 0") {
    // a missing dim (short/null vector) makes the scaled value null, and
    // greatest SKIPS nulls (Spark and DuckDB alike) — so the clamp
    // resurrects null as 0.0 and the row lands in bucket 0, never null.
    // Benign for a LAYOUT key (clustering only, no correctness surface)
    // and oracle-consistent; pinned here so a change would be loud.
    def q8(v: Array[Float], i: Int): Long =
      if (v == null || i >= v.length) 0L
      else {
        val scaled = (v(i).toDouble + 1.0) / 2.0 * 256.0
        val g = if (scaled.isNaN) Double.NaN else math.max(scaled, 0.0)
        val l = if (g.isNaN) 255.0 else math.min(g, 255.0) // least(NaN,255)=255
        math.floor(l).toLong
      }
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val want = vecs.sortBy(_.vec_id).map { v =>
      val x = q8(v.embedding, 0); val y = q8(v.embedding, 1)
      val z = morton(x, y)
      (v.vec_id, x, y, z, z >> 6)
    }
    val got = run("q66_zorder").map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toVector
    assert(got == want, {
      val bad = got.zip(want).filter(p => p._1 != p._2).take(5)
      s"q66 disagreed with brute reference: $bad"
    })
  }

  test("q65 k-fold CV: per-fold 1-NN accuracy matches brute, null vectors " +
      "never win (and a vectorless test row counts incorrect)") {
    // Kernels.sqdist replica on float->double-cast values
    def dist(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      var j = n
      while (j < a.length) { s += a(j).toDouble * a(j).toDouble; j += 1 }
      while (j < b.length) { s += b(j).toDouble * b(j).toDouble; j += 1 }
      math.sqrt(s)
    }
    // NULL-dist pairs (a null vector on either side) are EXCLUDED from
    // the candidate set — the engine filters them before min_by (a null
    // ordering-struct field would sort FIRST and one dirty train row
    // would hijack every prediction); a test row left with no real
    // candidate keeps a null prediction and counts incorrect. NaN dists
    // remain candidates and sort LAST (Spark ordering).
    def distKey(x: Double): (Int, Double) =
      if (x.isNaN) (2, 0.0) else (1, x)
    val byFold = vecs.groupBy(v => v.vec_id % FOLDS)
    val want = byFold.toVector.map { case (f, rows) =>
      val train = vecs.filter(v => v.vec_id % FOLDS != f && v.embedding != null)
      val correct = rows.map { r =>
        val cands = if (r.embedding == null) Vector.empty else train
        if (cands.isEmpty) 0.0
        else {
          val best = cands.minBy(t => (distKey(dist(r.embedding, t.embedding)), t.vec_id))
          if (best.label == r.label) 1.0 else 0.0
        }
      }
      (f, r6(correct.sum / rows.size), rows.size.toLong)
    }
    val got = run("q65_kfold_cv").map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2))).toVector
    assert(got.toSet == want.toSet && got.size == want.size,
      s"q65 disagreed: engine-only=${got.toSet -- want.toSet} " +
        s"brute-only=${want.toSet -- got.toSet}")
  }

  test("vector family is invariant under input row-order permutation") {
    for (q <- Seq("q34_series_stats", "q36_vector_equality_join",
        "q65_kfold_cv", "q66_zorder")) {
      val a = run(q).toSeq
      val b = run(q, permDir).toSeq
      assert(a == b, s"$q changed under input permutation")
    }
  }
}
