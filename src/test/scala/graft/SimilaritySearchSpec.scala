package graft

import graft.functions.Kernels
import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(42)
  private val corpusData: Seq[(Long, Array[Double])] =
    (1 to 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  private val queryData: Seq[(Long, Array[Double])] =
    (1001 to 1010).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))

  private lazy val corpus = corpusData.toDF("item_id", "item_vec")
  private lazy val queries = queryData.toDF("query_id", "query_vec")

  private def bruteOracle(k: Int): Map[Long, Seq[Long]] =
    queryData.map { case (qid, qv) =>
      qid -> corpusData
        .map { case (id, v) => (-Kernels.cosine(qv, v), id) }
        .sorted.take(k).map(_._2)
    }.toMap

  test("bruteForceTopK matches in-memory oracle (ordering + ids)") {
    val got = SimilaritySearch.bruteForceTopK(queries, corpus, 5)
      .orderBy("query_id", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got === bruteOracle(5))
  }

  test("lshTopK achieves reasonable recall vs brute force") {
    val exact = bruteOracle(5)
    val approx = SimilaritySearch.lshTopK(queries, corpus, 5, dim = dim,
      bits = 6, tables = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, ids) =>
      val found = approx.getOrElse(q, Set.empty)
      ids.count(found.contains).toDouble / ids.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"mean recall $meanRecall")
  }

  test("lshTopK results are a subset ranking consistent with cosine") {
    val rows = SimilaritySearch.lshTopK(queries, corpus, 5, dim = dim,
      bits = 6, tables = 8).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivfTopK: good recall with partial probing, perfect with full probing") {
    val exact = bruteOracle(5)
    val partial = SimilaritySearch.ivfTopK(queries, corpus, 5,
      numCells = 8, probes = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, ids) =>
      ids.count(partial.getOrElse(q, Set.empty).contains).toDouble / ids.size
    }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.sum / recalls.size}")
    // probing every cell degenerates to exact brute force
    val full = SimilaritySearch.ivfTopK(queries, corpus, 5,
      numCells = 8, probes = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(full === exact)
  }

  test("IVF fit survives dirty corpus rows (null id / null vec) and " +
      "names the contract on ragged dimensions") {
    // one null item_id and one null item_vec among clean rows: both
    // previously NPE'd the driver-side collect inside the fit — they
    // must be excluded from the FIT, leaving centroids (and search
    // results) identical to the clean corpus's
    val dirty = corpusData.map { case (id, v) => (java.lang.Long.valueOf(id), v) } ++
      Seq((java.lang.Long.valueOf(9999L), null.asInstanceOf[Array[Double]]),
        (null.asInstanceOf[java.lang.Long], Array.fill(dim)(0.5)))
    val dirtyDf = dirty.toDF("item_id", "item_vec")
    val clean = SimilaritySearch.fitOrGetCentroids(corpus, numCells = 8, refit = true)
    val got = SimilaritySearch.fitOrGetCentroids(dirtyDf, numCells = 8, refit = true)
    assert(got.map(_.toSeq).toSeq === clean.map(_.toSeq).toSeq,
      "dirty rows must not shape (or crash) the coarse-quantizer fit")
    // ragged vectors: k-means is undefined — the failure must name the
    // contract, not throw ArrayIndexOutOfBounds from the Lloyd loop
    val ragged = (corpusData :+ (9998L, Array(1.0, 2.0)))
      .toDF("item_id", "item_vec")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.fitOrGetCentroids(ragged, numCells = 8, refit = true)
    }
    assert(e.getMessage.contains("fixed-dimension"),
      s"ragged-dim failure must be routable, got: ${e.getMessage}")
  }

  test("int8TopK: quantization bounded to [-127,127]; rerank ranking consistent") {
    val quantized = SimilaritySearch.withInt8(
      corpus.select($"item_id", $"item_vec".cast("array<double>").as("item_vec")),
      "item_vec", "q8")
      .select($"q8").collect()
    quantized.foreach { r =>
      val arr = r.getSeq[Byte](0)
      assert(arr.forall(b => b >= -127 && b <= 127))
      assert(arr.exists(b => math.abs(b.toInt) == 127)) // scale anchors the max
    }
    val rows = SimilaritySearch.int8TopK(queries, corpus, 5, rerankFactor = 4).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length === 5)
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("int8TopK: high recall vs exact brute force; full-corpus prefilter is exact") {
    val exact = bruteOracle(5)
    val approx = SimilaritySearch.int8TopK(queries, corpus, 5, rerankFactor = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, ids) =>
      ids.count(approx.getOrElse(q, Set.empty).contains).toDouble / ids.size
    }
    assert(recalls.sum / recalls.size >= 0.8,
      s"mean recall ${recalls.sum / recalls.size}")
    // a rerank window covering the whole corpus degenerates to exact
    val full = SimilaritySearch.int8TopK(queries, corpus, 5,
      rerankFactor = corpusData.size)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(full === exact)
  }

  test("graft_cosine_i8 is bit-identical to cast-to-double + graft_cosine") {
    val quantized = SimilaritySearch.withInt8(
      corpus.select($"item_id", $"item_vec".cast("array<double>").as("item_vec")),
      "item_vec", "v8")
    val pairs = quantized.select($"item_id".as("ia"), $"v8".as("a8"))
      .crossJoin(quantized.select($"item_id".as("ib"), $"v8".as("b8")))
      .limit(2000)
      .select(
        call_function("graft_cosine_i8", $"a8", $"b8").as("native"),
        call_function("graft_cosine",
          $"a8".cast("array<double>"), $"b8".cast("array<double>")).as("cast_path"))
      .collect()
    // exact equality, not tolerance: int8 products and their partial sums
    // are integers far below 2^53, so both paths round identically
    pairs.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // zero-norm guard parity (Seq[Byte], not Array[Byte] — the latter
    // encodes as BINARY rather than array<tinyint>)
    val z = Seq((Seq[Byte](0, 0), Seq[Byte](1, 2))).toDF("a", "b")
      .select(call_function("graft_cosine_i8", $"a", $"b")).collect()
    assert(z(0).getDouble(0) === 0.0)
  }

  test("signBucket is deterministic across invocations") {
    val b1 = corpus.select(SimilaritySearch.signBucket($"item_vec".cast("array<double>"), dim, 8, 42L).as("b")).collect()
    val b2 = corpus.select(SimilaritySearch.signBucket($"item_vec".cast("array<double>"), dim, 8, 42L).as("b")).collect()
    assert(b1.map(_.getLong(0)).toSeq === b2.map(_.getLong(0)).toSeq)
  }
}
