package graft.operators

import graft.functions.SeriesFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; broadcast corpus or
  * partitioned crossJoin). Scale path: random-hyperplane LSH (Charikar
  * 2002) — bucket by sign-pattern of seeded projections, search only
  * within matching buckets (optionally multi-probe via several tables).
  */
object SimilaritySearch {

  /** Exact top-k by cosine similarity.
    * queries: (query_id, query_vec); corpus: (item_id, item_vec).
    * Output: (query_id, rank, item_id, cos).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("query_id"), col("query_vec").cast("array<double>").as("qv"))
    val c = corpus.select(col("item_id"), col("item_vec").cast("array<double>").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    Partitioning.spread(q).crossJoin(broadcast(c))
      .select(col("query_id"), col("item_id"),
        SeriesFunctions.cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), col("cos"))
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus with KMeans
    * centroids, probe each query's `probes` nearest cells, rerank exactly
    * within the probed cells. The standard coarse-quantization trade:
    * cost ~ n * (probes / numCells) per query instead of n.
    *
    * The centroid fit runs on a BOUNDED seeded sample (`maxFitRows`) —
    * at 100 TB, k-means quality saturates long before the corpus size,
    * and a full-corpus fit would iterate MLlib over every vector per
    * call. Pre-fit centroids can be passed via [[ivfTopKWithCentroids]]
    * (they enter the plan as literals, broadcast with the task binary).
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numCells: Int = 16, probes: Int = 4, seed: Long = 42L,
      maxFitRows: Long = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col("item_id"), col("item_vec").cast("array<double>").as("cv"))
    val total = c.count()
    val fitSet =
      if (total > maxFitRows)
        c.sample(withReplacement = false, maxFitRows.toDouble / total, seed)
      else c
    val km = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("fv").setMaxIter(10)
      .fit(fitSet.select(array_to_vector(col("cv")).as("fv")))
    ivfTopKWithCentroids(queries, corpus, k, km.clusterCenters.map(_.toArray), probes)
  }

  /** IVF probe/rerank against externally-fit (or sampled-fit) centroids. */
  def ivfTopKWithCentroids(
      queries: DataFrame, corpus: DataFrame, k: Int,
      centers: Array[Array[Double]], probes: Int = 4): DataFrame = {
    val c = corpus.select(col("item_id"), col("item_vec").cast("array<double>").as("cv"))
    val q = queries.select(col("query_id"), col("query_vec").cast("array<double>").as("qv"))
    def centerLit(ctr: Array[Double]) = array(ctr.map(lit).toIndexedSeq: _*)
    // corpus side: argmin cell (array_min over (dist, idx) structs)
    def cellOf(vec: org.apache.spark.sql.Column) =
      array_min(array(centers.zipWithIndex.map { case (ctr, i) =>
        struct(SeriesFunctions.sqdist(vec, centerLit(ctr)).as("d"), lit(i).as("idx"))
      }.toIndexedSeq: _*)).getField("idx")
    // query side: the `probes` nearest cells
    def probeCells(vec: org.apache.spark.sql.Column) =
      transform(
        slice(array_sort(array(centers.zipWithIndex.map { case (ctr, i) =>
          struct(SeriesFunctions.sqdist(vec, centerLit(ctr)).as("d"), lit(i).as("idx"))
        }.toIndexedSeq: _*)), 1, probes),
        s => s.getField("idx"))
    val cCells = c.withColumn("cell", SeriesFunctions.barrier(cellOf(col("cv"))))
    val qCells = Partitioning.spread(q)
      .select(col("query_id"), col("qv"),
        explode(SeriesFunctions.barrier(probeCells(col("qv")))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    qCells.join(cCells, "cell")
      .select(col("query_id"), col("item_id"),
        SeriesFunctions.cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), col("cos"))
  }

  /** Deterministic seeded random hyperplanes (driver-side, tiny).
    * `private[graft]` so the oracle-SQL builder can embed the SAME planes
    * as literals (java.util.Random#nextGaussian is algorithmically
    * specified, so these are stable across JVMs).
    */
  private[graft] def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id for each vector: `bits`-bit code from the signs of
    * projections onto seeded hyperplanes. Pure built-ins: the hyperplane
    * matrix enters the plan as literals (broadcast with the task binary).
    */
  def signBucket(vec: org.apache.spark.sql.Column, dim: Int, bits: Int, seed: Long): org.apache.spark.sql.Column = {
    val planes = hyperplanes(dim, bits, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val proj = SeriesFunctions.dotProduct(vec,
        array(p.map(x => lit(x)).toIndexedSeq: _*))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: co-bucket queries and corpus across
    * `tables` independent hash tables, rerank exactly within candidates.
    * Recall grows with `tables`; cost ~ n * avgBucketSize * tables instead
    * of n^2.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, bits: Int = 12, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val q = queries.select(col("query_id"), col("query_vec").cast("array<double>").as("qv"))
    val c = corpus.select(col("item_id"), col("item_vec").cast("array<double>").as("cv"))
    val qb = Partitioning.spread(q).select(col("query_id"), col("qv"),
      posexplode(array((0 until tables).map(t =>
        signBucket(col("qv"), dim, bits, seed + t)): _*)).as(Seq("table", "bucket")))
    val cb = c.select(col("item_id"), col("cv"),
      posexplode(array((0 until tables).map(t =>
        signBucket(col("cv"), dim, bits, seed + t)): _*)).as(Seq("table", "bucket")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    qb.join(cb, Seq("table", "bucket"))
      .select(col("query_id"), col("item_id"),
        SeriesFunctions.cosine(col("qv"), col("cv")).as("cos"))
      .groupBy(col("query_id"), col("item_id")).agg(max(col("cos")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), col("cos"))
  }
}
