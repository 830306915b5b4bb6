package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document table — the standard
  * quality/topic signal a training-data pipeline derives before
  * filtering or clustering a corpus.
  *
  * Scale shape: one shuffle to (doc, term) for term frequencies, one to
  * (term) for document frequencies, a join back on term (broadcastable
  * when the vocabulary fits — vocabularies grow sublinearly in corpus
  * size), and a per-doc window for the top-k cut. The corpus size
  * enters as a broadcast scalar, never a single-partition window.
  *
  * Scoring: smoothed idf, `tfidf = tf * (ln((N+1)/(df+1)) + 1)`,
  * ROUNDED to 6 decimals before ranking so the ordering is stable
  * across engines (near-ties become exact ties, broken by term).
  */
object Tfidf {

  /** Top-`k` terms per document by tf-idf.
    * Output: (id, rank, term, tfidf), rank 1..k per document.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tfidf"))
  }
}
