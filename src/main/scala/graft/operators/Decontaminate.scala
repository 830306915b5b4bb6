package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination: flag training documents that share any word
  * n-gram with a held-out evaluation set — the standard pre-training
  * hygiene step (benchmark answers leaking into the training corpus
  * inflate downstream eval scores), run before training data ships.
  *
  * Shape at 100 TB: the eval side is a benchmark suite — thousands of
  * documents, MBs of text — while the train side is the corpus. Both
  * sides reduce to DISTINCT n-grams per document scan-side (tokenize →
  * the native [[graft.functions.WordNgrams]] codegen kernel); the
  * contamination test is then a join on the gram string. While the eval
  * gram set fits the broadcast budget (the measured-size decision
  * [[Knn.fitsBroadcast]], same discipline as every pair join in this
  * engine) the corpus grams never shuffle — each scan task probes the
  * broadcast gram set and only (doc_id, gram) HITS survive to the
  * per-document count. An oversize eval set degrades to a shuffle join
  * keyed on the gram string: still slim rows (id + gram), never document
  * payloads.
  *
  * Caveat the broadcast decision inherits: a file-relation estimate
  * under-reports the gram frame by up to ~n× (the positional explosion
  * multiplies text bytes n-fold, which plan stats cannot see). The
  * budget floor is 64 MB against benchmark suites measured in MBs, so
  * the margin absorbs it; at the margin the operator errs into the
  * (correct, scalable) shuffle path only when the estimate crosses the
  * full threshold.
  */
object Decontaminate {

  /** Distinct word n-grams per document as (idCol, gram) rows. Documents
    * with fewer than n tokens contribute none. Gram generation is the
    * native [[graft.functions.WordNgrams]] kernel (one codegen'd pass,
    * distinctness included): the declarative HOF form —
    * `transform(sequence(...), i -> concat_ws(' ', slice(tk, i, n)))` —
    * evaluates interpreted per position and measured ~4 ms/doc, which at
    * corpus scale is the whole job (the q73 lesson).
    */
  private[graft] def docGrams(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_tk"))
      .select(col(idCol),
        explode(call_function("graft_word_ngrams", col("_tk"), lit(n)))
          .as("gram"))
  }

  /** Contaminated training documents: one row per train document sharing
    * at least one word n-gram with `evalSet`, with the count of DISTINCT
    * shared grams (both sides deduped per document, so the count is a
    * set-intersection size — batch-order-free and oracle-replayable).
    * Output: (idCol, n_shared).
    */
  def contaminated(
      train: DataFrame, evalSet: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 8): DataFrame = {
    // spread BEFORE the gram explosion: a single-file corpus stage would
    // otherwise run the ~n-per-token explosion + join + agg on one task
    // (the explode multiplies rows, not partitions)
    val evalGrams = docGrams(Partitioning.spread(evalSet), idCol, textCol, n)
      .select(col("gram")).distinct()
    val trainGrams = docGrams(Partitioning.spread(train), idCol, textCol, n)
    val hits =
      if (Knn.fitsBroadcast(evalGrams)) trainGrams.join(broadcast(evalGrams), "gram")
      else trainGrams.join(evalGrams, "gram")
    hits.groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
  }
}
