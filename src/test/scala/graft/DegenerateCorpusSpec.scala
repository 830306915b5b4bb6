package graft

import org.scalatest.BeforeAndAfterAll

/** Degenerate-corpus gate: every declared query must COMPLETE (no crash)
  * on three first-class corpus shapes — an EMPTY corpus (all ten tables
  * zero rows, schemas intact), a ONE-ROW corpus (each table truncated to
  * its first row, so most derived splits/joins are empty on one side or
  * both), and an ALL-NULL corpus (rows present, every column a typed
  * null — "a row does not imply its fields"). A fourth, targeted shape
  * pins q37's PLANTED-NULL measure semantics against its oracle SQL.
  *
  * Why this is a first-class scale contract and not an edge case: at
  * 100 TB the engine's operators routinely run against filter chains,
  * partition prunes, and retention windows that empty out a slice of
  * every one of these tables. An operator that only works when data is
  * present ("fit needs rows", "schema inference needs a file") is a
  * production incident at exactly the moment a tenant onboards, a
  * filter typo lands, or a backfill starts from zero. The gate had only
  * ever run against well-formed sf corpora; the first run of this probe
  * found two real crashes (round-12 bug pair): the IVF coarse-quantizer
  * fit threw `requirement failed` on an empty corpus (now: zero
  * centroids -> empty result through the same heap pipeline), and a
  * zero-partition hive tree failed `UNABLE_TO_INFER_SCHEMA` on
  * read-back (now: schema-explicit [[graft.operators.Partitioning.readPartitioned]]).
  *
  * Contract asserted: no exception, and the result's SCHEMA matches the
  * sf0.001 run column-for-column (an operator must not change shape
  * when data disappears — global aggregates still return their single
  * row, everything else returns zero-or-more rows of the same columns).
  */
class DegenerateCorpusSpec extends SparkTestBase with BeforeAndAfterAll {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def variant(tag: String, n: Int): String = {
    val dir = graft.core.TempDirs.scratch(s"graft_degen_$tag").toString
    for (t <- tables) {
      spark.read.parquet(s"$sf001/$t.parquet").limit(n)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Rows present, every value null: two rows per table, each column a
    * typed null. Distinct from the empty variant — operators that guard
    * "no rows" can still assume "a row implies its fields"; this is the
    * shape a permissive upstream schema (every column nullable, a feed
    * that went dark mid-record) actually delivers at ingest scale.
    */
  private def allNullVariant(): String = {
    import org.apache.spark.sql.functions.lit
    val dir = graft.core.TempDirs.scratch("graft_degen_allnull").toString
    for (t <- tables) {
      val src = spark.read.parquet(s"$sf001/$t.parquet")
      val nulls = src.schema.fields.toIndexedSeq
        .map(f => lit(null).cast(f.dataType).as(f.name))
      src.limit(2).select(nulls: _*)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyDir = variant("empty", 0)
  private lazy val oneDir = variant("onerow", 1)
  private lazy val nullDir = allNullVariant()

  // reference column sets from the real corpus, computed lazily per
  // query the first time either variant test asks for it (schema-only:
  // never executes the sf0.001 plan)
  private val refCols = new scala.collection.mutable.HashMap[String, Seq[String]]()
  private def columnsOn(name: String): Seq[String] = synchronized {
    refCols.getOrElseUpdate(name,
      SparkEntry.queries(name)(spark, sf001).columns.toSeq)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name completes on an EMPTY corpus with the same schema") {
      // reference FIRST: self-materializing queries (q30's saveAsTable
      // round-trip) overwrite a shared sink when run — the reference run
      // must not clobber the variant frame's files between build and
      // collect
      val ref = columnsOn(name)
      val df = fn(spark, emptyDir)
      assert(df.columns.toSeq === ref,
        "schema must not change shape when data disappears")
      df.collect() // the contract is completion, not a row count
    }
    test(s"$name completes on a ONE-ROW corpus with the same schema") {
      val ref = columnsOn(name)
      val df = fn(spark, oneDir)
      assert(df.columns.toSeq === ref)
      df.collect()
    }
    test(s"$name completes on an ALL-NULL corpus with the same schema") {
      val ref = columnsOn(name)
      val df = fn(spark, nullDir)
      assert(df.columns.toSeq === ref)
      df.collect()
    }
  }

  // q37's handleInvalid="skip" drops any row with a null measure; its
  // oracle SQL carries the matching four-way NOT NULL predicate. The sf
  // corpora have no nulls in those columns, so the driver's hash gate
  // alone can't tell "aligned semantics" from "corpus luck" — this test
  // plants partial nulls (non-null keys, one null measure) and asserts
  // the Spark result equals the oracle predicate's semantics exactly.
  test("q37_vector_assembler: handleInvalid=skip matches the oracle's " +
      "NOT-NULL predicate on a PLANTED-NULL corpus") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = graft.core.TempDirs.scratch("graft_degen_q37nulls").toString
    val w = Window.orderBy("l_orderkey", "l_linenumber")
    val planted = spark.read.parquet(s"$sf001/lineitem.parquet").limit(40)
      .withColumn("rn", row_number().over(w))
      .withColumn("l_quantity",
        when(col("rn") % 5 === 0, lit(null)).otherwise(col("l_quantity")))
      .withColumn("l_extendedprice",
        when(col("rn") % 5 === 1, lit(null)).otherwise(col("l_extendedprice")))
      .withColumn("l_discount",
        when(col("rn") % 5 === 2, lit(null)).otherwise(col("l_discount")))
      .withColumn("l_tax",
        when(col("rn") % 7 === 3, lit(null)).otherwise(col("l_tax")))
      .drop("rn")
    planted.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q37_vector_assembler")(spark, dir).collect()
    // independent expectation: the oracle SQL's semantics, computed
    // WITHOUT VectorAssembler (same arithmetic as the DuckDB text)
    val m = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c => col(c).cast("double"))
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(m.map(_.isNotNull).reduce(_ && _))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(m.map(c => c * c).reduce(_ + _)), 6).as("norm"))
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    assert(want.length < 40, "the plant must actually drop rows")
    assert(got.toSeq === want.toSeq,
      "skip semantics must equal the oracle's NOT-NULL predicate")
  }

  override def afterAll(): Unit = {
    // the degenerate dirs leave per-(session, dir) memos + (for q28) a
    // divergent-fit stash entry behind; drop them so suite order can't
    // flip QueriesSpec's stash-unambiguity assertions
    SparkEntry.clearSessionCaches(spark)
    super.afterAll()
  }
}
