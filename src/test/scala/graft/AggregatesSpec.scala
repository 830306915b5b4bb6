package graft

import graft.functions.SeriesFunctions
import graft.operators.BoundedTopKByScore
import org.apache.spark.sql.functions._

/** The native TypedImperativeAggregate bounded top-k vs an in-memory
  * oracle AND the typed Dataset Aggregator — including score ties, which
  * must break by id to keep candidate selection deterministic.
  */
class AggregatesSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  // deliberate tie collisions: scores drawn from a small discrete set
  private val rows: Seq[(Long, Long, Double)] =
    for (g <- 0L until 20L; i <- 0L until 200L)
      yield (g, i, (rnd.nextInt(40) / 7.0))

  private def oracle(k: Int): Map[Long, Seq[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._3, r._2)).sorted.take(k).map(_._2)
    }

  test("graft_topk_ids matches in-memory oracle (ties broken by id)") {
    val df = rows.toDF("gid", "id", "score")
    for (k <- Seq(1, 5, 32)) {
      val got = df.groupBy(col("gid"))
        .agg(SeriesFunctions.topkIds(col("score"), col("id"), k).as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got === oracle(k), s"k=$k")
    }
  }

  test("graft_topk_ids matches the typed Dataset Aggregator") {
    val df = rows.toDF("gid", "id", "score")
    val k = 8
    val native = df.groupBy(col("gid"))
      .agg(SeriesFunctions.topkIds(col("score"), col("id"), k).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val agg = new BoundedTopKByScore(k)
    val typed = df.as[(Long, Long, Double)]
      .groupByKey(_._1).agg(agg.toColumn)
      .collect().map { case (g, ids) => g -> ids.toSet }.toMap
    assert(native === typed)
  }

  test("graft_topk_ids: fewer rows than k returns all, sorted") {
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0)).toDF("gid", "id", "score")
    val got = df.groupBy(col("gid"))
      .agg(SeriesFunctions.topkIds(col("score"), col("id"), 5).as("ids"))
      .head().getSeq[Long](1)
    assert(got === Seq(11L, 10L))
  }
}
