package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-built graph cases for the link-analysis family (q32/t42 run the
  * same [[Graph]] rounds oracle-gated at corpus scale).
  */
class GraphSpec extends AnyFunSuite {

  test("textrank: the hub token adjacent to every kept edge outranks its neighbors") {
    val s = TestSpark.spark
    import s.implicits._
    // kept edges (>= TrMinEdge = 5 repeats): spark-core (x6), core-engine
    // (x5); the filler tokens appear in bigrams once each and are pruned,
    // so the graph is a 2-edge path with 'core' in the middle.
    val text = (
      (1 to 6).map(i => s"spark core f$i") ++
      (1 to 5).map(i => s"core engine g$i")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = Graph.textRank(d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._2).toSet == Set("spark", "core", "engine"), s"${got.toSeq}")
    assert(got.head._2 == "core" && got.head._1 == 1,
      s"hub should rank first: ${got.toSeq}")
    // ranks total ~1.0 (damped PageRank over 3 nodes; ppb fixed-point)
    val tot = got.map(_._3).sum
    assert(math.abs(tot - 1000000000L) < 1000L, s"rank mass $tot")
  }

  test("textrank: a corpus with no repeated bigram yields an empty keyword table") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq((1L, "every bigram here appears exactly once")).toDF("doc_id", "text")
    assert(Graph.textRank(d).count() == 0)
  }

  test("markov attribution: the sole feeder into conversion takes all the credit") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // journey A: view -> purchase (converts through view only)
    // journey B: click -> end of day (drop)
    // chain: start->view .5, start->click .5, view->conv 1, click->drop 1
    // remove view => pconv 0 (full removal effect); remove click => pconv
    // unchanged at .5 (zero effect) — credit must be 100% view.
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "purchase", 9.0),
      (3L, "2024-01-01 10:00:00", 2L, "click", 0.0))
    val d = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("").as("props"))
    val got = Graph.markovAttribution(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("click", 500000000L, 0L, 0L),
      ("view", 0L, 1000000L, 1000000L)), s"${got.toSeq}")
  }
}
