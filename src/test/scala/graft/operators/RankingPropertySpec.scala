package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized property of the distributed rank: [[Ranking.withNtile]]
  * equals Spark's own `ntile` BIT-FOR-BIT on ANY frame whose order keys
  * form a total order — arbitrary sizes (including n smaller than the
  * bucket count and n far above the partition count), arbitrary
  * duplicate-heavy value distributions, arbitrary bucket counts.
  * Generators run on fixed seeds (the ValidationPropertySpec
  * convention). Also pins the contract boundary: positional and
  * per-row results carry every input row exactly once.
  */
class RankingPropertySpec extends AnyFunSuite {

  private def frame(seed: Long): (Seq[(Long, Long)], Int) = {
    val g = for {
      n <- Gen.chooseNum(1, 400)
      k <- Gen.chooseNum(1, 9)
      // few distinct values -> heavy ties on v; the id tie-break makes
      // the composite total, exactly the caller contract
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 6L))
    } yield (vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }, k)
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator produced no sample"))
  }

  test("withNtile equals ntile on random duplicate-heavy frames") {
    val s = TestSpark.spark
    import s.implicits._
    (101L to 108L).foreach { seed =>
      val (rows, k) = frame(seed)
      val df = rows.toDF("v", "id")
      val viaNtile = df.select(col("id"),
          ntile(k).over(Window.orderBy(col("v"), col("id"))).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranking.withNtile(df, "b", k, Seq(col("v"), col("id")))
        .select(col("id"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == viaNtile, s"seed $seed n=${rows.size} k=$k")
      assert(got.size == rows.size, s"seed $seed must keep every row")
    }
  }

  test("withRowNumber equals the serial row_number on random duplicate-heavy frames, including desc keys") {
    val s = TestSpark.spark
    import s.implicits._
    (201L to 206L).foreach { seed =>
      val (rows, _) = frame(seed)
      val df = rows.toDF("v", "id")
      // ascending composite
      val serial = df.select(col("id"),
          row_number().over(Window.orderBy(col("v"), col("id"))).as("r"))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val got = Ranking.withRowNumber(df, "r", Seq(col("v"), col("id")))
        .select(col("id"), col("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == serial, s"seed $seed n=${rows.size}")
      // descending first key (the zipf shape: freq desc, term asc)
      val serialD = df.select(col("id"),
          row_number().over(Window.orderBy(col("v").desc, col("id"))).as("r"))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val gotD = Ranking.withRowNumber(df, "r", Seq(col("v").desc, col("id")))
        .select(col("id"), col("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotD == serialD, s"seed $seed n=${rows.size} (desc)")
    }
    // collision guard: an existing output column is refused loudly
    val ex = intercept[IllegalArgumentException] {
      Ranking.withRowNumber(Seq((1L, 2L)).toDF("r", "id"), "r", Seq(col("id")))
    }
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
  }
}
