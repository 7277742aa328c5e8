package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Whitening is graded by its DEFINITION: the covariance of the whitened
  * output must be the identity. The oracle pin (c4_whiten hash-green)
  * proves cross-engine determinism; this spec proves the math.
  */
class WhitenSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  test("whitened output has identity covariance (diag 1, off-diag 0)") {
    val emb = graft.Tables.embeddings(TestSpark.spark, dir)
    val y = Whiten.whiten(emb)
    val n = y.count().toDouble
    // covariance of the whitened columns, straight from the definition
    val pairs = for (i <- 0 until Whiten.D; j <- i until Whiten.D) yield (i, j)
    val aggs = pairs.map { case (i, j) =>
      (avg(col(s"y$i") * col(s"y$j")) - avg(col(s"y$i")) * avg(col(s"y$j")))
        .as(s"c_${i}_$j")
    }
    val r = y.agg(aggs.head, aggs.tail: _*).first()
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      val c = r.getDouble(k)
      if (i == j) assert(math.abs(c - 1.0) < 0.01, s"var(y$i) = $c, expected 1")
      else assert(math.abs(c) < 0.01, s"cov(y$i, y$j) = $c, expected 0")
    }
    assert(n > 0)
  }

  test("whitening is deterministic across runs and orders by vec_id") {
    val emb = graft.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001")
    val a = Whiten.whiten(emb).collect()
    val b = Whiten.whiten(emb).collect()
    assert(a.sameElements(b), "two whitening runs must be bit-identical")
    val ids = a.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }

  test("power iteration finds a planted dominant axis: eigenvector and eigenvalue by definition") {
    val spark = TestSpark.spark
    import spark.implicits._
    // variance planted on dim 3 (index 2): ±10 there, ±0.1 elsewhere
    val rows = (0L until 64L).map { i =>
      val big = if (i % 2 == 0) 10.0f else -10.0f
      val small = if (i % 4 < 2) 0.1f else -0.1f
      (i, Array.tabulate(8)(d => if (d == 2) big else small), 0)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = Whiten.pcaPower(emb).collect().head
    val eig = r.getDouble(0)
    val v = (1 to 8).map(i => r.getDouble(i))
    assert(math.abs(math.abs(v(2)) - 1.0) < 1e-4,
      s"dominant axis must be dim 3: $v")
    assert(math.abs(eig - 100.0) < 0.1, s"eigenvalue must be the planted variance: $eig")
    // unit norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6, s"not unit: $v")
  }

  test("covariance matrix is symmetric and diagonally dominant-positive") {
    val g = Whiten.gram(graft.Tables.embeddings(TestSpark.spark, "/root/testdata/sf0.001"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    for (i <- 1 to Whiten.D; j <- 1 to Whiten.D) {
      assert(g((i, j)) == g((j, i)), s"cov($i,$j) != cov($j,$i)")
      if (i == j) assert(g((i, j)) > 0, s"var($i) = ${g((i, j))} must be positive")
    }
  }

  test("cholesky reconstructs the loaded covariance") {
    val cov = Array(
      Array(2.0, 0.5, 0.1),
      Array(0.5, 1.5, -0.2),
      Array(0.1, -0.2, 1.0))
    val l = Whiten.cholesky(cov)
    for (i <- 0 until 3; j <- 0 until 3) {
      val rec = (0 until 3).map(k => l(i)(k) * l(j)(k)).sum
      val want = cov(i)(j) + (if (i == j) Whiten.DiagEps else 0.0)
      assert(math.abs(rec - want) < 1e-12, s"LL^T($i,$j) = $rec, want $want")
      if (j > i) assert(l(i)(j) == 0.0, "L must be lower-triangular")
    }
  }

  test("mahalanobis flags the anti-correlated point a Euclidean norm would miss") {
    val spark = TestSpark.spark
    import spark.implicits._
    // dims 1-2 near-perfectly correlated (t, t); the planted outlier
    // (0.5, -0.5) BREAKS the correlation with a SMALLER Euclidean norm
    // than the legitimate extremes (±1, ±1) — covariance-aware distance
    // must rank it first anyway.
    def noise(i: Int, k: Int): Float = 0.01f * ((i * k) % 7 - 3)
    val cloud = (1 to 32).map { i =>
      val t = -1.0f + 2.0f * (i - 1) / 31.0f
      (i.toLong, Array(t, t) ++ (3 to 8).map(k => noise(i, k)))
    }
    val outlier = (99L, Array(0.5f, -0.5f) ++ (3 to 8).map(k => noise(99, k)))
    val emb = (cloud :+ outlier).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val top = Whiten.mahalanobis(emb).collect()
    assert(top.head.getLong(1) == 99L,
      s"outlier should rank first: ${top.take(3).toSeq}")
    assert(top.head.getDouble(2) > 2 * top(1).getDouble(2),
      s"outlier should dominate: ${top.take(2).toSeq}")
  }
}
