package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Trained quality classifier (p25) — the GPT-3/LLaMA-family "learned
  * quality filter": a logistic regression over cheap per-document
  * features, trained distributed and applied as a pure per-row
  * expression. The reference pipelines train such a filter on a curated
  * gold slice (GPT-3 appendix A: WebText-vs-crawl); here the target is
  * the corpus's own `lang = 'en'` slice (the DSIR proxy-target
  * convention, p18) so the whole train+score is deterministic and
  * oracle-replayable.
  *
  * Training is IRLS / Newton ([[Iters]] fixed iterations from w = 0 —
  * the k-means "fixed iteration count" determinism convention):
  * per iteration ONE partial-aggregated corpus pass builds the
  * D-vector gradient g = Σ x (y − p) and D×D Hessian H = Σ x xᵀ p(1−p)
  * (rounded to 6 decimals — the engine-portable boundary, exactly
  * [[Whiten.gram]]'s argument), and the D×D solve H δ = g happens on the
  * driver via Cholesky + forward/back substitution — a FIXED sequence of
  * IEEE add/mul/divide/sqrt that the DuckDB oracle replays from the
  * identical rounded aggregates, so the learned weights and every score
  * hash-match cross-engine (the [[Whiten]] method, applied to a solver
  * instead of a factorization-only step).
  *
  * Scale shape: features are per-row expressions (no UDF); each IRLS
  * pass shuffles D + D² rounded aggregate groups, never the corpus; the
  * learned weights are broadcast literals at scoring time, so applying
  * the filter to 100 TB is one codegen'd scan.
  */
object Classifier {

  /** Feature count (bias included). Kept small so the unrolled solver
    * expression stays shallow; real filters use a few dozen — the
    * machinery is D-generic.
    */
  val D = 4

  /** Newton iterations from w = 0. Iteration 1 has p ≡ 0.5 exactly
    * (sigmoid(0) — no libm involved), so the first step is bit-exact by
    * construction; iteration 2 exercises the general path.
    */
  val Iters = 2

  /** Stopword list for the density feature (fixed, tiny). */
  val Stopwords = Seq("the", "and", "of", "to", "a", "in", "is", "it")

  /** Per-doc features (rounded to 6 — identical in both engines) and the
    * proxy label: x = [1, ln(1+tokens), chars/(tokens+1), stopword
    * fraction], y = 1 for the lang='en' slice.
    */
  def features(docs: DataFrame): DataFrame = {
    val w = Portable.tokens(col("text"))
    val n = size(w)
    val stopSet = Stopwords.map(lit): Seq[Column]
    val stopFrac = size(filter(w, t => stopSet.map(t === _).reduce(_ || _)))
      .cast("double") / n
    docs.select(col("doc_id"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x1"),
      round(log(lit(1.0) + n), 6).as("x2"),
      round(length(col("text")).cast("double") / (n + 1), 6).as("x3"),
      round(stopFrac, 6).as("x4"))
  }

  private def xCols: Seq[Column] = (1 to D).map(i => col(s"x$i"))

  /** One IRLS aggregate pass: (g_1..g_D, h_11..h_DD) rounded to 6, given
    * the per-row probability column `p`.
    */
  private def irlsAggregates(feats: DataFrame, p: Column): (Array[Double], Array[Array[Double]]) = {
    val gAggs = (1 to D).map(i =>
      round(sum(col(s"x$i") * (col("y") - p)), 6).as(s"g$i"))
    val hAggs = for (i <- 1 to D; j <- 1 to i) yield
      round(sum(col(s"x$i") * col(s"x$j") * p * (lit(1.0) - p)), 6).as(s"h${i}_$j")
    val row = feats.agg((gAggs ++ hAggs).head, (gAggs ++ hAggs).tail: _*).collect().head
    val g = (0 until D).map(i => row.getDouble(i)).toArray
    val h = Array.ofDim[Double](D, D)
    var idx = D
    for (i <- 0 until D; j <- 0 to i) {
      h(i)(j) = row.getDouble(idx); h(j)(i) = h(i)(j); idx += 1
    }
    (g, h)
  }

  /** Solve H δ = g for SPD H by Cholesky + forward/back substitution —
    * strict k-ascending, left-associated sums, mirroring the generated
    * SQL's IEEE sequence (the [[Whiten.cholesky]] discipline).
    */
  private[operators] def solveSpd(h: Array[Array[Double]], g: Array[Double]): Array[Double] = {
    val n = g.length
    val l = Array.ofDim[Double](n, n)
    for (j <- 0 until n) {
      var s = 0.0
      for (k <- 0 until j) s = s + l(j)(k) * l(j)(k)
      val pivot = h(j)(j) + Whiten.DiagEps - s
      require(pivot > 0,
        s"IRLS Hessian is not positive definite at $j (pivot $pivot): a " +
          "feature is (numerically) a linear combination of earlier ones " +
          "on this corpus — drop or rescale the degenerate feature")
      l(j)(j) = math.sqrt(pivot)
      for (i <- j + 1 until n) {
        var t = 0.0
        for (k <- 0 until j) t = t + l(i)(k) * l(j)(k)
        l(i)(j) = (h(i)(j) - t) / l(j)(j)
      }
    }
    val z = Array.ofDim[Double](n)
    for (i <- 0 until n) {
      var t = 0.0
      for (k <- 0 until i) t = t + l(i)(k) * z(k)
      z(i) = (g(i) - t) / l(i)(i)
    }
    val d = Array.ofDim[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var t = 0.0
      for (k <- i + 1 until n) t = t + l(k)(i) * d(k)
      d(i) = (z(i) - t) / l(i)(i)
    }
    d
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def dotW(w: Array[Double]): Column =
    (0 until D).map(i => lit(w(i)) * col(s"x${i + 1}")).reduce(_ + _)

  /** Train the weights: [[Iters]] Newton steps, each one aggregate pass +
    * one driver-side D×D solve. An ACTION (like kmeansModel's fit).
    */
  def trainWeights(feats: DataFrame): Array[Double] = {
    var w = Array.fill(D)(0.0)
    for (it <- 1 to Iters) {
      val p = if (it == 1) lit(0.5) else sigmoid(dotW(w))
      val (g, h) = irlsAggregates(feats, p)
      val d = solveSpd(h, g)
      w = (0 until D).map(i => w(i) + d(i)).toArray
    }
    w
  }

  /** The full train + score (p25): every document with its probability
    * under the learned filter, the keep verdict, and the proxy label —
    * the audit table a learned quality gate ships.
    */
  def qualityClassifier(docs: DataFrame): DataFrame = {
    val feats = features(docs).localCheckpoint(true)
    val w = trainWeights(feats)
    feats.unpersist()
    scoreWith(docs, w)
  }

  /** The scoring half alone, from GIVEN weights — pure per-row
    * expressions (no training scans, no state), so it applies unchanged
    * to a streaming micro-batch: the classic offline-train/online-apply
    * filter deployment. Shares the exact select with
    * [[qualityClassifier]] so p26's hash-match gate proves the artifact
    * carries the whole model.
    */
  def scoreWith(docs: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == D, s"weight artifact has ${w.length} entries, want $D")
    val scored = features(docs).select(col("doc_id"), col("y").cast("long").as("y"),
      round(sigmoid(dotW(w)), 4).as("p"))
      .withColumn("keep", col("p") >= 0.5)
    // presentation sort is a batch concept; a streaming micro-batch is
    // unordered by nature (and Spark rejects the sort in append mode)
    if (docs.isStreaming) scored else scored.orderBy(col("doc_id"))
  }

  /** Train and persist the weights (D rows, binary-exact doubles). */
  def trainAndSave(docs: DataFrame, dir: String): Array[Double] = {
    val feats = features(docs).localCheckpoint(true)
    val w = trainWeights(feats)
    feats.unpersist()
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.ModelStore.save(
      w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("i", "w"), dir)
    w
  }

  /** Load persisted weights; loud on a wrong-D artifact. */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, dir: String): Array[Double] = {
    val rows = graft.sources.ModelStore.load(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(rows.keySet == (0 until D).toSet,
      s"classifier artifact at $dir has indices ${rows.keySet} — trained with a different D")
    (0 until D).map(rows).toArray
  }

  // ------------------------------------------------------------- oracle

  /** Oracle twin: features CTE, per-iteration aggregate CTEs + the
    * Cholesky/forward/back substitution unrolled one column per CTE
    * (left-associated sums — the identical IEEE sequence to
    * [[solveSpd]]), final scores from the iteration-[[Iters]] weights.
    */
  def sqlQualityClassifier: String = {
    val toks = Portable.sqlTokens("text")
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    def cholCtes(tag: String, prev: String): (Seq[String], String) = {
      val ctes = (1 to D).map { j =>
        val src = if (j == 1) prev else s"${tag}ch${j - 1}"
        val sumJJ = (1 until j).map(k => s"${tag}l_${j}_$k * ${tag}l_${j}_$k").mkString(" + ")
        val pivot =
          if (j == 1) s"${tag}h_1_1 + ${Whiten.DiagEps}"
          else s"${tag}h_${j}_$j + ${Whiten.DiagEps} - ($sumJJ)"
        val guard = s"CASE WHEN $pivot <= 0 THEN error('IRLS Hessian not " +
          s"positive definite at $j (oracle pivot guard)') ELSE sqrt($pivot) END"
        val offs = (j + 1 to D).map { i =>
          val sumIJ = (1 until j).map(k => s"${tag}l_${i}_$k * ${tag}l_${j}_$k").mkString(" + ")
          val num = if (j == 1) s"${tag}h_${i}_1" else s"(${tag}h_${i}_$j - ($sumIJ))"
          s"$num / ($guard) AS ${tag}l_${i}_$j"
        }
        val cols = (s"$guard AS ${tag}l_${j}_$j" +: offs).mkString(",\n    ")
        s"${tag}ch$j AS (SELECT *, $cols FROM $src)"
      }
      (ctes, s"${tag}ch$D")
    }
    def solveCtes(tag: String, prev: String): (Seq[String], String) = {
      val (chol, afterChol) = cholCtes(tag, prev)
      val fwd = (1 to D).map { i =>
        val src = if (i == 1) afterChol else s"${tag}z${i - 1}"
        val sumK = (1 until i).map(k => s"${tag}l_${i}_$k * ${tag}zv$k").mkString(" + ")
        val num = if (i == 1) s"${tag}g_1" else s"(${tag}g_$i - ($sumK))"
        s"${tag}z$i AS (SELECT *, $num / ${tag}l_${i}_$i AS ${tag}zv$i FROM $src)"
      }
      val back = (D to 1 by -1).map { i =>
        val src = if (i == D) s"${tag}z$D" else s"${tag}b${i + 1}"
        val sumK = (i + 1 to D).map(k => s"${tag}l_${k}_$i * ${tag}dv$k").mkString(" + ")
        val num = if (i == D) s"${tag}zv$D" else s"(${tag}zv$i - ($sumK))"
        s"${tag}b$i AS (SELECT *, $num / ${tag}l_${i}_$i AS ${tag}dv$i FROM $src)"
      }
      (chol ++ fwd ++ back, s"${tag}b1")
    }
    // iteration 1: p = 0.5 exactly
    val g1 = (1 to D).map(i => s"round(sum(x$i * (y - 0.5)), 6) AS ag_$i").mkString(", ")
    val h1 = (for (i <- 1 to D; j <- 1 to i) yield
      s"round(sum(x$i * x$j * 0.25), 6) AS ah_${i}_$j").mkString(",\n    ")
    val (solve1, after1) = solveCtes("a", "agg1")
    val w1 = (1 to D).map(i => s"adv$i AS w1_$i").mkString(", ")
    // iteration 2: p from w1
    val z2 = (1 to D).map(i => s"w1_$i * x$i").mkString(" + ")
    val g2 = (1 to D).map(i => s"round(sum(x$i * (y - p2)), 6) AS bg_$i").mkString(", ")
    val h2 = (for (i <- 1 to D; j <- 1 to i) yield
      s"round(sum(x$i * x$j * p2 * (1.0 - p2)), 6) AS bh_${i}_$j").mkString(",\n    ")
    val (solve2, after2) = solveCtes("b", "agg2w")
    val w2 = (1 to D).map(i => s"w1_$i + bdv$i AS w2_$i").mkString(", ")
    val zf = (1 to D).map(i => s"w2_$i * x$i").mkString(" + ")
    s"""WITH feats AS (SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |    1.0 AS x1,
       |    round(ln(1.0 + len($toks)), 6) AS x2,
       |    round(length(text)::DOUBLE / (len($toks) + 1), 6) AS x3,
       |    round(len(list_filter($toks, t -> t IN ($stopList)))::DOUBLE
       |      / len($toks), 6) AS x4
       |  FROM documents),
       |agg1 AS (SELECT $g1,
       |    $h1
       |  FROM feats),
       |${solve1.mkString(",\n")},
       |wt1 AS (SELECT $w1 FROM $after1),
       |p2t AS (SELECT feats.*, 1.0 / (1.0 + exp(-($z2))) AS p2 FROM feats, wt1),
       |agg2 AS (SELECT $g2,
       |    $h2
       |  FROM p2t),
       |agg2w AS (SELECT * FROM agg2, wt1),
       |${solve2.mkString(",\n")},
       |wt2 AS (SELECT $w2 FROM $after2)
       |SELECT feats.doc_id, feats.y::BIGINT AS y,
       |  round(1.0 / (1.0 + exp(-($zf))), 4) AS p,
       |  round(1.0 / (1.0 + exp(-($zf))), 4) >= 0.5 AS keep
       |FROM feats, wt2 ORDER BY feats.doc_id""".stripMargin
  }

  /** Calibration (reliability) report over the classifier scores (p33) —
    * the table that says whether the scores MEAN anything: documents
    * bucketed into fixed-width probability bins, each bin's observed
    * proxy-positive rate against its mean predicted probability (a
    * calibrated filter has pos_rate tracking mean_p; a divergent tail
    * says the threshold is lying). Fixed-width bins deliberately, not
    * ntile deciles: the bin is a pure per-row expression and the
    * aggregate keys on <=10 values — an ntile would global-sort the
    * corpus through one reducer, the 100 TB anti-pattern, for no
    * statistical gain.
    */
  def calibrationReport(scored: DataFrame): DataFrame =
    scored.groupBy(least(floor(col("p") * 10), lit(9)).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p")), 4).as("mean_p"),
        round(avg(col("y").cast("double")), 4).as("pos_rate"))
      .orderBy(col("bin"))

  /** Decision thresholds for the p35 sweep — the operating points an
    * operator actually considers when turning scores into a keep gate.
    */
  val SweepThresholds: Seq[Double] = Seq(0.3, 0.5, 0.7)

  /** Threshold sweep (p35) — the precision/recall operating table over
    * the classifier's scores vs the proxy label: for each candidate
    * threshold, the confusion counts and the resulting precision (kept
    * docs that are truly positive) and recall (positives kept). p33 says
    * whether the scores are CALIBRATED; this says what each cut COSTS —
    * the two tables a filter deployment reads together.
    *
    * Scale shape: ONE partial-aggregated corpus pass computes every
    * threshold's conditional sums as parallel aggregate columns; the
    * per-threshold rows come off that single one-row frame via stack().
    * Never one scan per threshold, never a sort.
    */
  def thresholdSweep(scored: DataFrame): DataFrame = {
    val aggs = SweepThresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(col("p") >= t && col("y") === 1, 1L).otherwise(0L)).as(s"tp$i"),
      sum(when(col("p") >= t && col("y") === 0, 1L).otherwise(0L)).as(s"fp$i"),
      sum(when(col("p") < t && col("y") === 1, 1L).otherwise(0L)).as(s"fn$i"))
    }
    val stackArgs = SweepThresholds.zipWithIndex
      .map { case (t, i) => s"${t}d, tp$i, fp$i, fn$i" }
      .mkString(", ")
    scored.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${SweepThresholds.size}, $stackArgs) " +
        "AS (threshold, tp, fp, fn)")
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(col("tp") / (col("tp") + col("fp")), 4)).as("precision"),
        when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(round(col("tp") / (col("tp") + col("fn")), 4)).as("recall"))
      .orderBy(col("threshold"))
  }

  /** Oracle: the full classifier oracle nested verbatim, one aggregate
    * row, per-threshold SELECTs unioned.
    */
  def sqlThresholdSweep: String = {
    val body = graft.functions.Portable.sqlNoOrder(sqlQualityClassifier)
    val sums = Classifier.SweepThresholds.zipWithIndex.flatMap { case (t, k) => Seq(
      s"sum(CASE WHEN p >= $t AND y = 1 THEN 1 ELSE 0 END)::BIGINT AS tp$k",
      s"sum(CASE WHEN p >= $t AND y = 0 THEN 1 ELSE 0 END)::BIGINT AS fp$k",
      s"sum(CASE WHEN p < $t AND y = 1 THEN 1 ELSE 0 END)::BIGINT AS fn$k")
    }.mkString(",\n    ")
    val rows = Classifier.SweepThresholds.zipWithIndex.map { case (t, k) =>
      s"""SELECT ${t}::DOUBLE AS threshold, tp$k AS tp, fp$k AS fp, fn$k AS fn,
         |  CASE WHEN tp$k + fp$k = 0 THEN 0.0
         |    ELSE round(tp$k::DOUBLE / (tp$k + fp$k), 4) END AS precision,
         |  CASE WHEN tp$k + fn$k = 0 THEN 0.0
         |    ELSE round(tp$k::DOUBLE / (tp$k + fn$k), 4) END AS recall
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sc AS (SELECT doc_id, y, p FROM ($body) t),
       |m AS (SELECT $sums FROM sc)
       |$rows
       |ORDER BY threshold""".stripMargin
  }

  /** Oracle: the full classifier oracle nested verbatim, same binning. */
  def sqlCalibration: String = {
    val body = graft.functions.Portable.sqlNoOrder(sqlQualityClassifier)
    s"""WITH sc AS (SELECT doc_id, y, p FROM ($body) t)
       |SELECT least(floor(p * 10), 9)::BIGINT AS bin, count(*)::BIGINT AS n,
       |  round(avg(p), 4) AS mean_p, round(avg(y::DOUBLE), 4) AS pos_rate
       |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin
  }
}
