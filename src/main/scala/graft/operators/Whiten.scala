package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding whitening / decorrelation for the embedding store (the missing
  * piece between k-means ([[Similarity.kmeans]]) and quantization
  * ([[Similarity.knnQuantized]]): decorrelated, unit-variance dimensions
  * make both cells and int8 grids measurably tighter).
  *
  * Shape (the scale-correct one for 100 TB): ONE partial-aggregated pass
  * over the corpus builds the tiny D x D covariance (shuffle volume = D^2
  * groups, map-side combined), the factorization of that D x D happens on
  * the driver in O(D^3), and the projection is a broadcast-literal
  * expression — pure codegen per row, corpus scanned once, nothing wide
  * ever shuffles.
  *
  * FACTORIZATION CHOICE: Cholesky (cov = L L^T, whitener W = L^-1) instead
  * of an eigendecomposition. Both whiten (cov of W(x - mean) = I); Cholesky
  * is a FIXED sequence of IEEE add/mul/sqrt/divide, so the DuckDB oracle
  * replays the identical arithmetic from the identical 6-decimal-rounded
  * covariance and the WHITENED VECTORS THEMSELVES hash-match cross-engine —
  * an iterative eigensolver's convergence path could not be pinned this
  * way. Spark-side driver code and the generated oracle SQL keep strictly
  * left-associated sums so both engines execute bit-identical operations.
  */
object Whiten {

  /** Whitened subspace: leading D dims of the embedding. D = 8 keeps the
    * unrolled forward-substitution expression tree small (y_i references
    * y_0..y_{i-1}; Catalyst inlines the chain, so depth is bounded by D).
    */
  val D = 8

  /** Diagonal loading added to the covariance before factorization —
    * guards a near-singular dimension; applied identically in both engines.
    */
  val DiagEps = 1e-6

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      slice(transform(col("embedding"), x => x.cast("double")), 1, D).as("v"))

  // ------------------------------------------------------------ covariance

  /** Covariance matrix of the leading [[D]] dims: cov(i,j) =
    * avg(x_i * x_j) - avg(x_i) * avg(x_j), rounded to 6 decimals (the
    * engine-portable boundary — partial-aggregation summation order differs
    * below ~1e-13).
    *
    * Scale shape: the D^2-way pair explode is per-row work; the aggregate
    * partial-combines map-side, so the shuffle carries D^2 groups, not the
    * corpus.
    */
  def gram(emb: DataFrame): DataFrame =
    vecs(emb)
      .select(col("v"), posexplode(col("v")).as(Seq("i0", "xi")))
      .select((col("i0") + 1).cast("int").as("i"), col("xi"),
        posexplode(col("v")).as(Seq("j0", "xj")))
      .groupBy(col("i"), (col("j0") + 1).cast("int").as("j"))
      .agg(round(avg(col("xi") * col("xj")) - avg(col("xi")) * avg(col("xj")), 6)
        .as("cov"))
      .orderBy(col("i"), col("j"))

  val sqlGram: String =
    s"""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:$D] AS v FROM embeddings)
       |SELECT i::INT AS i, j::INT AS j,
       |  round(avg(v[i] * v[j]) - avg(v[i]) * avg(v[j]), 6) AS cov
       |FROM e, LATERAL unnest(range(1, $D + 1)) t1(i),
       |  LATERAL unnest(range(1, $D + 1)) t2(j)
       |GROUP BY 1, 2 ORDER BY i, j""".stripMargin

  /** Per-dim means, rounded like the covariance. */
  private def means(emb: DataFrame): Array[Double] =
    vecs(emb)
      .select(posexplode(col("v")).as(Seq("i0", "x")))
      .groupBy(col("i0")).agg(round(avg(col("x")), 6).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))

  // ------------------------------------------------------------- Cholesky

  /** Lower-triangular L with cov + eps*I = L L^T (Cholesky–Crout), sums
    * accumulated in strict k-ascending order to mirror the generated SQL's
    * left-associated additions.
    */
  private[operators] def cholesky(cov: Array[Array[Double]]): Array[Array[Double]] = {
    val n = cov.length
    val l = Array.ofDim[Double](n, n)
    for (j <- 0 until n) {
      var s = 0.0
      for (k <- 0 until j) s = s + l(j)(k) * l(j)(k)
      val pivot = cov(j)(j) + DiagEps - s
      // a non-positive pivot means dimension j is (numerically) a linear
      // combination of dims < j: sqrt would go NaN and silently poison
      // every whitened vector downstream — fail loudly instead
      require(pivot > 0,
        s"covariance is not positive definite at dim $j (pivot $pivot): " +
          "a leading embedding dimension is linearly dependent on earlier " +
          "ones — whitening this subspace is ill-defined; drop or reorder " +
          "the degenerate dimension")
      l(j)(j) = math.sqrt(pivot)
      for (i <- j + 1 until n) {
        var t = 0.0
        for (k <- 0 until j) t = t + l(i)(k) * l(j)(k)
        l(i)(j) = (cov(i)(j) - t) / l(j)(j)
      }
    }
    l
  }

  /** Collected model: (means, L). Two tiny aggregates (D and D^2 rows); the
    * corpus is scanned twice at train time, once at apply time.
    */
  def model(emb: DataFrame): (Array[Double], Array[Array[Double]]) = {
    val m = means(emb)
    val cov = Array.ofDim[Double](D, D)
    gram(emb).collect().foreach { r =>
      cov(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getDouble(2)
    }
    (m, cholesky(cov))
  }

  // ------------------------------------------------------------ projection

  /** Whitened vectors: y = L^-1 (x - mean) by unrolled forward
    * substitution over broadcast literals — y_i = ((x_i - m_i) - (L_i0*y_0
    * + ... )) / L_ii, strictly left-associated, rounded to 4 decimals at
    * the output boundary only (intermediates stay bit-identical across
    * engines).
    */
  def whiten(emb: DataFrame): DataFrame = {
    val (m, l) = model(emb)
    whitenWith(emb, m, l)
  }

  /** Projection with an ALREADY-TRAINED model ([[model]] or [[loadModel]]):
    * the apply-anywhere half of train-once/apply-anywhere — pure codegen,
    * no training scans.
    */
  def whitenWith(emb: DataFrame, m: Array[Double], l: Array[Array[Double]]): DataFrame =
    whitenCols(emb, m, l)
      .select(col("vec_id") +: (0 until D).map(i => round(col(s"y$i"), 4).as(s"y$i")): _*)
      .orderBy(col("vec_id"))

  /** The UNROUNDED substitution columns y0..y{D-1} — shared by
    * [[whitenWith]] (rounds at the output boundary) and [[mahalanobis]]
    * (squares before any rounding).
    */
  private def whitenCols(emb: DataFrame, m: Array[Double],
                         l: Array[Array[Double]]): DataFrame = {
    var df = vecs(emb)
    for (i <- 0 until D) {
      val xi = element_at(col("v"), i + 1) - lit(m(i))
      val sub =
        if (i == 0) xi
        else xi - (0 until i).map(k => lit(l(i)(k)) * col(s"y$k")).reduce(_ + _)
      df = df.withColumn(s"y$i", sub / lit(l(i)(i)))
    }
    df
  }

  /** Outliers reported by [[mahalanobis]]. */
  val MahalTopK = 20

  /** MAHALANOBIS OUTLIERS (c10): squared Mahalanobis distance is exactly
    * the squared norm of the whitened vector — md² = ‖L⁻¹(x − m)‖² — so
    * the c4 whitening machinery doubles as a covariance-aware outlier
    * detector: the embedding-space curation gate (drop or audit the
    * farthest points before training) that a plain Euclidean norm gets
    * wrong whenever dimensions correlate. Emits the top-[[MahalTopK]] by
    * distance; squares accumulate left-associated over the UNROUNDED
    * substitution columns, rounded once at the output.
    *
    * Scale shape: training is c4's two tiny aggregates (D and D² rows
    * collected); scoring is pure codegen projection; the top-K is
    * TakeOrderedAndProject, never a global window.
    */
  def mahalanobis(emb: DataFrame): DataFrame = {
    val (m, l) = model(emb)
    val md2 = (0 until D).map(i => col(s"y$i") * col(s"y$i")).reduce(_ + _)
    val scored = whitenCols(emb, m, l)
      .select(col("vec_id"), round(md2, 4).as("md2"))
    val top = scored.orderBy(col("md2").desc, col("vec_id")).limit(MahalTopK)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("md2").desc, col("vec_id"))))
      .select(col("rnk"), col("vec_id"), col("md2"))
      .orderBy(col("rnk"))
  }

  // ------------------------------------------- dominant PC (power method)

  /** Fixed power-method iteration count for [[pcaPower]]: enough for the
    * fixture spectra to converge to printable precision, and FIXED so the
    * oracle replays the exact sequence (a convergence test would make the
    * iteration count data-dependent and the replay fragile).
    */
  val PowerIters = 12

  /** Uniform start coordinate 1/sqrt(D) — the same double lands in the
    * Spark driver loop and (via shortest-round-trip toString) the oracle.
    */
  val PowerStart: Double = 1.0 / math.sqrt(D.toDouble)

  /** Dominant principal component of the leading-[[D]] covariance (c6) —
    * the one-vector PCA a pipeline reads before deciding whether its
    * embedding space is dominated by a single direction (a known failure
    * mode of contrastively trained embedders: one "hub" axis carries most
    * variance and cosine similarity degenerates). Power method from the
    * UNIFORM unit vector (overlaps every axis-aligned direction — e1
    * would silently stall on a dominant eigenvector with a zero first
    * coordinate; a start exactly orthogonal to the dominant eigenvector
    * remains the method's documented blind spot, non-generic for real
    * covariances) with L2 renormalization each step, over the 6-decimal-ROUNDED
    * covariance (the [[gram]] boundary — both engines iterate from
    * identical matrices); every sum is accumulated in strict index order
    * so the oracle replays the identical IEEE sequence, the
    * Cholesky/IRLS convention applied to the power method. Output: one
    * row — the dominant eigenvalue (the step-[[PowerIters]] norm) and the
    * unit eigenvector.
    *
    * Scale shape: the corpus is touched ONCE (the c3 covariance pass,
    * D²-group partial aggregate); the iteration itself is driver-side
    * arithmetic on a D×D matrix — the Whiten pattern: never iterate over
    * data when you can iterate over a dimension-sized summary.
    */
  def pcaPower(emb: DataFrame): DataFrame = {
    val c = Array.ofDim[Double](D, D)
    gram(emb).collect().foreach { r =>
      c(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getDouble(2)
    }
    var v = Array.fill(D)(PowerStart)
    var eig = 0.0
    for (_ <- 0 until PowerIters) {
      val w = Array.tabulate(D)(i =>
        (0 until D).map(j => c(i)(j) * v(j)).reduce(_ + _))
      eig = math.sqrt(w.map(x => x * x).reduce(_ + _))
      v = w.map(_ / eig)
    }
    val spark = emb.sparkSession
    spark.range(1).select(
      (round(lit(eig), 6) + lit(0.0)).as("eig") +:
        (0 until D).map(i => (round(lit(v(i)), 6) + lit(0.0)).as(s"pc${i + 1}")): _*)
  }

  /** Oracle: same covariance CTE pivoted to scalars, then one (w, v) CTE
    * pair per iteration with every sum left-associated — DuckDB executes
    * the same IEEE sequence as [[pcaPower]]'s driver loop.
    */
  val sqlPcaPower: String = {
    val covCells = (for (i <- 1 to D; j <- 1 to D) yield
      s"max(CASE WHEN i = $i AND j = $j THEN cov END) AS c_${i}_$j").mkString(",\n    ")
    val iterCtes = (1 to PowerIters).flatMap { it =>
      val prevV = (j: Int) =>
        if (it == 1) PowerStart.toString else s"v${it - 1}_$j"
      val wCols = (1 to D).map { i =>
        (1 to D).map(j => s"c_${i}_$j * ${prevV(j)}").mkString(" + ") + s" AS w${it}_$i"
      }.mkString(",\n    ")
      val nrm = "sqrt(" + (1 to D).map(i => s"w${it}_$i * w${it}_$i").mkString(" + ") + ")"
      val vCols = (1 to D).map(i => s"w${it}_$i / $nrm AS v${it}_$i").mkString(",\n    ")
      val prev = if (it == 1) "gp" else s"vv${it - 1}"
      Seq(s"ww$it AS (SELECT *, $wCols FROM $prev)",
        s"vv$it AS (SELECT *, $vCols FROM ww$it)")
    }.mkString(",\n")
    val lastN = "sqrt(" +
      (1 to D).map(i => s"w${PowerIters}_$i * w${PowerIters}_$i").mkString(" + ") + ")"
    val out = (s"round($lastN, 6) + 0.0 AS eig" +:
      (1 to D).map(i => s"round(v${PowerIters}_$i, 6) + 0.0 AS pc$i")).mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:$D] AS v FROM embeddings),
       |g AS (SELECT i, j, round(avg(v[i] * v[j]) - avg(v[i]) * avg(v[j]), 6) AS cov
       |  FROM e, LATERAL unnest(range(1, $D + 1)) t1(i),
       |    LATERAL unnest(range(1, $D + 1)) t2(j)
       |  GROUP BY 1, 2),
       |gp AS (SELECT $covCells FROM g),
       |$iterCtes
       |SELECT $out FROM vv$PowerIters""".stripMargin
  }

  /** TOP-2 PRINCIPAL DIRECTIONS (c8): the c6 power iteration plus one
    * Hotelling deflation — after the dominant pair (λ1, v1) converges,
    * iterate again on C − λ1·v1·v1ᵀ for (λ2, v2). Emits both
    * eigenvalues, PC2's share of the top-2 spectrum (the "is one
    * direction dominating my embeddings" diagnostic — anisotropy is the
    * standard embedding pathology whitening corrects), the |v1·v2|
    * orthogonality check, and PC2 itself. The check column is honest
    * about power iteration's limit: with a well-separated spectrum it
    * sits near 0; on a near-degenerate top pair (λ1 ≈ λ2 — the fixture's
    * case) the fixed iteration count leaves visible residue, which is
    * exactly when the share2 diagnostic reads ~0.5 and says no single
    * direction dominates.
    *
    * Scale shape: identical to c6 — the corpus cost is the ONE gram
    * pass; both iterations are D×D driver arithmetic, and the oracle
    * replays every IEEE step (left-associated sums, same literal start
    * vector, same deflation expression order).
    */
  def pcaTop2(emb: DataFrame): DataFrame = {
    val c = Array.ofDim[Double](D, D)
    gram(emb).collect().foreach { r =>
      c(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getDouble(2)
    }
    def iterate(m: Array[Array[Double]]): (Double, Array[Double]) = {
      var v = Array.fill(D)(PowerStart)
      var eig = 0.0
      for (_ <- 0 until PowerIters) {
        val w = Array.tabulate(D)(i =>
          (0 until D).map(j => m(i)(j) * v(j)).reduce(_ + _))
        eig = math.sqrt(w.map(x => x * x).reduce(_ + _))
        v = w.map(_ / eig)
      }
      (eig, v)
    }
    val (e1, v1) = iterate(c)
    val d = Array.tabulate(D, D)((i, j) => c(i)(j) - e1 * v1(i) * v1(j))
    val (e2, v2) = iterate(d)
    val dot = (0 until D).map(i => v1(i) * v2(i)).reduce(_ + _)
    val spark = emb.sparkSession
    spark.range(1).select(
      (round(lit(e1), 6) + lit(0.0)).as("eig1") +:
        (round(lit(e2), 6) + lit(0.0)).as("eig2") +:
        (round(lit(e2 / (e1 + e2)), 6) + lit(0.0)).as("share2") +:
        (round(lit(math.abs(dot)), 6) + lit(0.0)).as("abs_dot") +:
        (0 until D).map(i => (round(lit(v2(i)), 6) + lit(0.0)).as(s"pc2_${i + 1}")): _*)
  }

  /** Oracle for [[pcaTop2]]: the c6 replay run twice — pass `a` on the
    * covariance cells, an explicit deflation CTE, pass `b` on the
    * deflated cells — every sum left-associated.
    */
  val sqlPcaTop2: String = {
    val covCells = (for (i <- 1 to D; j <- 1 to D) yield
      s"max(CASE WHEN i = $i AND j = $j THEN cov END) AS c_${i}_$j").mkString(",\n    ")
    // one unrolled power chain; cell(i, j) names the matrix entry column
    def chain(tag: String, cell: (Int, Int) => String, src: String): (String, String) = {
      val ctes = (1 to PowerIters).flatMap { it =>
        val prevV = (j: Int) =>
          if (it == 1) PowerStart.toString else s"${tag}v${it - 1}_$j"
        val wCols = (1 to D).map { i =>
          (1 to D).map(j => s"${cell(i, j)} * ${prevV(j)}").mkString(" + ") +
            s" AS ${tag}w${it}_$i"
        }.mkString(",\n    ")
        val nrm = "sqrt(" +
          (1 to D).map(i => s"${tag}w${it}_$i * ${tag}w${it}_$i").mkString(" + ") + ")"
        val vCols = (1 to D).map(i => s"${tag}w${it}_$i / $nrm AS ${tag}v${it}_$i")
          .mkString(",\n    ")
        val prev = if (it == 1) src else s"${tag}vv${it - 1}"
        Seq(s"${tag}ww$it AS (SELECT *, $wCols FROM $prev)",
          s"${tag}vv$it AS (SELECT *, $vCols FROM ${tag}ww$it)")
      }.mkString(",\n")
      (ctes, s"${tag}vv$PowerIters")
    }
    val (aCtes, aLast) = chain("a", (i, j) => s"c_${i}_$j", "gp")
    val e1 = "sqrt(" +
      (1 to D).map(i => s"aw${PowerIters}_$i * aw${PowerIters}_$i").mkString(" + ") + ")"
    val defCols = (for (i <- 1 to D; j <- 1 to D) yield
      s"c_${i}_$j - e1 * av${PowerIters}_$i * av${PowerIters}_$j AS d_${i}_$j")
      .mkString(",\n    ")
    val (bCtes, bLast) = chain("b", (i, j) => s"d_${i}_$j", "dp")
    val e2 = "sqrt(" +
      (1 to D).map(i => s"bw${PowerIters}_$i * bw${PowerIters}_$i").mkString(" + ") + ")"
    val dot = (1 to D)
      .map(i => s"av${PowerIters}_$i * bv${PowerIters}_$i").mkString(" + ")
    val out = (Seq(
      s"round(e1, 6) + 0.0 AS eig1",
      s"round($e2, 6) + 0.0 AS eig2",
      s"round($e2 / (e1 + $e2), 6) + 0.0 AS share2",
      s"round(abs($dot), 6) + 0.0 AS abs_dot") ++
      (1 to D).map(i => s"round(bv${PowerIters}_$i, 6) + 0.0 AS pc2_$i"))
      .mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:$D] AS v FROM embeddings),
       |g AS (SELECT i, j, round(avg(v[i] * v[j]) - avg(v[i]) * avg(v[j]), 6) AS cov
       |  FROM e, LATERAL unnest(range(1, $D + 1)) t1(i),
       |    LATERAL unnest(range(1, $D + 1)) t2(j)
       |  GROUP BY 1, 2),
       |gp AS (SELECT $covCells FROM g),
       |$aCtes,
       |e1c AS (SELECT *, $e1 AS e1 FROM $aLast),
       |dp AS (SELECT *, $defCols FROM e1c),
       |$bCtes
       |SELECT $out FROM $bLast""".stripMargin
  }

  // -------------------------------------------------------- persistence

  /** Persist a trained model under `dir` as one tiny parquet of (kind, i,
    * j, v) rows — "mean" rows carry m_i at (i, 0), "l" rows the Cholesky
    * factor at (i, j). Parquet doubles are binary-exact, so
    * [[whitenWith]] over [[loadModel]] reproduces [[whiten]] bit-for-bit.
    */
  def saveModel(emb: DataFrame, dir: String): Unit = {
    val (m, l) = model(emb)
    val spark = emb.sparkSession
    import spark.implicits._
    val rows =
      m.zipWithIndex.map { case (v, i) => ("mean", i, 0, v) } ++
        (for (i <- 0 until D; j <- 0 to i) yield ("l", i, j, l(i)(j)))
    graft.sources.ModelStore.save(rows.toSeq.toDF("kind", "i", "j", "v"), dir)
  }

  /** Load a persisted (means, L) model. Fails loudly on a wrong-D artifact
    * rather than silently whitening with a garbage factor.
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (Array[Double], Array[Array[Double]]) = {
    val rows = graft.sources.ModelStore.load(spark, dir).collect()
    val m = Array.ofDim[Double](D)
    val l = Array.ofDim[Double](D, D)
    var nM = 0
    var nL = 0
    rows.foreach { r =>
      val (kind, i, j, v) = (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3))
      require(i >= 0 && i < D && j >= 0 && j < D,
        s"whitening model at $dir has index ($i,$j) outside D=$D — trained with a different D")
      kind match {
        case "mean" => m(i) = v; nM += 1
        case "l"    => l(i)(j) = v; nL += 1
        case other  => throw new IllegalArgumentException(
          s"whitening model at $dir has unknown row kind '$other'")
      }
    }
    require(nM == D && nL == D * (D + 1) / 2,
      s"whitening model at $dir is incomplete: $nM mean rows (want $D), " +
        s"$nL factor rows (want ${D * (D + 1) / 2})")
    (m, l)
  }

  /** Oracle twin: covariance + means CTEs pivoted to scalars, the Cholesky
    * columns unrolled one CTE per column (each references the previous —
    * no lateral-alias dependence), then the forward substitution chained
    * per dimension. Every sum is written left-associated so DuckDB executes
    * the same IEEE operation sequence as [[cholesky]]/[[whiten]].
    */
  val sqlWhiten: String =
    s"""$sqlWhitenPrefix
       |SELECT vec_id, ${(0 until D).map(i => s"round(y$i, 4) AS y$i").mkString(", ")}
       |FROM s$D ORDER BY vec_id""".stripMargin

  /** Oracle for [[mahalanobis]]: the same substitution CTEs, squares
    * left-associated over the unrounded columns, top-K by (md2, vec_id).
    */
  val sqlMahalanobis: String = {
    val sq = (0 until D).map(i => s"y$i * y$i").mkString(" + ")
    s"""$sqlWhitenPrefix,
       |scored AS (SELECT vec_id, round($sq, 4) AS md2 FROM s$D)
       |SELECT rnk, vec_id, md2 FROM (
       |  SELECT vec_id, md2,
       |    row_number() OVER (ORDER BY md2 DESC, vec_id) AS rnk
       |  FROM scored) WHERE rnk <= $MahalTopK
       |ORDER BY rnk""".stripMargin
  }

  /** The shared oracle scaffolding of [[sqlWhiten]] / [[sqlMahalanobis]]:
    * covariance + means pivoted to scalars, Cholesky CTEs, forward
    * substitution to the UNROUNDED y columns in CTE s$D.
    */
  private lazy val sqlWhitenPrefix: String = {
    val covCells = (for (i <- 1 to D; j <- 1 to i) yield
      s"max(CASE WHEN g.i = $i AND g.j = $j THEN cov END) AS c_${i}_$j").mkString(",\n    ")
    val meanCells = (1 to D)
      .map(i => s"max(CASE WHEN mn.i = $i THEN m END) AS m_$i").mkString(", ")
    // one CTE per Cholesky column j: l_j_j then l_i_j for i > j.
    // Each pivot sqrt carries the SAME strict positive-pivot guard as
    // cholesky(): without it, a pivot of exactly 0 slides through sqrt to
    // a divide-by-zero inf (and the engines would diverge precisely in the
    // degenerate case the Scala require exists for) — error() makes the
    // oracle fail as loudly as the Scala path
    def guardedSqrt(pivot: String, j: Int): String =
      s"CASE WHEN $pivot <= 0 THEN error('covariance is not positive " +
        s"definite at dim $j (oracle pivot guard)') ELSE sqrt($pivot) END"
    val cholCtes = (1 to D).map { j =>
      val prev = if (j == 1) "gp" else s"ch${j - 1}"
      val sumJJ = (1 until j).map(k => s"l_${j}_$k * l_${j}_$k").mkString(" + ")
      val pivot =
        if (j == 1) s"c_1_1 + $DiagEps"
        else s"c_${j}_$j + $DiagEps - ($sumJJ)"
      val diag = guardedSqrt(pivot, j)
      val offs = (j + 1 to D).map { i =>
        val sumIJ = (1 until j).map(k => s"l_${i}_$k * l_${j}_$k").mkString(" + ")
        val num = if (j == 1) s"c_${i}_1" else s"(c_${i}_$j - ($sumIJ))"
        s"$num / (${guardedSqrt(pivot, j)}) AS l_${i}_$j"
      }
      val cols = (s"$diag AS l_${j}_$j" +: offs).mkString(",\n    ")
      s"ch$j AS (SELECT *, $cols FROM $prev)"
    }
    // forward substitution, one CTE per dimension
    val subCtes = (1 to D).map { i =>
      val prev = if (i == 1) "rows" else s"s${i - 1}"
      val sumK = (1 until i).map(k => s"l_${i}_$k * y${k - 1}").mkString(" + ")
      val num = if (i == 1) s"(v[1] - m_1)" else s"((v[$i] - m_$i) - ($sumK))"
      s"s$i AS (SELECT *, $num / l_${i}_$i AS y${i - 1} FROM $prev)"
    }
    s"""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:$D] AS v FROM embeddings),
       |g AS (SELECT i::INT AS i, j::INT AS j,
       |    round(avg(v[i] * v[j]) - avg(v[i]) * avg(v[j]), 6) AS cov
       |  FROM e, LATERAL unnest(range(1, $D + 1)) t1(i),
       |    LATERAL unnest(range(1, $D + 1)) t2(j) GROUP BY 1, 2),
       |mn AS (SELECT i::INT AS i, round(avg(v[i]), 6) AS m
       |  FROM e, LATERAL unnest(range(1, $D + 1)) t(i) GROUP BY 1),
       |gp AS (SELECT
       |    $covCells,
       |    $meanCells
       |  FROM g, mn),
       |${cholCtes.mkString(",\n")},
       |rows AS (SELECT vec_id, v, ch$D.* FROM e, ch$D),
       |${subCtes.mkString(",\n")}""".stripMargin
  }
}
