package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Portable

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force cosine top-k is the correctness baseline: the (small) query
  * set is broadcast against the corpus — no shuffle of the corpus at all —
  * and the per-row dot product is a codegen'd higher-order expression.
  *
  * The scale path is IVF: a coarse quantizer (here the label column stands
  * in for a trained k-means assignment — deterministic, so oracle-checkable)
  * restricts each query to its nearest `nprobe` partitions, turning a full
  * scan into a partition-pruned scan at 100 TB.
  */
object Similarity {

  /** MMR trade-off: λ weights relevance, 1−λ the diversity penalty. */
  val MmrLambda = 0.7
  val MmrCand = 20
  val MmrK = 10

  /** Input to the per-query MMR fold: one row per ordered candidate pair
    * (a scored against already-selectable b), plus a's relevance.
    */
  final case class MmrIn(qid: Long, a_id: Long, rel: Double,
                         b_id: Long, psim: Double)

  /** One MMR pick. */
  final case class MmrOut(qid: Long, rnk: Int, vec_id: Long,
                          rel: Double, mmr: Double)

  /** Codegen'd native expression (graft.functions.DotProduct); the
    * composable zip_with/aggregate form allocates per row and was the
    * benchmark bottleneck at O(n^2) pair volume.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorExprs.norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Vectors cast to double (fp-portable with the oracle). */
  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Brute-force cosine top-k for queries (vec_id < nQueries), rounded sims,
    * deterministic tie-break on vec_id.
    *
    * SCALE: this is the declared exact BASELINE — it broadcasts the QUERY
    * side only (fine while queries fit in memory) but scans every corpus
    * vector per query. At corpus scale use [[knnIvf]] / [[knnIvfKmeans]]
    * (cell-pruned probes) for queries, or [[nnAll]] (cell-blocked equi-join)
    * for all-pairs; keep this form for small corpora and for validating IVF
    * recall.
    */
  def knnBrute(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = vecs(emb).withColumn("nrm", norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  def sqlKnnBrute(nQueries: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |sims AS (SELECT q.qid, e.vec_id,
       |    round(list_dot_product(q.qv, e.v)
       |      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 4) AS sim
       |  FROM e, q WHERE e.vec_id <> q.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin

  /** Brute-force cosine top-k over INT8-QUANTIZED vectors, with an honest
    * per-row recall flag against the exact float top-k. Symmetric
    * per-vector quantization (q_i = round(x_i / max|x| * 127)) makes cosine
    * scale-invariant — the per-vector scales cancel — so similarity runs
    * directly on the small integers, and integer dot products are EXACT in
    * both engines (|q| ≤ 127, 64 dims → sums < 2^21, no float drift).
    *
    * SCALE: at 100 TB the embedding store is memory-bound; int8 cuts it 4×
    * and the quantized corpus co-resides with IVF cells ([[knnIvfKmeans]]).
    * `in_exact` measures what the compression costs: recall is reported,
    * not assumed.
    */
  def knnQuantized(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = vecs(emb)
      .withColumn("scale",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)))
      .withColumn("qv", transform(col("v"), x => round(x / col("scale") * 127, 0)))
      .withColumn("qnrm", norm(col("qv")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("qnrm").as("qqnrm"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qqv"), col("qv")) / (col("qqnrm") * col("qnrm")), 4).as("qsim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("vec_id"))
    val quantTop = sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
    val exact = knnBrute(emb, nQueries, k)
      .select(col("qid").as("eqid"), col("vec_id").as("evid"))
    quantTop
      .join(broadcast(exact),
        col("qid") === col("eqid") && col("vec_id") === col("evid"), "left")
      .select(col("qid"), col("rnk"), col("vec_id"), col("qsim"),
        col("evid").isNotNull.as("in_exact"))
      .orderBy(col("qid"), col("rnk"))
  }

  def sqlKnnQuantized(nQueries: Int, k: Int): String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qz AS (SELECT vec_id,
       |    list_transform(v, x -> round(
       |      x / greatest(list_max(list_transform(v, y -> abs(y))), 1e-12) * 127)) AS qv
       |  FROM e0),
       |en AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS qnrm FROM qz),
       |q AS (SELECT vec_id AS qid, qv AS qqv, qnrm AS qqnrm FROM en
       |  WHERE vec_id < $nQueries),
       |sims AS (SELECT q.qid, en.vec_id,
       |    round(list_dot_product(q.qqv, en.qv) / (q.qqnrm * en.qnrm), 4) AS qsim
       |  FROM en, q WHERE en.vec_id <> q.qid),
       |qt AS (SELECT qid, rnk, vec_id, qsim FROM (
       |  SELECT qid, vec_id, qsim,
       |    row_number() OVER (PARTITION BY qid ORDER BY qsim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k),
       |exq AS (SELECT vec_id AS qid, v AS qv2 FROM e0 WHERE vec_id < $nQueries),
       |exsims AS (SELECT x.qid, e0.vec_id,
       |    round(list_dot_product(x.qv2, e0.v)
       |      / (sqrt(list_dot_product(x.qv2, x.qv2)) * sqrt(list_dot_product(e0.v, e0.v))), 4) AS sim
       |  FROM e0, exq x WHERE e0.vec_id <> x.qid),
       |ex AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM exsims) WHERE rnk <= $k)
       |SELECT qt.qid, qt.rnk, qt.vec_id, qt.qsim,
       |  (ex.vec_id IS NOT NULL) AS in_exact
       |FROM qt LEFT JOIN ex ON ex.qid = qt.qid AND ex.vec_id = qt.vec_id
       |ORDER BY qt.qid, qt.rnk""".stripMargin

  /** Per-label int8 quantization error budget (c5): the cosine between
    * each vector and its int8-quantize-then-reconstruct round trip,
    * aggregated per coarse cell — the error-measurement companion to
    * [[knnQuantized]]'s recall flag. A cell whose avg reconstruction
    * cosine drifts from ~1.0 is where the symmetric per-vector grid is
    * too coarse and the 100 TB store should keep that cell at fp16.
    *
    * Pure per-row codegen (quantize, reconstruct, one dot product) plus a
    * partial-aggregated per-label mean — the corpus is scanned once and
    * only (label, stats) rows shuffle.
    */
  def quantError(emb: DataFrame): DataFrame = {
    val e = vecs(emb)
      .withColumn("scale",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)))
      .withColumn("r",
        transform(col("v"), x => round(x / col("scale") * 127, 0) * col("scale") / 127))
    val denom = norm(col("v")) * norm(col("r"))
    val cosRt = when(denom === 0, lit(1.0)) // zero vector reconstructs exactly
      .otherwise(dot(col("v"), col("r")) / denom)
    e.select(col("label"), cosRt.as("c"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("c")), 6).as("avg_cos"),
        round(min(col("c")), 6).as("min_cos"))
      .orderBy(col("label"))
  }

  val sqlQuantError: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |qz AS (SELECT vec_id, label, v,
      |    list_transform(v, x -> round(
      |        x / greatest(list_max(list_transform(v, y -> abs(y))), 1e-12) * 127)
      |      * greatest(list_max(list_transform(v, y -> abs(y))), 1e-12) / 127) AS r
      |  FROM e),
      |sc AS (SELECT label,
      |    CASE WHEN sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(r, r)) = 0
      |      THEN 1.0
      |      ELSE list_dot_product(v, r)
      |        / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(r, r))) END AS c
      |  FROM qz)
      |SELECT label, count(*)::BIGINT AS n,
      |  round(avg(c), 6) AS avg_cos, round(min(c), 6) AS min_cos
      |FROM sc GROUP BY label ORDER BY label""".stripMargin

  /** All-pairs nearest neighbor (embedding-cosine near-dup detection): for
    * every vector, its closest neighbor WITHIN its coarse-quantizer cell —
    * the label column, as in [[knnIvf]] / [[cosineDupPairs]] (at scale the
    * cell is a trained k-means assignment, [[kmeansModel]], and the bucket/
    * partition key of the vector table).
    *
    * Candidates come from an equi-join on the cell key, so pair volume is
    * bounded by cell co-membership — never the n^2 cross product — and
    * NOTHING is broadcast: both sides shuffle (or are pre-bucketed) by
    * cell, which survives a corpus that outgrows any single executor. The
    * per-vector arg-max is a partial-aggregating hash max over
    * struct(sim, -vec_id) — same (sim desc, vec_id asc) order as a rank-1
    * window, without sorting the pair set. A vector alone in its cell has
    * no near-dup candidate and emits no row (PlanShapeSpec locks the
    * no-broadcast / no-cross-product shape).
    */
  def nnAll(emb: DataFrame): DataFrame = {
    val e = vecs(emb).withColumn("nrm", norm(col("v")))
    val q = e.select(col("label"), col("vec_id").as("qid"),
      col("v").as("qv"), col("nrm").as("qnrm"))
    val sims = e.join(q, "label")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 4).as("sim"))
    sims
      .groupBy(col("qid"))
      .agg(max(struct(col("sim"), (-col("vec_id")).as("neg_id"),
        col("vec_id").as("nn"))).as("best"))
      .select(col("qid"), col("best.nn").as("nn"), col("best.sim").as("sim"))
      .orderBy(col("qid"))
  }

  val sqlNnAll: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |sims AS (SELECT q.vec_id AS qid, e.vec_id,
      |    round(list_dot_product(q.v, e.v)
      |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 4) AS sim
      |  FROM e, e q WHERE e.label = q.label AND e.vec_id <> q.vec_id)
      |SELECT qid, vec_id AS nn, sim FROM (
      |  SELECT qid, vec_id, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
      |  FROM sims) WHERE rnk = 1
      |ORDER BY qid""".stripMargin

  /** IVF-style top-k: element-wise centroid per label partition, probe the
    * `nprobe` nearest centroids per query (L2), search only those
    * partitions.
    *
    * RECALL depends on the cells being geometrically coherent: over an
    * arbitrary pre-existing partition key (like the fixture's label column)
    * pruning loses most true neighbors (measured 0.3 recall@3 at nprobe=2),
    * while the same search over TRAINED cells ([[knnIvfKmeans]]) reaches
    * 0.97 — at scale, train the coarse quantizer; use this form only when
    * the partition key is already a clustering. ScaleOpsSpec locks the
    * comparison.
    */
  def knnIvf(emb: DataFrame, nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val e = vecs(emb)
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(avg(col("x")).as("cv"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val qdist = q.select(col("qid"), posexplode(col("qv")).as(Seq("i", "qx")))
      .join(broadcast(cent), "i")
      .groupBy(col("qid"), col("label"))
      .agg(sum((col("qx") - col("cv")) * (col("qx") - col("cv"))).as("d"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("label"))
    val probes = qdist.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe).select(col("qid"), col("label"))
    val eN = e.withColumn("nrm", norm(col("v")))
    val cand = eN.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
    val qN = q.select(col("qid").as("qid2"), col("qv"), norm(col("qv")).as("qnrm"))
    val sims = cand.join(broadcast(qN), col("qid") === col("qid2"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  def sqlKnnIvf(nQueries: Int, k: Int, nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT label, i, avg(v[i]) AS cv
       |  FROM e, LATERAL unnest(range(1, len(v) + 1)) t(i) GROUP BY 1, 2),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |qdist AS (SELECT q.qid, c.label, sum((q.qv[c.i] - c.cv) * (q.qv[c.i] - c.cv)) AS d
       |  FROM q, cent c GROUP BY 1, 2),
       |probes AS (SELECT qid, label FROM (
       |  SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY d, label) AS pr
       |  FROM qdist) WHERE pr <= $nprobe),
       |cand AS (SELECT p.qid, e.vec_id, e.v FROM e JOIN probes p ON e.label = p.label
       |  WHERE e.vec_id <> p.qid),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(q.qv, c.v)
       |      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 4) AS sim
       |  FROM cand c JOIN q ON q.qid = c.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin

  // ------------------------------------------------- k-means (Lloyd's)

  /** Deterministic distributed k-means: fixed iteration count, centroids
    * initialized from the first k vectors, squared-L2 assignment with
    * (distance, cluster) tie-break. Centroids live EXPLODED as (c, i, cv)
    * rows — updates are one groupBy avg, assignment is a broadcast join on
    * the dimension index + partial-aggregated distance sum; the corpus
    * never shuffles by vector. Distances and centroids are rounded to 6
    * decimals at every iteration boundary so floating-point summation
    * order (partial aggregation) cannot flip an argmin between engines.
    */
  /** Train the model: returns (centroids(c, i, cv), assignment(vec_id, c)),
    * both small (k x dims, n x 2) and MATERIALIZED via localCheckpoint —
    * lineage-cut blocks the ContextCleaner releases with the RDD, NOT
    * CacheManager entries (a cache() here would be plan-keyed, so a second
    * identical training call would silently return the first call's cached
    * result — benchmarks would measure cache hits, and the entries would
    * pin storage for the session). Like MLlib's fit, training is an
    * ACTION: the loop runs when called. The exploded working set is cached
    * for the loop (every iteration reads it twice) and released before
    * returning.
    */
  /** Per-dimension long form of the vector table (vec_id, i, x) — the
    * working set both the training loop and [[assign]] consume.
    */
  private def explodedDims(emb: DataFrame): DataFrame =
    vecs(emb)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).cast("int").as("i"), col("x"))

  /** Nearest-centroid assignment of an exploded vector table: broadcast
    * join on the dimension index, partial-aggregated distance sum, argmin
    * via hash max over struct(-d, -c, c) — (distance, cluster) tie-break
    * without sorting.
    */
  private def assignStep(ex: DataFrame, cent: DataFrame): DataFrame = {
    val d = ex.join(broadcast(cent), "i")
      .groupBy(col("vec_id"), col("c"))
      .agg(round(sum((col("x") - col("cv")) * (col("x") - col("cv"))), 6).as("d"))
    d.groupBy(col("vec_id"))
      .agg(max(struct((-col("d")).as("nd"), (-col("c")).as("nc"), col("c").as("cc"))).as("b"))
      .select(col("vec_id"), col("b.cc").as("c"))
  }

  def kmeansModel(emb: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val ex = explodedDims(emb).cache()
    try kmeansModelFromEx(ex, k, iters)
    finally ex.unpersist()
  }

  /** The Lloyd loop over an ALREADY-CACHED exploded table — factored out
    * so multi-k callers ([[kmeansElbow]]) explode the corpus ONCE and
    * reuse the cache across trainings instead of paying one explode per
    * k inside [[kmeansModel]] plus one per WCSS join.
    */
  private def kmeansModelFromEx(ex: DataFrame, k: Int, iters: Int)
      : (DataFrame, DataFrame) = {
    var cent = ex.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("c"), col("i"), round(col("x"), 6).as("cv"))
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      assigned = assignStep(ex, cent)
      // materialize the LAST assignment before deriving its centroid
      // update from it: cent's lineage runs THROUGH assigned, so
      // checkpointing cent first and assigned second would re-run the
      // whole iteration chain a second time for the same rows
      if (it == iters) assigned = assigned.localCheckpoint(true)
      cent = assigned.join(ex, "vec_id")
        .groupBy(col("c"), col("i")).agg(round(avg(col("x")), 6).as("cv"))
    }
    (cent.localCheckpoint(true), assigned)
  }

  /** k values for the c7 elbow table. */
  val ElbowKs: Seq[Int] = Seq(2, 4, 8)

  /** k-means elbow report (c7) — the tuning table for the clustering
    * knob every cell-blocked operator downstream depends on (IVF probes,
    * SemDeDup cells, int8 budgets): within-cluster sum of squares after
    * the same fixed-iteration training as c2, for each candidate k. The
    * operator reads where the curve bends; a k past the bend buys cells,
    * not structure. The s10/d18 honesty-table pattern applied to the
    * quantizer itself.
    *
    * Scale shape: one [[kmeansModel]] training per k (each its own
    * bounded Lloyd loop over the cached exploded table), then one
    * assignment-joined pass per k for the WCSS — per-vector distances
    * rounded at the same 6-decimal boundary as training, the corpus-sum
    * rounded at 2 (fp-order-safe far below either digit).
    */
  def kmeansElbow(emb: DataFrame): DataFrame = {
    // ONE cached explode shared by all three trainings AND their WCSS
    // joins — the per-k kmeansModel would re-explode the corpus each time
    val ex = explodedDims(emb).cache()
    try {
      // materialize the cache ONCE up front, then run the three k
      // trainings CONCURRENTLY (Par.run): each is an independent Lloyd
      // loop over the same cached explode, and the sequential form left
      // most of the machine idle during each training's small stages
      ex.count()
      val reports = graft.functions.Par.run(ElbowKs.map { k => () =>
        {
          val (cent, assigned) = kmeansModelFromEx(ex, k, 2)
          val perVec = assigned.join(ex, "vec_id")
            .join(broadcast(cent), Seq("c", "i"))
            .groupBy(col("vec_id"))
            .agg(round(sum((col("x") - col("cv")) * (col("x") - col("cv"))), 6).as("dd"))
          // the WCSS rows are tiny: force them while the cache is live
          perVec.agg(round(sum(col("dd")), 2).as("wcss"))
            .select(lit(k).as("k"), col("wcss"))
            .localCheckpoint(true)
        }
      }: _*)
      reports.reduce(_.unionByName(_)).orderBy(col("k"))
    } finally ex.unpersist()
  }

  def sqlKmeansElbow: String = {
    val parts = ElbowKs.map { k =>
      val (ctes, lastA, lastC) = sqlKmeansCtes(k, 2)
      s"""(WITH $ctes,
         |pv AS (SELECT a.vec_id, round(sum((ex.x - p.cv) * (ex.x - p.cv)), 6) AS dd
         |  FROM $lastA a JOIN ex ON ex.vec_id = a.vec_id
         |  JOIN $lastC p ON p.c = a.c AND p.i = ex.i
         |  GROUP BY a.vec_id)
         |SELECT $k::INT AS k, round(sum(dd), 2) AS wcss FROM pv)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$parts\nORDER BY k"
  }

  /** CENTROID SILHOUETTE (c11): per-cluster and overall quality score —
    * s = (b − a) / max(a, b) with a = distance to the own centroid and
    * b = distance to the nearest OTHER centroid. c7's elbow says how
    * WCSS falls with k; the silhouette says whether the chosen k's cells
    * are actually separated (≈1 tight and far apart, ≈0 touching, <0
    * misassigned) — the clustering-quality row a retrain decision reads
    * next to s15's drift. Centroid form, not pairwise: the classic
    * all-pairs silhouette is quadratic per cell; against centroids it is
    * one broadcast join per vector — the only form that scales.
    *
    * Determinism: squared distances are rounded at the aggregate (the
    * kmeans convention), sqrt/divide are per-row IEEE, per-row s is
    * rounded to a DECIMAL so the per-cell means are exact integer-scaled
    * sums divided once — no float reduction crosses a partition.
    */
  def silhouette(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val (cent, assigned) = kmeansModel(emb, k, iters)
    // wo (corpus × k distance rows) feeds the own-cell slice AND the
    // nearest-other aggregate; s feeds the per-cell AND the corpus
    // aggregate — uncheckpointed, the corpus explode-distance pass ran
    // twice and the whole silhouette pipeline twice more (the d24
    // shared-intermediate rule)
    val dd = explodedDims(emb).join(broadcast(cent), "i")
      .groupBy(col("vec_id"), col("c"))
      .agg(round(sum((col("x") - col("cv")) * (col("x") - col("cv"))), 6).as("dd"))
    val wo = dd.join(assigned.select(col("vec_id"), col("c").as("own")), "vec_id")
      .localCheckpoint(true)
    val aSide = wo.filter(col("c") === col("own"))
      .select(col("vec_id"), col("own"), sqrt(col("dd")).as("a"))
    val bSide = wo.filter(col("c") =!= col("own"))
      .groupBy(col("vec_id")).agg(sqrt(min(col("dd"))).as("b"))
    val s = aSide.join(bSide, "vec_id")
      .select(col("vec_id"), col("own"),
        round(when(greatest(col("a"), col("b")) > 0,
            (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)), 6).cast("decimal(18,6)").as("s"))
      .localCheckpoint(true)
    val per = s.groupBy(col("own").as("c"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("s")).cast("double") / count(lit(1)), 4).as("mean_sil"))
    val overall = s.agg(count(lit(1)).as("n"),
        round(sum(col("s")).cast("double") / count(lit(1)), 4).as("mean_sil"))
      .select(lit(-1).as("c"), col("n"), col("mean_sil"))
    per.unionByName(overall).orderBy(col("c"))
  }

  /** Oracle for [[silhouette]]: the kmeans CTEs, all-centroid distances,
    * nearest-other minimum and the decimal-mean arithmetic replayed.
    */
  def sqlSilhouette(k: Int, iters: Int): String = {
    val (ctes, lastA, lastC) = sqlKmeansCtes(k, iters)
    s"""WITH $ctes,
       |dd AS (SELECT ex.vec_id, p.c,
       |    round(sum((ex.x - p.cv) * (ex.x - p.cv)), 6) AS dd
       |  FROM ex JOIN $lastC p USING (i) GROUP BY 1, 2),
       |wo AS (SELECT dd.*, a.c AS own FROM dd JOIN $lastA a USING (vec_id)),
       |aa AS (SELECT vec_id, own, sqrt(dd) AS a FROM wo WHERE c = own),
       |bb AS (SELECT vec_id, sqrt(min(dd)) AS b FROM wo WHERE c != own GROUP BY 1),
       |ss AS (SELECT aa.vec_id, aa.own,
       |    round(CASE WHEN greatest(a, b) > 0
       |      THEN (b - a) / greatest(a, b) ELSE 0.0 END, 6)::DECIMAL(18,6) AS s
       |  FROM aa JOIN bb USING (vec_id)),
       |per AS (SELECT own AS c, count(*)::BIGINT AS n,
       |    round(sum(s)::DOUBLE / count(*), 4) AS mean_sil FROM ss GROUP BY 1)
       |SELECT c, n, mean_sil FROM per
       |UNION ALL
       |SELECT -1, count(*)::BIGINT, round(sum(s)::DOUBLE / count(*), 4) FROM ss
       |ORDER BY c""".stripMargin
  }

  /** Assign vectors to their nearest centroid from an ALREADY-TRAINED
    * centroid table ([[kmeansModel]]'s first output or [[loadCentroids]]):
    * one corpus pass, no training rounds — how a saved coarse quantizer
    * labels a new shard (and how IVF cells are rebuilt from centroids
    * alone when only the small artifact shipped).
    */
  def assign(emb: DataFrame, cent: DataFrame): DataFrame =
    assignStep(explodedDims(emb), cent)

  // -------------------------------------------------------- persistence

  /** Train k-means and persist the model under `dir`: `dir/centroids`
    * (c, i, cv) and `dir/cells` (vec_id, c) — centroids are the reusable
    * quantizer, cells the IVF index of THIS corpus. Parquet doubles are
    * binary-exact, so the loaded model is bit-identical to the returned
    * one. NOTE the Lloyd's pairing: `cells` is the assignment the LAST
    * update step averaged over, while `centroids` are that update's
    * output — [[assign]] over the saved centroids is the (k+1)-th
    * assignment, not a replay of `cells`.
    */
  def trainAndSaveKmeans(emb: DataFrame, k: Int, iters: Int, dir: String)
      : (DataFrame, DataFrame) = {
    val (cent, assigned) = kmeansModel(emb, k, iters)
    graft.sources.ModelStore.save(cent, s"$dir/centroids")
    // cells are one row PER VECTOR — corpus-scaling, parallel write
    graft.sources.ModelStore.saveLarge(assigned, s"$dir/cells")
    (cent, assigned)
  }

  /** The persisted centroid table (c, i, cv). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, s"$dir/centroids")

  /** The persisted IVF cell assignment (vec_id, c). */
  def loadCells(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, s"$dir/cells")

  def kmeans(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val (cent, assigned) = kmeansModel(emb, k, iters)
    val sizes = assigned.groupBy(col("c")).agg(count(lit(1)).as("n"))
    cent.filter(col("i") <= 8).join(sizes, "c")
      .select(col("c"), col("n"), col("i"), col("cv"))
      .orderBy(col("c"), col("i"))
  }

  /** IVF top-k over TRAINED k-means cells (the composed form of [[knnIvf]],
    * which uses the pre-labeled partition): probe the nprobe nearest
    * centroids per query, search only those cells' vectors. At scale the
    * assignment is the partition/bucket key of the vector table, so a probe
    * is a partition-pruned scan.
    */
  /** `candPred` (s12): an optional metadata predicate evaluated on the
    * CANDIDATE rows inside the probed cells — filtered vector search,
    * the "top-k among label=X" query every serving stack needs. The
    * filter applies BEFORE distances are computed (pre-filter: selective
    * predicates shrink the scan, and k never starves the way post-
    * filtering a fixed candidate list does); the standard operational
    * companion is a wider nprobe, since the filter thins each probed
    * cell. Default `lit(true)` = unfiltered, the s4 form.
    */
  def knnIvfKmeans(emb: DataFrame, nQueries: Int, k: Int,
      kClusters: Int, iters: Int, nprobe: Int,
      candPred: Column = lit(true)): DataFrame = {
    val (cent, assigned) = kmeansModel(emb, kClusters, iters)
    val e = vecs(emb).join(assigned, "vec_id").filter(candPred)
    val q = vecs(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val qdist = q.select(col("qid"), posexplode(col("qv")).as(Seq("i0", "qx")))
      .select(col("qid"), (col("i0") + 1).cast("int").as("i"), col("qx"))
      .join(broadcast(cent), "i")
      .groupBy(col("qid"), col("c"))
      .agg(round(sum((col("qx") - col("cv")) * (col("qx") - col("cv"))), 6).as("d"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("c"))
    val probes = qdist.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe).select(col("qid"), col("c"))
    val eN = e.withColumn("nrm", norm(col("v")))
    val cand = eN.join(broadcast(probes), Seq("c"))
      .filter(col("vec_id") =!= col("qid"))
    val qN = q.select(col("qid").as("qid2"), col("qv"), norm(col("qv")).as("qnrm"))
    val sims = cand.join(broadcast(qN), col("qid") === col("qid2"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** `candPred`: SQL twin of the Spark `candPred` — a predicate over
    * `em` (the embeddings row joined for its metadata columns).
    */
  def sqlKnnIvfKmeans(nQueries: Int, k: Int, kClusters: Int, iters: Int, nprobe: Int,
      candPred: String = "true"): String = {
    val (ctes, lastA, lastC) = sqlKmeansCtes(kClusters, iters)
    s"""WITH $ctes,
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |qdist AS (SELECT q.qid, p.c, round(sum((q.qv[p.i] - p.cv) * (q.qv[p.i] - p.cv)), 6) AS d
       |  FROM q, $lastC p GROUP BY 1, 2),
       |probes AS (SELECT qid, c FROM (
       |  SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY d, c) AS pr
       |  FROM qdist) WHERE pr <= $nprobe),
       |cand AS (SELECT p.qid, e.vec_id, e.v
       |  FROM e JOIN embeddings em ON em.vec_id = e.vec_id
       |  JOIN $lastA a ON a.vec_id = e.vec_id
       |  JOIN probes p ON p.c = a.c
       |  WHERE e.vec_id <> p.qid AND ($candPred)),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(q.qv, c.v)
       |      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 4) AS sim
       |  FROM cand c JOIN q ON q.qid = c.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin
  }

  /** CTE block for the k-means iterations; exposes `ex(vec_id, i, x)`,
    * final assignment `aN(vec_id, c)` and final centroids `cN(c, i, cv)`.
    * Returns (ctes, assignName, centName).
    */
  def sqlKmeansCtes(k: Int, iters: Int,
      eCte: String = "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)")
      : (String, String, String) = {
    def step(it: Int, prevCent: String): (String, String, String) = {
      val d = s"d$it"; val a = s"a$it"; val c = s"c$it"
      val ctes =
        s"""$d AS (SELECT ex.vec_id, p.c, round(sum((ex.x - p.cv) * (ex.x - p.cv)), 6) AS d
           |  FROM ex JOIN $prevCent p USING (i) GROUP BY 1, 2),
           |$a AS (SELECT vec_id, c FROM (
           |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
           |  FROM $d) WHERE rn = 1),
           |$c AS (SELECT $a.c, ex.i, round(avg(ex.x), 6) AS cv
           |  FROM $a JOIN ex USING (vec_id) GROUP BY 1, 2)""".stripMargin
      (ctes, a, c)
    }
    val steps = (1 to iters).foldLeft((List.empty[String], "", "c0")) {
      case ((acc, _, prev), it) =>
        val (ctes, a, c) = step(it, prev)
        (acc :+ ctes, a, c)
    }
    val (stepCtes, lastA, lastC) = steps
    val all =
      s"""$eCte,
         |ex AS (SELECT vec_id, i::INT AS i, v[i] AS x
         |  FROM e, LATERAL unnest(range(1, len(v) + 1)) t(i)),
         |c0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM ex WHERE vec_id < $k),
         |${stepCtes.mkString(",\n")}""".stripMargin
    (all, lastA, lastC)
  }

  def sqlKmeans(k: Int, iters: Int): String = {
    val (ctes, lastA, lastC) = sqlKmeansCtes(k, iters)
    s"""WITH $ctes,
       |sizes AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM $lastA GROUP BY 1)
       |SELECT $lastC.c, sizes.n, $lastC.i, $lastC.cv
       |FROM $lastC JOIN sizes USING (c) WHERE $lastC.i <= 8
       |ORDER BY c, i""".stripMargin
  }

  // ---------------------------------------- product quantization (ADC)

  /** PQ shape: M sub-spaces x k* codes each. With 64-dim embeddings this
    * is 8 blocks of 8 dims, 16 codes per block — a 16^8-point implicit
    * codebook from 128 stored sub-centroids, and each vector compresses to
    * 8 small code ids (vs 64 floats).
    */
  val PqBlocks = 8
  val PqCodes = 16
  val PqIters = 2

  /** ADC candidates kept per final neighbor for the exact rerank pass. */
  val PqRerank = 10

  /** Unit-normalized vectors, components rounded so both engines hold the
    * same doubles. PQ trains and scans NORMALIZED data: the exact baseline
    * ranks by cosine, and on the unit sphere L2 order IS cosine order
    * (d^2 = 2 - 2cos) — ADC on raw vectors would optimize a different
    * metric and bleed recall against the cosine ground truth.
    */
  private def unitVecs(emb: DataFrame): DataFrame = {
    val e = vecs(emb).withColumn("nrm", norm(col("v")))
    e.select(col("vec_id"),
      transform(col("v"), x => round(x / col("nrm"), 6)).as("v"))
  }

  /** Exploded per-dimension view of the UNIT vectors with the PQ block id. */
  private def explodedBlocks(emb: DataFrame, sub: Int): DataFrame =
    unitVecs(emb)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).cast("int").as("i"),
        (col("i0") / sub).cast("int").as("m"), col("x"))

  /** Per-(vector, block) nearest sub-centroid — [[assignStep]] lifted to
    * sub-spaces. `cent` is (c, i, cv); the block id is implied by the
    * dimension index, so the join key stays the single dim index and the
    * block comes along from the exploded side.
    */
  private def assignPqStep(ex: DataFrame, cent: DataFrame): DataFrame = {
    val d = ex.join(broadcast(cent), "i")
      .groupBy(col("vec_id"), col("m"), col("c"))
      .agg(round(sum((col("x") - col("cv")) * (col("x") - col("cv"))), 6).as("d"))
    d.groupBy(col("vec_id"), col("m"))
      .agg(max(struct((-col("d")).as("nd"), (-col("c")).as("nc"), col("c").as("cc"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.cc").as("c"))
  }

  /** Train all M product-quantizer codebooks in ONE distributed Lloyd's
    * loop (the block id just joins the grouping keys — M separate
    * trainings would scan the corpus M times for no reason), returning
    * (codebooks (c, i, cv), codes (vec_id, m, c)).
    *
    * Same determinism contract as [[kmeansModel]]: init from the first k*
    * vectors' sub-vectors, fixed iterations, round(6) at every boundary,
    * (distance, code) tie-break.
    */
  def pqModel(emb: DataFrame, sub: Int): (DataFrame, DataFrame) =
    pqTrainLoop(explodedBlocks(emb, sub))

  /** The multi-block Lloyd loop over ANY exploded (vec_id, i, m, x) frame —
    * shared by [[pqModel]] (raw sub-vectors) and [[knnIvfPq]] (residuals).
    */
  private def pqTrainLoop(exIn: DataFrame): (DataFrame, DataFrame) = {
    val ex = exIn.select(col("vec_id"), col("i"), col("m"), col("x")).cache()
    var cent = ex.filter(col("vec_id") < PqCodes)
      .select(col("vec_id").cast("int").as("c"), col("i"), round(col("x"), 6).as("cv"))
    var codes: DataFrame = null
    for (it <- 1 to PqIters) {
      codes = assignPqStep(ex, cent)
      // same materialization order as [[kmeansModel]]: the final centroids
      // derive FROM the final codes — checkpoint codes once, then the
      // centroid update is one cheap join-agg over the checkpointed rows
      // instead of a full re-run of the iteration chain
      if (it == PqIters) codes = codes.localCheckpoint(true)
      cent = codes.join(ex, Seq("vec_id", "m"))
        .groupBy(col("c"), col("i")).agg(round(avg(col("x")), 6).as("cv"))
    }
    val centOut = cent.localCheckpoint(true)
    ex.unpersist()
    (centOut, codes)
  }

  /** Train the PQ model and persist it under `dir`: `dir/pq_codebooks`
    * (c, i, cv — the M sub-quantizers, dimension-sized) and
    * `dir/pq_codes` (vec_id, m, c — THIS corpus's compressed form, one
    * row per vector per block, corpus-scaling). The codebooks alone
    * encode any new shard via [[encodePq]] — the same
    * small-artifact-labels-new-data shape as the k-means
    * centroids/cells split.
    */
  def trainAndSavePq(emb: DataFrame, sub: Int, dir: String): (DataFrame, DataFrame) = {
    val (cent, codes) = pqModel(emb, sub)
    graft.sources.ModelStore.save(cent, s"$dir/pq_codebooks")
    graft.sources.ModelStore.saveLarge(codes, s"$dir/pq_codes")
    (cent, codes)
  }

  /** The persisted PQ codebooks (c, i, cv). */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, s"$dir/pq_codebooks")

  /** The persisted PQ codes of the training corpus (vec_id, m, c). */
  def loadPqCodes(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, s"$dir/pq_codes")

  /** Compress a (new) shard against ALREADY-TRAINED codebooks: one pass,
    * no training rounds — how a saved quantizer encodes tomorrow's data.
    */
  def encodePq(emb: DataFrame, cent: DataFrame, sub: Int): DataFrame =
    assignPqStep(explodedBlocks(emb, sub), cent)

  /** Top-k nearest neighbors by PQ asymmetric distance computation
    * (Jégou/Douze/Schmid, TPAMI 2011) with exact rerank: queries stay
    * exact, the corpus is scanned as its PQ codes, the approximate
    * distance is the sum over blocks of the query's distance to each
    * block's assigned sub-centroid — read from a tiny per-query lookup
    * table (nQueries x M x k* rows) — and the ADC top-(PqRerank*k)
    * candidates get an exact-cosine rerank (the standard IVFADC+R
    * pipeline: codes prune, floats decide).
    *
    * Scale shape: the corpus is scanned as CODES (M small ints per
    * vector, the 100 TB memory story), the LUT join is a broadcast
    * equi-join on (block, code), the per-(query, vector) sum
    * partial-aggregates M rows map-side, and only the bounded candidate
    * set (PqRerank*k per query) fetches its float vector for the rerank.
    * Nothing corpus-sized is broadcast, the corpus never shuffles by
    * vector, and at scale this composes with IVF cells (probe first, ADC
    * within the probed cells, rerank the survivors).
    */
  def knnPq(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    // one-row dim probe, not a corpus-wide max — the knnIvfPq rationale.
    // PRECONDITION (declared, not probed): every embedding has the same
    // dimension. The block arithmetic below assumes it, so a mixed-dim
    // corpus is invalid input regardless of what any probe reads — the
    // old corpus-wide max() scanned everything and validated nothing.
    val dim = emb.select(size(col("embedding")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % PqBlocks == 0,
      s"dim $dim not divisible into $PqBlocks blocks")
    val sub = dim / PqBlocks
    val (cent, codes) = pqModel(emb, sub)
    val lut = explodedBlocks(emb, sub).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("m"), col("i"), col("x").as("qx"))
      .join(broadcast(cent), "i")
      .groupBy(col("qid"), col("m"), col("c"))
      .agg(round(sum((col("qx") - col("cv")) * (col("qx") - col("cv"))), 6).as("dq"))
    val adist = codes.join(broadcast(lut), Seq("m", "c"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("dq")), 6).as("adist"))
    rerankAdcTopK(adist, emb, nQueries, k)
  }

  /** Candidate-id cap for the exact rerank's In(vec_id) pushdown; a
    * request batch whose ADC survivors exceed it reranks via the plain
    * join instead (a mega-IN bloats codegen; the join stays candidate-
    * bounded either way — the [[ServeCellPushdownMax]] convention).
    */
  val RerankIdPushdownMax = 10000

  /** Shared ADC tail for [[knnPq]] and [[ivfPqSearch]]: keep the
    * PqRerank*k best candidates by (adist, vec_id), score them with the
    * exact unit-sphere cosine, emit the top-k — one definition so the two
    * paths (and their oracles) can never drift on the cutoff, tie-breaks
    * or rounding.
    *
    * CANDIDATE-ID SEEK (the ivfPqServe probed-cell pushdown applied to
    * the vector fetch, guide §3/§6): the candidate table is
    * REQUEST-BOUNDED (≤ [[PqRerank]]·k rows per query, never
    * corpus-scaled), so it eagerly checkpoints — the ADC pipeline runs
    * exactly once — and its distinct ids come back as one small driver
    * round-trip that pushes an In(vec_id) filter into the rerank's
    * corpus read. The exact rerank then fetches only candidate vectors
    * instead of re-scanning and re-normalizing the whole corpus; the
    * filter is a superset restriction of the join (every joined row's
    * vec_id is in the set), so the result is identical by construction.
    */
  private def rerankAdcTopK(adist: DataFrame, emb: DataFrame,
                            nQueries: Int, k: Int): DataFrame = {
    val wCand = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    val cands = adist.withColumn("cr", row_number().over(wCand))
      .filter(col("cr") <= PqRerank * k).select(col("qid"), col("vec_id"))
      .localCheckpoint(true)
    val candIds = cands.select(col("vec_id")).distinct()
      .limit(RerankIdPushdownMax + 1).collect().map(_.getLong(0))
    val corpusPruned =
      if (candIds.isEmpty) emb.filter(lit(false))
      else if (candIds.length <= RerankIdPushdownMax)
        emb.filter(col("vec_id").isin(candIds.toSeq: _*))
      else emb
    val u = unitVecs(corpusPruned)
    // query vectors come from the UNPRUNED corpus (a query need not be
    // its own candidate); vec_id < nQueries pushes down on its own
    val qv = unitVecs(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid2"), col("v").as("qv"))
    val sims = cands.join(u, "vec_id").join(broadcast(qv), col("qid") === col("qid2"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")), 4).as("sim")) // unit vectors: dot IS cosine
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** DuckDB twin of [[knnPq]]: replays the normalization, the one-loop
    * multi-block training, the ADC scoring and the rerank with identical
    * rounding and tie-breaks.
    */
  /** PQ Lloyd-round CTEs over an exploded (vec_id, i, m, x) CTE `ex` —
    * the SQL twin of [[pqTrainLoop]]; `prefix` keeps multiple PQ
    * trainings (raw s7, residual s8) from colliding in one query.
    * Returns (ctes, lastAssign, lastCent); expects `${prefix}c0` defined.
    */
  private def sqlPqStepCtes(ex: String, prefix: String): (String, String, String) = {
    def stepCtes(it: Int, prevCent: String): String = {
      val d = s"${prefix}d$it"; val a = s"${prefix}a$it"; val c = s"${prefix}c$it"
      s"""$d AS (SELECT $ex.vec_id, $ex.m, p.c, round(sum(($ex.x - p.cv) * ($ex.x - p.cv)), 6) AS d
         |  FROM $ex JOIN $prevCent p USING (i) GROUP BY 1, 2, 3),
         |$a AS (SELECT vec_id, m, c FROM (
         |  SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
         |  FROM $d) WHERE rn = 1),
         |$c AS (SELECT $a.c, $ex.i, round(avg($ex.x), 6) AS cv
         |  FROM $a JOIN $ex ON $ex.vec_id = $a.vec_id AND $ex.m = $a.m
         |  GROUP BY 1, 2)""".stripMargin
    }
    val steps = (1 to PqIters).map(it =>
      stepCtes(it, s"${prefix}c${it - 1}"))
    (steps.mkString(",\n"), s"${prefix}a$PqIters", s"${prefix}c$PqIters")
  }

  def sqlKnnPq(nQueries: Int, k: Int, dim: Int): String = {
    val sub = dim / PqBlocks
    val (stepSql, lastA, lastC) = sqlPqStepCtes("exb", "p")
    s"""WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
       |u AS (SELECT vec_id,
       |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
       |  FROM ev),
       |exb AS (SELECT vec_id, i::INT AS i, ((i - 1) // $sub)::INT AS m, v[i] AS x
       |  FROM u, LATERAL unnest(range(1, len(v) + 1)) t(i)),
       |pc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exb WHERE vec_id < $PqCodes),
       |$stepSql,
       |lut AS (SELECT exb.vec_id AS qid, exb.m, p.c,
       |    round(sum((exb.x - p.cv) * (exb.x - p.cv)), 6) AS dq
       |  FROM exb JOIN $lastC p USING (i) WHERE exb.vec_id < $nQueries GROUP BY 1, 2, 3),
       |ad AS (SELECT l.qid, a.vec_id, round(sum(l.dq), 6) AS adist
       |  FROM $lastA a JOIN lut l ON l.m = a.m AND l.c = a.c
       |  WHERE a.vec_id <> l.qid GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS cr
       |  FROM ad) WHERE cr <= ${PqRerank * k}),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(qu.v, xu.v), 4) AS sim
       |  FROM cand c JOIN u xu ON xu.vec_id = c.vec_id
       |  JOIN u qu ON qu.vec_id = c.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin
  }

  // ------------------------------------------------------------ IVF-PQ

  /** Coarse cells and probes for the composed IVF-PQ index (s8). */
  val IvfPqCoarse = 4
  val IvfPqProbes = 2

  /** Unit-normalized table in the (vec_id, label, embedding) shape the
    * k-means trainer consumes — the coarse quantizer for IVF-PQ must
    * cluster the SAME sphere the PQ codebooks and the rerank use.
    */
  private def unitEmb(emb: DataFrame): DataFrame =
    // MUST be the same sphere as [[unitVecs]] (the PQ training and rerank
    // surface), so it is literally that projection reshaped for the
    // k-means trainer's (vec_id, label, embedding) input
    unitVecs(emb).select(col("vec_id"), lit("u").as("label"), col("v").as("embedding"))

  /** Top-k nearest neighbors via the composed IVF-PQ index — the Faiss
    * IVFADC architecture (Jégou et al. TPAMI 2011, §IV) assembled from
    * this file's own parts: a trained coarse quantizer partitions the
    * corpus into cells ([[kmeansModel]]), PQ codebooks are trained on the
    * RESIDUALS x − c(x) (residuals cluster far tighter than raw vectors,
    * so the same 8×16 codebook spends its precision where the cell didn't),
    * each query probes its [[IvfPqProbes]] nearest cells and ADC-scans
    * ONLY those cells' codes with a per-(query, cell) residual lookup
    * table, and the exact rerank decides the final top-k.
    *
    * Scale shape — this is the 100 TB ANN endgame the s2/s4/s7 pieces
    * build toward: the corpus is stored as (cell, 8 code ids) per vector;
    * a query touches nprobe/k_coarse of the corpus (partition pruning by
    * cell), reads codes not floats (32× memory), and fetches full vectors
    * only for the bounded rerank set. Every join is an equi-join on
    * (cell, block, code) with only dimension-sized sides broadcast.
    */
  /** The four trained artifacts an IVF-PQ index consists of. */
  final case class IvfPqIndex(coarse: DataFrame, cells: DataFrame,
                              pqCent: DataFrame, codes: DataFrame)

  /** Train the index: coarse cells over the unit sphere, PQ codebooks
    * over the residuals, every corpus vector as (cell, M code ids).
    */
  def ivfPqTrain(emb: DataFrame, sub: Int): IvfPqIndex = {
    val (coarse, cellsRaw) = kmeansModel(unitEmb(emb), IvfPqCoarse, 2)
    val cells = cellsRaw.select(col("vec_id"), col("c").as("cell"))
    val ex = explodedBlocks(emb, sub)
    // residual stream: x − (assigned cell's centroid component)
    val exr = ex.join(cells, "vec_id")
      .join(coarse.select(col("c").as("cell"), col("i"), col("cv")), Seq("cell", "i"))
      .select(col("vec_id"), col("i"), col("m"), (col("x") - col("cv")).as("x"))
    val (pqCent, codes0) = pqTrainLoop(exr)
    IvfPqIndex(coarse, cells, pqCent, codes0.join(cells, "vec_id"))
  }

  def knnIvfPq(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    // dim probe reads ONE row, not a corpus-wide max aggregate: PQ block
    // arithmetic (explodedBlocks) already assumes a uniform dimension —
    // that is a declared PRECONDITION of this operator, so a mixed-dim
    // corpus is invalid input either way and the full scan bought
    // nothing (measured: the max() form cost a whole extra embeddings
    // pass per call; neither form validates uniformity)
    val dim = emb.select(size(col("embedding")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % PqBlocks == 0,
      s"dim $dim not divisible into $PqBlocks blocks")
    val sub = dim / PqBlocks
    ivfPqSearch(emb, ivfPqTrain(emb, sub), sub, nQueries, k)
  }

  /** The query phase against an ALREADY-TRAINED index (in-memory or
    * loaded) — the serving path: probe, residual LUT, cell-pruned ADC,
    * exact rerank. No training rounds run here.
    */
  def ivfPqSearch(emb: DataFrame, idx: IvfPqIndex, sub: Int,
                  nQueries: Int, k: Int): DataFrame = {
    val IvfPqIndex(coarse, _, pqCent, codes) = idx
    val ex = explodedBlocks(emb, sub)
    // probes: full-dimension distance of the unit query to the coarse cents
    val qex = ex.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("i"), col("m"), col("x").as("qx"))
    val qdist = qex.join(broadcast(coarse), "i")
      .groupBy(col("qid"), col("c"))
      .agg(round(sum((col("qx") - col("cv")) * (col("qx") - col("cv"))), 6).as("d"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("c"))
    val probes = qdist.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= IvfPqProbes).select(col("qid"), col("c").as("cell"))
    // per-(query, probed cell) residual LUT against the PQ codebook
    val lut = qex.join(broadcast(probes), "qid")
      .join(broadcast(coarse.select(col("c").as("cell"), col("i"), col("cv"))),
        Seq("cell", "i"))
      .select(col("qid"), col("cell"), col("i"), col("m"),
        (col("qx") - col("cv")).as("qr"))
      .join(broadcast(pqCent.select(col("c"), col("i"), col("cv").as("pcv"))), "i")
      .groupBy(col("qid"), col("cell"), col("m"), col("c"))
      .agg(round(sum((col("qr") - col("pcv")) * (col("qr") - col("pcv"))), 6).as("dq"))
    // ADC over the PROBED cells' codes only
    val adist = codes.join(broadcast(lut), Seq("cell", "m", "c"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("dq")), 6).as("adist"))
    rerankAdcTopK(adist, emb, nQueries, k)
  }

  /** Probed-cell cap for [[ivfPqServe]]'s literal-IN pushdown; a request
    * batch probing more distinct cells than this serves via the plain
    * broadcast-LUT join instead (a mega-IN bloats codegen; the join
    * stays probed-cell-bounded either way — the
    * [[graft.operators.TextOps.ServeTermPushdownMax]] convention).
    */
  val ServeCellPushdownMax = 1000

  /** SERVING-MODE search (s19's batch kernel): [[ivfPqSearch]] for
    * EXTERNAL queries — the query vectors arrive separately from the
    * indexed corpus (a request stream, not a self-join), so there is no
    * self-exclusion by id: query ids live in their own id space and
    * every indexed vector is a legal neighbor. Same probes → LUT → ADC →
    * exact-rerank arithmetic; `corpus` supplies the exact vectors the
    * rerank scores (the artifact convention: codes serve the candidates,
    * the corpus table serves the final distances).
    *
    * INDEX SEEK (the t31/t32 layout idea applied to ANN): the batch's
    * probed cells — at most queries × [[IvfPqProbes]], collected as one
    * small driver round-trip after the coarse-assign job — become a
    * pushed-down IN predicate on the codes scan, and with the saved
    * index's cell-clustered layout ([[trainAndSaveIvfPq]]) the read
    * opens only the row groups holding those cells' codes; a join alone
    * probes every row group. Past [[ServeCellPushdownMax]] distinct
    * cells the literal is skipped and the broadcast-LUT join carries the
    * restriction alone (never a shuffle of the codes). Results are
    * identical either way — the filter is a superset restriction of the
    * join. The same latency shape note as bm25ServeBatch applies: one
    * driver hop + fresh codegen per serve batch, traded for a file-skip
    * read.
    */
  def ivfPqServe(queries: DataFrame, corpus: DataFrame, idx: IvfPqIndex,
                 sub: Int, k: Int): DataFrame =
    ivfPqServeFromProbes(queries, corpus, idx, sub, k,
      servingProbes(queries, idx.coarse, sub).select(col("qid"), col("cell")))

  /** The probe stage shared by plain and budgeted serving: each request
    * vector's [[IvfPqProbes]] nearest coarse cells with their probe rank
    * `pr` (1 = nearest) — [[ivfPqServe]]'s exact probe arithmetic
    * (full-dimension unit-sphere distance, (d, cell) tie-break),
    * factored out so the s20 budget walk prices EXACTLY the cells the
    * plain path would probe.
    */
  private def servingProbes(queries: DataFrame, coarse: DataFrame,
                            sub: Int): DataFrame = {
    val qex = explodedBlocks(queries, sub)
      .select(col("vec_id").as("qid"), col("i"), col("m"), col("x").as("qx"))
    val qdist = qex.join(broadcast(coarse), "i")
      .groupBy(col("qid"), col("c"))
      .agg(round(sum((col("qx") - col("cv")) * (col("qx") - col("cv"))), 6).as("d"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("c"))
    qdist.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= IvfPqProbes)
      .select(col("qid"), col("c").as("cell"), col("pr"))
  }

  /** The shared scoring core behind [[ivfPqServe]] and
    * [[ivfPqServeBudgeted]]: `probes` is the already-policy-filtered
    * (qid, cell) set — everything from the probed-cell pushdown collect
    * to the exact rerank is identical for both entry points, so the
    * budgeted path can never drift from the plain one on the cells it
    * keeps (the bm25ScoreQt convention applied to ANN).
    */
  private def ivfPqServeFromProbes(queries: DataFrame, corpus: DataFrame,
                                   idx: IvfPqIndex, sub: Int, k: Int,
                                   probes: DataFrame): DataFrame = {
    val IvfPqIndex(coarse, _, pqCent, codes) = idx
    val qex = explodedBlocks(queries, sub)
      .select(col("vec_id").as("qid"), col("i"), col("m"), col("x").as("qx"))
    // the probe set is read twice — the pushdown collect below and the
    // LUT broadcast — and for the budgeted entry its lineage includes
    // the occupancy scan of the saved cells table; eager checkpoint (a
    // request-bounded table) runs that pipeline once per serve
    val probesCk = probes.localCheckpoint(true)
    val probedCells = probesCk.select(col("cell")).distinct()
      .limit(ServeCellPushdownMax + 1).collect().map(_.getInt(0))
    val servedCodes =
      if (probedCells.isEmpty) codes.filter(lit(false))
      else if (probedCells.length <= ServeCellPushdownMax)
        codes.filter(col("cell").isin(probedCells.toSeq: _*))
      else codes
    val lut = qex.join(broadcast(probesCk), "qid")
      .join(broadcast(coarse.select(col("c").as("cell"), col("i"), col("cv"))),
        Seq("cell", "i"))
      .select(col("qid"), col("cell"), col("i"), col("m"),
        (col("qx") - col("cv")).as("qr"))
      .join(broadcast(pqCent.select(col("c"), col("i"), col("cv").as("pcv"))), "i")
      .groupBy(col("qid"), col("cell"), col("m"), col("c"))
      .agg(round(sum((col("qr") - col("pcv")) * (col("qr") - col("pcv"))), 6).as("dq"))
    val adist = servedCodes.join(broadcast(lut), Seq("cell", "m", "c"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("dq")), 6).as("adist"))
    val wCand = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    // candidate-id prune for the exact rerank, kept LAZY (the
    // [[rerankAdcTopK]] pushdown's broadcast-semi form, guide §3.2): the
    // distinct candidate ids semi-join the corpus read through a
    // broadcast, so non-candidates drop BEFORE normalization instead of
    // the rerank re-normalizing the whole corpus. Lazy on purpose — a
    // checkpoint here would hide the codes scan (and its In(cell)
    // pushdown, which ScaleOps/PlanShape pin) behind an ExistingRDD in
    // the served plan. One ADC evaluation still: both consumers of the
    // candidate window need the identical (qid, adist, vec_id) exchange
    // below it, so the runtime reuses that exchange (the mm7 finding) —
    // only the request-bounded window re-runs, never the codes scan.
    val cands = adist.withColumn("cr", row_number().over(wCand))
      .filter(col("cr") <= PqRerank * k).select(col("qid"), col("vec_id"))
    val candIds = cands.select(col("vec_id")).distinct()
    val u = unitVecs(corpus.join(broadcast(candIds), Seq("vec_id"), "left_semi"))
    val qv = unitVecs(queries).select(col("vec_id").as("qid2"), col("v").as("qv"))
    val sims = cands.join(u, "vec_id").join(broadcast(qv), col("qid") === col("qid2"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Per-request candidate-volume budget for [[ivfPqServeBudgeted]]:
    * a request may drag at most `AnnBudgetFactor` × the EXPECTED probe
    * volume (n × [[IvfPqProbes]] / [[IvfPqCoarse]] candidates — what a
    * perfectly balanced index costs per request) through the ADC scan.
    * The t59 cost model in the ANN index's unit: one ADC candidate per
    * (probed cell, member vector), so a cell costs its occupancy.
    */
  val AnnBudgetFactor = 1L

  /** THE PER-REQUEST PROBE AUDIT (s21) — the ANN budget walk with its
    * working shown (t60's audit-table idea applied to the vector side):
    * one row per (request, probed cell) carrying the probe rank `pr`
    * (1 = nearest), the cell's candidate price (`occ_cost` — its member
    * count in the saved index, the rows an ADC scan of that cell pays),
    * the request's running total in probe order (`cum`), and the
    * keep/drop verdict. A probed cell is kept while the running volume
    * stays within [[AnnBudgetFactor]] × n × [[IvfPqProbes]] /
    * [[IvfPqCoarse]] — nearest-FIRST, because for ANN the nearest cell
    * carries the recall (the rarest-first rule's mirror image: BM25
    * keeps the cheapest-informative terms, ANN keeps the
    * closest-informative cells). The NEAREST probe always survives
    * unconditionally (`pr` = 1), so no request is starved even when one
    * pathological cell alone exceeds the budget; dropping trailing
    * probes degrades recall gracefully (narrower nprobe — exactly the
    * knob s10 prices), never meaning.
    *
    * Scale shape: cell occupancies are one bounded aggregate over the
    * saved assignment table ([[IvfPqCoarse]] rows, broadcast), the walk
    * is a REQUEST-partitioned cumulative window over at most
    * [[IvfPqProbes]] rows per request (never corpus-scaled), and the
    * corpus size is a one-row broadcast. [[annBudgetProbes]] is exactly
    * this table's kept slice, so the audit can never disagree with what
    * serving did.
    */
  def annProbeCosts(queries: DataFrame, idx: IvfPqIndex, sub: Int): DataFrame = {
    val probes = servingProbes(queries, idx.coarse, sub)
    val occ = idx.cells.groupBy(col("cell")).agg(count(lit(1)).as("occ_cost"))
    val nv = idx.cells.agg(count(lit(1)).as("n_vec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("pr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.join(broadcast(occ), Seq("cell"), "left")
      .select(col("qid"), col("pr"), col("cell"),
        coalesce(col("occ_cost"), lit(0L)).as("occ_cost"))
      .withColumn("cum", sum(col("occ_cost")).over(w))
      .crossJoin(broadcast(nv))
      .select(col("qid"), col("pr"), col("cell"), col("occ_cost"), col("cum"),
        (col("pr") === 1 ||
          col("cum") * lit(IvfPqCoarse) <=
            col("n_vec") * lit(IvfPqProbes * AnnBudgetFactor)).as("kept"))
      .orderBy(col("qid"), col("pr"))
  }

  /** The (qid, cell) probes a budgeted serve KEEPS — [[annProbeCosts]]'s
    * kept slice by construction (one shared walk, spec-pinned).
    */
  def annBudgetProbes(queries: DataFrame, idx: IvfPqIndex, sub: Int): DataFrame =
    annProbeCosts(queries, idx, sub).filter(col("kept"))
      .select(col("qid"), col("cell"))

  /** SERVE-TIME COST BUDGET ENFORCED for ANN (s20) — the t59 pattern
    * applied to [[ivfPqServe]]: each request's probed cells are first
    * stripped to the budgeted set ([[annBudgetProbes]] — occupancy-
    * priced from the saved index's own assignment table, kept
    * nearest-first under [[AnnBudgetFactor]] × expected volume, the
    * nearest probe always surviving), then scored through the IDENTICAL
    * shared core. A request whose probes land in pathologically crowded
    * cells degrades to a narrower effective nprobe instead of dragging
    * the hot cells' full code blocks through the plan — and because the
    * probed-cell IN-pushdown is collected AFTER the strip, a dropped
    * cell's row groups are never even opened (the cell-clustered
    * [[trainAndSaveIvfPq]] layout does the rest; plan-locked in
    * PlanShapeSpec). Result shape and rerank semantics are
    * [[ivfPqServe]]'s, over the surviving cells.
    *
    * No new reject class exists: a malformed (null/empty-vector) request
    * emits nothing from the probe stage in BOTH entry points, and the
    * nearest-probe guarantee means every probing request is answered.
    */
  def ivfPqServeBudgeted(queries: DataFrame, corpus: DataFrame,
                         idx: IvfPqIndex, sub: Int, k: Int): DataFrame =
    ivfPqServeFromProbes(queries, corpus, idx, sub, k,
      annBudgetProbes(queries, idx, sub))

  /** PER-CELL BUDGET PRESSURE (s22) — the s20 budget's dashboard view,
    * request-free: every occupied cell of the saved index with its
    * member count, its corpus share in ppm, and the `over_budget` flag —
    * TRUE when the cell ALONE exceeds a whole request's candidate
    * budget ([[AnnBudgetFactor]] × n × [[IvfPqProbes]] /
    * [[IvfPqCoarse]]), i.e. every request probing it either survives on
    * the nearest-probe guarantee or drops it. The t56-stop-candidate
    * idea applied to cells: t56 lists the terms an operator should
    * strip; this lists the cells whose crowding is throttling recall —
    * the trigger an operator reads BEFORE scheduling the s16 median
    * split or the s8 retrain (the s15 drift report says the
    * distribution moved; this says serving is paying for it).
    *
    * Scale shape: one [[IvfPqCoarse]]-row aggregate over the saved
    * assignment table plus a one-row broadcast total — a report whose
    * cost is one corpus-column scan however large the index.
    */
  def annCellPressure(idx: IvfPqIndex): DataFrame = {
    val occ = idx.cells.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
    val nv = idx.cells.agg(count(lit(1)).as("n_vec"))
    occ.crossJoin(broadcast(nv))
      .select(col("cell"), col("occ"),
        expr("occ * 1000000 div n_vec").as("occ_ppm"),
        (col("occ") * lit(IvfPqCoarse) >
          col("n_vec") * lit(IvfPqProbes * AnnBudgetFactor)).as("over_budget"))
      .orderBy(col("cell"))
  }

  /** BUDGET RECALL HONESTY REPORT (s23) — the s10 pattern applied to
    * the s20 budget: recall is REPORTED, never assumed. Per request:
    * how many probed cells the budget kept/dropped, the candidate
    * volume each side represents (from the s21 audit — kept_volume is
    * what the budgeted serve actually scanned, probed_volume what the
    * plain serve would have), and `recall_vs_plain` = |budgeted top-k ∩
    * plain top-k| / k — the measured price of the narrowing, per
    * request, against the un-budgeted serve as ground truth. A request
    * whose probes all fit (dropped_cells = 0) MUST report 1.0 — the
    * shared-core guarantee made visible (spec-pinned); a narrowed
    * request reports exactly what the dropped cell's absence cost it.
    *
    * Scale shape: two serve passes over the same saved index (both
    * cell-pruned seeks) plus the request-bounded audit walk — the
    * report costs two lookups per request, and in production runs over
    * a SAMPLED request set exactly like s10's recall table.
    */
  def annBudgetRecall(queries: DataFrame, corpus: DataFrame, idx: IvfPqIndex,
                      sub: Int, k: Int): DataFrame = {
    // ONE audit walk feeds all three consumers: the plain serve's probe
    // set is the walk's full (qid, cell) slice, the budgeted serve's its
    // kept slice, and the per-request volume sums aggregate the same
    // rows — the uncheckpointed form ran the probe pipeline (coarse
    // assign + occupancy scan + walk) three separate times. The walk
    // table is request-bounded (≤ n × IvfPqProbes rows), so the eager
    // checkpoint is free; row sets — and therefore both serves' results —
    // are identical to the three-pass form by construction.
    val costsAll = annProbeCosts(queries, idx, sub).localCheckpoint(true)
    // the two serve constructions each run a probe checkpoint + pushdown
    // collect — independent given the walk, so they overlap (Par.run)
    val Seq(plain, bud) = graft.functions.Par.run(
      () => ivfPqServeFromProbes(queries, corpus, idx, sub, k,
        costsAll.select(col("qid"), col("cell"))),
      () => ivfPqServeFromProbes(queries, corpus, idx, sub, k,
        costsAll.filter(col("kept")).select(col("qid"), col("cell"))))
    val hits = bud.select(col("qid"), col("vec_id"))
      .join(plain.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    val costs = costsAll
      .groupBy(col("qid")).agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_cells"),
        sum(when(col("kept"), lit(0L)).otherwise(1L)).as("dropped_cells"),
        sum(when(col("kept"), col("occ_cost")).otherwise(0L)).as("kept_volume"),
        sum(col("occ_cost")).as("probed_volume"))
    costs.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("kept_cells"), col("dropped_cells"),
        col("kept_volume"), col("probed_volume"),
        (round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 4) + 0.0)
          .as("recall_vs_plain"))
      .orderBy(col("qid"))
  }

  /** Oracle for [[annBudgetRecall]] (s23): ONE training replay shared
    * by both serve chains — the budgeted chain is the s20 oracle
    * verbatim, the plain chain the same tail over ALL probes (suffixed
    * CTE namespace), joined per request with the audit's volume sums
    * and the identical round(·, 4) + 0.0 recall arithmetic.
    */
  def sqlAnnBudgetRecall(nQueries: Int, k: Int, dim: Int): String = {
    val sub = dim / PqBlocks
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    val (pqSteps, raN, rcN) = sqlPqStepCtes("exr", "r")
    // one serve tail (LUT -> ADC -> rerank -> top-k) parameterized by its
    // probes CTE and a namespace suffix, so the two chains cannot collide
    def serveTail(sfx: String, probesCte: String): String =
      s"""qres$sfx AS (SELECT pr.qid, pr.cell, exb.i, exb.m, exb.x - $cN.cv AS qr
         |  FROM $probesCte pr JOIN exb ON exb.vec_id = pr.qid
         |  JOIN $cN ON $cN.c = pr.cell AND $cN.i = exb.i),
         |lut$sfx AS (SELECT qres$sfx.qid, qres$sfx.cell, qres$sfx.m, p.c,
         |    round(sum((qres$sfx.qr - p.cv) * (qres$sfx.qr - p.cv)), 6) AS dq
         |  FROM qres$sfx JOIN $rcN p ON p.i = qres$sfx.i GROUP BY 1, 2, 3, 4),
         |ad$sfx AS (SELECT l.qid, a.vec_id, round(sum(l.dq), 6) AS adist
         |  FROM $raN a JOIN $aN cells ON cells.vec_id = a.vec_id
         |  JOIN lut$sfx l ON l.cell = cells.c AND l.m = a.m AND l.c = a.c
         |  GROUP BY 1, 2),
         |cand$sfx AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS cr
         |  FROM ad$sfx) WHERE cr <= ${PqRerank * k}),
         |sims$sfx AS (SELECT c.qid, c.vec_id,
         |    round(list_dot_product(qu.v, xu.v), 4) AS sim
         |  FROM cand$sfx c JOIN e xu ON xu.vec_id = c.vec_id
         |  JOIN e qu ON qu.vec_id = c.qid),
         |topk$sfx AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
         |  FROM sims$sfx) WHERE rnk <= $k)""".stripMargin
    s"""WITH $kmCtes,
       |exb AS (SELECT vec_id, i, ((i - 1) // $sub)::INT AS m, x FROM ex),
       |exr AS (SELECT exb.vec_id, exb.i, exb.m, exb.x - $cN.cv AS x
       |  FROM exb JOIN $aN a USING (vec_id)
       |  JOIN $cN ON $cN.c = a.c AND $cN.i = exb.i),
       |rc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exr WHERE vec_id < $PqCodes),
       |$pqSteps,
       |${sqlAnnBudgetWalkCtes(nQueries, aN, cN)},
       |probesb AS (SELECT qid, cell FROM bverd WHERE kept),
       |probesp AS (SELECT qid, cell FROM pw),
       |${serveTail("b", "probesb")},
       |${serveTail("p", "probesp")},
       |costs AS (SELECT qid,
       |    sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS kept_cells,
       |    sum(CASE WHEN kept THEN 0 ELSE 1 END)::BIGINT AS dropped_cells,
       |    sum(CASE WHEN kept THEN occ_cost ELSE 0 END)::BIGINT AS kept_volume,
       |    sum(occ_cost)::BIGINT AS probed_volume
       |  FROM bverd GROUP BY 1),
       |hits AS (SELECT b.qid, count(*)::BIGINT AS h
       |  FROM topkb b JOIN topkp p ON p.qid = b.qid AND p.vec_id = b.vec_id
       |  GROUP BY 1)
       |SELECT c.qid, c.kept_cells, c.dropped_cells, c.kept_volume,
       |  c.probed_volume,
       |  round(coalesce(h.h, 0) / ${k}.0, 4) + 0.0 AS recall_vs_plain
       |FROM costs c LEFT JOIN hits h ON h.qid = c.qid
       |ORDER BY c.qid""".stripMargin
  }

  /** Oracle for [[annCellPressure]] (s22): the coarse-training replay's
    * assignment CTE aggregated by cell with the identical integer ppm
    * and over-budget arithmetic — every column integer/boolean.
    */
  def sqlAnnCellPressure: String = {
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    sqlCellPressureOver(eUnit)
  }

  /** [[sqlAnnCellPressure]] trained on the first-4/5 slice — the index
    * p46's nightly decision serves from, so its nested pressure count
    * judges the same cells the drift/split legs do.
    */
  def sqlAnnCellPressureOldSlice: String =
    sqlCellPressureOver(sqlEUnitOldSlice)

  private def sqlCellPressureOver(eUnit: String): String = {
    val (kmCtes, aN, _) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    s"""WITH $kmCtes,
       |pocc AS (SELECT c AS cell, count(*)::BIGINT AS occ FROM $aN GROUP BY 1),
       |pnv AS (SELECT count(*)::BIGINT AS n_vec FROM $aN)
       |SELECT cell, occ, (occ * 1000000 // n_vec)::BIGINT AS occ_ppm,
       |  occ * $IvfPqCoarse > n_vec * ${IvfPqProbes * AnnBudgetFactor} AS over_budget
       |FROM pocc, pnv
       |ORDER BY cell""".stripMargin
  }

  /** The probe/occupancy/budget-walk CTE block SHARED by the three ANN
    * budget oracles (s20/s21/s23) — one authoritative SQL rendering of
    * the rule, so a change to the budget semantics edits ONE builder
    * (the serveTail precedent applied to the walk): emits `qd` (probe
    * distances), `pw` (probes with rank), `bocc`/`bnv` (occupancies and
    * corpus size), `bwalk` (the cumulative walk) and `bverd` (the
    * keep/drop verdicts, pr = 1 guarantee included).
    */
  private def sqlAnnBudgetWalkCtes(nQueries: Int, aN: String, cN: String): String =
    s"""qd AS (SELECT ex.vec_id AS qid, p.c, round(sum((ex.x - p.cv) * (ex.x - p.cv)), 6) AS d
       |  FROM ex JOIN $cN p USING (i) WHERE ex.vec_id < $nQueries GROUP BY 1, 2),
       |pw AS (SELECT qid, c AS cell, pr FROM (
       |  SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY d, c) AS pr
       |  FROM qd) WHERE pr <= $IvfPqProbes),
       |bocc AS (SELECT c AS cell, count(*)::BIGINT AS occ FROM $aN GROUP BY 1),
       |bnv AS (SELECT count(*)::BIGINT AS n FROM $aN),
       |bwalk AS (SELECT pw.qid, pw.cell, pw.pr,
       |    coalesce(bocc.occ, 0)::BIGINT AS occ_cost,
       |    (sum(coalesce(bocc.occ, 0)::BIGINT) OVER (PARTITION BY pw.qid
       |      ORDER BY pw.pr ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
       |  FROM pw LEFT JOIN bocc USING (cell)),
       |bverd AS (SELECT qid, cell, pr, occ_cost, cum,
       |    (pr = 1 OR cum * $IvfPqCoarse <= n * ${IvfPqProbes * AnnBudgetFactor}) AS kept
       |  FROM bwalk, bnv)""".stripMargin

  /** Oracle for [[annProbeCosts]] (s21): replays the coarse training
    * (as [[sqlKnnIvfPq]] — the oracle can't read the saved artifact),
    * the probe assignment with identical rounding and (d, cell)
    * tie-break, the occupancy pricing and the nearest-first cumulative
    * walk — every output column integer/boolean so the comparison is
    * hash-exact. No PQ CTEs: the audit prices probes, it never scores.
    */
  def sqlAnnProbeCosts(nQueries: Int, dim: Int): String = {
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    s"""WITH $kmCtes,
       |${sqlAnnBudgetWalkCtes(nQueries, aN, cN)}
       |SELECT qid, pr, cell, occ_cost, cum, kept
       |FROM bverd
       |ORDER BY qid, pr""".stripMargin
  }


  /** Oracle for [[ivfPqServeBudgeted]] (s20): the full [[sqlKnnIvfPq]]
    * training replay, the SAME budget walk (occupancy-priced probes,
    * nearest-first cumulative keep with the pr = 1 guarantee), then the
    * LUT/ADC/rerank tail over the kept probes only — SERVE semantics
    * (external-request id space: no self-exclusion; the query vectors
    * here are corpus rows, so each matches itself at rank 1, a nonzero
    * fixed point both engines replay identically).
    */
  def sqlIvfPqServeBudgeted(nQueries: Int, k: Int, dim: Int): String = {
    val sub = dim / PqBlocks
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    val (pqSteps, raN, rcN) = sqlPqStepCtes("exr", "r")
    s"""WITH $kmCtes,
       |exb AS (SELECT vec_id, i, ((i - 1) // $sub)::INT AS m, x FROM ex),
       |exr AS (SELECT exb.vec_id, exb.i, exb.m, exb.x - $cN.cv AS x
       |  FROM exb JOIN $aN a USING (vec_id)
       |  JOIN $cN ON $cN.c = a.c AND $cN.i = exb.i),
       |rc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exr WHERE vec_id < $PqCodes),
       |$pqSteps,
       |${sqlAnnBudgetWalkCtes(nQueries, aN, cN)},
       |probes AS (SELECT qid, cell FROM bverd WHERE kept),
       |qres AS (SELECT pr.qid, pr.cell, exb.i, exb.m, exb.x - $cN.cv AS qr
       |  FROM probes pr JOIN exb ON exb.vec_id = pr.qid
       |  JOIN $cN ON $cN.c = pr.cell AND $cN.i = exb.i),
       |lut AS (SELECT qres.qid, qres.cell, qres.m, p.c,
       |    round(sum((qres.qr - p.cv) * (qres.qr - p.cv)), 6) AS dq
       |  FROM qres JOIN $rcN p ON p.i = qres.i GROUP BY 1, 2, 3, 4),
       |ad AS (SELECT l.qid, a.vec_id, round(sum(l.dq), 6) AS adist
       |  FROM $raN a JOIN $aN cells ON cells.vec_id = a.vec_id
       |  JOIN lut l ON l.cell = cells.c AND l.m = a.m AND l.c = a.c
       |  GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS cr
       |  FROM ad) WHERE cr <= ${PqRerank * k}),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(qu.v, xu.v), 4) AS sim
       |  FROM cand c JOIN e xu ON xu.vec_id = c.vec_id
       |  JOIN e qu ON qu.vec_id = c.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin
  }

  /** Persist a trained IVF-PQ index under `dir`: the two quantizers
    * (coarse centroids, PQ codebooks — dimension-sized, single file) and
    * the two corpus-scaling tables (cell assignment, codes — parallel
    * write). Parquet doubles are binary-exact, so a loaded index serves
    * bit-identical results.
    *
    * The codes land RANGE-PARTITIONED AND SORTED by their own cell key
    * (the trainAndSaveBm25Index layout contract, applied to ANN): every
    * parquet footer then carries a tight [min_cell, max_cell], so
    * [[ivfPqServe]]'s pushed-down probed-cell IN opens only the row
    * groups holding those cells' codes — an index seek, not a scan of
    * every file.
    */
  def trainAndSaveIvfPq(emb: DataFrame, sub: Int, dir: String): IvfPqIndex = {
    val idx = ivfPqTrain(emb, sub)
    graft.sources.ModelStore.save(idx.coarse, s"$dir/ivfpq_coarse")
    graft.sources.ModelStore.save(idx.pqCent, s"$dir/ivfpq_codebooks")
    graft.sources.ModelStore.saveLarge(idx.cells, s"$dir/ivfpq_cells")
    idx.codes
      .repartitionByRange(col("cell"))
      .sortWithinPartitions(col("cell"), col("vec_id"), col("m"))
      .write.option("maxRecordsPerFile", "5000000")
      .mode("overwrite").parquet(s"$dir/ivfpq_codes")
    idx
  }

  /** COMPACT an IVF-PQ index into the cell-clustered serving layout
    * (s18 — [[TextOps.compactAndSaveBm25Index]]'s ANN twin): each s11
    * shard encode unions new code files next to the old ones, so after
    * k appends a cell's codes straddle up to k files whose
    * [min_cell, max_cell] footers overlap, and [[ivfPqServe]]'s
    * probed-cell seek degrades toward probing every file. Compaction
    * rewrites the codes through the identical cell-sorted contract as a
    * fresh save — one artifact-sized shuffle; no re-encoding, no
    * re-quantization (the two quantizers persist as they stand, cells
    * as they stand) — the nightly step after the day's shard encodes.
    * Serving from the compacted index must hash-match serving from the
    * fragmented union.
    */
  def compactAndSaveIvfPq(idx: IvfPqIndex, dir: String): IvfPqIndex = {
    // never in place: overwrite deletes `dir` before the lazy reads run
    graft.sources.ModelStore.requireNotInPlace(dir,
      idx.coarse, idx.pqCent, idx.cells, idx.codes)
    graft.sources.ModelStore.save(idx.coarse, s"$dir/ivfpq_coarse")
    graft.sources.ModelStore.save(idx.pqCent, s"$dir/ivfpq_codebooks")
    graft.sources.ModelStore.saveLarge(idx.cells, s"$dir/ivfpq_cells")
    idx.codes
      .repartitionByRange(col("cell"))
      .sortWithinPartitions(col("cell"), col("vec_id"), col("m"))
      .write.option("maxRecordsPerFile", "5000000")
      .mode("overwrite").parquet(s"$dir/ivfpq_codes")
    loadIvfPq(idx.codes.sparkSession, dir)
  }

  def loadIvfPq(spark: org.apache.spark.sql.SparkSession, dir: String): IvfPqIndex =
    IvfPqIndex(
      graft.sources.ModelStore.load(spark, s"$dir/ivfpq_coarse"),
      graft.sources.ModelStore.load(spark, s"$dir/ivfpq_cells"),
      graft.sources.ModelStore.load(spark, s"$dir/ivfpq_codebooks"),
      graft.sources.ModelStore.load(spark, s"$dir/ivfpq_codes"))

  /** Encode a NEW shard into an ALREADY-TRAINED IVF-PQ index (s11) — the
    * daily-ingest path the saved index exists for: assign each new vector
    * its coarse cell (nearest saved centroid, the c2 `assign` pattern on
    * the unit sphere), subtract that cell's centroid for the residual,
    * and pick the nearest saved PQ code per block — NO training rounds,
    * only broadcast equi-joins against the two dimension-sized
    * quantizers. Returns (cells, codes) in exactly the saved tables'
    * shapes, so `cells ∪ newCells` / `codes ∪ newCodes` IS the enlarged
    * index ([[ivfPqSearch]] serves it unchanged).
    *
    * Scale rationale: retraining (s8's in-query form) scans the WHOLE
    * corpus per refresh; encoding scans only the shard. At 100 TB with
    * daily shards that is the difference between an index you can keep
    * and one you rebuild nightly — the same train-once economics as
    * t14/d11/t21, applied to the last artifact that lacked it. Quantizer
    * drift under a shifting distribution is a retrain DECISION (the s10
    * recall report is the dashboard that triggers it), not a per-shard
    * cost.
    */
  def encodeIvfPqShard(emb: DataFrame, idx: IvfPqIndex, sub: Int)
      : (DataFrame, DataFrame) = {
    val ex = explodedBlocks(emb, sub)
    // coarse assign: full-dimension distance to the saved centroids,
    // argmin with assignStep's (distance, cell) tie-break
    val d = ex.join(broadcast(idx.coarse), "i")
      .groupBy(col("vec_id"), col("c"))
      .agg(round(sum((col("x") - col("cv")) * (col("x") - col("cv"))), 6).as("d"))
    val cells = d.groupBy(col("vec_id"))
      .agg(max(struct((-col("d")).as("nd"), (-col("c")).as("nc"), col("c").as("cc"))).as("b"))
      .select(col("vec_id"), col("b.cc").as("cell"))
    val exr = ex.join(cells, "vec_id")
      .join(broadcast(idx.coarse.select(col("c").as("cell"), col("i"), col("cv"))),
        Seq("cell", "i"))
      .select(col("vec_id"), col("i"), col("m"), (col("x") - col("cv")).as("x"))
    val codes = assignPqStep(exr, idx.pqCent).join(cells, "vec_id")
    (cells, codes)
  }

  /** DuckDB twin of the s11 composition: train the index on the first
    * 4/5 of the corpus (replayed as in [[sqlKnnIvfPq]], restricted to the
    * training vec_ids), one-pass encode the held-out shard against the
    * trained quantizers, serve the probe/ADC/rerank tail over the UNION
    * of training codes and shard codes — identical rounding and
    * tie-breaks end to end.
    */
  def sqlKnnIvfPqIncremental(nQueries: Int, k: Int, dim: Int): String = {
    val sub = dim / PqBlocks
    // training slice: cn is the shard boundary (4/5 of the corpus); the
    // kmeans/PQ CTEs train on `e` = the slice, while `eall` keeps the
    // full unit corpus for queries, shard encode and rerank
    val eUnit =
      """cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM embeddings),
        |eall AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings)),
        |e AS (SELECT vec_id, v FROM eall WHERE vec_id < (SELECT cnt FROM cn))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    val (pqSteps, raN, rcN) = sqlPqStepCtes("exr", "r")
    s"""WITH $kmCtes,
       |exall AS (SELECT vec_id, i::INT AS i, ((i - 1) // $sub)::INT AS m, v[i] AS x
       |  FROM eall, LATERAL unnest(range(1, len(v) + 1)) t(i)),
       |exb AS (SELECT vec_id, i, ((i - 1) // $sub)::INT AS m, x FROM ex),
       |exr AS (SELECT exb.vec_id, exb.i, exb.m, exb.x - $cN.cv AS x
       |  FROM exb JOIN $aN a USING (vec_id)
       |  JOIN $cN ON $cN.c = a.c AND $cN.i = exb.i),
       |rc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exr WHERE vec_id < $PqCodes),
       |$pqSteps,
       |exn AS (SELECT * FROM exall WHERE vec_id >= (SELECT cnt FROM cn)),
       |ncd AS (SELECT exn.vec_id, p.c, round(sum((exn.x - p.cv) * (exn.x - p.cv)), 6) AS d
       |  FROM exn JOIN $cN p USING (i) GROUP BY 1, 2),
       |ncell AS (SELECT vec_id, c FROM (
       |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |  FROM ncd) WHERE rn = 1),
       |exrn AS (SELECT exn.vec_id, exn.i, exn.m, exn.x - $cN.cv AS x
       |  FROM exn JOIN ncell ON ncell.vec_id = exn.vec_id
       |  JOIN $cN ON $cN.c = ncell.c AND $cN.i = exn.i),
       |nqd AS (SELECT exrn.vec_id, exrn.m, p.c,
       |    round(sum((exrn.x - p.cv) * (exrn.x - p.cv)), 6) AS d
       |  FROM exrn JOIN $rcN p USING (i) GROUP BY 1, 2, 3),
       |ncode AS (SELECT vec_id, m, c FROM (
       |  SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
       |  FROM nqd) WHERE rn = 1),
       |cells AS (SELECT vec_id, c FROM $aN UNION ALL SELECT vec_id, c FROM ncell),
       |codes AS (SELECT vec_id, m, c FROM $raN UNION ALL SELECT vec_id, m, c FROM ncode),
       |qd AS (SELECT exall.vec_id AS qid, p.c,
       |    round(sum((exall.x - p.cv) * (exall.x - p.cv)), 6) AS d
       |  FROM exall JOIN $cN p USING (i) WHERE exall.vec_id < $nQueries GROUP BY 1, 2),
       |probes AS (SELECT qid, c AS cell FROM (
       |  SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY d, c) AS pr
       |  FROM qd) WHERE pr <= $IvfPqProbes),
       |qres AS (SELECT pr.qid, pr.cell, exall.i, exall.m, exall.x - $cN.cv AS qr
       |  FROM probes pr JOIN exall ON exall.vec_id = pr.qid
       |  JOIN $cN ON $cN.c = pr.cell AND $cN.i = exall.i),
       |lut AS (SELECT qres.qid, qres.cell, qres.m, p.c,
       |    round(sum((qres.qr - p.cv) * (qres.qr - p.cv)), 6) AS dq
       |  FROM qres JOIN $rcN p ON p.i = qres.i GROUP BY 1, 2, 3, 4),
       |ad AS (SELECT l.qid, a.vec_id, round(sum(l.dq), 6) AS adist
       |  FROM codes a JOIN cells cl ON cl.vec_id = a.vec_id
       |  JOIN lut l ON l.cell = cl.c AND l.m = a.m AND l.c = a.c
       |  WHERE a.vec_id <> l.qid GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS cr
       |  FROM ad) WHERE cr <= ${PqRerank * k}),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(qu.v, xu.v), 4) AS sim
       |  FROM cand c JOIN eall xu ON xu.vec_id = c.vec_id
       |  JOIN eall qu ON qu.vec_id = c.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin
  }

  /** Recall-vs-nprobe tuning report over a trained IVF-PQ index (s10) —
    * the table an operator reads BEFORE setting nprobe on a real corpus:
    * one row per probe width with measured recall@k against the exact
    * brute-force top-k and the ADC candidate volume that width paid for
    * it. The s6 `in_exact` honesty pattern applied to the serving index:
    * recall is REPORTED, never assumed.
    *
    * One index scan serves every width: ADC distances are computed once
    * at max(nprobes) with each candidate tagged by its cell's probe rank
    * `pr`, and width np is the slice pr <= np — narrower widths are
    * prefixes of the widest probe order, exactly how a real serving stack
    * evaluates the knob. recall@k divides by nQueries*k (every query has
    * >= k true neighbors in the fixtures; the oracle mirrors the same
    * literal denominator).
    *
    * SCALE: the report costs one cell-pruned ADC pass at the widest
    * nprobe plus one bounded rerank per width — the ground truth is the
    * only quadratic piece (declared exact baseline, query side broadcast)
    * and in production it runs over a SAMPLED query set, not the corpus.
    */
  def ivfPqRecallReport(emb: DataFrame, idx: IvfPqIndex, sub: Int,
                        nQueries: Int, k: Int, nprobes: Seq[Int]): DataFrame = {
    val IvfPqIndex(coarse, _, pqCent, codes) = idx
    val maxProbe = nprobes.max
    val ex = explodedBlocks(emb, sub)
    val qex = ex.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("i"), col("m"), col("x").as("qx"))
    val qdist = qex.join(broadcast(coarse), "i")
      .groupBy(col("qid"), col("c"))
      .agg(round(sum((col("qx") - col("cv")) * (col("qx") - col("cv"))), 6).as("d"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("c"))
    val probes = qdist.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= maxProbe)
      .select(col("qid"), col("c").as("cell"), col("pr"))
    // residual LUT per (query, probed cell), probe rank carried through
    val lut = qex.join(broadcast(probes), "qid")
      .join(broadcast(coarse.select(col("c").as("cell"), col("i"), col("cv"))),
        Seq("cell", "i"))
      .select(col("qid"), col("cell"), col("pr"), col("i"), col("m"),
        (col("qx") - col("cv")).as("qr"))
      .join(broadcast(pqCent.select(col("c"), col("i"), col("cv").as("pcv"))), "i")
      .groupBy(col("qid"), col("cell"), col("pr"), col("m"), col("c"))
      .agg(round(sum((col("qr") - col("pcv")) * (col("qr") - col("pcv"))), 6).as("dq"))
    // ADC once at the widest probe; pr is functional in (qid, vec_id)
    // (every vector lives in exactly one cell)
    val adist = codes.join(broadcast(lut), Seq("cell", "m", "c"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("pr"), col("vec_id"))
      .agg(round(sum(col("dq")), 6).as("adist"))
      // feeds the candidates-scanned count AND the per-width rerank —
      // checkpoint (query-bounded rows) so the ADC scan of the codes
      // artifact runs once, not twice
      .localCheckpoint(true)
    val s = emb.sparkSession
    import s.implicits._
    val tagged = adist.crossJoin(broadcast(nprobes.toDF("np")))
      .filter(col("pr") <= col("np"))
    val scanned = tagged.groupBy(col("np"))
      .agg(count(lit(1)).as("candidates_scanned"))
    val wCand = Window.partitionBy(col("np"), col("qid"))
      .orderBy(col("adist"), col("vec_id"))
    // candidate-id seek into the per-width rerank's corpus read — the
    // [[rerankAdcTopK]] pushdown; cands is bounded by
    // |nprobes|·nQueries·PqRerank·k rows, never corpus-scaled
    val cands = tagged.withColumn("cr", row_number().over(wCand))
      .filter(col("cr") <= PqRerank * k)
      .select(col("np"), col("qid"), col("vec_id"))
      .localCheckpoint(true)
    val candIds = cands.select(col("vec_id")).distinct()
      .limit(RerankIdPushdownMax + 1).collect().map(_.getLong(0))
    val corpusPruned =
      if (candIds.isEmpty) emb.filter(lit(false))
      else if (candIds.length <= RerankIdPushdownMax)
        emb.filter(col("vec_id").isin(candIds.toSeq: _*))
      else emb
    val u = unitVecs(corpusPruned)
    val qv = unitVecs(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid2"), col("v").as("qv"))
    val sims = cands.join(u, "vec_id")
      .join(broadcast(qv), col("qid") === col("qid2"))
      .select(col("np"), col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")), 4).as("sim"))
    val wTop = Window.partitionBy(col("np"), col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    val topk = sims.withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k).select(col("np"), col("qid"), col("vec_id"))
    val gt = knnBrute(emb, nQueries, k).select(col("qid"), col("vec_id"))
    val hits = topk.join(gt, Seq("qid", "vec_id"))
      .groupBy(col("np")).agg(count(lit(1)).as("hits"))
    scanned.join(hits, Seq("np"), "left")
      .select(col("np").as("nprobe"),
        round(coalesce(col("hits"), lit(0L)) / lit(nQueries.toDouble * k), 4)
          .as("recall_at_k"),
        col("candidates_scanned"))
      .orderBy(col("nprobe"))
  }

  /** DuckDB twin of [[ivfPqRecallReport]]: replays the index training
    * (as [[sqlKnnIvfPq]] does — the oracle can't read the saved
    * artifact), then the pr-tagged ADC, the per-width rerank and the
    * brute-force ground truth with identical rounding and tie-breaks.
    */
  def sqlIvfPqRecallReport(nQueries: Int, k: Int, dim: Int,
                           nprobes: Seq[Int]): String = {
    val sub = dim / PqBlocks
    val maxProbe = nprobes.max
    val npList = nprobes.mkString("[", ", ", "]")
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    val (pqSteps, raN, rcN) = sqlPqStepCtes("exr", "r")
    s"""WITH $kmCtes,
       |exb AS (SELECT vec_id, i, ((i - 1) // $sub)::INT AS m, x FROM ex),
       |exr AS (SELECT exb.vec_id, exb.i, exb.m, exb.x - $cN.cv AS x
       |  FROM exb JOIN $aN a USING (vec_id)
       |  JOIN $cN ON $cN.c = a.c AND $cN.i = exb.i),
       |rc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exr WHERE vec_id < $PqCodes),
       |$pqSteps,
       |qd AS (SELECT ex.vec_id AS qid, p.c, round(sum((ex.x - p.cv) * (ex.x - p.cv)), 6) AS d
       |  FROM ex JOIN $cN p USING (i) WHERE ex.vec_id < $nQueries GROUP BY 1, 2),
       |probes AS (SELECT qid, c AS cell, pr FROM (
       |  SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY d, c) AS pr
       |  FROM qd) WHERE pr <= $maxProbe),
       |qres AS (SELECT pr.qid, pr.cell, pr.pr, exb.i, exb.m, exb.x - $cN.cv AS qr
       |  FROM probes pr JOIN exb ON exb.vec_id = pr.qid
       |  JOIN $cN ON $cN.c = pr.cell AND $cN.i = exb.i),
       |lut AS (SELECT qres.qid, qres.cell, qres.pr, qres.m, p.c,
       |    round(sum((qres.qr - p.cv) * (qres.qr - p.cv)), 6) AS dq
       |  FROM qres JOIN $rcN p ON p.i = qres.i GROUP BY 1, 2, 3, 4, 5),
       |ad AS (SELECT l.qid, l.pr, a.vec_id, round(sum(l.dq), 6) AS adist
       |  FROM $raN a JOIN $aN cells ON cells.vec_id = a.vec_id
       |  JOIN lut l ON l.cell = cells.c AND l.m = a.m AND l.c = a.c
       |  WHERE a.vec_id <> l.qid GROUP BY 1, 2, 3),
       |nps AS (SELECT unnest($npList) AS np),
       |tagged AS (SELECT nps.np, ad.qid, ad.vec_id, ad.adist
       |  FROM ad, nps WHERE ad.pr <= nps.np),
       |scanned AS (SELECT np, count(*)::BIGINT AS candidates_scanned
       |  FROM tagged GROUP BY np),
       |cand AS (SELECT np, qid, vec_id FROM (
       |  SELECT np, qid, vec_id,
       |    row_number() OVER (PARTITION BY np, qid ORDER BY adist, vec_id) AS cr
       |  FROM tagged) WHERE cr <= ${PqRerank * k}),
       |sims AS (SELECT c.np, c.qid, c.vec_id,
       |    round(list_dot_product(qu.v, xu.v), 4) AS sim
       |  FROM cand c JOIN e xu ON xu.vec_id = c.vec_id
       |  JOIN e qu ON qu.vec_id = c.qid),
       |topk AS (SELECT np, qid, vec_id FROM (
       |  SELECT np, qid, vec_id,
       |    row_number() OVER (PARTITION BY np, qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k),
       |gtv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |gtq AS (SELECT vec_id AS qid, v AS qv FROM gtv WHERE vec_id < $nQueries),
       |gts AS (SELECT gtq.qid, gtv.vec_id,
       |    round(list_dot_product(gtq.qv, gtv.v)
       |      / (sqrt(list_dot_product(gtq.qv, gtq.qv)) * sqrt(list_dot_product(gtv.v, gtv.v))), 4) AS sim
       |  FROM gtv, gtq WHERE gtv.vec_id <> gtq.qid),
       |gt AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM gts) WHERE rnk <= $k),
       |hits AS (SELECT np, count(*)::BIGINT AS h
       |  FROM topk JOIN gt USING (qid, vec_id) GROUP BY np)
       |SELECT s.np AS nprobe,
       |  round(coalesce(h.h, 0) / ${nQueries.toDouble * k}, 4) AS recall_at_k,
       |  s.candidates_scanned
       |FROM scanned s LEFT JOIN hits h ON h.np = s.np
       |ORDER BY nprobe""".stripMargin
  }

  /** DuckDB twin of [[knnIvfPq]]: unit normalization, coarse k-means
    * replay, residual PQ replay, probes, cell-pruned ADC, exact rerank —
    * identical rounding and tie-breaks end to end.
    */
  /** `deleteWhere` (s13): a tombstone predicate over `a.vec_id` excluded
    * from the ADC scan — deletion WITHOUT rebuilding the index. Default
    * "false" deletes nothing (the s9 form).
    */
  def sqlKnnIvfPq(nQueries: Int, k: Int, dim: Int,
                  deleteWhere: String = "false"): String = {
    val sub = dim / PqBlocks
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    val (pqSteps, raN, rcN) = sqlPqStepCtes("exr", "r")
    s"""WITH $kmCtes,
       |exb AS (SELECT vec_id, i, ((i - 1) // $sub)::INT AS m, x FROM ex),
       |exr AS (SELECT exb.vec_id, exb.i, exb.m, exb.x - $cN.cv AS x
       |  FROM exb JOIN $aN a USING (vec_id)
       |  JOIN $cN ON $cN.c = a.c AND $cN.i = exb.i),
       |rc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exr WHERE vec_id < $PqCodes),
       |$pqSteps,
       |qd AS (SELECT ex.vec_id AS qid, p.c, round(sum((ex.x - p.cv) * (ex.x - p.cv)), 6) AS d
       |  FROM ex JOIN $cN p USING (i) WHERE ex.vec_id < $nQueries GROUP BY 1, 2),
       |probes AS (SELECT qid, c AS cell FROM (
       |  SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY d, c) AS pr
       |  FROM qd) WHERE pr <= $IvfPqProbes),
       |qres AS (SELECT pr.qid, pr.cell, exb.i, exb.m, exb.x - $cN.cv AS qr
       |  FROM probes pr JOIN exb ON exb.vec_id = pr.qid
       |  JOIN $cN ON $cN.c = pr.cell AND $cN.i = exb.i),
       |lut AS (SELECT qres.qid, qres.cell, qres.m, p.c,
       |    round(sum((qres.qr - p.cv) * (qres.qr - p.cv)), 6) AS dq
       |  FROM qres JOIN $rcN p ON p.i = qres.i GROUP BY 1, 2, 3, 4),
       |ad AS (SELECT l.qid, a.vec_id, round(sum(l.dq), 6) AS adist
       |  FROM $raN a JOIN $aN cells ON cells.vec_id = a.vec_id
       |  JOIN lut l ON l.cell = cells.c AND l.m = a.m AND l.c = a.c
       |  WHERE a.vec_id <> l.qid AND NOT ($deleteWhere) GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS cr
       |  FROM ad) WHERE cr <= ${PqRerank * k}),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(qu.v, xu.v), 4) AS sim
       |  FROM cand c JOIN e xu ON xu.vec_id = c.vec_id
       |  JOIN e qu ON qu.vec_id = c.qid)
       |SELECT qid, rnk, vec_id, sim FROM (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY qid, rnk""".stripMargin
  }

  /** NIGHTLY INDEX DECISION (p46) — s15's monitoring and s16's repair
    * composed into the one-row table the nightly index job actually
    * reads: how many cells drifted, what the worst drift is, which cell
    * the median split would cut and what the occupancy looks like after,
    * and the resulting ACTION — `retrain` when ≥2 cells drifted past the
    * flag (the quantizer no longer fits the distribution), `split` when
    * one cell holds >30% of the corpus (one probe list dominates
    * serving), `serve` otherwise. Both inputs are the already-costed
    * plans (drift = assign + count; split = moments + bounded
    * histogram); the composition itself is three single-row aggregates.
    */
  def indexNightlyDecision(shard: DataFrame, oldEmb: DataFrame,
                           idx: IvfPqIndex): DataFrame = {
    // sp is a cells+1-row table whose lineage is the whole s16 repair
    // plan; it feeds two aggregates (tot + hot) — checkpoint so the
    // split computation runs once per decision, not twice. The drift and
    // split legs are independent, so their internal checkpoint jobs
    // materialize concurrently (Par.run).
    val Seq(dr, sp) = graft.functions.Par.run(
      () => ivfDriftReport(shard, idx),
      () => ivfMedianSplit(oldEmb, idx).localCheckpoint(true))
    val da = dr.agg(sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
      (max(abs(col("drift"))) + lit(0.0)).as("max_abs_drift"))
    val tot = sp.agg(sum(col("n")).as("tot"), max(col("n")).as("post_max_n"))
    // serving-side corroboration (round 17): how many saved cells the
    // s20 budget flags as over a whole request's candidate budget —
    // the s22 pressure table's count on the SAME index the decision
    // judges. Report-only by design: the action rule stays the
    // training-side hot_frac/drift (deterministic against the fixture
    // oracles); an operator reads n_over_budget as the serving-cost
    // second opinion on the same row.
    val bp = annCellPressure(idx)
      .agg(sum(when(col("over_budget"), 1L).otherwise(0L)).as("n_over_budget"))
    val hot = sp.filter(col("is_split"))
      .groupBy(col("cell"), col("split_dim"), col("split_val"))
      .agg(sum(col("n")).as("hot_n"), max(col("n")).as("max_child_n"))
    hot.crossJoin(broadcast(da)).crossJoin(broadcast(tot))
      .crossJoin(broadcast(bp))
      .select(col("n_flagged"), col("max_abs_drift"),
        col("cell").as("hot_cell"), col("hot_n"),
        col("split_dim"), col("split_val"),
        col("max_child_n"), col("post_max_n"),
        (round(col("hot_n").cast("double") / col("tot"), 4) + 0.0).as("hot_frac"),
        col("n_over_budget"),
        when(col("n_flagged") >= 2, "retrain")
          .when(col("hot_n").cast("double") / col("tot") > 0.3, "split")
          .otherwise("serve").as("action"))
      .orderBy(col("hot_cell"))
  }

  /** Oracle for [[indexNightlyDecision]]: the s15 and s16 oracles nested
    * whole as CTE subqueries (their CTE namespaces stay isolated), then
    * the same three aggregates and decision CASE.
    */
  def sqlIndexNightlyDecision: String = {
    import graft.functions.Portable.sqlNoOrder
    s"""WITH dr AS (${sqlNoOrder(sqlIvfDrift)}),
       |sp AS (${sqlNoOrder(sqlIvfSplit)}),
       |bpq AS (${sqlNoOrder(sqlAnnCellPressureOldSlice)}),
       |da AS (SELECT sum(CASE WHEN flagged THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
       |    max(abs(drift)) + 0.0 AS max_abs_drift FROM dr),
       |tt AS (SELECT sum(n)::BIGINT AS tot, max(n)::BIGINT AS post_max_n FROM sp),
       |bp AS (SELECT sum(CASE WHEN over_budget THEN 1 ELSE 0 END)::BIGINT
       |    AS n_over_budget FROM bpq),
       |hot AS (SELECT cell AS hot_cell, split_dim, split_val,
       |    sum(n)::BIGINT AS hot_n, max(n)::BIGINT AS max_child_n
       |  FROM sp WHERE is_split GROUP BY 1, 2, 3)
       |SELECT da.n_flagged, da.max_abs_drift, hot.hot_cell, hot.hot_n,
       |  hot.split_dim, hot.split_val, hot.max_child_n, tt.post_max_n,
       |  round(hot.hot_n::DOUBLE / tt.tot, 4) + 0.0 AS hot_frac,
       |  bp.n_over_budget,
       |  CASE WHEN da.n_flagged >= 2 THEN 'retrain'
       |       WHEN hot.hot_n::DOUBLE / tt.tot > 0.3 THEN 'split'
       |       ELSE 'serve' END AS action
       |FROM hot, da, tt, bp ORDER BY hot_cell""".stripMargin
  }

  /** PQ CODEBOOK UTILIZATION (s17) — the index-health table next to
    * drift (s15) and repair (s16): per (block, code) corpus usage over
    * the SAVED codes table, against the FULL block×code grid so dead
    * codes show as zero rows (a code no vector maps to is wasted
    * codebook precision — the retrain signal for that block; a block
    * whose vectors pile onto few codes quantizes coarsely and its ADC
    * distances flatten). All integer counts plus one rounded fraction —
    * deterministic, and one groupBy over the codes artifact (no decode,
    * no pair join; the grid side is a 128-row literal).
    */
  def pqUtilization(idx: IvfPqIndex): DataFrame = {
    val spark = idx.codes.sparkSession
    val used = idx.codes.groupBy(col("m"), col("c"))
      .agg(count(lit(1)).as("n_vecs"))
    val grid = spark.range(PqBlocks).select(col("id").cast("int").as("m"))
      .crossJoin(spark.range(PqCodes).select(col("id").cast("int").as("c")))
    val tot = idx.codes.agg(count(lit(1)).as("nt"))
    val wBlock = Window.partitionBy(col("m"))
    grid.join(used, Seq("m", "c"), "left")
      .select(col("m"), col("c"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .crossJoin(broadcast(tot))
      .select(col("m"), col("c"), col("n_vecs"),
        (round(col("n_vecs").cast("double") / col("nt"), 6) + 0.0).as("frac"),
        (col("n_vecs") > 0).as("used"))
      .withColumn("block_codes_used",
        sum(when(col("used"), 1L).otherwise(0L)).over(wBlock))
      .orderBy(col("m"), col("c"))
  }

  /** Oracle for [[pqUtilization]]: replays the saved index's coarse +
    * residual-PQ training (the s8/s9 CTEs), then the same grid join.
    */
  def sqlPqUtilization(dim: Int): String = {
    val sub = dim / PqBlocks
    val eUnit =
      """e AS (SELECT vec_id,
        |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings))""".stripMargin
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    val (pqSteps, raN, _) = sqlPqStepCtes("exr", "r")
    s"""WITH $kmCtes,
       |exb AS (SELECT vec_id, i, ((i - 1) // $sub)::INT AS m, x FROM ex),
       |exr AS (SELECT exb.vec_id, exb.i, exb.m, exb.x - $cN.cv AS x
       |  FROM exb JOIN $aN a USING (vec_id)
       |  JOIN $cN ON $cN.c = a.c AND $cN.i = exb.i),
       |rc0 AS (SELECT vec_id::INT AS c, i, round(x, 6) AS cv FROM exr WHERE vec_id < $PqCodes),
       |$pqSteps,
       |used AS (SELECT m, c, count(*)::BIGINT AS n_vecs FROM $raN GROUP BY 1, 2),
       |grid AS (SELECT gm.m::INT AS m, gc.c::INT AS c
       |  FROM range($PqBlocks) gm(m) CROSS JOIN range($PqCodes) gc(c)),
       |tot AS (SELECT count(*)::BIGINT AS nt FROM $raN),
       |g AS (SELECT grid.m, grid.c, coalesce(used.n_vecs, 0)::BIGINT AS n_vecs
       |  FROM grid LEFT JOIN used ON used.m = grid.m AND used.c = grid.c)
       |SELECT g.m, g.c, g.n_vecs,
       |  round(g.n_vecs::DOUBLE / tot.nt, 6) + 0.0 AS frac,
       |  g.n_vecs > 0 AS used,
       |  sum(CASE WHEN g.n_vecs > 0 THEN 1 ELSE 0 END) OVER (PARTITION BY g.m)::BIGINT
       |    AS block_codes_used
       |FROM g, tot ORDER BY m, c""".stripMargin
  }

  // --------------------------------------------------------- SemDeDup

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering embeddings with k-means, then dropping every vector whose
    * cosine to a LOWER-ID vector in the SAME cluster exceeds `tau`. The
    * keep rule is the standard non-recursive variant (compare against all
    * lower-id cluster members, kept or not) — deterministic, one pass, and
    * exactly expressible in both engines; the recursive "compare only
    * against survivors" variant is order-chained and keeps MORE docs, but
    * its sequential dependency has no scalable distributed form.
    *
    * Scale shape: this is WHY SemDeDup clusters first — the quadratic
    * verify is confined to cluster co-members (sum of n_c^2, never n^2),
    * and the candidate join is an equi-join on the cluster id, so AQE can
    * split a hot cluster. At 100 TB the cluster id is the bucket key of
    * the embedding store and each cluster's pair block is one co-located
    * task; clusters too large for that get sub-clustered (k recursion),
    * not cross-joined.
    */
  def semDedup(emb: DataFrame, k: Int, iters: Int, tau: Double): DataFrame = {
    val (_, assigned) = kmeansModel(emb, k, iters)
    // e (cell-annotated unit-norm corpus) feeds BOTH pair sides and the
    // verdict anchor — checkpoint so the scan + assignment join + norm
    // run once, not three times (the d24 shared-intermediate rule).
    // SIZE/FAULT BOUND (guide §5, the Ranking scaladoc caveat): this is
    // CORPUS-sized (O(vectors) rows carrying the float vector), not
    // request-bounded; blocks spill (MEMORY_AND_DISK) but are
    // non-replicated, so an executor loss fails the query and the retry
    // re-runs it. A corpus that outgrows executor storage belongs on
    // the saved-artifact path (trainAndSaveKmeans + semDedupShard reads
    // the persisted cells) — that pair IS the staged-parquet fallback.
    val e = vecs(emb).join(assigned, "vec_id").withColumn("nrm", norm(col("v")))
      .localCheckpoint(true)
    val a = e.select(col("c"), col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("c"), col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, "c")
      .filter(col("ib") < col("ia"))
      .select(col("ia"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= tau)
      .select(col("ia").as("vec_id")).distinct()
    e.select(col("vec_id"), col("c"))
      .join(dropped.withColumn("kept", lit(false)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("c"), coalesce(col("kept"), lit(true)).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB twin of [[semDedup]]: identical k-means replay (the
    * [[sqlKmeansCtes]] block), identical pair rule, exact recursive-free
    * keep semantics.
    */
  /** Incremental SemDeDup of a NEW shard (p24) — the semantic leg of the
    * shard-ingest triad (lexical d13, fingerprint d15's stream form,
    * semantic here): the shard enters the SAVED clustering — coarse
    * assignment from the persisted centroids ([[assign]], the c2
    * pattern), cells = saved corpus cells ∪ shard cells — and each shard
    * vector is kept unless a LOWER-ID cell co-member (old corpus or
    * earlier shard vector) exceeds cosine `tau`. Emits verdicts for the
    * SHARD only; the old corpus's own verdicts are yesterday's p17 run.
    * Declared incremental semantics, exactly as s11: the quantizer is
    * FROZEN (no Lloyd re-iteration over the union) — that is what a
    * saved model is.
    *
    * Scale shape: assignment is a broadcast join against the k×D
    * centroid artifact; the quadratic verify is confined to cell
    * co-members (Abbas et al.'s whole point) with the shard side small,
    * equi-joined on the cell id so AQE splits hot cells. Cost scales
    * with shard × cell occupancy, never corpus².
    */
  def semDedupShard(emb: DataFrame, cut: Long, cent: DataFrame,
                    oldCells: DataFrame, tau: Double): DataFrame = {
    val newCells = assign(emb.filter(col("vec_id") >= cut), cent)
    val cells = oldCells.select(col("vec_id"), col("c"))
      .unionByName(newCells.select(col("vec_id"), col("c")))
    // same three-consumer shape as [[semDedup]]'s e — one checkpointed
    // pass, same §5 CORPUS-sized bound and staged-parquet fallback as
    // documented there
    val e = vecs(emb).join(cells, "vec_id").withColumn("nrm", norm(col("v")))
      .localCheckpoint(true)
    val a = e.filter(col("vec_id") >= cut)
      .select(col("c"), col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("c"), col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, "c")
      .filter(col("ib") < col("ia"))
      .select(col("ia"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= tau)
      .select(col("ia").as("vec_id")).distinct()
    e.filter(col("vec_id") >= cut).select(col("vec_id"), col("c"))
      .join(dropped.withColumn("kept", lit(false)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("c"), coalesce(col("kept"), lit(true)).as("kept"))
      .orderBy(col("vec_id"))
  }

  def sqlSemDedupShard(k: Int, iters: Int, tau: Double): String = {
    val eOld =
      """cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM embeddings),
        |eall AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |e AS (SELECT vec_id, v FROM eall WHERE vec_id < (SELECT cnt FROM cn))""".stripMargin
    val (ctes, lastA, lastC) = sqlKmeansCtes(k, iters, eOld)
    s"""WITH $ctes,
       |exall AS (SELECT vec_id, i::INT AS i, v[i] AS x
       |  FROM eall, LATERAL unnest(range(1, len(v) + 1)) t(i)),
       |exn AS (SELECT * FROM exall WHERE vec_id >= (SELECT cnt FROM cn)),
       |nd AS (SELECT exn.vec_id, p.c, round(sum((exn.x - p.cv) * (exn.x - p.cv)), 6) AS d
       |  FROM exn JOIN $lastC p USING (i) GROUP BY 1, 2),
       |ncell AS (SELECT vec_id, c FROM (
       |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |  FROM nd) WHERE rn = 1),
       |cells AS (SELECT vec_id, c FROM $lastA UNION ALL SELECT vec_id, c FROM ncell),
       |ea AS (SELECT eall.vec_id, eall.v, cells.c FROM eall JOIN cells USING (vec_id)),
       |dropped AS (SELECT x.vec_id FROM ea x JOIN ea y
       |    ON x.c = y.c AND y.vec_id < x.vec_id
       |  WHERE x.vec_id >= (SELECT cnt FROM cn)
       |    AND round(list_dot_product(x.v, y.v)
       |      / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= $tau
       |  GROUP BY 1)
       |SELECT ea.vec_id, ea.c, (d.vec_id IS NULL) AS kept
       |FROM ea LEFT JOIN dropped d ON d.vec_id = ea.vec_id
       |WHERE ea.vec_id >= (SELECT cnt FROM cn)
       |ORDER BY ea.vec_id""".stripMargin
  }

  def sqlSemDedup(k: Int, iters: Int, tau: Double): String = {
    val (ctes, lastA, _) = sqlKmeansCtes(k, iters)
    s"""WITH $ctes,
       |ea AS (SELECT e.vec_id, e.v, a.c FROM e JOIN $lastA a USING (vec_id)),
       |dropped AS (SELECT x.vec_id FROM ea x JOIN ea y
       |    ON x.c = y.c AND y.vec_id < x.vec_id
       |  WHERE round(list_dot_product(x.v, y.v)
       |      / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= $tau
       |  GROUP BY 1)
       |SELECT ea.vec_id, ea.c, (d.vec_id IS NULL) AS kept
       |FROM ea LEFT JOIN dropped d ON d.vec_id = ea.vec_id
       |ORDER BY ea.vec_id""".stripMargin
  }

  // ------------------------------------------- embedding-cosine near-dup

  /** Cosine threshold above which a blocked pair counts as a near-dup. */
  val CosineDupThreshold = 0.4

  /** Embedding-cosine near-dup PAIRS (the dedup-flavored counterpart of
    * [[nnAll]]): candidates are blocked on the coarse-quantizer cell (the
    * label column, as in IVF), then verified with exact cosine. The
    * blocking join is the scale path — pair volume is bounded by cell
    * co-membership, never the n^2 cross product; the verify dot product is
    * the codegen'd native expression.
    */
  def cosineDupPairs(emb: DataFrame): DataFrame = {
    val e = vecs(emb).withColumn("nrm", norm(col("v")))
    val a = e.select(col("label"), col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("label"), col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, "label")
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= CosineDupThreshold)
      .orderBy(col("ia"), col("ib"))
  }

  /** SRP-LSH near-dup pairs: the LSH-bucketed alternative to IVF cells.
    * Each vector gets [[Portable.SrpBands]] sign-buckets of
    * [[Portable.SrpBits]] deterministic-hyperplane projections; a pair
    * colliding in ANY band is a candidate, verified with exact cosine —
    * MinHash banding ([[Dedup.lshPairs]]) transplanted to embedding space,
    * for when no trained quantizer exists.
    *
    * RECALL ENVELOPE (be honest about what banding can do): a pair at
    * angle θ collides in one band with prob (1−θ/π)^bits, in any band
    * 1−(1−(1−θ/π)^bits)^bands. Near-identical vectors (cos ≥ 0.99) are
    * found with prob ≈ 1 (ScaleOpsSpec proves ≥ 9/10 planted pairs on
    * synthetic data); at moderate similarity (cos ≈ 0.4, the verify
    * threshold) per-bit agreement is only 0.63 vs 0.5 for random pairs, so
    * banding recalls a fraction (measured 0.22 on the fixture) — that
    * regime belongs to the cell-blocked forms ([[cosineDupPairs]],
    * [[nnAll]]). Use SRP for true near-duplicate detection, cells for
    * moderate-similarity search.
    *
    * Scale shape: the plane matrix is tiny (bands*bits*dim) and evaluated
    * ONCE from the shared Portable expression, then inlined as literals so
    * the per-row signature is pure codegen (32 native dot products — no
    * join, no explode of the corpus). Candidates come from per-band
    * equi-joins on the bucket value (bounded by band collisions, never
    * all-pairs), and only candidates pay the exact-cosine verify.
    */
  def srpLshPairs(emb: DataFrame): DataFrame = {
    import Portable.{SrpBands, SrpBits}
    val e = vecs(emb).withColumn("nrm", norm(col("v")))
    // max over the table, not an arbitrary first() row: the oracle twin
    // uses max(len) with a bounds guard, and on a ragged embeddings table
    // a short first row would silently truncate every signature
    val dim = emb.agg(max(size(col("embedding")))).first().getInt(0)
    val spark = emb.sparkSession
    val planes: Map[(Int, Int), Array[Double]] =
      spark.range(SrpBands.toLong * SrpBits * dim).select(
          (col("id") / (SrpBits * dim)).cast("int").as("b"),
          (col("id") % (SrpBits * dim) / dim).cast("int").as("j"),
          (col("id") % dim + 1).cast("int").as("i"))
        .select(col("b"), col("j"), col("i"),
          Portable.srpPlane(col("b"), col("j"), col("i")).as("pv"))
        .collect().groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (k, rows) => k -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)) }
    val bucketCols = (0 until SrpBands).map { b =>
      (0 until SrpBits).map { j =>
        when(dot(col("v"), lit(planes((b, j)))) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"bucket_$b")
    }
    // long form (vec_id, band, bucket): ONE self-join on (band, bucket)
    // instead of bands-many unioned self-joins — the corpus is scanned once
    // per side (and the shuffle is identical on both sides, so Spark reuses
    // the exchange), not 2*bands times
    val sigs = e.select(col("vec_id"),
      explode(array((0 until SrpBands).map(b =>
        struct(lit(b).as("b"), bucketCols(b).as("bk"))): _*)).as("s"))
      .select(col("vec_id"), col("s.b").as("b"), col("s.bk").as("bk"))
    val cand = sigs.select(col("vec_id").as("ia"), col("b"), col("bk"))
      .join(sigs.select(col("vec_id").as("ib"), col("b"), col("bk")), Seq("b", "bk"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib")).distinct()
    val va = e.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val vb = e.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(va, "ia").join(vb, "ib")
      .select(col("ia"), col("ib"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
      .filter(col("sim") >= CosineDupThreshold)
      .orderBy(col("ia"), col("ib"))
  }

  val sqlSrpLshPairs: String = {
    import Portable.{SrpBands, SrpBits}
    val cos = "round(list_dot_product(ea.v, eb.v) / " +
      "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 4)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |planes AS (SELECT b, j, i::INT AS i, ${Portable.sqlSrpPlane("b", "j", "i")} AS pv
       |  FROM range(0, $SrpBands) t1(b), range(0, $SrpBits) t2(j),
       |    (SELECT max(len(v)) AS dim FROM e) d, LATERAL unnest(range(1, d.dim + 1)) t3(i)),
       |proj AS (SELECT e.vec_id, p.b, p.j, sum(e.v[p.i] * p.pv) AS dsum
       |  FROM e, planes p WHERE p.i <= len(e.v) GROUP BY 1, 2, 3),
       |buckets AS (SELECT vec_id, b,
       |    sum(CASE WHEN dsum >= 0 THEN (2 ** j)::BIGINT ELSE 0 END)::BIGINT AS bk
       |  FROM proj GROUP BY vec_id, b),
       |cand AS (SELECT DISTINCT a.vec_id AS ia, c.vec_id AS ib
       |  FROM buckets a JOIN buckets c ON a.b = c.b AND a.bk = c.bk
       |    AND a.vec_id < c.vec_id)
       |SELECT cand.ia, cand.ib, $cos AS sim
       |FROM cand JOIN e ea ON ea.vec_id = cand.ia JOIN e eb ON eb.vec_id = cand.ib
       |WHERE $cos >= $CosineDupThreshold
       |ORDER BY ia, ib""".stripMargin
  }

  val sqlCosineDupPairs: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS ia, b.vec_id AS ib,
       |  round(list_dot_product(a.v, b.v)
       |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.v, b.v)
       |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
       |  >= $CosineDupThreshold
       |ORDER BY ia, ib""".stripMargin

  // ------------------------------------------------- MMR re-rank (s14)

  /** MAXIMAL MARGINAL RELEVANCE re-rank (s14, Carbonell & Goldstein
    * 1998) — the diversification pass a retrieval stack runs AFTER its
    * top-k: greedily pick argmax λ·rel(c) − (1−λ)·max_{s∈sel} sim(c, s),
    * so a redundant near-duplicate of an already-picked result is
    * penalized by its similarity to it and a novel-but-relevant one
    * rises. Selection is inherently sequential (each pick changes every
    * remaining score), so it CANNOT be a window function; the right
    * distribution is PER QUERY: the candidate set is k-bounded by
    * construction (here [[MmrCand]] = 20 from the exact tower, so ≤ 380
    * pair rows per query), and the greedy fold runs inside mapGroups on
    * the qid key — a million queries parallelize across executors, each
    * group doing O(C²·k) work on its own bounded rows, nothing
    * corpus-sized ever concentrating anywhere.
    *
    * FP contract: rel and pairwise sims are the house 4-dp-rounded
    * cosines (cross-engine identical); scores are λ·rel − (1−λ)·max in
    * raw doubles — one multiply, one subtract, a max over identical
    * values — compared with a vec_id tie-break; the emitted mmr rounds
    * HALF_UP to 6, DuckDB's round convention.
    */
  def mmrRerank(emb: DataFrame, nQueries: Int = 1, cand: Int = MmrCand,
                k: Int = MmrK): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val top = knnBrute(emb, nQueries, cand)
      .select(col("qid"), col("vec_id"), col("sim").as("rel"))
    val e = vecs(emb).withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"))
    val cv = top.join(e, "vec_id")
    val pairs = cv.as("a").join(cv.as("b"),
        col("a.qid") === col("b.qid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.qid").as("qid"), col("a.vec_id").as("a_id"),
        col("a.rel").as("rel"), col("b.vec_id").as("b_id"),
        round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4)
          .as("psim"))
    pairs.as[MmrIn]
      .groupByKey(_.qid)
      .flatMapGroups((qid: Long, rows: Iterator[MmrIn]) => mmrGreedy(qid, rows, k))
      .toDF()
      .orderBy(col("qid"), col("rnk"))
  }

  /** The per-query greedy fold of [[mmrRerank]] — bounded at C candidates
    * and C² pair rows by construction; the oracle unrolls the identical
    * k selection steps.
    */
  private def mmrGreedy(qid: Long, rows: Iterator[MmrIn],
                        k: Int): Iterator[MmrOut] = {
    val rs = rows.toArray
    val rel = rs.map(r => r.a_id -> r.rel).toMap
    val ps = rs.map(r => (r.a_id, r.b_id) -> r.psim).toMap
    val oneMinus = 1.0 - MmrLambda
    var selected = Vector.empty[Long]
    val out = Vector.newBuilder[MmrOut]
    var rnk = 0
    while (rnk < k && selected.size < rel.size) {
      rnk += 1
      val (best, score) = rel.keysIterator.filterNot(selected.contains)
        .map { c =>
          val pen = if (selected.isEmpty) 0.0
            else selected.iterator.map(sel => ps((c, sel))).max
          (c, MmrLambda * rel(c) - oneMinus * pen)
        }
        .reduceLeft { (x, y) =>
          if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x
        }
      val mmr6 = java.math.BigDecimal.valueOf(score)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      out += MmrOut(qid, rnk, best, rel(best), mmr6)
      selected :+= best
    }
    out.result().iterator
  }

  /** Oracle for s14: the component kNN oracle nested for candidates and
    * pairwise sims, then the k greedy steps UNROLLED as chained CTEs (the
    * c2/c6 fixed-iteration replay pattern) — each step scores the not-yet-
    * selected candidates against the previous selection and picks the
    * (score DESC, vec_id) head.
    */
  def sqlMmrRerank(nQueries: Int = 1, cand: Int = MmrCand,
                   k: Int = MmrK): String = {
    val lam = MmrLambda.toString
    val om = (1.0 - MmrLambda).toString
    val steps = (1 to k).map { i =>
      val prev = if (i == 1) "sel0" else s"sel${i - 1}"
      s"""sc$i AS MATERIALIZED (SELECT c.qid, c.vec_id, c.rel,
         |    $lam * c.rel - $om * coalesce((SELECT max(p.psim) FROM pair p
         |      JOIN $prev s ON p.qid = s.qid AND p.b_id = s.vec_id
         |      WHERE p.qid = c.qid AND p.a_id = c.vec_id), 0.0) AS m
         |  FROM cv c WHERE NOT EXISTS (SELECT 1 FROM $prev s
         |    WHERE s.qid = c.qid AND s.vec_id = c.vec_id)),
         |pk$i AS MATERIALIZED (SELECT qid, vec_id, rel, m, $i AS rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY m DESC, vec_id) AS rn
         |  FROM sc$i) WHERE rn = 1),
         |sel$i AS MATERIALIZED (SELECT qid, vec_id FROM $prev
         |  UNION ALL SELECT qid, vec_id FROM pk$i)""".stripMargin
    }
    val picks = (1 to k).map(i => s"SELECT qid, vec_id, rel, m, rnk FROM pk$i")
      .mkString("\n  UNION ALL ")
    s"""WITH knn AS MATERIALIZED (${sqlKnnBrute(nQueries, cand)}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cv AS MATERIALIZED (SELECT knn.qid, knn.vec_id, knn.sim AS rel, e.v
       |  FROM knn JOIN e USING (vec_id)),
       |pair AS MATERIALIZED (SELECT a.qid, a.vec_id AS a_id, b.vec_id AS b_id,
       |    round(list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS psim
       |  FROM cv a JOIN cv b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
       |sel0 AS (SELECT 0::BIGINT AS qid, 0::BIGINT AS vec_id WHERE 1 = 0),
       |${steps.mkString(",\n")}
       |SELECT qid, rnk, vec_id, rel, round(m, 6) AS mmr FROM (
       |  ${picks.replace("\n", "\n  ")})
       |ORDER BY qid, rnk""".stripMargin
  }

  // ------------------------------------------------ index drift report

  /** Cell-occupancy drift beyond this absolute fraction flags the cell. */
  val IvfDriftFlag = 0.02

  /** ANN INDEX DRIFT REPORT (s15) — the "when to retrain the quantizer"
    * monitoring table, closing the index lifecycle the way p23 closes
    * the LM's: each cell's occupancy fraction in the SAVED index vs in a
    * new shard assigned against the SAVED coarse centroids. A shard
    * whose embedding distribution moved piles into few cells — those
    * cells' probe lists grow long and nprobe recall degrades — and the
    * per-cell drift column says so before serving does.
    *
    * Scale shape: the old side is a count over the saved cells table;
    * the shard side is the c2 assign (one broadcast join against k×D
    * centroids) plus a count; everything after is arithmetic over k
    * rows with the two totals on a single-row broadcast. Encode-free:
    * no PQ work, no pair joins — strictly cheaper than s11's encode, so
    * it can run on every shard as a pre-flight.
    */
  def ivfDriftReport(shard: DataFrame, idx: IvfPqIndex): DataFrame = {
    val oldSz = idx.cells.groupBy(col("cell"))
      .agg(count(lit(1)).as("old_n"))
    val newSz = assign(unitEmb(shard), idx.coarse)
      .select(col("c").as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("new_n"))
    // j is ≤ IvfPqCoarse rows but its lineage holds the shard's full
    // nearest-centroid assignment (a corpus explode); two consumers (the
    // totals agg and the final select) would run that assignment twice —
    // eager checkpoint: the house shared-intermediate rule
    val j = oldSz.join(newSz, Seq("cell"), "full_outer")
      .select(col("cell"), coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
      .localCheckpoint(true)
    val tot = j.agg(sum(col("old_n")).as("ot"), sum(col("new_n")).as("nt"))
    val of = col("old_n").cast("double") / col("ot")
    val nf = col("new_n").cast("double") / col("nt")
    j.crossJoin(broadcast(tot))
      .select(col("cell"), col("old_n"), col("new_n"),
        (round(of, 4) + 0.0).as("old_frac"),
        (round(nf, 4) + 0.0).as("new_frac"),
        (round(nf - of, 4) + 0.0).as("drift"),
        (abs(nf - of) > IvfDriftFlag).as("flagged"))
      .orderBy(col("cell"))
  }

  /** Shared oracle base for s15/s16: the 4/5 old-slice cut on the unit
    * sphere — `eall` is every unit vector, `e` the old slice the saved
    * index was trained on.
    */
  private val sqlEUnitOldSlice: String =
    """cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM embeddings),
      |eall AS (SELECT vec_id,
      |    list_transform(v0, x -> round(x / sqrt(list_dot_product(v0, v0)), 6)) AS v
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings)),
      |e AS (SELECT vec_id, v FROM eall WHERE vec_id < (SELECT cnt FROM cn))""".stripMargin

  /** Oracle for [[ivfDriftReport]]: replays the 4/5 split, the coarse
    * training on the old slice, the shard's nearest-saved-centroid
    * assignment, and the occupancy arithmetic.
    */
  def sqlIvfDrift: String = {
    val eUnit = sqlEUnitOldSlice
    val (kmCtes, aN, cN) = sqlKmeansCtes(IvfPqCoarse, 2, eUnit)
    s"""WITH $kmCtes,
       |exn AS (SELECT vec_id, i::INT AS i, v[i] AS x
       |  FROM eall, LATERAL unnest(range(1, len(v) + 1)) t(i)
       |  WHERE vec_id >= (SELECT cnt FROM cn)),
       |ncd AS (SELECT exn.vec_id, p.c, round(sum((exn.x - p.cv) * (exn.x - p.cv)), 6) AS d
       |  FROM exn JOIN $cN p USING (i) GROUP BY 1, 2),
       |ncell AS (SELECT vec_id, c FROM (
       |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |  FROM ncd) WHERE rn = 1),
       |osz AS (SELECT c AS cell, count(*)::BIGINT AS old_n FROM $aN GROUP BY 1),
       |nsz AS (SELECT c AS cell, count(*)::BIGINT AS new_n FROM ncell GROUP BY 1),
       |j AS (SELECT coalesce(osz.cell, nsz.cell) AS cell,
       |    coalesce(old_n, 0)::BIGINT AS old_n, coalesce(new_n, 0)::BIGINT AS new_n
       |  FROM osz FULL OUTER JOIN nsz ON osz.cell = nsz.cell),
       |tt AS (SELECT sum(old_n)::BIGINT AS ot, sum(new_n)::BIGINT AS nt FROM j)
       |SELECT cell, old_n, new_n,
       |  round(old_n::DOUBLE / ot, 4) + 0.0 AS old_frac,
       |  round(new_n::DOUBLE / nt, 4) + 0.0 AS new_frac,
       |  round(new_n::DOUBLE / nt - old_n::DOUBLE / ot, 4) + 0.0 AS drift,
       |  abs(new_n::DOUBLE / nt - old_n::DOUBLE / ot) > $IvfDriftFlag AS flagged
       |FROM j, tt ORDER BY cell""".stripMargin
  }

  /** IVF INDEX REPAIR BY MEDIAN SPLIT (s16) — the action s15's drift
    * table calls for: the hottest cell (largest probe list, the nprobe
    * recall bottleneck) splits into two at the MEDIAN of its members
    * along their highest-variance dimension. Median, not 2-means: the
    * halves are balanced BY CONSTRUCTION (a 2-means split can converge
    * 90/10 and leave the hot list hot), and the whole repair is
    * integer-deterministic — unit components are 6-dp by construction,
    * so they ride as exact 1e6-scaled BIGINTs; the per-dimension
    * variance argmax uses the exact integer moment form n·Σx² − (Σx)²
    * in decimal(38) (overflow-safe at corpus scale), and the lower
    * median reads off a cumulative histogram.
    *
    * Scale shape: occupancy is one count over the saved cells table;
    * member moments are one partial-aggregated pass over the hot cell's
    * exploded dims; the median does NOT sort members — it aggregates a
    * histogram whose key domain is bounded at 2e6+1 by the 6-dp value
    * grid (the w20 mergeable-histogram idea), so the one unpartitioned
    * cumulative window runs over ≤ value-domain rows, never corpus rows.
    */
  def ivfMedianSplit(emb: DataFrame, idx: IvfPqIndex): DataFrame = {
    val osz = idx.cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val hot = osz
      .agg(max(struct(col("n"), (-col("cell")).cast("long").as("nc"),
        col("cell").as("c"))).as("b"))
      .select(col("b.c").as("hot_cell"))
    val memberIds = idx.cells.join(broadcast(hot), col("cell") === col("hot_cell"))
      .select(col("vec_id"))
    // mx (hot-cell members × dims, integer-scaled) feeds FOUR aggregate
    // consumers (variance stats, then the split-dim slice's total /
    // median / child counts); its lineage is the full corpus unit-explode
    // + semi-join, so the uncheckpointed plan re-ran that scan four times
    // inside one action — eager checkpoint caps it at one pass (members ×
    // dim rows, bounded by the hot cell, never the corpus)
    val mx = explodedDims(unitEmb(emb))
      .join(memberIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("i"),
        (col("x").cast("decimal(18,6)") * 1000000).cast("long").as("xm"))
      .localCheckpoint(true)
    val stats = mx.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("xm")).cast("decimal(38,0)").as("s"),
        sum((col("xm") * col("xm")).cast("decimal(38,0)")).as("ss"))
      .select(col("i"),
        (col("n").cast("decimal(38,0)") * col("ss") - col("s") * col("s")).as("vn"))
    val sdim = stats
      .agg(max(struct(col("vn"), (-col("i")).as("ni"), col("i").as("ii"))).as("b"))
      .select(col("b.ii").as("split_dim"))
    val mxd = mx.join(broadcast(sdim), col("i") === col("split_dim"))
    val tot = mxd.agg(count(lit(1)).as("nt"))
    val wcum = Window.orderBy(col("xm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = mxd.groupBy(col("xm")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= expr("(nt + 1) div 2"))
      .agg(min(col("xm")).as("med"))
    val kids = mxd.crossJoin(broadcast(med))
      .select(when(col("xm") <= col("med"), 1).otherwise(2).as("sub"))
      .groupBy(col("sub")).agg(count(lit(1)).as("n"))
    val untouched = osz.crossJoin(broadcast(hot))
      .filter(col("cell") =!= col("hot_cell"))
      .select(col("cell").cast("long").as("cell"), lit(0).as("sub"), col("n"),
        lit(false).as("is_split"), lit(-1).as("split_dim"), lit(0.0).as("split_val"))
    val split = kids.crossJoin(broadcast(hot)).crossJoin(broadcast(sdim))
      .crossJoin(broadcast(med))
      .select(col("hot_cell").cast("long").as("cell"), col("sub"), col("n"),
        lit(true).as("is_split"), col("split_dim"),
        round(col("med").cast("double") / 1000000, 6).as("split_val"))
    untouched.unionByName(split).orderBy(col("cell"), col("sub"))
  }

  /** Oracle for [[ivfMedianSplit]]: replays the saved coarse training
    * (the s15 base), then the integer moments, argmax dimension,
    * histogram median, and the balanced two-way cut.
    */
  def sqlIvfSplit: String = {
    val (kmCtes, aN, _) = sqlKmeansCtes(IvfPqCoarse, 2, sqlEUnitOldSlice)
    s"""WITH $kmCtes,
       |osz AS (SELECT c AS cell, count(*)::BIGINT AS n FROM $aN GROUP BY 1),
       |hot AS (SELECT cell FROM osz ORDER BY n DESC, cell LIMIT 1),
       |mx AS (SELECT ex.vec_id, ex.i,
       |    CAST(ex.x::DECIMAL(18,6) * 1000000 AS BIGINT) AS xm
       |  FROM $aN a JOIN ex ON ex.vec_id = a.vec_id
       |  WHERE a.c = (SELECT cell FROM hot)),
       |stats AS (SELECT i, count(*) AS n, sum(xm) AS s, sum(xm * xm) AS ss
       |  FROM mx GROUP BY i),
       |sd AS (SELECT i AS split_dim FROM stats
       |  ORDER BY (n * ss - s * s) DESC, i LIMIT 1),
       |mxd AS (SELECT xm FROM mx WHERE i = (SELECT split_dim FROM sd)),
       |tt AS (SELECT count(*)::BIGINT AS nt FROM mxd),
       |hist AS (SELECT xm, count(*)::BIGINT AS c FROM mxd GROUP BY xm),
       |cum AS (SELECT xm, sum(c) OVER (ORDER BY xm
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
       |medv AS (SELECT min(xm) AS med FROM cum, tt
       |  WHERE cum >= (tt.nt + 1) // 2),
       |kids AS (SELECT CASE WHEN xm <= (SELECT med FROM medv) THEN 1 ELSE 2 END AS sub,
       |    count(*)::BIGINT AS n
       |  FROM mxd GROUP BY 1)
       |SELECT cell::BIGINT AS cell, 0 AS sub, n, false AS is_split,
       |  -1 AS split_dim, 0.0 AS split_val
       |FROM osz WHERE cell != (SELECT cell FROM hot)
       |UNION ALL
       |SELECT (SELECT cell FROM hot)::BIGINT AS cell, kids.sub, kids.n,
       |  true AS is_split, (SELECT split_dim FROM sd) AS split_dim,
       |  round((SELECT med FROM medv)::DOUBLE / 1000000, 6) AS split_val
       |FROM kids
       |ORDER BY cell, sub""".stripMargin
  }
}
