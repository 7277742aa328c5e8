package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable
import Portable._

/** Deduplication operators for a training-data pipeline (SURVEY §2.8 /
  * BASELINE north star): exact (hash groupBy), word-n-gram Jaccard,
  * MinHash signatures + LSH banding, SimHash.
  *
  * Scale design:
  *  - the shingle inverted index drops shingles with doc-frequency above
  *    [[Portable.MaxShingleDocFreq]] before the candidate self-join — the
  *    standard stop-shingle skew guard that bounds bucket sizes at 100 TB;
  *  - candidate generation is a shuffle join on shingle / band hash, partial
  *    counts map-side; no driver-side loops anywhere;
  *  - MinHash/SimHash are single groupBy aggregates of codegen'd integer
  *    expressions (md5-derived 32-bit hashes, portable to the oracle).
  */
object Dedup {

  /** Jaccard threshold for reporting near-duplicate pairs. */
  val JaccardThreshold = 0.5

  // ---------------------------------------------------------------- exact

  /** Exact dedup on normalized text: one representative (min id) per key. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(lower(trim(col("text")))).as("k"))
      .agg(min(col("doc_id")).as("rep_doc"), count(lit(1)).as("n"))
      .orderBy(col("k"))

  val sqlExact: String =
    """SELECT md5(lower(trim(text))) AS k, min(doc_id) AS rep_doc,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM documents GROUP BY 1 ORDER BY k""".stripMargin

  // ------------------------------------------------------------- shingles

  /** Per-doc distinct word-ShingleN-gram array over an ALREADY-MATERIALIZED
    * token-array column — a stateless per-row expression, usable identically
    * on batch and streaming inputs.
    *
    * The tokens must be a materialized column (projected in a prior select),
    * NOT an inline tokens(text) tree: the transform lambda references the
    * array per element, and an inline regex-split tree would re-tokenize per
    * shingle — O(tokens^2) splits per doc (measured 3x on the shingle
    * pipeline).
    */
  def shingleArray(tokensCol: Column): Column = {
    val n = ShingleN
    array_distinct(
      when(size(tokensCol) >= n,
        transform(sequence(lit(0), size(tokensCol) - n),
          i => array_join(slice(tokensCol, i + lit(1), lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct word-ShingleN-grams per doc, hot shingles dropped.
    * Per-doc dedup happens inside [[shingleArray]] (array_distinct before
    * the explode) — equivalent to a global DISTINCT on (doc_id, g) given
    * unique doc_ids, without that extra shuffle.
    */
  def shingles(docs: DataFrame): DataFrame =
    dfCapped(rawShingles(docs))

  /** The FUSED df cap: count-over-gid window on the ONE exchange the
    * stream pays anyway, instead of the aggregate-then-join-back form.
    * The join form evaluated the tokenize+shingle Generate TWICE per
    * consumer (the df aggregate's partial-agg leg and the join's stream
    * leg are different canonical subtrees, so neither ReuseExchange nor
    * AQE stage reuse dedups them — the round-17 column-pruned-subtree
    * finding's sibling); the window form runs it once (guide §2.4).
    *
    * Scale note (§2.5/§5): WindowExec buffers one gid group per task
    * (spilling past the in-memory threshold), so a pathological
    * boilerplate shingle pays one spilled group — the same single-key
    * skew both forms bottom out at (AQE can't split one key either
    * way), and precisely the rows the cap then discards.
    */
  private def dfCappedKeep(stream: DataFrame): DataFrame =
    stream.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("df") <= MaxShingleDocFreq)

  private def dfCapped(stream: DataFrame): DataFrame =
    dfCappedKeep(stream).drop("df")

  /** [[shingles]] with the identity reduced to an xxhash64 LONG BEFORE
    * any exchange — the df-cap window and every downstream join shuffle
    * 8 bytes instead of a ~30-byte string (the d12 gram-key lesson).
    * For consumers whose OUTPUT depends only on set intersections
    * (d2/d21/d22, p5's shared-count), a 2^-64 collision cannot visibly
    * perturb the result.
    */
  private[graft] def hashedShingles(docs: DataFrame): DataFrame =
    dfCapped(rawShingles(docs).select(col("doc_id"), xxhash64(col("g")).as("g")))

  /** [[hashedShingles]] KEEPING the cap window's df column
    * (doc_id, g, df) — the df-annotated index d21/d22 previously
    * re-derived with a vocabulary aggregate joined back onto the very
    * stream the aggregate came from (one whole extra exchange + join
    * per query); the fused window had the number all along.
    */
  private[graft] def hashedShinglesDf(docs: DataFrame): DataFrame =
    dfCappedKeep(rawShingles(docs).select(col("doc_id"), xxhash64(col("g")).as("g")))

  /** The full fused shingle index (doc_id, g, h): g = xxhash64 join
    * identity, h = [[Portable.hash32]] — the minhash input, byte-equal
    * to the string pipeline's — BOTH computed inside the one Generate
    * pass, df-capped by the fused window. The d3/d4/d18/d19/d24 shingle
    * consumers read this instead of re-deriving h from the string after
    * a second (or fourth) tokenize+shingle pass.
    */
  private[graft] def shingleIndex(docs: DataFrame): DataFrame =
    dfCapped(rawShingles(docs).select(col("doc_id"),
      xxhash64(col("g")).as("g"), Portable.hash32(col("g")).as("h")))

  /** The UN-capped per-doc shingle stream — exposed so t18/p21 (which
    * need hot shingles: they ARE the signal there) and the ScaleOpsSpec
    * pair-volume proof can read the pre-filter stream; every candidate-
    * JOIN consumer goes through [[shingles]] (the df-capped index).
    */
  private[graft] def rawShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(shingleArray(col("w"))).as("g"))

  /** Oracle CTEs mirroring [[shingles]]; exposes `sh(doc_id, g)`. */
  val sqlShingleCtes: String = {
    val n = ShingleN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, $grams AS g
       |        FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |rare AS (SELECT g FROM sh0 GROUP BY g HAVING count(*) <= $MaxShingleDocFreq),
       |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN rare ON sh0.g = rare.g)""".stripMargin
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact Jaccard near-dup pairs via inverted-index self-join.
    *
    * SCALE: pair generation reads ONLY the df-capped shingle index
    * ([[shingles]] drops every shingle with document frequency >
    * [[Portable.MaxShingleDocFreq]] BEFORE the self-join). The cap is the
    * whole scale story for this operator: shingle frequency is power-law,
    * and one boilerplate shingle shared by 10^5 documents would put
    * ~10^10/2 candidate pairs on a single join key — inherently quadratic
    * output that no AQE skew split can save. Dropping stop-shingles from
    * candidate generation is the standard move (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * shingle in >MaxShingleDocFreq docs carries no discriminative signal
    * for near-dup detection, so the capped join changes candidate VOLUME,
    * not verdicts, for any threshold-passing pair. With the cap, per-key
    * join output is ≤ MaxShingleDocFreq²/2 rows — bounded regardless of
    * corpus size. The oracle mirrors the cap (the `rare` CTE), and
    * ScaleOpsSpec proves on a planted hot shingle that the capped pair
    * volume stays bounded where the uncapped one explodes. At corpus
    * scale prefer [[lshPairs]] (band-bucketed MinHash candidates,
    * exact-Jaccard verify on candidates only) + [[connectedComponents]];
    * keep this form for small corpora and for validating LSH recall.
    *
    * Materialization lifecycle (the house rule, not cache()): three
    * consumers read the shingle index (doc counts + both join sides),
    * so it takes an EAGER localCheckpoint — the shared-intermediate
    * form (the d21/t37 convention: no earlier action exists to
    * materialize a lazy checkpoint off, so the eager job computes the
    * index exactly once and every consumer reads stored blocks). NO
    * CacheManager entry exists: blocks die with the RDD via the
    * ContextCleaner when the frame is unreferenced, so a long-lived
    * session calling this on varied corpora accumulates nothing
    * (RankingLifecycleSpec pins the zero-cache-growth contract for the
    * dedup operators too).
    *
    * HONESTY NOTE on the benchmark price (the r15 q34 lesson, second
    * sighting): the previous cache() form benched d2 at ~2.2 s warm at
    * sf0.1 — FLATTERED by the leak itself: the CacheManager dedups by
    * plan, so every warm pass after the first reused the prior pass's
    * cached shingle index and never paid the shingle computation. The
    * checkpointed form's ~3.6 s is the honest per-call price a fresh
    * session actually pays; measured eager == lazy within noise at
    * bench scale, eager kept per the convention above.
    */
  def jaccardPairs(docs: DataFrame): DataFrame =
    // df-capped index (df <= MaxShingleDocFreq enforced inside the fused
    // window cap): the self-join key is never a stop-shingle, so per-key
    // output is bounded — NOT the raw shingle stream (that's rawShingles,
    // for the operators where hot shingles are the signal). HASHED
    // identity (the d21 lesson moved here): every downstream join/agg
    // depends only on set intersections, so the 8-byte xxhash64 key is
    // output-equivalent and the checkpoint stores no shingle strings.
    jaccardPairsFrom(hashedShingles(docs).localCheckpoint(true))

  /** [[jaccardPairs]] over an ALREADY-CHECKPOINTED shingle index —
    * factored out so multi-method consumers ([[methodAgreement]]) pay
    * the shingle pass ONCE across detectors (the p54 shared-scan rule).
    */
  private[operators] def jaccardPairsFrom(sh: DataFrame): DataFrame = {
    // no checkpoint on cnt: its two verify-side joins broadcast the SAME
    // canonical build, which the runtime reuses (ReusedExchange over the
    // one BroadcastExchange — the round-17 d2 executed-plan finding), so
    // the aggregate already runs once
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.as("ca"), col("ia") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("ib") === col("cb.doc_id"))
      .select(col("ia"), col("ib"),
        round(col("inter") * lit(1.0) / (col("ca.n") + col("cb.n") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("ia"), col("ib"))
  }

  /** EXACT similarity join via PREFIX FILTERING (d21 — Bayardo et al.,
    * "Scaling Up All Pairs Similarity Search", WWW 2007): the same pairs
    * as [[jaccardPairs]] (d2), found WITHOUT the full inverted-index
    * self-join. Shingles order globally by (df asc, g asc) — rarest
    * first — and each doc exposes only its first m − ⌈τ·m⌉ + 1 shingles
    * as join keys: any pair with J ≥ τ shares ≥ ⌈τ·m⌉ shingles per side,
    * which cannot all hide in the ⌈τ·m⌉ − 1 suffix positions, so the
    * prefix join finds EVERY qualifying pair (a deterministic guarantee
    * — LSH's d4 trades that for probability). Verification counts the
    * intersection only for candidate pairs.
    *
    * Same output as d2 → same oracle (the w9-vs-w7 pure-plan-change
    * relationship). Scale: join keys per doc shrink from m to ~(1−τ)m
    * and concentrate on RARE shingles (tiny postings), while d2 joins
    * every posting of every shingle; the global-order rank is one window
    * over the df-capped VOCABULARY (bounded by the cap, not the corpus).
    */
  def ppJoinPairs(docs: DataFrame): DataFrame = {
    val tau = JaccardThreshold
    // plan-level costs fixed here:
    //  - shingle identity shuffles as an xxhash64 LONG, not a ~30-byte
    //    string (the d12 gram-key lesson; output depends only on set
    //    intersections, which a 2^-64 collision cannot visibly perturb);
    //  - ranked (the df-annotated index) comes straight off the fused
    //    cap window — the old form re-derived df with a vocabulary
    //    aggregate joined back onto the stream it came from, and
    //    checkpointed BOTH the plain and the annotated index;
    //  - it feeds FOUR downstream consumers (cnt, prefix, both verify
    //    sides), so ONE eager localCheckpoint (the kmeansModel
    //    precedent; at cluster scale this is the persist-the-inverted-
    //    index step every PPJoin implementation has).
    // SIZE/FAULT BOUND (guide §5, the Ranking scaladoc caveat): this
    // checkpoint is INDEX-sized — O(docs × shingles/doc) ~20-byte rows,
    // NOT request-bounded. localCheckpoint blocks are non-replicated
    // executor storage (MEMORY_AND_DISK: spills, but an executor loss
    // fails the query and the retry re-runs it, never silent
    // recomputation). A deployment whose index outgrows executor
    // storage should stage it to parquet instead — buildAndSaveLshIndex
    // / the d13 incremental family IS that fallback, and at 100 TB the
    // right architecture is the saved index, not the in-query one.
    val ranked = hashedShinglesDf(docs).localCheckpoint(true)
    val sh = ranked.select(col("doc_id"), col("g"))
    // rarest-first needs only a TOTAL ORDER on shingles, not a global
    // rank: ordering the per-doc window by (df, g) directly is the same
    // prefix bound without pushing the whole df-capped vocabulary
    // through one rank partition. cnt feeds THREE joins (prefix bound +
    // both verify-size sides) — docs-sized, checkpointed once.
    val cnt = ranked.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val prefix = ranked.join(cnt, "doc_id")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .filter(col("pos") <= col("m") - ceil(lit(tau) * col("m")) + 1)
      .select(col("doc_id"), col("g"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .distinct()
    val inter = cand
      .join(sh.select(col("doc_id").as("ia"), col("g")), "ia")
      .join(sh.select(col("doc_id").as("ib"), col("g")), Seq("ib", "g"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("doc_id").as("ia"), col("m").as("na")), "ia")
      .join(cnt.select(col("doc_id").as("ib"), col("m").as("nb")), "ib")
      .select(col("ia"), col("ib"),
        round(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy(col("ia"), col("ib"))
  }

  /** Directed containment threshold (d22). */
  val ContainThreshold = 0.9

  /** DIRECTED containment pairs (d22): |S(src) ∩ S(dst)| / |S(src)| ≥
    * [[ContainThreshold]] over the df-capped shingle sets — the
    * asymmetric relation Jaccard (d2/d21) structurally misses: a short
    * document quoted whole inside a much longer one has tiny Jaccard
    * (union is the big doc) but containment ≈ 1. The quote/subset
    * detector a crawl dedup needs next to the near-dup detector.
    *
    * Candidates come from d21's prefix-filtering bound, adapted to the
    * asymmetric case: if |A∩B| ≥ τ·|A| then at most |A| − ⌈τ·|A|⌉
    * elements of A miss B, so ANY fixed |A| − ⌈τ·|A|⌉ + 1 of A's
    * shingles must hit B — join only src's rarest-first prefix against
    * the full index (dst side has no prefix: containment puts no lower
    * bound on the dst's share of its OWN set). Deterministically
    * complete, like d21; the oracle brute-forces all pairs and must
    * agree exactly.
    *
    * Scale: src join keys shrink to ~(1−τ)·m rarest shingles per doc
    * against df-capped postings; intersection counting touches only
    * candidate pairs.
    */
  def containmentPairs(docs: DataFrame): DataFrame = {
    val tau = ContainThreshold
    // same cost structure as [[ppJoinPairs]]: hashed shingle keys, the
    // df-annotated index straight off the fused cap window, ONE
    // index-sized materialization for the four consumers (same §5
    // size/fault bound as documented there), per-doc (df, g) ordering
    // instead of a global vocabulary rank
    val ranked = hashedShinglesDf(docs).localCheckpoint(true)
    val sh = ranked.select(col("doc_id"), col("g"))
    val cnt = ranked.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val prefix = ranked.join(cnt, "doc_id")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .filter(col("pos") <= col("m") - ceil(lit(tau) * col("m")) + 1)
      .select(col("doc_id"), col("g"))
    val cand = prefix.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .distinct()
    val inter = cand
      .join(sh.select(col("doc_id").as("src"), col("g")), "src")
      .join(sh.select(col("doc_id").as("dst"), col("g")), Seq("dst", "g"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("doc_id").as("src"), col("m").as("ns")), "src")
      .select(col("src"), col("dst"),
        round(col("inter") * lit(1.0) / col("ns"), 4).as("containment"))
      .filter(col("containment") >= tau)
      .orderBy(col("src"), col("dst"))
  }

  /** CLUSTER COHERENCE AUDIT (d23): transitive closure can chain A–B–C
    * where A and C share almost nothing — this measures how much. For
    * every multi-member cluster in the SAVED labels, the exact Jaccard
    * of every member pair (quadratic per cluster, bounded by the d17
    * histogram's cluster sizes — the declared exact piece), reporting
    * per cluster the pair count, the WORST pair and the fraction of
    * pairs at or above the pairing threshold, plus the corpus row
    * (cluster −1). A low frac_ge_tau says the banding is over-merging
    * and d18's tuning table is the fix.
    */
  def clusterCoherence(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val tau = JaccardThreshold
    val sh = hashedShingles(docs).localCheckpoint(true)
    // cnt: both verify sides reuse its one broadcast build (the
    // jaccardPairsFrom finding) — no checkpoint
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
    val pairs = clusters.as("a").join(clusters.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.cluster").as("cluster"),
        col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("ia"), col("g")), "ia")
      .join(sh.select(col("doc_id").as("ib"), col("g")), Seq("ib", "g"))
      .groupBy(col("cluster"), col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
    val jac = pairs.join(inter, Seq("cluster", "ia", "ib"), "left")
      .join(cnt.select(col("doc_id").as("ia"), col("m").as("na")), "ia")
      .join(cnt.select(col("doc_id").as("ib"), col("m").as("nb")), "ib")
      .select(col("cluster"),
        round(coalesce(col("inter"), lit(0L)) * lit(1.0)
          / (col("na") + col("nb") - coalesce(col("inter"), lit(0L))), 4)
          .cast("decimal(18,4)").as("jac"))
      // jac (pair-sized) feeds the per-cluster AND the corpus aggregate —
      // uncheckpointed, the whole verify pipeline ran twice in one action
      .localCheckpoint(true)
    def shape(g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = g
      .agg(count(lit(1)).as("n_pairs"), min(col("jac")).cast("double").as("min_jac"),
        round(sum(when(col("jac") >= tau, 1L).otherwise(0L)) * lit(1.0)
          / count(lit(1)), 4).as("frac_ge_tau"))
    // corpus row via a GLOBAL aggregate (the c11 silhouette idiom), not
    // groupBy(lit(-1)): a grouped aggregate over an empty pair table
    // emits zero rows, while the oracle's global corpus row always
    // emits one — a corpus with no near-duplicate pairs must still
    // report (-1, 0, null, null) in both engines.
    val corpus = jac
      .agg(count(lit(1)).as("n_pairs"), min(col("jac")).cast("double").as("min_jac"),
        round(sum(when(col("jac") >= tau, 1L).otherwise(0L)) * lit(1.0)
          / count(lit(1)), 4).as("frac_ge_tau"))
      .select(lit(-1L).as("cluster"), col("n_pairs"), col("min_jac"),
        col("frac_ge_tau"))
    shape(jac.groupBy(col("cluster")))
      .unionByName(corpus)
      .orderBy(col("cluster"))
  }

  /** Oracle for [[clusterCoherence]]: the d8 recursive closure, the
    * brute-force per-pair intersection and the same rounded fractions.
    */
  def sqlClusterCoherence: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |$sqlShingleCtes,
       |shm AS MATERIALIZED (SELECT doc_id, g FROM sh),
       |cnt AS MATERIALIZED (SELECT doc_id, count(*) AS m FROM shm GROUP BY 1),
       |prs AS MATERIALIZED (SELECT a.cluster, a.doc_id AS ia, b.doc_id AS ib
       |  FROM clus a JOIN clus b
       |    ON a.cluster = b.cluster AND a.doc_id < b.doc_id),
       |iv AS MATERIALIZED (SELECT prs.cluster, prs.ia, prs.ib, count(*)::BIGINT AS inter
       |  FROM prs JOIN shm sa ON sa.doc_id = prs.ia
       |  JOIN shm sb ON sb.doc_id = prs.ib AND sb.g = sa.g
       |  GROUP BY 1, 2, 3),
       |jac AS MATERIALIZED (SELECT prs.cluster,
       |    round(coalesce(iv.inter, 0) * 1.0
       |      / (ca.m + cb.m - coalesce(iv.inter, 0)), 4)::DECIMAL(18,4) AS jac
       |  FROM prs
       |  LEFT JOIN iv ON iv.cluster = prs.cluster
       |    AND iv.ia = prs.ia AND iv.ib = prs.ib
       |  JOIN cnt ca ON ca.doc_id = prs.ia
       |  JOIN cnt cb ON cb.doc_id = prs.ib)
       |SELECT cluster, count(*)::BIGINT AS n_pairs,
       |  min(jac)::DOUBLE AS min_jac,
       |  round(sum(CASE WHEN jac >= $JaccardThreshold THEN 1 ELSE 0 END) * 1.0
       |    / count(*), 4) AS frac_ge_tau
       |FROM jac GROUP BY cluster
       |UNION ALL
       |SELECT -1, count(*)::BIGINT, min(jac)::DOUBLE,
       |  round(sum(CASE WHEN jac >= $JaccardThreshold THEN 1 ELSE 0 END) * 1.0
       |    / count(*), 4)
       |FROM jac
       |ORDER BY cluster""".stripMargin

  /** Oracle for [[containmentPairs]]: brute-force directed pairs — the
    * prefix filter is a pure plan optimization with a deterministic
    * completeness guarantee, so outputs must match exactly.
    */
  val sqlContainmentPairs: String =
    s"""WITH $sqlShingleCtes,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id src, b.doc_id dst, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id != b.doc_id
       |          GROUP BY 1, 2)
       |SELECT src, dst, round(inter * 1.0 / c.n, 4) AS containment
       |FROM pairs JOIN cnt c ON c.doc_id = src
       |WHERE round(inter * 1.0 / c.n, 4) >= $ContainThreshold
       |ORDER BY src, dst""".stripMargin

  val sqlJaccardPairs: String =
    s"""WITH $sqlShingleCtes,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT ia, ib,
       |  round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
       |FROM pairs JOIN cnt ca ON ca.doc_id = ia JOIN cnt cb ON cb.doc_id = ib
       |WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= $JaccardThreshold
       |ORDER BY ia, ib""".stripMargin

  // -------------------------------------------------------------- MinHash

  /** Per-doc MinHash signature: MinHashPerms min-values over permuted
    * 32-bit shingle hashes, as wide columns h0..h{n-1}.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    // fused index: ONE tokenize+shingle Generate (h computed inside it),
    // then straight to the per-doc signature aggregate
    val hashed = shingleIndex(docs).select(col("doc_id"), col("h"))
    val aggs = (0 until MinHashPerms).map(i => min(minHashPerm(col("h"), i)).as(s"h$i"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).orderBy(col("doc_id"))
  }

  val sqlMinhashSignatures: String = {
    val h = Portable.sqlHash32("g")
    val mins = (0 until MinHashPerms)
      .map(i => s"min(${sqlMinHashPerm("h", i)}) AS h$i").mkString(",\n  ")
    s"""WITH $sqlShingleCtes,
       |hashed AS (SELECT doc_id, $h AS h FROM sh)
       |SELECT doc_id,
       |  $mins
       |FROM hashed GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ LSH pairs

  /** LSH candidate pairs from a shingle table: MinHash signature of
    * `bands * rows` permutations, banded, one bucket self-join. Band/row
    * counts are parameters so the recall test (ScaleOpsSpec) can prove the
    * S-curve sensitivity — a band-count reduction measurably loses recall;
    * the production path is the [[Portable.MinHashBands]] x
    * [[Portable.MinHashRows]] configuration, byte-identical to the oracle.
    */
  private[graft] def lshCandidates(sh: DataFrame, bands: Int, rows: Int): DataFrame = {
    // sh is the fused index (doc_id, g, h) — h was computed inside the
    // shingle Generate, not re-derived from a second tokenize pass
    val hashed = sh.select(col("doc_id"), col("h"))
    // no checkpoint: the bucket self-join's two sides exchange on
    // identical canonical subtrees, so AQE stage reuse runs the
    // signature aggregation once (the mm7 ReusedExchange finding)
    val stacked = bandBuckets(hashed, bands, rows)
    stacked.as("x").join(stacked.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib")).distinct()
  }

  /** (doc_id, band, bh) band-bucket rows from a HASHED shingle table
    * (doc_id, h): MinHash signature of `bands * rows` permutations, each
    * band's row block md5-fingerprinted — the LSH bucket key. One row per
    * (doc, band); shared by the in-query candidate join ([[lshCandidates]])
    * and the persisted index ([[buildAndSaveLshIndex]]).
    */
  private[graft] def bandBuckets(hashed: DataFrame,
                                 bands: Int = MinHashBands,
                                 rows: Int = MinHashRows): DataFrame = {
    require(bands * rows <= MinHashPerms,
      s"bands*rows must fit the ${MinHashPerms} defined permutations")
    val aggs = (0 until bands * rows).map(i => min(minHashPerm(col("h"), i)).as(s"h$i"))
    bandsFromSig(hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*),
      bands, rows)
  }

  /** Band-bucket rows from an ALREADY-AGGREGATED signature frame
    * (doc_id, h0..h_{bands·rows−1}) — the ONE banding-fingerprint
    * implementation every consumer reads (d4's candidate join, the saved
    * LSH index, and each of d18's tuning configs over a shared
    * signature), so a bucket-key change can never fork between the
    * production path and the table that prices it.
    */
  private[graft] def bandsFromSig(sig: DataFrame,
                                  bands: Int, rows: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws(",", (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
        .as(s"band$b")
    }
    sig.select(col("doc_id") +: bandCols: _*)
      .selectExpr("doc_id",
        s"stack($bands, " +
          (0 until bands).map(b => s"$b, band$b").mkString(", ") + ") AS (band, bh)")
  }

  /** Banding configurations for the d18 tuning table: three (bands, rows)
    * splits of the SAME [[Portable.MinHashPerms]] = 16 permutations —
    * recall-leaning (8×2), production (4×4), precision-leaning (2×8).
    */
  val LshTuneConfigs: Seq[(Int, Int)] = Seq((8, 2), (4, 4), (2, 8))

  /** Sub-threshold Jaccard reference point for the tuning table. */
  val LshTuneLowJ = 0.3

  /** LSH banding tuning report (d18) — the s10 honesty table applied to
    * the dedup leg: before an operator picks a banding, this is the row
    * they read. For each (bands, rows) split of the SAME 16-permutation
    * signature: the MEASURED candidate volume on this corpus (Σ over
    * buckets of C(n,2) — exactly the number of pairs the verify join
    * would have to score, i.e. the banding's cost knob) and the
    * THEORETICAL S-curve collision probability 1−(1−J^r)^b at the verify
    * threshold (recall knob) and at a sub-threshold J (false-candidate
    * knob). More bands of fewer rows buys recall with candidate volume;
    * the table shows both sides priced on real data.
    *
    * Scale shape: ONE signature aggregation (16 partial-aggregated mins
    * per doc) shared by all three bandings; per config a (band, bh)
    * count — candidate pairs are COUNTED from bucket sizes, never
    * materialized, so the report costs a vocabulary-of-buckets aggregate
    * even where the worst banding would explode the actual join. The
    * probability columns are plan literals (same Scala arithmetic
    * generates the oracle's literals).
    */
  def lshTuningReport(docs: DataFrame): DataFrame = {
    // fused index: one Generate, h computed inside it (the d3 form)
    val hashed = shingleIndex(docs).select(col("doc_id"), col("h"))
    val aggs = (0 until Portable.MinHashPerms)
      .map(i => min(minHashPerm(col("h"), i)).as(s"h$i"))
    // the docs × 16 signature table feeds all three banding configs —
    // uncheckpointed, each config re-ran the corpus shingle pass + the
    // signature aggregation (3 scans for one shared table)
    val sig = hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    val reports = LshTuneConfigs.map { case (b, r) =>
      bandsFromSig(sig, b, r)
        .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("cand_pairs"))
        .select(lit(b).as("bands"), lit(r).as("n_rows"),
          col("cand_pairs").cast("bigint").as("cand_pairs"),
          lit(sCurve(JaccardThreshold, b, r)).as("p_at_threshold"),
          lit(sCurve(LshTuneLowJ, b, r)).as("p_at_low"))
    }
    reports.reduce(_.unionByName(_)).orderBy(col("bands").desc)
  }

  /** The banding S-curve 1−(1−J^r)^b — computed in Scala so the SAME
    * double lands as a literal in both the Spark plan and the generated
    * oracle SQL (shortest-round-trip toString parses back bit-exact).
    */
  def sCurve(j: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, r), b)

  def sqlLshTuningReport: String = {
    val h = Portable.sqlHash32("g")
    val mins = (0 until Portable.MinHashPerms)
      .map(i => s"min(${sqlMinHashPerm("h", i)}) AS h$i").mkString(", ")
    val cfgs = LshTuneConfigs.map { case (b, r) =>
      val bandsSel = (0 until b).map { bb =>
        val cols = (0 until r).map(rr => s"h${bb * r + rr}").mkString(", ")
        s"SELECT doc_id, $bb AS band, md5(concat_ws(',', $cols)) AS bh FROM sig"
      }.mkString(" UNION ALL ")
      s"""SELECT $b::INT AS bands, $r::INT AS n_rows,
         |  (SELECT coalesce(sum(n * (n - 1) // 2), 0)::BIGINT
         |   FROM (SELECT count(*) AS n FROM ($bandsSel) GROUP BY band, bh)) AS cand_pairs,
         |  ${sCurve(JaccardThreshold, b, r)} AS p_at_threshold,
         |  ${sCurve(LshTuneLowJ, b, r)} AS p_at_low""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $sqlShingleCtes,
       |hashed AS (SELECT doc_id, $h AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id)
       |$cfgs
       |ORDER BY bands DESC""".stripMargin
  }

  /** Inter-source content-overlap matrix via per-source MinHash UNION
    * sketches (d19) — which sources share material, without ever
    * comparing documents: a source's sketch is the elementwise MIN of
    * its documents' permutation minima (MinHash composes over set union
    * — min(min(A), min(B)) = min(A ∪ B)), and for two sources the
    * fraction of agreeing permutation slots is the standard unbiased
    * estimator of the Jaccard similarity of their SHINGLE SETS. The
    * corpus-analytics companion to d10's dup-rate table: a pair of
    * mirrored crawls lights up here before any pair enumeration is
    * spent on them.
    *
    * Scale shape: one pass over the df-capped shingle stream,
    * partial-aggregated to sources × 16 mins; the pair comparison is a
    * self-join of a SOURCES-sized frame — at 100 TB that's thousands of
    * rows, not documents. Estimator variance is 1/√16 per pair
    * (coarse by design — this is a triage table; the verified pair
    * passes d2/d4 price anything it flags).
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    // fused index: one Generate, h computed inside it (the d3 form)
    val hashed = shingleIndex(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("h"))
    val aggs = (0 until Portable.MinHashPerms)
      .map(i => min(minHashPerm(col("h"), i)).as(s"h$i"))
    // sources × 16 sketch table, read by BOTH sides of the self-join —
    // uncheckpointed, the corpus shingle pass ran twice
    val sk = hashed.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    val matches = (0 until Portable.MinHashPerms)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        matches.cast("int").as("match_perms"),
        round(matches / lit(Portable.MinHashPerms.toDouble), 4).as("est_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def sqlSourceOverlap: String = {
    val h = Portable.sqlHash32("g")
    val mins = (0 until Portable.MinHashPerms)
      .map(i => s"min(${sqlMinHashPerm("h", i)}) AS h$i").mkString(", ")
    val matches = (0 until Portable.MinHashPerms)
      .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $sqlShingleCtes,
       |hashed AS (SELECT d.source, $h AS h
       |  FROM sh JOIN documents d ON d.doc_id = sh.doc_id),
       |sk AS (SELECT source, $mins FROM hashed GROUP BY source)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  ($matches)::INT AS match_perms,
       |  round(($matches) / ${Portable.MinHashPerms}.0, 4) AS est_jaccard
       |FROM sk a JOIN sk b ON a.source < b.source
       |ORDER BY src_a, src_b""".stripMargin
  }

  /** MinHash-LSH near-dup pairs: band the signature (MinHashBands bands of
    * MinHashRows), bucket-join per band for candidates, then verify with
    * exact Jaccard >= threshold. The banding join is the scale path: at
    * 100 TB only same-bucket pairs are ever materialized.
    */
  def lshPairs(docs: DataFrame): DataFrame =
    // eager localCheckpoint, not cache(): three consumers (signature
    // banding + both verify sides) read stored blocks with no
    // session-long CacheManager pin — the jaccardPairs lifecycle note.
    // Fused index: one Generate builds it, h rides along for the
    // banding, the verify joins run on the 8-byte g.
    lshPairsFrom(shingleIndex(docs).localCheckpoint(true))

  /** [[lshPairs]] over an ALREADY-CHECKPOINTED shingle index — the
    * [[jaccardPairsFrom]] factoring, same shared-scan rationale.
    */
  private[operators] def lshPairsFrom(sh: DataFrame): DataFrame = {
    val cand = lshCandidates(sh, MinHashBands, MinHashRows)
    // verify ONLY candidate pairs with exact jaccard — the LSH payoff: the
    // full pairwise self-join is never materialized, just bucket-cohabitants.
    // cnt needs no checkpoint: both verify sides reuse its one broadcast
    // build at runtime (the jaccardPairsFrom ReusedExchange finding).
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // no broadcast hint on cand: candidate volume is DATA-DEPENDENT (a
    // boilerplate-heavy crawl explodes band collisions), so a mandatory
    // BroadcastExchange would OOM the driver at scale. AQE broadcasts it
    // at runtime when it measures small — same plan on small corpora,
    // safe shuffle join on pathological ones.
    val inter = cand.join(sh.as("a"), col("ia") === col("a.doc_id"))
      .select(col("ia"), col("ib"), col("a.g").as("cand_g"))
      .join(sh.as("b"), col("cand_g") === col("b.g") && col("ib") === col("b.doc_id"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.as("ca"), col("ia") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("ib") === col("cb.doc_id"))
      .select(col("ia"), col("ib"),
        round(col("inter") * lit(1.0) / (col("ca.n") + col("cb.n") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("ia"), col("ib"))
  }

  val sqlLshPairs: String = {
    val h = Portable.sqlHash32("g")
    val mins = (0 until MinHashPerms)
      .map(i => s"min(${sqlMinHashPerm("h", i)}) AS h$i").mkString(", ")
    val bands = (0 until MinHashBands).map { b =>
      val cols = (0 until MinHashRows).map(r => s"h${b * MinHashRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bh FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $sqlShingleCtes,
       |hashed AS (SELECT doc_id, $h AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
       |stacked AS ($bands),
       |cand AS (SELECT DISTINCT x.doc_id ia, y.doc_id ib
       |         FROM stacked x JOIN stacked y
       |           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT c.ia, c.ib,
       |  round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
       |FROM cand c JOIN pairs p ON p.ia = c.ia AND p.ib = c.ib
       |JOIN cnt ca ON ca.doc_id = c.ia JOIN cnt cb ON cb.doc_id = c.ib
       |WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= $JaccardThreshold
       |ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------- duplicate clusters (CC)

  /** Connected components over an undirected pair list: every doc gets the
    * min doc_id reachable from it — the cluster id / canonical
    * representative.
    *
    * Algorithm: ALTERNATING LARGE-STAR / SMALL-STAR contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC '14).
    * Each round rewires every node toward the minimum of its neighborhood,
    * roughly halving tree heights, so convergence is O(log n) rounds — a
    * 1,000-link boilerplate-edit chain is ~10 Spark jobs, not 1,000, which
    * is what makes this safe on a 100 TB corpus where near-dup chains get
    * long. (Plain min-label propagation, the previous implementation, is
    * O(diameter) rounds.) Each round is two groupBy+join passes over the
    * EDGE set only, never the corpus.
    *
    * Like MLlib's fit, this is an ACTION — the loop runs when called and
    * the returned labels are materialized (one localCheckpoint of |V| rows),
    * which lets every intermediate cached block — the canonical pair set,
    * the per-round star edges — be unpersisted before returning; nothing
    * stays pinned for the session. Per-round localCheckpoint cuts lineage:
    * the edge frame feeds several operators per round, so an uncheckpointed
    * logical plan grows geometrically with rounds. Convergence = unchanged
    * (count, bit_xor of xxhash64) edge-set fingerprint, one cheap action per
    * round over checkpointed edges, bounded by [[CcMaxRounds]] so a
    * non-converging fingerprint fails loudly instead of spinning forever.
    */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** Hard bound on contraction rounds: convergence is O(log n) so 64 rounds
    * covers any graph that fits in a cluster; hitting it means a bug.
    */
  private[graft] val CcMaxRounds = 64

  /** [[connectedComponents]] plus the number of contraction rounds run —
    * exposed so tests can pin the O(log n) convergence bound.
    */
  private[graft] def connectedComponentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    // ONE evaluation of the upstream (for dupClusters: the whole LSH
    // pipeline); vertices and oriented edges both derive from this block
    val base = pairs.select(col("ia"), col("ib")).localCheckpoint(true)
    val verts = base.select(col("ia").as("x"))
      .union(base.select(col("ib").as("x")))
      .distinct()
    // canonical big->small orientation, self-loops and duplicates dropped
    var edges = base
      .select(greatest(col("ia"), col("ib")).as("u"), least(col("ia"), col("ib")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = fingerprint(edges)
    var rounds = 0
    var converged = sig._1 == 0L
    while (!converged) {
      rounds += 1
      require(rounds <= CcMaxRounds,
        s"connectedComponents did not converge after $CcMaxRounds " +
          "large/small-star rounds — contraction halves tree heights each " +
          "round, so this indicates a bug (or a fingerprint collision loop), " +
          "not a large graph")
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // next is eagerly materialized; the previous round's blocks are dead
      edges.unpersist()
      edges = next
      val nsig = fingerprint(edges)
      converged = nsig == sig
      sig = nsig
    }
    // fixed point = stars: every non-minimum vertex carries exactly one
    // edge (v, component-min); minima label themselves via the coalesce.
    // Materialize labels so base + final edges can be released now.
    val labels = verts.join(edges, verts("x") === edges("u"), "left")
      .select(verts("x").as("v"), coalesce(edges("v"), verts("x")).as("lab"))
      .localCheckpoint(true)
    edges.unpersist()
    base.unpersist()
    (labels, rounds)
  }

  /** Large-star: for each node, connect every STRICTLY LARGER neighbor to
    * the minimum of the closed neighborhood. Symmetrizes internally;
    * output keeps the big->small invariant (target = a neighborhood min).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: for each node (all neighbors smaller, by invariant),
    * connect the node and every non-minimum neighbor to the minimum
    * neighbor. Preserves the big->small invariant.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    e.join(mins, "u").filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Near-dup CLUSTERS from the LSH pairs: (doc_id, cluster) where cluster
    * is the min doc_id of the component — the final step that turns pair
    * detection into actual deduplication (keep cluster == doc_id rows).
    */
  def dupClusters(docs: DataFrame): DataFrame =
    connectedComponents(lshPairs(docs))
      .select(col("v").as("doc_id"), col("lab").as("cluster"))
      .orderBy(col("doc_id"))

  // ------------------------------------ cluster-label artifact (d11)

  /** Persist the [[dupClusters]] labels — the train-once/apply-anywhere
    * pattern (t14 BPE model, s9 IVF-PQ index) applied to the MOST
    * expensive pipeline product: the shingle→MinHash→LSH→CC chain. A real
    * pipeline clusters ONCE and lets every downstream reader (the
    * keep-list, the per-source dashboard, ad-hoc audits) load the labels
    * instead of re-running the chain — at 100 TB "recompute LSH+CC per
    * reader" is the single biggest avoidable cost in the whole dedup
    * family.
    *
    * Labels are (doc_id, cluster) — ONE ROW PER DOCUMENT, corpus-scaling
    * — so this goes through [[graft.sources.ModelStore.saveLarge]]'s
    * parallel bounded-file writer, never the dimension-table coalesce(1)
    * path. Parquet keeps the ids binary-exact, so a load-then-derive is
    * byte-identical to derive-in-lineage (d11 gates exactly this:
    * save → load must hash-match d8).
    */
  def clusterAndSave(docs: DataFrame, path: String): Unit =
    graft.sources.ModelStore.saveLarge(dupClusters(docs), path)

  /** Load saved cluster labels (the [[clusterAndSave]] artifact). */
  def loadClusters(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    graft.sources.ModelStore.load(spark, path)
      .select(col("doc_id"), col("cluster"))
      .orderBy(col("doc_id"))

  // ---------------------------------- persisted LSH index + shard dedup (d13)

  /** The persisted LSH index of a corpus — what [[shardLshPairs]] dedups a
    * NEW shard against without touching the old corpus again:
    *  - `shingles`: (doc_id, h) — the df-capped inverted index, shingle
    *    identity reduced to [[Portable.hash32]] (8 bytes on the wire; the
    *    oracle keys on the SAME hash, so there is no cross-engine
    *    collision divergence to argue about);
    *  - `buckets`: (doc_id, band, bh) — the MinHash band buckets, the
    *    candidate-join key;
    *  - `stop`: (h) — the hot shingles the df cap DROPPED, persisted so a
    *    shard can apply the same stop list to its own shingles (a
    *    boilerplate shingle must not re-enter candidate generation just
    *    because the shard is processed alone);
    *  - `counts`: (doc_id, n) — each indexed doc's posting count, the
    *    Jaccard denominator, precomputed at build time so a shard pass
    *    never re-aggregates the corpus-sized posting table.
    */
  final case class LshIndex(shingles: DataFrame, buckets: DataFrame,
                            stop: DataFrame, counts: DataFrame)

  /** Build and persist the [[LshIndex]] of a corpus — the dedup analogue
    * of s9's saved ANN index: cluster-side state that lets tomorrow's
    * shard be deduplicated against today's corpus at SHARD cost. All
    * three tables scale with the corpus (shingles/buckets) or the
    * power-law head (stop), so they go through
    * [[graft.sources.ModelStore.saveLarge]]'s bounded-file parallel
    * writer. The stop list carries its df so bounded consumers (the
    * streaming gate's top-K collected form) can rank it; the batch path
    * uses the full list via anti-join and never collects it.
    */
  def buildAndSaveLshIndex(docs: DataFrame, dir: String): Unit = {
    val sh0 = rawShingles(docs)
    val df = sh0.groupBy(col("g")).agg(count(lit(1)).as("df")).cache()
    val stop = df.filter(col("df") > MaxShingleDocFreq)
      .select(Portable.hash32(col("g")).as("h"), col("df"))
    val kept = sh0
      .join(df.filter(col("df") <= MaxShingleDocFreq).select(col("g")), "g")
      .select(col("doc_id"), Portable.hash32(col("g")).as("h"))
      .cache()
    graft.sources.ModelStore.saveLarge(kept, s"$dir/shingles")
    graft.sources.ModelStore.saveLarge(bandBuckets(kept), s"$dir/buckets")
    graft.sources.ModelStore.saveLarge(stop, s"$dir/stop")
    graft.sources.ModelStore.saveLarge(
      kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n")), s"$dir/counts")
    kept.unpersist()
    df.unpersist()
  }

  /** Load a persisted [[LshIndex]] (the [[buildAndSaveLshIndex]] artifact). */
  def loadLshIndex(spark: org.apache.spark.sql.SparkSession, dir: String): LshIndex =
    LshIndex(
      graft.sources.ModelStore.load(spark, s"$dir/shingles"),
      graft.sources.ModelStore.load(spark, s"$dir/buckets"),
      graft.sources.ModelStore.load(spark, s"$dir/stop"),
      graft.sources.ModelStore.load(spark, s"$dir/counts"))

  /** Incremental shard dedup (d13): near-dup pairs of a NEW shard —
    * against the indexed corpus AND within itself — computed entirely
    * from the shard plus the saved [[LshIndex]], with the old corpus
    * never re-read. The daily-ingest economics of s11 applied to dedup:
    * at 100 TB the corpus-side LSH state is built ONCE
    * ([[buildAndSaveLshIndex]]) and each day's shard costs
    * O(shard + matched candidates), while the d4 form re-shingles and
    * re-signs the whole corpus per run.
    *
    * Declared incremental semantics (each a deliberate, documented
    * divergence from a full d4 re-run over the union — all mirrored
    * exactly by the oracle):
    *  - the index side is FROZEN: old docs keep the signatures computed
    *    under the old corpus's df cap (that is what an index is);
    *  - the shard drops, first, every shingle on the saved stop list
    *    (hot in the OLD corpus), then every shingle with shard-local df
    *    above the same cap (hot in the SHARD) — both drops are the d2/d4
    *    skew guard, applied per collection because a union-wide df
    *    recount would cost a corpus pass and defeat the point.
    *
    * Scale shape: candidates come from two equi-joins on (band, bh) —
    * shard buckets x saved buckets, shard buckets x themselves — so
    * per-key volume is bounded by bucket co-membership exactly as in d4;
    * the Jaccard verify joins candidate pairs to the hashed shingle
    * tables on 8-byte keys, touching only candidate docs' postings. AQE
    * broadcasts the shard side when it measures small. The shard's capped
    * postings take an eager localCheckpoint (two consumers: band
    * signing and the verify) under the [[jaccardPairs]] materialization
    * convention — blocks are reclaimed with the frame, no session-long
    * cache pin.
    */
  def shardLshPairs(shard: DataFrame, idx: LshIndex): DataFrame = {
    val hashed = rawShingles(shard)
      .select(col("doc_id"), Portable.hash32(col("g")).as("h"))
      .join(idx.stop, Seq("h"), "left_anti")
    // fused df cap (the shingles() window form): the old aggregate+
    // join-back evaluated the shard's tokenize+shingle Generate twice —
    // its two legs are different canonical subtrees, so nothing reuses
    // them (guide §2.4); the count window caps on the one exchange the
    // stream pays anyway
    val news = hashed
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= MaxShingleDocFreq).drop("df")
      .localCheckpoint(true)
    // the shard's band buckets feed TWO candidate joins (vs the saved
    // buckets and vs themselves) — checkpoint the doc × bands table so
    // the signature aggregation runs once
    val nb = bandBuckets(news).localCheckpoint(true)
    val cross = nb.as("x").join(idx.buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("ia"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("ib"))
    val within = nb.as("x").join(nb.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
    val cand = cross.union(within).distinct()
    val all = idx.shingles.select(col("doc_id"), col("h")).unionByName(news)
    // Jaccard denominators: the INDEX side's posting counts were
    // precomputed at build time (idx.counts) — only the shard is
    // aggregated here, so no query-time pass over the corpus-sized
    // posting table
    val cnt = idx.counts.select(col("doc_id"), col("n"))
      .unionByName(news.groupBy(col("doc_id")).agg(count(lit(1)).as("n")))
    verifyHashedPairs(cand, all, cnt)
  }

  /** Exact-Jaccard verify of candidate (ia, ib) pairs over a HASHED
    * postings table (doc_id, h) with per-doc posting counts `cnt`
    * (doc_id, n) — the tail shared by [[shardLshPairs]] and
    * [[indexPairs]]. Only candidate docs' postings are touched; the
    * joins are 8-byte-keyed equi-joins.
    */
  private def verifyHashedPairs(cand: DataFrame, postings: DataFrame,
                                cnt: DataFrame): DataFrame = {
    // the denominator table joins twice (ca, cb) but both sides reuse
    // its one broadcast build at runtime — no checkpoint needed (the
    // jaccardPairsFrom ReusedExchange finding)
    val inter = cand.join(postings.as("a"), col("ia") === col("a.doc_id"))
      .select(col("ia"), col("ib"), col("a.h").as("ch"))
      .join(postings.as("b"), col("ch") === col("b.h") && col("ib") === col("b.doc_id"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.as("ca"), col("ia") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("ib") === col("cb.doc_id"))
      .select(col("ia"), col("ib"),
        round(col("inter") * lit(1.0) / (col("ca.n") + col("cb.n") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("ia"), col("ib"))
  }

  /** LSH near-dup pairs of the INDEXED corpus itself, derived from the
    * saved [[LshIndex]] alone (band-bucket self-join + hashed-postings
    * verify) — no re-shingling, no re-signing. This is how the label
    * artifact for [[shardUpdateClusters]] is (re)built when only the
    * index survives.
    */
  def indexPairs(idx: LshIndex): DataFrame = {
    val cand = idx.buckets.as("x").join(idx.buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib")).distinct()
    verifyHashedPairs(cand, idx.shingles.select(col("doc_id"), col("h")),
      idx.counts.select(col("doc_id"), col("n")))
  }

  /** Cluster the indexed corpus from its own saved index and persist the
    * labels — the companion artifact of [[buildAndSaveLshIndex]] (the
    * d11 pattern, sourced from the index instead of the raw corpus).
    */
  def clusterIndexAndSave(idx: LshIndex, path: String): Unit =
    graft.sources.ModelStore.saveLarge(
      connectedComponents(indexPairs(idx))
        .select(col("v").as("doc_id"), col("lab").as("cluster")), path)

  /** Incrementally updated cluster labels after a shard lands (d14) —
    * the final step of the shard-dedup story: near-dup CLUSTERS over
    * old ∪ shard, computed from the saved label artifact plus the
    * shard's pairs alone. The old corpus's connectivity rides in as its
    * star edges (doc_id → cluster for non-canonical members — tiny:
    * one edge per clustered doc), unioned with [[shardLshPairs]]'s
    * cross-corpus + within-shard pairs, and the bounded-round star
    * contraction re-converges. Cost: O(old clustered docs + shard
    * pairs) edges — never a corpus-sized recluster. A shard doc linking
    * two old clusters correctly MERGES them (the min label wins), which
    * is exactly what a fresh clustering of the union would do.
    */
  def shardUpdateClusters(shard: DataFrame, idx: LshIndex,
                          oldLabels: DataFrame): DataFrame =
    shardUpdateClustersFrom(shardLshPairs(shard, idx), oldLabels)

  /** [[shardUpdateClusters]] from an EXISTING shard-pair frame — the
    * artifact path: in a real pipeline the shard pass (d13) runs once
    * and both the pair audit and this label update consume its saved
    * output, so the update step costs O(label edges + shard pairs) with
    * no recompute of the pass itself.
    */
  def shardUpdateClustersFrom(shardPairs: DataFrame,
                              oldLabels: DataFrame): DataFrame = {
    val oldEdges = oldLabels.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("ia"), col("cluster").as("ib"))
    connectedComponents(oldEdges.unionByName(
        shardPairs.select(col("ia"), col("ib"))))
      .select(col("v").as("doc_id"), col("lab").as("cluster"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[shardLshPairs]]: replays the identical split (first 4/5
    * of the corpus indexed, the rest is the shard), per-collection df
    * caps, hash32-keyed signatures/buckets and hashed-postings Jaccard —
    * every declared incremental semantic mirrored term by term.
    */
  def sqlShardLshPairs: String =
    s"""WITH $sqlShardCtes
       |SELECT c.ia, c.ib,
       |  round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
       |FROM cand c JOIN pairs p ON p.ia = c.ia AND p.ib = c.ib
       |JOIN cnt2 ca ON ca.doc_id = c.ia JOIN cnt2 cb ON cb.doc_id = c.ib
       |WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= $JaccardThreshold
       |ORDER BY 1, 2""".stripMargin

  /** Oracle for [[shardUpdateClusters]]: exact reachability closure over
    * the union of the indexed corpus's OWN verified pairs (the ob
    * self-join — exactly [[indexPairs]]) and the shard pass's verified
    * pairs — convergence-independent ground truth for the incremental
    * label update.
    */
  def sqlShardUpdateClusters: String =
    s"""WITH RECURSIVE $sqlShardCtes,
       |oldcand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
       |  FROM ob x JOIN ob y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id < y.doc_id),
       |oldpairs AS (SELECT c.ia, c.ib
       |  FROM oldcand c JOIN pairs p ON p.ia = c.ia AND p.ib = c.ib
       |  JOIN cnt2 ca ON ca.doc_id = c.ia JOIN cnt2 cb ON cb.doc_id = c.ib
       |  WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= $JaccardThreshold),
       |newpairs AS (SELECT c.ia, c.ib
       |  FROM cand c JOIN pairs p ON p.ia = c.ia AND p.ib = c.ib
       |  JOIN cnt2 ca ON ca.doc_id = c.ia JOIN cnt2 cb ON cb.doc_id = c.ib
       |  WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= $JaccardThreshold),
       |e0 AS (SELECT ia AS a, ib AS b FROM oldpairs
       |       UNION SELECT ia, ib FROM newpairs),
       |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e)
       |SELECT a AS doc_id, min(b) AS cluster
       |FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |GROUP BY a ORDER BY doc_id""".stripMargin

  /** The shared CTE block of the shard-dedup oracles: the 4/5 split, the
    * old side's hashed df-capped postings / signatures / buckets (the
    * saved index, replayed), the shard side's stop-list + shard-df
    * capped postings / signatures / buckets, the candidate set, and the
    * hashed-postings intersection table.
    */
  private def sqlShardCtes: String = {
    val n = ShingleN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    val h = Portable.sqlHash32("g")
    def mins(src: String, out: String) = {
      val ms = (0 until MinHashPerms)
        .map(i => s"min(${sqlMinHashPerm("h", i)}) AS h$i").mkString(", ")
      s"$out AS (SELECT doc_id, $ms FROM $src GROUP BY doc_id)"
    }
    def stack(sig: String, out: String) = {
      val arms = (0 until MinHashBands).map { b =>
        val cols = (0 until MinHashRows).map(r => s"h${b * MinHashRows + r}").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bh FROM $sig"
      }.mkString(" UNION ALL ")
      s"$out AS ($arms)"
    }
    s"""cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, $grams AS g
       |        FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |old0 AS (SELECT * FROM sh0 WHERE doc_id < (SELECT cnt FROM cn)),
       |odf AS (SELECT g, count(*) AS df FROM old0 GROUP BY g),
       |stop AS (SELECT $h AS h FROM odf WHERE df > $MaxShingleDocFreq),
       |olds AS (SELECT doc_id, $h AS h FROM old0
       |         JOIN (SELECT g FROM odf WHERE df <= $MaxShingleDocFreq) USING (g)),
       |new0 AS (SELECT doc_id, $h AS h FROM sh0 WHERE doc_id >= (SELECT cnt FROM cn)),
       |new1 AS (SELECT doc_id, h FROM new0 WHERE h NOT IN (SELECT h FROM stop)),
       |ndf AS (SELECT h, count(*) AS df FROM new1 GROUP BY h),
       |news AS (SELECT doc_id, h FROM new1
       |         JOIN (SELECT h FROM ndf WHERE df <= $MaxShingleDocFreq) USING (h)),
       |${mins("olds", "osig")},
       |${mins("news", "nsig")},
       |${stack("osig", "ob")},
       |${stack("nsig", "nb")},
       |cand AS (
       |  SELECT least(x.doc_id, y.doc_id) AS ia, greatest(x.doc_id, y.doc_id) AS ib
       |  FROM nb x JOIN ob y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id != y.doc_id
       |  UNION
       |  SELECT x.doc_id, y.doc_id
       |  FROM nb x JOIN nb y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id < y.doc_id),
       |allsh AS (SELECT doc_id, h FROM olds UNION ALL SELECT doc_id, h FROM news),
       |cnt2 AS (SELECT doc_id, count(*) AS n FROM allsh GROUP BY 1),
       |pairs AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS inter
       |          FROM allsh a JOIN allsh b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)""".stripMargin
  }

  /** Oracle: exact reachability closure via recursive CTE over the same
    * LSH pairs — convergence-independent ground truth for [[dupClusters]].
    */
  def sqlDupClusters: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e)
       |SELECT a AS doc_id, min(b) AS cluster
       |FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |GROUP BY a ORDER BY doc_id""".stripMargin

  /** The deduplicated corpus keep-list — the END PRODUCT of the whole dedup
    * chain: every document outside any near-dup cluster, plus one canonical
    * (min doc_id) per cluster. This is what a training pipeline actually
    * materializes after pair detection + clustering.
    *
    * Scale shape: the non-canonical set is a projection of [[dupClusters]]
    * (small relative to the corpus — only docs IN clusters), anti-joined on
    * doc_id; AQE broadcasts it when small, falls back to a shuffled
    * anti-join when a pathological corpus makes it large. The corpus itself
    * is scanned once and never shuffled beyond the join.
    */
  def dedupedCorpus(docs: DataFrame): DataFrame =
    dedupedCorpusFrom(docs, dupClusters(docs))

  /** [[dedupedCorpus]] from an EXISTING label frame — the artifact path:
    * pass [[loadClusters]] output and the keep-list derives from the saved
    * labels with zero recompute of the LSH+CC chain. The anti-join shape
    * is unchanged: the non-canonical set is small relative to the corpus,
    * AQE broadcasts it when measured small.
    */
  def dedupedCorpusFrom(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("doc_id") =!= col("cluster")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Oracle: same keep-list via the exact recursive closure. */
  def sqlDedupedCorpus: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |drop AS (SELECT doc_id FROM clus WHERE doc_id != cluster)
       |SELECT doc_id, source FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop)
       |ORDER BY doc_id""".stripMargin

  /** Dedup savings report (d20) — the business-value row of the dedup
    * chain: per source, the token volume before and after near-dup
    * removal and the fraction saved. The number a pipeline owner reads
    * to decide whether the chain pays for itself (and WHICH sources are
    * re-crawl-heavy enough to renegotiate); derived entirely from the
    * SAVED label artifact, so at 100 TB it costs one token count plus a
    * dimension-sized join — the chain itself runs zero times here.
    */
  def dedupSavingsFrom(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(Portable.tokens(col("text"))).cast("bigint").as("n"))
    val dropped = clusters.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"), lit(true).as("is_dup"))
    toks.join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("is_dup"), lit(0L)).otherwise(col("n"))).as("kept_tokens"))
      .select(col("source"), col("n_tokens"), col("kept_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(lit(1.0) - col("kept_tokens") / col("n_tokens"), 4))
          .as("savings_frac"))
      .orderBy(col("source"))
  }

  def sqlDedupSavings: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |drop AS (SELECT doc_id FROM clus WHERE doc_id != cluster),
       |tk AS (SELECT doc_id, source, len(${Portable.sqlTokens("text")})::BIGINT AS n
       |  FROM documents)
       |SELECT source, sum(n)::BIGINT AS n_tokens,
       |  sum(CASE WHEN doc_id IN (SELECT doc_id FROM drop) THEN 0 ELSE n END)::BIGINT
       |    AS kept_tokens,
       |  CASE WHEN sum(n) = 0 THEN 0.0
       |    ELSE round(1.0 - sum(CASE WHEN doc_id IN (SELECT doc_id FROM drop)
       |      THEN 0 ELSE n END)::DOUBLE / sum(n), 4) END AS savings_frac
       |FROM tk GROUP BY source ORDER BY source""".stripMargin

  /** The keep-list with a QUALITY-RANKED canonical (p28): instead of d9's
    * min-doc_id representative, each near-dup cluster keeps its
    * highest-[[TextOps.qualityScore]] member (ties broken to the lower
    * doc_id, so the choice is total). This is what a curation pipeline
    * actually wants from dedup — near-dup clusters usually mix a clean
    * original with mangled re-crawls, and "keep the first id we happened
    * to see" throws away quality the cluster already contains.
    *
    * Same artifact-first shape as d9: `clusters` is the SAVED label frame
    * ([[loadClusters]]) — the chain never re-runs. The ranking window
    * partitions the LABEL frame (only docs inside clusters — small
    * relative to the corpus), joined to a narrow (doc_id, score)
    * projection; the corpus itself is touched once by the final anti-join,
    * which AQE broadcasts when the drop side is measured small.
    */
  def bestQualityCorpusFrom(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val q = docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("qs"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("qs").desc, col("doc_id"))
    val drop = clusters.join(q, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup cluster-SIZE histogram (d17) — the first sanity plot of any
    * dedup run: how many clusters of each size exist (near-dup cluster
    * sizes are heavy-tailed on web corpora; a sudden mass at large sizes
    * means boilerplate leaked past the stop list, a flat histogram at 2
    * means the thresholds are too tight to matter). Derived from the
    * SAVED labels: two bounded aggregations (per-cluster count, then
    * per-size count) — the second keys on size, whose cardinality is at
    * most the largest cluster.
    */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame =
    clusters.groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** Oracle: exact recursive closure, same two-level count. */
  def sqlClusterSizeHistogram: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |sz AS (SELECT cluster, count(*)::BIGINT AS sz FROM clus GROUP BY 1)
       |SELECT sz AS cluster_size, count(*)::BIGINT AS n_clusters
       |FROM sz GROUP BY 1 ORDER BY cluster_size""".stripMargin

  /** Cross-split near-dup LEAKAGE report (p31) — the dedup finding that
    * motivated Lee et al. 2021 in the first place: two near-duplicates
    * landing in different dataset splits silently turn evaluation into
    * memorization measurement. Joins the content-hash split assignment
    * ([[TextOps.datasetSplit]]) against the SAVED cluster labels and
    * reports, per near-dup cluster, its size, how many distinct splits
    * its members span, the sorted split list, and the `leaky` verdict —
    * the table a split design is audited with BEFORE training.
    *
    * Scale shape: the corpus is scanned once for the split hash; the
    * label frame (clustered docs only) rides the join — AQE broadcasts it
    * when measured small; the aggregate keys on cluster id (bounded by
    * cluster count). No pair enumeration anywhere.
    */
  def splitLeakage(docs: DataFrame, clusters: DataFrame): DataFrame =
    clusters.join(TextOps.datasetSplit(docs), "doc_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        concat_ws(",", array_sort(collect_set(col("split")))).as("splits"))
      .withColumn("leaky", col("n_splits") > 1)
      .orderBy(col("cluster"))

  /** GROUP-AWARE LEAKAGE-FREE SPLIT (p45) — the FIX for what p31 measures:
    * p2's text-hash split scatters near-duplicate cluster members across
    * train/val/test (train/test contamination); here the split hashes the
    * GROUP key — the doc's dup-cluster label where one exists, its own id
    * otherwise — so every member of a cluster lands in the same split BY
    * CONSTRUCTION. The leak_free column re-derives p31's n_splits==1
    * verdict per group so the claim is checked, not asserted.
    *
    * Scale shape: one left join of docs to the SAVED cluster labels
    * (d8's artifact — the chain runs once), the same mod-100 hash bucket
    * as p2, and one window over the group key for the verdict. No pair
    * join, no closure re-run.
    */
  def groupSplit(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val grp = coalesce(col("cluster"), col("doc_id")).as("grp")
    val bucket = graft.functions.Portable.hash32(col("grp").cast("string")) % 100
    val w = Window.partitionBy(col("grp"))
    docs.select(col("doc_id")).join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), grp)
      .select(col("doc_id"), col("grp"),
        when(bucket < TextOps.SplitTrainPct, "train")
          .when(bucket < TextOps.SplitTrainPct + TextOps.SplitValPct, "val")
          .otherwise("test").as("split"))
      .withColumn("leak_free", size(collect_set(col("split")).over(w)) === 1)
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[groupSplit]]: exact recursive closure for the labels,
    * then the identical group-hash assignment and per-group verdict.
    */
  def sqlGroupSplit: String = {
    val h = graft.functions.Portable.sqlHash32("grp::VARCHAR")
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |g AS (SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS grp
       |  FROM documents d LEFT JOIN clus c USING (doc_id)),
       |sp AS (SELECT doc_id, grp,
       |    CASE WHEN $h % 100 < ${TextOps.SplitTrainPct} THEN 'train'
       |         WHEN $h % 100 < ${TextOps.SplitTrainPct + TextOps.SplitValPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM g)
       |SELECT doc_id, grp, split,
       |  count(DISTINCT split) OVER (PARTITION BY grp) = 1 AS leak_free
       |FROM sp ORDER BY doc_id""".stripMargin
  }

  /** Oracle: exact recursive closure + the same split-hash assignment. */
  def sqlSplitLeakage: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |sp AS (${graft.functions.Portable.sqlNoOrder(TextOps.sqlDatasetSplit)})
       |SELECT c.cluster, count(*)::BIGINT AS n_docs,
       |  count(DISTINCT s.split)::BIGINT AS n_splits,
       |  array_to_string(list_sort(list_distinct(list(s.split))), ',') AS splits,
       |  count(DISTINCT s.split) > 1 AS leaky
       |FROM clus c JOIN sp s USING (doc_id)
       |GROUP BY c.cluster ORDER BY c.cluster""".stripMargin

  /** Oracle: exact recursive closure + the same quality ranking. */
  def sqlBestQualityCorpus: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |q AS (SELECT doc_id, ${TextOps.sqlQualityScoreExpr("text")} AS qs
       |      FROM documents),
       |rk AS (SELECT c.doc_id,
       |    row_number() OVER (PARTITION BY c.cluster ORDER BY q.qs DESC, c.doc_id) AS rn
       |  FROM clus c JOIN q USING (doc_id)),
       |drop AS (SELECT doc_id FROM rk WHERE rn > 1)
       |SELECT doc_id, source FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------- cross-doc exact-substring dedup

  /** Window width (tokens) for cross-doc exact-substring detection. */
  val SubstrN = 10

  /** Cross-document exact-substring coverage (d12) — the hashed-n-gram
    * approximation of Lee et al. 2021's ExactSubstr pass (the suffix-array
    * half of "Deduplicating Training Data Makes Language Models Better"):
    * any [[SubstrN]]-token run whose exact text also occurs in ANOTHER
    * document marks all its token positions as duplicated; per document we
    * report how much of it is covered by such cross-doc runs. A run of L
    * consecutive shared tokens (L >= N) is covered exactly by its L−N+1
    * shared windows, so coverage equals the true shared-span length —
    * the windowed form loses only runs shorter than N, which is the same
    * trade the suffix-array threshold makes. WITHIN-doc repetition is
    * deliberately out of scope here (p8 segment dedup and t8 repetition
    * cover it); a gram repeated only inside one doc is not cross-doc.
    *
    * Scale shape — why windows instead of suffix arrays: the distributed
    * form is two bounded aggregates and a semi-join, all linear in corpus
    * token count. The shuffle/join key is xxhash64 OF the window, not the
    * full SubstrN-token text — the exchange ships 8 bytes per gram
    * instead of ~60+, and a 64-bit collision only over-counts coverage by
    * a window (negligible for a coverage statistic; the oracle keys on
    * the exact text, so the fixtures also PROVE no collision bites).
    * Positional gram hashes shuffle once for the distinct-doc count
    * (partial map-side; a boilerplate gram collapses per-partition before
    * the exchange), the >= 2-docs survivor set semi-joins back (AQE
    * splits hot grams), and span coverage is one DISTINCT on (doc_id,
    * position) — output bounded by corpus tokens, never pair-quadratic.
    * The suffix array's cross-shard merge has no such form.
    */
  def substrSpans(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    val cover = coveredPositions(toks)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_tokens"))
    toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(cover, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 4))
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** The DISTINCT (doc_id, p) token positions covered by a cross-doc
    * repeated [[SubstrN]]-window — the shared core of d12 (coverage
    * statistics) and p22 (the span CUT). `toks` is (doc_id, w) with w the
    * materialized token array. Shuffle key is xxhash64 of the window (see
    * [[substrSpans]]'s scale note).
    */
  private def coveredPositions(toks: DataFrame): DataFrame = {
    val grams = positionalGrams(toks)
    val rep = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("g"))
    grams.join(rep, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (SubstrN - 1))).as("p"))
      .distinct()
  }

  /** Positional hashed windows (doc_id, i, g): every [[SubstrN]]-token
    * window of each doc, keyed by xxhash64 of its text (8 bytes on the
    * exchange — see [[substrSpans]]'s scale note). Shared by the
    * in-corpus pass ([[coveredPositions]]) and the incremental shard
    * pass ([[shardSubstrSpans]]).
    */
  private[graft] def positionalGrams(toks: DataFrame): DataFrame =
    toks.filter(size(col("w")) >= SubstrN)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("w")) - (SubstrN - 1)),
          i => struct(i.as("i"),
            xxhash64(array_join(slice(col("w"), i, lit(SubstrN)), " ")).as("g")))).as("s"))
      .select(col("doc_id"), col("s.i").as("i"), col("s.g").as("g"))

  /** Build and persist the ExactSubstr gram index of a corpus: the
    * DISTINCT hashed [[SubstrN]]-token windows with their document
    * frequency — (g, df), 16 bytes per gram — the artifact
    * [[shardSubstrSpans]] checks a new shard against. Linear in corpus
    * tokens (the suffix array's distributed stand-in, same as the d12
    * trade). Membership consumers project `g`; the df column exists for
    * COUNT-REVERSIBLE DELETION ([[deleteFromSubstrIndex]]) — without it
    * a right-to-be-forgotten request would force a full-corpus rebuild,
    * because a bare gram set cannot know which grams the deleted docs
    * were the sole contributors of.
    */
  def buildAndSaveSubstrIndex(docs: DataFrame, dir: String): Unit =
    graft.sources.ModelStore.saveLarge(
      positionalGrams(
        docs.select(col("doc_id"), Portable.tokens(col("text")).as("w")))
        .select(col("doc_id"), col("g")).distinct()
        .groupBy(col("g")).agg(count(lit(1)).as("df")), dir)

  def loadSubstrIndex(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, dir)

  /** Count-reversible deletion from the saved ExactSubstr gram index
    * (the t35 BM25-delete pattern applied to the d16 artifact): the
    * deleted docs' own distinct grams are computed at DELETE-LIST cost,
    * per-gram doc frequencies decrement, and grams whose df reaches zero
    * leave the index — exactly the index a fresh build over the
    * survivors would produce (df over distinct docs is additive), with
    * the surviving corpus never re-tokenized.
    */
  def deleteFromSubstrIndex(idxGrams: DataFrame, deletedDocs: DataFrame): DataFrame = {
    // loud artifact-version guard: a pre-df index (bare gram set) cannot
    // know which grams the deleted docs were the sole contributors of —
    // the only exact remedy for such an artifact is a survivor rebuild
    require(idxGrams.columns.contains("df"),
      "substr index predates the (g, df) schema — count-reversible " +
        "deletion needs per-gram doc frequencies; rebuild the index with " +
        "buildAndSaveSubstrIndex")
    val dg = positionalGrams(
        deletedDocs.select(col("doc_id"), Portable.tokens(col("text")).as("w")))
      .select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("d"))
    idxGrams.join(dg, Seq("g"), "left")
      .select(col("g"), (col("df") - coalesce(col("d"), lit(0L))).as("df"))
      .filter(col("df") > 0)
  }

  /** Incremental cross-doc exact-substring coverage (d16) — d12's audit
    * for a NEW shard at shard cost: a shard token position is duplicated
    * if its window occurs in the INDEXED corpus (any old doc is by
    * construction another doc) OR in at least two distinct shard docs
    * (d12's rule applied within the shard). The old corpus is never
    * re-tokenized — its entire contribution is the saved distinct-gram
    * set, semi-joined on 8-byte keys. Completes the shard-ingest story
    * for the ExactSubstr family alongside d13 (MinHash), p24 (semantic).
    */
  def shardSubstrSpans(shard: DataFrame, idxGrams: DataFrame): DataFrame = {
    val toks = shard.select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    val grams = positionalGrams(toks)
    val repn = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("g"))
    val covg = idxGrams.select(col("g")).union(repn).distinct()
    val cover = grams.join(covg, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (SubstrN - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_tokens"))
    toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(cover, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 4))
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[shardSubstrSpans]]: the exact-text twin over the same
    * 4/5 split — old contribution via the distinct old-gram set, shard
    * repeats via the ≥2-distinct-docs rule.
    */
  def sqlShardSubstrSpans: String = {
    val n = SubstrN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |gr AS (SELECT doc_id, i, $grams AS g
       |       FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |oldg AS (SELECT DISTINCT g FROM gr WHERE doc_id < (SELECT cnt FROM cn)),
       |grn AS (SELECT * FROM gr WHERE doc_id >= (SELECT cnt FROM cn)),
       |repn AS (SELECT g FROM grn GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |covg AS (SELECT g FROM oldg UNION SELECT g FROM repn),
       |cov AS (SELECT DISTINCT grn.doc_id, p
       |        FROM grn JOIN covg USING (g), LATERAL unnest(range(grn.i, grn.i + $n)) t(p)),
       |per AS (SELECT doc_id, count(*)::BIGINT AS dup_tokens FROM cov GROUP BY doc_id)
       |SELECT toks.doc_id, len(w)::BIGINT AS n_tokens,
       |  coalesce(per.dup_tokens, 0)::BIGINT AS dup_tokens,
       |  CASE WHEN len(w) = 0 THEN 0.0
       |       ELSE round(coalesce(per.dup_tokens, 0) * 1.0 / len(w), 4) END AS dup_frac
       |FROM toks LEFT JOIN per ON per.doc_id = toks.doc_id
       |WHERE toks.doc_id >= (SELECT cnt FROM cn)
       |ORDER BY toks.doc_id""".stripMargin
  }

  /** ExactSubstr span REMOVAL (p22) — the actual intervention of Lee et
    * al. 2021's suffix-array pass, in the windowed form d12 measures:
    * every token position covered by a cross-document repeated
    * [[SubstrN]]-window is CUT, and the document is re-emitted as its
    * surviving tokens (in order). d12 is the audit statistic; this is the
    * corpus a pipeline actually ships — duplicated spans excised, unique
    * prose kept, docs that were pure boilerplate reduced to empty text.
    *
    * Scale shape: the covered-position set is [[coveredPositions]]
    * (linear in corpus tokens, hash-keyed exchange); the cut itself is a
    * per-row array expression over the doc's own positions — the only
    * added shuffle is the collect_set of covered positions per doc_id,
    * bounded by the doc's own length. Nothing pair-quadratic, nothing
    * corpus-sized broadcast.
    */
  def substrCut(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    val covArr = coveredPositions(toks)
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cps0"))
    val cps = coalesce(col("cps0"), array().cast("array<int>"))
    val kept = filter(
      zip_with(col("w"), sequence(lit(1), size(col("w"))),
        (t, p) => when(array_contains(cps, p), lit(null)).otherwise(t)),
      x => x.isNotNull)
    toks.join(covArr, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(cps).cast("long").as("cut_tokens"),
        // guard the empty doc: sequence(1, 0) would count DOWN
        when(size(col("w")) === 0, lit(""))
          .otherwise(array_join(kept, " ")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the exact-text twin of the cut — covered positions from the
    * text-keyed repeated-gram join, surviving tokens re-joined in
    * position order.
    */
  def sqlSubstrCut: String = {
    val n = SubstrN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |gr AS (SELECT doc_id, i, $grams AS g
       |       FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |rep AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT gr.doc_id, p
       |        FROM gr JOIN rep USING (g), LATERAL unnest(range(gr.i, gr.i + $n)) t(p)),
       |pos AS (SELECT doc_id, p FROM toks, LATERAL unnest(range(1, len(w) + 1)) t(p)),
       |keep AS (SELECT pos.doc_id, pos.p FROM pos
       |         LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
       |         WHERE cov.p IS NULL),
       |cut AS (SELECT doc_id, count(*)::BIGINT AS cut_tokens FROM cov GROUP BY doc_id),
       |cln AS (SELECT keep.doc_id, string_agg(w[p], ' ' ORDER BY p) AS clean_text
       |        FROM keep JOIN toks ON toks.doc_id = keep.doc_id GROUP BY keep.doc_id)
       |SELECT toks.doc_id, len(w)::BIGINT AS n_tokens,
       |  coalesce(cut.cut_tokens, 0)::BIGINT AS cut_tokens,
       |  coalesce(cln.clean_text, '') AS clean_text
       |FROM toks LEFT JOIN cut ON cut.doc_id = toks.doc_id
       |LEFT JOIN cln ON cln.doc_id = toks.doc_id
       |ORDER BY toks.doc_id""".stripMargin
  }

  def sqlSubstrSpans: String = {
    val n = SubstrN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |gr AS (SELECT doc_id, i, $grams AS g
       |       FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |rep AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT gr.doc_id, p
       |        FROM gr JOIN rep USING (g), LATERAL unnest(range(gr.i, gr.i + $n)) t(p)),
       |per AS (SELECT doc_id, count(*)::BIGINT AS dup_tokens FROM cov GROUP BY doc_id)
       |SELECT toks.doc_id, len(w)::BIGINT AS n_tokens,
       |  coalesce(per.dup_tokens, 0)::BIGINT AS dup_tokens,
       |  CASE WHEN len(w) = 0 THEN 0.0
       |       ELSE round(coalesce(per.dup_tokens, 0) * 1.0 / len(w), 4) END AS dup_frac
       |FROM toks LEFT JOIN per ON per.doc_id = toks.doc_id
       |ORDER BY toks.doc_id""".stripMargin
  }

  // ------------------------------------------------- dedup analytics

  /** Per-source near-duplicate rate (d10) — the dedup DASHBOARD a curation
    * team reads before deciding which sources to keep: for each source,
    * document count, how many are non-canonical near-dup cluster members
    * (exactly the rows [[dedupedCorpus]] would remove), and the dup
    * fraction. A source with a high rate is boilerplate-heavy or scraped
    * twice; at 100 TB this table is what justifies dropping it.
    *
    * Scale shape: the cluster labels are [[dupClusters]] (bounded-round
    * star contraction over LSH pairs); the rollup joins the SMALL
    * non-canonical set against the corpus on doc_id and aggregates to one
    * row per source.
    */
  def dupRateBySource(docs: DataFrame): DataFrame =
    dupRateBySourceFrom(docs, dupClusters(docs))

  /** [[dupRateBySource]] from an EXISTING label frame (the saved-artifact
    * path, like [[dedupedCorpusFrom]]).
    */
  def dupRateBySourceFrom(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val dups = clusters
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"), lit(1L).as("dup"))
    docs.select(col("doc_id"), col("source"))
      .join(dups, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dups"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        round(col("n_dups") / col("n_docs"), 4).as("dup_frac"))
      .orderBy(col("source"))
  }

  /** Oracle: the exact recursive closure (as in [[sqlDupClusters]]) rolled
    * up per source.
    */
  def sqlDupRateBySource: String =
    s"""WITH RECURSIVE p AS ($sqlLshPairs),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |dup AS (SELECT doc_id FROM clus WHERE doc_id != cluster)
       |SELECT d.source, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_dups,
       |  round(sum(CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END) * 1.0
       |    / count(*), 4) AS dup_frac
       |FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Doc-frequency above which a shingle counts as boilerplate (t18). */
  val BoilerplateDocFreq = 3

  /** Per-document boilerplate fraction (t18) — the repeated-content score
    * of web-corpus pipelines (RefinedWeb-style line/fragment dedup
    * signals): the fraction of a document's distinct word-3-gram shingles
    * that appear in MORE than [[BoilerplateDocFreq]] documents. High
    * fraction = the document is mostly templated text the corpus already
    * has many copies of; it feeds the quality gate alongside t2/t13.
    *
    * Unlike the dedup candidate path, this DELIBERATELY keeps hot
    * shingles — they're the signal here, not skew to cap. The shuffle key
    * is still the shingle, the DF table is one row per distinct shingle,
    * and the per-doc rollup partial-aggregates; AQE splits whatever skew
    * the hottest boilerplate creates.
    */
  def boilerplateFraction(docs: DataFrame): DataFrame = {
    val sh0 = rawShingles(docs)
    val df = sh0.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val per = sh0.join(df, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > BoilerplateDocFreq, 1L).otherwise(0L)).as("hot"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(round(col("hot") / col("n_shingles"), 4), lit(0.0)).as("boilerplate_frac"))
      .orderBy(col("doc_id"))
  }

  def sqlBoilerplateFraction: String = {
    val n = ShingleN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, $grams AS g
       |        FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |dfq AS (SELECT g, count(*)::BIGINT AS df FROM sh0 GROUP BY g),
       |per AS (SELECT sh0.doc_id, count(*)::BIGINT AS n_shingles,
       |    sum(CASE WHEN dfq.df > $BoilerplateDocFreq THEN 1 ELSE 0 END)::BIGINT AS hot
       |  FROM sh0 JOIN dfq USING (g) GROUP BY 1)
       |SELECT d.doc_id, coalesce(per.n_shingles, 0)::BIGINT AS n_shingles,
       |  coalesce(round(per.hot * 1.0 / per.n_shingles, 4), 0.0) AS boilerplate_frac
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // -------------------------------------------- edit-distance (fuzzy dedup)

  /** Prefix length compared and blocking-key length for the fuzzy join. */
  val EditPrefixLen = 60
  val EditBlockLen = 8
  val EditMaxDistance = 20

  /** Blocked fuzzy near-dup pairs: block on the first EditBlockLen chars
    * (equality join — never a cross product), then Levenshtein over the
    * EditPrefixLen-char normalized prefix. Finds exactly the planted
    * near-dup pairs on the fixtures. Blocking is the scale story: candidate
    * volume is bounded by block co-membership, not n^2.
    */
  def editDistancePairs(docs: DataFrame): DataFrame = {
    val p = docs.select(col("doc_id"),
      substring(lower(trim(col("text"))), 1, EditPrefixLen).as("pre"))
    val blocked = p.withColumn("blk", substring(col("pre"), 1, EditBlockLen))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        // banded Levenshtein: O(len*k) and early-exits above the bound,
        // returning -1 — exact for kept rows, so oracle output is identical
        levenshtein(col("a.pre"), col("b.pre"), EditMaxDistance).cast("int").as("d"))
      .filter(col("d") >= 0 && col("d") <= EditMaxDistance)
      .orderBy(col("ia"), col("ib"))
  }

  val sqlEditDistancePairs: String =
    s"""WITH p AS (SELECT doc_id, substr(lower(trim(text)), 1, $EditPrefixLen) AS pre
       |  FROM documents)
       |SELECT a.doc_id AS ia, b.doc_id AS ib,
       |  levenshtein(a.pre, b.pre)::INT AS d
       |FROM p a JOIN p b
       |  ON substr(a.pre, 1, $EditBlockLen) = substr(b.pre, 1, $EditBlockLen)
       |  AND a.doc_id < b.doc_id
       |WHERE levenshtein(a.pre, b.pre) <= $EditMaxDistance
       |ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- SimHash

  /** The 32-bit SimHash as a PER-ROW expression over a MATERIALIZED
    * hashed-token array (`transform(tokens, `[[Portable.hash32]]`)`,
    * projected once by the caller so md5 runs once per token, not once
    * per bit) — the streaming-safe form of [[simhash]]: the batch
    * aggregate weighs each distinct token by its count, and summing ±1
    * per OCCURRENCE is the same quantity, so a pure fold needs no
    * groupBy. Exactly equal to the batch column (unit-pinned), which is
    * what lets the streaming crawl dedup
    * ([[graft.streaming.CurationStream.simhashStreamPairs]]) fingerprint
    * each arriving doc statelessly before the keyed bucket lookup.
    */
  def simhashExpr(hashedTokens: Column): Column = {
    val bitSums = (0 until SimHashBits).map { j =>
      aggregate(hashedTokens, lit(0L), (acc, th) =>
        acc + when(shiftright(th, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
    }
    (0 until SimHashBits).map { j =>
      when(bitSums(j) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _).cast("bigint")
  }

  /** 32-bit SimHash per doc from token-count-weighted 32-bit token hashes. */
  def simhash(docs: DataFrame): DataFrame = {
    val tokCnt = docs
      .select(col("doc_id"), explode(Portable.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", Portable.hash32(col("t")))
    val bitAggs = (0 until SimHashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$j")
    }
    val bits = tokCnt.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until SimHashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    bits.select(col("doc_id"), sim.cast("bigint").as("simhash")).orderBy(col("doc_id"))
  }

  /** Maximum Hamming distance for [[simhashPairs]] (d15): Manku et al.'s
    * classic k=3 over a short fingerprint.
    */
  val HammingMax = 3
  val SimHashBandBits = 8

  /** SimHash near-duplicate pairs (d15) — Manku, Jain & Das Sarma (WWW
    * 2007), "Detecting Near-Duplicates for Web Crawling", the Google
    * crawl-dedup design: two documents are near-dups when their SimHash
    * fingerprints differ in at most [[HammingMax]] bits. Candidate
    * generation is the paper's multi-band pigeonhole: the
    * [[Portable.SimHashBits]]-bit fingerprint splits into
    * bits/[[SimHashBandBits]] = 4 byte-bands, and any pair within
    * Hamming distance 3 MUST agree exactly on at least one band (3
    * differing bits can corrupt at most 3 of the 4 bands) — so the
    * band-bucket equi-join finds EVERY qualifying pair; this operator is
    * exact within the radius, not probabilistic like MinHash banding
    * (unit-pinned against a brute-force scan on the fixtures).
    *
    * Scale shape: one fingerprint row per doc, 4 band rows per doc, one
    * equi-join on (band, byte) — candidate volume bounded by bucket
    * co-membership (256 buckets per band spread the corpus; a skewed
    * bucket is AQE's problem, not a cross product), then a codegen'd
    * bit_count(xor) verify on candidates only. The fingerprint table is
    * ~12 bytes a doc: at 100 TB of text this join runs over gigabytes.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val bands = SimHashBits / SimHashBandBits
    // no checkpoint: the band self-join's sides reuse one exchange at
    // runtime (the mm7 ReusedExchange finding), so the fingerprint pass
    // already runs once
    val sim = simhash(docs)
    val stacked = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * SimHashBandBits)
            .bitwiseAND(lit(255L)).as("bv"))): _*)).as("s"))
      .select(col("doc_id"), col("simhash"), col("s.band").as("band"), col("s.bv").as("bv"))
    val cand = stacked.as("x").join(stacked.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
    cand.select(col("ia"), col("ib"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= HammingMax)
      .orderBy(col("ia"), col("ib"))
  }

  /** DEDUP METHOD AGREEMENT (d24) — the honesty table ACROSS the three
    * lexical near-dup detectors (the s10/d18 "measured, never assumed"
    * rule applied to method choice): for each pair of methods — exact
    * shingle-Jaccard (d2), MinHash-LSH with exact verify (d4), SimHash
    * Hamming (d15) — the pair counts each finds, the pairs both find,
    * and the set-Jaccard of their verdicts. What each row MEANS is
    * asymmetric by construction and worth reading off the table: d4's
    * pairs are a strict subset of d2's (same exact verify, banded
    * candidates — their row IS the measured banding recall, the
    * per-corpus companion to d18's S-curve), while d15 judges a
    * DIFFERENT similarity (fingerprint bit agreement vs shingle-set
    * overlap), so its disagreements with d2 are genuine method
    * disagreements — the pairs a crawl-dedup tier would treat
    * differently depending on which detector it trusts.
    *
    * Scale shape: the three pair tables are the operators' own
    * (df-capped, banded — each bounded as documented on its operator);
    * agreement is three broadcast-sized joins on the pair key and
    * one-row aggregates. Empty-corpus edge: 0/0 agreement defines to
    * 1.0 (no disagreement exists), identically in both engines.
    */
  def methodAgreement(docs: DataFrame): DataFrame = {
    // ONE checkpointed shingle pass shared by the two shingle-set
    // detectors (the p54 shared-scan rule — calling d2 and d4 through
    // their public entries would tokenize and shingle the corpus twice);
    // SimHash reads tokens, not shingles, so it keeps its own pass.
    // The fused index carries both identities: g for d2's verify joins,
    // h for d4's banding.
    val sh = shingleIndex(docs).localCheckpoint(true)
    // each detector's PAIR TABLE is eagerly checkpointed too: every table
    // feeds FOUR aggregate consumers below (two cmp() calls × count +
    // intersection join), and the unioned plan holds no common subtree
    // for them, so the uncheckpointed form re-ran every detector's full
    // join-verify pipeline 4× inside one action. The three detectors are
    // INDEPENDENT given sh, so their checkpoints materialize
    // CONCURRENTLY (Par.run) — single-evaluation economics without
    // serializing three jobs that used to overlap inside one plan.
    val Seq(jac, lsh, sim) = graft.functions.Par.run(
      () => jaccardPairsFrom(sh).select(col("ia"), col("ib"))
        .localCheckpoint(true),
      () => lshPairsFrom(sh).select(col("ia"), col("ib"))
        .localCheckpoint(true),
      () => simhashPairs(docs).select(col("ia"), col("ib"))
        .localCheckpoint(true))
    def cmp(name: String, a: DataFrame, b: DataFrame): DataFrame = {
      val na = a.agg(count(lit(1)).as("n_a"))
      val nb = b.agg(count(lit(1)).as("n_b"))
      val nboth = a.join(b, Seq("ia", "ib")).agg(count(lit(1)).as("n_both"))
      val denom = col("n_a") + col("n_b") - col("n_both")
      na.crossJoin(nb).crossJoin(nboth)
        .select(lit(name).as("methods"), col("n_a"), col("n_b"), col("n_both"),
          when(denom === 0, lit(1.0))
            .otherwise(round(col("n_both").cast("double") / denom, 4) + 0.0)
            .as("set_jaccard"))
    }
    cmp("jaccard_vs_lsh", jac, lsh)
      .unionByName(cmp("jaccard_vs_simhash", jac, sim))
      .unionByName(cmp("lsh_vs_simhash", lsh, sim))
      .orderBy(col("methods"))
  }

  /** Oracle for [[methodAgreement]] (d24): the d2/d4/d15 oracles nested
    * whole as isolated subqueries (the p41 composition rule), then the
    * identical count/intersection/set-Jaccard arithmetic per method
    * pair, with the same 0/0 → 1.0 definition.
    */
  def sqlMethodAgreement: String = {
    import graft.functions.Portable.sqlNoOrder
    def one(name: String, a: String, b: String): String =
      s"""SELECT '$name' AS methods,
         |  (SELECT count(*)::BIGINT FROM $a) AS n_a,
         |  (SELECT count(*)::BIGINT FROM $b) AS n_b,
         |  (SELECT count(*)::BIGINT FROM $a x
         |     JOIN $b y ON x.ia = y.ia AND x.ib = y.ib) AS n_both""".stripMargin
    s"""WITH dj AS (SELECT ia, ib FROM (${sqlNoOrder(sqlJaccardPairs)})),
       |dl AS (SELECT ia, ib FROM (${sqlNoOrder(sqlLshPairs)})),
       |ds AS (SELECT ia, ib FROM (${sqlNoOrder(sqlSimhashPairs)})),
       |raw AS (${one("jaccard_vs_lsh", "dj", "dl")}
       |  UNION ALL ${one("jaccard_vs_simhash", "dj", "ds")}
       |  UNION ALL ${one("lsh_vs_simhash", "dl", "ds")})
       |SELECT methods, n_a, n_b, n_both,
       |  CASE WHEN n_a + n_b - n_both = 0 THEN 1.0
       |       ELSE round(n_both::DOUBLE / (n_a + n_b - n_both), 4) + 0.0
       |  END AS set_jaccard
       |FROM raw ORDER BY methods""".stripMargin
  }

  def sqlSimhashPairs: String = {
    val bands = SimHashBits / SimHashBandBits
    val bandList = (0 until bands).mkString(", ")
    s"""WITH $sqlSimhashCtes,
       |st AS (SELECT doc_id, simhash, b AS band,
       |    (simhash >> (b * $SimHashBandBits)) & 255 AS bv
       |  FROM sim, LATERAL unnest([$bandList]) t(b)),
       |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib,
       |    x.simhash AS sa, y.simhash AS sb
       |  FROM st x JOIN st y ON x.band = y.band AND x.bv = y.bv
       |    AND x.doc_id < y.doc_id)
       |SELECT ia, ib, bit_count(xor(sa, sb))::INT AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $HammingMax
       |ORDER BY 1, 2""".stripMargin
  }

  /** The [[sqlSimhash]] pipeline as reusable CTEs exposing
    * `sim(doc_id, simhash)`.
    */
  private def sqlSimhashCtes: String = {
    val h = Portable.sqlHash32("t")
    val bitSums = (0 until SimHashBits).map { j =>
      s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN cnt ELSE -cnt END) AS b$j"
    }.mkString(",\n  ")
    val simExpr = (0 until SimHashBits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |tc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS cnt
       |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) GROUP BY 1, 2),
       |th AS (SELECT doc_id, $h AS h, cnt FROM tc),
       |bits AS (SELECT doc_id,
       |  $bitSums
       |  FROM th GROUP BY doc_id),
       |sim AS (SELECT doc_id, ($simExpr)::BIGINT AS simhash FROM bits)""".stripMargin
  }

  val sqlSimhash: String = {
    val h = Portable.sqlHash32("t")
    val bitSums = (0 until SimHashBits).map { j =>
      s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN cnt ELSE -cnt END) AS b$j"
    }.mkString(",\n  ")
    val simExpr = (0 until SimHashBits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |tc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS cnt
       |       FROM (SELECT doc_id, unnest(w) AS t FROM toks) GROUP BY 1, 2),
       |th AS (SELECT doc_id, $h AS h, cnt FROM tc),
       |bits AS (SELECT doc_id,
       |  $bitSums
       |  FROM th GROUP BY doc_id)
       |SELECT doc_id, ($simExpr)::BIGINT AS simhash FROM bits ORDER BY doc_id""".stripMargin
  }
}
