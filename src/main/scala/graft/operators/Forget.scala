package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import Portable._

/** COMPOSED RIGHT-TO-BE-FORGOTTEN SWEEP (p53): one delete-list applied
  * across EVERY saved artifact the engine persists, in one report.
  *
  * Deletion has existed per-artifact — BM25 (t35), ANN codes (s13) — but
  * a real erasure request (GDPR art. 17) hits all of them at once, under
  * a legal deadline, and the proof obligation is per artifact: the
  * deleted key can never surface again, and every DERIVED statistic must
  * re-derive from the pruned artifact, not the stale one. This operator
  * is that sweep, composed the way p41 composes the daily ingest: each
  * leg is the artifact's own deletion rule, and the oracle replays every
  * leg from the base tables so the report cannot drift from the pruning
  * it claims.
  *
  * Per-artifact deletion semantics (all shard-cost — the old corpus is
  * never re-read):
  *  - LSH index (d13 artifact): shingle postings, band buckets and
  *    posting counts are PER-DOC rows — anti-filter. The stop list is
  *    doc-free and stays (frozen-index semantics, as d13 declares).
  *  - Cluster labels (d11/d14 artifact): labels are NOT per-doc prunable
  *    — a deleted doc may be the transitive BRIDGE of its cluster, so
  *    surviving members can separate. Labels re-derive by re-running the
  *    closure over the pruned index's own pairs ([[Dedup.indexPairs]]) —
  *    pair-table cost, not corpus cost (shingling/banding not redone).
  *  - ExactSubstr gram index (d16 artifact): count-reversible decrement
  *    ([[Dedup.deleteFromSubstrIndex]]) — the deleted docs' grams
  *    decrement df, zero-df grams leave; equals a fresh survivor build.
  *  - BM25 index (t32 artifact): [[TextOps.deleteFromBm25Index]] — per-doc
  *    tables anti-filter, df/totals re-derive from surviving postings.
  *  - LM counts (t21 artifact): count-reversible decrement
  *    ([[TextOps.deleteFromSurprisalModel]], the t24 merge inverted) —
  *    the deleted docs' token counts subtract, the vocabulary and
  *    totals re-derive; the erased text stops influencing every
  *    downstream surprisal/quality verdict.
  *  - ANN index (s9 artifact): cell assignments and PQ codes anti-filter
  *    (the s13 rule); the two trained quantizers are model, not data.
  *  - Perceptual media fingerprints (mm11 artifact): per-asset rows —
  *    anti-filter, where an asset is deleted when its SOURCE document is
  *    (derived variants of an erased doc are derived personal data and
  *    go with it).
  *  - KMV day sketches (p47 artifact): a sketch is NOT per-key prunable —
  *    dropping the deleted user's hash leaves the k-min of the wrong set
  *    (the k-th smallest survivor was never stored), so AFFECTED DAYS
  *    (days the deleted users appear, found from their own events)
  *    rebuild from surviving raw events; untouched days keep their saved
  *    rows. Equals the from-scratch daily sketch of survivors by the
  *    day-partition argument p47 proves.
  *
  * Report: one row per artifact — rows before, rows after, and a
  * re-derived integrity statistic that only comes out right if the
  * pruning + re-derivation did (distinct surviving keys, re-closed
  * cluster count, re-summed dfs, re-estimated sketch total).
  *
  * The artifact taxonomy this sweep makes explicit — every saved
  * artifact in the engine falls in one of three erasure classes:
  *  1. PER-KEY PRUNABLE (anti-filter): LSH postings/buckets/counts,
  *     BM25 postings/doclens, ANN cells/codes, media fingerprints.
  *  2. COUNT-REVERSIBLE (decrement, equals the survivor build): substr
  *     gram dfs, BM25 df/totals, LM counts/totals, KMV via bounded
  *     affected-day rebuild, cluster labels via pair-graph re-closure.
  *  3. MODEL-EXEMPT (trained aggregates where a single document's
  *     contribution is not recoverable and retraining is the only exact
  *     remedy): BPE/unigram tokenizer vocabularies, k-means centroids,
  *     PQ codebooks, whitening matrices — the quantizer halves of the
  *     indexes above, declared model-not-data by s13's rule; a real
  *     deployment schedules their retrain, it does not block serving
  *     on it.
  *
  * Scale shape: every leg is an aggregate over an artifact table (never
  * the corpus) except the two declared rebuild legs, which touch the
  * delete-list's own rows (substr decrement, affected-day events). The
  * label re-closure runs over the pair table — the d8 star-contraction,
  * O(log n) rounds on edges only.
  */
object Forget {

  /** THE SAVED-ARTIFACT CATALOG: one entry per persisted artifact the
    * engine maintains, with its erasure class (the taxonomy in the
    * object doc — "per-key-prunable" anti-filters, "count-reversible"
    * decrements/re-derives). This is the single source of truth BOTH
    * lifecycle reports enumerate: [[rtbfSweep]] (p53) emits one leg per
    * entry and [[artifactManifest]] (p54) one health row per entry, so
    * neither can silently drop an artifact the other covers (ForgetSpec
    * pins the three-way name equality).
    */
  val ArtifactCatalog: Seq[(String, String)] = Seq(
    "ann_cells" -> "per-key-prunable",
    "bm25_postings" -> "per-key-prunable",
    "dup_labels" -> "count-reversible",
    "kmv_days" -> "count-reversible",
    "lm_counts" -> "count-reversible",
    "lsh_buckets" -> "per-key-prunable",
    "lsh_shingles" -> "per-key-prunable",
    "media_fingerprints" -> "per-key-prunable",
    "pos_postings" -> "per-key-prunable",
    "substr_grams" -> "count-reversible")

  /** The house delete-list predicates, one per key space (the t35/s13
    * "% 7 = 3" convention): documents, vectors and users whose key is
    * ≡ 3 (mod 7) have requested erasure.
    */
  val DocDeleted: Column = col("doc_id") % 7 === 3
  val VecDeleted: Column = col("vec_id") % 7 === 3
  val UserDeleted: Column = col("user_id") % 7 === 3

  /** Anti-filter the per-doc tables of a saved LSH index; the stop list
    * is doc-free and the df-capped signatures stay FROZEN (d13's declared
    * index semantics — deletion does not re-open the df cap).
    */
  def pruneLshIndex(idx: Dedup.LshIndex): Dedup.LshIndex = Dedup.LshIndex(
    idx.shingles.filter(!DocDeleted),
    idx.buckets.filter(!DocDeleted),
    idx.stop,
    idx.counts.filter(!DocDeleted))

  /** Anti-filter the per-vector tables of a saved IVF-PQ index (the s13
    * rule, centralized): a deleted vector can never be a candidate and
    * never rides a posting list; the quantizers are untouched.
    */
  def pruneAnnIndex(idx: Similarity.IvfPqIndex): Similarity.IvfPqIndex =
    Similarity.IvfPqIndex(idx.coarse, idx.cells.filter(!VecDeleted),
      idx.pqCent, idx.codes.filter(!VecDeleted))

  /** [[pruneAnnIndex]] against a TOMBSTONE TABLE (vec_id rows) — the
    * online-serving form: per-vector tables anti-join the list (AQE
    * broadcasts it when small); a tombstoned vector can never be an ADC
    * candidate, so the exact rerank (which reads the raw corpus only
    * for candidates) cannot resurface it either.
    */
  def pruneAnnIndexList(idx: Similarity.IvfPqIndex,
                        deletedIds: DataFrame): Similarity.IvfPqIndex = {
    val ids = deletedIds.select(col("vec_id")).distinct()
    Similarity.IvfPqIndex(idx.coarse,
      idx.cells.join(ids, Seq("vec_id"), "left_anti"),
      idx.pqCent,
      idx.codes.join(ids, Seq("vec_id"), "left_anti"))
  }

  /** Anti-filter the saved perceptual fingerprint table (mm11
    * artifact): an asset dies with its source document — variant asset
    * ids (source + [[Multimodal.VariantOffset]]) resolve to the source
    * before the delete predicate applies.
    */
  def pruneMediaFingerprints(fp: DataFrame): DataFrame = {
    val src = when(col("asset_id") >= Multimodal.VariantOffset,
      col("asset_id") - Multimodal.VariantOffset).otherwise(col("asset_id"))
    fp.filter(!(src % 7 === 3))
  }

  /** KMV day sketches after erasure: affected days (found from the
    * deleted users' own events — delete-list cost) rebuild from
    * surviving events; untouched days keep their saved rows verbatim.
    */
  def pruneKmvSketch(saved: DataFrame, events: DataFrame): DataFrame = {
    val ev = events.filter(col("ts").isNotNull)
      .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
    val affected = ev.filter(UserDeleted).select(col("day")).distinct()
    val rebuilt = Sketches.dailyKmvSketchRows(
      ev.filter(!UserDeleted).join(affected, Seq("day"), "left_semi"))
    saved.join(affected, Seq("day"), "left_anti").unionByName(rebuilt)
  }

  /** The composed sweep report — see object doc. Every `rows_before`
    * counts the loaded artifact; every `rows_after` and `stat` derive
    * from the pruned/re-derived one.
    */
  def rtbfSweep(docs: DataFrame, events: DataFrame, idx: Dedup.LshIndex,
                labels: DataFrame, substrIdx: DataFrame,
                bm25: TextOps.Bm25Index, ann: Similarity.IvfPqIndex,
                kmvSaved: DataFrame, mediaFp: DataFrame,
                lm: TextOps.SurprisalModel,
                posIdx: TextOps.PositionalIndex): DataFrame = {
    def leg(name: String, before: DataFrame, afterAgg: DataFrame): DataFrame =
      before.agg(count(lit(1)).as("rows_before"))
        .crossJoin(afterAgg)
        .select(lit(name).as("artifact"), col("rows_before"),
          col("rows_after"), col("stat"))
    // For the PER-KEY-PRUNABLE artifacts the "after" table is a plain
    // filter of the "before" table, so before-count, after-count and the
    // survivor stat are one conditional aggregate over a SINGLE scan of
    // the saved artifact — half the artifact reads of the two-frame form,
    // with identical values (count/sum/countDistinct all ignore the NULL
    // the `when` leaves on pruned rows).
    def filterLeg(name: String, tbl: DataFrame, keep: Column,
                  statAgg: Column): DataFrame =
      tbl.agg(count(lit(1)).as("rows_before"),
          // coalesce: count(*) of an empty pruned frame was 0, never NULL
          coalesce(sum(when(keep, 1L).otherwise(0L)), lit(0L)).as("rows_after"),
          statAgg.as("stat"))
        .select(lit(name).as("artifact"), col("rows_before"),
          col("rows_after"), col("stat"))
    val pruned = pruneLshIndex(idx)
    // the label re-cluster (an action loop) and the KMV rebuild (day×K
    // rows with an events-scan lineage, read twice: row count + estimate
    // sum) are independent — materialize both concurrently (Par.run)
    val Seq(newLabels, newSketch) = graft.functions.Par.run(
      () => Dedup.connectedComponents(Dedup.indexPairs(pruned)),
      () => pruneKmvSketch(kmvSaved, events).localCheckpoint(true))
    val prunedSubstr = Dedup.deleteFromSubstrIndex(
      substrIdx, docs.filter(DocDeleted))
    // (the bm25/ann/media prunes are plain per-key filters — their legs
    // run as single-scan conditional aggregates below instead of
    // re-reading the artifact for a separate pruned frame)
    // band recompute stays unexecuted here (lazy) — the leg reads counts
    val prunedLm = TextOps.deleteFromSurprisalModel(lm,
      docs.filter(DocDeleted), docs.filter(!DocDeleted))
    val est = newSketch
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(expr(Sketches.estExpr("n_kept", "hk")).as("est"))
    // legs keyed by artifact name; the CATALOG enumerates the report, so
    // a catalog entry without a leg (or vice versa) fails loudly instead
    // of silently dropping an artifact from the sweep
    val keepDoc = !DocDeleted
    val keepVec = !VecDeleted
    val fpSrc = when(col("asset_id") >= Multimodal.VariantOffset,
      col("asset_id") - Multimodal.VariantOffset).otherwise(col("asset_id"))
    val legs: Map[String, DataFrame] = Map(
      "ann_cells" -> filterLeg("ann_cells", ann.cells, keepVec,
        sum(when(keepVec, col("vec_id")))),
      "bm25_postings" -> filterLeg("bm25_postings", bm25.postings, keepDoc,
        countDistinct(when(keepDoc, col("t")))),
      "dup_labels" -> leg("dup_labels", labels,
        newLabels.agg(count(lit(1)).as("rows_after"),
          countDistinct(col("lab")).as("stat"))),
      "kmv_days" -> leg("kmv_days", kmvSaved,
        newSketch.agg(count(lit(1)).as("rows_after"))
          .crossJoin(est.agg(sum(col("est")).as("stat")))),
      "lm_counts" -> leg("lm_counts", lm.counts,
        prunedLm.counts.agg(count(lit(1)).as("rows_after"),
          sum(col("c")).as("stat"))),
      "lsh_buckets" -> filterLeg("lsh_buckets", idx.buckets, keepDoc,
        countDistinct(when(keepDoc, concat_ws(":", col("band"), col("bh"))))),
      "lsh_shingles" -> filterLeg("lsh_shingles", idx.shingles, keepDoc,
        countDistinct(when(keepDoc, col("h")))),
      "media_fingerprints" -> filterLeg("media_fingerprints", mediaFp,
        !(fpSrc % 7 === 3), countDistinct(when(!(fpSrc % 7 === 3), col("ahash")))),
      "pos_postings" -> filterLeg("pos_postings", posIdx.postings, keepDoc,
        countDistinct(when(keepDoc, col("t")))),
      "substr_grams" -> leg("substr_grams", substrIdx,
        prunedSubstr.agg(count(lit(1)).as("rows_after"),
          sum(col("df")).as("stat"))))
    require(legs.keySet == ArtifactCatalog.map(_._1).toSet,
      s"sweep legs must cover the artifact catalog exactly: " +
        s"missing=${ArtifactCatalog.map(_._1).toSet -- legs.keySet} " +
        s"extra=${legs.keySet -- ArtifactCatalog.map(_._1).toSet}")
    ArtifactCatalog.map { case (name, _) => legs(name) }
      .reduce(_.unionByName(_))
      .orderBy(col("artifact"))
  }

  /** Oracle for [[rtbfSweep]]: every artifact replayed from the base
    * tables (the d13/t31/p47 build CTEs), pruned by the same predicates,
    * with the label leg's closure as a recursive CTE over the pruned
    * pair graph — the p41 rule: the report's oracle nests the component
    * semantics verbatim, so no leg can drift. That includes the SAVED
    * models' truncations: the lm leg's `lmc` CTE rebuilds the
    * vocabulary under the same top-[[TextOps.LmVocabTopK]]-by-(count,
    * term) cap [[TextOps.trainAndSaveSurprisalModel]] persists, so the
    * gate keeps holding when a corpus's vocabulary outgrows the cap
    * (the decrement leg reads the saved, capped table — the oracle must
    * decrement the same frozen vocabulary, not an uncapped rebuild).
    */
  def sqlRtbfSweep: String = {
    val h = Portable.sqlHash32("g")
    val mins = (0 until MinHashPerms)
      .map(i => s"min(${Portable.sqlMinHashPerm("h", i)}) AS h$i").mkString(", ")
    val arms = (0 until MinHashBands).map { b =>
      val cols = (0 until MinHashRows).map(r => s"h${b * MinHashRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bh FROM sig"
    }.mkString(" UNION ALL ")
    val n10 = Dedup.SubstrN
    val grams10 = (0 until n10).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    val uh = Portable.sqlHash32("user_id::VARCHAR")
    val vo = Multimodal.VariantOffset
    val srcDoc =
      s"(CASE WHEN doc_id >= $vo THEN doc_id - $vo ELSE doc_id END)"
    s"""WITH RECURSIVE ${Multimodal.sqlImageHashCtes}
       |${Dedup.sqlShingleCtes},
       |hashed AS MATERIALIZED (SELECT doc_id, $h AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
       |stacked AS MATERIALIZED ($arms),
       |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
       |  FROM stacked x JOIN stacked y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |hcnt AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY 1),
       |hint AS (SELECT c.ia, c.ib, count(*) AS inter
       |  FROM cand c JOIN hashed a ON a.doc_id = c.ia
       |  JOIN hashed b ON b.doc_id = c.ib AND b.h = a.h
       |  GROUP BY 1, 2),
       |fpairs AS MATERIALIZED (SELECT c.ia, c.ib
       |  FROM cand c JOIN hint p ON p.ia = c.ia AND p.ib = c.ib
       |  JOIN hcnt ca ON ca.doc_id = c.ia JOIN hcnt cb ON cb.doc_id = c.ib
       |  WHERE round(p.inter * 1.0 / (ca.n + cb.n - p.inter), 4)
       |    >= ${Dedup.JaccardThreshold}),
       |spr AS (SELECT ia, ib FROM fpairs WHERE ia % 7 != 3 AND ib % 7 != 3),
       |e AS (SELECT ia AS a, ib AS b FROM spr UNION SELECT ib, ia FROM spr),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |comp AS (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |stoks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sg AS MATERIALIZED (SELECT DISTINCT doc_id, $grams10 AS g
       |  FROM stoks, LATERAL unnest(range(1, len(w) - ${n10 - 2})) t(i)),
       |btoks AS (SELECT doc_id, unnest(${Portable.sqlTokens("text")}) AS t
       |  FROM documents),
       |bp AS MATERIALIZED (SELECT DISTINCT t, doc_id FROM btoks),
       |lmc AS MATERIALIZED (
       |  SELECT t, c FROM (SELECT t, count(*)::BIGINT AS c FROM btoks GROUP BY t)
       |  QUALIFY row_number() OVER (ORDER BY c DESC, t) <= ${TextOps.LmVocabTopK}),
       |lmdel AS (SELECT t, count(*)::BIGINT AS d FROM btoks
       |  WHERE doc_id % 7 = 3 GROUP BY t),
       |lmafter AS (SELECT l.t, l.c - coalesce(d.d, 0) AS c
       |  FROM lmc l LEFT JOIN lmdel d USING (t)
       |  WHERE l.c - coalesce(d.d, 0) > 0),
       |kall AS (SELECT DISTINCT strftime(ts::DATE, '%Y-%m-%d') AS day, $uh AS h
       |  FROM events WHERE ts IS NOT NULL),
       |ksur AS (SELECT DISTINCT strftime(ts::DATE, '%Y-%m-%d') AS day, $uh AS h
       |  FROM events WHERE ts IS NOT NULL AND user_id % 7 != 3),
       |kb AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r
       |  FROM kall QUALIFY r <= ${Sketches.KmvK}),
       |ka AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r
       |  FROM ksur QUALIFY r <= ${Sketches.KmvK}),
       |kg AS (SELECT day, count(*)::BIGINT AS n_kept, max(h) AS hk FROM ka
       |  GROUP BY day)
       |SELECT * FROM (
       |SELECT 'ann_cells' AS artifact,
       |  (SELECT count(*) FROM embeddings)::BIGINT AS rows_before,
       |  (SELECT count(*) FROM embeddings WHERE vec_id % 7 != 3)::BIGINT AS rows_after,
       |  (SELECT sum(vec_id) FROM embeddings WHERE vec_id % 7 != 3)::BIGINT AS stat
       |UNION ALL
       |SELECT 'bm25_postings',
       |  (SELECT count(*) FROM bp)::BIGINT,
       |  (SELECT count(*) FROM bp WHERE doc_id % 7 != 3)::BIGINT,
       |  (SELECT count(DISTINCT t) FROM bp WHERE doc_id % 7 != 3)::BIGINT
       |UNION ALL
       |SELECT 'dup_labels',
       |  (SELECT count(DISTINCT x) FROM
       |    (SELECT ia AS x FROM fpairs UNION ALL SELECT ib FROM fpairs))::BIGINT,
       |  (SELECT count(*) FROM comp)::BIGINT,
       |  (SELECT count(DISTINCT cluster) FROM comp)::BIGINT
       |UNION ALL
       |SELECT 'kmv_days',
       |  (SELECT count(*) FROM kb)::BIGINT,
       |  (SELECT count(*) FROM ka)::BIGINT,
       |  (SELECT sum(${Sketches.sqlEstExpr("n_kept", "hk")}) FROM kg)::BIGINT
       |UNION ALL
       |SELECT 'lm_counts',
       |  (SELECT count(*) FROM lmc)::BIGINT,
       |  (SELECT count(*) FROM lmafter)::BIGINT,
       |  (SELECT sum(c) FROM lmafter)::BIGINT
       |UNION ALL
       |SELECT 'lsh_buckets',
       |  (SELECT count(*) FROM stacked)::BIGINT,
       |  (SELECT count(*) FROM stacked WHERE doc_id % 7 != 3)::BIGINT,
       |  (SELECT count(DISTINCT band::VARCHAR || ':' || bh) FROM stacked
       |    WHERE doc_id % 7 != 3)::BIGINT
       |UNION ALL
       |SELECT 'lsh_shingles',
       |  (SELECT count(*) FROM hashed)::BIGINT,
       |  (SELECT count(*) FROM hashed WHERE doc_id % 7 != 3)::BIGINT,
       |  (SELECT count(DISTINCT h) FROM hashed WHERE doc_id % 7 != 3)::BIGINT
       |UNION ALL
       |SELECT 'media_fingerprints',
       |  (SELECT count(*) FROM hs)::BIGINT,
       |  (SELECT count(*) FROM hs WHERE $srcDoc % 7 != 3)::BIGINT,
       |  (SELECT count(DISTINCT h) FROM hs WHERE $srcDoc % 7 != 3)::BIGINT
       |UNION ALL
       |SELECT 'pos_postings',
       |  (SELECT count(*) FROM btoks)::BIGINT,
       |  (SELECT count(*) FROM btoks WHERE doc_id % 7 != 3)::BIGINT,
       |  (SELECT count(DISTINCT t) FROM btoks WHERE doc_id % 7 != 3)::BIGINT
       |UNION ALL
       |SELECT 'substr_grams',
       |  (SELECT count(DISTINCT g) FROM sg)::BIGINT,
       |  (SELECT count(DISTINCT g) FROM sg WHERE doc_id % 7 != 3)::BIGINT,
       |  (SELECT count(*) FROM sg WHERE doc_id % 7 != 3)::BIGINT
       |) ORDER BY artifact""".stripMargin
  }

  /** ARTIFACT MANIFEST / HEALTH TABLE (p54) — the table a nightly job
    * (p41/p46) and an erasure sweep (p53) read FIRST: one row per
    * [[ArtifactCatalog]] entry with the artifact's erasure class, its
    * size, and a STALENESS verdict generalizing the p23/s15 drift idea
    * to every artifact — "does the saved artifact still cover today's
    * corpus?":
    *  - `n_rows`: the artifact table's row count (what storage holds).
    *  - `covered_keys`: the subject keys the SAVED artifact covers —
    *    docs for the per-doc indexes (BM25 via its doclen table, LSH
    *    via distinct postings/bucket docs, labels via labeled docs),
    *    vectors for ANN cells, days for the KMV sketch, assets for the
    *    fingerprints, distinct grams for the substring index, and TOKEN
    *    OCCURRENCES for the LM (its persisted totals' N — the
    *    full-build-corpus statistic, cap-independent).
    *  - `fresh_keys`: the keys a fresh build TODAY would cover — the
    *    corpus row counts where enumeration is metadata (docs, vectors,
    *    event days, assets), one corpus pass where the key set is
    *    derived (shingled docs, distinct grams, total tokens). Key-set
    *    replay only; never a full artifact rebuild.
    *  - `stale = covered_keys < fresh_keys`: the artifact no longer
    *    covers the corpus — re-train/merge before serving from it (the
    *    p41 ingest or t34/t24-style merge is the remedy; p23/s15 are the
    *    finer-grained drill-downs for the LM and ANN rows).
    *
    * The expected round-trip: artifacts built on yesterday's 4/5 slice
    * (`bm25Old`, `annInc`, `lmOld` — the p23/s15/t34 incremental
    * fixtures) report stale against today's full corpus; the
    * full-corpus artifacts (LSH, labels, substr, KMV, fingerprints)
    * report fresh. The oracle replays every count from the base tables,
    * so a manifest row can only match if the saved artifact really
    * holds what a build of its declared slice produces — the health
    * check checks itself.
    *
    * Scale shape: every `n_rows`/`covered_keys` is ONE aggregate over
    * its artifact table (the regular legs compute both in a single
    * scan); every doc-keyed `fresh_keys` probe is a conditional
    * aggregate over ONE shared tokenizing corpus scan, so the report's
    * corpus cost stays constant as the catalog grows — only the
    * gram-distinct probe (a corpus-wide DISTINCT) and the pair probe
    * (artifact-scaled) keep their own passes. Nothing is collected,
    * nothing joins corpus-to-corpus.
    */
  def artifactManifest(docs: DataFrame, events: DataFrame, emb: DataFrame,
                       idx: Dedup.LshIndex, labels: DataFrame,
                       substrIdx: DataFrame, bm25Old: TextOps.Bm25Index,
                       annInc: Similarity.IvfPqIndex, kmvSaved: DataFrame,
                       mediaFp: DataFrame,
                       lmOld: TextOps.SurprisalModel,
                       posOld: TextOps.PositionalIndex): DataFrame = {
    val cls = ArtifactCatalog.toMap
    def leg(name: String, stats: DataFrame, fresh: DataFrame): DataFrame =
      stats.crossJoin(fresh)
        .select(lit(name).as("artifact"),
          lit(cls(name)).as("erasure_class"),
          col("n_rows"), col("covered_keys"), col("fresh_keys"),
          (col("covered_keys") < col("fresh_keys")).as("stale"))
    // the regular legs' n_rows + covered_keys come from the SAME
    // artifact table, so one aggregate serves both — half the artifact
    // scans of the two-frame form this replaces
    def stats(df: DataFrame, c: String) =
      df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(c)).as("covered_keys"))
    // THE SHARED CORPUS SCAN: every doc-keyed fresh_keys probe is a
    // conditional aggregate over one tokenizing pass — doc count, token
    // total, non-empty-tokenizing docs (what a fresh positional build
    // would index), asset count (every doc + the %10 variant the mm
    // fixture plants), and shingle-producing docs (rawShingles emits
    // rows exactly for docs with >= ShingleN tokens, so the count IS
    // countDistinct(doc_id) over the shingle stream without exploding
    // it). Previously five separate corpus scans, three of them
    // tokenizing — the "catalog size x corpus passes" growth the
    // round-15 bench flagged on p54. The gram-distinct probe keeps its
    // own pass (a corpus-wide DISTINCT cannot fold into a row-level
    // aggregate); everything else here reads artifacts or events.
    val docProbe = docs
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("w"))), lit(0L)).cast("bigint").as("n_tokens"),
        count(when(size(col("w")) > 0, lit(1))).as("n_token_docs"),
        (count(lit(1)) +
          count(when(col("doc_id") % 10 === 0, lit(1)))).as("n_assets"),
        count(when(size(col("w")) >= Portable.ShingleN, lit(1)))
          .as("n_shingle_docs"))
      .localCheckpoint(true)
    def freshFrom(c: String) = docProbe.select(col(c).as("fresh_keys"))
    val pairDocs = Dedup.indexPairs(idx)
      .select(explode(array(col("ia"), col("ib"))).as("d"))
      .agg(countDistinct(col("d")).as("fresh_keys"))
    val gramCount = Dedup.positionalGrams(
        docs.select(col("doc_id"), Portable.tokens(col("text")).as("w")))
      .agg(countDistinct(col("g")).as("fresh_keys"))
    val dayCount = events.filter(col("ts").isNotNull)
      .agg(countDistinct(to_date(col("ts"))).as("fresh_keys"))
    leg("ann_cells", stats(annInc.cells, "vec_id"),
        emb.agg(count(lit(1)).as("fresh_keys")))
      .unionByName(leg("bm25_postings",
        bm25Old.postings.agg(count(lit(1)).as("n_rows"))
          .crossJoin(bm25Old.doclen
            .agg(countDistinct(col("doc_id")).as("covered_keys"))),
        freshFrom("n_docs")))
      .unionByName(leg("dup_labels", stats(labels, "doc_id"), pairDocs))
      .unionByName(leg("kmv_days", stats(kmvSaved, "day"), dayCount))
      .unionByName(leg("lm_counts",
        lmOld.counts.agg(count(lit(1)).as("n_rows"))
          .crossJoin(lmOld.totals.select(col("n").as("covered_keys"))),
        freshFrom("n_tokens")))
      .unionByName(leg("lsh_buckets", stats(idx.buckets, "doc_id"),
        freshFrom("n_shingle_docs")))
      .unionByName(leg("lsh_shingles", stats(idx.shingles, "doc_id"),
        freshFrom("n_shingle_docs")))
      .unionByName(leg("media_fingerprints", stats(mediaFp, "asset_id"),
        freshFrom("n_assets")))
      .unionByName(leg("pos_postings", stats(posOld.postings, "doc_id"),
        // a zero-token doc has no occurrences, so fresh coverage counts
        // docs that tokenize non-empty (what a fresh build would index)
        freshFrom("n_token_docs")))
      .unionByName(leg("substr_grams", stats(substrIdx, "g"), gramCount))
      .orderBy(col("artifact"))
  }

  /** Oracle for [[artifactManifest]]: every count replayed from the base
    * tables — the saved artifacts' declared build slices (full corpus
    * for LSH/labels/substr/KMV/fingerprints; the doc_id/vec_id < 4N/5
    * cut for BM25/LM/ANN, the p23/s15/t34 fixture convention), the LM
    * vocabulary under its persisted top-K cap, the LSH replay through
    * the same shingle/MinHash/verify CTEs as p53's oracle. Stale flags
    * are re-derived from the replayed counts, so the gate fails if the
    * manifest's coverage arithmetic OR the underlying artifacts drift.
    */
  def sqlArtifactManifest: String = {
    val h = Portable.sqlHash32("g")
    val mins = (0 until MinHashPerms)
      .map(i => s"min(${Portable.sqlMinHashPerm("h", i)}) AS h$i").mkString(", ")
    val arms = (0 until MinHashBands).map { b =>
      val cols = (0 until MinHashRows).map(r => s"h${b * MinHashRows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bh FROM sig"
    }.mkString(" UNION ALL ")
    val n10 = Dedup.SubstrN
    val grams10 = (0 until n10).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    val classCase = ArtifactCatalog
      .map { case (n, c) => s"WHEN '$n' THEN '$c'" }.mkString(" ")
    s"""WITH ${Dedup.sqlShingleCtes},
       |cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |en AS (SELECT (count(*) * 4) // 5 AS cnt FROM embeddings),
       |hashed AS MATERIALIZED (SELECT doc_id, $h AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
       |stacked AS MATERIALIZED ($arms),
       |cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
       |  FROM stacked x JOIN stacked y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |hcnt AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY 1),
       |hint AS (SELECT c.ia, c.ib, count(*) AS inter
       |  FROM cand c JOIN hashed a ON a.doc_id = c.ia
       |  JOIN hashed b ON b.doc_id = c.ib AND b.h = a.h
       |  GROUP BY 1, 2),
       |fpairs AS MATERIALIZED (SELECT c.ia, c.ib
       |  FROM cand c JOIN hint p ON p.ia = c.ia AND p.ib = c.ib
       |  JOIN hcnt ca ON ca.doc_id = c.ia JOIN hcnt cb ON cb.doc_id = c.ib
       |  WHERE round(p.inter * 1.0 / (ca.n + cb.n - p.inter), 4)
       |    >= ${Dedup.JaccardThreshold}),
       |stoks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sg AS MATERIALIZED (SELECT DISTINCT doc_id, $grams10 AS g
       |  FROM stoks, LATERAL unnest(range(1, len(w) - ${n10 - 2})) t(i)),
       |btoks AS (SELECT doc_id, unnest(${Portable.sqlTokens("text")}) AS t
       |  FROM documents),
       |bp AS MATERIALIZED (SELECT DISTINCT t, doc_id FROM btoks),
       |olmc AS (SELECT t, c FROM (
       |    SELECT t, count(*)::BIGINT AS c FROM btoks
       |    WHERE doc_id < (SELECT cnt FROM cn) GROUP BY t)
       |  QUALIFY row_number() OVER (ORDER BY c DESC, t) <= ${TextOps.LmVocabTopK}),
       |kall AS (SELECT DISTINCT strftime(ts::DATE, '%Y-%m-%d') AS day,
       |    ${Portable.sqlHash32("user_id::VARCHAR")} AS kh
       |  FROM events WHERE ts IS NOT NULL),
       |kb AS (SELECT day, kh, row_number() OVER (PARTITION BY day ORDER BY kh) AS r
       |  FROM kall QUALIFY r <= ${Sketches.KmvK})
       |SELECT artifact,
       |  CASE artifact $classCase END AS erasure_class,
       |  n_rows, covered_keys, fresh_keys,
       |  covered_keys < fresh_keys AS stale
       |FROM (
       |SELECT 'ann_cells' AS artifact,
       |  (SELECT count(*) FROM embeddings
       |    WHERE vec_id < (SELECT cnt FROM en))::BIGINT AS n_rows,
       |  (SELECT count(DISTINCT vec_id) FROM embeddings
       |    WHERE vec_id < (SELECT cnt FROM en))::BIGINT AS covered_keys,
       |  (SELECT count(*) FROM embeddings)::BIGINT AS fresh_keys
       |UNION ALL
       |SELECT 'bm25_postings',
       |  (SELECT count(*) FROM bp WHERE doc_id < (SELECT cnt FROM cn))::BIGINT,
       |  (SELECT count(*) FROM documents
       |    WHERE doc_id < (SELECT cnt FROM cn))::BIGINT,
       |  (SELECT count(*) FROM documents)::BIGINT
       |UNION ALL
       |SELECT 'dup_labels',
       |  (SELECT count(DISTINCT x) FROM
       |    (SELECT ia AS x FROM fpairs UNION ALL SELECT ib FROM fpairs))::BIGINT,
       |  (SELECT count(DISTINCT x) FROM
       |    (SELECT ia AS x FROM fpairs UNION ALL SELECT ib FROM fpairs))::BIGINT,
       |  (SELECT count(DISTINCT x) FROM
       |    (SELECT ia AS x FROM fpairs UNION ALL SELECT ib FROM fpairs))::BIGINT
       |UNION ALL
       |SELECT 'kmv_days',
       |  (SELECT count(*) FROM kb)::BIGINT,
       |  (SELECT count(DISTINCT day) FROM kall)::BIGINT,
       |  (SELECT count(DISTINCT day) FROM kall)::BIGINT
       |UNION ALL
       |SELECT 'lm_counts',
       |  (SELECT count(*) FROM olmc)::BIGINT,
       |  (SELECT count(*) FROM btoks WHERE doc_id < (SELECT cnt FROM cn))::BIGINT,
       |  (SELECT count(*) FROM btoks)::BIGINT
       |UNION ALL
       |SELECT 'lsh_buckets',
       |  (SELECT count(*) FROM stacked)::BIGINT,
       |  (SELECT count(DISTINCT doc_id) FROM stacked)::BIGINT,
       |  (SELECT count(DISTINCT doc_id) FROM hashed)::BIGINT
       |UNION ALL
       |SELECT 'lsh_shingles',
       |  (SELECT count(*) FROM hashed)::BIGINT,
       |  (SELECT count(DISTINCT doc_id) FROM hashed)::BIGINT,
       |  (SELECT count(DISTINCT doc_id) FROM hashed)::BIGINT
       |UNION ALL
       |SELECT 'media_fingerprints',
       |  (SELECT count(*) + count(*) FILTER (WHERE doc_id % 10 = 0)
       |    FROM documents)::BIGINT,
       |  (SELECT count(*) + count(*) FILTER (WHERE doc_id % 10 = 0)
       |    FROM documents)::BIGINT,
       |  (SELECT count(*) + count(*) FILTER (WHERE doc_id % 10 = 0)
       |    FROM documents)::BIGINT
       |UNION ALL
       |SELECT 'pos_postings',
       |  (SELECT count(*) FROM btoks WHERE doc_id < (SELECT cnt FROM cn))::BIGINT,
       |  (SELECT count(DISTINCT doc_id) FROM btoks
       |    WHERE doc_id < (SELECT cnt FROM cn))::BIGINT,
       |  (SELECT count(DISTINCT doc_id) FROM btoks)::BIGINT
       |UNION ALL
       |SELECT 'substr_grams',
       |  (SELECT count(DISTINCT g) FROM sg)::BIGINT,
       |  (SELECT count(DISTINCT g) FROM sg)::BIGINT,
       |  (SELECT count(DISTINCT g) FROM sg)::BIGINT
       |) ORDER BY artifact""".stripMargin
  }
}
