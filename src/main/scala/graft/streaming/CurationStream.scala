package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Curation, Dedup, TextOps}

/** The curated manifest's gate logic (p20) as a STRUCTURED-STREAMING job —
  * the batch/stream expression-layer unification the as-of case
  * (AsOf.asOfStream) established, applied to curation: a live crawl is
  * gated document-by-document as it lands instead of re-scanning the
  * corpus nightly.
  *
  * What streams and what doesn't, stated honestly:
  *  - quality floor: [[TextOps.qualityScore]] is a stateless per-row
  *    expression — literally the batch manifest's Column, applied to the
  *    stream unchanged.
  *  - boilerplate ceiling: corpus-global in batch (shingle document
  *    frequency). The streaming form gates against a TRAINED hot-shingle
  *    artifact ([[trainHotShingles]], run on yesterday's corpus — the
  *    CCNet convention: models are trained offline, applied online),
  *    joined stream-static and evaluated per row.
  *  - exact-dup canonical: the one genuinely stateful gate — first-seen
  *    per normalized-text hash via keyed state. Equals the batch
  *    min-doc_id canonical exactly when each hash's docs ARRIVE in
  *    doc_id order (what an id-ordered ingest gives); within a
  *    micro-batch, rows are doc_id-sorted so intra-batch disorder is
  *    absorbed.
  *  - the surprisal band (t13 P25–P75) is EXCLUDED: both its model AND
  *    its band edges are corpus-global percentiles — there is no
  *    honest per-row streaming form, so the stream keep set is the batch
  *    keep set with the band gate dropped (a superset; CurationStreamSpec
  *    pins exactly that relation).
  *
  * Scale shape: the hot set is the power-law HEAD of the shingle table
  * (df > cutoff) — small by construction, broadcast by AQE through the
  * stream-static join. Canonical state is one boolean per distinct text
  * hash (the dedup horizon); at 100 TB run it on the RocksDB state store
  * (conf-only, proven in RecoverySpec) and bound the horizon upstream if
  * the corpus is unbounded.
  */
object CurationStream {

  /** Per-row gate output (pre-canonical). */
  final case class GateRow(doc_id: Long, h: String, quality_score: Double,
                           boiler_frac: Double, quality_ok: Boolean,
                           boiler_ok: Boolean)

  /** The streamed manifest row: per-gate verdicts + the final keep. */
  final case class ManifestRow(doc_id: Long, quality_score: Double,
                               boiler_frac: Double, quality_ok: Boolean,
                               boiler_ok: Boolean, canonical: Boolean,
                               keep: Boolean)

  /** Train step (batch, offline): the hot-shingle artifact the streaming
    * boilerplate ceiling gates against — shingles in more than
    * [[Dedup.BoilerplateDocFreq]] training-corpus documents, exactly the
    * set [[Dedup.boilerplateFraction]] counts as hot.
    */
  def trainHotShingles(docs: DataFrame): DataFrame =
    Dedup.rawShingles(docs)
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.BoilerplateDocFreq)
      .select(col("g"))

  /** Stateless per-row gates over ANY (doc_id, text) frame — batch or
    * streaming micro-batch, the same Catalyst expressions either way.
    * The trained hot set arrives as one collected-array row through a
    * dummy-key equi-join (stream-static cross joins are unsupported;
    * the single-row static side broadcasts), and the per-doc fraction is
    * a pure array expression: |sh ∩ hot| / |sh| over the doc's DISTINCT
    * shingles — the identical quantity [[Dedup.boilerplateFraction]]
    * computes by explode + join + re-aggregate in batch, without the
    * streaming aggregation (and watermark machinery) that shape would
    * drag in.
    */
  def gated(docs: DataFrame, hot: DataFrame): DataFrame = {
    val hotArr = hot.agg(collect_set(col("g")).as("hot_set"))
      .withColumn("one", lit(1))
    docs.withColumn("one", lit(1))
      .join(broadcast(hotArr), "one")
      // tokens MUST be materialized before shingleArray (its documented
      // contract): an inline tokens(text) tree would re-run the regex
      // split per shingle — O(tokens^2) per doc on the per-micro-batch
      // hot path (measured 3x on the batch shingle pipeline)
      .withColumn("w", TextOps.tokens(col("text")))
      .withColumn("sh", Dedup.shingleArray(col("w")))
      .select(col("doc_id"),
        md5(lower(trim(col("text")))).as("h"),
        TextOps.qualityScore(col("text")).as("quality_score"),
        when(size(col("sh")) === 0, lit(0.0))
          .otherwise(round(
            size(array_intersect(col("sh"), col("hot_set"))).cast("double")
              / size(col("sh")), 4)).as("boiler_frac"))
      .withColumn("quality_ok", col("quality_score") >= Curation.ManifestQualityMin)
      .withColumn("boiler_ok", col("boiler_frac") <= Curation.ManifestBoilerMax)
  }

  /** First-seen canonical per text hash: the group's min-doc_id row in the
    * first micro-batch that sees the hash is canonical; everything later
    * (same batch or any after) is a duplicate. State is one boolean per
    * hash, committed WITH the batch — a crash-and-replay recomputes the
    * identical verdicts (RecoverySpec's at-least-once contract).
    */
  def firstSeen(h: String, rows: Iterator[GateRow],
                state: GroupState[Boolean]): Iterator[ManifestRow] = {
    val rs = rows.toArray.sortBy(_.doc_id)
    val seenBefore = state.exists
    if (!seenBefore && rs.nonEmpty) state.update(true)
    rs.iterator.zipWithIndex.map { case (r, i) =>
      val canonical = !seenBefore && i == 0
      ManifestRow(r.doc_id, r.quality_score, r.boiler_frac,
        r.quality_ok, r.boiler_ok, canonical,
        r.quality_ok && r.boiler_ok && canonical)
    }
  }

  /** The streaming manifest: per-row gates + keyed first-seen canonical.
    * `docs` is a streaming (doc_id, text, ...) frame; `hot` the trained
    * static artifact. Emits one ManifestRow per document, append mode.
    */
  def manifest(docs: DataFrame, hot: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    gated(docs, hot).as[GateRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstSeen)
      .toDF()
  }
}
