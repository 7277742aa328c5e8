package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Similarity, TextOps}

/** The composed daily-ingest story, end to end: day 1 trains and persists
  * every artifact from the OLD corpus slice; day 2 processes the new
  * shard using ONLY the saved artifacts plus the shard (and, where the
  * semantics require old payloads — the semantic prune, ANN serving —
  * the immutable store the artifacts index). No path retrains or
  * re-scans the old corpus. The per-operator gates live in their own
  * specs and in the oracle; what THIS spec locks is the composition: the
  * artifact schemas all fit together, and each incremental output is
  * consistent with its inputs.
  */
class DailyIngestSpec extends AnyFunSuite {

  test("day-2 shard ingest runs every incremental path off day-1 artifacts") {
    val spark = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("graft-daily").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dCut = docs.count() * 4 / 5
    val vCut = emb.count() * 4 / 5
    val oldDocs = docs.filter(col("doc_id") < dCut)
    val shardDocs = docs.filter(col("doc_id") >= dCut)
    val sub = 64 / Similarity.PqBlocks

    // ---- day 1: train once, persist everything
    Dedup.buildAndSaveLshIndex(oldDocs, s"$root/lsh")
    val lshIdx = Dedup.loadLshIndex(spark, s"$root/lsh")
    Dedup.clusterIndexAndSave(lshIdx, s"$root/lshlabels")
    Dedup.buildAndSaveSubstrIndex(oldDocs, s"$root/substr")
    TextOps.trainAndSaveSurprisalModel(oldDocs, s"$root/lm")
    Similarity.trainAndSaveKmeans(emb.filter(col("vec_id") < vCut), 4, 2, s"$root/km")
    Similarity.trainAndSaveIvfPq(emb.filter(col("vec_id") < vCut), sub, s"$root/ivfpq")

    // ---- day 2: the shard, against the artifacts
    // lexical near-dup pairs + label update
    val pairs = Dedup.shardLshPairs(shardDocs, lshIdx)
    val labels = Dedup.shardUpdateClustersFrom(pairs,
      Dedup.loadClusters(spark, s"$root/lshlabels"))
    val labMap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { p =>
      val (ia, ib) = (p.getLong(0), p.getLong(1))
      assert(labMap(ia) == labMap(ib),
        s"paired docs ($ia, $ib) must share an updated cluster label")
    }

    // exact-substring coverage vs the saved gram index
    val cov = Dedup.shardSubstrSpans(shardDocs, Dedup.loadSubstrIndex(spark, s"$root/substr"))
      .collect()
    assert(cov.length == shardDocs.count(),
      "coverage emits one row per shard doc")
    cov.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "coverage bounded by doc length"))

    // LM: score the shard under yesterday's model, refresh by count-merge
    val lmOld = TextOps.loadSurprisalModel(spark, s"$root/lm")
    val scored = TextOps.unigramSurprisalFromSaved(shardDocs, lmOld).collect()
    assert(scored.length == shardDocs.count())
    TextOps.trainAndSaveSurprisalModel(shardDocs, s"$root/lmShard")
    val merged = TextOps.mergeSurprisalModels(lmOld,
      TextOps.loadSurprisalModel(spark, s"$root/lmShard"), docs)
    val viaMerge = TextOps.unigramSurprisalFromSaved(docs, merged)
      .collect().map(_.toSeq).toSeq
    assert(viaMerge == TextOps.unigramSurprisal(docs).collect().map(_.toSeq).toSeq,
      "the refreshed model IS the full-corpus model (count additivity)")

    // drift monitor: stale-model excess per source is finite and defined
    val drift = TextOps.surprisalDrift(docs, lmOld).collect()
    assert(drift.nonEmpty && drift.forall(r => !r.getDouble(4).isNaN))

    // semantic prune of the shard against the saved cells
    val sem = Similarity.semDedupShard(emb, vCut,
      graft.sources.ModelStore.load(spark, s"$root/km/centroids"),
      graft.sources.ModelStore.load(spark, s"$root/km/cells"), 0.4).collect()
    assert(sem.map(_.getLong(0)).forall(_ >= vCut), "semantic verdicts are shard-only")

    // ANN: encode the shard into the saved index, serve over old ∪ new
    val ivf = Similarity.loadIvfPq(spark, s"$root/ivfpq")
    val (nc, ncodes) = Similarity.encodeIvfPqShard(
      emb.filter(col("vec_id") >= vCut), ivf, sub)
    val combined = Similarity.IvfPqIndex(ivf.coarse,
      ivf.cells.unionByName(nc), ivf.pqCent, ivf.codes.unionByName(ncodes))
    val served = Similarity.ivfPqSearch(emb, combined, sub, 5, 3).collect()
    assert(served.length == 5 * 3, "k results per query over the enlarged index")

    // label-artifact consumers at day-2 cost: quality-ranked canonical and
    // the split-leakage audit both derive from the UPDATED labels
    val keep = Dedup.bestQualityCorpusFrom(docs, labels).collect()
    val nonCanon = labMap.count { case (id, c) => id != c }
    assert(keep.length == docs.count() - nonCanon,
      "keep-list = corpus minus non-canonical members")
    val leak = Dedup.splitLeakage(docs, labels).collect()
    assert(leak.length == labMap.values.toSet.size &&
      leak.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)),
      "one audit row per updated cluster, split counts bounded by size")

    // decontamination: the day-1 bloom artifact gates the shard per row
    val bloom = Curation.trainBenchmarkBloom(oldDocs)
    val gate = Curation.bloomDecontaminate(shardDocs, bloom)
    assert(gate.count() ==
      shardDocs.filter(col("doc_id") % Curation.BenchmarkMod =!= 0).count(),
      "one verdict per non-benchmark shard doc")

    // day-3 deletion request: tombstone a slice OUT of the enlarged index
    // (no rebuild — anti-filter the corpus tables, quantizers untouched)
    val dead = col("vec_id") % 7 === 3
    val tombstoned = Similarity.IvfPqIndex(combined.coarse,
      combined.cells.filter(!dead), combined.pqCent, combined.codes.filter(!dead))
    val servedAfter = Similarity.ivfPqSearch(emb, tombstoned, sub, 5, 3).collect()
    assert(servedAfter.forall(_.getLong(2) % 7 != 3),
      "a tombstoned vector surfaced after deletion")
    assert(servedAfter.length == 5 * 3,
      "deletion must not starve k on the surviving corpus")

    // release dashboard: per-gate keep deltas between yesterday's slice
    // and today's corpus — 5 gates, deltas consistent with the counts
    val diff = Curation.manifestDiff(oldDocs, docs).collect()
    assert(diff.length == 5 && diff.forall(r =>
      r.getLong(3) == r.getLong(2) - r.getLong(1)),
      s"gate diff rows inconsistent: ${diff.mkString(", ")}")
  }

  test("the p56 media-extended report equals the base report plus the standalone media legs") {
    // the composition rule made a Spark-side pin (the oracle nests the
    // component oracles; this nests the component OPERATORS): stages
    // 0-7 are byte-identical to dailyIngest's own rows, and stages
    // 8/9/10 carry exactly the standalone mm11/mm12/mm13 pair counts
    val spark = TestSpark.spark
    import graft.operators.Multimodal
    val root = java.nio.file.Files.createTempDirectory("graft-p56").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dCut = docs.count() * 4 / 5
    val vCut = emb.count() * 4 / 5
    val oldDocs = docs.filter(col("doc_id") < dCut)
    val shardDocs = docs.filter(col("doc_id") >= dCut)
    Dedup.buildAndSaveLshIndex(oldDocs, s"$root/lsh")
    val lshIdx = Dedup.loadLshIndex(spark, s"$root/lsh")
    Dedup.clusterIndexAndSave(lshIdx, s"$root/lshlabels")
    Dedup.buildAndSaveSubstrIndex(oldDocs, s"$root/substr")
    TextOps.trainAndSaveSurprisalModel(oldDocs, s"$root/lm")
    TextOps.trainAndSaveSurprisalModel(shardDocs, s"$root/lmShard")
    Similarity.trainAndSaveKmeans(emb.filter(col("vec_id") < vCut), 4, 2, s"$root/km")
    val base = Curation.dailyIngest(docs, emb, dCut, vCut,
      Dedup.shardLshPairs(shardDocs, lshIdx),
      Dedup.loadClusters(spark, s"$root/lshlabels"),
      Dedup.loadSubstrIndex(spark, s"$root/substr"),
      graft.sources.ModelStore.load(spark, s"$root/km/centroids"),
      graft.sources.ModelStore.load(spark, s"$root/km/cells"),
      TextOps.loadSurprisalModel(spark, s"$root/lm"),
      TextOps.loadSurprisalModel(spark, s"$root/lmShard"), 0.4)
    val img = Multimodal.imageShardNearDup(
      Multimodal.imageHashes(Multimodal.hashAssets(oldDocs)),
      Multimodal.hashAssets(shardDocs))
    val aud = Multimodal.audioShardNearDup(
      Multimodal.audioHashes(Multimodal.audioHashAssets(oldDocs)),
      Multimodal.audioHashAssets(shardDocs))
    val vid = Multimodal.videoShardNearDup(
      Multimodal.videoFrameHashes(Multimodal.videoHashAssets(oldDocs)),
      Multimodal.videoHashAssets(shardDocs))
    val full = Curation.dailyIngestFull(base, img, aud, vid)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val baseRows = base.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(full.filter(_._1 <= 7L).sorted.sameElements(baseRows.sorted),
      "stages 0-7 must be the base report verbatim")
    assert(full.filter(_._1 >= 8L).toSeq.sortBy(_._1) == Seq(
      (8L, "image_pairs", img.count()),
      (9L, "audio_pairs", aud.count()),
      (10L, "video_pairs", vid.count())),
      "media stages must equal the standalone legs' pair counts")
  }
}
