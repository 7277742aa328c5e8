package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The per-artifact right-to-be-forgotten pins behind p53: a deleted key
  * can never surface from any pruned artifact, and every re-derivation
  * equals the from-scratch build over the survivors where that equality
  * is the declared contract.
  */
class ForgetSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(kind: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$kind").toString

  test("no deleted key survives in any pruned artifact") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, dir)
    val events = graft.Tables.events(s, dir)
    val emb = graft.Tables.embeddings(s, dir)

    val idxDir = tmp("rtbf-lsh")
    Dedup.buildAndSaveLshIndex(docs, idxDir)
    val pruned = Forget.pruneLshIndex(Dedup.loadLshIndex(s, idxDir))
    for ((t, n) <- Seq(pruned.shingles -> "shingles",
        pruned.buckets -> "buckets", pruned.counts -> "counts"))
      assert(t.filter(Forget.DocDeleted).count() == 0, s"deleted doc in $n")

    val labels = Dedup.connectedComponents(Dedup.indexPairs(pruned))
    assert(labels.filter(col("v") % 7 === 3).count() == 0, "deleted doc labeled")
    assert(labels.filter(col("lab") % 7 === 3).count() == 0,
      "deleted doc survives as a cluster canonical")

    val bm = TextOps.deleteFromBm25Index(TextOps.buildBm25Index(docs),
      Forget.DocDeleted)
    assert(bm.postings.filter(Forget.DocDeleted).count() == 0)
    assert(bm.doclen.filter(Forget.DocDeleted).count() == 0)
    // re-derived stats carry no zero-df ghost terms
    assert(bm.stats.filter(col("df") <= 0).count() == 0)

    val ann = Forget.pruneAnnIndex(Similarity.ivfPqTrain(emb,
      64 / Similarity.PqBlocks))
    assert(ann.cells.filter(Forget.VecDeleted).count() == 0)
    assert(ann.codes.filter(Forget.VecDeleted).count() == 0)

    // the fingerprint table: an erased doc's assets die, INCLUDING its
    // derived variant (asset_id = doc_id + VariantOffset)
    val fp = Forget.pruneMediaFingerprints(
      Multimodal.imageHashes(Multimodal.hashAssets(docs)))
    val srcId = when(col("asset_id") >= Multimodal.VariantOffset,
      col("asset_id") - Multimodal.VariantOffset).otherwise(col("asset_id"))
    assert(fp.filter(srcId % 7 === 3).count() == 0,
      "asset (or derived variant) of an erased doc in the fingerprints")

    // the rebuilt sketch holds only hashes surviving users produce (a
    // colliding survivor may legitimately keep a shared hash alive)
    val saved = Sketches.dailyKmvSketchRows(events)
    val after = Forget.pruneKmvSketch(saved, events)
    val survivorHashes = events.filter(!Forget.UserDeleted)
      .select(graft.functions.Portable.hash32(col("user_id").cast("string")).as("h"))
      .distinct()
    assert(after.join(survivorHashes, Seq("h"), "left_anti").count() == 0,
      "sketch hash no surviving user produces")
  }

  test("substr decrement equals a fresh build over the survivors") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, dir)
    val full = tmp("rtbf-sub-full")
    val surv = tmp("rtbf-sub-surv")
    Dedup.buildAndSaveSubstrIndex(docs, full)
    Dedup.buildAndSaveSubstrIndex(docs.filter(!Forget.DocDeleted), surv)
    val dec = Dedup.deleteFromSubstrIndex(
      Dedup.loadSubstrIndex(s, full), docs.filter(Forget.DocDeleted))
      .orderBy(col("g")).collect()
    val fresh = Dedup.loadSubstrIndex(s, surv).orderBy(col("g")).collect()
    assert(dec.sameElements(fresh),
      "count-reversible deletion must equal the survivor build")
  }

  test("kmv affected-day rebuild equals the survivors' from-scratch sketch") {
    val s = TestSpark.spark
    val events = graft.Tables.events(s, dir)
    val saved = Sketches.dailyKmvSketchRows(events)
    val after = Forget.pruneKmvSketch(saved, events)
      .orderBy(col("day"), col("h")).collect()
    val fresh = Sketches.dailyKmvSketchRows(events.filter(!Forget.UserDeleted))
      .orderBy(col("day"), col("h")).collect()
    assert(after.sameElements(fresh),
      "kept-days + rebuilt-days must equal the survivor sketch")
  }

  test("the artifact catalog is the single source of truth: the p53 sweep and the p54 manifest both enumerate it exactly") {
    val s = TestSpark.spark
    val catalog = Forget.ArtifactCatalog.map(_._1)
    assert(catalog == catalog.sorted && catalog.distinct == catalog,
      "catalog must be sorted and duplicate-free (both reports ORDER BY artifact)")
    val sweep = graft.SparkEntry.queries("p53_rtbf_sweep")(s, dir)
      .select(col("artifact")).collect().map(_.getString(0)).toSeq
    assert(sweep == catalog,
      s"p53 legs must enumerate the catalog: $sweep vs $catalog")
    val manifest = graft.SparkEntry.queries("p54_artifact_manifest")(s, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(manifest.map(_._1) == catalog,
      s"p54 rows must enumerate the catalog: ${manifest.map(_._1)} vs $catalog")
    assert(manifest == Forget.ArtifactCatalog,
      "p54's erasure_class column must carry the catalog's classes verbatim")
  }

  test("label re-derivation drops the erased doc's partner from the duplicate list") {
    val s = TestSpark.spark
    import s.implicits._
    // doc 3 (≡3 mod 7 — erased) is doc 1's only duplicate; docs 2 and 9
    // duplicate each other and both survive. After the sweep doc 1 must
    // stop being listed as a near-duplicate of anything (its pair is
    // gone), while the surviving pair keeps its cluster.
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq((1L, a), (3L, a), (2L, b), (9L, b)).toDF("doc_id", "text")
    val idxDir = tmp("rtbf-bridge")
    Dedup.buildAndSaveLshIndex(docs, idxDir)
    val idx = Dedup.loadLshIndex(s, idxDir)
    // fixture sanity: both duplicate pairs are index-detected pre-delete
    val before = Dedup.indexPairs(idx).select(col("ia"), col("ib")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before == Set((1L, 3L), (2L, 9L)), s"$before")
    val after = Dedup.connectedComponents(
      Dedup.indexPairs(Forget.pruneLshIndex(idx)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set((2L, 2L), (9L, 2L)), s"$after")
  }
}
