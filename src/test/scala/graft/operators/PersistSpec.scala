package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-trip tests for every trained artifact: save to parquet, load,
  * and prove the APPLIED result is identical to applying the in-memory
  * model — train-once/apply-anywhere with nothing lost in the store.
  */
class PersistSpec extends AnyFunSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def embeddings = {
    val spark = TestSpark.spark
    import spark.implicits._
    // DYADIC grid values (multiples of 0.125): every sum/product is exact
    // in IEEE doubles regardless of aggregation order, so train-twice
    // comparisons can't flake on partial-aggregation summation order — the
    // same knife-edge the production queries kill by rounding at 6 decimals
    (0L until 40L).map { id =>
      val v = Array.tabulate(10) { i =>
        (((id * 2654435761L + i * 40503L + id * id * (i + 3)) % 64) - 32) * 0.125f
      }
      (id, (id % 4).toString, v)
    }.toDF("vec_id", "label", "embedding")
  }

  test("BPE model round-trips: saved vocab tokenizes identically, merges survive") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "slow slower glow glowing"),
      (3L, "the lowest low")).toDF("doc_id", "text")
    val dir = tmp("graft-bpe-rt-")
    Bpe.trainAndSave(docs, dir, nMerges = 5)

    val (merges, words) = Bpe.train(docs, nMerges = 5)
    val loadedMerges = Bpe.loadMerges(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(loadedMerges == merges)

    val direct = Bpe.applyBpe(docs, words).collect().map(_.toSeq).toSeq
    val viaStore = Bpe.tokenizeSaved(docs, dir).collect().map(_.toSeq).toSeq
    assert(viaStore == direct)
    words.unpersist()
  }

  test("marked BPE model persists its convention: OOV fallback is marked too") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val dir = tmp("graft-bpe-marked-")
    Bpe.trainAndSave(docs, dir, nMerges = 3, marker = true)
    assert(Bpe.loadMarker(spark, dir))
    // an out-of-vocab word must fall back to the MARKED char split — an
    // unmarked fallback would mix boundary conventions in one id space
    val newDocs = Seq((2L, "zzz")).toDF("doc_id", "text")
    val syms = Bpe.symbolStream(newDocs, Bpe.loadVocab(spark, dir),
        Bpe.loadMarker(spark, dir))
      .orderBy(col("q")).collect().map(_.getString(3))
    assert(syms.toSeq == Seq("z", "z", "z</w>"))
  }

  test("whitening model round-trips bit-exactly and whitenWith(loaded) == whiten") {
    val spark = TestSpark.spark
    val emb = embeddings
    val dir = tmp("graft-whiten-rt-")
    Whiten.saveModel(emb, dir)

    val (m, l) = Whiten.model(emb)
    val (lm, ll) = Whiten.loadModel(spark, dir)
    // parquet doubles are binary-exact: require equality, not tolerance
    assert(lm.toSeq == m.toSeq)
    assert(ll.map(_.toSeq).toSeq == l.map(_.toSeq).toSeq)

    val direct = Whiten.whiten(emb).collect().map(_.toSeq).toSeq
    val viaStore = Whiten.whitenWith(emb, lm, ll)
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    assert(viaStore == direct)
  }

  test("k-means model round-trips: loaded == trained, bit-exact") {
    val spark = TestSpark.spark
    val emb = embeddings
    val dir = tmp("graft-kmeans-rt-")
    // compare against the RETURNED model, not a second training run: a
    // retrain can legitimately flip a near-equidistant vector (summation
    // order under partial aggregation), which says nothing about the store
    val (cent, assigned) = Similarity.trainAndSaveKmeans(emb, k = 3, iters = 2, dir)
    val loadedCent = Similarity.loadCentroids(spark, dir)
    assert(loadedCent.orderBy(col("c"), col("i")).collect().map(_.toSeq).toSeq
      == cent.orderBy(col("c"), col("i")).collect().map(_.toSeq).toSeq)
    assert(Similarity.loadCells(spark, dir)
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
      == assigned.orderBy(col("vec_id")).collect().map(_.toSeq).toSeq)
    cent.unpersist()
    assigned.unpersist()
  }

  test("assign labels a new shard from the saved centroid artifact alone") {
    val spark = TestSpark.spark
    import spark.implicits._
    // three clusters 100 apart with ±0.125 jitter: every distance
    // comparison has a margin of thousands, so no rounding boundary can
    // flip an assignment — the semantics are testable without flake risk.
    // Seeds (vec_id 0, 1, 2) land one per cluster, so centroid c = cluster.
    def shard(ids: Range) = ids.map { id =>
      val c = (id % 3).toDouble
      val v = Array.tabulate(6)(i => (c * 100.0 + ((id + i) % 3) * 0.125).toFloat)
      (id.toLong, c.toInt.toString, v)
    }.toDF("vec_id", "label", "embedding")
    val dir = tmp("graft-kmeans-assign-")
    val (cent, assigned) = Similarity.trainAndSaveKmeans(shard(0 until 30), 3, 2, dir)
    // a shard the trainer never saw, labeled from the loaded centroids
    val out = Similarity.assign(shard(30 until 60), Similarity.loadCentroids(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == (30 until 60).map(id => id.toLong -> id % 3).toMap)
    cent.unpersist()
    assigned.unpersist()
  }

  test("PQ model round-trips: loaded codebooks/codes == trained, and encode a new shard deterministically") {
    val spark = TestSpark.spark
    val emb = embeddings // 10 dims -> 2 blocks of 5 here (pqModel takes sub directly)
    val dir = tmp("graft-pq-rt-")
    val (cent, codes) = Similarity.trainAndSavePq(emb, sub = 5, dir)
    assert(Similarity.loadPqCodebooks(spark, dir)
      .orderBy(col("c"), col("i")).collect().map(_.toSeq).toSeq
      == cent.orderBy(col("c"), col("i")).collect().map(_.toSeq).toSeq)
    assert(Similarity.loadPqCodes(spark, dir)
      .orderBy(col("vec_id"), col("m")).collect().map(_.toSeq).toSeq
      == codes.orderBy(col("vec_id"), col("m")).collect().map(_.toSeq).toSeq)
    // the small artifact alone encodes data: two encode passes over the
    // same shard from the LOADED codebooks agree row-for-row (the encode
    // is a pure function of (shard, codebooks) — no hidden training state)
    val loaded = Similarity.loadPqCodebooks(spark, dir)
    def enc() = Similarity.encodePq(emb, loaded, sub = 5)
      .orderBy(col("vec_id"), col("m")).collect().map(_.toSeq).toSeq
    assert(enc() == enc())
    cent.unpersist()
    codes.unpersist()
  }

  test("IVF-PQ index round-trips: search over the loaded index == search over the trained one") {
    val spark = TestSpark.spark
    val emb = embeddings // 10 dims -> sub = 5 (2 blocks)
    val dir = tmp("graft-ivfpq-rt-")
    val idx = Similarity.trainAndSaveIvfPq(emb, sub = 5, dir)
    val direct = Similarity.ivfPqSearch(emb, idx, sub = 5, nQueries = 4, k = 3)
      .collect().map(_.toSeq).toSeq
    val viaStore = Similarity.ivfPqSearch(emb, Similarity.loadIvfPq(spark, dir),
      sub = 5, nQueries = 4, k = 3)
      .collect().map(_.toSeq).toSeq
    // parquet doubles are binary-exact: the serving path over the loaded
    // artifacts must reproduce the in-memory index bit-for-bit
    assert(viaStore == direct)
  }

  test("surprisal model round-trips: scoring from saved == t13, band edges are the frozen percentiles") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = tmp("graft-lm-rt-")
    TextOps.trainAndSaveSurprisalModel(docs, dir)
    val model = TextOps.loadSurprisalModel(spark, dir)
    // parquet longs/doubles are binary-exact: the loaded model scores the
    // training corpus identically to the in-lineage t13
    val fromSaved = TextOps.unigramSurprisalFromSaved(docs, model)
      .collect().map(_.toSeq).toSeq
    val direct = TextOps.unigramSurprisal(docs).collect().map(_.toSeq).toSeq
    assert(fromSaved == direct)
    // the frozen band edges ARE the P25/P75 of the scores under the model
    val band = model.band.collect().head
    val (lo, hi) = (band.getAs[Double]("lo"), band.getAs[Double]("hi"))
    assert(lo <= hi)
    val bits = direct.map(_(2).asInstanceOf[Double]).sorted
    assert(lo >= bits.head && hi <= bits.last,
      "band edges must lie within the observed score range")
    val inside = bits.count(b => b >= lo && b <= hi)
    assert(inside >= bits.size / 2 - 1,
      s"P25-P75 band must hold ~half the corpus: $inside of ${bits.size}")
  }

  test("LM vocab cap bounds the artifact, keeps the hottest words, totals stay corpus-exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // planted long tail: 5 hot words everywhere + a unique word per doc
    val docs = (0L until 50L)
      .map(i => (i, s"the cat sat on mat unique$i"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-lm-cap-")
    val m = TextOps.trainAndSaveSurprisalModel(docs, dir, vocabTopK = 5)
    val kept = m.counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // bounded by construction, hottest words kept
    assert(kept.size == 5, s"capped vocab must be exactly topK: $kept")
    assert(kept.keySet == Set("the", "cat", "sat", "on", "mat"))
    assert(kept.values.forall(_ == 50L))
    // totals describe the FULL corpus (cap truncates the table, not N/V)
    val t = m.totals.collect().head
    assert(t.getAs[Long]("n") == 50L * 6)
    assert(t.getAs[Long]("v") == 5 + 50)
    // tail words score via the add-one floor — same as genuinely unseen
    val scored = TextOps.unigramSurprisalFromSaved(docs, m).collect()
    assert(scored.forall(_.getDouble(2) > 0.0))
  }

  test("LM merge: counts add, totals add, and the merged model scores like the full-corpus train") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = docs.count() * 4 / 5
    import org.apache.spark.sql.functions.col
    val a = TextOps.trainAndSaveSurprisalModel(
      docs.filter(col("doc_id") < cut), tmp("graft-lm-a-"))
    val b = TextOps.trainAndSaveSurprisalModel(
      docs.filter(col("doc_id") >= cut), tmp("graft-lm-b-"))
    val merged = TextOps.mergeSurprisalModels(a, b, docs)
    // count additivity: merged scoring == the full-corpus t13, bit-exact
    val viaMerge = TextOps.unigramSurprisalFromSaved(docs, merged)
      .collect().map(_.toSeq).toSeq
    val full = TextOps.unigramSurprisal(docs).collect().map(_.toSeq).toSeq
    assert(viaMerge == full)
    // totals add exactly; V is the union vocabulary
    val t = merged.totals.collect().head
    val ft = TextOps.trainAndSaveSurprisalModel(docs, tmp("graft-lm-f-")).totals
      .collect().head
    assert(t.getAs[Long]("n") == ft.getAs[Long]("n"))
    assert(t.getAs[Long]("v") == ft.getAs[Long]("v"))
    // the re-derived band edges equal a full train's frozen edges
    val mb = merged.band.collect().head
    val fb = TextOps.loadSurprisalModel(spark,
      { val d = tmp("graft-lm-f2-"); TextOps.trainAndSaveSurprisalModel(docs, d); d })
      .band.collect().head
    assert(mb.getAs[Double]("lo") == fb.getAs[Double]("lo"))
    assert(mb.getAs[Double]("hi") == fb.getAs[Double]("hi"))
  }

  test("incremental SemDeDup: shard pruned against the saved cells, near-dup dropped, fresh vector kept") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)),
      // shard: 8 is a near-copy of old vector 2; 9 sits between the cells
      (8L, Array(0.95f, 0.05f)), (9L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit("x"))
    val dir = tmp("graft-semdedup-inc-")
    Similarity.trainAndSaveKmeans(emb.filter(col("vec_id") < 8), 2, 1, dir)
    val r = Similarity.semDedupShard(emb, 8L,
      graft.sources.ModelStore.load(spark, s"$dir/centroids"),
      graft.sources.ModelStore.load(spark, s"$dir/cells"), 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    // verdicts are emitted for the SHARD only
    assert(r.keySet == Set(8L, 9L), s"shard-only verdicts expected: $r")
    assert(!r(8L), "a near-copy of an indexed vector must be dropped")
    assert(r(9L), "a genuinely new vector must be kept")
  }

  test("incremental shard encode: a new vector enters the saved index and is served, no retraining") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = embeddings // 40 vectors, 10 dims -> sub = 5 (2 blocks)
    val dir = tmp("graft-ivfpq-inc-")
    val old = emb.filter(col("vec_id") < 30)
    val idx = Similarity.trainAndSaveIvfPq(old, sub = 5, dir)
    // the shard: vectors 30..39, plus a PLANTED TWIN of query 0 at id 100
    val twin = emb.filter(col("vec_id") === 0L)
      .select(lit(100L).as("vec_id"), col("label"), col("embedding"))
    val shard = emb.filter(col("vec_id") >= 30).unionByName(twin)
    val (cells, codes) = Similarity.encodeIvfPqShard(shard, idx, sub = 5)
    // coverage: every shard vector gets exactly one cell and one code per block
    assert(cells.count() == 11)
    assert(codes.groupBy(col("vec_id")).count().collect().forall(_.getLong(1) == 2))
    // determinism: a second encode is bit-identical (pure joins, no state)
    val again = Similarity.encodeIvfPqShard(shard, idx, sub = 5)
    assert(again._2.collect().map(_.toSeq).toSet == codes.collect().map(_.toSeq).toSet)
    // serve over old ∪ new: the twin lands in query 0's own coarse cell
    // with a ~zero residual distance, survives ADC, and the exact rerank
    // puts it at rank 1 with cosine 1 — the shard is IN the index
    val combined = Similarity.IvfPqIndex(idx.coarse,
      idx.cells.unionByName(cells), idx.pqCent, idx.codes.unionByName(codes))
    val all = emb.unionByName(twin)
    val top = Similarity.ivfPqSearch(all, combined, sub = 5, nQueries = 2, k = 3)
      .filter(col("qid") === 0 && col("rnk") === 1).collect().head
    assert(top.getLong(2) == 100L, s"planted twin must be rank 1: $top")
    assert(top.getDouble(3) == 1.0, s"twin cosine must be 1.0: $top")
  }

  test("dedup cluster labels round-trip: loaded == computed, keep-list and dashboard derive identically") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = tmp("graft-dupclusters-rt-")
    Dedup.clusterAndSave(docs, dir)

    // the artifact carries the FULL clustering: load == compute, row for row
    val loaded = Dedup.loadClusters(spark, dir).collect().map(_.toSeq).toSeq
    val direct = Dedup.dupClusters(docs).collect().map(_.toSeq).toSeq
    assert(loaded == direct)
    assert(loaded.nonEmpty)

    // and every downstream reader derives identically from the saved
    // labels — the chain runs once, d9/d10 become cheap derivations
    val keepSaved = Dedup.dedupedCorpusFrom(docs, Dedup.loadClusters(spark, dir))
      .collect().map(_.toSeq).toSeq
    val keepDirect = Dedup.dedupedCorpus(docs).collect().map(_.toSeq).toSeq
    assert(keepSaved == keepDirect)
    val rateSaved = Dedup.dupRateBySourceFrom(docs, Dedup.loadClusters(spark, dir))
      .collect().map(_.toSeq).toSeq
    val rateDirect = Dedup.dupRateBySource(docs).collect().map(_.toSeq).toSeq
    assert(rateSaved == rateDirect)
  }

  test("classifier weights round-trip: scoring from saved == train-and-score, wrong-D refuses") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = tmp("graft-qclf-")
    val w = graft.operators.Classifier.trainAndSave(docs, dir)
    val loaded = graft.operators.Classifier.loadWeights(spark, dir)
    assert(w.toSeq == loaded.toSeq, "parquet doubles are binary-exact")
    val fromSaved = graft.operators.Classifier.scoreWith(docs, loaded)
      .collect().map(_.toSeq).toSeq
    val direct = graft.operators.Classifier.qualityClassifier(docs)
      .collect().map(_.toSeq).toSeq
    assert(fromSaved == direct)
    // a truncated artifact refuses instead of silently mis-scoring
    import spark.implicits._
    val bad = tmp("graft-qclf-bad-")
    graft.sources.ModelStore.save(Seq((0, 0.5)).toDF("i", "w"), bad)
    val err = intercept[IllegalArgumentException](
      graft.operators.Classifier.loadWeights(spark, bad))
    assert(err.getMessage.contains("different D"))
  }

  test("a corrupt or wrong-shape whitening artifact fails loudly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = tmp("graft-whiten-bad-")
    graft.sources.ModelStore.save(
      Seq(("mean", 0, 0, 1.0)).toDF("kind", "i", "j", "v"), dir)
    val ex = intercept[IllegalArgumentException](Whiten.loadModel(spark, dir))
    assert(ex.getMessage.contains("incomplete"))
  }
}
