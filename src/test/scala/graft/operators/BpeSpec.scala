package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The BPE trainer against hand-computed merges (the classic
  * low/lower/lowest corpus), the greedy-fold overlap semantics, and the
  * apply path's count/ordering invariants.
  */
class BpeSpec extends AnyFunSuite {

  test("trainer reproduces hand-computed merges on the classic corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    // words: low x3, lower x1, lowest x1
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, nMerges = 4)
    // round 1: (l,o)=5 ties (o,w)=5 -> left asc picks (l,o)
    // round 2: (lo,w)=5    round 3: (low,e)=2
    // round 4: (lowe,r)=1 ties (lowe,s)=1 and (s,t)=1 -> (x,y) asc
    assert(merges == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L),
      (4, "lowe", "r", 1L)))
    val syms = vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(syms == Map("low" -> "low", "lower" -> "lower", "lowest" -> "lowe s t"))
  }

  test("merge fold is greedy left-to-right: overlapping pairs don't chain") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq("a a a", "a a a a", "b a a", "a", "x y")
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array("aa a", "aa aa", "b aa", "a", "x y")))
  }

  test("trainer stops early when nothing is left to merge") {
    val spark = TestSpark.spark
    import spark.implicits._
    // single-char words only: no adjacent pairs exist at all
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, nMerges = 5)
    assert(merges.isEmpty)
  }

  test("marked trainer: end-of-word merges are distinct symbols (hand-computed)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // low x3, lower x1, lowest x1 with </w>: "l o w</w>", "l o w e r</w>",
    // "l o w e s t</w>" — so (o, w</w>) at the boundary counts separately
    // from word-internal (o, w), unlike the unmarked trainer
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainMarked(docs, maxMerges = 5)
    // r1: (l,o)=5. r2: (lo,w</w>)=3 beats (lo,w)=2 — the boundary symbol.
    // r3: (lo,w)=2 ties (w,e)=2 -> x asc picks (lo,w). r4: (low,e)=2.
    // r5: (lowe,r</w>)=1 ties (lowe,s) and (s,t</w>) -> (x,y) asc.
    assert(merges == Seq(
      (1, "l", "o", 5L), (2, "lo", "w</w>", 3L), (3, "lo", "w", 2L),
      (4, "low", "e", 2L), (5, "lowe", "r</w>", 1L)))
    val syms = vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(syms == Map("low" -> "low</w>", "lower" -> "lower</w>",
      "lowest" -> "lowe s t</w>"))
    vocab.unpersist()
  }

  test("marked trainer: target-vocab-size stop ends merging at the target") {
    val spark = TestSpark.spark
    import spark.implicits._
    // init syms: "a b x</w>", "a y</w>", "b z</w>" -> 5 distinct symbols;
    // merging (a,b) keeps a and b alive in the other words, so the vocab
    // GROWS to 6: {ab, x</w>, a, y</w>, b, z</w>}
    val docs = Seq((1L, "abx ay bz")).toDF("doc_id", "text")
    val (m1, v1) = Bpe.trainMarked(docs, maxMerges = 5, targetVocab = Some(6))
    assert(m1.map(t => (t._2, t._3)) == Seq(("a", "b"))) // one round, then 6 >= 6
    v1.unpersist()
    // a target at or below the initial size means zero merges
    val (m0, v0) = Bpe.trainMarked(docs, maxMerges = 5, targetVocab = Some(5))
    assert(m0.isEmpty)
    v0.unpersist()
    // no target: runs to maxMerges (or exhaustion) exactly like train
    val (mAll, vAll) = Bpe.trainMarked(docs, maxMerges = 2)
    assert(mAll.size == 2)
    vAll.unpersist()
  }

  test("merge replay: OOV words get the correct COMPRESSED tokenization") {
    val spark = TestSpark.spark
    import spark.implicits._
    val trainDocs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (merges, words) = Bpe.train(trainDocs, nMerges = 4)
    words.unpersist()
    val pairList = merges.map(m => (m._2, m._3))
    // "lowly" was never trained, but replaying (l,o)(lo,w)(low,e)(lowe,r)
    // still compresses its prefix — the vocab join's char-split fallback
    // would emit 5 raw chars instead
    val syms = Seq("lowly").toDF("tok")
      .select(Bpe.symbolizeByMerges(col("tok"), pairList).as("s"))
      .collect().head.getString(0)
    assert(syms == "low l y", s"got '$syms'")
    // single-char digit/mark pre-tokens are replay no-ops
    val mark = Seq("7").toDF("tok")
      .select(Bpe.symbolizeByMerges(col("tok"), pairList).as("s"))
      .collect().head.getString(0)
    assert(mark == "7")
  }

  test("merge replay reproduces the vocab-join tokenization on the training corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "low lower lowest, 42 low!"),
      (2L, "slower glowing lows")).toDF("doc_id", "text")
    val direct = Bpe.tokenize(docs).collect().map(_.toSeq).toSeq
    val replay = Bpe.tokenizeViaMergeReplay(docs).collect().map(_.toSeq).toSeq
    assert(replay == direct)
  }

  test("apply: learned tokens, single-symbol marks/digits, stable id fingerprint") {
    val spark = TestSpark.spark
    import spark.implicits._
    val train = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.train(train, nMerges = 4)
    // "low lowest 7!" -> [low] [lowe s t] [7] [!] = 6 tokens
    val docs = Seq((1L, "low lowest 7!"), (2L, "low low")).toDF("doc_id", "text")
    val rows = Bpe.applyBpe(docs, vocab).collect()
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 6L, 2L -> 2L))
    // determinism: same corpus, same fingerprints
    val again = Bpe.applyBpe(docs, vocab).collect()
    assert(rows.map(_.getString(2)).sameElements(again.map(_.getString(2))))
    // doc 2 is "low low" -> the same id twice, comma-joined
    val idsMd5 = rows.find(_.getLong(0) == 2L).get.getString(2)
    val lowId = Bpe.applyBpe(Seq((9L, "low")).toDF("doc_id", "text"), vocab)
      .collect()
    assert(lowId.head.getLong(1) == 1L)
    assert(idsMd5.nonEmpty)
  }

  test("invariants on a real corpus: symbolizations reconstruct words; merges only shrink") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, vocab) = Bpe.train(docs)
    assert(merges.size == Bpe.NMerges, s"corpus must support ${Bpe.NMerges} merges")
    // lossless: stripping the symbolization's separators gives the word back
    val rows = vocab.collect()
    rows.foreach { r =>
      assert(r.getString(2).replace(" ", "") == r.getString(0),
        s"symbolization must reconstruct '${r.getString(0)}'")
    }
    // merges strictly decrease total symbol count vs char-split
    val symCount = rows.map(_.getString(2).split(" ").length.toLong).sum
    val charCount = rows.map(_.getString(0).length.toLong).sum
    assert(symCount < charCount, s"$symCount symbols vs $charCount chars")
    assert(merges.map(_._1) == (1 to merges.size))
    assert(merges.forall(_._4 > 0))
  }

  test("streaming tokenization: the symbol stream runs on a live stream with the static vocab") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.train(train, nMerges = 4)
    val input = MemoryStream[(Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String)]], spark)
    val counts = Bpe.symbolStream(input.toDF().toDF("doc_id", "text"), vocab)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bpe"))
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("stream_bpe").start()
    input.addData((1L, "low lowest 7!"), (2L, "low low"))
    q.processAllAvailable()
    val got = spark.table("stream_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    // identical to the batch apply: [low] [lowe s t] [7] [!] = 6; [low low] = 2
    assert(got == Map(1L -> 6L, 2L -> 2L))
  }

  test("merge count tie-breaks are (count desc, left asc, right asc)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "ba" and "ab" both once: pairs (b,a)=1, (a,b)=1 -> (a,b) first
    val docs = Seq((1L, "ba ab")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, nMerges = 1)
    assert(merges == Seq((1, "a", "b", 1L)))
  }

  test("fertility table: one row per language, fertility >= 1, exact token totals") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "low low lower", "en"),
      (2L, "low lowest", "en"),
      (3L, "bas bas basse", "fr")).toDF("doc_id", "text", "lang")
    val rows = Bpe.fertility(docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("en", "fr"))
    rows.foreach { r =>
      // every whitespace word becomes >= 1 BPE token, so fertility >= 1;
      // compression is bounded by the raw char count
      assert(r.getDouble(4) >= 1.0, s"fertility ${r.getDouble(4)}")
      assert(r.getLong(1) <= r.getLong(2), "tokens cannot exceed chars")
    }
    // en token total equals the summed per-doc n_bpe of the apply path —
    // the eval table is an aggregation of the SAME tokenization, not a
    // second tokenizer
    val perDoc = Bpe.tokenize(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val en = rows.find(_.getString(0) == "en").get.getLong(1)
    assert(en == perDoc(1L) + perDoc(2L))
  }
}
