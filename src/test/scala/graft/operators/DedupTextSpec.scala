package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic unit tests for the dedup/text family on crafted documents —
  * locks operator behavior independently of the fixture-based oracle gate.
  */
class DedupTextSpec extends AnyFunSuite {

  private def docs(rows: (Long, String)*) = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
  }

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("exact dedup groups normalized duplicates, keeps min id") {
    val d = docs((1L, "Hello  World"), (2L, "hello  world"), (3L, "other"))
    // trim+lower only: inner whitespace differences are NOT normalized
    val r = Dedup.exact(d.withColumn("text", lower(col("text")))).collect()
    assert(r.length == 2)
    val dup = r.find(_.getLong(2) == 2).get
    assert(dup.getLong(1) == 1L) // representative = min doc_id
  }

  test("jaccard and LSH both find a one-word-edit near-dup, not an unrelated doc") {
    val d = docs(
      (1L, base),
      (2L, base.replace("theta", "thetaX")),
      (3L, "completely different words entirely unrelated content here okay"))
    val jac = Dedup.jaccardPairs(d).collect()
    assert(jac.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(jac.head.getDouble(2) > 0.5 && jac.head.getDouble(2) < 1.0)
    val lsh = Dedup.lshPairs(d).collect()
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("fused shingle index matches the string pipeline row-for-row (df cap, h values)") {
    // the round-18 fusion computes h = hash32(g) INSIDE the one shingle
    // Generate and df-caps with a count window instead of the aggregate+
    // join-back — this pins that the surviving (doc, shingle) rows and
    // their minhash-input h are byte-identical to the string pipeline's
    val d = docs(
      (1L, base),
      (2L, base.replace("theta", "thetaX")),
      (3L, base + " " + base.replace("alpha", "alphaY")),
      (4L, "completely different words entirely unrelated content here okay"))
    val fused = Dedup.shingleIndex(d).select(col("doc_id"), col("h"))
    val str = Dedup.shingles(d)
      .select(col("doc_id"), graft.functions.Portable.hash32(col("g")).as("h"))
    assert(fused.exceptAll(str).isEmpty && str.exceptAll(fused).isEmpty,
      "fused index (doc_id, h) multiset must equal the string pipeline's")
    // and the df-annotated variant agrees with a recount of the capped set
    val viaAgg = Dedup.hashedShingles(d)
      .groupBy(col("g")).agg(count(lit(1)).as("df2"))
    val annotated = Dedup.hashedShinglesDf(d)
      .select(col("g"), col("df")).distinct()
    val joined = annotated.join(viaAgg, "g")
    assert(joined.filter(col("df") =!= col("df2")).isEmpty,
      "window df must equal the aggregate recount per shingle")
  }

  test("connected components: chain collapses to min label at fixed point") {
    val s = TestSpark.spark
    import s.implicits._
    // a 7-node path (worst diameter) plus a separate pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (10L, 11L))
      .toDF("ia", "ib")
    val labs = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(labs(_) == 1L))
    assert(labs(10L) == 10L && labs(11L) == 10L)
  }

  test("connected components: 50-link chain converges in O(log n) rounds") {
    val s = TestSpark.spark
    import s.implicits._
    // worst case for label propagation (diameter 50 would need ~51 rounds);
    // star contraction must collapse it in logarithmic rounds
    val chain = (1L until 51L).map(i => (i, i + 1)).toDF("ia", "ib")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    val labs = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.size == 51 && (1L to 51L).forall(labs(_) == 1L))
    assert(rounds <= 7, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("connected components: empty pair set yields empty labels, no NPE") {
    val s = TestSpark.spark
    import s.implicits._
    // a corpus with no near-dup pairs at all is a valid input: the first
    // convergence probe sees sum() over zero rows (NULL) and must converge
    // to an empty label set instead of NPE-ing on getLong
    val empty = Seq.empty[(Long, Long)].toDF("ia", "ib")
    assert(Dedup.connectedComponents(empty).collect().isEmpty)
  }

  test("redaction masks emails and phone runs, counts them, leaves clean text alone") {
    val d = docs(
      (1L, "mail a.b@x.org or +1-555-123-4567 and c@y.io now"),
      (2L, "no pii here at all"))
    val r = TextOps.redact(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L)._1 == 2 && r(1L)._2 == 1)
    assert(r(2L)._1 == 0 && r(2L)._2 == 0)
    // clean text's hash is the hash of the original
    val cleanMd5 = d.filter(col("doc_id") === 2)
      .select(md5(col("text"))).first().getString(0)
    assert(r(2L)._3 == cleanMd5)
  }

  test("repetition ratio: repeated sentence high, unique text zero, short text zero") {
    val d = docs(
      (1L, Seq.fill(10)("the cat sat here").mkString(" ")), // heavy repetition
      (2L, base),                                           // all-unique shingles
      (3L, "too short"))                                    // < n tokens
    val r = TextOps.repetition(d).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > 0.8)
    assert(r(2L) == 0.0)
    assert(r(3L) == 0.0)
  }

  test("repetition coverage: repeated 5-gram run covers the doc, top-bigram fraction hand-exact") {
    // 12 tokens 'a b c d e f a b c d e f': the 5-grams starting at 1..2
    // repeat at 7..8, so the positional union covers ALL 12 tokens →
    // dup5_frac = 1.0; every bigram occurs twice, tie-break (cnt desc, g
    // asc) picks 'a b': 2 occurrences × 2 chars / 12 chars = 0.3333
    val d = docs((1L, "a b c d e f a b c d e f"),
      (2L, "one two three four five six seven"), // no repeated 5-gram
      (3L, "x"), // sub-bigram doc pins both fractions through the 0 path
      (4L, "a a a")) // self-overlapping top bigram: coverage caps at 1.0
    val r = TextOps.repetitionCoverage(d)
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((0.3333, 1.0)), s"hand case diverged: ${r(1L)}")
    assert(r(2L)._2 == 0.0, s"unique text must have zero dup coverage: ${r(2L)}")
    assert(r(3L) == ((0.0, 0.0)), s"sub-bigram doc must pin to zero: ${r(3L)}")
    // positional union: 'a a' occurs twice over three tokens — the naive
    // count×len form would report 4/3; coverage must read exactly 1.0
    assert(r(4L)._1 == 1.0, s"self-overlap must not exceed 1.0: ${r(4L)}")
  }

  test("zipf report: geometric rank-frequency fits a negative slope, hapax and counts exact") {
    // counts 16/8/4/2/1 over 5 types: 31 tokens, one hapax
    val text = Seq.fill(16)("aa") ++ Seq.fill(8)("bb") ++ Seq.fill(4)("cc") ++
      Seq.fill(2)("dd") ++ Seq("ee")
    val d = docs((1L, text.mkString(" ")))
    val r = TextOps.zipfReport(d).collect().head
    assert(r.getLong(0) == 31 && r.getLong(1) == 5, s"token/type counts: $r")
    assert(r.getDouble(2) == 0.2, s"hapax fraction: $r")
    // log-log OLS of a strictly decreasing geometric profile is firmly
    // negative (hand value −1.6785 on these 5 points)
    assert(math.abs(r.getDouble(3) - -1.6785) < 0.001, s"zipf slope: $r")
  }

  test("simhash is order-insensitive; rolling fingerprint is order-sensitive") {
    val reordered = base.split(" ").reverse.mkString(" ")
    val d = docs((1L, base), (2L, reordered))
    val sim = Dedup.simhash(d).collect().map(_.getLong(1))
    assert(sim(0) == sim(1)) // same token multiset -> same simhash
    val fp = TextOps.fingerprint(d, col("text")).collect()
    assert(fp(0).getLong(2) != fp(1).getLong(2)) // position-weighted differs
    assert(fp(0).getString(1) != fp(1).getString(1)) // md5 differs too
  }

  test("tfidf ranks a document-specific rare term first") {
    val d = docs(
      (1L, "common common common uniqueterm"),
      (2L, "common common common"),
      (3L, "common common common"))
    val top = TextOps.tfidfTopK(d, 1).filter(col("doc_id") === 1).collect()
    assert(top.head.getString(2) == "uniqueterm")
  }

  test("bm25: tf saturates, length normalizes, absent terms exclude") {
    val d = docs(
      (1L, "spark alpha beta"),                       // short, one hit
      (2L, "spark " + Seq.fill(20)("filler").mkString(" ")), // long, one hit
      (3L, "spark spark spark alpha beta"),           // tf 3
      (4L, "alpha beta gamma"))                       // no query term
    val got = TextOps.bm25TopK(d, query = Seq("spark"), k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // higher tf wins, then the short doc beats the long one (dl norm);
    // the doc without the term never appears
    assert(got.toSeq == Seq((1, 3L), (2, 1L), (3, 2L)), s"got ${got.toSeq}")
  }

  test("bm25: a rare term outscores a ubiquitous one at equal tf and length") {
    val d = docs(
      (1L, "rareterm alpha beta"),
      (2L, "common alpha beta"),
      (3L, "common gamma delta"),
      (4L, "common epsilon zeta"))
    val got = TextOps.bm25TopK(d, query = Seq("rareterm", "common"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.head == ((1, 1L)), s"got ${got.toSeq}")
  }

  test("bm25 delete: the top hit tombstones away, survivors rescore under the pruned stats") {
    val d = docs(
      (1L, "spark spark spark alpha"),  // the undisputed top hit
      (2L, "spark beta gamma"),
      (3L, "spark delta epsilon"),
      (4L, "alpha beta gamma"))
    val idx = TextOps.buildBm25Index(d)
    val pruned = TextOps.deleteFromBm25Index(idx, col("doc_id") === 1)
    val got = TextOps.bm25FromIndex(pruned, query = Seq("spark"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(!got.exists(_._2 == 1L), s"deleted doc surfaced: ${got.toSeq}")
    // and the result equals a fresh build on the survivors (df/N/avgdl
    // all re-derived, not stale)
    val fresh = TextOps.bm25TopK(d.filter(col("doc_id") =!= 1), Seq("spark"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val gotFull = TextOps.bm25FromIndex(pruned, query = Seq("spark"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(gotFull.toSeq == fresh.toSeq, s"pruned=${gotFull.toSeq} fresh=${fresh.toSeq}")
  }

  test("phrase search: exact adjacency only, overlapping matches each count, order matters") {
    val d = docs(
      (1L, "alpha beta gamma"),        // one match
      (2L, "alpha beta alpha beta"),   // two disjoint matches
      (3L, "alpha alpha alpha"),       // self-overlap fixture (below)
      (4L, "beta alpha"),              // reversed order: no match
      (5L, "alpha gamma beta"))        // non-adjacent: no match
    val got = TextOps.phraseSearch(d, Seq("alpha", "beta")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L), s"got $got")
    // overlapping matches count individually: "alpha alpha alpha" has
    // TWO "alpha alpha" occurrences
    val ov = TextOps.phraseSearch(d, Seq("alpha", "alpha")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ov == Map(3L -> 2L), s"got $ov")
    // a 3-token phrase chains the join one more leg
    val tri = TextOps.phraseSearch(d, Seq("alpha", "beta", "gamma")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(1L -> 1L), s"got $tri")
    // single-term phrase degenerates to the posting count
    val one = TextOps.phraseSearch(d, Seq("alpha")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L, 5L -> 1L), s"got $one")
  }

  test("phrase match per-row expression equals the join form on the fixture corpus (the streaming-gate twin)") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    for (phrase <- Seq(Seq("window", "join"), Seq("window"),
        TextOps.PhraseQuery :+ "nosuchtoken")) {
      val viaJoin = TextOps.phraseSearch(docs, phrase).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val perRow = docs.select(col("doc_id"),
          TextOps.phraseMatchExpr(col("text"), phrase).as("m"))
        .filter(col("m") > 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(perRow == viaJoin, s"phrase $phrase: $perRow vs $viaJoin")
    }
  }

  test("proximity search: ordered window pairs, band boundaries exact, slop 1 is the bigram") {
    val d = docs(
      (1L, "alpha x x x x beta"),      // gap 5 == slop -> pair
      (2L, "alpha x x x x x beta"),    // gap 6 > slop  -> none
      (3L, "beta alpha"),              // reversed      -> none
      (4L, "alpha beta alpha beta"),   // pairs (0,1),(0,3),(2,3) at slop 5
      (5L, "alpha alpha beta"))        // two a's, one b in range -> 2
    val got = TextOps.proximitySearch(d, "alpha", "beta", slop = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 4L -> 3L, 5L -> 2L), s"got $got")
    // slop 1 degenerates to the exact bigram (phraseSearch agreement)
    val bg = TextOps.proximitySearch(d, "alpha", "beta", slop = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ph = TextOps.phraseSearch(d, Seq("alpha", "beta")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bg == ph, s"slop-1 $bg must equal the exact phrase $ph")
  }

  test("proximity match per-row expression equals the join form on the fixture corpus (the t48 streaming-gate twin)") {
    val s = TestSpark.spark
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    for ((a, b, slop) <- Seq(("window", "join", 5), ("window", "join", 1),
        ("window", "window", 3), ("join", "window", 5),
        ("window", "nosuchtoken", 5))) {
      val viaJoin = TextOps.proximitySearch(corpus, a, b, slop).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val perRow = corpus.select(col("doc_id"),
          TextOps.proximityMatchExpr(col("text"), a, b, slop).as("m"))
        .filter(col("m") > 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(perRow == viaJoin, s"($a,$b,$slop): $perRow vs $viaJoin")
    }
    // and slop-1 per-row agrees with the exact-bigram phrase expression
    val d = docs((1L, "alpha beta gamma alpha beta"), (2L, "beta alpha"))
    val prox1 = d.select(TextOps.proximityMatchExpr(col("text"),
      "alpha", "beta", 1).as("m")).collect().map(_.getLong(0)).toSeq
    val phr = d.select(TextOps.phraseMatchExpr(col("text"),
      Seq("alpha", "beta")).as("m")).collect().map(_.getLong(0)).toSeq
    assert(prox1 == phr && prox1 == Seq(2L, 0L), s"$prox1 vs $phr")
  }

  test("positional index lifecycle: saved serving, merge + compaction footers, tombstoned serving, in-place guard") {
    import scala.jdk.CollectionConverters._
    val s = TestSpark.spark
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val cut = corpus.count() * 4 / 5

    // serve-from-saved equals the in-lineage build, both query classes
    val full = java.nio.file.Files.createTempDirectory("graft-pos-full").toString
    val idx = TextOps.trainAndSavePositionalIndex(corpus, full)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(TextOps.phraseFromIndex(idx)) == m(TextOps.phraseSearch(corpus)),
      "saved phrase serving must equal the in-lineage build")
    assert(m(TextOps.proximityFromIndex(idx, "window", "join")) ==
      m(TextOps.proximitySearch(corpus, "window", "join")),
      "saved proximity serving must equal the in-lineage build")

    // two shard saves overlap in term range (the fragmented state a
    // merge leaves); compaction restores disjoint per-file footers
    val dirA = java.nio.file.Files.createTempDirectory("graft-pos-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-pos-b").toString
    TextOps.trainAndSavePositionalIndex(corpus.filter(col("doc_id") < cut), dirA)
    TextOps.trainAndSavePositionalIndex(corpus.filter(col("doc_id") >= cut), dirB)
    def fileRanges(dirs: String*): Seq[(String, String)] = {
      val conf = new org.apache.hadoop.conf.Configuration()
      dirs.flatMap(d => new java.io.File(s"$d/pos_postings").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .toSeq)
        .map { f =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try {
            val ss = rd.getFooter.getBlocks.asScala.toSeq.map(b =>
              b.getColumns.asScala.find(_.getPath.toDotString == "t").get.getStatistics)
            def str(x: Any) =
              x.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            (ss.map(st => str(st.genericGetMin)).min,
              ss.map(st => str(st.genericGetMax)).max)
          } finally rd.close()
        }
    }
    def overlaps(rs: Seq[(String, String)]): Boolean = {
      val sorted = rs.sortBy(_._1)
      sorted.zip(sorted.tail).exists { case (a, b) => b._1 < a._2 }
    }
    val frag = fileRanges(dirA, dirB)
    assert(frag.length >= 2 && overlaps(frag),
      s"the two shard saves must overlap in term range, or this pin is vacuous: $frag")
    val cDir = java.nio.file.Files.createTempDirectory("graft-pos-c").toString
    val compacted = TextOps.compactAndSavePositionalIndex(
      TextOps.mergePositionalIndexes(
        TextOps.loadPositionalIndex(s, dirA),
        TextOps.loadPositionalIndex(s, dirB)), cDir)
    assert(!overlaps(fileRanges(cDir)),
      s"compacted ranges must be disjoint: ${fileRanges(cDir)}")
    assert(m(TextOps.phraseFromIndex(compacted)) == m(TextOps.phraseSearch(corpus)),
      "compacted serve must equal the fresh full-corpus build")

    // tombstoned serving equals a fresh build on the survivors
    val deleted = corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id"))
    assert(m(TextOps.phraseFromIndex(
        TextOps.deleteListFromPositionalIndex(idx, deleted))) ==
      m(TextOps.phraseSearch(corpus.filter(col("doc_id") % 7 =!= 3))),
      "tombstoned serve must equal the survivor build")

    // in-place compaction refused before the artifact is touched
    val loaded = TextOps.loadPositionalIndex(s, dirA)
    val ex = intercept[IllegalArgumentException] {
      TextOps.compactAndSavePositionalIndex(loaded, dirA)
    }
    assert(ex.getMessage.contains("in-place"), ex.getMessage)
    assert(TextOps.phraseFromIndex(TextOps.loadPositionalIndex(s, dirA))
      .count() > 0, "guard must fire before the artifact is touched")
  }

  test("span-near: ordered chains only, gap boundary exact, multiplicity by chain, k=2 degenerates to proximity") {
    val d = docs(
      (1L, "a x x b x x c"),        // gaps 3,3 within 3 -> one chain
      (2L, "a x x x b c"),          // first gap 4 > 3 -> none
      (3L, "c b a"),                // reversed -> none
      (4L, "a b a b c"),            // chains: (0,1,4),(0,3,4),(2,3,4) -> 3
      (5L, "a b c b c"))            // (0,1,2),(0,1,4)? gap b@1->c@4 = 3 ok; (0,3,4) -> 3
    val got = TextOps.spanNearSearch(d, Seq("a", "b", "c"), gap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 4L -> 3L, 5L -> 3L), s"got $got")
    // k = 2 is exactly proximity
    val k2 = TextOps.spanNearSearch(d, Seq("a", "b"), gap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val prox = TextOps.proximitySearch(d, "a", "b", slop = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(k2 == prox, s"$k2 vs $prox")
    // in-lineage equals serve-from-saved on the fixture corpus
    val s = TestSpark.spark
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-spannear").toString
    val idx = TextOps.trainAndSavePositionalIndex(corpus, dir)
    val inline = TextOps.spanNearSearch(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val served = TextOps.spanNearFromIndex(idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inline.nonEmpty && inline == served, s"$inline vs $served")
  }

  test("span-near serve batch: every query equals the single-query chain, short chains exit early, rejects are the exact complement") {
    val s = TestSpark.spark
    import s.implicits._
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-sn-batch").toString
    val idx = TextOps.trainAndSavePositionalIndex(corpus, dir)
    val reqs = Seq(
      (1L, Seq("window", "join", "hash"), 8), // the t53 request verbatim
      (2L, Seq("window", "join"), 5),         // k=2: proximity semantics
      (3L, Seq("window", "join", "hash"), 3), // same chain, tighter gap
      (4L, Seq("the", "the"), 4),             // duplicate-term chain
      (5L, Seq("nosuchtoken", "join"), 8),    // first leg misses -> no rows
      (6L, Seq("window"), 8),                 // malformed: sub-2 chain
      (7L, Seq("window", "join"), 0))         // malformed: sub-1 gap
    val reqDf = reqs.toDF("query_id", "terms", "gap")
    val got = TextOps.spanNearServeBatch(reqDf, idx)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    reqs.foreach { case (qid, terms, gap) =>
      val single =
        if (terms.length < 2 || gap < 1) Map.empty[Long, Long] // dropped
        else TextOps.spanNearFromIndex(idx, terms, gap).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      val mine = got.collect { case ((q, d), n) if q == qid => d -> n }
      assert(mine == single, s"query $qid ($terms, $gap): $mine vs $single")
    }
    assert(got.exists { case ((q, _), _) => q == 1L },
      "the fixture chain must match somewhere")
    // the k=2 member equals the dedicated proximity server's answer
    val prox = TextOps.proximityFromIndex(idx, "window", "join", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.collect { case ((2L, d), n) => d -> n } == prox)
    // rejects are EXACTLY the malformed query_ids — the detection
    // channel that makes the drop distinguishable from zero matches
    val rej = TextOps.spanNearServeRejects(reqDf).collect().map(_.getLong(0))
    assert(rej.toSeq == Seq(6L, 7L), rej.toSeq.toString)
    // and the sibling rejects stay exact complements of their servers
    val preq = Seq((1L, "window", "join", 5), (2L, "window", "join", 0))
      .toDF("query_id", "a", "b", "slop")
    assert(TextOps.proximityServeRejects(preq).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val phreq = Seq(1L -> Seq("window"), 2L -> Seq.empty[String])
      .toDF("query_id", "phrase")
    assert(TextOps.phraseServeRejects(phreq).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // and the bm25 server carries the same contract: an empty term
    // array is dropped from serving and surfaced by its rejects
    val breq = Seq(1L -> Seq("window"), 2L -> Seq.empty[String])
      .toDF("query_id", "terms")
    val bm = TextOps.buildBm25Index(corpus)
    assert(TextOps.bm25ServeRejects(breq).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assert(TextOps.bm25ServeBatch(breq, bm).collect()
      .map(_.getLong(0)).toSet == Set(1L))
  }

  test("co-occurrence windows: any order counts, boundary exact, duplicates collapse, serve batch equals per-query, rejects exact") {
    val s = TestSpark.spark
    import s.implicits._
    val d = docs(
      (1L, "a x b"),        // win 3: starts 0 (a@0,b@2 in [0,3)) -> 1
      (2L, "b x a"),        // unordered: same count as doc 1
      (3L, "a x x b"),      // win 3: b@3 outside [0,3), a@0 outside [1,4)+ -> 0
      (4L, "a b a"),        // win 2: starts 0 (a@0,b@1) and 1 (b@1,a@2) -> 2
      (5L, "a x x"))        // b missing -> no row
    val got = TextOps.coocSearch(d, Seq("a", "b"), window = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 2L), s"got $got")
    val got2 = TextOps.coocSearch(d, Seq("a", "b"), window = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == Map(4L -> 2L), s"got $got2")
    // duplicate request terms collapse (set semantics)
    val dup = TextOps.coocSearch(d, Seq("a", "b", "a"), window = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dup == got, s"$dup vs $got")
    // the per-row twin agrees, including the zero rows the join omits
    val viaExpr = d.select(col("doc_id"),
        TextOps.coocMatchExpr(col("text"), Seq("a", "b"), 3).as("m"))
      .filter(col("m") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaExpr == got, s"$viaExpr vs $got")
    // null text scores 0, like the other per-row gates
    val nulls = docs((1L, null)).select(
      TextOps.coocMatchExpr(col("text"), Seq("a", "b"), 3)).collect()(0)
    assert(!nulls.isNullAt(0) && nulls.getLong(0) == 0L)

    // serve batch: every query equals the single-query form on the
    // fixture corpus; malformed requests drop into the rejects
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-cooc").toString
    val idx = TextOps.trainAndSavePositionalIndex(corpus, dir)
    val reqs = Seq(
      (1L, TextOps.CoocTerms, TextOps.CoocWindow),  // t57 verbatim
      (2L, Seq("window", "join"), 4),
      (3L, Seq("the", "a", "the"), 6),              // duplicates collapse
      (4L, Seq("nosuchtoken", "join"), 8),          // one term missing
      (5L, Seq("window", "window"), 8),             // 1 distinct: malformed
      (6L, Seq("window", "join"), 0))               // sub-1 window: malformed
    val reqDf = reqs.toDF("query_id", "terms", "win")
    val served = TextOps.coocServeBatch(reqDf, idx).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    reqs.foreach { case (qid, terms, win) =>
      val single =
        if (terms.distinct.length < 2 || win < 1) Map.empty[Long, Long]
        else TextOps.coocFromIndex(idx, terms, win).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      val mine = served.collect { case ((q, d0), n) if q == qid => d0 -> n }
      assert(mine == single, s"query $qid ($terms, $win): $mine vs $single")
    }
    assert(served.exists { case ((q, _), _) => q == 1L },
      "the fixture co-occurrence must match somewhere")
    assert(TextOps.coocServeRejects(reqDf).collect()
      .map(_.getLong(0)).toSeq == Seq(5L, 6L))
  }

  test("span-near per-row twin equals the join form; null text scores 0 across all three match exprs") {
    val d = docs(
      (1L, "a x x b x x c"),
      (2L, "a x x x b c"),
      (3L, "c b a"),
      (4L, "a b a b c"),
      (5L, "a b c b c"))
    val terms = Seq("a", "b", "c")
    val expr5 = d.select(col("doc_id"),
        TextOps.spanNearMatchExpr(col("text"), terms, gap = 3).as("m"))
      .filter(col("m") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val join5 = TextOps.spanNearSearch(d, terms, gap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(expr5 == join5, s"$expr5 vs $join5")
    // k = 2 degenerates to the proximity per-row twin
    val k2 = d.select(TextOps.spanNearMatchExpr(col("text"),
      Seq("a", "b"), gap = 3).as("m")).collect().map(_.getLong(0)).toSeq
    val prox = d.select(TextOps.proximityMatchExpr(col("text"),
      "a", "b", slop = 3).as("m")).collect().map(_.getLong(0)).toSeq
    assert(k2 == prox, s"$k2 vs $prox")
    // and on the fixture corpus the twin agrees with t53's chain form
    val s = TestSpark.spark
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val exprC = corpus.select(col("doc_id"),
        TextOps.spanNearMatchExpr(col("text")).as("m"))
      .filter(col("m") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val joinC = TextOps.spanNearSearch(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exprC.nonEmpty && exprC == joinC)
    // null text scores 0 (not null) in every per-row gate — the join
    // forms emit no row, and a gate summing the count must agree
    val nd = docs((1L, null), (2L, "a b c"))
    val row = nd.filter(col("doc_id") === 1L).select(
      TextOps.phraseMatchExpr(col("text"), Seq("a", "b")).as("ph"),
      TextOps.proximityMatchExpr(col("text"), "a", "b", 3).as("pr"),
      TextOps.spanNearMatchExpr(col("text"), Seq("a", "b", "c"), 3).as("sn"))
      .collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) == 0L, "phrase null-text")
    assert(!row.isNullAt(1) && row.getLong(1) == 0L, "proximity null-text")
    assert(!row.isNullAt(2) && row.getLong(2) == 0L, "span-near null-text")
  }

  test("phrase serve batch: every query equals the single-query join chain; offset coverage handles duplicate terms and misses") {
    val s = TestSpark.spark
    import s.implicits._
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-pos-batch").toString
    val idx = TextOps.trainAndSavePositionalIndex(corpus, dir)
    val phrases = Seq(
      1L -> TextOps.PhraseQuery,          // the t49 query verbatim
      2L -> Seq("window"),                // single term = posting count
      3L -> Seq("the", "the"),            // duplicate phrase terms
      4L -> Seq("nosuchtoken", "window")) // one leg misses -> no rows
    val got = TextOps.phraseServeBatch(
        phrases.toDF("query_id", "phrase"), idx)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    phrases.foreach { case (qid, ph) =>
      val single = TextOps.phraseFromIndex(idx, ph).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val mine = got.collect { case ((q, d), n) if q == qid => d -> n }
      assert(mine == single, s"query $qid ($ph): $mine vs $single")
    }
    // and the house per-row twin agrees with query 3's duplicate-term
    // coverage (the subtle case: one posting row serves two offsets)
    val dup = corpus.select(col("doc_id"),
        TextOps.phraseMatchExpr(col("text"), Seq("the", "the")).as("m"))
      .filter(col("m") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.collect { case ((3L, d), n) => d -> n } == dup)

    // the proximity batch: mixed slops and same-term requests each
    // equal the single-query banded form
    val preq = Seq(
      (1L, "window", "join", 5),  // the t52 request verbatim
      (2L, "window", "join", 1),  // slop 1 = exact bigram
      (3L, "the", "the", 3),      // a == b
      (4L, "nosuchtoken", "join", 5),
      (5L, "window", "join", 0))  // malformed: dropped, never div-by-zero
    val pgot = TextOps.proximityServeBatch(
        preq.toDF("query_id", "a", "b", "slop"), idx)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    preq.foreach { case (qid, a, b, slop) =>
      val single =
        if (slop < 1) Map.empty[Long, Long] // dropped, not served
        else TextOps.proximityFromIndex(idx, a, b, slop).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      val mine = pgot.collect { case ((q, d), n) if q == qid => d -> n }
      assert(mine == single, s"query $qid ($a,$b,$slop): $mine vs $single")
    }
  }

  test("bm25 compaction: merged-index fragmentation healed, per-file term ranges disjoint again, serving hash-matches the fresh build") {
    import scala.jdk.CollectionConverters._
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val cut = docs.count() * 4 / 5
    val dirA = java.nio.file.Files.createTempDirectory("graft-bm25cmp-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-bm25cmp-b").toString
    TextOps.trainAndSaveBm25Index(docs.filter(col("doc_id") < cut), dirA)
    TextOps.trainAndSaveBm25Index(docs.filter(col("doc_id") >= cut), dirB)

    def tableRanges(sub: String, dirs: String*): Seq[(String, String)] = {
      val conf = new org.apache.hadoop.conf.Configuration()
      dirs.flatMap(d => new java.io.File(s"$d/$sub").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .toSeq)
        .map { f =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try {
            val ss = rd.getFooter.getBlocks.asScala.toSeq.map(b =>
              b.getColumns.asScala.find(_.getPath.toDotString == "t").get.getStatistics)
            def str(x: Any) =
              x.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            (ss.map(st => str(st.genericGetMin)).min,
              ss.map(st => str(st.genericGetMax)).max)
          } finally rd.close()
        }
    }
    def overlaps(rs: Seq[(String, String)]): Boolean = {
      val sorted = rs.sortBy(_._1)
      sorted.zip(sorted.tail).exists { case (a, b) => b._1 < a._2 }
    }
    // the fragmented state a t34 merge leaves on disk: each shard save is
    // t-sorted INTERNALLY, but both span the vocabulary, so term ranges
    // overlap across the union's files — the seek path degrades
    def fileRanges(dirs: String*): Seq[(String, String)] =
      tableRanges("bm25_postings", dirs: _*)
    val frag = fileRanges(dirA, dirB)
    assert(frag.length >= 2 && overlaps(frag),
      s"the two shard saves must overlap in term range, or this pin is vacuous: $frag")

    val cDir = java.nio.file.Files.createTempDirectory("graft-bm25cmp-c").toString
    val compacted = TextOps.compactAndSaveBm25Index(TextOps.mergeBm25Indexes(
      TextOps.loadBm25Index(s, dirA), TextOps.loadBm25Index(s, dirB)), cDir)
    // healed: per-file ranges are disjoint again (a term's posting list
    // straddles a boundary only as a shared endpoint, never an interior)
    val comp = fileRanges(cDir)
    assert(!overlaps(comp), s"compacted ranges must be disjoint: $comp")
    // the STATS table honors the same layout contract (round 16: the
    // pricing/scoring df scans push term IN-lists into it too) — both
    // at train time and after compaction
    assert(!overlaps(tableRanges("bm25_stats", dirA)),
      "trained stats footers must be t-disjoint")
    assert(!overlaps(tableRanges("bm25_stats", cDir)),
      "compacted stats footers must be t-disjoint")
    // and compaction moved data only: serving equals the fresh build
    val fresh = TextOps.bm25TopK(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val served = TextOps.bm25FromIndex(compacted).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == fresh, s"compacted serve diverged:\n$served\nvs\n$fresh")

    // in-place compaction refused BEFORE any delete: mode-overwrite would
    // drop dirA while the lazy postings read still points at it,
    // destroying the artifact mid-job — the guard aborts with the load
    // dir intact and the index still servable
    val loaded = TextOps.loadBm25Index(s, dirA)
    val ex = intercept[IllegalArgumentException] {
      TextOps.compactAndSaveBm25Index(loaded, dirA)
    }
    assert(ex.getMessage.contains("in-place"), ex.getMessage)
    assert(TextOps.bm25FromIndex(TextOps.loadBm25Index(s, dirA)).count() > 0,
      "guard must fire before the artifact is touched")
  }

  test("ct langid: profiles separate crafted languages; prediction reads the text, not the label") {
    val s = TestSpark.spark
    import s.implicits._
    // two 'languages' with disjoint character distributions; doc 99 is
    // mislabeled ita but WRITTEN in ger — the profile must out it
    val ger = Seq("schwarz strasse durch schnell", "zwischen schreiben strauch",
      "durch schwer strasse zwischen")
    val ita = Seq("perche della quando famiglia", "bellissimo ragazzo della",
      "quando perche famiglia della")
    val rows = ger.zipWithIndex.map { case (t, i) => (i.toLong, t, "ger") } ++
      ita.zipWithIndex.map { case (t, i) => (10L + i, t, "ita") } :+
      (99L, "strasse durch schwarz schnell", "ita")
    val d = rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("x")).withColumn("n_chars", length(col("text")))
    val got = TextOps.ctLangId(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(3))).toMap
    assert((0 until 3).forall(i => got(i.toLong) == ("ger", true)), s"$got")
    assert((10 until 13).forall(i => got(i.toLong) == ("ita", true)), s"$got")
    assert(got(99L) == ("ger", false), s"mislabeled doc must be outed by its text: $got")
  }

  test("rake: stopword-delimited phrases, degree/freq hand-exact, long phrases win") {
    // stops 'of'/'and' split 3 phrases; degree: deep 2+3, learning 2+2,
    // convolutional/networks 3, fast 2 -> phrase sums 8.5 / 4.5 / 4.0
    val d = docs((1L, "deep learning of deep convolutional networks and fast learning"))
    val got = TextOps.rakePhrases(d).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, "deep convolutional networks", 8.5),
      (2, "deep learning", 4.5),
      (3, "fast learning", 4.0)), s"got ${got.toSeq}")
  }

  test("hybrid rrf: both-list docs beat single-list docs, absent docs never fuse in") {
    val s = TestSpark.spark
    import s.implicits._
    // lexical ranks for 'spark': doc 2 (tf 3) -> 1, doc 1 -> 2, doc 3 absent.
    val d = docs((1L, "spark alpha"), (2L, "spark spark spark"), (3L, "beta gamma"))
    // dense ranks for query vec 0: vec 1 (identical) -> 1, vec 3 -> 2,
    // vec 2 (orthogonal) -> outside k=2. vec_id ≡ doc_id.
    val e = Seq(
      (0L, "q", Array(1.0f, 0.0f)),
      (1L, "x", Array(1.0f, 0.0f)),
      (2L, "x", Array(0.0f, 1.0f)),
      (3L, "x", Array(0.9f, 0.1f))).toDF("vec_id", "label", "embedding")
    val got = TextOps.hybridRrf(d, e, query = Seq("spark"), k = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(3)).map(_.toString.toInt), Option(r.get(4)).map(_.toString.toInt)))
    // doc 1 (lex 2 + dense 1 = 1/62 + 1/61) beats doc 2 (lex 1 ONLY =
    // 1/61) — presence in both towers outranks winning one; doc 3
    // (dense 2 only = 1/62) is cut at k, and doc 2's orthogonal vector
    // proves a tower miss costs exactly its contribution, nothing else
    assert(got.toSeq == Seq((1, 1L, Some(2), Some(1)), (2, 2L, Some(1), None)),
      s"got ${got.toSeq}")
  }

  test("langId picks the language with most marker hits, alphabetical ties") {
    val d = docs((1L, "the a value value"), (2L, "spark stream batch batch"))
    val r = TextOps.langId(d, col("text")).orderBy(col("doc_id")).collect()
    assert(r(0).getString(1) == "en")
    assert(r(1).getString(1) == "zh")
    // no markers at all -> all scores zero -> alphabetically first language
    val none = TextOps.langId(docs((9L, "zzz yyy xxx")), col("text")).collect()
    assert(none.head.getString(1) == "de")
  }

  test("edit-distance pairs respect the blocking key") {
    val d = docs(
      (1L, base), (2L, base.replace("kappa", "kapqa")),
      (3L, "different-prefix " + base)) // same content, different block
    val r = Dedup.editDistancePairs(d).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("boilerplate fraction: templated shingles score, unique text scores zero") {
    val boiler = "click here to subscribe to our newsletter today"
    // the template appears in 5 docs (> BoilerplateDocFreq=3); each doc
    // adds a unique tail so the docs are NOT near-dup identical
    val d = docs((1L to 5L).map(i =>
      i -> s"$boiler unique$i tail$i words$i here$i now$i"): _*)
      .union(docs((9L, base)))
    val r = Dedup.boilerplateFraction(d).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // templated docs: the shared shingles exceed the DF threshold
    (1L to 5L).foreach(i => assert(r(i) > 0.3, s"doc $i frac ${r(i)}"))
    // fully unique text: nothing repeats
    assert(r(9L) == 0.0)
  }

  test("bigram surprisal charges scrambled word order; unigram surprisal cannot see it") {
    val fluent = "the quick brown fox jumps over the lazy dog"
    val shuffled = "dog the over quick lazy jumps brown the fox" // same bag of words
    // several fluent copies make the fluent TRANSITIONS probable under
    // the corpus bigram model; the shuffled doc uses the same words in
    // transitions the model has never seen
    val d = docs((1L, fluent), (2L, fluent), (3L, fluent), (4L, shuffled))
    def score(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = score(TextOps.bigramSurprisal(d))
    assert(bi(4L) > bi(1L),
      s"shuffled transitions must surprise the bigram model: ${bi(4L)} vs ${bi(1L)}")
    // the unigram model sees identical bags of words — identical score;
    // this gap is exactly why the pipeline wants the higher-order model
    val uni = score(TextOps.unigramSurprisal(d))
    assert(math.abs(uni(4L) - uni(1L)) < 1e-9,
      s"unigram model must be order-blind: ${uni(4L)} vs ${uni(1L)}")
  }

  test("interpolated surprisal: unseen bigram backs off to the unigram channel") {
    // model: 'dog' is common, 'cat' rare; NO bigram starts with 'purple'
    val model = docs((1L, "dog dog dog dog dog dog dog cat"))
    // cu: dog=7 cat=1; N=8 V=2 — both scored bigrams are unseen (cg=0,
    // cpre=0), so the pure add-one bigram penalty is the flat floor
    // -log2(1/(0+V)) = 1.0 bits for BOTH docs
    val scored = docs((10L, "purple dog"), (11L, "purple cat"))
    val r = TextOps.interpolatedSurprisalAgainst(model, scored).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // 'purple dog': p = λ·(1/2) + (1−λ)·((7+1)/(8+2)) = 0.575
    val expDog = -math.log(0.75 * 0.5 + 0.25 * 0.8) / math.log(2)
    assert(math.abs(r(10L) - expDog) < 1e-3, s"got ${r(10L)}, want ~$expDog")
    // the backoff BEATS the flat add-one floor when the successor is a
    // common word — that's the whole point of interpolating
    assert(r(10L) < 1.0, s"unseen bigram must back off below the 1.0-bit floor: ${r(10L)}")
    // ...and only for common successors: a rare successor stays expensive,
    // so the model still separates normal words in new contexts from noise
    assert(r(11L) > 1.0 && r(10L) < r(11L),
      s"rare successor must stay above the floor: dog=${r(10L)} cat=${r(11L)}")
  }

  test("cross-doc substring spans cover exactly the planted shared run, nothing else") {
    // a 12-token run planted inside two otherwise-disjoint documents; a
    // third document shares nothing. N=10 windows: a 12-token shared run
    // is covered by its 3 shared windows -> exactly 12 positions per doc.
    val run = "one two three four five six seven eight nine ten eleven twelve"
    val d = docs(
      (1L, s"prefixa prefixb $run sufa sufb sufc"),
      (2L, s"intro1 intro2 intro3 $run tail1"),
      (3L, "totally unrelated filler words padding content nothing shared " +
        "here at all keeps going longer than ten tokens easily"))
    val r = Dedup.substrSpans(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((17L, 12L, 0.7059)), s"doc 1: ${r(1L)}")
    assert(r(2L) == ((16L, 12L, 0.75)), s"doc 2: ${r(2L)}")
    assert(r(3L)._2 == 0L && r(3L)._3 == 0.0, s"doc 3 must be untouched: ${r(3L)}")
    // within-doc repetition alone is NOT cross-doc: one doc repeating its
    // own run twice gains no coverage (p8/t8 own that case)
    val selfRep = docs((7L, s"$run again $run"), (8L, "nothing in common whatsoever " +
      "more unrelated words to clear the minimum window width for grams"))
    val r2 = Dedup.substrSpans(selfRep).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r2(7L) == 0L, s"self-repetition must not count as cross-doc: ${r2(7L)}")
  }

  test("shard substr coverage: saved gram index marks cross-corpus runs; within-shard repeats count too") {
    val run = "one two three four five six seven eight nine ten eleven twelve"
    val srun = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val dir = java.nio.file.Files.createTempDirectory("graft-substridx").toString
    // index: one doc holding the run
    Dedup.buildAndSaveSubstrIndex(
      docs((1L, s"prefixa prefixb $run sufa sufb sufc")), dir)
    val idx = Dedup.loadSubstrIndex(TestSpark.spark, dir)
    val shard = docs(
      // carries the indexed run -> 12 covered positions, corpus never re-read
      (10L, s"intro1 intro2 intro3 $run tail1"),
      // a shard-internal pair sharing srun -> covered by the >=2-docs rule
      (11L, s"$srun closing1 closing2"),
      (12L, s"opener1 $srun"),
      // nothing shared anywhere
      (13L, "totally unrelated filler words padding content nothing shared " +
        "here at all keeps going longer than ten tokens easily"))
    val r = Dedup.shardSubstrSpans(shard, idx).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.keySet == Set(10L, 11L, 12L, 13L), "shard-only rows")
    assert(r(10L) == ((16L, 12L)), s"cross-corpus run covered: ${r(10L)}")
    assert(r(11L) == ((14L, 12L)), s"within-shard run covered: ${r(11L)}")
    assert(r(12L) == ((13L, 12L)), s"within-shard partner covered: ${r(12L)}")
    assert(r(13L)._2 == 0L, s"unrelated doc untouched: ${r(13L)}")
  }

  test("substr cut excises exactly the planted shared run, keeps unique prose in order") {
    // same planted-run shape as the coverage test: the cut must remove
    // ONLY the 12 shared positions and re-join the survivors in order
    val run = "one two three four five six seven eight nine ten eleven twelve"
    val d = docs(
      (1L, s"prefixa prefixb $run sufa sufb sufc"),
      (2L, s"intro1 intro2 intro3 $run tail1"),
      (3L, "totally unrelated filler words padding content nothing shared " +
        "here at all keeps going longer than ten tokens easily"))
    val r = Dedup.substrCut(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((17L, 12L, "prefixa prefixb sufa sufb sufc")), s"doc 1: ${r(1L)}")
    assert(r(2L) == ((16L, 12L, "intro1 intro2 intro3 tail1")), s"doc 2: ${r(2L)}")
    assert(r(3L)._2 == 0L, s"doc 3 must be untouched: ${r(3L)}")
    // a doc that IS the shared run is cut to empty text, not dropped
    val full = docs((4L, run), (5L, s"$run extra"), (6L, "padding so the " +
      "corpus keeps one doc with nothing shared across documents at all"))
    val r2 = Dedup.substrCut(full).collect()
      .map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r2(4L) == "", s"fully-duplicated doc must become empty: '${r2(4L)}'")
    assert(r2(5L) == "extra", s"doc 5: '${r2(5L)}'")
  }

  test("stupid backoff walks the chain trigram -> bigram -> unigram with alpha discounts") {
    // model: "the cat sat on the mat" — N=6 tokens, V=5 vocab
    val model = docs((0L, "the cat sat on the mat"))
    def sb(text: String): Double =
      TextOps.stupidBackoffAgainst(model, docs((1L, text))).collect()
        .map(r => r.getDouble(2)).head
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // attested trigram: S = c(the cat sat)/c(the cat) = 1/1 -> 0 bits
    assert(sb("the cat sat") == 0.0)
    // unseen trigram, attested suffix bigram: S = a*c(cat sat)/c(cat) = 0.4
    assert(sb("dog cat sat") == r4(-math.log(0.4) / math.log(2)))
    // unseen trigram AND bigram: S = a^2 * (c(w3)+1)/(N+V); w3 unseen -> add-one floor
    assert(sb("dog mat zzz") == r4(-math.log(0.4 * 0.4 * 1.0 / 11.0) / math.log(2)))
    // ...and a seen w3 pays less than an unseen one through the same floor
    assert(sb("dog zzz the") == r4(-math.log(0.4 * 0.4 * 3.0 / 11.0) / math.log(2)))
  }

  test("kneser-ney: continuation count, not raw frequency, sets the backoff cost") {
    // model: "francisco" and "cat" are EQUALLY frequent (4 each), but
    // francisco follows only "san" (1 continuation type) while cat follows
    // a/b/c/d (4 types). After an unseen history both back off to P_cont:
    // KN charges the predictable-but-frequent word MORE.
    val model = docs(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "a cat b cat c cat d cat"))
    def kn(text: String): Double =
      TextOps.knAgainst(model, docs((10L, text))).collect().head.getDouble(2)
    assert(kn("zzz francisco") > kn("zzz cat"),
      "low-fertility word must cost more bits through the backoff")
    // ...where t20's raw-unigram backoff channel provably can't tell them apart
    def jm(text: String): Double =
      TextOps.interpolatedSurprisalAgainst(model, docs((10L, text))).collect()
        .head.getDouble(2)
    assert(jm("zzz francisco") == jm("zzz cat"),
      "the unigram channel sees equal counts — the KN distinction is real")
  }

  test("kneser-ney: hand-computed discount + backoff mass on a two-bigram model") {
    // model "a b a b": c(a b)=2, c(b a)=1, c(a)=c(b)=2, B=2, V=2
    // P(b|a) = max(2-0.75,0)/2 + 0.75*(1/2)*P_cont(b)
    // P_cont(b) = (N1+(.,b)+1)/(B+V) = (1+1)/4 = 0.5  ->  P = 0.8125
    val model = docs((0L, "a b a b"))
    val r = TextOps.knAgainst(model, docs((1L, "a b"))).collect().head
    assert(r.getLong(1) == 1L)
    val expected = BigDecimal(-math.log(0.8125) / math.log(2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == expected, s"got ${r.getDouble(2)}, want $expected")
  }

  test("saved LSH index dedups a shard: cross-corpus and within-shard pairs, at shard cost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx").toString
    // indexed corpus: base + an unrelated doc
    val old = docs(
      (1L, base),
      (2L, "completely different words entirely unrelated content here okay"))
    Dedup.buildAndSaveLshIndex(old, dir)
    val idx = Dedup.loadLshIndex(TestSpark.spark, dir)
    // shard: a one-word edit of doc 1 (cross-corpus near-dup), a fresh
    // pair of near-identical docs (within-shard), and an unrelated doc
    val other = "orange banana cherry date elderberry fig grape honeydew " +
      "kiwi lemon mango nectarine papaya quince raspberry strawberry"
    val shard = docs(
      (10L, base.replace("theta", "thetaX")),
      (11L, other),
      (12L, other + " tangerine"),
      (13L, "nothing in common with anything else at all in this corpus"))
    val pairs = Dedup.shardLshPairs(shard, idx).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (11L, 12L)),
      s"got ${pairs.map(r => (r.getLong(0), r.getLong(1))).toSet}")
    assert(pairs.forall(r => r.getDouble(2) >= Dedup.JaccardThreshold &&
      r.getDouble(2) < 1.0))
  }

  test("incremental label update: shard joins clusters, and a bridge doc merges two of them") {
    // 27 distinct words; X = w1..w20, Y = w8..w27 share an 11-shingle run
    // (J(X,Y)=11/25=0.44 — below threshold, so A and B stay separate),
    // and the shard's bridge = w1..w27 covers both (J=18/25=0.72 each)
    // word list chosen so every REQUIRED band collision occurs (banding
    // at J=0.72 collides with p≈0.7 — a fixture has to pick hashes that
    // do; verified offline with the portable hash32/minhash recipe)
    val w = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
      "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega aleph " +
      "vex troll").split(" ")
    assert(w.length == 27)
    val x = w.slice(0, 20).mkString(" ")
    val y = w.slice(7, 27).mkString(" ")
    val bridge = w.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx2").toString
    val old = docs(
      (1L, x), (2L, x.replace("kappa", "kappaX")),       // cluster A -> 1
      (3L, y), (4L, y.replace("sigma", "sigmaX")),       // cluster B -> 3
      (5L, "totally unrelated content words here that match nothing else"))
    Dedup.buildAndSaveLshIndex(old, dir)
    val idx = Dedup.loadLshIndex(TestSpark.spark, dir)
    Dedup.clusterIndexAndSave(idx, s"$dir/labels")
    val oldLabs = Dedup.loadClusters(TestSpark.spark, s"$dir/labels")
    assert(oldLabs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L),
      "A and B must start as separate clusters")
    val shard = docs((10L, bridge))
    val updated = Dedup.shardUpdateClusters(shard, idx, oldLabs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the bridge pairs with members of BOTH clusters -> one merged
    // component labeled by the global min
    assert(updated == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 1L),
      s"got $updated")
  }

  test("simhash pairs are EXACT within the Hamming radius: banding equals brute force") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    // the per-row fold (streaming form) IS the batch aggregate
    val perRow = docs
      .withColumn("w", graft.functions.Portable.tokens(col("text")))
      .withColumn("th", transform(col("w"), t => graft.functions.Portable.hash32(t)))
      .select(col("doc_id"), Dedup.simhashExpr(col("th")).as("simhash"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(perRow == Dedup.simhash(docs).collect().map(_.toSeq).toSeq)
    val sims = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute-force ground truth over every pair
    val brute = (for {
      (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= Dedup.HammingMax
    } yield (ia, ib, h)).toSet
    val banded = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the pigeonhole argument is a guarantee, not a probability: 3
    // differing bits cannot corrupt all 4 byte-bands
    assert(banded == brute,
      s"banding must find exactly the brute-force pairs: missing=${brute -- banded} extra=${banded -- brute}")
    assert(brute.nonEmpty, "fixture must contain at least one close pair, or the pin is vacuous")
  }

  test("drift report: a source with new vocabulary scores higher under the stale model") {
    val s = TestSpark.spark
    import s.implicits._
    val stableText = "the cat sat on the mat and the dog ran off"
    val d = Seq(
      (0L, stableText, "stable"), (1L, stableText, "stable"),
      (2L, stableText, "stable"), (3L, stableText, "stable"),
      // yesterday's model never saw this vocabulary
      (4L, "quantum flux capacitors entangle superconducting qubit arrays", "shifted"),
      (5L, stableText, "stable"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    TextOps.trainAndSaveSurprisalModel(d.filter(col("doc_id") < 4), dir)
    val r = TextOps.surprisalDrift(d, TextOps.loadSurprisalModel(s, dir))
      .collect().map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(r("shifted") > r("stable"),
      s"new vocabulary must drift: $r")
    assert(r("shifted") > 0.0,
      s"shifted tokens hit the stale add-one floor — drift must be positive: $r")
    assert(math.abs(r("stable")) < 0.5,
      s"an unchanged source must sit near zero drift: $r")
  }

  test("quality classifier: the driver solve is exact, and training separates the planted signal") {
    // hand-checked SPD solve: H=[[4,2],[2,3]], g=(10,8) -> δ=(1.75, 1.5)
    val d = Classifier.solveSpd(
      Array(Array(4.0, 2.0), Array(2.0, 3.0)), Array(10.0, 8.0))
    assert(math.abs(d(0) - 1.75) < 1e-4 && math.abs(d(1) - 1.5) < 1e-4,
      s"solve: ${d.toSeq}")

    // planted separable corpus: en docs are stopword-rich, others not —
    // two IRLS steps must rank every en doc above every non-en doc
    val s = TestSpark.spark
    import s.implicits._
    val en = "the cat and the dog sat in the big house of it all day long"
    val xx = "chat maison rouge bleu vert jaune montagne riviere soleil lune"
    val docs = Seq(
      (0L, en, "en"), (1L, en + " again today", "en"), (2L, "the fish and it", "en"),
      (3L, xx, "xx"), (4L, xx + " encore", "xx"), (5L, "montagne soleil", "xx"))
      .toDF("doc_id", "text", "lang")
    val r = Classifier.qualityClassifier(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val enMin = Seq(0L, 1L, 2L).map(r).min
    val xxMax = Seq(3L, 4L, 5L).map(r).max
    assert(enMin > xxMax,
      s"the learned filter must separate the slices: en>=$enMin xx<=$xxMax ($r)")
  }

  test("dup-rate by source counts exactly the non-canonical cluster members") {
    val s = TestSpark.spark
    import s.implicits._
    // src_a: two identical docs (one cluster, one non-canonical);
    // src_b: a unique doc — rate 0
    val d = Seq(
      (1L, base, "src_a"), (2L, base, "src_a"),
      (3L, "totally different words entirely unrelated content here now", "src_b"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.dupRateBySource(d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("src_a") == ((2L, 1L)), s"src_a ${r("src_a")}")
    assert(r("src_b") == ((1L, 0L)), s"src_b ${r("src_b")}")
  }

  test("quality-ranked canonical keeps the cluster's best-scoring member, min id on ties") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq(
      // cluster {1,2}: doc 2 is all stopwords — far higher quality score
      (1L, "alpha beta gamma", "src"),
      (2L, "the a of and", "src"),
      // cluster {3,4}: identical text — identical score, tie -> min id
      (3L, "same same words here", "src"),
      (4L, "same same words here", "src"),
      (5L, "untouched singleton document", "src"))
      .toDF("doc_id", "text", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster")
    val keep = Dedup.bestQualityCorpusFrom(d, clusters).collect().map(_.getLong(0))
    assert(keep.toSeq == Seq(2L, 3L, 5L),
      s"expected best-quality 2, tie-min 3, singleton 5 — got ${keep.toSeq}")
  }

  test("split leakage: a cluster straddling splits is leaky, a same-split cluster is not") {
    val s = TestSpark.spark
    import s.implicits._
    // split assignments fixed by the content hash: the first/third/fourth
    // texts land in train, the second in test (verified against the
    // oracle's md5 arithmetic)
    val d = Seq(
      (1L, "alpha beta gamma one"),   // train
      (2L, "delta epsilon zeta"),     // test
      (3L, "alpha beta gamma two"),   // train
      (4L, "alpha beta gamma three")) // train
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster")
    val r = Dedup.splitLeakage(d, clusters).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getBoolean(4)))).toMap
    assert(r(1L) == ((2L, 2L, "test,train", true)), s"$r")
    assert(r(3L) == ((2L, 1L, "train", false)), s"$r")
  }

  test("gopher rules: each planted defect trips exactly its own rule") {
    val s = TestSpark.spark
    import s.implicits._
    val good = ((1 to 58).map(i => s"word$i") ++ Seq("the", "a")).mkString(" ")
    val short = "the a tiny doc"                                   // n_ok fails
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ")      // stop_ok fails
    val repeated = (Seq.fill(30)("spam") ++ (1 to 28).map(i => s"word$i")
      ++ Seq("the", "a")).mkString(" ")                            // rep_ok fails
    val digits = ((1 to 58).map(i => s"$i$i$i") ++ Seq("the", "a")).mkString(" ")
    val longWords = ((1 to 58).map(i => s"extraordinarily$i") ++ Seq("the", "a"))
      .mkString(" ")                                               // wordlen_ok fails
    val d = Seq((1L, good), (2L, short), (3L, noStops), (4L, repeated),
      (5L, digits), (6L, longWords)).toDF("doc_id", "text")
    val r = TextOps.gopherRules(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    def rules(id: Long) = Seq("n_ok", "wordlen_ok", "alpha_ok", "stop_ok", "rep_ok")
      .map(c => c -> r(id).getAs[Boolean](c)).toMap
    assert(r(1L).getAs[Boolean]("pass"), s"good doc must pass: ${rules(1L)}")
    assert(!rules(2L)("n_ok") && !r(2L).getAs[Boolean]("pass"))
    assert(!rules(3L)("stop_ok") && rules(3L)("n_ok"))
    assert(!rules(4L)("rep_ok") && rules(4L)("stop_ok"))
    // digit-run tokens contain no [a-z]: alpha fails (stopwords still present)
    assert(!rules(5L)("alpha_ok") && rules(5L)("stop_ok"))
    assert(!rules(6L)("wordlen_ok") && rules(6L)("alpha_ok"))
  }

  test("char entropy: uniform alphabet hits log2(k), constant run is zero, skew sits between") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq(
      (1L, "abcd"),      // 4 distinct, uniform -> exactly 2 bits
      (2L, "aaaaaa"),    // one symbol -> 0 (and +0.0, not -0.0)
      (3L, "aab")        // 2/3, 1/3 -> ~0.9183
    ).toDF("doc_id", "text")
    val r = TextOps.charEntropy(d).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 2.0, s"$r")
    assert(r(2L) == 0.0 && !r(2L).equals(-0.0), s"$r")
    assert(r(3L) == 0.9183, s"$r")
  }

  test("hashed features: order-invariant, sign-coherent, buckets from the token hash") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq((1L, "alpha beta gamma alpha"), (2L, "gamma alpha alpha beta"),
      (3L, "alpha alpha alpha")).toDF("doc_id", "text")
    val r = TextOps.hashedFeatures(d).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val byDoc = r.groupBy(_._1._1)
      .map { case (id, m) => id -> m.map { case ((_, b), w) => b -> w } }
    // same multiset of tokens => identical vector, whatever the order
    assert(byDoc(1L) == byDoc(2L), s"order must not matter: ${byDoc(1L)} vs ${byDoc(2L)}")
    // one distinct token repeated k times: a single bucket at weight +/-k
    assert(byDoc(3L).size == 1 && math.abs(byDoc(3L).head._2) == 3L, s"${byDoc(3L)}")
    // the bucket is hash32(token) mod buckets — recompute independently
    val h = d.sparkSession.range(1)
      .select(graft.functions.Portable.hash32(lit("alpha")).as("h"))
      .head().getLong(0)
    assert(byDoc(3L).head._1 == h % TextOps.HashFeatBuckets)
  }

  test("containment: a quoted-whole short doc is caught directed, invisible to Jaccard") {
    val s = TestSpark.spark
    import s.implicits._
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 12).map(i => s"filler$i").mkString(" ")
    val d = Seq((1L, short), (2L, long),
      (3L, "completely unrelated other text body")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)),
      s"expected only the directed short→long row: ${cont.toSeq}")
    // the same pair is below the symmetric Jaccard threshold (3/15 = .2)
    assert(Dedup.jaccardPairs(d).count() == 0)
  }

  test("lexical diversity: hand TTR and Herdan's C per source") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq((1L, "a b a b", "src_a"), (2L, "x y z", "src_b"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.lexicalDiversity(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // src_a: N=4 V=2 -> TTR .5, C = ln2/ln4 = .5; src_b: N=3 V=3 -> 1, 1
    assert(got.toSeq == Seq(
      ("src_a", 4L, 2L, 500000L, 0.5),
      ("src_b", 3L, 3L, 1000000L, 1.0)), s"${got.toSeq}")
  }

  test("cluster coherence: a closure-chained stranger drags min_jac to zero") {
    val s = TestSpark.spark
    import s.implicits._
    val same = "alpha beta gamma delta epsilon zeta"
    val d = Seq((1L, same), (2L, same),
      (3L, "totally different words entirely unrelated content"))
      .toDF("doc_id", "text")
    // labels force 3 into the {1,2} cluster — the over-merge the audit exists for
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster")
    val got = Dedup.clusterCoherence(d, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (-1L, 3L, 0.0, 0.3333),
      (1L, 3L, 0.0, 0.3333)), s"${got.toSeq}")
  }

  test("cluster coherence: no multi-member clusters still yields the corpus row") {
    val s = TestSpark.spark
    import s.implicits._
    // every cluster a singleton -> zero pairs; the corpus row must still
    // appear (global aggregate), matching the oracle's UNION ALL row
    val d = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words entirely unrelated content"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "cluster")
    val got = Dedup.clusterCoherence(d, clusters).collect()
    assert(got.length == 1, got.mkString(","))
    assert(got(0).getLong(0) == -1L && got(0).getLong(1) == 0L
      && got(0).isNullAt(2) && got(0).isNullAt(3), got(0).toString)
  }

  test("eval quotas: largest remainder sums to exactly K, ties by source") {
    val s = TestSpark.spark
    import s.implicits._
    // N = 120 >= K = 100: quotas proportional, sum exactly K, cap inert
    val d = (1 to 3).flatMap(src => (1 to 40).map(i =>
      (src.toLong * 100 + i, s"src$src")))
      .toDF("doc_id", "source")
    val got = Curation.evalQuotas(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 3 equal sources of 40, K=100: base 33 each, 1 leftover seat -> src1
    assert(got.toSeq == Seq(
      ("src1", 40L, 34L), ("src2", 40L, 33L), ("src3", 40L, 33L)), s"${got.toSeq}")
    assert(got.map(_._3).sum == Curation.EvalSetK)
  }

  test("eval quotas: corpus smaller than K caps every quota at n_docs") {
    val s = TestSpark.spark
    import s.implicits._
    // N = 3 < K = 100: uncapped base would be 33 per 1-doc source — an
    // unsatisfiable sampling plan; the cap makes quota = n_docs, sum = N
    val d = (1 to 3).map(src => (src.toLong * 10 + 1, s"src$src"))
      .toDF("doc_id", "source")
    val got = Curation.evalQuotas(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("src1", 1L, 1L), ("src2", 1L, 1L), ("src3", 1L, 1L)), s"${got.toSeq}")
  }

  test("soft-dedup weights: 1/cluster-size ppm, unlabeled docs get full weight") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq(
      (1L, "a b c"),       // cluster of 2 -> w 500000
      (2L, "a b c d"),     // cluster of 2 -> w 500000, exp floor(4e6/2)
      (3L, "x"))           // no label row -> singleton, full weight
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster")
    val got = Curation.softDedupWeights(d, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 500000L, 3L, 1500000L),
      (2L, 2L, 500000L, 4L, 2000000L),
      (3L, 1L, 1000000L, 1L, 1000000L)), s"${got.toSeq}")
    // invariant: a cluster's expected tokens ≈ one member's worth — here
    // (3 + 4) / 2 tokens = 3.5 -> 3500000 ppm split across the two rows
    assert(got.filter(_._2 == 2L).map(_._5).sum == 3500000L)
  }
}
