package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic unit tests for the curation family (sampling, caps,
  * decontamination, cosine near-dup pairs) on crafted inputs.
  */
class CurationSpec extends AnyFunSuite {

  private def docs(rows: (Long, String, String)*) = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text", "source")
  }

  test("stratified sample is deterministic and respects per-source rates") {
    val d = docs((0L until 200L).map(i => (i, s"doc $i", s"src${i % 2}")): _*)
    val once = Curation.stratifiedSample(d).collect().map(_.getLong(0)).toSeq
    val twice = Curation.stratifiedSample(d).collect().map(_.getLong(0)).toSeq
    assert(once == twice) // reproducible
    assert(once.nonEmpty && once.size < 200) // a real subsample
    // every kept doc satisfies the hash predicate (spot-check determinism
    // of the rule, not just of the output)
    val rates = d.select(col("source"), Curation.sampleRate(col("source")).as("r"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.values.forall(r => r >= 20 && r < 80))
  }

  test("mixture resample: binding source keeps all, dominant source is thinned toward its target") {
    // big: 160 docs x 4 tokens; small: 40 docs x 4 tokens -> shares 0.8/0.2.
    // alpha=0.5 targets ~(0.67, 0.33): small is the most up-weighted source
    // (rate 0.33/0.2) -> keep_rate 1.0; big is thinned by (0.67/0.8)/(0.33/0.2)
    val d = docs(
      ((0L until 160L).map(i => (i, "alpha beta gamma delta", "big")) ++
        (160L until 200L).map(i => (i, "alpha beta gamma delta", "small"))): _*)
    val r = Curation.mixtureResample(d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2), x.getBoolean(3)))
    val bySource = r.groupBy(_._2)
    // the binding (most up-weighted) source keeps everything
    assert(bySource("small").forall(_._3 == 1.0))
    assert(bySource("small").forall(_._4))
    // expected big rate: (w_big/s_big) / (w_small/s_small) with alpha=.5
    val (sb, ss) = (0.8, 0.2)
    val z = math.pow(sb, 0.5) + math.pow(ss, 0.5)
    val expected = BigDecimal((math.pow(sb, 0.5) / z / sb) / (math.pow(ss, 0.5) / z / ss))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(bySource("big").forall(_._3 == expected),
      s"big keep_rate ${bySource("big").head._3} != $expected")
    // the thinning actually happens, at roughly the advertised rate
    val kept = bySource("big").count(_._4)
    assert(kept < 160 && kept > 160 * expected * 0.5,
      s"big kept $kept of 160 at rate $expected")
    // deterministic: same corpus, same sample
    val again = Curation.mixtureResample(d).collect()
      .map(x => (x.getLong(0), x.getBoolean(3))).toSeq
    assert(again == r.map(x => (x._1, x._4)).toSeq)
  }

  test("per-source cap keeps the lowest doc_ids, at most SourceCap per source") {
    val d = docs((0L until 50L).map(i => (i, s"doc $i", "only")): _*)
    val kept = Curation.perSourceCap(d).collect().map(_.getLong(0)).toSeq
    assert(kept == (0L until Curation.SourceCap.toLong))
  }

  test("decontamination flags exactly the train docs overlapping benchmark shingles") {
    val bench = "one two three four five six seven eight nine ten"
    val contaminated = "zz " + bench // shares all of bench's shingles
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // doc_id 0 is the benchmark doc (0 % BenchmarkMod == 0)
    val d = docs((0L, bench, "b"), (1L, contaminated, "t"), (2L, clean, "t"))
    val r = Curation.decontaminate(d).collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L))
    assert(r.head.getLong(1) >= 8) // shares the benchmark's 3-gram shingles
  }

  test("bloom decontamination: flags every truly-contaminated doc, clean docs unflagged at this size") {
    val bench = "one two three four five six seven eight nine ten"
    val contaminated = "zz " + bench
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs((0L, bench, "b"), (1L, contaminated, "t"), (2L, clean, "t"))
    val bloom = Curation.trainBenchmarkBloom(d)
    val r = Curation.bloomDecontaminate(d, bloom).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    // NO false negatives ever: the leaked doc must be flagged, and its
    // maybe-count must dominate the exact shared count (8 shared shingles)
    assert(r(1L)._2 && r(1L)._1 >= 8, s"leak must be caught: $r")
    // at 2^20 bits over ~10 items, a false positive on the clean doc would
    // mean the sketch is broken, not unlucky
    assert(!r(2L)._2, s"clean doc wrongly flagged: $r")
    // benchmark docs themselves are excluded from the gate (as in p5/p21)
    assert(!r.contains(0L))
  }

  test("surgical decontamination cuts exactly the benchmark-covered run, keeps the rest") {
    val s = TestSpark.spark
    import s.implicits._
    // doc 0 (0 % 97 == 0) IS the benchmark; doc 1 quotes a 3-token run
    // of it mid-text; doc 2 is clean
    val d = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "clean text here alpha beta gamma more clean text"),
      (2L, "completely unrelated words throughout this document"))
      .toDF("doc_id", "text")
    val r = Curation.decontaminateCut(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(!r.contains(0L), "benchmark docs are excluded from the cut output")
    assert(r(1L) == ((9L, 3L, "clean text here more clean text")),
      s"exactly the quoted run must be excised: ${r(1L)}")
    assert(r(2L) == ((6L, 0L, "completely unrelated words throughout this document")),
      s"clean doc must pass through intact: ${r(2L)}")
  }

  test("PPS sample: total picks == total div stride, multiplicity proportional to weight") {
    val s = TestSpark.spark
    import s.implicits._
    // 100 docs, one whale at 100x the weight of the minnows
    val d = (1L to 100L).map(i => (i, if (i == 42) 5000L else 50L))
      .toDF("doc_id", "n_chars")
    val got = Curation.ppsSample(d)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // total weight 9950, target 100/10 = 10, stride 995 → exactly 10 picks
    assert(got.values.sum == 10, s"systematic PPS must land exactly total div stride picks: $got")
    // the whale holds 5000/9950 ≈ half the line: 5 or 6 boundaries fall in it
    assert(got(42L) >= 4, s"the heavy doc must dominate the sample: $got")
    // determinism: a second run picks the identical multiset
    val again = Curation.ppsSample(d)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == again, "PPS selection must be deterministic")
  }

  test("stratified PPS: each source lands exactly its own total div stride picks") {
    val s = TestSpark.spark
    import s.implicits._
    // source A: 40 docs of weight 50; source B: 20 docs of weight 200
    val rows = (1L to 40L).map(i => (i, 50L, "A")) ++
      (100L to 119L).map(i => (i, 200L, "B"))
    val d = rows.toDF("doc_id", "n_chars", "source")
    val got = Curation.ppsSampleStratified(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // A: total 2000, target 4, stride 500 -> exactly 4 picks
    // B: total 4000, target 2, stride 2000 -> exactly 2 picks
    val perSource = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perSource == Map("A" -> 4, "B" -> 2),
      s"per-stratum sample sizes must be exact: $perSource")
  }

  test("chunking: overlapping fixed windows cover every token, tail is short") {
    val words = (1 to 150).map(i => s"w$i")
    val d = docs((1L, words.mkString(" "), "s"))
    val r = Curation.chunk(d).collect()
      .map(x => (x.getLong(2), x.getString(3))) // (n_tokens, md5)
    val step = Curation.ChunkSize - Curation.ChunkOverlap // 48
    // starts at 1, 49, 97, 145 over 150 tokens -> sizes 64, 64, 54, 6
    assert(r.map(_._1).toSeq == Seq(64L, 64L, 54L, 6L))
    assert(r.map(_._2).distinct.length == r.length) // distinct windows
    assert(step == 48)
  }

  test("segment dedup keeps the first corpus occurrence of boilerplate, drops repeats") {
    val boiler = (1 to Curation.SegSize).map(i => s"b$i").mkString(" ") // exactly one segment
    val uniqA = (1 to Curation.SegSize).map(i => s"a$i").mkString(" ")
    val uniqC = (1 to Curation.SegSize).map(i => s"c$i").mkString(" ")
    val d = docs(
      (1L, s"$boiler $uniqA", "s"), // first occurrence of boiler (doc 1, seg 1)
      (2L, s"$boiler $boiler", "s"), // two repeats, both dropped -> md5("")
      (3L, s"$uniqC $boiler", "s")) // repeat in second segment only
    val r = Curation.segmentDedup(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 0L, md5Hex(s"$boiler $uniqA"))))
    assert(r(2L) == ((2L, 2L, md5Hex(""))))
    assert(r(3L) == ((2L, 1L, md5Hex(uniqC))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("budget selection: per-shard greedy prefix of the quality order, never empty, under budget+1") {
    val d = docs((0L until 300L).map(i =>
      (i, ("tok " * (5 + (i % 40).toInt)).trim, s"src${i % 3}")): _*)
    val kept = Curation.budgetSelect(d).collect()
    assert(kept.nonEmpty && kept.length < 300)
    val bySrc = kept.groupBy(r => (r.getString(1), r.getInt(2)))
    bySrc.foreach { case ((_, _), rows) =>
      // greedy invariant: within a shard, kept rows form a prefix of the
      // (quality desc, doc_id) order — their cum_tokens are each other's
      // running sums, so max(cum) == sum(n_tokens) of the kept set
      val cumMax = rows.map(_.getLong(5)).max
      val tokSum = rows.map(_.getLong(3)).sum
      assert(cumMax == tokSum, "kept set must be a prefix of the greedy order")
      // overshoot-by-one: all but the last kept doc fit strictly inside the
      // budget, i.e. dropping the largest cum row puts the rest under it
      assert(rows.nonEmpty, "a nonempty shard always keeps at least one doc")
    }
    // determinism
    val again = Curation.budgetSelect(d).collect()
    assert(kept.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("packed segments: every doc fully covered, every sequence at most SeqLen tokens") {
    // docs long enough (up to ~3x SeqLen) to cross sequence boundaries
    val d = docs((0L until 40L).map(i =>
      (i, ("tok " * (100 + (i % 30).toInt * 50)).trim, s"src${i % 2}")): _*)
    val segs = Curation.packSegments(d).collect()
    // full coverage: each doc's segments sum to its token count and tile
    // [0, n_tokens) contiguously in seq order
    val tokens = d.select(col("doc_id"),
      size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    segs.groupBy(_.getLong(0)).foreach { case (docId, rows) =>
      val ordered = rows.sortBy(_.getLong(3)) // by seq
      assert(ordered.map(_.getLong(5)).sum == tokens(docId), s"doc $docId not covered")
      val spans = ordered.map(r => (r.getLong(4), r.getLong(4) + r.getLong(5)))
      assert(spans.head._1 == 0L)
      spans.sliding(2).foreach {
        case Array((_, e), (s2, _)) => assert(e == s2, s"gap in doc $docId")
        case _ =>
      }
    }
    // a sequence never holds more than SeqLen tokens across its docs
    segs.groupBy(r => (r.getString(1), r.getInt(2), r.getLong(3)))
      .foreach { case (k, rows) =>
        val total = rows.map(_.getLong(5)).sum
        assert(total <= Curation.SeqLen, s"sequence $k overflows: $total")
      }
    // multi-segment docs exist (the test exercises boundary cuts)
    assert(segs.groupBy(_.getLong(0)).exists(_._2.length > 1))
  }

  test("kmeans separates two obvious clusters and reports sizes") {
    val s = TestSpark.spark
    import s.implicits._
    // two tight clusters around (0,0) and (10,10); init = first 2 vectors,
    // one from each cluster
    val emb = Seq(
      (0L, Array(0.1f, 0.0f), 0), (1L, Array(10.0f, 10.1f), 0),
      (2L, Array(0.0f, 0.2f), 0), (3L, Array(9.9f, 10.0f), 0),
      (4L, Array(0.2f, 0.1f), 0), (5L, Array(10.2f, 9.8f), 0)
    ).toDF("vec_id", "embedding", "label")
    val (_, assigned) = Similarity.kmeansModel(emb, 2, 2)
    val byCluster = assigned.collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    assert(byCluster.values.toSet == Set(Set(0L, 2L, 4L), Set(1L, 3L, 5L)))
    val out = Similarity.kmeans(emb, 2, 2).collect()
    assert(out.map(_.getLong(1)).forall(_ == 3L)) // both clusters size 3
  }

  test("cosine near-dup pairs: same-cell near-identical vectors only") {
    val s = TestSpark.spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),  // near-dup of 1, same cell
      (3L, Array(-1.0f, 0.0f, 0.0f), 0),  // same cell, opposite direction
      (4L, Array(1.0f, 0.0f, 0.0f), 1)    // near-dup of 1 but different cell
    ).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cosineDupPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("curriculum: rare-token doc lands in the hard phase, z-scores follow the 1-outlier algebra") {
    // 9 identical common docs + 1 rare-token doc: z_common = -1/sqrt(9),
    // z_rare = sqrt(9) — common land in the medium band, the outlier is hard
    val d = docs(((0L until 9L).map(i => (i, "the quick brown fox", "a")) :+
      (9L, "xylophone quixotic zephyr glyph", "a")): _*)
    val got = Curation.curriculum(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getString(4))).toMap
    assert(got(9L)._2 == "hard" && got(9L)._1 == 3.0, s"$got")
    assert((0L until 9L).forall(i =>
      got(i)._2 == "medium" && got(i)._1 == -0.3333), s"$got")
  }

  test("curriculum shard: phased on the FROZEN scale — a hard-only shard stays hard") {
    val s = TestSpark.spark
    // old corpus: 9 easy + 1 hard doc sets mu/sigma; the shard is ALL
    // unseen-token docs — on its own mean it would re-center to medium,
    // on the frozen scale every doc must land in "hard"
    val old = docs(((0L until 9L).map(i => (i, "the quick brown fox", "a")) :+
      (9L, "xylophone quixotic zephyr glyph", "a")): _*)
    val shard = docs((10L until 14L).map(i =>
      (i, s"unseen$i tokens$i everywhere$i", "a")): _*)
    val dir = java.nio.file.Files.createTempDirectory("graft-curr-test").toString
    Curation.trainAndSaveCurriculum(old, dir)
    val got = Curation.curriculumShard(shard, s, dir).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got.keySet == (10L until 14L).toSet && got.values.forall(_ == "hard"),
      s"frozen-scale phasing diverged: $got")
  }

  test("curriculum: uniform corpus has zero sigma, everything medium at z=0") {
    val d = docs((0L until 5L).map(i => (i, "same text every time", "a")): _*)
    val got = Curation.curriculum(d).collect()
      .map(r => (r.getDouble(3), r.getString(4))).toSet
    assert(got == Set((0.0, "medium")), s"$got")
  }
}
