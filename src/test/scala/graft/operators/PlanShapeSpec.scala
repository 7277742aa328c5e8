package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan shape assertions for the scale-critical operators: these
  * lock the properties that matter at 100 TB (broadcasts where one side is
  * small, no shuffle where a per-row predicate suffices, column pruning at
  * the scan) so a refactor that silently regresses the plan fails CI, not
  * the cluster.
  */
class PlanShapeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): String = {
    df.collect() // run so AQE finalizes the plan
    // keep only the final adaptive plan (toString also prints the initial)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("brute-force kNN broadcasts the query side and top-ks before the shuffle") {
    val plan = executed(Similarity.knnBrute(graft.Tables.embeddings(TestSpark.spark, dir), 10, 5))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the query set in:\n$plan")
    // rank<=k is pushed below the exchange (WindowGroupLimit partial), so
    // what shuffles is k rows per (qid, input partition), not the pair set
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side top-k (WindowGroupLimit) in:\n$plan")
  }

  test("all-pairs NN is cell-blocked: no corpus broadcast, no cross product") {
    val spark = TestSpark.spark
    // disable auto-broadcast so the assertion sees only FORCED broadcasts
    // (an explicit broadcast() hint would still produce a BroadcastExchange)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache() // see the LSH test: stale cached fragments
    try {
      val plan = executed(Similarity.nnAll(graft.Tables.embeddings(spark, dir)))
      assert(!plan.contains("BroadcastExchange") && !plan.contains("CartesianProduct"),
        s"NN must equi-join on the cell key, never broadcast/cross the corpus:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on the cell key in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH candidate-verify join carries no mandatory broadcast of the candidate set") {
    val spark = TestSpark.spark
    // candidate volume is data-dependent (band collisions explode on
    // boilerplate-heavy corpora), so the verify join must stay valid with
    // broadcasting disabled: a forced broadcast() hint would still emit a
    // BroadcastExchange here and OOM the driver at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // an earlier suite may have materialized shingles(docs).cache() under
    // the DEFAULT threshold — the cache manager would substitute that
    // InMemoryRelation here, whose baked physical fragment legitimately
    // contains an AQE-chosen BroadcastExchange. Clear so planning is fresh
    // under the -1 threshold and the assertion sees only FORCED broadcasts.
    spark.catalog.clearCache()
    try {
      val plan = executed(Dedup.lshPairs(graft.Tables.documents(spark, dir)))
      assert(!plan.contains("BroadcastExchange"),
        s"candidate verify must not force a broadcast (AQE may choose one when small):\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffled equi-joins for candidate verify in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("decontamination broadcasts the benchmark shingle set") {
    val docs = graft.Tables.documents(TestSpark.spark, dir)
    val plan = executed(Curation.decontaminate(docs))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join against the benchmark side in:\n$plan")
  }

  test("stratified sample is shuffle-free up to the presentation sort") {
    val docs = graft.Tables.documents(TestSpark.spark, dir)
    val plan = executed(Curation.stratifiedSample(docs))
    val exchanges = "Exchange".r.findAllIn(plan).size
    // exactly the rangepartitioning exchange for the final ORDER BY
    assert(exchanges <= 1 && plan.contains("rangepartitioning"),
      s"sampling must be a pure per-row predicate (no data shuffle):\n$plan")
  }

  test("shingle index is one Generate + one exchange (fused window df-cap)") {
    val docs = graft.Tables.documents(TestSpark.spark, dir)
    val plan = executed(Dedup.shingles(docs))
    // the fused form: ONE tokenize+shingle Generate feeding ONE exchange
    // on g, with the df cap as a count window on that exchange — the old
    // aggregate-then-join-back form ran the Generate twice (its two legs
    // are different canonical subtrees, so nothing reuses them) and paid
    // a second exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected 1 hash exchange (the window's) in:\n$plan")
    val generates = "Generate explode".r.findAllIn(plan).size
    assert(generates == 1, s"expected exactly 1 shingle Generate in:\n$plan")
    assert(plan.contains("Window"), s"expected the df-cap count window in:\n$plan")
    assert(!plan.contains("HashAggregate(keys=[doc_id"),
      s"no global distinct on (doc_id, g) expected:\n$plan")
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val ev = graft.Tables.events(TestSpark.spark, dir)
    val q = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = executed(q)
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final HashAggregate pair in:\n$plan")
  }

  test("segment dedup: partial-aggregated first-occurrence, no cross product") {
    val spark = TestSpark.spark
    // forced-broadcast-free plan: at scale the winner set is corpus-sized
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(Curation.segmentDedup(graft.Tables.documents(spark, dir)))
      // the heavy-hitter defense: min(struct(doc_id,s)) per segment must
      // partial-aggregate map-side BEFORE its exchange (a row_number window
      // would funnel every instance of a boilerplate segment to one reducer)
      assert("partial_min".r.findAllIn(plan).nonEmpty,
        s"expected map-side partial min for first-occurrence in:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"no cross product expected:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("corpus top-ngrams ships only per-partition top-K (TakeOrderedAndProject)") {
    val plan = executed(TextOps.topNgrams(graft.Tables.documents(TestSpark.spark, dir)))
    assert(plan.contains("TakeOrderedAndProject"),
      s"global ORDER BY+LIMIT must plan as partial top-K, not a full sort:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"gram counts must partial-aggregate map-side:\n$plan")
  }

  test("partition pruning reaches a partitioned-layout scan") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.Tables.events(spark, dir)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val q = spark.read.parquet(out)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)).as("n"))
    val plan = executed(q)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected the event_type predicate as a PartitionFilter in:\n$plan")
    // the data filter list must NOT carry it — pruning happened at listing
    assert(!plan.split("PartitionFilters").head.contains("event_type ="),
      s"predicate should not survive as a row-level filter:\n$plan")
  }

  test("column pruning reaches the parquet scan") {
    val docs = graft.Tables.documents(TestSpark.spark, dir)
    val q = docs.select(col("doc_id"), length(col("text")).as("len"))
    val plan = executed(q)
    val readSchema = plan.split("ReadSchema: ").last
    assert(readSchema.contains("doc_id") && readSchema.contains("text")
      && !readSchema.contains("source") && !readSchema.contains("lang"),
      s"scan should read only doc_id+text, got: $readSchema")
  }

  test("sequence packing windows on (source, shard) — never source alone") {
    val plan = executed(Curation.packSequences(graft.Tables.documents(TestSpark.spark, dir)))
    // the prefix sum must be sharded: a window partitioned by source alone
    // puts the dominant source's whole running sum in ONE task at 100 TB
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty, s"expected a window in:\n$plan")
    windowSpecs.foreach { spec =>
      assert(spec.contains("shard"),
        s"window partition spec must include the shard key, got: $spec\nin:\n$plan")
    }
  }

  test("budget selection windows on (source, shard) and never cross-products") {
    val plan = executed(Curation.budgetSelect(graft.Tables.documents(TestSpark.spark, dir)))
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty, s"expected a window in:\n$plan")
    windowSpecs.foreach { spec =>
      assert(spec.contains("shard"),
        s"budget prefix sum must be sharded, got: $spec\nin:\n$plan")
    }
    assert(!plan.contains("CartesianProduct"), s"no cross product expected in:\n$plan")
  }

  test("salted join exchanges on (key, SALT): the hot fact key is spread, not serialized") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_quantity"))
      val pt = graft.Tables.part(spark, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      val plan = executed(Skew.saltedJoin(li, pt, "l_partkey", 8))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"salted join must stay an equi-join:\n$plan")
      val partLine = plan.split("\n").filter(_.contains("hashpartitioning(l_partkey"))
      assert(partLine.nonEmpty && partLine.forall(_.contains("_salt")),
        s"the salt must be part of EVERY join exchange key:\n${partLine.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom-pruned join: the probe filters the fact BELOW the join exchange") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(RuntimeFilter.smallPartRevenue(
        graft.Tables.lineitem(spark, dir), graft.Tables.part(spark, dir)))
      assert(plan.contains("might_contain"),
        s"expected the bloom probe in the plan:\n$plan")
      // the probe must sit on the scan side of the fact branch: in the
      // plan's line order the filter prints BELOW (after) the fact
      // exchange it feeds — i.e. no Exchange appears between the fact
      // scan and the might_contain filter
      val lines = plan.split("\n")
      val probeIdx = lines.indexWhere(_.contains("might_contain"))
      val scanIdx = lines.indexWhere(_.contains("lineitem"), probeIdx)
      assert(probeIdx >= 0 && scanIdx >= 0,
        s"probe/scan lines not found:\n$plan")
      assert(!lines.slice(probeIdx + 1, scanIdx).exists(_.contains("Exchange")),
        s"the bloom probe must be below the fact exchange (no Exchange between probe and scan):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join plans as union+window: no nested loop, no cartesian, no pair blowup") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(AsOf.clickAttribution(graft.Tables.events(spark, dir)))
      // the naive ts-inequality join Spark would otherwise plan
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"as-of must never plan a per-key nested loop:\n$plan")
      assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
        s"expected the running last_value window in:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"union+window form has NO join at all:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("nearest as-of: still the union+window form — both directions off ONE sorted run, no join") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(AsOf.clickNearestAttribution(graft.Tables.events(spark, dir)))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"nearest as-of must never plan a per-key nested loop:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"union+window form has NO join at all:\n$plan")
      // ONE key exchange feeds both the backward and the forward window —
      // a second hashpartitioning(__k) would mean the forward pass paid
      // its own shuffle
      val keyExchanges = plan.split("\n").count(_.contains("hashpartitioning(__k"))
      assert(keyExchanges <= 1,
        s"backward+forward must share one exchange, saw $keyExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("segmented nearest as-of: bucket in the main exchange, both carries off the summary table, no join blowup") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(AsOf.clickNearestSegmented(graft.Tables.events(spark, dir)))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"segmented nearest must never nested-loop:\n$plan")
      val partLine = plan.split("\n").filter(_.contains("hashpartitioning(__k"))
      assert(partLine.exists(_.contains("__b")),
        s"the bucket must be part of an exchange key, got:\n${partLine.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("segmented as-of exchanges on (key, BUCKET) — the hot-key cap is in the partitioning") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(AsOf.clickAttributionSegmented(graft.Tables.events(spark, dir)))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"segmented as-of must never nested-loop:\n$plan")
      // the main scan's exchange must carry the bucket alongside the key —
      // partitioning by the raw key alone would serialize a hot key on one
      // task, the exact failure mode this variant exists to cap
      assert(plan.contains("hashpartitioning(__k"),
        s"expected a (__k, __b) hash exchange in:\n$plan")
      val partLine = plan.split("\n").filter(_.contains("hashpartitioning(__k"))
      assert(partLine.exists(_.contains("__b")),
        s"the bucket must be part of the exchange key, got:\n${partLine.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("range join equi-joins on (key, time bucket): no nested loop, no post-filter-only key join") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(RangeJoin.signupPurchases(graft.Tables.events(spark, dir)))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join must never nested-loop:\n$plan")
      // the bucket must be IN the join key (a key-only join with the range
      // as post-filter lets one hot key own an |L|x|R| blowup)
      assert(plan.contains("__b"), s"expected the time bucket in the join key:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on (key, bucket):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("BPE trainer round: pair counts partial-aggregate map-side; apply never shuffles the corpus stream") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, dir)
    // the per-round aggregation is the trainer's hot loop: a heavy pair
    // (think 'th'/'he' across a web corpus) must combine map-side, not ship
    // every occurrence to one reducer
    val plan = executed(Bpe.pairCounts(Bpe.initialWords(docs)))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate for pair counts in:\n$plan")
    // apply: the vocab and id dimension tables broadcast; the corpus-sized
    // symbol stream shuffles only for the per-doc aggregate. The vocab
    // join lives in the symbol-stream plan (materialized once via
    // localCheckpoint); the id join in the aggregate plan above it.
    val (_, vocab) = Bpe.train(docs, nMerges = 2)
    val streamPlan = executed(Bpe.symbolStream(docs, vocab))
    assert(streamPlan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast in:\n$streamPlan")
    val applyPlan = executed(Bpe.applyBpe(docs, vocab))
    assert(applyPlan.contains("BroadcastHashJoin"),
      s"id join must broadcast in:\n$applyPlan")
    assert(!applyPlan.contains("CartesianProduct"), s"no cross product in:\n$applyPlan")
  }

  test("training-order shuffle is one range exchange: no window, no single-reducer stage") {
    val plan = executed(Curation.shuffleOrder(graft.Tables.documents(TestSpark.spark, dir)))
    val exchanges = "Exchange".r.findAllIn(plan).size
    // a keyed permutation is exactly the ORDER BY's range exchange; a global
    // row_number position would add a single-partition window — the shape
    // this test exists to forbid
    assert(exchanges == 1 && plan.contains("rangepartitioning"),
      s"expected exactly one range exchange in:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SinglePartition"),
      s"no window / single-partition stage expected in:\n$plan")
  }

  test("shard dedup against the saved index: equi-joins only, no forced broadcast, no cross product") {
    val spark = TestSpark.spark
    val idxDir = java.nio.file.Files.createTempDirectory("graft-plan-lshidx").toString
    val docs = graft.Tables.documents(spark, dir)
    val cut = docs.count() * 4 / 5
    Dedup.buildAndSaveLshIndex(docs.filter(col("doc_id") < cut), idxDir)
    val idx = Dedup.loadLshIndex(spark, idxDir)
    // candidate + verify volumes are data-dependent — with broadcasting
    // disabled the whole shard pass must still plan as shuffled equi-joins
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try {
      val plan = executed(Dedup.shardLshPairs(docs.filter(col("doc_id") >= cut), idx))
      assert(!plan.contains("BroadcastExchange"),
        s"no side of the shard pass may be FORCE-broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"no cross product anywhere in the shard pass:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental SemDeDup: cell-blocked equi-join, centroid broadcast only, no cross product") {
    val spark = TestSpark.spark
    val emb = graft.Tables.embeddings(spark, dir)
    val kmDir = java.nio.file.Files.createTempDirectory("graft-plan-km").toString
    val cut = emb.count() * 4 / 5
    Similarity.trainAndSaveKmeans(emb.filter(col("vec_id") < cut), 4, 2, kmDir)
    val plan = executed(Similarity.semDedupShard(emb, cut,
      graft.sources.ModelStore.load(spark, s"$kmDir/centroids"),
      graft.sources.ModelStore.load(spark, s"$kmDir/cells"), 0.4))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the verify must be confined to cell co-members:\n$plan")
  }

  test("shard substr coverage: hashed semi-join against the saved gram set, no cross product") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, dir)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-plan-substr").toString
    val cut = docs.count() * 4 / 5
    Dedup.buildAndSaveSubstrIndex(docs.filter(col("doc_id") < cut), idxDir)
    val plan = executed(Dedup.shardSubstrSpans(docs.filter(col("doc_id") >= cut),
      Dedup.loadSubstrIndex(spark, idxDir)))
    assert(plan.contains("LeftSemi"), s"expected the covered-gram semi-join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross product expected in:\n$plan")
  }

  test("simhash pairs: band-bucket equi-join candidates, no cross product") {
    val plan = executed(Dedup.simhashPairs(graft.Tables.documents(TestSpark.spark, dir)))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the Hamming verify must run on banded candidates only, never all pairs:\n$plan")
  }

  test("dedup keep-list anti-joins the small non-canonical set — corpus never shuffled twice") {
    val plan = executed(Dedup.dedupedCorpus(graft.Tables.documents(TestSpark.spark, dir)))
    assert(plan.contains("LeftAnti"), s"expected an anti-join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross product expected in:\n$plan")
  }

  test("SemDeDup verify is cluster-blocked: equi-join on the cell key, no cross product, no corpus broadcast") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(
        Similarity.semDedup(graft.Tables.embeddings(spark, dir), 4, 2, 0.4))
      // the whole point of clustering first: pair volume is bounded by
      // cluster co-membership — a cross product here is the n^2 failure
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"SemDeDup must equi-join on the cluster id:\n$plan")
      assert(plan.contains("LeftAnti") || plan.contains("LeftOuter"),
        s"expected the keep-list join in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PQ-ADC scan joins codes to a broadcast LUT — the corpus is never broadcast or crossed") {
    val plan = executed(Similarity.knnPq(graft.Tables.embeddings(TestSpark.spark, dir), 10, 5))
    // the LUT (queries x blocks x codes) is the ONLY broadcast; the code
    // table streams through a hash join on (block, code)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the LUT broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cross product in the ADC scan:\n$plan")
    // top-k per query is bounded before the final sort
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side top-k (WindowGroupLimit) in:\n$plan")
  }

  test("IVF-PQ serving path: only dimension-sized sides broadcast, no cross product, bounded top-k") {
    val spark = TestSpark.spark
    val emb = graft.Tables.embeddings(spark, dir)
    val idx = Similarity.ivfPqTrain(emb, sub = 8)
    val plan = executed(Similarity.ivfPqSearch(emb, idx, sub = 8, nQueries = 10, k = 5))
    // the LUT, probes, quantizers and query set are the ONLY broadcasts;
    // the code table streams through hash joins on (cell, block, code)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins for the dimension-sized sides in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cross product in the serving path:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side top-k (WindowGroupLimit) in:\n$plan")
  }

  test("DSIR model tables aggregate on bounded bucket keys; scoring joins are on the bucket id") {
    val plan = executed(Curation.dsirWeights(graft.Tables.documents(TestSpark.spark, dir)))
    // per-doc TFs and the two 256-row models are hash aggregates with
    // map-side partials; nothing corpus-sized is broadcast or crossed
    assert(plan.contains("HashAggregate"), s"expected hash aggregation in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"totals must come from broadcast single-row aggregates:\n$plan")
  }

  test("mm7 image near-dup: band equi-join, no corpus broadcast, kernel stays in-plan") {
    val spark = TestSpark.spark
    // the fingerprint table is corpus-sized at a real crawl — the band
    // join must remain valid with broadcasting off (a forced broadcast()
    // would still show here and OOM the driver at 100 TB)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(Multimodal.imageHashPairs(
        Multimodal.hashAssets(graft.Tables.documents(spark, dir))))
      assert(!plan.contains("BroadcastExchange") && !plan.contains("CartesianProduct"),
        s"band pairing must equi-join on (nbits, band, value), never broadcast/cross:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on the band key in:\n$plan")
      assert(plan.contains("MapPartitions") && !plan.contains("ExistingRDD"),
        s"decode kernel must stay one Catalyst plan (no RDD break):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("w16 funnel runs each as-of fold exactly once — no duplicated step-1 stage") {
    // funnel() consumes st1 twice (the step-2 chain and the n_purchases
    // count). The count branch must NOT replan the step-1 as-of: column
    // pruning drops the window expressions, RemoveNoopOperators drops the
    // empty Window, and the __side=1 filter folds the union to the bare
    // purchases branch — so the whole plan carries exactly TWO as-of key
    // exchanges (one per funnel step), each executed once. A refactor
    // that breaks the pruning (e.g. counting a step-1 output column)
    // would silently re-run the most expensive stage at 100 TB; this
    // assertion turns that into a CI failure.
    val plan = executed(AsOf.funnel(graft.Tables.events(TestSpark.spark, dir)))
    val asOfExchanges = "Exchange hashpartitioning\\(__k".r.findAllIn(plan).size
    assert(asOfExchanges == 2,
      s"expected exactly 2 as-of key exchanges (one per funnel step), got $asOfExchanges in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross product in:\n$plan")
  }

  test("multimodal kernel is one plan: pruned scan under the mapPartitions seam, no RDD break") {
    val docs = graft.Tables.documents(TestSpark.spark, dir)
    val q = Multimodal.extractFeatures(Multimodal.assets(docs))
    val plan = executed(q)
    // one continuous plan down to the parquet scan (an RDD round-trip would
    // show Scan ExistingRDD and hide the file scan from this plan)
    assert(plan.contains("MapPartitions"), s"expected the typed kernel node in:\n$plan")
    assert(!plan.contains("ExistingRDD"), s"kernel must not break the plan at an RDD:\n$plan")
    // the kernel consumes only (asset_id, data) = (doc_id, md5(text)):
    // pruning must reach the documents scan through the kernel boundary
    val readSchema = plan.split("ReadSchema: ").last
    assert(readSchema.contains("doc_id") && readSchema.contains("text")
      && !readSchema.contains("n_chars") && !readSchema.contains("source"),
      s"scan should read only doc_id+text under the kernel, got: $readSchema")
  }

  test("interpolation as-of: union+window form — one key exchange, both brackets off one sorted run, no join") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(AsOf.clickValueInterpolation(graft.Tables.events(spark, dir)))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"interpolation as-of must never plan a per-key nested loop:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"union+window form has NO join at all:\n$plan")
      val keyExchanges = plan.split("\n").count(_.contains("hashpartitioning(__k"))
      assert(keyExchanges <= 1,
        s"backward+forward brackets must share one exchange, saw $keyExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("histogram quantiles: both rollups partial-aggregate; the window runs over the bounded weekly table") {
    val plan = executed(EventWindows.histogramQuantileRollup(
      graft.Tables.events(TestSpark.spark, dir)))
    // events -> daily and daily -> weekly must each map-side combine: a
    // missing partial would shuffle raw events instead of (day, bin) rows
    val partials = plan.split("\n").count(l =>
      l.contains("HashAggregate") && l.contains("partial_count") ||
      l.contains("HashAggregate") && l.contains("partial_sum"))
    assert(partials >= 2, s"expected map-side combines for daily AND weekly rollups:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the quantile walk is windows over the bounded table, no join:\n$plan")
    // the explode (quantile fan-out) must sit ABOVE the weekly aggregate,
    // operating on at most HistBins rows per week, never on raw events
    val lines = plan.split("\n")
    val genIdx = lines.indexWhere(_.contains("Generate"))
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(genIdx >= 0 && aggIdx > genIdx,
      s"explode must run over the aggregated table (Generate above HashAggregate):\n$plan")
  }

  test("ct langid: doc top-K cut below the exchange, profiles broadcast, no corpus cross") {
    val plan = executed(TextOps.ctLangId(graft.Tables.documents(TestSpark.spark, dir)))
    // per-doc and per-language rank truncations must push a partial
    // WindowGroupLimit below their exchanges — what shuffles is each
    // doc's top-20 grams, not its whole gram multiset
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-truncation pushdown (WindowGroupLimit) in:\n$plan")
    // the language profile (<= langs x 50 rows) and language list ride
    // broadcasts; the only cross is docProf x the bounded language list
    assert(plan.contains("BroadcastExchange"),
      s"expected the language profile to broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the candidate fan-out must be a broadcast of the bounded language list:\n$plan")
  }

  test("curriculum: one scalar stats row broadcasts; no sort or ntile over the corpus") {
    val plan = executed(Curation.curriculum(graft.Tables.documents(TestSpark.spark, dir)))
    // mean/sigma arrive as a broadcast single-row aggregate; phase
    // assignment is then per-row — a percentile/ntile formulation would
    // show a corpus-wide Window with an empty partition spec here
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected the stats row to broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"stats must broadcast, not cross:\n$plan")
    assert(!plan.contains("ntile") && !plan.contains("Window "),
      s"phases come from fixed z thresholds, never a global rank:\n$plan")
  }

  test("KMV sketches: rank<=k compiles to WindowGroupLimit; pair fan-out never a cross product") {
    val ev = graft.Tables.events(TestSpark.spark, dir)
    val plan = executed(Sketches.kmvSetOps(ev))
    // only the k smallest hashes per group survive the window sort — the
    // property that makes a sketch build a top-k, not a group sort
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank<=k filter as a group limit in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the |types|-row pair expansion must broadcast, not cross:\n$plan")
    val plan2 = executed(Sketches.rollingDau(ev))
    assert(plan2.contains("WindowGroupLimit") && !plan2.contains("CartesianProduct")
      && !plan2.contains("BroadcastNestedLoopJoin"),
      s"rolling-DAU fan-out must be explode + equi-semijoin, never a range join:\n$plan2")
  }

  test("multi-touch attribution: banded equi-join only, normalizer window keyed by purchase") {
    val plan = executed(RangeJoin.multiTouch(graft.Tables.events(TestSpark.spark, dir)))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"touch-purchase candidates must come from the banded equi-join:\n$plan")
    assert(plan.contains("Window"),
      s"expected the per-purchase normalizer window in:\n$plan")
  }

  test("IVF median split: one bounded-domain window, no corpus window, no cross product") {
    val spark = TestSpark.spark
    val emb = graft.Tables.embeddings(spark, dir)
    val cut = emb.count() * 4 / 5
    val old = emb.filter(col("vec_id") < cut)
    val idx = Similarity.ivfPqTrain(old, 8)
    val plan = executed(Similarity.ivfMedianSplit(old, idx))
    assert(!plan.contains("CartesianProduct"),
      s"split must broadcast its one-row picks, not cross:\n$plan")
    // the ONLY unpartitioned window is the cumulative histogram over the
    // bounded 6-dp value domain — a member-sort formulation would add a
    // corpus-sized Window/Sort here
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows <= 1, s"expected at most the histogram-cum window, got $windows:\n$plan")
  }

  test("Heaps curve: type attribution is aggregate-form — no per-token window") {
    val plan = executed(TextOps.heapsCurve(graft.Tables.documents(TestSpark.spark, dir)))
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows <= 1,
      s"first-occurrence must be min-bucket aggregation, not a token window ($windows):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"doc-count must broadcast:\n$plan")
  }

  test("ppjoin: prefix join and verify stay shuffled equi-joins; no cross product") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try {
      val plan = executed(Dedup.ppJoinPairs(graft.Tables.documents(spark, dir)))
      // candidate volume is data-dependent: neither the prefix self-join
      // nor the candidate-restricted verify may force a broadcast
      assert(!plan.contains("BroadcastExchange") && !plan.contains("CartesianProduct"),
        s"prefix join must not force a broadcast or cross:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffled equi-joins in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("containment: candidate join and verify stay shuffled equi-joins; no cross product") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try {
      val plan = executed(Dedup.containmentPairs(graft.Tables.documents(spark, dir)))
      assert(!plan.contains("BroadcastExchange") && !plan.contains("CartesianProduct"),
        s"asymmetric prefix join must not force a broadcast or cross:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffled equi-joins in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zorder audit: no window anywhere — file ids are per-row projections") {
    val spark = TestSpark.spark
    val plan = executed(Layout.zorderAudit(
      graft.Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))))
    assert(!plan.contains("Window"),
      s"quadtree-cell assignment must not re-introduce a global window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"bounded sides must broadcast:\n$plan")
  }

  test("image shard dedup: band probe is a shuffled equi-join with no forced broadcast") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try {
      val docs = graft.Tables.documents(spark, dir)
      val cut = docs.count() * 4 / 5
      val saved = Multimodal.imageHashes(
        Multimodal.hashAssets(docs.filter(col("doc_id") < cut)))
      val plan = executed(Multimodal.imageShardNearDup(saved,
        Multimodal.hashAssets(docs.filter(col("doc_id") >= cut))))
      // fingerprint volume is corpus-sized at scale: the band join must
      // stay valid without a driver-sized broadcast
      assert(!plan.contains("BroadcastExchange") && !plan.contains("CartesianProduct"),
        s"band probe must not force a broadcast or cross:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on the band key in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bm25 serving batch: term IN-filter pushed to the saved postings scan, per-query rank partitioned") {
    val s = TestSpark.spark
    import s.implicits._
    val docs = graft.Tables.documents(s, dir)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-bm25plan").toString
    val idx = TextOps.trainAndSaveBm25Index(docs, idxDir)
    val queries = Seq((1L, Seq("the", "and")), (2L, Seq("spark")))
      .toDF("query_id", "terms")
    val plan = executed(TextOps.bm25ServeBatch(queries, idx))
    // the serving read is an index SEEK: the batch's term list reaches
    // the parquet scan as a pushed filter (with the t-sorted layout that
    // is row-group pruning), never a full postings probe
    assert(plan.contains("PushedFilters: [In(t"),
      s"expected the term IN-list pushed to the postings scan in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the query-id/stats broadcasts in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross product:\n$plan")
    // the rank window partitions by query_id: WindowGroupLimit truncates
    // map-side and one query can never funnel the whole batch
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-K must partial-limit:\n$plan")
    // the BUDGETED serve (t59) keeps the identical seek shape — the
    // IN-pushdown is collected AFTER the strip, so a dropped hot term's
    // row groups are never opened. On this corpus "the" is over budget
    // next to "spark" (df-rarest first): it must be ABSENT from the
    // postings scan's pushed filter, while the seek itself remains.
    val bplan = executed(TextOps.bm25ServeBatchBudgeted(
      Seq((1L, Seq("the", "spark"))).toDF("query_id", "terms"), idx))
    // the STATS scan legitimately reads both terms (pricing needs the
    // hot term's df); the POSTINGS scan is the one the budget protects.
    // With a single surviving term Catalyst collapses the IN to an
    // EqualTo — either way it is a pushed term seek without "the".
    val postingsLine = bplan.linesIterator
      .filter(l => l.contains("bm25_postings") &&
        (l.contains("PushedFilters: [In(t") ||
          l.contains("EqualTo(t,"))).mkString("\n")
    assert(postingsLine.nonEmpty,
      s"budgeted serve must keep the postings index seek:\n$bplan")
    assert(postingsLine.contains("spark") && !postingsLine.contains("the,") &&
      !postingsLine.contains("the)") && !postingsLine.contains("the]"),
      s"the dropped hot term must not reach the postings scan:\n$postingsLine")
  }

  test("budgeted ANN serve: a dropped cell never reaches the codes scan's pushdown") {
    val s = TestSpark.spark
    import s.implicits._
    // the AnnBudgetSpec fixture saved to parquet: 4 axis clusters sized
    // 10/3/2/1 (dim 8, sub 1), so a request probing cell 0 then cell 1
    // keeps only cell 0 (occ 10 alone exceeds the budget of 8; pr = 1
    // guarantee) and drops cell 1
    def axis(ax: Int, hi: Float = 1.0f, lo: (Int, Float) = (0, 0.0f)) = {
      val v = Array.fill(8)(0.0f); v(ax) = hi
      if (lo._2 != 0.0f) v(lo._1) = lo._2
      v
    }
    val members: Seq[(Long, Int)] =
      Seq(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3) ++ (4L to 12L).map(_ -> 0) ++
        Seq(13L -> 1, 14L -> 1, 15L -> 2)
    val corpus = members.map { case (id, ax) => (id, s"c$ax", axis(ax)) }
      .toDF("vec_id", "label", "embedding")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-annplan").toString
    Similarity.trainAndSaveIvfPq(corpus, 1, idxDir)
    val idx = Similarity.loadIvfPq(s, idxDir)
    val q = Seq((100L, "q", axis(0, 1.0f, (1, 0.5f))))
      .toDF("vec_id", "label", "embedding")
    def codesFilter(plan: String): String = plan.linesIterator
      .filter(l => l.contains("ivfpq_codes") && l.contains("PushedFilters: ["))
      .mkString("\n")
    // plain serve: BOTH probed cells reach the scan's pushed filter
    val plain = codesFilter(executed(Similarity.ivfPqServe(q, corpus, idx, 1, 3)))
    assert(plain.contains("In(cell, [0,1])") || plain.contains("In(cell, [1,0])"),
      s"plain serve must push both probed cells:\n$plain")
    // budgeted serve: the pushdown is collected AFTER the strip — the
    // dropped cell (1) must be absent while the kept cell's seek remains
    // (a single-cell IN collapses to EqualTo, the t59 convention)
    val budgeted = codesFilter(executed(
      Similarity.ivfPqServeBudgeted(q, corpus, idx, 1, 3)))
    assert(budgeted.contains("EqualTo(cell,0)") || budgeted.contains("In(cell, [0])"),
      s"budgeted serve must keep the codes index seek on the kept cell:\n$budgeted")
    assert(!budgeted.contains("cell,1") && !budgeted.contains("[0,1]") &&
      !budgeted.contains("[1,0]") && !budgeted.contains("cell, [1"),
      s"the dropped cell must not reach the codes scan:\n$budgeted")
  }

  test("q39 decorrelation: scalar threshold broadcasts, NOT EXISTS is an anti-join") {
    val plan = executed(graft.SparkEntry.queries("q39_dormant_capital")(
      TestSpark.spark, dir))
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the scalar row must broadcast, not cross:\n$plan")
  }

  test("rtbf sweep: artifact-table aggregates only — no cross product anywhere") {
    val plan = executed(graft.SparkEntry.queries("p53_rtbf_sweep")(
      TestSpark.spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"every leg must stay equi-join/broadcast:\n$plan")
  }

  test("artifact manifest: one-row health legs, no cross product anywhere") {
    val plan = executed(graft.SparkEntry.queries("p54_artifact_manifest")(
      TestSpark.spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"coverage probes must stay aggregates + broadcast one-row joins:\n$plan")
  }

  test("p56 media ingest: the full multimodal composition stays cross-product-free") {
    // p41's legs plus the three media shard probes in ONE plan — each
    // leg keeps its own plan-locked shape; the composition must not
    // introduce a cartesian anywhere (the p53/p54 lock applied to the
    // widest composition query)
    val plan = executed(graft.SparkEntry.queries("p56_media_ingest")(
      TestSpark.spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"every composed leg must stay equi-join/broadcast:\n$plan")
  }

  test("positional retrieval: postings materialize once per query, joins stay equi-joins") {
    for (name <- Seq("t47_phrase_search", "t48_proximity_search")) {
      val plan = executed(graft.SparkEntry.queries(name)(TestSpark.spark, dir))
      assert(!plan.contains("CartesianProduct"),
        s"$name: position joins must stay equi-keyed:\n$plan")
      // the phrase terms' postings are the checkpointed intermediate —
      // every leg reads it, the corpus explode runs once
      assert(plan.contains("ExistingRDD"),
        s"$name: the filtered postings must be the materialized checkpoint:\n$plan")
      assert(!plan.contains("documents.parquet"),
        s"$name: no leg may re-scan the corpus past the checkpoint:\n$plan")
    }
  }

  test("positional serving: term predicates pushed to the saved occurrence scan — an index seek, never a corpus pass") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, dir)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-posplan").toString
    val idx = TextOps.trainAndSavePositionalIndex(docs, idxDir)
    for ((name, df) <- Seq(
        "t49" -> TextOps.phraseFromIndex(idx),
        "t52" -> TextOps.proximityFromIndex(idx, "window", "join"),
        "t53" -> TextOps.spanNearFromIndex(idx))) {
      val plan = executed(df)
      // each leg's term filter reaches the parquet scan: with the
      // t-sorted layout that is row-group pruning (the bm25ServeBatch
      // seek contract applied to occurrences)
      assert(plan.contains("PushedFilters: [IsNotNull(t), EqualTo(t,"),
        s"$name: expected the term predicate pushed to the scan in:\n$plan")
      assert(!plan.contains("documents.parquet"),
        s"$name: serving must read the artifact, never the corpus:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name: position joins must stay equi-keyed:\n$plan")
    }
    // the multi-query batch form: the batch's term set is a pushed IN,
    // the request rows broadcast, coverage joins stay equi-keyed
    val sess = s
    import sess.implicits._
    val batch = Seq((1L, Seq("window", "join")), (2L, Seq("spark")))
      .toDF("query_id", "phrase")
    val bplan = executed(TextOps.phraseServeBatch(batch, idx))
    assert(bplan.contains("PushedFilters: [In(t"),
      s"serve batch: expected the term IN-list pushed to the scan in:\n$bplan")
    assert(bplan.contains("BroadcastHashJoin") &&
      !bplan.contains("CartesianProduct"),
      s"serve batch: request rows must broadcast, joins equi-keyed:\n$bplan")
    val pbatch = Seq((1L, "window", "join", 5), (2L, "join", "window", 2))
      .toDF("query_id", "a", "b", "slop")
    val pplan = executed(TextOps.proximityServeBatch(pbatch, idx))
    assert(pplan.contains("PushedFilters: [In(t"),
      s"proximity batch: expected the term IN-list pushed to the scan in:\n$pplan")
    assert(pplan.contains("BroadcastHashJoin") &&
      !pplan.contains("CartesianProduct"),
      s"proximity batch: request rows must broadcast, pair join equi-keyed:\n$pplan")
    // the span-near batch: mixed-k chains share one plan — the term IN
    // pushed down, request rows broadcast, every chain step equi-keyed
    val snbatch = Seq((1L, Seq("window", "join", "hash"), 8),
        (2L, Seq("window", "join"), 5))
      .toDF("query_id", "terms", "gap")
    val snplan = executed(TextOps.spanNearServeBatch(snbatch, idx))
    assert(snplan.contains("PushedFilters: [In(t"),
      s"span-near batch: expected the term IN-list pushed to the scan in:\n$snplan")
    assert(snplan.contains("BroadcastHashJoin") &&
      !snplan.contains("CartesianProduct"),
      s"span-near batch: request rows must broadcast, chain joins equi-keyed:\n$snplan")
    // the unordered family: the single-query coverage count has NO join
    // at all — the term seek feeds one partial-aggregated count
    val cplan = executed(TextOps.coocFromIndex(idx, Seq("window", "join"), 5))
    assert(cplan.contains("PushedFilters: [In(t"),
      s"cooc: expected the term IN-list pushed to the scan in:\n$cplan")
    assert(!cplan.contains("Join"),
      s"cooc: the coverage count must not join anything:\n$cplan")
    // and its batch form joins ONLY the broadcast request rows
    val cbatch = Seq((1L, Seq("window", "join"), 5),
        (2L, Seq("window", "join", "hash"), 12))
      .toDF("query_id", "terms", "win")
    val cbplan = executed(TextOps.coocServeBatch(cbatch, idx))
    assert(cbplan.contains("PushedFilters: [In(t"),
      s"cooc batch: expected the term IN-list pushed to the scan in:\n$cbplan")
    assert(cbplan.contains("BroadcastHashJoin") &&
      !cbplan.contains("SortMergeJoin") &&
      !cbplan.contains("CartesianProduct"),
      s"cooc batch: the only join is the broadcast request attach:\n$cbplan")
  }

  test("distributed ntile: the rank window is partition-keyed — never the move-everything-to-one-task plan") {
    val s = TestSpark.spark
    val df = Ranking.withNtile(
      graft.Tables.customer(s, dir).select(col("c_acctbal"), col("c_custkey")),
      "q", 4, Seq(col("c_acctbal"), col("c_custkey")))
    val plan = executed(df)
    assert(!plan.contains("ntile("),
      s"the bucket must be rank arithmetic, not an ntile window:\n$plan")
    // round 16: NO Window node at all — the partition-local position
    // reads off monotonically_increasing_id over the checkpointed sort
    // order, so the old PARTITION BY __pid window (a second full
    // shuffle + re-sort of the frame) is gone entirely
    val winLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(winLines.isEmpty,
      s"the distributed rank must be window-free (mono-id local offset " +
        s"+ broadcast partition offsets):\n$plan")
    assert(plan.contains("monotonically_increasing_id"),
      s"the local offset must ride the mono-id projection:\n$plan")
    // and the full q34 query plans the same way: no ntile, no rank
    // window anywhere (its three quintiles are all Ranking.withNtile)
    val q34 = executed(graft.SparkEntry.queries("q34_rfm")(s, dir))
    assert(!q34.contains("ntile("),
      s"q34 must ride the distributed rank, not a global ntile:\n$q34")
    val q34Wins = q34.linesIterator.filter(_.contains("Window ")).toSeq
    assert(q34Wins.isEmpty,
      s"q34's ranks must all be window-free:\n$q34")
  }

  test("q41 decorrelation: the per-part average joins back as an equi-join — no cross product, no third lineitem pass") {
    val plan = executed(graft.SparkEntry.queries("q41_small_qty_revenue")(
      TestSpark.spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"the avg join-back must stay an equi-join:\n$plan")
    // Q17 is inherently two lineitem passes (the per-part average and the
    // join-back) — but never more
    val scans = plan.split("lineitem.parquet").length - 1
    assert(scans <= 2, s"expected at most 2 lineitem scans, got $scans:\n$plan")
  }

  test("q42 decorrelation: the revenue view materializes once — one lineitem scan feeds both consumers") {
    val plan = executed(graft.SparkEntry.queries("q42_top_supplier")(
      TestSpark.spark, dir))
    // the checkpointed per-supplier view is read by the row side AND the
    // max side; without it the scan + aggregation would run twice
    val scans = plan.split("lineitem.parquet").length - 1
    assert(scans <= 1, s"expected one lineitem scan, got $scans:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"the revenue view must be the materialized checkpoint:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the one-row max must broadcast:\n$plan")
  }

  test("runtime exchange reuse holds at every checkpoint-free shared-subtree site") {
    // Round 17 REMOVED checkpoints where the runtime already evaluates a
    // shared subtree once: self-join sides over identical canonical
    // subtrees and twice-broadcast builds plan a ReusedExchange in the
    // final adaptive plan. That property is config-sensitive
    // (spark.sql.exchange.reuse / AQE off silently re-runs corpus-scale
    // aggregates) and was previously evidenced only by committed plan
    // dumps — this pins it, so a config or Spark-version change fails CI
    // instead of regressing quietly (the ADVICE r17 item).
    val spark = TestSpark.spark
    // forced-shuffle planning (the lshPairs-test convention): at fixture
    // scale AQE may legitimately swap a self-join side to a broadcast,
    // which replaces stage reuse rather than exercising it — the property
    // these sites' comments cite is SHUFFLE-exchange reuse, so pin that.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    try {
      val docs = graft.Tables.documents(spark, dir)
      for ((name, df) <- Seq(
          // cnt's two verify-side joins build ONE canonical exchange
          "d2 jaccardPairs" -> Dedup.jaccardPairs(docs),
          // the band-bucket self-join's sides reuse one signature exchange
          "d4 lshPairs" -> Dedup.lshPairs(docs),
          // the simhash band self-join's sides reuse one fingerprint pass
          "d15 simhashPairs" -> Dedup.simhashPairs(docs),
          // the image-fingerprint band self-join reuses one decode pass
          "mm7 imageHashPairs" ->
            Multimodal.imageHashPairs(Multimodal.hashAssets(docs)))) {
        val plan = executed(df)
        assert(plan.contains("ReusedExchange"),
          s"$name: expected a ReusedExchange on the shared subtree (its " +
            s"checkpoint was removed on this property holding):\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("collocations + textrank: top-K is TakeOrderedAndProject, never a full-table rank") {
    val docs = graft.Tables.documents(TestSpark.spark, dir)
    // the PMI pair table / token-centrality table are unbounded at scale;
    // the K-cut must be the map-side partial top-K, with the rank window
    // running over exactly K surviving rows
    for ((name, df) <- Seq(
        "t39" -> TextOps.collocations(docs),
        "t42" -> Graph.textRank(docs))) {
      val plan = executed(df)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name: global ORDER BY+LIMIT must plan as partial top-K:\n$plan")
    }
  }
}
