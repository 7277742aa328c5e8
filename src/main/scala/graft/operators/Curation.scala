package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable

/** Corpus-curation operators for a training-data pipeline (SURVEY §2.8
  * north star): deterministic stratified sampling, per-source caps, and
  * benchmark decontamination.
  *
  * Scale design:
  *  - sampling is a stateless per-row hash predicate — no shuffle at all,
  *    fully pushdown-friendly, reproducible across runs and engines;
  *  - the per-source cap is one shuffle on the skew-bounded source key;
  *  - decontamination reuses the stop-shingle-capped inverted index
  *    (Dedup.shingles) and joins train-side shingles against the (small)
  *    benchmark side — broadcast-able at 100 TB, never a cross product.
  */
object Curation {

  /** PER-SOURCE DATASHEET (p55, "Datasheets for Datasets" — Gebru et
    * al. 2018, the composition/documentation artifact; the table a
    * dataset RELEASE ships): one row per source with the statistics the
    * battery computes individually, composed the p41/p53 way — every
    * column nests an existing component's exact semantics, and the
    * oracle replays each from the base tables, so the published
    * datasheet cannot drift from the gates that produced the data:
    *  - volume: document and token counts (t1's units);
    *  - mean quality score (the p20 gate's per-row expression, t2);
    *  - language mix: majority label + its share (exact integer counts,
    *    alphabetical tie-break);
    *  - near-duplicate rate in ppm, from the SAVED cluster-label
    *    artifact (d8/d11's labels; floored integer ppm — the p48
    *    convention), never a fresh pair enumeration;
    *  - benchmark-contaminated documents (p21's verdicts; benchmark
    *    docs themselves are excluded from every count, p21's rule);
    *  - mean unigram surprisal (t13's per-doc bits, zero-token docs
    *    pinned at 0.0, the p23 averaging idiom).
    *
    * Scale shape: one token/shingle pass each for quality,
    * contamination and surprisal (corpus-linear, partial-aggregated per
    * source); the dup column is an aggregate of the saved label
    * artifact; the lang mix aggregates the bounded (source, lang)
    * table. Nothing is collected; every join is keyed or broadcast.
    */
  def datasheet(docs: DataFrame, labels: DataFrame): DataFrame = {
    import graft.operators.TextOps
    val src = docs.select(col("doc_id"), col("source"))
    val per = docs.select(col("source"),
      size(Portable.tokens(col("text"))).cast("long").as("n_tok"),
      TextOps.qualityScore(col("text")).as("q"))
    val vol = per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"),
        round(avg(col("q")), 4).as("mean_quality"))
    val wLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("c").desc, col("lang"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wLang)).filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c"))
    val dup = labels.join(src, "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup"))
    val cont = contaminationReport(docs).filter(col("contaminated"))
      .join(src, "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n_contaminated"))
    val bits = TextOps.unigramSurprisal(docs).join(src, "doc_id")
      .groupBy(col("source"))
      .agg(round(avg(col("bits_per_token")), 4).as("mean_bits_per_token"))
    vol.join(topLang, "source")
      .join(dup, Seq("source"), "left")
      .join(cont, Seq("source"), "left")
      .join(bits, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("top_lang"),
        round(col("c") * lit(1.0) / col("n_docs"), 4).as("top_lang_frac"),
        expr("(coalesce(n_dup, 0) * 1000000) div n_docs").as("dup_ppm"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        col("mean_bits_per_token"))
      .orderBy(col("source"))
  }

  /** Oracle for [[datasheet]]: every column replayed from the base
    * tables — the p21 contamination CTEs, the t13 full-corpus model, the
    * d8 closure over the LSH replay (the p53 oracle's chain, unpruned) —
    * composed per source.
    */
  def sqlDatasheet: String = {
    import graft.functions.Portable
    val q = TextOps.sqlQualityScoreExpr("text")
    s"""WITH RECURSIVE ${graft.operators.Dedup.sqlShingleCtes},
       |p AS MATERIALIZED (${graft.operators.Dedup.sqlLshPairs}),
       |e AS (SELECT ia AS a, ib AS b FROM p
       |      UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |comp AS (SELECT a AS doc_id FROM
       |  (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |bench AS (SELECT DISTINCT g FROM sh0 WHERE doc_id % $BenchmarkMod = 0),
       |cper AS (SELECT c.doc_id, count(*)::BIGINT AS n_shingles,
       |    count(b.g)::BIGINT AS n_shared
       |  FROM (SELECT doc_id, g FROM sh0 WHERE doc_id % $BenchmarkMod <> 0) c
       |  LEFT JOIN bench b ON b.g = c.g GROUP BY 1),
       |btoks AS (SELECT doc_id, unnest(${Portable.sqlTokens("text")}) AS t
       |  FROM documents),
       |btf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM btoks GROUP BY 1, 2),
       |fc AS (SELECT t, sum(tf)::BIGINT AS c FROM btf GROUP BY t),
       |ft AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM fc),
       |fsc AS (SELECT btf.doc_id, btf.tf,
       |    btf.tf * -log2((fc.c + 1.0) / (ft.n + ft.v)) AS wbits
       |  FROM btf JOIN fc USING (t), ft),
       |fper AS (SELECT doc_id, round(sum(wbits) / sum(tf), 4) AS bits
       |  FROM fsc GROUP BY doc_id),
       |vol AS (SELECT d.source, count(*)::BIGINT AS n_docs,
       |    coalesce(sum(len(${Portable.sqlTokens("text")})), 0)::BIGINT AS n_tokens,
       |    round(avg($q), 4) AS mean_quality,
       |    round(avg(coalesce(fper.bits, 0.0)), 4) AS mean_bits_per_token
       |  FROM documents d LEFT JOIN fper ON fper.doc_id = d.doc_id
       |  GROUP BY d.source),
       |lc AS (SELECT source, lang, count(*)::BIGINT AS c
       |  FROM documents GROUP BY 1, 2),
       |lt AS (SELECT source, lang, c,
       |    row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn
       |  FROM lc),
       |dup AS (SELECT d.source, count(*)::BIGINT AS n_dup
       |  FROM comp JOIN documents d ON d.doc_id = comp.doc_id GROUP BY 1),
       |cont AS (SELECT d.source, count(*)::BIGINT AS n_contaminated
       |  FROM cper JOIN documents d ON d.doc_id = cper.doc_id
       |  WHERE cper.n_shared * 1.0 / cper.n_shingles > $ContaminationFracMax
       |  GROUP BY 1)
       |SELECT v.source, v.n_docs, v.n_tokens, v.mean_quality,
       |  lt.lang AS top_lang,
       |  round(lt.c * 1.0 / v.n_docs, 4) AS top_lang_frac,
       |  (coalesce(dup.n_dup, 0) * 1000000) // v.n_docs AS dup_ppm,
       |  coalesce(cont.n_contaminated, 0)::BIGINT AS n_contaminated,
       |  v.mean_bits_per_token
       |FROM vol v
       |JOIN lt ON lt.source = v.source AND lt.rn = 1
       |LEFT JOIN dup ON dup.source = v.source
       |LEFT JOIN cont ON cont.source = v.source
       |ORDER BY v.source""".stripMargin
  }

  // ------------------------------------------- deterministic sampling

  /** Per-source sampling rate in percent: 20..79, derived from the source
    * name's hash — stands in for a configured mixing-weights table while
    * staying oracle-derivable.
    */
  def sampleRate(source: Column): Column =
    lit(20) + Portable.hash32(source) % lit(60)

  def sqlSampleRate(e: String): String =
    s"(20 + ${Portable.sqlHash32(e)} % 60)"

  /** Deterministic stratified Bernoulli sample: keep a doc iff
    * hash32(doc_id) mod 100 falls under its source's rate. A pure per-row
    * predicate — reproducible, engine-portable, and zero-shuffle (the
    * filter pushes to the scan).
    */
  def stratifiedSample(docs: DataFrame): DataFrame =
    docs
      .filter(Portable.hash32(col("doc_id").cast("string")) % 100 < sampleRate(col("source")))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  val sqlStratifiedSample: String =
    s"""SELECT doc_id, source FROM documents
       |WHERE ${Portable.sqlHash32("doc_id::VARCHAR")} % 100 < ${sqlSampleRate("source")}
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- per-source caps

  /** Max documents kept per source (quality practice: bound any one
    * domain's contribution to the corpus).
    */
  val SourceCap = 10

  /** Keep at most [[SourceCap]] docs per source, deterministically the
    * lowest doc_ids. One shuffle on source; rank is computed per-partition
    * after the exchange (no global sort).
    */
  def perSourceCap(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SourceCap)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val sqlPerSourceCap: String =
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents) WHERE rn <= $SourceCap
       |ORDER BY doc_id""".stripMargin

  // ------------------------- systematic PPS weighted sampling (p34)

  /** Target sample size as a corpus fraction: one doc kept per
    * [[PpsTargetDiv]] docs (in expectation weight-proportionally).
    */
  val PpsTargetDiv = 10

  /** Shards for the PPS prefix sum — same rationale as [[PackShards]]:
    * a global running sum is one reducer's straggle at 100 TB.
    */
  val PpsShards = 64

  /** Systematic probability-proportional-to-size sampling (p34) — the
    * classical survey-sampling technique (Madow 1949) applied to corpus
    * curation: lay every document's weight (its n_chars — a proxy for
    * token cost) end to end on an integer line, then pick one document at
    * every `stride = total_weight / target` boundary. Each doc's pick
    * count is the number of stride boundaries inside its weight interval
    * — selection probability exactly proportional to size, heavy docs
    * may be hit more than once (`n_picks` carries the multiplicity, the
    * standard PPS-with-replacement accounting a weighted-mixture loader
    * consumes). Unlike Bernoulli-by-hash (p3), the sample size is
    * GUARANTEED: exactly total/stride picks, never a variance-of-the-
    * draw miss on a small stratum — and the whole computation is integer
    * division, bit-identical cross-engine, no random state anywhere.
    *
    * Scale shape: the concat line is ordered (shard, doc_id) — the
    * [[PackShards]] trick: per-(shard) windows do the running sum
    * [[PpsShards]]-way parallel, a [[PpsShards]]-row summary table
    * provides each shard's carry-in offset (rows-frame window over the
    * tiny table, then broadcast back), and the single-row grand total
    * arrives via a broadcast cross join. One corpus shuffle total.
    */
  def ppsSample(docs: DataFrame): DataFrame =
    ppsWeighted(docs.select(col("doc_id"), col("n_chars").as("w")))

  /** DEDUP-AWARE PPS (p49): [[ppsSample]]'s systematic draw with the
    * size column swapped for p48's soft-dedup expected-token weights —
    * a near-dup cluster of n documents collectively holds ONE document's
    * worth of selection probability, so the sample is
    * duplication-debiased without dropping anything. The composition the
    * two operators exist for: saved d8/d11 labels → [[softDedupWeights]]
    * → the same one-shuffle sharded prefix-sum machinery, integer-exact
    * end to end.
    */
  def ppsSoftDedup(docs: DataFrame, clusters: DataFrame): DataFrame =
    ppsWeighted(softDedupWeights(docs, clusters)
      .select(col("doc_id"), col("exp_tok_ppm").as("w")))

  /** The p34 sampler body over an arbitrary (doc_id, w) weighting. */
  private[operators] def ppsWeighted(base0: DataFrame): DataFrame = {
    val shard = (Portable.hash32(col("doc_id").cast("string")) % PpsShards).cast("int")
    val base = base0.select(col("doc_id"), shard.as("shard"), col("w"))
    val wWin = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val intervals = base.withColumn("cum", sum(col("w")).over(wWin))
    // shard totals come from a PLAIN aggregate, not max(cum) over the
    // windowed frame: deriving them from `intervals` would make Spark
    // recompute the corpus window once per consumer (measured: three
    // Window subtrees in the plan) — the aggregate is a pruned scan
    val shardTot = base.groupBy(col("shard"))
      .agg(sum(col("w")).as("tot"), count(lit(1)).as("cnt"))
    val carryWin = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = shardTot
      .withColumn("carry", coalesce(sum(col("tot")).over(carryWin), lit(0L)))
      .select(col("shard"), col("carry"))
    // stride from the doc count, floor-guarded to 1 for tiny corpora
    val strideRow = shardTot
      .agg(sum(col("tot")).as("total"), sum(col("cnt")).as("ndocs"))
      .select(greatest(
        expr(s"total div greatest(ndocs div $PpsTargetDiv, 1L)"), lit(1L))
        .as("stride"))
    intervals
      .join(broadcast(carries), "shard")
      .crossJoin(broadcast(strideRow))
      .withColumn("n_picks",
        (expr("(carry + cum) div stride") -
          expr("(carry + cum - w) div stride")).cast("int"))
      .filter(col("n_picks") >= 1)
      .select(col("doc_id"), col("w"), col("n_picks"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[ppsSoftDedup]]: the p48 weight CTEs (recursive closure
    * + floored ppm arithmetic) feeding the p34 systematic-draw CTEs.
    */
  val sqlPpsSoftDedup: String = {
    val h = Portable.sqlHash32("doc_id::VARCHAR")
    s"""WITH RECURSIVE p AS (${graft.operators.Dedup.sqlLshPairs}),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |cs AS MATERIALIZED (SELECT cluster, count(*)::BIGINT AS csize FROM clus GROUP BY 1),
       |wt AS MATERIALIZED (SELECT d.doc_id,
       |    floor(len(${Portable.sqlTokens("d.text")})
       |      * 1000000.0 / coalesce(cs.csize, 1))::BIGINT AS w
       |  FROM documents d
       |  LEFT JOIN clus ON clus.doc_id = d.doc_id
       |  LEFT JOIN cs ON cs.cluster = clus.cluster),
       |iv AS (SELECT doc_id,
       |    ($h % $PpsShards)::INT AS shard, w,
       |    sum(w) OVER (PARTITION BY ($h % $PpsShards)
       |      ORDER BY doc_id) AS cum
       |  FROM wt),
       |st AS (SELECT shard, max(cum) AS tot FROM iv GROUP BY shard),
       |ca AS (SELECT shard, coalesce(sum(tot) OVER (ORDER BY shard
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry FROM st),
       |tt AS (SELECT sum(tot) AS total FROM st),
       |tg AS (SELECT (count(*) // $PpsTargetDiv)::BIGINT AS target FROM wt)
       |SELECT iv.doc_id, iv.w::BIGINT AS w,
       |  ((ca.carry + iv.cum) // s.stride
       |    - (ca.carry + iv.cum - iv.w) // s.stride)::INT AS n_picks
       |FROM iv JOIN ca USING (shard),
       |  (SELECT greatest(tt.total // greatest(tg.target, 1), 1) AS stride
       |   FROM tt, tg) s
       |WHERE (ca.carry + iv.cum) // s.stride
       |    - (ca.carry + iv.cum - iv.w) // s.stride >= 1
       |ORDER BY iv.doc_id""".stripMargin
  }

  val sqlPpsSample: String =
    s"""WITH iv AS (SELECT doc_id,
       |    (${Portable.sqlHash32("doc_id::VARCHAR")} % $PpsShards)::INT AS shard,
       |    n_chars AS w,
       |    sum(n_chars) OVER (PARTITION BY (${Portable.sqlHash32("doc_id::VARCHAR")} % $PpsShards)
       |      ORDER BY doc_id) AS cum
       |  FROM documents),
       |st AS (SELECT shard, max(cum) AS tot FROM iv GROUP BY shard),
       |ca AS (SELECT shard, coalesce(sum(tot) OVER (ORDER BY shard
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry FROM st),
       |tt AS (SELECT sum(tot) AS total FROM st),
       |tg AS (SELECT (count(*) // $PpsTargetDiv)::BIGINT AS target FROM documents)
       |SELECT iv.doc_id, iv.w::BIGINT AS w,
       |  ((ca.carry + iv.cum) // s.stride
       |    - (ca.carry + iv.cum - iv.w) // s.stride)::INT AS n_picks
       |FROM iv JOIN ca USING (shard),
       |  (SELECT greatest(tt.total // greatest(tg.target, 1), 1) AS stride
       |   FROM tt, tg) s
       |WHERE (ca.carry + iv.cum) // s.stride
       |    - (ca.carry + iv.cum - iv.w) // s.stride >= 1
       |ORDER BY iv.doc_id""".stripMargin

  /** STRATIFIED systematic PPS (p40) — [[ppsSample]] run per SOURCE
    * stratum: each source gets its own weight line and its own stride,
    * so every stratum lands EXACTLY its proportional sample size (the
    * survey-sampling composition of p3's strata with p34's
    * guaranteed-size machinery: Bernoulli-per-stratum still has
    * per-stratum size variance; this has none). Same integer arithmetic,
    * bit-identical cross-engine.
    *
    * Scale shape: the p34 shape with `source` prepended to every key —
    * per-(source, shard) windows for the prefix sums, a sources×shards
    * carry table (broadcast), a sources-sized stride table (broadcast);
    * one corpus shuffle total.
    */
  def ppsSampleStratified(docs: DataFrame): DataFrame = {
    val shard = (Portable.hash32(col("doc_id").cast("string")) % PpsShards).cast("int")
    val base = docs.select(col("doc_id"), col("source"),
      shard.as("shard"), col("n_chars").as("w"))
    val wWin = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
    val intervals = base.withColumn("cum", sum(col("w")).over(wWin))
    val shardTot = base.groupBy(col("source"), col("shard"))
      .agg(sum(col("w")).as("tot"), count(lit(1)).as("cnt"))
    val carryWin = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = shardTot
      .withColumn("carry", coalesce(sum(col("tot")).over(carryWin), lit(0L)))
      .select(col("source"), col("shard"), col("carry"))
    val strides = shardTot.groupBy(col("source"))
      .agg(sum(col("tot")).as("total"), sum(col("cnt")).as("ndocs"))
      .select(col("source"), greatest(
        expr(s"total div greatest(ndocs div $PpsTargetDiv, 1L)"), lit(1L))
        .as("stride"))
    intervals
      .join(broadcast(carries), Seq("source", "shard"))
      .join(broadcast(strides), "source")
      .withColumn("n_picks",
        (expr("(carry + cum) div stride") -
          expr("(carry + cum - w) div stride")).cast("int"))
      .filter(col("n_picks") >= 1)
      .select(col("doc_id"), col("source"), col("w"), col("n_picks"))
      .orderBy(col("doc_id"))
  }

  val sqlPpsSampleStratified: String =
    s"""WITH iv AS (SELECT doc_id, source,
       |    (${Portable.sqlHash32("doc_id::VARCHAR")} % $PpsShards)::INT AS shard,
       |    n_chars AS w,
       |    sum(n_chars) OVER (PARTITION BY source,
       |      (${Portable.sqlHash32("doc_id::VARCHAR")} % $PpsShards)
       |      ORDER BY doc_id) AS cum
       |  FROM documents),
       |st AS (SELECT source, shard, sum(w) AS tot, count(*) AS cnt
       |  FROM iv GROUP BY 1, 2),
       |ca AS (SELECT source, shard, coalesce(sum(tot) OVER (PARTITION BY source
       |    ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
       |  FROM st),
       |sr AS (SELECT source,
       |    greatest(sum(tot) // greatest(sum(cnt) // $PpsTargetDiv, 1), 1) AS stride
       |  FROM st GROUP BY source)
       |SELECT iv.doc_id, iv.source, iv.w::BIGINT AS w,
       |  ((ca.carry + iv.cum) // sr.stride
       |    - (ca.carry + iv.cum - iv.w) // sr.stride)::INT AS n_picks
       |FROM iv JOIN ca ON ca.source = iv.source AND ca.shard = iv.shard
       |JOIN sr ON sr.source = iv.source
       |WHERE (ca.carry + iv.cum) // sr.stride
       |    - (ca.carry + iv.cum - iv.w) // sr.stride >= 1
       |ORDER BY iv.doc_id""".stripMargin

  // ----------------------------------------------------- token chunking

  /** Fixed-size token windows with overlap — the sequence-prep op that
    * turns documents into training samples.
    */
  val ChunkSize = 64
  val ChunkOverlap = 16

  /** Chunk each doc into ChunkSize-token windows starting every
    * (ChunkSize - ChunkOverlap) tokens. Pure per-row explode over
    * materialized tokens — no shuffle besides the presentation sort;
    * chunks are verified by md5 of their joined text.
    */
  def chunk(docs: DataFrame): DataFrame = {
    val step = ChunkSize - ChunkOverlap
    docs.select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), greatest(size(col("w")), lit(1)), lit(step))).as("s"))
      .select(col("doc_id"), col("s"),
        slice(col("w"), col("s"), lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("s"),
        size(col("chunk")).cast("bigint").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("s"))
  }

  def sqlChunk: String = {
    val step = ChunkSize - ChunkOverlap
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents)
       |SELECT doc_id, s,
       |  len(w[s : least(s + ${ChunkSize - 1}, len(w))])::BIGINT AS n_tokens,
       |  md5(array_to_string(w[s : least(s + ${ChunkSize - 1}, len(w))], ' ')) AS chunk_md5
       |FROM toks, LATERAL unnest(range(1, greatest(len(w), 1) + 1, $step)) t(s)
       |ORDER BY doc_id, s""".stripMargin
  }

  // ------------------------------------------------- corpus accounting

  /** Per-source corpus accounting — docs, tokens, and each source's share
    * of total tokens: the numbers a mixture-weights decision reads.
    *
    * Scale shape: one partial-aggregated groupBy on source; the grand total
    * is a single-row aggregate of the (tiny, one-row-per-source) result,
    * broadcast back — never a single-partition window over row data.
    */
  def corpusStats(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Portable.tokens(col("text")))).cast("bigint").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        // a fully zero-token corpus makes 0/0 — NULL in Spark, NaN in
        // DuckDB; pin the degenerate edge to 0.0 in both engines
        when(col("tot") === 0, lit(0.0))
          .otherwise(round(col("n_tokens") / col("tot"), 6)).as("token_share"))
      .orderBy(col("source"))
  }

  val sqlCorpusStats: String =
    s"""WITH per AS (SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(len(${Portable.sqlTokens("text")}))::BIGINT AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(n_tokens)::BIGINT AS tot FROM per)
       |SELECT source, n_docs, n_tokens,
       |  CASE WHEN tot = 0 THEN 0.0 ELSE round(n_tokens::DOUBLE / tot, 6) END AS token_share
       |FROM per, tot ORDER BY source""".stripMargin

  // ------------------------------------------- mixture weights

  /** Temperature for mixture re-weighting: share^α with α < 1 upsamples
    * small sources (the standard multilingual/data-mixing temperature
    * sampling; α = 1 is proportional, α = 0 uniform).
    */
  val MixtureAlpha = 0.5

  /** Temperature-scaled source mixture weights — the data-mixing decision
    * [[corpusStats]] feeds: weight_s = share_s^α / Σ_t share_t^α, plus the
    * implied effective epochs (weight/share — how many passes over source
    * s one corpus-sized sample makes).
    *
    * Scale shape: everything after the per-source token aggregate operates
    * on one-row-per-source frames; the two normalization totals are
    * single-row aggregates broadcast back. The corpus is read once.
    */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(sum(size(Portable.tokens(col("text")))).cast("bigint").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot"))
    val shares = per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        // tot = 0 (whole corpus tokenizes to nothing): pin 0/0 to 0.0 in
        // both engines, like the per-source zero-share guard below
        when(col("tot") === 0, lit(0.0))
          .otherwise(col("n_tokens") / col("tot")).as("share"))
      .withColumn("p", pow(col("share"), MixtureAlpha))
    val z = shares.agg(sum(col("p")).as("z"))
    shares.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"),
        round(col("share"), 6).as("token_share"),
        when(col("z") === 0, lit(0.0))
          .otherwise(round(col("p") / col("z"), 6)).as("weight"),
        // share = 0 (a source whose docs tokenize to nothing) makes epochs
        // 0/0 — Spark's non-ANSI divide yields NULL, DuckDB's IEEE divide
        // yields NaN. Pin the edge to an explicit NULL in BOTH engines.
        when(col("share") === 0, lit(null).cast("double"))
          .otherwise(round(col("p") / col("z") / col("share"), 4)).as("epochs"))
      .orderBy(col("source"))
  }

  val sqlMixtureWeights: String =
    s"""WITH per AS (SELECT source,
       |    sum(len(${Portable.sqlTokens("text")}))::BIGINT AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(n_tokens)::BIGINT AS tot FROM per),
       |shares AS (SELECT source, n_tokens,
       |    CASE WHEN tot = 0 THEN 0.0 ELSE n_tokens::DOUBLE / tot END AS share,
       |    power(CASE WHEN tot = 0 THEN 0.0 ELSE n_tokens::DOUBLE / tot END,
       |      $MixtureAlpha) AS p
       |  FROM per, tot),
       |z AS (SELECT sum(p) AS z FROM shares)
       |SELECT source, n_tokens,
       |  round(share, 6) AS token_share,
       |  CASE WHEN z = 0 THEN 0.0 ELSE round(p / z, 6) END AS weight,
       |  CASE WHEN share = 0 THEN NULL ELSE round(p / z / share, 4) END AS epochs
       |FROM shares, z ORDER BY source""".stripMargin

  /** Sampling resolution for [[mixtureResample]]: keep rates are rounded
    * to 1e-6 and compared against a 32-bit content hash mod this scale,
    * so the keep decision is integer-exact in both engines.
    */
  val ResampleScale = 1000000L

  /** APPLY the p10 mixture weights (p19) — the resampled-corpus keep-list
    * a pipeline actually materializes after choosing a temperature: each
    * source is deterministically DOWN-sampled toward its target share,
    * scaled so the most up-weighted source keeps everything (downsampling
    * only — this engine never fabricates repeats; epochs > 1 is the
    * loader's job, exactly what p10's `epochs` column reports). keep_rate
    * for source s is (weight_s / share_s) / max_s(weight_s / share_s);
    * the per-doc coin is the seeded content hash ("mix" salt, doc_id) so
    * the sample is stable across reshuffles, engines and re-ingestion —
    * the p2/p14 determinism convention applied to mixture sampling.
    *
    * Scale shape: two source-cardinality aggregates (token shares, the
    * rate normalizer) broadcast back onto the corpus as a tiny dimension
    * table; the keep decision is a stateless per-row expression. One
    * corpus scan, one broadcast join, no shuffle of the corpus itself.
    */
  def mixtureResample(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(sum(size(Portable.tokens(col("text")))).cast("bigint").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot"))
    val shares = per.crossJoin(broadcast(tot))
      .select(col("source"),
        when(col("tot") === 0, lit(0.0))
          .otherwise(col("n_tokens") / col("tot")).as("share"))
      .withColumn("p", pow(col("share"), MixtureAlpha))
    val z = shares.agg(sum(col("p")).as("z"))
    val rates = shares.crossJoin(broadcast(z))
      .select(col("source"),
        // share = 0 (tokenless source): nothing to sample — rate 0, both
        // engines, instead of a 0/0 NULL/NaN divergence
        when(col("share") === 0 || col("z") === 0, lit(0.0))
          .otherwise(col("p") / col("z") / col("share")).as("rate0"))
    val m = rates.agg(max(col("rate0")).as("m"))
    val keepRate = rates.crossJoin(broadcast(m))
      .select(col("source"),
        when(col("m") === 0, lit(0.0))
          .otherwise(round(col("rate0") / col("m"), 6)).as("keep_rate"))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(keepRate), "source")
      .select(col("doc_id"), col("source"), col("keep_rate"),
        (Portable.hash32(concat_ws("|", lit("mix"), col("doc_id"))) % ResampleScale
          < col("keep_rate") * ResampleScale).as("keep"))
      .orderBy(col("doc_id"))
  }

  val sqlMixtureResample: String = {
    val h = Portable.sqlHash32("'mix|' || doc_id")
    s"""WITH per AS (SELECT source,
       |    sum(len(${Portable.sqlTokens("text")}))::BIGINT AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(n_tokens)::BIGINT AS tot FROM per),
       |shares AS (SELECT source,
       |    CASE WHEN tot = 0 THEN 0.0 ELSE n_tokens::DOUBLE / tot END AS share,
       |    power(CASE WHEN tot = 0 THEN 0.0 ELSE n_tokens::DOUBLE / tot END,
       |      $MixtureAlpha) AS p
       |  FROM per, tot),
       |z AS (SELECT sum(p) AS z FROM shares),
       |rates AS (SELECT source,
       |    CASE WHEN share = 0 OR z = 0 THEN 0.0 ELSE p / z / share END AS rate0
       |  FROM shares, z),
       |m AS (SELECT max(rate0) AS m FROM rates),
       |kr AS (SELECT source,
       |    CASE WHEN m = 0 THEN 0.0 ELSE round(rate0 / m, 6) END AS keep_rate
       |  FROM rates, m)
       |SELECT d.doc_id, d.source, kr.keep_rate,
       |  ($h % $ResampleScale) < kr.keep_rate * $ResampleScale AS keep
       |FROM documents d JOIN kr USING (source)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------- sequence packing

  /** Training sequence length (tokens) for packing. */
  val SeqLen = 512

  /** Packing shards per source: each source's concat order is split into
    * this many independent shards so no single reducer ever owns a whole
    * source's prefix sum. At 100 TB a real corpus is dominated by one
    * source (web ≈ 90%); per-source-only packing would put ~90 TB of
    * running sum in ONE window partition.
    */
  val PackShards = 64

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * doc_id order WITHIN each (source, shard) and cut into [[SeqLen]]-token
    * training sequences; each doc reports its shard, the shard-local
    * sequence span it lands in, and how many sequence boundaries cut
    * through it (the doc-boundary fragmentation a packing-aware loader
    * wants to know).
    *
    * Scale shape: a global (or even per-source) concatenation order is an
    * inherently sequential running sum — the dominant source lands in one
    * window partition, a straggler-or-OOM at 100 TB. Real pipelines pack
    * per shard, so the shard key is first-class: a deterministic
    * [[graft.functions.Portable.hash32]] of doc_id mod [[PackShards]],
    * making the prefix sum a (source, shard)-partitioned window — one
    * shuffle, [[PackShards]]-way parallel within every source, and the
    * same documents land in the same shards on every engine. Integer
    * `div` keeps boundary math exact (no doubles).
    */
  /** Shared packing arithmetic: each doc's token interval
    * [cum_prev, cum_prev + n_tokens) within its (source, shard) concat
    * stream.
    */
  private def packedIntervals(docs: DataFrame): DataFrame = {
    val shard = Portable.hash32(col("doc_id").cast("string")) % PackShards
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"), shard.cast("int").as("shard"),
        size(Portable.tokens(col("text"))).cast("bigint").as("n_tokens"))
      .withColumn("cum_prev",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
  }

  def packSequences(docs: DataFrame): DataFrame =
    packedIntervals(docs)
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        expr(s"cum_prev div $SeqLen").as("seq_first"),
        expr(s"(cum_prev + greatest(n_tokens, 1) - 1) div $SeqLen").as("seq_last"))
      .withColumn("n_cuts", (col("seq_last") - col("seq_first")).cast("int"))
      .orderBy(col("doc_id"))

  /** The loader-facing output of packing: WHICH TOKENS of which doc land in
    * which training sequence. Each doc explodes into one row per sequence
    * it intersects: shard-local seq id plus the doc-relative token span
    * [tok_start, tok_start + n_seq_tokens). Emitted in (doc_id, seq) order
    * (the oracle's total order); a loader replays by re-sorting its shard's
    * slice on (source, shard, seq) — a partition-local sort. Zero-token
    * docs contribute no segments.
    *
    * Scale shape: [[packedIntervals]]' sharded window plus a per-row
    * explode bounded by ceil(n_tokens / SeqLen) + 1 — output is O(corpus
    * tokens / SeqLen), never quadratic, and no further shuffle after the
    * window.
    */
  def packSegments(docs: DataFrame): DataFrame =
    packedIntervals(docs)
      .filter(col("n_tokens") > 0)
      .withColumn("seq", explode(sequence(
        expr(s"cum_prev div $SeqLen"),
        expr(s"(cum_prev + n_tokens - 1) div $SeqLen"))))
      .select(col("doc_id"), col("source"), col("shard"), col("seq"),
        greatest(col("seq") * SeqLen - col("cum_prev"), lit(0L)).as("tok_start"),
        (least(col("n_tokens"), (col("seq") + 1) * SeqLen - col("cum_prev")) -
          greatest(col("seq") * SeqLen - col("cum_prev"), lit(0L))).as("n_seq_tokens"))
      .orderBy(col("doc_id"), col("seq"))

  val sqlPackSegments: String =
    s"""WITH toks AS (SELECT doc_id, source,
       |    (${Portable.sqlHash32("doc_id::VARCHAR")} % $PackShards)::INT AS shard,
       |    len(${Portable.sqlTokens("text")})::BIGINT AS n_tokens
       |  FROM documents),
       |packed AS (SELECT doc_id, source, shard, n_tokens,
       |    (sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |       ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS cum_prev
       |  FROM toks WHERE n_tokens > 0)
       |SELECT doc_id, source, shard, t.seq::BIGINT AS seq,
       |  greatest(t.seq * $SeqLen - cum_prev, 0)::BIGINT AS tok_start,
       |  (least(n_tokens, (t.seq + 1) * $SeqLen - cum_prev)
       |    - greatest(t.seq * $SeqLen - cum_prev, 0))::BIGINT AS n_seq_tokens
       |FROM packed, LATERAL unnest(range(cum_prev // $SeqLen,
       |  ((cum_prev + n_tokens - 1) // $SeqLen) + 1)) t(seq)
       |ORDER BY doc_id, seq""".stripMargin

  val sqlPackSequences: String =
    s"""WITH toks AS (SELECT doc_id, source,
       |    (${Portable.sqlHash32("doc_id::VARCHAR")} % $PackShards)::INT AS shard,
       |    len(${Portable.sqlTokens("text")})::BIGINT AS n_tokens
       |  FROM documents),
       |packed AS (SELECT doc_id, source, shard, n_tokens,
       |    (sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |       ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS cum_prev
       |  FROM toks)
       |SELECT doc_id, source, shard, n_tokens,
       |  (cum_prev // $SeqLen)::BIGINT AS seq_first,
       |  ((cum_prev + greatest(n_tokens, 1) - 1) // $SeqLen)::BIGINT AS seq_last,
       |  (((cum_prev + greatest(n_tokens, 1) - 1) // $SeqLen)
       |    - (cum_prev // $SeqLen))::INT AS n_cuts
       |FROM packed ORDER BY doc_id""".stripMargin

  // ------------------------------------------- token-budget selection

  /** Fraction of each shard's tokens the budget keeps. */
  val BudgetFrac = 0.5

  /** Token-budget subset selection: keep the highest-quality documents
    * until [[BudgetFrac]] of the token budget is spent — the "we can only
    * train on X% of this corpus, take the best" curation step. Quality is
    * the same blended score as the t2 quality query (length + stopword
    * ratio), so selection order is reproducible across engines.
    *
    * Scale shape: the budget is apportioned per (source, shard) — the same
    * deterministic [[graft.functions.Portable.hash32]] sharding as
    * [[packSequences]] — so the greedy running sum is a
    * (source, shard)-partitioned window, never a global (single-reducer)
    * sort. Shard totals are a tiny per-shard aggregate joined back
    * (AQE-broadcast); the corpus is scanned once.
    */
  def budgetSelect(docs: DataFrame): DataFrame = {
    val toks = Portable.tokens(col("text"))
    val n = size(toks).cast("double")
    val stops = TextOps.tokenHits(col("text"), TextOps.Stopwords).cast("double")
    val base = docs.select(
      col("doc_id"), col("source"),
      (Portable.hash32(col("doc_id").cast("string")) % PackShards).cast("int").as("shard"),
      size(toks).cast("bigint").as("n_tokens"),
      // zero-token docs: 0/0 is NULL in Spark but NaN in DuckDB (which
      // would sort FIRST under DESC and always be kept there) — pin the
      // edge to score 0.0 in both engines, same as the epochs guard
      when(n === 0, lit(0.0))
        .otherwise(round(least(n / lit(200.0), lit(1.0)) * 0.5 + (stops / n) * 0.5, 4))
        .as("quality_score"))
    val totals = base.groupBy(col("source"), col("shard"))
      .agg(sum(col("n_tokens")).as("shard_tokens"))
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    base.join(totals, Seq("source", "shard"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // greedy take-while-budget-remains: a doc is kept iff the budget was
      // not exhausted BEFORE it (standard knapsack-greedy overshoot-by-one
      // — guarantees progress even when one doc exceeds the whole budget)
      .filter(col("cum_tokens") - col("n_tokens") < col("shard_tokens") * BudgetFrac)
      .select(col("doc_id"), col("source"), col("shard"),
        col("n_tokens"), col("quality_score"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  val sqlBudgetSelect: String = {
    val toks = Portable.sqlTokens("text")
    val stops = TextOps.sqlTokenHits("text", TextOps.Stopwords)
    s"""WITH base AS (SELECT doc_id, source,
       |    (${Portable.sqlHash32("doc_id::VARCHAR")} % $PackShards)::INT AS shard,
       |    len($toks)::BIGINT AS n_tokens,
       |    CASE WHEN len($toks) = 0 THEN 0.0
       |      ELSE round(least(len($toks) / 200.0, 1.0) * 0.5
       |        + ($stops::DOUBLE / len($toks)) * 0.5, 4) END AS quality_score
       |  FROM documents),
       |totals AS (SELECT source, shard, sum(n_tokens)::BIGINT AS shard_tokens
       |  FROM base GROUP BY source, shard),
       |ranked AS (SELECT b.*, t.shard_tokens,
       |    sum(b.n_tokens) OVER (PARTITION BY b.source, b.shard
       |      ORDER BY b.quality_score DESC, b.doc_id
       |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
       |  FROM base b JOIN totals t USING (source, shard))
       |SELECT doc_id, source, shard, n_tokens, quality_score, cum_tokens
       |FROM ranked WHERE cum_tokens - n_tokens < shard_tokens * $BudgetFrac
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- adaptive quality gate

  /** Per-source ADAPTIVE quality gate (p15): keep documents scoring at or
    * above their OWN source's median quality — a fixed global threshold
    * over-prunes clean sources and under-prunes noisy ones; the
    * per-source median adapts automatically (the CCNet bucketing idea
    * collapsed to a keep/drop gate). Quality is the same blended t2 score,
    * so the gate composes with [[budgetSelect]]'s ordering.
    *
    * Scale shape: one partial-aggregated score pass; the per-source
    * thresholds are a ONE-ROW-PER-SOURCE aggregate joined back
    * (AQE-broadcast). Exact `percentile` here is the oracle-checkable twin
    * (DuckDB quantile_cont, same interpolation — the q13 precedent); at
    * 100 TB the gate swaps in `percentile_approx` with a tolerance check,
    * exactly the q13 → q19 sketch relationship.
    */
  /** The blended t2 quality score per (doc_id, source) — shared by the
    * exact gate (p15) and its approx scale twin (p16).
    */
  private def qualityScored(docs: DataFrame): DataFrame = {
    val toks = Portable.tokens(col("text"))
    val n = size(toks).cast("double")
    val stops = TextOps.tokenHits(col("text"), TextOps.Stopwords).cast("double")
    docs.select(col("doc_id"), col("source"),
      when(n === 0, lit(0.0))
        .otherwise(round(least(n / lit(200.0), lit(1.0)) * 0.5 + (stops / n) * 0.5, 4))
        .as("quality_score"))
  }

  def qualityGate(docs: DataFrame): DataFrame = {
    val scored = qualityScored(docs)
    val thr = scored.groupBy(col("source"))
      .agg(percentile(col("quality_score"), lit(0.5)).as("thr"))
    scored.join(thr, "source")
      .filter(col("quality_score") >= col("thr"))
      .select(col("doc_id"), col("source"), col("quality_score"),
        round(col("thr"), 6).as("source_median"))
      .orderBy(col("doc_id"))
  }

  /** The 100 TB form of the gate (p16): per-source threshold from
    * `percentile_approx` (KLL/GK-style sketch — bounded memory, one pass,
    * mergeable partials; no exact per-source sort). Sketch internals
    * differ across engines, so like q19 the oracle checks a TOLERANCE
    * VERDICT, not sketch output: Spark computes BOTH thresholds and emits
    * per source (a) the approx threshold within 0.02 absolute of the exact
    * median (scores live in [0,1] — absolute, not relative, so a clean
    * source's near-zero median can't blow up the ratio) and (b) the kept
    * count under the approx gate within 5% of the exact gate's. DuckDB
    * emits the expected all-true row; a sketch drifting past tolerance
    * flips the boolean and fails the hash gate.
    */
  def qualityGateApprox(docs: DataFrame): DataFrame = {
    val scored = qualityScored(docs)
    val thr = scored.groupBy(col("source"))
      .agg(percentile_approx(col("quality_score"), lit(0.5), lit(10000)).as("athr"),
        percentile(col("quality_score"), lit(0.5)).as("ethr"))
    scored.join(thr, "source")
      .groupBy(col("source"))
      .agg(
        first(col("athr")).as("athr"),
        first(col("ethr")).as("ethr"),
        sum(when(col("quality_score") >= col("athr"), 1L).otherwise(0L)).as("ka"),
        sum(when(col("quality_score") >= col("ethr"), 1L).otherwise(0L)).as("ke"))
      .select(col("source"),
        (abs(col("athr") - col("ethr")) <= 0.02).as("thr_ok"),
        (abs(col("ka") - col("ke")).cast("double") / col("ke") <= 0.05).as("keep_ok"))
      .orderBy(col("source"))
  }

  val sqlQualityGateApprox: String =
    """SELECT source, true AS thr_ok, true AS keep_ok
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val sqlQualityGate: String = {
    val toks = Portable.sqlTokens("text")
    val stops = TextOps.sqlTokenHits("text", TextOps.Stopwords)
    s"""WITH scored AS (SELECT doc_id, source,
       |    CASE WHEN len($toks) = 0 THEN 0.0
       |      ELSE round(least(len($toks) / 200.0, 1.0) * 0.5
       |        + ($stops::DOUBLE / len($toks)) * 0.5, 4) END AS quality_score
       |  FROM documents),
       |thr AS (SELECT source, quantile_cont(quality_score, 0.5) AS thr
       |  FROM scored GROUP BY source)
       |SELECT s.doc_id, s.source, s.quality_score, round(t.thr, 6) AS source_median
       |FROM scored s JOIN thr t USING (source)
       |WHERE s.quality_score >= t.thr
       |ORDER BY s.doc_id""".stripMargin
  }

  // --------------------------- importance resampling weights (DSIR)

  /** Hashed-feature space size for DSIR. Small enough that the two bucket
    * count tables are broadcast single-digit-KB dimension tables at any
    * corpus size; large enough that collisions don't flatten the signal on
    * the fixture vocabulary.
    */
  val DsirBuckets = 256

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    * every document by how much more likely its hashed-unigram bag is
    * under a TARGET distribution than under the RAW corpus distribution —
    * the published recipe for selecting in-domain pretraining data
    * without a trained classifier. Target here: the `lang = 'en'` slice
    * (any deterministic predicate works — a quality gate, a trusted
    * source list). Both distributions are add-one-smoothed bucket models,
    * the per-doc weight is the tf-weighted log-likelihood ratio in bits
    * per token, and `selected` is the principled zero threshold (the doc
    * looks more target than raw). The paper resamples ∝ weight; the
    * deterministic gate is the oracle-checkable core, and [[shuffleOrder]]
    * (p14) supplies the downstream sampling order.
    *
    * Scale shape (same skeleton as t13 surprisal): tokens hash straight
    * to 256 buckets so every shuffle key is bounded-cardinality; per-doc
    * bucket TFs are map-side combined BEFORE the exchange; the two model
    * tables (256 rows) and the two totals are broadcast. One corpus scan
    * builds everything; nothing corpus-sized is broadcast or collected.
    */
  def dsirWeights(docs: DataFrame): DataFrame = {
    val b = Portable.hash32(col("t")) % DsirBuckets
    val toks = docs
      .select(col("doc_id"), col("lang"), explode(Portable.tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("lang"), b.as("b"))
    val tf = toks.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("tf"))
    // BOTH models in one conditional-agg pass, materialized (256 rows) so
    // the scoring join and the totals read it without re-scanning the
    // corpus — separate raw/target/totals aggregations cost 4 corpus
    // scans; this shape costs exactly 2 (tf + models)
    val models = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      .localCheckpoint(true)
    val totals = models.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val scored = tf
      .join(broadcast(models), "b")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"),
        (col("tf") * (log2((col("ct") + 1.0) / (col("nt") + DsirBuckets))
          - log2((col("cr") + 1.0) / (col("nr") + DsirBuckets)))).as("wbits"))
    val per = scored.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("wbits")) / sum(col("tf")), 4).as("llr_bits_per_token"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        // + 0.0 normalizes IEEE -0.0: a doc whose ratio rounds to zero
        // must hash as 0.0 in both engines (the p23 drift convention;
        // surfaced by the sf0.1 sweep, invisible at sf0.01)
        (coalesce(col("llr_bits_per_token"), lit(0.0)) + lit(0.0)).as("llr_bits_per_token"),
        (coalesce(col("llr_bits_per_token"), lit(0.0)) > 0.0).as("selected"))
      .orderBy(col("doc_id"))
  }

  val sqlDsirWeights: String = {
    val toks = Portable.sqlTokens("text")
    val h = Portable.sqlHash32("t")
    s"""WITH tk AS (SELECT doc_id, lang, ($h % $DsirBuckets) AS b
       |  FROM (SELECT doc_id, lang, unnest($toks) AS t FROM documents)),
       |tf AS (SELECT doc_id, b, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
       |raw AS (SELECT b, count(*)::BIGINT AS cr FROM tk GROUP BY b),
       |tgt AS (SELECT b, count(*)::BIGINT AS ct FROM tk WHERE lang = 'en' GROUP BY b),
       |tot AS (SELECT coalesce((SELECT sum(cr) FROM raw), 0)::BIGINT AS nr,
       |               coalesce((SELECT sum(ct) FROM tgt), 0)::BIGINT AS nt),
       |scored AS (SELECT tf.doc_id, tf.tf,
       |    tf.tf * (log2((coalesce(tgt.ct, 0) + 1.0) / (tot.nt + $DsirBuckets))
       |           - log2((raw.cr + 1.0) / (tot.nr + $DsirBuckets))) AS wbits
       |  FROM tf JOIN raw USING (b) LEFT JOIN tgt USING (b), tot),
       |per AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
       |    round(sum(wbits) / sum(tf), 4) AS llr_bits_per_token
       |  FROM scored GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
       |  coalesce(per.llr_bits_per_token, 0.0) + 0.0 AS llr_bits_per_token,
       |  (coalesce(per.llr_bits_per_token, 0.0) > 0.0) AS selected
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // --------------------------------------- curated-manifest selection

  /** Quality floor / boilerplate ceiling for the p20 composite gate. */
  val ManifestQualityMin = 0.15
  val ManifestBoilerMax = 0.2

  /** The CURATED MANIFEST (p20) — the full web-corpus selection recipe as
    * ONE query, composing four of this engine's own signals the way
    * CCNet/RefinedWeb actually chain them:
    *  - quality floor (t2 blended score ≥ [[ManifestQualityMin]]);
    *  - the MIDDLE surprisal band (t13 bits/token within the corpus's own
    *    P25–P75 — CCNet keeps middle perplexity: the low tail is
    *    boilerplate the model already knows, the high tail is noise);
    *  - boilerplate ceiling (t18 repeated-shingle fraction ≤
    *    [[ManifestBoilerMax]]);
    *  - exact-dup canonical (min doc_id per normalized-text hash).
    * Emits every document with its scores, per-gate verdicts and the
    * final `keep` — the audit table a curation run ships with the corpus,
    * and the proof the operators compose in one Catalyst plan.
    *
    * Scale shape: each signal keeps its own documented shape; the band is
    * a broadcast single-row aggregate; the composition joins on doc_id.
    * The exact percentile is the oracle-checkable twin — at 100 TB swap
    * `percentile_approx` exactly as p15→p16 demonstrates.
    */
  def curatedManifest(docs: DataFrame): DataFrame =
    curatedManifest(docs, materializeShared = false)

  /** [[curatedManifest]] with an opt-in materialization of the shared
    * surprisal column. sp feeds the band percentiles AND the gate join;
    * whether to checkpoint it DEPENDS ON THE CONSUMER (round-17
    * measurement): a count()-shaped reader (p20's bench action) lets the
    * optimizer prune the surprisal arithmetic out of the lazy plan
    * entirely, so an eager checkpoint is pure loss there (0.33 s →
    * 1.1 s); a gate-AGGREGATING reader (p36's diff, p32's funnel) needs
    * every gate column, pays sp twice per manifest lazily, and wins from
    * the one-pass checkpoint. Default lazy; aggregate consumers pass
    * `materializeShared = true`.
    */
  private[operators] def curatedManifest(docs: DataFrame,
                                         materializeShared: Boolean): DataFrame = {
    val q = TextOps.quality(docs, col("text")).select(col("doc_id"), col("quality_score"))
    val sp0 = TextOps.unigramSurprisal(docs).select(col("doc_id"), col("bits_per_token"))
    val sp = if (materializeShared) sp0.localCheckpoint(true) else sp0
    val bp = graft.operators.Dedup.boilerplateFraction(docs)
      .select(col("doc_id"), col("boilerplate_frac"))
    val band = sp.agg(percentile(col("bits_per_token"), lit(0.25)).as("lo"),
      percentile(col("bits_per_token"), lit(0.75)).as("hi"))
    val canon = docs.select(col("doc_id"),
      (col("doc_id") === min(col("doc_id"))
        .over(Window.partitionBy(md5(lower(trim(col("text"))))))).as("canonical"))
    val qualityOk = col("quality_score") >= ManifestQualityMin
    val pplOk = col("bits_per_token") >= col("lo") && col("bits_per_token") <= col("hi")
    val boilerOk = col("boilerplate_frac") <= ManifestBoilerMax
    docs.select(col("doc_id"))
      .join(q, "doc_id").join(sp, "doc_id").join(bp, "doc_id").join(canon, "doc_id")
      .crossJoin(broadcast(band))
      .select(col("doc_id"), col("quality_score"), col("bits_per_token"),
        col("boilerplate_frac"), col("canonical"),
        qualityOk.as("quality_ok"), pplOk.as("ppl_ok"), boilerOk.as("boiler_ok"),
        (qualityOk && pplOk && boilerOk && col("canonical")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the same composition with each signal's full oracle query
    * nested as a CTE subquery (DuckDB allows WITH inside subqueries), so
    * the composite can never drift from the component oracles.
    */
  def sqlCuratedManifest: String = {
    // the shared terminal-ORDER-BY guard (Portable.sqlNoOrder): fail
    // loudly at oracle-construction time, never truncate mid-query
    def noOrder(sql: String): String = Portable.sqlNoOrder(sql)
    s"""WITH q AS (SELECT doc_id, quality_score FROM (${noOrder(TextOps.sqlQuality)}) t),
       |sp AS (SELECT doc_id, bits_per_token FROM (${noOrder(TextOps.sqlUnigramSurprisal)}) t),
       |bp AS (SELECT doc_id, boilerplate_frac FROM (${noOrder(graft.operators.Dedup.sqlBoilerplateFraction)}) t),
       |canon AS (SELECT doc_id,
       |    doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canonical
       |  FROM documents),
       |band AS (SELECT quantile_cont(bits_per_token, 0.25) AS lo,
       |                quantile_cont(bits_per_token, 0.75) AS hi FROM sp)
       |SELECT d.doc_id, q.quality_score, sp.bits_per_token, bp.boilerplate_frac,
       |  canon.canonical,
       |  q.quality_score >= $ManifestQualityMin AS quality_ok,
       |  (sp.bits_per_token >= band.lo AND sp.bits_per_token <= band.hi) AS ppl_ok,
       |  bp.boilerplate_frac <= $ManifestBoilerMax AS boiler_ok,
       |  (q.quality_score >= $ManifestQualityMin
       |    AND sp.bits_per_token >= band.lo AND sp.bits_per_token <= band.hi
       |    AND bp.boilerplate_frac <= $ManifestBoilerMax
       |    AND canon.canonical) AS keep
       |FROM documents d
       |JOIN q USING (doc_id) JOIN sp USING (doc_id)
       |JOIN bp USING (doc_id) JOIN canon USING (doc_id), band
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The manifest's gate columns, alphabetical (the diff's row order). */
  private val ManifestGates = Seq("boiler_ok", "canonical", "keep", "ppl_ok", "quality_ok")

  /** Manifest diff (p36) — the release-over-release regression dashboard:
    * per-gate pass counts of yesterday's corpus slice vs today's full
    * corpus, with the delta. The corpus-global gates (surprisal band,
    * boilerplate dfs, canonical sets) are DELIBERATELY re-derived per
    * corpus — that is what makes the diff meaningful: a delta out of
    * proportion to the ingest says a gate's distribution moved (p23's
    * drift signal, read at the keep-set level where it actually costs
    * documents).
    *
    * Scale shape: two manifest plans (each its documented composition)
    * reduced to ONE summary row each before the 5-row stack join —
    * nothing but the gate sums crosses between the two runs.
    */
  def manifestDiff(docsOld: DataFrame, docsNew: DataFrame): DataFrame = {
    def gateCounts(m: DataFrame) =
      m.agg(ManifestGates.map(g => sum(col(g).cast("long")).as(g)).head,
        ManifestGates.map(g => sum(col(g).cast("long")).as(g)).tail: _*)
    def stacked(m: DataFrame, as: String) =
      gateCounts(m).selectExpr(
        s"stack(${ManifestGates.size}, " +
          ManifestGates.map(g => s"'$g', $g").mkString(", ") + s") AS (gate, $as)")
    // the diff AGGREGATES every gate column, so each manifest wins from
    // the materialized shared surprisal; the two slices are independent,
    // so their checkpoint jobs overlap (Par.run)
    val Seq(so, sn) = graft.functions.Par.run(
      () => stacked(curatedManifest(docsOld, materializeShared = true), "n_old"),
      () => stacked(curatedManifest(docsNew, materializeShared = true), "n_new"))
    so.join(sn, "gate")
      .select(col("gate"), col("n_old"), col("n_new"),
        (col("n_new") - col("n_old")).as("delta"))
      .orderBy(col("gate"))
  }

  /** Oracle: the manifest oracle nested twice — the old slice's copy
    * shadows `documents` with a filtered CTE (schema-qualified
    * `main.documents` breaks the circular reference), so the component
    * oracles run unmodified against the slice.
    */
  def sqlManifestDiff: String = {
    val body = Portable.sqlNoOrder(sqlCuratedManifest)
    // loud-failure convention: if the manifest oracle ever stops starting
    // with exactly "WITH ", a silent no-op replace would leave BOTH
    // slices reading the full corpus and every delta at 0
    require(body.startsWith("WITH "),
      s"manifest oracle must start with a WITH clause for the shadow CTE:\n$body")
    val oldBody = body.replaceFirst("^WITH ",
      "WITH documents AS (SELECT * FROM main.documents " +
        "WHERE doc_id < (SELECT (count(*) * 4) // 5 FROM main.documents)),\n")
    def sums = ManifestGates.map(g => s"sum($g::INT)::BIGINT AS $g").mkString(", ")
    val rows = ManifestGates.map(g =>
      s"SELECT '$g' AS gate, oc.$g AS n_old, nc.$g AS n_new, nc.$g - oc.$g AS delta FROM oc, nc")
      .mkString("\nUNION ALL\n")
    s"""WITH om AS (SELECT * FROM ($oldBody) t),
       |oc AS (SELECT $sums FROM om),
       |nm AS (SELECT * FROM ($body) t),
       |nc AS (SELECT $sums FROM nm)
       |$rows
       |ORDER BY gate""".stripMargin
  }

  // ----------------------------------------------- curation funnel (p32)

  /** The curation FUNNEL (p32) — the yield dashboard every corpus run is
    * judged by: how many documents survive each successive gate. Stages
    * are the CONJUNCTION of the standalone gates, each computed on the
    * full corpus exactly as its own query computes it (the corpus-global
    * percentiles, document frequencies and canonical choices are
    * unchanged — this is an intersection of the published verdicts, not a
    * re-derivation on shrinking corpora):
    *   0 raw -> 1 gopher pass (p27) -> 2 manifest keep (p20) ->
    *   3 near-dup canonical (d9, from the saved labels) ->
    *   4 decontaminated (p21 verdict false; benchmark docs themselves
    *     exit here — they are not in the contamination report and must
    *     not reach training data).
    *
    * Scale shape: four per-doc flag projections joined on doc_id
    * (co-partitioned shuffles, AQE-sized), one partial-aggregated pass to
    * a single row of conditional counts, exploded to the 5-row funnel.
    */
  def curationFunnel(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val g = TextOps.gopherRules(docs).select(col("doc_id"), col("pass").as("g_ok"))
    // lazy manifest: the funnel reads only `keep`, and its one aggregate
    // overlaps the manifest's duplicated surprisal subtree inside one job
    // (measured: the materialized form was no faster here — p36's
    // TWO-manifest diff is where the checkpoint pays)
    val m = curatedManifest(docs).select(col("doc_id"), col("keep").as("m_ok"))
    val k = graft.operators.Dedup.dedupedCorpusFrom(docs, clusters)
      .select(col("doc_id"), lit(true).as("k_ok"))
    val c = contaminationReport(docs)
      .select(col("doc_id"), (!col("contaminated")).as("c_ok"))
    val f = docs.select(col("doc_id"))
      .join(g, "doc_id").join(m, "doc_id")
      .join(k, Seq("doc_id"), "left")
      .join(c, Seq("doc_id"), "left")
      .select(col("g_ok"), col("m_ok"),
        coalesce(col("k_ok"), lit(false)).as("k_ok"),
        coalesce(col("c_ok"), lit(false)).as("c_ok"))
    val a = f.agg(
      count(lit(1)).as("n0"),
      sum(when(col("g_ok"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("g_ok") && col("m_ok"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("g_ok") && col("m_ok") && col("k_ok"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("g_ok") && col("m_ok") && col("k_ok") && col("c_ok"), 1L)
        .otherwise(0L)).as("n4"))
    a.select(explode(array(
        struct(lit(0L).as("stage"), lit("raw").as("gate"), col("n0").as("n_docs")),
        struct(lit(1L).as("stage"), lit("gopher").as("gate"), col("n1").as("n_docs")),
        struct(lit(2L).as("stage"), lit("manifest").as("gate"), col("n2").as("n_docs")),
        struct(lit(3L).as("stage"), lit("neardup_canonical").as("gate"),
          col("n3").as("n_docs")),
        struct(lit(4L).as("stage"), lit("decontaminated").as("gate"),
          col("n4").as("n_docs")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.gate").as("gate"),
        col("s.n_docs").as("n_docs"))
      .orderBy(col("stage"))
  }

  /** Oracle: the same conjunction over the component oracles, each nested
    * verbatim as a CTE subquery (the [[sqlCuratedManifest]] composition
    * rule — the funnel can never drift from the gates it reports on).
    */
  def sqlCurationFunnel: String = {
    def noOrder(sql: String): String = Portable.sqlNoOrder(sql)
    s"""WITH g AS (SELECT doc_id, pass AS g_ok FROM (${noOrder(TextOps.sqlGopherRules)}) t),
       |m AS (SELECT doc_id, keep AS m_ok FROM (${noOrder(sqlCuratedManifest)}) t),
       |kl AS (SELECT doc_id FROM (${noOrder(graft.operators.Dedup.sqlDedupedCorpus)}) t),
       |c AS (SELECT doc_id, NOT contaminated AS c_ok FROM (${noOrder(sqlContaminationReport)}) t),
       |f AS (SELECT g.g_ok, m.m_ok,
       |    kl.doc_id IS NOT NULL AS k_ok,
       |    coalesce(c.c_ok, false) AS c_ok
       |  FROM documents d
       |  JOIN g USING (doc_id) JOIN m USING (doc_id)
       |  LEFT JOIN kl USING (doc_id) LEFT JOIN c USING (doc_id)),
       |a AS (SELECT count(*)::BIGINT AS n0,
       |  sum(CASE WHEN g_ok THEN 1 ELSE 0 END)::BIGINT AS n1,
       |  sum(CASE WHEN g_ok AND m_ok THEN 1 ELSE 0 END)::BIGINT AS n2,
       |  sum(CASE WHEN g_ok AND m_ok AND k_ok THEN 1 ELSE 0 END)::BIGINT AS n3,
       |  sum(CASE WHEN g_ok AND m_ok AND k_ok AND c_ok THEN 1 ELSE 0 END)::BIGINT AS n4
       |  FROM f)
       |SELECT * FROM (
       |  SELECT 0::BIGINT AS stage, 'raw' AS gate, n0 AS n_docs FROM a
       |  UNION ALL SELECT 1, 'gopher', n1 FROM a
       |  UNION ALL SELECT 2, 'manifest', n2 FROM a
       |  UNION ALL SELECT 3, 'neardup_canonical', n3 FROM a
       |  UNION ALL SELECT 4, 'decontaminated', n4 FROM a)
       |ORDER BY stage""".stripMargin
  }

  // --------------------------------- apportioned eval carve-out (p52)

  /** Eval-set size apportioned by [[evalQuotas]]. */
  val EvalSetK = 100

  /** LARGEST-REMAINDER APPORTIONMENT (p52, Hamilton's method): how many
    * of a fixed [[EvalSetK]]-document eval set each source contributes —
    * exactly proportional in integers. Bernoulli splits (p2) have
    * per-source size variance and floor-only quotas under-fill; this is
    * the deterministic fix: base = ⌊n·K/N⌋ per source, then the K − Σbase
    * leftover seats go to the largest remainders (ties by source name),
    * each quota capped at the source's document count so the plan is
    * always satisfiable. When N ≥ K the cap never binds (base ≤ n·K/N ≤ n
    * with equality only at K = N where no seats remain), so Σ quota = K
    * exactly; when N < K every source saturates its cap and Σ quota = N —
    * the whole corpus is the eval set.
    *
    * Scale shape: one partial-aggregated pass to per-source counts; the
    * ranking window runs over the source domain (dozens of rows).
    */
  def evalQuotas(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = per.agg(sum(col("n_docs")).as("n"))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"n_docs * $EvalSetK div n"))
      .withColumn("rem", expr(s"n_docs * $EvalSetK % n"))
    val left = based.agg((lit(EvalSetK) - sum(col("base"))).as("leftover"))
    val w = Window.orderBy(col("rem").desc, col("source"))
    based.crossJoin(broadcast(left))
      .withColumn("rr", row_number().over(w))
      .select(col("source"), col("n_docs"),
        least(col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L),
          col("n_docs")).as("quota"))
      .orderBy(col("source"))
  }

  /** Oracle for [[evalQuotas]]: same integer base/remainder arithmetic
    * and (remainder, source) seat ranking.
    */
  val sqlEvalQuotas: String =
    s"""WITH per AS (SELECT source, count(*)::BIGINT AS n_docs
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_docs)::BIGINT AS n FROM per),
       |based AS (SELECT source, n_docs,
       |    (n_docs * $EvalSetK) // n AS base,
       |    (n_docs * $EvalSetK) % n AS rem
       |  FROM per, tot),
       |lft AS (SELECT ($EvalSetK - sum(base))::BIGINT AS leftover FROM based)
       |SELECT source, n_docs,
       |  least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
       |    <= lft.leftover THEN 1 ELSE 0 END, n_docs)::BIGINT AS quota
       |FROM based, lft ORDER BY source""".stripMargin

  // ------------------------------------------ soft-dedup weights (p48)

  /** Soft deduplication (p48): instead of DROPPING near-duplicates, give
    * every document a sampling weight of 1/cluster-size (the
    * SlimPajama/D4-style downweighting — a cluster of n near-identical
    * documents contributes one document's worth of expected tokens, but
    * keeps its internal variety). Consumes the SAVED cluster labels (the
    * d8/d11 artifact) — the chain's most expensive product runs once;
    * this is one join over it. Output per document: the cluster size,
    * the weight in ppm, the token count and the expected token
    * contribution under weighted sampling — the exact input p34's PPS
    * sampler takes as its size column for a dedup-aware draw.
    *
    * Determinism: weights are floored fixed-point ppm BIGINTs (the q31
    * floor rule), so every emitted value is integer-exact across engines.
    *
    * Scale shape: one bounded aggregate over the label artifact (cluster
    * sizes), two co-partitioned equi-joins on doc_id/cluster, no
    * broadcast of anything corpus-sized; per-doc weight math is
    * shuffle-free projection.
    */
  def softDedupWeights(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val cs = clusters.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
    docs.select(col("doc_id"),
        size(Portable.tokens(col("text"))).cast("bigint").as("n_tok"))
      .join(clusters, Seq("doc_id"), "left")
      .join(cs, Seq("cluster"), "left")
      .select(col("doc_id"),
        coalesce(col("csize"), lit(1L)).as("csize"),
        col("n_tok"))
      .select(col("doc_id"), col("csize"),
        floor(lit(1000000.0) / col("csize")).cast("long").as("w_ppm"),
        col("n_tok"),
        floor(col("n_tok") * lit(1000000.0) / col("csize")).cast("long")
          .as("exp_tok_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[softDedupWeights]]: re-derives the cluster labels with
    * the d8 recursive closure, then replays the floored ppm arithmetic.
    */
  def sqlSoftDedupWeights: String =
    s"""WITH RECURSIVE p AS (${graft.operators.Dedup.sqlLshPairs}),
       |e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT a, b FROM e
       |      UNION
       |      SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |self AS (SELECT DISTINCT a, a AS b FROM e),
       |clus AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster
       |  FROM (SELECT a, b FROM r UNION ALL SELECT a, b FROM self)
       |  GROUP BY a),
       |cs AS MATERIALIZED (SELECT cluster, count(*)::BIGINT AS csize FROM clus GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(cs.csize, 1)::BIGINT AS csize,
       |  floor(1000000.0 / coalesce(cs.csize, 1))::BIGINT AS w_ppm,
       |  len(${Portable.sqlTokens("d.text")})::BIGINT AS n_tok,
       |  floor(len(${Portable.sqlTokens("d.text")})
       |    * 1000000.0 / coalesce(cs.csize, 1))::BIGINT AS exp_tok_ppm
       |FROM documents d
       |LEFT JOIN clus ON clus.doc_id = d.doc_id
       |LEFT JOIN cs ON cs.cluster = clus.cluster
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------- composed daily ingest (p41)

  /** The composed daily-ingest report (p41) — ONE query proving the
    * artifact economy holds together: yesterday's saved artifacts (LSH
    * index + cluster labels, distinct-gram index, k-means cells, LM) plus
    * today's shard produce, in a single pass, the updated dedup labels,
    * the shard's span coverage, the semantic verdicts (which double as
    * the shard's entry into the saved ANN coarse geometry), the merged
    * LM's totals, and the release diff — each stage summarized as one
    * (stage, item, n) row. Every number derives from an operator whose
    * own oracle is green (d13/d14/d16/p24/t24/p36); the composite oracle
    * nests those oracles verbatim (the p32 composition rule), so the
    * report can never drift from the steps it reports on.
    *
    * Scale shape: pure composition — every stage keeps its own
    * shard-cost plan (index-join pairs, star-edge contraction, saved-gram
    * semi-join, cell-confined cosine, vocabulary-sized count merge,
    * manifest aggregate); the report itself adds only single-row
    * aggregates and a ~k+12-row union. Nothing here re-reads the old
    * corpus except the declared p36 slice re-score and the semantic
    * prune's cell co-member blocks — both the components' own documented
    * economics.
    */
  def dailyIngest(docs: DataFrame, emb: DataFrame, dCut: Long, vCut: Long,
                  lshPairs: DataFrame, oldLabels: DataFrame,
                  substrIdx: DataFrame, cent: DataFrame, oldCells: DataFrame,
                  lmOld: TextOps.SurprisalModel, lmShard: TextOps.SurprisalModel,
                  tau: Double): DataFrame = {
    val shardDocs = docs.filter(col("doc_id") >= dCut)
    // FOUR independent construction-time jobs — the label star
    // contraction (an action loop), the sem verdict checkpoint (two
    // report aggregates read it), the merged-LM totals checkpoint (two
    // report rows), and the diff's two materialized manifests — used to
    // run back-to-back; Par.run overlaps them (guide §2.6), which is the
    // single biggest wall-clock lever on this composition
    val merged = TextOps.mergeSurprisalModels(lmOld, lmShard, docs)
    val Seq(labels, sem, mergedTotals, diff) = graft.functions.Par.run(
      () => Dedup.shardUpdateClustersFrom(lshPairs, oldLabels),
      () => Similarity.semDedupShard(emb, vCut, cent, oldCells, tau)
        .localCheckpoint(true),
      () => merged.totals.localCheckpoint(true),
      () => manifestDiff(docs.filter(col("doc_id") < dCut), docs))
    val spans = Dedup.shardSubstrSpans(shardDocs, substrIdx)
    def one(stage: Long, item: String, df: DataFrame): DataFrame =
      df.select(lit(stage).as("stage"), lit(item).as("item"),
        col("n").cast("long").as("n"))
    Seq(
      one(0L, "shard_docs", shardDocs.agg(count(lit(1)).as("n"))),
      one(1L, "lexical_pairs", lshPairs.agg(count(lit(1)).as("n"))),
      one(2L, "lexical_absorbed", labels
        .filter(col("doc_id") >= dCut && col("cluster") =!= col("doc_id"))
        .agg(count(lit(1)).as("n"))),
      one(3L, "substr_flagged",
        spans.filter(col("dup_tokens") > 0).agg(count(lit(1)).as("n"))),
      one(4L, "semantic_dropped",
        sem.filter(!col("kept")).agg(count(lit(1)).as("n"))),
      // per-cell shard occupancy: the shard ENTERING the saved coarse
      // geometry — the ANN-encode leg's assignment, cell by cell
      sem.groupBy(col("c")).agg(count(lit(1)).as("n"))
        .select(lit(5L).as("stage"),
          concat(lit("ann_cell_"), col("c").cast("string")).as("item"),
          col("n").cast("long").as("n")),
      // merged-LM totals: count additivity made visible as integers —
      // old + shard token counts MUST equal the full corpus's (one-row
      // checkpointed frame, read twice: tokens + vocab rows)
      mergedTotals.select(lit(6L).as("stage"), lit("lm_tokens").as("item"),
          col("n").cast("long").as("n"))
        .unionByName(mergedTotals.select(lit(6L).as("stage"),
          lit("lm_vocab").as("item"), col("v").cast("long").as("n"))),
      diff.select(lit(7L).as("stage"),
        concat(lit("diff_"), col("gate")).as("item"),
        col("delta").cast("long").as("n"))
    ).reduce(_.unionByName(_)).orderBy(col("stage"), col("item"))
  }

  /** Oracle for [[dailyIngest]]: the component oracles nested verbatim
    * (d13 pairs, d14 labels, d16 spans, p24 semantic verdicts, p36
    * diff), the merged-LM totals replayed as the full corpus's exact
    * token/vocab counts (t24's additivity claim in integer form), each
    * reduced to the same summary rows.
    */
  def sqlDailyIngest: String = {
    // component CTEs are MATERIALIZED (except sp, which DuckDB's binder
    // rejects materializing) so each nested oracle evaluates once; the
    // composite replay is still minutes-scale at sf0.1 in DuckDB — the
    // driver's sf0.01 gate is the enforced one, and each component's own
    // oracle is sf0.1-green individually
    def noOrder(sql: String): String = Portable.sqlNoOrder(sql)
    s"""WITH sp AS (SELECT * FROM (${noOrder(Dedup.sqlShardLshPairs)}) t),
       |lab AS MATERIALIZED (SELECT * FROM (${noOrder(Dedup.sqlShardUpdateClusters)}) t),
       |ss AS MATERIALIZED (SELECT * FROM (${noOrder(Dedup.sqlShardSubstrSpans)}) t),
       |sem AS MATERIALIZED (SELECT * FROM (${noOrder(Similarity.sqlSemDedupShard(4, 2, 0.4))}) t),
       |md AS MATERIALIZED (SELECT * FROM (${noOrder(sqlManifestDiff)}) t),
       |dcut AS (SELECT (count(*) * 4) // 5 AS c FROM documents),
       |lmtk AS (SELECT unnest(${Portable.sqlTokens("text")}) AS t FROM documents),
       |lmtot AS (SELECT count(*)::BIGINT AS n, count(DISTINCT t)::BIGINT AS v
       |  FROM lmtk)
       |SELECT * FROM (
       |  SELECT 0::BIGINT AS stage, 'shard_docs' AS item,
       |    (SELECT count(*) FROM documents
       |     WHERE doc_id >= (SELECT c FROM dcut))::BIGINT AS n
       |  UNION ALL SELECT 1, 'lexical_pairs', (SELECT count(*) FROM sp)
       |  UNION ALL SELECT 2, 'lexical_absorbed',
       |    (SELECT count(*) FROM lab
       |     WHERE doc_id >= (SELECT c FROM dcut) AND cluster <> doc_id)
       |  UNION ALL SELECT 3, 'substr_flagged',
       |    (SELECT count(*) FROM ss WHERE dup_tokens > 0)
       |  UNION ALL SELECT 4, 'semantic_dropped',
       |    (SELECT count(*) FROM sem WHERE NOT kept)
       |  UNION ALL SELECT 5, 'ann_cell_' || c::VARCHAR, count(*)::BIGINT
       |    FROM sem GROUP BY c
       |  UNION ALL SELECT 6, 'lm_tokens', (SELECT n FROM lmtot)
       |  UNION ALL SELECT 6, 'lm_vocab', (SELECT v FROM lmtot)
       |  UNION ALL SELECT 7, 'diff_' || gate, delta FROM md)
       |ORDER BY stage, item""".stripMargin
  }

  // ------------------------------------- full multimodal ingest (p56)

  /** The daily-ingest report EXTENDED to the perceptual modalities
    * (p56) — the last compositional gap of the artifact economy: p41
    * proves the text/embedding legs cohere in one plan, but a
    * multimodal crawl's day also band-probes the SAVED image/audio
    * fingerprint tables and the per-frame video index (mm11/mm12/mm13).
    * This appends one (stage, item, n) row per media leg — the shard's
    * near-dup pair count against saved ∪ shard fingerprints — to the
    * p41 report, so ONE query covers a multimodal shard's full ingest:
    * lexical pairs and labels, span coverage, semantic verdicts, merged
    * LM, release diff, AND the three perceptual dedup legs. The oracle
    * ([[sqlDailyIngestFull]]) nests the mm11–mm13 oracles verbatim
    * (the p32/p41 composition rule), so the composite can never drift
    * from the standalone legs.
    *
    * Scale shape: pure composition again — each media leg keeps its own
    * shard-probe plan (shard-side decode only, band-bucketed candidate
    * join, 8–12 B fingerprints; the saved corpus is never re-decoded),
    * and the report adds only three single-row aggregates to p41's
    * union.
    */
  def dailyIngestFull(base: DataFrame, imgPairs: DataFrame,
                      audPairs: DataFrame, vidPairs: DataFrame): DataFrame = {
    def one(stage: Long, item: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n"))
        .select(lit(stage).as("stage"), lit(item).as("item"), col("n"))
    base
      .unionByName(one(8L, "image_pairs", imgPairs))
      .unionByName(one(9L, "audio_pairs", audPairs))
      .unionByName(one(10L, "video_pairs", vidPairs))
      .orderBy(col("stage"), col("item"))
  }

  /** Oracle for [[dailyIngestFull]]: [[sqlDailyIngest]] nested verbatim
    * plus one counted leg per mm11/mm12/mm13 oracle, each nested
    * verbatim inside its own subquery (CTE names stay scoped, so the
    * three hash-replay chains cannot collide with the base report's).
    */
  def sqlDailyIngestFull: String = {
    def cnt(sql: String): String =
      s"(SELECT count(*)::BIGINT FROM (${Portable.sqlNoOrder(sql)}) t)"
    s"""SELECT * FROM (
       |SELECT * FROM (${Portable.sqlNoOrder(sqlDailyIngest)}) base
       |UNION ALL SELECT 8::BIGINT AS stage, 'image_pairs' AS item,
       |  ${cnt(Multimodal.sqlImageShardPairs)} AS n
       |UNION ALL SELECT 9, 'audio_pairs', ${cnt(Multimodal.sqlAudioShardPairs)}
       |UNION ALL SELECT 10, 'video_pairs', ${cnt(Multimodal.sqlVideoShardPairs)})
       |ORDER BY stage, item""".stripMargin
  }

  // ------------------------------------------- segment-level dedup

  /** Non-overlapping segment width (tokens) for sub-document dedup. */
  val SegSize = 8

  /** Sub-document exact dedup (the line/paragraph-dedup pass of web-corpus
    * pipelines, e.g. RefinedWeb-style repeated-boilerplate removal): split
    * each doc into non-overlapping [[SegSize]]-token segments, keep only the
    * FIRST corpus occurrence of each distinct segment text (min by
    * (doc_id, s) — deterministic), drop every later repeat, and fingerprint
    * the reassembled doc.
    *
    * Scale shape: first-occurrence is a hash groupBy of min(struct(doc_id,
    * s)) — partial-aggregated map-side, so a boilerplate segment appearing
    * in millions of docs collapses per-partition BEFORE the shuffle (a
    * row_number window over the segment key would send every instance of
    * the heavy hitter to one reducer instead). The winner set then joins
    * back on the segment key (AQE skew-join splits hot keys), and doc
    * reassembly is the second shuffle, on doc_id. Nothing is broadcast and
    * no step is quadratic.
    */
  def segmentDedup(docs: DataFrame): DataFrame = {
    val segs = docs.select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(size(col("w")), lit(1)), lit(SegSize))).as("s"),
        col("w"))
      .select(col("doc_id"), col("s"),
        array_join(slice(col("w"), col("s"), lit(SegSize)), " ").as("seg"))
    val first = segs.groupBy(col("seg").as("fseg"))
      .agg(min(struct(col("doc_id"), col("s"))).as("f"))
      .select(col("fseg"), col("f.doc_id").as("fdoc"), col("f.s").as("fs"))
    segs.join(first, segs("seg") === first("fseg"))
      .withColumn("kept", col("doc_id") === col("fdoc") && col("s") === col("fs"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("bigint").as("n_segments"),
        sum(when(col("kept"), 0).otherwise(1)).cast("bigint").as("n_dropped"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("s").as("s"), col("seg").as("seg"))))),
            x => x.getField("seg")),
          " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val sqlSegmentDedup: String =
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |segs AS (SELECT doc_id, s,
       |    array_to_string(w[s : least(s + ${SegSize - 1}, len(w))], ' ') AS seg
       |  FROM toks, LATERAL unnest(range(1, greatest(len(w), 1) + 1, $SegSize)) t(s)),
       |flagged AS (SELECT doc_id, s, seg,
       |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, s) = 1 AS kept
       |  FROM segs)
       |SELECT doc_id,
       |  count(*)::BIGINT AS n_segments,
       |  sum(CASE WHEN kept THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
       |  md5(coalesce(array_to_string(list(seg ORDER BY s) FILTER (WHERE kept), ' '), '')) AS clean_md5
       |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------- training-order shuffle

  /** Seed naming the permutation epoch: a different seed is a different
    * deterministic global order (epoch 2 reshuffles by changing the seed,
    * nothing else).
    */
  val ShuffleSeed = "epoch-0"

  /** Deterministic global training-order shuffle: the corpus ordered by
    * hash32(seed, doc_id) — a keyed pseudo-random permutation. This is the
    * step that materializes the order training actually consumes; packing
    * ([[packSequences]]) and selection ([[budgetSelect]]) decide WHAT
    * trains, this decides WHEN.
    *
    * Scale shape: a seeded hash sort is ONE range exchange (sampled range
    * boundaries, all partitions sort locally) — no window, no
    * single-reducer prefix sum, no driver state; re-running with the same
    * seed reproduces the identical order on any cluster size or engine. A
    * global row_number position is deliberately NOT emitted: it would
    * funnel the corpus through one window partition. Consumers that need
    * offsets read the written files in order (file index, row-in-file), as
    * training loaders do.
    */
  def shuffleOrder(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        Portable.hash32(concat_ws("-", lit(ShuffleSeed), col("doc_id")))
          .as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id"))

  val sqlShuffleOrder: String =
    s"""SELECT doc_id, source,
       |  ${Portable.sqlHash32(s"'$ShuffleSeed-' || doc_id::VARCHAR")} AS shuffle_key
       |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin

  // ------------------------------------------- benchmark decontamination

  /** Benchmark-membership predicate: a deterministic held-out slice of the
    * corpus (stands in for a real eval-set manifest).
    */
  val BenchmarkMod = 97

  /** Training docs sharing at least one (stop-shingle-capped) shingle with
    * any benchmark doc, with the count of distinct shared shingles — the
    * n-gram-overlap decontamination pass run before training. Benchmark
    * side is tiny => Spark broadcasts it; train side streams through.
    */
  def decontaminate(docs: DataFrame): DataFrame = {
    // HASHED fused index, checkpointed once: the bench-side distinct and
    // the train-side join previously each re-ran the tokenize+shingle
    // Generate (and the old join-form df cap doubled it again — four
    // corpus tokenizations per call); now ONE pass builds the stored
    // index both consumers read. n_shared counts distinct 8-byte gids —
    // output-equal to counting strings (a 2^-64 collision is the d21
    // accepted class). Size bound: O(docs × shingles/doc) 16-byte rows —
    // index-sized, the d21 `ranked` caveat applies (see that site).
    val sh = Dedup.hashedShingles(docs).localCheckpoint(true)
    val bench = sh.filter(col("doc_id") % BenchmarkMod === 0)
      .select(col("g")).distinct()
    sh.filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  val sqlDecontaminate: String =
    s"""WITH ${Dedup.sqlShingleCtes},
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % $BenchmarkMod = 0)
       |SELECT s.doc_id, CAST(count(DISTINCT s.g) AS BIGINT) AS n_shared
       |FROM sh s JOIN bench b ON s.g = b.g
       |WHERE s.doc_id % $BenchmarkMod <> 0
       |GROUP BY s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Contamination severity threshold for p21's verdict column. */
  val ContaminationFracMax = 0.1

  /** The benchmark's distinct shingle set — the decontamination artifact
    * the streaming gate ([[graft.streaming.CurationStream.contaminationGate]])
    * checks each arriving document against. Benchmark suites are SMALL by
    * nature (an eval set, not a corpus), so this is a genuinely bounded
    * artifact; the gate still refuses loudly if handed one too large to
    * broadcast, because truncating a benchmark set would hide exactly the
    * contamination it exists to catch (the [[contaminationReport]]
    * no-cap rationale).
    */
  def benchmarkShingles(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % BenchmarkMod === 0)
      .select(col("doc_id"), graft.functions.Portable.tokens(col("text")).as("w"))
      .select(explode(graft.operators.Dedup.shingleArray(col("w"))).as("g"))
      .distinct()

  /** SURGICAL decontamination (p39) — the span-level intervention the
    * flag/grade/bloom gates stop short of: instead of DROPPING a
    * benchmark-overlapping document (p5's verdict — which at 10%
    * overlap throws away 90% clean text), cut exactly the token
    * positions covered by a benchmark shingle occurrence and re-emit
    * the survivor text — the p22 ExactSubstr span cut retargeted from
    * cross-doc duplication to benchmark leakage. Covered positions use
    * ALL gram occurrences (not per-doc distinct — every occurrence of a
    * leaked item is cut, however often it repeats); benchmark docs
    * themselves are excluded, as in p5.
    *
    * Scale shape: the benchmark shingle set broadcasts (tiny by nature,
    * the p21 artifact); positions explode linear in corpus tokens; the
    * coverage union is a distinct on (doc, position); the cut itself is
    * a pure per-row array expression.
    */
  def decontaminateCut(docs: DataFrame): DataFrame = {
    val n = Portable.ShingleN
    val bench = benchmarkShingles(docs)
    val toks = docs.filter(col("doc_id") % BenchmarkMod =!= 0)
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    val grams = toks.select(col("doc_id"), posexplode(
        when(size(col("w")) >= n, transform(sequence(lit(0), size(col("w")) - n),
          i => array_join(slice(col("w"), i + lit(1), lit(n)), " ")))
          .otherwise(array().cast("array<string>"))))
      .toDF("doc_id", "i0", "g")
    // no distinct before collect_set: the set aggregate already
    // deduplicates (map-side, in the partial buffer) — a distinct here
    // would add a full extra exchange on the largest intermediate
    val covArr = grams.join(broadcast(bench), "g")
      .select(col("doc_id"), explode(sequence(col("i0") + 1, col("i0") + n)).as("p"))
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

  def sqlDecontaminateCut: String = {
    val n = Portable.ShingleN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |bench AS (SELECT DISTINCT $grams AS g
       |  FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)
       |  WHERE doc_id % $BenchmarkMod = 0),
       |tr AS (SELECT doc_id, w FROM toks WHERE doc_id % $BenchmarkMod <> 0),
       |gr AS (SELECT doc_id, i, $grams AS g
       |  FROM tr, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |cov AS (SELECT DISTINCT gr.doc_id, p
       |  FROM gr JOIN bench USING (g), LATERAL unnest(range(gr.i, gr.i + $n)) t(p)),
       |pos AS (SELECT doc_id, p FROM tr, LATERAL unnest(range(1, len(w) + 1)) t(p)),
       |keep AS (SELECT pos.doc_id, pos.p FROM pos
       |  LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
       |  WHERE cov.p IS NULL),
       |cut AS (SELECT doc_id, count(*)::BIGINT AS cut_tokens FROM cov GROUP BY doc_id),
       |cln AS (SELECT keep.doc_id, string_agg(w[p], ' ' ORDER BY p) AS clean_text
       |  FROM keep JOIN tr ON tr.doc_id = keep.doc_id GROUP BY keep.doc_id)
       |SELECT tr.doc_id, len(w)::BIGINT AS n_tokens,
       |  coalesce(cut.cut_tokens, 0)::BIGINT AS cut_tokens,
       |  coalesce(cln.clean_text, '') AS clean_text
       |FROM tr LEFT JOIN cut ON cut.doc_id = tr.doc_id
       |LEFT JOIN cln ON cln.doc_id = tr.doc_id
       |ORDER BY tr.doc_id""".stripMargin
  }

  /** Contamination REPORT (p21) — the graded form of [[decontaminate]]:
    * p5 lists contaminated docs with a raw shared-shingle count, but what
    * a decontamination run acts on is the FRACTION of a document's
    * content that overlaps the benchmark (GPT-3 appendix-C style n-gram
    * overlap): a 10k-shingle doc sharing 3 shingles is a coincidence, a
    * 30-shingle doc sharing 20 is a leaked test item. Emits every
    * non-benchmark doc's distinct-shingle count, shared count, overlap
    * fraction, and the `contaminated` verdict at
    * [[ContaminationFracMax]].
    *
    * Scale shape: identical to p5 (benchmark shingle set broadcast,
    * corpus side never shuffles for it) plus one per-doc total from the
    * same shingle stream.
    */
  def contaminationReport(docs: DataFrame): DataFrame = {
    // UN-capped shingle stream — deliberately NOT [[Dedup.shingles]]: the
    // stop-shingle cap (df > MaxShingleDocFreq dropped) is a skew guard
    // for candidate JOINS, but here a benchmark item leaked into hundreds
    // of documents is exactly the hot-shingle case the cap would hide —
    // the worst contamination would read as clean. Materialized ONCE
    // (two consumers) via localCheckpoint, not cache: the plan-keyed
    // cache would make repeat invocations silently measure cache hits
    // (the kmeansModel rationale).
    // SIZE/FAULT BOUND (guide §5, the Ranking scaladoc caveat): this
    // checkpoint is UNCAPPED-INDEX-sized — O(docs × shingles/doc) rows
    // INCLUDING hot shingles, the largest materialization in the
    // curation family. Blocks spill (MEMORY_AND_DISK) but are
    // non-replicated: an executor loss fails the query, the retry
    // re-runs it. Past executor storage, stage the stream to parquet
    // (ModelStore.saveLarge) or run the report per-source and union —
    // contamination is per-doc, so sharding the corpus is exact.
    val sh0 = docs
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(Dedup.shingleArray(col("w"))).as("g"))
      .localCheckpoint(true)
    val bench = sh0.filter(col("doc_id") % BenchmarkMod === 0)
      .select(col("g")).distinct().withColumn("hit", lit(1))
    // ONE corpus-side aggregation: left-join the broadcast benchmark set
    // with a hit flag; per-doc shingles are already distinct (the
    // array_distinct inside shingleArray), so count(*) is the distinct
    // total and count(hit) the shared count
    val per = sh0.filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
    docs.select(col("doc_id")).filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(round(col("n_shared") / col("n_shingles"), 4), lit(0.0))
          .as("overlap_frac"),
        coalesce(col("n_shared") / col("n_shingles") > ContaminationFracMax,
          lit(false)).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  val sqlContaminationReport: String = {
    val n = Portable.ShingleN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, $grams AS g
       |        FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |bench AS (SELECT DISTINCT g FROM sh0 WHERE doc_id % $BenchmarkMod = 0),
       |per AS (SELECT c.doc_id, count(*)::BIGINT AS n_shingles,
       |    count(b.g)::BIGINT AS n_shared
       |  FROM (SELECT doc_id, g FROM sh0 WHERE doc_id % $BenchmarkMod <> 0) c
       |  LEFT JOIN bench b ON b.g = c.g GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(per.n_shingles, 0)::BIGINT AS n_shingles,
       |  coalesce(per.n_shared, 0)::BIGINT AS n_shared,
       |  coalesce(round(per.n_shared * 1.0 / per.n_shingles, 4), 0.0) AS overlap_frac,
       |  coalesce(per.n_shared * 1.0 / per.n_shingles > $ContaminationFracMax, false)
       |    AS contaminated
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
       |WHERE d.doc_id % $BenchmarkMod <> 0
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------- bloom-filter decontamination (p29)

  // sketch layout (2^20 bits = 128 KB plan literal, k = 6 md5-window
  // positions) lives in graft.functions.Bloom.PortableBloomBits/K —
  // three orders of magnitude under the collected-set gate's refusal
  // threshold; at the fixture's item count the FPR is far below one per
  // corpus, and production sizes bits ~10x expected items for ~1% FPR

  /** Train the benchmark bloom artifact: distinct benchmark shingles
    * aggregated into the PORTABLE 2^20-bit array
    * ([[graft.functions.Bloom.portableBloomArray]]) — one corpus-side
    * partial-aggregated pass whose merge is bitwise OR,
    * order-independent, and reproducible BIT-FOR-BIT by any engine with
    * md5 (positions are fixed 5-hex windows of one digest). That last
    * property is what upgraded p29 from a rows-only driver check to a
    * full hash-gated query: the oracle rebuilds the identical bits and
    * replays the identical probe, false positives included.
    */
  def trainBenchmarkBloom(docs: DataFrame): Array[Long] =
    graft.functions.Bloom.portableBloomArray(benchmarkShingles(docs))

  /** The decontamination gate at the scale where the benchmark shingle SET
    * no longer broadcasts (the contaminationGate refusal path): probe each
    * document's distinct shingles against the 128 KB bloom LITERAL —
    * a pure per-row expression, NO join, NO shuffle (scan → project →
    * sort); stream-applicable unchanged. One-sided error in the SAFE
    * direction for decontamination: `n_maybe >= n_shared` per doc and
    * every truly-contaminated doc is flagged (no false negatives) — a
    * false positive wastes one clean doc, a false negative ships a leaked
    * benchmark item to training.
    */
  def bloomDecontaminate(docs: DataFrame, bloom: Array[Long]): DataFrame = {
    val gated = docs.filter(col("doc_id") % BenchmarkMod =!= 0)
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(filter(Dedup.shingleArray(col("w")),
          g => graft.functions.Bloom.portableMightContain(bloom, g)))
          .cast("bigint").as("n_maybe"))
      .withColumn("flagged", col("n_maybe") > 0)
    // presentation sort is a batch concept; the same gate applies to a
    // streaming micro-batch unchanged (stateless, join-free)
    if (docs.isStreaming) gated else gated.orderBy(col("doc_id"))
  }

  /** Oracle for [[bloomDecontaminate]]: rebuild the identical bit table
    * from the benchmark shingles (same 5-hex-window positions, same
    * bit_or — 1 << 63 via the add-MinValue trick DuckDB needs), probe
    * every non-benchmark doc's distinct shingles requiring ALL k bits,
    * count per doc. The sketch's false positives replay exactly, so the
    * comparison is a hash match, not a tolerance verdict.
    */
  def sqlBloomDecontaminate: String = {
    val n = graft.functions.Portable.ShingleN
    val grams = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    val k = graft.functions.Bloom.PortableBloomK
    val posSel = graft.functions.Bloom.sqlPortablePositions("g")
      .zipWithIndex.map { case (e, i) => s"$e AS p$i" }.mkString(", ")
    val posList = (0 until k).map(i => s"p$i").mkString(", ")
    val mask =
      "CASE WHEN p % 64 = 63 THEN (-9223372036854775807 - 1) ELSE (1::BIGINT << (p % 64)::INT) END"
    s"""WITH toks AS (SELECT doc_id, ${Portable.sqlTokens("text")} AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, $grams AS g
       |       FROM toks, LATERAL unnest(range(1, len(w) - ${n - 2})) t(i)),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % $BenchmarkMod = 0),
       |bpos AS (SELECT $posSel FROM bench),
       |bp AS (SELECT unnest([$posList]) AS p FROM bpos),
       |bloom AS MATERIALIZED (SELECT p // 64 AS idx, bit_or($mask) AS bits
       |  FROM bp GROUP BY 1),
       |dsh AS (SELECT doc_id, g, $posSel FROM sh WHERE doc_id % $BenchmarkMod != 0),
       |dp AS (SELECT doc_id, g, unnest([$posList]) AS p FROM dsh),
       |hit AS (SELECT dp.doc_id, dp.g, count(*) AS khit
       |  FROM dp JOIN bloom b ON b.idx = dp.p // 64
       |  WHERE (b.bits & ($mask)) != 0
       |  GROUP BY 1, 2),
       |per AS (SELECT doc_id, count(*)::BIGINT AS n_maybe FROM hit
       |  WHERE khit = $k GROUP BY 1)
       |SELECT d.doc_id, coalesce(per.n_maybe, 0)::BIGINT AS n_maybe,
       |  coalesce(per.n_maybe, 0) > 0 AS flagged
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
       |WHERE d.doc_id % $BenchmarkMod != 0
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------------ curriculum manifest

  /** Curriculum phase boundaries in z-score units: |z| <= this is the
    * "medium" band, below is "easy", above is "hard".
    */
  val CurriculumBand = 0.5
  val CurriculumSeed = "curr"

  /** CURRICULUM MANIFEST (p42) — the easy-to-hard data ordering a
    * curriculum-trained run consumes (Bengio et al. 2009 applied to
    * corpus curation): every document scored for difficulty by its t13
    * unigram surprisal (bits/token under the corpus's own LM — template
    * text scores low, rare-token text high), assigned a phase by its
    * corpus z-score (fixed z thresholds, never a global percentile
    * sort), and given the p14 deterministic shuffle key so consumers
    * range-partition by (phase, order_key) for a reproducible
    * within-phase order.
    *
    * Scale shape: difficulty is the t13 skeleton (vocabulary-keyed
    * equi-joins, single-row totals broadcast); the corpus mean/variance
    * come from ONE partial-aggregated pass over the 4-decimal scores
    * summed as DECIMALs — order-free by exactness, so both engines and
    * any partitioning agree to the bit — and ride a single-row
    * broadcast; phase assignment and the shuffle key are then pure
    * per-row expressions. No ntile, no global sort, nothing beyond t13's
    * shuffles.
    */
  def curriculum(docs: DataFrame): DataFrame = {
    val diff = curriculumDiff(TextOps.unigramSurprisal(docs))
    assignPhases(diff, curriculumStats(diff))
  }

  private def curriculumDiff(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    scored.select(col("doc_id"), col("n_tokens"), col("bits_per_token"),
      col("bits_per_token").cast(DecimalType(18, 4)).as("d"))
  }

  /** E[x] and E[x^2] from exact decimal sums; sigma from the one-row
    * aggregate (fp, but computed once from exact inputs).
    */
  private def curriculumStats(diff: DataFrame): DataFrame =
    diff
      .agg((sum(col("d")).cast("double") / count(lit(1))).as("mu"),
        (sum(col("d") * col("d")).cast("double") / count(lit(1))).as("m2"))
      .select(col("mu"),
        sqrt(greatest(col("m2") - col("mu") * col("mu"), lit(0.0)))
          .as("sigma"))

  private def assignPhases(diff: DataFrame, stats: DataFrame): DataFrame =
    diff.crossJoin(broadcast(stats))
      .withColumn("zraw", when(col("sigma") === 0.0, lit(0.0))
        .otherwise((col("bits_per_token") - col("mu")) / col("sigma")))
      .select(col("doc_id"), col("n_tokens"), col("bits_per_token"),
        (round(col("zraw"), 4) + 0.0).as("z"),
        when(col("zraw") < -CurriculumBand, "easy")
          .when(col("zraw") <= CurriculumBand, "medium")
          .otherwise("hard").as("phase"),
        Portable.hash32(concat_ws("-", lit(CurriculumSeed), col("doc_id")))
          .as("order_key"))
      .orderBy(col("doc_id"))

  /** Oracle for [[curriculum]]: nests the full t13 oracle, replays the
    * decimal moment sums, the z arithmetic, the band cases and the
    * shuffle key.
    */
  def sqlCurriculum: String =
    s"""WITH diff AS (${Portable.sqlNoOrder(TextOps.sqlUnigramSurprisal)}),
       |x AS (SELECT doc_id, n_tokens, bits_per_token,
       |    CAST(bits_per_token AS DECIMAL(18,4)) AS d FROM diff),
       |st AS (SELECT CAST(sum(d) AS DOUBLE) / count(*) AS mu,
       |    CAST(sum(d*d) AS DOUBLE) / count(*) AS m2 FROM x),
       |s2 AS (SELECT mu, sqrt(greatest(m2 - mu*mu, 0.0)) AS sigma FROM st),
       |zd AS (SELECT x.*, CASE WHEN sigma = 0.0 THEN 0.0
       |    ELSE (bits_per_token - mu) / sigma END AS zraw FROM x, s2)
       |SELECT doc_id, n_tokens, bits_per_token,
       |  round(zraw, 4) + 0.0 AS z,
       |  CASE WHEN zraw < -$CurriculumBand THEN 'easy'
       |       WHEN zraw <= $CurriculumBand THEN 'medium'
       |       ELSE 'hard' END AS phase,
       |  ${Portable.sqlHash32(s"'$CurriculumSeed-' || doc_id::VARCHAR")} AS order_key
       |FROM zd ORDER BY doc_id""".stripMargin

  /** Persist the curriculum artifact: the t13 LM (counts/totals/band via
    * [[TextOps.trainAndSaveSurprisalModel]]) plus the FROZEN difficulty
    * stats row — the corpus mu/sigma under that model. Freezing both is
    * what makes phase assignments stable across shards: today's shard is
    * phased on yesterday's scale, not its own (a shard of hard docs must
    * land in "hard", not be re-centered to "medium" by its own mean).
    */
  def trainAndSaveCurriculum(docs: DataFrame, dir: String): Unit = {
    val model = TextOps.trainAndSaveSurprisalModel(docs, dir)
    val diff = curriculumDiff(TextOps.unigramSurprisalFromSaved(docs, model))
    graft.sources.ModelStore.save(curriculumStats(diff), s"$dir/curr_stats")
  }

  /** CURRICULUM FOR A NEW SHARD (p43) — p42's incremental twin: score
    * the shard under the SAVED LM (a token the model never saw degrades
    * to the add-one floor, the t21 unseen convention) and phase it with
    * the SAVED mu/sigma. Nothing retrains and nothing re-reads the old
    * corpus; the shard pays shard cost. This is the operator a daily
    * pipeline actually runs — p42 is the once-per-corpus calibration
    * that produces its artifacts.
    */
  def curriculumShard(shard: DataFrame,
                      spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    val model = TextOps.loadSurprisalModel(spark, dir)
    val stats = graft.sources.ModelStore.load(spark, s"$dir/curr_stats")
    assignPhases(
      curriculumDiff(TextOps.unigramSurprisalFromSaved(shard, model)), stats)
  }

  /** Oracle for [[curriculumShard]]: replays the 4/5 split, trains the
    * unigram model and freezes the stats on the OLD slice, scores the
    * shard with the left-join add-one floor for unseen tokens, and
    * applies the frozen z thresholds.
    */
  def sqlCurriculumShard: String = {
    val toks = Portable.sqlTokens("text")
    s"""WITH cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |old AS (SELECT d.* FROM documents d, cn WHERE d.doc_id < cn.cnt),
       |shard AS (SELECT d.* FROM documents d, cn WHERE d.doc_id >= cn.cnt),
       |otk AS (SELECT doc_id, unnest($toks) AS t FROM old),
       |otf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM otk GROUP BY 1, 2),
       |counts AS (SELECT t, sum(tf)::BIGINT AS c FROM otf GROUP BY t),
       |totals AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM counts),
       |oscored AS (SELECT otf.doc_id, otf.tf,
       |    otf.tf * -log2((counts.c + 1.0) / (totals.n + totals.v)) AS wbits
       |  FROM otf JOIN counts USING (t), totals),
       |oper AS (SELECT doc_id, round(sum(wbits) / sum(tf), 4) AS bpt
       |  FROM oscored GROUP BY doc_id),
       |odiff AS (SELECT CAST(coalesce(oper.bpt, 0.0) AS DECIMAL(18,4)) AS d
       |  FROM old LEFT JOIN oper ON oper.doc_id = old.doc_id),
       |st AS (SELECT CAST(sum(d) AS DOUBLE) / count(*) AS mu,
       |    CAST(sum(d*d) AS DOUBLE) / count(*) AS m2 FROM odiff),
       |s2 AS (SELECT mu, sqrt(greatest(m2 - mu*mu, 0.0)) AS sigma FROM st),
       |stk AS (SELECT doc_id, unnest($toks) AS t FROM shard),
       |stf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM stk GROUP BY 1, 2),
       |sscored AS (SELECT stf.doc_id, stf.tf,
       |    stf.tf * -log2((coalesce(counts.c, 0) + 1.0) / (totals.n + totals.v)) AS wbits
       |  FROM stf LEFT JOIN counts USING (t), totals),
       |sper AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
       |    round(sum(wbits) / sum(tf), 4) AS bits_per_token
       |  FROM sscored GROUP BY doc_id),
       |sdiff AS (SELECT s.doc_id,
       |    coalesce(sper.n_tokens, 0)::BIGINT AS n_tokens,
       |    coalesce(sper.bits_per_token, 0.0) AS bits_per_token
       |  FROM shard s LEFT JOIN sper ON sper.doc_id = s.doc_id),
       |zd AS (SELECT sdiff.*, CASE WHEN sigma = 0.0 THEN 0.0
       |    ELSE (bits_per_token - mu) / sigma END AS zraw FROM sdiff, s2)
       |SELECT doc_id, n_tokens, bits_per_token,
       |  round(zraw, 4) + 0.0 AS z,
       |  CASE WHEN zraw < -$CurriculumBand THEN 'easy'
       |       WHEN zraw <= $CurriculumBand THEN 'medium'
       |       ELSE 'hard' END AS phase,
       |  ${Portable.sqlHash32(s"'$CurriculumSeed-' || doc_id::VARCHAR")} AS order_key
       |FROM zd ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ epoch schedule (p44)

  /** Token budget as a multiple of the corpus, in halves: budget =
    * [[EpochBudgetHalves]]/2 × total tokens (kept integral so the budget
    * itself is an exact BIGINT).
    */
  val EpochBudgetHalves = 5 // 2.5 epochs' worth of tokens

  /** DATA REPETITION SCHEDULE UNDER A TOKEN BUDGET (p44) — the "how many
    * epochs of each source" table a fixed-compute pretraining run needs
    * (the Llama/Gopher data-recipe question): allocate a token budget B
    * across sources as alloc_s = min(λ·t_s, cap_s·t_s), Σ alloc = B —
    * classic water-filling, where cap_s is the per-source max-repeat
    * ceiling (high-value sources tolerate more epochs than crawl; here
    * derived 1..5 from the source hash so the algorithm is exercised
    * without a semantic source map). λ has a CLOSED FORM over sources
    * sorted by cap: clamp the k lowest-cap sources, spread the remainder
    * over the rest, pick the k whose λ lands between the neighbouring
    * caps — no iteration, one window pass.
    *
    * Determinism: token counts, caps, budget, and both prefix sums are
    * exact integers (the windowed sums never touch doubles, so engine
    * aggregation-tree order is irrelevant); each candidate λ is ONE
    * double division of two exact integers; the winning candidate is the
    * smallest valid k. If the budget exceeds total capacity every source
    * clamps and λ canonicalizes to the largest cap.
    *
    * Scale shape: one tokenize+sum shuffle on the bounded source key;
    * everything after runs on |sources| rows.
    */
  def epochSchedule(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"), size(Portable.tokens(col("text"))).cast("long").as("tk"))
      .groupBy(col("source")).agg(sum(col("tk")).as("t"))
      .withColumn("e", Portable.hash32(col("source")) % 5 + 1)
    val ord = Window.orderBy(col("e"), col("source"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = st.agg(sum(col("t")).as("tt"))
    val cand = st.crossJoin(broadcast(tot))
      .withColumn("k", row_number().over(ord))
      .withColumn("cumCap", sum(col("e") * col("t")).over(run))
      .withColumn("cumT", sum(col("t")).over(run))
      .withColumn("lage", lag(col("e"), 1, 0).over(ord))
      .withColumn("lam",
        (expr(s"($EpochBudgetHalves * tt) div 2") - (col("cumCap") - col("e") * col("t")))
          .cast("double") / (col("tt") - col("cumT") + col("t")).cast("double"))
    val pick = cand
      .filter(col("lam") >= col("lage") && col("lam") <= col("e"))
      .agg(min(struct(col("k"), col("lam"))).as("b"))
      .select(col("b.lam").as("lam0"))
    val maxE = st.agg(max(col("e")).cast("double").as("emax"))
    st.crossJoin(broadcast(pick)).crossJoin(broadcast(maxE))
      .withColumn("lam", coalesce(col("lam0"), col("emax")))
      .select(col("source"), col("t").as("tokens"), col("e").cast("int").as("cap_epochs"),
        round(col("lam"), 6).as("lam"),
        round(least(col("lam"), col("e").cast("double")), 6).as("epochs"),
        round(least(col("lam"), col("e").cast("double")) * col("t"), 2).as("alloc_tokens"))
      .orderBy(col("source"))
  }

  /** Oracle for [[epochSchedule]]: identical integer prefix sums, the
    * same candidate-λ division, smallest-valid-k pick, clamp fallback.
    */
  def sqlEpochSchedule: String = {
    val toks = Portable.sqlTokens("text")
    val h = Portable.sqlHash32("source")
    s"""WITH st AS (SELECT source, sum(len($toks))::BIGINT AS t,
       |    ($h % 5 + 1) AS e
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(t)::BIGINT AS tt FROM st),
       |cand AS (SELECT source, t, e,
       |    row_number() OVER (ORDER BY e, source) AS k,
       |    lag(e, 1, 0) OVER (ORDER BY e, source) AS lage,
       |    ((($EpochBudgetHalves * tt) // 2
       |       - (sum(e * t) OVER w - e * t))::DOUBLE
       |      / (tt - sum(t) OVER w + t)::DOUBLE) AS lam
       |  FROM st, tot
       |  WINDOW w AS (ORDER BY e, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |pick AS (SELECT coalesce(
       |    (SELECT lam FROM cand WHERE lam >= lage AND lam <= e ORDER BY k LIMIT 1),
       |    (SELECT max(e)::DOUBLE FROM st)) AS lam)
       |SELECT st.source, st.t AS tokens, st.e::INT AS cap_epochs,
       |  round(pick.lam, 6) AS lam,
       |  round(least(pick.lam, st.e::DOUBLE), 6) AS epochs,
       |  round(least(pick.lam, st.e::DOUBLE) * st.t, 2) AS alloc_tokens
       |FROM st, pick ORDER BY source""".stripMargin
  }
}
