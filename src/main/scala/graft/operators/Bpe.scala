package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Learned byte-pair encoding: a DISTRIBUTED trainer (iterative max-count
  * pair merge over the corpus word-frequency table) and a deterministic
  * apply producing per-document token-id streams — the real tokenizer a
  * training-data pipeline runs, replacing the t7 regex approximation.
  *
  * Algorithm (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units", ACL 2016): start from characters, repeatedly count
  * adjacent symbol pairs weighted by word frequency and merge the max-count
  * pair everywhere, greedy left-to-right within a word. No end-of-word
  * marker (documented variant); ties break (count desc, left asc, right
  * asc) so training is deterministic and engine-portable. Training is over
  * lowercase alphabetic pre-tokens only — digits and marks are single
  * tokens under [[TextOps.BpePattern]] already, and ASCII-only symbols keep
  * the char-split identical across engines.
  *
  * Scale design, mirroring the CC / k-means loops:
  *  - the trainer never re-reads the corpus: ONE pass builds the (word,
  *    freq) table (partial-aggregated groupBy), and every merge round runs
  *    over that vocabulary table — |distinct words|, not |corpus| — with a
  *    partial-aggregated pair count (PlanShapeSpec) and a one-row argmax
  *    collect, O(1) driver state per round;
  *  - per-round localCheckpoint cuts lineage exactly like
  *    [[Dedup.connectedComponentsWithRounds]], so round r+1's plan does not
  *    re-run rounds 1..r;
  *  - apply is a broadcast join of the trained vocabulary (word -> final
  *    symbolization) against the corpus pre-token stream — the corpus is
  *    scanned once, nothing corpus-sized shuffles except the per-doc
  *    aggregate. Token-id assignment windows over the DISTINCT-SYMBOL
  *    table, which is O(alphabet + merges + distinct marks) — a dimension
  *    table by construction, never corpus-sized.
  */
object Bpe {

  /** Merge rounds learned by the t10/t11 queries (the oracle unrolls one
    * CTE block per round, so this is a shared constant, not a default).
    */
  val NMerges = 10

  private val AlphaWordRe = "[a-z]+"

  /** End-of-word marker for the Sennrich-faithful trainer mode: the last
    * character carries `</w>`, so a merge reaching the word boundary is a
    * DIFFERENT symbol than the same pair word-internally — the standard
    * setup that lets the tokenizer distinguish "low" the word from "low"
    * the prefix of "lowest".
    */
  val EowMarker = "</w>"

  /** "abc" -> "a b c" (ASCII alpha only, so Java-regex and RE2 agree);
    * marked mode appends [[EowMarker]] to the final character's symbol.
    */
  private def charSyms(word: Column, marker: Boolean = false): Column = {
    val plain = rtrim(regexp_replace(word, "(.)", "$1 "))
    if (marker) concat(plain, lit(EowMarker)) else plain
  }

  private def sqlCharSyms(e: String, marker: Boolean = false): String = {
    val plain = s"rtrim(regexp_replace($e, '(.)', '\\1 ', 'g'))"
    if (marker) s"($plain || '$EowMarker')" else plain
  }

  /** Word-frequency table with initial char symbolization — the trainer's
    * working set. One partial-aggregated pass over the corpus.
    */
  def initialWords(docs: DataFrame, marker: Boolean = false): DataFrame =
    docs.select(explode(
        regexp_extract_all(lower(col("text")), lit(AlphaWordRe), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), charSyms(col("word"), marker).as("syms"))

  /** Adjacent-pair counts over the current symbolization, freq-weighted.
    * Overlapping occurrences count separately ("a a a" contributes two
    * (a,a)) — the standard BPE count, identical in the oracle.
    */
  private[graft] def pairCounts(words: DataFrame): DataFrame = {
    // materialize the split before indexing into it: an inlined split
    // tree under transform/element_at re-runs the split once per array
    // ACCESS (the t39 lesson — 2·len splits per word instead of one)
    val a = col("__a")
    val pairs = when(size(a) >= 2,
      transform(sequence(lit(1), size(a) - 1),
        i => struct(element_at(a, i).as("x"), element_at(a, i + 1).as("y"))))
      .otherwise(array().cast("array<struct<x:string,y:string>>"))
    words.select(col("freq"), split(col("syms"), " ").as("__a"))
      .select(col("freq"), explode(pairs).as("pr"))
      .groupBy(col("pr.x").as("x"), col("pr.y").as("y"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Greedy left-to-right merge of (x, y) in a space-delimited
    * symbolization, as a pure fold: the accumulator appends each symbol
    * unless its last symbol is x and the next is y, in which case the pair
    * becomes xy. A freshly-merged xy can't chain-merge (it no longer equals
    * x), which is exactly BPE's non-overlapping greedy scan. The oracle
    * replays the identical fold via DuckDB list_reduce.
    */
  private[graft] def applyMerge(syms: Column, x: String, y: String): Column =
    ltrim(aggregate(split(syms, " "), lit(""), (acc, s) => {
      val last = substring_index(acc, " ", -1)
      when(last === lit(x) && s === lit(y),
        concat(acc.substr(lit(1), length(acc) - length(last)), lit(x + y)))
        .otherwise(concat(acc, lit(" "), s))
    }))

  /** Train: returns the learned merges (rank, x, y, count) and the final
    * vocabulary (word, freq, syms). An ACTION like the CC loop — each round
    * aggregates the vocabulary table, collects the one-row argmax, applies
    * the merge with literal x/y, and checkpoints. The returned vocabulary
    * is a live localCheckpoint: like kmeansModel's outputs, its blocks are
    * released by the ContextCleaner with the RDD once the caller drops the
    * frame (callers that never execute it, e.g. [[learnedMerges]],
    * unpersist eagerly instead).
    */
  def train(docs: DataFrame, nMerges: Int = NMerges)
      : (Seq[(Int, String, String, Long)], DataFrame) =
    trainCore(docs, marker = false, maxMerges = nMerges, targetVocab = None)

  /** Sennrich-faithful trainer mode: end-of-word-marked symbolization
    * ([[EowMarker]]) and an optional TARGET-VOCAB-SIZE stop — merging ends
    * once the symbolization's distinct-symbol count reaches `targetVocab`
    * (checked before each round over the tiny distinct-symbol dimension
    * table), or after `maxMerges` rounds, whichever first. The merge loop
    * itself is byte-identical to [[train]]; only the initial symbols and
    * the stop rule differ.
    */
  def trainMarked(docs: DataFrame, maxMerges: Int = NMerges,
                  targetVocab: Option[Int] = None)
      : (Seq[(Int, String, String, Long)], DataFrame) =
    trainCore(docs, marker = true, maxMerges = maxMerges, targetVocab = targetVocab)

  private def trainCore(docs: DataFrame, marker: Boolean, maxMerges: Int,
                        targetVocab: Option[Int])
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var words = initialWords(docs, marker).localCheckpoint(true)
    // distinct-symbol count of the CURRENT symbolization — a one-row agg
    // over the vocabulary table, only paid when a vocab-size stop is set
    def vocabSize(): Long = words
      .select(explode(split(col("syms"), " ")).as("s"))
      .agg(countDistinct(col("s"))).collect().head.getLong(0)
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var continue = true
    while (continue && merges.size < maxMerges
        && targetVocab.forall(vocabSize() < _)) {
      pairCounts(words).orderBy(col("cnt").desc, col("x"), col("y")).limit(1)
        .collect().headOption match {
        case None => continue = false // nothing left to merge
        case Some(r) =>
          val (x, y, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((merges.size + 1, x, y, cnt))
          val next = words
            .select(col("word"), col("freq"), applyMerge(col("syms"), x, y).as("syms"))
            .localCheckpoint(true)
          words.unpersist()
          words = next
      }
    }
    (merges.toSeq, words)
  }

  /** The learned merge table as a query result (t10). */
  def learnedMerges(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, words) = train(docs)
    // the merges are driver-side already; release the vocabulary
    // checkpoint now instead of waiting for the ContextCleaner
    words.unpersist()
    merges.toDF("merge_rank", "x", "y", "cnt").orderBy(col("merge_rank"))
  }

  /** The corpus as a positioned symbol stream (doc_id, p, q, sym): every
    * pre-token replaced by its trained symbolization. This is the
    * streaming-safe core of [[applyBpe]] — stateless per-row expressions
    * plus a broadcast stream-static vocab join, so the same plan tokenizes
    * a live rapid (StreamingSpec proves it).
    */
  /** Positioned pre-tokens (doc_id, p, tok) — the [[TextOps.BpePattern]]
    * split both apply paths (vocab join and merge replay) consume.
    */
  private def preTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(regexp_extract_all(lower(col("text")),
        lit(TextOps.BpePattern), lit(0))).as(Seq("p", "tok")))

  def symbolStream(docs: DataFrame, vocab: DataFrame,
                   marker: Boolean = false): DataFrame = {
    val pre = preTokens(docs)
    // the out-of-vocab fallback must follow the TRAINED convention: a
    // marked vocabulary's words all end in an </w> symbol, so an unmarked
    // fallback would mix boundary conventions in one id space and tokenize
    // OOV words in a way the marked trainer could never produce
    val withSyms = pre
      .join(broadcast(vocab.select(col("word"), col("syms"))),
        pre("tok") === col("word"), "left")
      .select(col("doc_id"), col("p"),
        coalesce(col("syms"), charSyms(col("tok"), marker)).as("ts"))
    withSyms.select(col("doc_id"), col("p"),
      posexplode(split(col("ts"), " ")).as(Seq("q", "sym")))
  }

  /** Dense token ids over the distinct symbols of a symbol stream — the
    * id -> symbol table a training loader ships with the tokenized corpus.
    * The window is over the DISTINCT-SYMBOL dimension table (O(alphabet +
    * merges + distinct marks)), never corpus-sized.
    */
  def symbolIds(symRows: DataFrame): DataFrame =
    symRows.select(col("sym")).distinct()
      .withColumn("id", row_number().over(Window.orderBy(col("sym"))))

  /** The trained tokenizer's id table for this corpus (t12). */
  def vocabulary(docs: DataFrame): DataFrame =
    symbolIds(symbolStream(docs, train(docs)._2))
      .select(col("id"), col("sym")).orderBy(col("id"))

  /** Tokenize every document with the trained vocabulary (t11): pre-tokens
    * ([[TextOps.BpePattern]]) join the vocab for their final symbolization
    * (non-alpha pre-tokens are single symbols; the char-split fallback also
    * covers out-of-vocab alpha words for corpora the trainer didn't see),
    * symbols get dense ids from [[symbolIds]], and each doc reports its
    * token count plus the md5 of its ordered token-id stream — a
    * full-fidelity fingerprint of the tokenization.
    */
  def applyBpe(docs: DataFrame, vocab: DataFrame,
               marker: Boolean = false): DataFrame = {
    // materialized ONCE because two consumers read the corpus-sized stream
    // (the id table's distinct and the scoring join) — without it the
    // corpus is scanned and re-tokenized twice. localCheckpoint, NOT
    // cache(): each invocation trains a fresh vocab so the plan is never
    // identical, and a plan-keyed cache entry would pin storage for the
    // session per call — checkpoint blocks are released by the
    // ContextCleaner with the RDD instead (the kmeansModel rationale).
    val symRows = symbolStream(docs, vocab, marker).localCheckpoint(true)
    docFingerprint(symRows)
  }

  /** Per-doc (n_bpe, ids_md5) from a positioned symbol stream — THE t11
    * output shape, shared by the vocab-join and merge-replay apply paths
    * so the t16 ≡ t11 byte-identity can never drift on the fingerprint
    * expression alone.
    */
  private def docFingerprint(symRows: DataFrame): DataFrame = {
    val ids = symbolIds(symRows)
    symRows.join(broadcast(ids), "sym")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bpe"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("p"), col("q"), col("id")))),
            s => s.getField("id").cast("string")),
          ",")).as("ids_md5"))
      .orderBy(col("doc_id"))
  }

  /** t11 end-to-end: train on the corpus, tokenize the corpus. */
  def tokenize(docs: DataFrame): DataFrame = applyBpe(docs, train(docs)._2)

  // ---------------------------------------------------- merge-replay apply

  /** A pre-token symbolized by REPLAYING the merge list in rank order over
    * its char split — the real BPE apply (how sentencepiece/GPT tokenizers
    * run): each learned merge is a greedy left-to-right pass, chained as a
    * fold of [[applyMerge]] expressions, pure codegen. Replaying the
    * merges on a TRAINING word reproduces its trained symbolization
    * exactly (training applied the same merges globally in the same
    * order), and an UNSEEN word gets the correct compressed tokenization —
    * unlike the vocab join's char-split fallback.
    *
    * Expression depth grows with the merge count: fine for the bounded
    * lists here (each merge is one codegen'd aggregate), but a production
    * 32k-merge tokenizer exceeds what an expression tree should hold —
    * at that size the replay belongs in a mapPartitions kernel with the
    * merge table broadcast, and the vocab join covers in-vocab words.
    */
  def symbolizeByMerges(tok: Column, merges: Seq[(String, String)],
                        marker: Boolean = false): Column =
    merges.foldLeft(charSyms(tok, marker)) {
      case (syms, (x, y)) => applyMerge(syms, x, y)
    }

  /** Tokenize from the MERGE TABLE alone (t16) — no vocabulary at all:
    * proves the small rank-ordered merge list is a complete tokenizer
    * artifact (what you'd actually ship), producing byte-identical output
    * to the vocab-join path on the training corpus.
    */
  def tokenizeByMerges(docs: DataFrame, merges: Seq[(String, String)],
                       marker: Boolean = false): DataFrame = {
    val pre = preTokens(docs)
    // replay the merge fold over DISTINCT words, then join occurrences
    // back — the fold is a merge-count-deep expression chain, so paying it
    // per occurrence instead of per vocab entry multiplied the work by the
    // corpus/vocab ratio (measured 5.9s -> t11-band at sf0.1); the join is
    // the same broadcast vocab-dimension shape as [[symbolStream]]
    val dict = pre.select(col("tok")).distinct()
      .withColumn("ts", symbolizeByMerges(col("tok"), merges, marker))
    val symRows = pre.join(broadcast(dict), "tok")
      .select(col("doc_id"), col("p"),
        posexplode(split(col("ts"), " ")).as(Seq("q", "sym")))
      .localCheckpoint(true)
    docFingerprint(symRows)
  }

  /** t16: train, keep only the merge list, tokenize by replay. */
  def tokenizeViaMergeReplay(docs: DataFrame): DataFrame = {
    val (merges, words) = train(docs)
    words.unpersist()
    tokenizeByMerges(docs, merges.map(m => (m._2, m._3)))
  }

  // -------------------------------------------------------- persistence

  /** Train and persist the tokenizer under `dir`: `dir/merges` (rank, x, y,
    * cnt) and `dir/vocab` (word, freq, syms) — the train-once/apply-anywhere
    * form. [[applyBpe]] with [[loadVocab]] reproduces [[tokenize]] exactly
    * (t14 hash-matches t11); the merge table alone can re-derive the vocab
    * for corpora the trainer never saw (replay the merges in rank order).
    */
  def trainAndSave(docs: DataFrame, dir: String, nMerges: Int = NMerges,
                   marker: Boolean = false): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, words) = trainCore(docs, marker, nMerges, targetVocab = None)
    graft.sources.ModelStore.save(
      merges.toDF("merge_rank", "x", "y", "cnt"), s"$dir/merges")
    // the vocabulary is one row per DISTINCT WORD — it grows with the
    // corpus (unlike the bounded merge table), so it takes the parallel
    // writer; the apply-side broadcast reads it back regardless of layout
    graft.sources.ModelStore.saveLarge(
      words.select(col("word"), col("freq"), col("syms")), s"$dir/vocab")
    // the marker convention is part of the model: apply must pick the
    // matching OOV fallback, so it rides with the artifact
    graft.sources.ModelStore.save(Seq(marker).toDF("marker"), s"$dir/meta")
    words.unpersist()
    ()
  }

  /** The persisted vocabulary (word, freq, syms) — [[applyBpe]]'s input. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, s"$dir/vocab")

  /** The persisted merge table (merge_rank, x, y, cnt). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, s"$dir/merges")

  /** The persisted marker convention. */
  def loadMarker(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    graft.sources.ModelStore.load(spark, s"$dir/meta")
      .collect().head.getBoolean(0)

  /** Tokenize with a PERSISTED tokenizer (t14): identical output to
    * [[tokenize]] when `dir` holds the same corpus's training run, without
    * re-running a single merge round. The saved marker convention selects
    * the matching OOV fallback automatically.
    */
  def tokenizeSaved(docs: DataFrame, dir: String): DataFrame = {
    val spark = docs.sparkSession
    applyBpe(docs, loadVocab(spark, dir), loadMarker(spark, dir))
  }

  // ------------------------------------------------------------ oracle SQL

  /** One CTE block per merge round — p{r} pair counts, b{r} the argmax
    * merge, w{r} the re-symbolized vocabulary (LEFT JOIN ON TRUE so an
    * exhausted corpus degrades to a no-op round exactly like the driver
    * loop's stop). Returns (ctes, final vocab CTE name).
    */
  def sqlTrainCtes(n: Int, marker: Boolean = false): (String, String) = {
    val w0 =
      s"""w0 AS (SELECT word, count(*)::BIGINT AS freq,
         |    ${sqlCharSyms("word", marker)} AS syms
         |  FROM (SELECT unnest(regexp_extract_all(lower(text), '$AlphaWordRe')) AS word
         |        FROM documents)
         |  GROUP BY word)""".stripMargin
    val rounds = (1 to n).map { r =>
      s"""p$r AS (SELECT ss[i] AS x, ss[i + 1] AS y, freq
         |  FROM (SELECT freq, string_split(syms, ' ') AS ss FROM w${r - 1}),
         |    LATERAL unnest(range(1, len(ss))) t(i)),
         |b$r AS (SELECT x, y, sum(freq)::BIGINT AS cnt FROM p$r
         |  GROUP BY x, y ORDER BY cnt DESC, x, y LIMIT 1),
         |w$r AS (SELECT w.word, w.freq,
         |    CASE WHEN b.x IS NULL THEN w.syms ELSE
         |      list_reduce(string_split(w.syms, ' '), (acc, s) -> CASE
         |        WHEN regexp_extract(acc, '[^ ]*$$') = b.x AND s = b.y
         |        THEN substr(acc, 1, length(acc)
         |          - length(regexp_extract(acc, '[^ ]*$$'))) || b.x || b.y
         |        ELSE acc || ' ' || s END)
         |    END AS syms
         |  FROM w${r - 1} w LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    ((w0 +: rounds).mkString(",\n"), s"w$n")
  }

  val sqlLearnedMerges: String = {
    val (ctes, _) = sqlTrainCtes(NMerges)
    val union = (1 to NMerges)
      .map(r => s"SELECT $r AS merge_rank, x, y, cnt FROM b$r").mkString(" UNION ALL ")
    s"""WITH $ctes
       |SELECT merge_rank, x, y, cnt FROM ($union) ORDER BY merge_rank""".stripMargin
  }

  /** The marked learned-merges query (t15): the t10 merge table under the
    * end-of-word-marked symbolization — the merge fold is identical, only
    * w0's initial symbols differ, so the oracle unrolls the same CTEs.
    */
  def learnedMergesMarked(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, words) = trainMarked(docs)
    words.unpersist()
    merges.toDF("merge_rank", "x", "y", "cnt").orderBy(col("merge_rank"))
  }

  val sqlLearnedMergesMarked: String = {
    val (ctes, _) = sqlTrainCtes(NMerges, marker = true)
    val union = (1 to NMerges)
      .map(r => s"SELECT $r AS merge_rank, x, y, cnt FROM b$r").mkString(" UNION ALL ")
    s"""WITH $ctes
       |SELECT merge_rank, x, y, cnt FROM ($union) ORDER BY merge_rank""".stripMargin
  }

  /** Shared apply CTE block (pre-tokens -> symbol stream -> id table);
    * exposes `sy(doc_id, p, q, sym)` and `ids(sym, id)`.
    */
  private def sqlApplyCtes(wN: String): String =
    s"""tk AS (SELECT doc_id,
       |    regexp_extract_all(lower(text), '${TextOps.BpePattern}') AS toks
       |  FROM documents),
       |pre AS (SELECT doc_id, i AS p, toks[i] AS tok
       |  FROM tk, LATERAL unnest(range(1, len(toks) + 1)) t(i)),
       |ws AS (SELECT pre.doc_id, pre.p,
       |    coalesce(v.syms, ${sqlCharSyms("pre.tok")}) AS ts
       |  FROM pre LEFT JOIN $wN v ON v.word = pre.tok),
       |sy AS (SELECT doc_id, p, j AS q, ss[j] AS sym
       |  FROM (SELECT doc_id, p, string_split(ts, ' ') AS ss FROM ws),
       |    LATERAL unnest(range(1, len(ss) + 1)) t(j)),
       |ids AS (SELECT sym, row_number() OVER (ORDER BY sym) AS id
       |  FROM (SELECT DISTINCT sym FROM sy))""".stripMargin

  val sqlVocabulary: String = {
    val (ctes, wN) = sqlTrainCtes(NMerges)
    s"""WITH $ctes,
       |${sqlApplyCtes(wN)}
       |SELECT id, sym FROM ids ORDER BY id""".stripMargin
  }

  val sqlTokenize: String = {
    val (ctes, wN) = sqlTrainCtes(NMerges)
    s"""WITH $ctes,
       |${sqlApplyCtes(wN)}
       |SELECT sy.doc_id, count(*)::BIGINT AS n_bpe,
       |  md5(string_agg(ids.id::VARCHAR, ',' ORDER BY sy.p, sy.q)) AS ids_md5
       |FROM sy JOIN ids USING (sym)
       |GROUP BY sy.doc_id ORDER BY sy.doc_id""".stripMargin
  }

  // ----------------------------------------------------- tokenizer eval

  /** Tokenizer FERTILITY/compression per language (t17) — the standard
    * tokenizer-evaluation table (how SentencePiece/tiktoken teams compare
    * vocabularies): per language, total BPE tokens, total characters,
    * characters per token (compression), and tokens per whitespace word
    * (fertility). A tokenizer trained on a skewed mix shows its bias
    * here — the under-represented language pays more tokens for the same
    * text, which at pretraining scale is budget and context-window tax.
    *
    * Scale shape: the symbol stream is the [[tokenize]] scan (broadcast
    * vocab join, no corpus shuffle); per-doc counts partial-aggregate
    * before the tiny per-language rollup.
    */
  def fertility(docs: DataFrame): DataFrame = {
    val (_, words) = train(docs)
    val perDoc = symbolStream(docs, words)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bpe"))
    val d = docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars"),
      graft.operators.TextOps.nTokens(col("text")).as("n_words"))
    d.join(perDoc, Seq("doc_id"), "left")
      .select(col("lang"), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
        col("n_chars"), col("n_words"))
      .groupBy(col("lang"))
      .agg(sum(col("n_bpe")).as("tokens"),
        sum(col("n_chars")).as("chars"),
        round(sum(col("n_chars")) /
          when(sum(col("n_bpe")) === 0, lit(null)).otherwise(sum(col("n_bpe"))), 4)
          .as("chars_per_token"),
        round(sum(col("n_bpe")) /
          when(sum(col("n_words")) === 0, lit(null)).otherwise(sum(col("n_words"))), 4)
          .as("fertility"))
      .orderBy(col("lang"))
  }

  val sqlFertility: String = {
    val (ctes, wN) = sqlTrainCtes(NMerges)
    s"""WITH $ctes,
       |${sqlApplyCtes(wN)},
       |per AS (SELECT doc_id, count(*)::BIGINT AS n_bpe FROM sy GROUP BY 1),
       |d AS (SELECT doc_id, lang, length(text)::BIGINT AS n_chars,
       |    len(${graft.functions.Portable.sqlTokens("text")})::BIGINT AS n_words
       |  FROM documents)
       |SELECT d.lang, sum(coalesce(per.n_bpe, 0))::BIGINT AS tokens,
       |  sum(d.n_chars)::BIGINT AS chars,
       |  round(sum(d.n_chars) / nullif(sum(coalesce(per.n_bpe, 0)), 0), 4) AS chars_per_token,
       |  round(sum(coalesce(per.n_bpe, 0)) / nullif(sum(d.n_words), 0), 4) AS fertility
       |FROM d LEFT JOIN per USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }
}
