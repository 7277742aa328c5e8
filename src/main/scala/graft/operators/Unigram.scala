package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UNIGRAM-LM TOKENIZER (t43, the hard-EM variant of Kudo 2018 /
  * SentencePiece-unigram): the missing member of the tokenizer family —
  * BPE (t10–t17) grows a vocabulary bottom-up by merges; the unigram
  * model starts from a LARGE substring candidate set and lets EM shrink
  * it, segmenting each word by the maximum-likelihood piece sequence.
  * Training pipeline: substring candidate counts → top-K vocabulary
  * (single characters always kept, add-one floored, so every word stays
  * segmentable) → [[UniRounds]] rounds of (Viterbi E-step, count M-step).
  *
  * Determinism (the whole point of the design): piece scores are
  * ln-probabilities FLOORED TO 1e-9 FIXED-POINT LONGS, so the Viterbi DP
  * compares and adds only integers — the argmax (best score, then larger
  * split point) is exact in both engines, segmentations match piece for
  * piece, and every emitted count is an integer. The one float op per
  * piece per round (the ln) happens once, outside the DP.
  *
  * Scale shape (the BPE lesson): all per-word work — DP and backwalk —
  * is a FOLD over the distinct-word table with the piece scores riding
  * along as one bounded map column (vocabulary is top-K + alphabet by
  * construction); corpus-sized data is touched once to build word
  * counts. No join, no shuffle inside a round except the bounded piece
  * count aggregate.
  */
object Unigram {

  /** Longest multi-character piece considered. */
  val MaxPieceLen = 4

  /** Words are truncated to this many characters before training — the
    * DP depth bound (and the unroll depth of the oracle's CTE chain).
    */
  val MaxWordLen = 12

  /** Multi-char candidate pieces kept (plus the whole alphabet). */
  val VocabTopK = 256

  /** Viterbi-EM rounds (E: segment, M: re-count). */
  val UniRounds = 2

  /** Fixed-point scale for ln-probability scores. */
  val ScoreFp = 1000000000.0

  /** Pieces reported. */
  val TopOut = 30

  // ------------------------------------------------------------ Spark side

  /** Distinct truncated words with corpus counts. */
  private def words(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.Portable.tokens(col("text"))).as("t"))
      .select(substring(col("t"), 1, MaxWordLen).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** All substring occurrences (length 1..[[MaxPieceLen]]) weighted by
    * word count — the candidate statistics EM starts from.
    */
  private def cnt0(wrds: DataFrame): DataFrame =
    wrds.select(col("c"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1),
            least(lit(MaxPieceLen), length(col("w")) - i + 1)), l =>
            col("w").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))

  /** Vocabulary with scores from a count table: top-[[VocabTopK]] pieces
    * by (cnt, piece) UNION the whole ROUND-0 ALPHABET (add-one floored —
    * a character dropped by an E-step must stay scoreable or some word
    * becomes unsegmentable in the next round); score =
    * floor(ln(cnt/total) * [[ScoreFp]]) as LONG.
    */
  private def scored(counts: DataFrame, alpha: DataFrame): DataFrame = {
    val top = counts.orderBy(col("cnt").desc, col("piece")).limit(VocabTopK)
    val chars = alpha.join(counts, Seq("piece"), "left")
      .select(col("piece"), greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
    val vocab = top.unionByName(chars)
      .groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"),
        floor(log(col("cnt").cast("double") / col("tot")) * lit(ScoreFp))
          .cast("long").as("score"))
  }

  /** One E-step: Viterbi-segment every distinct word under the score map
    * and return the piece counts (piece occurrences × word count).
    * The DP and backwalk are two folds per row; `scores` rides along as
    * a single bounded map column.
    */
  private def eStep(wrds: DataFrame, scores: DataFrame): DataFrame =
    segmented(wrds, scores)
      .select(col("c"), explode(col("ps")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))

  /** Viterbi segmentation of every distinct word: (w, c, ps) with `ps`
    * the maximum-likelihood piece sequence (reverse order — counts and
    * sizes don't care).
    */
  private def segmented(wrds: DataFrame, scores: DataFrame): DataFrame = {
    val smapRow = scores
      .agg(map_from_entries(collect_list(struct(col("piece"), col("score"))))
        .as("smap"))
      .withColumn("one", lit(1))
    val withMap = wrds.withColumn("one", lit(1)).join(broadcast(smapRow), "one")
    // dp: array of struct(sc, ptr); dp(j) lives at element j+1.
    // At position i the candidates are j in [max(0, i-MaxPieceLen), i-1]
    // with piece w[j+1..i] in the vocabulary; argmax by (sc, j) via
    // array_max's struct ordering — ties pick the larger j (shortest
    // last piece), identically in the oracle.
    val dp = aggregate(
      sequence(lit(1), length(col("w"))),
      array(struct(lit(0L).as("sc"), lit(-1).as("ptr"))),
      (acc, i) => {
        val cands = filter(
          transform(sequence(greatest(lit(0), i - MaxPieceLen), i - 1), j =>
            struct(
              (element_at(acc, (j + 1).cast("int"))("sc") +
                element_at(col("smap"), col("w").substr(j + 1, i - j))).as("sc"),
              j.cast("int").as("ptr"))),
          c => c("sc").isNotNull)
        concat(acc, array(array_max(cands)))
      })
    // backwalk: from pos = len(w), hop ptrs, emitting one piece per hop;
    // at most len(w) hops (each consumes >= 1 char)
    val walked = withMap.withColumn("dp", dp)
      .withColumn("ps", aggregate(
        sequence(lit(1), length(col("w"))),
        struct(length(col("w")).cast("int").as("pos"),
          array().cast("array<string>").as("acc")),
        (st, _) => {
          val pos = st("pos")
          val j = element_at(col("dp"), pos + 1)("ptr")
          when(pos > 0, struct(
            j.as("pos"),
            concat(st("acc"),
              array(col("w").substr(j + 1, pos - j))).as("acc")))
            .otherwise(st)
        })("acc"))
    walked.select(col("w"), col("c"), col("ps"))
  }

  /** The post-EM model: piece scores after [[UniRounds]] rounds — the
    * saveable tokenizer (piece, score BIGINT fixed-point ln-prob).
    */
  private def trainScores(docs: DataFrame): DataFrame = {
    val wrds = words(docs).localCheckpoint(true)
    var counts = cnt0(wrds).localCheckpoint(true)
    val alpha = counts.filter(length(col("piece")) === 1).select(col("piece"))
    for (_ <- 1 to UniRounds)
      counts = eStep(wrds, scored(counts, alpha)).localCheckpoint(true)
    scored(counts, alpha)
  }

  /** Train the unigram tokenizer and persist it — the t14/t21 artifact
    * convention: the model (a few hundred LONG-scored pieces) ships to
    * wherever text needs tokenizing; scores are integers, so the
    * round trip is bit-exact by construction.
    */
  def trainAndSaveUnigram(docs: DataFrame, dir: String): DataFrame = {
    val m = trainScores(docs)
    graft.sources.ModelStore.save(m, dir)
    m
  }

  def loadUnigram(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.ModelStore.load(spark, dir)

  /** TOKENIZER FERTILITY under a TRAINED unigram model (t44, the t17
    * twin): per document, words / pieces / integer pieces-per-word —
    * the compression metric tokenizer choices are graded by, computed
    * on text the model never saw (train on the first 4/5, score all).
    * One corpus pass to (doc, word) pairs; the DP fold runs once per
    * DISTINCT word and joins back — the BPE apply shape.
    */
  def unigramFertility(docs: DataFrame, model: DataFrame): DataFrame = {
    val dw = docs
      .select(col("doc_id"), explode(graft.functions.Portable.tokens(col("text"))).as("t"))
      .select(col("doc_id"), substring(col("t"), 1, MaxWordLen).as("w"))
      .filter(length(col("w")) > 0)
    val wrds = dw.groupBy(col("w")).agg(count(lit(1)).as("c"))
    // UNK closure: a held-out word can contain a character the trained
    // vocabulary never saw; without a score the DP has no candidate at
    // that position (null segmentation here, a dropped word in the
    // oracle's inner join). Augment the model with every corpus
    // character absent from it, scored one nat below the rarest trained
    // piece — both engines apply the identical closure, so every word
    // stays segmentable and segmentations still match piece for piece.
    val unk = model.agg((min(col("score")) - ScoreFp.toLong).as("score"))
    val corpusChars = wrds
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("piece"))
      .distinct()
    val fullModel = model.unionByName(
      corpusChars.join(model, Seq("piece"), "left_anti")
        .crossJoin(broadcast(unk)))
    val wp = segmented(wrds, fullModel)
      .select(col("w"), size(col("ps")).cast("long").as("np"))
    dw.join(wp, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        expr("n_pieces * 1000000 div n_words").as("ppw_ppm"))
      .orderBy(col("doc_id"))
  }

  def unigramVocab(docs: DataFrame): DataFrame = {
    // every intermediate is vocabulary-bounded; materialize each once
    // (the kmeansModel precedent) — a lazy chain would re-execute round
    // r-1 for every one of round r's references to it
    val wrds = words(docs).localCheckpoint(true)
    var counts = cnt0(wrds).localCheckpoint(true)
    val alpha = counts.filter(length(col("piece")) === 1).select(col("piece"))
    for (_ <- 1 to UniRounds)
      counts = eStep(wrds, scored(counts, alpha)).localCheckpoint(true)
    val tot = counts.agg(sum(col("cnt")).as("tot"))
    val top = counts.orderBy(col("cnt").desc, col("piece")).limit(TopOut)
    top.crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece"))))
      .select(col("rnk"), col("piece"), col("cnt"),
        expr("cnt * 1000000000 div tot").as("p_ppb"))
      .orderBy(col("rnk"))
  }

  // ----------------------------------------------------------- oracle side

  /** Piece-count CTE from substring occurrences; exposes `<tag>cnt`. */
  private def sqlCnt0(tag: String, wt: String = "wrds"): String =
    s"""${tag}cnt AS MATERIALIZED (SELECT substr(w, i, l) AS piece, sum(c)::BIGINT AS cnt
       |  FROM $wt,
       |    LATERAL unnest(range(1, len(w) + 1)) t1(i),
       |    LATERAL unnest(range(1, least($MaxPieceLen, len(w) - i + 1) + 1)) t2(l)
       |  GROUP BY 1)""".stripMargin

  /** Vocabulary scoring CTEs over `<in>` counts; exposes `<tag>sc`
    * (piece, score BIGINT).
    */
  private def sqlScored(tag: String, in: String): String =
    s"""${tag}top AS (SELECT piece, cnt FROM $in
       |  ORDER BY cnt DESC, piece LIMIT $VocabTopK),
       |${tag}chr AS (SELECT a.piece, greatest(coalesce(c.cnt, 0), 1) AS cnt
       |  FROM alpha a LEFT JOIN $in c ON c.piece = a.piece),
       |${tag}voc AS (SELECT piece, max(cnt) AS cnt FROM
       |  (SELECT * FROM ${tag}top UNION ALL SELECT * FROM ${tag}chr)
       |  GROUP BY 1),
       |${tag}tot AS (SELECT sum(cnt) AS tot FROM ${tag}voc),
       |${tag}sc AS MATERIALIZED (SELECT piece,
       |    floor(ln(cnt::DOUBLE / tot) * ${ScoreFp})::BIGINT AS score
       |  FROM ${tag}voc, ${tag}tot)""".stripMargin

  /** One unrolled E-step over `wrds` with scores `<sc>`; exposes
    * `<tag>out` (piece, cnt). DP CTEs dp1..dp[[MaxWordLen]] (per-word
    * argmax via QUALIFY with the same (sc, j) tie-break), one choice
    * table, then an unrolled backwalk emitting one piece per hop.
    */
  private def sqlEStep(tag: String, sc: String, wt: String = "wrds"): String = {
    val dps = (1 to MaxWordLen).map { i =>
      val js = (math.max(0, i - MaxPieceLen) until i).map { j =>
        val prev = if (j == 0) s"(SELECT w, 0::BIGINT AS sc FROM $wt)"
        else s"${tag}dp$j"
        s"""SELECT d.w, d.sc + s.score AS sc, $j AS j
           |    FROM $prev d JOIN ${sc} s
           |      ON s.piece = substr(d.w, ${j + 1}, ${i - j})
           |    WHERE len(d.w) >= $i""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""${tag}dp$i AS MATERIALIZED (
         |  SELECT w, sc, j FROM (
         |  $js
         |  ) QUALIFY row_number() OVER (PARTITION BY w ORDER BY sc DESC, j DESC) = 1)"""
        .stripMargin
    }.mkString(",\n")
    val choices = (1 to MaxWordLen)
      .map(i => s"SELECT w, $i AS i, j FROM ${tag}dp$i")
      .mkString("\n  UNION ALL\n  ")
    val bws = (1 to MaxWordLen).map { k =>
      val prev = if (k == 1) s"(SELECT w, len(w)::INT AS pos FROM $wt)"
      else s"(SELECT w, pos FROM ${tag}bw${k - 1})"
      s"""${tag}bw$k AS MATERIALIZED (
         |  SELECT b.w, d.j AS pos, substr(b.w, d.j + 1, b.pos - d.j) AS piece
         |  FROM $prev b JOIN ${tag}ch d ON d.w = b.w AND d.i = b.pos
         |  WHERE b.pos > 0)""".stripMargin
    }.mkString(",\n")
    val allPieces = (1 to MaxWordLen)
      .map(k => s"SELECT w, piece FROM ${tag}bw$k").mkString("\n  UNION ALL\n  ")
    s"""$dps,
       |${tag}ch AS MATERIALIZED (
       |  $choices),
       |$bws,
       |${tag}wp AS MATERIALIZED (SELECT w, count(*)::BIGINT AS np FROM (
       |  $allPieces
       |  ) GROUP BY 1),
       |${tag}out AS MATERIALIZED (SELECT p.piece, sum(wr.c)::BIGINT AS cnt
       |  FROM (
       |  $allPieces
       |  ) p JOIN $wt wr ON wr.w = p.w
       |  GROUP BY 1)""".stripMargin
  }

  /** Oracle for [[unigramVocab]]: the identical candidate counts,
    * floored-ln scoring and unrolled integer Viterbi rounds.
    */
  def sqlUnigramVocab: String = {
    val toks = graft.functions.Portable.sqlTokens("text")
    val rounds = (1 to UniRounds).map { r =>
      val in = if (r == 1) "r0cnt" else s"r${r - 1}out"
      s"${sqlScored(s"r$r", in)},\n${sqlEStep(s"r$r", s"r${r}sc")}"
    }.mkString(",\n")
    val last = s"r${UniRounds}out"
    s"""WITH toks AS (SELECT unnest($toks) AS t FROM documents),
       |wrds AS MATERIALIZED (SELECT substr(t, 1, $MaxWordLen) AS w, count(*)::BIGINT AS c
       |  FROM toks WHERE length(substr(t, 1, $MaxWordLen)) > 0 GROUP BY 1),
       |${sqlCnt0("r0")},
       |alpha AS (SELECT piece FROM r0cnt WHERE length(piece) = 1),
       |$rounds,
       |ftot AS (SELECT sum(cnt)::BIGINT AS tot FROM $last)
       |SELECT rnk, piece, cnt, ((cnt * 1000000000) // tot)::BIGINT AS p_ppb
       |FROM (SELECT piece, cnt, tot,
       |    row_number() OVER (ORDER BY cnt DESC, piece) AS rnk
       |  FROM $last, ftot)
       |WHERE rnk <= $TopOut ORDER BY rnk""".stripMargin
  }

  /** Oracle for [[unigramFertility]] over a model trained on the first
    * 4/5 of the corpus: replays the training rounds on the slice, the
    * final scoring, then one apply E-step over the FULL corpus's words.
    */
  def sqlUnigramFertility: String = {
    val toks = graft.functions.Portable.sqlTokens("text")
    val rounds = (1 to UniRounds).map { r =>
      val in = if (r == 1) "r0cnt" else s"r${r - 1}out"
      s"${sqlScored(s"r$r", in)},\n${sqlEStep(s"r$r", s"r${r}sc", "trwrds")}"
    }.mkString(",\n")
    s"""WITH cn AS (SELECT (count(*) * 4) // 5 AS cnt FROM documents),
       |trtoks AS (SELECT unnest($toks) AS t FROM documents d, cn
       |  WHERE d.doc_id < cn.cnt),
       |trwrds AS MATERIALIZED (SELECT substr(t, 1, $MaxWordLen) AS w,
       |    count(*)::BIGINT AS c
       |  FROM trtoks WHERE length(substr(t, 1, $MaxWordLen)) > 0 GROUP BY 1),
       |${sqlCnt0("r0", "trwrds")},
       |alpha AS (SELECT piece FROM r0cnt WHERE length(piece) = 1),
       |$rounds,
       |${sqlScored("f", s"r${UniRounds}out")},
       |dw AS MATERIALIZED (SELECT doc_id, substr(t, 1, $MaxWordLen) AS w FROM
       |  (SELECT doc_id, unnest($toks) AS t FROM documents)
       |  WHERE length(substr(t, 1, $MaxWordLen)) > 0),
       |wrds AS MATERIALIZED (SELECT w, count(*)::BIGINT AS c FROM dw GROUP BY 1),
       |unkv AS (SELECT min(score) - 1000000000 AS score FROM fsc),
       |unkch AS (SELECT DISTINCT substr(w, i, 1) AS piece
       |  FROM wrds, LATERAL unnest(range(1, len(w) + 1)) t(i)),
       |apsc AS MATERIALIZED (SELECT piece, score FROM fsc
       |  UNION ALL
       |  SELECT c.piece, u.score FROM unkch c, unkv u
       |  WHERE c.piece NOT IN (SELECT piece FROM fsc)),
       |${sqlEStep("ap", "apsc", "wrds")}
       |SELECT d.doc_id, count(*)::BIGINT AS n_words,
       |  sum(wp.np)::BIGINT AS n_pieces,
       |  ((sum(wp.np) * 1000000) // count(*))::BIGINT AS ppw_ppm
       |FROM dw d JOIN apwp wp ON wp.w = d.w
       |GROUP BY 1 ORDER BY d.doc_id""".stripMargin
  }
}
