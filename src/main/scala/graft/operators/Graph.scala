package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link analysis over event-derived graphs — the family member next to
  * the dedup chain's connected components (d8): weighted PageRank on the
  * item co-basket graph. Nodes are items, an edge joins two items that
  * share ≥ 2 (user, day) baskets (q27's pair table made symmetric), and
  * rank flows along basket-count weights.
  *
  * Determinism across engines (the q31 floor lesson, applied to an
  * ITERATIVE algorithm): every per-edge contribution is floored to an
  * exact 1e-12 fixed-point BIGINT before the per-node sum, so the only
  * order-sensitive reduction in each round is an INTEGER sum; the rank
  * update is then one identical double expression per node. Round-robin
  * divergence — the reason iterative float algorithms usually can't be
  * oracle-replayed — never gets a toehold.
  *
  * Scale shape: the basket pair join is q27's (fanout bounded by basket
  * size); each of the [[PrIters]] rounds is one equi-join + one
  * partial-aggregated integer sum on the dst key — the standard
  * distributed PageRank round, bounded rounds like the k-means trainer.
  */
object Graph {

  val PrIters = 4
  val PrDamp = 0.85
  /** Fixed-point scale for per-edge contributions. */
  val PrFp = 1000000000000.0

  /** The [[PrIters]] damped rounds shared by q32 and t42: `edges` is a
    * directed (src, dst, w) table (both directions present for an
    * undirected graph); node identity is whatever type the edge keys
    * carry — the rounds are key-type-agnostic. Returns (item, pr).
    */
  private def prRounds(edges0: DataFrame): DataFrame = {
    // the edge table is bounded (co-occurrence pairs above the floor) and
    // every round references it — materialize once or the basket/bigram
    // aggregation re-runs per round (the t43 localCheckpoint lesson)
    val edges = edges0.localCheckpoint(true)
    // ow joins into every round and nodes anchors every round's left
    // join (plus the start vector) — checkpoint both bounded tables so
    // the per-round plan reads stored rows instead of re-aggregating /
    // re-distincting the edge table once per reference
    val Seq(ow, nodes) = graft.functions.Par.run(
      () => edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
        .localCheckpoint(true),
      () => edges.select(col("dst").as("item")).distinct()
        .localCheckpoint(true))
    val nn = nodes.agg(count(lit(1)).as("nn"))
    var pr = nodes.crossJoin(broadcast(nn))
      .select(col("item"), (lit(1.0) / col("nn")).as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = edges
        .join(pr.select(col("item").as("src"), col("pr")), "src")
        .join(ow, "src")
        .select(col("dst"),
          floor(col("pr") * col("w") / col("ow") * lit(PrFp)).cast("long").as("fp"))
        .groupBy(col("dst")).agg(sum(col("fp")).as("fp"))
      pr = nodes.join(contrib.select(col("dst").as("item"), col("fp")), Seq("item"), "left")
        .crossJoin(broadcast(nn))
        .select(col("item"),
          (lit(1.0 - PrDamp) / col("nn") +
            lit(PrDamp) * (coalesce(col("fp"), lit(0L)) / lit(PrFp))).as("pr"))
    }
    pr
  }

  def itemPageRank(events: DataFrame): DataFrame = {
    val bi = events
      .filter(col("ts").isNotNull && col("props").isNotNull)
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull).distinct()
      // both self-join sides read the basket table — checkpoint so the
      // events scan + JSON extraction + distinct run once
      .localCheckpoint(true)
    val pc = bi.as("a").join(bi.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
    val edges = pc.select(col("ia").as("src"), col("ib").as("dst"), col("w"))
      .unionByName(pc.select(col("ib").as("src"), col("ia").as("dst"), col("w")))
    prRounds(edges)
      .select(col("item"), floor(col("pr") * 1000000000).cast("long").as("pr_ppb"))
      .orderBy(col("pr_ppb").desc, col("item"))
  }

  /** The SQL twin of [[prRounds]] — iteration CTEs over `ed`, `ow`,
    * `nodes`, `nn`; shared by the q32 and t42 oracles so the engines'
    * round arithmetic is pinned by one definition.
    */
  private def sqlPrIterCtes: String = {
    val base = (1 - PrDamp).toString // exact shortest-decimal of the double
    (1 to PrIters).map { it =>
      val prev = if (it == 1) "pr0" else s"pr${it - 1}"
      s"""c$it AS (SELECT e.dst,
         |    sum(floor(p.pr * e.w / o.ow * $PrFp))::BIGINT AS fp
         |  FROM ed e JOIN $prev p ON p.item = e.src JOIN ow o ON o.item = e.src
         |  GROUP BY 1),
         |pr$it AS (SELECT n.item,
         |    $base / nn.nn + $PrDamp * (coalesce(c$it.fp, 0) / $PrFp) AS pr
         |  FROM nodes n LEFT JOIN c$it ON c$it.dst = n.item, nn)""".stripMargin
    }.mkString(",\n")
  }

  /** Oracle for [[itemPageRank]]: the identical rounds unrolled as CTEs —
    * same floor-fixed-point contributions, same integer sums, same double
    * update expression with the Scala-printed damping literals.
    */
  def sqlItemPageRank: String = {
    val iters = sqlPrIterCtes
    s"""WITH bi AS (SELECT DISTINCT user_id,
       |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |    json_extract(props, '$$.k')::INT AS item
       |  FROM events WHERE ts IS NOT NULL AND props IS NOT NULL
       |    AND json_extract(props, '$$.k') IS NOT NULL),
       |pc AS (SELECT a.item AS ia, b.item AS ib, count(*)::BIGINT AS w
       |  FROM bi a JOIN bi b ON a.user_id = b.user_id AND a.day = b.day
       |    AND a.item < b.item
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |ed AS (SELECT ia AS src, ib AS dst, w FROM pc
       |  UNION ALL SELECT ib, ia, w FROM pc),
       |ow AS (SELECT src AS item, sum(w)::BIGINT AS ow FROM ed GROUP BY 1),
       |nodes AS (SELECT DISTINCT dst AS item FROM ed),
       |nn AS (SELECT count(*)::BIGINT AS nn FROM nodes),
       |pr0 AS (SELECT item, 1.0 / nn.nn AS pr FROM nodes, nn),
       |$iters
       |SELECT item, floor(pr * 1000000000)::BIGINT AS pr_ppb
       |FROM pr$PrIters ORDER BY pr_ppb DESC, item""".stripMargin
  }

  // ------------------------------------------- TextRank keywords (t42)

  /** Adjacency-bigram edges repeated fewer times than this are noise, not
    * graph structure (the t39 collocation floor applied to ranking).
    */
  val TrMinEdge = 5

  /** Keywords emitted by [[textRank]]. */
  val TrTopK = 20

  /** TextRank keyword extraction (t42, Mihalcea & Tarau 2004): PageRank
    * over the corpus token-adjacency graph — nodes are tokens, an
    * undirected edge joins tokens that appear adjacent ≥ [[TrMinEdge]]
    * times (t39's bigram stream turned into graph structure), rank flows
    * along co-occurrence weights through [[prRounds]], the SAME damped
    * fixed-point rounds q32 runs over the item graph. The top-[[TrTopK]]
    * tokens by rank are the corpus keywords — the graph-centrality
    * alternative to t5's TF-IDF and t36's RAKE scores: a token matters
    * because well-connected tokens keep linking to it, not because it is
    * merely frequent.
    *
    * Scale shape: bigram extraction is one linear pass (the materialized
    * token array, the t39/r10 lesson); the edge aggregate keys on token
    * pairs (vocabulary-bounded, not corpus-bounded); each rank round is
    * one equi-join + partial-aggregated integer sum over the bounded
    * edge table.
    */
  def textRank(docs: DataFrame): DataFrame = {
    val tk = docs.select(graft.functions.Portable.tokens(col("text")).as("toks"))
    val toks = col("toks")
    val bi = tk
      .select(explode(when(size(toks) > 1,
        transform(sequence(lit(1), size(toks) - 1),
          j => concat_ws(" ", element_at(toks, j), element_at(toks, (j + 1).cast("int")))))
        .otherwise(array().cast("array<string>")))
        .as("pair"))
      .select(split_part(col("pair"), lit(" "), lit(1)).as("a"),
        split_part(col("pair"), lit(" "), lit(2)).as("b"))
      .filter(col("a") =!= col("b"))
    val und = bi
      .select(least(col("a"), col("b")).as("ia"), greatest(col("a"), col("b")).as("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= TrMinEdge)
    val edges = und.select(col("ia").as("src"), col("ib").as("dst"), col("w"))
      .unionByName(und.select(col("ib").as("src"), col("ia").as("dst"), col("w")))
    val scored = prRounds(edges)
      .select(col("item").as("token"),
        floor(col("pr") * 1000000000).cast("long").as("pr_ppb"))
    // top-K via orderBy+limit (TakeOrderedAndProject — the c10/q38
    // idiom): the cut happens map-side; the rank window runs over the
    // K surviving rows, never the full token-centrality table
    val top = scored.orderBy(col("pr_ppb").desc, col("token")).limit(TrTopK)
    val w = Window.orderBy(col("pr_ppb").desc, col("token"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col("token"), col("pr_ppb"))
      .orderBy(col("rnk"))
  }

  // --------------------------------- Markov removal-effect attribution (w31)

  /** Absorbing-chain iteration depth: P(convert within [[MkIters]] steps)
    * is the estimator both engines compute — identical truncation, no
    * linear solve to replay.
    */
  val MkIters = 12

  /** MARKOV ATTRIBUTION (w31): the probabilistic counterpart of w25's
    * linear multi-touch. Each (user, day) is a journey: the day's event
    * types in time order, truncated at the first purchase; journeys end
    * in the absorbing `conv` state (day converted) or `drop`. Transition
    * counts over all journeys define a Markov chain; a channel's REMOVAL
    * EFFECT is how much the chain's start→conv absorption probability
    * falls when every transition touching that channel is deleted (mass
    * into a removed channel is lost, not rerouted — the standard
    * formulation), and credit shares normalize the removal effects.
    * Answers what last-touch and linear splits cannot: how much
    * conversion a channel CAUSES, counting its mid-path feeder role.
    *
    * Determinism: absorption is computed as the K-step conversion
    * probability with per-term floors to 1e-12 fixed point (the q32/t42
    * integer-sum trick), so the only order-sensitive reduction per round
    * is an integer sum; removal and credit shares are integer arithmetic
    * over the ppb fixed-points.
    *
    * Scale shape: one corpus-sized window (per user-day event order) and
    * one aggregate to per-journey state arrays; everything after runs on
    * the (states × states) transition table — a few dozen rows — so the
    * K rounds × (channels + 1) scenarios are joins over tiny bounded
    * tables, never the corpus.
    */
  /** Per (user, day) journey: the day's event types in time order,
    * truncated at the first purchase, plus the conversion flag — the
    * shared construction of [[markovAttribution]] and [[topPaths]].
    */
  private def journeys(events: DataFrame): DataFrame = {
    val ev = events.filter(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("e"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("e"), col("event_id"))
    val idxd = ev.withColumn("idx", row_number().over(w))
    idxd.groupBy(col("user_id"), col("day"))
      .agg(array_sort(collect_list(struct(col("idx"), col("event_type")))).as("all"),
        min(when(col("event_type") === "purchase", col("idx"))).as("pidx"))
      .select(
        transform(filter(col("all"),
          x => col("pidx").isNull || x("idx") < col("pidx")),
          x => x("event_type")).as("seq"),
        col("pidx").isNotNull.as("conv"))
  }

  def markovAttribution(events: DataFrame): DataFrame = {
    val fp = PrFp
    val states = journeys(events).select(concat(
        array(lit("start")),
        col("seq"),
        array(when(col("conv"), lit("conv")).otherwise(lit("drop"))))
      .as("stt"))
    val trans = states
      .select(explode(transform(sequence(lit(1), size(col("stt")) - 1),
        j => concat_ws(">", element_at(col("stt"), j),
          element_at(col("stt"), (j + 1).cast("int"))))).as("pair"))
      .select(split_part(col("pair"), lit(">"), lit(1)).as("s"),
        split_part(col("pair"), lit(">"), lit(2)).as("t"))
      .groupBy(col("s"), col("t")).agg(count(lit(1)).as("cnt"))
    // the chain itself is BOUNDED BY CONSTRUCTION — (event-type alphabet
    // + start/conv/drop)² rows — so the K rounds × scenarios run on the
    // driver (the IRLS/c1 pattern: distributed work ends at the tiny
    // aggregate, the oracle replays the identical IEEE sequence); the
    // first distributed form of this spent 12 s building 60 joins of
    // 30-row tables
    val cnt = trans.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tot = cnt.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._3).sum }
    val chans = cnt.map(_._1).distinct.filter(_ != "start").sorted
    def pconv(removed: Option[String]): Double = {
      val kept = cnt.filter { case (s, t, _) =>
        removed.forall(ch => s != ch && t != ch) }
      var p = Map("conv" -> 1.0)
      for (_ <- 1 to MkIters) {
        val fps = kept.toSeq.flatMap { case (s, t, c) =>
          p.get(t).map(pt =>
            s -> math.floor(c * pt / tot(s) * fp).toLong)
        }.groupBy(_._1).map { case (s, terms) => s -> terms.map(_._2).sum }
        p = fps.map { case (s, v) => s -> v / fp } - "conv" + ("conv" -> 1.0)
      }
      p.getOrElse("start", 0.0)
    }
    val pb = math.floor(pconv(None) * 1000000000).toLong
    val rows = chans.map { ch =>
      val pr = math.floor(pconv(Some(ch)) * 1000000000).toLong
      // pb == 0 (journeys but zero conversions within MkIters steps):
      // removal effect is undefined — emit 0, mirrored in the oracle's
      // CASE, instead of NaN.toLong (here) / division-by-zero (DuckDB)
      val removal =
        if (pb > 0) math.floor((pb - pr) * 1000000.0 / pb).toLong else 0L
      (ch, pr, removal)
    }
    val trm = rows.map(_._3).sum
    val out = rows.map { case (ch, pr, removal) =>
      val credit =
        if (trm > 0) math.floor(removal * 1000000.0 / trm).toLong else 0L
      (ch, pr, removal, credit)
    }
    val spark = events.sparkSession
    import spark.implicits._
    out.toSeq.toDF("channel", "pconv_ppb", "removal_ppm", "credit_ppm")
      .orderBy(col("channel"))
  }

  /** Paths reported by [[topPaths]]. */
  val PathTopK = 20

  /** TOP CONVERSION PATHS (q37): the journey table [[markovAttribution]]
    * models, reported raw — each distinct pre-purchase event-type path
    * with its traffic, conversions and conversion rate, top
    * [[PathTopK]] by traffic. The path-level view w31's chain
    * abstraction aggregates away: WHICH exact sequences convert.
    *
    * Scale shape: the one corpus window + per-journey aggregate shared
    * with w31, then a groupBy on the bounded path-string domain and a
    * TakeOrdered top-K.
    */
  def topPaths(events: DataFrame): DataFrame = {
    val per = journeys(events)
      .select(concat_ws(">", col("seq")).as("path"), col("conv"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("conv"), 1L).otherwise(0L)).as("n_conv"))
      .withColumn("cvr_ppm", expr("n_conv * 1000000 div n"))
    val top = per.orderBy(col("n").desc, col("path")).limit(PathTopK)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("path"))))
      .select(col("rnk"), col("path"), col("n"), col("n_conv"), col("cvr_ppm"))
      .orderBy(col("rnk"))
  }

  /** Oracle for [[topPaths]]: the w31 journey CTEs, string-joined paths,
    * integer conversion rate and the same top-K tie-breaks.
    */
  val sqlTopPaths: String =
    s"""WITH ev AS (SELECT user_id, ts::DATE AS day, epoch_us(ts) AS e,
       |    event_id, event_type
       |  FROM events WHERE ts IS NOT NULL),
       |idxd AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
       |    ORDER BY e, event_id) AS idx FROM ev),
       |days AS (SELECT user_id, day,
       |    min(CASE WHEN event_type = 'purchase' THEN idx END) AS pidx
       |  FROM idxd GROUP BY 1, 2),
       |seqs AS (SELECT i.user_id, i.day,
       |    list(i.event_type ORDER BY i.idx) AS sq
       |  FROM idxd i JOIN days dd ON i.user_id = dd.user_id AND i.day = dd.day
       |  WHERE dd.pidx IS NULL OR i.idx < dd.pidx GROUP BY 1, 2),
       |jt AS (SELECT coalesce(array_to_string(s.sq, '>'), '') AS path,
       |    d.pidx IS NOT NULL AS conv
       |  FROM days d LEFT JOIN seqs s ON s.user_id = d.user_id AND s.day = d.day),
       |per AS (SELECT path, count(*)::BIGINT AS n,
       |    sum(CASE WHEN conv THEN 1 ELSE 0 END)::BIGINT AS n_conv
       |  FROM jt GROUP BY 1)
       |SELECT rnk, path, n, n_conv, cvr_ppm FROM (
       |  SELECT path, n, n_conv, (n_conv * 1000000) // n AS cvr_ppm,
       |    row_number() OVER (ORDER BY n DESC, path) AS rnk
       |  FROM per) WHERE rnk <= $PathTopK
       |ORDER BY rnk""".stripMargin

  /** Oracle for [[markovAttribution]]: same journey construction, same
    * K unrolled fixed-point rounds per scenario, same integer credit
    * arithmetic.
    */
  def sqlMarkovAttribution: String = {
    val fp = PrFp
    val rounds = (1 to MkIters).map { it =>
      val prev = if (it == 1) "p0" else s"p${it - 1}"
      s"""p$it AS (
         |  SELECT * FROM (
         |    SELECT s.ch, s.s AS state,
         |      sum(floor(s.cnt * p.p / s.tot * $fp))::BIGINT / $fp AS p
         |    FROM sct s JOIN $prev p ON p.ch = s.ch AND p.state = s.t
         |    GROUP BY 1, 2) WHERE state != 'conv'
         |  UNION ALL SELECT ch, 'conv', 1.0 FROM scen)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, ts::DATE AS day, epoch_us(ts) AS e,
       |    event_id, event_type
       |  FROM events WHERE ts IS NOT NULL),
       |idxd AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
       |    ORDER BY e, event_id) AS idx FROM ev),
       |days AS (SELECT user_id, day,
       |    min(CASE WHEN event_type = 'purchase' THEN idx END) AS pidx
       |  FROM idxd GROUP BY 1, 2),
       |seqs AS (SELECT i.user_id, i.day,
       |    list(i.event_type ORDER BY i.idx) AS sq
       |  FROM idxd i JOIN days dd ON i.user_id = dd.user_id AND i.day = dd.day
       |  WHERE dd.pidx IS NULL OR i.idx < dd.pidx GROUP BY 1, 2),
       |st AS (SELECT ['start'] || coalesce(s.sq, [])
       |    || [CASE WHEN d.pidx IS NOT NULL THEN 'conv' ELSE 'drop' END] AS stt
       |  FROM days d LEFT JOIN seqs s ON s.user_id = d.user_id AND s.day = d.day),
       |tr AS (SELECT unnest(list_transform(range(1, len(stt)),
       |    j -> stt[j] || '>' || stt[j + 1])) AS pair FROM st),
       |cnt AS (SELECT split_part(pair, '>', 1) AS s, split_part(pair, '>', 2) AS t,
       |    count(*)::BIGINT AS cnt FROM tr GROUP BY 1, 2),
       |tot AS (SELECT s, sum(cnt)::BIGINT AS tot FROM cnt GROUP BY 1),
       |chans AS (SELECT DISTINCT s AS ch FROM cnt WHERE s != 'start'),
       |scen AS (SELECT ch FROM chans UNION ALL SELECT '_base'),
       |sct AS (SELECT sc.ch, c.s, c.t, c.cnt, tot.tot
       |  FROM cnt c CROSS JOIN scen sc JOIN tot ON tot.s = c.s
       |  WHERE sc.ch = '_base' OR (c.s != sc.ch AND c.t != sc.ch)),
       |p0 AS (SELECT ch, 'conv' AS state, 1.0 AS p FROM scen),
       |$rounds,
       |ps AS (SELECT scen.ch,
       |    floor(coalesce(pk.p, 0.0) * 1000000000)::BIGINT AS pconv_ppb
       |  FROM scen LEFT JOIN (SELECT ch, p FROM p$MkIters WHERE state = 'start') pk
       |    ON pk.ch = scen.ch),
       |base AS (SELECT pconv_ppb AS pb FROM ps WHERE ch = '_base'),
       |rem AS (SELECT ch AS channel, pconv_ppb,
       |    CASE WHEN base.pb > 0
       |      THEN floor((base.pb - pconv_ppb) * 1000000.0 / base.pb)::BIGINT
       |      ELSE 0 END AS removal_ppm
       |  FROM ps, base WHERE ch != '_base'),
       |trm AS (SELECT sum(removal_ppm)::BIGINT AS trm FROM rem)
       |SELECT channel, pconv_ppb, removal_ppm,
       |  CASE WHEN trm.trm > 0
       |    THEN floor(removal_ppm * 1000000.0 / trm.trm)::BIGINT
       |    ELSE 0 END AS credit_ppm
       |FROM rem, trm ORDER BY channel""".stripMargin
  }

  /** Oracle for [[textRank]]: t39's bigram CTE, the undirected edge
    * canonicalization, then [[sqlPrIterCtes]] verbatim.
    */
  def sqlTextRank: String = {
    val toks = graft.functions.Portable.sqlTokens("text")
    val iters = sqlPrIterCtes
    s"""WITH tk AS (SELECT $toks AS toks FROM documents),
       |pairs AS (SELECT unnest(list_transform(range(1, len(toks)),
       |    j -> toks[j] || ' ' || toks[j + 1])) AS pair FROM tk),
       |ab AS (SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
       |  FROM pairs WHERE split_part(pair, ' ', 1) != split_part(pair, ' ', 2)),
       |und AS (SELECT least(a, b) AS ia, greatest(a, b) AS ib,
       |    count(*)::BIGINT AS w
       |  FROM ab GROUP BY 1, 2 HAVING count(*) >= $TrMinEdge),
       |ed AS (SELECT ia AS src, ib AS dst, w FROM und
       |  UNION ALL SELECT ib, ia, w FROM und),
       |ow AS (SELECT src AS item, sum(w)::BIGINT AS ow FROM ed GROUP BY 1),
       |nodes AS (SELECT DISTINCT dst AS item FROM ed),
       |nn AS (SELECT count(*)::BIGINT AS nn FROM nodes),
       |pr0 AS (SELECT item, 1.0 / nn.nn AS pr FROM nodes, nn),
       |$iters,
       |scored AS (SELECT item AS token,
       |    floor(pr * 1000000000)::BIGINT AS pr_ppb FROM pr$PrIters)
       |SELECT rnk, token, pr_ppb FROM (
       |  SELECT token, pr_ppb,
       |    row_number() OVER (ORDER BY pr_ppb DESC, token) AS rnk
       |  FROM scored) WHERE rnk <= $TrTopK
       |ORDER BY rnk""".stripMargin
  }
}
