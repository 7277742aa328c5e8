package graft.operators

import org.apache.spark.sql.DataFrame
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

  def itemPageRank(events: DataFrame): DataFrame = {
    val bi = events
      .filter(col("ts").isNotNull && col("props").isNotNull)
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull).distinct()
    val pc = bi.as("a").join(bi.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
    val edges = pc.select(col("ia").as("src"), col("ib").as("dst"), col("w"))
      .unionByName(pc.select(col("ib").as("src"), col("ia").as("dst"), col("w")))
    val ow = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val nodes = edges.select(col("dst").as("item")).distinct()
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
    pr.select(col("item"), floor(col("pr") * 1000000000).cast("long").as("pr_ppb"))
      .orderBy(col("pr_ppb").desc, col("item"))
  }

  /** Oracle for [[itemPageRank]]: the identical rounds unrolled as CTEs —
    * same floor-fixed-point contributions, same integer sums, same double
    * update expression with the Scala-printed damping literals.
    */
  def sqlItemPageRank: String = {
    val base = (1 - PrDamp).toString // exact shortest-decimal of the double
    val iters = (1 to PrIters).map { it =>
      val prev = if (it == 1) "pr0" else s"pr${it - 1}"
      s"""c$it AS (SELECT e.dst,
         |    sum(floor(p.pr * e.w / o.ow * $PrFp))::BIGINT AS fp
         |  FROM ed e JOIN $prev p ON p.item = e.src JOIN ow o ON o.item = e.src
         |  GROUP BY 1),
         |pr$it AS (SELECT n.item,
         |    $base / nn.nn + $PrDamp * (coalesce(c$it.fp, 0) / $PrFp) AS pr
         |  FROM nodes n LEFT JOIN c$it ON c$it.dst = n.item, nn)""".stripMargin
    }.mkString(",\n")
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
}
