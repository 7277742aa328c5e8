package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational capability suite over the TPC-H-ish fixtures — the analytics
  * surface the reference lacks entirely (SURVEY §2.8) and the Spark engine
  * provides natively: aggregation, joins (broadcast/semi/anti), windows,
  * top-k, set ops, rollup.
  *
  * Scale notes (100 TB posture): dims (region/nation/customer/supplier) are
  * broadcast explicitly; fact-side filters are pushed to the parquet scan;
  * aggregations are partial (map-side combine) by construction.
  */
object Relational {

  val queries: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: scan-heavy partial agg; filter pushed to parquet.
    QueryDef.sql("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Global top-k with deterministic tie-break; sort + limit (TakeOrderedAndProject).
    QueryDef.sql("q2_topk",
      """SELECT o_orderkey, round(o_totalprice, 2) AS total,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"))
    },

    // TPC-H Q3 shape: selective dim filter broadcast into fact-fact join.
    QueryDef.sql("q3_join_agg",
      """SELECT l.l_orderkey,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      l.join(broadcast(c).join(o, col("c_custkey") === col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"))
    },

    // Star join over broadcast dims: region -> nation -> customer -> orders.
    QueryDef.sql("q4_star_join",
      """SELECT r.r_name, n.n_name,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o.o_totalprice), 2) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Window function: top order per customer (rank-1 per partition).
    QueryDef.sql("q5_window_top_per_cust",
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_custkey"))
    },

    // TPC-H Q6 shape: pure pushed-down scan + single-row agg.
    QueryDef.sql("q6_filter_agg",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Set operation: INTERSECT of distinct projections.
    QueryDef.sql("q7_setops",
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000
        |INTERSECT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 1000
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_acctbal") > 8000)
        .select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, dir).filter(col("s_acctbal") > 1000)
        .select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).orderBy(col("nationkey"))
    },

    // Rollup (grouping sets) with stable ALL markers.
    QueryDef.sql("q8_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    },

    // Semi join (EXISTS): customers having a very large order.
    QueryDef.sql("q9_semijoin",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Anti join (NOT EXISTS): customers with no high-value order.
    QueryDef.sql("q10_antijoin",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // Distinct aggregation (shuffle-dedup path).
    QueryDef.sql("q11_distinct_agg",
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    },

    // Exact quantiles (sort-based statistics; DuckDB quantile_cont twin).
    QueryDef.sql("q13_quantiles",
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(percentile(col("o_totalprice"), lit(0.5)), 2).as("median"),
          round(percentile(col("o_totalprice"), lit(0.9)), 2).as("p90"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("o_orderstatus"))
    },

    // Sketch twins of q13/q11 — the operators a 100 TB job actually runs
    // (t-digest percentiles, HyperLogLog++ distinct: bounded memory, one
    // pass, mergeable partials — no exact-sort or exact-distinct shuffle).
    // Sketch internals differ across engines, so the oracle checks a
    // TOLERANCE VERDICT instead of raw sketch output: Spark computes the
    // sketch AND the exact value and emits `|approx-exact|/exact <= tol`
    // per group; DuckDB emits the expected verdict (true). A sketch drifting
    // past tolerance flips the boolean and fails the hash gate.
    // ScaleOpsSpec additionally bounds the numeric error.
    QueryDef.sql("q19_approx_quantiles",
      """SELECT o_orderstatus, true AS median_ok, true AS p90_ok
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("am"),
          percentile(col("o_totalprice"), lit(0.5)).as("em"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("ap"),
          percentile(col("o_totalprice"), lit(0.9)).as("ep"))
        .select(col("o_orderstatus"),
          (abs(col("am") - col("em")) / col("em") <= 0.05).as("median_ok"),
          (abs(col("ap") - col("ep")) / col("ep") <= 0.05).as("p90_ok"))
        .orderBy(col("o_orderstatus"))
    },
    QueryDef.sql("q20_approx_distinct",
      """SELECT l_returnflag, true AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a"),
          countDistinct(col("l_orderkey")).as("e"))
        .select(col("l_returnflag"),
          (abs(col("a").cast("double") - col("e")) / col("e") <= 0.05).as("within_tol"))
        .orderBy(col("l_returnflag"))
    },

    // Count-min-sketch heavy hitters (q24): the CMS completes the sketch
    // family (t-digest q19, HLL q20, bloom p29) — estimate the true
    // top-10 keys' counts from one mergeable 0.1%-width sketch and emit
    // the one-sided-error verdict (CMS NEVER underestimates; the
    // overestimate is bounded by eps*N at the sketch's confidence). The
    // oracle computes the same top-10 exactly and expects all-true.
    // Tolerance note: the eps*N bound is PROBABILISTIC — it holds per
    // query at the sketch's 99% confidence, so on a fresh dataset a
    // top-10 key could legitimately exceed it (~1%/key) with nothing
    // broken. The verdict therefore uses a 2*eps*N slack (exponentially
    // smaller breach probability under the Markov-bound analysis) so the
    // pinned-true oracle is robust across datasets; never_under stays
    // the strict structural claim.
    QueryDef.sql("q24_cms_topk",
      """SELECT l_partkey AS k, true AS never_under, true AS within_tol
        |FROM (SELECT l_partkey, count(*) AS c FROM lineitem
        |      GROUP BY 1 ORDER BY c DESC, l_partkey LIMIT 10)
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_partkey"))
      val top = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("l_partkey")).limit(10).collect()
      val eps = 0.001
      // count and sketch are both partial-aggregable: ONE pass, not two
      val aggRow = li.agg(count(lit(1)).as("n"),
        expr(s"count_min_sketch(l_partkey, ${eps}d, 0.99d, 42)").as("sk")).head()
      val n = aggRow.getLong(0)
      val bytes = aggRow.getAs[Array[Byte]]("sk")
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      val rows = top.toSeq.map { r =>
        val k = r.getLong(0); val c = r.getLong(1)
        val est = cms.estimateCount(k)
        (k, est >= c, est <= c + 2 * (eps * n).toLong)
      }
      import s.implicits._
      rows.toDF("k", "never_under", "within_tol").orderBy(col("k"))
    },

    // Skew-salted two-phase aggregation (operators/Skew.scala): the hot-key
    // defense a 100 TB aggregation needs, oracle-checked against the plain
    // one-phase aggregate (salting must be EXACT for sum/count up to fp
    // rounding).
    QueryDef.sql("q21_salted_agg",
      """SELECT event_type, round(sum(value), 2) AS total,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.Skew.saltedAgg(
          Tables.events(s, dir), col("event_type"), col("value"), salt = 8)
        .select(col("k").as("event_type"), round(col("total"), 2).as("total"), col("n"))
        .orderBy(col("event_type"))
    },

    // Skew-salted fact-dimension JOIN (q22): the hot-fact-key defense when
    // broadcast is impossible — dim replicated per salt, fact salted
    // deterministically, join key (key, _salt); EXACT vs the plain join
    // (the oracle IS the plain join), count-sum aggregate keeps output small
    QueryDef.sql("q22_salted_join",
      """SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, dir) =>
      graft.operators.Skew.saltedJoin(
          Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity")),
          Tables.part(s, dir).select(col("p_partkey").as("l_partkey"), col("p_brand")),
          "l_partkey", salt = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"))
        .orderBy(col("p_brand"))
    },

    // Bloom-pruned star join (q23): the dim predicate reduced onto the
    // fact scan as a per-row might_contain BEFORE the join exchange —
    // superset-safe, so the oracle is the PLAIN join (exactness free)
    QueryDef.sql("q23_bloom_join", graft.operators.RuntimeFilter.sqlSmallPartRevenue) { (s, dir) =>
      graft.operators.RuntimeFilter.smallPartRevenue(
        Tables.lineitem(s, dir), Tables.part(s, dir))
    },

    // Full CUBE grouping sets.
    QueryDef.sql("q14_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    },

    // Arbitrary GROUPING SETS (q26): the third member of the grouping
    // family next to ROLLUP (q8) and CUBE (q14) — two independent
    // one-dimensional rollups in ONE aggregate pass (Spark expands to an
    // Expand + single partial-aggregated exchange, not two scans).
    // RUNNING DISTINCT per key (q25): at every order, how many DISTINCT
    // priorities has this customer used so far. COUNT(DISTINCT) over a
    // running frame would be O(frame) per row; the first-occurrence-flag
    // + running-sum form is two windows — rn=1 marks each (cust, prio)'s
    // first order, the running sum of flags IS the distinct count. Two
    // exchanges ((cust, prio) then its prefix (cust)); everything else is
    // partition-local.
    QueryDef.sql("q25_running_distinct",
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(sum(f) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_prio
        |FROM (SELECT o_orderkey, o_custkey, o_orderdate,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY o_custkey, o_orderpriority
        |      ORDER BY o_orderdate, o_orderkey) = 1 THEN 1 ELSE 0 END AS f
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val wf = Window.partitionBy(col("o_custkey"), col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wr = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("first", when(row_number().over(wf) === 1, 1L).otherwise(0L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          sum(col("first")).over(wr).as("n_prio"))
        .orderBy(col("o_orderkey"))
    },
    QueryDef.sql("q26_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      val view = "lineitem_q26"
      Tables.lineitem(s, dir).createOrReplaceTempView(view)
      s.sql(
        s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
           |  coalesce(l_linestatus, 'ALL') AS ls,
           |  count(*) AS n,
           |  round(sum(l_quantity), 2) AS qty
           |FROM $view GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
           |ORDER BY rf, ls""".stripMargin)
    },

    // Market-basket association: PMI of item pairs sharing a (user, day)
    // basket — log2(P(a,b) / P(a)P(b)) in basket-count form. The pair
    // join keys on the basket id with fanout bounded by per-basket item
    // count; presence counts and the basket total partial-aggregate; the
    // only broadcasts are the bounded item-count table and one scalar row.
    QueryDef.sql("q27_basket_pmi",
      """WITH bi AS (SELECT DISTINCT user_id,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    json_extract(props, '$.k')::INT AS item
        |  FROM events WHERE ts IS NOT NULL AND props IS NOT NULL
        |    AND json_extract(props, '$.k') IS NOT NULL),
        |nb AS (SELECT count(*)::BIGINT AS n
        |  FROM (SELECT DISTINCT user_id, day FROM bi)),
        |ic AS (SELECT item, count(*)::BIGINT AS c FROM bi GROUP BY item),
        |pc AS (SELECT a.item AS ia, b.item AS ib, count(*)::BIGINT AS cab
        |  FROM bi a JOIN bi b ON a.user_id = b.user_id AND a.day = b.day
        |    AND a.item < b.item
        |  GROUP BY 1, 2)
        |SELECT pc.ia, pc.ib, pc.cab,
        |  round(log2(pc.cab::DOUBLE * (SELECT n FROM nb) / (ca.c * cb.c)), 4) AS pmi
        |FROM pc
        |JOIN ic ca ON ca.item = pc.ia
        |JOIN ic cb ON cb.item = pc.ib
        |WHERE pc.cab >= 2
        |ORDER BY ia, ib""".stripMargin) { (s, dir) =>
      // the basket table feeds FOUR consumers (the global count, the
      // item counts, both sides of the pair self-join): checkpoint it
      // once (the t37 single-scan rule) so every leg reads one frozen
      // layout instead of re-deriving the events scan + JSON extract +
      // distinct — fewer stages, and the pair join's first exchange
      // hashes a pinned input (the bench-noise remedy for this query)
      val bi = Tables.events(s, dir)
        .filter(col("ts").isNotNull && col("props").isNotNull)
        .select(col("user_id"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          get_json_object(col("props"), "$.k").cast("int").as("item"))
        .filter(col("item").isNotNull).distinct()
        .localCheckpoint(true)
      val nb = bi.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n"))
      val ic = bi.groupBy(col("item")).agg(count(lit(1)).as("c"))
      val pc = bi.as("a").join(bi.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
            col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
        .agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 2)
      pc.join(ic.select(col("item").as("ia"), col("c").as("ca")), "ia")
        .join(ic.select(col("item").as("ib"), col("c").as("cb")), "ib")
        .crossJoin(broadcast(nb))
        .select(col("ia"), col("ib"), col("cab"),
          round(log2(col("cab").cast("double") * col("n") / (col("ca") * col("cb"))), 4)
            .as("pmi"))
        .orderBy(col("ia"), col("ib"))
    },

    // EXCEPT (set difference).
    QueryDef.sql("q15_except",
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val a = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
      val b = Tables.supplier(s, dir).filter(col("s_acctbal") > 8000)
        .select(col("s_nationkey").as("nationkey"))
      a.except(b).orderBy(col("nationkey"))
    },

    // Pivot: event_type values to columns (relational pivot surface; the
    // oracle states the equivalent conditional aggregation).
    QueryDef.sql("q16_pivot",
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "purchase", "view"))
        .orderBy(col("user_id"))
    },

    // Temporal arithmetic: datediff/extract family.
    QueryDef.sql("q17_datemath",
      """SELECT date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')::BIGINT AS age_days,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE extract(year FROM o_orderdate) = 2000
        |GROUP BY 1 ORDER BY age_days""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 2000)
        .groupBy(datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
          .cast("bigint").as("age_days"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("age_days"))
    },

    // Statistical aggregates (merge-able moments: corr/stddev/variance).
    QueryDef.sql("q18_stats",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
        |  round(stddev_samp(l_quantity), 4) AS qty_sd,
        |  round(var_samp(l_discount), 6) AS disc_var
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qp_corr"),
          round(stddev_samp(col("l_quantity")), 4).as("qty_sd"),
          round(var_samp(col("l_discount")), 6).as("disc_var"))
        .orderBy(col("l_returnflag"))
    },

    // ntile bucketing over a total order — via the distributed rank
    // (Ranking.withNtile): the customer dimension is small today, but
    // the q34 rule applies to every data-scaled frame, so no query
    // ships the single-task unpartitioned-window plan.
    QueryDef.sql("w6_ntile",
      """SELECT q, CAST(count(*) AS BIGINT) AS n,
        |  round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
        |FROM (SELECT c_acctbal,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS q FROM customer)
        |GROUP BY q ORDER BY q""".stripMargin) { (s, dir) =>
      graft.operators.Ranking.withNtile(
          Tables.customer(s, dir).select(col("c_acctbal"), col("c_custkey")),
          "q", 4, Seq(col("c_acctbal"), col("c_custkey")))
        .groupBy(col("q"))
        .agg(count(lit(1)).as("n"),
          round(min(col("c_acctbal")), 2).as("lo"),
          round(max(col("c_acctbal")), 2).as("hi"))
        .orderBy(col("q"))
    },

    // Running aggregate window frame (rows unbounded preceding .. current).
    QueryDef.sql("w4_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir).filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // lag/lead analytics: delta to the previous event per user.
    QueryDef.sql("w5_lag_delta",
      """SELECT event_id,
        |  round(value - lag(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), 2) AS delta,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_type
        |FROM events WHERE user_id < 20
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("event_id"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy(col("event_id"))
    },

    // UNION (distinct) of heterogeneous branches.
    QueryDef.sql("q12_union",
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        |UNION
        |SELECT s_nationkey FROM supplier WHERE s_acctbal < 2000
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val a = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
        .select(col("c_nationkey").as("nationkey"))
      val b = Tables.supplier(s, dir).filter(col("s_acctbal") < 2000)
        .select(col("s_nationkey").as("nationkey"))
      a.union(b).distinct().orderBy(col("nationkey"))
    },

    // Relative-rank window functions: percent_rank and cume_dist of the
    // order's value within its priority class — the remaining members of
    // the rank family next to row_number (w3/q5), rank-cut top-k (q2),
    // and ntile (w6). Emitted as floor-scaled parts-per-million: both
    // engines compute the identical (rank-1)/(n-1) double, and floor of
    // that same double is engine-proof where round() is not (Spark
    // rounds the shortest decimal string half-up, DuckDB rounds the raw
    // binary — they split exactly at .5-boundary ranks like 41/640).
    // The filter applies BEFORE ranking and pushes to the parquet scan.
    QueryDef.sql("q31_relative_rank",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_ppm,
        |  CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_ppm
        |FROM orders WHERE o_totalprice >= 400000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir).filter(col("o_totalprice") >= 400000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(percent_rank().over(w) * 1000000).cast("long").as("pr_ppm"),
          floor(cume_dist().over(w) * 1000000).cast("long").as("cd_ppm"))
        .orderBy(col("o_orderkey"))
    },

    // Correlated EXISTS subquery (TPC-H Q4 shape): Catalyst decorrelates
    // the EXISTS into a LEFT SEMI join on the correlation key — never a
    // per-row re-scan; the fact-side predicate pushes into the semi
    // join's build side.
    QueryDef.sql("q29_exists_subquery",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_q29")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q29")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders_q29
          |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem_q29
          |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // Correlated SCALAR subquery (TPC-H Q17 shape): the per-part average
    // decorrelates into one partial-aggregated per-part table joined back
    // on the correlation key — one aggregate + one join, not a re-scan
    // per probe row. l_quantity is integer-valued, so the avg is an exact
    // integer sum over an exact count: the 0.2·avg threshold is the same
    // double in both engines and the boundary cannot flip.
    QueryDef.sql("q30_scalar_subquery",
      """SELECT l.l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n_small,
        |  round(sum(l.l_extendedprice), 2) AS revenue
        |FROM lineitem l
        |WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l.l_returnflag ORDER BY rf""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q30")
      s.sql(
        """SELECT l.l_returnflag AS rf, count(*) AS n_small,
          |  round(sum(l.l_extendedprice), 2) AS revenue
          |FROM lineitem_q30 l
          |WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
          |                      FROM lineitem_q30 l2 WHERE l2.l_partkey = l.l_partkey)
          |GROUP BY l.l_returnflag ORDER BY rf""".stripMargin)
    },

    // RFM segmentation (q34): recency/frequency/monetary quintiles per
    // purchasing user — the classic marketing segmentation, each
    // quintile computed by Ranking.withNtile: range-partitioned sort +
    // partition-local rank + broadcast offsets, bit-identical to
    // ntile(5) because the user_id tie-break makes each order total —
    // never an unpartitioned window, so the user dimension can grow to
    // billions without a single-task stage. Monetary rides the exact
    // micro-currency ledger (w25's trick) so the quintile order is
    // integer-deterministic.
    QueryDef.sql("q34_rfm",
      """WITH u AS (SELECT user_id,
        |    max(epoch_us(ts))::BIGINT AS last_us,
        |    count(*)::BIGINT AS freq,
        |    sum(CAST(round(value, 6)::DECIMAL(18,6) * 1000000 AS BIGINT))::BIGINT AS mon_micro
        |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY user_id)
        |SELECT user_id, last_us, freq, mon_micro,
        |  ntile(5) OVER (ORDER BY last_us, user_id)::INT AS r,
        |  ntile(5) OVER (ORDER BY freq, user_id)::INT AS f,
        |  ntile(5) OVER (ORDER BY mon_micro, user_id)::INT AS m
        |FROM u ORDER BY user_id""".stripMargin) { (s, dir) =>
      val u = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("ts").isNotNull &&
          col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("freq"),
          sum((round(col("value"), 6).cast("decimal(18,6)") * 1000000).cast("long"))
            .as("mon_micro"))
      val rr = graft.operators.Ranking.withNtile(
        u, "r", 5, Seq(col("last_us"), col("user_id")))
      val ff = graft.operators.Ranking.withNtile(
        rr, "f", 5, Seq(col("freq"), col("user_id")))
      graft.operators.Ranking.withNtile(
          ff, "m", 5, Seq(col("mon_micro"), col("user_id")))
        .select(col("user_id"), col("last_us"), col("freq"), col("mon_micro"),
          col("r"), col("f"), col("m"))
        .orderBy(col("user_id"))
    },

    // UNPIVOT (q33, the inverse of q16's pivot): four measure columns
    // melt to (metric, value) rows via stack() — one generator, no
    // shuffle before the final bounded aggregate. The oracle is the
    // dialect-portable UNION ALL form.
    QueryDef.sql("q33_unpivot",
      """SELECT metric, CAST(count(*) AS BIGINT) AS n, round(sum(v), 2) AS total
        |FROM (
        |  SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL SELECT 'discount', l_discount FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL SELECT 'tax', l_tax FROM lineitem WHERE l_linenumber = 1)
        |GROUP BY metric ORDER BY metric""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).filter(col("l_linenumber") === 1)
        .selectExpr("""stack(4,
            'quantity', l_quantity,
            'extendedprice', l_extendedprice,
            'discount', l_discount,
            'tax', l_tax) AS (metric, v)""")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("total"))
        .orderBy(col("metric"))
    },

    // Weighted PageRank over the item co-basket graph (q32): link
    // analysis joins connected components in the graph family. Every
    // per-edge contribution floors to 1e-12 fixed-point BIGINT before
    // the per-node sum, so each round's only order-sensitive reduction
    // is an integer sum — the floor trick that lets an ITERATIVE float
    // algorithm hash-match across engines.
    QueryDef.sql("q32_item_pagerank", graft.operators.Graph.sqlItemPageRank) { (s, dir) =>
      graft.operators.Graph.itemPageRank(Tables.events(s, dir))
    },

    // KMV distinct-count set algebra (q28): per-event-type k-minimum-values
    // sketches, pairwise union AND intersection estimates — the set
    // operation HLL (w18/q20) cannot perform. One distinct pass over
    // events builds the sketches; every merge after runs on ≤ k·|types|
    // rows. Deterministic md5 hashes + integer-division estimator → the
    // oracle replays every number, no tolerance pin.
    QueryDef.sql("q28_kmv_setops", graft.operators.Sketches.sqlKmvSetOps) { (s, dir) =>
      graft.operators.Sketches.kmvSetOps(Tables.events(s, dir))
    },

    // SOLE-LATE-SUPPLIER (q38, the TPC-H Q21 shape): suppliers who alone
    // held up multi-supplier orders. The classic doubly-correlated
    // EXISTS / NOT-EXISTS, written in its DECORRELATED Spark form — one
    // per-order aggregate (distinct suppliers, distinct late suppliers)
    // replaces both correlated subqueries; the oracle keeps the
    // textbook correlated formulation, so the equivalence itself is
    // what the gate checks. Late = shipped > 60 days after order date
    // (exact integer micros).
    QueryDef.sql("q38_blame_supplier",
      s"""WITH l AS (SELECT li.l_orderkey AS ok, li.l_suppkey AS sk,
        |    epoch_us(li.l_shipdate) > epoch_us(o.o_orderdate)
        |      + ${60L * 86400000000L} AS late
        |  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
        |blamed AS (SELECT DISTINCT l1.ok, l1.sk FROM l l1
        |  WHERE l1.late
        |    AND EXISTS (SELECT 1 FROM l l2
        |      WHERE l2.ok = l1.ok AND l2.sk != l1.sk)
        |    AND NOT EXISTS (SELECT 1 FROM l l3
        |      WHERE l3.ok = l1.ok AND l3.sk != l1.sk AND l3.late))
        |SELECT rnk, s_name, numwait FROM (
        |  SELECT s.s_name, count(*)::BIGINT AS numwait,
        |    row_number() OVER (ORDER BY count(*) DESC, s.s_name) AS rnk
        |  FROM blamed b JOIN supplier s ON s.s_suppkey = b.sk
        |  GROUP BY 1) WHERE rnk <= 20
        |ORDER BY rnk""".stripMargin) { (s, dir) =>
      val late = Tables.lineitem(s, dir).as("li")
        .join(Tables.orders(s, dir).as("o"),
          col("li.l_orderkey") === col("o.o_orderkey"))
        .select(col("li.l_orderkey").as("ok"), col("li.l_suppkey").as("sk"),
          (unix_micros(col("li.l_shipdate").cast("timestamp")) >
            unix_micros(col("o.o_orderdate").cast("timestamp"))
              + lit(60L * 86400000000L)).as("late"))
      // ONE aggregation pass: a blamed order has exactly ONE distinct
      // late supplier (nlate = 1), so that supplier is readable off the
      // same per-order aggregate as max(when(late, sk)) — the previous
      // form re-scanned the lineitem⋈orders join a second time for a
      // distinct + join-back (2 SortMergeJoins of the fact table → 1)
      val per = late.groupBy(col("ok"))
        .agg(countDistinct(col("sk")).as("nsupp"),
          countDistinct(when(col("late"), col("sk"))).as("nlate"),
          max(when(col("late"), col("sk"))).as("late_sk"))
      val blamed = per.filter(col("nsupp") >= 2 && col("nlate") === 1)
        .select(col("ok"), col("late_sk").as("sk"))
      val counted = blamed.groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("sk") === col("s_suppkey"))
      val top = counted.orderBy(col("numwait").desc, col("s_name")).limit(20)
      top.withColumn("rnk", row_number().over(
          Window.orderBy(col("numwait").desc, col("s_name"))))
        .select(col("rnk"), col("s_name"), col("numwait"))
        .orderBy(col("rnk"))
    },

    // DORMANT CAPITAL (q39, the TPC-H Q22 shape): above-average-balance
    // customers with no order since 2000-01-01, reported per nation — the
    // scalar-subquery + NOT EXISTS pair in its decorrelated Spark form:
    // ONE global aggregate broadcasts as a scalar row (the comparison is
    // pure integers — cents x count > total-cents, so no division and no
    // float ordering anywhere), the NOT EXISTS is one anti-join against
    // the distinct order-customer keys (AQE broadcasts it when small),
    // and the nation dim broadcasts. The oracle keeps the textbook
    // subquery form. Balances ride the exact cents ledger (the
    // q34/w25 money idiom) so every emitted sum is a BIGINT.
    QueryDef.sql("q39_dormant_capital",
      """WITH cc AS (SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal, 2)::DECIMAL(12,2) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |pos AS (SELECT * FROM cc WHERE cents > 0)
        |SELECT n.n_name, count(*)::BIGINT AS n_cust,
        |  sum(c.cents)::BIGINT AS bal_cents
        |FROM pos c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.cents * (SELECT count(*) FROM pos)
        |    > (SELECT sum(cents) FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= '2000-01-01')
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, dir) =>
      val cc = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"),
        (round(col("c_acctbal"), 2).cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      val pos = cc.filter(col("cents") > 0)
      val thr = pos.agg(sum(col("cents")).as("tot"), count(lit(1)).as("n"))
      val rich = pos.crossJoin(broadcast(thr))
        .filter(col("cents") * col("n") > col("tot"))
      val dormant = rich.join(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey").as("c_custkey")).distinct(),
        Seq("c_custkey"), "left_anti")
      dormant.join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
          "c_nationkey")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("bal_cents"))
        .orderBy(col("n_name"))
    },

    // LARGE-VOLUME CUSTOMER (q40, the TPC-H Q18 shape): orders whose
    // line quantities sum past a threshold, with their customers — the
    // IN-over-grouped-HAVING subquery in its decorrelated Spark form:
    // ONE partial-aggregated pass over lineitem produces the qualifying
    // per-order sums (map-side combine before the shuffle), which join
    // orders directly (the aggregate IS the semi-join side and carries
    // the sum the output needs — no second lineitem pass, no IN
    // re-scan), customer broadcasts, and the top-20 is
    // TakeOrderedAndProject. Quantities are small integers in doubles,
    // so the sums are exact in any order.
    QueryDef.sql("q40_big_orders",
      """SELECT c.c_name, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
        |  round(o.o_totalprice, 2) AS total, round(q.qty, 2) AS qty
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) q
        |  ON q.l_orderkey = o.o_orderkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      val q = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
      val top = Tables.orders(s, dir)
        .join(q, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"))),
          col("c_custkey") === col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
      top.select(col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        round(col("o_totalprice"), 2).as("total"), round(col("qty"), 2).as("qty"))
    },

    // SMALL-QUANTITY-ORDER REVENUE (q41, the TPC-H Q17 shape): lines
    // whose quantity is under 20% of their PART'S average quantity —
    // the correlated scalar-avg subquery in its decorrelated Spark
    // form: ONE partial-aggregated pass over lineitem produces every
    // part's average (quantities are integers in doubles, so the avg is
    // order-exact), which joins back to lineitem on the co-partitioned
    // part key — no per-row subquery re-scan; part broadcasts for the
    // brand rollup. Money follows the house cents convention (per-row
    // round to DECIMAL, integer sum — order-free in both engines),
    // divided by 7 once at the end (the Q17 "yearly average" output).
    QueryDef.sql("q41_small_qty_revenue",
      """WITH li AS (SELECT l_partkey, l_quantity,
        |    CAST(round(l_extendedprice, 2)::DECIMAL(12,2) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |aq AS (SELECT l_partkey, avg(l_quantity) AS aq FROM li GROUP BY 1)
        |SELECT p.p_brand, count(*)::BIGINT AS n_lines,
        |  round(sum(l.cents) / 700.0, 2) AS avg_yearly
        |FROM li l
        |JOIN aq USING (l_partkey)
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity < 0.2 * aq.aq
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity"),
        (round(col("l_extendedprice"), 2).cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      val aq = li.groupBy(col("l_partkey")).agg(avg(col("l_quantity")).as("aq"))
      li.join(aq, "l_partkey")
        .filter(col("l_quantity") < lit(0.2) * col("aq"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))), "l_partkey")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("cents")) / 700.0, 2).as("avg_yearly"))
        .orderBy(col("p_brand"))
    },

    // TOP SUPPLIER (q42, the TPC-H Q15 shape): the supplier(s) whose
    // quarterly revenue equals the maximum — Q15's correlated scalar-max
    // view in its decorrelated Spark form: per-supplier revenue is one
    // partial-aggregated pass over the date-pruned lineitem scan
    // (revenue as the EXACT integer product of the two 2-decimal
    // factors in 1e-4 units — both engines agree bit-for-bit in any
    // summation order, with no per-row rounding boundary at all), the
    // max is a ONE-ROW broadcast joined back (never a re-scan of the
    // revenue view), ties all surface, supplier broadcasts for the name.
    QueryDef.sql("q42_top_supplier",
      """WITH rev AS (SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))::BIGINT
        |      AS rev_c4
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT r.l_suppkey AS s_suppkey, s.s_name,
        |  round(r.rev_c4 / 10000.0, 2) AS total_revenue
        |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.rev_c4 = (SELECT max(rev_c4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      // the revenue view is consumed twice (rows + its max); AQE does
      // NOT reuse the exchange across the differently-pruned subtrees
      // (the t37 lesson), so without the checkpoint the lineitem scan
      // and aggregation run twice — materialize the SMALL per-supplier
      // table once and both consumers read it
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * round((lit(1.0) - col("l_discount")) * 100).cast("long")).as("c"))
        .groupBy(col("l_suppkey")).agg(sum(col("c")).as("rev_c4"))
        .localCheckpoint(true)
      rev.crossJoin(broadcast(rev.agg(max(col("rev_c4")).as("mx"))))
        .filter(col("rev_c4") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))), "l_suppkey")
        .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
          round(col("rev_c4") / 10000.0, 2).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // VOLUME SHIPPING (q43, the TPC-H Q7 shape): revenue shipped
    // between two nations, per direction and year — the classic
    // star-with-two-role-dimensions join: nation joins TWICE under
    // different roles (supplier's vs customer's), the two-nation
    // predicate filters each role BEFORE the fact joins (supplier and
    // customer shrink to the two nations' rows and broadcast), and the
    // one genuine shuffle is lineitem ⋈ orders on their shared key.
    // Revenue is the exact integer product of the two 2-decimal factors
    // (1e-4 units) — order-free and boundary-free in both engines;
    // year() is exact integer arithmetic.
    QueryDef.sql("q43_volume_shipping",
      """WITH v AS (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l.l_shipdate)::INT AS l_year,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l.l_discount) * 100) AS BIGINT) AS c4
        |  FROM lineitem l
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01')
        |SELECT supp_nation, cust_nation, l_year,
        |  count(*)::BIGINT AS n_lines, sum(c4)::BIGINT AS revenue_c4
        |FROM v GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val nations = Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (round(col("l_extendedprice") * 100).cast("long")
            * round((lit(1.0) - col("l_discount")) * 100).cast("long")).as("c4"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(count(lit(1)).as("n_lines"), sum(col("c4")).as("revenue_c4"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // NATIONAL MARKET SHARE (q44, the TPC-H Q8 shape): one nation's
    // share of a region's revenue in one part segment, per year — the
    // conditional-sum-over-sum ratio computed in ONE aggregation pass
    // (sum(CASE)/sum, never two scans); every dimension chain
    // (part-type filter, customer→nation→region, supplier→nation role)
    // broadcasts, and the fact-side shuffle is again only
    // lineitem ⋈ orders. The ratio divides two exact integer 1e-4-unit
    // sums and is emitted UNROUNDED: IEEE division of identical longs is
    // bit-identical in both engines, while round() on a computed double
    // is the boundary-unsafe class the q44 1-cent flip taught (Spark
    // rounds the shortest-decimal rendering, DuckDB the binary value) —
    // the exact integer sums ride along as the auditable gate columns.
    QueryDef.sql("q44_market_share",
      """WITH v AS (
        |  SELECT year(o.o_orderdate)::INT AS o_year, n2.n_name AS supp_nation,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l.l_discount) * 100) AS BIGINT) AS c4
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |  WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01')
        |SELECT o_year,
        |  sum(CASE WHEN supp_nation = 'NATION_3' THEN c4 ELSE 0 END)::BIGINT
        |    AS nation_c4,
        |  sum(c4)::BIGINT AS total_c4,
        |  sum(CASE WHEN supp_nation = 'NATION_3' THEN c4 ELSE 0 END)::BIGINT
        |    / sum(c4)::DOUBLE AS mkt_share
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val asiaCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val econParts = Tables.part(s, dir)
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val natC4 = sum(when(col("supp_nation") === "NATION_3",
        col("c4")).otherwise(0L))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * round((lit(1.0) - col("l_discount")) * 100).cast("long")).as("c4"))
        .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_year"))
        .agg(natC4.as("nation_c4"),
          sum(col("c4")).as("total_c4"),
          (natC4.cast("double") /
            sum(col("c4")).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // JOIN-KEY SKEW ADVISOR (q36): the diagnosis q21/q22 are the cure
    // for — one exploded scan, histogram shape per candidate key, hot
    // key via max(struct), integer salt recommendation
    QueryDef.sql("q36_skew_report", graft.operators.Skew.sqlSkewReport) { (s, dir) =>
      graft.operators.Skew.skewReport(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))
    },

    // TOP CONVERSION PATHS (q37): the raw path-level view w31's chain
    // aggregates away — shared journey construction, bounded path domain
    QueryDef.sql("q37_top_paths", graft.operators.Graph.sqlTopPaths) { (s, dir) =>
      graft.operators.Graph.topPaths(Tables.events(s, dir))
    },

    // Z-ORDER LAYOUT AUDIT (q35): how much min/max file pruning each
    // layout buys per probe column — quadtree-cell file ids are pure
    // per-row bit arithmetic after one broadcast scalar row (no global
    // sort/window anywhere), the 100 TB OPTIMIZE ZORDER shape
    QueryDef.sql("q35_zorder_layout", graft.operators.Layout.sqlZorderAudit) { (s, dir) =>
      graft.operators.Layout.zorderAudit(Tables.lineitem(s, dir))
    }
  )
}
