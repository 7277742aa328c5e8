package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The checkpoint-level erasure proof: behavioral pins show a forgotten
  * key can't influence a verdict; these show the key is PHYSICALLY GONE
  * from the committed state store — read back through Spark's public
  * `statestore` source, the same files a restart would load.
  */
class StateAuditSpec extends AnyFunSuite {

  private def land(dataDir: String, i: Int, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft-stateaudit-chunk").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val dest = new java.io.File(dataDir, f"chunk-$i%03d.parquet")
    Files.move(part.toPath, dest.toPath)
    assert(dest.setLastModified(
      System.currentTimeMillis() - 3600000L + i * 60000L))
    ()
  }

  test("manifest forget leaves no trace in the checkpoint: the erased hash is absent from the state store") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val other = "entirely different unique content with other words inside"
    val docs = Seq((1L, dup, "add")).toDF("doc_id", "text", "op")
    val corpus = Seq((1L, dup), (3L, other)).toDF("doc_id", "text")
    val hot = CurationStream.trainHotShingles(corpus)
    val lmDir = Files.createTempDirectory("graft-stateaudit-lm").toString
    val lm = graft.operators.TextOps.trainAndSaveSurprisalModel(corpus, lmDir)

    val dataDir = Files.createTempDirectory("graft-stateaudit-data").toString
    val ckpt = Files.createTempDirectory("graft-stateaudit-ckpt").toString
    land(dataDir, 0, Seq((1L, dup, "add"), (2L, dup, "add"),
      (3L, other, "add")).toDF("doc_id", "text", "op"))
    land(dataDir, 1, Seq((1L, dup, CurationStream.OpForget))
      .toDF("doc_id", "text", "op"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dataDir)
    val q = CurationStream.manifest(stream, hot, lm)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("noop").start()
    assert(q.awaitTermination(120000), "manifest drain did not finish")

    val hashOf = (t: String) =>
      corpus.sparkSession.range(1)
        .select(md5(lower(trim(lit(t))))).first().getString(0)
    val erased = hashOf(dup)
    val kept = hashOf(other)
    // the audit an erasure pipeline runs: ZERO state rows for the hash
    assert(StateAudit.auditErased(spark, ckpt, Seq(erased)).count() == 0,
      "the forgotten canonical's hash must be physically absent")
    // and the store still holds exactly the surviving hash, with its
    // canonical doc_id as the state value
    val rows = StateAudit.stateTable(spark, ckpt)
      .select(col("key").getField("value").as("h"),
        col("value").getField("groupState").getField("value").as("canon"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set((kept, 3L)), s"state store contents: $rows")
    // the ops report agrees: one key total
    val total = StateAudit.stateReport(spark, ckpt)
      .filter(col("partition_id") === -1).first().getLong(1)
    assert(total == 1L, s"expected 1 surviving key, got $total")
  }

  test("funnel forget leaves no trace in the checkpoint: the erased user's key is absent, survivors intact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val schema = Seq((1L, at(0), "signup", 1L))
      .toDF("user_id", "ts", "event_type", "event_id").schema
    val dataDir = Files.createTempDirectory("graft-stateaudit-fdata").toString
    val ckpt = Files.createTempDirectory("graft-stateaudit-fckpt").toString
    land(dataDir, 0, Seq(
      (7L, at(0), "signup", 10L), (7L, at(1), "view", 11L),
      (8L, at(0), "signup", 20L), (8L, at(1), "view", 21L))
      .toDF("user_id", "ts", "event_type", "event_id"))
    land(dataDir, 1, Seq((7L, at(2), "forget", 0L))
      .toDF("user_id", "ts", "event_type", "event_id"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dataDir)
    val q = graft.operators.AsOf.funnelStream(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("noop").start()
    assert(q.awaitTermination(120000), "funnel drain did not finish")

    assert(StateAudit.auditErased(spark, ckpt, Seq("7")).count() == 0,
      "the forgotten user's key must be physically absent")
    val keys = StateAudit.stateTable(spark, ckpt)
      .select(col("key").getField("value")).collect()
      .map(_.getString(0)).toSet
    assert(keys == Set("8"), s"state store keys: $keys")
  }

  test("TWAP forget leaves no trace in the checkpoint: the erased (user, day) key is absent, survivors intact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def at(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val schema = Seq((1L, at(0), 1.0, 1L, "add"))
      .toDF("event_id", "ts", "value", "user_id", "op").schema
    val dataDir = Files.createTempDirectory("graft-stateaudit-tdata").toString
    val ckpt = Files.createTempDirectory("graft-stateaudit-tckpt").toString
    land(dataDir, 0, Seq(
      (1L, at(0), 10.0, 7L, "add"), (2L, at(60), 20.0, 7L, "add"),
      (3L, at(0), 30.0, 8L, "add"), (4L, at(60), 40.0, 8L, "add"))
      .toDF("event_id", "ts", "value", "user_id", "op"))
    land(dataDir, 1, Seq((0L, at(120), 0.0, 7L, "forget"))
      .toDF("event_id", "ts", "value", "user_id", "op"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dataDir)
    val q = graft.operators.EventWindows.twapStream(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("noop").start()
    assert(q.awaitTermination(120000), "twap drain did not finish")

    // the (user, day) grouping key is a tuple — audit its fields directly
    val keys = StateAudit.stateTable(spark, ckpt)
      .select(col("key.*")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keys == Set((8L, "2024-01-01")),
      s"the forgotten user's (user, day) key must be physically absent: $keys")
    // and the ops report agrees: one key total
    val total = StateAudit.stateReport(spark, ckpt)
      .filter(col("partition_id") === -1).first().getLong(1)
    assert(total == 1L, s"expected 1 surviving key, got $total")
  }

  test("checkpoint manifest: live state joins the artifact inventory, and the unified table covers both storage classes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    // a real stopped query's checkpoint: the funnel gate with a horizon
    // configured, two users' state committed
    val schema = Seq((1L, at(0), "signup", 1L))
      .toDF("user_id", "ts", "event_type", "event_id").schema
    val dataDir = Files.createTempDirectory("graft-ckptman-data").toString
    val ckpt = Files.createTempDirectory("graft-ckptman-ckpt").toString
    land(dataDir, 0, Seq(
      (7L, at(0), "signup", 10L), (7L, at(1), "view", 11L),
      (8L, at(0), "signup", 20L))
      .toDF("user_id", "ts", "event_type", "event_id"))
    val stream = spark.readStream.schema(schema).parquet(dataDir)
    val q = graft.operators.AsOf.funnelStream(stream,
        horizonMs = Some(3600000L))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("noop").start()
    assert(q.awaitTermination(120000), "funnel drain did not finish")

    val rows = StateAudit.checkpointManifest(spark, Seq(
        StateAudit.CheckpointEntry("funnel_users", ckpt,
          horizonConfigured = true)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.length == 1)
    val (name, cls, nKeys, nParts, nBytes, hzn) = rows.head
    assert(name == "funnel_users" && cls == "live-purgeable" && hzn,
      s"manifest row: ${rows.head}")
    // a populated gate's state occupies real bytes on disk — the
    // executor-OOM sizing column the key count alone can't give
    assert(nBytes > 0L, s"manifest row: ${rows.head}")
    // key count agrees with the ops report; occupied partitions bounded
    // by the key count and the state-partition config
    val reported = StateAudit.stateReport(spark, ckpt)
      .filter(col("partition_id") === -1).first()
    assert(nKeys == reported.getLong(1) && nKeys == 2L,
      s"manifest row: ${rows.head}")
    assert(nParts >= 1L && nParts <= nKeys, s"manifest row: ${rows.head}")
    // the report's totals row carries the same file-tree byte count
    assert(reported.getLong(2) == nBytes,
      s"report total bytes ${reported.getLong(2)} vs manifest $nBytes")
    // and the per-partition byte rows sum to it (bytes exist even for
    // partitions holding zero live keys — the directory is accounted)
    val perPart = StateAudit.stateReport(spark, ckpt)
      .filter(col("partition_id") >= 0)
      .agg(org.apache.spark.sql.functions.sum(col("state_bytes")))
      .first().getLong(0)
    assert(perPart == nBytes, s"per-partition sum $perPart vs $nBytes")

    // a multi-entry inventory unions and sorts by artifact name (two
    // logical gates may well read state from the same store family)
    val multi = StateAudit.checkpointManifest(spark, Seq(
        StateAudit.CheckpointEntry("z_gate", ckpt, horizonConfigured = false),
        StateAudit.CheckpointEntry("a_gate", ckpt, horizonConfigured = true)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(5)))
    assert(multi.toSeq == Seq(("a_gate", 2L, true), ("z_gate", 2L, false)),
      s"multi-entry manifest: ${multi.toSeq}")

    // the unified table: one inventory, both storage classes, the
    // class-specific columns null on the other side (state bytes are a
    // checkpoint-tree question, null for saved artifacts)
    val saved = Seq(("bm25_postings", "per-key-prunable", 123L, 10L, 12L, true))
      .toDF("artifact", "erasure_class", "n_rows",
        "covered_keys", "fresh_keys", "stale")
    val uni = StateAudit.unifiedManifest(saved,
        StateAudit.checkpointManifest(spark, Seq(
          StateAudit.CheckpointEntry("funnel_users", ckpt,
            horizonConfigured = true))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))
    assert(uni.toSeq == Seq(
      ("funnel_users", "checkpoint", "live-purgeable", 2L,
        None, Some(true), Some(nBytes)),
      ("bm25_postings", "saved-artifact", "per-key-prunable", 123L,
        Some(true), None, None)),
      s"unified manifest: ${uni.toSeq}")
  }
}
