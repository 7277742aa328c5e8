package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The p20 gate logic running as a real checkpointed streaming job
  * (SURVEY §7's batch/stream unification claim, beyond the as-of case):
  * kill-and-restart mid-corpus must produce the IDENTICAL manifest as an
  * uninterrupted run, and the per-gate verdicts must equal the batch
  * curatedManifest's — modulo the surprisal band, which is corpus-global
  * (documented exclusion; the streamed keep set is therefore a superset
  * of the batch keep set).
  */
class CurationStreamSpec extends AnyFunSuite {

  test("streamed gates equal the batch manifest; crash mid-corpus redelivers without changing a verdict") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val hot = CurationStream.trainHotShingles(docs)

    // batch expectation: p20 emits (doc_id, quality_score, bits_per_token,
    // boilerplate_frac, canonical, quality_ok, ppl_ok, boiler_ok, keep)
    val batch = graft.operators.Curation.curatedManifest(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(3), r.getBoolean(5), r.getBoolean(7),
          r.getBoolean(4)))).toMap
    val batchKeep = graft.operators.Curation.curatedManifest(docs).collect()
      .filter(_.getBoolean(8)).map(_.getLong(0)).toSet

    // corpus lands as 3 doc_id-ordered files (ordered ingest: the
    // precondition under which first-seen == batch min-doc_id canonical)
    val dataDir = Files.createTempDirectory("graft-curstream-data").toString
    val ckpt = Files.createTempDirectory("graft-curstream-ckpt").toString
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val base = System.currentTimeMillis() - 3600000L
    def writeChunk(df: DataFrame, i: Int): Unit = {
      val tmp = Files.createTempDirectory("graft-curstream-chunk").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(dataDir, f"chunk-$i%03d.parquet")
      Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(base + i * 60000L))
    }
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    writeChunk(docs.filter(col("doc_id") < c1), 0)
    writeChunk(docs.filter(col("doc_id") >= c1 && col("doc_id") < c2), 1)
    writeChunk(docs.filter(col("doc_id") >= c2), 2)

    val byId = scala.collection.concurrent.TrieMap
      .empty[Long, (Double, Double, Boolean, Boolean, Boolean, Boolean)]
    val deliveries = new java.util.concurrent.atomic.AtomicLong
    @volatile var crashOnce = true

    def startQuery() = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
      CurationStream.manifest(stream, hot).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect()
          deliveries.addAndGet(rows.length.toLong)
          rows.foreach(r => byId.put(r.getLong(0),
            (r.getDouble(1), r.getDouble(2), r.getBoolean(3),
              r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
          // die AFTER the side effect, BEFORE the offset/state commit —
          // the replayed batch must recompute identical verdicts (state
          // rolls back with the batch)
          if (crashOnce) { crashOnce = false; sys.error("injected crash") }
          ()
        }.start()
    }

    val q1 = startQuery()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q1.awaitTermination(60000))
    val q2 = startQuery()
    assert(q2.awaitTermination(120000), "restarted query did not finish in time")
    q2.stop()

    // at-least-once was real: the crashed batch delivered twice...
    assert(deliveries.get() > ids.length.toLong,
      s"expected a redelivered batch: ${deliveries.get()} deliveries for ${ids.length} docs")
    // ...and idempotent-by-doc_id absorption leaves exactly the corpus
    assert(byId.size == ids.length, s"got ${byId.size} of ${ids.length} docs")

    // every per-gate verdict equals the batch manifest's
    byId.foreach { case (id, (q, bf, qOk, bOk, canon, keep)) =>
      val (bq, bbf, bqOk, bbOk, bcanon) = batch(id)
      assert(q == bq && bf == bbf,
        s"doc $id scores: stream ($q, $bf) vs batch ($bq, $bbf)")
      assert(qOk == bqOk && bOk == bbOk && canon == bcanon,
        s"doc $id verdicts: stream ($qOk, $bOk, $canon) vs batch ($bqOk, $bbOk, $bcanon)")
      assert(keep == (qOk && bOk && canon), s"doc $id keep must compose its gates")
    }
    // the documented band exclusion: batch p20 keep (which ALSO gates on
    // the corpus-global surprisal band) is a strict subset of the stream's
    val streamKeep = byId.collect { case (id, t) if t._6 => id }.toSet
    assert(batchKeep.subsetOf(streamKeep),
      s"batch keep must be contained in stream keep: ${(batchKeep -- streamKeep).take(5)}")
    assert(streamKeep.size > batchKeep.size,
      "the band gate must actually drop something in batch, or this pin is vacuous")
  }
}
