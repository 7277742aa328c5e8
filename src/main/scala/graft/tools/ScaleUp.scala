package graft.tools

import org.apache.spark.sql.functions._

/** Tile the LLM-pipeline fixture tables (documents, embeddings, events)
  * K× into a larger scale factor for the SCALING-HONESTY sweep:
  *   tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 bench/sf0.3 3
  *
  * The copies are INDEPENDENT WORLDS with disjoint key spaces — doc/vec/
  * event/user ids shift by copy × (max+1), and copy k's tokens carry a
  * distinct one-letter prefix so no shingle, gram, or vocabulary entry
  * collides across copies (embeddings take a copy-specific jitter on
  * their first component for the same reason). That is the deliberate
  * scaling model: "the corpus were K× bigger" with K× rows, K× vocab,
  * K× clusters — so an operator whose declared cost shape is linear in
  * the corpus should measure ≈K× here, and anything super-linear is the
  * operator's own pair/closure blowup, not a cross-copy artifact of the
  * tiling. (Tiling with IDENTICAL text would instead manufacture K²
  * near-dup pairs across copies and distort exactly the dedup queries
  * the sweep is supposed to grade.)
  *
  * Bench-only data (gitignored): oracle gates keep running against the
  * driver-generated fixtures, never against this derivative.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "bench/sf0.3"
    val copies = if (args.length > 2) args(2).toInt else 3
    val prefixes = Seq("", "q", "x", "j", "v", "w", "y", "z", "k")
    require(copies <= prefixes.length, s"at most ${prefixes.length} copies")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, src)
    val dShift = docs.agg(max(col("doc_id"))).first().getLong(0) + 1
    (0 until copies).map { k =>
      val text =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "\\b(\\w)", prefixes(k) + "$1")
      docs.select((col("doc_id") + k * dShift).as("doc_id"), text.as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("bigint"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = graft.Tables.embeddings(spark, src)
    val vShift = emb.agg(max(col("vec_id"))).first().getLong(0) + 1
    (0 until copies).map { k =>
      val e =
        if (k == 0) col("embedding")
        else transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(k * 0.001f)).otherwise(x))
      emb.select((col("vec_id") + k * vShift).as("vec_id"),
        e.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    val ev = graft.Tables.events(spark, src)
    val eShift = ev.agg(max(col("event_id"))).first().getLong(0) + 1
    val uShift = ev.agg(max(col("user_id"))).first().getLong(0) + 1
    (0 until copies).map { k =>
      ev.select((col("event_id") + k * eShift).as("event_id"), col("ts"),
        (col("user_id") + k * uShift).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    println(s"wrote ${copies}x of $src to $dst")
    spark.stop()
  }
}
