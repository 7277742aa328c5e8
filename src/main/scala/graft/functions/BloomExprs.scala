package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Column wrappers for Spark's native bloom-filter expressions (the
  * machinery behind runtime row-level join filtering, exposed here as a
  * first-class sketch the way `hll_sketch_agg` exposes HLL): a distributed
  * bloom build is one partial-aggregated pass whose merge is a bitwise OR —
  * order-independent, so the sketch is deterministic given the item set and
  * the (items, bits) parameters.
  *
  * [[mightContain]] takes the sketch as a BYTE-ARRAY LITERAL, not a column:
  * `BloomFilterMightContain` requires its filter side to be constant-
  * foldable (it deserializes the sketch once per task), which is exactly
  * the right contract for a trained gate artifact — megabytes of bits
  * shipped in the plan like the SRP plane literals, applied per row with
  * no join at all.
  */
object Bloom {

  /** Aggregate a LongType column into a serialized bloom filter (binary).
    * `estItems`/`numBits` fix the layout (hash count = f(items, bits)), so
    * two builds over the same item set are byte-identical.
    */
  def bloomAgg(c: Column, estItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(c),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a LongType column against a serialized sketch.
    * May return false positives; NEVER false negatives.
    */
  def mightContain(bloomBytes: Array[Byte], v: Column): Column =
    Bridge.column(BloomFilterMightContain(Literal(bloomBytes), Bridge.expression(v)))

  // ------------------------------------------------------ portable bloom

  /** PORTABLE bloom filter over STRING items — the cross-engine twin of
    * the native sketch above: positions come from fixed 5-hex-char
    * windows of ONE md5 per item (6 exact 20-bit positions, no modulo
    * bias, no second hash), bits live in a plain (idx, bits) long table
    * whose build is a bit_or aggregate — so the SAME artifact is
    * reproducible bit-for-bit by any engine with md5 (the DuckDB oracle
    * replays it, and a non-JVM ingest tier could probe it). The native
    * [[bloomAgg]] stays the fast path where cross-engine determinism
    * isn't required (q23's runtime join filter); this is the GATE
    * artifact form, where the bits themselves are part of the contract.
    */
  val PortableBloomBits: Int = 1 << 20
  val PortableBloomK: Int = 6

  /** The k exact 20-bit positions of one item: non-overlapping 5-hex
    * windows of md5(g) — identical text in, identical bits out, in any
    * engine.
    */
  def portablePositions(g: Column): Seq[Column] =
    (0 until PortableBloomK).map(i =>
      conv(substring(md5(g), i * 5 + 1, 5), 16, 10).cast("long"))

  /** DuckDB twins of [[portablePositions]] over a SQL expression. */
  def sqlPortablePositions(g: String): Seq[String] =
    (0 until PortableBloomK).map(i =>
      s"('0x' || substr(md5($g), ${i * 5 + 1}, 5))::BIGINT")

  private def shl(base: Column, by: Column): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      Bridge.expression(base), Bridge.expression(by)))

  /** Build the 2^20-bit array from a one-column (`g` STRING) distinct
    * item frame: one partial-aggregated pass (explode k positions,
    * bit_or per 64-bit word), collected to the 16384-long literal the
    * probe ships in the plan — 128 KB, the SRP-plane-literal precedent.
    */
  def portableBloomArray(items: DataFrame): Array[Long] = {
    val pos = items.select(explode(array(portablePositions(col("g")): _*)).as("p"))
    val tbl = pos
      .groupBy(expr("p div 64").as("idx"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("bits"))
    val arr = new Array[Long](PortableBloomBits / 64)
    tbl.collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership probe of a STRING column against a portable bit array:
    * all k bits present. False positives possible, false negatives
    * impossible — and, unlike the native probe, every engine that can
    * md5 agrees on WHICH false positives.
    */
  def portableMightContain(arr: Array[Long], g: Column): Column = {
    val bits = typedLit(arr.toSeq)
    portablePositions(g).map { p =>
      val word = element_at(bits, (p / 64).cast("int") + 1)
      val mask = shl(lit(1L), pmod(p, lit(64)).cast("int"))
      (word.bitwiseAND(mask)) =!= 0L
    }.reduce(_ && _)
  }
}
