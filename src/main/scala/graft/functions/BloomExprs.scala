package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
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
}
