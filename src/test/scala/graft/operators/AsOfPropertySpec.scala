package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the streaming as-of FOLD ([[AsOf.foldAsOf]]) — a pure
  * function, so it is driven directly through Spark's TestGroupState with
  * no streaming query: for ANY in-event-order per-key history split into
  * ANY micro-batch boundaries, the concatenated fold output must equal
  * the reference as-of semantics (each left event matched to the latest
  * right event at or before it). This is the claim the example-based
  * streaming test samples; the property covers the space of histories and
  * batch splits.
  */
class AsOfPropertySpec extends AnyFunSuite {

  // one history: strictly increasing event times (in-order arrival, and
  // right-ts uniqueness — the enforced precondition — for free), each a
  // left or right event with a non-null payload
  private case class Ev(tsUs: Long, isRight: Boolean, pay: String)

  private val genHistory: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(0, 40)
    sides <- Gen.listOfN(n, Gen.oneOf(true, false))
    gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    ts.lazyZip(sides).lazyZip(ts.indices).map { (t, r, i) => Ev(t, r, s"p$i") }.toList
  }

  private def genSplit(n: Int): Gen[List[Int]] =
    Gen.listOfN(n, Gen.chooseNum(0, 3)) // 0..3 = batch advance marks

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(fail("no sample"))

  /** Reference semantics: latest right at or before each left event. */
  private def reference(h: List[Ev]): List[(Long, Option[String])] = {
    var last: Option[(Long, String)] = None
    h.flatMap { e =>
      if (e.isRight) { last = Some((e.tsUs, e.pay)); None }
      else Some(e.tsUs -> last.map(_._2))
    }
  }

  test("fold over ANY batch split of an in-order history equals the reference as-of") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    (1 to 30).foreach { round =>
      val h = sample(genHistory, 1000L + round)
      val marks = sample(genSplit(h.size), 2000L + round)
      // group consecutive events into batches at the split marks
      val batches = h.lazyZip(marks).toList
        .foldLeft(List(List.empty[Ev])) { case (acc, (e, m)) =>
          if (m == 0 && acc.head.nonEmpty) List(e) :: acc
          else (e :: acc.head) :: acc.tail
        }.map(_.reverse).reverse
      var carried: Option[(Long, String)] = None
      val out = batches.flatMap { b =>
        val st = TestGroupState.create[(Long, String)](
          org.apache.spark.api.java.Optional.ofNullable(carried.orNull),
          GroupStateTimeout.NoTimeout, 0L,
          org.apache.spark.api.java.Optional.empty[Long](),
          hasTimedOut = false)
        val evs = b.map(e => AsOf.StreamEv("k",
          Some(e.tsUs), if (e.isRight) 0 else 1, e.pay))
        val res = AsOf.foldAsOf(None)("k", evs.iterator, st).toList
        carried = if (st.exists) Some(st.get) else carried
        res
      }
      val got = out.map(m => (m.ts_us.get, m.match_pay))
      assert(got == reference(h),
        s"round $round: history $h split $batches gave $got, want ${reference(h)}")
    }
  }
}
