package graft.functions

/** Concurrent construction/materialization of INDEPENDENT plan pieces
  * (guide §2.6: Spark happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially).
  *
  * Why it exists: the shared-intermediate rule (eager localCheckpoint on
  * a subtree with several consumers) removes REDUNDANT work, but a naive
  * sequence of eager checkpoints also removes the CONCURRENCY the
  * redundant form had — inside one job, Spark schedules independent
  * duplicated subtrees in parallel, so on an underloaded local[32] the
  * duplicated plan's wall-clock is close to its critical path. Running
  * each independent checkpoint from its own driver thread restores that
  * overlap (FIFO scheduling backfills idle cores) while keeping the
  * single-evaluation economics — the total-work win that matters at
  * cluster scale AND the wall-clock win locally.
  */
object Par {

  /** Evaluate the thunks concurrently and return their results in order.
    *
    * One DEDICATED short-lived thread per thunk, never a shared pool:
    * Spark's job description / group / scheduler pool live in
    * INHERITABLE thread-locals, which a fresh thread copies from its
    * creator at `new Thread(...)` — the documented multi-job mechanism —
    * whereas a reused pool thread keeps whatever properties it captured
    * when the POOL spun it up (stale or none). A pool would also hold
    * Spark actions on uninstrumented shared threads
    * (scala.concurrent.blocking is moot with dedicated threads).
    *
    * Failure semantics (documented contract): every thunk runs to
    * completion — a failed thunk does NOT cancel its siblings (callers
    * pass idempotent materializations whose partial results are
    * harmless; cancelling mid-checkpoint buys nothing) — then the FIRST
    * failure in declaration order propagates to the caller, like the
    * sequential form's would.
    */
  def run[T](thunks: (() => T)*): Seq[T] = {
    val results = new Array[Either[Throwable, Any]](thunks.size)
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => {
        results(i) = try Right(t()) catch { case e: Throwable => Left(e) }
      }, s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    results.toSeq.map {
      case Right(v) => v.asInstanceOf[T]
      case Left(e)  => throw e
    }
  }
}
