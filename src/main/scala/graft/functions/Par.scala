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

  /** Evaluate the thunks concurrently (one driver thread each — job
    * descriptions and scheduler pools are thread-local, which is exactly
    * the documented mechanism for overlapping independent Spark jobs)
    * and return their results in order. Exceptions propagate to the
    * caller like the sequential form's would.
    */
  def run[T](thunks: (() => T)*): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = thunks.map(t => Future(t()))
    fs.map(f => Await.result(f, Duration.Inf))
  }
}
