package graft.ops

/** Bounded overlap for INDEPENDENT blocking Spark actions — the guide
  * §2.6 pattern ("submit from a small thread pool … 2-3 jobs in flight
  * is plenty") with the round-15 verdict's hardening: the sweeps used
  * to run blocking actions as bare Futures on the global fork-join
  * pool with no `blocking{}` wrapper, so a wide sweep could starve the
  * cores-sized pool (and anything else sharing it). Each call here gets
  * its own small EPHEMERAL daemon pool instead:
  *
  *  - in-flight work is capped per sweep (`cap`, default 3) — enough to
  *    back-fill a chain's driver-latency gaps and straggler tails, not
  *    enough to fight for executor slots;
  *  - a dedicated fixed pool cannot deadlock on independent thunks and
  *    cannot starve unrelated users of a shared pool; nested overlaps
  *    (a thunk that itself overlaps) get their own pool, so there is no
  *    cross-level interaction at all;
  *  - the pool is created on the caller's thread, so Spark's
  *    inheritable thread-locals (job group / description) propagate to
  *    the overlapped jobs, and it dies with the call.
  *
  * Results keep input order; the first failing thunk rethrows from
  * `all` after the remaining threads are abandoned to the daemon pool.
  */
object Overlap {
  /** Guide §2.6: 2-3 jobs in flight is plenty. */
  val DEFAULT_CAP = 3

  def all[A](thunks: Seq[() => A], cap: Int = DEFAULT_CAP): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) thunks.map(_())
    else begin(thunks, cap).map(_())
  }

  /** Start the thunks on their own bounded daemon pool and return JOIN
    * handles instead of blocking — the deferred form of [[all]] for
    * work whose consumer is far downstream (e.g. a streaming replay's
    * drain-only standing fits, which can build while the stream runs
    * instead of delaying its start). Each handle blocks until its thunk
    * finishes and rethrows its failure; the pool drains itself after
    * the last thunk (shutdown is pre-issued, threads are daemons).
    */
  def begin[A](thunks: Seq[() => A], cap: Int = DEFAULT_CAP): Seq[() => A] = {
    if (thunks.isEmpty) Seq.empty
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(math.max(cap, 1), thunks.size),
        new java.util.concurrent.ThreadFactory {
          override def newThread(r: Runnable): Thread = {
            val t = new Thread(r, "graft-overlap")
            t.setDaemon(true)
            t
          }
        })
      implicit val ec: scala.concurrent.ExecutionContextExecutorService =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val fs = thunks.map(t => scala.concurrent.Future(t()))
      pool.shutdown() // already-submitted tasks still run; pool dies after
      fs.map(f => () =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
    }
  }
}
