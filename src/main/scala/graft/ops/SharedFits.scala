package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive fitted artifacts that several query
  * entry points would otherwise recompute identically — the duplicate-
  * cluster assignment consumed by three `dedup_cluster*` queries and the
  * DSIR importance model consumed by `text_dsir` and `text_select_pack`.
  * This is the production-DAG shape: a pipeline computes the cluster
  * assignment (or fits the model) ONCE and fans it out; per-query
  * refitting was pure-query discipline paying a real cost (~15 s of the
  * sf0.1 bench was repeated work).
  *
  * Lifetime note: most entries are MODEL-sized (centroids, merge tables,
  * driver doubles), but a few are CORPUS-LINEAR localCheckpointed frames
  * (BM25 postings, the chunk postings, the standing minhash band index,
  * the standing cluster assignment) whose blocks stay pinned in executor
  * storage until [[clear]] or session stop. A long-lived session serving
  * many corpora should `clear` between corpora — the bench does exactly
  * that between iterations — and a deployment that wants the artifacts
  * WITHOUT the pinned blocks reads them back from the FitStore instead.
  *
  * Queries stay pure: the key is (session, artifact id), the cached value
  * is exactly what recomputation would produce — every producer routed
  * through here is deterministic (integer/decimal arithmetic, seeded
  * hashes), so a hit changes cost, never results. Checkpointed frames
  * live in the owning session's block manager, hence the session in the
  * key; entries of stopped sessions are dropped on the next access so a
  * long-lived process cycling sessions doesn't pin dead state.
  */
object SharedFits {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), AnyRef]

  /** NOT computeIfAbsent: a producer may itself memo a sub-artifact (the
    * cluster assignment memoizes the Jaccard pair frame mid-compute), and
    * ConcurrentHashMap.computeIfAbsent throws "Recursive update" when the
    * nested insert lands in the same hash bin — a latent, hash-layout-
    * dependent crash. Plain get → compute → putIfAbsent is re-entrant;
    * a concurrent double-compute is benign (producers are deterministic,
    * first put wins) and cannot happen in the single-threaded query-
    * construction path anyway.
    */
  def memo[T <: AnyRef](spark: SparkSession, key: String)(compute: => T): T = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val k = (spark, key)
    val hit = cache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = compute
      val prev = cache.putIfAbsent(k, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  /** Drop every artifact owned by `spark`. The bench calls this between
    * timed iterations so each iteration re-pays the shared-fit cost —
    * min-of-iterations then de-noises GC/suite-length spikes WITHOUT
    * hiding the first-consumer chain cost behind a warm memo (a warm
    * second iteration would bench the fit-sharing queries as filter-only).
    */
  def clear(spark: SparkSession): Unit =
    cache.keySet.removeIf(k => k._1 eq spark)
}
