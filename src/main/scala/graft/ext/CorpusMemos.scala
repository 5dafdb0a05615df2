package graft.ext

import java.util.concurrent.CopyOnWriteArrayList

/** JVM-wide registry of every per-corpus / per-artifact memo map, so
  * paths that REGENERATE a corpus at an existing location within one JVM
  * (ScaleGen, test fixture rebuilds) can drop all of them in one call
  * (ADVICE r14 — r13 added [[graft.queries.JoinHints.clearStats]] for
  * the broadcast-gate statistic, but the r14 calibration layer grew five
  * more memos with no invalidation hook: a regenerated corpus would
  * resolve a STALE shortlist / nprobe / table-count geometry, the exact
  * staleness class the JoinHints doc calls out).
  *
  * Usage: wrap the map construction — `CorpusMemos.register(new
  * ConcurrentHashMap[...])` — and the map participates in
  * [[clearAll]]. Registration is for maps keyed by corpus dir or
  * artifact path (directly or as a key prefix); session-free caches of
  * WRITTEN artifacts ([[ArtifactCache]]) register too, because a
  * regenerated corpus invalidates every artifact derived from it.
  */
object CorpusMemos {

  private val maps = new CopyOnWriteArrayList[java.util.Map[_, _]]()

  /** Register a memo map for corpus-regeneration invalidation; returns
    * it, so the call wraps the construction site.
    */
  def register[M <: java.util.Map[_, _]](m: M): M = {
    maps.add(m)
    m
  }

  /** Drop every registered memo — the one hook a corpus-regenerating
    * path must call (ScaleGen does).
    */
  def clearAll(): Unit = {
    maps.forEach(m => m.clear())
    Dedup.logRoute("corpusMemos", "cleared all registered memos",
      s"maps=${maps.size()}")
  }
}
