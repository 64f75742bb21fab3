package graft.operators

/** Stderr phase timer — the [[Lineage]] `timed` discipline one level
  * down: a store build whose cold cost trends wrong at octave scale
  * (VERDICT r12 items 1 and 6) must attribute its wall to named
  * phases without a rerun under a profiler. Sub-second phases stay
  * silent; the lines land next to `lineage: built …` in the same
  * stderr stream Bench archives.
  */
object PhaseLog {
  def phase[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    if (sec > 0.5) System.err.println(f"phase: $tag $sec%.1f s")
    r
  }
}
