package graft.operators

/** Stale gate-store sweeper (ADVICE r8). The declared-query gate
  * harnesses key their on-disk stores under /tmp by corpus md5 +
  * pid + session identity hash (so concurrent sessions cannot
  * clobber each other mid-read), and delete a store only when the
  * SAME path is rebuilt — which a new session never does, so every
  * exited session leaked a full signature/shingle or index store.
  * Each JVM therefore sweeps ONCE, on first gate use, every sibling
  * store whose embedded pid is no longer alive; stores of live
  * processes (including our own) are never touched. The
  * `graft_sharded_*` sink gate is appId-keyed (no pid to probe) and
  * is deliberately out of scope — its per-run output is one sorted
  * file, not a corpus-sized store.
  */
object GateSweep {

  /** The pid-keyed gate families:
    * graft_{dedup_ingest | ingest_gate | ivfpq_index | tok_store |
    * vindex | vsplit | pipe_ingest | pipe_compact}_<md5>_<pid>_<hash>.
    */
  private val Pat =
    "^graft_(?:dedup_ingest|ingest_gate|ivfpq_index|tok_store|uni_store|vindex|vsplit|pipe_ingest|pipe_compact)_[0-9a-f]{32}_([0-9]+)_(-?[0-9]+)$".r

  private val done = new java.util.concurrent.atomic.AtomicBoolean(false)

  private[graft] def resetForTest(): Unit = done.set(false)

  /** Delete /tmp gate stores whose pid is dead. Idempotent per JVM. */
  def sweepStale(): Unit = if (done.compareAndSet(false, true)) {
    val self = ProcessHandle.current().pid()
    val tmp = new java.io.File("/tmp")
    Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach { f =>
        f.getName match {
          case Pat(pid, _) if f.isDirectory && pid.toLong != self && {
              val h = ProcessHandle.of(pid.toLong)
              !(h.isPresent && h.get().isAlive)
            } =>
            deleteRec(f)
          case _ => ()
        }
      }
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRec)
    f.delete(): Unit
  }
}
