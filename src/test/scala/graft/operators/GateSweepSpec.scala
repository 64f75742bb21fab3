package graft.operators

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Stale-gate sweep (ADVICE r8): dead-pid stores are reaped, live
  * ones (our own, init's) and non-gate names are never touched.
  */
class GateSweepSpec extends AnyFunSuite {

  private val md5 = "0123456789abcdef0123456789abcdef"

  private def mk(name: String): java.nio.file.Path = {
    val d = Paths.get("/tmp", name)
    Files.createDirectories(d)
    Files.write(d.resolve("payload"), "x".getBytes)
    d
  }

  test("sweep deletes dead-pid gate stores only") {
    // A pid that certainly does not exist: beyond pid_max ranges is
    // unsafe to assume, so probe downward from a large value.
    val deadPid = Iterator.iterate(999999L)(_ - 1)
      .find(p => !ProcessHandle.of(p).isPresent).get
    val self = ProcessHandle.current().pid()

    val dead = mk(s"graft_ivfpq_index_${md5}_${deadPid}_42")
    val deadDd = mk(s"graft_dedup_ingest_${md5}_${deadPid}_7")
    val mine = mk(s"graft_ingest_gate_${md5}_${self}_42")
    val init = mk(s"graft_ivfpq_index_${md5}_1_42") // pid 1 is alive
    val other = mk(s"graft_unrelated_${md5}_${deadPid}_42")

    try {
      GateSweep.resetForTest()
      GateSweep.sweepStale()
      assert(!Files.exists(dead), "dead-pid store must be reaped")
      assert(!Files.exists(deadDd), "dead-pid store must be reaped")
      assert(Files.exists(mine), "our own store must survive")
      assert(Files.exists(init), "a live pid's store must survive")
      assert(Files.exists(other), "unknown name families are not ours")
      // Idempotence: a second call in the same JVM is a no-op even
      // if new stale dirs appear (once-per-JVM contract).
      val late = mk(s"graft_ivfpq_index_${md5}_${deadPid}_43")
      GateSweep.sweepStale()
      assert(Files.exists(late))
    } finally {
      Seq(mine, init, other).foreach { d =>
        Files.deleteIfExists(d.resolve("payload"))
        Files.deleteIfExists(d)
      }
      val late = Paths.get("/tmp", s"graft_ivfpq_index_${md5}_${deadPid}_43")
      Files.deleteIfExists(late.resolve("payload"))
      Files.deleteIfExists(late)
      GateSweep.resetForTest()
    }
  }
}
