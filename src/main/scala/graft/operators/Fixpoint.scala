package graft.operators

import org.apache.spark.sql.SparkSession

/** SHUFFLE-PARTITION SCOPE for iterative fixpoint loops (round 6).
  *
  * Every driver-coordinated fixpoint in the engine (CC min-label,
  * PageRank power iteration, BFS relaxation, ancestor doubling) runs
  * a handful of shuffles per round over frames whose row count is
  * known up front. At the session's full partition count those rounds
  * are pure scheduler/exchange LATENCY on near-empty partitions —
  * traced on the CC loop at the 64× fixture: 22 rounds × ~0.8 s over
  * a 128k-row label frame on 32 partitions, dropping to ~0.5 s/round
  * at 8. This helper scopes `spark.sql.shuffle.partitions` to
  * ~[[RowsPerPartition]] rows per partition (floor 8, capped at the
  * session setting) for the duration of the loop and restores it
  * after — the same conf-scope/restore discipline as
  * [[graft.streaming.RateIngest]]/[[graft.streaming.Resume]].
  *
  * At production scale the cap keeps every partition (rows/250k ≥
  * the session setting), so this is a fixture/latency regime
  * optimization that degrades to a no-op exactly when the data is
  * big enough to need full parallelism. Wrap the WHOLE build —
  * including any pre-loop `repartition(key)` of a reused edge frame —
  * so the per-round joins co-partition with the loop and the
  * pinned exchange is actually reused.
  */
object Fixpoint {

  val RowsPerPartition = 250000L

  def withScopedShuffle[T](s: SparkSession, nRows: Long)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(8L,
      math.min(prev.toLong, nRows / RowsPerPartition)).toString
    s.conf.set("spark.sql.shuffle.partitions", parts)
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
