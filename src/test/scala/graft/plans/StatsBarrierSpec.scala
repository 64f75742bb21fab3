package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.statsBarrier

import graft.SparkSpec

/** Pins the iterative-plan stats explosion and its fix.
  *
  * `Dataset.localCheckpoint` truncates lineage but carries the origin
  * plan's `Statistics` into the new `LogicalRDD` (Spark ≥ 3.2). A
  * fixpoint loop whose round self-joins the previous round's frame
  * therefore SQUARES the estimated `sizeInBytes` each round — the
  * BigInteger doubles in bit length per round, and past ~25 rounds
  * every `optimizedPlan` access spends minutes in BigInteger
  * multiplication on the driver while executors sit idle (this wedged
  * dd_semantic's connected components at the 32× scale fixture).
  *
  * [[statsBarrier]] re-wraps the checkpointed rows in a LogicalRDD
  * with no origin stats. The spec runs the same 8-round label loop
  * both ways and asserts (a) the unguarded loop really does compound
  * (the failure mode stays reproducible — if a future Spark stops
  * propagating stats the barrier can be retired), and (b) the guarded
  * loop's estimate stays flat, while both produce identical rows.
  */
class StatsBarrierSpec extends SparkSpec {

  private def loop(guard: Boolean): (Seq[Int], org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val b = (df: org.apache.spark.sql.DataFrame) =>
      if (guard) statsBarrier(df) else df
    // 100-node path graph: labels(k) -> k-1 chains, worst-ish case.
    var df = b((1L to 100L).toDF("node")
      .select(col("node"), greatest(col("node") - 1L, lit(1L)).as("c"))
      .localCheckpoint())
    val bits = (1 to 8).map { _ =>
      val jump = df.as("a")
        .join(df.select(col("node").as("c"), col("c").as("cc")), "c")
        .select(col("a.node").as("node"), col("cc").as("c"))
      df = b(df.union(jump).groupBy("node").agg(min(col("c")).as("c"))
        .localCheckpoint())
      df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    }
    (bits, df)
  }

  test("unguarded checkpoint loop compounds sizeInBytes exponentially") {
    val (bits, _) = loop(guard = false)
    assert(bits.last > 4 * bits.head,
      s"stats no longer compound ($bits) — statsBarrier may be retirable")
  }

  test("statsBarrier keeps sizeInBytes flat and rows identical") {
    val (bits, guarded) = loop(guard = true)
    assert(bits.max <= 2 * bits.min,
      s"guarded loop still compounds: $bits")
    val (_, raw) = loop(guard = false)
    assert(guarded.orderBy("node").collect().toSeq ==
      raw.orderBy("node").collect().toSeq)
  }
}
