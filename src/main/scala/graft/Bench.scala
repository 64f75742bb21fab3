package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * Each query is forced through the `noop` sink rather than `count()`:
  * count() lets Catalyst prune the whole projection (a select-only
  * query would be measured as a metadata count), while noop executes
  * the full physical plan and discards rows executor-side — the
  * honest cost of the query without sink overhead.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm the JVM/codegen paths once on the smallest SF so the
    // measured numbers are steady-state, not JIT noise.
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }

    // Optional comma-separated subset for targeted perf iteration
    // (e.g. SPARK_GRAFT_ONLY=wc_wordcount,q5_nation_revenue); the
    // driver never sets it, so its runs stay full-surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // set-but-empty env var = no filter
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { run(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        name -> (if (ok) sec else -1.0)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
