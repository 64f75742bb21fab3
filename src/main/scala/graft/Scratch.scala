package graft

/** Throwaway timing scratch — not part of the engine, never committed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv()
    def run(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    args.foreach(run)
    spark.stop()
  }
}
