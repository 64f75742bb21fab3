package graft.tools

/** Ad-hoc scale reproduction driver (not a spec): runs one named query
  * at an arbitrary fixture dir and prints the wall time or the full
  * exception — Bench swallows per-query throwables, so chasing an
  * sf3.2 failure needs this. Usage:
  *   sbt "Test/runMain graft.tools.ScaleRepro <dir> <name> [name...]"
  */
object ScaleRepro {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.GraftSession.fromEnv()
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"REPRO OK   $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch {
        case e: Throwable =>
          println(s"REPRO FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}
