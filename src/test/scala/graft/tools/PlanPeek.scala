package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc plan-shape peek (not a spec): prints the physical aggregate
  * nodes of the trainer argmax / collect_list shapes, so "is this a
  * HashAggregate, ObjectHashAggregate or SortAggregate" is a 30 s
  * check instead of a guess. Usage:
  *   sbt "Test/runMain graft.tools.PlanPeek"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("4", "4")
    val e = graft.sim.VectorSearch.vecs(s, "/root/testdata/sf0.001")
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))

    def shapes(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Aggregate") || l.contains("Sort "))
        .map(_.trim.take(150)).mkString("\n")

    val asg = e.join(broadcast(cent))
      .select(col("vec_id"),
        struct(lit(0.5).as("cc"), (-col("cid")).as("nid")).as("sc"))
      .groupBy("vec_id").agg(max(col("sc")).as("b"))
    println("== argmax max(struct) ==")
    println(shapes(asg))

    val cl = e.select(col("vec_id"), col("nrm"))
      .groupBy("vec_id").agg(collect_list(col("nrm")).as("l"))
    println("== collect_list ==")
    println(shapes(cl))

    val vs = e.select(col("vec_id"),
        transform(col("v"), x => floor(x * 1000).cast("long")).as("qv"))
      .groupBy("vec_id")
      .agg(graft.functions.VecSumAgg.vecSumAgg(col("qv"), 64).as("s"))
    println("== VecSumAgg ==")
    println(shapes(vs))
    s.stop()
  }
}
