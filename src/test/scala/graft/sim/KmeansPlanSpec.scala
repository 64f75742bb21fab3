package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan audit for the Lloyd's rounds (VERDICT r6 item 2's "no
  * driver-side loop over vectors" condition): one k-means round must
  * be a BROADCAST of the KB-sized centroid/codebook table into a
  * narrow scoring pass plus a partially-aggregated update shuffle —
  * never a CartesianProduct, never a collect.
  */
class KmeansPlanSpec extends SparkSpec {

  test("centroid round: broadcast scoring + partial-agg update, " +
      "no cartesian product") {
    val e = VectorSearch.vecs(spark, sf)
    val eq = e.select(col("vec_id"),
      transform(col("v"), x => floor(x * lit(1000000.0)).cast("long"))
        .as("qv"))
    val cent = e.filter(col("vec_id") < VectorSearch.NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        lit(1.0).as("cn"))
    val plan = VectorSearch.kmeansRound(e, eq, cent)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "centroid table not broadcast")
    assert(!plan.contains("CartesianProduct"),
      "scoring degenerated to a cartesian product")
    // The (cid, idx) update aggregates partially before its exchange.
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "no partial aggregation in the centroid update")
  }

  test("codebook round: broadcast per-subspace scoring, no cartesian") {
    val e = VectorSearch.vecs(spark, sf)
    val sub = VectorSearch.subvecs(e)
    val subq = sub.select(col("vec_id"), col("m"),
      transform(col("sv"), x => floor(x * lit(1000000.0)).cast("long"))
        .as("sq"))
    val cb = sub.filter(col("vec_id") < VectorSearch.PqCodes)
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sv").as("cbv"))
    val plan = VectorSearch.pqRound(sub, subq, cb)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"))
    assert(!plan.contains("CartesianProduct"))
  }
}
