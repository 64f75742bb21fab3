package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketing: the co-located-join scale recipe. Writing both sides
  * bucketed (and sorted) by the join key lets a sort-merge join read
  * bucket i against bucket i with NO shuffle exchange on either side —
  * at 100 TB that turns the biggest fact⋈fact cost (two full-data
  * shuffles) into a partition-local merge. Broadcast is disabled in
  * the test so the plan can't cheat its way around the shuffle.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables sort-merge join without shuffle exchanges") {
    val o = Tables(spark, sf, "orders").select("o_custkey", "o_totalprice")
    val c = Tables(spark, sf, "customer").select("c_custkey", "c_acctbal")
    o.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    c.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_cust")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_cust"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      val n = j.count()
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      // Bucket layout satisfies the join's distribution requirement:
      // no hash-partitioning exchange may appear below the join.
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"))
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"))
      // Equivalent to the unbucketed join.
      val plainCount = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(spark.table("b_orders").join(spark.table("b_cust"),
        col("o_custkey") === col("c_custkey")).count() === plainCount)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("salted two-phase aggregation equals the plain aggregation") {
    val df = Tables(spark, sf, "customer")
      .withColumn("bal_dec", Exact.money(col("c_acctbal")))
    val salted = SkewTools
      .saltedAgg(df, "c_nationkey", Seq("bal_dec"), salts = 16)
      .collect().map(r => (r.getAs[Int]("c_nationkey"),
        r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("sum_bal_dec")))
      .sortBy(_._1)
    val plain = SkewTools.plainAgg(df, "c_nationkey", Seq("bal_dec"))
      .collect().map(r => (r.getAs[Int]("c_nationkey"),
        r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("sum_bal_dec")))
      .sortBy(_._1)
    assert(salted.map(t => (t._1, t._2)).toSeq ===
      plain.map(t => (t._1, t._2)).toSeq)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s._3.compareTo(p._3) === 0)
    }
  }
}
