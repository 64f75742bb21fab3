package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Runtime Bloom-filter injection — the AUTOMATIC form of the
  * prefilter `graft.dedup.Dedup.bloomDecontam` builds by hand.
  *
  * When a shuffle join has a small, selectively-filtered creation
  * side, Spark's `InjectRuntimeFilter` plants a
  * `BloomFilterAggregate` subquery on it and guards the big
  * (application) side's scan with `might_contain(...)` — so at 100 TB
  * the fact scan drops non-joining rows BEFORE the shuffle, exactly
  * the bytes-per-key argument documented on [[graft.dedup.Dedup]].
  * This spec pins down (a) the conditions under which the engine gets
  * that plan (shuffle join + selective creation-side predicate), (b)
  * that the filter lands on the fact side, and (c) that the rewrite
  * is answer-preserving — so the capability the dedup tier relies on
  * manually is also gated in its automatic form.
  *
  * Thresholds are lowered for fixture-sized inputs: the defaults
  * (10 GB application-side scan) exist to stop the rewrite from
  * paying bloom-build cost on joins too small to care; the PLAN SHAPE
  * is what is under test.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withRuntimeFilterConfs[A](body: => A): A = {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k))
    c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    c.set("spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold", "1")
    c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "100MB")
    // -1: a broadcast join already prunes at the probe; the runtime
    // filter exists for the SHUFFLE join regime (both sides big).
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  /** Selective dim (≈1/10 of part) joined to the lineitem fact. */
  private def factDimJoin = {
    val li = Tables(spark, sf, "lineitem")
    val dim = Tables(spark, sf, "part")
      .filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey"), col("p_name"))
    li.join(dim, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("p_name"))
  }

  test("a selective shuffle join gets might_contain on the fact side") {
    withRuntimeFilterConfs {
      val plan = factDimJoin.queryExecution.optimizedPlan.toString()
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(4000)}")
      assert(plan.contains("bloom_filter_agg"),
        "creation side must build the bloom via the aggregate form " +
          "(mergeable partials, same shape as stat.bloomFilter)")
      // The guard must sit on the FACT side: the probe argument is
      // the fact join key, not the dim key.
      assert(plan.contains("might_contain") && plan.contains("l_partkey"),
        "probe must reference the application-side key")
    }
  }

  test("the injected filter is answer-preserving") {
    val expected = factDimJoin.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val got = withRuntimeFilterConfs {
      factDimJoin.collect().map(_.toSeq).sortBy(_.mkString("|"))
    }
    assert(got.nonEmpty)
    assert(got.toSeq === expected.toSeq)
  }
}
