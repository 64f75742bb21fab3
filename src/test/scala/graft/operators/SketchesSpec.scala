package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.{SparkSpec, Tables}
import graft.functions.TextHash.tokens
import graft.text.TextAnalysis

class SketchesSpec extends SparkSpec {

  test("quantile sketch: every estimate is a real element within the " +
    "GK rank band; plan is a partial/final sketch merge") {
    val exact = TextAnalysis.quality(spark, sf)
      .filter(col("mean_tok_len").isNotNull)
      .select("mean_tok_len").collect().map(_.getDouble(0)).sorted
    val n = exact.length
    val df = Sketches.quantileSketch(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getDouble(0)).toSeq === Sketches.Quantiles)
    // GK guarantee: the returned value is an element of the data whose
    // rank is within n/Accuracy of the target rank (+1 for the
    // boundary convention slack between q·n and q·(n−1)).
    val tol = math.max(1L, n / Sketches.Accuracy) + 1
    rows.foreach { r =>
      val (q, v) = (r.getDouble(0), r.getDouble(1))
      val first = exact.indexWhere(_ == v)
      val last = exact.lastIndexWhere(_ == v)
      assert(first >= 0, s"q=$q estimate $v is not an element of the data")
      val target = q * (n - 1)
      assert(target >= first - tol && target <= last + tol,
        s"q=$q estimate $v occupies ranks [$first,$last], " +
          s"target $target exceeds tolerance $tol")
    }
    // Scale shape: the sketch must build map-side (partial) and merge
    // (final) — two percentile_approx occurrences in the object-hash
    // aggregate pair, never a global sort of the raw values.
    val plan = df.queryExecution.executedPlan.toString
    assert("percentile_approx".r.findAllIn(plan).size >= 2 &&
      plan.contains("ObjectHashAggregate"),
      s"expected partial+final sketch aggregate in:\n$plan")
  }

  test("count-min sketch over the token stream: estimates are " +
    "one-sided and within eps*N at the declared confidence") {
    val t = Tables(spark, sf, "documents")
      .select(explode(tokens(col("text"))).as("token"))
    val eps = 0.001
    val bytes = t
      .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    val exact = t.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val bound = math.ceil(eps * total).toLong
    // One-sided: CMS never undercounts.
    exact.foreach { case (tok, c) =>
      assert(cms.estimateCount(tok) >= c,
        s"CMS undercounted '$tok': ${cms.estimateCount(tok)} < $c")
    }
    // Within-eps holds per item with prob 1−δ = 0.99; with the fixed
    // seed the run is deterministic, so allow the expected tail.
    val over = exact.count { case (tok, c) =>
      cms.estimateCount(tok) > c + bound
    }
    assert(over <= math.max(1, exact.size / 20),
      s"$over of ${exact.size} tokens exceed the eps*N=$bound bound")
  }

  test("misra-gries: superset guarantee on a skewed stream where " +
      "distinct >> counters; query output equals exact heavy set") {
    import spark.implicits._
    // Deterministic Zipf-ish stream: item id = 10^6 / (i+1) collapses
    // a 200k-element range onto ~1.4k distinct values with a heavy
    // head (item "1000000" appears once, item "5" ~ 33k times).
    val n = 200000L
    val stream = spark.range(n)
      .select((lit(1000000) / (col("id") + 1)).cast("long")
        .cast("string").as("item"))
    val k = 64
    val candidates = stream.as[String]
      .mapPartitions(it => Sketches.misraGries(k, it))
      .collect().toSet
    assert(candidates.size <= k * 32,
      "each partition emits at most k candidates")
    val exact = stream.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size > 2 * k,
      s"fixture must stress pruning: ${exact.size} distinct <= 2k")
    // Any item with global count > N/(k+1) MUST be a candidate.
    val mustKeep = exact.filter(_._2 > n / (k + 1)).keySet
    assert(mustKeep.nonEmpty)
    val missed = mustKeep -- candidates
    assert(missed.isEmpty, s"MG dropped guaranteed heavy items: $missed")

    // And the declared query's output is the EXACT phi-frequent set
    // over the real corpus (threshold from the same arithmetic as the
    // oracle), independent of MG internals.
    val rows = Sketches.heavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allBigrams = graft.Tables(spark, sf, "documents")
      .select(graft.functions.TextHash.tokens(col("text")).as("toks"))
      .as[Seq[String]].collect()
      .flatMap(t => t.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
    val thr = math.ceil(allBigrams.length / Sketches.HHDenom.toDouble).toLong
    val truth = allBigrams.groupBy(identity).view
      .mapValues(_.length.toLong).filter(_._2 >= thr).toMap
    assert(rows === truth)
  }
}
