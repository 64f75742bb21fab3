package graft.operators

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")

  test("uniform sample is deterministic under a fixed seed") {
    val a = Sampling.uniform(docs, 0.3, seed = 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.uniform(docs, 0.3, seed = 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    // Bernoulli at 30% of 500: a loose 3-sigma band.
    assert(a.length > 90 && a.length < 215)
  }

  test("stratified sample respects per-stratum fractions") {
    val fractions = Map("en" -> 0.5, "de" -> 0.1, "es" -> 0.1,
      "fr" -> 0.1, "zh" -> 0.1)
    val sampled = Sampling.stratified(docs, "lang", fractions, seed = 11)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (lang, f) =>
      val got = sampled.getOrElse(lang, 0L).toDouble
      val expect = totals(lang) * f
      // within 4 sigma of the binomial expectation
      val sigma = math.sqrt(totals(lang) * f * (1 - f))
      assert(math.abs(got - expect) <= 4 * sigma + 1,
        s"$lang: got $got expect $expect")
    }
    // Deterministic under the seed.
    val again = Sampling.stratified(docs, "lang", fractions, seed = 11)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val first = Sampling.stratified(docs, "lang", fractions, seed = 11)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.toSeq === first.toSeq)
  }
}
