package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation

import graft.SparkSpec

/** Pins the tokenized-table cache boundary (round 6).
  *
  * CacheManager substitutes a persisted plan into ANY query whose
  * analyzed plan contains a sameResult subtree — caching is not
  * opt-in per consumer. The three multi-branch inverted-index
  * builders (tfidf, tfidf_sim, pmi) measure FASTER re-tokenizing
  * per query than decoding the cached serialized `array<string>`
  * across their 2× reads, so `TextAnalysis.tokenized` deliberately
  * caches a (toks, doc_id) projection whose column order keeps their
  * direct-scan plans from matching. This suite fails if a refactor
  * reunifies the projections and silently rewires the opt-outs back
  * into the cache (the regression measured ~1.7× on ta_tfidf before
  * the order flip), or if the intended consumers stop hitting it.
  */
class CacheSubstitutionSpec extends SparkSpec {

  private def readsCache(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case r: InMemoryRelation => r
    }.nonEmpty

  test("shared-token consumers read the cache; tfidf/tfidf_sim/pmi stay raw") {
    assume(!sys.env.get("SPARK_GRAFT_LINEAGE").contains("off"))
    // Materialize the shared token table through a consumer.
    TextAnalysis.queries("ta_winnow")(spark, sf).count()

    assert(readsCache(TextAnalysis.queries("ta_winnow")(spark, sf)),
      "ta_winnow should read the shared tokenized cache")
    assert(readsCache(TextAnalysis.queries("ta_repetition")(spark, sf)),
      "ta_repetition should read the shared tokenized cache")

    // tfidf/tfidf_sim/pmi: multi-branch decode ×2 loses to re-tokenize;
    // bigrams/array_funcs: cheap consumers whose decode costs more than
    // their whole downstream.
    for (q <- Seq("ta_tfidf", "ta_tfidf_sim", "ta_pmi",
        "ta_bigrams", "ta_array_funcs"))
      assert(!readsCache(TextAnalysis.queries(q)(spark, sf)),
        s"$q opted out of the tokenized cache but its plan was " +
          "substituted — the cached projection's column order no " +
          "longer differs from the direct scans (see tokenized Scaladoc)")
  }
}
