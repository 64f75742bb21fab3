package graft.plans

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  private val rnd = new Random(7)

  test("optimizer rewrites the HOF dot-product pattern to graft_ddot") {
    // Parquet-backed input (a literal LocalRelation would be fully
    // constant-folded before the plan can be inspected).
    val df = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"),
        aggregate(zip_with(col("v"), reverse(col("v")), (x, y) => x * y),
          lit(0.0d), (acc, p) => acc + p).as("dot"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_ddot"))
    // Result identical to a driver-side strict fold.
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    df.collect().foreach { r =>
      val v = vecs(r.getLong(0))
      val want = v.zip(v.reverse)
        .foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      assert(r.getDouble(1) === want)
    }
  }

  test("a non-matching pattern is left untouched") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0d), (acc, p) => acc + p).as("dot")) // zero != 0.0
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_ddot"))
    assert(df.head().getDouble(0) === 1.0 + 3.0 + 8.0)
  }

  test("native functions are callable from SQL") {
    val r = spark.sql(
      """SELECT graft_ddot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
         graft_simhash60(array(7L)) AS s,
         graft_minhash(array(5L), 2) AS m""").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 7L) // single token: simhash == its hash
    assert(r.getSeq[Long](2) === Seq((37L * 5 + 17) % 2147483647L,
      (138L * 5 + 148) % 2147483647L))
  }
}
