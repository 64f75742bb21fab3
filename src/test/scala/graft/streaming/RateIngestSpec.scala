package graft.streaming

import graft.SparkSpec

/** Gates for `st_rate_windows` beyond the DuckDB hash: the emitted
  * frame is exactly the closed-form tumbling aggregate of the
  * deterministic rate stream, and a second invocation reproduces it
  * bit-for-bit (the generator is wall-clock independent — the whole
  * point of `rate-micro-batch` over plain `rate`).
  */
class RateIngestSpec extends SparkSpec {

  test("rate-micro-batch windows match the closed form and repeat " +
    "deterministically") {
    val rows = RateIngest.rateWindows(spark, sf).collect()
    assert(rows.length === RateIngest.ExpectWindows)

    // Closed form: window w covers batches [2w, 2w+2) of R values
    // each — n = 2R, sum = sum of the value range.
    val R = RateIngest.RowsPerBatch
    rows.zipWithIndex.foreach { case (row, w) =>
      val lo = 2L * w * R
      val hi = lo + 2 * R
      assert(row.getAs[Long]("n") === 2 * R, s"window $w count")
      assert(row.getAs[Long]("sum_v") === (lo until hi).sum,
        s"window $w sum")
    }

    val again = RateIngest.rateWindows(spark, sf).collect()
    assert(again.toSeq === rows.toSeq, "second run diverged")
  }
}
