package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Empirical gate for the PARAMETRIZATION LAW claimed in the
  * [[Dedup.embedLsh]] scaladoc: at the thresholds real pipelines
  * dedup at (cos ≥ 0.85), sign-LSH with wider bands runs an order of
  * magnitude below brute force while keeping recall — the fixture's
  * own 0.45 noise-floor threshold can't show this (there b/2^r ≈ 1),
  * so this spec plants the realistic regime and measures both sides
  * of the trade:
  *
  *  - candidate volume: b·N²/2^(r+1) expected ⇒ at r=8, b=16 the
  *    candidate multiset must be ≥ 8× below the N·(N−1)/2 brute-force
  *    pair count (theory says 16×; 2× assert margin);
  *  - recall: planted pairs at angle θ=0.43 rad (cos ≈ 0.909) have
  *    per-band match m = (1−θ/π)^8 ≈ 0.31, so detect probability
  *    1−(1−m)^16 ≈ 0.997 ⇒ ≥ 90% of the 50 planted pairs must
  *    surface (the md5 planes are fixed, so the run is deterministic
  *    and the measured recall is printed on failure).
  *
  * Precision is 1.0 by construction (candidates re-verify with the
  * exact cosine — here computed locally from the in-memory vectors).
  */
class EmbedLshScaleSpec extends SparkSpec {

  private val Dim = 64
  private val NBase = 2000
  private val NPlanted = 50
  private val Threshold = 0.85
  private val Bits = 8
  private val Bands = 16

  /** Deterministic unit vector from a seeded gaussian. */
  private def unit(rnd: scala.util.Random): Array[Double] = {
    val v = Array.fill(Dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < Dim) { d += a(i) * b(i); i += 1 }
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("cos>=0.85 regime, 16 bands x 8 bits: candidates >=8x below " +
    "brute force, planted-pair recall >=0.9") {
    val rnd = new scala.util.Random(20260812L)
    val base = Array.fill(NBase)(unit(rnd))
    // Planted near-dup of base i at EXACT angle theta: rotate inside
    // the (v, u) plane with u a unit vector orthogonal to v
    // (Gram-Schmidt on a fresh gaussian), so cos(v, dup) = cos(theta)
    // by construction rather than by noise magnitude tuning.
    val theta = 0.43 // cos ~ 0.9090
    val planted = (0 until NPlanted).map { i =>
      val v = base(i)
      val g = unit(rnd)
      val d = cos(v, g)
      val u0 = g.indices.map(j => g(j) - d * v(j)).toArray
      val un = math.sqrt(u0.map(x => x * x).sum)
      val dup = v.indices.map(j =>
        math.cos(theta) * v(j) + math.sin(theta) * u0(j) / un).toArray
      (NBase + i).toLong -> dup
    }
    val all: Map[Long, Array[Double]] =
      base.indices.map(i => i.toLong -> base(i)).toMap ++ planted
    val expected = (0 until NPlanted)
      .map(i => (i.toLong, (NBase + i).toLong))
      .filter { case (a, b) => cos(all(a), all(b)) >= Threshold }
      .toSet
    assert(expected.size === NPlanted) // theta puts every pair above 0.85

    val e = spark.createDataFrame(
      all.toSeq.map { case (id, v) => (id, v) }
    ).toDF("vec_id", "v")
    val planes = Dedup.planeMatrixFor(Bands * Bits, Dim)
    val cand = Dedup.lshCandidates(e, planes, Bits).cache()
    try {
      val n = all.size.toLong
      val brutePairs = n * (n - 1) / 2
      val nCand = cand.count()
      assert(nCand * 8 <= brutePairs,
        s"candidate multiset $nCand not 8x below brute force $brutePairs")

      // Exact verify on the (distinct) candidates: precision 1.0 by
      // construction; recall measured against the planted truth.
      val survivors = cand.distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => cos(all(a), all(b)) >= Threshold }
        .toSet
      val hit = (expected & survivors).size
      assert(hit >= math.ceil(NPlanted * 0.9).toInt,
        s"recall ${hit.toDouble / NPlanted}: missed ${expected -- survivors}")
    } finally cand.unpersist()
  }
}
