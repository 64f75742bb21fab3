package graft.dedup

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextHash

class DedupSpec extends SparkSpec {
  private val P = TextHash.Prime

  private def h60(w: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** doc_id → distinct 3-shingle set, recomputed in pure Scala. */
  private lazy val shingleSets: Map[Long, Set[Long]] =
    Tables(spark, sf, "documents").select("doc_id", "text").collect().map {
      r =>
        val hs = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)
          .map(w => h60(w) % P).toSeq
        val sh = hs.sliding(3).filter(_.size == 3)
          .map(s => ((s(0) * 131 + s(1)) % P * 131 + s(2)) % P).toSet
        r.getLong(0) -> sh
    }.toMap

  private def jaccardOk(a: Set[Long], b: Set[Long]): Boolean = {
    val inter = (a & b).size; val uni = a.size + b.size - inter
    inter * 10 >= uni * 7
  }

  test("exact dedup: no exact duplicates in the fixture corpus") {
    val rows = Dedup.exact(spark, sf).collect()
    assert(rows.length === 500)
    assert(rows.forall(_.getAs[Long]("n_copies") === 1L))
  }

  test("minhash-lsh pairs equal the brute-force Jaccard>=0.7 pair set") {
    val brute = (for {
      (a, sa) <- shingleSets.toSeq; (b, sb) <- shingleSets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty && jaccardOk(sa, sb)
    } yield (a, b)).toSet
    val got = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // LSH at 8 bands x 4 rows catches every fixture pair (all J>=0.9);
    // soundness (got ⊆ brute) holds by the exact verify step.
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("minhash-lsh reported intersection sizes are exact") {
    Dedup.minhashLsh(spark, sf).collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val inter = (shingleSets(a) & shingleSets(b)).size.toLong
      assert(r.getAs[Long]("inter") === inter)
      assert(r.getAs[Long]("uni") ===
        shingleSets(a).size + shingleSets(b).size - inter)
    }
  }

  test("simhash pairs have exact recomputed hamming <= 3") {
    val sims: Map[Long, Long] =
      Tables(spark, sf, "documents").select("doc_id", "text").collect().map {
        r =>
          val hs = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)
            .map(h60).toSeq
          var sh = 0L
          for (b <- 59 to 0 by -1) {
            val ones = hs.count(h => ((h >> b) & 1L) == 1L)
            sh = sh * 2 + (if (2 * ones > hs.size) 1L else 0L)
          }
          r.getLong(0) -> sh
      }.toMap
    val rows = Dedup.simhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = java.lang.Long.bitCount(
        sims(r.getAs[Long]("doc_a")) ^ sims(r.getAs[Long]("doc_b")))
      assert(r.getAs[Long]("hamming") === d.toLong && d <= 3)
    }
  }

  test("prefix-filter jaccard join is COMPLETE: equals brute force") {
    // Unlike min-shingle blocking (probabilistic) and LSH (s-curve),
    // prefix filtering guarantees every J>=0.7 pair is a candidate.
    val brute = (for {
      (a, sa) <- shingleSets.toSeq; (b, sb) <- shingleSets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty && jaccardOk(sa, sb)
    } yield (a, b)).toSet
    val got = Dedup.jaccardPrefix(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got === brute)
  }

  test("ngram-jaccard pairs share their min shingle and pass J>=0.7") {
    val rows = Dedup.ngramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(shingleSets(a).min === shingleSets(b).min)
      assert(jaccardOk(shingleSets(a), shingleSets(b)))
    }
  }

  test("embed-cosine pairs match a pure-Scala fold bit-for-bit") {
    val vecs: Map[Long, Array[Double]] = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect().map { r =>
        r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray
      }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) dot += a(i) * b(i)
      for (x <- a) na += x * x
      for (x <- b) nb += x * x
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = Dedup.embedCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = cos(vecs(r.getAs[Long]("vec_a")),
        vecs(r.getAs[Long]("vec_b")))
      assert(r.getAs[Double]("cos") === expected)
      assert(expected >= Dedup.CosineThreshold)
    }
  }

  test("cluster == driver-side union-find over the same pair graph") {
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // Textbook union-find as the oracle for min-label propagation.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val got = Dedup.cluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("decontam: overlap counts bounded by shingle counts; eval absent") {
    val rows = Dedup.decontam(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 !== 7)          // no eval docs reported
      assert(r.getLong(1) >= 1L)               // only contaminated docs
      assert(r.getLong(1) <= r.getLong(2))     // n_overlap <= n_shingles
    }
  }
}
