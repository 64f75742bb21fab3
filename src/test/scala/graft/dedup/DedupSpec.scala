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

  test("substring-span counts match a pure-Scala sliding-window scan") {
    val k = Dedup.SpanK
    val toked = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    // The operator compares md5(span text); raw span text induces the
    // same equality partition (md5 is injective on the fixture).
    val spans = toked.flatMap { case (id, toks) =>
      if (toks.size >= k) toks.sliding(k).map(w => id -> w.mkString(" "))
      else Iterator.empty
    }
    val dupSet = spans.groupBy(_._2)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = toked.filter(_._2.size >= k).map { case (id, toks) =>
      val sp = toks.sliding(k).map(_.mkString(" ")).toVector
      val d = sp.filter(dupSet)
      (id, sp.size.toLong, d.size.toLong, d.distinct.size.toLong)
    }.sortBy(_._1).toSeq
    val got = Dedup.substringSpan(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === expected)
    // The fixture must actually exercise the dup path.
    assert(expected.exists(_._3 > 0))
  }

  test("span-within vs substring-span: the occurrence gate catches a " +
    "within-document repeat the cross-doc gate must ignore") {
    // The fixture has no within-doc repeated SpanK-runs (verified:
    // both declared queries emit identical rows there), so the
    // semantic difference is gated on a synthetic corpus where it is
    // decidable: doc 0 repeats one 8-token run twice INSIDE itself;
    // no run appears in two documents.
    val k = Dedup.SpanK
    require(k == 8, "synthetic docs below assume SpanK = 8")
    val run = "a1 b2 c3 d4 e5 f6 g7 h8"
    val docs = Seq(
      (0L, s"$run x9 $run"),                       // within-doc repeat
      (1L, "p1 q2 r3 s4 t5 u6 v7 w8 y9 z0 aa bb")) // no repeats
    val dir = java.nio.file.Files
      .createTempDirectory("graft_span_within").toString
    import spark.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val cross = Dedup.substringSpan(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val within = Dedup.spanWithin(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // cross-doc gate: nothing is duplicated across documents
    assert(cross(0L) === ((0L, 0L)) && cross(1L) === ((0L, 0L)))
    // occurrence gate: the repeated run's two spans, one distinct hash
    assert(within(0L) === ((2L, 1L)), s"got ${within(0L)}")
    assert(within(1L) === ((0L, 0L)))
  }

  test("span scrub cuts exactly the covered positions; clean text " +
      "md5 matches a pure-Scala replay incl. fully-cut docs") {
    val k = Dedup.SpanK
    val toked = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
      .filter(_._2.size >= k)
    val spans = toked.flatMap { case (id, toks) =>
      toks.sliding(k).zipWithIndex.map { case (w, i) =>
        (id, i + 1, w.mkString(" "))
      }
    }
    val dupSet = spans.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val covByDoc = spans.filter(sp => dupSet(sp._3))
      .flatMap { case (id, i, _) => (i until i + k).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = toked.map { case (id, toks) =>
      val cov = covByDoc.getOrElse(id, Set.empty[Int])
      val clean = toks.zipWithIndex.collect {
        case (t, i) if !cov(i + 1) => t
      }
      (id, toks.size.toLong, cov.size.toLong, md5hex(clean.mkString(" ")))
    }.sortBy(_._1).toSeq
    val got = Dedup.spanScrub(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === expected)
    // The fixture must exercise both the cut and the fully-cut path.
    assert(expected.exists(e => e._3 > 0 && e._3 < e._2))
    assert(expected.exists(e => e._3 == e._2))
  }

  test("containment catches a truncation dup that Jaccard misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_contain").toString
    val tokensB = (0 until 50).map(i => s"tok$i")
    // doc 1 = the first 30% of doc 2 (a truncated crawl of it);
    // doc 3 unrelated. C(1→2) = 1.0 but J(1,2) = 13/48 ≈ 0.27.
    Seq((1L, tokensB.take(15).mkString(" ")),
      (2L, tokensB.mkString(" ")),
      (3L, "unrelated words entirely distinct here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L))) // directed: small inside big only
    val jac = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!jac.contains((1L, 2L))) // the pair Jaccard-family ops miss
  }

  test("containment ≡ brute-force C>=0.8 truth restricted to the " +
    "min-shingle block; counts exact") {
    val sets = shingleSets.filter(_._2.nonEmpty)
    val got = Dedup.containment(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val blocked = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b && sb.contains(sa.min) // the declared blocking
      inter = (sa & sb).size
      if inter * 10 >= sa.size * Dedup.ContainmentThreshold10
    } yield (a, b) -> (inter.toLong, sa.size.toLong, sb.size.toLong)).toMap
    assert(got === blocked)
    // precision 1.0 against the UNBLOCKED truth is implied (blocked
    // truth ⊆ full truth); blocking loses only pairs whose shared
    // part misses A's min shingle — probability ≈ 1−C per pair.
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

  test("embed-lsh: precision 1.0 vs brute force, recall gated") {
    val brute = Dedup.embedCosine(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val lsh = Dedup.embedLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(brute.nonEmpty)
    // Exact verify ⇒ every reported pair is a true >=threshold pair.
    assert(lsh.subsetOf(brute), s"false positives: ${lsh -- brute}")
    // s-curve bound at 16 bands × 4 bits gives P[candidate] >= 0.96
    // per pair at the 0.45 threshold (the fixture's pairs hug it:
    // cos 0.45-0.47); measured with the deterministic md5 planes the
    // oracle-scale fixtures catch every pair — assert the strong form
    // and surface the measured recall if it ever regresses.
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall: missed ${brute -- lsh}")
  }

  test("incremental dedup over a PERSISTED signature store ≡ full-corpus pairs touching the new batch") {
    val full = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val isNew = (id: Long) => id % 10 == Dedup.NewBatchMod
    val expected = full.filter { case (a, b) => isNew(a) || isNew(b) }
    val inc = Dedup.incremental(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // batch ∪ increment ≡ full: old-only pairs (the previous run's
    // output) plus this run's pairs partition the full pair set.
    assert(inc === expected)
    val oldOnly = full.filter { case (a, b) => !isNew(a) && !isNew(b) }
    assert((oldOnly ++ inc) === full && (oldOnly & inc).isEmpty)

    // The real pipeline shape: the historical band keys live in a
    // parquet signature store; a day's batch joins against store ∪
    // its own keys without touching historical text. Round-trip the
    // store through disk and reproduce the same pair set.
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val sh = Tables(spark, sf, "documents")
      .filter(size(TextHash.tokens(col("text"))) >= 3)
      .select(col("doc_id"), TextHash.tokenHashes(
        TextHash.tokens(col("text"))).as("hs"))
      .select(col("doc_id"), TextHash.shingles3(col("hs")).as("shingles"))
    import graft.functions.MinhashSig.minhashNative
    val bands = sh.select(col("doc_id"),
        minhashNative(col("shingles"), Dedup.K).as("sig"))
      .select(col("doc_id"), posexplode(TextHash.bandKeys(col("sig"),
        Dedup.K, Dedup.Bands)).as(Seq("bi", "bh")))
    bands.filter(col("doc_id") % 10 =!= Dedup.NewBatchMod)
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    val newB = bands.filter(col("doc_id") % 10 === Dedup.NewBatchMod)
    def pairsOf(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.as("a").join(b.as("b"),
          col("a.bi") === col("b.bi") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candViaStore =
      pairsOf(store.unionByName(newB), newB) ++ pairsOf(newB, store)
    // verify-filter the store-driven candidates with the spec's own
    // pure-Scala shingle sets — must equal the operator's output.
    val verified = candViaStore.filter { case (a, b) =>
      shingleSets(a).nonEmpty && shingleSets(b).nonEmpty &&
        jaccardOk(shingleSets(a), shingleSets(b))
    }
    assert(verified === inc)
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

  test("connectedComponents restores the session shuffle partitioning " +
    "it scopes for the fixpoint") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // A 6-node chain forces several propagation rounds (worst case
    // for min-label), all inside the scoped-conf region.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("u", "v")
    val labels = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (1L to 6L).map(_ -> 1L).toMap)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
      "fixpoint left its scoped shuffle partitioning behind")
  }

  test("keeplist: full corpus covered, one keeper per cluster, keepers " +
    "are cluster minima") {
    val rows = Dedup.keeplist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length === 500) // every document decided, clustered or not
    rows.foreach { case (doc, cid, keep) =>
      assert(cid <= doc) // min-label clustering
      assert(keep === (doc == cid))
    }
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._3) === 1) // exactly one keeper
      assert(members.map(_._1).min === cid) // and it is the minimum
    }
    // consistency with the declared cluster query on the clustered subset
    val clustered = Dedup.cluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => clustered.contains(r._1))
      .foreach { case (doc, cid, _) => assert(clustered(doc) === cid) }
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

  test("semantic dedup: full coverage, endpoints of every thresholded " +
      "kNN edge share a cluster, keepers are cluster minima") {
    val rows = Dedup.semantic(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val nVecs = Tables(spark, sf, "embeddings").count()
    assert(rows.size.toLong === nVecs)           // every vector decided
    assert(rows.exists(!_._2._2), "fixture must contain semantic dups")
    // Edge consistency: thresholded kNN edges never cross clusters.
    val edges = graft.sim.VectorSearch.knnGraph(spark, sf)
      .filter(col("cos") >= Dedup.CosineThreshold)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(rows(a)._1 === rows(b)._1, s"edge ($a,$b) crosses clusters")
    }
    // Keep policy: exactly the cluster minimum keeps; cluster_id IS
    // that minimum.
    rows.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
      members.foreach { case (id, (_, keep)) => assert(keep === (id == cid)) }
    }
  }

  test("bloom decontam ≡ exact overlap: no false negatives survive the " +
      "prefilter, and false positives are killed by the verify join") {
    // Exact truth at the dd_bloom_decontam eval split, from the pure-
    // Scala shingle sets (no Spark involved).
    val evalSg = shingleSets.collect {
      case (id, sh) if id % 10 == Dedup.BloomEvalMod => sh
    }.foldLeft(Set.empty[Long])(_ ++ _)
    val truth = shingleSets.collect {
      case (id, sh) if id % 10 != Dedup.BloomEvalMod && sh.nonEmpty &&
          (sh & evalSg).nonEmpty =>
        id -> ((sh & evalSg).size.toLong, sh.size.toLong)
    }

    val rows = Dedup.bloomDecontam(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // Bit-exact equality proves both directions at once: the Bloom
    // prefilter dropped no true overlap (no false negatives) and the
    // verify join admitted no spurious one (false positives killed).
    assert(rows === truth)
  }
}
