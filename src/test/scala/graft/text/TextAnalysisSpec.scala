package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextHash

class TextAnalysisSpec extends SparkSpec {

  /** Pure-Scala mirror of TextHash.hash31 — independent of Spark. */
  private def h31(w: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % TextHash.Prime
  }

  test("lm_score matches a pure-Scala recompute bit-for-bit") {
    val P = TextHash.Prime
    val texts = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docHs = texts.view.mapValues(t =>
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).map(h31).toVector)
      .filter(_._2.size >= 2).toMap
    val c1 = docHs.values.flatten.groupBy(identity).view.mapValues(_.size)
    val v = docHs.values.flatten.toSet.size
    val bgOf = (hs: Vector[Long]) =>
      hs.sliding(2).map(s => (s(0), (s(0) * 131 + s(1)) % P)).toVector
    val c2 = docHs.values.flatMap(hs => bgOf(hs).map(_._2))
      .groupBy(identity).view.mapValues(_.size)
    val expected = docHs.view.mapValues { hs =>
      val ps = bgOf(hs).map { case (h1, bg) =>
        (c2(bg) + 1).toDouble / (c1(h1) + v).toDouble
      }
      // strict left fold in position order — the contract under test
      (ps.size.toLong, ps.foldLeft(0.0)(_ + _) / ps.size.toDouble)
    }.toMap
    val got = TextAnalysis.lmScore(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("lm_score"))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, sc)) =>
      assert(n === expected(id)._1)
      assert(sc === expected(id)._2, s"doc $id") // bitwise-equal doubles
      assert(sc > 0.0 && sc <= 1.0)
    }
  }

  test("fingerprint matches a pure-Scala reimplementation") {
    val row = TextAnalysis.fingerprint(spark, sf)
      .filter(col("doc_id") === 0).head()
    val text = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    val hs = toks.map(h31)
    val expectedFp = hs.foldLeft(0L)((acc, h) =>
      (acc * 131 + h) % TextHash.Prime)
    assert(row.getAs[Long]("fp") === expectedFp)
    val shingles = hs.sliding(3).filter(_.size == 3).map { s =>
      ((s(0) * 131 + s(1)) % TextHash.Prime * 131 + s(2)) % TextHash.Prime
    }.toSeq
    val expectedMin = if (shingles.isEmpty) -1L else shingles.min
    assert(row.getAs[Long]("min_shingle") === expectedMin)
  }

  test("lang_id scores are consistent with the argmax pick") {
    val rows = TextAnalysis.langId(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val scores = TextAnalysis.MarkerWords.map { case (l, _) =>
        l -> r.getAs[Long](s"s_$l")
      }
      val best = scores.map(_._2).max
      assert(r.getAs[String]("pred_lang") === scores.find(_._2 == best).get._1)
    }
  }

  test("quality invariants hold for every document") {
    TextAnalysis.quality(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("tok_chars") <= r.getAs[Long]("text_len"))
      val mean = r.getAs[Double]("mean_tok_len")
      assert(mean > 0 && mean < 30)
    }
  }

  test("token counts: distinct <= whitespace, bpe >= whitespace") {
    TextAnalysis.tokenCount(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Long]("bpe_pieces") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("tfidf: exactly 3 ranked terms per doc, scores non-increasing") {
    val rows = TextAnalysis.tfidf(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L))
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("winnowing: near-duplicate pairs share at least one fingerprint") {
    // The winnowing guarantee: matches of length >= w+k-1 tokens share
    // a fingerprint — so every LSH-confirmed near-dup pair must
    // overlap in fingerprints.
    import graft.functions.TextHash
    val fps: Map[Long, Set[Long]] =
      Tables(spark, sf, "documents").select("doc_id", "text").collect()
        .flatMap { r =>
          val hs = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)
            .map(w => {
              val hex = java.security.MessageDigest.getInstance("MD5")
                .digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
              java.lang.Long.parseLong(hex.substring(0, 15), 16) %
                TextHash.Prime
            }).toSeq
          if (hs.size < 3) None else {
            val sh = hs.sliding(3).map(s =>
              ((s(0) * 131 + s(1)) % TextHash.Prime * 131 + s(2)) %
                TextHash.Prime).toSeq
            val w = TextAnalysis.WinnowW
            val f = if (sh.size >= w)
              sh.sliding(w).map(_.min).toSet else Set(sh.min)
            Some(r.getLong(0) -> f)
          }
        }.toMap
    val dupPairs = graft.dedup.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(dupPairs.nonEmpty)
    dupPairs.foreach { case (a, b) =>
      assert((fps(a) & fps(b)).nonEmpty, s"pair ($a,$b)")
    }
    // And the Spark-side fingerprint fold agrees with pure Scala.
    val row = TextAnalysis.winnow(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0).head()
    assert(row.getAs[Long]("n_fps") === fps(0L).size.toLong)
  }

  test("repetition fractions are valid and bounded") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dt = r.getAs[Double]("dup_token_frac")
      val dg = r.getAs[Double]("dup_3gram_frac")
      val tt = r.getAs[Double]("top_token_frac")
      val n = r.getAs[Long]("n_tokens")
      assert(dt >= 0.0 && dt < 1.0)
      assert(dg >= 0.0 && dg < 1.0)
      assert(tt >= 1.0 / n && tt <= 1.0)
    }
  }

  test("filter pipeline: one row per doc, reason codes closed, " +
      "rule order respected") {
    val rows = TextAnalysis.filterPipeline(spark, sf).collect()
    assert(rows.length === 500)
    val valid = Set("too_short", "too_long", "bad_tok_len",
      "low_stopword", "repetitive", "keep")
    rows.foreach { r =>
      val reason = r.getAs[String]("reason")
      assert(valid.contains(reason))
      assert(r.getAs[Boolean]("keep") === (reason == "keep"))
      // length rules fire before content rules: a too-short doc can
      // never surface a content reason
      if (r.getAs[Long]("n_tokens") < 10L)
        assert(reason === "too_short")
    }
    // the composite agrees with the standalone repetition signal on
    // the docs it flags as repetitive: their top-token share really
    // exceeds 20% (cross-operator consistency, not a re-derivation)
    val rep = TextAnalysis.repetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("top_token_frac"))
      .toMap
    rows.filter(_.getAs[String]("reason") == "repetitive").foreach { r =>
      assert(rep(r.getAs[Long]("doc_id")) > 0.2)
    }
  }

  test("char-ngram language-ID agrees with its score columns") {
    val rows = TextAnalysis.langNgram(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val scores = TextAnalysis.NgramProfiles.map { case (l, _) =>
        l -> r.getAs[Long](s"s_$l") }
      val best = scores.map(_._2).max
      assert(r.getAs[String]("pred_lang") ===
        scores.find(_._2 == best).get._1)
    }
  }

  test("bigrams: top-20 with non-increasing counts") {
    val rows = TextAnalysis.bigrams(spark, sf).collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("scrub detects emails/URLs and strips stopwords on PII lines") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or visit " +
        "https://example.com/x?q=1 for the details"),
      (2L, "an apple a day keeps the doctor away"),
      (3L, "no pii here")).toDF("doc_id", "text")
    val rows = TextAnalysis.scrubDf(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_email") === 1L)
    assert(rows(1L).getAs[Long]("n_url") === 1L)
    assert(rows(2L).getAs[Long]("n_stop") === 3L)   // an, a, the
    assert(rows(2L).getAs[Long]("n_clean") === 5L)
    assert(rows(3L).getAs[Long]("n_email") === 0L)
    assert(rows(3L).getAs[Long]("n_url") === 0L)
    // cleaned text hash is the md5 of the stopword-free join
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("apple day keeps doctor away".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(2L).getAs[String]("clean_md5") === md)
  }

  test("ta_pmi == driver recompute; lift ranking matches log-PMI order") {
    val toks = graft.Tables(spark, sf, "documents")
      .select(graft.functions.TextHash.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nu = uni.values.sum
    val prs = toks.flatMap(ts => ts.zip(ts.drop(1)))
    val pc = prs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nb = pc.values.sum
    val expected = pc.toSeq
      .filter(_._2 >= TextAnalysis.PmiMinCount)
      .map { case ((a, b), cab) =>
        val lift = ((cab.toDouble * nu.toDouble) /
          (uni(a).toDouble * uni(b).toDouble)) *
          (nu.toDouble / nb.toDouble)
        (s"$a $b", cab, lift)
      }
      .sortBy { case (bg, _, l) => (-l, bg) }
      .take(TextAnalysis.PmiTopK)
    val got = TextAnalysis.pmi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // lift is a monotone surrogate for PMI: the emitted ranking must
    // equal the ranking by log of the same rational
    val byLog = got.sortBy { case (bg, _, l) => (-math.log(l), bg) }
    assert(byLog === got)
  }

  test("ta_bm25 == driver recompute with the identical float tree") {
    import org.apache.spark.sql.functions._
    val toks = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextHash.tokens(col("text")).as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val nd = toks.size.toLong
    val sl = toks.values.map(_.size.toLong).sum
    val terms = TextAnalysis.Bm25Terms
    val df = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toLong).toMap
    // only documents containing >=1 query term participate (the tf
    // frame is empty for the rest, in operator and oracle alike)
    val scores = toks.filter(_._2.exists(terms.contains)).map {
      case (id, ts) =>
        val dl = ts.size.toLong
      // contributions added in Bm25Terms order — the same
      // left-to-right tree the operator and the oracle use
        id -> terms.map { t =>
          val tf = ts.count(_ == t).toLong
          if (tf == 0L || df(t) == 0L) 0.0
          else ((nd - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5) *
            (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * ((dl * nd).toDouble / sl)))
        }.reduce(_ + _)
    }
    val expected = scores.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(TextAnalysis.Bm25TopK)
    val got = TextAnalysis.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    assert(got.size === math.min(TextAnalysis.Bm25TopK, scores.size))
    assert(got.head._2 > 0.0)
  }
}
