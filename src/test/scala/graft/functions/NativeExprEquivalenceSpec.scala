package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextHash._

/** The three native codegen'd expressions must be integer/IEEE
  * identical to their interpreted higher-order-function reference
  * implementations — on random inputs, not just the fixture corpus.
  * (The HOF forms are themselves oracle-checked against DuckDB, so
  * equivalence here transitively pins the natives to the oracle.)
  */
class NativeExprEquivalenceSpec extends SparkSpec {

  private val rnd = new Random(42)

  test("Simhash60 native == HOF fold on 300 random hash arrays") {
    import spark.implicits._
    val data = Seq.fill(300)(
      Seq.fill(1 + rnd.nextInt(80))(rnd.nextLong().abs % (1L << 60)))
    val df = data.toDF("hs")
      .select(Simhash60.simhash60Native(col("hs")).as("native"),
        simhash60(col("hs")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("MinhashSig native == HOF signature on 300 random shingle sets") {
    import spark.implicits._
    val data = Seq.fill(300)(
      Seq.fill(rnd.nextInt(60))(rnd.nextLong().abs % Prime))
    val df = data.toDF("sh")
      .select(MinhashSig.minhashNative(col("sh"), 32).as("native"),
        minhashSignature(col("sh"), 32).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("SignSketch native == composed ddot-sign band keys, 300 vectors") {
    import spark.implicits._
    import graft.dedup.Dedup.{EmbedBandBits, EmbedBands, NPlanes}
    val planes = graft.dedup.Dedup.planeMatrix
    val data = Seq.fill(300)(Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    val bits = (0 until NPlanes).map { p =>
      when(VectorFunctions.ddot(col("v"), typedlit(planes(p))) >= 0d,
        lit(1L)).otherwise(lit(0L))
    }
    val composed = (0 until EmbedBands).map { b =>
      (0 until EmbedBandBits).map { j =>
        bits(b * EmbedBandBits + j) * (1L << (EmbedBandBits - 1 - j))
      }.reduce(_ + _)
    }
    val df = data.toDF("v")
      .select(SignSketch.signSketch(col("v"), planes, EmbedBandBits)
        .as("native"), array(composed: _*).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("DoubleDot native == interpreted fold, bit for bit, 300 pairs") {
    import spark.implicits._
    val data = Seq.fill(300)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = data.toDF("a", "b")
      .select(VectorFunctions.ddot(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0d), (acc, p) => acc + p).as("hof"))
    // Exact equality — same strict left-to-right fold.
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("DoubleDot null contract == HOF: unequal lengths and null elements") {
    import spark.implicits._
    val data: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      (Seq(1.0, 2.0), Seq(3.0)),                       // unequal lengths
      (Seq(1.0), Seq(3.0, 4.0)),                       // unequal, other side
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null element left
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](null, 4.0)), // null element right
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]), // both empty → 0.0
      (Seq[java.lang.Double](1.5, -2.0), Seq[java.lang.Double](0.5, 3.0))) // plain
    val df = data.toDF("a", "b")
      .select(VectorFunctions.ddot(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0d), (acc, p) => acc + p).as("hof"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null-bit mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    // The first four cases are null, the empty pair is exactly 0.0.
    assert(rows.take(4).forall(_.isNullAt(0)))
    assert(rows(4).getDouble(0) === 0.0)
  }

  test("DoubleSubDist native == interpreted fold, bit for bit, " +
    "plus the null contract") {
    import spark.implicits._
    val data = Seq.fill(300)((
      Seq.fill(8)(rnd.nextDouble() * 2 - 1),
      Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = data.toDF("a", "b")
      .select(VectorFunctions.dsubdist(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, d) => acc + d).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
    val edge: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      (Seq(1.0, 2.0), Seq(3.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]))
    val er = edge.toDF("a", "b")
      .select(VectorFunctions.dsubdist(col("a"), col("b")).as("n"))
      .collect()
    assert(er(0).isNullAt(0) && er(1).isNullAt(0))
    assert(er(2).getDouble(0) === 0.0)
  }

  test("ArgPickAgg == max/min(struct) selection, including exact " +
    "score ties (tie to the smallest id)") {
    import graft.functions.ArgPickAgg.{argMaxId, argMinId}
    import spark.implicits._
    // Quantized scores force real ties across ids within a key.
    val rows = Seq.tabulate(5000) { i =>
      (i % 37L, math.floor(rnd.nextDouble() * 8) / 8.0, i.toLong)
    }
    val df = rows.toDF("k", "s", "id").localCheckpoint()
    val got = df.groupBy("k")
      .agg(argMaxId(col("s"), col("id")).as("amax"),
        argMinId(col("s"), col("id")).as("amin"))
    val want = df.groupBy("k")
      .agg(max(struct(col("s"), (-col("id")).as("nid"))).as("bx"),
        min(struct(col("s"), col("id"))).as("bn"))
      .select(col("k"), (-col("bx.nid")).as("wmax"),
        col("bn.id").as("wmin"))
    assert(got.join(want, "k")
      .filter(col("amax") =!= col("wmax") ||
        col("amin") =!= col("wmin")).count() === 0)
  }

  test("VecScatterSumAgg == the two-shuffle groupBy + dense " +
    "re-expansion it replaced") {
    import graft.functions.VecScatterSumAgg.vecScatterAgg
    import spark.implicits._
    val dim = 16
    val rows = Seq.fill(4000)(
      (rnd.nextInt(50).toLong, rnd.nextInt(dim),
        (rnd.nextInt(5) - 2).toLong))
    val df = rows.toDF("k", "d", "w").localCheckpoint()
    val got = df.groupBy("k")
      .agg(vecScatterAgg(col("d"), col("w"), dim).as("v"))
    val want = df.groupBy("k", "d").agg(sum("w").as("s"))
      .groupBy("k")
      .agg(map_from_entries(collect_list(struct(col("d"), col("s"))))
        .as("m"))
      .select(col("k"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("int")), lit(0L)))
          .as("w2"))
    assert(got.join(want, "k")
      .filter(col("v") =!= col("w2")).count() === 0)
    // Loud-failure discipline: an out-of-range index must throw.
    intercept[Exception] {
      Seq((1L, dim, 1L)).toDF("k", "d", "w").groupBy("k")
        .agg(vecScatterAgg(col("d"), col("w"), dim)).collect()
    }
  }

  test("MinhashAgg over exploded shingle rows == array-form signature") {
    import graft.functions.TextHash._
    // Array form: per-doc signature from the shingle array.
    val sh = graft.Tables(spark, sf, "documents")
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), tokenHashes(tokens(col("text"))).as("hs"))
      .select(col("doc_id"), shingles3(col("hs")).as("shingles"))
    val viaArray = sh
      .select(col("doc_id"), MinhashSig.minhashNative(col("shingles"), 16)
        .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // Row form: explode, then aggregate with partial-agg merge.
    val viaAgg = sh
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .groupBy("doc_id")
      .agg(MinhashAgg.minhashAgg(col("s"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg === viaArray)
    // And the plan is partial: objHashAggregate with partial stage.
    val plan = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      .groupBy("doc_id")
      .agg(MinhashAgg.minhashAgg(col("s"), 16).as("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_minhash_agg"))
  }

  test("engine results are invariant to shuffle partition count") {
    val a = graft.text.TextAnalysis.fingerprint(spark, sf).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = graft.text.TextAnalysis.fingerprint(spark, sf).collect().toSeq
      assert(a.map(_.toSeq) === b.map(_.toSeq))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("wordcount counts sum to the total token count") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf, "documents")
    val total = docs.select(explode(regexp_extract_all(
      col("text"), lit(graft.text.WordCount.WordRegex), lit(0))))
      .count()
    val summed = graft.text.WordCount(docs, "text")
      .agg(sum("cnt")).as[Long].head()
    assert(summed === total)
  }
}
