package graft.tools

import org.apache.spark.sql.functions._

/** Synthesize the >rung-15 retrieval fixture (VERDICT r12 item 2):
  * a documents table whose TRAIN slice chunks to ≥ 8.4M corpus
  * chunks (TargetBucket·2^15 < N ≤ ·2^16 → the band ladder selects
  * rung 16) while the EVAL slice stays a BOUNDED query batch — the
  * regime the round-12 640× make_scale attempt could not reach
  * because its eval slice scaled WITH the corpus (320k queries'
  * serving volume, not the corpus, blew the disk both rounds; bulk
  * serving cost is linear in queries by the declared contract, so a
  * fixed batch is the honest shape).
  *
  * Shape:
  *  - 950,000 train docs × 224 tokens → 9 fixed-stride chunks each
  *    (ChunkLen 32 / ChunkStride 24) = 8,550,000 chunks;
  *  - 2,000 eval docs (doc_id ≡ EvalMod mod 10) of exactly ChunkLen
  *    tokens → one query chunk each;
  *  - per eval doc, THREE train twin docs carrying the IDENTICAL
  *    token sequence (+6,000 chunks → 8,556,000 corpus chunks):
  *    identical integer embeddings ⇒ cosine exactly 1 and identical
  *    band keys at EVERY rung, so brute-force truth top-3 = the
  *    three twins AND band-join retrieval must return exactly them —
  *    measured recall 1.00 on planted twins by construction, any
  *    miss is a real rung-16 banding bug.
  *
  * Tokens are "w<murmur-hash mod 65536>" — deterministic, regenerable
  * bit-for-bit. Usage:
  *   sbt "Test/runMain graft.tools.RungFixture [/tmp/rung16]"
  */
object RungFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/rung16")
    val spark = graft.GraftSession.fromEnv()
    val evalMod = graft.sim.RagRetrieve.EvalMod

    def toks(n: Int, seed: Seq[org.apache.spark.sql.Column]) =
      array_join(transform(sequence(lit(0), lit(n - 1)),
        j => concat(lit("w"), pmod(hash(seed :+ j: _*), lit(65536)))),
        " ")

    val train = spark.range(950000L)
      .select((col("id") * 10 + 1).as("doc_id"))
      .select(col("doc_id"), toks(224, Seq(col("doc_id"))).as("text"))
    val evalTexts = spark.range(2000L)
      .select(col("id").as("e"),
        toks(32, Seq(lit("q"), col("id"))).as("text"))
    val evalDocs = evalTexts
      .select((col("e") * 10 + evalMod).as("doc_id"), col("text"))
    val twins = evalTexts
      .select(col("e"), explode(sequence(lit(0), lit(2))).as("k"),
        col("text"))
      .select(((lit(1000000L) + col("e") * 3 + col("k")) * 10 + 1)
        .as("doc_id"), col("text"))

    train.unionByName(evalDocs).unionByName(twins)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"RUNG16 FIXTURE OK $out")
    spark.stop()
  }
}
