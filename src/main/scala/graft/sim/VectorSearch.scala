package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` fixture (north-star [ext]:
  * approximate-nearest-neighbor for training-data curation).
  *
  * Two operators:
  *
  *  - [[cosineTopK]] — exact brute-force cosine top-k for a query set:
  *    the correctness baseline. One broadcast of the (small) query
  *    set, one narrow pass over the corpus scoring Q×N pairs, then a
  *    per-query top-k window. Cost is linear in N per query — the
  *    right tool when Q is small or recall must be 1.0.
  *
  *  - [[ivfTopK]] — IVF-Flat, the sub-linear scale path: C centroids
  *    TRAINED by fixed-round distributed Lloyd's (round 7 — the
  *    integer-quantized update keeps both engines bit-identical),
  *    every vector assigned to its nearest centroid, and each query
  *    probing only the `NProbe` nearest centroid lists. At 100 TB the
  *    corpus is written partitioned by `cid`, so a probe is partition
  *    pruning — each query touches NProbe/C of the data instead of a
  *    full scan. Recall < 1.0 by construction; the exact variant
  *    above is the verify tier.
  *
  * All dot products are strict left-to-right double folds over
  * double-cast floats (same IEEE op sequence as the DuckDB oracle —
  * bit-identical results, see `graft.dedup.Dedup`). Ranks break ties
  * by neighbor id, so orderings agree across engines even at equal
  * cosine.
  */
object VectorSearch {

  val NumQueries = 8   // query set: vec_id < 8
  val TopK = 5
  val NumCentroids = 16 // IVF: centroids seeded from vec_id < 16
  val NProbe = 2
  /** Embedding dimension of the fixture vector space (the oracle's
    * range(1, 65) twin).
    */
  val VDim = 64

  import graft.functions.VectorFunctions.{ddot, l2norm}

  /** vec_id, v (double array), nrm (L2 norm). */
  private[graft] def vecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"), col("v"), l2norm(col("v")).as("nrm"))

  /** Native codegen'd dot product (graft.functions.DoubleDot) — same
    * strict fold as the interpreted form and the DuckDB oracle.
    */
  private[graft] def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    ddot(va, vb) / (na * nb)

  // -----------------------------------------------------------------
  // ss_cosine_topk: exact top-k neighbors for each query vector.
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  /** SEEDED centroid table: the first NumCentroids vectors. Kept as
    * k-means round 0 and as the √N-law kNN-graph centroids (training
    * C ≈ √N centroids would multiply the N^1.5 graph build by the
    * iteration count for a bounding structure whose quality barely
    * moves the SemDeDup recipe; the ivf/pq/ivfpq SEARCH indexes use
    * the trained quantizers below).
    */
  private def centroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))

  // -----------------------------------------------------------------
  // TRAINED QUANTIZERS (VERDICT r6 item 2): fixed-round distributed
  // Lloyd's k-means replaces the deterministic first-K seedings for
  // the IVF centroids and the PQ codebooks — the production FAISS
  // shape (`train()` before `add()`). Cross-engine exactness uses the
  // ss_centroid discipline: the UPDATE step sums once-quantized exact
  // integers (floor(v·10^6) as BIGINT — associative, any shuffle
  // order) and the mean is two fixed-order IEEE divisions; the ASSIGN
  // step is the same strict left-to-right double fold as every other
  // distance in this file, with ties broken by centroid id. Each
  // round is a broadcast of the (KB-sized) centroid table into one
  // narrow scoring pass plus one partial-aggregated (key, idx)
  // shuffle — no driver-side loop over vectors; per-round lineage is
  // cut by the statsBarrier + localCheckpoint fixpoint discipline.
  // Empty clusters (possible in principle, not hit at the fixture)
  // simply drop from the table in both engines.
  //
  // SEEDING is first-K (Lloyd's then iterates from it). The obvious
  // upgrade — deterministic farthest-first ("maximin", the
  // k-means++ spread idea without the randomness; expressible as 16
  // shared argmax rounds, m-keyed so all PQ subspaces seed
  // simultaneously) — was A/B-measured at the fixture (round 7,
  // driver-side replay of both seedings through the same quantized
  // Lloyd's + ADC + rerank): PQ recall@5 identical (0.70 vs 0.70 at
  // rerank-40). The fixture embeddings are near-isotropic, so
  // first-K IS already a uniform sample; spread seeding pays on
  // CLUSTERED real corpora. Kept first-K: 16 extra unrolled oracle
  // rounds must buy a measured improvement, and here they don't.
  val KmIters = 8
  val QScale = 1000000.0

  /** Quantize a double array to exact BIGINTs (floor — both engines
    * share one rounding convention; see ss_centroid).
    */
  private[graft] def quantize(v: Column): Column =
    transform(v, x => floor(x * lit(QScale)).cast("long"))

  /** One Lloyd's round for the IVF centroids: assign every vector to
    * its nearest (max-cosine) centroid, recompute each centroid as
    * the exact-integer mean of its members. `private[graft]` so the
    * plan audit can assert the broadcast + partial-agg shape.
    *
    * ASSIGNMENT SHAPE (round 12 cost attack, round 13 fix): the
    * argmax is [[graft.functions.ArgPickAgg.argMaxId]] — max cosine,
    * exact-tie to the smallest cid, the identical selection the
    * former row_number window and the round-12 `max(struct(cc,
    * −cid))` made. Round 13 found the struct form planned as
    * SortAggregate (struct buffers are not HashAggregate-mutable):
    * partial AND final SORTS of the vector × centroid score stream
    * every round — the `ss_rag_index` 2.51×/octave cold crossing.
    * The typed argmax plans as ObjectHashAggregate under the
    * session's raised fallback threshold: a pure hash pass, one
    * pre-reduced row per (vector × map task) across the shuffle,
    * nothing sorted at any scale. With [[centroidsOf]]'s one-shuffle
    * update a Lloyd round is 2 exchanges and 0 sorts.
    */
  private[graft] def kmeansRound(e: DataFrame, eq: DataFrame,
      cent: DataFrame): DataFrame = {
    val asg = e.join(broadcast(cent))
      .select(col("vec_id"),
        cosine(col("v"), col("cv"), col("nrm"), col("cn")).as("cc"),
        col("cid"))
      .groupBy("vec_id")
      .agg(graft.functions.ArgPickAgg.argMaxId(col("cc"), col("cid"))
        .as("cid"))
    centroidsOf(asg, eq)
  }

  /** The Lloyd step's centroid recompute over one (vec_id, cid)
    * assignment — factored (round 11) so [[VersionedIndex
    * .publishSplit]]'s median bisection derives its children through
    * the identical exact-integer mean. One shuffle (round 12): the
    * element-wise exact-integer sum is a [[graft.functions.VecSumAgg]]
    * partial aggregation (key, dim-long buffer rows), replacing the
    * posexplode → (cid, idx) → (cid) two-shuffle re-assembly; the
    * mean divisions are the identical IEEE op sequence per element.
    */
  private[graft] def centroidsOf(asg: DataFrame,
      eq: DataFrame): DataFrame =
    asg.join(eq, "vec_id")
      .groupBy("cid")
      .agg(graft.functions.VecSumAgg.vecSumAgg(col("qv"), VDim)
        .as("qs"), count(lit(1)).as("n"))
      .select(col("cid"),
        transform(col("qs"), q =>
          (q.cast("double") / lit(QScale)) / col("n").cast("double"))
          .as("cv"))
      .withColumn("cn", l2norm(col("cv")))

  /** [[KmIters]] Lloyd's rounds over an arbitrary training slice
    * (first-K seed) — shared by the per-(session, dir) trained
    * centroids and the base-trained persisted index
    * ([[VectorIndex]]).
    */
  private[graft] def lloydCentroids(train: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.statsBarrier
    val e = VectorIndex.phase("cent: seed ckpt")(train.localCheckpoint())
    // Round 13: the per-round update join (asg ⋈ eq by vec_id)
    // re-exchanged AND re-sorted this wide quantized frame EVERY
    // round. Partition + sort it by the join key ONCE — the
    // checkpoint's LogicalRDD carries outputPartitioning/-Ordering,
    // so all [[KmIters]] joins reuse the layout and only the slim
    // per-round assignment side moves.
    val eq = VectorIndex.phase("cent: quant ckpt") {
      e.select(col("vec_id"), quantize(col("v")).as("qv"))
        .repartition(col("vec_id"))
        .sortWithinPartitions("vec_id")
        .localCheckpoint()
    }
    var cent = centroids(e)
    for (i <- 1 to KmIters)
      cent = VectorIndex.phase(s"cent: round $i") {
        statsBarrier(kmeansRound(e, eq, cent).localCheckpoint())
      }
    cent
  }

  /** The trained IVF centroid table (cid, cv, cn) — [[KmIters]]
    * Lloyd's rounds from the first-K seed. Lineage-materialized: this
    * IS `index.train()`, paid once per (session, dir).
    */
  def trainedCentroids(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "ss_km_cent") {
      lloydCentroids(vecs(s, dir))
    }

  /** One Lloyd's round for the PQ codebooks, all [[PqM]] subspaces
    * trained in a single keyed frame (m, code, cbv): assign each
    * subvector to its min-squared-L2 code (tie → smallest code),
    * recompute entries as exact-integer subvector means.
    */
  private[graft] def pqRound(sub: DataFrame, subq: DataFrame,
      cb: DataFrame): DataFrame = {
    // Same round-13 shape as [[kmeansRound]]: typed hash-agg argmin
    // (min squared-L2, tie to the smallest code — identical to the
    // former min(struct(d, code)), which planned as SortAggregate)
    // and a one-shuffle VecSumAgg update over the PqDs-dim
    // subvectors. The cast keeps cb.code IntegerType across rounds
    // (the seed's type and the stored artifact's schema).
    val asg = sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"),
        subDist(col("sv"), col("cbv")).as("d"), col("code"))
      .groupBy("vec_id", "m")
      .agg(graft.functions.ArgPickAgg.argMinId(col("d"), col("code"))
        .as("c0"))
      .select(col("vec_id"), col("m"),
        col("c0").cast("int").as("code"))
    asg.join(subq, Seq("vec_id", "m"))
      .groupBy("m", "code")
      .agg(graft.functions.VecSumAgg.vecSumAgg(col("sq"), PqDs)
        .as("qs"), count(lit(1)).as("n"))
      .select(col("m"), col("code"),
        transform(col("qs"), q =>
          (q.cast("double") / lit(QScale)) / col("n").cast("double"))
          .as("cbv"))
  }

  /** (vec_id, m, sv): every vector split into its PqM subvectors. */
  private[graft] def subvecs(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("v"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * PqDs + 1, lit(PqDs)).as("sv"))

  /** [[KmIters]] per-subspace Lloyd's rounds over an arbitrary
    * training slice (first-PqCodes seed) — shared like
    * [[lloydCentroids]].
    */
  private[graft] def lloydCodebooks(train: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.statsBarrier
    val sub = VectorIndex.phase("cb: subvec ckpt") {
      subvecs(train).localCheckpoint()
    }
    // Same one-time layout as lloydCentroids' eq: the per-round
    // update join re-used this frame by (vec_id, m) every round.
    val subq = VectorIndex.phase("cb: quant ckpt") {
      sub.select(col("vec_id"), col("m"),
        quantize(col("sv")).as("sq"))
        .repartition(col("vec_id"), col("m"))
        .sortWithinPartitions("vec_id", "m")
        .localCheckpoint()
    }
    var cb = sub.filter(col("vec_id") < PqCodes)
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sv").as("cbv"))
    for (i <- 1 to KmIters)
      cb = VectorIndex.phase(s"cb: round $i") {
        statsBarrier(pqRound(sub, subq, cb).localCheckpoint())
      }
    cb
  }

  /** The trained PQ codebook table (m, code, cbv) — [[KmIters]]
    * Lloyd's rounds per subspace from the first-PqCodes seed.
    */
  def trainedCodebooks(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "ss_pq_cb") {
      lloydCodebooks(vecs(s, dir))
    }

  // ss_kmeans_train: the trained IVF centroids surfaced relationally
  // (cid, idx, c) — the oracle replays the identical unrolled rounds.
  def kmeansTrain(s: SparkSession, dir: String): DataFrame =
    trainedCentroids(s, dir)
      .select(col("cid"), posexplode(col("cv")).as(Seq("idx", "c")))
      .select(col("cid"), col("idx").cast("long").as("idx"), col("c"))
      .orderBy("cid", "idx")

  /** IVF assignment: nearest centroid per vector (one narrow pass;
    * the centroid table is broadcast). Public because this IS the
    * index-build step: at 100 TB the output is written
    * `partitionBy("cid")` so a probe becomes partition pruning —
    * proven in PlanAuditSpec's ivf partitioned-write audit. Lineage-
    * materialized per (session, dir): the index is BUILT once and
    * read by every query against it ([[ivfTopK]], [[ivfPqTopK]]) —
    * re-deriving it per query measured the build, not the search.
    */
  def ivfAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "ss_ivf_assign") {
      ivfAssignBuild(s, dir)
    }

  private def ivfAssignBuild(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cent = trainedCentroids(s, dir)
    // Typed hash-agg argmax (round 13 — the round-12 first()+
    // max(struct) single agg planned as SortAggregate with the
    // vectors riding the sort); the slim (vec_id, cc, cid) agg never
    // sorts, and the vectors attach by ONE narrow keyed join after.
    val asg = e.join(broadcast(cent))
      .select(col("vec_id"),
        cosine(col("v"), col("cv"), col("nrm"), col("cn")).as("ccos"),
        col("cid"))
      .groupBy("vec_id")
      .agg(graft.functions.ArgPickAgg.argMaxId(col("ccos"), col("cid"))
        .as("cid"))
    e.join(asg, "vec_id").select("vec_id", "v", "nrm", "cid")
  }

  // -----------------------------------------------------------------
  // ss_ivf_topk: IVF-Flat approximate top-k (probe NProbe lists).
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cent = trainedCentroids(s, dir)
    val assign = ivfAssign(s, dir)

    // Probes: the NProbe nearest centroids per query.
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val wp = Window.partitionBy("query_id").orderBy(desc("pcos"), asc("cid"))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qn"), col("cid"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("pcos"))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))

    // Search only the probed lists (at scale: partition pruning on cid).
    val wr = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    probes.join(assign, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  // -----------------------------------------------------------------
  // ss_knn_graph: the k-NN GRAPH over the whole corpus — every vector's
  // KnnK nearest neighbors, IVF-bounded. This is the semantic-curation
  // primitive (SemDeDup-style pipelines: kNN graph → threshold edges →
  // connected components, which [[graft.dedup.Dedup.cluster]] already
  // provides): each vector probes its NProbe nearest centroids and
  // scores only the vectors ASSIGNED to those lists, so total pair
  // evaluations are ≈ NProbe/C of the N² brute force, and at 100 TB
  // the probe side joins against the cid-partitioned index exactly as
  // [[ivfTopK]] does (partition pruning per probe). Approximate by
  // construction (a true neighbor assigned to an unprobed list is
  // missed); [[cosineTopK]] remains the recall-1.0 tier for query
  // sets. Ties break by neighbor id — orderings agree cross-engine.
  //
  // SCALING RULE (applied in the declared query since round 5,
  // VERDICT r4 item 2): with C fixed, pair evals are NProbe·N²/C —
  // quadratic (measured: 10× data → 9× wall at the gate-sized C=16).
  // Production IVF grows the centroid count with the corpus — C ≈ √N
  // is the standard rule — keeping list sizes ≈ √N and total pair
  // evals ≈ NProbe·N^1.5. The declared query therefore derives
  // C = max(NumCentroids, ⌊√N⌋) from the corpus count itself:
  // deterministic (one exact count, one correctly-rounded IEEE sqrt —
  // identical in both engines), so the DuckDB oracle reproduces the
  // centroid set bit-for-bit via the same scalar subquery, and the
  // graph build stays N^1.5 at any scale. (ss_ivf_topk keeps the
  // fixed gate-sized C: its cost is Q·N/C per query set, linear in N
  // regardless of C, so there is nothing quadratic to fix there.)
  val KnnK = 4

  /** C ≈ √N centroid-count law for the kNN graph (floor'd, never
    * below the gate-sized [[NumCentroids]]).
    */
  def knnCentroidCount(n: Long): Long =
    math.max(NumCentroids.toLong,
      math.floor(math.sqrt(n.toDouble)).toLong)

  def knnGraph(s: SparkSession, dir: String): DataFrame =
    knnEdges(s, dir).orderBy("vec_id", "rank")

  /** The unordered kNN edge frame — shared prefix of ss_knn_graph and
    * dd_semantic, so it is materialized once per (session, dir)
    * (VERDICT r5 item 2; same [[graft.operators.Lineage]] pattern as
    * the graph/basket tier and the CC label frame).
    */
  private[graft] def knnEdges(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "knn_edges") {
      knnGraphBuild(s, dir)
    }

  private def knnGraphBuild(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    // One exact count up front (a metadata-only parquet aggregate) —
    // the price of the √N law; everything downstream is unchanged.
    val c = knnCentroidCount(Tables(s, dir, "embeddings").count())
    val cent = e.filter(col("vec_id") < c)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    // NARROW top-C window (round-5 rewrite): with C ≈ √N the
    // vector×centroid frame is N·√N rows, and carrying the 64-double
    // vector through the row_number exchange made the window shuffle
    // ~20× wider than needed (measured 12.2 s at sf1). Rank on
    // (vec_id, cid, ccos) only — ~24 bytes/row — then join the
    // vectors back by vec_id (an N-row narrow shuffle). One shared
    // ranked frame serves both the rn=1 assignment and the
    // rn ≤ NProbe probe list (ReusedExchange).
    val scored = e.join(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        cosine(col("v"), col("cv"), col("nrm"), col("cn")).as("ccos"))
    val wa = Window.partitionBy("vec_id").orderBy(desc("ccos"), asc("cid"))
    val ranked = scored.withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= NProbe)
      .select(col("vec_id"), col("cid"), col("rn"))
      .repartition(col("vec_id"))
    val assign = ranked.filter(col("rn") === 1).drop("rn")
      .join(e, "vec_id")
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    val probes = ranked.drop("rn")
      .join(e, "vec_id")
      .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("cid"))
    // No distinct needed: assignment gives each neighbor ONE cid, and
    // a vector's probed cids are distinct, so a pair scores once.
    val wr = Window.partitionBy("vec_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    probes
      .join(assign.select(col("vec_id").as("neighbor_id"),
        col("v"), col("nrm"), col("cid")), "cid")
      .filter(col("neighbor_id") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= KnnK)
      .select("vec_id", "neighbor_id", "rank", "cos")
  }

  // -----------------------------------------------------------------
  // ss_centroid: element-wise vector aggregation — per-label centroid
  // of the embedding column via posexplode + (label, idx) group-by.
  // This is the "reduce over vectors" primitive (class centroids,
  // cluster means, gradient-style averaging) expressed so the shuffle
  // carries (label, idx, partial-sum) — D rows per input vector but
  // tiny fixed-width values, with map-side partial aggregation.
  //
  // Determinism across engines: double sums are order-sensitive, so
  // components are first quantized to exact integers
  // (floor(v·10^6) — floor, not round, because the engines' tie
  // conventions could differ), summed exactly as BIGINT, and the mean
  // is two fixed-order IEEE divisions both engines perform
  // identically. The fixture floats are unit-range so 10^6
  // quantization keeps every value exact below 2^62 sums.
  def centroid(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("idx", "x")))
      .select(col("label"), col("idx").cast("long").as("idx"),
        floor(col("x").cast("double") * lit(1000000.0)).cast("long").as("q"))
      .groupBy("label", "idx")
      .agg(sum(col("q")).as("qs"), count(lit(1)).as("n"))
      .select(col("label"), col("idx"), col("n"),
        ((col("qs").cast("double") / lit(1000000.0)) / col("n"))
          .as("centroid"))
      .orderBy("label", "idx")

  // -----------------------------------------------------------------
  // ss_pq_topk: PRODUCT-QUANTIZATION ANN (Jégou et al., "Product
  // Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  // MEMORY-side scale path, complementing IVF's compute-side pruning.
  // At 100 TB the embedding column itself is the bottleneck: 64
  // float32 dims = 256 bytes/vector, while PQ codes are PqM bytes
  // (32× compression), so the entire searchable index fits in
  // executor memory where raw vectors cannot. The three classic
  // stages, each a narrow relational pass:
  //
  //  1. ENCODE: split each vector into PqM subvectors; quantize each
  //     to its nearest codebook entry (argmin of squared-L2, tie →
  //     smallest code, via the lexicographic min-of-struct trick).
  //     Codebooks are TRAINED ([[trainedCodebooks]] — per-subspace
  //     fixed-round Lloyd's, integer-quantized means, so both
  //     engines agree exactly; round 7, replacing the first-PqCodes
  //     seeding).
  //  2. ADC (asymmetric distance computation): per query, a distance
  //     TABLE d[m][c] = ||q_m − c_m||² (PqM·PqCodes doubles — what
  //     FAISS precomputes per query); the estimated distance of a
  //     corpus vector is the strict left-to-right sum of PqM table
  //     lookups by its codes — never touching the raw vector.
  //  3. RERANK: the PqRerank best ADC candidates (est asc, id asc)
  //     are re-scored with the exact cosine; output is the top
  //     TopK by true cosine. Approximate by construction;
  //     [[cosineTopK]] is the recall-1.0 tier.
  //
  // Scale shape: codebook and per-query tables are broadcast (KB);
  // the ADC pass streams over the CODES table (PqM bytes/row);
  // only PqRerank rows per query ever read raw vectors again.
  val PqM = 8       // subspaces
  val PqDs = 8      // dims per subspace (PqM · PqDs = 64)
  val PqCodes = 16  // codebook entries per subspace
  // ADC candidates re-ranked exactly. Fixture-scale note: 40 of 500
  // vectors; seeded codebooks measured recall 0.65 here, the trained
  // Lloyd's codebooks measure 0.78 (VectorSearchSpec pins the
  // trained level). At production scale R stays fixed while N grows
  // (R/N → 0) and recall is governed by codebook quality — which is
  // exactly why the codebooks are trained.
  val PqRerank = 40

  /** Squared L2 between two pre-sliced PqDs-dim arrays: strict
    * left-to-right fold, same op sequence as the oracle's
    * list_reduce. Round 13: the codegen'd
    * [[graft.functions.DoubleSubDist]] — the interpreted zip_with
    * form cost ~23 µs/row and ran on the subvector × codebook-entry
    * stream every cb Lloyd round (the dominant term of the
    * `ss_rag_index` cold octave trend). Identical IEEE fold.
    */
  private[graft] def subDist(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dsubdist(a, b)

  /** vec_id → codes (array of PqM ints): the PQ-encoded corpus,
    * quantized against the TRAINED codebooks. Lineage-materialized
    * per (session, dir) — the codes table IS the PQ index (PqM
    * bytes/vector; what FAISS persists), built once and scanned by
    * every ADC query ([[pqTopK]], [[ivfPqTopK]]).
    */
  private def pqEncoded(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "ss_pq_codes") {
      pqEncodedBuild(s, dir)
    }

  private def pqEncodedBuild(s: SparkSession, dir: String): DataFrame =
    subvecs(vecs(s, dir))
      .join(broadcast(trainedCodebooks(s, dir)), "m")
      .select(col("vec_id"), col("m"), col("code"),
        subDist(col("sv"), col("cbv")).as("d"))
      .groupBy("vec_id", "m")
      .agg(graft.functions.ArgPickAgg.argMinId(col("d"), col("code"))
        .cast("int").as("code"))
      .groupBy("vec_id")
      .agg(collect_list(struct(col("m"), col("code")))
        .as("mc"))
      .select(col("vec_id"),
        transform(sort_array(col("mc")), x => x.getField("code"))
          .as("codes"))

  /** Per-query flat ADC distance table (index m·PqCodes + code) —
    * what FAISS precomputes per query; KB-sized, broadcast to the
    * codes scan. Shared by [[pqTopK]] and [[ivfPqTopK]].
    */
  private def pqDistTables(s: SparkSession, dir: String,
      q: DataFrame): DataFrame =
    q.select(col("query_id"), col("qv"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"))
      .select(col("query_id"), col("m"),
        slice(col("qv"), col("m") * PqDs + 1, lit(PqDs)).as("qsv"))
      .join(broadcast(trainedCodebooks(s, dir)), "m")
      .select(col("query_id"),
        struct((col("m") * PqCodes + col("code")).as("k"),
          subDist(col("qsv"), col("cbv")).as("d")).as("kd"))
      .groupBy("query_id")
      .agg(sort_array(collect_list(col("kd"))).as("kds"))
      .select(col("query_id"),
        transform(col("kds"), x => x.getField("d")).as("dt"))

  /** ADC estimated distance: PqM table lookups, folded left-to-right
    * (same op sequence as the oracle's list_reduce). Round 13: the
    * interpreted HOF fold became the codegen'd
    * [[graft.functions.AdcEst]] — identical ascending-m IEEE fold,
    * bit-identical estimates (NativeExprEquivalenceSpec), evaluated
    * once per ADC candidate in every IVFPQ search path.
    */
  private[graft] def adcEst: Column =
    graft.functions.AdcEst.adcEst(col("dt"), col("codes"), PqM, PqCodes)

  /** The original HOF fold — the interpreted reference implementation
    * NativeExprEquivalenceSpec pins [[adcEst]] against.
    */
  private[graft] def adcEstHof: Column =
    aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0),
      (acc, m) => acc + element_at(col("dt"),
        m * PqCodes + element_at(col("codes"), m + 1) + 1))

  def pqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val dts = pqDistTables(s, dir, q)
    val wc = Window.partitionBy("query_id")
      .orderBy(asc("est"), asc("neighbor_id"))
    val cand = pqEncoded(s, dir)
      .join(broadcast(dts), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcEst.as("est"))
      .withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= PqRerank)
      .select("query_id", "neighbor_id")
    // Exact re-rank of the candidate lists only.
    val wr = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    cand.join(broadcast(q), "query_id")
      .join(e, col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  // -----------------------------------------------------------------
  // ss_ivfpq_topk: IVFADC — the two scale paths COMPOSED (Jégou et
  // al. 2011, §IV; the FAISS IVFPQ index): IVF prunes WHICH vectors a
  // query scores (NProbe/C of the corpus via cid partition pruning),
  // PQ shrinks WHAT the scan reads per vector (PqM code bytes instead
  // of the raw float vector), and the exact rerank touches raw
  // vectors only for the PqRerank survivors. This is the shape a
  // 100 TB deployment actually runs: per query the ADC pass streams
  // NProbe·N/C code rows against a broadcast KB distance table, so
  // both the compute AND memory dimensions scale sub-linearly at
  // once — neither parent query does both. Approximate on two axes by
  // construction (unprobed list + codebook error); [[cosineTopK]] is
  // the recall-1.0 tier and the gate compares the two engines running
  // the identical algorithm.
  /** The composed IVFPQ index: (cid, vec_id, codes) — PQ codes stored
    * INSIDE the inverted lists, which is literally what a FAISS IVFPQ
    * index file is. Built once per (session, dir) by joining the two
    * parent indexes; at 100 TB this table is written
    * `partitionBy("cid")` and a probe is partition pruning over rows
    * of PqM code bytes. Keeping the join in the BUILD means the query
    * path never shuffles the corpus — the pre-index query plan
    * measured 1.9 s vs pq's 1.5 s at the 64× fixture because the
    * assignment⋈codes join by vec_id ran per query.
    */
  private def ivfPqIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.Lineage.materialized(s, dir, "ss_ivfpq_index") {
      ivfAssign(s, dir).select(col("vec_id"), col("cid"))
        .join(pqEncoded(s, dir), "vec_id")
    }

  def ivfPqTopK(s: SparkSession, dir: String): DataFrame = {
    // Cold-path: the two trainers this composition needs are
    // independent — build them concurrently (round 12; no-op when
    // either is already session-cached).
    graft.operators.Lineage.parallel(s, dir, Seq(
      "ss_km_cent" -> (() => lloydCentroids(vecs(s, dir))),
      "ss_pq_cb" -> (() => lloydCodebooks(vecs(s, dir)))))
    val e = vecs(s, dir)
    val cent = trainedCentroids(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))

    // Probes: the NProbe nearest centroids per query (as [[ivfTopK]]).
    val wp = Window.partitionBy("query_id").orderBy(desc("pcos"), asc("cid"))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("cid"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("pcos"))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("cid"))

    // ADC over the probed lists only: the tiny probe set broadcasts
    // into one pruned scan of the composed index (partition pruning
    // on cid at scale), scored by distance-table lookup.
    val wc = Window.partitionBy("query_id")
      .orderBy(asc("est"), asc("neighbor_id"))
    val cand = ivfPqIndex(s, dir)
      .join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(pqDistTables(s, dir, q)), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcEst.as("est"))
      .withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= PqRerank)
      .select("query_id", "neighbor_id")

    // Exact re-rank of the candidate lists only (as [[pqTopK]]).
    val wr = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    cand.join(broadcast(q), "query_id")
      .join(e, col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_cosine_topk" -> cosineTopK,
    "ss_ivf_topk" -> ivfTopK,
    "ss_knn_graph" -> knnGraph,
    "ss_centroid" -> centroid,
    "ss_pq_topk" -> pqTopK,
    "ss_ivfpq_topk" -> ivfPqTopK,
    "ss_kmeans_train" -> kmeansTrain,
  )

  // ---------------------------------------------------------------
  // DuckDB oracles — same arithmetic, same tie-breaks.
  private[graft] val DVecs =
    """SELECT vec_id,
       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       sqrt(list_sum(list_prepend(CAST(0 AS DOUBLE),
         list_transform(list_transform(embedding,
           x -> CAST(x AS DOUBLE)), x -> x*x)))) AS nrm
       FROM embeddings"""

  private[graft] def dCos(av: String, bv: String, an: String, bn: String) =
    s"""list_sum(list_prepend(CAST(0 AS DOUBLE),
       list_transform(range(1, 65), i -> $av[i] * $bv[i]))) / ($an * $bn)"""

  /** ||a − b||² over two pre-sliced PqDs-dim lists — same
    * left-to-right fold as [[subDist]].
    */
  private def dSubPre(av: String, bv: String) =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       list_transform(range(1, ${PqDs + 1}),
         i -> ($av[i] - $bv[i]) * ($av[i] - $bv[i]))),
       (acc, x) -> acc + x)"""

  /** Quantize a DOUBLE list to exact BIGINTs — mirror of
    * [[quantize]].
    */
  private[graft] def dQuant(v: String) =
    s"""list_transform($v, x ->
       CAST(floor(x * 1000000.0) AS BIGINT))"""

  /** Norm of a built DOUBLE list — the exact DVecs fold. */
  private[graft] def dNorm(v: String) =
    s"""sqrt(list_sum(list_prepend(CAST(0 AS DOUBLE),
       list_transform($v, x -> x*x))))"""

  /** The unrolled [[KmIters]]-round Lloyd's training of the IVF
    * centroids (mirror of [[trainedCentroids]]) over the `src`
    * relation (the full corpus `e`, or the base slice `eb` for the
    * incremental-index gate); consumer CTE: `cent (cid, cv, cn)`.
    * MATERIALIZED per round — inlined CTEs re-expand the whole prior
    * chain per reference.
    */
  private[graft] def kmCtes(src: String): String = {
    val rounds = (1 to KmIters).map { r =>
      s"""kas$r AS MATERIALIZED (SELECT vec_id, cid FROM (
           SELECT $src.vec_id, c.cid,
             row_number() OVER (PARTITION BY $src.vec_id ORDER BY
               ${dCos(s"$src.v", "c.cv", s"$src.nrm", "c.cn")} DESC,
               c.cid) AS rn
           FROM $src CROSS JOIN kct${r - 1} c) WHERE rn = 1),
         kct$r AS MATERIALIZED (SELECT cid, cv, ${dNorm("cv")} AS cn
           FROM (SELECT cid, list(cd ORDER BY idx) AS cv FROM (
               SELECT cid, idx,
                 (CAST(qs AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE)
                   AS cd
               FROM (SELECT cid, idx, CAST(SUM(q) AS BIGINT) AS qs,
                   COUNT(*) AS n
                 FROM (SELECT a.cid, unnest(range(0, len(eq.qv))) AS idx,
                     unnest(eq.qv) AS q
                   FROM kas$r a JOIN eq ON eq.vec_id = a.vec_id)
                 GROUP BY cid, idx))
             GROUP BY cid))"""
    }.mkString(",\n")
    s"""eq AS MATERIALIZED (SELECT vec_id, ${dQuant("v")} AS qv
         FROM $src),
       kct0 AS MATERIALIZED (SELECT vec_id AS cid, v AS cv, nrm AS cn
         FROM $src WHERE vec_id < $NumCentroids),
       $rounds,
       cent AS (SELECT cid, cv, cn FROM kct$KmIters)"""
  }

  private lazy val KmCtes: String = kmCtes("e")

  /** The unrolled [[KmIters]]-round per-subspace Lloyd's training of
    * the PQ codebooks (mirror of [[trainedCodebooks]]) over the `src`
    * relation, PLUS the encode (over the FULL corpus `e`) +
    * per-query distance-table block on top of them; consumers:
    * `codes` and `dt`. Expects `e` and `q` in scope.
    */
  private[graft] def pqCtes(src: String): String = {
    val rounds = (1 to KmIters).map { r =>
      s"""pas$r AS MATERIALIZED (SELECT vec_id, m, code FROM (
           SELECT s.vec_id, s.m, c.code,
             row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
               ${dSubPre("s.sv", "c.cbv")}, c.code) AS rn
           FROM subt s JOIN pcb${r - 1} c ON c.m = s.m) WHERE rn = 1),
         pcb$r AS MATERIALIZED (SELECT m, code,
             list(cd ORDER BY idx) AS cbv
           FROM (SELECT m, code, idx,
               (CAST(qs AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE) AS cd
             FROM (SELECT m, code, idx, CAST(SUM(q) AS BIGINT) AS qs,
                 COUNT(*) AS n
               FROM (SELECT a.m, a.code,
                   unnest(range(0, len(sq.sq))) AS idx,
                   unnest(sq.sq) AS q
                 FROM pas$r a JOIN subq sq
                   ON sq.vec_id = a.vec_id AND sq.m = a.m)
               GROUP BY m, code, idx))
           GROUP BY m, code)"""
    }.mkString(",\n")
    s"""mm AS (SELECT unnest(range(0, $PqM)) AS m),
       sub AS MATERIALIZED (SELECT vec_id, m,
           list_slice(v, m * $PqDs + 1, (m + 1) * $PqDs) AS sv
         FROM e CROSS JOIN mm),
       subt AS MATERIALIZED (SELECT vec_id, m,
           list_slice(v, m * $PqDs + 1, (m + 1) * $PqDs) AS sv
         FROM $src CROSS JOIN mm),
       subq AS MATERIALIZED (SELECT vec_id, m, ${dQuant("sv")} AS sq
         FROM subt),
       pcb0 AS MATERIALIZED (SELECT m, CAST(vec_id AS INTEGER) AS code,
           sv AS cbv
         FROM subt WHERE vec_id < $PqCodes),
       $rounds,
       sd AS MATERIALIZED (SELECT s.vec_id, c.code, s.m,
           ${dSubPre("s.sv", "c.cbv")} AS d
         FROM sub s JOIN pcb$KmIters c ON c.m = s.m),
       bst AS (SELECT vec_id, m, code FROM (
           SELECT vec_id, m, code, row_number() OVER (
             PARTITION BY vec_id, m ORDER BY d, code) AS rn
           FROM sd) WHERE rn = 1),
       codes AS (SELECT vec_id, list(code ORDER BY m) AS codes
         FROM bst GROUP BY vec_id),
       qsub AS (SELECT query_id, m,
           list_slice(qv, m * $PqDs + 1, (m + 1) * $PqDs) AS qsv
         FROM q CROSS JOIN mm),
       cbgrid AS (SELECT gm.m, gc.code
         FROM (SELECT unnest(range(0, $PqM)) AS m) gm
         CROSS JOIN (SELECT unnest(range(0, $PqCodes)) AS code) gc),
       qd AS (SELECT s.query_id, g.code, s.m,
           CASE WHEN c.m IS NOT NULL THEN ${dSubPre("s.qsv", "c.cbv")}
             ELSE 1.7976931348623157e308 END AS d
         FROM qsub s JOIN cbgrid g ON g.m = s.m
         LEFT JOIN pcb$KmIters c ON c.m = g.m AND c.code = g.code),
       dt AS (SELECT query_id,
           list(d ORDER BY m * $PqCodes + code) AS dt
         FROM qd GROUP BY query_id)"""
  }

  private lazy val PqCtes: String = pqCtes("e")

  /** ADC estimate in DuckDB: PqM lookups of `dt.dt` by `codes.codes`,
    * left-to-right fold — mirror of [[adcEst]].
    */
  private[graft] lazy val DAdcEst: String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       list_transform(range(0, $PqM),
         m -> dt.dt[m * $PqCodes + codes.codes[m + 1] + 1])),
       (acc, x) -> acc + x)"""

  /** The IVF-bounded kNN-graph pipeline as a reusable CTE block
    * (`rk` = ranked candidate edges; consumers gate on `rank`).
    * Shared by the ss_knn_graph oracle and `Dedup`'s dd_semantic
    * oracle so the two queries provably score the same graph.
    */
  // The C ≈ √N law as a scalar subquery — same count, same
  // correctly-rounded IEEE sqrt/floor as [[knnCentroidCount]], so the
  // centroid set is identical across engines at any corpus size.
  private[graft] lazy val KnnGraphCtes: String =
    s"""e AS ($DVecs),
       cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
         WHERE vec_id < (SELECT GREATEST(CAST($NumCentroids AS BIGINT),
           CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))
           FROM e)),
       asg AS (SELECT vec_id, v, nrm, cid FROM (
           SELECT e.vec_id, e.v, e.nrm, cent.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               ${dCos("e.v", "cv", "e.nrm", "cn")} DESC, cid) AS rn
           FROM e CROSS JOIN cent) WHERE rn = 1),
       pr AS (SELECT vec_id, qv, qn, cid FROM (
           SELECT e.vec_id, e.v AS qv, e.nrm AS qn, cent.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               ${dCos("e.v", "cv", "e.nrm", "cn")} DESC, cid) AS rn
           FROM e CROSS JOIN cent) WHERE rn <= $NProbe),
       sc AS (SELECT pr.vec_id AS vec_id, asg.vec_id AS neighbor_id,
           ${dCos("qv", "asg.v", "qn", "asg.nrm")} AS cos
         FROM pr JOIN asg USING (cid)
         WHERE asg.vec_id <> pr.vec_id),
       rk AS (SELECT vec_id, neighbor_id, cos,
           CAST(row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank FROM sc)"""

  val oracles: Map[String, String] = Map(
    "ss_cosine_topk" ->
      s"""WITH e AS ($DVecs),
         q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
           WHERE vec_id < $NumQueries),
         sc AS (SELECT query_id, e.vec_id AS neighbor_id,
             ${dCos("qv", "e.v", "qn", "e.nrm")} AS cos
           FROM q JOIN e ON e.vec_id <> q.query_id),
         rk AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
         SELECT query_id, neighbor_id, rank, cos FROM rk
         WHERE rank <= $TopK ORDER BY query_id, rank""",
    "ss_ivf_topk" ->
      s"""WITH e AS ($DVecs),
         $KmCtes,
         asg AS (SELECT vec_id, v, nrm, cid FROM (
             SELECT e.vec_id, e.v, e.nrm, cent.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 ${dCos("e.v", "cv", "e.nrm", "cn")} DESC, cid) AS rn
             FROM e CROSS JOIN cent) WHERE rn = 1),
         q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
           WHERE vec_id < $NumQueries),
         pr AS (SELECT query_id, qv, qn, cid FROM (
             SELECT q.query_id, q.qv, q.qn, cent.cid,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 ${dCos("qv", "cv", "qn", "cn")} DESC, cid) AS rn
             FROM q CROSS JOIN cent) WHERE rn <= $NProbe),
         sc AS (SELECT query_id, asg.vec_id AS neighbor_id,
             ${dCos("qv", "asg.v", "qn", "asg.nrm")} AS cos
           FROM pr JOIN asg USING (cid)
           WHERE asg.vec_id <> pr.query_id),
         rk AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
         SELECT query_id, neighbor_id, rank, cos FROM rk
         WHERE rank <= $TopK ORDER BY query_id, rank""",
    "ss_knn_graph" ->
      s"""WITH $KnnGraphCtes
         SELECT vec_id, neighbor_id, rank, cos FROM rk
         WHERE rank <= $KnnK ORDER BY vec_id, rank""",
    "ss_pq_topk" ->
      s"""WITH e AS ($DVecs),
         q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
           WHERE vec_id < $NumQueries),
         $PqCtes,
         est AS (SELECT dt.query_id, codes.vec_id AS neighbor_id,
             $DAdcEst AS est
           FROM dt CROSS JOIN codes
           WHERE codes.vec_id <> dt.query_id),
         cand AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY est, neighbor_id) AS rn
             FROM est) WHERE rn <= $PqRerank),
         sc AS (SELECT cand.query_id, cand.neighbor_id,
             ${dCos("q.qv", "e.v", "q.qn", "e.nrm")} AS cos
           FROM cand JOIN q USING (query_id)
             JOIN e ON e.vec_id = cand.neighbor_id),
         rk AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
           FROM sc)
         SELECT query_id, neighbor_id, rank, cos FROM rk
         WHERE rank <= $TopK ORDER BY query_id, rank""",
    "ss_ivfpq_topk" ->
      s"""WITH e AS ($DVecs),
         q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
           WHERE vec_id < $NumQueries),
         $KmCtes,
         asg AS (SELECT vec_id, cid FROM (
             SELECT e.vec_id, cent.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 ${dCos("e.v", "cv", "e.nrm", "cn")} DESC, cid) AS rn
             FROM e CROSS JOIN cent) WHERE rn = 1),
         pr AS (SELECT query_id, cid FROM (
             SELECT q.query_id, cent.cid,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 ${dCos("qv", "cv", "qn", "cn")} DESC, cid) AS rn
             FROM q CROSS JOIN cent) WHERE rn <= $NProbe),
         $PqCtes,
         est AS (SELECT pr.query_id, asg.vec_id AS neighbor_id,
             $DAdcEst AS est
           FROM pr JOIN asg USING (cid)
             JOIN codes ON codes.vec_id = asg.vec_id
             JOIN dt ON dt.query_id = pr.query_id
           WHERE asg.vec_id <> pr.query_id),
         cand AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY est, neighbor_id) AS rn
             FROM est) WHERE rn <= $PqRerank),
         sc AS (SELECT cand.query_id, cand.neighbor_id,
             ${dCos("q.qv", "e.v", "q.qn", "e.nrm")} AS cos
           FROM cand JOIN q USING (query_id)
             JOIN e ON e.vec_id = cand.neighbor_id),
         rk AS (SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
           FROM sc)
         SELECT query_id, neighbor_id, rank, cos FROM rk
         WHERE rank <= $TopK ORDER BY query_id, rank""",
    "ss_kmeans_train" ->
      s"""WITH e AS ($DVecs),
         $KmCtes
         SELECT cid, idx, c FROM (
           SELECT cid, unnest(range(0, len(cv))) AS idx,
             unnest(cv) AS c
           FROM cent)
         ORDER BY cid, idx""",
    "ss_centroid" ->
      """WITH x AS (SELECT CAST(label AS BIGINT) AS label,
           unnest(range(0, len(embedding))) AS idx,
           unnest(list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)))
             AS q
           FROM embeddings)
         SELECT label, idx, COUNT(*) AS n,
           (CAST(SUM(q) AS DOUBLE) / 1000000.0) / COUNT(*) AS centroid
         FROM x GROUP BY label, idx ORDER BY label, idx""",
  )
}
