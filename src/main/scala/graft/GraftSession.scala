package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * One place for the configs every entry point (Verify, Bench, tests,
  * apps) must agree on:
  *
  *  - `spark.sql.session.timeZone=UTC` — DuckDB-oracle parity: the
  *    fixture timestamps are naive (parquet TIMESTAMP without UTC
  *    adjustment → Spark `timestamp_ntz`), so no wall-clock shifting
  *    may happen anywhere.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — the `events`
  *    fixture stores `ts` as parquet TIMESTAMP(NANOS); Spark has no
  *    nanosecond timestamp type, so we read the raw int64 nanos and
  *    convert explicitly (see [[Tables.events]]).
  *  - shuffle partitions sized to the local core count, not the 200
  *    default (local[N] = one JVM; 200 tiny partitions just adds task
  *    overhead). On a real cluster this is overridden by AQE
  *    (`spark.sql.adaptive.coalescePartitions.enabled`), which we
  *    leave on.
  */
object GraftSession {
  def local(cores: String, shufflePartitions: String,
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Never coalesce below the cluster's parallelism (round 13):
      // AQE's target-size math coalesces a small COMPRESSED shuffle
      // (~1 MB of band keys, piece ids, …) to ONE partition, and any
      // downstream blowup — a band join's candidate multiset, a
      // window sort over the re-exploded stream — then runs on one
      // core. The floor is the CORE COUNT (the same number a real
      // cluster sets here, scaling with the deployment, not with the
      // data or this box): partitions stay ≥ parallelism while AQE
      // still coalesces the long tail of genuinely tiny exchanges
      // down to it.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
        cores)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Scan-split sizing for the fixture scale: the default 128 MB
      // makes every fixture table (even sf1 lineitem at 105 MB) a
      // SINGLE scan task, serializing the scan+filter stage on one of
      // N cores. 16 MB splits multi-row-group files (sf1 lineitem =
      // 6 × 1M-row groups → 6 tasks); single-row-group files are
      // unsplittable regardless, which is why CPU-heavy text paths
      // additionally repartition raw rows (TextAnalysis.docs,
      // TextQueries.wordcount). A real 100 TB deployment keeps the
      // 128 MB default — there the file count, not this knob,
      // provides the parallelism.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // Runtime bloom-filter pruning: a selective join side plants a
      // bloom filter on the big side's scan — at 100 TB this prunes
      // most of a fact-table read when the dim filter is selective.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // ObjectHashAggregate (collect_list, the Vec*/ArgPick typed
      // aggregates) falls back to SORT-BASED aggregation after 4096
      // in-memory keys per task BY DEFAULT — which turned every
      // vec_id-keyed trainer/encode/embed aggregation into a full
      // sort of its input stream and produced the 2.51×/octave
      // ss_rag_index cold crossing (round 13 find; BASELINE round-12
      // octave note). 4M keys/task keeps these pure hash passes at
      // every measured scale (128× ≈ 440k keys/task; 640× ≈ 2M) for
      // tens of MB of map per task — well inside the unified pool;
      // genuinely unbounded-state aggs still spill via the fallback
      // beyond it.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      // InferFiltersFromGenerate re-infers isnotnull/size filters on a
      // generator input every optimizer iteration; alias substitution
      // expands each copy into the full derived-column expression tree
      // and pushdown stacks them below the exchanges — measured 114 s
      // (of a 2 s query) when exploding an md5-derived prefix array at
      // sf0.1. The inferred filters are a skip-empty-rows optimization
      // only; dropping the rule is semantics-preserving.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // Constraint propagation substitutes derived-column expression
      // trees (here: md5→shingle pipelines) into the constraint set of
      // every operator above them; on self-joins with residual
      // inequality predicates the set explodes and PLANNING dominates
      // execution 20× (prefix-join candidate stage: 75 s → 4 s
      // measured at sf0.1 by flipping this flag). The constraints only
      // buy inferred isnotnull/filter pruning, which the fixture plans
      // don't need — filters are explicit and keys are non-null.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
    // Pre-context overrides (e.g. SpillProof's constrained
    // spark.memory.fraction) — only effective for the JVM's FIRST
    // session, since local-mode executor memory is fixed at context
    // creation; later callers get the existing context regardless.
    val spark = extraConf.foldLeft(builder) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Session sized from the driver's env contract. */
  def fromEnv(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    local(cpus, cpus)
  }

  /** Child session with an ISOLATED SQLConf (VERDICT r6 item 6):
    * shares the SparkContext, block manager and catalog, but owns its
    * conf, so a scoped helper (streaming lifecycle runs that pin a
    * small state-partition count) can override settings without
    * mutating — or having to restore — the caller's session, and
    * without racing concurrent queries on it.
    *
    * `newSession()` alone starts from the CONTEXT defaults, which
    * would silently drop any runtime conf the parent has changed
    * since startup; the parent's runtime conf is therefore copied
    * first (static/non-modifiable entries skipped — they are
    * context-global and already shared), then the overrides applied.
    */
  def child(s: SparkSession, overrides: Map[String, String]): SparkSession = {
    val ss = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      try if (ss.conf.isModifiable(k)) ss.conf.set(k, v)
      catch { case _: Exception => () }
    }
    overrides.foreach { case (k, v) => ss.conf.set(k, v) }
    ss
  }
}
