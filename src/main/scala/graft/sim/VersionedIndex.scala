package graft.sim

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERSIONED ANN INDEX — atomic publish for CONCURRENT READERS
  * (round-8 forward item: "version-pointer atomic index publish").
  *
  * [[VectorIndex]] is a single mutable artifact: `append` adds files
  * under `lists/` in place and `compact` dynamic-overwrites bloated
  * partitions, so a reader planning a scan while a writer commits can
  * see a TORN index (half the appended cells, or a partition mid-
  * overwrite). Production table formats solve this with immutable
  * snapshots + an atomic commit marker (Iceberg/Delta's manifest
  * discipline); this module is that design over the same three
  * tables:
  *
  * ```
  * <root>/centroids/ pub=<p>/…          immutable data, partitioned
  * <root>/codebooks/ pub=<p>/…          by the PUBLISH that wrote them
  * <root>/lists/     pub=<p>/cid=<c>/…
  * <root>/v=<N>/manifest.json           which pubs compose version N
  * <root>/v=<N>/_COMMITTED              the atomic visibility marker
  * ```
  *
  * A PUBLISH writes data only into fresh `pub=` partitions, writes
  * `manifest.json`, then creates the empty `_COMMITTED` marker —
  * single-file creation, atomic on HDFS and create-visible on object
  * stores, so no rename-with-overwrite semantics are required
  * anywhere. Readers resolve the HIGHEST committed version at plan
  * time and read the manifest's pub set as a partition-pruned scan
  * (`pub` is a partition column, so unreferenced publishes cost
  * directory pruning, zero data). A publisher that dies mid-build
  * leaves a marker-less `v=` directory that no reader ever resolves;
  * the next publish numbers past it.
  *
  * The three publish kinds mirror a production index lifecycle:
  *  - [[publishBuild]]  — train + encode a base corpus (a new quantizer
  *    generation; the only publish that writes centroids/codebooks).
  *  - [[publishAppend]] — encode ONLY the batch against the current
  *    manifest's stored quantizers and add one list pub; the new
  *    manifest references the prior pubs + the new one. |batch| work,
  *    zero copies of history — snapshot isolation WITHOUT physical
  *    snapshot copies.
  *  - [[publishCompact]] — rewrite the current list set as one fresh
  *    pub (per-cid re-clustered); old versions keep reading the old
  *    pubs untouched.
  *
  * [[gc]] is the only destructive operation (the expire-snapshots
  * twin): drop all but the newest `keepLast` committed versions, then
  * delete every `pub=` partition no kept manifest references. Like
  * every table format's expiry, it assumes the SINGLE-WRITER
  * discipline — run it when no publish is in flight (a concurrent
  * publisher's uncommitted directory is indistinguishable from a
  * crashed one's) and no reader still holds a dropped version.
  *
  * 100 TB shape: commit cost is one small JSON + one empty marker
  * regardless of index size; append cost is |batch|; reader cost is
  * unchanged from [[VectorIndex.search]] (the manifest resolves to a
  * `pub IN (…)` partition filter on top of the same probe-pruned
  * scan); nothing ever rewrites or copies history on the publish
  * path.
  */
object VersionedIndex {

  import VectorSearch._

  /** One resolved snapshot: which publishes compose each table. */
  final case class Manifest(version: Long, quantPub: String,
      listPubs: Seq[String])

  private def centDir(root: String) = s"$root/centroids"
  private def cbDir(root: String) = s"$root/codebooks"
  private def listsDir(root: String) = s"$root/lists"
  private def vdir(root: String, v: Long) = s"$root/v=$v"

  private def hfs(s: SparkSession, root: String): FileSystem =
    new HPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private val VDir = "^v=([0-9]+)$".r

  /** Every version directory on disk, committed or not — the publish
    * numbering domain (a crashed publisher's number is never reused,
    * so its leftover data can never be adopted by a later commit).
    */
  private def allVersions(s: SparkSession, root: String): Seq[Long] = {
    val fs = hfs(s, root)
    val rp = new HPath(root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq.flatMap(st => st.getPath.getName match {
      case VDir(n) if st.isDirectory => Some(n.toLong)
      case _ => None
    }).sorted
  }

  /** Committed versions, ascending. */
  def committedVersions(s: SparkSession, root: String): Seq[Long] = {
    val fs = hfs(s, root)
    allVersions(s, root).filter(v =>
      fs.exists(new HPath(s"${vdir(root, v)}/_COMMITTED")))
  }

  // Manifest JSON is written and parsed HERE (both sides below), so
  // the grammar is closed: one object, three fixed keys.
  private def renderManifest(m: Manifest): String = {
    val pubs = m.listPubs.map(p => s""""$p"""").mkString(",")
    s"""{"version":${m.version},"quant_pub":"${m.quantPub}",""" +
      s""""list_pubs":[$pubs]}"""
  }

  private val VerR = """"version":([0-9]+)""".r
  private val QuantR = """"quant_pub":"([^"]+)"""".r
  private val PubsR = """"list_pubs":\[([^\]]*)\]""".r

  /** Read + parse one version's manifest (driver-side metadata I/O,
    * the same class of call as split planning's directory listing).
    */
  def manifest(s: SparkSession, root: String, v: Long): Manifest = {
    val fs = hfs(s, root)
    val p = new HPath(s"${vdir(root, v)}/manifest.json")
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    val txt = new String(buf, "UTF-8")
    val ver = VerR.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(sys.error(s"manifest $p: no version"))
    val quant = QuantR.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(sys.error(s"manifest $p: no quant_pub"))
    val pubs = PubsR.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(sys.error(s"manifest $p: no list_pubs"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.stripPrefix("\"").stripSuffix("\""))
    require(ver == v, s"manifest $p claims version $ver, dir says $v")
    Manifest(ver, quant, pubs)
  }

  /** The newest committed snapshot, if any publish ever completed. */
  def currentManifest(s: SparkSession, root: String): Option[Manifest] =
    committedVersions(s, root).lastOption.map(manifest(s, root, _))

  /** Write manifest.json, THEN create the `_COMMITTED` marker — the
    * ordering that makes the marker mean "everything this version
    * references is fully on disk".
    */
  private def commit(s: SparkSession, root: String,
      m: Manifest): Unit = {
    val fs = hfs(s, root)
    val dir = vdir(root, m.version)
    val out = fs.create(new HPath(s"$dir/manifest.json"), true)
    try out.write(renderManifest(m).getBytes("UTF-8"))
    finally out.close()
    fs.create(new HPath(s"$dir/_COMMITTED"), true).close()
  }

  private def nextVersion(s: SparkSession, root: String): Long =
    allVersions(s, root).lastOption.getOrElse(0L) + 1L

  /** Manifest-resolved table frames: partition-pruned by `pub`. */
  private[graft] def centOf(s: SparkSession, root: String,
      m: Manifest): DataFrame =
    s.read.parquet(centDir(root))
      .filter(col("pub") === m.quantPub).drop("pub")

  private[graft] def cbOf(s: SparkSession, root: String,
      m: Manifest): DataFrame =
    s.read.parquet(cbDir(root))
      .filter(col("pub") === m.quantPub).drop("pub")

  private[graft] def listsOf(s: SparkSession, root: String,
      m: Manifest): DataFrame =
    s.read.parquet(listsDir(root))
      .filter(col("pub").isin(m.listPubs: _*)).drop("pub")
      .withColumn("cid", col("cid").cast("long"))

  /** New quantizer generation: train on `base`, encode it, commit.
    * Returns the committed version number.
    */
  def publishBuild(s: SparkSession, root: String,
      base: DataFrame): Long = {
    val v = nextVersion(s, root)
    val pub = s"p$v"
    val cent = lloydCentroids(base).localCheckpoint()
    val cb = lloydCodebooks(base).localCheckpoint()
    cent.withColumn("pub", lit(pub)).write.mode("append")
      .partitionBy("pub").parquet(centDir(root))
    cb.withColumn("pub", lit(pub)).write.mode("append")
      .partitionBy("pub").parquet(cbDir(root))
    VectorIndex.encode(base, cent, cb).withColumn("pub", lit(pub))
      .write.mode("append").partitionBy("pub", "cid")
      .parquet(listsDir(root))
    commit(s, root, Manifest(v, pub, Seq(pub)))
    // Both consumers (the three writes) have executed; release the
    // Lloyd memos (the ADVICE-r8 checkpoint-release discipline).
    import org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint
    releaseCheckpoint(cent); releaseCheckpoint(cb)
    v
  }

  /** Incremental snapshot: encode ONLY `batch` against the current
    * manifest's stored quantizers, land it as one fresh pub, and
    * commit a manifest referencing history + the new pub. History is
    * neither read (beyond the two small quantizer tables) nor
    * copied.
    */
  def publishAppend(s: SparkSession, root: String,
      batch: DataFrame): Long = {
    val prev = currentManifest(s, root)
      .getOrElse(sys.error(s"$root: nothing committed to append to"))
    val v = nextVersion(s, root)
    val pub = s"p$v"
    VectorIndex.encode(batch, centOf(s, root, prev), cbOf(s, root, prev))
      .withColumn("pub", lit(pub))
      .write.mode("append").partitionBy("pub", "cid")
      .parquet(listsDir(root))
    commit(s, root, Manifest(v, prev.quantPub, prev.listPubs :+ pub))
    v
  }

  /** Maintenance snapshot: rewrite the CURRENT list set as one fresh
    * per-cid-clustered pub and commit a manifest referencing only it.
    * Unlike [[VectorIndex.compact]] this never overwrites — readers
    * of older versions keep their pubs bit-for-bit until [[gc]].
    */
  def publishCompact(s: SparkSession, root: String): Long = {
    val prev = currentManifest(s, root)
      .getOrElse(sys.error(s"$root: nothing committed to compact"))
    val v = nextVersion(s, root)
    val pub = s"p$v"
    listsOf(s, root, prev)
      .repartition(col("cid"))
      .withColumn("pub", lit(pub))
      .write.mode("append").partitionBy("pub", "cid")
      .parquet(listsDir(root))
    commit(s, root, Manifest(v, prev.quantPub, Seq(pub)))
    v
  }

  /** IVFADC search over one committed snapshot (default: newest).
    * Resolution happens HERE, at plan time — a publish that commits
    * after this call changes nothing the returned plan reads.
    */
  def search(s: SparkSession, root: String, q: DataFrame,
      corpus: DataFrame, version: Option[Long] = None): DataFrame = {
    val m = version.map(manifest(s, root, _))
      .orElse(currentManifest(s, root))
      .getOrElse(sys.error(s"$root: no committed version to search"))
    VectorIndex.searchFrames(s, centOf(s, root, m), cbOf(s, root, m),
      listsOf(s, root, m), q, corpus)
  }

  /** Expire snapshots: keep the newest `keepLast` committed versions,
    * delete every other `v=` directory (committed or crashed — under
    * the single-writer discipline an uncommitted directory has no
    * live owner), then delete every `pub=` partition no kept manifest
    * references. Returns (dropped versions, dropped pubs).
    */
  def gc(s: SparkSession, root: String,
      keepLast: Int = 2): (Seq[Long], Seq[String]) = {
    require(keepLast >= 1, "gc must keep at least the current version")
    val fs = hfs(s, root)
    val committed = committedVersions(s, root)
    val kept = committed.takeRight(keepLast).toSet
    val dropVs = allVersions(s, root).filterNot(kept)
    dropVs.foreach(v => fs.delete(new HPath(vdir(root, v)), true))
    val keptMs = kept.toSeq.sorted.map(manifest(s, root, _))
    val refQuant = keptMs.map(_.quantPub).toSet
    val refLists = keptMs.flatMap(_.listPubs).toSet
    def sweep(dir: String, ref: Set[String]): Seq[String] = {
      val dp = new HPath(dir)
      if (!fs.exists(dp)) Seq.empty
      else fs.listStatus(dp).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("pub="))
        .map(_.getPath.getName.stripPrefix("pub="))
        .filterNot(ref)
        .map { p => fs.delete(new HPath(s"$dir/pub=$p"), true); p }
    }
    val droppedPubs = (sweep(centDir(root), refQuant) ++
      sweep(cbDir(root), refQuant) ++
      sweep(listsDir(root), refLists)).distinct.sorted
    (dropVs, droppedPubs)
  }

  // -----------------------------------------------------------------
  // ss_version_search: the versioned lifecycle, oracle-gated. v1 =
  // publishBuild(base), v2 = publishAppend(increment) — so the newest
  // snapshot's contents are EXACTLY ss_ivfpq_incr's store and the
  // oracle is reused verbatim (base-trained quantizers, full corpus
  // encoded with them, IVFADC search): matching hashes prove the
  // manifest-resolved read composes the two pubs into precisely the
  // rebuilt index. The spec additionally pins what the oracle cannot
  // express — that v1 still answers with the BASE-ONLY result after
  // v2 commits (snapshot isolation), the crash-window and gc
  // behaviors.
  private def gatePath(s: SparkSession, dir: String): String = {
    graft.operators.GateSweep.sweepStale()
    "/tmp/graft_vindex_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString +
      s"_${ProcessHandle.current().pid()}_${System.identityHashCode(s)}"
  }

  def versionSearch(s: SparkSession, dir: String): DataFrame = {
    val root = gatePath(s, dir)
    graft.operators.Lineage.ensure(s, dir, "ss_version_store") {
      val fs = hfs(s, root)
      fs.delete(new HPath(root), true) // a crashed previous run
      val et = VectorIndex.withThreshold(vecs(s, dir)).localCheckpoint()
      publishBuild(s, root,
        et.filter(col("vec_id") < col("thr")).drop("thr"))
      publishAppend(s, root,
        et.filter(col("vec_id") >= col("thr")).drop("thr"))
      ()
    }
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    search(s, root, q, e)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_version_search" -> versionSearch,
  )

  // Verbatim oracle reuse (the ss_ingest_search precedent): the
  // newest snapshot must equal the incremental store's contents.
  val oracles: Map[String, String] = Map(
    "ss_version_search" -> VectorIndex.oracles("ss_ivfpq_incr"),
  )
}
