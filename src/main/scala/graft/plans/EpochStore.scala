package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned-epoch directory layout for the persisted LSM indexes
  * (graph-ANN and IVF families) — the crash-atomic alternative to
  * `mode("overwrite")` compaction.
  *
  * The problem (r17 advice): a compaction that overwrites
  * `path/edges` in place DELETES the live store before its job
  * commits, so a crash mid-compaction permanently loses index data
  * and a restarted stream replays only the last micro-batch onto the
  * damaged index; it also silently breaks any reader scanning the
  * same directory while the overwrite is in flight.
  *
  * The fix is the standard versioned-manifest pointer, expressed with
  * nothing but a directory convention (works on HDFS, S3 and local):
  *
  *   - An index lives under `path/state-NNNNNN/...` epoch directories.
  *   - An epoch is COMMITTED iff its zero-byte `_COMMITTED` marker
  *     file exists. Marker creation is a single file create — atomic
  *     on HDFS/local (create+close) and on object stores (PUT) — and
  *     it is written strictly AFTER every store file of the epoch, so
  *     a crash at any earlier point leaves an uncommitted directory
  *     readers never look at.
  *   - Readers resolve `max(committed epoch)` and read ONLY inside
  *     it; a half-written epoch is invisible. Appends (mode("append"))
  *     land in the current committed epoch — they never delete
  *     anything, so they need no epoch bump.
  *   - Compaction/rebuild writes a complete NEW epoch, commits the
  *     marker, then prunes: committed epochs older than the previous
  *     one are deleted best-effort. Keeping the immediate predecessor
  *     gives in-flight readers that resolved just before the swap a
  *     full compaction cycle of grace; a reader lagging by TWO
  *     compactions can fail — the documented bound. Disk cost: at
  *     most two live epochs (~2x index size) transiently.
  *
  * Single-writer rule unchanged: build/append/compact come from one
  * owner (e.g. a streaming foreachBatch). An uncommitted epoch found
  * by the next `begin` is therefore this writer's own crash debris
  * and is deleted before a new epoch number is chosen.
  *
  * Epoch resolution doubles as CROSS-PROCESS cache invalidation
  * (r17 advice on the per-JVM meta/centroid memos): sidecar caches
  * key on the resolved epoch directory, so a rebuild by another
  * process — new geometry, new epoch — can never serve stale cached
  * parameters; dead-epoch entries age out of the bounded [[Memo]].
  */
private[graft] object EpochStore {

  private val StateRe = "^state-(\\d{6})$".r
  private val Marker = "_COMMITTED"

  def stateDir(path: String, epoch: Int): String = f"$path/state-$epoch%06d"

  private def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** `(epoch, committed)` for every state dir under `path`. */
  private def listEpochs(spark: SparkSession, path: String): Seq[(Int, Boolean)] = {
    val fs = fileSystem(spark, path)
    val base = new Path(path)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case StateRe(n) =>
            Some(n.toInt -> fs.exists(new Path(st.getPath, Marker)))
          case _ => None
        }
      case _ => None
    }.flatten
  }

  /** Highest committed epoch's directory, if any. One FS listing —
    * cheap enough to run per micro-batch / per search batch. */
  def resolve(spark: SparkSession, path: String): Option[String] = {
    val committed = listEpochs(spark, path).collect { case (n, true) => n }
    if (committed.isEmpty) None else Some(stateDir(path, committed.max))
  }

  /** Open the next epoch for writing: uncommitted debris (the single
    * writer's own crashed epochs) is deleted, and the new epoch number
    * is one past everything ever seen. Nothing is visible to readers
    * until [[commit]]. */
  def begin(spark: SparkSession, path: String): (Int, String) = {
    val fs = fileSystem(spark, path)
    val epochs = listEpochs(spark, path)
    epochs.collect { case (n, false) => n }.foreach { n =>
      try fs.delete(new Path(stateDir(path, n)), true) catch { case _: Exception => () }
    }
    val next = if (epochs.isEmpty) 0 else epochs.map(_._1).max + 1
    (next, stateDir(path, next))
  }

  /** Commit epoch `epoch` (atomic marker create), then best-effort
    * prune committed epochs older than its immediate predecessor. */
  def commit(spark: SparkSession, path: String, epoch: Int): Unit = {
    val fs = fileSystem(spark, path)
    fs.create(new Path(stateDir(path, epoch), Marker), false).close()
    val committed = listEpochs(spark, path)
      .collect { case (n, true) => n }.sorted
    committed.dropRight(2).foreach { n =>
      try fs.delete(new Path(stateDir(path, n)), true) catch { case _: Exception => () }
    }
  }

  /** True when `path` holds any of `legacySubdirs` directly — a
    * pre-epoch index layout the caller should reject with a rebuild
    * message rather than a confusing missing-path error. */
  def hasLegacyLayout(spark: SparkSession, path: String,
                      legacySubdirs: Seq[String]): Boolean =
    legacySubdirs.exists(s => subdirExists(spark, path, s))

  /** Plain existence check for an optional store inside a state dir. */
  def subdirExists(spark: SparkSession, dir: String, sub: String): Boolean =
    fileSystem(spark, dir).exists(new Path(s"$dir/$sub"))
}

/** Tiny synchronized LRU memo for driver-side sidecar parameters
  * (graph meta, IVF centroids/codebooks). Bounded so epoch-keyed
  * entries of long-dead index states cannot accumulate forever in a
  * resident process (r17 advice). */
private[graft] final class Memo[V <: AnyRef](cap: Int) {
  private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override protected def removeEldestEntry(
        e: java.util.Map.Entry[String, V]): Boolean = size() > cap
  }
  def getOrElseUpdate(k: String)(f: => V): V = synchronized {
    val hit = m.get(k)
    if (hit != null) hit
    else { val v = f; m.put(k, v); v }
  }
  def put(k: String, v: V): Unit = synchronized { m.put(k, v); () }
}
