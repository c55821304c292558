package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Log-structured standing frame for the streaming folds whose state is
  * corpus-sized (containment docs/postings/prefixes, BM25 postings,
  * line-dedup index and rewrites).
  *
  * The re-pin pattern the other folds use —
  * `standing.unionByName(batch).localCheckpoint(true)` — WRITES the
  * full standing corpus through the block manager every micro-batch:
  * O(standing) per fold, cumulatively quadratic in stream length. Fine
  * for model-sized state (centroids, count maps, funnels); the one
  * streaming-side term that grows with corpus at 100 TB. This class
  * replaces it with an append-only spool of parquet DELTA GENERATIONS:
  *
  *   - [[append]] writes ONLY the batch rows (one parquet write,
  *     cost ∝ batch) as a new generation;
  *   - [[read]] unions the live generations lazily (one multi-path
  *     parquet scan — columnar, filter/pushdown-friendly);
  *   - read amplification is bounded by compaction: when the live
  *     generation count reaches `compactEvery`, the spool is rewritten
  *     as one generation — amortized O(standing / compactEvery) per
  *     fold, and the ONLY point where standing rows are rewritten.
  *
  * Associative read-time folds (per-key min for line ownership,
  * per-key sum for document frequency) stay exact because every
  * generation holds a batch-level partial and the consumer aggregates
  * over [[read]] — for ANY compaction schedule, since compaction is a
  * plain row-preserving rewrite.
  *
  * Lifetime contract (same as the checkpoint-pin discipline it
  * replaces): a frame returned by `read` — or by a fold class's
  * `current` that is backed by one — is valid until the NEXT fold;
  * compaction may delete the files behind it after that. Call the
  * owning class's `unpersist()` to delete the spool.
  *
  * Locality: `spoolDir` defaults to a tmpfs-backed temp directory
  * (`/dev/shm` — generations are micro-batch partials; paying disk
  * latency per fold in local mode doubles the fold floor) ONLY when it
  * is writable AND has comfortable headroom ([[DeltaFrame.tmpfsEligible]]
  * — tmpfs is RAM, and this class explicitly holds CORPUS-SIZED state,
  * so an unchecked default could fill /dev/shm with ENOSPC where plain
  * disk kept working); otherwise the JVM temp dir. A tmpfs-rooted spool
  * additionally migrates itself to disk mid-stream if free space falls
  * below a floor ([[append]]). On a real cluster pass a shared
  * filesystem path (the same requirement the EventLog already carries);
  * an explicit `spoolDir` is caller-managed (no auto-placement, no
  * shutdown-hook deletion, still removed by [[delete]]).
  *
  * Hygiene: auto-placed spools are registered with a JVM shutdown hook
  * (abnormal exits otherwise leak the dirs — leaked RAM when on tmpfs),
  * and construction sweeps orphaned `graft-delta-*` dirs older than
  * [[DeltaFrame.OrphanAgeMs]] left behind by killed JVMs. */
private[streaming] final class DeltaFrame(spark: SparkSession,
    name: String, compactEvery: Int = 64,
    spoolDir: Option[String] = None) {
  require(compactEvery >= 2, "compactEvery must be at least 2")

  private val autoPlaced = spoolDir.isEmpty
  private var root: java.nio.file.Path = spoolDir match {
    case Some(d) =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(p)
      p
    case None =>
      DeltaFrame.sweepOrphans()
      val r = DeltaFrame.autoRoot(name)
      DeltaFrame.registerLive(r)
      r
  }
  DeltaFrame.trackSpool(root, name, autoPlaced)

  private val gens = scala.collection.mutable.ArrayBuffer.empty[String]
  private var nextGen = 0L

  def isEmpty: Boolean = gens.isEmpty

  /** Number of live generations (spec observability: flat-cost proofs
    * assert the count stays bounded by `compactEvery`). */
  def generationCount: Int = gens.size

  /** Spill one batch-sized partial as a new generation. Cost ∝ batch,
    * except every `compactEvery`-th call, which compacts. An auto-placed
    * tmpfs spool whose filesystem is nearly full migrates to disk FIRST
    * (one compaction-cost rewrite) instead of failing with ENOSPC —
    * tmpfs is RAM and standing state outgrowing it is a deployment
    * fact, not an error. */
  def append(df: DataFrame): Unit = {
    if (autoPlaced && DeltaFrame.onTmpfs(root) &&
        root.toFile.getUsableSpace < DeltaFrame.TmpfsFloorBytes)
      migrateToDisk()
    val p = root.resolve(s"g$nextGen").toString
    nextGen += 1
    df.write.mode("overwrite").parquet(p)
    gens += p
    if (gens.size >= compactEvery) compact()
  }

  /** Where the spool currently lives (spec observability). */
  def rootDir: String = root.toString

  /** Move the spool to a fresh JVM-temp-dir root: one compacting
    * rewrite of the standing contents, then the old root is deleted.
    * Called automatically by [[append]] when a tmpfs root runs low;
    * exposed for specs (low tmpfs space is not reproducible on
    * demand). */
  private[streaming] def migrateToDisk(): Unit = {
    val newRoot =
      java.nio.file.Files.createTempDirectory(s"graft-delta-$name-")
    if (autoPlaced) DeltaFrame.registerLive(newRoot)
    if (gens.nonEmpty) {
      val p = newRoot.resolve(s"g$nextGen").toString
      nextGen += 1
      spark.read.parquet(gens.toSeq: _*).write.mode("overwrite").parquet(p)
      gens.clear()
      gens += p
    }
    val oldRoot = root
    root = newRoot
    DeltaFrame.untrackSpool(oldRoot)
    DeltaFrame.trackSpool(newRoot, name, autoPlaced)
    if (autoPlaced) DeltaFrame.unregisterLive(oldRoot)
    deleteRecursively(oldRoot.toString)
  }

  /** Union of all live generations, lazily. Fails loudly before the
    * first append — an empty multi-path parquet read has no schema to
    * offer and a silent empty frame would mask a fold-order bug. */
  def read: DataFrame = {
    require(gens.nonEmpty, s"DeltaFrame($name) read before first append")
    spark.read.parquet(gens.toSeq: _*)
  }

  /** Rewrite the spool as ONE generation and delete the old ones. */
  def compact(): Unit = if (gens.size > 1) {
    val p = root.resolve(s"g$nextGen").toString
    nextGen += 1
    spark.read.parquet(gens.toSeq: _*).write.mode("overwrite").parquet(p)
    val old = gens.toList
    gens.clear()
    gens += p
    old.foreach(deleteRecursively)
  }

  /** Durability: materialize the current contents at `path` (one
    * compacted generation — save doubles as compaction of the copy). */
  def saveTo(path: String): Unit = {
    require(gens.nonEmpty, s"DeltaFrame($name) save before first append")
    read.write.mode("overwrite").parquet(path)
  }

  /** Load saved contents as the spool's first generation. Only valid
    * on a fresh (never-appended) spool. */
  def loadFrom(path: String): Unit = {
    require(gens.isEmpty, s"DeltaFrame($name) loadFrom on non-fresh spool")
    append(spark.read.parquet(path))
  }

  /** Delete the spool from disk. The frame is unusable afterwards. */
  def delete(): Unit = {
    gens.clear()
    DeltaFrame.untrackSpool(root)
    if (autoPlaced) DeltaFrame.unregisterLive(root)
    deleteRecursively(root.toString)
  }

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.isDirectory) f.listFiles().foreach(c =>
      deleteRecursively(c.getPath))
    f.delete()
    ()
  }
}

private[streaming] object DeltaFrame {
  /** Usable bytes /dev/shm must have for a spool to be PLACED there
    * (GRAFT_DELTA_TMPFS_MIN_FREE_MB overrides). */
  val TmpfsMinFreeBytes: Long =
    sys.env.get("GRAFT_DELTA_TMPFS_MIN_FREE_MB")
      .map { raw =>
        val mb =
          try raw.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                "GRAFT_DELTA_TMPFS_MIN_FREE_MB must be an integer " +
                  s"(megabytes), got '$raw'")
          }
        mb << 20
      }.getOrElse(8L << 30)

  /** Usable-bytes floor below which an already-tmpfs spool migrates to
    * disk on the next append. */
  val TmpfsFloorBytes: Long = 2L << 30

  /** Auto-placed spools older than this are presumed orphans of a
    * killed JVM and swept at construction. Generous: every append and
    * compaction touches the root's mtime, so only a spool idle for
    * hours qualifies, and a concurrent healthy JVM's spools stay. */
  val OrphanAgeMs: Long = 2L * 3600 * 1000

  private def shm = java.nio.file.Paths.get("/dev/shm")

  private[streaming] def onTmpfs(p: java.nio.file.Path): Boolean =
    p.startsWith(shm)

  /** Placement predicate, pure in the measured free space so the
    * capacity check is spec-testable without draining real tmpfs. */
  private[streaming] def tmpfsEligible(usableBytes: Long): Boolean =
    usableBytes >= TmpfsMinFreeBytes

  private def autoRoot(name: String): java.nio.file.Path =
    if (java.nio.file.Files.isWritable(shm) &&
        tmpfsEligible(shm.toFile.getUsableSpace))
      java.nio.file.Files.createTempDirectory(shm, s"graft-delta-$name-")
    else java.nio.file.Files.createTempDirectory(s"graft-delta-$name-")

  // -- leak hygiene: one JVM-wide shutdown hook over all live auto-
  // placed spools, plus an age-based orphan sweep (throttled) --------
  private val liveRoots =
    java.util.concurrent.ConcurrentHashMap
      .newKeySet[java.nio.file.Path]()
  private val hookInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private val lastSweepAt =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cross-process liveness: name of the heartbeat file each
    * auto-placed spool carries at its root. The owning JVM refreshes
    * its mtime every [[HeartbeatIntervalMs]] (daemon thread), so a
    * spool can be IDLE for days — a standing frame only being queried,
    * a stream folding daily batches — and still never read as an
    * orphan by ANOTHER process's sweep. `liveRoots` alone cannot give
    * this: it is JVM-local, and root mtime only moves on writes. */
  private[streaming] val HeartbeatFile = "_graft_heartbeat"
  private[streaming] val HeartbeatIntervalMs: Long = 5L * 60 * 1000

  private def touchHeartbeat(root: java.nio.file.Path): Unit =
    try {
      val hb = root.resolve(HeartbeatFile)
      if (!java.nio.file.Files.exists(hb))
        java.nio.file.Files.createFile(hb)
      else
        java.nio.file.Files.setLastModifiedTime(hb,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis()))
      ()
    } catch { case _: Exception => () }

  /** Refresh every live spool's heartbeat now (the daemon thread's
    * body; directly callable so a spec can verify without waiting). */
  private[streaming] def refreshHeartbeats(): Unit = {
    val it = liveRoots.iterator()
    while (it.hasNext) touchHeartbeat(it.next())
  }

  private val refresherStarted =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def registerLive(p: java.nio.file.Path): Unit = {
    liveRoots.add(p)
    touchHeartbeat(p)
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => shutdownCleanup(), "graft-delta-cleanup"))
    if (refresherStarted.compareAndSet(false, true)) {
      val t = new Thread(() => {
        while (true) {
          try Thread.sleep(HeartbeatIntervalMs)
          catch { case _: InterruptedException => return }
          refreshHeartbeats()
        }
      }, "graft-delta-heartbeat")
      t.setDaemon(true)
      t.start()
    }
  }

  private def unregisterLive(p: java.nio.file.Path): Unit = {
    liveRoots.remove(p); ()
  }

  /** The shutdown hook's body (directly callable so a spec can
    * simulate the kill path without forking a JVM). */
  private[streaming] def shutdownCleanup(): Unit = {
    val it = liveRoots.iterator()
    while (it.hasNext) {
      val p = it.next()
      try deleteTree(p.toFile) catch { case _: Exception => () }
    }
    liveRoots.clear()
  }

  /** Delete `graft-delta-*` dirs older than `minAgeMs` under the two
    * auto-placement parents. Construction-time call is throttled to
    * once per 10 minutes per JVM; specs call with explicit args. */
  private[streaming] def sweepOrphans(minAgeMs: Long = OrphanAgeMs,
      parents: Seq[java.io.File] = Seq(shm.toFile,
        new java.io.File(System.getProperty("java.io.tmpdir"))),
      force: Boolean = false): Unit = {
    val now = System.currentTimeMillis()
    val last = lastSweepAt.get()
    if (!force && now - last < 600000L) return
    if (!force && !lastSweepAt.compareAndSet(last, now)) return
    parents.filter(_.isDirectory).foreach { parent =>
      val kids = Option(parent.listFiles()).getOrElse(Array.empty)
      kids.foreach { f =>
        // liveness = newest of root mtime and heartbeat mtime: a spool
        // owned by ANY healthy JVM (this one or a concurrent process)
        // keeps a fresh heartbeat, so only spools whose owner stopped
        // refreshing — killed, or pre-heartbeat leftovers — qualify
        val hb = new java.io.File(f, HeartbeatFile)
        val lastAlive = math.max(f.lastModified(),
          if (hb.exists()) hb.lastModified() else 0L)
        if (f.isDirectory && f.getName.startsWith("graft-delta-") &&
            now - lastAlive > minAgeMs &&
            !liveRoots.contains(f.toPath))
          try deleteTree(f) catch { case _: Exception => () }
      }
    }
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
    ()
  }

  // -- ops observability: ALL live spools (auto-placed AND caller-
  // managed), so a cluster operator can see standing-state footprint --
  private val allSpools = new java.util.concurrent.ConcurrentHashMap[
    java.nio.file.Path, (String, Boolean)]()

  private def trackSpool(root: java.nio.file.Path, name: String,
      autoPlaced: Boolean): Unit = {
    allSpools.put(root, (name, autoPlaced)); ()
  }

  private def untrackSpool(root: java.nio.file.Path): Unit = {
    allSpools.remove(root); ()
  }

  private def treeBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).map(treeBytes).sum
    else f.length()

  /** Snapshot of every live spool in this JVM: fold name, root path,
    * on-disk bytes, tmpfs placement, auto-placed vs caller-managed.
    * Sizes are measured on call (ops endpoint cadence), not cached. */
  private[graft] def spoolStats: Seq[SpoolStat] = {
    import scala.jdk.CollectionConverters._
    allSpools.asScala.toSeq.sortBy(_._1.toString).map {
      case (root, (name, auto)) =>
        SpoolStat(name, root.toString, treeBytes(root.toFile),
          onTmpfs(root), auto)
    }
  }
}

/** One live [[DeltaFrame]] spool, as reported on the ops surface. */
private[graft] final case class SpoolStat(name: String, root: String,
    bytes: Long, onTmpfs: Boolean, autoPlaced: Boolean)

/** Ops facade over this JVM's live [[DeltaFrame]] spools: the
  * log-structured standing state of streaming folds is real disk (or
  * tmpfs = RAM) footprint a cluster operator must be able to see —
  * the HTTP layer reports these without touching DeltaFrame itself. */
private[graft] object SpoolOps {
  def stats: Seq[SpoolStat] = DeltaFrame.spoolStats
}
