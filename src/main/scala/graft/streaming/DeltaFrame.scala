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
  * when one is writable (`/dev/shm` — generations are micro-batch
  * partials; paying disk latency per fold in local mode doubles the
  * fold floor), falling back to the JVM temp dir; on a real cluster
  * pass a shared filesystem path (the same requirement the EventLog
  * already carries). */
private[streaming] final class DeltaFrame(spark: SparkSession,
    name: String, compactEvery: Int = 64,
    spoolDir: Option[String] = None) {
  require(compactEvery >= 2, "compactEvery must be at least 2")

  private val root: java.nio.file.Path = spoolDir match {
    case Some(d) =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(p)
      p
    case None =>
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createTempDirectory(shm, s"graft-delta-$name-")
      else java.nio.file.Files.createTempDirectory(s"graft-delta-$name-")
  }
  private val gens = scala.collection.mutable.ArrayBuffer.empty[String]
  private var nextGen = 0L

  def isEmpty: Boolean = gens.isEmpty

  /** Number of live generations (spec observability: flat-cost proofs
    * assert the count stays bounded by `compactEvery`). */
  def generationCount: Int = gens.size

  /** Spill one batch-sized partial as a new generation. Cost ∝ batch,
    * except every `compactEvery`-th call, which compacts. */
  def append(df: DataFrame): Unit = {
    val p = root.resolve(s"g$nextGen").toString
    nextGen += 1
    df.write.mode("overwrite").parquet(p)
    gens += p
    if (gens.size >= compactEvery) compact()
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
