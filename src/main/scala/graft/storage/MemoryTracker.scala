package graft.storage

/** RSS memory sampler (SURVEY.md §2.1 S13) — rebuild of
  * `/root/reference/src/storage/memory_tracker.rs:28-233`: samples
  * resident-set size from `/proc/self/status` (fallback: JVM heap) on a
  * background thread, tracking peak and average for bench reporting.
  */
final class MemoryTracker(intervalMs: Long = 100) {

  final case class Stats(samples: Long, currentBytes: Long,
      peakBytes: Long, avgBytes: Long)

  private val samples = new java.util.concurrent.atomic.AtomicLong
  private val peak = new java.util.concurrent.atomic.AtomicLong
  private val sum = new java.util.concurrent.atomic.AtomicLong
  @volatile private var last = 0L
  @volatile private var thread: Option[Thread] = None

  def sampleOnce(): Long = {
    val rss = MemoryTracker.currentRssBytes()
    last = rss
    samples.incrementAndGet()
    sum.addAndGet(rss)
    peak.updateAndGet(p => math.max(p, rss))
    rss
  }

  def start(): Unit = synchronized {
    if (thread.isEmpty) {
      val t = new Thread(() => {
        try while (!Thread.currentThread().isInterrupted) {
          sampleOnce(); Thread.sleep(intervalMs)
        } catch { case _: InterruptedException => () }
      }, "graft-memory-tracker")
      t.setDaemon(true)
      t.start()
      thread = Some(t)
    }
  }

  def stop(): Stats = synchronized {
    thread.foreach(_.interrupt())
    thread = None
    stats
  }

  def stats: Stats = {
    val n = samples.get
    Stats(n, last, peak.get, if (n == 0) 0 else sum.get / n)
  }
}

object MemoryTracker {
  /** VmRSS from /proc/self/status (kB → bytes); JVM heap as fallback on
    * non-proc platforms. */
  def currentRssBytes(): Long = {
    val status = java.nio.file.Paths.get("/proc/self/status")
    if (java.nio.file.Files.isReadable(status)) {
      val rss = java.nio.file.Files.readAllLines(status).stream()
        .filter(_.startsWith("VmRSS:")).findFirst()
      if (rss.isPresent) {
        val kb = rss.get.replaceAll("[^0-9]", "")
        if (kb.nonEmpty) return kb.toLong * 1024L
      }
    }
    Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
  }
}
