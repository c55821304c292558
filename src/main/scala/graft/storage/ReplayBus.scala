package graft.storage

import graft.core.RdfEvent
import graft.parsing.NQuadsParser

import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** File-replay stream bus (SURVEY.md §2.1 S2) — the rebuild of
  * `/root/reference/src/stream_bus/stream_bus.rs:134-394`: read an
  * N-Quads file, optionally loop, rate-limit, publish each event to a
  * sink (the live engine) AND persist to storage, tracking metrics.
  *
  * Like the reference's CLI bus this is a driver-side pacing utility (it
  * emulates an external event source); the heavy lifting — parsing at
  * scale and storage writes — stays distributed via
  * [[NQuadsParser.parse]] + [[EventLog.append]] on micro-batches.
  */
final class ReplayBus(
    spark: SparkSession,
    filePath: String,
    storage: Option[EventLog] = None,
    sink: Option[Seq[RdfEvent] => Unit] = None,
    rateEventsPerSec: Option[Double] = None,
    loopCount: Int = 1,
    batchSize: Int = 10000,
    overwriteTimestamps: Boolean = false) {

  final case class Metrics(
      linesRead: Long, published: Long, stored: Long, errors: Long,
      elapsedMs: Long) {
    def eventsPerSec: Double =
      if (elapsedMs == 0) 0.0 else published * 1000.0 / elapsedMs
  }

  private val read = new AtomicLong
  private val published = new AtomicLong
  private val stored = new AtomicLong
  private val errors = new AtomicLong
  @volatile private var startedAt = 0L
  @volatile private var stopRequested = false

  def stop(): Unit = stopRequested = true

  def metrics: Metrics = Metrics(read.get, published.get, stored.get,
    errors.get, if (startedAt == 0) 0 else System.currentTimeMillis() - startedAt)

  /** Run the replay to completion (or until [[stop]]). Returns final
    * metrics, mirroring the reference bus's read/published/stored/errors
    * counters. */
  def run(): Metrics = {
    startedAt = System.currentTimeMillis()
    val src = scala.io.Source.fromFile(filePath)
    val lines = try src.getLines().toVector finally src.close()
    val perEventDelayNanos =
      rateEventsPerSec.map(r => (1e9 / r).toLong).getOrElse(0L)
    var loop = 0
    while (loop < loopCount && !stopRequested) {
      val batch = scala.collection.mutable.ArrayBuffer.empty[RdfEvent]
      lines.foreach { line =>
        if (!stopRequested) {
          val t = line.trim
          if (t.nonEmpty && !t.startsWith("#")) {
            read.incrementAndGet()
            NQuadsParser.parseLine(t,
              () => System.currentTimeMillis()) match {
              case Right(ev0) =>
                val ev = if (overwriteTimestamps)
                  ev0.copy(timestamp = System.currentTimeMillis()) else ev0
                batch += ev
                published.incrementAndGet()
                if (perEventDelayNanos > 0)
                  java.util.concurrent.locks.LockSupport
                    .parkNanos(perEventDelayNanos)
                if (batch.length >= batchSize) flush(batch)
              case Left(_) => errors.incrementAndGet()
            }
          }
        }
      }
      flush(batch)
      loop += 1
    }
    metrics
  }

  private def flush(batch: scala.collection.mutable.ArrayBuffer[RdfEvent])
      : Unit = {
    if (batch.nonEmpty) {
      val events = batch.toSeq
      sink.foreach(_(events))
      storage.foreach { log =>
        log.append(RdfEvent.toDF(spark, events))
        stored.addAndGet(events.length.toLong)
      }
      batch.clear()
    }
  }
}

object ReplayBus {
  /** Bulk (unpaced) ingest of an N-Quads file straight into storage —
    * the distributed path for large files: parse + append without any
    * driver-side event materialization. Returns (stored, errors). */
  def ingestFile(spark: SparkSession, filePath: String, storage: EventLog)
      : (Long, Long) = {
    val acc = spark.sparkContext.longAccumulator("replay-parse-errors")
    import spark.implicits._
    val quads = NQuadsParser.parse(
      spark.read.textFile(filePath).as[String], errorCounter = Some(acc))
      .persist()
    try {
      // count THIS batch (not the whole log post-append: the log may
      // already hold data from earlier ingests)
      val n = quads.count()
      storage.append(quads)
      (n, acc.value)
    } finally { quads.unpersist(); () }
  }
}
