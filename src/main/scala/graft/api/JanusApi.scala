package graft.api

import graft.baseline.BaselineBootstrap

import graft.historical.HistoricalExecutor
import graft.janusql._

import graft.streaming.LiveStreamProcessing

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Orchestration layer (SURVEY.md §2.8 O1–O3 + §2.4 B5) — rebuild of
  * `/root/reference/src/registry/query_registry.rs` and
  * `src/api/janus_api.rs:100-515`.
  *
  * Lifecycle: register (parse + store, no execution) → start (historical
  * workers + live processor + async baseline warm-up, all feeding ONE
  * unified result queue) → stop. Statuses mirror the reference enum:
  * Registered → WarmingBaseline (hybrid only) → Running →
  * Completed/Stopped/Failed.
  */
object JanusApi {

  sealed trait ExecutionStatus extends Product with Serializable
  object ExecutionStatus {
    case object Registered extends ExecutionStatus
    case object WarmingBaseline extends ExecutionStatus
    case object Running extends ExecutionStatus
    case object Stopped extends ExecutionStatus
    case object Completed extends ExecutionStatus
    final case class Failed(msg: String) extends ExecutionStatus
  }

  sealed trait ResultSource extends Product with Serializable
  object ResultSource {
    case object Historical extends ResultSource
    case object Live extends ResultSource
  }

  /** Unified result envelope (`janus_api.rs:33-47`). */
  final case class QueryResult(
      queryId: String,
      timestamp: Long,
      source: ResultSource,
      bindings: Seq[Map[String, String]])

  final case class QueryMetadata(
      queryId: String,
      queryText: String,
      parsed: ParsedJanusQuery,
      baselineMode: BaselineMode,
      registeredAt: Long)

  final case class ApiException(msg: String) extends RuntimeException(msg)
}

/** O1: the query registry — register (dup check, optional max), get,
  * unregister, list (`query_registry.rs:61-198`). */
final class QueryRegistry(maxQueries: Option[Int] = None) {
  import JanusApi._

  private val queries = new ConcurrentHashMap[String, QueryMetadata]()
  private val executionCounts = new ConcurrentHashMap[String, AtomicLong]()

  def register(queryId: String, text: String, parsed: ParsedJanusQuery,
      baselineMode: BaselineMode): QueryMetadata = {
    maxQueries.foreach { max =>
      if (queries.size >= max)
        throw ApiException(s"Registry is full (max $max queries)")
    }
    val meta = QueryMetadata(queryId, text, parsed, baselineMode,
      System.currentTimeMillis())
    if (queries.putIfAbsent(queryId, meta) != null)
      throw ApiException(s"Query '$queryId' is already registered")
    executionCounts.put(queryId, new AtomicLong(0))
    meta
  }

  def get(queryId: String): Option[QueryMetadata] =
    Option(queries.get(queryId))

  def unregister(queryId: String): Boolean = {
    executionCounts.remove(queryId)
    queries.remove(queryId) != null
  }

  def list: Seq[QueryMetadata] = queries.values.asScala.toSeq

  def executionCount(queryId: String): Long =
    Option(executionCounts.get(queryId)).map(_.get).getOrElse(0L)

  private[api] def incrementExecutions(queryId: String): Unit =
    Option(executionCounts.get(queryId)).foreach(_.incrementAndGet())
}

/** Top-level API coordinating registry, historical quad sources, and
  * live processing. `logProvider` maps a window's source IRI to its
  * quads DataFrame (e.g. an [[graft.storage.EventLog]] read). */
final class JanusApi(
    spark: SparkSession,
    registry: QueryRegistry,
    logProvider: String => DataFrame,
    clock: () => Long = () => System.currentTimeMillis(),
    scaleLiveLogFactory: Option[String => graft.storage.EventLog] = None) {

  import JanusApi._

  final class QueryHandle private[JanusApi] (
      val queryId: String,
      resultQueue: LinkedBlockingQueue[QueryResult],
      statusRef: java.util.concurrent.atomic.AtomicReference[ExecutionStatus],
      val live: Option[LiveStreamProcessing],
      /** Cluster-scale live execution (present when the api was built
        * with `scaleLiveLogFactory`): the compiled query runs per fire
        * over EventLog-backed distributed windows instead of a
        * driver-side event buffer. */
      val compiledLive: Option[graft.streaming.CompiledLiveStream],
      threads: Seq[Thread],
      warmupDone: CountDownLatch) {

    /** Feed live events through whichever live path is active. */
    def addLiveEvents(streamUri: String, events: Seq[graft.core.RdfEvent])
        : Unit = {
      live.foreach(_.addEvents(streamUri, events))
      compiledLive.foreach(_.processBatch(graft.core.RdfEvent.toDF(
        spark, events.map(_.copy(graph = streamUri)))))
    }

    def status: ExecutionStatus = statusRef.get

    def receive(timeoutMs: Long = 5000): Option[QueryResult] =
      Option(resultQueue.poll(timeoutMs, TimeUnit.MILLISECONDS))

    def tryReceive(): Option[QueryResult] = Option(resultQueue.poll())

    /** Block until the baseline warm-up finished (test convenience). */
    def awaitWarmup(timeoutMs: Long = 30000): Boolean =
      warmupDone.await(timeoutMs, TimeUnit.MILLISECONDS)

    private[api] def shutdown(): Unit = {
      threads.foreach(_.join(100))
      threads.foreach(_.interrupt())
      // the scale-mode sink collects bindings inside the callback, so
      // every handed-off frame is already consumed — release the
      // accumulated fire checkpoints with the stream
      compiledLive.foreach(_.close())
      statusRef.set(ExecutionStatus.Stopped)
    }
  }

  private val running = new ConcurrentHashMap[String, QueryHandle]()
  /** Final status of queries that have been stopped — `status()` keeps
    * reporting Stopped after the handle leaves `running` (the
    * reference's status machine does not forget a stop). */
  private val lastStatus =
    new ConcurrentHashMap[String, ExecutionStatus]()
  private val startLock = new Object

  /** Unified-queue capacity; producers drop the OLDEST result when a
    * consumer stalls (the bounded-buffer discipline the live path's
    * drop-oldest buffer establishes — an unbounded queue here would
    * defeat it and grow the driver without limit). */
  private val QueueCapacity = 65536

  private def enqueue(queue: LinkedBlockingQueue[QueryResult],
      r: QueryResult): Unit =
    while (!queue.offer(r)) queue.poll()

  /** Record a failure unless the query was deliberately stopped — a
    * worker interrupted by shutdown must not overwrite Stopped with
    * Failed. */
  private def failUnlessStopped(
      statusRef: java.util.concurrent.atomic.AtomicReference[ExecutionStatus],
      msg: String): Unit = {
    statusRef.getAndUpdate {
      case ExecutionStatus.Stopped => ExecutionStatus.Stopped
      case _ => ExecutionStatus.Failed(msg)
    }
    ()
  }

  def registerQuery(queryId: String, janusql: String,
      baselineMode: BaselineMode = BaselineMode.Aggregate): QueryMetadata = {
    val parsed =
      try JanusQLParser.parse(janusql)
      catch {
        case e: JanusQLParser.JanusParseException =>
          throw ApiException(s"Failed to parse JanusQL query: ${e.msg}")
      }
    // a (re-)registration resets the status machine to Registered: a
    // stale Stopped from a previous lifecycle must not shadow it, and
    // retired ids must not accumulate entries forever
    lastStatus.remove(queryId)
    registry.register(queryId, janusql, parsed, baselineMode)
  }

  /** Registry removal also drops the terminal-status memory — without
    * this, ids deleted over the HTTP API leak lastStatus entries in a
    * long-lived server. */
  def unregisterQuery(queryId: String): Boolean = {
    lastStatus.remove(queryId)
    registry.unregister(queryId)
  }

  def status(queryId: String): Option[ExecutionStatus] =
    Option(running.get(queryId)).map(_.status)
      .orElse(Option(lastStatus.get(queryId)))
      .orElse(registry.get(queryId).map(_ => ExecutionStatus.Registered))

  /** O2: start — historical workers, live processor, baseline warm-up,
    * one unified result queue (`janus_api.rs:197-515`). Serialized under
    * a lock: a naked check-then-put would let two concurrent starts of
    * the same id both succeed, leaking the first handle's threads. */
  def startQuery(queryId: String): QueryHandle = startLock.synchronized {
    val meta = registry.get(queryId).getOrElse(
      throw ApiException(s"Query '$queryId' not found in registry"))
    if (running.containsKey(queryId))
      throw ApiException(s"Query '$queryId' is already running")
    lastStatus.remove(queryId)

    val parsed = meta.parsed
    val queue = new LinkedBlockingQueue[QueryResult](QueueCapacity)
    val isHybrid =
      parsed.liveWindows.nonEmpty && parsed.historicalWindows.nonEmpty
    val statusRef = new java.util.concurrent.atomic.AtomicReference[ExecutionStatus](
      if (isHybrid) ExecutionStatus.WarmingBaseline else ExecutionStatus.Running)
    val warmupDone = new CountDownLatch(if (isHybrid) 1 else 0)

    // scale mode: the compiled plan per fire over distributed windows;
    // one QueryResult per solution, like the parity poller emits
    val compiledLive =
      if (parsed.liveWindows.nonEmpty && scaleLiveLogFactory.isDefined) {
        val log = scaleLiveLogFactory.get(queryId)
        val sink: (DataFrame, Long, Long) => Unit = (df, _, to) =>
          collectBindings(df, Seq.empty).foreach { b =>
            registry.incrementExecutions(queryId)
            enqueue(queue, QueryResult(queryId, to, ResultSource.Live, Seq(b)))
          }
        Some(new graft.streaming.CompiledLiveStream(spark, meta.queryText,
          log, sink))
      } else None

    val live =
      if (parsed.liveWindows.nonEmpty && compiledLive.isEmpty) {
        val p = new LiveStreamProcessing(spark, meta.queryText)
        parsed.liveWindows.foreach(w => p.registerStream(w.streamName))
        p.startProcessing()
        Some(p)
      } else None

    // live results drain into the unified queue via a poller thread
    // (reference: 10 ms try_receive loop, janus_api.rs:443-471)
    val pollerThread = live.map { p =>
      val t = new Thread(() => {
        try {
          while (!Thread.currentThread().isInterrupted) {
            p.tryReceiveResult() match {
              case Some(r) =>
                registry.incrementExecutions(queryId)
                enqueue(queue, QueryResult(queryId, r.timestampTo,
                  ResultSource.Live, Seq(r.bindings)))
              case None => Thread.sleep(10)
            }
          }
        } catch { case _: InterruptedException => () }
      }, s"graft-live-poller-$queryId")
      t.setDaemon(true)
      t.start()
      t
    }

    // historical workers: one thread per historical window
    val now = clock()
    val historicalThreads = parsed.compiledHistoricalQueries.map {
      case (window, query) =>
        val t = new Thread(() => {
          try {
            val quads = logProvider(window.streamName)
            window.windowType match {
              case WindowType.HistoricalFixed =>
                val out = HistoricalExecutor.executeFixed(quads, query,
                  window.start.get, window.end.get)
                val bindings = collectBindings(out,
                  Seq("timestamp_from", "timestamp_to"))
                registry.incrementExecutions(queryId)
                enqueue(queue, QueryResult(queryId, window.end.get,
                  ResultSource.Historical, bindings))
              case WindowType.HistoricalSliding =>
                val spec = HistoricalExecutor.SlidingSpec(
                  window.offset.get, window.width, window.slide)
                val out = HistoricalExecutor.executeSliding(quads, query,
                  now, spec)
                // one result batch per window in window order, INCLUDING
                // empty windows (the reference emits an empty bindings
                // batch per window, janus_api.rs:276-298)
                slidingBatches(out, spec).foreach { bindings =>
                  registry.incrementExecutions(queryId)
                  enqueue(queue, QueryResult(queryId, now,
                    ResultSource.Historical, bindings))
                }
              case WindowType.Live => ()
            }
          } catch {
            case _: InterruptedException => () // shutdown interrupt
            case e: Exception =>
              failUnlessStopped(statusRef, e.getMessage)
          }
        }, s"graft-hist-$queryId-${window.windowName}")
        t.setDaemon(true)
        t.start()
        t
    }

    // B5: async baseline warm-up for hybrid queries — compute baseline
    // from the historical side, materialize into the live static data,
    // flip WarmingBaseline → Running (`janus_api.rs:352-412`)
    val baselineThread = if (isHybrid) {
      val t = new Thread(() => {
        try {
          val mode = parsed.baseline.map(_.mode).getOrElse(meta.baselineMode)
          val targetWindow = parsed.baseline.map(_.windowName)
          val statements = computeBaseline(parsed, targetWindow, mode, now)
          live.foreach(_.addStaticData(
            BaselineBootstrap.asStaticQuads(statements)))
          compiledLive.foreach(_.setStaticData(graft.core.RdfEvent.toDF(
            spark, BaselineBootstrap.asStaticQuads(statements))))
          if (statusRef.compareAndSet(ExecutionStatus.WarmingBaseline,
            ExecutionStatus.Running)) ()
        } catch {
          case _: InterruptedException => () // shutdown interrupt
          case e: Exception =>
            failUnlessStopped(statusRef, e.getMessage)
        } finally warmupDone.countDown()
      }, s"graft-baseline-$queryId")
      t.setDaemon(true)
      t.start()
      Some(t)
    } else None

    // completion watcher: historical-only queries flip to Completed once
    // every window worker finished (`janus_api.rs` status transitions)
    if (live.isEmpty && compiledLive.isEmpty) {
      val t = new Thread(() => {
        historicalThreads.foreach(_.join())
        statusRef.compareAndSet(ExecutionStatus.Running,
          ExecutionStatus.Completed)
      }, s"graft-complete-$queryId")
      t.setDaemon(true)
      t.start()
    }

    val handle = new QueryHandle(queryId, queue, statusRef, live,
      compiledLive,
      historicalThreads ++ pollerThread.toSeq ++ baselineThread.toSeq,
      warmupDone)
    running.put(queryId, handle)
    handle
  }

  def stopQuery(queryId: String): Unit = {
    val handle = Option(running.remove(queryId)).getOrElse(
      throw ApiException(s"Query '$queryId' is not running"))
    handle.shutdown()
    lastStatus.put(queryId, handle.status)
  }

  /** All sliding-window batches in window order — one Seq per window id
    * 0..windowCount-1, with an EMPTY batch for windows with no solutions
    * (the reference sends one batch per window regardless,
    * janus_api.rs:276-298, so a LAST-mode baseline over an empty newest
    * window clears to empty). Streams windows through a range-partitioned
    * local iterator, so the driver holds roughly one window at a time
    * instead of the full result set. */
  private def slidingBatches(out: DataFrame,
      spec: HistoricalExecutor.SlidingSpec)
      : Iterator[Seq[Map[String, String]]] = {
    val cols = out.columns
    val drop = Seq(HistoricalExecutor.WindowIdCol,
      "timestamp_from", "timestamp_to")
    val idCol = org.apache.spark.sql.functions.col(
      HistoricalExecutor.WindowIdCol)
    // range partitions are globally ordered and toLocalIterator fetches
    // one partition at a time → rows arrive in window-id order. The
    // compiled plan may have ORDERED rows within each window (ORDER BY
    // compiles to a sort over (window id, keys)) — a bare re-sort on
    // the id alone would scramble it. Capturing a monotonic sequence id
    // BEFORE the range shuffle (nondeterministic expression, so
    // Catalyst cannot eliminate the upstream sort past it) and
    // tie-breaking on it preserves the per-window order through the
    // shuffle.
    val seqCol = "__graft_seq"
    val rows = out
      .withColumn(seqCol,
        org.apache.spark.sql.functions.monotonically_increasing_id())
      .repartitionByRange(idCol)
      .sortWithinPartitions(idCol,
        org.apache.spark.sql.functions.col(seqCol))
      .drop(seqCol)
      .toLocalIterator().asScala.buffered
    (0L until spec.windowCount).iterator.map { k =>
      val batch = Seq.newBuilder[Map[String, String]]
      while (rows.hasNext &&
        rows.head.getAs[Long](HistoricalExecutor.WindowIdCol) == k) {
        batch += rowToBinding(cols, drop)(rows.next())
      }
      batch.result()
    }
  }

  /** Baseline over the (optionally USING BASELINE-selected) historical
    * windows (`janus_api.rs:575-670`). Statements are computed PER
    * historical window and concatenated (janus_api.rs:606-640): LAST-mode
    * clearing applies only across one window's sub-batches, never across
    * window definitions, and AGGREGATE never blends means across
    * windows. */
  private def computeBaseline(parsed: ParsedJanusQuery,
      targetWindow: Option[String], mode: BaselineMode, now: Long)
      : Seq[(String, String, String)] = {
    val bootMode = mode match {
      case BaselineMode.Last      => BaselineBootstrap.Last
      case BaselineMode.Aggregate => BaselineBootstrap.Aggregate
    }
    parsed.compiledHistoricalQueries.flatMap { case (window, query) =>
      if (targetWindow.exists(_ != window.windowName)) Nil
      else {
        val quads = logProvider(window.streamName)
        window.windowType match {
          case WindowType.HistoricalFixed =>
            val out = HistoricalExecutor.executeFixed(quads, query,
              window.start.get, window.end.get)
            BaselineBootstrap.statementsLocal(
              Iterator.single(collectBindings(out,
                Seq("timestamp_from", "timestamp_to"))), bootMode)
          case WindowType.HistoricalSliding =>
            val spec = HistoricalExecutor.SlidingSpec(
              window.offset.get, window.width, window.slide)
            val out = HistoricalExecutor.executeSliding(quads, query,
              now, spec)
            BaselineBootstrap.statementsLocal(
              slidingBatches(out, spec), bootMode)
          case WindowType.Live => Nil
        }
      }
    }
  }

  private def collectBindings(df: DataFrame, drop: Seq[String])
      : Seq[Map[String, String]] = {
    val cols = df.columns
    df.collect().toSeq.map(rowToBinding(cols, drop))
  }

  private def rowToBinding(cols: Array[String], drop: Seq[String])(
      row: org.apache.spark.sql.Row): Map[String, String] =
    cols.zipWithIndex.collect {
      case (name, i) if !drop.contains(name) && !row.isNullAt(i) =>
        name -> String.valueOf(row.get(i))
    }.toMap
}
