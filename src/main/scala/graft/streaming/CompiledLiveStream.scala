package graft.streaming

import graft.janusql.{JanusQLParser, ParsedJanusQuery, WindowDefinition}
import graft.sparql.{AggItem, Items, Query, SelectQuery, SparqlCompiler}
import graft.storage.EventLog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import scala.collection.mutable

/** Cluster-scale live RSP path: ARBITRARY compiled queries per window
  * fire, with NO driver-side event buffering (SURVEY.md §7.3.3;
  * reference behavior `/root/reference/src/stream/live_stream_processing.rs:466-552`,
  * which re-evaluates the full registered query on every window close).
  *
  * [[LiveStreamProcessing]] is the semantics-parity twin: it buffers
  * window contents in driver memory, exactly like the reference holds
  * them in-process. That is correct but caps window volume at driver
  * heap. Here the same fire-time semantics run against a DISTRIBUTED
  * snapshot store:
  *
  *   - micro-batches land in an [[EventLog]] (`foreachBatch` append —
  *     partitioned parquet, so window reads prune to the buckets the
  *     RANGE covers);
  *   - the driver keeps only WINDOW BOOKKEEPING (per-stream event-time
  *     maxima and each window's next close boundary — a few longs, not
  *     events);
  *   - at each close `c`, the snapshot `[c-range, c)` of every window
  *     (W2 merge) plus the static/baseline DataFrame is assembled
  *     lazily and the COMPILED query plan — any shape
  *     [[SparqlCompiler]] supports: BGP joins, GRAPH scopes, FILTER,
  *     aggregates, baseline joins — executes as one distributed job;
  *   - results go to `resultSink` as a DataFrame: the consumer decides
  *     whether to write, stream on, or collect. The engine never
  *     materializes results on the driver. A lazy sink must evaluate
  *     before the NEXT micro-batch arrives — see the pruning note;
  *   - buckets no future fire can reach are PRUNED from the log
  *     (`EventLog.pruneBefore`) — storage stays bounded by
  *     `max(RANGE) + slide`, the distributed analogue of
  *     [[LiveStreamProcessing]]'s buffer eviction. Pruning is deferred
  *     one advance cycle so the files behind a just-fired snapshot
  *     outlive the fire that produced it.
  *
  * Failure note: `foreachBatch` is at-least-once on restart — a
  * replayed batch re-appends its quads. The reference's in-process bus
  * offers no stronger guarantee; exactly-once would need idempotent
  * (content-keyed) appends.
  *
  * Window semantics mirror [[LiveStreamProcessing]] exactly (asserted
  * by CompiledLiveStreamSpec on the ported timing scenario): a window
  * fires at boundary `c = k*slide` once ITS stream's event time
  * reaches `c`, covers `[c-range, c)`, merges every window's content
  * at `c`, and sentinel events advance time without appearing in
  * results.
  */
final class CompiledLiveStream(
    spark: SparkSession,
    queryText: String,
    log: EventLog,
    resultSink: (DataFrame, Long, Long) => Unit) {

  import LiveStreamProcessing.{DefaultGraph, SentinelSubject}

  val parsed: ParsedJanusQuery = JanusQLParser.parse(queryText)
  require(parsed.liveWindows.nonEmpty,
    "CompiledLiveStream requires at least one ON STREAM window")

  private val compiledQuery: Query =
    LiveStreamProcessing.buildCombinedQuery(parsed)

  /** Static/baseline quads (default-graph side of stream-static joins).
    * A DataFrame — at cluster scale this is the materialized baseline
    * table, not driver memory. */
  @volatile private var staticDF: Option[DataFrame] = None
  // row-level presence, probed ONCE at registration: the fire-time
  // empty-snapshot shortcut must see a zero-row static frame as
  // "no static data" (parity checks staticQuads.isEmpty row-wise),
  // and a non-empty one lets fires skip their emptiness probe
  @volatile private var staticHasRows: Boolean = false

  def setStaticData(quads: DataFrame): Unit = {
    staticDF = Some(quads)
    staticHasRows = !quads.isEmpty
  }

  /** Does an EMPTY solution sequence still emit a row? True exactly
    * for aggregate SELECTs with no GROUP BY — the implicit single
    * group yields e.g. `COUNT = 0`. Everything else emits nothing on
    * empty input, so empty-snapshot fires can be skipped outright. */
  private val emitsOnEmptyGroup: Boolean = compiledQuery match {
    case sq: SelectQuery => sq.groupBy.isEmpty && (sq.projection match {
      case Items(is) => is.exists(_.isInstanceOf[AggItem])
      case _         => false
    })
    case _ => false
  }

  // ---- driver-side bookkeeping: boundaries only, never events --------
  private val nextClose = mutable.LinkedHashMap.empty[String, Long]
  private val streamMaxTs = mutable.LinkedHashMap.empty[String, Long]
  parsed.liveWindows.foreach(w => nextClose(w.windowName) = w.slide)

  /** Largest RANGE over all live windows — the snapshot horizon. */
  private val maxRange: Long = parsed.liveWindows.map(_.width).max

  /** Process one micro-batch of canonical quads whose `graph` column
    * holds the source STREAM uri. Called from `foreachBatch` (or
    * directly for batch backfills): appends the batch to the
    * distributed log, advances per-stream event time, fires every due
    * window, prunes unreachable buckets. */
  def processBatch(batch: DataFrame): Unit = synchronized {
    val cached = batch.persist()
    try {
      // per-stream event-time maxima: a tiny aggregate row per stream
      // (sentinels included — they exist to advance time)
      val maxima = cached.groupBy(col("graph"))
        .agg(max(col("timestamp")).as("max_ts"))
        .collect()
      if (maxima.isEmpty) return
      log.append(cached)
      maxima.foreach { r =>
        val uri = r.getString(0)
        val ts = r.getLong(1)
        streamMaxTs(uri) = math.max(streamMaxTs.getOrElse(uri, Long.MinValue), ts)
      }
      advance()
    } finally cached.unpersist()
  }

  /** Attach to a streaming quads DataFrame (canonical 5-column shape,
    * `graph` = stream uri). */
  def attach(quads: DataFrame, checkpointDir: String): StreamingQuery =
    quads.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) => processBatch(b) }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Prune cutoff computed at the previous advance, applied at the
    * next: the snapshot DataFrames handed to `resultSink` stay backed
    * by their parquet files until the NEXT micro-batch — pruning
    * immediately after a fire would delete files under a sink that
    * evaluates lazily (async write, downstream stream). */
  private var pendingPruneCutoff: Option[Long] = None

  /** Fire every due window in close-time order (same order as
    * [[LiveStreamProcessing]]'s one-at-a-time loop — the due set is
    * fixed for the whole advance, so enumerating it up front is
    * equivalent), then schedule the log prune.
    *
    * A steady-state micro-batch makes at most one window due and takes
    * the direct [[fire]] path. A batch that advances event time across
    * MANY closes (catch-up, backfill, coarse batches) would pay one
    * full Spark job per fire — ~0.3 s of scheduling floor each on an
    * idle local cluster, the dominant cost at high fire rates — so all
    * due fires evaluate as ONE distributed job instead ([[fireBatch]]),
    * keyed per fire through the compiler's `extraKeys` channel (the
    * same machinery that makes N historical windows one plan). */
  private def advance(): Unit = {
    pendingPruneCutoff.foreach(log.pruneBefore)
    pendingPruneCutoff = None
    // every due (window, close) pair, closes enumerated per window
    val due = parsed.liveWindows.flatMap { w =>
      streamMaxTs.get(w.streamName).toSeq.flatMap { maxTs =>
        Iterator.iterate(nextClose(w.windowName))(_ + w.slide)
          .takeWhile(_ <= maxTs).map(c => (w, c)).toSeq
      }
    }.sortBy(_._2)
    if (due.nonEmpty) {
      if (due.sizeIs == 1) fire(due.head._1, due.head._2)
      else fireBatch(due)
      due.groupBy(_._1.windowName).foreach { case (name, fs) =>
        nextClose(name) = fs.map(_._2).max + fs.head._1.slide
      }
    }
    // nothing below (earliest pending close - max range) can enter any
    // future snapshot — those buckets are dropped at the NEXT advance
    // (deferred one cycle so just-fired lazy snapshots stay readable)
    if (nextClose.nonEmpty)
      pendingPruneCutoff = Some(nextClose.values.min - maxRange)
  }

  /** All due fires as ONE distributed evaluation: each live window
    * contributes a single time-pruned log scan over the union of its
    * snapshots, rows are assigned to the fires whose `[c-range, c)`
    * span covers them (broadcast join against the tiny close list),
    * and the compiled plan runs once with the fire id as an
    * orchestration key. The result is pinned with an eager
    * localCheckpoint — the one Spark job — and sliced per fire for the
    * sink, in close-time order.
    *
    * A fire whose every window is EMPTY has no rows under its fire id
    * (a keyed aggregation cannot conjure its group), but the per-fire
    * semantics emit e.g. `COUNT = 0` — those fires re-run through the
    * single-fire path, whose empty-snapshot evaluation preserves the
    * implicit-single-group shape and costs almost nothing (every scan
    * prunes to zero files). */
  private def fireBatch(due: Seq[(WindowDefinition, Long)]): Unit = {
    val fireCol = "__fire_id"
    val closes = due.map(_._2).distinct.sorted
    val minFrom = closes.min - maxRange
    val maxTo = closes.max - 1
    import spark.implicits._
    val closesDF = broadcast(closes.toDF(fireCol))
    val windowParts = parsed.liveWindows.map { lw =>
      log.query(minFrom, maxTo)
        .where(col("graph") === lw.streamName &&
          col("subject") =!= SentinelSubject)
        .join(closesDF,
          col("timestamp") >= col(fireCol) - lw.width &&
            col("timestamp") < col(fireCol))
        .withColumn("graph", lit(lw.windowName))
    }
    val staticPart = staticDF.map(
      _.withColumn("graph", lit(DefaultGraph)).crossJoin(closesDF))
    val snapshot = (windowParts ++ staticPart).reduce(_ unionByName _)
    // which fires have ANY snapshot row: parity emits nothing at all
    // for an entirely empty snapshot (LiveStreamProcessing.fire's
    // windowQuads.isEmpty && staticQuads.isEmpty shortcut), so those
    // closes are skipped, not evaluated to an implicit-group row.
    // The probe scan is only paid when it can matter: a query that
    // emits nothing on empty input needs no rows-present/no-groups
    // distinction, and static rows make every close present
    val snapPresent =
      if (!emitsOnEmptyGroup) Set.empty[Long]
      else if (staticHasRows) closes.toSet
      else snapshot.select(fireCol).distinct()
        .collect().map(_.getLong(0)).toSet
    val combined = SparqlCompiler
      .compile(snapshot, compiledQuery, Seq(fireCol))
      .localCheckpoint(eager = true)
    val present = combined.select(fireCol).distinct()
      .collect().map(_.getLong(0)).toSet
    due.foreach { case (w, c) =>
      if (present.contains(c))
        resultSink(combined.where(col(fireCol) === c).drop(fireCol),
          c - w.width, c)
      else if (snapPresent.contains(c))
        // snapshot rows exist but the keyed aggregation produced no
        // group (zero pattern matches): parity DOES evaluate here and
        // emits e.g. COUNT = 0 — re-run through the single-fire path,
        // whose implicit single group preserves that shape
        fire(w, c, knownNonEmpty = true)
      // else: empty snapshot — parity emits nothing
    }
  }

  /** One distributed evaluation at close `c`: window graphs from the
    * log (time-pruned scans), static data in the default graph, the
    * full compiled plan, results handed to the sink lazily. An
    * entirely empty snapshot emits NOTHING — the parity path's
    * shortcut — rather than an implicit-group aggregate row; the probe
    * is a limit-1 job over bucket-pruned scans, skipped when static
    * data guarantees the snapshot is non-empty (or the caller already
    * knows it is). */
  private def fire(w: WindowDefinition, c: Long,
      knownNonEmpty: Boolean = false): Unit = {
    val windowParts = parsed.liveWindows.map { lw =>
      log.query(c - lw.width, c - 1) // inclusive [from, c-1] = [from, c)
        .where(col("graph") === lw.streamName &&
          col("subject") =!= SentinelSubject)
        .withColumn("graph", lit(lw.windowName))
    }
    val staticPart = staticDF.map(
      _.withColumn("graph", lit(DefaultGraph)))
    val snapshot = (windowParts ++ staticPart).reduce(_ unionByName _)
    // staticHasRows (row-level, probed at registration) — an empty
    // static frame must NOT defeat the parity shortcut
    if (!knownNonEmpty && !staticHasRows && snapshot.isEmpty) return
    val out = SparqlCompiler.compile(snapshot, compiledQuery)
    resultSink(out, c - w.width, c)
  }
}
