package graft.streaming

import graft.core.RdfEvent
import graft.janusql._
import graft.sparql.{GBgp, GBind, GGroup, GMinus, GOptional, GPath,
  GSubquery, GUnion, GValues, GroupPattern, Iri, Items, Query, QuadPattern,
  SelectQuery, SparqlCompiler, SparqlParser, Star, Term, VarItem}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Live RSP path (SURVEY.md §2.2 W1/W2/W5) — rebuild of
  * `/root/reference/src/stream/live_stream_processing.rs`.
  *
  * Semantics mirrored exactly:
  *   - S2R sliding windows `[RANGE r STEP s]`: event-time driven; a close
  *     fires at every step boundary `c = k*s` once stream time reaches
  *     `c`; the fired window covers `[c - r, c)` and results carry
  *     `timestamp_to - timestamp_from == r`
  *     (`tests/live_stream_integration_test.rs:119-161`);
  *   - sentinel close: `closeStream(uri, finalTs)` advances stream time
  *     with a `urn:rsp:sentinel:*` event that never appears in results
  *     (`live_stream_processing.rs:248-264`);
  *   - W2 cross-window merge: at fire time every other window's content
  *     at that timestamp joins the evaluation, each under its own window
  *     graph (`live_stream_processing.rs:469-482`);
  *   - per-fire full re-evaluation over a fresh snapshot (reference
  *     builds a fresh Oxigraph store per fire — we build a fresh
  *     DataFrame; no incremental state to diverge);
  *   - static/baseline quads live in the default graph; non-WINDOW
  *     patterns match ONLY static data, WINDOW blocks match only their
  *     window's graph (R10 stream-static join);
  *   - W5 RStream: the full answer set of each fired window is emitted.
  *
  * The event buffer is driver-side (window contents are bounded by
  * RANGE — the same assumption the reference makes by holding windows in
  * memory); evaluation of each fire is a distributed Spark job. For
  * cluster-scale ingest, feed micro-batches through
  * [[LiveStreamProcessing.addEvents]] from `foreachBatch` (SURVEY.md
  * §7.3.3 snapshot evaluation).
  */
final class LiveStreamProcessing(spark: SparkSession, queryText: String,
    maxBufferedResults: Int = 65536) {

  import LiveStreamProcessing._

  val parsed: ParsedJanusQuery = JanusQLParser.parse(queryText)
  require(parsed.liveWindows.nonEmpty,
    "LiveStreamProcessing requires at least one ON STREAM window")

  /** bindings = variable → plain lexical value. */
  final case class LiveResult(
      bindings: Map[String, String],
      timestampFrom: Long,
      timestampTo: Long)

  private val compiledQuery: Query = buildCombinedQuery(parsed)

  private val buffers =
    mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[RdfEvent]]
  private val staticData = mutable.ArrayBuffer.empty[RdfEvent]
  /** Bounded result buffer with drop-oldest lag semantics: a slow (or
    * absent) consumer loses the OLDEST results and the loss is counted —
    * mirroring the reference's tokio broadcast channel, which drops with
    * a `Lagged(n)` signal instead of growing without limit
    * (`server.rs:34`). */
  private val results =
    new java.util.concurrent.LinkedBlockingDeque[LiveResult](
      math.max(1, maxBufferedResults))
  private val dropped = new java.util.concurrent.atomic.AtomicLong

  /** Results lost to the bounded buffer since start (lag counter). */
  def droppedResults: Long = dropped.get

  private def emit(r: LiveResult): Unit = {
    while (!results.offerLast(r)) {
      if (results.pollFirst() != null) dropped.incrementAndGet()
    }
  }
  /** next close boundary per window (event-time, multiples of slide) */
  private val nextClose = mutable.LinkedHashMap.empty[String, Long]
  /** per-stream event-time high watermark — a window ticks only on ITS
    * stream's time advancing (rsp-rs routes events to their stream's
    * windows; another stream's progress must not fire it) */
  private val streamMaxTs = mutable.LinkedHashMap.empty[String, Long]
  private var started = false

  parsed.liveWindows.foreach(w => nextClose(w.windowName) = w.slide)

  // ---- lifecycle (mirrors the unit contract of
  //      tests/live_stream_integration_test.rs) ------------------------

  def registerStream(uri: String): Unit = synchronized {
    if (!buffers.contains(uri)) buffers(uri) = mutable.ArrayBuffer.empty
  }

  def getRegisteredStreams: Seq[String] = synchronized { buffers.keys.toSeq }

  def startProcessing(): Unit = synchronized { started = true }

  def addStaticData(events: Seq[RdfEvent]): Unit = synchronized {
    staticData ++= events
  }

  def addEvent(uri: String, event: RdfEvent): Unit =
    addEvents(uri, Seq(event))

  def addEvents(uri: String, events: Seq[RdfEvent]): Unit = synchronized {
    require(buffers.contains(uri), s"Stream not registered: $uri")
    buffers(uri) ++= events
    if (events.nonEmpty) {
      val maxTs = events.map(_.timestamp).max
      streamMaxTs(uri) = math.max(streamMaxTs.getOrElse(uri, Long.MinValue),
        maxTs)
      if (started) advance()
    }
  }

  /** Sentinel close: advances event time so all windows up to `finalTs`
    * fire; the sentinel itself never reaches results. */
  def closeStream(uri: String, finalTs: Long): Unit =
    addEvent(uri, RdfEvent(finalTs, SentinelSubject, SentinelPredicate,
      SentinelObject, ""))

  def tryReceiveResult(): Option[LiveResult] = Option(results.pollFirst())

  /** Results emitted but not yet consumed. `addEvents`/`closeStream`
    * fire windows SYNCHRONOUSLY (advance() runs on the caller's
    * thread), so once a close call has returned and this reads 0, every
    * result the close produced has been handed to a consumer — the
    * drain signal that replaces fixed quiet-period sleeps. */
  def pendingResultCount: Int = results.size()

  /** Buffered events across streams (observability / eviction tests). */
  def bufferedEventCount: Int = synchronized {
    buffers.values.map(_.length).sum
  }

  def collectResults(max: Option[Int] = None): Seq[LiveResult] = {
    val out = mutable.ArrayBuffer.empty[LiveResult]
    var next = results.pollFirst()
    while (next != null && max.forall(out.length < _)) {
      out += next
      next = results.pollFirst()
    }
    out.toSeq
  }

  // ---- window firing (W1) ---------------------------------------------

  /** Fire every window whose next close boundary has been reached by
    * ITS OWN stream's event time, in close-time order. */
  private def advance(): Unit = {
    var fired = true
    while (fired) {
      fired = false
      // earliest pending close among windows whose stream has advanced
      val due = parsed.liveWindows
        .map(w => (w, nextClose(w.windowName)))
        .filter { case (w, c) =>
          streamMaxTs.get(w.streamName).exists(c <= _) }
        .sortBy(_._2)
      due.headOption.foreach { case (w, c) =>
        fire(w, c)
        nextClose(w.windowName) = c + w.slide
        fired = true
      }
    }
    evictExpired()
  }

  /** Drop buffered events no future fire can reach. Any window's fire at
    * time c merges EVERY window's content at c (W2), so the safe horizon
    * for stream s is (earliest pending close across ALL windows) minus
    * the largest range of s's own windows. Keeps long-running streams
    * memory-bounded (the rsp engine evicts on window slide the same
    * way). */
  private def evictExpired(): Unit = {
    if (nextClose.isEmpty) return
    val earliestClose = nextClose.values.min
    buffers.foreach { case (uri, buf) =>
      val ranges = parsed.liveWindows.filter(_.streamName == uri).map(_.width)
      if (ranges.nonEmpty) {
        val horizon = earliestClose - ranges.max
        val kept = buf.filter(_.timestamp >= horizon)
        if (kept.length != buf.length) {
          buf.clear()
          buf ++= kept
        }
      }
    }
  }

  /** Evaluate the combined query at close time `c` of window `w`:
    * window contents (all windows, W2 merge) + static data, one
    * distributed evaluation, full answer emission (W5 RStream). */
  private def fire(w: WindowDefinition, c: Long): Unit = {
    val windowQuads: Seq[RdfEvent] = parsed.liveWindows.flatMap { lw =>
      val from = c - lw.width
      buffers.getOrElse(lw.streamName, mutable.ArrayBuffer.empty)
        .filter(e => e.timestamp >= from && e.timestamp < c &&
          e.subject != SentinelSubject)
        .map(e => e.copy(graph = lw.windowName))
    }
    val staticQuads = staticData.map(_.copy(graph = DefaultGraph)).toSeq

    val bindings: Seq[Map[String, String]] =
      if (windowQuads.isEmpty && staticQuads.isEmpty) Nil
      else {
        val df = RdfEvent.toDF(spark, windowQuads ++ staticQuads)
        val out = SparqlCompiler.compile(df, compiledQuery)
        val cols = out.columns
        out.collect().toSeq.map { row =>
          cols.zipWithIndex.collect {
            case (name, i) if !row.isNullAt(i) =>
              name -> String.valueOf(row.get(i))
          }.toMap
        }
      }
    bindings.foreach { b =>
      emit(LiveResult(b, c - w.width, c))
    }
  }
}

object LiveStreamProcessing {
  val SentinelSubject = "urn:rsp:sentinel:subject"
  val SentinelPredicate = "urn:rsp:sentinel:predicate"
  val SentinelObject = "urn:rsp:sentinel:object"
  /** Graph tag for static/baseline data in the per-fire snapshot (the
    * reference's default graph). */
  val DefaultGraph = "urn:graft:default"

  /** Build the single combined SPARQL-subset query for live evaluation:
    * WINDOW blocks become per-window GRAPH scopes, non-window patterns
    * (baseline joins) are scoped to the static default graph, filters
    * stay top-level — reproducing the reference's store layout (window
    * quads in window named graphs, static data in the default graph,
    * `live_stream_processing.rs:509-552`).
    */
  def buildCombinedQuery(parsed: ParsedJanusQuery): Query = {
    val prefixText = parsed.prefixes
      .map { case (p, ns) => s"PREFIX $p: <$ns>" }.mkString("\n")

    def parseGroup(body: String): GroupPattern =
      SparqlParser.parse(s"$prefixText\nSELECT * WHERE {\n$body\n}")
        .asInstanceOf[SelectQuery].where

    // recursively pin every pattern of a group (incl. those inside
    // OPTIONAL/UNION/MINUS/subqueries and path patterns) to a graph —
    // window bodies may use the full SPARQL surface
    def scope(g: GroupPattern, graph: Term): GroupPattern = g.copy(
      elems = g.elems.map {
        case GBgp(ps) =>
          GBgp(ps.map(p => p.copy(g = p.g.orElse(Some(graph)))))
        case GPath(pp)     => GPath(pp.copy(g = pp.g.orElse(Some(graph))))
        case GOptional(og) => GOptional(scope(og, graph))
        case GMinus(mg)    => GMinus(scope(mg, graph))
        case GUnion(alts)  => GUnion(alts.map(scope(_, graph)))
        case GSubquery(sq) => GSubquery(sq.copy(where = scope(sq.where, graph)))
        case GGroup(gg)    => GGroup(scope(gg, graph))
        case other @ (_: GBind | _: GValues) => other
      })

    def merge(gs: Seq[GroupPattern]): GroupPattern =
      GroupPattern(gs.flatMap(_.elems), gs.flatMap(_.filters))

    // static patterns + filters (everything outside WINDOW blocks)
    val nonWindow =
      JanusQLParser.extractNonWindowWherePatterns(parsed.whereClause)
    val staticScoped =
      if (nonWindow.trim.isEmpty) GroupPattern(Nil, Nil)
      else scope(parseGroup(nonWindow), Iri(DefaultGraph))

    // each live window's body, scoped to the window graph
    val windowGroups = parsed.liveWindows.flatMap { w =>
      JanusQLParser.findWindowBody(parsed.ast.whereWindows, w,
        parsed.prefixes).map(body => (w, parseGroup(body)))
    }
    val windowScoped = windowGroups.map { case (w, g) =>
      scope(g, Iri(w.windowName))
    }

    val where = merge(staticScoped +: windowScoped)

    // projection from the SELECT clause (parse it against a dummy body)
    val projection = {
      val sel =
        if (parsed.selectClause.trim.isEmpty) "SELECT *"
        else parsed.selectClause
      SparqlParser.parse(s"$prefixText\n$sel WHERE { ?__a ?__b ?__c }") match {
        case q: SelectQuery => q.projection
        case _                          => Star
      }
    }
    // drop projected vars that no pattern binds (e.g. historical-only
    // vars in a hybrid query) — the reference's rspql adaptation keeps
    // the original SELECT and Oxigraph returns unbound as absent
    val bound = where.boundVars.toSet
    val prunedProjection = projection match {
      case Items(items) =>
        val kept = items.filter {
          case VarItem(n) => bound.contains(n)
          case _          => true
        }
        if (kept.isEmpty) Star else Items(kept)
      case Star => Star
    }

    SelectQuery(prunedProjection, where, groupBy = Nil)
  }
}
