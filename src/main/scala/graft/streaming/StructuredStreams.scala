package graft.streaming

import graft.comparator.{ComparatorConfig, ComparisonResult,
  StatefulComparator}
import graft.parsing.NQuadsParser
import graft.storage.EventLog

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** Structured Streaming formulations of the stream-side operators —
  * the cluster-scale counterparts of the driver-side
  * [[LiveStreamProcessing]] (which mirrors the reference's semantics
  * 1:1 for parity tests).
  *
  *   - [[ingest]]: `readStream` N-Quads lines → parse → `foreachBatch`
  *     append into the event log. The micro-batch commit IS the
  *     reference's flush/segment creation (SURVEY.md §2.1 S5/S6): batch
  *     boundaries give atomic, time-local segment files.
  *   - [[windowedAggregates]]: event-time RANGE/STEP windows as
  *     `window()` group-by with a watermark (W1 at scale — late data
  *     handled by watermark instead of the reference's
  *     whatever-window-is-open behavior).
  *   - [[comparatorStream]]: §2.6's stateful comparator as
  *     `flatMapGroupsWithState` — bounded per-key deques live in Spark
  *     state storage, sharded across executors.
  */
object StructuredStreams {

  /** See [[graft.util.Lineage.release]] — a standing stream that
    * re-pins per fold must release the superseded generation through
    * the underlying checkpoint RDD (`Dataset.unpersist` is a no-op for
    * checkpoint blocks). */
  private[streaming] def releaseCheckpoint(df: DataFrame): Unit =
    graft.util.Lineage.release(df)

  /** Restart durability for the Streaming* folds below. Every standing
    * state is one or two plain DataFrames plus, for a few classes,
    * bounded driver metadata (per-stratum count maps, a watermark
    * scalar) — so surviving a driver restart is a parquet write + read,
    * the same operational claim the standing indexes prove in
    * IndexPersistenceSpec, now FIRST-CLASS on every fold: a
    * driver-memory localCheckpoint pin alone is NOT restart-durable,
    * and before this the round-13 folds would silently lose their
    * standing sample/funnel on restart. Each class exposes
    * `save(path)` (overwrite the state under `path`; fails loudly when
    * nothing has been folded) and `restore(spark, path)` (load into a
    * FRESH instance constructed with the same parameters; fails loudly
    * on a non-fresh instance), after which `fold` resumes exactly
    * where the saved instance stopped — StreamingDurabilitySpec pins
    * fold-k → save → new instance → restore → fold-rest ≡ the
    * uninterrupted fold, and the `events_funnel_durable` gate entry
    * routes a save/restore through the DuckDB oracle. */
  private def saveFrame(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
  private def loadFrame(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).localCheckpoint(true)
  private def saveCounts(spark: SparkSession,
      m: scala.collection.mutable.Map[String, Long], path: String): Unit = {
    import spark.implicits._
    saveFrame(m.toSeq.toDF("k", "n"), path)
  }
  private def loadCounts(spark: SparkSession, path: String,
      into: scala.collection.mutable.Map[String, Long]): Unit =
    spark.read.parquet(path).select("k", "n").collect()
      .foreach(r => into(r.getString(0)) = r.getLong(1))
  private def requireFresh(isEmpty: Boolean, cls: String): Unit =
    require(isEmpty, s"$cls.restore must target a fresh instance " +
      "(state already folded — restoring over live state would " +
      "silently merge two histories)")
  private def requireSaved(nonEmpty: Boolean, cls: String): Unit =
    if (!nonEmpty) throw new IllegalStateException(
      s"$cls.save: nothing to save — no batch folded yet")

  /** Streaming N-Quads ingest: any streaming Dataset of raw lines
    * (file source, socket, Kafka value, MemoryStream in tests) →
    * canonical quads → event-log append per micro-batch. */
  def ingest(lines: Dataset[String], log: EventLog,
      checkpointDir: String): StreamingQuery = {
    val spark = lines.sparkSession
    lines.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[String], _: Long) =>
        val quads = NQuadsParser.parse(batch)
        log.append(quads)
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
  }

  /** Event-time sliding-window aggregation over a streaming quads
    * DataFrame: per (window, subject) count + mean of numeric objects.
    * `rangeMs`/`stepMs` mirror the RSP RANGE/STEP spec; the watermark
    * bounds state (the disciplined version of the reference's unbounded
    * open-window behavior, SURVEY.md §2.2 W1). */
  def windowedAggregates(quads: DataFrame, rangeMs: Long, stepMs: Long,
      watermarkDelayMs: Long = 10000): DataFrame =
    quads
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", s"$watermarkDelayMs milliseconds")
      .groupBy(
        window(col("event_time"), s"$rangeMs milliseconds",
          s"$stepMs milliseconds"),
        col("subject"))
      .agg(count(lit(1)).as("n"),
        avg(col("object").try_cast("double")).as("mean_value"))

  /** Streaming gap-based sessionization: Structured Streaming's native
    * `session_window` (dynamic-gap session merge inside the stateful
    * aggregation operator) over an epoch-ms event stream. Sessions
    * close — and emit exactly one final row — once the watermark passes
    * their end; state is bounded by the open-session count, not stream
    * length. The batch twin is [[graft.pipeline.Temporal.sessionize]]
    * — identical gap semantics (session_window merges TOUCHING windows,
    * so a split needs `gap > gapMs` strictly, same as the batch
    * boundary flag), so replaying a stream through either path yields
    * the same sessions (SessionStreamSpec asserts it event-for-event,
    * boundary case included). */
  def streamingSessions(events: DataFrame, keyCol: String, tsMsCol: String,
      gapMs: Long, watermarkDelayMs: Long = 10000): DataFrame =
    events
      .withColumn("__event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("__event_time", s"$watermarkDelayMs milliseconds")
      .groupBy(
        session_window(col("__event_time"), s"$gapMs milliseconds"),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsMsCol)).as("start_ms"),
        max(col(tsMsCol)).as("end_ms"))
      .select(col(keyCol), col("n_events"), col("start_ms"), col("end_ms"),
        (col("end_ms") - col("start_ms")).as("duration_ms"))

  /** Streaming event-time interval join — the streaming twin of
    * [[graft.pipeline.Temporal.rangeJoin]]: all (left, right) pairs
    * with equal key and right time within `[leftTs - beforeMs,
    * leftTs + afterMs]`, both bounds inclusive, over two live streams.
    * Watermarks on BOTH sides let Spark's stream-stream join evict
    * state once a row can no longer match (state is bounded by the band
    * width + watermark delay, not stream length). Left columns other
    * than the key must not collide with right columns. */
  def streamingRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsMs: String, rightTsMs: String, beforeMs: Long, afterMs: Long,
      watermarkDelayMs: Long = 10000): DataFrame = {
    val l = left
      .withColumn("__lt", timestamp_millis(col(leftTsMs)))
      .withWatermark("__lt", s"$watermarkDelayMs milliseconds")
    val r = right
      .withColumnRenamed(key, "__rk")
      .withColumn("__rt", timestamp_millis(col(rightTsMs)))
      .withWatermark("__rt", s"$watermarkDelayMs milliseconds")
    l.join(r, col(key) === col("__rk") &&
        col("__rt") >= col("__lt") -
          expr(s"INTERVAL $beforeMs MILLISECONDS") &&
        col("__rt") <= col("__lt") +
          expr(s"INTERVAL $afterMs MILLISECONDS"))
      .drop("__rk", "__lt", "__rt")
  }

  /** One tagged event of a streaming as-of join: `side` 0 = right
    * (reference feed), 1 = left (probe feed) — the same union-tag shape
    * the batch [[graft.pipeline.Temporal.asOfJoin]] uses internally. */
  final case class AsOfEvent(key: String, tsMs: Long, side: Int,
      tieBreak: Long, value: Double)

  /** One emitted left row: the latest right value at-or-before its ts
    * (within tolerance), or nulls when none is admissible. */
  final case class AsOfMatch(key: String, tsMs: Long,
      matchedTsMs: Option[Long], matchedValue: Option[Double],
      gapMs: Option[Long])

  /** Per-key as-of state: recent right rows, (ts, tieBreak)-sorted. */
  final case class AsOfState(rights: Seq[(Long, Long, Double)])

  /** Streaming backward as-of join — the streaming twin of
    * [[graft.pipeline.Temporal.asOfJoin]], completing the temporal trio
    * with [[streamingSessions]] and [[streamingRangeJoin]]: each left
    * event joins the LATEST right event with `ts <= left.ts` on its key
    * (greatest tieBreak wins equal timestamps), emitted on arrival.
    *
    * State is a per-key buffer of right rows within `horizonMs` of the
    * key's max seen ts (the newest right at-or-below the horizon is
    * always retained — a quiet feed must still match), sharded across
    * executors by Spark state storage — bounded by rate × horizon, not
    * stream length. Within a micro-batch events apply in (ts, side,
    * tieBreak) order, so replaying any per-key ts-ordered stream
    * through this operator equals the batch asOfJoin row-for-row
    * (AsOfStreamSpec asserts it across micro-batch boundaries); with
    * cross-batch disorder it degrades to emit-on-arrival semantics
    * (no retraction), the standard streaming as-of contract. */
  def streamingAsOfJoin(events: Dataset[AsOfEvent],
      toleranceMs: Option[Long] = None,
      horizonMs: Long = 3600000L): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[AsOfState]) =>
          var rights = state.getOption.map(_.rights.toVector)
            .getOrElse(Vector.empty)
          val out = Vector.newBuilder[AsOfMatch]
          // right (side 0) before left at equal ts — inclusive bound,
          // identical to the batch window's (ts, side, tiebreak) order
          rows.toSeq.sortBy(e => (e.tsMs, e.side, e.tieBreak)).foreach {
            e =>
              if (e.side == 0) {
                val at = rights.lastIndexWhere(r =>
                  r._1 < e.tsMs || (r._1 == e.tsMs && r._2 <= e.tieBreak))
                rights = (rights.take(at + 1) :+
                  ((e.tsMs, e.tieBreak, e.value))) ++ rights.drop(at + 1)
              } else {
                val m = rights.reverseIterator.find(_._1 <= e.tsMs)
                val admissible = m.filter { r =>
                  toleranceMs.forall(t => e.tsMs - r._1 <= t)
                }
                out += AsOfMatch(key, e.tsMs,
                  admissible.map(_._1), admissible.map(_._3),
                  admissible.map(r => e.tsMs - r._1))
              }
          }
          // evict rights past the horizon, ALWAYS retaining the newest
          // one at-or-below it (future lefts still need a match)
          if (rights.nonEmpty) {
            val cutoff = rights.last._1 - horizonMs
            val keepFrom =
              math.max(0, rights.lastIndexWhere(_._1 <= cutoff))
            rights = rights.drop(keepFrom)
          }
          state.update(AsOfState(rights))
          out.result().iterator
      }
  }

  // ---- streaming curation ---------------------------------------------

  /** Streaming exact dedup: keep the first document per (normalized)
    * content hash within the watermark horizon.
    * `dropDuplicatesWithinWatermark` bounds the dedup state — the
    * undisciplined `dropDuplicates` grows state forever on an unbounded
    * stream. Arriving duplicates outside the horizon pass (the standing
    * corpus is the batch layer's job — see
    * [[graft.pipeline.Dedup.matchAgainstIndex]]). */
  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
      watermarkDelayMs: Long = 10000): DataFrame =
    docs
      .withColumn("__event_time", timestamp_millis(col(tsCol)))
      .withColumn("__content_hash",
        md5(graft.pipeline.Dedup.normalizedText(col(textCol))))
      .withWatermark("__event_time", s"$watermarkDelayMs milliseconds")
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__event_time", "__content_hash")

  /** Incremental near-dup detection: per micro-batch, match the new
    * documents against a standing [[graft.pipeline.Dedup.CorpusIndex]]
    * and hand the verified (new_id, corpus_id, jaccard) matches to
    * `onMatches`. The per-batch cost is proportional to the batch
    * (bands broadcast against the persisted corpus index), not to the
    * corpus — the shape an always-on curation ingest needs. */
  def streamingNearDup(docs: DataFrame, idCol: String, textCol: String,
      index: graft.pipeline.Dedup.CorpusIndex, threshold: Double,
      checkpointDir: String,
      onMatches: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val matches = graft.pipeline.Dedup.matchAgainstIndex(
          batch.toDF(), col(idCol), col(textCol), index, threshold)
        // the match frame arrives persisted+materialized; release it
        // once consumed — an always-on stream must not accumulate one
        // cached RDD per micro-batch
        try onMatches(matches) finally matches.unpersist()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  // ---- streaming sketch maintenance ------------------------------------

  /** Standing mergeable-sketch state (per-group HLL distinct + KLL
    * quantile + CMS frequency, [[graft.pipeline.Sketches]]) maintained
    * by folding streaming micro-batches: each batch aggregates to a
    * group-sized sketch table, then merges into the standing table —
    * per-batch cost ∝ batch + group count, NEVER a rescan of history,
    * and the merge laws are associative so the folded registers equal a
    * one-shot batch build over the concatenated stream
    * (StreamingSketchSpec asserts it). The standing table is
    * lineage-truncated per fold (an always-on stream must not grow the
    * plan) and superseded blocks are released. */
  final class StreamingSketches(groupCols: Seq[String], valueCol: String,
      lgK: Int = 12, kllK: Int = 200) {
    @volatile private var state: Option[DataFrame] = None

    /** Fold one (micro-)batch into the standing table. */
    def fold(batch: DataFrame): Unit = synchronized {
      val b = graft.pipeline.Sketches.sketchTable(batch,
        groupCols.map(col), col(valueCol), lgK = lgK, kllK = kllK)
      val next = state match {
        case None => b.localCheckpoint(true)
        case Some(s0) =>
          val merged = graft.pipeline.Sketches.mergeSketchTables(
            s0.unionByName(b), groupCols.map(col)).localCheckpoint(true)
          releaseCheckpoint(s0)
          merged
      }
      state = Some(next)
    }

    /** Current standing sketch table (empty-schema None before any
      * batch). */
    def current: Option[DataFrame] = state

    def save(path: String): Unit = synchronized {
      requireSaved(state.nonEmpty, "StreamingSketches")
      saveFrame(state.get, s"$path/state")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(state.isEmpty, "StreamingSketches")
      state = Some(loadFrame(spark, s"$path/state"))
    }

    def unpersist(): Unit = synchronized {
      state.foreach(releaseCheckpoint); state = None
    }
  }

  /** Standing BM25 inverted index over a document stream: each
    * micro-batch builds its own postings + integer corpus counts
    * ([[graft.pipeline.Retrieval.buildBm25Acc]]) and folds into the
    * standing accumulator — per-batch cost ∝ batch postings + standing
    * postings glue, NEVER a re-tokenization of history. Postings from
    * disjoint doc batches union associatively and the (n_docs, sum_dl)
    * counts are exact integer adds, so the folded index serves scores
    * BIT-IDENTICAL to a one-shot build over the concatenated stream
    * (`StreamingBm25Spec`). The corpus-sized postings live in a
    * log-structured [[DeltaFrame]] spool — disjoint doc batches make
    * the postings fold a pure union, so each fold writes ONLY the
    * batch's postings (cost ∝ batch; the old full-corpus re-pin was
    * O(standing) per fold). The one-row integer counts stay a
    * checkpoint pin. */
  final class StreamingBm25(idCol: String, textCol: String,
      compactEvery: Int = 64, spoolDir: Option[String] = None) {
    @volatile private var postDl: Option[DeltaFrame] = None
    @volatile private var countsSt: Option[DataFrame] = None

    /** Live postings generation count (spec observability). */
    def generationCount: Int = postDl.map(_.generationCount).getOrElse(0)

    /** Per-fold work attribution (`graft.debug.foldstats` system
      * property turns the counters on — they cost extra actions):
      * every term of a fold's cost is ∝ one of these, NEVER the
      * standing corpus, which is the 100 TB feasibility claim the
      * ScaleProbe SCALE12 series verifies against measured walls. */
    final case class Bm25FoldStats(batchDocs: Long, batchPostings: Long,
        standingGens: Int)
    @volatile private var foldStats: Option[Bm25FoldStats] = None
    def lastFoldStats: Option[Bm25FoldStats] = foldStats

    def fold(batch: DataFrame): Unit = synchronized {
      val R = graft.pipeline.Retrieval
      val b = R.buildBm25Acc(batch, col(idCol), col(textCol))
      if (postDl.isEmpty)
        postDl = Some(new DeltaFrame(batch.sparkSession, "bm25-post",
          compactEvery, spoolDir.map(d => s"$d/postings")))
      postDl.get.append(b.postings)
      if (sys.props.contains("graft.debug.foldstats"))
        foldStats = Some(Bm25FoldStats(
          b.counts.select(col("n_docs")).head().getLong(0),
          b.postings.count(), postDl.get.generationCount))
      val foldedCounts = countsSt match {
        case None     => b.counts
        case Some(c0) => c0.unionByName(b.counts)
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("sum_dl")).as("sum_dl"))
      }
      val pinned = foldedCounts.localCheckpoint(true)
      countsSt.foreach(releaseCheckpoint)
      countsSt = Some(pinned)
    }

    /** Current standing accumulator (None before any batch); serve
      * probes via `current.map(_.index)` +
      * [[graft.pipeline.Retrieval.bm25ScoresIndexed]]. The postings
      * frame is backed by the delta spool — valid until the next fold
      * (compaction may rewrite the files behind it). */
    def current: Option[graft.pipeline.Retrieval.Bm25Acc] =
      countsSt.map(c =>
        graft.pipeline.Retrieval.Bm25Acc(postDl.get.read, c))

    def save(path: String): Unit = synchronized {
      requireSaved(countsSt.nonEmpty, "StreamingBm25")
      postDl.get.saveTo(s"$path/postings")
      saveFrame(countsSt.get, s"$path/counts")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(countsSt.isEmpty && postDl.isEmpty, "StreamingBm25")
      postDl = Some(new DeltaFrame(spark, "bm25-post",
        spoolDir = spoolDir.map(d => s"$d/postings")))
      postDl.get.loadFrom(s"$path/postings")
      countsSt = Some(loadFrame(spark, s"$path/counts"))
    }

    def unpersist(): Unit = synchronized {
      countsSt.foreach(releaseCheckpoint); countsSt = None
      postDl.foreach(_.delete()); postDl = None
    }
  }

  /** Attach standing BM25 index maintenance to a document stream. */
  def maintainBm25(stream: DataFrame, index: StreamingBm25,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        index.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Standing DSIR bucket model over a document stream: each
    * micro-batch's (raw, target) bucket counts fold into the standing
    * model with one ≤ 2·buckets-row aggregation
    * ([[graft.pipeline.Sampling.foldDsirModel]]) — integer adds are
    * associative, so the folded model scores documents BIT-IDENTICALLY
    * to a one-shot build over the concatenated stream
    * (`StreamingDsirSpec`). Lineage-truncated per fold, superseded
    * checkpoints released. */
  final class StreamingDsir(idCol: String, textCol: String,
      isTarget: String, buckets: Int = 256) {
    @volatile private var state
        : Option[graft.pipeline.Sampling.DsirModel] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val S = graft.pipeline.Sampling
      val b = S.buildDsirModel(batch, col(idCol), col(textCol),
        col(isTarget), buckets)
      val folded = state match {
        case None     => b
        case Some(s0) => S.foldDsirModel(s0, b)
      }
      val pinned = S.DsirModel(folded.counts.localCheckpoint(true),
        buckets)
      state.foreach(s0 => releaseCheckpoint(s0.counts))
      state = Some(pinned)
    }

    /** Current standing model (None before any batch); score via
      * [[graft.pipeline.Sampling.dsirWeightsWithModel]]. */
    def current: Option[graft.pipeline.Sampling.DsirModel] = state

    def save(path: String): Unit = synchronized {
      requireSaved(state.nonEmpty, "StreamingDsir")
      saveFrame(state.get.counts, s"$path/state")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(state.isEmpty, "StreamingDsir")
      state = Some(graft.pipeline.Sampling.DsirModel(
        loadFrame(spark, s"$path/state"), buckets))
    }

    def unpersist(): Unit = synchronized {
      state.foreach(s0 => releaseCheckpoint(s0.counts)); state = None
    }
  }

  /** Attach standing DSIR-model maintenance to a document stream. */
  def maintainDsir(stream: DataFrame, model: StreamingDsir,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        model.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Standing additive CUBE dashboard over a stream
    * ([[graft.pipeline.Reports]]): each micro-batch aggregates to its
    * own cube of (count, sum) partials, then folds into the standing
    * cube with one aggregation over |batch cube| + |standing cube|
    * rows — never a rescan of history. Integer adds are associative,
    * so the folded cube is BIT-IDENTICAL to the one-shot CUBE over the
    * concatenated stream for any batch split
    * ([[StreamingCubeSpec]]). State lineage-truncated per fold,
    * superseded checkpoints released — the standing-state discipline
    * shared by every Streaming* class here. */
  final class StreamingCube(dims: Seq[String], measure: String) {
    @volatile private var state: Option[DataFrame] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val b = graft.pipeline.Reports.cubePartial(batch,
        dims.map(col), col(measure))
      val next = state match {
        case None => b.localCheckpoint(true)
        case Some(s0) =>
          val merged = graft.pipeline.Reports.foldCubes(Seq(s0, b))
            .localCheckpoint(true)
          releaseCheckpoint(s0)
          merged
      }
      state = Some(next)
    }

    /** Current standing cube (None before any batch); read through
      * [[graft.pipeline.Reports.withAvg]] for derived means. */
    def current: Option[DataFrame] = state

    def save(path: String): Unit = synchronized {
      requireSaved(state.nonEmpty, "StreamingCube")
      saveFrame(state.get, s"$path/state")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(state.isEmpty, "StreamingCube")
      state = Some(loadFrame(spark, s"$path/state"))
    }

    def unpersist(): Unit = synchronized {
      state.foreach(releaseCheckpoint); state = None
    }
  }

  /** Standing per-stratum quota sample over a stream: the top-n rows
    * of each stratum by deterministic hash priority, folded per
    * micro-batch. The selection rule is a per-stratum top-n under a
    * TOTAL order (hash asc, key asc), so it obeys the exact merge law
    * `topN(A ∪ B) = topN(topN(A) ∪ topN(B))` — the folded standing
    * sample equals the one-shot [[graft.pipeline.Sampling.quotaSample]]
    * over everything seen, for ANY batch split
    * (`StreamingSampleSpec`). Per-fold cost ∝ batch + strata × n
    * (the standing state), never stream history; state is
    * lineage-truncated per fold and superseded checkpoints released. */
  final class StreamingQuotaSample(stratumCol: String, keyCol: String,
      n: Int) {
    @volatile private var state: Option[DataFrame] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val b = batch.select(col(stratumCol), col(keyCol))
      val merged = state match {
        case None     => b
        case Some(s0) => s0.unionByName(b)
      }
      val next = graft.pipeline.Sampling.quotaSample(merged,
        col(stratumCol), col(keyCol), n).localCheckpoint(true)
      state.foreach(releaseCheckpoint)
      state = Some(next)
    }

    /** Current standing sample (None before any batch). */
    def current: Option[DataFrame] = state

    def save(path: String): Unit = synchronized {
      requireSaved(state.nonEmpty, "StreamingQuotaSample")
      saveFrame(state.get, s"$path/state")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(state.isEmpty, "StreamingQuotaSample")
      state = Some(loadFrame(spark, s"$path/state"))
    }

    def unpersist(): Unit = synchronized {
      state.foreach(releaseCheckpoint); state = None
    }
  }

  /** Standing temperature-rebalanced sample over a document stream —
    * the streaming twin of [[graft.pipeline.Sampling
    * .temperatureSample]] (fixed `targetN`, `alpha` ≤ 1). EXACT with
    * NO arrival-order contract: selection is `hashUnit(key) <
    * rate(stratum)` where `rate_s = min(1, targetN·N_s^{α−1} /
    * Σ N_t^α)` depends only on the FINAL stratum counts — and rates
    * are NON-INCREASING as any count grows (α ≤ 1: the numerator falls
    * in N_s, the denominator grows in every N_t; rounding is
    * monotone), so a row rejected under an earlier, larger rate can
    * never be wanted again and previously kept rows just re-filter
    * under the new rates. State: the current sample (≈ targetN rows)
    * plus the per-stratum count table (bounded metadata, kept on the
    * driver like the one-shot's). Folded state ≡ the one-shot over
    * everything ingested (`sample_temperature_incremental`). */
  final class StreamingTemperatureSample(stratumCol: String,
      keyCol: String, alpha: Double, targetN: Long) {
    require(alpha >= 0 && alpha <= 1,
      s"alpha must be in [0, 1] (rates must be non-increasing as " +
        s"counts grow or the fold would need rejected rows back), " +
        s"got $alpha")
    require(targetN > 0, s"targetN must be > 0, got $targetN")
    private val counts =
      scala.collection.mutable.Map.empty[String, Long]
    @volatile private var state: Option[DataFrame] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val spark = batch.sparkSession
      import spark.implicits._
      val b = batch.where(col(stratumCol).isNotNull)
      b.groupBy(col(stratumCol).cast("string")).count().collect()
        .foreach(r => counts(r.getString(0)) =
          counts.getOrElse(r.getString(0), 0L) + r.getLong(1))
      // canonical (sorted-stratum) accumulation order — the one-shot
      // [[graft.pipeline.Sampling.temperatureSample]] sums the same
      // way, so the double powSum (and hence every rate compared
      // against hashUnit) is bit-identical between fold and one-shot,
      // not just equal after round-to-9
      val sorted = counts.toSeq.sortBy(_._1)
      val powSum =
        sorted.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
      val rates = sorted.map { case (s, n) =>
        val rate = math.min(1.0,
          targetN.toDouble * (math.pow(n.toDouble, alpha) / powSum) / n)
        (s, BigDecimal(rate)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("__stratum", "__rate")
      val merged = state match {
        case None     => b
        case Some(s0) => s0.unionByName(b)
      }
      val next = merged
        .join(broadcast(rates),
          col(stratumCol).cast("string") === col("__stratum"))
        .where(graft.pipeline.Sampling.hashUnit(col(keyCol)) <
          col("__rate"))
        .drop("__stratum", "__rate")
        .localCheckpoint(true)
      state.foreach(releaseCheckpoint)
      state = Some(next)
    }

    /** Current standing sample (None before any batch). */
    def current: Option[DataFrame] = state

    def save(path: String): Unit = synchronized {
      requireSaved(state.nonEmpty, "StreamingTemperatureSample")
      saveFrame(state.get, s"$path/state")
      saveCounts(state.get.sparkSession, counts, s"$path/counts")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(state.isEmpty && counts.isEmpty,
        "StreamingTemperatureSample")
      state = Some(loadFrame(spark, s"$path/state"))
      loadCounts(spark, s"$path/counts", counts)
    }

    def unpersist(): Unit = synchronized {
      state.foreach(releaseCheckpoint); state = None; counts.clear()
    }
  }

  /** Standing distribution-matched sample over a document stream — the
    * streaming twin of [[graft.pipeline.Sampling.matchedSample]] in
    * its fixed-budget form (`maxN = targetN`). State per weighted bin:
    * the top-`targetN·w_b div W` smallest-hash rows (an associative
    * min-fold — order-free, no arrival contract) plus exact bin counts
    * (bounded driver metadata). `current` computes N* =
    * min(targetN, min_b(a_b·W div w_b)) from the TRUE counts and trims
    * each pool to its quota — by the floor inequality
    * `N*·w_b div W ≤ targetN·w_b div W` every needed row is in the
    * pool, so the standing sample ≡ the one-shot
    * `matchedSample(all, …, maxN = targetN)` exactly
    * (`sample_matched_incremental`). The UNCAPPED maximizing form is
    * deliberately not streamed: its quotas grow with the corpus, so an
    * exact fold would have to retain nearly every bin in full —
    * output-unbounded state is a rebuild, not a fold. */
  final class StreamingMatchedSample(binCol: String, keyCol: String,
      targetWeights: Seq[(String, Long)], targetN: Long) {
    require(targetWeights.nonEmpty, "need at least one target bin")
    require(targetWeights.forall(_._2 > 0), "weights must be positive")
    require(targetN > 0, s"targetN must be > 0, got $targetN")
    private val w = targetWeights.map(_._2).sum
    private val caps =
      targetWeights.map { case (b, wb) => (b, targetN * wb / w) }
    private val counts =
      scala.collection.mutable.Map.empty[String, Long]
    @volatile private var pools: Option[DataFrame] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val spark = batch.sparkSession
      import spark.implicits._
      val b = batch.withColumn("__bin", col(binCol).cast("string"))
        .where(col("__bin").isin(targetWeights.map(_._1): _*))
      b.groupBy("__bin").count().collect()
        .foreach(r => counts(r.getString(0)) =
          counts.getOrElse(r.getString(0), 0L) + r.getLong(1))
      val merged = pools match {
        case None     => b
        case Some(p0) => p0.unionByName(b)
      }
      val capDf = caps.toDF("__bin", "__cap")
      val next = graft.pipeline.Sampling.topKPerGroup(merged,
          col("__bin"),
          lit(0.0) - graft.pipeline.Sampling.hashUnit(col(keyCol)),
          col(keyCol).asc,
          math.max(caps.map(_._2).max, 1L).toInt)
        .join(broadcast(capDf), Seq("__bin"))
        .where(col("rank") <= col("__cap"))
        .drop("rank", "__cap")
        .localCheckpoint(true)
      pools.foreach(releaseCheckpoint)
      pools = Some(next)
    }

    /** Current matched sample: quotas from the exact standing counts,
      * each pool trimmed to its quota (None before any batch; empty
      * when a weighted bin has no rows yet — loudly empty, the
      * one-shot's contract). */
    def current: Option[DataFrame] = pools.map { p =>
      val spark = p.sparkSession
      import spark.implicits._
      val nStar = math.min(
        targetWeights.map { case (b, wb) =>
          counts.getOrElse(b, 0L) * w / wb }.min,
        targetN)
      val quotas = targetWeights
        .map { case (b, wb) => (b, nStar * wb / w) }
        .toDF("__bin", "__quota")
      val ranked = p.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bin"))
          .orderBy(graft.pipeline.Sampling.hashUnit(col(keyCol)).asc,
            col(keyCol).asc)))
      ranked.join(broadcast(quotas), Seq("__bin"))
        .where(col("__rn") <= col("__quota"))
        .drop("__rn", "__quota", "__bin")
    }

    def save(path: String): Unit = synchronized {
      requireSaved(pools.nonEmpty, "StreamingMatchedSample")
      saveFrame(pools.get, s"$path/state")
      saveCounts(pools.get.sparkSession, counts, s"$path/counts")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(pools.isEmpty && counts.isEmpty,
        "StreamingMatchedSample")
      pools = Some(loadFrame(spark, s"$path/state"))
      loadCounts(spark, s"$path/counts", counts)
    }

    def unpersist(): Unit = synchronized {
      pools.foreach(releaseCheckpoint); pools = None; counts.clear()
    }
  }

  /** Standing containment dedup over a document stream — the streaming
    * twin of [[graft.pipeline.Dedup.containmentDeduplicate]]'s
    * drop-if-dominated rule. EXACT with NO arrival contract: the rule
    * (`a` dropped iff SOME `b` with more shingles — smaller id on ties
    * — contains ≥ `minPpm` of it) is order-free and MONOTONE — a bit
    * only ever flips kept → dropped, and only a NEW arrival can flip
    * it (old-vs-old pairs were decided in earlier folds) — so each
    * micro-batch needs exactly two probe directions:
    *
    *   1. NEW doc vs (standing ∪ batch): the batch's prefix shingles
    *      against the full postings index;
    *   2. standing doc vs NEW: the STANDING prefix index against the
    *      batch's postings — the pass that retro-drops an old doc when
    *      a bigger absorber finally arrives.
    *
    * The per-doc prefix is its `|A| − ⌈t·|A|⌉ + 1` rarest shingles by
    * DF-AT-ARRIVAL (a standing document-frequency table folds per
    * batch; each doc's prefix is chosen against the counts as of its
    * own fold and FIXED forever, hash as tiebreak) — so the standing
    * prefix index never goes stale. The one-shot's global df order
    * would re-rank as counts grow; the pigeonhole recall guarantee
    * holds for ANY order fixed per probe doc, and at-arrival df keeps
    * the rare-first probe-size optimization: a shingle that is rare
    * when a doc arrives can only become MORE discriminating to have
    * indexed, never less correct. Candidate pairs verify by exact
    * `array_intersect` against the standing shingle sets; the KEPT SET
    * equals the one-shot `containmentDeduplicate` over everything
    * ingested for ANY batch split (`StreamingContainmentSpec`,
    * `dedup_containment_incremental`).
    *
    * State discipline: the CORPUS-SIZED frames — shingle sets,
    * postings, per-batch df partials, prefix index — live in
    * log-structured [[DeltaFrame]] spools, so each fold WRITES only
    * the batch's rows (the re-pin pattern wrote the full standing
    * corpus through the block manager every fold — O(standing) per
    * batch, cumulatively quadratic in stream length; this fold's
    * state-maintenance cost is ∝ batch, with bounded-amplification
    * compaction). Only the THIN frames (ids, dropped bits) stay as
    * per-fold checkpoint pins. The df snapshot a batch ranks its
    * prefixes against is the generation SUM restricted (semi-join) to
    * the batch's own vocabulary — exact, because df partials add
    * associatively and a doc's prefix only consults its own shingles'
    * counts. Parquet save/restore durable (saves compact). */
  final class StreamingContainmentDedup(idCol: String, textCol: String,
      minPpm: Long, shingleSize: Int = 3, compactEvery: Int = 64,
      spoolDir: Option[String] = None) {
    require(minPpm > 0L && minPpm <= 1000000L,
      "minPpm must be in (0, 1000000]")
    // corpus-sized, log-structured: (id, sh, n) docs / (t, id, n)
    // postings / (t, id, n) prefixes. Document frequency is NOT a
    // separate spool: df(t) ≡ posting count of t, so the at-arrival df
    // a batch ranks against is an aggregate over the postings spool —
    // one fewer write+read per fold, one fewer restore surface.
    @volatile private var docsDl: Option[DeltaFrame] = None
    @volatile private var postDl: Option[DeltaFrame] = None
    @volatile private var prefDl: Option[DeltaFrame] = None
    // thin, per-fold checkpoint pins: (id) ids / (id) dropped
    @volatile private var idsSt: Option[DataFrame] = None
    @volatile private var dropSt: Option[DataFrame] = None

    private def deltas(spark: SparkSession)
        : (DeltaFrame, DeltaFrame, DeltaFrame) = {
      if (docsDl.isEmpty) {
        docsDl = Some(new DeltaFrame(spark, "containment-docs",
          compactEvery, spoolDir.map(d => s"$d/docs")))
        postDl = Some(new DeltaFrame(spark, "containment-post",
          compactEvery, spoolDir.map(d => s"$d/postings")))
        prefDl = Some(new DeltaFrame(spark, "containment-pref",
          compactEvery, spoolDir.map(d => s"$d/prefixes")))
      }
      (docsDl.get, postDl.get, prefDl.get)
    }

    /** Live generation counts (docs, postings, prefixes) — spec
      * observability for the flat-fold-cost proof. */
    def generationCounts: Seq[Int] =
      Seq(docsDl, postDl, prefDl).flatten.map(_.generationCount)

    /** Per-fold work attribution, populated only when the
      * `graft.debug.containment` channel is on (counting costs extra
      * actions): how much of a fold's wall is OUTPUT-SHAPED work —
      * batch drops + retro-drops found, cursor rounds run, candidate
      * pairs probed — vs a standing-size term (which the DeltaFrame
      * state is designed to eliminate). ScaleProbe SCALE10/11 read
      * this to prove fold walls track recorded work, not corpus. */
    final case class FoldStats(batchDocs: Long, batchDrops: Long,
        retroDrops: Long, cursorRounds: Int, candidatePairs: Long)
    @volatile private var foldStats: Option[FoldStats] = None
    def lastFoldStats: Option[FoldStats] = foldStats

    private def shingled(batch: DataFrame): DataFrame =
      batch.select(col(idCol).as("id"),
        graft.pipeline.TextAnalysis
          .shingles(col(textCol), shingleSize).as("sh0"))
        .where(size(col("sh0")) > 0)
        .select(col("id"),
          sort_array(array_distinct(col("sh0"))).as("sh"))
        .withColumn("n", size(col("sh")).cast("long"))
        // hashed twin for the verify prefilter (see cursorDrops);
        // intra-doc injectivity is proven per batch in fold()
        .withColumn("shh",
          sort_array(transform(col("sh"), x => xxhash64(x))))

    def fold(batch: DataFrame): Unit = synchronized {
      val D = graft.pipeline.Dedup
      val L = graft.util.Lineage
      val W = org.apache.spark.sql.expressions.Window
      val (docs, post, pref) = deltas(batch.sparkSession)
      // direction-2's skip derives from the ACTUAL state it depends on
      // — the standing prefix spool — not the idsSt proxy: if a fold
      // path ever reorders state writes, or a fold throws between the
      // appends and the idsSt assignment and is retried, the proxy
      // would silently skip retro-drops while a standing index exists
      val firstFold = pref.isEmpty
      val b = shingled(batch).localCheckpoint(true)
      try {
        // the hashed-prefilter completeness proof, per arriving doc
        // (a doc's shh is fixed at its fold; see cursorDrops)
        require(b.where(size(array_distinct(col("shh"))) =!=
            size(col("sh"))).isEmpty,
          "StreamingContainmentDedup: xxhash64 collision inside one " +
            "document's shingle set — raise shingleSize")
        val bPost = b.select(explode(col("sh")).as("t"), col("id"),
          col("n")).localCheckpoint(true)
        try {
          // df-at-arrival: the batch's postings land FIRST, then the
          // batch ranks its prefixes against the posting count (≡ df)
          // restricted to its own vocabulary — INCLUDING itself, fixed
          // for these docs forever. Cost ∝ batch (+ a semi-filtered
          // aggregate over the spool). bPref materializes eagerly
          // below, so a later append's compaction cannot delete the
          // spool files under its plan.
          post.append(bPost)
          val dfNow = post.read
            .join(bPost.select(col("t")).distinct(), Seq("t"), "left_semi")
            .groupBy(col("t")).agg(count(lit(1)).as("df"))
          val prefLen = expr(
            s"cast(n - ((n * $minPpm + 999999) div 1000000) + 1 as int)")
          val byRarity = W.partitionBy(col("id"))
            .orderBy(col("df").asc, col("t").asc)
          val bPref = b.select(col("id"), col("n"), prefLen.as("__pl"),
              explode(col("sh")).as("t"))
            .join(dfNow, Seq("t"))
            .withColumn("__rk", row_number().over(byRarity))
            .where(col("__rk") <= col("__pl"))
            .select(col("t"), col("id"), col("n"))
            .localCheckpoint(true)
          try {
            // remaining appends land before ANY probe plan is built —
            // an append can trigger compaction, and compaction deletes
            // the files a lazily-built plan would still reference
            docs.append(b); pref.append(bPref)
            val sets = docs.read.select(col("id"), col("sh"), col("shh"))

            // direction 1 — new docs against everything seen, via the
            // witness-sensitive cursor loop (the pair-complete union
            // this replaces verified the batch's FULL candidate
            // universe per fold; at 100× the universe is ~10⁹ pairs,
            // the cursor loop probes nearest-bigger-first with early
            // exit). Postings ranked only for the batch's prefix
            // vocabulary; a batch doc sits in its own lists, so
            // __m = own rank − 1, exactly the one-shot's derivation.
            val ranked1 = post.read
              .join(bPref.select(col("t")).distinct(), Seq("t"),
                "left_semi")
              .withColumn("__rk", row_number().over(W.partitionBy("t")
                .orderBy(col("n").desc, col("id").asc)))
              .select(col("t"), col("id").as("id_b"), col("__rk"))
            val live1 = bPref
              .join(ranked1.withColumnRenamed("id_b", "id"),
                Seq("t", "id"))
              .select(col("id").as("id_a"), col("t"),
                (col("__rk") - 1).cast("long").as("__m"))
              .where(col("__m") > 0)

            // direction 2 — the standing prefix index against the NEW
            // postings (retro-drop: an old keeper falls when its
            // absorber finally arrives); on the FIRST fold there is no
            // standing index, so the whole direction is skipped. Rank
            // the batch's postings per shingle and compute each
            // standing cursor's qualifying depth by inserting it as a
            // PHANTOM row into the same window: reals outranking the
            // phantom = row_number minus the running phantom count.
            // One linear window pass, no pair fan-out. Cursors of
            // batch docs (direction 1's job) and of already-dropped
            // docs are excluded.
            //
            // The directions then share ONE cursor loop: `t` is an
            // opaque join key inside cursorDrops, so namespacing it
            // with a direction byte keeps the two posting universes
            // disjoint while sharing each round's candidate join,
            // verify join, and driver-steered count — at micro-batch
            // scale the per-round scheduling floor dominates, and two
            // sequential loops paid it twice.
            val (live, ranked) = if (firstFold) {
              (live1, ranked1.localCheckpoint(true))
            } else {
              val prefOld0 = pref.read
                .join(b.select(col("id")), Seq("id"), "left_anti")
              val prefOld = dropSt match {
                case Some(d) => prefOld0.join(d, Seq("id"), "left_anti")
                case None    => prefOld0
              }
              val real = bPost
                .join(prefOld.select(col("t")).distinct(), Seq("t"),
                  "left_semi")
              val posW = W.partitionBy("t")
                .orderBy(col("n").desc, col("id").asc)
              val pos = real.select(col("t"), col("id"), col("n"),
                  lit(0L).as("__ph"))
                .unionByName(prefOld.select(col("t"), col("id"), col("n"),
                  lit(1L).as("__ph")))
                .withColumn("__rka", row_number().over(posW))
                .withColumn("__cph", sum(col("__ph")).over(posW
                  .rowsBetween(W.unboundedPreceding, W.currentRow)))
              val ranked2 = pos.where(col("__ph") === 0L)
                .select(col("t"), col("id").as("id_b"),
                  (col("__rka") - col("__cph")).as("__rk"))
              val live2 = pos.where(col("__ph") === 1L)
                .select(col("id").as("id_a"), col("t"),
                  (col("__rka") - col("__cph")).cast("long").as("__m"))
                .where(col("__m") > 0)
              def tag(dir: String, df: DataFrame): DataFrame =
                df.withColumn("t", concat(lit(dir), col("t")))
              (tag("1 ", live1).unionByName(tag("2 ", live2)),
                tag("1 ", ranked1).unionByName(tag("2 ", ranked2))
                  .localCheckpoint(true))
            }
            val loopStats =
              if (sys.props.contains("graft.debug.containment"))
                Some(new D.CursorLoopStats) else None
            val drops = D.cursorDrops(live, ranked, sets, minPpm,
              stats = loopStats)

            val newlyDropped = drops.select(col("__drop_id").as("id"))
              .distinct()
            val bIds = batch.select(col(idCol).as("id"))
            loopStats.foreach { ls =>
              val batchDrops = newlyDropped
                .join(bIds, Seq("id"), "left_semi").count()
              val retroDrops = newlyDropped
                .join(bIds, Seq("id"), "left_anti").count()
              foldStats = Some(FoldStats(bIds.count(), batchDrops,
                retroDrops, ls.rounds, ls.candidatePairs))
            }
            // pin the thin next-generation frames before releasing the
            // previous ones (the drop plan reads the old drop pin)
            val nextIds = idsSt.map(_.unionByName(bIds)).getOrElse(bIds)
              .localCheckpoint(true)
            val nextDrop = dropSt.map(_.unionByName(newlyDropped))
              .getOrElse(newlyDropped).localCheckpoint(true)
            Seq(idsSt, dropSt).foreach(_.foreach(releaseCheckpoint))
            idsSt = Some(nextIds); dropSt = Some(nextDrop)
            Seq(drops, ranked).foreach(L.release)
          } finally releaseCheckpoint(bPref)
        } finally releaseCheckpoint(bPost)
      } finally releaseCheckpoint(b)
    }

    /** Kept ids of everything ingested — shingle-less docs (no
      * signature) always keep, matching the one-shot's contract.
      * None before any batch. */
    def current: Option[DataFrame] = idsSt.map { ids =>
      ids.join(dropSt.get, Seq("id"), "left_anti")
    }

    def save(path: String): Unit = synchronized {
      requireSaved(idsSt.nonEmpty, "StreamingContainmentDedup")
      docsDl.get.saveTo(s"$path/docs")
      postDl.get.saveTo(s"$path/postings")
      prefDl.get.saveTo(s"$path/prefixes")
      saveFrame(idsSt.get, s"$path/ids")
      saveFrame(dropSt.get, s"$path/dropped")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(idsSt.isEmpty && docsDl.isEmpty,
        "StreamingContainmentDedup")
      val (docs, post, pref) = deltas(spark)
      docs.loadFrom(s"$path/docs")
      post.loadFrom(s"$path/postings")
      pref.loadFrom(s"$path/prefixes")
      idsSt = Some(loadFrame(spark, s"$path/ids"))
      dropSt = Some(loadFrame(spark, s"$path/dropped"))
    }

    def unpersist(): Unit = synchronized {
      Seq(idsSt, dropSt).foreach(_.foreach(releaseCheckpoint))
      idsSt = None; dropSt = None
      Seq(docsDl, postDl, prefDl).foreach(_.foreach(_.delete()))
      docsDl = None; postDl = None; prefDl = None
    }
  }

  /** Attach standing containment-dedup maintenance to a document
    * stream. */
  def maintainContainmentDedup(stream: DataFrame,
      dedup: StreamingContainmentDedup, checkpointDir: String)
      : StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        dedup.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Standing n-gram novelty over a document stream: the first-owner
    * shingle index ([[graft.pipeline.TextAnalysis.NoveltyIndex]])
    * folds per micro-batch (per-shingle min — associative), and each
    * batch is scored against the fold INCLUDING itself. With ascending
    * doc ids across batches, the accumulated outputs equal the
    * one-shot `ngramNovelty` over the concatenated stream
    * (`StreamingNoveltySpec`). Both corpus-sized frames are
    * log-structured [[DeltaFrame]] spools (the StreamingLineDedup
    * shape, round-17 verdict "missing" #3): the index spool holds
    * per-BATCH owner partials (per-shingle min is associative, so the
    * standing owner is the min over generations — and a batch's
    * scoring only needs owners for its OWN shingles, so the read-time
    * fold is semi-filtered to the batch's vocabulary before
    * aggregating); the outputs spool is a pure append. Each fold
    * writes ∝ batch instead of re-pinning the full standing index and
    * every score so far (the pre-round-18 shape — its fold wall grew
    * with the corpus). */
  final class StreamingNovelty(idCol: String, textCol: String,
      n: Int = 3, compactEvery: Int = 64,
      spoolDir: Option[String] = None) {
    @volatile private var idxDl: Option[DeltaFrame] = None
    @volatile private var outDl: Option[DeltaFrame] = None

    /** Live generation counts (index, outputs) — spec observability. */
    def generationCounts: Seq[Int] =
      Seq(idxDl, outDl).flatten.map(_.generationCount)

    /** Per-fold work attribution (`graft.debug.foldstats` turns the
      * counters on — they cost extra actions): batch docs, distinct
      * batch shingles (the appended index partial AND the semi-filter
      * vocabulary), and the standing owner rows the semi-join actually
      * surfaced — every fold cost term is ∝ one of these, never the
      * standing index size (ScaleProbe SCALE14 verifies walls against
      * them at sf1/sf10). */
    final case class NoveltyFoldStats(batchDocs: Long, batchShingles: Long,
        matchedOwners: Long, standingGens: Int)
    @volatile private var foldStats: Option[NoveltyFoldStats] = None
    def lastFoldStats: Option[NoveltyFoldStats] = foldStats

    def fold(batch: DataFrame): Unit = synchronized {
      val T = graft.pipeline.TextAnalysis
      if (idxDl.isEmpty) {
        idxDl = Some(new DeltaFrame(batch.sparkSession, "novelty-idx",
          compactEvery, spoolDir.map(d => s"$d/index")))
        outDl = Some(new DeltaFrame(batch.sparkSession, "novelty-out",
          compactEvery, spoolDir.map(d => s"$d/outputs")))
      }
      val b = T.buildNoveltyIndex(batch, col(idCol), col(textCol), n)
      // batch partial pinned once: it is both appended (parquet write)
      // and the semi-filter vocabulary below
      val bOwners = b.firstOwners.localCheckpoint(true)
      try {
        idxDl.get.append(bOwners)
        // standing owners for exactly this batch's shingles: min over
        // generations, semi-filtered BEFORE the aggregation so the
        // shuffle is ∝ batch matches, not the standing index — and the
        // just-appended partial makes the scored index "already
        // include the batch", the noveltyWithIndex contract. The
        // fixed-size batch-vocabulary bloom pre-reduces the standing
        // scan before the exact semi-join (see StreamingLineDedup —
        // same rationale, same output-identity argument).
        val nb = math.max(bOwners.count(), 1L)
        val standing = graft.pipeline.Joins.bloomReduce(idxDl.get.read,
          "sh", graft.pipeline.Joins.keyBloom(bOwners, "sh", nb, 0.01))
        val ownersNow = standing
          .join(bOwners.select(col("sh")), Seq("sh"), "left_semi")
          .groupBy(col("sh")).agg(min(col("first_doc")).as("first_doc"))
        val out = T.noveltyWithIndex(batch, col(idCol), col(textCol),
          T.NoveltyIndex(ownersNow), n)
        outDl.get.append(out)
        if (sys.props.contains("graft.debug.foldstats"))
          foldStats = Some(NoveltyFoldStats(batch.count(), nb,
            ownersNow.count(), idxDl.get.generationCount))
      } finally releaseCheckpoint(bOwners)
    }

    /** Accumulated per-batch novelty rows — backed by the delta spool,
      * valid until the next fold. None before any batch. */
    def current: Option[DataFrame] =
      outDl.filter(!_.isEmpty).map(_.read)

    def save(path: String): Unit = synchronized {
      requireSaved(idxDl.exists(!_.isEmpty), "StreamingNovelty")
      idxDl.get.saveTo(s"$path/index")
      outDl.get.saveTo(s"$path/outputs")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(idxDl.isEmpty && outDl.isEmpty, "StreamingNovelty")
      idxDl = Some(new DeltaFrame(spark, "novelty-idx",
        spoolDir = spoolDir.map(d => s"$d/index")))
      outDl = Some(new DeltaFrame(spark, "novelty-out",
        spoolDir = spoolDir.map(d => s"$d/outputs")))
      idxDl.get.loadFrom(s"$path/index")
      outDl.get.loadFrom(s"$path/outputs")
    }

    def unpersist(): Unit = synchronized {
      Seq(idxDl, outDl).foreach(_.foreach(_.delete()))
      idxDl = None; outDl = None
    }
  }

  /** Standing cross-document line dedup over a document stream — the
    * streaming form of [[graft.pipeline.Dedup.dedupLines]]: each
    * micro-batch folds its first-occurrence line index into the
    * standing one (per-line min of packed (doc, idx) keys —
    * associative), then rewrites ITSELF against the folded index.
    * With ascending doc ids a later batch can never take ownership
    * from an earlier one, so the accumulated rewrites equal the
    * one-shot `dedupLines` over everything ingested
    * (StreamingLineDedupSpec). Both corpus-sized frames are
    * log-structured [[DeltaFrame]] spools: the index spool holds
    * per-BATCH ownership partials (per-line min is associative, so the
    * standing owner of a hash is the min over generations — and a
    * batch's rewrite only needs owners for its OWN line hashes, so the
    * read-time fold is semi-filtered to the batch's vocabulary before
    * aggregating); the outputs spool is a pure append. Each fold
    * writes ∝ batch instead of re-pinning the full standing index and
    * every rewrite so far. */
  final class StreamingLineDedup(idCol: String, textCol: String,
      sep: String = "\n", compactEvery: Int = 64,
      spoolDir: Option[String] = None) {
    @volatile private var idxDl: Option[DeltaFrame] = None
    @volatile private var outDl: Option[DeltaFrame] = None

    /** Live generation counts (index, outputs) — spec observability. */
    def generationCounts: Seq[Int] =
      Seq(idxDl, outDl).flatten.map(_.generationCount)

    /** Per-fold work attribution (`graft.debug.foldstats` turns the
      * counters on): batch docs, distinct batch lines (the appended
      * index partial AND the semi-filter vocabulary), and the standing
      * owner rows the semi-join actually surfaced — every fold cost
      * term is ∝ one of these, never the standing index size
      * (ScaleProbe SCALE13 verifies walls against them at sf10). */
    final case class LineFoldStats(batchDocs: Long, batchLines: Long,
        matchedOwners: Long, standingGens: Int)
    @volatile private var foldStats: Option[LineFoldStats] = None
    def lastFoldStats: Option[LineFoldStats] = foldStats

    def fold(batch: DataFrame): Unit = synchronized {
      val D = graft.pipeline.Dedup
      if (idxDl.isEmpty) {
        idxDl = Some(new DeltaFrame(batch.sparkSession, "linededup-idx",
          compactEvery, spoolDir.map(d => s"$d/index")))
        outDl = Some(new DeltaFrame(batch.sparkSession, "linededup-out",
          compactEvery, spoolDir.map(d => s"$d/outputs")))
      }
      val b = D.buildLineIndex(batch, col(idCol), col(textCol), sep)
      // batch partial pinned once: it is both appended (parquet write)
      // and the semi-filter vocabulary below
      val bOwners = b.owners.localCheckpoint(true)
      try {
        idxDl.get.append(bOwners)
        // standing owners for exactly this batch's hashes: min over
        // generations, semi-filtered BEFORE the aggregation so the
        // shuffle is ∝ batch matches, not the standing index. A
        // fixed-size bloom over the batch vocabulary pre-reduces the
        // standing side BEFORE the exact semi-join (round-17 verdict
        // #5): when the batch vocabulary outgrows the broadcast
        // threshold the semi-join degrades to shuffling the WHOLE
        // standing index — the ~1 MB bloom always broadcasts and cuts
        // that to batch matches + fpp·standing. The sequential
        // parquet SCAN of the spool's two integer columns remains
        // ∝ standing by design (uniformly-hashed probes defeat any
        // min/max or bucket pruning); output is identical — the bloom
        // passes a superset and the semi-join stays exact.
        val nb = math.max(bOwners.count(), 1L)
        val standing = graft.pipeline.Joins.bloomReduce(idxDl.get.read,
          "line_hash",
          graft.pipeline.Joins.keyBloom(bOwners, "line_hash", nb, 0.01))
        val ownersNow = standing
          .join(bOwners.select(col("line_hash")), Seq("line_hash"),
            "left_semi")
          .groupBy(col("line_hash")).agg(min(col("owner_key"))
            .as("owner_key"))
        val out = D.dedupLinesWithIndex(batch, col(idCol), col(textCol),
          D.LineIndex(ownersNow), sep)
        outDl.get.append(out)
        if (sys.props.contains("graft.debug.foldstats"))
          foldStats = Some(LineFoldStats(batch.count(), nb,
            ownersNow.count(), idxDl.get.generationCount))
      } finally releaseCheckpoint(bOwners)
    }

    /** Accumulated rewrites — backed by the delta spool, valid until
      * the next fold. None before any batch. */
    def current: Option[DataFrame] =
      outDl.filter(!_.isEmpty).map(_.read)

    def save(path: String): Unit = synchronized {
      requireSaved(idxDl.exists(!_.isEmpty), "StreamingLineDedup")
      idxDl.get.saveTo(s"$path/index")
      outDl.get.saveTo(s"$path/outputs")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(idxDl.isEmpty && outDl.isEmpty, "StreamingLineDedup")
      idxDl = Some(new DeltaFrame(spark, "linededup-idx",
        spoolDir = spoolDir.map(d => s"$d/index")))
      outDl = Some(new DeltaFrame(spark, "linededup-out",
        spoolDir = spoolDir.map(d => s"$d/outputs")))
      idxDl.get.loadFrom(s"$path/index")
      outDl.get.loadFrom(s"$path/outputs")
    }

    def unpersist(): Unit = synchronized {
      Seq(idxDl, outDl).foreach(_.foreach(_.delete()))
      idxDl = None; outDl = None
    }
  }

  /** Standing conversion funnel over an event stream — the streaming
    * twin of [[graft.pipeline.Temporal.funnel]]: per-key matched step
    * times (t_1..t_k) fold per micro-batch. Under the batch funnel's
    * greedy earliest-completion rule each t_i is WRITE-ONCE given
    * ascending event time across batches (t_1 is the global earliest
    * step-1 event, so later batches can never lower it; by induction a
    * set t_i never moves because its predecessor never moves and later
    * events are never earlier) — so the fold is `t_i' = coalesce(t_i,
    * min batch step-i event ≥ t_{i−1}' within the deadline)`, computed
    * step-by-step so a single batch can complete several steps at
    * once. CONTRACT (ENFORCED, not merely documented, and PER KEY):
    * no timestamp may straddle a fold boundary WITHIN a key — each
    * batch's earliest event for a key must be STRICTLY later than
    * every previously folded event of that same key. Plain "ascending
    * event time" is not enough: if two equal-timestamp events of one
    * key split across batches (batch 1 = click@t, batch 2 = view@t),
    * the one-shot funnel can set t_2 = t while the fold never can
    * (batch-1 events are discarded before t_1 exists), so the
    * write-once induction genuinely requires strictly-greater
    * timestamps across folds — but only per key: funnels never read
    * across keys, so equal timestamps straddling a boundary in
    * DIFFERENT keys fold exactly (a real foreachBatch source splits
    * same-ms events across batches routinely, and rejecting those
    * would crash correctly-folding workloads). A same-key straddle
    * FAILS LOUDLY (the repo's contract-violation discipline) instead
    * of silently diverging from the one-shot; a late event older than
    * its key's fold boundary needs the reference's no-watermark
    * replay, not this fold. Enforcement is two-tier: a free global
    * scalar (batch min > previous global max ⇒ no key can straddle)
    * short-circuits the common strictly-ascending case; only batches
    * that overlap the global high-water mark pay a per-key
    * min-vs-standing-max anti-join check. With that contract the
    * standing state equals the one-shot [[graft.pipeline.Temporal
    * .funnel]] over everything ingested (StreamingFunnelSpec; the
    * `events_funnel_incremental` gate entry replays the one-shot
    * oracle against a two-batch fold). State: one row per key that
    * reached step 1 — |keys| × k longs, re-pinned per fold, superseded
    * generations released through Lineage. */
  final class StreamingFunnel(key: String, ts: String,
      steps: Seq[Column], windowMs: Option[Long] = None) {
    require(steps.nonEmpty, "need at least one funnel step")
    @volatile private var state: Option[DataFrame] = None
    // global high-water mark of folded event time (ms) — the FAST-PATH
    // fold boundary: a batch starting strictly after it cannot
    // straddle any key's boundary, so the per-key check is skipped
    @volatile private var maxSeenMs: Option[Long] = None
    // per-key high-water marks (__k, __wm) over ALL folded events —
    // consulted only when a batch overlaps the global mark, to reject
    // exactly the same-key straddles (different-key overlap is fine).
    // O(keys seen) standing rows, the same order as the funnel state.
    @volatile private var keyWm: Option[DataFrame] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val n = steps.length
      val tsMs =
        floor(graft.pipeline.Temporal.tsUs(batch, ts) / 1000L)
          .cast("long")
      // pinned: the batch slice is scanned once per step below
      val b = batch.select(col(key).as("__k"), tsMs.as("__ts"),
        struct(steps.zipWithIndex.map { case (s, i) =>
          s.as(s"s$i") }: _*).as("__p"))
        .localCheckpoint(true)
      try {
      // contract check: one bounded 2-long aggregate per fold. A
      // same-key timestamp straddling the boundary would break the
      // write-once induction (see class doc), so reject it loudly —
      // but only when the cheap global test cannot rule it out.
      val mm = b.agg(min(col("__ts")).as("lo"), max(col("__ts")).as("hi"))
        .head()
      val perKey = b.groupBy(col("__k"))
        .agg(min(col("__ts")).as("__blo"), max(col("__ts")).as("__bhi"))
      if (!mm.isNullAt(0)) {
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        if (maxSeenMs.exists(lo <= _)) keyWm.foreach { wm =>
          // slow path: batch overlaps the global mark — straddle iff
          // some KEY's batch-min is not strictly after that key's
          // standing max (different-key overlap folds exactly)
          val viol = perKey.join(wm, "__k")
            .where(col("__blo") <= col("__wm"))
            .select(col("__k"), col("__blo"), col("__wm")).head(1)
          require(viol.isEmpty, {
            val v = viol.head
            s"StreamingFunnel fold-boundary violation: key " +
              s"${v.get(0)}'s batch min event time ${v.getLong(1)} ms " +
              s"is not strictly after that key's previously folded " +
              s"max ${v.getLong(2)} ms — no timestamp may straddle a " +
              s"fold boundary within a key (same-key equal-timestamp " +
              s"events split across batches diverge from the one-shot " +
              s"funnel); buffer a key's same-time events into one " +
              s"batch or replay from storage"
          })
        }
        maxSeenMs = Some(math.max(hi, maxSeenMs.getOrElse(Long.MinValue)))
      }
      // merge the batch's per-key maxima into the standing watermark
      val wm1 = keyWm match {
        case Some(wm) => wm.join(perKey.select(col("__k"),
            col("__bhi")), Seq("__k"), "full_outer")
          .select(col("__k"),
            greatest(coalesce(col("__wm"), lit(Long.MinValue)),
              coalesce(col("__bhi"), lit(Long.MinValue))).as("__wm"))
        case None => perKey.select(col("__k"), col("__bhi").as("__wm"))
      }
      val wmPinned = wm1.localCheckpoint(true)
      keyWm.foreach(releaseCheckpoint)
      keyWm = Some(wmPinned)
      val s0 = state.getOrElse(
        b.select(col("__k") +:
          (1 to n).map(i => lit(null).cast("long").as(s"t_$i")): _*)
          .where(lit(false)))
      // step 1: earliest batch match fills a still-null t_1
      val m1 = b.where(col("__p.s0")).groupBy(col("__k"))
        .agg(min(col("__ts")).as("m_1"))
      var acc = s0.join(m1, Seq("__k"), "full_outer")
        .select(col("__k") +: coalesce(col("t_1"), col("m_1")).as("t_1") +:
          (2 to n).map(i => col(s"t_$i")): _*)
      for (i <- 2 to n) {
        val deadline = windowMs match {
          case Some(w) => col("__ts") <= col("t_1") + w
          case None    => lit(true)
        }
        val need = Seq("t_1", s"t_${i - 1}").distinct.map(col)
        val mi = b.where(col(s"__p.s${i - 1}"))
          .join(acc.select(col("__k") +: need: _*), "__k")
          .where(col(s"t_${i - 1}").isNotNull &&
            col("__ts") >= col(s"t_${i - 1}") && deadline)
          .groupBy(col("__k")).agg(min(col("__ts")).as(s"m_$i"))
        acc = acc.join(mi, Seq("__k"), "left_outer")
          .select(col("__k") +: (1 to n).map(j =>
            if (j == i) coalesce(col(s"t_$j"), col(s"m_$j")).as(s"t_$j")
            else col(s"t_$j")): _*)
      }
      val pinned = acc.localCheckpoint(true)
      state.foreach(releaseCheckpoint)
      state = Some(pinned)
      // a rejected batch (fold-boundary require) or any mid-fold
      // failure must not leave the batch pin alive — release is
      // idempotent, so the success path shares the finally
      } finally releaseCheckpoint(b)
    }

    /** Standing per-key funnel in the one-shot output shape
      * (key, steps_completed, t_1..t_k, elapsed_ms); None before any
      * batch. */
    def current: Option[DataFrame] = state.map { st =>
      val tCols = (1 to steps.length).map(i => col(s"t_$i"))
      val completed = tCols.map(c =>
        when(c.isNotNull, 1L).otherwise(0L)).reduce(_ + _)
      val lastReached = coalesce(tCols.reverse: _*)
      st.select(col("__k").as(key) +:
        completed.as("steps_completed") +:
        tCols :+
        (lastReached - col("t_1")).as("elapsed_ms"): _*)
    }

    def save(path: String): Unit = synchronized {
      requireSaved(state.nonEmpty, "StreamingFunnel")
      saveFrame(state.get, s"$path/state")
      // the enforced fold-boundary watermarks travel with the state —
      // a restore that forgot them would accept a boundary-straddling
      // batch the saved instance would have rejected
      val spark = state.get.sparkSession
      import spark.implicits._
      saveFrame(maxSeenMs.toSeq.toDF("max_ms"), s"$path/watermark")
      keyWm.foreach(wm => saveFrame(wm, s"$path/wmkeys"))
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(state.isEmpty && maxSeenMs.isEmpty, "StreamingFunnel")
      val st = loadFrame(spark, s"$path/state")
      val want = "__k" +: (1 to steps.length).map(i => s"t_$i")
      require(st.columns.toSeq == want,
        s"saved funnel state columns ${st.columns.mkString(",")} do " +
          s"not match this instance's ${steps.length} steps")
      state = Some(st)
      maxSeenMs = spark.read.parquet(s"$path/watermark")
        .collect().headOption.map(_.getLong(0))
      keyWm = Some(loadFrame(spark, s"$path/wmkeys"))
    }

    def unpersist(): Unit = synchronized {
      state.foreach(releaseCheckpoint); state = None; maxSeenMs = None
      keyWm.foreach(releaseCheckpoint); keyWm = None
    }
  }

  /** Attach funnel maintenance to an event stream. */
  def maintainFunnel(stream: DataFrame, funnel: StreamingFunnel,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        funnel.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Attach line-dedup maintenance to a document stream. */
  def maintainLineDedup(stream: DataFrame, dedup: StreamingLineDedup,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        dedup.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Attach novelty maintenance to a document stream. */
  def maintainNovelty(stream: DataFrame, novelty: StreamingNovelty,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        novelty.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Attach quota-sample maintenance to a streaming DataFrame. */
  /** Wire a [[StreamingCube]] to a stream via foreachBatch — same
    * shape as [[maintainSketches]]. */
  def maintainCube(stream: DataFrame, cube: StreamingCube,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        cube.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  def maintainQuotaSample(stream: DataFrame,
      sample: StreamingQuotaSample, checkpointDir: String)
      : StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sample.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Attach sketch maintenance to a streaming DataFrame: one
    * `foreachBatch` folding each micro-batch into `sketches`. The
    * stream carries the raw rows; the fold is the only aggregation. */
  def maintainSketches(stream: DataFrame, sketches: StreamingSketches,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sketches.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Standing boilerplate dictionary over a document stream: each
    * micro-batch's (group, line, df) counts fold into the standing
    * table (per-(group, line) counts are additive when batches carry
    * disjoint documents — the append contract every standing index
    * here shares). The dictionary is a log-structured [[DeltaFrame]]
    * spool of per-BATCH count partials (the StreamingBm25 counts
    * shape, round-17 verdict "missing" #3): a fold writes ONLY the
    * batch's partial (cost ∝ batch), and [[current]] folds the
    * generations lazily with one keyed sum (cost ∝ dictionary, paid by
    * the READER that needs the whole table — same contract as
    * StreamingBm25's postings). The pre-round-18 shape re-aggregated
    * and re-pinned the full dictionary every fold.
    * `StreamingBoilerplateSpec` asserts streaming-folded ≡ one-shot
    * batch counts on the concatenated stream. */
  final class StreamingBoilerplate(idCol: String, textCol: String,
      groupCol: String, lineTokens: Int = 2, compactEvery: Int = 64,
      spoolDir: Option[String] = None) {
    @volatile private var cntDl: Option[DeltaFrame] = None

    /** Live dictionary-spool generation count (spec observability). */
    def generationCount: Int = cntDl.map(_.generationCount).getOrElse(0)

    /** Per-fold work attribution (`graft.debug.foldstats` turns the
      * counters on): batch docs and the batch partial's (group, line)
      * rows — both fold cost terms are ∝ one of these, never the
      * standing dictionary size (ScaleProbe SCALE15 verifies walls
      * against them at sf1/sf10). */
    final case class BoilerFoldStats(batchDocs: Long, batchLines: Long,
        standingGens: Int)
    @volatile private var foldStats: Option[BoilerFoldStats] = None
    def lastFoldStats: Option[BoilerFoldStats] = foldStats

    def fold(batch: DataFrame): Unit = synchronized {
      val b = graft.pipeline.TextAnalysis.boilerplateCounts(batch,
        col(idCol), col(textCol), col(groupCol), lineTokens)
      if (cntDl.isEmpty)
        cntDl = Some(new DeltaFrame(batch.sparkSession, "boiler-cnt",
          compactEvery, spoolDir.map(d => s"$d/counts")))
      cntDl.get.append(b)
      if (sys.props.contains("graft.debug.foldstats"))
        foldStats = Some(BoilerFoldStats(batch.count(), b.count(),
          cntDl.get.generationCount))
    }

    /** The folded standing dictionary (grp, line_text, line_df) —
      * computed lazily over the spool's generations, valid until the
      * next fold. None before any batch. */
    def current: Option[DataFrame] =
      cntDl.filter(!_.isEmpty).map(_.read
        .groupBy(col("grp"), col("line_text"))
        .agg(sum(col("line_df")).as("line_df")))

    def save(path: String): Unit = synchronized {
      requireSaved(cntDl.exists(!_.isEmpty), "StreamingBoilerplate")
      cntDl.get.saveTo(s"$path/state")
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(cntDl.isEmpty, "StreamingBoilerplate")
      cntDl = Some(new DeltaFrame(spark, "boiler-cnt",
        spoolDir = spoolDir.map(d => s"$d/counts")))
      cntDl.get.loadFrom(s"$path/state")
    }

    def unpersist(): Unit = synchronized {
      cntDl.foreach(_.delete()); cntDl = None
    }
  }

  /** Attach boilerplate-dictionary maintenance to a document stream. */
  def maintainBoilerplate(stream: DataFrame,
      dict: StreamingBoilerplate, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        dict.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** Standing CDC chunk index over a document stream: each micro-batch
    * deduplicates against the index folded over EVERYTHING SEEN SO FAR
    * (including itself — a batch's internal duplicates dedup too), and
    * the per-batch outputs accumulate. With ascending doc ids across
    * batches, the accumulated output equals the one-shot
    * `cdcDeduplicate` over the concatenated stream
    * (`StreamingChunkDedupSpec`). min-fold is associative, so the
    * index needs no disjointness assumption at all. */
  final class StreamingChunkDedup(idCol: String, textCol: String) {
    @volatile private var index
        : Option[graft.pipeline.TextAnalysis.ChunkIndex] = None
    @volatile private var outputs: Option[DataFrame] = None

    def fold(batch: DataFrame): Unit = synchronized {
      val T = graft.pipeline.TextAnalysis
      val b = T.buildChunkIndex(batch, col(idCol), col(textCol))
      val folded = index match {
        case None     => b
        case Some(i0) => T.foldChunkIndex(i0, b)
      }
      val pinned = T.ChunkIndex(folded.firsts.localCheckpoint(true))
      index.foreach(i => releaseCheckpoint(i.firsts))
      index = Some(pinned)
      val out = T.cdcDeduplicateWithIndex(batch, col(idCol),
        col(textCol), pinned)
      // re-pin the ACCUMULATED frame each fold (not just the batch):
      // a union of N checkpointed frames still carries N plan leaves,
      // so an always-on stream would grow planning cost linearly
      val acc = (outputs match {
        case None     => out
        case Some(o0) => o0.unionByName(out)
      }).localCheckpoint(true)
      outputs.foreach(releaseCheckpoint)
      outputs = Some(acc)
    }

    def current: Option[DataFrame] = outputs

    def save(path: String): Unit = synchronized {
      requireSaved(index.nonEmpty, "StreamingChunkDedup")
      saveFrame(index.get.firsts, s"$path/index")
      outputs.foreach(o => saveFrame(o, s"$path/outputs"))
    }

    def restore(spark: SparkSession, path: String): Unit = synchronized {
      requireFresh(index.isEmpty && outputs.isEmpty, "StreamingChunkDedup")
      index = Some(graft.pipeline.TextAnalysis.ChunkIndex(
        loadFrame(spark, s"$path/index")))
      outputs = Some(loadFrame(spark, s"$path/outputs"))
    }

    def unpersist(): Unit = synchronized {
      index.foreach(i => releaseCheckpoint(i.firsts)); index = None
      // the accumulated outputs frame is localCheckpoint'd per fold —
      // release its blocks too, or a standing session leaks them
      outputs.foreach(releaseCheckpoint); outputs = None
    }
  }

  /** Attach chunk-level dedup to a document stream. */
  def maintainChunkDedup(stream: DataFrame, dedup: StreamingChunkDedup,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        dedup.fold(batch.toDF())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  // ---- stateful comparator as flatMapGroupsWithState -----------------

  /** One keyed observation: (key, ts, live value, historical value). */
  final case class Observation(key: String, timestamp: Long,
      liveValue: Double, histValue: Double)

  /** Emitted trigger row. */
  final case class Anomaly(key: String, timestamp: Long, trigger: String,
      detail: Double)

  /** Serializable per-key state: the two bounded deques. */
  final case class ComparatorState(
      live: Seq[(Double, Double)], hist: Seq[(Double, Double)])

  /** §2.6 across a keyed stream: per-key bounded live/hist windows in
    * Spark state storage, six triggers evaluated on every update batch.
    * Works identically on a static Dataset (batch backfill) and a
    * streaming one. */
  def comparatorStream(obs: Dataset[Observation],
      config: ComparatorConfig = ComparatorConfig()): Dataset[Anomaly] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[ComparatorState, Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[ComparatorState]) =>
          val prev = state.getOption.getOrElse(ComparatorState(Nil, Nil))
          // rebuild the exact comparator from persisted deques
          val comparator = new StatefulComparator(config)
          prev.live.zip(prev.hist).foreach { case ((ts, lv), (_, hv)) =>
            comparator.updateAndCompare(ts, lv, hv)
          }
          var liveDeque = prev.live
          var histDeque = prev.hist
          val out = rows.toSeq.sortBy(_.timestamp).flatMap { o =>
            liveDeque = (liveDeque :+ (o.timestamp.toDouble, o.liveValue))
              .takeRight(config.windowSize)
            histDeque = (histDeque :+ (o.timestamp.toDouble, o.histValue))
              .takeRight(config.windowSize)
            comparator.updateAndCompare(o.timestamp.toDouble, o.liveValue,
              o.histValue).map(toAnomaly(key, o.timestamp, _))
          }
          state.update(ComparatorState(liveDeque, histDeque))
          out.iterator
      }
  }

  private def toAnomaly(key: String, ts: Long, r: ComparisonResult)
      : Anomaly = r match {
    case ComparisonResult.AbsoluteThresholdExceeded(d) =>
      Anomaly(key, ts, "absolute_threshold_exceeded", d)
    case ComparisonResult.RelativeDropDetected(d) =>
      Anomaly(key, ts, "relative_drop_detected", d)
    case ComparisonResult.CatchUpTriggered(d) =>
      Anomaly(key, ts, "catch_up_triggered", d)
    case ComparisonResult.TrendDivergence(l, _) =>
      Anomaly(key, ts, "trend_divergence", l)
    case ComparisonResult.VolatilityIncrease(l, _) =>
      Anomaly(key, ts, "volatility_increase", l)
    case ComparisonResult.LiveOutlierDetected(_, z) =>
      Anomaly(key, ts, "live_outlier_detected", z)
  }
}
