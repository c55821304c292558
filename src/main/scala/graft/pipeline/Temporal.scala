package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampNTZType,
  TimestampType}

/** Temporal join + sessionization operators.
  *
  * The curation counterpart of the engine's window operators: aligning a
  * fact stream against the most recent state of another stream (as-of
  * join — "what was the last click before this purchase?"), banded
  * event-time joins (range join — "all clicks within ±1h of a
  * purchase"), and gap-based sessionization (the standard unit of web
  * behaviour data). All three are shaped for the 100 TB case: one
  * key-hash shuffle each, no per-key nested loop, no driver state.
  *
  * Timestamps are compared in epoch microseconds (`unix_micros`), so
  * the semantics are timezone-free and identical on any engine.
  */
object Temporal {

  /** Event-time column → epoch MICROSECONDS, tolerant of every shape the
    * driver's tables have shipped: TIMESTAMP, TIMESTAMP_NTZ (naive value
    * reinterpreted as UTC, session-zone-free — see
    * [[graft.expressions.native.ntzEpochMicros]]), or an already-numeric
    * epoch-milliseconds column (the repo's `ts_ms` convention). */
  private[graft] def tsUs(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case TimestampType    => unix_micros(col(name))
      case TimestampNTZType => graft.expressions.native.ntzEpochMicros(col(name))
      case _: NumericType   => col(name).cast("long") * 1000L
      case other => throw new IllegalArgumentException(
        s"$name: expected timestamp or epoch-ms numeric, got $other")
    }

  /** Backward as-of join: for every left row, the single most recent
    * right row with the same key and `rightTs <= leftTs` (optionally
    * within `toleranceMs`). Left rows with no admissible right row keep
    * nulls (left-outer semantics).
    *
    * Plan shape — the classic scalable formulation, NOT a per-key
    * nested loop: tag both sides, union, then ONE window over
    * (key, ts, side, tieBreak) and `last(payload, ignoreNulls)`. Cost
    * is a single hash-partition shuffle on the key plus an in-partition
    * sort: O(n log n) rows touched once, no join explosion, no driver
    * involvement. At 100 TB the key (user/entity) cardinality vastly
    * exceeds core count, so per-key serialization is immaterial; a
    * single degenerate hot key is the caller's signal to pre-aggregate
    * that key, not a property of this plan.
    *
    * Ties: right rows at `rightTs == leftTs` ARE admissible (inclusive
    * bound) and sort before the left row; among right rows with equal
    * ts the one with the greatest `rightTieBreak` wins. Deterministic
    * under any partitioning.
    *
    * @param rightPayload right-side columns to carry (joined output is
    *        `left.* ++ rightPayload` with an `asof_gap_ms` column)
    * @param rightTieBreak a right column with no (key, ts)-duplicates
    *        (an id); greatest value wins equal-ts ties
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      rightTieBreak: String, toleranceMs: Option[Long] = None): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, rightPayload,
      rightTieBreak, toleranceMs, forward = false)

  /** Forward as-of join: for every left row, the single EARLIEST right
    * row with the same key and `rightTs >= leftTs` (optionally within
    * `toleranceMs`) — "what is the next reading after this event?".
    * The exact mirror of [[asOfJoin]] (same one-shuffle union + single
    * window plan, same greatest-`rightTieBreak` rule on equal-ts
    * ties); `asof_gap_ms` is `rightTs - leftTs >= 0`. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      rightTieBreak: String, toleranceMs: Option[Long] = None): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, rightPayload,
      rightTieBreak, toleranceMs, forward = true)

  /** Nearest as-of join: for every left row, the single right row with
    * the same key whose timestamp is CLOSEST in either direction
    * (optionally within `toleranceMs`); exact ties between the previous
    * and next candidate resolve BACKWARD (the reading already known at
    * event time). Emits `left.* ++ rightPayload ++ (asof_gap_ms,
    * asof_dir)` — gap is the absolute distance floored to ms, dir is
    * 'backward'/'forward'/null. Nearest-vs and tolerance comparisons
    * run at full MICROSECOND resolution (only the reported gap rounds);
    * with true sub-ms timestamps the closer side wins even inside one
    * millisecond, and tolerance never admits past the exact bound.
    *
    * Plan shape: the same single key-hash shuffle as [[asOfJoin]] —
    * one union, then BOTH directional matches come from two window
    * passes over the same partitioning (one exchange, two sorts); no
    * join operator, no per-key explosion on hot keys. */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      rightTieBreak: String, toleranceMs: Option[Long] = None)
      : DataFrame = {
    right.schema(rightTieBreak).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"asOfJoinNearest rightTieBreak '$rightTieBreak' must be " +
          s"numeric (deterministic long ordering), got $other")
    }
    val leftCols = left.columns.toSeq
    val rUs = tsUs(right, rightTs)
    val payloadStruct = struct(
      rUs.cast("long").as("__rts_us") +:
        rightPayload.map(c => col(c).as(c)): _*)
    val r2 = right.select(
      col(key).as("__k"),
      rUs.as("__ts_us"),
      lit(0).as("__side"),
      col(rightTieBreak).cast("long").as("__tb"),
      payloadStruct.as("__r"))
    val rStructType = r2.schema("__r").dataType
    val l2 = left.select(
      col(key).as("__k"),
      tsUs(left, leftTs).as("__ts_us"),
      lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(rStructType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    val unioned = r2
      .withColumn("__l", lit(null).cast(l2.schema("__l").dataType))
      .unionByName(l2)
    val wBack = Window.partitionBy("__k")
      .orderBy(col("__ts_us").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy("__k")
      .orderBy(col("__ts_us").desc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBoth = unioned
      .withColumn("__p", last(col("__r"), ignoreNulls = true).over(wBack))
      .withColumn("__n", last(col("__r"), ignoreNulls = true).over(wFwd))
      .where(col("__side") === 1)
    // nearest/tolerance decisions run at FULL microsecond resolution
    // (a forward match closer by µs must beat a backward match in the
    // same millisecond, and tolerance must not admit up to 999 µs past
    // the bound); only the REPORTED gap floors to ms, the oracle's
    // granularity — identical on whole-ms inputs either way
    val gb = col("__ts_us") - col("__p.__rts_us")
    val gf = col("__n.__rts_us") - col("__ts_us")
    def admissible(m: Column, gapUs: Column): Column = toleranceMs match {
      case Some(tol) => m.isNotNull && gapUs <= lit(tol * 1000L)
      case None      => m.isNotNull
    }
    val okB = admissible(col("__p"), gb)
    val okF = admissible(col("__n"), gf)
    // ties resolve backward: the reading already known at event time
    val useB = okB && (!okF || gb <= gf)
    val useF = okF && !useB
    val m = when(useB, col("__p")).when(useF, col("__n"))
    withBoth.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => m.getField(c).as(c)) :+
        floor(when(useB, gb).when(useF, gf) / 1000L).cast("long")
          .as("asof_gap_ms") :+
        when(useB, lit("backward")).when(useF, lit("forward"))
          .as("asof_dir"): _*)
  }

  private def asOfImpl(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      rightTieBreak: String, toleranceMs: Option[Long],
      forward: Boolean): DataFrame = {
    // the tiebreak is cast to long for the window ordering — a
    // non-numeric column would silently become null and make equal-ts
    // tie resolution nondeterministic; fail loudly instead
    right.schema(rightTieBreak).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"asOfJoin rightTieBreak '$rightTieBreak' must be numeric " +
          s"(deterministic long ordering), got $other")
    }
    val leftCols = left.columns.toSeq
    val rUs = tsUs(right, rightTs)
    val payloadStruct = struct(
      rUs.cast("long").as("__rts_us") +:
        rightPayload.map(c => col(c).as(c)): _*)
    val r2 = right.select(
      col(key).as("__k"),
      rUs.as("__ts_us"),
      lit(0).as("__side"),
      col(rightTieBreak).cast("long").as("__tb"),
      payloadStruct.as("__r"))
    val rStructType = r2.schema("__r").dataType
    val l2 = left.select(
      col(key).as("__k"),
      tsUs(left, leftTs).as("__ts_us"),
      lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(rStructType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    val unioned = r2
      .withColumn("__l", lit(null).cast(l2.schema("__l").dataType))
      .unionByName(l2)

    val tsOrd = if (forward) col("__ts_us").desc else col("__ts_us").asc
    val w = Window.partitionBy("__k")
      .orderBy(tsOrd, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)

    val withMatch = unioned
      .withColumn("__m", matchedRaw)
      .where(col("__side") === 1)
    // tolerance admits at FULL microsecond resolution (the nearest
    // variant's discipline — never up to 999 µs past the bound); the
    // reported gap floors to ms, identical on whole-ms inputs
    val gapUs = if (forward) col("__m.__rts_us") - col("__ts_us")
      else col("__ts_us") - col("__m.__rts_us")
    val admissible = toleranceMs match {
      case Some(tol) => col("__m").isNotNull && gapUs <= lit(tol * 1000L)
      case None      => col("__m").isNotNull
    }
    val m = when(admissible, col("__m"))
    withMatch.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => m.getField(c).as(c)) :+
        when(admissible, floor(gapUs / 1000L).cast("long"))
          .as("asof_gap_ms"): _*)
  }

  /** Banded event-time range join: all (left, right) pairs with equal
    * key and `rightTs` within `[leftTs - beforeMs, leftTs + afterMs]`
    * (both bounds inclusive). Emits `left.* ++ rightPayload`, one row
    * per admissible pair.
    *
    * Plan shape — time-bucketed band join, not equi-join-then-filter:
    * with bucket width W = beforeMs + afterMs, each RIGHT row lands in
    * exactly one `(key, floor(ts/W))` bucket while each left row's
    * admissible band spans at most two consecutive buckets, so the left
    * side explodes to ≤ 2 rows and the join is a pure equi-join on
    * `(key, bucket)` with the exact band check as a post-filter. No
    * pair is produced twice (a right row exists in one bucket only), so
    * no dedup pass. Shuffle cost: 2·|left| + |right| rows hashed on
    * (key, bucket) — survives 100× scale-up wherever the output does,
    * and AQE splits any skewed bucket. A same-key equi-join with a
    * range residual would instead sort-merge ALL same-key pairs:
    * O(|key group|²) on hot keys.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      beforeMs: Long, afterMs: Long): DataFrame = {
    require(beforeMs >= 0 && afterMs >= 0 && beforeMs + afterMs > 0,
      "band must be non-empty and non-negative")
    val wUs = (beforeMs + afterMs) * 1000L
    val leftCols = left.columns.toSeq

    val l2 = left
      .withColumn("__lts_us", tsUs(left, leftTs))
      .withColumn("__b0", floor((col("__lts_us") - lit(beforeMs * 1000L)) /
        lit(wUs)))
      .withColumn("__b1", floor((col("__lts_us") + lit(afterMs * 1000L)) /
        lit(wUs)))
      .withColumn("__bucket",
        explode(array_distinct(array(col("__b0"), col("__b1")))))
    val r2 = right.select(
      Seq(col(key).as("__rk"),
        tsUs(right, rightTs).as("__rts_us"),
        floor(tsUs(right, rightTs) / lit(wUs)).as("__rbucket")) ++
        rightPayload.map(c => col(c).as(s"__p_$c")): _*)

    l2.join(r2,
        col(key) === col("__rk") && col("__bucket") === col("__rbucket") &&
          col("__rts_us") >= col("__lts_us") - lit(beforeMs * 1000L) &&
          col("__rts_us") <= col("__lts_us") + lit(afterMs * 1000L))
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__p_$c").as(c)): _*)
  }

  /** General interval-overlap join: every (left, right) pair with the
    * same key whose CLOSED intervals `[leftStart, leftEnd]` and
    * `[rightStart, rightEnd]` intersect (`ls <= re AND rs <= le`, all
    * epoch ms). Emits `left.* ++ rightPayload ++ overlap_ms` where
    * `overlap_ms = min(le, re) - max(ls, rs)` (0 for point-touching
    * intervals).
    *
    * Plan shape — grid partitioning, the textbook distributed interval
    * join: with bucket width W = `bucketMs`, each interval replicates to
    * every bucket its span covers (`floor(s/W) .. floor(e/W)`), the join
    * is a pure equi-join on `(key, bucket)` with the exact overlap check
    * as a post-filter, and each overlapping pair is emitted EXACTLY once
    * — only from the bucket `max(floor(ls/W), floor(rs/W))`, the first
    * bucket both intervals inhabit (no `distinct` dedup pass, which
    * would be a second full shuffle of the output). Replication factor
    * is `len/W + 1` per row, bounded because interval length is bounded:
    * the operator enforces `maxLenMs` with a codegen'd `raise_error`
    * (fail-loud beats silently missing pairs). Shuffle cost is
    * O(|input| · (maxLen/W + 1)) rows hashed on (key, bucket); a
    * same-key equi-join with the overlap residual would instead
    * sort-merge ALL same-key pairs — O(|key group|²) on hot keys. AQE
    * splits any still-skewed bucket at runtime.
    *
    * Reference behaviour anchor: the engine's sliding-window content
    * test "does event e fall inside window w" (reference
    * `src/stream/operators/historical_sliding_window.rs`) is the
    * degenerate point-vs-interval case of this operator.
    *
    * @param bucketMs grid width W; choose ≈ the typical interval length
    *        (smaller W = more replicas, larger W = more post-filtered
    *        non-pairs)
    * @param maxLenMs fail-loud upper bound on interval length, caps the
    *        replication factor at maxLenMs/bucketMs + 1
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      rightPayload: Seq[String], bucketMs: Long,
      maxLenMs: Long): DataFrame = {
    require(bucketMs > 0 && maxLenMs >= 0, "need bucketMs > 0, maxLenMs >= 0")
    val wUs = bucketMs * 1000L
    val maxUs = maxLenMs * 1000L
    val leftCols = left.columns.toSeq

    def buckets(df: DataFrame, s: String, e: String): (Column, Column, Column) = {
      val sUs = tsUs(df, s)
      val eUs = tsUs(df, e)
      val guarded = when(eUs < sUs || eUs - sUs > maxUs,
        raise_error(concat(lit(s"intervalJoin: $s..$e outside [0, ${maxLenMs}ms]: "),
          sUs.cast("string"), lit(".."), eUs.cast("string"))))
        .otherwise(eUs)
      (sUs, guarded, explode(sequence(floor(sUs / wUs), floor(guarded / wUs))))
    }

    val (lsUs, leUs, lBucket) = buckets(left, leftStart, leftEnd)
    val l2 = left
      .withColumn("__ls_us", lsUs)
      .withColumn("__le_us", leUs)
      .withColumn("__bucket", lBucket)
    val (rsUs, reUs, rBucket) = buckets(right, rightStart, rightEnd)
    val r2 = right.select(
      Seq(col(key).as("__rk"), rsUs.as("__rs_us"), reUs.as("__re_us"),
        rBucket.as("__rbucket")) ++
        rightPayload.map(c => col(c).as(s"__p_$c")): _*)

    l2.join(r2,
        col(key) === col("__rk") && col("__bucket") === col("__rbucket") &&
          col("__ls_us") <= col("__re_us") &&
          col("__rs_us") <= col("__le_us") &&
          col("__bucket") === greatest(floor(col("__ls_us") / wUs),
            floor(col("__rs_us") / wUs)))
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__p_$c").as(c)) :+
        (floor(least(col("__le_us"), col("__re_us")) / 1000L) -
          floor(greatest(col("__ls_us"), col("__rs_us")) / 1000L))
          .cast("long").as("overlap_ms"): _*)
  }

  /** Standing incremental form of [[intervalJoin]] — the symmetric
    * hash join: each tick ingests one batch per side, joins the new
    * left against everything right seen so far and the PREVIOUS
    * standing left against the new right, so every overlapping pair is
    * emitted exactly once (a pair meets when its LATER side arrives;
    * same-tick pairs ride the first term). The union of all tick
    * outputs equals the one-shot [[intervalJoin]] of the unioned
    * inputs for ANY batch interleaving — the merge law the
    * `interval_join_incremental` gate entry and
    * [[graft.pipeline.IntervalJoinSpec]] pin against the one-shot
    * oracle.
    *
    * State discipline: standing sides are eagerly checkpointed per
    * tick and the superseded generation released
    * ([[graft.util.Lineage]] — `Dataset.unpersist` alone would leak
    * the checkpoint blocks). Growth is bounded by [[evict]]: once the
    * caller guarantees no future interval STARTS before watermark W,
    * any standing interval ENDING before W can never pair again and is
    * dropped — the same watermark contract as Structured Streaming's
    * stream-stream join. */
  final class IncrementalIntervalJoin(key: String,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      rightPayload: Seq[String], bucketMs: Long, maxLenMs: Long) {

    private var leftState: Option[DataFrame] = None
    private var rightState: Option[DataFrame] = None

    private def fold(cur: Option[DataFrame], batch: DataFrame)
        : DataFrame = {
      val next = cur match {
        case Some(st) => st.unionByName(batch).localCheckpoint(true)
        case None     => batch.localCheckpoint(true)
      }
      cur.foreach(graft.util.Lineage.release)
      next
    }

    /** One tick: new pairs involving at least one row of this tick's
      * batches. Either batch may be empty (`limit(0)` slices are
      * fine); both must keep their side's schema. The returned frame
      * is MATERIALIZED (its blocks are the caller's to release via
      * [[graft.util.Lineage.release]] once consumed) — it must not
      * depend on the superseded state generation this tick retires. */
    def ingest(leftBatch: DataFrame, rightBatch: DataFrame): DataFrame = {
      val allRight = rightState match {
        case Some(st) => st.unionByName(rightBatch)
        case None     => rightBatch
      }
      val newVsRight = intervalJoin(leftBatch, allRight, key,
        leftStart, leftEnd, rightStart, rightEnd, rightPayload,
        bucketMs, maxLenMs)
      val oldVsNew = leftState match {
        case Some(st) => intervalJoin(st, rightBatch, key,
          leftStart, leftEnd, rightStart, rightEnd, rightPayload,
          bucketMs, maxLenMs)
        case None => newVsRight.limit(0)
      }
      // materialize BEFORE the fold below releases the state these
      // joins read — a lazy result would recompute through freed
      // checkpoint blocks
      val out = newVsRight.unionByName(oldVsNew).localCheckpoint(true)
      leftState = Some(fold(leftState, leftBatch))
      rightState = Some(fold(rightState, rightBatch))
      out
    }

    /** Drop standing intervals that can never pair again under the
      * caller's watermark promise (no future interval starts before
      * `watermarkMs`). */
    def evict(watermarkMs: Long): Unit = {
      def trim(st: Option[DataFrame], end: String): Option[DataFrame] =
        st.map { s =>
          val kept = s.where(tsUs(s, end) >= watermarkMs * 1000L)
            .localCheckpoint(true)
          graft.util.Lineage.release(s)
          kept
        }
      leftState = trim(leftState, leftEnd)
      rightState = trim(rightState, rightEnd)
    }

    /** Rows currently held per side — the memory-envelope readout. */
    def stateSizes(): (Long, Long) =
      (leftState.map(_.count()).getOrElse(0L),
        rightState.map(_.count()).getOrElse(0L))

    /** Release all standing blocks (end of stream). */
    def close(): Unit = {
      leftState.foreach(graft.util.Lineage.release)
      rightState.foreach(graft.util.Lineage.release)
      leftState = None
      rightState = None
    }
  }

  /** Gap-based sessionization: per key, ordered by (ts, tieBreak), a
    * new session starts whenever the gap to the previous row strictly
    * exceeds `gapMs` (split at `gap > gapMs` — the same convention as
    * Structured Streaming's native `session_window`, which merges
    * touching windows, so the batch and streaming variants agree
    * event-for-event; SessionStreamSpec pins the boundary case). Adds
    * `session_id` (0-based per key) — the standard unit of behavioural
    * training data (one session = one interaction trajectory).
    *
    * One window = one key-hash shuffle + in-partition sort; the
    * boundary flag and its running sum share the same window frame, so
    * Catalyst evaluates both in a single Window operator pass. */
  def sessionize(df: DataFrame, key: String, ts: String,
      gapMs: Long, tieBreak: String): DataFrame = {
    require(gapMs > 0, "gap must be positive")
    val t = tsUs(df, ts)
    val order = Window.partitionBy(col(key))
      .orderBy(t.asc, col(tieBreak).asc)
    val prev = lag(t, 1).over(order)
    val boundary = when(prev.isNull ||
      t - prev > gapMs * 1000L, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(boundary).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** Per-session summary over [[sessionize]] output: event count,
    * start/end/duration (epoch ms), and distinct-value count of
    * `distinctOf`. Partial aggregation is map-side; the shuffle moves
    * only per-(key, session) partials. */
  def sessionStats(sessions: DataFrame, key: String, ts: String,
      distinctOf: String): DataFrame = {
    val tsMs = floor(tsUs(sessions, ts) / 1000L).cast("long")
    sessions.groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsMs).as("start_ms"),
        max(tsMs).as("end_ms"),
        (max(tsMs) - min(tsMs)).as("duration_ms"),
        count_distinct(col(distinctOf)).as(s"n_$distinctOf"))
  }

  /** Ordered event-sequence funnel: per key, the earliest strictly-
    * ordered completion of `steps` (each a boolean predicate over the
    * event row), where step k must fire AFTER step k−1's matched time
    * and (optionally) the whole sequence must fit inside `windowMs` of
    * step 1. The classic view→click→purchase conversion analysis,
    * using the earliest-completion greedy rule ("min ts of step k at
    * or after t_{k−1}"). WITHOUT a deadline the greedy rule is optimal
    * — an earlier step-k match can only widen step k+1's feasible
    * window. WITH `windowMs` set these are FIRST-TOUCH semantics: the
    * deadline anchors at the EARLIEST step-1 event, so a key whose
    * completion only fits a LATER step-1 anchor counts as incomplete —
    * the common per-user attribution rule ("did the user convert
    * within w of first entering the funnel"), not an existence test.
    * For "converted within w of ANY entry" parity with
    * last-touch/any-touch analytics tools, use [[funnelAnyAnchor]].
    * Returns (key, steps_completed, t_1..t_n epoch-ms, elapsed_ms) —
    * one row per key that completed at least step 1.
    *
    * Scale shape: ONE key-hash aggregation per step (k aggregations of
    * the pre-filtered event slice, each map-side combined, joined on
    * the key) — no per-key sort, no window over raw events, no state
    * larger than |keys| × k; all timestamps are exact integer ms. */
  def funnel(events: DataFrame, key: String, ts: String,
      steps: Seq[Column], windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val tsMs = floor(tsUs(events, ts) / 1000L).cast("long")
    val base = events.select(col(key).as("__k"), tsMs.as("__ts"),
      struct(steps.zipWithIndex.map { case (s, i) =>
        s.as(s"s$i") }: _*).as("__p"))
    // step 1: earliest matching event per key
    var acc = base.where(col("__p.s0"))
      .groupBy(col("__k")).agg(min(col("__ts")).as("t_1"))
    for (i <- 1 until steps.length) {
      val deadline = windowMs match {
        case Some(w) => col("__ts") <= col("t_1") + w
        case None    => lit(true)
      }
      val next = base.where(col(s"__p.s$i"))
        .join(acc, "__k")
        .where(col("__ts") >= col(s"t_$i") && deadline)
        .groupBy(col("__k"))
        .agg(min(col("__ts")).as(s"t_${i + 1}"))
        .select(col("__k"), col(s"t_${i + 1}"))
      acc = acc.join(next, Seq("__k"), "left_outer")
    }
    val tCols = (1 to steps.length).map(i => col(s"t_$i"))
    val completed = tCols.map(c =>
      when(c.isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    val lastReached = coalesce(tCols.reverse: _*)
    acc.select(col("__k").as(key) +:
      completed.as("steps_completed") +:
      tCols :+
      (lastReached - col("t_1")).as("elapsed_ms"): _*)
  }

  /** Funnel conversion report — the number funnels exist to produce:
    * one row per step with the keys reaching it, conversion from the
    * PREVIOUS step (integer ppm), and conversion from step 1. A
    * steps-row aggregate of [[funnel]]'s per-key output (exact integer
    * counts; the explode is steps-wide, not corpus-wide). */
  def funnelRates(perKey: DataFrame, nSteps: Int): DataFrame = {
    require(nSteps >= 1, "need at least one step")
    val counts = perKey.select(
      (1 to nSteps).map(i =>
        sum(when(col("steps_completed") >= i, 1L).otherwise(0L))
          .as(s"n$i")): _*)
    counts.select(explode(array((1 to nSteps).map(i =>
        struct(lit(i.toLong).as("step"), col(s"n$i").as("n_keys"),
          (if (i == 1) col("n1") else col(s"n${i - 1}")).as("__prev"),
          col("n1").as("__n1"))): _*)).as("__s"))
      .select(col("__s.step").as("step"),
        col("__s.n_keys").as("n_keys"),
        when(col("__s.__prev") > 0L,
          expr("__s.n_keys * 1000000 div __s.__prev")).otherwise(0L)
          .as("step_conv_ppm"),
        when(col("__s.__n1") > 0L,
          expr("__s.n_keys * 1000000 div __s.__n1")).otherwise(0L)
          .as("overall_conv_ppm"))
  }

  /** Any-anchor funnel conversion — the existence test [[funnel]]'s
    * first-touch semantics is not: a key converts iff SOME ordered
    * chain step-1..step-k fits inside `windowMs` of ITS OWN step-1
    * anchor (the "converted within w of any entry" rule of
    * last-touch/any-touch analytics tools). The classic latest-anchor
    * recurrence, k window passes over ONE per-key time sort:
    * A₁(t) = latest step-1 event ≤ t; Aᵢ(t) = Aᵢ₋₁(ts of the latest
    * step-i event ≤ t) — each Aᵢ is nondecreasing in t, so the max
    * anchor among feasible chains reaching step i by time t, and a
    * step-k event e completes a chain iff A_{k−1}(e.ts) ≥ e.ts − w
    * (maximizing the anchor is optimal for meeting the deadline;
    * ordered intermediates are ≤ e.ts ≤ anchor + w automatically).
    * RANGE frames make every comparison non-strict (a same-ms earlier
    * step qualifies), matching [[funnel]]'s `>=` step rule. Returns
    * one row per CONVERTED key: (key, anchor_ms — the latest feasible
    * anchor of the earliest completion, complete_ms, span_ms).
    *
    * Scale shape: one key-hash shuffle + one per-key sort shared by
    * all k window passes (Catalyst collapses same-spec windows), then
    * a key aggregation — unlike [[funnel]]'s sort-free k aggregations,
    * the existence test needs the per-key event order; state is still
    * O(1) per row. */
  def funnelAnyAnchor(events: DataFrame, key: String, ts: String,
      steps: Seq[Column], windowMs: Long): DataFrame = {
    require(steps.length >= 2,
      "any-anchor funnel needs at least 2 steps (1-step trivially " +
        "converts at every match)")
    require(windowMs >= 0L, s"windowMs must be >= 0, got $windowMs")
    val tsMs = floor(tsUs(events, ts) / 1000L).cast("long")
    val base = events.select(col(key).as("__k"), tsMs.as("__ts"),
      struct(steps.zipWithIndex.map { case (s, i) =>
        s.as(s"s$i") }: _*).as("__p"))
    val w = Window.partitionBy("__k").orderBy(col("__ts").asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    var cur = base.withColumn("__a1",
      max(when(col("__p.s0"), col("__ts"))).over(w))
    var prev = "__a1"
    for (i <- 1 until steps.length - 1) {
      cur = cur.withColumn(s"__a${i + 1}",
        max(when(col(s"__p.s$i"), col(prev))).over(w))
      prev = s"__a${i + 1}"
    }
    val last = steps.length - 1
    val qualifies = col(s"__p.s$last") && col(prev).isNotNull &&
      col(prev) >= col("__ts") - windowMs
    cur.groupBy(col("__k"))
      .agg(min(when(qualifies, struct(col("__ts"), col(prev))))
        .as("__c"))
      .where(col("__c").isNotNull)
      .select(col("__k").as(key),
        col(s"__c.$prev").as("anchor_ms"),
        col("__c.__ts").as("complete_ms"),
        (col("__c.__ts") - col(s"__c.$prev")).as("span_ms"))
  }
}
