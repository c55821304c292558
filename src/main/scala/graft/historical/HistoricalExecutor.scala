package graft.historical

import graft.sparql.{Query, SparqlCompiler}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Historical window executors (SURVEY.md §2.2 W3/W4) over the quads
  * log, reproducing
  * `/root/reference/src/execution/historical_executor.rs`.
  *
  * Window semantics:
  *   - fixed `[START a END b]`: one-shot evaluation over quads with
  *     `a <= ts <= b` (`historical_executor.rs:75-96`), result
  *     timestamp = window end;
  *   - sliding `[OFFSET o RANGE r STEP s]`: window sequence over
  *     `[now-o, now]` — window k covers
  *     `[now-o + k*s, min(now-o + k*s + r, now)]`, k = 0 .. o/s
  *     (`historical_executor.rs:120-147,424-460`), inclusive bounds.
  *
  * Scale design: the reference iterates windows one by one, running one
  * SPARQL execution per window. Here ALL windows evaluate in one
  * distributed plan: each event expands to the window ids containing it
  * (integer arithmetic + `sequence`/`explode`, expansion factor = r/s,
  * the honest data overlap), and the compiled query threads
  * `__window_id` through every join and aggregation via the compiler's
  * `extraKeys`. No driver-side window loop, no per-window job launch —
  * the same plan works for 20 windows or 20,000.
  */
object HistoricalExecutor {

  val WindowIdCol = "__window_id"

  final case class SlidingSpec(offsetMs: Long, rangeMs: Long, stepMs: Long) {
    require(stepMs > 0, "STEP must be positive")
    require(rangeMs >= 0, "RANGE must be non-negative")
    /** Number of windows: k = 0 .. offset/step (reference loops while
      * cur <= now, advancing by step from now-offset). */
    def windowCount: Long = offsetMs / stepMs + 1
  }

  /** W3: fixed window — time-pruned scan + compiled query. */
  def executeFixed(quads: DataFrame, query: Query, startMs: Long,
      endMs: Long): DataFrame = {
    val windowed = quads.where(col("timestamp").between(startMs, endMs))
    SparqlCompiler.compile(windowed, query)
      .withColumn("timestamp_from", lit(startMs))
      .withColumn("timestamp_to", lit(endMs))
  }

  /** Quads annotated with the sliding-window id(s) containing each event
    * — the distributed window-assignment step. An event at ts belongs to
    * window k iff  base + k*s <= ts <= min(base + k*s + r, now), where
    * base = now - offset. Solving for k:
    *   k >= ceil((ts - r - base) / s)   and   k <= floor((ts - base) / s)
    */
  def assignWindows(quads: DataFrame, nowMs: Long, spec: SlidingSpec)
      : DataFrame = {
    val base = nowMs - spec.offsetMs
    val maxId = spec.windowCount - 1
    val idHigh = least(expr(s"(timestamp - ${base}L) div ${spec.stepMs}L"),
      lit(maxId))
    // ceilDiv(a, s) = floorDiv(a + s - 1, s); numerator may be negative,
    // in which case the greatest(0, _) clamp absorbs the truncation-vs-
    // floor difference (result is <= 0 either way)
    val idLow = greatest(lit(0L),
      expr(s"(timestamp - ${spec.rangeMs}L - ${base}L + ${spec.stepMs - 1}L)" +
        s" div ${spec.stepMs}L"))
    // When STEP > RANGE the window sequence has coverage gaps; an event in
    // a gap yields idLow > idHigh and `sequence` would generate a DESCENDING
    // id list, assigning the event to windows that do not contain it
    // (historical_executor.rs:120-147 allows arbitrary RANGE/STEP). Such
    // events belong to no window — drop them before the explode.
    quads
      .where(col("timestamp").between(base, nowMs))
      .where(idLow.cast("long") <= idHigh.cast("long"))
      .withColumn(WindowIdCol,
        explode(sequence(idLow.cast("long"), idHigh.cast("long"))))
  }

  /** Window-id → inclusive bounds columns (no join needed). */
  def windowBounds(nowMs: Long, spec: SlidingSpec)(idCol: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val base = nowMs - spec.offsetMs
    val from = lit(base) + idCol * lit(spec.stepMs)
    val to = least(from + lit(spec.rangeMs), lit(nowMs))
    (from, to)
  }

  /** W4: sliding windows — ONE distributed evaluation across all
    * windows; output carries `__window_id`, `timestamp_from`,
    * `timestamp_to`. Windows with no matching solutions produce no rows
    * (matching the reference: an empty bindings batch). */
  def executeSliding(quads: DataFrame, query: Query, nowMs: Long,
      spec: SlidingSpec): DataFrame = {
    val assigned = assignWindows(quads, nowMs, spec)
    val out = SparqlCompiler.compile(assigned, query,
      extraKeys = Seq(WindowIdCol))
    val (from, to) = windowBounds(nowMs, spec)(col(WindowIdCol))
    out.withColumn("timestamp_from", from).withColumn("timestamp_to", to)
  }

  /** Enumerate the window sequence itself (for tests / result envelopes
    * and the reference's window-count assertions,
    * `tests/historical_sliding_window_test.rs`). */
  def windowSequence(spark: SparkSession, nowMs: Long, spec: SlidingSpec)
      : DataFrame = {
    val (from, to) = windowBounds(nowMs, spec)(col("id"))
    spark.range(spec.windowCount)
      .select(col("id").as(WindowIdCol),
        from.as("timestamp_from"), to.as("timestamp_to"))
  }
}
