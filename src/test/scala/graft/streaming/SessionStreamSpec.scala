package graft.streaming

import graft.TestSpark

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization (`session_window`) vs the batch twin
  * (`Temporal.sessionize` + `sessionStats`): the same event stream must
  * yield identical session boundaries and summaries through both paths
  * — including at the exact gap boundary, where session_window MERGES
  * touching windows (split only at `gap > gapMs`, measured empirically
  * and mirrored by the batch operator). */
class SessionStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // (user, ts_ms): user 1 → sessions {0,1000,2999}, {33000} (gap 30_001
  // > 30_000 splits); user 2 → one event; user 3 probes the boundary
  // exactly: 0 then 30_000 → one MERGED session (touching windows)
  private val events = Seq(
    (1L, 0L), (1L, 1_000L), (1L, 2_999L), (1L, 33_000L),
    (2L, 7L),
    (3L, 0L), (3L, 30_000L))

  test("streaming session_window equals the batch sessionize on the " +
      "same events, boundary included") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val df = input.toDS().toDF("user_id", "ts_ms")
    val sessions = StructuredStreams.streamingSessions(
      df, keyCol = "user_id", tsMsCol = "ts_ms", gapMs = 30_000L)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .select("user_id", "n_events", "start_ms", "end_ms", "duration_ms")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet

      val batchEvents = events.toDF("user_id", "ts_ms")
        .withColumn("eid", monotonically_increasing_id())
      val batch = graft.pipeline.Temporal.sessionStats(
        graft.pipeline.Temporal.sessionize(batchEvents, "user_id", "ts_ms",
          gapMs = 30_000L, tieBreak = "eid"),
        key = "user_id", ts = "ts_ms", distinctOf = "eid")
        .select("user_id", "n_events", "start_ms", "end_ms", "duration_ms")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet

      assert(streamed === batch)
      // boundary user merged into ONE session; the 30_001 gap split
      assert(streamed.count(_._1 == 3L) === 1)
      assert(streamed.count(_._1 == 1L) === 2)
    } finally q.stop()
  }

  test("streaming interval join equals the batch rangeJoin on the same " +
      "two streams, bounds inclusive") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lIn = MemoryStream[(Long, Long, Long)] // (lid, user, ms)
    val rIn = MemoryStream[(Long, Long, Long)] // (rid, user, ms)
    val joined = StructuredStreams.streamingRangeJoin(
      lIn.toDS().toDF("lid", "user_id", "lms"),
      rIn.toDS().toDF("rid", "user_id", "rms"),
      key = "user_id", leftTsMs = "lms", rightTsMs = "rms",
      beforeMs = 1_000L, afterMs = 500L)
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      val ls = Seq((1L, 1L, 10_000L), (2L, 1L, 20_000L), (3L, 2L, 5_000L))
      val rs = Seq((10L, 1L, 9_000L), (11L, 1L, 10_500L),
        (12L, 1L, 8_999L), (13L, 1L, 19_100L), (14L, 2L, 5_400L),
        (15L, 3L, 5_000L))
      lIn.addData(ls: _*); rIn.addData(rs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sjoin").select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.pipeline.Temporal.rangeJoin(
        ls.toDF("lid", "user_id", "lms"), rs.toDF("rid", "user_id", "rms"),
        key = "user_id", leftTs = "lms", rightTs = "rms",
        rightPayload = Seq("rid"), beforeMs = 1_000L, afterMs = 500L)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, 10L), (1L, 11L), (2L, 13L), (3L, 14L)))
    } finally q.stop()
  }

  test("late events beyond the watermark do not reopen closed sessions " +
      "(bounded state, append mode)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val sessions = StructuredStreams.streamingSessions(
      input.toDS().toDF("user_id", "ts_ms"),
      keyCol = "user_id", tsMsCol = "ts_ms", gapMs = 5_000L,
      watermarkDelayMs = 1_000L)
    val q = sessions.writeStream.format("memory").queryName("sess_app")
      .outputMode("append").start()
    try {
      input.addData((1L, 0L), (1L, 2_000L))
      q.processAllAvailable()
      // advance event time far past session end + watermark → closes it
      input.addData((9L, 60_000L))
      q.processAllAvailable()
      val closed = spark.table("sess_app").where(col("user_id") === 1L)
        .collect()
      assert(closed.length === 1)
      assert(closed(0).getAs[Long]("n_events") === 2L)
      assert(closed(0).getAs[Long]("duration_ms") === 2_000L)
    } finally q.stop()
  }
}
