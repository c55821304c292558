package graft.streaming

import graft.TestSpark
import graft.pipeline.Temporal

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming as-of join ≡ batch [[Temporal.asOfJoin]] when a per-key
  * ts-ordered stream replays through it across micro-batch boundaries —
  * the same parity contract SessionStreamSpec pins for sessionization.
  * Covers: matches straddling batch boundaries (right in batch 1, left
  * in batch 3), equal-ts inclusive bound with greatest-tiebreak wins,
  * tolerance nulls, unmatched-left nulls, and horizon eviction keeping
  * the newest right for quiet feeds. */
class AsOfStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rights = Seq( // (key, ts, tie, value)
    ("a", 100L, 1L, 1.0), ("a", 200L, 2L, 2.0), ("a", 200L, 3L, 3.0),
    ("a", 900L, 4L, 9.0),
    ("b", 150L, 5L, 15.0))
  private val lefts = Seq( // (key, ts)
    ("a", 50L), // before any right → nulls
    ("a", 200L), // equal ts: inclusive, tie 3 (greatest) wins → 3.0
    ("a", 450L), // gap 250 from ts 200
    ("a", 1000L), // right 900 arrives in a LATER batch than left 450
    ("b", 149L), // before b's only right → nulls
    ("b", 5000L)) // far past the horizon — newest right retained

  private def runStreaming(tol: Option[Long], horizonMs: Long)
      : Map[(String, Long), (Option[Double], Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StructuredStreams.AsOfEvent]
    val q = StructuredStreams.streamingAsOfJoin(input.toDS(), tol,
      horizonMs)
      .writeStream.format("memory").queryName("asof_out")
      .option("checkpointLocation",
        Files.createTempDirectory("asof-ckpt").toString)
      .outputMode("append").start()
    try {
      val all = (rights.map(r =>
          StructuredStreams.AsOfEvent(r._1, r._2, 0, r._3, r._4)) ++
        lefts.map(l =>
          StructuredStreams.AsOfEvent(l._1, l._2, 1, 0L, 0.0)))
        .sortBy(e => (e.key, e.tsMs, e.side))
      // three micro-batches, split in per-key ts order
      all.grouped((all.size + 2) / 3).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table("asof_out").as[StructuredStreams.AsOfMatch].collect()
      .map(m => (m.key, m.tsMs) -> ((m.matchedValue, m.gapMs))).toMap
  }

  private def runBatch(tol: Option[Long])
      : Map[(String, Long), (Option[Double], Option[Long])] = {
    import spark.implicits._
    val l = lefts.toDF("key", "ts")
    val r = rights.toDF("key", "ts", "tie", "value")
    Temporal.asOfJoin(l, r, "key", "ts", "ts", Seq("value"), "tie", tol)
      .collect().map { row =>
        (row.getAs[String]("key"), row.getAs[Long]("ts")) -> ((
          Option(row.getAs[java.lang.Double]("value")).map(_.toDouble),
          Option(row.getAs[java.lang.Long]("asof_gap_ms")).map(_.toLong)))
      }.toMap
  }

  test("streaming as-of replay equals the batch asOfJoin row-for-row " +
      "(no tolerance)") {
    val s = runStreaming(None, horizonMs = 3600000L)
    val b = runBatch(None)
    assert(s === b)
    // spot-check the semantics themselves, not just parity
    assert(s(("a", 200L)) === ((Some(3.0), Some(0L)))) // tie: greatest
    assert(s(("a", 50L)) === ((None, None)))
    assert(s(("a", 1000L)) === ((Some(9.0), Some(100L)))) // cross-batch
    assert(s(("b", 5000L)) === ((Some(15.0), Some(4850L)))) // retained
  }

  test("tolerance: stale matches null out identically on both paths") {
    val s = runStreaming(Some(250L), horizonMs = 3600000L)
    val b = runBatch(Some(250L))
    assert(s === b)
    assert(s(("a", 450L)) === ((Some(3.0), Some(250L)))) // exactly tol
    assert(s(("b", 5000L)) === ((None, None))) // 4850 > 250
  }

  test("horizon eviction keeps the newest right at-or-below the cutoff") {
    // horizon 100 around b's quiet feed: right at 150, left at 5000 —
    // eviction must still retain the newest (only) right
    val s = runStreaming(None, horizonMs = 100L)
    assert(s(("b", 5000L)) === ((Some(15.0), Some(4850L))))
  }
}
