package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-skew degradation for the temporal family: one degenerate
  * hot key must stay correct (and linear-ish), never explode into a
  * per-key nested loop. */
class TemporalSkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin: 40k rows on ONE hot key — correct against brute " +
      "force on a sample, single window pass") {
    val n = 20000
    val left = (0 until n).map(i => (i.toLong, 1L, (i * 7).toLong))
      .toDF("lid", "k", "lts")
      .select(col("lid"), col("k"), timestamp_millis(col("lts")).as("lts"))
    val right = (0 until n).map(i => (1000000L + i, 1L, (i * 11).toLong))
      .toDF("rid", "k", "rts")
      .select(col("rid"), col("k"), timestamp_millis(col("rts")).as("rts"))
    val out = Temporal.asOfJoin(left, right, "k", "lts", "rts",
      Seq("rid"), "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out.size === n)
    // brute force on a systematic sample: latest rts=11j <= 7i → j = 7i/11
    (0 until n by 997).foreach { i =>
      val j = (i * 7) / 11
      val want = if (j >= n) Some(1000000L + n - 1) else Some(1000000L + j)
      assert(out(i.toLong) === want, s"lid=$i")
    }
  }

  test("rangeJoin: hot key with a dense band stays an equi-join and " +
      "emits exactly the banded pairs") {
    // one key, 2000 left, 2000 right, 1 ms apart; band ±10 ms → ~21
    // matches per left row, bounded output (the nested-loop shape would
    // compare all 4M pairs)
    val left = (0 until 2000).map(i => (i.toLong, 1L, i.toLong))
      .toDF("lid", "k", "lts")
      .select(col("lid"), col("k"), timestamp_millis(col("lts")).as("lts"))
    val right = (0 until 2000).map(i => (5000L + i, 1L, i.toLong))
      .toDF("rid", "k", "rts")
      .select(col("rid"), col("k"), timestamp_millis(col("rts")).as("rts"))
    val out = Temporal.rangeJoin(left, right, "k", "lts", "rts",
      Seq("rid"), beforeMs = 10L, afterMs = 10L)
    val n = out.count()
    // exact expected pair count: sum over i of |[i-10, i+10] ∩ [0,1999]|
    val expected = (0 until 2000).map { i =>
      (math.min(1999, i + 10) - math.max(0, i - 10) + 1).toLong
    }.sum
    assert(n === expected)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") &&
      !plan.contains("broadcastnestedloop"), plan)
  }

  test("intervalJoin: hot key with dense short intervals stays a " +
      "bucketed equi-join with exactly the overlap pairs") {
    // one key, 2000 × 2000 intervals of length 10 ms starting 1 ms
    // apart: ~21 overlaps per left row; the naive same-key residual
    // join would sort-merge all 4M pairs
    val left = (0 until 2000).map(i =>
      (i.toLong, 1L, i.toLong, i.toLong + 10L)).toDF("lid", "k", "s", "e")
    val right = (0 until 2000).map(i =>
      (5000L + i, 1L, i.toLong, i.toLong + 10L)).toDF("rid", "k", "s", "e")
    val out = Temporal.intervalJoin(left, right, "k", "s", "e", "s", "e",
      Seq("rid"), bucketMs = 16L, maxLenMs = 10L)
    // |[i-10, i+10] ∩ [0,1999]| overlapping starts per left row
    val expected = (0 until 2000).map { i =>
      (math.min(1999, i + 10) - math.max(0, i - 10) + 1).toLong
    }.sum
    assert(out.count() === expected)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") &&
      !plan.contains("broadcastnestedloop"), plan)
  }

  test("sessionize: one user with 30k events stays one window pass " +
      "with correct boundary count") {
    val ev = (0 until 30000).map { i =>
      // every 100th gap is 10s, otherwise 1s → 300 boundaries
      val ts = i.toLong * 1000L + (i / 100).toLong * 9000L
      (i.toLong, 1L, ts)
    }.toDF("eid", "k", "ts")
      .select(col("eid"), col("k"), timestamp_millis(col("ts")).as("ts"))
    val out = Temporal.sessionize(ev, "k", "ts", gapMs = 5000L,
      tieBreak = "eid")
    val nSessions = out.agg(max("session_id")).collect()(0).getLong(0) + 1
    assert(nSessions === 300L)
    assert(out.count() === 30000L)
  }
}
