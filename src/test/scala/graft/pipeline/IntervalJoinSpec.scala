package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interval-overlap join: hand-computed truth, exactly-once emission
  * across bucket-straddling pairs, bucket-width invariance, and the
  * fail-loud over-length guard. */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ivals(rows: Seq[(Long, Long, Long, Long)],
      id: String): DataFrame =
    rows.toDF(id, "k", "s_ms", "e_ms")

  // key 1: a dense overlap cluster straddling the 10_000ms grid line;
  // key 2: point-touching intervals (overlap 0 must be INCLUDED);
  // key 3: disjoint intervals (no output)
  private lazy val left = ivals(Seq(
    (100L, 1L, 8_000L, 12_000L),  // straddles buckets 0 and 1
    (101L, 1L, 15_000L, 16_000L),
    (102L, 2L, 0L, 5_000L),
    (103L, 3L, 0L, 1_000L)
  ), "lid")
  private lazy val right = ivals(Seq(
    (200L, 1L, 11_000L, 19_000L), // overlaps BOTH left intervals
    (201L, 1L, 0L, 7_999L),       // misses 100 by 1ms
    (202L, 2L, 5_000L, 9_000L),   // point-touch with 102
    (203L, 3L, 2_000L, 3_000L)
  ), "rid")

  private def run(bucketMs: Long): Set[(Long, Long, Long)] =
    Temporal.intervalJoin(left, right, key = "k",
        leftStart = "s_ms", leftEnd = "e_ms",
        rightStart = "s_ms", rightEnd = "e_ms",
        rightPayload = Seq("rid"), bucketMs = bucketMs, maxLenMs = 20_000L)
      .select(col("lid"), col("rid"), col("overlap_ms"))
      .as[(Long, Long, Long)].collect().toSet

  test("hand-computed pairs, inclusive point-touch, exactly-once") {
    val expected = Set(
      (100L, 200L, 1_000L), // [8k,12k] ∩ [11k,19k] = [11k,12k]
      (101L, 200L, 1_000L), // [15k,16k] ∩ [11k,19k] = [15k,16k]
      (102L, 202L, 0L))     // point touch at 5_000
    assert(run(10_000L) === expected)
    // exactly-once: a multiset collect must equal the set size
    val n = Temporal.intervalJoin(left, right, "k", "s_ms", "e_ms",
      "s_ms", "e_ms", Seq("rid"), 10_000L, 20_000L).count()
    assert(n === expected.size)
  }

  test("output is invariant to the grid width") {
    val base = run(10_000L)
    for (w <- Seq(1_000L, 3_000L, 7_777L, 50_000L))
      assert(run(w) === base, s"bucketMs=$w")
  }

  test("brute-force equivalence on a randomized-shape corpus") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 300).map { i =>
      val s = rnd.nextInt(100_000).toLong
      (i.toLong, rnd.nextInt(5).toLong, s, s + rnd.nextInt(8_000))
    }
    val r = (0 until 300).map { i =>
      val s = rnd.nextInt(100_000).toLong
      (1000L + i, rnd.nextInt(5).toLong, s, s + rnd.nextInt(8_000))
    }
    val got = Temporal.intervalJoin(ivals(l, "lid"), ivals(r, "rid"),
        "k", "s_ms", "e_ms", "s_ms", "e_ms", Seq("rid"), 2_048L, 8_000L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    val want = (for {
      (li, lk, ls, le) <- l
      (ri, rk, rs, re) <- r
      if lk == rk && ls <= re && rs <= le
    } yield (li, ri)).toSet
    assert(got === want)
  }

  test("incremental symmetric hash join: any interleaving of batches " +
      "unions to the one-shot join; eviction drops only dead state") {
    val rnd = new scala.util.Random(19)
    val l = (0 until 200).map { i =>
      val s = rnd.nextInt(50_000).toLong
      (i.toLong, rnd.nextInt(4).toLong, s, s + rnd.nextInt(5_000))
    }
    val r = (0 until 200).map { i =>
      val s = rnd.nextInt(50_000).toLong
      (1000L + i, rnd.nextInt(4).toLong, s, s + rnd.nextInt(5_000))
    }
    val lDf = ivals(l, "lid")
    val rDf = ivals(r, "rid")
    val oneShot = Temporal.intervalJoin(lDf, rDf, "k", "s_ms", "e_ms",
        "s_ms", "e_ms", Seq("rid"), 4_096L, 5_000L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet

    // three interleavings, including lopsided ones (left-heavy tick,
    // an empty right batch, etc.)
    val splits: Seq[Seq[(Column => Column, Column => Column)]] = Seq(
      (0 until 3).map(i => ((c: Column) => c % 3 === i,
        (c: Column) => c % 3 === i)),
      Seq(((c: Column) => c < 100, (c: Column) => lit(false)),
        ((c: Column) => c >= 100, (c: Column) => c < 1100),
        ((c: Column) => lit(false), (c: Column) => c >= 1100)))
    for (ticks <- splits) {
      val j = new Temporal.IncrementalIntervalJoin("k", "s_ms", "e_ms",
        "s_ms", "e_ms", Seq("rid"), 4_096L, 5_000L)
      val got = ticks.map { case (lp, rp) =>
        j.ingest(lDf.where(lp(col("lid"))), rDf.where(rp(col("rid"))))
          .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
      }
      // tick outputs are disjoint (exactly-once) and union to one-shot
      assert(got.map(_.size).sum === got.reduce(_ ++ _).size,
        "a pair was emitted twice")
      assert(got.reduce(_ ++ _) === oneShot)
      j.close()
    }

    // eviction safety: watermark at 20_000 after ingesting everything
    // that ends before it; later batches (all starting >= 20_000) must
    // still find every live partner
    val early = (t: Long) => t < 20_000L
    val j2 = new Temporal.IncrementalIntervalJoin("k", "s_ms", "e_ms",
      "s_ms", "e_ms", Seq("rid"), 4_096L, 5_000L)
    val out1 = j2.ingest(lDf.where(col("s_ms") < 20_000L),
      rDf.where(col("s_ms") < 20_000L))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    val (lPre, rPre) = j2.stateSizes()
    j2.evict(20_000L)
    val (lPost, rPost) = j2.stateSizes()
    assert(lPost < lPre && rPost < rPre, "eviction must drop dead state")
    val out2 = j2.ingest(lDf.where(col("s_ms") >= 20_000L),
      rDf.where(col("s_ms") >= 20_000L))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    j2.close()
    assert((out1 ++ out2) === oneShot,
      "watermark eviction lost a live pair")
  }

  test("over-length interval raises instead of silently missing pairs") {
    val bad = ivals(Seq((1L, 1L, 0L, 30_000L)), "lid")
    val ex = intercept[Exception] {
      Temporal.intervalJoin(bad, right, "k", "s_ms", "e_ms",
        "s_ms", "e_ms", Seq("rid"), 10_000L, 20_000L).count()
    }
    assert(ex.getMessage.contains("intervalJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("intervalJoin")))
  }
}
