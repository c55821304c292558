package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal operators: as-of join, banded range join, sessionization —
  * fixture cases with hand-computed truth plus brute-force equivalence
  * on a randomized-shape corpus. */
class TemporalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tsDf(rows: Seq[(Long, Long, Long, Double)],
      names: (String, String, String, String)): DataFrame =
    rows.toDF("id", "k", "ms", "v")
      .select(col("id").as(names._1), col("k").as(names._2),
        timestamp_millis(col("ms")).as(names._3), col("v").as(names._4))

  // left: purchases (id, user, ms, amount)
  private lazy val purchases = tsDf(Seq(
    (100L, 1L, 10_000L, 9.0),
    (101L, 1L, 20_000L, 8.0),
    (102L, 1L, 20_500L, 7.0),
    (103L, 2L, 5_000L, 6.0),   // user 2 has no prior click
    (104L, 3L, 40_000L, 5.0)
  ), ("pid", "user", "pts", "amount"))

  // right: clicks (id, user, ms, weight); user 1 has an equal-ts tie at
  // 20_000 (ids 202 < 203 — greater id must win)
  private lazy val clicks = tsDf(Seq(
    (200L, 1L, 4_000L, 1.0),
    (201L, 1L, 9_999L, 2.0),
    (202L, 1L, 20_000L, 3.0),
    (203L, 1L, 20_000L, 4.0),
    (204L, 2L, 6_000L, 5.0), // after user 2's only purchase
    (205L, 3L, 1_000L, 6.0)
  ), ("cid", "user", "cts", "weight"))

  test("asOfJoin picks latest admissible right row, inclusive ties") {
    val out = Temporal.asOfJoin(purchases, clicks, key = "user",
      leftTs = "pts", rightTs = "cts",
      rightPayload = Seq("cid", "weight"), rightTieBreak = "cid")
      .select("pid", "cid", "weight", "asof_gap_ms")
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap

    assert(out(100L) === ((Some(201L), Some(2.0), Some(1L))))
    // equal-ts right row admissible; max cid wins the 20_000 tie
    assert(out(101L) === ((Some(203L), Some(4.0), Some(0L))))
    assert(out(102L) === ((Some(203L), Some(4.0), Some(500L))))
    assert(out(103L) === ((None, None, None))) // no prior click
    assert(out(104L) === ((Some(205L), Some(6.0), Some(39_000L))))
  }

  test("asOfJoin tolerance nulls out stale matches") {
    val out = Temporal.asOfJoin(purchases, clicks, key = "user",
      leftTs = "pts", rightTs = "cts",
      rightPayload = Seq("cid"), rightTieBreak = "cid",
      toleranceMs = Some(2_000L))
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(100L) === Some(201L)) // gap 1 ms
    assert(out(104L) === None)       // gap 39 s > 2 s
  }

  test("asOfJoin keeps every left column and row") {
    val out = Temporal.asOfJoin(purchases, clicks, "user", "pts", "cts",
      Seq("cid"), "cid")
    assert(out.count() === purchases.count())
    assert(Seq("pid", "user", "pts", "amount", "cid", "asof_gap_ms")
      .forall(out.columns.contains))
  }

  test("rangeJoin equals brute-force join-filter on a dense fixture") {
    // randomized-shape corpus: 3 users x many events, band 1500 ms
    val left = tsDf((0L until 60L).map(i =>
      (i, i % 3, (i * 131) % 7000, 0.0)), ("lid", "k", "lts", "lv"))
    val right = tsDf((0L until 80L).map(i =>
      (1000L + i, i % 3, (i * 197) % 7000, i.toDouble)),
      ("rid", "k", "rts", "rv"))

    val banded = Temporal.rangeJoin(left, right, key = "k",
      leftTs = "lts", rightTs = "rts", rightPayload = Seq("rid"),
      beforeMs = 1_000L, afterMs = 500L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") &&
          unix_millis(col("rts")) >= unix_millis(col("lts")) - 1_000L &&
          unix_millis(col("rts")) <= unix_millis(col("lts")) + 500L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    assert(banded.length === banded.distinct.length) // no pair emitted twice
    assert(banded.toSet === brute.toSet)
    assert(brute.nonEmpty)
  }

  test("rangeJoin bounds are inclusive on both sides") {
    val l = tsDf(Seq((1L, 1L, 10_000L, 0.0)), ("lid", "k", "lts", "lv"))
    val r = tsDf(Seq((10L, 1L, 9_000L, 0.0), (11L, 1L, 10_500L, 0.0),
      (12L, 1L, 8_999L, 0.0), (13L, 1L, 10_501L, 0.0)),
      ("rid", "k", "rts", "rv"))
    val got = Temporal.rangeJoin(l, r, "k", "lts", "rts", Seq("rid"),
      beforeMs = 1_000L, afterMs = 500L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got === Set(10L, 11L))
  }

  test("sessionize splits on gap and numbers sessions per key") {
    val ev = tsDf(Seq(
      (1L, 1L, 0L, 0.0), (2L, 1L, 1_000L, 0.0), (3L, 1L, 2_000L, 0.0),
      (4L, 1L, 60_000L, 0.0), (5L, 1L, 61_000L, 0.0),
      (6L, 2L, 0L, 0.0), (7L, 2L, 100_000L, 0.0)
    ), ("eid", "user", "ts", "v"))
    val out = Temporal.sessionize(ev, "user", "ts", gapMs = 30_000L,
      tieBreak = "eid")
      .select("eid", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L,
      6L -> 0L, 7L -> 1L))
  }

  test("sessionize boundary: gap == gapMs stays in-session, " +
      "gap == gapMs + 1 splits (session_window merges touching windows)") {
    val ev = tsDf(Seq((1L, 1L, 0L, 0.0), (2L, 1L, 30_000L, 0.0),
      (3L, 1L, 60_001L, 0.0)), ("eid", "user", "ts", "v"))
    val out = Temporal.sessionize(ev, "user", "ts", 30_000L, "eid")
      .select("eid", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("sessionStats summarizes each session") {
    val ev = tsDf(Seq(
      (1L, 1L, 0L, 0.0), (2L, 1L, 1_000L, 1.0),
      (3L, 1L, 60_000L, 2.0)
    ), ("eid", "user", "ts", "v"))
    val sess = Temporal.sessionize(ev, "user", "ts", 30_000L, "eid")
    val stats = Temporal.sessionStats(sess, "user", "ts", distinctOf = "v")
      .orderBy("session_id").collect()
    assert(stats.length === 2)
    assert(stats(0).getAs[Long]("n_events") === 2)
    assert(stats(0).getAs[Long]("duration_ms") === 1_000L)
    assert(stats(0).getAs[Long]("n_v") === 2)
    assert(stats(1).getAs[Long]("n_events") === 1)
    assert(stats(1).getAs[Long]("duration_ms") === 0L)
  }

  test("asOfJoin equals brute-force argmax on a randomized-shape corpus") {
    val left = tsDf((0L until 50L).map(i =>
      (i, i % 4, (i * 173) % 5000, 0.0)), ("lid", "k", "lts", "lv"))
    val right = tsDf((0L until 70L).map(i =>
      (1000L + i, i % 4, (i * 211) % 5000, i.toDouble)),
      ("rid", "k", "rts", "rv"))
    val got = Temporal.asOfJoin(left, right, "k", "lts", "rts",
      Seq("rid"), "rid")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toMap
    // brute force: max rid among max admissible ts
    val ls = left.select("lid", "k", "lts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val rs = right.select("rid", "k", "rts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    ls.foreach { case (lid, k, lts) =>
      val adm = rs.filter(r => r._2 == k && r._3 <= lts)
      val want = if (adm.isEmpty) None
        else Some(adm.maxBy(r => (r._3, r._1))._1)
      assert(got(lid) === want, s"lid=$lid")
    }
  }

  test("asOfJoinForward: earliest at-or-after right row, inclusive " +
      "equal-ts ties, mirrored gap; brute-force equivalence") {
    val out = Temporal.asOfJoinForward(purchases, clicks, key = "user",
      leftTs = "pts", rightTs = "cts",
      rightPayload = Seq("cid"), rightTieBreak = "cid")
      .select("pid", "cid", "asof_gap_ms")
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    // pid 100 @10_000: next click is 202/203 @20_000 — max cid wins
    assert(out(100L) === ((Some(203L), Some(10_000L))))
    // pid 101 @20_000: the equal-ts pair is admissible, gap 0
    assert(out(101L) === ((Some(203L), Some(0L))))
    // pid 104 @40_000 (user 3): only click was @1_000 — nothing ahead
    assert(out(104L) === ((None, None)))
    // user 2: purchase @5_000, click @6_000 — forward finds it
    assert(out(103L) === ((Some(204L), Some(1_000L))))

    // randomized brute force (mirror of the backward sweep)
    val left = tsDf((0L until 50L).map(i =>
      (i, i % 4, (i * 173) % 5000, 0.0)), ("lid", "k", "lts", "lv"))
    val right = tsDf((0L until 70L).map(i =>
      (1000L + i, i % 4, (i * 211) % 5000, i.toDouble)),
      ("rid", "k", "rts", "rv"))
    val got = Temporal.asOfJoinForward(left, right, "k", "lts", "rts",
      Seq("rid"), "rid")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toMap
    val ls = left.select("lid", "k", "lts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val rs = right.select("rid", "k", "rts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    ls.foreach { case (lid, k, lts) =>
      val adm = rs.filter(r => r._2 == k && r._3 >= lts)
      // earliest ts wins; among equal ts the greatest rid
      val want = if (adm.isEmpty) None
        else Some(adm.minBy(r => (r._3, -r._1))._1)
      assert(got(lid) === want, s"lid=$lid")
    }
  }

  test("asOfJoinNearest: closest direction wins, exact ties go backward, " +
      "tolerance applies per direction; brute-force equivalence") {
    val out = Temporal.asOfJoinNearest(purchases, clicks, key = "user",
      leftTs = "pts", rightTs = "cts",
      rightPayload = Seq("cid"), rightTieBreak = "cid")
      .select("pid", "cid", "asof_gap_ms", "asof_dir")
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.toString)))).toMap
    // pid 100 @10_000: prev 201 @9_999 (gap 1) beats next @20_000
    assert(out(100L) === ((Some(201L), Some(1L), Some("backward"))))
    // pid 101 @20_000: equal-ts click (gap 0) — backward by the tie rule
    assert(out(101L) === ((Some(203L), Some(0L), Some("backward"))))
    // pid 103 (user 2) @5_000: only a LATER click exists — forward
    assert(out(103L) === ((Some(204L), Some(1_000L), Some("forward"))))
    // pid 104 (user 3) @40_000: only click @1_000 — backward, huge gap
    assert(out(104L) === ((Some(205L), Some(39_000L), Some("backward"))))

    // tolerance kills the 39s match but keeps the 1s ones
    val tol = Temporal.asOfJoinNearest(purchases, clicks, "user",
      "pts", "cts", Seq("cid"), "cid", toleranceMs = Some(2_000L))
      .select("pid", "cid").collect()
      .map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(tol(104L) === None && tol(100L) === Some(201L))

    // randomized brute force: nearest by |gap|, ties backward, then
    // (for a same-direction same-gap tie) the directional pass's own
    // max-cid rule
    val left = tsDf((0L until 50L).map(i =>
      (i, i % 4, (i * 173) % 5000, 0.0)), ("lid", "k", "lts", "lv"))
    val right = tsDf((0L until 70L).map(i =>
      (1000L + i, i % 4, (i * 211) % 5000, i.toDouble)),
      ("rid", "k", "rts", "rv"))
    val got = Temporal.asOfJoinNearest(left, right, "k", "lts", "rts",
      Seq("rid"), "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val ls = left.select("lid", "k", "lts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val rs = right.select("rid", "k", "rts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    ls.foreach { case (lid, k, lts) =>
      val back = rs.filter(r => r._2 == k && r._3 <= lts)
      val fwd = rs.filter(r => r._2 == k && r._3 >= lts)
      val b = if (back.isEmpty) None
        else Some(back.maxBy(r => (r._3, r._1)))
      val f = if (fwd.isEmpty) None
        else Some(fwd.minBy(r => (r._3, -r._1)))
      val want = (b, f) match {
        case (None, None) => None
        case (Some(x), None) => Some(x._1)
        case (None, Some(y)) => Some(y._1)
        case (Some(x), Some(y)) =>
          if (lts - x._3 <= y._3 - lts) Some(x._1) else Some(y._1)
      }
      assert(got(lid) === want, s"lid=$lid")
    }
  }

  test("funnel: strict ordering, window deadline, partial completion") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, 1L, 1_000L, "view"), (2L, 1L, 2_000L, "click"),
      (3L, 1L, 3_000L, "purchase"),
      // user 2: click BEFORE the first view — step 2 must not match it
      (4L, 2L, 5_000L, "click"), (5L, 2L, 6_000L, "view"),
      (6L, 2L, 7_000L, "click"),
      // user 3: purchase outside the window deadline
      (7L, 3L, 0L, "view"), (8L, 3L, 100L, "click"),
      (9L, 3L, 99_999_000L, "purchase"),
      // user 4: never starts (no view)
      (10L, 4L, 1_000L, "purchase"))
      .toDF("eid", "user", "ms", "kind")
      .select(col("eid"), col("user"),
        timestamp_millis(col("ms")).as("ts"), col("kind"))
    val out = Temporal.funnel(ev, key = "user", ts = "ts",
      steps = Seq(col("kind") === "view", col("kind") === "click",
        col("kind") === "purchase"),
      windowMs = Some(10_000L))
      .collect().map(r => r.getAs[Long]("user") -> ((
        r.getAs[Long]("steps_completed"),
        Option(r.get(r.fieldIndex("t_3"))).map(_.asInstanceOf[Long]),
        r.getAs[Long]("elapsed_ms")))).toMap
    assert(out(1L) === ((3L, Some(3_000L), 2_000L)))
    // user 2 reaches click only via the post-view click at 7s
    assert(out(2L) === ((2L, None, 1_000L)))
    // user 3's purchase misses the 10s window
    assert(out(3L) === ((2L, None, 100L)))
    assert(!out.contains(4L)) // no step-1 match → absent
  }

  test("funnelAnyAnchor: converts keys first-touch misses, reports " +
      "the latest feasible anchor of the earliest completion") {
    val ev = Seq(
      // user 1: plain in-window chain — anchor = its only view
      (1L, 1L, 1_000L, "view"), (2L, 1L, 2_000L, "click"),
      (3L, 1L, 3_000L, "purchase"),
      // user 2: first-touch anchor (view@0) misses the 10s deadline,
      // but a second entry at 99_990_000 completes in 9s — any-anchor
      // converts where funnel's windowed semantics does not
      (4L, 2L, 0L, "view"), (5L, 2L, 100L, "click"),
      (6L, 2L, 99_990_000L, "view"), (7L, 2L, 99_995_000L, "click"),
      (8L, 2L, 99_999_000L, "purchase"),
      // user 3: purchase BEFORE any view→click chain — no conversion
      (9L, 3L, 500L, "purchase"), (10L, 3L, 1_000L, "view"),
      (11L, 3L, 2_000L, "click"),
      // user 4: same-ms chain — RANGE frames make >= hold
      (12L, 4L, 7_000L, "view"), (13L, 4L, 7_000L, "click"),
      (14L, 4L, 7_000L, "purchase"),
      // user 5: two anchors both feasible — the LATEST wins
      (15L, 5L, 1_000L, "view"), (16L, 5L, 4_000L, "view"),
      (17L, 5L, 5_000L, "click"), (18L, 5L, 6_000L, "purchase"))
      .toDF("eid", "user", "ms", "kind")
      .select(col("eid"), col("user"),
        timestamp_millis(col("ms")).as("ts"), col("kind"))
    val out = Temporal.funnelAnyAnchor(ev, key = "user", ts = "ts",
      steps = Seq(col("kind") === "view", col("kind") === "click",
        col("kind") === "purchase"),
      windowMs = 10_000L)
      .collect().map(r => r.getAs[Long]("user") -> ((
        r.getAs[Long]("anchor_ms"), r.getAs[Long]("complete_ms"),
        r.getAs[Long]("span_ms")))).toMap
    assert(out(1L) === ((1_000L, 3_000L, 2_000L)))
    assert(out(2L) === ((99_990_000L, 99_999_000L, 9_000L)))
    assert(!out.contains(3L))
    assert(out(4L) === ((7_000L, 7_000L, 0L)))
    assert(out(5L) === ((4_000L, 6_000L, 2_000L)))
    // the first-touch funnel misses user 2's conversion entirely
    val ft = Temporal.funnel(ev, key = "user", ts = "ts",
      steps = Seq(col("kind") === "view", col("kind") === "click",
        col("kind") === "purchase"),
      windowMs = Some(10_000L))
      .collect().map(r => r.getAs[Long]("user") ->
        r.getAs[Long]("steps_completed")).toMap
    assert(ft(2L) === 2L, "fixture must actually separate the semantics")
  }

  test("funnelRates: per-step counts and integer ppm conversions") {
    val perKey = Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L))
      .toDF("user", "steps_completed")
    val out = Temporal.funnelRates(perKey, nSteps = 3)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, 4L, 1000000L, 1000000L)))
    assert(out(1) === ((2L, 3L, 750000L, 750000L)))
    assert(out(2) === ((3L, 1L, 333333L, 250000L)))
  }
}
