package graft.historical

import graft.TestSpark
import graft.core.RdfEvent
import graft.sparql.SparqlParser

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the window-sequence semantics of
  * `/root/reference/src/execution/historical_executor.rs:75-147,424-460`
  * and the count/bounds assertions of
  * `tests/historical_fixed_window_test.rs` /
  * `historical_sliding_window_test.rs`. */
class HistoricalExecutorSpec extends AnyFunSuite {

  import HistoricalExecutor._

  private lazy val spark = TestSpark.spark

  // one sensor reading per second from t=0 to t=9999 ms (10 events)
  private lazy val quads = RdfEvent.toDF(spark, (0 until 10).map(i =>
    RdfEvent(i * 1000L, s"http://e.org/sensor${i % 2}",
      "http://e.org/temperature", (20 + i).toString, "")))

  private val q = SparqlParser.parse(
    """PREFIX ex: <http://e.org/>
      |SELECT ?s ?t WHERE { ?s ex:temperature ?t }""".stripMargin)

  test("fixed window evaluates once over [start, end] inclusive") {
    val out = executeFixed(quads, q, 2000, 5000)
    assert(out.count() === 4) // ts 2000,3000,4000,5000
    val r = out.select("timestamp_from", "timestamp_to").distinct().collect()
    assert(r.length === 1 && r(0).getLong(0) === 2000L && r(0).getLong(1) === 5000L)
  }

  test("sliding window sequence: count = offset/step + 1") {
    // reference benches use OFFSET 10s RANGE 2s STEP 1s → 11 windows
    val spec = SlidingSpec(10000, 2000, 1000)
    assert(spec.windowCount === 11)
    val ws = windowSequence(spark, 10000, spec).collect()
    assert(ws.length === 11)
    // first window [0, 2000], last window [10000, 10000] (clamped at now)
    assert(ws.head.getLong(1) === 0L && ws.head.getLong(2) === 2000L)
    assert(ws.last.getLong(1) === 10000L && ws.last.getLong(2) === 10000L)
  }

  test("window end clamps at now (historical_executor.rs:129)") {
    val spec = SlidingSpec(4000, 3000, 2000)
    val ws = windowSequence(spark, 10000, spec).collect()
    // base = 6000; windows [6000,9000],[8000,10000(clamped? 8000+3000=11000→10000)],[10000,10000]
    assert(ws.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((6000L, 9000L), (8000L, 10000L), (10000L, 10000L)))
  }

  test("assignWindows places each event in exactly the covering windows") {
    val spec = SlidingSpec(8000, 2000, 1000) // base at now-8000
    val now = 9000L
    val assigned = assignWindows(quads, now, spec)
    // check against brute force
    val brute = (0 until 10).flatMap { i =>
      val ts = i * 1000L
      (0L to spec.windowCount - 1).flatMap { k =>
        val from = now - spec.offsetMs + k * spec.stepMs
        val to = math.min(from + spec.rangeMs, now)
        if (ts >= from && ts <= to) Some((ts, k)) else None
      }
    }.toSet
    val got = assigned.select("timestamp", WindowIdCol).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
  }

  test("assignWindows drops events in coverage gaps when STEP > RANGE") {
    // base = 1000; windows [1000,1500],[3000,3500],[5000,5500],
    // [7000,7500],[9000,9000] — events at 2000/4000/6000/8000 sit in
    // gaps and belong to NO window (regression: sequence(idLow, idHigh)
    // generated a descending id list when idLow > idHigh)
    val spec = SlidingSpec(8000, 500, 2000)
    val now = 9000L
    val assigned = assignWindows(quads, now, spec)
    val brute = (0 until 10).flatMap { i =>
      val ts = i * 1000L
      (0L to spec.windowCount - 1).flatMap { k =>
        val from = now - spec.offsetMs + k * spec.stepMs
        val to = math.min(from + spec.rangeMs, now)
        if (ts >= from && ts <= to && ts >= now - spec.offsetMs)
          Some((ts, k))
        else None
      }
    }.toSet
    val got = assigned.select("timestamp", WindowIdCol).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(brute.map(_._1) === Set(1000L, 3000L, 5000L, 7000L, 9000L))
  }

  test("executeSliding: per-window aggregation in one plan") {
    val spec = SlidingSpec(9000, 3000, 3000) // windows [0,3000],[3000,6000],[6000,9000],[9000,9000]
    val agg = SparqlParser.parse(
      """PREFIX ex: <http://e.org/>
        |SELECT (COUNT(?s) AS ?n) (AVG(?t) AS ?avgT)
        |WHERE { ?s ex:temperature ?t }""".stripMargin)
    val out = executeSliding(quads, agg, 9000, spec)
      .orderBy(WindowIdCol).collect()
    assert(out.length === 4)
    // window 0: ts 0..3000 → 4 events, temps 20..23 avg 21.5
    assert(out(0).getAs[Long]("n") === 4)
    assert(out(0).getAs[Double]("avgT") === 21.5)
    // window 3: [9000,9000] → 1 event (ts 9000), temp 29
    assert(out(3).getAs[Long]("n") === 1)
    assert(out(3).getAs[Double]("avgT") === 29.0)
    assert(out(3).getAs[Long]("timestamp_from") === 9000L)
    assert(out(3).getAs[Long]("timestamp_to") === 9000L)
  }

  test("executeSliding threads window id through BGP joins") {
    // two-pattern join must join within the same window only
    val q2 = RdfEvent.toDF(spark, Seq(
      RdfEvent(1000L, "http://e.org/a", "http://e.org/val", "1", ""),
      RdfEvent(1000L, "http://e.org/a", "http://e.org/flag", "x", ""),
      RdfEvent(5000L, "http://e.org/a", "http://e.org/flag", "y", "")))
    val joinQ = SparqlParser.parse(
      """PREFIX ex: <http://e.org/>
        |SELECT ?s ?v ?f WHERE { ?s ex:val ?v . ?s ex:flag ?f }""".stripMargin)
    val spec = SlidingSpec(6000, 2000, 2000)
    val out = executeSliding(q2, joinQ, 6000, spec).collect()
    // val@1000 and flag@1000 share window 0 ([0,2000]); flag@5000 lives in
    // windows 2,3 where no ex:val quad exists → exactly one solution
    assert(out.length === 1)
    assert(out(0).getAs[String]("f") === "x")
    assert(out(0).getAs[Long](WindowIdCol) === 0L)
  }

  test("VALUES inside a windowed query joins per window (no key-column " +
      "crash; inline frame is window-independent)") {
    val vq = SparqlParser.parse(
      """PREFIX ex: <http://e.org/>
        |SELECT ?s ?t WHERE {
        |  ?s ex:temperature ?t .
        |  VALUES ?s { <http://e.org/sensor0> }
        |}""".stripMargin)
    val spec = SlidingSpec(8000, 2000, 2000)
    val out = executeSliding(quads, vq, 8000, spec).collect()
    // sensor0 readings at even seconds; every row filtered to sensor0
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("s") === "http://e.org/sensor0"))
    // VALUES-first order must work identically (deferred join)
    val vq2 = SparqlParser.parse(
      """PREFIX ex: <http://e.org/>
        |SELECT ?s ?t WHERE {
        |  VALUES ?s { <http://e.org/sensor0> }
        |  ?s ex:temperature ?t .
        |}""".stripMargin)
    val out2 = executeSliding(quads, vq2, 8000, spec).collect()
    assert(out2.map(_.toString).sorted.toSeq ===
      out.map(_.toString).sorted.toSeq)
  }
}
