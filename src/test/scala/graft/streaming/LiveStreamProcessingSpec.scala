package graft.streaming

import graft.TestSpark
import graft.core.RdfEvent

import org.scalatest.funsuite.AnyFunSuite

/** Ports the timing/behavioral assertions of
  * `/root/reference/tests/live_stream_integration_test.rs` (reformulated
  * as event-time window assertions per SURVEY.md §7.3 item 1). */
class LiveStreamProcessingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val basicQuery =
    """PREFIX ex: <http://example.org/>
      |REGISTER RStream <output> AS
      |SELECT ?s ?p ?o
      |FROM NAMED WINDOW ex:w1 ON STREAM ex:stream1 [RANGE 1000 STEP 300]
      |WHERE {
      |    WINDOW ex:w1 { ?s ?p ?o }
      |}""".stripMargin

  test("stream registration is idempotent") {
    val p = new LiveStreamProcessing(spark, basicQuery)
    p.registerStream("http://example.org/stream1")
    p.registerStream("http://example.org/stream1")
    assert(p.getRegisteredStreams === Seq("http://example.org/stream1"))
  }

  test("window timing: closes every STEP, range == RANGE " +
      "(live_stream_integration_test.rs:119-161)") {
    val p = new LiveStreamProcessing(spark, basicQuery)
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    (0 to 10).foreach { i =>
      p.addEvent("http://example.org/stream1",
        RdfEvent(i * 100L, s"http://example.org/s$i",
          "http://example.org/p", s"o$i", ""))
    }
    p.closeStream("http://example.org/stream1", 3000)
    val results = p.collectResults()
    assert(results.nonEmpty)
    // every result spans exactly RANGE
    assert(results.forall(r => r.timestampTo - r.timestampFrom === 1000L))
    // at least 3 distinct window closures produced results
    val closes = results.map(_.timestampTo).distinct.sorted
    assert(closes.length >= 3)
    // closes are multiples of STEP
    assert(closes.forall(_ % 300 === 0))
    // sentinel never leaks into bindings
    assert(results.forall(!_.bindings.values.exists(_.contains("sentinel"))))
  }

  test("bounded result buffer drops OLDEST results with lag accounting " +
      "(slow consumer; server.rs:34 broadcast-channel semantics)") {
    val p = new LiveStreamProcessing(spark, basicQuery,
      maxBufferedResults = 3)
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    // 6 events, one per step window → more results than the buffer holds,
    // with NO consumer polling in between
    (0 until 6).foreach { i =>
      p.addEvent("http://example.org/stream1",
        RdfEvent(i * 300L + 1, s"http://example.org/s$i",
          "http://example.org/p", s"o$i", ""))
    }
    p.closeStream("http://example.org/stream1", 3000)
    val kept = p.collectResults()
    assert(kept.length === 3)
    assert(p.droppedResults > 0)
    // the KEPT results are the newest fires (drop-oldest): last event
    // (ts 1501) is covered through close 2400 ([1400, 2400))
    val allCloses = kept.map(_.timestampTo)
    assert(allCloses === allCloses.sorted)
    assert(allCloses.last === 2400L)
  }

  test("window content: fire at c covers [c-range, c) only") {
    val p = new LiveStreamProcessing(spark, basicQuery)
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    p.addEvent("http://example.org/stream1",
      RdfEvent(100L, "http://example.org/a", "http://example.org/p", "1", ""))
    p.addEvent("http://example.org/stream1",
      RdfEvent(1500L, "http://example.org/b", "http://example.org/p", "2", ""))
    p.closeStream("http://example.org/stream1", 2400)
    val results = p.collectResults()
    // window closing at 300 contains only event a; at 1800 only event b;
    // at 1200 both (a@100 ∈ [200,1200)? no — a@100 < 200; b@1500 ≥ 1200 no)
    val byClose = results.groupBy(_.timestampTo)
      .view.mapValues(_.map(_.bindings("s")).toSet).toMap
    assert(byClose(300L) === Set("http://example.org/a"))
    assert(byClose(1800L) === Set("http://example.org/b"))
    // window closing at 1200 covers [200,1200): neither a@100 nor b@1500
    assert(!byClose.contains(1200L))
  }

  test("empty windows produce no results") {
    val p = new LiveStreamProcessing(spark,
      basicQuery.replace("RANGE 1000 STEP 300", "RANGE 1000 STEP 500"))
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    p.closeStream("http://example.org/stream1", 5000)
    assert(p.collectResults().isEmpty)
  }

  test("extension-function FILTER on the live path") {
    val q =
      """PREFIX ex: <http://example.org/>
        |PREFIX janus: <https://janus.rs/fn#>
        |REGISTER RStream <output> AS
        |SELECT ?s ?v
        |FROM NAMED WINDOW ex:w1 ON STREAM ex:stream1 [RANGE 1000 STEP 1000]
        |WHERE {
        |    WINDOW ex:w1 {
        |        ?s ex:value ?v .
        |        FILTER(janus:absolute_threshold_exceeded(?v, "50", "10"))
        |    }
        |}""".stripMargin
    val p = new LiveStreamProcessing(spark, q)
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    p.addEvent("http://example.org/stream1",
      RdfEvent(100L, "http://example.org/hot", "http://example.org/value", "95", ""))
    p.addEvent("http://example.org/stream1",
      RdfEvent(200L, "http://example.org/ok", "http://example.org/value", "55", ""))
    p.closeStream("http://example.org/stream1", 1000)
    val results = p.collectResults()
    assert(results.map(_.bindings("s")).toSet === Set("http://example.org/hot"))
  }

  test("stream-static join: baseline quads join live readings (R10)") {
    val q =
      """PREFIX ex: <http://example.org/>
        |PREFIX baseline: <https://janus.rs/baseline#>
        |PREFIX janus: <https://janus.rs/fn#>
        |REGISTER RStream <output> AS
        |SELECT ?sensor ?reading ?mean
        |FROM NAMED WINDOW ex:w1 ON STREAM ex:stream1 [RANGE 1000 STEP 1000]
        |WHERE {
        |    WINDOW ex:w1 { ?sensor ex:reading ?reading . }
        |    ?sensor baseline:mean ?mean .
        |    FILTER(janus:absolute_threshold_exceeded(?reading, ?mean, 5))
        |}""".stripMargin
    val p = new LiveStreamProcessing(spark, q)
    p.registerStream("http://example.org/stream1")
    p.addStaticData(Seq(
      RdfEvent(0L, "http://example.org/s1", "https://janus.rs/baseline#mean",
        "20", ""),
      RdfEvent(0L, "http://example.org/s2", "https://janus.rs/baseline#mean",
        "50", "")))
    p.startProcessing()
    p.addEvent("http://example.org/stream1",
      RdfEvent(100L, "http://example.org/s1", "http://example.org/reading",
        "40", "")) // |40-20| > 5 → anomaly
    p.addEvent("http://example.org/stream1",
      RdfEvent(200L, "http://example.org/s2", "http://example.org/reading",
        "52", "")) // |52-50| < 5 → fine
    p.closeStream("http://example.org/stream1", 1000)
    val results = p.collectResults()
    assert(results.map(_.bindings("sensor")).toSet ===
      Set("http://example.org/s1"))
    assert(results.head.bindings("mean") === "20")
  }

  test("cross-window merge: two windows join at fire time (W2)") {
    val q =
      """PREFIX ex: <http://example.org/>
        |REGISTER RStream <output> AS
        |SELECT ?s ?a ?b
        |FROM NAMED WINDOW ex:w1 ON STREAM ex:stream1 [RANGE 1000 STEP 1000]
        |FROM NAMED WINDOW ex:w2 ON STREAM ex:stream2 [RANGE 1000 STEP 1000]
        |WHERE {
        |    WINDOW ex:w1 { ?s ex:a ?a . }
        |    WINDOW ex:w2 { ?s ex:b ?b . }
        |}""".stripMargin
    val p = new LiveStreamProcessing(spark, q)
    p.registerStream("http://example.org/stream1")
    p.registerStream("http://example.org/stream2")
    p.startProcessing()
    p.addEvent("http://example.org/stream1",
      RdfEvent(100L, "http://example.org/x", "http://example.org/a", "1", ""))
    p.addEvent("http://example.org/stream2",
      RdfEvent(200L, "http://example.org/x", "http://example.org/b", "2", ""))
    p.closeStream("http://example.org/stream1", 1000)
    p.closeStream("http://example.org/stream2", 1000)
    val results = p.collectResults()
    assert(results.exists(r => r.bindings.get("a").contains("1") &&
      r.bindings.get("b").contains("2")))
  }

  test("a window fires only when ITS stream's event time advances") {
    val q =
      """PREFIX ex: <http://example.org/>
        |REGISTER RStream <output> AS
        |SELECT ?s ?o
        |FROM NAMED WINDOW ex:w1 ON STREAM ex:stream1 [RANGE 1000 STEP 1000]
        |FROM NAMED WINDOW ex:w2 ON STREAM ex:stream2 [RANGE 1000 STEP 1000]
        |WHERE {
        |    WINDOW ex:w1 { ?s ex:a ?o . }
        |    WINDOW ex:w2 { ?s ex:a ?o . }
        |}""".stripMargin
    val p = new LiveStreamProcessing(spark, q)
    p.registerStream("http://example.org/stream1")
    p.registerStream("http://example.org/stream2")
    p.startProcessing()
    // identical (s,o) in both streams so the cross-window join matches
    p.addEvent("http://example.org/stream1",
      RdfEvent(50L, "http://example.org/x", "http://example.org/a", "1", ""))
    p.addEvent("http://example.org/stream2",
      RdfEvent(100L, "http://example.org/x", "http://example.org/a", "1", ""))
    // stream1 reaches 1000 → ONLY w1 fires (merging w2's content);
    // w2's own stream time is still 100, so w2 must not fire yet
    p.closeStream("http://example.org/stream1", 1000)
    val first = p.collectResults()
    assert(first.length === 1, s"expected exactly one fire, got $first")
    // stream2 reaches 1000 → now w2 fires too
    p.closeStream("http://example.org/stream2", 1000)
    val second = p.collectResults()
    assert(second.length === 1, s"expected exactly one more fire, got $second")
  }

  test("buffers evict events no future window can cover") {
    val p = new LiveStreamProcessing(spark, basicQuery) // RANGE 1000 STEP 300
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    (0 until 20).foreach(i => p.addEvent("http://example.org/stream1",
      RdfEvent(i * 50L, s"http://example.org/s$i", "http://example.org/p",
        s"$i", "")))
    // some early events already dropped as windows fired during the adds
    assert(p.bufferedEventCount <= 20)
    // advance far past the events: everything below nextClose-range drops
    p.closeStream("http://example.org/stream1", 60000)
    assert(p.bufferedEventCount <= 1) // only the sentinel can remain
  }

  test("literal and IRI objects both flow through") {
    val p = new LiveStreamProcessing(spark, basicQuery)
    p.registerStream("http://example.org/stream1")
    p.startProcessing()
    p.addEvent("http://example.org/stream1",
      RdfEvent(100L, "http://example.org/s", "http://example.org/p",
        "http://example.org/obj", ""))
    p.addEvent("http://example.org/stream1",
      RdfEvent(150L, "http://example.org/s", "http://example.org/p",
        "plain text", ""))
    p.closeStream("http://example.org/stream1", 300)
    val objs = p.collectResults().map(_.bindings("o")).toSet
    assert(objs === Set("http://example.org/obj", "plain text"))
  }
}
