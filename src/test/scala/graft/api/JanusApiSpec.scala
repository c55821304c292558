package graft.api

import graft.TestSpark
import graft.core.RdfEvent
import graft.janusql.BaselineMode

import org.scalatest.funsuite.AnyFunSuite

/** Ports the lifecycle flows of
  * `/root/reference/tests/janus_api_integration_test.rs`: register/
  * start/stop, duplicate-start error, status transitions, historical-
  * only and hybrid runs with baseline warm-up. */
class JanusApiSpec extends AnyFunSuite {

  import JanusApi._

  private lazy val spark = TestSpark.spark

  /** Historical store: sensor readings at ts 0..9000 (ms), value 20+i. */
  private lazy val store = RdfEvent.toDF(spark, (0 until 10).map(i =>
    RdfEvent(i * 1000L, s"http://example.org/sensor${i % 2}",
      "http://example.org/reading", (20 + i).toString, "")))

  private def newApi(clockMs: Long = 10000L): (JanusApi, QueryRegistry) = {
    val registry = new QueryRegistry()
    (new JanusApi(spark, registry, _ => store, () => clockMs), registry)
  }

  private val historicalOnly =
    """PREFIX ex: <http://example.org/>
      |SELECT ?sensor ?reading
      |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 5000]
      |WHERE {
      |    WINDOW ex:hist { ?sensor ex:reading ?reading }
      |}""".stripMargin

  test("register stores without executing; duplicate registration errors") {
    val (api, registry) = newApi()
    api.registerQuery("q1", historicalOnly)
    assert(registry.get("q1").isDefined)
    assert(api.status("q1") === Some(ExecutionStatus.Registered))
    assertThrows[ApiException](api.registerQuery("q1", historicalOnly))
  }

  test("malformed query fails registration with ParseError") {
    val (api, _) = newApi()
    assertThrows[ApiException](api.registerQuery("bad",
      """PREFIX ex: <http://example.org/>
        |SELECT ?s
        |FROM NAMED WINDOW ex:w ON LOG ex:store [RANGE 10 STEP 5]
        |WHERE { WINDOW ex:w { ?s ex:v ?v } }""".stripMargin))
  }

  test("historical-only fixed window: one Historical batch, " +
      "then Completed (janus_api_integration_test.rs:133-191)") {
    val (api, registry) = newApi()
    api.registerQuery("q1", historicalOnly)
    val handle = api.startQuery("q1")
    val result = handle.receive(10000).getOrElse(fail("no result"))
    assert(result.source === ResultSource.Historical)
    assert(result.timestamp === 5000L)
    // readings at ts 0..5000 → 6 solutions
    assert(result.bindings.length === 6)
    assert(result.bindings.forall(_.contains("sensor")))
    // worker finishes → Completed
    val deadline = System.currentTimeMillis() + 10000
    while (handle.status != ExecutionStatus.Completed &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(handle.status === ExecutionStatus.Completed)
    assert(registry.executionCount("q1") === 1)
  }

  test("duplicate start errors; unknown query errors") {
    val (api, _) = newApi()
    api.registerQuery("q1", historicalOnly)
    api.startQuery("q1")
    assertThrows[ApiException](api.startQuery("q1"))
    assertThrows[ApiException](api.startQuery("nope"))
    api.stopQuery("q1")
  }

  test("stop transitions to Stopped; restart works after stop") {
    val (api, _) = newApi()
    api.registerQuery("q1", historicalOnly)
    val h = api.startQuery("q1")
    api.stopQuery("q1")
    assert(h.status === ExecutionStatus.Stopped)
    // api.status remembers the stop even though the handle left the
    // running map (the reference's status machine does not forget)
    assert(api.status("q1") === Some(ExecutionStatus.Stopped))
    val h2 = api.startQuery("q1")
    assert(h2.receive(10000).isDefined)
    assert(api.status("q1") !== Some(ExecutionStatus.Stopped))
    api.stopQuery("q1")
  }

  test("historical sliding window emits one batch per window") {
    val (api, registry) = newApi(clockMs = 9000)
    api.registerQuery("qs",
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor ?reading
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [OFFSET 6000 RANGE 3000 STEP 3000]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:reading ?reading }
        |}""".stripMargin)
    val handle = api.startQuery("qs")
    // windows: [3000,6000],[6000,9000],[9000,9000] → 3 batches
    val batches = (1 to 3).flatMap(_ => handle.receive(10000))
    assert(batches.length === 3)
    assert(batches.forall(_.source === ResultSource.Historical))
    assert(batches.map(_.bindings.length).sum === 4 + 4 + 1)
    assert(registry.executionCount("qs") === 3)
  }

  test("sliding windows with zero solutions still emit an (empty) batch " +
      "(janus_api.rs:276-298)") {
    // clock 15000, base 9000 → windows [9000,12000],[12000,15000],
    // [15000,15000]; only ts 9000 exists → batches of 1, 0, 0 rows
    val (api, registry) = newApi(clockMs = 15000)
    api.registerQuery("qe",
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor ?reading
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [OFFSET 6000 RANGE 3000 STEP 3000]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:reading ?reading }
        |}""".stripMargin)
    val handle = api.startQuery("qe")
    val batches = (1 to 3).flatMap(_ => handle.receive(10000))
    assert(batches.length === 3)
    assert(batches.map(_.bindings.length) === Seq(1, 0, 0))
    assert(registry.executionCount("qe") === 3)
  }

  test("hybrid query: WarmingBaseline → Running, live joins baseline " +
      "(janus_api_integration_test.rs:624-682)") {
    val (api, _) = newApi()
    api.registerQuery("hybrid",
      """PREFIX ex: <http://example.org/>
        |PREFIX baseline: <https://janus.rs/baseline#>
        |PREFIX janus: <https://janus.rs/fn#>
        |REGISTER RStream ex:out AS
        |SELECT ?sensor ?live ?hist
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 9000]
        |FROM NAMED WINDOW ex:live ON STREAM ex:liveStream [RANGE 1000 STEP 1000]
        |USING BASELINE ex:hist AGGREGATE
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:reading ?hist }
        |    WINDOW ex:live { ?sensor ex:reading ?live }
        |    ?sensor baseline:hist ?mean .
        |    FILTER(janus:absolute_threshold_exceeded(?live, ?mean, 10))
        |}""".stripMargin)
    val handle = api.startQuery("hybrid")
    assert(handle.status === ExecutionStatus.WarmingBaseline ||
      handle.status === ExecutionStatus.Running)
    assert(handle.awaitWarmup())
    assert(handle.status === ExecutionStatus.Running)

    // sensor0 historical readings: 20,22,24,26,28 → mean 24
    val live = handle.live.getOrElse(fail("no live processor"))
    live.addEvent("http://example.org/liveStream",
      RdfEvent(100L, "http://example.org/sensor0",
        "http://example.org/reading", "40", "")) // |40-24| > 10 → anomaly
    live.addEvent("http://example.org/liveStream",
      RdfEvent(200L, "http://example.org/sensor1",
        "http://example.org/reading", "26", "")) // sensor1 mean 25 → fine
    live.closeStream("http://example.org/liveStream", 1000)

    val deadline = System.currentTimeMillis() + 10000
    var liveResults = Seq.empty[QueryResult]
    while (liveResults.isEmpty && System.currentTimeMillis() < deadline) {
      liveResults = Iterator.continually(handle.tryReceive())
        .takeWhile(_.isDefined).flatten
        .filter(_.source == ResultSource.Live).toSeq
      if (liveResults.isEmpty) Thread.sleep(50)
    }
    assert(liveResults.nonEmpty, "expected a live anomaly result")
    val b = liveResults.head.bindings.head
    assert(b("sensor") === "http://example.org/sensor0")
    assert(b("live") === "40")
    api.stopQuery("hybrid")
  }

  test("historical window ON STREAM scopes to the stream's named graph " +
      "(janusql_parser.rs:556-558)") {
    // quads from two streams, tagged with their stream graph
    val multi = RdfEvent.toDF(spark, Seq(
      RdfEvent(100L, "http://example.org/a", "http://example.org/reading",
        "1", "http://example.org/streamA"),
      RdfEvent(200L, "http://example.org/b", "http://example.org/reading",
        "2", "http://example.org/streamB")))
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => multi, () => 10000L)
    api.registerQuery("qstream",
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor ?reading
        |FROM NAMED WINDOW ex:hist ON STREAM ex:streamA [START 0 END 5000]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:reading ?reading }
        |}""".stripMargin)
    val handle = api.startQuery("qstream")
    val result = handle.receive(10000).getOrElse(fail("no result"))
    // only streamA's quad matches the GRAPH <streamA> scope
    assert(result.bindings.map(_("sensor")) === Seq("http://example.org/a"))
  }

  test("scale-live mode runs the hybrid query through CompiledLiveStream " +
      "with the same results as the parity path") {
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => store, () => 10000L,
      scaleLiveLogFactory = Some(id => new graft.storage.EventLog(spark,
        java.nio.file.Files.createTempDirectory(s"scale-live-$id")
          .resolve("log").toString, bucketMs = 1000L)))
    api.registerQuery("hybrid2",
      """PREFIX ex: <http://example.org/>
        |PREFIX baseline: <https://janus.rs/baseline#>
        |PREFIX janus: <https://janus.rs/fn#>
        |REGISTER RStream ex:out AS
        |SELECT ?sensor ?live ?hist
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 9000]
        |FROM NAMED WINDOW ex:live ON STREAM ex:liveStream [RANGE 1000 STEP 1000]
        |USING BASELINE ex:hist AGGREGATE
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:reading ?hist }
        |    WINDOW ex:live { ?sensor ex:reading ?live }
        |    ?sensor baseline:hist ?mean .
        |    FILTER(janus:absolute_threshold_exceeded(?live, ?mean, 10))
        |}""".stripMargin)
    val handle = api.startQuery("hybrid2")
    assert(handle.live.isEmpty)
    assert(handle.compiledLive.isDefined)
    assert(handle.awaitWarmup())
    assert(handle.status === ExecutionStatus.Running)
    // same feed as the parity-path hybrid test: sensor0 anomaly (mean
    // 24, live 40), sensor1 in range; a sentinel advances time to fire
    handle.addLiveEvents("http://example.org/liveStream", Seq(
      RdfEvent(100L, "http://example.org/sensor0",
        "http://example.org/reading", "40", ""),
      RdfEvent(200L, "http://example.org/sensor1",
        "http://example.org/reading", "26", ""),
      RdfEvent(1000L,
        graft.streaming.LiveStreamProcessing.SentinelSubject,
        graft.streaming.LiveStreamProcessing.SentinelPredicate,
        graft.streaming.LiveStreamProcessing.SentinelObject, "")))
    val deadline = System.currentTimeMillis() + 10000
    var liveResults = Seq.empty[QueryResult]
    while (liveResults.isEmpty && System.currentTimeMillis() < deadline) {
      liveResults = Iterator.continually(handle.tryReceive())
        .takeWhile(_.isDefined).flatten
        .filter(_.source == ResultSource.Live).toSeq
      if (liveResults.isEmpty) Thread.sleep(50)
    }
    assert(liveResults.nonEmpty, "expected a live anomaly result")
    val b = liveResults.head.bindings.head
    assert(b("sensor") === "http://example.org/sensor0")
    assert(b("live") === "40")
    api.stopQuery("hybrid2")
  }

  test("registry enforces max queries and supports unregister/list") {
    val registry = new QueryRegistry(maxQueries = Some(1))
    val api = new JanusApi(spark, registry, _ => store)
    api.registerQuery("a", historicalOnly)
    assertThrows[ApiException](api.registerQuery("b", historicalOnly))
    assert(registry.list.map(_.queryId) === Seq("a"))
    assert(registry.unregister("a"))
    api.registerQuery("b", historicalOnly)
    assert(registry.list.map(_.queryId) === Seq("b"))
  }
}
