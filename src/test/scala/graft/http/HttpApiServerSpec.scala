package graft.http

import graft.TestSpark
import graft.api.{JanusApi, QueryRegistry}
import graft.core.RdfEvent

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** REST contract tests against `docs/HTTP_API_CURRENT.md` /
  * `http_server_integration_test.rs` flows. */
class HttpApiServerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val store = RdfEvent.toDF(spark, (0 until 6).map(i =>
    RdfEvent(i * 1000L, s"http://example.org/sensor${i % 2}",
      "http://example.org/reading", (20 + i).toString, "")))

  private def withServer(f: (HttpClient, String) => Unit): Unit = {
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => store, () => 10000L)
    val server = new HttpApiServer(api, registry, sseIdleTimeoutMs = 3000)
    server.start()
    try f(HttpClient.newHttpClient(),
      s"http://127.0.0.1:${server.boundPort}")
    finally server.stop()
  }

  private def get(c: HttpClient, url: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(c: HttpClient, url: String, body: String = "")
      : HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def delete(c: HttpClient, url: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())

  private val registerBody =
    """{"query_id": "q1", "janusql": "PREFIX ex: <http://example.org/>\nSELECT ?sensor ?reading\nFROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 5000]\nWHERE {\n WINDOW ex:hist { ?sensor ex:reading ?reading }\n}"}"""

  test("health endpoint") {
    withServer { (c, base) =>
      val r = get(c, s"$base/health")
      assert(r.statusCode() === 200)
      assert(r.body().contains("\"status\":\"ok\""))
    }
  }

  test("full lifecycle: register → list → details → start → results → " +
      "stop → delete") {
    withServer { (c, base) =>
      // register
      val reg = post(c, s"$base/api/queries", registerBody)
      assert(reg.statusCode() === 201, reg.body())
      // duplicate register → 400
      assert(post(c, s"$base/api/queries", registerBody).statusCode() === 400)
      // list
      val list = get(c, s"$base/api/queries")
      assert(list.body().contains("\"q1\"") && list.body().contains("\"total\":1"))
      // details
      val det = get(c, s"$base/api/queries/q1")
      assert(det.statusCode() === 200)
      assert(det.body().contains("\"status\":\"Registered\""))
      assert(det.body().contains("\"is_running\":false"))
      // start
      assert(post(c, s"$base/api/queries/q1/start").statusCode() === 200)
      // SSE results: expect at least one data: line with bindings
      val sse = get(c, s"$base/api/queries/q1/results")
      assert(sse.statusCode() === 200)
      assert(sse.body().contains("\"source\":\"Historical\""))
      assert(sse.body().contains("\"sensor\""))
      // R11 wire convention: IRI bindings arrive angle-bracketed,
      // numeric literals typed as xsd:decimal
      assert(sse.body().contains("<http://example.org/sensor0>"))
      assert(sse.body().contains("XMLSchema#decimal"))
      // delete while running → 409
      assert(delete(c, s"$base/api/queries/q1").statusCode() === 409)
      // stop, then delete
      assert(post(c, s"$base/api/queries/q1/stop").statusCode() === 200)
      // a stopped query is no longer subscribable: 404, not a replay of
      // stale pre-stop results
      assert(get(c, s"$base/api/queries/q1/results").statusCode() === 404)
      assert(delete(c, s"$base/api/queries/q1").statusCode() === 200)
      assert(get(c, s"$base/api/queries/q1").statusCode() === 404)
    }
  }

  test("JSON unescape handles escaped backslashes before letter escapes") {
    // C:\node must survive; the naive replace-chain turned it into
    // C:<newline>ode
    assert(HttpApiServer.jfield("""{"x":"C:\\node"}""", "x")
      === Some("C:\\node"))
    assert(HttpApiServer.jfield("""{"x":"a\\\\nb"}""", "x")
      === Some("a\\\\nb"))
    assert(HttpApiServer.jfield("""{"x":"line\nnext"}""", "x")
      === Some("line\nnext"))
    assert(HttpApiServer.jfield("""{"x":"q\"end"}""", "x")
      === Some("q\"end"))
    assert(HttpApiServer.jfield("{\"x\":\"u\\" + "u0041b\"}", "x")
      === Some("uAb"))
  }

  test("error paths: malformed register, unknown id, bad baseline mode") {
    withServer { (c, base) =>
      assert(post(c, s"$base/api/queries", """{"nope": 1}""")
        .statusCode() === 400)
      assert(post(c, s"$base/api/queries",
        registerBody.dropRight(1) + ""","baseline_mode":"sometimes"}""")
        .statusCode() === 400)
      assert(get(c, s"$base/api/queries/unknown").statusCode() === 404)
      assert(post(c, s"$base/api/queries/unknown/start").statusCode() === 400)
      assert(get(c, s"$base/nope").statusCode() === 404)
    }
  }

  test("degraded storage → 503 with degraded payload " +
      "(segmented_storage_error_test contract)") {
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => store)
    val server = new HttpApiServer(api, registry,
      storageHealth = () => Some("Background flush failed: disk full"))
    server.start()
    try {
      val r = get(HttpClient.newHttpClient(),
        s"http://127.0.0.1:${server.boundPort}/health")
      assert(r.statusCode() === 503)
      assert(r.body().contains("\"status\":\"degraded\""))
      assert(r.body().contains("disk full"))
    } finally server.stop()
  }

  test("ops status reports storage, replay and query-lifecycle counts " +
      "(OpsStatusResponse shape, server.rs:166-174)") {
    withServer { (c, base) =>
      post(c, s"$base/api/queries", registerBody)
      val r = get(c, s"$base/ops/status")
      assert(r.statusCode() === 200)
      assert(r.body().contains("\"total_registered_queries\":1"))
      assert(r.body().contains("\"registered_queries\":1"))
      assert(r.body().contains("\"running_queries\":0"))
      assert(r.body().contains("\"storage\":{\"status\":\"ok\""))
      assert(r.body().contains("\"replay\":{\"is_running\":false"))
      assert(r.body().contains("\"spools\":{\"count\":"),
        "ops status must report standing-state spool footprint")
    }
  }

  test("ops status reports a live DeltaFrame spool's name, size and " +
      "placement (standing-state footprint, round-16 verdict #6)") {
    import spark.implicits._
    val fold = new graft.streaming.StructuredStreams
      .StreamingLineDedup("doc_id", "text")
    try {
      fold.fold(Seq((1L, "one line\nanother line")).toDF("doc_id", "text"))
      withServer { (c, base) =>
        val r = get(c, s"$base/ops/status")
        assert(r.statusCode() === 200)
        val b = r.body()
        assert(b.contains("\"spools\":{\"count\":"), b.take(400))
        // at least one spool present, with measured nonzero size
        val m = java.util.regex.Pattern
          .compile("\"total_bytes\":(\\d+)").matcher(b)
        assert(m.find(), "total_bytes missing")
        assert(m.group(1).toLong > 0L, "spool bytes must be measured")
        assert(b.contains("\"on_tmpfs\":"))
        assert(b.contains("\"auto_placed\":"))
      }
    } finally fold.unpersist()
  }

  // ---- /api/replay/* (server.rs:281-283,550-705 +
  //      stream_bus_cli_test.rs semantics) ------------------------------

  private def withReplayServer(f: (HttpClient, String,
      graft.storage.EventLog) => Unit): Unit = {
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => store, () => 10000L)
    val dir = java.nio.file.Files.createTempDirectory("replay-http")
    val log = new graft.storage.EventLog(spark,
      dir.resolve("log").toString, bucketMs = 86400000L)
    val server = new HttpApiServer(api, registry, sseIdleTimeoutMs = 3000,
      replayBusFactory = Some(HttpApiServer.replayFactory(spark, log)))
    server.start()
    try f(HttpClient.newHttpClient(),
      s"http://127.0.0.1:${server.boundPort}", log)
    finally server.stop()
  }

  private def writeNquads(lines: Seq[String]): String = {
    val file = java.nio.file.Files.createTempFile("replay", ".nq")
    java.nio.file.Files.write(file,
      lines.mkString("\n").getBytes("UTF-8"))
    file.toString
  }

  test("replay lifecycle: start → status counters → storage landed") {
    withReplayServer { (c, base, log) =>
      val file = writeNquads((0 until 25).map(i =>
        s"""${i * 100} <http://e.org/s$i> <http://e.org/p> "$i" ."""))
      val r = post(c, s"$base/api/replay/start",
        s"""{"input_file": ${HttpApiServer.jstr(file)}, "broker_type": "none", "add_timestamps": false}""")
      assert(r.statusCode() === 200)
      assert(r.body().contains("Stream bus replay started with file"))
      // wait for the (tiny) replay to finish
      val deadline = System.currentTimeMillis() + 30000
      var status = ""
      while (System.currentTimeMillis() < deadline &&
          !status.contains("\"is_running\":false")) {
        Thread.sleep(100)
        status = get(c, s"$base/api/replay/status").body()
      }
      assert(status.contains("\"is_running\":false"))
      assert(status.contains("\"events_read\":25"))
      assert(status.contains("\"events_published\":25"))
      assert(status.contains("\"events_stored\":25"))
      assert(status.contains("\"publish_errors\":0"))
      assert(log.read().count() === 25)
      // idle status reports zero rates but keeps counters
      assert(status.contains("\"elapsed_seconds\":0"))
    }
  }

  test("replay double-start is rejected while running; stop ends it") {
    withReplayServer { (c, base, _) =>
      // slow replay (rate-limited) so it is still running at double-start
      val file = writeNquads((0 until 2000).map(i =>
        s"""${i} <http://e.org/s$i> <http://e.org/p> "$i" ."""))
      val r1 = post(c, s"$base/api/replay/start",
        s"""{"input_file": ${HttpApiServer.jstr(file)}, "rate_of_publishing": 50}""")
      assert(r1.statusCode() === 200)
      val r2 = post(c, s"$base/api/replay/start",
        s"""{"input_file": ${HttpApiServer.jstr(file)}}""")
      assert(r2.statusCode() === 400)
      assert(r2.body().contains("Replay is already running"))
      val running = get(c, s"$base/api/replay/status").body()
      assert(running.contains("\"is_running\":true"))
      val stop = post(c, s"$base/api/replay/stop")
      assert(stop.statusCode() === 200)
      assert(stop.body().contains("Stream bus replay stopped"))
      // second stop → 400 (reference: "Replay is not running")
      val stop2 = post(c, s"$base/api/replay/stop")
      assert(stop2.statusCode() === 400)
      assert(stop2.body().contains("Replay is not running"))
    }
  }

  test("replay rejects bad broker types and missing input_file") {
    withReplayServer { (c, base, _) =>
      val bad = post(c, s"$base/api/replay/start",
        """{"input_file": "/tmp/x.nq", "broker_type": "kafka"}""")
      assert(bad.statusCode() === 400)
      assert(bad.body().contains("Invalid broker type"))
      // mqtt transport is honestly unavailable in this build
      val mqtt = post(c, s"$base/api/replay/start",
        """{"input_file": "/tmp/x.nq", "broker_type": "mqtt"}""")
      assert(mqtt.statusCode() === 400)
      val missing = post(c, s"$base/api/replay/start", """{}""")
      assert(missing.statusCode() === 400)
      assert(missing.body().contains("input_file is required"))
    }
  }

  test("replay routes without a configured factory fail cleanly") {
    withServer { (c, base) =>
      val r = post(c, s"$base/api/replay/start",
        """{"input_file": "/tmp/x.nq"}""")
      assert(r.statusCode() === 400)
      assert(r.body().contains("not configured"))
      // status still answers (all-zero idle snapshot)
      val s = get(c, s"$base/api/replay/status")
      assert(s.statusCode() === 200)
      assert(s.body().contains("\"is_running\":false"))
    }
  }

  test("malformed \\uXXXX escapes decode literally instead of throwing " +
      "out of the route handler") {
    // built by concatenation — even triple-quoted Scala literals
    // pre-process \uXXXX escapes
    assert(HttpApiServer.jfield("{\"x\":\"a\\" + "uZZ99b\"}", "x")
      === Some("auZZ99b"))
    assert(HttpApiServer.jfield("{\"x\":\"tail\\" + "u00\"}", "x")
      === Some("tailu00"))
  }

  test("Subscription surfaces a lagged frame before newer results after " +
      "fan-out drops (server.rs:515-525 contract)") {
    val sub = new HttpApiServer.Subscription("qx", 4)
    (1 to 4).foreach(i => sub.fanOut(s"m$i"))
    // queue full: two more fan-outs evict the two OLDEST
    sub.fanOut("m5")
    sub.fanOut("m6")
    val first = sub.next(100)
    assert(first ===
      """{"query_id":"qx","type":"lagged","dropped_messages":2}""")
    // then the surviving newer messages, oldest-dropped first
    assert((1 to 4).map(_ => sub.next(100)) === Seq("m3", "m4", "m5", "m6"))
    assert(sub.next(10) === null)
    // counter resets: a lag-free stretch produces no second lagged frame
    sub.fanOut("m7")
    assert(sub.next(100) === "m7")
  }

  test("slow subscriber lagging past the fan-out capacity receives the " +
      "lagged frame, with dropped + delivered accounting for every result") {
    // 41 sliding-window result messages (one per window, the
    // reference's batch-per-window emission) against an 8-slot
    // subscriber queue; the subscriber does not read until the query
    // completes, so the fan-out must drop 33 and the first read must
    // surface the lagged frame, then only the newest 8 results
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => store, () => 10000L)
    val server = new HttpApiServer(api, registry, sseIdleTimeoutMs = 3000,
      replayCapacity = 8)
    server.start()
    try {
      val c = HttpClient.newHttpClient()
      val base = s"http://127.0.0.1:${server.boundPort}"
      val body =
        """{"query_id": "qbig", "janusql": "PREFIX ex: <http://example.org/>\nSELECT ?sensor ?reading\nFROM NAMED WINDOW ex:hist ON LOG ex:store [OFFSET 4000 RANGE 100 STEP 100]\nWHERE {\n WINDOW ex:hist { ?sensor ex:reading ?reading }\n}"}"""
      assert(post(c, s"$base/api/queries", body).statusCode() === 201)
      // subscribe from a racing poller so the subscription registers the
      // moment the fan-out list exists — long before the historical
      // Spark job finishes — otherwise the forwarder drains everything
      // with no subscriber and only the replay ring survives
      val subRef = new java.util.concurrent.atomic.AtomicReference[
        (HttpApiServer.Subscription, () => Unit)]()
      val poller = new Thread(() => {
        while (subRef.get == null)
          server.subscribe("qbig").foreach(subRef.set)
      })
      poller.setDaemon(true)
      poller.start()
      assert(post(c, s"$base/api/queries/qbig/start").statusCode() === 200)
      poller.join(10000)
      val (sub, unsubscribe) = subRef.get
      try {
        // wait for the historical worker to finish producing
        val deadline = System.currentTimeMillis() + 60000
        while (api.status("qbig") !=
            Some(graft.api.JanusApi.ExecutionStatus.Completed) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(api.status("qbig") ===
          Some(graft.api.JanusApi.ExecutionStatus.Completed))
        // Completed covers the worker → unified queue leg; give the
        // forwarder thread time to finish the unified queue → fan-out
        // leg so every drop happens BEFORE the first read
        Thread.sleep(2000)
        val frames = Iterator.continually(sub.next(300))
          .takeWhile(_ != null).toVector
        val (lagged, results) =
          frames.partition(_.contains("\"type\":\"lagged\""))
        assert(lagged.size === 1, s"expected one lagged frame: $frames")
        assert(frames.head === lagged.head,
          "lagged frame must precede the surviving results")
        val dropped = HttpApiServer.jnum(lagged.head, "dropped_messages")
          .get.toLong
        // 41 windows ([now-4000, now] every 100 ms incl. the empty
        // final [now, now]), 8 queue slots → exactly 33 drops; every
        // produced result is either delivered or counted dropped
        assert(dropped === 33L)
        assert(results.size === 8)
        assert(lagged.head.contains("\"query_id\":\"qbig\""))
      } finally unsubscribe()
    } finally server.stop()
  }

  test("re-registering a stopped query id reports Registered, not the " +
      "previous lifecycle's Stopped") {
    withServer { (c, base) =>
      assert(post(c, s"$base/api/queries", registerBody).statusCode() === 201)
      assert(post(c, s"$base/api/queries/q1/start").statusCode() === 200)
      assert(post(c, s"$base/api/queries/q1/stop").statusCode() === 200)
      assert(get(c, s"$base/api/queries/q1").body()
        .contains("\"status\":\"Stopped\""))
      assert(delete(c, s"$base/api/queries/q1").statusCode() === 200)
      assert(post(c, s"$base/api/queries", registerBody).statusCode() === 201)
      assert(get(c, s"$base/api/queries/q1").body()
        .contains("\"status\":\"Registered\""))
    }
  }
}
