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
      assert(delete(c, s"$base/api/queries/q1").statusCode() === 200)
      assert(get(c, s"$base/api/queries/q1").statusCode() === 404)
    }
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

  test("ops status reports query counts") {
    withServer { (c, base) =>
      post(c, s"$base/api/queries", registerBody)
      val r = get(c, s"$base/ops/status")
      assert(r.statusCode() === 200)
      assert(r.body().contains("\"registered\":1"))
    }
  }
}
