package graft.http

import graft.TestSpark
import graft.api.{JanusApi, QueryRegistry}
import graft.core.RdfEvent

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, WebSocket}
import java.util.concurrent.{CompletionException, CountDownLatch,
  CopyOnWriteArrayList, TimeUnit}

/** WebSocket result feed against the reference's WS contract
  * (`server.rs:475-548`): RFC 6455 handshake, result JSON messages with
  * `query_id`/`timestamp`/`source`/`bindings`, replay on connect,
  * clean close. The CLIENT is the JDK's own RFC 6455 implementation —
  * a spec-compliant peer, not a hand-rolled twin of the server. */
class WebSocketResultServerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val store = RdfEvent.toDF(spark, (0 until 6).map(i =>
    RdfEvent(i * 1000L, s"http://example.org/sensor${i % 2}",
      "http://example.org/reading", (20 + i).toString, "")))

  private val registerBody =
    """{"query_id": "q1", "janusql": "PREFIX ex: <http://example.org/>\nSELECT ?sensor ?reading\nFROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 5000]\nWHERE {\n WINDOW ex:hist { ?sensor ex:reading ?reading }\n}"}"""

  private def withServers(f: (HttpClient, String, String) => Unit): Unit = {
    val registry = new QueryRegistry()
    val api = new JanusApi(spark, registry, _ => store, () => 10000L)
    val rest = new HttpApiServer(api, registry, sseIdleTimeoutMs = 3000)
    rest.start()
    val ws = new WebSocketResultServer(rest, idleTimeoutMs = 5000)
    ws.start()
    try f(HttpClient.newHttpClient(),
      s"http://127.0.0.1:${rest.boundPort}",
      s"ws://127.0.0.1:${ws.boundPort}")
    finally {
      ws.stop()
      rest.stop()
    }
  }

  private def post(c: HttpClient, url: String, body: String = "")
      : HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("handshake + result messages in the reference schema, then " +
      "clean close") {
    withServers { (c, rest, ws) =>
      assert(post(c, s"$rest/api/queries", registerBody).statusCode() === 201)
      assert(post(c, s"$rest/api/queries/q1/start").statusCode() === 200)
      // give the historical worker a moment to produce into the replay
      // ring, then connect — replay-on-connect must deliver results
      Thread.sleep(1500)

      val messages = new CopyOnWriteArrayList[String]()
      val gotMessage = new CountDownLatch(1)
      val closed = new CountDownLatch(1)
      val listener = new WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(w: WebSocket, data: CharSequence,
            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) {
            messages.add(sb.toString)
            sb.setLength(0)
            gotMessage.countDown()
          }
          w.request(1)
          null
        }
        override def onClose(w: WebSocket, code: Int, reason: String)
            : java.util.concurrent.CompletionStage[_] = {
          closed.countDown()
          null
        }
      }
      val socket = c.newWebSocketBuilder()
        .buildAsync(URI.create(s"$ws/api/queries/q1/results"), listener)
        .join()
      assert(gotMessage.await(15, TimeUnit.SECONDS),
        "no result message within 15s")
      val msg = messages.get(0)
      assert(msg.contains("\"query_id\":\"q1\""))
      assert(msg.contains("\"source\":\"Historical\""))
      assert(msg.contains("\"bindings\":"))
      // R11 wire convention over WS too
      assert(msg.contains("<http://example.org/sensor0>") ||
        msg.contains("<http://example.org/sensor1>"))
      assert(msg.contains("XMLSchema#decimal"))
      // client-initiated close is echoed (JDK client completes onClose)
      socket.sendClose(WebSocket.NORMAL_CLOSURE, "done").join()
      assert(closed.await(10, TimeUnit.SECONDS), "no close echo within 10s")
    }
  }

  test("unknown / not-running query fails the handshake") {
    withServers { (c, _, ws) =>
      val ex = intercept[CompletionException] {
        c.newWebSocketBuilder()
          .buildAsync(URI.create(s"$ws/api/queries/nope/results"),
            new WebSocket.Listener {})
          .join()
      }
      assert(ex.getCause != null)
    }
  }

  test("non-results paths are rejected") {
    withServers { (c, _, ws) =>
      val ex = intercept[CompletionException] {
        c.newWebSocketBuilder()
          .buildAsync(URI.create(s"$ws/api/other"),
            new WebSocket.Listener {})
          .join()
      }
      assert(ex.getCause != null)
    }
  }
}
