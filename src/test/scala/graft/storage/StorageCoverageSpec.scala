package graft.storage

import graft.TestSpark
import graft.core.RdfEvent
import graft.sources.{InMemorySource, MqttAdapter}

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Coverage for the remaining storage/source pieces: explicit
  * dictionary (S9/S10), memory tracker (S13), stream-source seam +
  * MQTT semantics (S3/S4). */
class StorageCoverageSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("dictionary: encode/decode roundtrip preserves quads " +
      "(dictionary_encoding_test.rs contract)") {
    val quads = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://e.org/a", "http://e.org/p", "v1", ""),
      RdfEvent(2, "http://e.org/b", "http://e.org/p", "v2", "http://g.org/g")))
    val dict = new Dictionary(spark,
      Files.createTempDirectory("dict").resolve("d").toString)
    dict.build(quads)
    val encoded = dict.encode(quads)
    // all four term columns became longs
    assert(encoded.schema.fields.count(_.dataType ==
      org.apache.spark.sql.types.LongType) === 5)
    val decoded = dict.decode(encoded)
    val got = decoded.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(got === Set(
      (1L, "http://e.org/a", "http://e.org/p", "v1", ""),
      (2L, "http://e.org/b", "http://e.org/p", "v2", "http://g.org/g")))
  }

  test("dictionary: incremental build keeps old ids, range query parity") {
    val q1 = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://e.org/a", "http://e.org/p", "v1", "")))
    val q2 = RdfEvent.toDF(spark, Seq(
      RdfEvent(5, "http://e.org/b", "http://e.org/p", "v2", "")))
    val dict = new Dictionary(spark,
      Files.createTempDirectory("dict2").resolve("d").toString)
    dict.build(q1)
    val idsBefore = dict.table().collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    dict.build(q2)
    val idsAfter = dict.table().collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    idsBefore.foreach { case (v, id) => assert(idsAfter(v) === id) }
    assert(idsAfter.values.toSeq.distinct.size === idsAfter.size)
    // time-range semantics identical through encode/decode
    val union = q1.union(q2)
    val decodedRange = dict.decode(dict.encode(union))
      .where("timestamp between 2 and 9").collect()
    assert(decodedRange.length === 1 && decodedRange(0).getString(1)
      === "http://e.org/b")
  }

  test("memory tracker samples RSS with peak/avg") {
    val t = new MemoryTracker(intervalMs = 10)
    t.start()
    // poll rather than a fixed sleep: under a loaded box the sampler
    // thread can be starved for tens of milliseconds
    val deadline = System.nanoTime() + 10_000_000_000L
    while (t.stats.samples < 2 && System.nanoTime() < deadline)
      Thread.sleep(10)
    val stats = t.stop()
    assert(stats.samples >= 2)
    assert(stats.peakBytes > 0)
    assert(stats.avgBytes > 0 && stats.avgBytes <= stats.peakBytes)
  }

  test("in-memory stream source: topic-filtered callbacks, stop") {
    val src = new InMemorySource
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    src.subscribe(Seq("t1"), ev => seen += ev.subject)
    src.publish("t1", RdfEvent(1, "http://e.org/a", "p", "o", ""))
    src.publish("t2", RdfEvent(2, "http://e.org/b", "p", "o", ""))
    src.stop()
    src.publish("t1", RdfEvent(3, "http://e.org/c", "p", "o", ""))
    assert(seen.toSeq === Seq("http://e.org/a"))
  }

  test("MQTT URI parsing incl. legacy fallback (janus_api.rs:846-880)") {
    assert(MqttAdapter.parseMqttUri("mqtt://broker.example:1884/sensors/temp")
      === MqttAdapter.MqttEndpoint("broker.example", 1884, "sensors/temp"))
    assert(MqttAdapter.parseMqttUri("mqtts://secure.example/topic")
      === MqttAdapter.MqttEndpoint("secure.example", 1883, "topic"))
    assert(MqttAdapter.parseMqttUri("http://example.org/sensors")
      === MqttAdapter.MqttEndpoint("localhost", 1883, "sensors"))
    // pathless URI → topic "default" (empty topic filters are illegal)
    assert(MqttAdapter.parseMqttUri("mqtt://broker:1883")
      === MqttAdapter.MqttEndpoint("broker", 1883, "default"))
    assert(MqttAdapter.parseMqttUri("mqtt://broker/")
      === MqttAdapter.MqttEndpoint("broker", 1883, "default"))
  }

  test("MQTT payload semantics: timestamp overwritten, graph cleared " +
      "(mqtt_subscriber.rs:146-152)") {
    val r = MqttAdapter.handlePayload(
      """123 <http://e.org/s> <http://e.org/p> "v" <http://g.org/g> .""",
      () => 999L)
    val ev = r.toOption.get
    assert(ev.timestamp === 999L)
    assert(ev.graph === "")
    assert(ev.subject === "http://e.org/s")
    assert(MqttAdapter.handlePayload("garbage", () => 0L).isLeft)
  }
}
