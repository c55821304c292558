package graft.sources

import graft.core.RdfEvent
import graft.parsing.NQuadsParser

/** Generic callback stream-source seam (SURVEY.md §2.1 S3/S4) — mirror
  * of `/root/reference/src/sources/stream_source.rs:6-16`: pluggable
  * event sources behind `subscribe(topics, callback)` / `stop()`, so the
  * live engine never depends on a concrete transport. Real deployments
  * plug an MQTT/Kafka connector here; tests use [[InMemorySource]].
  */
trait StreamSource {
  def subscribe(topics: Seq[String], callback: RdfEvent => Unit): Unit
  def stop(): Unit
}

/** Test/in-process source: events pushed by hand reach all subscribed
  * callbacks whose topic matches. */
final class InMemorySource extends StreamSource {
  private val subs = new java.util.concurrent.CopyOnWriteArrayList[
    (Seq[String], RdfEvent => Unit)]()
  @volatile private var stopped = false

  override def subscribe(topics: Seq[String],
      callback: RdfEvent => Unit): Unit =
    subs.add((topics, callback))

  override def stop(): Unit = stopped = true

  def publish(topic: String, ev: RdfEvent): Unit =
    if (!stopped) subs.forEach { case (topics, cb) =>
      if (topics.contains(topic)) cb(ev)
    }
}

/** MQTT-shaped source adapter (S3):
  *   - URI parsing `mqtt[s]://host:port/topic` with the legacy fallback
  *     (any other scheme → localhost:1883, last path segment as topic,
  *     `/root/reference/src/api/janus_api.rs:846-880`);
  *   - payload handling: each message parses as one N-Quads line, the
  *     timestamp is OVERWRITTEN with arrival time and the graph cleared
  *     (`src/stream/mqtt_subscriber.rs:146-152`);
  *   - [[source]] builds the concrete QoS-0 MQTT 3.1.1 transport
  *     ([[MqttStreamSource]]) for an endpoint — exercised against an
  *     in-process broker in MqttTransportSpec (the environment has no
  *     external broker).
  */
object MqttAdapter {

  /** Concrete transport for a parsed endpoint. */
  def source(endpoint: MqttEndpoint,
      clientId: String = "graft_subscriber"): MqttStreamSource =
    new MqttStreamSource(endpoint.host, endpoint.port, clientId)

  final case class MqttEndpoint(host: String, port: Int, topic: String)

  def parseMqttUri(streamUri: String): MqttEndpoint = {
    if (streamUri.startsWith("mqtt://") || streamUri.startsWith("mqtts://")) {
      val rest = streamUri.substring(streamUri.indexOf("://") + 3)
      val slash = rest.indexOf('/')
      // no path (or an empty one) → topic "default", mirroring the
      // reference (`janus_api.rs` parse_mqtt_uri); an empty MQTT topic
      // filter is illegal and brokers reject the SUBSCRIBE
      val (hostPort, rawTopic) =
        if (slash >= 0) (rest.substring(0, slash), rest.substring(slash + 1))
        else (rest, "")
      val topic = if (rawTopic.isEmpty) "default" else rawTopic
      val colon = hostPort.lastIndexOf(':')
      if (colon >= 0)
        MqttEndpoint(hostPort.substring(0, colon),
          hostPort.substring(colon + 1).toIntOption.getOrElse(1883), topic)
      else MqttEndpoint(hostPort, 1883, topic)
    } else {
      // legacy fallback: localhost broker, last path segment as topic
      val topic = streamUri.split('/').filter(_.nonEmpty).lastOption
        .getOrElse(streamUri)
      MqttEndpoint("localhost", 1883, topic)
    }
  }

  /** Reference payload semantics: parse one N-Quads line, overwrite the
    * timestamp with now, clear the graph. */
  def handlePayload(payload: String, now: () => Long)
      : Either[String, RdfEvent] =
    NQuadsParser.parseLine(payload, now).map(
      _.copy(timestamp = now(), graph = ""))
}
