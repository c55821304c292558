package graft.sources

import graft.core.RdfEvent

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream,
  OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

/** Minimal MQTT 3.1.1 transport (CONNECT, SUBSCRIBE at QoS 1 with
  * PUBACK receipts — the reference subscribes at QoS::AtLeastOnce,
  * `mqtt_subscriber.rs:122` — PUBLISH at QoS 0, PINGREQ keep-alive,
  * DISCONNECT) on the JDK socket API — the concrete connector behind
  * the [[StreamSource]] seam, completing S3
  * (`/root/reference/src/stream/mqtt_subscriber.rs:100-191`, which
  * subscribes via rumqttc and feeds parsed events to the live engine).
  *
  * Scope: exact-match topic filters; no TLS, retained messages, wills,
  * or session resumption: the reference exercises none of them.
  */
object Mqtt {

  // packet types
  val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3; val PUBACK = 4
  val SUBSCRIBE = 8
  val SUBACK = 9; val PINGREQ = 12; val PINGRESP = 13; val DISCONNECT = 14

  final case class Packet(packetType: Int, flags: Int, body: Array[Byte])

  def writePacket(out: OutputStream, packetType: Int, flags: Int,
      body: Array[Byte]): Unit = out.synchronized {
    out.write((packetType << 4) | (flags & 0x0F))
    // remaining length varint (7 bits per byte, MSB = continuation)
    var n = body.length
    do {
      val digit = n % 128
      n /= 128
      out.write(if (n > 0) digit | 0x80 else digit)
    } while (n > 0)
    out.write(body)
    out.flush()
  }

  /** Blocking read of one packet; None at EOF. */
  def readPacket(in: InputStream): Option[Packet] = {
    val b0 = in.read()
    if (b0 == -1) return None
    var len = 0
    var shift = 0
    var cont = true
    while (cont) {
      val b = in.read()
      if (b == -1) return None
      len |= (b & 0x7F) << shift
      shift += 7
      cont = (b & 0x80) != 0
      if (shift > 28) throw new IllegalArgumentException(
        "malformed remaining length")
    }
    val body = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(body, off, len - off)
      if (r < 0) return None
      off += r
    }
    Some(Packet((b0 >> 4) & 0x0F, b0 & 0x0F, body))
  }

  def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length < 65536, "string too long for MQTT")
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xFF).toByte) ++ b
  }

  def readUtf8(body: Array[Byte], off: Int): (String, Int) = {
    val len = ((body(off) & 0xFF) << 8) | (body(off + 1) & 0xFF)
    (new String(body, off + 2, len, StandardCharsets.UTF_8), off + 2 + len)
  }

  def connectBody(clientId: String, keepAliveSecs: Int): Array[Byte] =
    utf8("MQTT") ++ Array[Byte](4 /* 3.1.1 */, 0x02 /* clean session */,
      (keepAliveSecs >> 8).toByte, (keepAliveSecs & 0xFF).toByte) ++
      utf8(clientId)

  def subscribeBody(packetId: Int, topics: Seq[String]): Array[Byte] =
    Array[Byte]((packetId >> 8).toByte, (packetId & 0xFF).toByte) ++
      topics.flatMap(t => utf8(t) ++
        Array[Byte](1 /* QoS 1 = AtLeastOnce, mqtt_subscriber.rs:122 */))
        .toArray

  def publishBody(topic: String, payload: Array[Byte]): Array[Byte] =
    utf8(topic) ++ payload // QoS 0: no packet id
}

/** One MQTT 3.1.1 connection: connect on construction, then
  * [[subscribeTopics]] + [[publish]]; inbound PUBLISH packets reach
  * `onMessage(topic, payload)` from a daemon reader thread. */
final class MqttConnection(host: String, port: Int, clientId: String,
    keepAliveSecs: Int = 30,
    onMessage: (String, Array[Byte]) => Unit = (_, _) => ()) {

  import Mqtt._

  private val socket = new Socket(host, port)
  socket.setSoTimeout(0)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  @volatile private var closed = false
  private val packetIds = new AtomicLong(1)

  // CONNECT → CONNACK rc=0
  writePacket(out, CONNECT, 0, connectBody(clientId, keepAliveSecs))
  readPacket(in) match {
    case Some(Packet(CONNACK, _, body)) if body.length >= 2 && body(1) == 0 =>
    case other => throw new java.io.IOException(
      s"MQTT connect refused: $other")
  }

  private val reader = new Thread(() => {
    try {
      var running = true
      while (running && !closed) {
        readPacket(in) match {
          case Some(Packet(PUBLISH, flags, body)) =>
            val qos = (flags >> 1) & 0x3
            val (topic, off) = readUtf8(body, 0)
            // QoS > 0: a 2-byte packet id precedes the payload and the
            // broker expects a PUBACK receipt (at-least-once delivery)
            val payloadOff = if (qos > 0) off + 2 else off
            if (qos > 0)
              writePacket(out, PUBACK, 0,
                Array[Byte](body(off), body(off + 1)))
            onMessage(topic, body.drop(payloadOff))
          case Some(Packet(PINGRESP, _, _)) => ()
          case Some(Packet(SUBACK, _, _))   => ()
          case Some(_)                      => ()
          case None                         => running = false
        }
      }
    } catch { case _: Exception => () }
  }, s"mqtt-reader-$clientId")
  reader.setDaemon(true)
  reader.start()

  // keep-alive pings at half the negotiated interval
  private val pinger = new Thread(() => {
    try {
      while (!closed) {
        Thread.sleep(math.max(keepAliveSecs * 500L, 1000L))
        if (!closed) writePacket(out, PINGREQ, 0, Array.emptyByteArray)
      }
    } catch { case _: Exception => () }
  }, s"mqtt-pinger-$clientId")
  pinger.setDaemon(true)
  pinger.start()

  def subscribeTopics(topics: Seq[String]): Unit =
    writePacket(out, SUBSCRIBE, 0x2,
      subscribeBody((packetIds.getAndIncrement() & 0xFFFF).toInt, topics))

  def publish(topic: String, payload: Array[Byte]): Unit =
    writePacket(out, PUBLISH, 0, publishBody(topic, payload))

  def close(): Unit = {
    closed = true
    try writePacket(out, DISCONNECT, 0, Array.emptyByteArray)
    catch { case _: Exception => () }
    try socket.close() catch { case _: Exception => () }
  }
}

/** [[StreamSource]] over the MQTT transport with the reference's
  * payload semantics: each message is one N-Quads line, the event
  * timestamp is overwritten with arrival time and the graph cleared
  * (`mqtt_subscriber.rs:146-152` via [[MqttAdapter.handlePayload]]).
  * Parse failures are counted, not thrown (`rs:153-158`). */
final class MqttStreamSource(host: String, port: Int,
    clientId: String = "graft_subscriber",
    now: () => Long = () => System.currentTimeMillis())
    extends StreamSource {

  private val received = new AtomicLong
  private val errors = new AtomicLong
  @volatile private var conn: Option[MqttConnection] = None
  @volatile private var cb: RdfEvent => Unit = _ => ()

  def eventsReceived: Long = received.get
  def parseErrors: Long = errors.get

  override def subscribe(topics: Seq[String],
      callback: RdfEvent => Unit): Unit = {
    // a re-subscribe replaces the connection — close the old one or its
    // socket and reader thread leak and keep delivering to the new
    // callback
    conn.foreach(_.close())
    cb = callback
    val c = new MqttConnection(host, port, clientId,
      onMessage = (_, payload) =>
        MqttAdapter.handlePayload(
          new String(payload, StandardCharsets.UTF_8), now) match {
          case Right(ev) =>
            received.incrementAndGet()
            cb(ev)
          case Left(_) => errors.incrementAndGet()
        })
    conn = Some(c)
    c.subscribeTopics(topics)
  }

  override def stop(): Unit = {
    conn.foreach(_.close())
    conn = None
  }
}
