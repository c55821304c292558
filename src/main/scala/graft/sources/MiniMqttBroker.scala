package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.CopyOnWriteArrayList

/** Embedded in-process MQTT 3.1.1 broker: CONNECT/CONNACK,
  * SUBSCRIBE/SUBACK, QoS-0 PUBLISH routing on exact topic match,
  * PINGREQ/PINGRESP, DISCONNECT. Exists so the real [[MqttConnection]]
  * transport can be exercised end-to-end in an egress-free
  * environment — it implements only what a QoS-0 subscriber touches. */
final class MiniMqttBroker(port: Int = 0) {

  import Mqtt._

  private val server = new ServerSocket(port)
  @volatile private var closed = false

  private final class Conn(val socket: Socket) {
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    @volatile var topics: Set[String] = Set.empty
  }

  private val conns = new CopyOnWriteArrayList[Conn]()

  def boundPort: Int = server.getLocalPort

  def start(): Unit = {
    val t = new Thread(() => {
      while (!closed) {
        try {
          val sock = server.accept()
          val conn = new Conn(sock)
          conns.add(conn)
          val handler = new Thread(() => serve(conn), "mini-mqtt-conn")
          handler.setDaemon(true)
          handler.start()
        } catch { case _: Exception => () }
      }
    }, "mini-mqtt-acceptor")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = {
    closed = true
    try server.close() catch { case _: Exception => () }
    conns.forEach(c =>
      try c.socket.close() catch { case _: Exception => () })
  }

  private def serve(conn: Conn): Unit = {
    try {
      var open = true
      while (open && !closed) {
        readPacket(conn.in) match {
          case Some(Packet(CONNECT, _, _)) =>
            writePacket(conn.out, CONNACK, 0, Array[Byte](0, 0))
          case Some(Packet(SUBSCRIBE, _, body)) =>
            val packetId = body.take(2)
            var off = 2
            var granted = List.empty[Byte]
            while (off < body.length) {
              val (topic, next) = readUtf8(body, off)
              conn.topics += topic
              off = next + 1 // skip requested QoS byte
              granted ::= 0
            }
            writePacket(conn.out, SUBACK, 0, packetId ++ granted.reverse)
          case Some(Packet(PUBLISH, _, body)) =>
            val (topic, _) = readUtf8(body, 0)
            conns.forEach { c =>
              if ((c ne conn) && c.topics.contains(topic))
                try writePacket(c.out, PUBLISH, 0, body)
                catch { case _: Exception => () }
            }
          case Some(Packet(PINGREQ, _, _)) =>
            writePacket(conn.out, PINGRESP, 0, Array.emptyByteArray)
          case Some(Packet(DISCONNECT, _, _)) => open = false
          case Some(_)                        => ()
          case None                           => open = false
        }
      }
    } catch {
      case _: Exception => ()
    } finally {
      conns.remove(conn)
      try conn.socket.close() catch { case _: Exception => () }
    }
  }
}
