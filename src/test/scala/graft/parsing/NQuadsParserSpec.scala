package graft.parsing

import graft.TestSpark
import graft.core.RdfEvent

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's rdf_parser tests
  * (`/root/reference/src/parsing/rdf_parser.rs:170-217`) plus the edge
  * cases flagged in round-1 review. */
class NQuadsParserSpec extends AnyFunSuite {

  private def parseOk(line: String): RdfEvent =
    NQuadsParser.parseLine(line, () => 42L)
      .fold(e => fail(s"parse failed: $e"), identity)

  test("typed literal: datatype stripped, lexical value kept") {
    val e = parseOk("""<http://example.org/sensor1> <http://example.org/temperature> "23.5"^^<http://www.w3.org/2001/XMLSchema#decimal> <http://example.org/sensorStream> .""")
    assert(e.subject === "http://example.org/sensor1")
    assert(e.predicate === "http://example.org/temperature")
    assert(e.objectValue === "23.5")
    assert(e.graph === "http://example.org/sensorStream")
  }

  test("plain literal") {
    val e = parseOk("""<http://example.org/sensor1> <http://example.org/name> "Temperature Sensor" <http://example.org/graph> .""")
    assert(e.objectValue === "Temperature Sensor")
  }

  test("URI object") {
    val e = parseOk("""<http://example.org/sensor1> <http://example.org/type> <http://example.org/Sensor> .""")
    assert(e.objectValue === "http://example.org/Sensor")
  }

  test("leading timestamp token") {
    val e = parseOk("""1234567890 <http://example.org/s> <http://example.org/p> "value" <http://example.org/g> .""")
    assert(e.timestamp === 1234567890L)
    assert(e.subject === "http://example.org/s")
  }

  test("missing graph → empty (default) graph") {
    val e = parseOk("""<http://example.org/s> <http://example.org/p> "value" .""")
    assert(e.graph === "")
  }

  test("missing timestamp → injected now") {
    val e = parseOk("""<http://example.org/s> <http://example.org/p> "v" .""")
    assert(e.timestamp === 42L)
  }

  test("language-tagged literal: tag dropped") {
    val e = parseOk("""<http://e.org/s> <http://e.org/p> "bonjour"@fr .""")
    assert(e.objectValue === "bonjour")
  }

  test("literal ending in escaped backslash parses (round-1 edge)") {
    val e = parseOk("""<http://e.org/s> <http://e.org/p> "a\\" .""")
    assert(e.objectValue === "a\\\\")
  }

  test("escaped quote inside literal kept un-unescaped") {
    val e = parseOk("""<http://e.org/s> <http://e.org/p> "say \"hi\"" .""")
    assert(e.objectValue === "say \\\"hi\\\"")
  }

  test("^^ not followed by < keeps the lexical value (reference " +
      "tolerates the malformed annotation, rdf_parser.rs:148-154)") {
    val r = NQuadsParser.parseLine(
      """<http://e.org/s> <http://e.org/p> "23.5"^^xsd:decimal .""",
      () => 0L)
    assert(r.isRight)
    assert(r.toOption.get.objectValue === "23.5")
    assert(r.toOption.get.graph === "") // trailing annotation ignored
  }

  test("malformed line yields Left") {
    assert(NQuadsParser.parseLine("not an nquad", () => 0L).isLeft)
    assert(NQuadsParser.parseLine("", () => 0L).isLeft)
  }

  test("distributed parse drops+counts malformed lines") {
    val spark = TestSpark.spark
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("parse-errors")
    val lines = Seq(
      """10 <http://e.org/a> <http://e.org/p> "1" .""",
      "# comment",
      "garbage line here",
      """20 <http://e.org/b> <http://e.org/p> "2" <http://e.org/g> .""")
    val df = NQuadsParser.parse(lines.toDS(), errorCounter = Some(acc))
    val out = df.collect()
    assert(out.length === 2)
    assert(acc.value === 1L) // comment is skipped, not an error
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(10L, 20L))
  }
}
