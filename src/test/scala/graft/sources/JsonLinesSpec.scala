package graft.sources

import graft.TestSpark

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** JSONL quarantine ingest: exact split, verbatim quarantine, typed
  * parse, no silent nulling. */
class JsonLinesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("txt", StringType)))

  private def write(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(dir, "part.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("every line lands in exactly one output; quarantine is verbatim") {
    val lines = Seq(
      """{"id":1,"txt":"ok"}""",
      """{broken json""",
      """{"id":"not-a-number","txt":"bad type"}""",
      """{"id":3,"txt":"unicode é and \"quotes\""}""",
      """not json at all""")
    val (parsed, quarantine) =
      JsonLines.readWithQuarantine(spark, write(lines), schema)
    val p = parsed.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(p === Set((1L, "ok"), (3L, "unicode é and \"quotes\"")))
    val q = quarantine.collect().map(_.getString(0)).toSet
    assert(q === Set("""{broken json""",
      """{"id":"not-a-number","txt":"bad type"}""",
      """not json at all"""))
    assert(p.size + q.size === lines.size)
  }

  test("missing fields parse as nulls (well-formed, schema-conforming) " +
      "— only true violations quarantine") {
    val lines = Seq("""{"id":7}""", """{"txt":"only text"}""")
    val (parsed, quarantine) =
      JsonLines.readWithQuarantine(spark, write(lines), schema)
    assert(quarantine.count() === 0)
    val rows = parsed.collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(rows === Set((Some(7L), None), (None, Some("only text"))))
  }

  test("a schema already containing the corrupt column is rejected") {
    val bad = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    intercept[IllegalArgumentException] {
      JsonLines.readWithQuarantine(spark, "/nonexistent", bad)
    }
  }
}
