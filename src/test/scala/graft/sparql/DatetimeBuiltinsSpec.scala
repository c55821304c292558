package graft.sparql

import graft.TestSpark
import graft.core.RdfEvent

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The SPARQL 1.1 datetime / term-introspection builtin tail
  * (§17.4.5, §17.4.1.8, §17.4.2.9-11): NOW, YEAR…SECONDS, TZ,
  * TIMEZONE, sameTerm, BNODE, RAND, UUID, STRUUID.
  *
  * The reference's event model has no datetime or blank-node terms
  * (`/root/reference/src/core/mod.rs:16-23` — strings with numeric
  * sniffing), but its Oxigraph adapter
  * (`/root/reference/src/querying/oxigraph_adapter.rs:104-148`) embeds
  * full SPARQL 1.1, so a reference user can type these; they operate
  * here on the lexical term forms.
  */
class DatetimeBuiltinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val data: DataFrame = RdfEvent.toDF(spark, Seq(
    RdfEvent(1000, "http://ex.org/e1", "http://ex.org/at",
      "2024-03-05T10:30:45.500+05:30", ""),
    RdfEvent(1000, "http://ex.org/e2", "http://ex.org/at",
      "2024-12-31T23:59:59Z", ""),
    RdfEvent(1000, "http://ex.org/e3", "http://ex.org/at",
      "2023-06-15T08:00:00", ""),
    RdfEvent(1000, "http://ex.org/e4", "http://ex.org/at",
      "not-a-date", "")))

  private def run(q: String): DataFrame =
    SparqlCompiler.compile(data, SparqlParser.parse(
      "PREFIX ex: <http://ex.org/>\n" + q))

  private def one(q: String): Seq[String] =
    TestSpark.rows(run(q)).head

  test("YEAR/MONTH/DAY extract the dateTime's own fields; a " +
      "non-datetime lexical is a type error (unbound)") {
    val df = run(
      """SELECT ?s ?y ?mo ?d WHERE {
        |  ?s ex:at ?t .
        |  BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo)
        |  BIND(DAY(?t) AS ?d)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/e1", "2024.0", "3.0", "5.0"),
      Seq("http://ex.org/e2", "2024.0", "12.0", "31.0"),
      Seq("http://ex.org/e3", "2023.0", "6.0", "15.0"),
      Seq("http://ex.org/e4", "null", "null", "null")))
  }

  test("HOURS/MINUTES/SECONDS ignore the zone tag (field view, not " +
      "instant conversion); SECONDS keeps the fraction") {
    val df = run(
      """SELECT ?s ?h ?mi ?sec WHERE {
        |  ?s ex:at ?t . FILTER(?s = "http://ex.org/e1")
        |  BIND(HOURS(?t) AS ?h) BIND(MINUTES(?t) AS ?mi)
        |  BIND(SECONDS(?t) AS ?sec)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/e1", "10.0", "30.0", "45.5")))
  }

  test("TZ returns the literal zone tag, empty when absent; TIMEZONE " +
      "the dayTimeDuration, an error when absent") {
    val df = run(
      """SELECT ?s ?tz ?dur WHERE {
        |  ?s ex:at ?t .
        |  BIND(TZ(?t) AS ?tz) BIND(TIMEZONE(?t) AS ?dur)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/e1", "+05:30", "PT5H30M"),
      Seq("http://ex.org/e2", "Z", "PT0S"),
      Seq("http://ex.org/e3", "", "null"),
      Seq("http://ex.org/e4", "null", "null")))
  }

  test("NOW() is one fixed ISO instant for the whole query") {
    val df = run(
      """SELECT ?s ?now WHERE { ?s ex:at ?t . BIND(NOW() AS ?now) }""")
    val vals = df.collect().map(_.getString(1)).toSeq
    assert(vals.size === 4 && vals.distinct.size === 1)
    assert(vals.head.matches(
      "\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{3}(Z|[+-]\\d{2}:\\d{2})"))
  }

  test("sameTerm is lexical identity — unlike '=', no numeric view") {
    // "30" = "30.0" numerically but sameTerm distinguishes the terms
    val d = RdfEvent.toDF(spark, Seq(
      RdfEvent(1000, "http://ex.org/a", "http://ex.org/v", "30", ""),
      RdfEvent(1000, "http://ex.org/b", "http://ex.org/v", "30.0", "")))
    val same = SparqlCompiler.compile(d, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?x ?y WHERE {
        |  ?x ex:v ?v1 . ?y ex:v ?v2 . FILTER(sameTerm(?v1, ?v2))
        |}""".stripMargin))
    assert(same.count() === 2) // only the two self-pairs
    val eq = SparqlCompiler.compile(d, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?x ?y WHERE {
        |  ?x ex:v ?v1 . ?y ex:v ?v2 . FILTER(?v1 = ?v2)
        |}""".stripMargin))
    assert(eq.count() === 4) // numeric equality matches across
  }

  test("BNODE()/UUID()/STRUUID() mint fresh opaque terms; BNODE(str) " +
      "is stable per label; RAND() is in [0,1)") {
    val df = run(
      """SELECT ?s ?b ?bs ?u ?su ?r WHERE {
        |  ?s ex:at ?t .
        |  BIND(BNODE() AS ?b) BIND(BNODE("x") AS ?bs)
        |  BIND(UUID() AS ?u) BIND(STRUUID() AS ?su)
        |  BIND(RAND() AS ?r)
        |}""".stripMargin)
    val rows = df.collect()
    assert(rows.length === 4)
    assert(rows.map(_.getString(1)).distinct.length === 4) // fresh bnodes
    assert(rows.forall(_.getString(1).startsWith("_:")))
    assert(rows.map(_.getString(2)).distinct.length === 1) // stable label
    assert(rows.map(_.getString(3)).distinct.length === 4)
    assert(rows.forall(_.getString(3).startsWith("urn:uuid:")))
    assert(rows.map(_.getString(4)).distinct.length === 4)
    assert(rows.forall { r =>
      val d = r.getDouble(5); d >= 0.0 && d < 1.0
    })
  }

  test("isBlank is false over the bnode-free term model") {
    val df = run(
      """SELECT ?s WHERE { ?s ex:at ?t . FILTER(isBlank(?t)) }""")
    assert(df.count() === 0)
  }
}
