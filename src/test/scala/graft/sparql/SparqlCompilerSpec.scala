package graft.sparql

import graft.TestSpark
import graft.core.RdfEvent

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Ports the SPARQL feature contract of
  * `/root/reference/tests/oxigraph_adapter_test.rs` (the de-facto spec of
  * which relational behaviors the engine must reproduce) onto the
  * DataFrame compiler.
  */
class SparqlCompilerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** The reference's `create_test_container()` fixture: alice knows bob,
    * bob knows charlie, alice age "30", bob age "25" (plain literals,
    * default graph, ts 1000). */
  private lazy val container: DataFrame = RdfEvent.toDF(spark, Seq(
    RdfEvent(1000, "http://example.org/alice", "http://example.org/knows",
      "http://example.org/bob", ""),
    RdfEvent(1000, "http://example.org/bob", "http://example.org/knows",
      "http://example.org/charlie", ""),
    RdfEvent(1000, "http://example.org/alice", "http://example.org/age", "30", ""),
    RdfEvent(1000, "http://example.org/bob", "http://example.org/age", "25", "")))

  private def run(query: String, quads: DataFrame = container): DataFrame =
    SparqlCompiler.compile(quads, SparqlParser.parse(query))

  test("simple select: ?s ?p ?o returns 4 solutions") {
    assert(run("SELECT ?s WHERE { ?s ?p ?o }").count() === 4)
  }

  test("BGP with constant predicate: 2 know someone") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE { ?s ex:knows ?o }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/alice"),
      Seq("http://example.org/bob")))
  }

  test("2-pattern BGP join: who knows someone with an age") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s ?age WHERE { ?s ex:knows ?o . ?o ex:age ?age }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/alice", "25")))
  }

  test("FILTER(?age > \"25\") returns 1 (alice, 30) — " +
      "oxigraph_adapter_test.rs:183-201") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s ?age WHERE { ?s ex:age ?age . FILTER(?age > "25") }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/alice", "30")))
  }

  test("mixed-type comparison is a SPARQL type error: row filtered") {
    // ?o is an IRI for the knows-triples: IRI > number must not fall back
    // to lexical compare ("http://..." > "25" is true by codepoint order)
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE { ?s ex:knows ?o . FILTER(?o > 25) }""".stripMargin)
    assert(df.count() === 0)
    // same with the numeric side on the left
    val df2 = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE { ?s ex:knows ?o . FILTER(25 < ?o) }""".stripMargin)
    assert(df2.count() === 0)
  }

  test("non-numeric vs non-numeric comparison stays lexical") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE {
        |  ?s ex:knows ?o . FILTER(?o = "http://example.org/bob")
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/alice")))
  }

  test("extension function FILTER returns alice — " +
      "oxigraph_adapter_test.rs:204-229") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |PREFIX janus: <https://janus.rs/fn#>
        |SELECT ?s ?age WHERE {
        |  ?s ex:age ?age .
        |  FILTER(janus:absolute_threshold_exceeded(?age, "25", "2"))
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/alice", "30")))
  }

  test("wrong extension-function arity filters all rows — rules.rs:36-42") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |PREFIX janus: <https://janus.rs/fn#>
        |SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER(janus:absolute_threshold_exceeded(?age, "25"))
        |}""".stripMargin)
    assert(df.count() === 0)
  }

  test("COUNT aggregate — oxigraph_adapter_test.rs:231-246") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT (COUNT(?s) AS ?count) WHERE { ?s ex:knows ?o }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("2")))
  }

  test("GROUP BY with AVG over numeric-sniffed literals") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?p (AVG(?age) AS ?avgAge) WHERE {
        |  ?s ex:age ?age . ?s ?p ?age .
        |} GROUP BY ?p""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/age", "27.5")))
  }

  test("ASK true / false — oxigraph_adapter_test.rs:90-126") {
    val t = run(
      """PREFIX ex: <http://example.org/>
        |ASK { ex:alice ex:knows ex:bob }""".stripMargin)
    assert(TestSpark.rows(t) === Set(Seq("true")))
    val f = run(
      """PREFIX ex: <http://example.org/>
        |ASK { ex:bob ex:knows ex:alice }""".stripMargin)
    assert(TestSpark.rows(f) === Set(Seq("false")))
  }

  test("CONSTRUCT emits template triples — oxigraph_adapter_test.rs:128-150") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |CONSTRUCT { ?s ex:connectedTo ?o } WHERE { ?s ex:knows ?o }""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://example.org/alice", "http://example.org/connectedTo",
        "http://example.org/bob"),
      Seq("http://example.org/bob", "http://example.org/connectedTo",
        "http://example.org/charlie")))
  }

  test("FILTER EXISTS compiles to left-semi join") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER EXISTS { ?s ex:knows ?o2 . ?o2 ex:age ?a2 . }
        |}""".stripMargin)
    // alice knows bob (bob has age); bob knows charlie (no age)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/alice")))
  }

  test("FILTER NOT EXISTS compiles to left-anti join") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER NOT EXISTS { ?s ex:knows ?o2 . ?o2 ex:age ?a2 . }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://example.org/bob")))
  }

  test("GRAPH scoping filters by graph column") {
    val g = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://e.org/s1", "http://e.org/p", "1", "http://g.org/a"),
      RdfEvent(2, "http://e.org/s2", "http://e.org/p", "2", "http://g.org/b")))
    val df = run(
      """SELECT ?s WHERE { GRAPH <http://g.org/a> { ?s ?p ?o } }""", g)
    assert(TestSpark.rows(df) === Set(Seq("http://e.org/s1")))
    // GRAPH ?g binds the graph variable
    val dg = run("""SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }""", g)
    assert(TestSpark.rows(dg) === Set(Seq("http://g.org/a"), Seq("http://g.org/b")))
  }

  test("expression projection (?age * 2 AS ?doubled)") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s (?age * 2 AS ?doubled) WHERE { ?s ex:age ?age }""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://example.org/alice", "60.0"),
      Seq("http://example.org/bob", "50.0")))
  }

  test("repeated variable within one pattern forces equality") {
    val g = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://e.org/x", "http://e.org/p", "http://e.org/x", ""),
      RdfEvent(1, "http://e.org/x", "http://e.org/p", "http://e.org/y", "")))
    val df = run("SELECT ?s WHERE { ?s <http://e.org/p> ?s }", g)
    assert(TestSpark.rows(df) === Set(Seq("http://e.org/x")))
  }

  test("DISTINCT projection") {
    val df = run(
      """PREFIX ex: <http://example.org/>
        |SELECT DISTINCT ?p WHERE { ?s ?p ?o }""".stripMargin)
    assert(df.count() === 2)
  }
}
