package graft.sparql

import graft.TestSpark
import graft.core.RdfEvent

import org.scalatest.funsuite.AnyFunSuite

/** Crash-net for the source-order group compiler: random interleavings
  * of BGPs, BINDs, OPTIONALs, MINUSes, VALUES (with UNDEF) and FILTERs
  * must parse, compile and execute without analysis errors — unbound
  * references evaluate as UNBOUND, nullable variables take the
  * compatibility join paths, and results are deterministic (same seed →
  * same count on a re-run). The SPARQL 1.1 §18.2.2.6 fold has a large
  * combination space; this sweeps a structured sample of it. */
class SparqlOrderFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val data = RdfEvent.toDF(spark, Seq(
    RdfEvent(1, "http://ex.org/alice", "http://ex.org/knows",
      "http://ex.org/bob", ""),
    RdfEvent(1, "http://ex.org/alice", "http://ex.org/age", "30", ""),
    RdfEvent(1, "http://ex.org/bob", "http://ex.org/age", "25", ""),
    RdfEvent(1, "http://ex.org/charlie", "http://ex.org/age", "35", ""),
    RdfEvent(1, "http://ex.org/alice", "http://ex.org/email",
      "alice@ex.org", "")))

  /** One random group element; `i` keeps introduced variables unique so
    * BIND can never trip the legitimate rebind check. */
  private def element(rnd: scala.util.Random, i: Int): String =
    rnd.nextInt(7) match {
      case 0 => s"?s ex:age ?age$i ."
      case 1 => s"?s ex:knows ?k$i ."
      case 2 => s"BIND(?age0 + $i AS ?b$i)"
      case 3 => s"OPTIONAL { ?s ex:email ?m$i }"
      case 4 => s"MINUS { ?s ex:knows ?k$i . }"
      case 5 => "VALUES ?s { <http://ex.org/alice> UNDEF }"
      case 6 => s"FILTER(BOUND(?m$i) || ?age0 > 10 || BOUND(?b$i))"
    }

  private def query(rnd: scala.util.Random): String = {
    val n = 2 + rnd.nextInt(5)
    val body = (0 until n).map(element(rnd, _)).mkString("\n  ")
    s"""PREFIX ex: <http://ex.org/>
       |SELECT * WHERE {
       |  ?s ex:age ?age0 .
       |  $body
       |}""".stripMargin
  }

  test("join-only element permutations are result-invariant " +
      "(Join commutativity/associativity under the ordered fold)") {
    val rnd = new scala.util.Random(11)
    val joinElems = Vector(
      "?s ex:age ?age0 .",
      "?s ex:knows ?k .",
      "{ ?s ex:email ?m FILTER(STRLEN(?m) > 3) }",
      "VALUES ?s { <http://ex.org/alice> <http://ex.org/bob> UNDEF }",
      "{ SELECT ?s WHERE { ?s ex:age ?a1 } }",
      "?s ex:knows|ex:email ?any .")
    (0 until 30).foreach { _ =>
      val chosen = rnd.shuffle(joinElems).take(2 + rnd.nextInt(4))
      def q(elems: Seq[String]) =
        s"""PREFIX ex: <http://ex.org/>
           |SELECT * WHERE {
           |  ${elems.mkString("\n  ")}
           |}""".stripMargin
      // sorted multiset compare (Star projection sorts columns, so
      // row stringification is permutation-stable)
      def multiset(query: String): Seq[String] =
        SparqlCompiler.compile(data, SparqlParser.parse(query))
          .collect().map(_.toString).sorted.toSeq
      val a = multiset(q(chosen))
      val b = multiset(q(rnd.shuffle(chosen)))
      assert(a === b, s"permutation changed results for:\n${q(chosen)}")
    }
  }

  test("120 random element interleavings compile and run " +
      "deterministically") {
    val rnd = new scala.util.Random(7)
    val queries = (0 until 120).map(_ => query(rnd))
    val counts = queries.map { q =>
      try SparqlCompiler.compile(data, SparqlParser.parse(q)).count()
      catch {
        case e: SparqlCompiler.CompileException =>
          fail(s"CompileException '${e.msg}' for:\n$q")
        case e: org.apache.spark.sql.AnalysisException =>
          fail(s"AnalysisException '${e.getMessage}' for:\n$q")
      }
    }
    // deterministic: a second compile+run of every query agrees
    val again = queries.map(q =>
      SparqlCompiler.compile(data, SparqlParser.parse(q)).count())
    assert(counts === again)
    // the sample is not degenerate: some queries keep solutions
    assert(counts.exists(_ > 0))
  }
}
