package graft.sparql

import org.scalatest.funsuite.AnyFunSuite

class SparqlParserSpec extends AnyFunSuite {

  test("simple select-all-vars query") {
    val q = SparqlParser.parse("SELECT ?s WHERE { ?s ?p ?o }")
    val sq = q.asInstanceOf[SelectQuery]
    assert(sq.projection === Items(Seq(VarItem("s"))))
    assert(sq.where.patterns ===
      Seq(QuadPattern(Var("s"), Var("p"), Var("o"), None)))
  }

  test("prefixed names expand") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE { ?s ex:knows ?o }""".stripMargin)
    val sq = q.asInstanceOf[SelectQuery]
    assert(sq.where.patterns.head.p === Iri("http://example.org/knows"))
  }

  test("multi-pattern BGP with '.' separators and shared vars") {
    val q = SparqlParser.parse(
      """PREFIX saref: <https://saref.etsi.org/core/>
        |SELECT ?event ?temperature ?timestamp WHERE {
        |  ?event saref:hasValue ?temperature .
        |  ?event saref:hasTimestamp ?timestamp .
        |}""".stripMargin)
    val sq = q.asInstanceOf[SelectQuery]
    assert(sq.where.patterns.size === 2)
    assert(sq.where.patterns.map(_.s).distinct === Seq(Var("event")))
  }

  test("semicolon and comma sugar") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT * WHERE { ?s ex:p1 ?a ; ex:p2 ?b , ?c . }""".stripMargin)
    val pats = q.asInstanceOf[SelectQuery].where.patterns
    assert(pats.size === 3)
    assert(pats.forall(_.s === Var("s")))
    assert(pats.map(_.o) === Seq(Var("a"), Var("b"), Var("c")))
  }

  test("FILTER with comparison against quoted literal") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s ?age WHERE {
        |  ?s ex:age ?age .
        |  FILTER(?age > "25")
        |}""".stripMargin)
    val filters = q.asInstanceOf[SelectQuery].where.filters
    assert(filters === Seq(ECmp(">", EVar("age"), EStr("25"))))
  }

  test("FILTER with extension function call") {
    val q = SparqlParser.parse(
      """PREFIX janus: <https://janus.rs/fn#>
        |SELECT ?s WHERE {
        |  ?s <http://e.org/v> ?v .
        |  FILTER(janus:is_outlier(?v, 50.0, 2.0, 3))
        |}""".stripMargin)
    val filters = q.asInstanceOf[SelectQuery].where.filters
    assert(filters === Seq(ECall("https://janus.rs/fn#is_outlier",
      Seq(EVar("v"), ENum(50.0), ENum(2.0), ENum(3)))))
  }

  test("FILTER EXISTS with nested braces") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE {
        |  ?s ex:p ?o .
        |  FILTER EXISTS { ?s ex:q ?x . }
        |}""".stripMargin)
    val filters = q.asInstanceOf[SelectQuery].where.filters
    filters.head match {
      case EExists(gp, negated) =>
        assert(!negated)
        assert(gp.patterns === Seq(QuadPattern(Var("s"),
          Iri("http://example.org/q"), Var("x"), None)))
      case other => fail(s"expected EExists, got $other")
    }
  }

  test("GRAPH scoping attaches to inner patterns") {
    val q = SparqlParser.parse(
      """SELECT ?s WHERE {
        |  GRAPH <http://g.org/g1> { ?s ?p ?o }
        |  ?s <http://e.org/x> ?y .
        |}""".stripMargin)
    val pats = q.asInstanceOf[SelectQuery].where.patterns
    assert(pats.head.g === Some(Iri("http://g.org/g1")))
    assert(pats(1).g === None)
  }

  test("GRAPH with variable") {
    val q = SparqlParser.parse(
      "SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }")
    assert(q.asInstanceOf[SelectQuery].where.patterns.head.g === Some(Var("g")))
  }

  test("aggregate projection (COUNT ... AS)") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT (COUNT(?s) AS ?count) WHERE { ?s ex:knows ?o }""".stripMargin)
    val items = q.asInstanceOf[SelectQuery].projection.asInstanceOf[Items].items
    assert(items === Seq(AggItem(
      Aggregate("COUNT", Some(EVar("s")), distinct = false), "count")))
  }

  test("GROUP BY with AVG") {
    val q = SparqlParser.parse(
      """SELECT ?t (AVG(?v) AS ?avgV) WHERE {
        |  ?s <http://e.org/t> ?t . ?s <http://e.org/v> ?v .
        |} GROUP BY ?t""".stripMargin).asInstanceOf[SelectQuery]
    assert(q.groupBy === Seq("t"))
    assert(q.projection.asInstanceOf[Items].items(1) ===
      AggItem(Aggregate("AVG", Some(EVar("v")), distinct = false), "avgV"))
  }

  test("expression alias projection") {
    val q = SparqlParser.parse(
      "SELECT (?a + ?b AS ?sum) WHERE { ?s <http://e.org/a> ?a . ?s <http://e.org/b> ?b }")
    val items = q.asInstanceOf[SelectQuery].projection.asInstanceOf[Items].items
    assert(items === Seq(ExprItem(EArith("+", EVar("a"), EVar("b")), "sum")))
  }

  test("ASK query") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |ASK { ex:alice ex:knows ex:bob }""".stripMargin)
    assert(q.isInstanceOf[AskQuery])
    assert(q.where.patterns.head.s === Iri("http://example.org/alice"))
  }

  test("CONSTRUCT with template") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |CONSTRUCT { ?s ex:connectedTo ?o }
        |WHERE { ?s ex:knows ?o }""".stripMargin)
    val cq = q.asInstanceOf[ConstructQuery]
    assert(cq.template === Seq(QuadPattern(Var("s"),
      Iri("http://example.org/connectedTo"), Var("o"), None)))
  }

  test("comments are skipped (# and /* */)") {
    val q = SparqlParser.parse(
      """# leading comment
        |/* block
        |   comment */
        |SELECT ?s WHERE { ?s ?p ?o } # trailing""".stripMargin)
    assert(q.isInstanceOf[SelectQuery])
  }

  test("'a' keyword expands to rdf:type") {
    val q = SparqlParser.parse("SELECT ?s WHERE { ?s a <http://e.org/T> }")
    assert(q.where.patterns.head.p ===
      Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"))
  }

  test("angle-bracket IRI vs less-than disambiguation") {
    val q = SparqlParser.parse(
      "SELECT ?v WHERE { ?s <http://e.org/v> ?v . FILTER(?v < 10 && ?v<5) }")
    val f = q.asInstanceOf[SelectQuery].where.filters.head
    assert(f === EAnd(ECmp("<", EVar("v"), ENum(10)),
      ECmp("<", EVar("v"), ENum(5))))
  }

  test("unknown prefix raises") {
    assertThrows[SparqlParser.ParseException] {
      SparqlParser.parse("SELECT ?s WHERE { ?s nope:p ?o }")
    }
  }

  test("FILTER(?a<?b&&?c>?d) lexes a greedy IRIREF, matching the SPARQL " +
      "grammar (Jena/Oxigraph behavior)") {
    // §19.8 IRIREF = '<' ([^<>\"{}|^`\\]-[#x00-#x20])* '>' — '?' and '&'
    // are legal IRI characters, so the longest match wins: the lexeme is
    // the (odd but well-formed) IRI <?b&&?c>, leaving `?a <iri> ?d`,
    // which is NOT a valid expression — a syntax error, exactly what
    // Jena/Oxigraph report. Writing two comparisons requires whitespace.
    assert(SparqlParser.tokenize("?a<?b&&?c>?d") ===
      Vector(SparqlParser.TVar("a"), SparqlParser.TIri("?b&&?c"),
        SparqlParser.TVar("d")))
    assertThrows[SparqlParser.ParseException] {
      SparqlParser.parse("SELECT ?a WHERE { ?a ?p ?d . FILTER(?a<?b&&?c>?d) }")
    }
    // the spaced spelling is the two-comparison conjunction
    val q2 = SparqlParser.parse(
      "SELECT ?a WHERE { ?a ?p ?d . FILTER(?a < ?b && ?c > ?d) }")
    val f2 = q2.asInstanceOf[SelectQuery].where.filters.head
    assert(f2 === EAnd(ECmp("<", EVar("a"), EVar("b")),
      ECmp(">", EVar("c"), EVar("d"))))
  }

  test("IRIREF scan stops at grammar-excluded characters, not just " +
      "whitespace") {
    // '{' is excluded from IRIREF, so `?x<?y` followed by a brace is a
    // comparison even with no whitespace
    val q = SparqlParser.parse(
      "SELECT ?x WHERE { ?x ?p ?y . FILTER(?x<?y){ ?x ?q ?z }}")
    assert(q.asInstanceOf[SelectQuery].where.filters.head ===
      ECmp("<", EVar("x"), EVar("y")))
  }

  test("negative-literal continuation: 10-1 parses as subtraction " +
      "(NumericLiteralNegative, §19.8 AdditiveExpression)") {
    val q = SparqlParser.parse(
      "SELECT ?x WHERE { ?s ?p ?x . FILTER(?x > 10-1) }")
    assert(q.asInstanceOf[SelectQuery].where.filters.head ===
      ECmp(">", EVar("x"), EArith("+", ENum(10), ENum(-1))))
  }

  test("nested group with FILTER stays its own group element; " +
      "filter-free groups flatten") {
    val q = SparqlParser.parse(
      """SELECT ?s WHERE {
        |  ?s ?p ?o .
        |  { ?s ?q ?r }
        |  { ?s ?t ?u FILTER(?u > 1) }
        |}""".stripMargin)
    val elems = q.asInstanceOf[SelectQuery].where.elems
    assert(elems.map(_.getClass.getSimpleName) ===
      Seq("GBgp", "GBgp", "GGroup"))
    val GGroup(inner) = elems.last: @unchecked
    assert(inner.filters.length === 1)
  }

  test("VALUES parses UNDEF cells to None") {
    val q = SparqlParser.parse(
      """SELECT ?s WHERE {
        |  ?s ?p ?o .
        |  VALUES (?s ?t) { (<http://e.org/a> "x") (UNDEF "y") }
        |}""".stripMargin)
    val vb = q.asInstanceOf[SelectQuery].where.values.head
    assert(vb.vars === Seq("s", "t"))
    assert(vb.rows === Seq(
      Seq(Some(Iri("http://e.org/a")), Some(Lit("x"))),
      Seq(None, Some(Lit("y")))))
    assert(vb.undefVars === Set("s"))
  }

  test("group elements preserve source order (BIND between patterns, " +
      "OPTIONAL/MINUS interleaved)") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?s WHERE {
        |  ?s ex:p ?a .
        |  BIND(?a AS ?b)
        |  ?s ex:q ?b .
        |  OPTIONAL { ?s ex:r ?c }
        |  MINUS { ?s ex:bad ?b }
        |  VALUES ?s { ex:one }
        |}""".stripMargin)
    val kinds = q.asInstanceOf[SelectQuery].where.elems.map(_.getClass.getSimpleName)
    assert(kinds === Seq("GBgp", "GBind", "GBgp", "GOptional", "GMinus",
      "GValues"))
  }
}
