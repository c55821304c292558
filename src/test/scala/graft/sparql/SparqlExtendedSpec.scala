package graft.sparql

import graft.TestSpark
import graft.core.RdfEvent

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** OPTIONAL / UNION / BIND / MINUS / BOUND / ORDER BY / LIMIT / OFFSET.
  *
  * The reference delegates all relational evaluation to Oxigraph — a full
  * SPARQL 1.1 engine (`/root/reference/src/querying/oxigraph_adapter.rs:
  * 104-148`) — so its users can run these forms even though the in-repo
  * tests never exercise them. Expected results below follow the SPARQL
  * 1.1 algebra (leftjoin / union-as-multiset / minus / extend).
  */
class SparqlExtendedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** alice knows bob+charlie; ages for alice(30)/bob(25); email only for
    * alice — the classic OPTIONAL fixture. */
  private lazy val data: DataFrame = RdfEvent.toDF(spark, Seq(
    RdfEvent(1000, "http://ex.org/alice", "http://ex.org/knows",
      "http://ex.org/bob", ""),
    RdfEvent(1000, "http://ex.org/alice", "http://ex.org/knows",
      "http://ex.org/charlie", ""),
    RdfEvent(1000, "http://ex.org/alice", "http://ex.org/age", "30", ""),
    RdfEvent(1000, "http://ex.org/bob", "http://ex.org/age", "25", ""),
    RdfEvent(1000, "http://ex.org/charlie", "http://ex.org/age", "35", ""),
    RdfEvent(1000, "http://ex.org/alice", "http://ex.org/email",
      "alice@ex.org", "")))

  private def run(q: String): DataFrame =
    SparqlCompiler.compile(data, SparqlParser.parse(
      "PREFIX ex: <http://ex.org/>\n" + q))

  test("OPTIONAL keeps left rows and null-fills missing bindings") {
    val df = run(
      """SELECT ?s ?age ?mail WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "30", "alice@ex.org"),
      Seq("http://ex.org/bob", "25", "null"),
      Seq("http://ex.org/charlie", "35", "null")))
  }

  test("OPTIONAL with inner FILTER applies the filter before the leftjoin") {
    val df = run(
      """SELECT ?s ?o WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:knows ?o . FILTER(?o = "http://ex.org/bob") }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob"),
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null")))
  }

  test("FILTER(!BOUND(?x)) selects rows where the optional never matched") {
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  FILTER(!BOUND(?mail))
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/bob"), Seq("http://ex.org/charlie")))
  }

  test("FILTER(BOUND(?x)) keeps only matched optionals") {
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  FILTER(BOUND(?mail))
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
  }

  test("UNION is multiset union (no dedup) with null fill") {
    val df = run(
      """SELECT ?s ?mail WHERE {
        |  { ?s ex:age ?age } UNION { ?s ex:email ?mail }
        |}""".stripMargin)
    // 3 age solutions (mail unbound) + 1 email solution
    assert(df.count() === 4)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "null"),
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null"),
      Seq("http://ex.org/alice", "alice@ex.org")))
  }

  test("UNION of overlapping branches keeps duplicates") {
    val df = run(
      """SELECT ?s WHERE {
        |  { ?s ex:age ?age } UNION { ?s ex:age ?age }
        |}""".stripMargin)
    assert(df.count() === 6)
  }

  test("UNION joins against the surrounding group") {
    val df = run(
      """SELECT ?s ?age WHERE {
        |  ?s ex:age ?age .
        |  { ?s ex:email ?m } UNION { ?s ex:knows <http://ex.org/charlie> }
        |}""".stripMargin)
    // alice matches both branches → two solutions
    assert(df.collect().length === 2)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice", "30")))
  }

  test("BIND extends solutions; bound var usable in FILTER and projection") {
    val df = run(
      """SELECT ?s ?dbl WHERE {
        |  ?s ex:age ?age .
        |  BIND(?age * 2.0 AS ?dbl)
        |  FILTER(?dbl >= 60.0)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "60.0"),
      Seq("http://ex.org/charlie", "70.0")))
  }

  test("MINUS removes solutions compatible on shared variables") {
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  MINUS { ?s ex:email ?mail }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/bob"), Seq("http://ex.org/charlie")))
  }

  test("MINUS with no shared variables removes nothing (SPARQL semantics)") {
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  MINUS { ?x ex:email ?mail }
        |}""".stripMargin)
    assert(df.count() === 3)
  }

  test("ORDER BY numeric-sniffs lexical values; LIMIT/OFFSET page") {
    val df = run(
      """SELECT ?s ?age WHERE { ?s ex:age ?age . }
        |ORDER BY DESC(?age) LIMIT 2""".stripMargin)
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("http://ex.org/charlie", "http://ex.org/alice"))
    val page = run(
      """SELECT ?s ?age WHERE { ?s ex:age ?age . }
        |ORDER BY ?age LIMIT 1 OFFSET 1""".stripMargin)
    assert(TestSpark.rows(page) === Set(Seq("http://ex.org/alice", "30")))
  }

  test("ORDER BY ascending plain var and numeric expression key") {
    val df = run(
      """SELECT ?s ?age WHERE { ?s ex:age ?age . }
        |ORDER BY ASC(?age * -1.0)""".stripMargin)
    assert(df.collect().map(_.getString(1)).toSeq === Seq("35", "30", "25"))
  }

  test("VALUES single-var block restricts solutions (broadcast semi)") {
    val df = run(
      """SELECT ?s ?age WHERE {
        |  ?s ex:age ?age .
        |  VALUES ?s { <http://ex.org/alice> <http://ex.org/bob> }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "30"), Seq("http://ex.org/bob", "25")))
  }

  test("VALUES multi-var block joins like inline data") {
    val df = run(
      """SELECT ?s ?age ?tag WHERE {
        |  ?s ex:age ?age .
        |  VALUES (?s ?tag) {
        |    (<http://ex.org/alice> "admin")
        |    (<http://ex.org/dave> "ghost")
        |  }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "30", "admin")))
  }

  test("HAVING filters aggregated groups; agg only in the condition") {
    val df = run(
      """SELECT ?s WHERE {
        |  { ?s ex:knows ?o } UNION { ?s ex:email ?o }
        |} GROUP BY ?s HAVING (COUNT(?o) >= 2)""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
  }

  test("HAVING composes with projected aggregates and ORDER BY") {
    val df = run(
      """SELECT ?s (COUNT(?o) AS ?n) WHERE {
        |  ?s ?p ?o .
        |} GROUP BY ?s HAVING (COUNT(?o) > 1) ORDER BY DESC(?n) ?s""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("http://ex.org/alice", 4L)))
  }

  test("IF / COALESCE / STR / ABS builtins in projection and filter") {
    val df = run(
      """SELECT ?s (IF(?age >= 30.0, "senior", "junior") AS ?bracket)
        |WHERE { ?s ex:age ?age . }""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "senior"),
      Seq("http://ex.org/bob", "junior"),
      Seq("http://ex.org/charlie", "senior")))
    val abs = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age . FILTER(ABS(?age - 30.0) <= 5.0)
        |}""".stripMargin)
    assert(TestSpark.rows(abs) === Set(
      Seq("http://ex.org/alice"), Seq("http://ex.org/bob"),
      Seq("http://ex.org/charlie")))
    val coal = run(
      """SELECT ?s (COALESCE(?mail, STR("none")) AS ?contact) WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |}""".stripMargin)
    assert(TestSpark.rows(coal) === Set(
      Seq("http://ex.org/alice", "alice@ex.org"),
      Seq("http://ex.org/bob", "none"),
      Seq("http://ex.org/charlie", "none")))
  }

  test("string builtins: CONCAT/UCASE/LCASE/STRLEN/SUBSTR in projection") {
    val df = run(
      """SELECT ?s (CONCAT(UCASE(?age), "!") AS ?shout)
        |  (STRLEN(?age) AS ?len) (SUBSTR(?age, 1, 1) AS ?first)
        |WHERE { ?s ex:age ?age . FILTER(?s = <http://ex.org/alice>) }""".stripMargin)
    val r = df.collect()(0)
    assert(r.getString(1) === "30!")
    assert(r.getDouble(2) === 2.0)
    assert(r.getString(3) === "3")
  }

  test("string predicates: CONTAINS/STRSTARTS/STRENDS/REGEX in FILTER") {
    def names(q: String): Set[Seq[String]] = TestSpark.rows(run(q))
    assert(names(
      """SELECT ?s WHERE { ?s ex:email ?m . FILTER(CONTAINS(?m, "@ex")) }""")
      === Set(Seq("http://ex.org/alice")))
    assert(names(
      """SELECT ?s WHERE { ?s ex:email ?m . FILTER(STRSTARTS(?m, "alice")) }""")
      === Set(Seq("http://ex.org/alice")))
    assert(names(
      """SELECT ?s WHERE { ?s ex:email ?m . FILTER(STRENDS(?m, ".org")) }""")
      === Set(Seq("http://ex.org/alice")))
    assert(names(
      """SELECT ?s WHERE { ?s ex:email ?m . FILTER(REGEX(?m, "^ALICE@", "i")) }""")
      === Set(Seq("http://ex.org/alice")))
    assert(names(
      """SELECT ?s WHERE { ?s ex:email ?m . FILTER(REGEX(?m, "^ALICE@")) }""")
      === Set.empty[Seq[String]])
  }

  test("numeric builtins: ROUND/CEIL/FLOOR") {
    val df = run(
      """SELECT ?s (ROUND(?age / 7.0) AS ?r) (CEIL(?age / 7.0) AS ?c)
        |  (FLOOR(?age / 7.0) AS ?f)
        |WHERE { ?s ex:age ?age . FILTER(?s = <http://ex.org/bob>) }""".stripMargin)
    val r = df.collect()(0) // 25/7 = 3.571…
    assert(r.getDouble(1) === 4.0 && r.getDouble(2) === 4.0 &&
      r.getDouble(3) === 3.0)
  }

  test("GROUP_CONCAT with separator and DISTINCT; SAMPLE is deterministic") {
    val df = run(
      """SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=",") AS ?known)
        |WHERE { ?s ex:knows ?o . } GROUP BY ?s""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob,http://ex.org/charlie")))
    val dd = run(
      """SELECT (GROUP_CONCAT(DISTINCT ?p; SEPARATOR="|") AS ?preds)
        |WHERE { ?s ?p ?o . }""".stripMargin)
    assert(dd.collect()(0).getString(0) ===
      "http://ex.org/age|http://ex.org/email|http://ex.org/knows")
    val samp = run(
      """SELECT ?s (SAMPLE(?o) AS ?one) WHERE { ?s ex:knows ?o . }
        |GROUP BY ?s""".stripMargin)
    assert(TestSpark.rows(samp) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob")))
  }

  test("subquery: inner aggregation joined with outer patterns") {
    val df = run(
      """SELECT ?s ?age ?n WHERE {
        |  ?s ex:age ?age .
        |  { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:knows ?o . }
        |    GROUP BY ?s }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "30", "2")))
  }

  test("subquery with LIMIT inside: modifiers apply before the join") {
    val df = run(
      """SELECT ?s ?age WHERE {
        |  ?s ex:age ?age .
        |  { SELECT ?s WHERE { ?s ex:age ?a . }
        |    ORDER BY DESC(?a) LIMIT 1 }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/charlie", "35")))
  }

  test("property path: sequence knows/age (friend-of ages)") {
    val df = run(
      """SELECT ?s ?fage WHERE { ?s ex:knows/ex:age ?fage . }""")
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "25"),   // bob's age
      Seq("http://ex.org/alice", "35"))) // charlie's age
  }

  test("property path: inverse ^knows (who is known by whom)") {
    val df = run(
      """SELECT ?o ?s WHERE { ?o ^ex:knows ?s . }""")
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/bob", "http://ex.org/alice"),
      Seq("http://ex.org/charlie", "http://ex.org/alice")))
  }

  test("property path: alternative age|email") {
    val df = run(
      """SELECT ?s ?v WHERE { ?s ex:age|ex:email ?v . }""")
    assert(df.count() === 4) // 3 ages + 1 email
  }

  test("property path: one-or-more knows+ computes transitive closure") {
    val spark = TestSpark.spark
    import spark.implicits._
    val chain = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "a", "http://ex.org/next", "b", ""),
      RdfEvent(1, "b", "http://ex.org/next", "c", ""),
      RdfEvent(1, "c", "http://ex.org/next", "d", "")))
    val df = SparqlCompiler.compile(chain, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?x ?y WHERE { ?x ex:next+ ?y . }""".stripMargin))
    assert(TestSpark.rows(df) === Set(
      Seq("a", "b"), Seq("a", "c"), Seq("a", "d"),
      Seq("b", "c"), Seq("b", "d"), Seq("c", "d")))
    // cyclic graph terminates (fixpoint, not infinite expansion)
    val cyc = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "a", "http://ex.org/next", "b", ""),
      RdfEvent(1, "b", "http://ex.org/next", "a", "")))
    val closure = SparqlCompiler.compile(cyc, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?x ?y WHERE { ?x ex:next+ ?y . }""".stripMargin))
    assert(TestSpark.rows(closure) === Set(
      Seq("a", "b"), Seq("b", "a"), Seq("a", "a"), Seq("b", "b")))
  }

  test("property path: grouped (knows|email)/nothing-else mixes with BGP") {
    val df = run(
      """SELECT ?s ?fage WHERE {
        |  ?s ex:age "30" .
        |  ?s ex:knows/ex:age ?fage .
        |  FILTER(?fage > 30.0)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice", "35")))
  }

  test("property path: zero-or-more '*' = identity over nodes + closure") {
    val spark = TestSpark.spark
    val chain = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "a", "http://ex.org/next", "b", ""),
      RdfEvent(1, "b", "http://ex.org/next", "c", "")))
    val df = SparqlCompiler.compile(chain, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?x ?y WHERE { ?x ex:next* ?y . }""".stripMargin))
    assert(TestSpark.rows(df) === Set(
      Seq("a", "a"), Seq("b", "b"), Seq("c", "c"), // zero-length
      Seq("a", "b"), Seq("b", "c"), Seq("a", "c"))) // closure
  }

  test("property path: '*' zero-length includes constant endpoints " +
      "absent from the graph") {
    val df = run("""SELECT ?y WHERE { ex:dave ex:knows* ?y . }""")
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/dave")))
  }

  test("property path: zero-or-one '?' = identity + single step") {
    // nodes: alice, bob, charlie, "30", "25", "35", "alice@ex.org" (7)
    // plus the two knows edges
    val df = run("""SELECT ?x ?y WHERE { ?x ex:knows? ?y . }""")
    assert(df.count() === 9)
    val rows = TestSpark.rows(df)
    assert(rows.contains(Seq("http://ex.org/alice", "http://ex.org/bob")))
    assert(rows.contains(Seq("30", "30"))) // literal node, zero-length
  }

  test("property path: negated set !p and !(p1|p2)") {
    val notKnows = run("""SELECT ?s ?o WHERE { ?s !ex:knows ?o . }""")
    assert(notKnows.count() === 4) // 3 ages + email
    val neither = run(
      """SELECT ?s ?o WHERE { ?s !(ex:knows|ex:age) ?o . }""")
    assert(TestSpark.rows(neither) === Set(
      Seq("http://ex.org/alice", "alice@ex.org")))
  }

  test("STRBEFORE / STRAFTER / REPLACE builtins (SPARQL §17.4.3 edges)") {
    val df = run(
      """SELECT ?s (STRAFTER(STR(?s), "org/") AS ?name)
        |  (STRBEFORE("alice@ex.org", "@") AS ?local)
        |  (STRBEFORE("abc", "z") AS ?none)
        |  (STRAFTER("abc", "") AS ?whole)
        |  (REPLACE("banana", "a+", "o") AS ?rep)
        |WHERE { ?s ex:age "30" . }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq(
      "http://ex.org/alice", "alice", "alice", "", "abc", "bonono")))
  }

  test("hash builtins MD5/SHA1/SHA256 produce lowercase hex digests") {
    val df = run(
      """SELECT (MD5("abc") AS ?m) (SHA1("abc") AS ?s1)
        |  (SHA256("abc") AS ?s2)
        |WHERE { ?s ex:age "30" . }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq(
      "900150983cd24fb0d6963f7d28e17f72",
      "a9993e364706816aba3e25717850c26c9cd0d89d",
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")))
  }

  test("GROUP BY expression keys: (expr AS ?v) and bare (expr)") {
    val df = run(
      """SELECT ?adult (COUNT(?s) AS ?n) WHERE { ?s ex:age ?age . }
        |GROUP BY ((?age >= 30.0) AS ?adult)""".stripMargin)
    val byKey = df.collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byKey === Map(1.0 -> 2L, 0.0 -> 1L)) // ages 30,35 vs 25
    // unaliased expression key groups correctly (key not projectable)
    val bare = run(
      """SELECT (COUNT(?s) AS ?n) WHERE { ?s ex:age ?age . }
        |GROUP BY (?age >= 30.0)""".stripMargin)
    assert(bare.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("STRBEFORE/STRAFTER propagate NULL (unbound stays unbound, not \"\")") {
    // ?n is unbound for alice (no email on bob/charlie): BIND over an
    // error must leave ?x unbound, not bind it to the empty string
    val df = run(
      """SELECT ?s ?x WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?n }
        |  BIND(STRBEFORE(?n, "@") AS ?x)
        |}""".stripMargin)
    val rows = df.collect().map(r => (r.getString(0), r.isNullAt(1)))
    assert(rows.count(!_._2) === 1) // only alice has an email → bound
    assert(rows.filter(_._1.endsWith("bob")).forall(_._2))
  }

  test("REPLACE/REGEX flag validation: 'q' quotes, unknown flags fail " +
      "at compile time") {
    val df = run(
      """SELECT (REPLACE("a.b.c", ".", "-", "q") AS ?lit)
        |  (REPLACE("A.B", ".", "-") AS ?any)
        |WHERE { ?s ex:age "30" . }""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("a-b-c", "---")))
    intercept[SparqlCompiler.CompileException] {
      run("""SELECT (REPLACE("a", "b", "c", "z") AS ?x)
            |WHERE { ?s ex:age "30" . }""".stripMargin).collect()
    }
  }

  test("property path under variable GRAPH: per-graph closure + ?g binding") {
    val spark = TestSpark.spark
    val quads = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "a", "http://ex.org/next", "b", "g1"),
      RdfEvent(1, "b", "http://ex.org/next", "c", "g1"),
      RdfEvent(1, "a", "http://ex.org/next", "b", "g2")))
    val df = SparqlCompiler.compile(quads, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:next+ ?y . } }""".stripMargin))
    val rows = TestSpark.rows(df)
    // g1 has the 2-step chain; g2 must NOT see the b→c edge
    assert(rows === Set(
      Seq("g1", "a", "b"), Seq("g1", "b", "c"), Seq("g1", "a", "c"),
      Seq("g2", "a", "b")))
    // zero-length under variable graph: node sets stay per-graph
    val star = SparqlCompiler.compile(quads, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:next* ?y . } }""".stripMargin))
    val starRows = TestSpark.rows(star)
    assert(starRows.contains(Seq("g1", "c", "c")))
    assert(!starRows.contains(Seq("g2", "c", "c"))) // c not a g2 node
  }

  test("property path: negated set with inverse members !(p|^p)") {
    // forward non-knows edges (4) + reversed non-knows edges (4)
    val df = run(
      """SELECT ?s ?o WHERE { ?s !(ex:knows|^ex:knows) ?o . }""")
    assert(df.count() === 8)
    val rows = TestSpark.rows(df)
    assert(rows.contains(Seq("30", "http://ex.org/alice"))) // reversed age
    assert(!rows.contains(Seq("http://ex.org/alice", "http://ex.org/bob")))
  }

  test("IN / NOT IN with numeric-aware equality") {
    val in = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age . FILTER(?age IN (25.0, "35"))
        |}""".stripMargin)
    assert(TestSpark.rows(in) === Set(
      Seq("http://ex.org/bob"), Seq("http://ex.org/charlie")))
    val notIn = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age . FILTER(?age NOT IN (25.0, "35"))
        |}""".stripMargin)
    assert(TestSpark.rows(notIn) === Set(Seq("http://ex.org/alice")))
  }

  test("isIRI / isLiteral / isNumeric type predicates") {
    val iris = run(
      """SELECT ?o WHERE { ?s ?p ?o . FILTER(isIRI(?o)) }""")
    assert(iris.count() === 2) // the two knows-objects
    val lits = run(
      """SELECT ?o WHERE { ?s ?p ?o . FILTER(isLiteral(?o) && isNumeric(?o)) }""")
    assert(TestSpark.rows(lits) === Set(Seq("30"), Seq("25"), Seq("35")))
    val nonNum = run(
      """SELECT ?o WHERE { ?s ?p ?o . FILTER(isLiteral(?o) && !isNumeric(?o)) }""")
    assert(TestSpark.rows(nonNum) === Set(Seq("alice@ex.org")))
  }

  test("DESCRIBE a constant IRI returns its statements") {
    val df = run("""DESCRIBE <http://ex.org/alice>""")
    assert(df.count() === 4) // 2 knows + age + email
    assert(df.columns.toSeq === Seq("subject", "predicate", "object"))
  }

  test("DESCRIBE ?v WHERE selects statement sets via solutions") {
    val df = run(
      """DESCRIBE ?s WHERE { ?s ex:age ?age . FILTER(?age >= 30.0) }""")
    // alice (4 statements) + charlie (1 statement)
    assert(df.count() === 5)
    assert(df.select("subject").distinct().count() === 2)
  }

  test("extraKeys thread through property paths (per-window closure)") {
    val spark = TestSpark.spark
    // same chain in window 0; a shorter one in window 1
    val rows = Seq(
      (0L, "a", "http://ex.org/next", "b", ""),
      (0L, "b", "http://ex.org/next", "c", ""),
      (1L, "a", "http://ex.org/next", "b", ""))
    import spark.implicits._
    val quads = rows.toDF("__wid", "subject", "predicate", "object", "graph")
      .withColumn("timestamp", org.apache.spark.sql.functions.lit(1L))
    val df = SparqlCompiler.compile(quads, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?x ?y WHERE { ?x ex:next+ ?y . }""".stripMargin),
      extraKeys = Seq("__wid"))
    val byWid = df.collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(byWid(0L) === Set(("a", "b"), ("b", "c"), ("a", "c")))
    assert(byWid(1L) === Set(("a", "b"))) // window 1 has no b→c edge
  }

  test("LIMIT applies per window when extraKeys are present") {
    val spark = TestSpark.spark
    import spark.implicits._
    val quads = Seq(
      (0L, "s1", "http://ex.org/v", "3", ""),
      (0L, "s2", "http://ex.org/v", "1", ""),
      (0L, "s3", "http://ex.org/v", "2", ""),
      (1L, "s4", "http://ex.org/v", "9", ""),
      (1L, "s5", "http://ex.org/v", "8", ""))
      .toDF("__wid", "subject", "predicate", "object", "graph")
      .withColumn("timestamp", org.apache.spark.sql.functions.lit(1L))
    val df = SparqlCompiler.compile(quads, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s ?v WHERE { ?s ex:v ?v . }
        |ORDER BY DESC(?v) LIMIT 1""".stripMargin),
      extraKeys = Seq("__wid"))
    // top-1 per window, not global top-1
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((0L, "s1"), (1L, "s4")))
  }

  test("UNION branch not binding a shared var still joins (unbound is " +
      "compatible)") {
    // branch 2 does not bind ?o — its solutions must survive the join
    // with the outer pattern and take ?o from it
    val df = run(
      """SELECT ?s ?o WHERE {
        |  ?s ex:knows ?o .
        |  { ?s ex:knows ?o } UNION { ?s ex:email ?m }
        |}""".stripMargin)
    // branch 1: alice×(bob, charlie) matching outer rows = 2 solutions;
    // branch 2: alice's email row joins both outer knows rows = 2 more
    assert(df.count() === 4)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob"),
      Seq("http://ex.org/alice", "http://ex.org/charlie")))
  }

  test("BIND after OPTIONAL can reference the optional variable") {
    val df = run(
      """SELECT ?s ?contact WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  BIND(COALESCE(?mail, "none") AS ?contact)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "alice@ex.org"),
      Seq("http://ex.org/bob", "none"),
      Seq("http://ex.org/charlie", "none")))
  }

  test("chained OPTIONALs: a null var from the first extends in the " +
      "second (compatibility join)") {
    // bob/charlie have no email → ?m null after the first OPTIONAL; the
    // second OPTIONAL shares ?m and must still extend those solutions
    val df = run(
      """SELECT ?s ?m ?who WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?m }
        |  OPTIONAL { ?who ex:email ?m }
        |}""".stripMargin)
    // alice: m=alice@ex.org, who=alice. bob/charlie: m unbound →
    // compatible with alice's email row → m+who bound from it
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "alice@ex.org", "http://ex.org/alice"),
      Seq("http://ex.org/bob", "alice@ex.org", "http://ex.org/alice"),
      Seq("http://ex.org/charlie", "alice@ex.org", "http://ex.org/alice")))
  }

  test("subquery works as a UNION branch (SubSelect group form)") {
    val df = run(
      """SELECT ?s WHERE {
        |  { SELECT ?s WHERE { ?s ex:email ?m } }
        |  UNION
        |  { ?s ex:age "35" }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice"), Seq("http://ex.org/charlie")))
  }

  test("AVG(DISTINCT) averages the distinct multiset") {
    val spark = TestSpark.spark
    val dup = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "a", "http://ex.org/v", "10", ""),
      RdfEvent(2, "a", "http://ex.org/v", "10", ""),
      RdfEvent(3, "a", "http://ex.org/v", "40", "")))
    val df = SparqlCompiler.compile(dup, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT (AVG(DISTINCT ?v) AS ?a) (AVG(?v) AS ?b)
        |WHERE { ?s ex:v ?v . }""".stripMargin))
    val r = df.collect()(0)
    assert(r.getDouble(0) === 25.0) // (10+40)/2
    assert(r.getDouble(1) === 20.0) // (10+10+40)/3
  }

  test("aggregate over UNION + ORDER BY count DESC + LIMIT") {
    val df = run(
      """SELECT ?s (COUNT(?o) AS ?n) WHERE {
        |  { ?s ex:knows ?o } UNION { ?s ex:email ?o }
        |} GROUP BY ?s ORDER BY DESC(?n) ?s LIMIT 1""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice", "3")))
  }

  test("FILTER(!EXISTS{}) is the anti join; double negation restores " +
      "the semi join") {
    val anti = run(
      """SELECT ?s ?age WHERE {
        |  ?s ex:age ?age . FILTER(!EXISTS { ?s ex:email ?m })
        |}""".stripMargin)
    assert(TestSpark.rows(anti) === Set(
      Seq("http://ex.org/bob", "25"), Seq("http://ex.org/charlie", "35")))
    val semi = run(
      """SELECT ?s ?age WHERE {
        |  ?s ex:age ?age . FILTER(!(!EXISTS { ?s ex:email ?m }))
        |}""".stripMargin)
    assert(TestSpark.rows(semi) === Set(Seq("http://ex.org/alice", "30")))
  }

  test("MINUS with a nullable shared var removes compatible rows " +
      "(unbound matches anything, domains must overlap)") {
    // ?m is nullable (from OPTIONAL); MINUS shares {s, m}: alice's row
    // {s=alice, m=alice@ex.org} is compatible with the minus row and
    // must go; bob/charlie have m=null — domains overlap on s, so they
    // are compatible with any minus row sharing their s (none) and stay
    val df = run(
      """SELECT ?s ?m WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?m }
        |  MINUS { ?s ex:email ?m . FILTER(?s = "http://ex.org/alice") }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null")))
  }

  test("CONSTRUCT omits template instantiations with unbound components") {
    val df = run(
      """CONSTRUCT { ?s ex:mail ?m } WHERE {
        |  ?s ex:age ?age . OPTIONAL { ?s ex:email ?m }
        |}""".stripMargin)
    val rows = df.collect()
    assert(rows.length === 1) // only alice has an email
    assert(rows(0).getAs[String]("object") === "alice@ex.org")
  }

  test("projecting a variable bound nowhere yields unbound (null), " +
      "not an analysis crash") {
    val df = run(
      """SELECT ?s ?never WHERE { ?s ex:age ?age . }""")
    assert(df.count() === 3)
    assert(df.collect().forall(_.isNullAt(1)))
  }

  test("ROUND rounds a half toward positive infinity (fn:round)") {
    val r = run(
      """SELECT (ROUND(-2.5) AS ?a) (ROUND(2.5) AS ?b)
        |  (ROUND(-2.4) AS ?c) WHERE { ?s ex:email ?o . }""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === -2.0)
    assert(r.getDouble(1) === 3.0)
    assert(r.getDouble(2) === -2.0)
  }

  // ---- term introspection builtins -------------------------------------

  test("DATATYPE: decimal for numerics, string for plain literals, " +
      "type error (null) for IRIs") {
    val df = run(
      """SELECT ?s ?o (DATATYPE(?o) AS ?dt) WHERE {
        |  ?s ?p ?o . FILTER(?p = "http://ex.org/age" ||
        |    ?p = "http://ex.org/email" || ?p = "http://ex.org/knows")
        |  FILTER(?s = "http://ex.org/alice")
        |}""".stripMargin)
    val dts = df.collect().map(r =>
      r.getAs[String]("o") -> r.getAs[String]("dt")).toMap
    assert(dts("30") === "http://www.w3.org/2001/XMLSchema#decimal")
    assert(dts("alice@ex.org") === "http://www.w3.org/2001/XMLSchema#string")
    assert(dts("http://ex.org/bob") === null)
  }

  test("LANG is empty for literals (tags dropped at parse), null for IRIs") {
    val df = run(
      """SELECT ?o (LANG(?o) AS ?l) WHERE {
        |  ?s ?p ?o . FILTER(?s = "http://ex.org/alice")
        |  FILTER(?p = "http://ex.org/email" || ?p = "http://ex.org/knows")
        |}""".stripMargin)
    val langs = df.collect().map(r =>
      r.getAs[String]("o") -> Option(r.getAs[String]("l"))).toMap
    assert(langs("alice@ex.org") === Some(""))
    assert(langs("http://ex.org/bob") === None)
  }

  test("FILTER(DATATYPE(?o) = <xsd:decimal>) keeps only numerics; " +
      "IRI rows are type-errors and filtered") {
    val df = run(
      """SELECT ?s ?o WHERE {
        |  ?s ?p ?o .
        |  FILTER(DATATYPE(?o) = <http://www.w3.org/2001/XMLSchema#decimal>)
        |}""".stripMargin)
    assert(df.collect().map(_.getAs[String]("o")).toSet ===
      Set("30", "25", "35"))
  }

  test("LANGMATCHES: '*' wants a non-empty tag; prefix match is " +
      "case-insensitive") {
    // all stored literals have lang "" → LANGMATCHES(LANG(?o), "*") is
    // false for literals and a type error for IRIs → zero rows survive
    val df = run(
      """SELECT ?o WHERE {
        |  ?s ex:email ?o . FILTER(LANGMATCHES(LANG(?o), "*"))
        |}""".stripMargin)
    assert(df.count() === 0)
    // constant-tag checks exercise the matcher itself
    val probe = run(
      """SELECT ?o (IF(LANGMATCHES("en-GB", "EN"), 1, 0) AS ?a)
        |  (IF(LANGMATCHES("en-GB", "en-gb"), 1, 0) AS ?b)
        |  (IF(LANGMATCHES("fr", "en"), 1, 0) AS ?c)
        |  (IF(LANGMATCHES("en", "*"), 1, 0) AS ?d)
        |WHERE { ?s ex:email ?o . }""".stripMargin).collect()(0)
    assert((probe.getDouble(1), probe.getDouble(2), probe.getDouble(3),
      probe.getDouble(4)) === ((1.0, 1.0, 0.0, 1.0)))
    // projecting LANGMATCHES directly yields its EBV, not NULL
    val proj = run(
      """SELECT (LANGMATCHES("en-GB", "en") AS ?m) WHERE {
        |  ?s ex:email ?o . }""".stripMargin).collect()(0)
    assert(proj.getDouble(0) === 1.0)
  }

  test("IRI/URI construct from CONCAT; STRDT/STRLANG reduce to the " +
      "lexical form under the stripped-tag term model") {
    val df = run(
      """SELECT ?s (IRI(CONCAT("http://ex.org/p/", STR(?age))) AS ?u)
        |  (STRDT(STR(?age), <http://www.w3.org/2001/XMLSchema#int>) AS ?d)
        |  (STRLANG("chat", "en") AS ?sl)
        |WHERE { ?s ex:age ?age . FILTER(?s = "http://ex.org/bob")
        |  FILTER(ISIRI(IRI("http://ex.org/x"))) }""".stripMargin)
    val r = df.collect()(0)
    assert(r.getAs[String]("u") === "http://ex.org/p/25")
    assert(r.getAs[String]("d") === "25")
    assert(r.getAs[String]("sl") === "chat")
  }

  test("ENCODE_FOR_URI: RFC 3986 unreserved kept, the rest uppercase " +
      "percent-encoded") {
    val df = run(
      """SELECT (ENCODE_FOR_URI("A-b_c.d~e f/g?h*i") AS ?e)
        |WHERE { ?s ex:email ?o . }""".stripMargin)
    assert(df.collect()(0).getAs[String]("e") ===
      "A-b_c.d~e%20f%2Fg%3Fh%2Ai")
  }

  // ---- source-order group compilation (SPARQL 1.1 §18.2.2.6) ----------

  test("a pattern AFTER a BIND joins on the BIND-introduced variable") {
    // BIND fixes ?age := "25"; the following pattern ?who ex:age ?age
    // must join on it (only bob matches). Kind-segregated compilation
    // would have applied the BIND last and cross-joined all ages.
    val df = run(
      """SELECT ?who WHERE {
        |  ?s ex:email ?m .
        |  BIND("25" AS ?age)
        |  ?who ex:age ?age .
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/bob")))
  }

  test("OPTIONAL and MINUS after a BIND see the BIND-introduced variable") {
    val opt = run(
      """SELECT ?s ?m WHERE {
        |  ?s ex:age ?age .
        |  BIND("http://ex.org/bob" AS ?target)
        |  OPTIONAL { ?s ex:knows ?target . ?s ex:email ?m }
        |}""".stripMargin)
    assert(TestSpark.rows(opt) === Set(
      Seq("http://ex.org/alice", "alice@ex.org"),
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null")))
    val minus = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  BIND("http://ex.org/bob" AS ?o)
        |  MINUS { ?s ex:knows ?o . }
        |}""".stripMargin)
    assert(TestSpark.rows(minus) === Set(
      Seq("http://ex.org/bob"), Seq("http://ex.org/charlie")))
  }

  test("BIND referencing an earlier OPTIONAL variable sees its binding") {
    val df = run(
      """SELECT ?s ?has WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  BIND(IF(BOUND(?mail), "y", "n") AS ?has)
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "y"),
      Seq("http://ex.org/bob", "n"),
      Seq("http://ex.org/charlie", "n")))
  }

  test("a group may start with BIND (unit solution, §18.2.2.6)") {
    val df = run(
      """SELECT ?who WHERE {
        |  BIND("30" AS ?age)
        |  ?who ex:age ?age .
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
  }

  // ---- VALUES UNDEF ----------------------------------------------------

  test("VALUES UNDEF cell is compatible with any binding") {
    val df = run(
      """SELECT ?s ?tag WHERE {
        |  ?s ex:age ?age .
        |  VALUES (?s ?tag) {
        |    ("http://ex.org/bob" "b")
        |    (UNDEF "all")
        |  }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "all"),
      Seq("http://ex.org/bob", "b"),
      Seq("http://ex.org/bob", "all"),
      Seq("http://ex.org/charlie", "all")))
  }

  test("single-variable VALUES with UNDEF keeps every solution") {
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:email ?m .
        |  VALUES ?m { UNDEF }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
  }

  // ---- typed MIN/MAX ---------------------------------------------------

  test("MIN/MAX over a string-valued variable are lexicographic terms") {
    val df = run(
      """SELECT (MIN(?o) AS ?lo) (MAX(?o) AS ?hi) WHERE {
        |  ?s ex:knows ?o .
        |}""".stripMargin)
    val r = df.collect()(0)
    assert(r.getAs[String]("lo") === "http://ex.org/bob")
    assert(r.getAs[String]("hi") === "http://ex.org/charlie")
  }

  test("MIN/MAX over numeric-sniffed terms compare by value, not " +
      "lexically, and return the winning lexical form") {
    // ages 30/25/35: lexicographic min would be "25" too, but lexical
    // MAX would be "35" == numeric here; add a 3-digit age to separate
    val data2 = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://ex.org/a", "http://ex.org/age", "9", ""),
      RdfEvent(1, "http://ex.org/b", "http://ex.org/age", "100", ""),
      RdfEvent(1, "http://ex.org/c", "http://ex.org/age", "25", "")))
    val df = SparqlCompiler.compile(data2, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT (MIN(?age) AS ?lo) (MAX(?age) AS ?hi) WHERE {
        |  ?s ex:age ?age .
        |}""".stripMargin))
    val r = df.collect()(0)
    assert(r.getAs[String]("lo") === "9")    // lexical min would be "100"
    assert(r.getAs[String]("hi") === "100")  // lexical max would be "9"
  }

  test("SUM/AVG over a group containing a non-numeric value error to " +
      "NULL (§18.5), numeric-only groups aggregate normally") {
    val mixed = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://ex.org/a", "http://ex.org/v", "1", "g1"),
      RdfEvent(1, "http://ex.org/b", "http://ex.org/v", "2", "g1"),
      RdfEvent(1, "http://ex.org/c", "http://ex.org/v", "oops", "g1"),
      RdfEvent(1, "http://ex.org/d", "http://ex.org/w", "3", "g2"),
      RdfEvent(1, "http://ex.org/e", "http://ex.org/w", "4", "g2")))
    val df = SparqlCompiler.compile(mixed, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?p (SUM(?o) AS ?s) (AVG(?o) AS ?a) WHERE {
        |  ?x ?p ?o .
        |} GROUP BY ?p""".stripMargin))
    val rows = df.collect().map(r =>
      r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    // the mixed group errors; the numeric group aggregates
    assert(rows("http://ex.org/v") === ((None, None)))
    assert(rows("http://ex.org/w") === ((Some(7.0), Some(3.5))))
  }

  // ---- EBV error semantics --------------------------------------------

  test("EBV of an IRI is a type error: FILTER drops the row and ! does " +
      "not resurrect it") {
    val direct = run(
      """SELECT ?s WHERE { ?s ex:age ?age . FILTER(?s) }""")
    assert(direct.count() === 0)
    val negated = run(
      """SELECT ?s WHERE { ?s ex:age ?age . FILTER(!(?s)) }""")
    assert(negated.count() === 0)
  }

  test("EBV of plain literals: non-empty true, numeric by value, " +
      "boolean lexicals by value") {
    val ebv = RdfEvent.toDF(spark, Seq(
      RdfEvent(1, "http://ex.org/s1", "http://ex.org/p", "hello", ""),
      RdfEvent(1, "http://ex.org/s2", "http://ex.org/p", "0", ""),
      RdfEvent(1, "http://ex.org/s3", "http://ex.org/p", "false", ""),
      RdfEvent(1, "http://ex.org/s4", "http://ex.org/p", "2.5", ""),
      RdfEvent(1, "http://ex.org/s5", "http://ex.org/p", "true", "")))
    val df = SparqlCompiler.compile(ebv, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s WHERE { ?s ex:p ?o . FILTER(?o) }""".stripMargin))
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/s1"), Seq("http://ex.org/s4"),
      Seq("http://ex.org/s5")))
  }

  test("IF with an error condition is an error, not the else branch") {
    // EBV(?s) errors (IRI) → IF errors → ?r is unbound (NULL)
    val df = run(
      """SELECT ?s (IF(?s, "t", "f") AS ?r) WHERE {
        |  ?s ex:email ?m .
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice", "null")))
  }

  // ---- round-7 review findings ----------------------------------------

  test("a FILTER inside a nested group scopes to ITS group, not the " +
      "enclosing one (§18.2.2.2)") {
    // the inner filter references ?mail, which the INNER group does not
    // bind → type error inside the group → inner group empty → join
    // empty. Hoisting the filter to the outer group (where the OPTIONAL
    // binds ?mail for alice) would wrongly keep alice.
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  { ?s ex:knows ?o . FILTER(STRLEN(?mail) > 0) }
        |}""".stripMargin)
    assert(df.count() === 0)
  }

  test("FILTER EXISTS through an unbound shared var leaves it free " +
      "(compat semi-join), NOT EXISTS conversely") {
    // bob/charlie have ?mail unbound: EXISTS { ?m2 ... } with ?mail
    // free must check whether ANY email triple exists → true for all
    val ex = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  FILTER EXISTS { ?who ex:email ?mail }
        |}""".stripMargin)
    assert(TestSpark.rows(ex) === Set(Seq("http://ex.org/alice"),
      Seq("http://ex.org/bob"), Seq("http://ex.org/charlie")))
    val notEx = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:email ?mail }
        |  FILTER NOT EXISTS { ?who ex:email ?mail }
        |}""".stripMargin)
    assert(notEx.count() === 0)
  }

  test("numeric vs IRI under = / != is definitively unequal, not a " +
      "type error") {
    // ?age != <iri>: a literal and an IRI are distinct terms → true →
    // rows kept ('=' conversely false → all filtered). The old NULL
    // coercion filtered everything for both.
    val ne = run(
      """SELECT ?s WHERE { ?s ex:age ?age .
        |  FILTER(?age != <http://ex.org/bob>) }""".stripMargin)
    assert(ne.count() === 3)
    val eq = run(
      """SELECT ?s WHERE { ?s ex:age ?age .
        |  FILTER(?age = <http://ex.org/bob>) }""".stripMargin)
    assert(eq.count() === 0)
  }

  test("GROUP BY without aggregates yields one row per key") {
    val df = run(
      """SELECT ?s WHERE { ?s ex:knows ?o . } GROUP BY ?s""")
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
  }

  test("HAVING with an aggregate inside IN compiles") {
    val df = run(
      """SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:knows ?o . }
        |GROUP BY ?s HAVING (COUNT(?o) IN (2, 3))""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice", "2")))
  }

  test("OPTIONAL filter referencing an OUTER variable is a LeftJoin " +
      "condition over the merged domain (§18.2.2.6 LeftJoin(A,B,F))") {
    val df = run(
      """SELECT ?s ?bigger WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?bigger ex:age ?age2 . FILTER(?age2 > ?age) }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/charlie"),
      Seq("http://ex.org/bob", "http://ex.org/alice"),
      Seq("http://ex.org/bob", "http://ex.org/charlie"),
      Seq("http://ex.org/charlie", "null")))
  }

  test("EXISTS filter referencing an OUTER variable correlates per row " +
      "(substitution semantics, §18.6)") {
    val ex = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER EXISTS { ?p ex:age ?age2 . FILTER(?age2 > ?age) }
        |}""".stripMargin)
    assert(TestSpark.rows(ex) === Set(
      Seq("http://ex.org/alice"), Seq("http://ex.org/bob")))
    val notEx = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER NOT EXISTS { ?p ex:age ?age2 . FILTER(?age2 > ?age) }
        |}""".stripMargin)
    assert(TestSpark.rows(notEx) === Set(Seq("http://ex.org/charlie")))
  }

  test("EXISTS inside an OPTIONAL's crossing filter decorrelates into " +
      "an aggregate comparison (no cartesian fallback)") {
    // for each (s, age): keep (s knows o) rows where o has a SMALLER
    // age than s — the EXISTS references ?age, which the OPTIONAL does
    // not bind, so the whole filter is part of the LeftJoin condition.
    // The single crossing inequality (?age2 < ?age) decorrelates to
    // min(age2) per ?o, hash-joined onto the optional side.
    val df = run(
      """SELECT ?s ?o WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:knows ?o
        |    FILTER(EXISTS { ?o ex:age ?age2 . FILTER(?age2 < ?age) }) }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob"),
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("min(")) // the decorrelated extreme aggregate
  }

  test("a non-decorrelatable crossing EXISTS (inequality is !=) still " +
      "takes the Filter(F,Join) ∪ Diff fallback correctly") {
    // != cannot be answered by a min/max aggregate, so the fallback
    // (id-tagged merged join, both branches off one checkpoint) runs
    val df = run(
      """SELECT ?s ?o WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:knows ?o
        |    FILTER(EXISTS { ?o ex:age ?age2 . FILTER(?age2 != ?age) }) }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob"),
      Seq("http://ex.org/alice", "http://ex.org/charlie"),
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null")))
  }

  test("a crossing filter over a var bound by BOTH sides but nullable " +
      "on the inner side reads the merged (outer) value") {
    // dave has no age: the optional group's nested OPTIONAL leaves
    // ?age unbound for him, and the crossing FILTER(?age <= ?cap)
    // must then see the OUTER ?age (30), not UNBOUND
    val d = RdfEvent.toDF(spark, Seq(
      RdfEvent(1000, "http://ex.org/alice", "http://ex.org/knows",
        "http://ex.org/bob", ""),
      RdfEvent(1000, "http://ex.org/alice", "http://ex.org/knows",
        "http://ex.org/dave", ""),
      RdfEvent(1000, "http://ex.org/alice", "http://ex.org/age", "30", ""),
      RdfEvent(1000, "http://ex.org/bob", "http://ex.org/age", "25", ""),
      RdfEvent(1000, "http://ex.org/alice", "http://ex.org/cap", "99", ""),
      RdfEvent(1000, "http://ex.org/bob", "http://ex.org/cap", "1", "")))
    val df = SparqlCompiler.compile(d, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s ?o ?age WHERE {
        |  ?s ex:age ?age . ?s ex:cap ?cap .
        |  OPTIONAL { ?s ex:knows ?o .
        |    OPTIONAL { ?o ex:age ?age }
        |    FILTER(?age <= ?cap) }
        |}""".stripMargin))
    // alice: bob-pair incompatible (25 ≠ 30); dave-pair compatible
    // (inner ?age unbound), merged ?age = 30 ≤ 99 → match.
    // bob (cap 1): no knows rows at all → survives unbound.
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/dave", "30"),
      Seq("http://ex.org/bob", "null", "25")))
  }

  test("a leading VALUES deferred under windowed evaluation still " +
      "lands before a BIND that references it") {
    import org.apache.spark.sql.functions.lit
    val keyed = data.withColumn("__w", lit(1L))
    val df = SparqlCompiler.compile(keyed, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s ?y WHERE {
        |  VALUES ?x { "5" }
        |  BIND(?x AS ?y)
        |  ?s ex:age ?age .
        |}""".stripMargin), Seq("__w"))
    assert(TestSpark.rows(df.select("s", "y")) === Set(
      Seq("http://ex.org/alice", "5"),
      Seq("http://ex.org/bob", "5"),
      Seq("http://ex.org/charlie", "5")))
  }

  test("compat join with nulls on BOTH sides: null-bucket split keeps " +
      "every compatible pair") {
    // g1 leaves ?v unbound on the email branch; g2 on the knows
    // branch — pairs are compatible when either side is unbound or
    // the values are equal: 3 equal + 3×2 left-bound×right-null +
    // 1×5 left-null×all = 14 pairs
    val df = run(
      """SELECT ?s ?t ?v WHERE {
        |  { { ?s ex:age ?v } UNION { ?s ex:email ?m } }
        |  { { ?t ex:age ?v } UNION { ?t ex:knows ?o } }
        |}""".stripMargin)
    assert(df.count() === 14)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the bound×bound bucket keeps a hash-extractable equality key
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    // left-null rows take the RIGHT side's value after the merge
    assert(TestSpark.rows(df.where("s = 'http://ex.org/alice'")
      .select("v")).contains(Seq("25")))
  }

  test("OPTIONAL over a nullable shared var (compat left join) keeps " +
      "unmatched rows and merges matched values") {
    val df = run(
      """SELECT ?s ?v ?m ?t WHERE {
        |  { { ?s ex:age ?v } UNION { ?s ex:email ?m } }
        |  OPTIONAL { ?t ex:age ?v . FILTER(?v > 26) }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "30", "null", "http://ex.org/alice"),
      Seq("http://ex.org/bob", "25", "null", "null"),
      Seq("http://ex.org/charlie", "35", "null", "http://ex.org/charlie"),
      Seq("http://ex.org/alice", "30", "alice@ex.org",
        "http://ex.org/alice"),
      Seq("http://ex.org/alice", "35", "alice@ex.org",
        "http://ex.org/charlie")))
  }

  test("a nested EXISTS inside a top-level EXISTS's crossing filter " +
      "decorrelates: semi-join + aggregate, no materialized substitution") {
    // keep (s, age) when s knows some o whose age2 < age — the nested
    // EXISTS crosses to outer ?age, so the substitution path would
    // materialize outer×inner; decorrelation turns it into
    // min(age2)-per-?o hash-joined onto the knows side, and the top
    // EXISTS stays an ordinary (short-circuiting) semi join
    val q =
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER(%sEXISTS { ?s ex:knows ?o .
        |    FILTER(EXISTS { ?o ex:age ?age2 . FILTER(?age2 < ?age) }) })
        |}""".stripMargin
    val df = run(q.format(""))
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("min(")) // the decorrelated extreme aggregate
    assert(plan.toLowerCase.contains("semi"))
    // the anti polarity flips the same decorrelated plan
    assert(TestSpark.rows(run(q.format("NOT "))) === Set(
      Seq("http://ex.org/bob"), Seq("http://ex.org/charlie")))
  }

  test("EXISTS under && is split into an independent semijoin conjunct") {
    val df = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER(?age > 26 && EXISTS { ?s ex:email ?mail })
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(Seq("http://ex.org/alice")))
  }

  test("EXISTS nested inside a crossing EXISTS filter recurses through " +
      "the merged-domain fallback") {
    // s kept iff some p is OLDER than s and that p has an email:
    // only alice has email (age 30), so only bob (25) qualifies
    val ex = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER EXISTS { ?p ex:age ?age2 .
        |    FILTER(?age2 > ?age && EXISTS { ?p ex:email ?mail }) }
        |}""".stripMargin)
    assert(TestSpark.rows(ex) === Set(Seq("http://ex.org/bob")))
    val notEx = run(
      """SELECT ?s WHERE {
        |  ?s ex:age ?age .
        |  FILTER NOT EXISTS { ?p ex:age ?age2 .
        |    FILTER(?age2 > ?age && EXISTS { ?p ex:email ?mail }) }
        |}""".stripMargin)
    assert(TestSpark.rows(notEx) === Set(
      Seq("http://ex.org/alice"), Seq("http://ex.org/charlie")))
  }

  test("a BIND over an outer variable inside EXISTS correlates via " +
      "substitution (§18.6), not against an unbound variable") {
    val df = run(
      """SELECT ?s ?o WHERE {
        |  ?s ex:age ?age .
        |  OPTIONAL { ?s ex:knows ?o
        |    FILTER(EXISTS { BIND(?age - 1 AS ?cap)
        |      ?o ex:age ?a2 . FILTER(?a2 <= ?cap) }) }
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "http://ex.org/bob"),
      Seq("http://ex.org/bob", "null"),
      Seq("http://ex.org/charlie", "null")))
  }

  test("an element-free nested group's FILTER sees only the unit " +
      "solution — its variables are unbound there (§18.2.2.2)") {
    // ?age is bound OUTSIDE the group; inside, it is unbound → error →
    // the group is empty → the whole query result is empty
    val empty = run(
      """SELECT ?s WHERE { ?s ex:age ?age . { FILTER(?age > 1) } }""")
    assert(TestSpark.rows(empty) === Set.empty[Seq[String]])
    // a variable-free true filter keeps every solution
    val all = run(
      """SELECT ?s WHERE { ?s ex:age ?age . { FILTER(1 < 2) } }""")
    assert(TestSpark.rows(all) === Set(
      Seq("http://ex.org/alice"), Seq("http://ex.org/bob"),
      Seq("http://ex.org/charlie")))
  }

  test("a nested group starting with OPTIONAL compiles under windowed " +
      "evaluation (per-key unit solution)") {
    import org.apache.spark.sql.functions.lit
    val keyed = data.withColumn("__w", lit(1L))
    val df = SparqlCompiler.compile(keyed, SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s ?mail WHERE {
        |  { OPTIONAL { ?s ex:email ?mail } }
        |  ?s ex:age ?age .
        |}""".stripMargin), Seq("__w"))
    assert(TestSpark.rows(df.select("s", "mail")) === Set(
      Seq("http://ex.org/alice", "alice@ex.org")))
  }

  test("subquery vars that may be unbound join with compatibility " +
      "semantics outside the subquery") {
    // the subquery leaves ?mail unbound for bob/charlie; the outer
    // pattern binds ?mail from data — an equi-join would drop the
    // unbound rows, compatibility keeps them (unbound matches anything)
    val df = run(
      """SELECT ?s ?mail WHERE {
        |  { SELECT ?s ?mail WHERE {
        |      ?s ex:age ?age . OPTIONAL { ?s ex:email ?mail } } }
        |  ?who ex:email ?mail .
        |}""".stripMargin)
    assert(TestSpark.rows(df) === Set(
      Seq("http://ex.org/alice", "alice@ex.org"),
      Seq("http://ex.org/bob", "alice@ex.org"),
      Seq("http://ex.org/charlie", "alice@ex.org")))
  }
}
