package graft.janusql

import org.scalatest.funsuite.AnyFunSuite

/** Port of `/root/reference/tests/janusql_parser_test.rs` (the tightest
  * spec of the Janus-QL front end, SURVEY.md §5.2). */
class JanusQLParserSpec extends AnyFunSuite {

  test("basic live window") {
    val parsed = JanusQLParser.parse(
      """PREFIX sensor: <https://rsp.js/sensors/>
        |PREFIX saref: <https://saref.org/core/>
        |REGISTER RStream sensor:output AS
        |SELECT ?temperature ?timestamp
        |FROM NAMED WINDOW sensor:tempWindow ON STREAM sensor:temperatureStream [RANGE 5000 STEP 1000]
        |WHERE {
        |    WINDOW :temperatureWindow {
        |        ?event saref:hasValue ?temperature .
        |        ?event saref:hasTimestamp ?timestamp .
        |    }
        |}""".stripMargin)
    assert(parsed.liveWindows.length === 1)
    assert(parsed.historicalWindows.isEmpty)
    assert(parsed.liveWindows.head.width === 5000)
    assert(parsed.liveWindows.head.slide === 1000)
    assert(parsed.rspqlQuery.nonEmpty)
  }

  test("mixed windows: 1 live + 2 historical, 2 sparql queries") {
    val parsed = JanusQLParser.parse(
      """PREFIX sensor: <https://rsp.js/sensors/>
        |PREFIX saref: <https://saref.org/core/>
        |REGISTER RStream sensor:output AS
        |SELECT ?temperature ?timestamp
        |FROM NAMED WINDOW sensor:tempWindow ON STREAM sensor:temperatureStream [RANGE 5000 STEP 1000]
        |FROM NAMED WINDOW sensor:histWindow ON STREAM sensor:temperatureStream [START 1622505600 END 1622592000]
        |FROM NAMED WINDOW sensor:histSlideWindow ON STREAM sensor:temperatureStream [OFFSET 1622505600 RANGE 10000 STEP 2000]
        |WHERE {
        |    WINDOW sensor:tempWindow {
        |        ?event saref:hasValue ?temperature .
        |        ?event saref:hasTimestamp ?timestamp .
        |    }
        |    WINDOW sensor:histWindow {
        |        ?event saref:hasValue ?temperature .
        |        ?event saref:hasTimestamp ?timestamp .
        |    }
        |    WINDOW sensor:histSlideWindow {
        |        ?event saref:hasValue ?temperature .
        |        ?event saref:hasTimestamp ?timestamp .
        |    }
        |}""".stripMargin)
    assert(parsed.liveWindows.length === 1)
    assert(parsed.historicalWindows.length === 2)
    assert(parsed.liveWindows.head.width === 5000)
    assert(parsed.liveWindows.head.slide === 1000)
    assert(parsed.historicalWindows(0).start === Some(1622505600L))
    assert(parsed.historicalWindows(0).end === Some(1622592000L))
    assert(parsed.historicalWindows(1).offset === Some(1622505600L))
    assert(parsed.historicalWindows(1).width === 10000)
    assert(parsed.historicalWindows(1).slide === 2000)
    assert(parsed.rspqlQuery.nonEmpty)
    assert(parsed.sparqlQueries.length === 2)
  }

  test("ON LOG historical windows target ?__janus_log_graph") {
    val parsed = JanusQLParser.parse(
      """PREFIX sensor: <https://rsp.js/sensors/>
        |SELECT ?temperature
        |FROM NAMED WINDOW sensor:histWindow ON LOG sensor:historicalStore [START 1000 END 2000]
        |FROM NAMED WINDOW sensor:histSlideWindow ON LOG sensor:historicalStore [OFFSET 500 RANGE 1000 STEP 100]
        |WHERE {
        |    WINDOW sensor:histWindow {
        |        ?event sensor:value ?temperature .
        |    }
        |    WINDOW sensor:histSlideWindow {
        |        ?event sensor:value ?temperature .
        |    }
        |}""".stripMargin)
    assert(parsed.liveWindows.isEmpty)
    assert(parsed.historicalWindows.length === 2)
    assert(parsed.historicalWindows.forall(_.sourceKind == SourceKind.Log))
    assert(parsed.sparqlQueries.forall(_.contains("GRAPH ?__janus_log_graph")))
  }

  test("parseAst exposes structured window specs") {
    val ast = JanusQLParser.parseAst(
      """PREFIX ex: <http://example.org/>
        |REGISTER RStream ex:out AS
        |SELECT ?sensor
        |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 1000 END 2000]
        |WHERE {
        |    WINDOW ex:live { ?sensor ex:value ?value }
        |    WINDOW ex:hist { ?sensor ex:value ?value }
        |}""".stripMargin)
    assert(ast.windows.length === 2)
    assert(ast.whereWindows.length === 2)
    assert(ast.prefixes.length === 1)
    assert(ast.windows(0).spec === WindowSpec.LiveSliding(500, 100))
    assert(ast.windows(1).spec === WindowSpec.HistoricalFixed(1000, 2000))
  }

  test("REGISTER clause is structured, name unwrapped") {
    val ast = JanusQLParser.parseAst(
      """PREFIX ex: <http://example.org/>
        |REGISTER RStream ex:out AS
        |SELECT ?sensor
        |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
        |WHERE {
        |    WINDOW ex:live { ?sensor ex:value ?value }
        |}""".stripMargin)
    val r = ast.register.getOrElse(fail("expected register clause"))
    assert(r.operator === "RStream")
    assert(r.name === "http://example.org/out")
  }

  test("multi-line FROM NAMED WINDOW clause is supported") {
    val ast = JanusQLParser.parseAst(
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor
        |FROM NAMED WINDOW ex:hist ON LOG ex:store
        |    [START 1000 END 2000]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:value ?value }
        |}""".stripMargin)
    assert(ast.windows.length === 1)
    assert(ast.windows.head.spec === WindowSpec.HistoricalFixed(1000, 2000))
  }

  test("ON LOG historical sliding window spec") {
    val ast = JanusQLParser.parseAst(
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [OFFSET 3000 RANGE 1000 STEP 250]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:value ?value }
        |}""".stripMargin)
    assert(ast.windows.length === 1)
    assert(ast.windows.head.sourceKind === SourceKind.Log)
    assert(ast.windows.head.spec ===
      WindowSpec.HistoricalSliding(3000, 1000, 250))
  }

  test("WINDOW body extraction keeps nested braces intact") {
    val ast = JanusQLParser.parseAst(
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor
        |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
        |WHERE {
        |    WINDOW ex:live {
        |        ?sensor ex:value ?value .
        |        FILTER(EXISTS {
        |            ?sensor ex:meta ?meta .
        |        })
        |    }
        |}""".stripMargin)
    assert(ast.whereWindows.length === 1)
    assert(ast.whereWindows.head.body.contains("FILTER(EXISTS"))
    assert(ast.whereWindows.head.body.contains("?sensor ex:meta ?meta"))
  }

  test("live query preserves non-window patterns (baseline joins + FILTER)") {
    val parsed = JanusQLParser.parse(
      """PREFIX ex: <http://example.org/>
        |PREFIX janus: <https://janus.rs/fn#>
        |PREFIX baseline: <https://janus.rs/baseline#>
        |REGISTER RStream ex:out AS
        |SELECT ?sensor ?reading
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 1000 END 2000]
        |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
        |WHERE {
        |    WINDOW ex:hist {
        |        ?sensor ex:reading ?histReading .
        |    }
        |    WINDOW ex:live {
        |        ?sensor ex:reading ?reading .
        |    }
        |    ?sensor baseline:mean ?mean .
        |    ?sensor baseline:sigma ?sigma .
        |    FILTER(janus:is_outlier(?reading, ?mean, ?sigma, 3))
        |}""".stripMargin)
    assert(parsed.rspqlQuery.contains("?sensor baseline:mean ?mean"))
    assert(parsed.rspqlQuery.contains("?sensor baseline:sigma ?sigma"))
    assert(parsed.rspqlQuery.contains(
      "FILTER(janus:is_outlier(?reading, ?mean, ?sigma, 3))"))
    assert(parsed.rspqlQuery.contains("WINDOW ex:live"))
    assert(!parsed.rspqlQuery.contains("WINDOW ex:hist"))
  }

  test("USING BASELINE clause parses with mode") {
    val parsed = JanusQLParser.parse(
      """PREFIX ex: <http://example.org/>
        |REGISTER RStream ex:out AS
        |SELECT ?sensor ?reading
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 1000 END 2000]
        |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
        |USING BASELINE ex:hist AGGREGATE
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:mean ?mean }
        |    WINDOW ex:live { ?sensor ex:reading ?reading }
        |}""".stripMargin)
    val b = parsed.baseline.getOrElse(fail("expected baseline clause"))
    assert(b.windowName === "http://example.org/hist")
    assert(b.mode === BaselineMode.Aggregate)
  }

  test("USING BASELINE with unknown historical window errors") {
    assertThrows[JanusQLParser.JanusParseException] {
      JanusQLParser.parse(
        """PREFIX ex: <http://example.org/>
          |SELECT ?sensor
          |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
          |USING BASELINE ex:missing LAST
          |WHERE {
          |    WINDOW ex:live { ?sensor ex:value ?value }
          |}""".stripMargin)
    }
  }

  test("RANGE/STEP window on LOG source errors (stream-only)") {
    assertThrows[JanusQLParser.JanusParseException] {
      JanusQLParser.parseAst(
        """PREFIX ex: <http://example.org/>
          |SELECT ?s
          |FROM NAMED WINDOW ex:w ON LOG ex:store [RANGE 500 STEP 100]
          |WHERE { WINDOW ex:w { ?s ex:v ?v } }""".stripMargin)
    }
  }

  test("negative window-spec numbers are parse errors (reference " +
      "parses u64)") {
    assertThrows[JanusQLParser.JanusParseException] {
      JanusQLParser.parseAst(
        """PREFIX ex: <http://example.org/>
          |SELECT ?s
          |FROM NAMED WINDOW ex:w ON LOG ex:store [OFFSET -100 RANGE 10 STEP 5]
          |WHERE { WINDOW ex:w { ?s ex:v ?v } }""".stripMargin)
    }
    assertThrows[JanusQLParser.JanusParseException] {
      JanusQLParser.parseAst(
        """PREFIX ex: <http://example.org/>
          |SELECT ?s
          |FROM NAMED WINDOW ex:w ON STREAM ex:str [RANGE -10 STEP 5]
          |WHERE { WINDOW ex:w { ?s ex:v ?v } }""".stripMargin)
    }
  }

  test("unknown baseline mode errors") {
    assertThrows[JanusQLParser.JanusParseException] {
      JanusQLParser.parseAst("USING BASELINE ex:h SOMETIMES")
    }
  }

  test("historical SPARQL SELECT is filtered to window-bound variables") {
    val parsed = JanusQLParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor ?reading ?histReading
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 1000 END 2000]
        |FROM NAMED WINDOW ex:live ON STREAM ex:stream [RANGE 500 STEP 100]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:reading ?histReading }
        |    WINDOW ex:live { ?sensor ex:reading ?reading }
        |}""".stripMargin)
    assert(parsed.sparqlQueries.length === 1)
    val hist = parsed.sparqlQueries.head
    assert(hist.contains("?sensor") && hist.contains("?histReading"))
    assert(!hist.contains("SELECT ?sensor ?reading ?histReading"))
  }

  test("generated historical SPARQL parses with the SPARQL-subset parser " +
      "and compiles") {
    val parsed = JanusQLParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor ?v
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 10000]
        |WHERE {
        |    WINDOW ex:hist { ?sensor ex:value ?v }
        |}""".stripMargin)
    val compiled = parsed.compiledHistoricalQueries
    assert(compiled.length === 1)
    val (w, q) = compiled.head
    assert(w.start === Some(0L))
    // compile against a tiny quads DF to prove the plan is executable
    val spark = graft.TestSpark.spark
    val quads = graft.core.RdfEvent.toDF(spark, Seq(
      graft.core.RdfEvent(5, "http://example.org/s1",
        "http://example.org/value", "42", "http://g.org/any")))
    val out = graft.historical.HistoricalExecutor.executeFixed(
      quads, q, w.start.get, w.end.get)
    assert(graft.TestSpark.rows(out.select("sensor", "v")) ===
      Set(Seq("http://example.org/s1", "42")))
  }

  test("Oxigraph-parity SPARQL forms survive the window-block split " +
      "(OPTIONAL/BIND/FILTER inside WINDOW bodies)") {
    val parsed = JanusQLParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?sensor ?v ?unit
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 10000]
        |WHERE {
        |    WINDOW ex:hist {
        |      ?sensor ex:value ?v .
        |      OPTIONAL { ?sensor ex:unit ?unit }
        |      FILTER(?v >= 40.0)
        |    }
        |}""".stripMargin)
    val compiled = parsed.compiledHistoricalQueries
    assert(compiled.length === 1)
    val (w, q) = compiled.head
    val spark = graft.TestSpark.spark
    val quads = graft.core.RdfEvent.toDF(spark, Seq(
      graft.core.RdfEvent(5, "http://example.org/s1",
        "http://example.org/value", "42", "http://g.org/any"),
      graft.core.RdfEvent(5, "http://example.org/s1",
        "http://example.org/unit", "celsius", "http://g.org/any"),
      graft.core.RdfEvent(6, "http://example.org/s2",
        "http://example.org/value", "55", "http://g.org/any"),
      graft.core.RdfEvent(7, "http://example.org/s3",
        "http://example.org/value", "12", "http://g.org/any")))
    val out = graft.historical.HistoricalExecutor.executeFixed(
      quads, q, w.start.get, w.end.get)
    assert(graft.TestSpark.rows(out.select("sensor", "v", "unit")) ===
      Set(Seq("http://example.org/s1", "42", "celsius"),
        Seq("http://example.org/s2", "55", "null")))
  }

  test("property-path operators (* ? !) survive the window-block split") {
    // '*' and '?' inside a WINDOW body must reach the SPARQL compiler
    // intact (the splitter is brace-based, not token-based)
    val parsed = JanusQLParser.parse(
      """PREFIX ex: <http://example.org/>
        |SELECT ?a ?b
        |FROM NAMED WINDOW ex:hist ON LOG ex:store [START 0 END 10000]
        |WHERE {
        |    WINDOW ex:hist {
        |      ?a ex:next* ?b .
        |    }
        |}""".stripMargin)
    val (w, q) = parsed.compiledHistoricalQueries.head
    val spark = graft.TestSpark.spark
    val quads = graft.core.RdfEvent.toDF(spark, Seq(
      graft.core.RdfEvent(5, "a", "http://example.org/next", "b", "g"),
      graft.core.RdfEvent(6, "b", "http://example.org/next", "c", "g")))
    val out = graft.historical.HistoricalExecutor.executeFixed(
      quads, q, w.start.get, w.end.get)
    assert(out.count() === 6) // 3 identity + 3 closure
  }
}
