package graft.janusql

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Janus-QL parser + query splitter (SURVEY.md §2.7 P1–P6), the Scala
  * rebuild of `/root/reference/src/parsing/janusql_parser.rs:151-910`:
  *
  *   P1 line-oriented clause scan (PREFIX / REGISTER / USING BASELINE /
  *      SELECT / multi-line FROM NAMED WINDOW / WHERE accumulation,
  *      `/* */` comment skipping)
  *   P2 window-clause parse with spec validation (RANGE/STEP stream-only)
  *   P3 `WINDOW <id> { body }` extraction with nested-brace matching
  *   P4 live RSP-QL generation (non-window patterns — baseline joins and
  *      FILTERs — preserved; historical WINDOW blocks dropped)
  *   P5 historical SPARQL generation (one per historical window,
  *      SELECT filtered to the window's bound variables, GRAPH wrapping)
  *   P6 variable extraction / projection-item splitting
  */
object JanusQLParser {

  final case class JanusParseException(msg: String)
      extends RuntimeException(msg)

  private def fail(msg: String): Nothing = throw JanusParseException(msg)

  // ---- P1: AST scan ----------------------------------------------------

  def parseAst(query: String): JanusQueryAst = {
    val prefixes = ArrayBuffer.empty[PrefixDeclaration]
    val prefixMap = LinkedHashMap.empty[String, String]
    var register: Option[RegisterClause] = None
    var baseline: Option[BaselineClause] = None
    var selectClause = ""
    val windows = ArrayBuffer.empty[WindowClause]
    var inWhere = false
    val whereLines = ArrayBuffer.empty[String]

    val lines = query.linesIterator.toVector
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (t.isEmpty || t.startsWith("/*") || t.startsWith("*")) {
        if (inWhere && t.nonEmpty) whereLines += t
      } else if (t.startsWith("REGISTER")) {
        register = Some(parseRegisterClause(t, prefixMap))
      } else if (t.startsWith("USING BASELINE")) {
        baseline = Some(parseBaselineClause(t, prefixMap))
      } else if (t.startsWith("PREFIX")) {
        val p = parsePrefixDeclaration(t)
        prefixMap += (p.prefix -> p.namespace)
        prefixes += p
      } else if (t.startsWith("SELECT")) {
        selectClause = t
      } else if (t.startsWith("FROM NAMED WINDOW")) {
        var clause = t
        while (!clause.contains(']') && i + 1 < lines.length) {
          i += 1
          clause = clause + " " + lines(i).trim
        }
        windows += parseWindowClause(clause, prefixMap)
      } else if (t.startsWith("WHERE")) {
        inWhere = true
        whereLines += line
      } else if (inWhere) {
        whereLines += line
      }
      i += 1
    }

    val whereClause = whereLines.mkString("\n")
    JanusQueryAst(prefixes.toSeq, register, baseline, selectClause,
      windows.toSeq, whereClause, extractWhereWindows(whereClause))
  }

  /** Full parse: AST → lowered window definitions → validation → live
    * RSP-QL + historical SPARQL products. */
  def parse(query: String): ParsedJanusQuery = {
    val ast = parseAst(query)
    val prefixes = ast.prefixes.map(p => p.prefix -> p.namespace).toMap
    val prefixLines =
      ast.prefixes.map(p => s"PREFIX ${p.prefix}: <${p.namespace}>")

    val defs = ast.windows.map(lowerWindowClause)
    val (live, historical) =
      defs.partition(_.windowType == WindowType.Live)

    ast.baseline.foreach { b =>
      if (!historical.exists(_.windowName == b.windowName))
        fail(s"USING BASELINE references unknown historical window " +
          s"'${b.windowName}'")
    }

    val r2s = ast.register.map(r => R2SOperator(r.operator, r.name))
    val base = ParsedJanusQuery(ast, ast.baseline, r2s, live, historical,
      rspqlQuery = "", sparqlQueries = Nil, prefixes = prefixes,
      whereClause = ast.whereClause, selectClause = ast.selectClause)

    val rspql =
      if (live.nonEmpty) generateRspqlQuery(base, prefixLines) else ""
    base.copy(
      rspqlQuery = rspql,
      sparqlQueries = generateSparqlQueries(base, prefixLines))
  }

  // ---- clause parsers (P1/P2) -----------------------------------------

  private def parseBaselineClause(line: String,
      prefixes: collection.Map[String, String]): BaselineClause = {
    val parts = line.split("\\s+")
    if (parts.length != 4 || parts(0) != "USING" || parts(1) != "BASELINE")
      fail(s"Invalid USING BASELINE clause: $line")
    val mode = parts(3) match {
      case "LAST"      => BaselineMode.Last
      case "AGGREGATE" => BaselineMode.Aggregate
      case other =>
        fail(s"Unsupported baseline mode '$other'. Use LAST or AGGREGATE")
    }
    BaselineClause(unwrapIri(parts(2), prefixes), mode)
  }

  private def parseRegisterClause(line: String,
      prefixes: collection.Map[String, String]): RegisterClause = {
    val rest = line.stripPrefix("REGISTER").trim
    val parts = rest.split("\\s+")
    if (parts.length != 3 || parts(2) != "AS")
      fail(s"Invalid REGISTER clause: $line")
    RegisterClause(parts(0), unwrapIri(parts(1), prefixes))
  }

  private def parsePrefixDeclaration(line: String): PrefixDeclaration = {
    val rest = line.stripPrefix("PREFIX").trim
    val colon = rest.indexOf(':')
    if (colon < 0) fail(s"Invalid PREFIX clause: $line")
    val ns = rest.substring(colon + 1).trim
    if (!ns.startsWith("<") || !ns.endsWith(">"))
      fail(s"PREFIX namespace must be enclosed in angle brackets: $line")
    PrefixDeclaration(rest.substring(0, colon).trim,
      ns.substring(1, ns.length - 1))
  }

  private def parseWindowClause(line: String,
      prefixes: collection.Map[String, String]): WindowClause = {
    val bracket = line.indexOf('[')
    if (bracket < 0) fail(s"Missing window spec in clause: $line")
    val header = line.substring(0, bracket)
    val specStr0 = line.substring(bracket + 1).trim
    if (!specStr0.endsWith("]"))
      fail(s"Window spec must end with ']': $line")
    val specStr = specStr0.dropRight(1).trim

    val h = header.split("\\s+").filter(_.nonEmpty)
    if (h.length != 7 || h(0) != "FROM" || h(1) != "NAMED" ||
        h(2) != "WINDOW" || h(4) != "ON")
      fail(s"Invalid window clause header: $line")

    val sourceKind = h(5) match {
      case "STREAM" => SourceKind.Stream
      case "LOG"    => SourceKind.Log
      case other    => fail(s"Unsupported source kind: $other")
    }
    val windowName = unwrapIri(h(3), prefixes)
    val sourceName = unwrapIri(h(6), prefixes)

    // the reference parses u64 (`janusql_parser.rs:382-413`): a negative
    // OFFSET/RANGE/STEP/START/END is a parse ERROR, not a window that
    // silently matches nothing
    def num(s: String, what: String): Long = {
      val v =
        try s.toLong catch {
          case _: NumberFormatException => fail(s"Invalid $what value: $s")
        }
      if (v < 0) fail(s"Invalid $what value: $s")
      v
    }

    val spec = specStr.split("\\s+").toSeq match {
      case Seq("RANGE", r, "STEP", s) =>
        if (sourceKind != SourceKind.Stream)
          fail("Live RANGE/STEP windows are only supported on STREAM sources")
        WindowSpec.LiveSliding(num(r, "RANGE"), num(s, "STEP"))
      case Seq("OFFSET", o, "RANGE", r, "STEP", s) =>
        WindowSpec.HistoricalSliding(
          num(o, "OFFSET"), num(r, "RANGE"), num(s, "STEP"))
      case Seq("START", a, "END", b) =>
        WindowSpec.HistoricalFixed(num(a, "START"), num(b, "END"))
      case _ => fail(s"Unsupported window specification: [$specStr]")
    }
    WindowClause(windowName, sourceKind, sourceName, spec)
  }

  private def lowerWindowClause(w: WindowClause): WindowDefinition =
    w.spec match {
      case WindowSpec.LiveSliding(range, step) =>
        WindowDefinition(w.windowName, w.sourceKind, w.sourceName,
          range, step, None, None, None, WindowType.Live)
      case WindowSpec.HistoricalSliding(offset, range, step) =>
        WindowDefinition(w.windowName, w.sourceKind, w.sourceName,
          range, step, Some(offset), None, None, WindowType.HistoricalSliding)
      case WindowSpec.HistoricalFixed(start, end) =>
        WindowDefinition(w.windowName, w.sourceKind, w.sourceName,
          0, 0, None, Some(start), Some(end), WindowType.HistoricalFixed)
    }

  // ---- P4: live RSP-QL generation -------------------------------------

  private def generateRspqlQuery(parsed: ParsedJanusQuery,
      prefixLines: Seq[String]): String = {
    val lines = ArrayBuffer.empty[String]
    lines ++= prefixLines
    lines += ""
    parsed.r2s.foreach { r =>
      lines += s"REGISTER ${r.operator} ${wrapIri(r.name, parsed.prefixes)} AS"
    }
    if (parsed.selectClause.nonEmpty) lines += parsed.selectClause
    lines += ""
    parsed.liveWindows.foreach { w =>
      lines += s"FROM NAMED WINDOW ${wrapIri(w.windowName, parsed.prefixes)}" +
        s" ON STREAM ${wrapIri(w.streamName, parsed.prefixes)}" +
        s" [RANGE ${w.width} STEP ${w.slide}]"
    }
    if (parsed.whereClause.nonEmpty)
      lines += adaptWhereClauseForLive(parsed.ast.whereWindows,
        parsed.whereClause, parsed.liveWindows, parsed.prefixes)
    lines.mkString("\n")
  }

  // ---- P5: historical SPARQL generation -------------------------------

  private def generateSparqlQueries(parsed: ParsedJanusQuery,
      prefixLines: Seq[String]): Seq[String] =
    parsed.historicalWindows.map { w =>
      val lines = ArrayBuffer.empty[String]
      lines ++= prefixLines
      lines += ""
      val (whereClause, boundVars) = generateWhereAndExtractVars(
        parsed.ast.whereWindows, parsed.whereClause, w, parsed.prefixes)
      if (parsed.selectClause.nonEmpty)
        lines += filterSelectClause(parsed.selectClause, boundVars)
      lines += ""
      lines += whereClause
      lines.mkString("\n")
    }

  private def generateWhereAndExtractVars(
      whereWindows: Seq[WhereWindowClause], whereClause: String,
      window: WindowDefinition, prefixes: Map[String, String])
      : (String, Set[String]) =
    findWindowBody(whereWindows, window, prefixes) match {
      case Some(body) =>
        val vars = extractVariables(body).toSet
        val wrapped = window.sourceKind match {
          case SourceKind.Log =>
            s"WHERE {\n  GRAPH ?__janus_log_graph {\n    $body\n  }\n}"
          case SourceKind.Stream =>
            val streamIri = wrapIri(window.streamName, prefixes)
            s"WHERE {\n  GRAPH $streamIri {\n    $body\n  }\n}"
        }
        (wrapped, vars)
      case None => (whereClause, Set.empty)
    }

  def filterSelectClause(selectClause: String,
      allowedVars: Set[String]): String = {
    if (allowedVars.isEmpty) return selectClause
    val trimmed = selectClause.trim
    if (!trimmed.toUpperCase.startsWith("SELECT")) return selectClause
    val content = trimmed.substring(6).trim
    val kept = extractProjectionItems(content).filter { item =>
      extractVariables(item).exists(allowedVars.contains)
    }
    if (kept.isEmpty) selectClause else s"SELECT ${kept.mkString(" ")}"
  }

  private def adaptWhereClauseForLive(whereWindows: Seq[WhereWindowClause],
      whereClause: String, liveWindows: Seq[WindowDefinition],
      prefixes: Map[String, String]): String = {
    val patterns = ArrayBuffer.empty[String]
    val nonWindow = extractNonWindowWherePatterns(whereClause)
    if (nonWindow.nonEmpty) patterns += nonWindow
    liveWindows.foreach { w =>
      findWindowBody(whereWindows, w, prefixes).foreach { body =>
        patterns +=
          s"WINDOW ${wrapIri(w.windowName, prefixes)} {\n    $body\n  }"
      }
    }
    if (patterns.isEmpty) whereClause
    else s"WHERE {\n  ${patterns.mkString("\n  ")}\n}"
  }

  /** WHERE-clause text minus all `WINDOW x { ... }` blocks — the static
    * (baseline-join) patterns and FILTERs the live query must keep
    * (`janusql_parser.rs:624-688`). */
  def extractNonWindowWherePatterns(whereClause: String): String = {
    val inner = extractWhereInner(whereClause)
    if (inner.isEmpty) return ""
    val preserved = new StringBuilder
    var offset = 0
    var idx = inner.indexOf("WINDOW", offset)
    while (idx >= 0) {
      preserved.append(inner.substring(offset, idx))
      var cursor = idx + "WINDOW".length
      while (cursor < inner.length && inner.charAt(cursor).isWhitespace)
        cursor += 1
      while (cursor < inner.length && !inner.charAt(cursor).isWhitespace &&
          inner.charAt(cursor) != '{') cursor += 1
      while (cursor < inner.length && inner.charAt(cursor).isWhitespace)
        cursor += 1
      if (cursor >= inner.length || inner.charAt(cursor) != '{') {
        preserved.append("WINDOW")
        offset = idx + "WINDOW".length
      } else {
        findMatchingBrace(inner, cursor) match {
          case Some(end) => offset = end + 1
          case None =>
            preserved.append(inner.substring(idx))
            offset = inner.length
        }
      }
      idx = if (offset < inner.length) inner.indexOf("WINDOW", offset) else -1
    }
    if (offset < inner.length) preserved.append(inner.substring(offset))
    preserved.toString.linesIterator.map(_.trim).filter(_.nonEmpty)
      .mkString("\n  ")
  }

  private def extractWhereInner(whereClause: String): String = {
    val trimmed = whereClause.trim
    val withoutWhere =
      if (trimmed.startsWith("WHERE")) trimmed.stripPrefix("WHERE").trim
      else if (trimmed.startsWith("where")) trimmed.stripPrefix("where").trim
      else trimmed
    if (withoutWhere.startsWith("{")) {
      findMatchingBrace(withoutWhere, 0) match {
        case Some(end) if end == withoutWhere.length - 1 =>
          return withoutWhere.substring(1, end).trim
        case _ => ()
      }
    }
    withoutWhere
  }

  /** Resolve a window's `WINDOW <id> {}` body; the identifier may be the
    * prefixed form, the full IRI, or `:<local>`
    * (`janusql_parser.rs:708-727`). */
  def findWindowBody(whereWindows: Seq[WhereWindowClause],
      window: WindowDefinition, prefixes: Map[String, String])
      : Option[String] = {
    val candidates = Seq(wrapIri(window.windowName, prefixes),
      window.windowName) ++
      localName(window.windowName).map(l => s":$l")
    whereWindows.find(c => candidates.contains(c.identifier)).map(_.body)
  }

  // ---- P3: WINDOW-block extraction ------------------------------------

  def extractWhereWindows(whereClause: String): Seq[WhereWindowClause] = {
    val out = ArrayBuffer.empty[WhereWindowClause]
    var offset = 0
    var idx = whereClause.indexOf("WINDOW", offset)
    while (idx >= 0) {
      var cursor = idx + "WINDOW".length
      while (cursor < whereClause.length &&
          whereClause.charAt(cursor).isWhitespace) cursor += 1
      val idStart = cursor
      while (cursor < whereClause.length &&
          !whereClause.charAt(cursor).isWhitespace &&
          whereClause.charAt(cursor) != '{') cursor += 1
      val identifier = whereClause.substring(idStart, cursor).trim
      while (cursor < whereClause.length &&
          whereClause.charAt(cursor).isWhitespace) cursor += 1
      if (cursor >= whereClause.length || whereClause.charAt(cursor) != '{') {
        offset = cursor
      } else {
        findMatchingBrace(whereClause, cursor) match {
          case Some(end) =>
            out += WhereWindowClause(identifier,
              whereClause.substring(cursor + 1, end).trim)
            offset = end + 1
          case None =>
            offset = whereClause.length
        }
      }
      idx = if (offset < whereClause.length)
        whereClause.indexOf("WINDOW", offset) else -1
    }
    out.toSeq
  }

  def findMatchingBrace(input: String, openIndex: Int): Option[Int] = {
    var depth = 0
    var i = openIndex
    while (i < input.length) {
      input.charAt(i) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return Some(i)
        case _ => ()
      }
      i += 1
    }
    None
  }

  // ---- P6: variable / projection extraction ---------------------------

  def extractVariables(input: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < input.length) {
      if (input.charAt(i) == '?') {
        val start = i
        i += 1
        // ASCII alphanumerics + '_' only, mirroring the reference's
        // is_ascii_alphanumeric scan (`janusql_parser.rs:800-823`) —
        // Unicode isLetterOrDigit would extract different names for
        // non-ASCII variables and desync the generated sub-queries
        def ok(c: Char): Boolean =
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '_'
        while (i < input.length && ok(input.charAt(i))) i += 1
        if (i > start + 1) out += input.substring(start, i)
      } else i += 1
    }
    out.toSeq
  }

  def extractProjectionItems(input: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < input.length) {
      while (i < input.length && input.charAt(i).isWhitespace) i += 1
      if (i < input.length) {
        if (input.charAt(i) == '(') {
          val start = i
          var depth = 0
          var break = false
          while (i < input.length && !break) {
            input.charAt(i) match {
              case '(' => depth += 1
              case ')' =>
                depth -= 1
                if (depth == 0) { i += 1; break = true }
              case _ => ()
            }
            if (!break) i += 1
          }
          out += input.substring(start, i)
        } else {
          val start = i
          while (i < input.length && !input.charAt(i).isWhitespace) i += 1
          out += input.substring(start, i)
        }
      }
    }
    out.toSeq
  }

  // ---- IRI helpers -----------------------------------------------------

  def localName(iri: String): Option[String] = {
    val idx = math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/'))
    val local = if (idx >= 0) iri.substring(idx + 1) else iri
    if (local.nonEmpty) Some(local) else None
  }

  def unwrapIri(raw: String,
      prefixes: collection.Map[String, String]): String = {
    val t = raw.trim
    if (t.startsWith("<") && t.endsWith(">"))
      t.substring(1, t.length - 1)
    else {
      val colon = t.indexOf(':')
      if (colon >= 0) {
        prefixes.get(t.substring(0, colon)) match {
          case Some(ns) => ns + t.substring(colon + 1)
          case None     => t
        }
      } else t
    }
  }

  def wrapIri(iri: String, prefixes: Map[String, String]): String =
    prefixes.collectFirst {
      case (p, ns) if iri.startsWith(ns) =>
        s"$p:${iri.substring(ns.length)}"
    }.getOrElse(s"<$iri>")
}
