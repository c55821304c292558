package graft.sparql

import scala.collection.mutable.ArrayBuffer

/** Recursive-descent parser for the SPARQL subset of SURVEY.md §2.3.
  *
  * Grammar (everything the reference's query surface exercises,
  * `/root/reference/tests/oxigraph_adapter_test.rs` +
  * `src/parsing/janusql_parser.rs` generated queries):
  *
  * {{{
  * Query       := Prologue (SelectQuery | AskQuery | ConstructQuery)
  * Prologue    := (PREFIX pname: <iri>)*
  * SelectQuery := SELECT [DISTINCT] ('*' | SelectItem+) [WHERE] Group
  *                [GROUP BY Var+]
  * SelectItem  := Var | '(' Expr AS Var ')'
  * AskQuery    := ASK [WHERE] Group
  * Construct   := CONSTRUCT '{' Triples '}' [WHERE] Group
  * Group       := '{' (Triples | Filter | GRAPH VarOrIri Group)* '}'
  * Filter      := FILTER ( [NOT] EXISTS Group | '(' Expr ')' | Call )
  * Triples     := Subject PropertyList ('.' ...)*   (';' and ',' sugar)
  * }}}
  *
  * Expressions: || && ! comparisons (+ - * /) function calls, vars,
  * literals (quoted, optionally ^^typed / @lang — annotations stripped,
  * matching the engine's plain-lexical term model), numbers, IRIs.
  */
object SparqlParser {

  final case class ParseException(msg: String)
      extends RuntimeException(msg)

  // ---- tokens ----------------------------------------------------------

  sealed trait Tok
  final case class TIri(v: String) extends Tok
  final case class TVar(v: String) extends Tok
  /** Quoted literal; datatype/lang annotations already stripped. */
  final case class TStr(v: String) extends Tok
  final case class TNum(v: Double) extends Tok
  /** Prefixed name, already expanded to a full IRI by the prologue pass. */
  final case class TPName(prefix: String, local: String) extends Tok
  /** Bare word: keyword or `a`. */
  final case class TWord(v: String) extends Tok
  final case class TPunct(v: String) extends Tok

  def tokenize(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    def peek(k: Int): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && input.charAt(i) != '\n') i += 1 }
      else if (c == '/' && peek(1) == '*') {
        i += 2
        while (i + 1 < n && !(input.charAt(i) == '*' && peek(1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '<') {
        // IRIREF if a '>' appears before any character the IRIREF
        // production excludes — `[^<>"{}|^`\] - [#x00-#x20]` (SPARQL 1.1
        // §19.8). Greedy longest-match means `FILTER(?a<?b&&?c>?d)`
        // lexes the IRI `<?b&&?c>` exactly as Jena/Oxigraph do ('?' and
        // '&' are legal IRI characters); writing a comparison there
        // requires whitespace. Otherwise '<' is the comparison operator
        // (possibly '<=').
        var j = i + 1
        var isIri = false
        var break = false
        while (j < n && !break) {
          val d = input.charAt(j)
          if (d == '>') { isIri = true; break = true }
          else if (d <= ' ' || "<\"{}|^`\\".indexOf(d) >= 0) break = true
          else j += 1
        }
        if (isIri) { out += TIri(input.substring(i + 1, j)); i = j + 1 }
        else if (peek(1) == '=') { out += TPunct("<="); i += 2 }
        else { out += TPunct("<"); i += 1 }
      } else if (c == '"') {
        val sb = new StringBuilder
        var j = i + 1
        var escaped = false
        var closed = false
        while (j < n && !closed) {
          val d = input.charAt(j)
          if (escaped) {
            sb.append(d match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
            escaped = false; j += 1
          } else if (d == '\\') { escaped = true; j += 1 }
          else if (d == '"') { closed = true; j += 1 }
          else { sb.append(d); j += 1 }
        }
        if (!closed) throw ParseException(s"Unterminated string literal at $i")
        i = j
        // strip ^^<dt> / ^^pname / @lang annotations
        if (i + 1 < n && input.charAt(i) == '^' && peek(1) == '^') {
          i += 2
          if (i < n && input.charAt(i) == '<') {
            val e = input.indexOf('>', i)
            if (e < 0) throw ParseException("Unterminated datatype IRI")
            i = e + 1
          } else {
            while (i < n && (input.charAt(i).isLetterOrDigit ||
                ":_-".indexOf(input.charAt(i)) >= 0)) i += 1
          }
        } else if (i < n && input.charAt(i) == '@') {
          i += 1
          while (i < n && (input.charAt(i).isLetterOrDigit ||
              input.charAt(i) == '-')) i += 1
        }
        out += TStr(sb.toString)
      } else if (c == '?' || c == '$') {
        var j = i + 1
        while (j < n && (input.charAt(j).isLetterOrDigit ||
            input.charAt(j) == '_')) j += 1
        if (j == i + 1) {
          // a '?' with no name char is the zero-or-one path modifier
          if (c == '?') { out += TPunct("?"); i = j }
          else throw ParseException(s"Bare '$c' at offset $i")
        } else { out += TVar(input.substring(i + 1, j)); i = j }
      } else if (c.isDigit ||
          ((c == '+' || c == '-' || c == '.') && peek(1).isDigit)) {
        var j = i
        if (c == '+' || c == '-') j += 1
        while (j < n && input.charAt(j).isDigit) j += 1
        if (j < n && input.charAt(j) == '.' && j + 1 < n &&
            input.charAt(j + 1).isDigit) {
          j += 1
          while (j < n && input.charAt(j).isDigit) j += 1
        }
        if (j < n && (input.charAt(j) == 'e' || input.charAt(j) == 'E')) {
          var k = j + 1
          if (k < n && (input.charAt(k) == '+' || input.charAt(k) == '-')) k += 1
          if (k < n && input.charAt(k).isDigit) {
            while (k < n && input.charAt(k).isDigit) k += 1
            j = k
          }
        }
        out += TNum(input.substring(i, j).toDouble); i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (input.charAt(j).isLetterOrDigit ||
            input.charAt(j) == '_' || input.charAt(j) == '-')) j += 1
        val word = input.substring(i, j)
        if (j < n && input.charAt(j) == ':') {
          // prefixed name: pfx:local (local may be empty)
          var k = j + 1
          while (k < n && (input.charAt(k).isLetterOrDigit ||
              "_-".indexOf(input.charAt(k)) >= 0)) k += 1
          out += TPName(word, input.substring(j + 1, k)); i = k
        } else { out += TWord(word); i = j }
      } else if (c == ':') {
        // default-prefix pname  :local
        var k = i + 1
        while (k < n && (input.charAt(k).isLetterOrDigit ||
            "_-".indexOf(input.charAt(k)) >= 0)) k += 1
        out += TPName("", input.substring(i + 1, k)); i = k
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        two match {
          case "!=" | ">=" | "&&" | "||" | "^^" =>
            out += TPunct(two); i += 2
          case _ =>
            "{}().,;*=><!+-/^|".indexOf(c) match {
              case -1 => throw ParseException(s"Unexpected character '$c' at $i")
              case _  => out += TPunct(c.toString); i += 1
            }
        }
      }
    }
    out.toVector
  }

  // ---- parser ----------------------------------------------------------

  def parse(query: String): Query = new P(tokenize(query)).parseQuery()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private var prefixes = Map.empty[String, String]

    private def peek: Option[Tok] =
      if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) throw ParseException("Unexpected end of query")
      val t = toks(pos); pos += 1; t
    }
    private def isWord(t: Tok, w: String): Boolean = t match {
      case TWord(v) => v.equalsIgnoreCase(w)
      case _        => false
    }
    private def atWord(w: String): Boolean = peek.exists(isWord(_, w))
    private def eatWord(w: String): Unit = {
      if (!atWord(w)) throw ParseException(s"Expected '$w' at token $pos: $peek")
      pos += 1
    }
    private def atPunct(p: String): Boolean =
      peek.contains(TPunct(p))
    private def eatPunct(p: String): Unit = {
      if (!atPunct(p)) throw ParseException(s"Expected '$p' at token $pos: $peek")
      pos += 1
    }
    private def expand(t: TPName): String =
      prefixes.get(t.prefix) match {
        case Some(base) => base + t.local
        case None => throw ParseException(s"Unknown prefix '${t.prefix}:'")
      }

    def parseQuery(): Query = {
      while (atWord("prefix")) {
        pos += 1
        val (pfx, iri) = (next(), next()) match {
          case (TPName(p, ""), TIri(v)) => (p, v)
          case (TPName(p, l), TIri(v))  => (p + l, v) // e.g. 'ex' tokenizes pfx-only
          case (a, b) =>
            throw ParseException(s"Malformed PREFIX declaration: $a $b")
        }
        prefixes += (pfx -> iri)
      }
      next() match {
        case w: TWord if w.v.equalsIgnoreCase("select")    => parseSelect()
        case w: TWord if w.v.equalsIgnoreCase("ask")       => parseAsk()
        case w: TWord if w.v.equalsIgnoreCase("construct") => parseConstruct()
        case w: TWord if w.v.equalsIgnoreCase("describe")  => parseDescribe()
        case t => throw ParseException(
          s"Expected SELECT/ASK/CONSTRUCT/DESCRIBE, got $t")
      }
    }

    private def parseDescribe(): DescribeQuery = {
      val targets = ArrayBuffer.empty[Term]
      var more = true
      while (more) peek match {
        case Some(TVar(v))   => targets += Var(v); pos += 1
        case Some(TIri(v))   => targets += Iri(v); pos += 1
        case Some(p: TPName) => targets += Iri(expand(p)); pos += 1
        case _               => more = false
      }
      if (targets.isEmpty)
        throw ParseException("DESCRIBE requires at least one target")
      val where =
        if (atWord("where") || atPunct("{")) {
          if (atWord("where")) pos += 1
          parseGroup(None)
        } else GroupPattern(Nil, Nil)
      DescribeQuery(targets.toSeq, where)
    }

    private def parseSelect(): SelectQuery = {
      val distinct = atWord("distinct") && { pos += 1; true }
      val projection: Projection =
        if (atPunct("*")) { pos += 1; Star }
        else {
          val items = ArrayBuffer.empty[SelectItem]
          var more = true
          while (more) {
            peek match {
              case Some(TVar(v)) => items += VarItem(v); pos += 1
              case Some(TPunct("(")) =>
                pos += 1
                items += parseProjectionExpr()
              case _ => more = false
            }
          }
          if (items.isEmpty)
            throw ParseException("SELECT requires '*' or projection items")
          Items(items.toSeq)
        }
      if (atWord("where")) pos += 1
      val where = parseGroup(None)
      val groupBy = ArrayBuffer.empty[String]
      // GROUP BY keys: bare variables, or `(expr)` / `(expr AS ?v)` —
      // expression keys desugar to a BIND in the WHERE group (that IS
      // the SPARQL semantics: the key is computed per solution, then
      // grouped on), unaliased ones under a synthetic name
      val groupKeyBinds = ArrayBuffer.empty[(Expr, String)]
      if (atWord("group")) {
        pos += 1; eatWord("by")
        var more = true
        while (more) peek match {
          case Some(TVar(v)) => groupBy += v; pos += 1
          case Some(TPunct("(")) =>
            pos += 1
            val e = parseExpr()
            val alias =
              if (atWord("as")) {
                pos += 1
                next() match {
                  case TVar(v) => v
                  case t => throw ParseException(
                    s"Expected variable after AS in GROUP BY, got $t")
                }
              } else s"__gk${groupKeyBinds.length}"
            eatPunct(")")
            groupKeyBinds += ((e, alias))
            groupBy += alias
          case _ => more = false
        }
        if (groupBy.isEmpty) throw ParseException("GROUP BY requires variables")
      }
      // HAVING Constraint+ — each a bracketted expression or bare call;
      // aggregates inside (COUNT(?x) > 5) parse to EAggRef nodes
      val having = ArrayBuffer.empty[Expr]
      while (atWord("having")) {
        pos += 1
        var more = true
        while (more) {
          if (atPunct("(")) {
            pos += 1
            having += parseExpr()
            eatPunct(")")
          } else more = false
          if (atWord("having")) more = false
        }
        if (having.isEmpty)
          throw ParseException("HAVING requires a condition")
      }
      // solution modifiers: ORDER BY ... LIMIT n OFFSET n (any of them
      // optional; LIMIT/OFFSET accepted in either order, as in SPARQL)
      val orderBy = ArrayBuffer.empty[OrderKey]
      if (atWord("order")) {
        pos += 1; eatWord("by")
        var more = true
        while (more) peek match {
          case Some(TVar(v)) => orderBy += OrderKey(EVar(v), desc = false); pos += 1
          case Some(t) if isWord(t, "asc") || isWord(t, "desc") =>
            val d = isWord(t, "desc"); pos += 1
            eatPunct("(")
            val e = parseExpr()
            eatPunct(")")
            orderBy += OrderKey(e, d)
          case Some(TPunct("(")) =>
            pos += 1
            val e = parseExpr()
            eatPunct(")")
            orderBy += OrderKey(e, desc = false)
          case _ => more = false
        }
        if (orderBy.isEmpty) throw ParseException("ORDER BY requires keys")
      }
      var limit: Option[Long] = None
      var offset: Option[Long] = None
      var modLoop = true
      while (modLoop) {
        if (atWord("limit")) {
          pos += 1
          limit = Some(next() match {
            case TNum(v) => v.toLong
            case t => throw ParseException(s"Expected number after LIMIT, got $t")
          })
        } else if (atWord("offset")) {
          pos += 1
          offset = Some(next() match {
            case TNum(v) => v.toLong
            case t => throw ParseException(s"Expected number after OFFSET, got $t")
          })
        } else modLoop = false
      }
      val whereWithKeys =
        if (groupKeyBinds.isEmpty) where
        else where.copy(elems = where.elems ++
          groupKeyBinds.map { case (e, a) => GBind(e, a) })
      SelectQuery(projection, whereWithKeys, groupBy.toSeq, distinct,
        orderBy.toSeq, limit, offset, having.toSeq)
    }

    /** After the opening '(' of a projection item: aggregate or expression,
      * then AS ?var ')'. */
    private def parseProjectionExpr(): SelectItem = {
      val aggWord = peek match {
        case Some(TWord(w))
            if Set("count", "sum", "avg", "min", "max", "group_concat",
              "sample").contains(w.toLowerCase) =>
          Some(w.toUpperCase)
        case _ => None
      }
      aggWord match {
        case Some(func) =>
          pos += 1
          eatPunct("(")
          val distinct = atWord("distinct") && { pos += 1; true }
          val arg: Option[Expr] =
            if (atPunct("*")) { pos += 1; None } else Some(parseExpr())
          // GROUP_CONCAT(?x; SEPARATOR="…")
          var sep: Option[String] = None
          if (atPunct(";")) {
            pos += 1
            if (!peek.exists(isWord(_, "separator")))
              throw ParseException("Expected SEPARATOR after ';'")
            pos += 1
            eatPunct("=")
            sep = Some(next() match {
              case TStr(v) => v
              case t => throw ParseException(s"Expected separator string, got $t")
            })
          }
          eatPunct(")")
          eatWord("as")
          val alias = next() match {
            case TVar(v) => v
            case t => throw ParseException(s"Expected variable after AS, got $t")
          }
          eatPunct(")")
          AggItem(Aggregate(func, arg, distinct, sep), alias)
        case None =>
          val e = parseExpr()
          eatWord("as")
          val alias = next() match {
            case TVar(v) => v
            case t => throw ParseException(s"Expected variable after AS, got $t")
          }
          eatPunct(")")
          ExprItem(e, alias)
      }
    }

    private def parseAsk(): AskQuery = {
      if (atWord("where")) pos += 1
      AskQuery(parseGroup(None))
    }

    private def parseConstruct(): ConstructQuery = {
      eatPunct("{")
      val (template, templatePaths) =
        parseTriples(None, stopAtFilterOrGraph = false)
      if (templatePaths.nonEmpty)
        throw ParseException("Property paths are not allowed in CONSTRUCT templates")
      eatPunct("}")
      if (atWord("where")) pos += 1
      ConstructQuery(template, parseGroup(None))
    }

    /** Parse `{ ... }` with the given active GRAPH scope. Per the SPARQL
      * grammar, a group whose first token is SELECT is a SubSelect —
      * that lets `{ SELECT … }` appear anywhere a group can, including
      * as a UNION branch. */
    private def parseGroup(graph: Option[Term]): GroupPattern = {
      eatPunct("{")
      if (peek.exists(isWord(_, "select"))) {
        pos += 1
        val sq = parseSelect()
        eatPunct("}")
        return GroupPattern(Seq(GSubquery(sq)), Nil)
      }
      // elements in SOURCE ORDER (SPARQL §18.2.2.6 compiles a group
      // left-to-right); filters collected separately — they scope over
      // the whole group regardless of position
      val elems = ArrayBuffer.empty[GroupElem]
      val filters = ArrayBuffer.empty[Expr]
      def absorb(inner: GroupPattern): Unit = {
        // a nested group / GRAPH block flattens in place only when every
        // element is join-equivalent (Join is associative/commutative, so
        // inlining BGPs/paths/unions/VALUES/subqueries/groups is exact and
        // keeps the flat pattern views). Two things force the group to
        // stay an independent element instead: its own FILTERs — they
        // scope to ITS group (§18.2.2.2), and hoisting them would let
        // them see enclosing bindings they must not — and any
        // order-sensitive element (OPTIONAL / MINUS / BIND), whose
        // LeftJoin / Minus / Extend must apply to exactly the sibling
        // accumulator inside the group, not to everything the enclosing
        // group has joined so far (§18.2.2.6)
        val orderSensitive = inner.elems.exists {
          case _: GOptional | _: GMinus | _: GBind => true
          case _                                   => false
        }
        // an element-free group's FILTERs must NOT hoist: they scope
        // to their own group (§18.2.2.2), whose only solution is the
        // unit — their variables are all unbound there
        if (inner.filters.isEmpty && !orderSensitive) elems ++= inner.elems
        else elems += GGroup(inner)
      }
      var done = false
      while (!done) {
        if (atPunct("}")) { pos += 1; done = true }
        else if (atWord("filter")) {
          pos += 1
          filters += parseFilterBody(graph)
        } else if (atWord("optional")) {
          pos += 1
          elems += GOptional(parseGroup(graph))
        } else if (atWord("minus")) {
          pos += 1
          elems += GMinus(parseGroup(graph))
        } else if (atWord("values")) {
          pos += 1
          elems += GValues(parseValues())
        } else if (atWord("bind")) {
          pos += 1
          eatPunct("(")
          val e = parseExpr()
          eatWord("as")
          val alias = next() match {
            case TVar(v) => v
            case t => throw ParseException(s"Expected variable after AS, got $t")
          }
          eatPunct(")")
          elems += GBind(e, alias)
        } else if (atWord("graph")) {
          pos += 1
          val g: Term = next() match {
            case TVar(v)        => Var(v)
            case TIri(v)        => Iri(v)
            case p: TPName      => Iri(expand(p))
            case t => throw ParseException(s"Expected graph name, got $t")
          }
          absorb(parseGroup(Some(g)))
        } else if (atPunct("{")) {
          // nested group: `{A} UNION {B} [UNION {C}…]` becomes a union
          // element; a bare group is flattened into this one
          val first = parseGroup(graph)
          if (atWord("union")) {
            val alts = ArrayBuffer(first)
            while (atWord("union")) {
              pos += 1
              alts += parseGroup(graph)
            }
            elems += GUnion(alts.toSeq)
          } else absorb(first)
        } else {
          val (qps, pps) = parseTriples(graph, stopAtFilterOrGraph = true)
          if (qps.nonEmpty) elems += GBgp(qps)
          elems ++= pps.map(GPath)
        }
      }
      GroupPattern(elems.toSeq, filters.toSeq)
    }

    /** After the VALUES keyword: `?x { t* }` (single var) or
      * `(?x ?y) { (t t)* }`. UNDEF cells parse to `None` — the variable
      * is unbound in that row (compatible with anything, §10.2). */
    private def parseValues(): ValuesBlock = {
      def valueTerm(): Option[Term] = next() match {
        case TIri(v)   => Some(Iri(v))
        case p: TPName => Some(Iri(expand(p)))
        case TStr(v)   => Some(Lit(v))
        case TNum(v)   => Some(Lit(graft.core.Terms.formatNumeric(v)))
        case TWord(w) if w.equalsIgnoreCase("undef") => None
        case t => throw ParseException(s"Expected VALUES term, got $t")
      }
      peek match {
        case Some(TVar(v)) =>
          pos += 1
          eatPunct("{")
          val rows = ArrayBuffer.empty[Seq[Option[Term]]]
          while (!atPunct("}")) rows += Seq(valueTerm())
          pos += 1
          ValuesBlock(Seq(v), rows.toSeq)
        case Some(TPunct("(")) =>
          pos += 1
          val vars = ArrayBuffer.empty[String]
          while (!atPunct(")")) next() match {
            case TVar(v) => vars += v
            case t => throw ParseException(s"Expected variable in VALUES, got $t")
          }
          pos += 1
          if (vars.isEmpty)
            throw ParseException("VALUES requires at least one variable")
          eatPunct("{")
          val rows = ArrayBuffer.empty[Seq[Option[Term]]]
          while (!atPunct("}")) {
            eatPunct("(")
            val row = ArrayBuffer.empty[Option[Term]]
            while (!atPunct(")")) row += valueTerm()
            pos += 1
            if (row.length != vars.length)
              throw ParseException(
                s"VALUES row arity ${row.length} != ${vars.length}")
            rows += row.toSeq
          }
          pos += 1
          ValuesBlock(vars.toSeq, rows.toSeq)
        case t => throw ParseException(s"Malformed VALUES clause at $t")
      }
    }

    private def parseFilterBody(graph: Option[Term]): Expr = {
      if (atWord("exists")) { pos += 1; EExists(parseGroup(graph), negated = false) }
      else if (atWord("not")) {
        pos += 1; eatWord("exists")
        EExists(parseGroup(graph), negated = true)
      } else if (atPunct("(")) {
        pos += 1
        val e = parseExpr()
        eatPunct(")")
        e
      } else parseUnaryExpr() // e.g. FILTER janus:rule(?x, 1)
    }

    /** One or more triple statements under the current graph scope, with
      * ';' (same subject) and ',' (same subject+predicate) sugar.
      * Predicates may be property paths; those land in the second
      * element of the result. */
    private def parseTriples(graph: Option[Term], stopAtFilterOrGraph: Boolean)
        : (Seq[QuadPattern], Seq[PathPattern]) = {
      val out = ArrayBuffer.empty[QuadPattern]
      val pathsOut = ArrayBuffer.empty[PathPattern]
      var more = true
      while (more) {
        val s = parseTerm("subject")
        var pLoop = true
        while (pLoop) {
          val p: Either[Term, Path] = parsePredicate()
          var oLoop = true
          while (oLoop) {
            val o = parseTerm("object")
            p match {
              case Left(term)  => out += QuadPattern(s, term, o, graph)
              case Right(path) => pathsOut += PathPattern(s, path, o, graph)
            }
            if (atPunct(",")) pos += 1 else oLoop = false
          }
          if (atPunct(";")) {
            pos += 1
            // dangling ';' before '.' or '}' is legal SPARQL
            if (atPunct(".") || atPunct("}")) pLoop = false
          } else pLoop = false
        }
        if (atPunct(".")) pos += 1
        val stop = peek match {
          case None | Some(TPunct("}")) => true
          case Some(t) if stopAtFilterOrGraph &&
              (isWord(t, "filter") || isWord(t, "graph") ||
                isWord(t, "optional") || isWord(t, "bind") ||
                isWord(t, "minus") || isWord(t, "values")) => true
          case Some(TPunct("{")) => true
          case _ => false
        }
        if (stop) more = false
      }
      (out.toSeq, pathsOut.toSeq)
    }

    /** Predicate position: a variable/term, or a property path.
      * Grammar (SPARQL 1.1 path subset):
      * {{{
      * Path     := PathSeq ('|' PathSeq)*
      * PathSeq  := PathElt ('/' PathElt)*
      * PathElt  := '^'? PathPrimary ('+' | '*' | '?')?
      * Primary  := iri | pname | 'a' | '(' Path ')'
      * }}}
      */
    private def parsePredicate(): Either[Term, Path] = peek match {
      case Some(TVar(_)) | Some(TStr(_)) | Some(TNum(_)) =>
        Left(parseTerm("predicate"))
      case _ =>
        parsePath() match {
          case PLink(v) => Left(Iri(v)) // plain IRI — ordinary pattern
          case path     => Right(path)
        }
    }

    private def parsePath(): Path = {
      var p = parsePathSeq()
      while (atPunct("|")) { pos += 1; p = PAlt(p, parsePathSeq()) }
      p
    }

    private def parsePathSeq(): Path = {
      var p = parsePathElt()
      while (atPunct("/")) { pos += 1; p = PSeq(p, parsePathElt()) }
      p
    }

    private def parsePathElt(): Path = {
      val inverse = atPunct("^") && { pos += 1; true }
      var prim: Path = peek match {
        case Some(TPunct("(")) =>
          pos += 1
          val p = parsePath()
          eatPunct(")")
          p
        case Some(TPunct("!")) =>
          pos += 1
          parseNegatedSet()
        case Some(TIri(v))   => pos += 1; PLink(v)
        case Some(p: TPName) => pos += 1; PLink(expand(p))
        case Some(t) if isWord(t, "a") =>
          pos += 1
          PLink("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        case t => throw ParseException(s"Expected path primary, got $t")
      }
      if (atPunct("+")) { pos += 1; prim = PPlus(prim) }
      else if (atPunct("*")) { pos += 1; prim = PStar(prim) }
      else if (atPunct("?")) { pos += 1; prim = PZeroOrOne(prim) }
      if (inverse) PInverse(prim) else prim
    }

    /** Negated property set after `!`: a single (possibly `^`-inverted)
      * IRI, or a `(p1|^p2|…)` list. Members split into forward-excluded
      * and inverse-excluded IRIs (SPARQL 1.1 §9.1). */
    private def parseNegatedSet(): Path = {
      val fwd = ArrayBuffer.empty[String]
      val inv = ArrayBuffer.empty[String]
      def member(): Unit = {
        val isInv = atPunct("^") && { pos += 1; true }
        val iri = peek match {
          case Some(TIri(v))   => pos += 1; v
          case Some(p: TPName) => pos += 1; expand(p)
          case Some(t) if isWord(t, "a") =>
            pos += 1
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
          case t => throw ParseException(
            s"Expected IRI in negated property set, got $t")
        }
        if (isInv) inv += iri else fwd += iri
      }
      if (atPunct("(")) {
        pos += 1
        member()
        while (atPunct("|")) { pos += 1; member() }
        eatPunct(")")
      } else member()
      PNeg(fwd.toSeq, inv.toSeq)
    }

    private def parseTerm(what: String): Term = next() match {
      case TVar(v)   => Var(v)
      case TIri(v)   => Iri(v)
      case p: TPName => Iri(expand(p))
      case TStr(v)   => Lit(v)
      case TNum(v)   => Lit(graft.core.Terms.formatNumeric(v))
      case TWord(w) if w == "a" =>
        Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
      case t => throw ParseException(s"Expected $what term, got $t")
    }

    // ---- expressions ---------------------------------------------------

    private def parseExpr(): Expr = parseOr()

    private def parseOr(): Expr = {
      var e = parseAnd()
      while (atPunct("||")) { pos += 1; e = EOr(e, parseAnd()) }
      e
    }

    private def parseAnd(): Expr = {
      var e = parseRelational()
      while (atPunct("&&")) { pos += 1; e = EAnd(e, parseRelational()) }
      e
    }

    private def parseRelational(): Expr = {
      val l = parseAdditive()
      def inList(negated: Boolean): Expr = {
        eatPunct("(")
        val items = ArrayBuffer.empty[Expr]
        if (!atPunct(")")) {
          items += parseExpr()
          while (atPunct(",")) { pos += 1; items += parseExpr() }
        }
        eatPunct(")")
        EIn(l, items.toSeq, negated)
      }
      peek match {
        case Some(TPunct(op))
            if Set("=", "!=", "<", "<=", ">", ">=").contains(op) =>
          pos += 1
          ECmp(op, l, parseAdditive())
        case Some(t) if isWord(t, "in") =>
          pos += 1
          inList(negated = false)
        case Some(t) if isWord(t, "not") &&
            pos + 1 < toks.length && isWord(toks(pos + 1), "in") =>
          pos += 2
          inList(negated = true)
        case _ => l
      }
    }

    private def parseAdditive(): Expr = {
      var e = parseMultiplicative()
      var more = true
      while (more) peek match {
        case Some(TPunct("+")) => pos += 1; e = EArith("+", e, parseMultiplicative())
        case Some(TPunct("-")) => pos += 1; e = EArith("-", e, parseMultiplicative())
        case Some(TNum(v)) if v < 0 =>
          // `10-1` / `?x-1` lex the signed literal -1; the SPARQL
          // grammar's AdditiveExpression accepts NumericLiteralNegative
          // as a subtraction continuation (§19.8)
          pos += 1
          e = EArith("+", e, ENum(v))
        case _ => more = false
      }
      e
    }

    private def parseMultiplicative(): Expr = {
      var e = parseUnaryExpr()
      var more = true
      while (more) peek match {
        case Some(TPunct("*")) => pos += 1; e = EArith("*", e, parseUnaryExpr())
        case Some(TPunct("/")) => pos += 1; e = EArith("/", e, parseUnaryExpr())
        case _ => more = false
      }
      e
    }

    private def parseUnaryExpr(): Expr = peek match {
      case Some(TPunct("!")) => pos += 1; ENot(parseUnaryExpr())
      case Some(TPunct("-")) => pos += 1; EArith("-", ENum(0), parseUnaryExpr())
      case _                 => parsePrimary()
    }

    private def parsePrimary(): Expr = next() match {
      case TPunct("(") =>
        val e = parseExpr(); eatPunct(")"); e
      case TVar(v) => EVar(v)
      case TNum(v) => ENum(v)
      case TStr(v) => EStr(v)
      case TIri(v) =>
        if (atPunct("(")) parseCallArgs(v) else EIriRef(v)
      case p: TPName =>
        val iri = expand(p)
        if (atPunct("(")) parseCallArgs(iri) else EIriRef(iri)
      case w: TWord if w.v.equalsIgnoreCase("exists") =>
        EExists(parseGroup(None), negated = false)
      case w: TWord if w.v.equalsIgnoreCase("not") =>
        eatWord("exists"); EExists(parseGroup(None), negated = true)
      case w: TWord if w.v.equalsIgnoreCase("bound") =>
        eatPunct("(")
        val v = next() match {
          case TVar(name) => name
          case t => throw ParseException(s"BOUND expects a variable, got $t")
        }
        eatPunct(")")
        EBound(v)
      case w: TWord
          if Set("if", "coalesce", "str", "abs", "concat", "strlen",
            "ucase", "lcase", "contains", "strstarts", "strends", "regex",
            "round", "ceil", "floor", "substr", "isiri", "isuri",
            "isliteral", "isnumeric", "isblank", "strbefore", "strafter",
            "replace", "md5", "sha1", "sha256", "datatype", "lang",
            "langmatches", "iri", "uri", "strdt", "strlang",
            "encode_for_uri", "now", "year", "month", "day", "hours",
            "minutes", "seconds", "tz", "timezone", "sameterm", "bnode",
            "rand", "uuid", "struuid")
            .contains(w.v.toLowerCase) && atPunct("(") =>
        // SPARQL builtin functions, carried as upper-case ECall names
        // (extension functions are full IRIs — no collision)
        parseCallArgs(w.v.toUpperCase) match {
          case ECall("IF", args) if args.length != 3 =>
            throw ParseException("IF expects 3 arguments")
          case ECall("STR" | "ABS" | "STRLEN" | "UCASE" | "LCASE" |
              "ROUND" | "CEIL" | "FLOOR" | "ISIRI" | "ISURI" |
              "ISLITERAL" | "ISNUMERIC" | "ISBLANK" | "MD5" | "SHA1" |
              "SHA256" | "DATATYPE" | "LANG" | "IRI" | "URI" |
              "ENCODE_FOR_URI", args)
              if args.length != 1 =>
            throw ParseException(s"${w.v.toUpperCase} expects 1 argument")
          case ECall("CONTAINS" | "STRSTARTS" | "STRENDS" | "STRBEFORE" |
              "STRAFTER" | "LANGMATCHES" | "STRDT" | "STRLANG", args)
              if args.length != 2 =>
            throw ParseException(s"${w.v.toUpperCase} expects 2 arguments")
          case ECall("REGEX" | "SUBSTR", args)
              if args.length < 2 || args.length > 3 =>
            throw ParseException(
              s"${w.v.toUpperCase} expects 2 or 3 arguments")
          case ECall("REPLACE", args)
              if args.length < 3 || args.length > 4 =>
            throw ParseException("REPLACE expects 3 or 4 arguments")
          case ECall("CONCAT", args) if args.isEmpty =>
            throw ParseException("CONCAT expects at least 1 argument")
          case ECall("NOW" | "RAND" | "UUID" | "STRUUID", args)
              if args.nonEmpty =>
            throw ParseException(s"${w.v.toUpperCase} expects 0 arguments")
          case ECall("YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" |
              "SECONDS" | "TZ" | "TIMEZONE", args) if args.length != 1 =>
            throw ParseException(s"${w.v.toUpperCase} expects 1 argument")
          case ECall("SAMETERM", args) if args.length != 2 =>
            throw ParseException("SAMETERM expects 2 arguments")
          case ECall("BNODE", args) if args.length > 1 =>
            throw ParseException("BNODE expects 0 or 1 arguments")
          case e => e
        }
      case w: TWord
          if Set("count", "sum", "avg", "min", "max", "sample")
            .contains(w.v.toLowerCase) && atPunct("(") =>
        // aggregate reference (valid in HAVING conditions)
        val func = w.v.toUpperCase
        eatPunct("(")
        val distinct = atWord("distinct") && { pos += 1; true }
        val arg: Option[Expr] =
          if (atPunct("*")) { pos += 1; None } else Some(parseExpr())
        eatPunct(")")
        EAggRef(Aggregate(func, arg, distinct))
      case w: TWord if w.v.equalsIgnoreCase("true")  => EStr("true")
      case w: TWord if w.v.equalsIgnoreCase("false") => EStr("false")
      case t => throw ParseException(s"Unexpected token in expression: $t")
    }

    private def parseCallArgs(iri: String): Expr = {
      eatPunct("(")
      val args = ArrayBuffer.empty[Expr]
      if (!atPunct(")")) {
        args += parseExpr()
        while (atPunct(",")) { pos += 1; args += parseExpr() }
      }
      eatPunct(")")
      ECall(iri, args.toSeq)
    }
  }
}
