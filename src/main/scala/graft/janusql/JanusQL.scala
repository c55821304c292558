package graft.janusql

/** AST + definitions for the Janus-QL front end (SURVEY.md §2.7) —
  * structural mirror of
  * `/root/reference/src/parsing/janusql_parser.rs:1-150`.
  */
sealed trait SourceKind extends Product with Serializable
object SourceKind {
  case object Stream extends SourceKind
  case object Log extends SourceKind
}

sealed trait WindowType extends Product with Serializable
object WindowType {
  case object Live extends WindowType
  case object HistoricalSliding extends WindowType
  case object HistoricalFixed extends WindowType
}

sealed trait WindowSpec extends Product with Serializable
object WindowSpec {
  final case class LiveSliding(range: Long, step: Long) extends WindowSpec
  final case class HistoricalSliding(offset: Long, range: Long, step: Long)
      extends WindowSpec
  final case class HistoricalFixed(start: Long, end: Long) extends WindowSpec
}

final case class WindowClause(
    windowName: String,
    sourceKind: SourceKind,
    sourceName: String,
    spec: WindowSpec)

/** Lowered window definition used by executors
  * (`janusql_parser.rs:20-41`). */
final case class WindowDefinition(
    windowName: String,
    sourceKind: SourceKind,
    streamName: String,
    width: Long,
    slide: Long,
    offset: Option[Long],
    start: Option[Long],
    end: Option[Long],
    windowType: WindowType)

final case class PrefixDeclaration(prefix: String, namespace: String)
final case class RegisterClause(operator: String, name: String)
final case class R2SOperator(operator: String, name: String)

sealed trait BaselineMode extends Product with Serializable
object BaselineMode {
  case object Last extends BaselineMode
  case object Aggregate extends BaselineMode
}
final case class BaselineClause(windowName: String, mode: BaselineMode)

/** One `WINDOW <id> { body }` block from the WHERE clause. */
final case class WhereWindowClause(identifier: String, body: String)

final case class JanusQueryAst(
    prefixes: Seq[PrefixDeclaration],
    register: Option[RegisterClause],
    baseline: Option[BaselineClause],
    selectClause: String,
    windows: Seq[WindowClause],
    whereClause: String,
    whereWindows: Seq[WhereWindowClause])

/** Fully parsed Janus-QL query: the structured AST plus the two query
  * products — a live RSP-QL query (windows + static joins preserved) and
  * one historical SPARQL query per historical window
  * (`janusql_parser.rs:117-139`). Each historical query string parses
  * with graft's SPARQL-subset parser, so the compiled DataFrame plan is
  * one call away ([[ParsedJanusQuery.compiledHistoricalQueries]]).
  */
final case class ParsedJanusQuery(
    ast: JanusQueryAst,
    baseline: Option[BaselineClause],
    r2s: Option[R2SOperator],
    liveWindows: Seq[WindowDefinition],
    historicalWindows: Seq[WindowDefinition],
    rspqlQuery: String,
    sparqlQueries: Seq[String],
    prefixes: Map[String, String],
    whereClause: String,
    selectClause: String) {

  /** Historical window → compiled SPARQL-subset plan. */
  def compiledHistoricalQueries: Seq[(WindowDefinition, graft.sparql.Query)] =
    historicalWindows.zip(sparqlQueries).map { case (w, q) =>
      (w, graft.sparql.SparqlParser.parse(q))
    }

  /** The live query's window bodies, compiled: window definition →
    * SPARQL-subset plan of `SELECT <select> WHERE { body + static
    * patterns + filters }`. Used by the live executor. */
  def liveWindowBodies: Seq[(WindowDefinition, String)] =
    liveWindows.flatMap { w =>
      JanusQLParser.findWindowBody(ast.whereWindows, w, prefixes)
        .map(b => (w, b))
    }
}
