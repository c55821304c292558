package graft.parsing

import graft.core.RdfEvent

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Line parser for timestamped N-Quads / N-Triples — operator S1.
  *
  * Accepts `[<ts_ms>] <s> <p> (<iri> | "lit"[^^<dt>|@lang]) [<g>] .` and
  * mirrors the reference's semantics
  * (`/root/reference/src/parsing/rdf_parser.rs:6-168`):
  *   - optional leading integer timestamp; missing → `now` (injectable for
  *     deterministic tests),
  *   - datatype annotations stripped (lexical value kept), language tags
  *     dropped,
  *   - escaped quotes inside literals respected, no unescaping applied,
  *   - unparseable trailing graph term → empty (default) graph,
  *   - all trailing dots trimmed.
  */
object NQuadsParser extends Serializable {

  final case class ParseError(message: String) extends RuntimeException(message)

  def parseLine(line: String, now: () => Long = () => System.currentTimeMillis())
      : Either[String, RdfEvent] = {
    var s = line.trim
    if (s.isEmpty) return Left("Empty line")
    s = s.reverse.dropWhile(_ == '.').reverse.trim

    // optional leading timestamp token
    var rest = s
    var timestamp = -1L
    val wsIdx = rest.indexWhere(_.isWhitespace)
    if (wsIdx > 0) {
      val tok = rest.substring(0, wsIdx)
      if (tok.nonEmpty && tok.forall(_.isDigit)) {
        try {
          timestamp = java.lang.Long.parseLong(tok)
          rest = rest.substring(wsIdx).dropWhile(_.isWhitespace)
        } catch { case _: NumberFormatException => () }
      }
    }
    if (timestamp < 0) timestamp = now()

    for {
      su <- parseUri(rest, "subject")
      (subject, r1) = su
      pr <- parseUri(r1, "predicate")
      (predicate, r2) = pr
      ob <- parseObject(r2)
      (obj, r3) = ob
    } yield {
      val graph =
        if (r3.trim.nonEmpty) parseUri(r3, "graph").map(_._1).getOrElse("")
        else ""
      RdfEvent(timestamp, subject, predicate, obj, graph)
    }
  }

  private def parseUri(input: String, field: String)
      : Either[String, (String, String)] = {
    val in = input.dropWhile(_.isWhitespace)
    if (!in.startsWith("<")) Left(s"Expected '<' for $field URI, got: $in")
    else {
      val end = in.indexOf('>')
      if (end < 0) Left(s"Missing closing '>' for $field URI")
      else Right((in.substring(1, end),
        in.substring(end + 1).dropWhile(_.isWhitespace)))
    }
  }

  private def parseObject(input: String): Either[String, (String, String)] = {
    val in = input.dropWhile(_.isWhitespace)
    if (in.startsWith("<")) parseUri(in, "object")
    else if (in.startsWith("\"")) parseLiteral(in)
    else Left(s"Invalid object format: $in")
  }

  private def parseLiteral(input: String): Either[String, (String, String)] = {
    val in = input.dropWhile(_.isWhitespace)
    // closing quote = first unescaped '"', tracked with an escaped-flag
    // state machine (same as Terms.normalizeLiteral) so literals ending in
    // an escaped backslash ("a\\") parse correctly.
    var end = -1
    var i = 1
    var escaped = false
    while (i < in.length && end < 0) {
      val c = in.charAt(i)
      if (escaped) escaped = false
      else if (c == '\\') escaped = true
      else if (c == '"') end = i
      i += 1
    }
    if (end < 0) return Left("Missing closing quote for literal")

    val value = in.substring(1, end)
    val after = in.substring(end + 1)
    val trimmed = after.dropWhile(_.isWhitespace)

    if (trimmed.startsWith("^^")) {
      val afterCaret = trimmed.substring(2).dropWhile(_.isWhitespace)
      if (afterCaret.startsWith("<"))
        // datatype stripped regardless of its IRI; lexical value kept
        parseUri(afterCaret, "datatype").map { case (_, rest) => (value, rest) }
      else
        // malformed (non-bracketed) datatype: the reference keeps the
        // lexical value and leaves the annotation as trailing content
        // the graph fallback ignores (`rdf_parser.rs:148-154`) — the
        // line still ingests
        Right((value, after))
    } else if (trimmed.startsWith("@")) {
      val afterAt = trimmed.substring(1).dropWhile(_.isWhitespace)
      val langEnd = afterAt.indexWhere(c => c.isWhitespace || c == '.') match {
        case -1 => afterAt.length
        case i  => i
      }
      Right((value, afterAt.substring(langEnd).dropWhile(_.isWhitespace)))
    } else Right((value, trimmed))
  }

  /** Distributed parse of a text file / Dataset of lines into the canonical
    * quads DataFrame. Malformed lines are dropped and counted in
    * `errorCounter` when supplied (the reference's stream bus
    * counts-and-skips them, `stream_bus.rs:134-394`). `defaultTs` makes
    * missing timestamps deterministic; when None, ingest time is used
    * (reference behavior).
    */
  def parse(
      lines: Dataset[String],
      defaultTs: Option[Long] = None,
      errorCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val ds = lines.flatMap { line =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) None
      else {
        val parsed = parseLine(t, defaultTs.map(ts => () => ts)
          .getOrElse(() => System.currentTimeMillis()))
        if (parsed.isLeft) errorCounter.foreach(_.add(1L))
        parsed.toOption
      }
    }
    ds.toDF("timestamp", "subject", "predicate", "object", "graph")
  }

  def parseFile(spark: SparkSession, path: String,
      defaultTs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    parse(spark.read.textFile(path).as[String], defaultTs)
  }
}
