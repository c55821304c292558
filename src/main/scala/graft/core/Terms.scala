package graft.core

/** Lexical conventions for RDF terms.
  *
  * Centralizes the string-format rules scattered across the reference
  * (SURVEY.md §7.3 item 5):
  *   - IRI detection by scheme prefix
  *     (`/root/reference/src/execution/historical_executor.rs:313-322`),
  *   - numeric sniffing: i64 → xsd:integer, f64 → xsd:decimal
  *     (`historical_executor.rs:323-342`),
  *   - serialization to `<iri>` / `"lex"^^<dt>` strings
  *     (`src/querying/oxigraph_adapter.rs:131-143`),
  *   - normalization back to plain lexical values
  *     (`src/api/janus_api.rs:794-841`).
  */
object Terms {

  val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  def isIri(value: String): Boolean = {
    val t = value.trim
    t.startsWith("http://") || t.startsWith("https://")
  }

  def isDefaultGraph(graph: String): Boolean =
    graph.isEmpty || graph == "default"

  private val NumericLexical =
    "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r

  /** Strict numeric-lexical test mirroring Rust's `str::parse::<f64>`
    * acceptance (no '1f'/'1d'/hex/Infinity/NaN forms that Java's
    * `Double.parseDouble` would admit). */
  def isNumeric(s: String): Boolean =
    NumericLexical.matches(s)

  /** Serialize a plain term value into the reference's wire convention:
    * IRIs wrapped in angle brackets; numerics typed; everything else a
    * quoted plain literal (escapes applied).
    *
    * The reference checks the f64 parse FIRST
    * (`/root/reference/src/execution/historical_executor.rs:323-342`), so
    * every numeric literal — including integer lexicals like "15" — is
    * typed `xsd:decimal`; the i64 branch there is unreachable. We match
    * that exactly.
    */
  def format(value: String): String =
    if (isIri(value)) s"<$value>"
    else if (isNumeric(value)) "\"" + value + "\"^^<" + XsdDecimal + ">"
    else "\"" + escape(value) + "\""

  def escape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c    => c.toString
    }

  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case other => sb.append(c); sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `<iri>` → iri; bare http(s) IRI → itself; else None.
    * Mirrors `janus_api.rs` `normalize_iri_term`. */
  def normalizeIri(raw: String): Option[String] = {
    val t = raw.trim
    if (t.startsWith("<") && t.endsWith(">") && t.length > 2)
      Some(t.substring(1, t.length - 1))
    else if (t.startsWith("http://") || t.startsWith("https://")) Some(t)
    else None
  }

  /** `"lex"^^<dt>` / `"lex"@tag` / `"lex"` → lex (unescaped); else None.
    * Mirrors `janus_api.rs` `normalize_literal_term`. */
  def normalizeLiteral(raw: String): Option[String] = {
    val t = raw.trim
    if (!t.startsWith("\"")) return None
    var escaped = false
    var i = 1
    while (i < t.length) {
      val c = t.charAt(i)
      if (escaped) escaped = false
      else if (c == '\\') escaped = true
      else if (c == '"') return Some(unescape(t.substring(1, i)))
      i += 1
    }
    None
  }

  /** Any wire-format term → plain lexical value.
    * Mirrors `janus_api.rs` `normalize_binding_term`. */
  def normalize(raw: String): String =
    normalizeIri(raw).orElse(normalizeLiteral(raw)).getOrElse(raw.trim)

  /** Rust-`f64::Display`-style formatting: integral doubles print without
    * a trailing `.0` (`15.0` → `"15"`) and large/fractional values print
    * full decimal digits, never scientific notation (`1.0E16` would
    * diverge from Rust Display's `10000000000000000`), matching the
    * reference's baseline mean materialization
    * (`src/api/janus_api.rs:760-765`).
    */
  def formatNumeric(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
    else if (v.isNaN || v.isInfinite) v.toString
    else {
      // Java's shortest-roundtrip digits, but with scientific notation
      // (used for |v| >= 1e7 or < 1e-3) expanded to plain decimal form.
      val s = java.lang.Double.toString(v)
      if (s.indexOf('E') < 0) {
        if (s.endsWith(".0")) s.dropRight(2) else s
      } else {
        val bd = new java.math.BigDecimal(s).stripTrailingZeros
        bd.toPlainString
      }
    }
}
