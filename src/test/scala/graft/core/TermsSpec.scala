package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Lexical-convention tests mirroring the reference's term handling
  * (`/root/reference/src/execution/historical_executor.rs:313-342`,
  * `src/api/janus_api.rs:794-841`). */
class TermsSpec extends AnyFunSuite {

  test("IRI detection by scheme prefix") {
    assert(Terms.isIri("http://example.org/a"))
    assert(Terms.isIri("https://example.org/a"))
    assert(!Terms.isIri("ftp://example.org/a"))
    assert(!Terms.isIri("plain text"))
  }

  test("format wraps IRIs in angle brackets") {
    assert(Terms.format("http://example.org/a") === "<http://example.org/a>")
  }

  test("format types ALL numerics as xsd:decimal (f64 checked first, " +
      "historical_executor.rs:323-342)") {
    assert(Terms.format("15") === "\"15\"^^<" + Terms.XsdDecimal + ">")
    assert(Terms.format("23.5") === "\"23.5\"^^<" + Terms.XsdDecimal + ">")
    assert(Terms.format("-4.2e3") === "\"-4.2e3\"^^<" + Terms.XsdDecimal + ">")
  }

  test("format quotes and escapes plain literals") {
    assert(Terms.format("hello") === "\"hello\"")
    assert(Terms.format("say \"hi\"") === "\"say \\\"hi\\\"\"")
  }

  test("isNumeric rejects Java-permissive forms Rust would reject") {
    assert(!Terms.isNumeric("1f"))
    assert(!Terms.isNumeric("1d"))
    assert(!Terms.isNumeric("0x1.8p1"))
    assert(!Terms.isNumeric("Infinity"))
    assert(!Terms.isNumeric("NaN"))
    assert(!Terms.isNumeric(""))
    assert(Terms.isNumeric("42"))
    assert(Terms.isNumeric("+1.5"))
    assert(Terms.isNumeric("-0.5e-3"))
    assert(Terms.isNumeric(".5"))
  }

  test("normalize strips IRI brackets") {
    assert(Terms.normalize("<http://example.org/a>") === "http://example.org/a")
    assert(Terms.normalize("http://example.org/a") === "http://example.org/a")
  }

  test("normalize strips literal quotes, datatype, lang tag") {
    assert(Terms.normalize("\"23.5\"^^<http://www.w3.org/2001/XMLSchema#decimal>")
      === "23.5")
    assert(Terms.normalize("\"hi\"@en") === "hi")
    assert(Terms.normalize("\"plain\"") === "plain")
  }

  test("normalize unescapes escaped quotes and backslashes") {
    assert(Terms.normalize("\"a\\\"b\"") === "a\"b")
    assert(Terms.normalize("\"a\\\\\"") === "a\\")
  }

  test("formatNumeric matches Rust f64 Display (janus_api.rs:760-765)") {
    assert(Terms.formatNumeric(15.0) === "15")
    assert(Terms.formatNumeric(15.5) === "15.5")
    assert(Terms.formatNumeric(0.1) === "0.1")
    assert(Terms.formatNumeric(-3.0) === "-3")
    // no scientific notation, ever
    assert(Terms.formatNumeric(1.0e16) === "10000000000000000")
    assert(Terms.formatNumeric(0.00015) === "0.00015")
    assert(Terms.formatNumeric(1.5e-7) === "0.00000015")
  }
}
