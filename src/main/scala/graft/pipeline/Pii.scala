package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation.
  *
  * Everything is a pure Column expression over codegen'd regexp
  * primitives — a single map stage, no shuffle, scan-bound at 100 TB
  * (the same execution shape as [[TextAnalysis]]). Patterns are kept in
  * the portable RE2 ⋂ java.util.regex dialect (ASCII classes, `\b`,
  * bounded repetition — no backrefs, no lookaround) so external engines
  * can re-verify detection counts and redacted output byte-for-byte.
  */
object Pii {

  /** RFC-ish email shape: local part, @, dotted domain, alpha TLD. */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; no octet range check — detection
    * favors recall, redaction of a 999.1.1.1 lookalike is harmless). */
  val Ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-prefix phone shape `+CC-NNN-NNNN`. */
  val PhonePattern: String = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  def emailCount(text: Column): Column =
    TextAnalysis.countMatches(text, EmailPattern)
  def ipv4Count(text: Column): Column =
    TextAnalysis.countMatches(text, Ipv4Pattern)
  def phoneCount(text: Column): Column =
    TextAnalysis.countMatches(text, PhonePattern)

  def hasPii(text: Column): Column =
    (emailCount(text) + ipv4Count(text) + phoneCount(text)) > 0

  /** Redacts all three PII shapes with typed placeholders. Order is part
    * of the contract (emails first — their domains contain dots that the
    * IPv4 pattern must never see as digits once the local part is gone). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-document PII profile: detection counts + redacted text. */
  def piiTable(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"),
      emailCount(textCol).cast("long").as("n_emails"),
      ipv4Count(textCol).cast("long").as("n_ips"),
      phoneCount(textCol).cast("long").as("n_phones"),
      redact(textCol).as("redacted"))
}
