package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Janus extension-function registry (SURVEY.md §2.5).
  *
  * All nine functions live under `https://janus.rs/fn#` and take
  * xsd-numeric arguments; non-numeric arguments evaluate to NULL which
  * (like the reference's `term_to_f64` returning `None`,
  * `/root/reference/src/extensions/query_options.rs:46-53`) filters the
  * row when the function is used in a FILTER. Wrong arity is a
  * registration-time `None` (`rules.rs:36-42` WrongArgCount → row
  * filtered).
  *
  * Every function is a plain Catalyst `Column` expression — fully
  * codegen'd, no UDF — per SURVEY.md §2.5's mapping table. Semantics per
  * `/root/reference/src/extensions/math.rs:4-24` and `rules.rs:44-102`.
  */
object Extensions {

  val Namespace = "https://janus.rs/fn#"

  /** `f64::EPSILON` — the reference's zero-sigma guard in `zscore`. */
  private val Eps = 2.220446049250313e-16

  /** `|live - hist|` (math.rs:4-6). */
  def absDiff(live: Column, hist: Column): Column = abs(live - hist)

  /** `(live - hist) / hist`; hist == 0 → NULL (non-finite → None,
    * query_options.rs:64-77). */
  def relativeChange(live: Column, hist: Column): Column =
    when(hist =!= 0.0, (live - hist) / hist)

  /** `(v - mean) / sigma`; |sigma| < eps → 0.0 (math.rs:18-24). */
  def zscore(value: Column, mean: Column, sigma: Column): Column =
    when(value.isNull || mean.isNull || sigma.isNull, lit(null))
      .when(abs(sigma) < Eps, 0.0)
      .otherwise((value - mean) / sigma)

  /** `|live - hist| > t` (rules.rs:44-52). */
  def absoluteThresholdExceeded(l: Column, h: Column, t: Column): Column =
    absDiff(l, h) > t

  /** `(live - hist) / hist > t` (rules.rs:54-62). NaN/NULL compare → NULL
    * → row filtered, matching the reference's NaN comparison = false. */
  def relativeThresholdExceeded(l: Column, h: Column, t: Column): Column =
    relativeChange(l, h) > t

  /** `(hist - live) > t` (rules.rs:64-72). */
  def catchUp(hist: Column, live: Column, t: Column): Column =
    (hist - live) > t

  /** `liveSigma > histSigma + buffer` (rules.rs:74-82). */
  def volatilityIncrease(ls: Column, hs: Column, buf: Column): Column =
    ls > hs + buf

  /** `|zscore(v, mean, sigma)| > zt` (rules.rs:84-92). */
  def isOutlier(v: Column, mean: Column, sigma: Column, zt: Column): Column =
    abs(zscore(v, mean, sigma)) > zt

  /** `|liveSlope - histSlope| > eps` (rules.rs:94-102). */
  def trendDivergent(ls: Column, hs: Column, eps: Column): Column =
    abs(ls - hs) > eps

  /** Registered builder: expected arity + whether the result is boolean
    * (rule) or numeric (math helper). */
  final case class Builder(
      arity: Int,
      isBoolean: Boolean,
      build: Seq[Column] => Column)

  /** name (local part under [[Namespace]]) → builder. */
  val all: Map[String, Builder] = Map(
    "abs_diff" -> Builder(2, isBoolean = false, a => absDiff(a(0), a(1))),
    "relative_change" ->
      Builder(2, isBoolean = false, a => relativeChange(a(0), a(1))),
    "zscore" -> Builder(3, isBoolean = false, a => zscore(a(0), a(1), a(2))),
    "absolute_threshold_exceeded" ->
      Builder(3, isBoolean = true,
        a => absoluteThresholdExceeded(a(0), a(1), a(2))),
    "relative_threshold_exceeded" ->
      Builder(3, isBoolean = true,
        a => relativeThresholdExceeded(a(0), a(1), a(2))),
    "catch_up" -> Builder(3, isBoolean = true, a => catchUp(a(0), a(1), a(2))),
    "volatility_increase" ->
      Builder(3, isBoolean = true, a => volatilityIncrease(a(0), a(1), a(2))),
    "is_outlier" ->
      Builder(4, isBoolean = true, a => isOutlier(a(0), a(1), a(2), a(3))),
    "trend_divergent" ->
      Builder(3, isBoolean = true, a => trendDivergent(a(0), a(1), a(2))))

  /** Resolve a function IRI (full `https://janus.rs/fn#name` or bare local
    * name) and apply it. Unknown name or wrong arity → None — the SPARQL
    * compiler turns that into "row filtered" / NULL, mirroring
    * `query_options.rs:46-53`. Args must already be numeric columns.
    */
  def call(iri: String, args: Seq[Column]): Option[Column] = {
    val local =
      if (iri.startsWith(Namespace)) iri.substring(Namespace.length) else iri
    all.get(local).filter(_.arity == args.length).map(_.build(args))
  }
}
