package graft.extensions

import graft.core.Terms


import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration of the graft function library
  * (SURVEY.md §4.2 "custom code lives above Catalyst" — except here,
  * where a native expression genuinely beats the alternatives).
  *
  * Two entry points with identical effect:
  *   - `spark.sql.extensions=graft.extensions.GraftExtensions` at
  *     session build (the SparkSessionExtensions route);
  *   - `GraftFunctions.register(spark)` on any existing session.
  *
  * Registered functions: the nine `https://janus.rs/fn#` functions as
  * `graft_<name>` (pure Column expressions → full codegen) plus
  * `graft_term_format` — a native `UnaryExpression` with `doGenCode`
  * implementing the R11 wire convention (IRI wrapping + numeric
  * sniffing), so serializing a billion bindings to wire format stays
  * inside whole-stage codegen instead of a Scala UDF boundary.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (children: Seq[Expression]) => {
          require(children.length == arity,
            s"$name expects $arity arguments, got ${children.length}")
          builder(children)
        }))
    }
}

/** Native wire-format serializer: plain lexical term → `<iri>` /
  * `"lex"^^<xsd:decimal>` / `"lex"` (graft.core.Terms.format). Codegen
  * emits a direct static call — no UDF serialization, inline null
  * handling. */
final case class TermFormatExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_term_format"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Terms.format(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.Terms.format($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression)
      : TermFormatExpression = copy(child = newChild)
}

object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.{Abs, And, CaseWhen,
    Cast, Divide, EqualTo, EvalMode, GreaterThan, IsNull, LessThan,
    Literal, Not, Or, Subtract}
  import org.apache.spark.sql.types.DoubleType

  // expression-level twins of graft.functions.Extensions (the Column
  // DSL cannot round-trip through FunctionRegistry builders — its
  // ColumnNode wrappers stay unresolved), semantics cross-checked by
  // GraftExtensionsSpec
  private val Eps = 2.220446049250313e-16
  private def num(e: Expression): Expression =
    Cast(e, DoubleType, None, EvalMode.TRY)
  private def nullD: Expression = Literal(null, DoubleType)
  private def absDiffE(l: Expression, r: Expression): Expression =
    Abs(Subtract(l, r))
  private def relChangeE(l: Expression, h: Expression): Expression =
    CaseWhen(Seq((Not(EqualTo(h, Literal(0.0))),
      Divide(Subtract(l, h), h))), nullD)
  private def zscoreE(v: Expression, m: Expression, s: Expression)
      : Expression =
    CaseWhen(Seq(
      (Or(IsNull(v), Or(IsNull(m), IsNull(s))), nullD),
      (LessThan(Abs(s), Literal(Eps)), Literal(0.0))),
      Divide(Subtract(v, m), s))

  private val janusBuilders: Seq[(String, Int, Seq[Expression] => Expression)] =
    Seq(
      ("graft_abs_diff", 2,
        (a: Seq[Expression]) => absDiffE(num(a(0)), num(a(1)))),
      ("graft_relative_change", 2,
        (a: Seq[Expression]) => relChangeE(num(a(0)), num(a(1)))),
      ("graft_zscore", 3,
        (a: Seq[Expression]) => zscoreE(num(a(0)), num(a(1)), num(a(2)))),
      ("graft_absolute_threshold_exceeded", 3,
        (a: Seq[Expression]) =>
          GreaterThan(absDiffE(num(a(0)), num(a(1))), num(a(2)))),
      ("graft_relative_threshold_exceeded", 3,
        (a: Seq[Expression]) =>
          GreaterThan(relChangeE(num(a(0)), num(a(1))), num(a(2)))),
      ("graft_catch_up", 3,
        (a: Seq[Expression]) =>
          GreaterThan(Subtract(num(a(0)), num(a(1))), num(a(2)))),
      ("graft_volatility_increase", 3,
        (a: Seq[Expression]) =>
          GreaterThan(num(a(0)),
            org.apache.spark.sql.catalyst.expressions.Add(num(a(1)),
              num(a(2))))),
      ("graft_is_outlier", 4,
        (a: Seq[Expression]) =>
          GreaterThan(Abs(zscoreE(num(a(0)), num(a(1)), num(a(2)))),
            num(a(3)))),
      ("graft_trend_divergent", 3,
        (a: Seq[Expression]) =>
          GreaterThan(Abs(Subtract(num(a(0)), num(a(1)))), num(a(2)))))

  /** Foldable int argument (e.g. shingle size) — must be a literal. */
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // native single-pass text/vector kernels on the SQL surface
  // (graft.expressions.*): shingling, fingerprints, simhash, language
  // ID, rolling hash, cosine
  private val pipelineBuilders: Seq[(String, Int, Seq[Expression] => Expression)] =
    Seq(
      ("graft_shingles", 2, (a: Seq[Expression]) =>
        graft.expressions.WordShinglesExpr(a(0),
          litInt(a(1), "shingle size"))),
      ("graft_fingerprint", 2, (a: Seq[Expression]) =>
        graft.expressions.MinShingleFingerprintExpr(a(0),
          litInt(a(1), "shingle size"))),
      ("graft_langid", 1, (a: Seq[Expression]) =>
        graft.expressions.LangIdExpr(a(0))),
      ("graft_simhash32", 1, (a: Seq[Expression]) =>
        graft.expressions.SimHash32Expr(a(0), useMd5 = false)),
      ("graft_rolling_hash", 1, (a: Seq[Expression]) =>
        graft.expressions.RollingHashExpr(a(0))),
      ("graft_cosine", 2, (a: Seq[Expression]) =>
        graft.expressions.CosineSimExpr(a(0), a(1))),
      ("graft_l2_normalize", 1, (a: Seq[Expression]) =>
        graft.expressions.L2NormalizeExpr(a(0))),
      ("graft_top_token_count", 1, (a: Seq[Expression]) =>
        graft.expressions.TopTokenCountExpr(a(0))),
      ("graft_nfc", 1, (a: Seq[Expression]) =>
        graft.expressions.NormalizeNfcExpr(a(0))))

  /** (sql name, arity, children → expression). */
  val builders: Seq[(String, Int, Seq[Expression] => Expression)] =
    (janusBuilders :+ (("graft_term_format", 1,
      (children: Seq[Expression]) =>
        TermFormatExpression(children.head)))) ++ pipelineBuilders

  /** Register every function into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        (children: Seq[Expression]) => {
          require(children.length == arity,
            s"$name expects $arity arguments, got ${children.length}")
          builder(children)
        },
        "scala_udf")
    }

  /** Column-level access to the native wire-format serializer. */
  def termFormat(c: Column): Column =
    ColumnBridge.column(TermFormatExpression(ColumnBridge.expression(c)))
}
