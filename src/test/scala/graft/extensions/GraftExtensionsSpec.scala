package graft.extensions

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: the janus function library and the native
  * wire-format expression, callable from spark.sql. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("janus functions callable from SQL") {
    val r = spark.sql(
      """SELECT graft_zscore(12.0, 10.0, 2.0) AS z,
        |  graft_abs_diff(3.0, 1.0) AS d,
        |  graft_is_outlier(20.0, 10.0, 2.0, 3.0) AS o,
        |  graft_relative_change(1.0, 0.0) AS rc_null""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 2.0)
    assert(r.getBoolean(2) === true)
    assert(r.isNullAt(3))
  }

  test("functions coerce string lexicals like the SPARQL path") {
    val r = spark.sql(
      """SELECT graft_absolute_threshold_exceeded('30', '25', '2') AS b,
        |  graft_abs_diff('x', 1.0) AS nullres""".stripMargin).head()
    assert(r.getBoolean(0) === true)
    assert(r.isNullAt(1))
  }

  test("native pipeline kernels callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_fingerprint('alpha beta gamma delta', 3) AS fp,
        |  md5('alpha beta gamma') AS h1, md5('beta gamma delta') AS h2,
        |  graft_langid('the cat and the dog are in the house') AS lang,
        |  graft_simhash32('a b a') AS sim,
        |  size(graft_shingles('a b c d', 2)) AS nsh,
        |  graft_rolling_hash('x y') AS rh,
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  graft_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS coz,
        |  graft_l2_normalize(array(3.0D, 4.0D)) AS unit,
        |  graft_l2_normalize(array(0.0D, 0.0D)) AS unitz
        |""".stripMargin).head()
    // fingerprint = min md5 over the two 3-shingles
    assert(r.getString(0) ===
      Seq(r.getString(1), r.getString(2)).min)
    assert(r.getString(3) === "en")
    assert(r.getLong(4) === graft.expressions.Kernels.simhash32(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b a"), false))
    assert(r.getInt(5) === 3)
    assert(r.getLong(6) === graft.expressions.Kernels.rollingHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("x y")))
    assert(r.getDouble(7) === 1.0)
    assert(r.isNullAt(8)) // zero norm → null
    assert(r.getSeq[Double](9) === Seq(0.6, 0.8))
    assert(r.isNullAt(10)) // zero norm → null
  }

  test("graft_top_token_count and graft_nfc callable from SQL") {
    val r = spark.sql(
      """SELECT graft_top_token_count('a b a c a') AS top,
        |  graft_nfc('cafe\u0301') AS composed""".stripMargin).head()
    assert(r.getLong(0) === 3L)
    assert(r.getString(1) === "café")
  }

  test("graft_shingles rejects a non-literal shingle size") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_shingles('a b c', cast(id AS int)) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("wrong arity raises at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zscore(1.0)").collect()
    }
    assert(e.getMessage.contains("3 arguments") ||
      e.getMessage.toLowerCase.contains("argument"))
  }

  test("graft_term_format: native expression implements R11 wire " +
      "convention, interpreted and codegen paths agree") {
    import spark.implicits._
    val df = Seq("http://example.org/a", "15", "23.5", "plain text", null)
      .toDF("t")
    df.createOrReplaceTempView("terms_in")
    val got = spark.sql(
      "SELECT graft_term_format(t) AS w FROM terms_in").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSet === Set(
      "<http://example.org/a>",
      "\"15\"^^<http://www.w3.org/2001/XMLSchema#decimal>",
      "\"23.5\"^^<http://www.w3.org/2001/XMLSchema#decimal>",
      "\"plain text\"",
      null))
    // interpreted path (eval) must agree with the codegen output
    val interpreted = TermFormatExpression(
      org.apache.spark.sql.catalyst.expressions.Literal("15"))
      .eval(null).toString
    assert(interpreted === "\"15\"^^<http://www.w3.org/2001/XMLSchema#decimal>")
  }

  test("SQL builders agree with the Column-API Extensions on a value grid") {
    import org.apache.spark.sql.functions._
    val vals = Seq(-5.0, 0.0, 0.5, 2.0, 10.0)
    val grid = for (a <- vals; b <- vals; t <- Seq(0.1, 2.0)) yield (a, b, t)
    import spark.implicits._
    val df = grid.toDF("a", "b", "t")
    df.createOrReplaceTempView("grid")
    val viaSql = spark.sql(
      """SELECT graft_abs_diff(a, b) AS d,
        |  graft_relative_change(a, b) AS rc,
        |  graft_zscore(a, b, t) AS z,
        |  graft_catch_up(a, b, t) AS cu,
        |  graft_is_outlier(a, b, t, 2.0) AS oo
        |FROM grid""".stripMargin).collect()
    val viaCols = df.select(
      graft.functions.Extensions.absDiff($"a", $"b").as("d"),
      graft.functions.Extensions.relativeChange($"a", $"b").as("rc"),
      graft.functions.Extensions.zscore($"a", $"b", $"t").as("z"),
      graft.functions.Extensions.catchUp($"a", $"b", $"t").as("cu"),
      graft.functions.Extensions.isOutlier($"a", $"b", $"t", lit(2.0)).as("oo"))
      .collect()
    viaSql.zip(viaCols).foreach { case (x, y) =>
      (0 until 5).foreach(i => assert(x.get(i) === y.get(i), s"col $i: $x vs $y"))
    }
  }

  test("term format works as a Column on bindings DataFrames") {
    import spark.implicits._
    val out = Seq(("http://e.org/s", "42"))
      .toDF("s", "v")
      .select(GraftFunctions.termFormat($"s").as("s"),
        GraftFunctions.termFormat($"v").as("v"))
      .head()
    assert(out.getString(0) === "<http://e.org/s>")
    assert(out.getString(1) ===
      "\"42\"^^<http://www.w3.org/2001/XMLSchema#decimal>")
  }
}
