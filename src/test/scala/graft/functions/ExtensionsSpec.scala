package graft.functions

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports `/root/reference/src/extensions/math.rs:26-56` and
  * `rules.rs:104-143` semantics onto the Column-expression registry. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("r")).collect()(0).get(0)

  test("abs_diff positive and negative delta") {
    assert(eval(Extensions.absDiff(lit(3.0), lit(1.0))) === 2.0)
    assert(eval(Extensions.absDiff(lit(1.0), lit(3.0))) === 2.0)
  }

  test("relative_change increase") {
    val r = eval(Extensions.relativeChange(lit(1.1), lit(1.0)))
      .asInstanceOf[Double]
    assert(math.abs(r - 0.1) < 1e-10)
  }

  test("relative_change with zero hist → NULL (non-finite → None)") {
    assert(eval(Extensions.relativeChange(lit(1.0), lit(0.0))) === null)
  }

  test("zscore zero sigma returns 0") {
    assert(eval(Extensions.zscore(lit(99.0), lit(1.0), lit(0.0))) === 0.0)
  }

  test("zscore normal case") {
    assert(eval(Extensions.zscore(lit(12.0), lit(10.0), lit(2.0))) === 1.0)
  }

  test("absolute_threshold_exceeded") {
    assert(eval(Extensions.absoluteThresholdExceeded(
      lit(30.0), lit(25.0), lit(2.0))) === true)
    assert(eval(Extensions.absoluteThresholdExceeded(
      lit(26.0), lit(25.0), lit(2.0))) === false)
  }

  test("relative_threshold_exceeded") {
    assert(eval(Extensions.relativeThresholdExceeded(
      lit(1.2), lit(1.0), lit(0.1))) === true)
    assert(eval(Extensions.relativeThresholdExceeded(
      lit(1.05), lit(1.0), lit(0.1))) === false)
  }

  test("catch_up") {
    assert(eval(Extensions.catchUp(lit(10.0), lit(5.0), lit(2.0))) === true)
    assert(eval(Extensions.catchUp(lit(10.0), lit(9.0), lit(2.0))) === false)
  }

  test("volatility_increase") {
    assert(eval(Extensions.volatilityIncrease(
      lit(3.0), lit(2.0), lit(0.5))) === true)
    assert(eval(Extensions.volatilityIncrease(
      lit(2.4), lit(2.0), lit(0.5))) === false)
  }

  test("is_outlier") {
    assert(eval(Extensions.isOutlier(
      lit(20.0), lit(10.0), lit(2.0), lit(3.0))) === true)
    assert(eval(Extensions.isOutlier(
      lit(12.0), lit(10.0), lit(2.0), lit(3.0))) === false)
  }

  test("trend_divergent") {
    assert(eval(Extensions.trendDivergent(
      lit(0.5), lit(-0.5), lit(0.1))) === true)
    assert(eval(Extensions.trendDivergent(
      lit(0.11), lit(0.1), lit(0.1))) === false)
  }

  test("call() resolves full IRIs and bare names; rejects wrong arity") {
    assert(Extensions.call("https://janus.rs/fn#zscore",
      Seq(lit(1.0), lit(0.0), lit(1.0))).isDefined)
    assert(Extensions.call("zscore", Seq(lit(1.0), lit(0.0), lit(1.0))).isDefined)
    assert(Extensions.call("zscore", Seq(lit(1.0))).isEmpty)
    assert(Extensions.call("no_such_fn", Seq(lit(1.0))).isEmpty)
  }

  test("non-numeric argument → NULL result (term_to_f64 None semantics)") {
    val c = Extensions.absDiff(lit("abc").try_cast("double"), lit(1.0))
    assert(eval(c) === null)
  }
}
