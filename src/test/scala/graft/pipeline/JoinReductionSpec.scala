package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom semi-join reduction: output exactness for ANY filter sizing
  * (including a deliberately saturated one), actual row reduction on a
  * selective join, string-key probes, and null-key semantics. */
class JoinReductionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fact = (0L until 10_000L).map(i => (i, i % 1000))
    .toDF("row_id", "key")
  private lazy val dim = Seq(3L, 7L, 11L, 500L).toDF("dkey")

  private def exact: Set[Long] =
    fact.join(dim, col("key") === col("dkey"), "left_semi")
      .select("row_id").as[Long].collect().toSet

  test("output equals the plain semi-join, well-sized filter") {
    val got = Joins.bloomSemiJoin(fact, "key", dim, "dkey",
        expectedItems = 1024L)
      .select("row_id").as[Long].collect().toSet
    assert(got === exact)
    assert(got.size === 40) // 4 matching keys × 10 rows each
  }

  test("a saturated filter (fpp 0.5, 2 expected items) stays exact") {
    val got = Joins.bloomSemiJoin(fact, "key", dim, "dkey",
        expectedItems = 2L, fpp = 0.5)
      .select("row_id").as[Long].collect().toSet
    assert(got === exact)
  }

  test("the reduction really drops non-matching rows before the join") {
    val bloom = Joins.keyBloom(dim, "dkey", 1024L, 0.01)
    val survived = Joins.bloomReduce(fact, "key", bloom).count()
    // exact answer is 40; a 1% fpp bloom may pass a few extras but
    // must reject the overwhelming majority of the 10_000 fact rows
    assert(survived >= 40 && survived < 500,
      s"bloom should reduce 10000 rows to ~40, got $survived")
  }

  test("string keys probe through mightContainString") {
    val sFact = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4))
      .toDF("key", "v")
    val sDim = Seq("b", "d").toDF("dkey")
    val got = Joins.bloomSemiJoin(sFact, "key", sDim, "dkey", 16L)
      .select("v").as[Int].collect().toSet
    assert(got === Set(2, 4))
  }

  test("null fact keys never match (semi-join semantics)") {
    val nFact = Seq[(java.lang.Long, Int)]((1L, 1), (null, 2), (3L, 3))
      .toDF("key", "v")
    val nDim = Seq(1L, 3L).toDF("dkey")
    val got = Joins.bloomSemiJoin(nFact, "key", nDim, "dkey", 16L)
      .select("v").as[Int].collect().toSet
    assert(got === Set(1, 3))
  }
}
