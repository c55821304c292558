package graft.sparql

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals plain inner join on skewed data") {
    // 1000 rows on one hot key + a long tail
    val left = ((1 to 1000).map(i => ("hot", s"l$i")) ++
      (1 to 50).map(i => (s"k$i", s"l$i"))).toDF("key", "lval")
    val right = (Seq("hot" -> "r1", "hot" -> "r2") ++
      (1 to 50).map(i => s"k$i" -> s"r$i")).toDF("key", "rval")
    val plain = left.join(right, Seq("key")).select("key", "lval", "rval")
    val salted = Skew.saltedJoin(left, right, Seq("key"), factor = 8)
      .select("key", "lval", "rval")
    assert(salted.count() === plain.count())
    assert(salted.collect().toSet === plain.collect().toSet)
  }

  test("twoPhaseCount equals plain count per key") {
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "a", "b")).toDF("k")
    val got = Skew.twoPhaseCount(df, col("k"), factor = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("hot" -> 500L, "a" -> 2L, "b" -> 1L))
  }
}
