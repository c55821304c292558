package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standing additive CUBE: the fold law against the one-shot cube,
  * and the null-dimension fail-loud guard. */
class ReportsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = Seq(
    ("a", "en", 10L), ("a", "en", 20L), ("a", "de", 5L),
    ("b", "en", 7L), ("b", "fr", 3L), ("c", "fr", 100L))
    .toDF("src", "lang", "chars")

  private def asMap(df: org.apache.spark.sql.DataFrame)
      : Map[(String, String), (Long, Long)] =
    df.collect().map { r =>
      (String.valueOf(r.get(0)), String.valueOf(r.get(1))) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_m"))
    }.toMap

  test("folded batch cubes equal the one-shot cube exactly, for any " +
      "batch split") {
    val oneShot = asMap(Reports.cubePartial(rows,
      Seq(col("src"), col("lang")), col("chars")))
    // every cell present: 6 (src,lang) + 3 src rollups + 3 lang
    // rollups + 1 grand total... (a,en/de),(b,en/fr),(c,fr)=5 pairs
    assert(oneShot.size === 5 + 3 + 3 + 1)
    assert(oneShot(("null", "null")) === ((6L, 145L)))
    for (splitter <- Seq[org.apache.spark.sql.Column => Seq[
        org.apache.spark.sql.DataFrame]](
      k => Seq(rows.where(k === "a"), rows.where(k =!= "a")),
      k => Seq(rows.where(k === "a"), rows.where(k === "b"),
        rows.where(k === "c")))) {
      val folded = asMap(Reports.foldCubes(splitter(col("src")).map(b =>
        Reports.cubePartial(b, Seq(col("src"), col("lang")),
          col("chars")))))
      assert(folded === oneShot)
    }
  }

  test("withAvg derives the mean from the additive partials") {
    val c = Reports.withAvg(Reports.cubePartial(rows,
      Seq(col("src"), col("lang")), col("chars")))
      .where(col("d0") === "a" && col("d1").isNull)
      .collect()(0)
    assert(math.abs(c.getAs[Double]("avg_m") - 35.0 / 3) < 1e-6)
  }

  test("null dimension values raise instead of aliasing the rollup row") {
    val bad = Seq(("a", null.asInstanceOf[String], 1L))
      .toDF("src", "lang", "chars")
    val ex = intercept[Exception] {
      Reports.cubePartial(bad, Seq(col("src"), col("lang")),
        col("chars")).collect()
    }
    assert(ex.getMessage.contains("cubePartial") ||
      Option(ex.getCause).exists(_.getMessage.contains("cubePartial")))
  }
}
