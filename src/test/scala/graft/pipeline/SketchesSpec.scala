package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable sketch operators: HLL distinct (exactness at low
  * cardinality, the merge law, partitioning independence) and KLL
  * quantiles (ε-rank bound through the merge path). */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = (0L until 3000L).map(i =>
    (i % 3, s"user${i % 97}", (i % 101).toDouble)).toDF("g", "u", "v")

  test("HLL estimate is exact at low cardinality (sparse mode)") {
    val est = Sketches.distinctEstimate(
      Sketches.distinctSketch(rows, Seq(col("g")), col("u")),
      Seq(col("g")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est === Map(0L -> 97L, 1L -> 97L, 2L -> 97L))
  }

  test("past exact mode, union and one-shot estimates may DIVERGE " +
      "(HIP vs composite estimator) but both respect the ±5% bound") {
    val big = (0L until 60000L).map(i => (i % 2, i % 20011)).toDF("g", "u")
    val exact = 20011.0 // both groups see every residue at 60k rows
    val union = Sketches.distinctEstimate(
      Sketches.unionDistinctSketches(
        Sketches.distinctSketch(big.withColumn("b", col("u") % 5),
          Seq(col("g"), col("b")), col("u")),
        Seq(col("g"))),
      Seq(col("g"))).collect().map(_.getLong(1))
    val oneShot = Sketches.distinctEstimate(
      Sketches.distinctSketch(big, Seq(col("g")), col("u")),
      Seq(col("g"))).collect().map(_.getLong(1))
    (union ++ oneShot).foreach { est =>
      assert(math.abs(est - exact) <= exact * 0.05, s"est $est vs $exact")
    }
  }

  test("sketch merge law at low cardinality (exact mode): union of " +
      "batch sketches equals the one-shot sketch estimate-for-estimate") {
    val batches = (0 until 5).map(b =>
      Sketches.distinctSketch(rows.where(col("v") % 5 === b),
        Seq(col("g")), col("u")))
    val merged = Sketches.distinctEstimate(
      Sketches.unionDistinctSketches(
        batches.reduce(_ unionByName _), Seq(col("g"))),
      Seq(col("g")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = Sketches.distinctEstimate(
      Sketches.distinctSketch(rows, Seq(col("g")), col("u")),
      Seq(col("g")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === oneShot)
  }

  test("HLL estimate is independent of input partitioning") {
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.distinctEstimate(
        Sketches.distinctSketch(df, Seq(col("g")), col("u")),
        Seq(col("g")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(rows) === est(rows.repartition(13)))
  }

  test("KLL quantile estimates satisfy the ε-rank bound through the " +
      "daily-merge path") {
    val daily = Sketches.quantileSketch(rows,
      Seq(col("g"), (col("v") % 7).as("day")), col("v"))
    val est = Sketches.quantileEstimate(
      Sketches.mergeQuantileSketches(daily, Seq(col("g"))),
      Seq(col("g")), Seq(0.5, 0.9))
    val ranked = rows.join(est, "g").groupBy("g")
      .agg(
        (sum(when(col("v") <= col("q_50"), 1L).otherwise(0L)) /
          count(lit(1))).as("r50"),
        (sum(when(col("v") <= col("q_90"), 1L).otherwise(0L)) /
          count(lit(1))).as("r90"))
      .collect()
    assert(ranked.length === 3)
    ranked.foreach { r =>
      assert(math.abs(r.getAs[Double]("r50") - 0.5) <= 0.05, r)
      assert(math.abs(r.getAs[Double]("r90") - 0.9) <= 0.05, r)
    }
  }

  test("CMS merge equals the one-shot sketch estimate-for-estimate and " +
      "respects the overestimate-only guarantee") {
    val df = (0L until 5000L).map(i => (i % 4, i % 37)).toDF("b", "item")
    val daily = Sketches.freqSketch(df, Seq(col("b")), col("item"))
      .select(lit(1).as("one"), col("cms"))
    val merged = Sketches.mergeFreqSketches(daily, Seq(col("one")))
      .select(col("cms").as("m"))
    val oneShot = Sketches.freqSketch(df.withColumn("one", lit(1)),
      Seq(col("one")), col("item")).select(col("cms").as("o"))
    val exact = df.groupBy("item").count()
    val checked = exact.crossJoin(merged).crossJoin(oneShot)
      .select(col("item"), col("count"),
        Sketches.freqEstimate(col("m"), col("item")).as("me"),
        Sketches.freqEstimate(col("o"), col("item")).as("oe"))
      .collect()
    assert(checked.length === 37)
    checked.foreach { r =>
      assert(r.getAs[Long]("me") === r.getAs[Long]("oe"), r)
      assert(r.getAs[Long]("me") >= r.getAs[Long]("count"), r)
      assert(r.getAs[Long]("me") <= r.getAs[Long]("count") + 5L, r)
    }
  }

  test("curriculumBins matches ntile exactly and balances bucket sizes") {
    val df = (0L until 103L).map(i => (i, (i * 37) % 1000)).toDF("id", "s")
    val got = Sampling.curriculumBins(df, struct(col("s"), col("id")), 10)
      .select("id", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("bin",
        ntile(10).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("s"), col("id"))).cast("long"))
      .select("id", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    // 103 rows / 10 bins: first 3 buckets get 11, the rest 10
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert((1L to 3L).forall(sizes(_) == 11))
    assert((4L to 10L).forall(sizes(_) == 10))
    // partitioning-proof
    val re = Sampling.curriculumBins(df.repartition(7),
      struct(col("s"), col("id")), 10)
      .select("id", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(re === want)
  }

  test("curriculumBins: fewer rows than bins gives each row its own " +
      "leading bucket") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L)).toDF("id", "s")
    val got = Sampling.curriculumBins(df, struct(col("s"), col("id")), 10)
      .select("id", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }
}
