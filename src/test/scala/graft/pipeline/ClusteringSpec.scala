package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point k-means: recovers planted clusters, assignments are
  * bit-identical under repartitioning (the reason the kernel is
  * integer-exact), ties break to the lowest centroid index, empty
  * cells keep their centroid, and the cluster-balanced sampler
  * enforces its quota deterministically. */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // three well-separated planted centers in 4D; points jitter by
  // <= 0.04 around a center while centers are ~2 apart
  private def plantedRows: Seq[(Long, Array[Float])] = {
    val centers = Array(
      Array(0.0, 0.0, 1.0, 0.0),
      Array(2.0, 0.0, -1.0, 0.0),
      Array(0.0, 2.0, 0.0, 1.0))
    (0 until 300).map { i =>
      val c = centers(i % 3)
      val j = ((i * 7919) % 80 - 40) / 1000.0 // deterministic jitter
      (i.toLong, c.map(x => (x + j).toFloat))
    }
  }
  private lazy val planted = plantedRows.toDF("id", "v")

  test("recovers planted clusters: members of one plant share a label") {
    val out = Clustering.kMeansAssign(planted, k = 3, iterations = 3)
      .withColumn("plant", col("id") % 3)
      .select("plant", "cluster").distinct().collect()
    // each plant maps to exactly one cluster, and the three clusters
    // are distinct
    val byPlant = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byPlant.values.forall(_ == 1), out.mkString(";"))
    assert(out.map(_.getInt(1)).distinct.length == 3, out.mkString(";"))
  }

  test("assignments and distances are bit-identical under repartitioning") {
    val a = Clustering.kMeansAssign(planted, k = 3, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val b = Clustering.kMeansAssign(planted.repartition(17), k = 3,
        iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("equidistant vectors break ties to the lowest centroid index") {
    // two seed-eligible points at -1 and +1 on one axis; a probe at the
    // exact midpoint 0 is equidistant from both trained centroids
    val df = Seq(
      (0L, Array(-1.0f)), (1L, Array(1.0f)), (2L, Array(0.0f)))
      .toDF("id", "v")
    val m = Clustering.fitQuantizedKMeans(
      Seq((0L, Array(-1.0f)), (1L, Array(1.0f))).toDF("id", "v"),
      k = 2, iterations = 1)
    assert(m.centroids(0)(0) != m.centroids(1)(0))
    val probe = Clustering.assign(df, m)
      .where(col("id") === 2).collect().head
    assert(probe.getInt(1) == 0) // lowest index wins
  }

  test("a cell that loses all members keeps its previous centroid") {
    // k = 2 over two ids {0, 1}: stride = 1, seeds are both points.
    // After one iteration each point is its own centroid; a second
    // iteration with the same data leaves both cells unchanged (and in
    // particular never NaNs or drops the second cell)
    val df = Seq((0L, Array(0.0f)), (1L, Array(1.0f))).toDF("id", "v")
    val m1 = Clustering.fitQuantizedKMeans(df, k = 2, iterations = 1)
    val m2 = Clustering.fitQuantizedKMeans(df, k = 2, iterations = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("sparse ids that starve the systematic seed sample fail loudly") {
    // 8 odd ids, k = 4: stride = 2 and no id is divisible by 2
    val df = (0 until 8).map(i => ((2 * i + 1).toLong, Array(i.toFloat)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Clustering.fitQuantizedKMeans(df, k = 4, iterations = 1)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("clusterBalancedSample enforces the per-cluster quota " +
      "deterministically") {
    val assigned = Clustering.kMeansAssign(planted, k = 3, iterations = 2)
    val s1 = Clustering.clusterBalancedSample(assigned, quota = 7)
    val counts = s1.groupBy("cluster").count().collect()
    assert(counts.length == 3 && counts.forall(_.getLong(1) == 7))
    val s2 = Clustering.clusterBalancedSample(
      assigned.repartition(13), quota = 7)
    assert(s1.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(s2.select("id").collect().map(_.getLong(0)).sorted))
  }

  test("round-fold law: k-means trained from folded batch statistics " +
      "is bit-identical to the one-shot fit, for any split") {
    val oneShot = Clustering.fitQuantizedKMeans(planted, k = 3,
      iterations = 2)
    for (m <- Seq(2L, 3L)) {
      val parts = (0L until m).map(r =>
        planted.where(col("id") % m === r))
      var model = Clustering.seedModel(planted, k = 3)
      (0 until 2).foreach { _ =>
        val folded = parts.map(p => Clustering.roundSums(p, model))
          .reduce(Clustering.foldRoundSums)
        model = Clustering.updatedModel(model, folded)
      }
      assert(model.centroids.map(_.toSeq).toSeq ===
        oneShot.centroids.map(_.toSeq).toSeq, s"split m=$m")
    }
  }

  test("clusterTopTerms: integer ppm lift, hand-checked; exclusive " +
      "terms rank above shared ones; topK and ties respected") {
    // cluster 0 = docs {0,1}: "apple" only there; "common" everywhere
    val assigned = Seq((0L, 0, 0L), (1L, 0, 0L), (2L, 1, 0L), (3L, 1, 0L))
      .toDF("id", "cluster", "d2")
    val docs = Seq(
      (0L, "apple apple common"),
      (1L, "apple common pear"),
      (2L, "plum common plum"),
      (3L, "pear common plum")).toDF("doc_id", "text")
    val out = Clustering.clusterTopTerms(assigned, docs, col("doc_id"),
      col("text"), topK = 2).collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("token"), r.getAs[Long]("tf_c"),
          r.getAs[Long]("lift_ppm"))).toMap
    // cluster 0: T_total=12, t_c=6, apple tf_c=3 tf_all=3 ->
    // 3*12*1e6 div (6*3) = 2_000_000 (lift 2.0)
    assert(out((0, 1)) === (("apple", 3L, 2000000L)))
    // common (2/6 vs 4/12) and pear (1/6 vs 2/12) both lift 1.0 ->
    // token asc puts common first
    assert(out((0, 2)) === (("common", 2L, 1000000L)))
    // cluster 1: plum is 3/6 vs 3/12 -> lift 2.0
    assert(out((1, 1)) === (("plum", 3L, 2000000L)))
    assert(out((1, 2)) === (("common", 2L, 1000000L)))
    assert(out.size === 4)
  }
}
