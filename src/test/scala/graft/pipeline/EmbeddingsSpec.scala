package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed PCA: recovers planted structure, components orthonormal,
  * projections norm-bounded, whitening unit-variance, partitioning
  * stability. */
class EmbeddingsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // planted dominant axis u = (3,4)/5 in 2D plus a weak orthogonal
  // component: variance along u is 25x the orthogonal variance
  private lazy val planted = (0 until 400).map { i =>
    val t = (i % 21) - 10.0           // spread along u
    val o = ((i % 5) - 2.0) / 5.0     // weak orthogonal spread
    (i.toLong, Array((0.6 * t - 0.8 * o).toFloat, (0.8 * t + 0.6 * o).toFloat))
  }.toDF("id", "v")

  test("recovers the planted dominant axis and variance ordering") {
    val m = Embeddings.fitPca(planted, col("v"), k = 2)
    assert(m.explained(0) > 20 * m.explained(1))
    // first component parallel to (0.6, 0.8), canonical sign positive
    // (t and o are only approximately uncorrelated over 400 samples —
    // i%21 vs i%5 — so the axis tilts by O(1e-3))
    val c0 = m.components(0)
    assert(math.abs(c0(0) - 0.6) < 5e-3 && math.abs(c0(1) - 0.8) < 5e-3,
      c0.mkString(","))
    assert(math.abs(m.explainedRatio - 1.0) < 1e-9) // k = d explains all
  }

  test("components are orthonormal") {
    val m = Embeddings.fitPca(planted, col("v"), k = 2)
    val dot00 = m.components(0).zip(m.components(0)).map(p => p._1 * p._2).sum
    val dot01 = m.components(0).zip(m.components(1)).map(p => p._1 * p._2).sum
    assert(math.abs(dot00 - 1.0) < 1e-9 && math.abs(dot01) < 1e-9)
  }

  test("full-rank projection preserves centered norms; truncation only " +
      "shrinks them") {
    val m2 = Embeddings.fitPca(planted, col("v"), k = 2)
    val m1 = m2.copy(components = m2.components.take(1),
      explained = m2.explained.take(1))
    val mean = m2.mean
    val rows = Embeddings.project(
        Embeddings.project(planted, col("v"), m2).withColumnRenamed("pc", "pc2"),
        col("v"), m1)
      .select(col("v").cast("array<double>"), col("pc2"), col("pc"))
      .collect()
    rows.foreach { r =>
      val x = r.getSeq[Double](0)
      val c2 = math.pow(x(0) - mean(0), 2) + math.pow(x(1) - mean(1), 2)
      val p2 = r.getSeq[Double](1).map(v => v * v).sum
      val p1 = r.getSeq[Double](2).map(v => v * v).sum
      assert(math.abs(p2 - c2) < 1e-9)
      assert(p1 <= p2 + 1e-12)
    }
  }

  test("whitened projections have unit variance per component") {
    val m = Embeddings.fitPca(planted, col("v"), k = 2)
    val stats = Embeddings.project(planted, col("v"), m, whiten = true)
      .select(
        var_pop(element_at(col("pc"), 1)).as("v1"),
        var_pop(element_at(col("pc"), 2)).as("v2"))
      .collect()(0)
    assert(math.abs(stats.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-6)
  }

  test("model is stable under repartitioning (canonical signs)") {
    val m1 = Embeddings.fitPca(planted, col("v"), 2)
    val m2 = Embeddings.fitPca(planted.repartition(7), col("v"), 2)
    m1.components.zip(m2.components).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-8) }
    }
    m1.explained.zip(m2.explained).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-8)
    }
  }

  test("works on the real 64-dim embeddings table") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Embeddings.fitPca(emb, col("embedding"), k = 16)
    assert(m.d === 64 && m.k === 16)
    assert(m.explained.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.explainedRatio > 0.15 && m.explainedRatio < 0.75,
      s"ratio ${m.explainedRatio}") // near-isotropic synthetic vectors
  }

  // ---- SemDeDup ----------------------------------------------------------

  test("semDeDup: planted exact copies collapse to their component " +
      "minimum; distinct vectors all keep") {
    // two well-separated groups of vectors, ids 0..5; 10/11 are exact
    // copies of 0 and 4 respectively; 12 is a copy of 10 (chain)
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      1L -> Seq(0.9, 0.1, 0.0, 0.0),
      2L -> Seq(0.0, 0.0, 1.0, 0.0),
      3L -> Seq(0.0, 0.1, 0.9, 0.0),
      4L -> Seq(0.0, 0.0, 0.0, 1.0),
      10L -> Seq(1.0, 0.0, 0.0, 0.0),
      11L -> Seq(0.0, 0.0, 0.0, 1.0),
      12L -> Seq(1.0, 0.0, 0.0, 0.0))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Embeddings.semDeDup(df, col("vec_id"), col("embedding"),
        k = 3, iterations = 2, threshold = 0.999).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("rep"), r.getAs[Boolean]("keep")))).toMap
    assert(got(0L) === ((0L, true)))
    assert(got(10L) === ((0L, false)))
    assert(got(12L) === ((0L, false)), "transitive copy joins component")
    assert(got(4L) === ((4L, true)))
    assert(got(11L) === ((4L, false)))
    // near-but-below-threshold vectors keep themselves
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) === ((i, true)), s"id $i"))
    assert(got.size === vecs.size, "one output row per input row")
  }

  // ---- SRP bit signatures ------------------------------------------------

  test("srpSignatures: bitstring and packed long agree bit-for-bit; " +
      "identical vectors share signatures; partitioning-independent") {
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      0L -> (0 until 64).map(i => math.sin(i + 1).abs + 0.1),
      1L -> (0 until 64).map(i => math.sin(i + 1).abs + 0.1), // copy of 0
      2L -> (0 until 64).map(i => math.cos(3 * i + 2)),
      3L -> (0 until 64).map(i => -math.sin(i + 1).abs - 0.1)) // negated 0
    val df = vecs.toDF("vec_id", "embedding")
    val sigs = Embeddings.srpSignatures(df, col("vec_id"),
      col("embedding"), dim = 64).collect()
      .map(x => x.vec_id -> x).toMap
    sigs.values.foreach { x =>
      assert(x.sig_bits.length === 64)
      (0 until 64).foreach { b =>
        assert((((x.sig >>> b) & 1L) == 1L) === (x.sig_bits(b) == '1'),
          s"bit $b of ${x.vec_id}")
      }
    }
    assert(sigs(0L).sig === sigs(1L).sig, "exact copy -> same signature")
    // negation flips every strict sign; ties (sum == 0) don't occur here
    assert(java.lang.Long.bitCount(sigs(0L).sig ^ sigs(3L).sig) === 64)
    val again = Embeddings.srpSignatures(df.repartition(7),
      col("vec_id"), col("embedding"), dim = 64).collect()
      .map(x => x.vec_id -> x.sig).toMap
    assert(again === sigs.view.mapValues(_.sig).toMap)
  }

  // ---- incremental PCA (exact quantized moments) --------------------------

  private def randVecs(n: Int, d: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => i.toLong -> Seq.fill(d)(rnd.nextGaussian()))
  }

  test("momentsOf: any batch split and fold order gives bit-identical " +
      "moments and model") {
    val data = randVecs(200, 8, 21)
    val df = data.toDF("vec_id", "embedding")
    val one = Embeddings.momentsOf(df, col("embedding"))
    // three different partitionings of the same corpus
    val byMod = (0 until 3).map(i =>
      Embeddings.momentsOf(df.where(col("vec_id") % 3 === i),
        col("embedding")))
    val byRange = Seq(df.where(col("vec_id") < 50),
      df.where(col("vec_id") >= 50 && col("vec_id") < 120),
      df.where(col("vec_id") >= 120))
      .map(b => Embeddings.momentsOf(b, col("embedding")))
    for (folded <- Seq(byMod.reduce(_ fold _), byMod.reverse.reduce(_ fold _),
        byRange.reduce(_ fold _))) {
      assert(folded.n === one.n)
      assert(folded.sum.toSeq === one.sum.toSeq)
      assert(folded.gram.toSeq === one.gram.toSeq)
      val m = Embeddings.pcaFromMoments(folded, 4)
      val m1 = Embeddings.pcaFromMoments(one, 4)
      assert(m.components.map(_.toSeq).toSeq ===
        m1.components.map(_.toSeq).toSeq)
      assert(m.explained.toSeq === m1.explained.toSeq)
    }
    // and repartitioning the input never changes the moments either
    val shuffled = Embeddings.momentsOf(df.repartition(13),
      col("embedding"))
    assert(shuffled.sum.toSeq === one.sum.toSeq &&
      shuffled.gram.toSeq === one.gram.toSeq)
  }

  test("pcaFromMoments recovers the same subspace as the float fitPca") {
    // anisotropic data: variance concentrated on two known axes
    val rnd = new scala.util.Random(33)
    val data = (0 until 300).map { i =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 3
      i.toLong -> (0 until 6).map {
        case 0 => a; case 1 => b; case j => rnd.nextGaussian() * 0.01
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val exact = Embeddings.fitPca(df, col("embedding"), 2)
    val quant = Embeddings.pcaFromMoments(
      Embeddings.momentsOf(df, col("embedding")), 2)
    exact.components.zip(quant.components).foreach { case (e, q) =>
      val dot = math.abs(e.zip(q).map(p => p._1 * p._2).sum)
      assert(dot > 0.9999, s"subspace drift: |cos| = $dot")
    }
    exact.explained.zip(quant.explained).foreach { case (e, q) =>
      assert(math.abs(e - q) / e < 1e-3, s"eigenvalue drift: $e vs $q")
    }
  }
}
