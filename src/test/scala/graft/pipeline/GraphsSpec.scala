package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank: hand-checked fixtures, a local reference implementation
  * on a randomized-shape graph, dangling handling, determinism. */
class GraphsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local single-threaded reference with the identical per-iteration
    * rounding discipline. */
  private def localPageRank(edges: Seq[(Long, Long, Double)], iters: Int,
      d: Double = 0.85, roundTo: Int = 9): Map[Long, Double] = {
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val agg = edges.groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }.toSeq
    val nodes = (agg.map(_._1) ++ agg.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val ow = agg.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> rnd(1.0 / n)).toMap
    (1 to iters).foreach { _ =>
      val dm = nodes.filterNot(ow.contains).map(r).sum
      val inc = agg.groupBy(_._2).map { case (t, es) =>
        t -> es.map(e => e._3 / ow(e._1) * r(e._1)).sum
      }
      r = nodes.map(v =>
        v -> rnd((1 - d) / n + d * (inc.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Double)], iters: Int)
      : Map[Long, Double] =
    Graphs.pageRank(edges.toDF("s", "t", "w"), col("s"), col("t"),
      col("w"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle stays uniform at 0.5 each") {
    val got = run(Seq((1L, 2L, 1.0), (2L, 1L, 1.0)), iters = 5)
    assert(got === Map(1L -> 0.5, 2L -> 0.5))
  }

  test("sink node collects rank; dangling mass redistributes (sum = 1)") {
    // a->c, b->c; c dangling
    val got = run(Seq((1L, 3L, 1.0), (2L, 3L, 1.0)), iters = 3)
    assert(got === localPageRank(Seq((1L, 3L, 1.0), (2L, 3L, 1.0)), 3))
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    assert(got(3L) > got(1L) && got(1L) === got(2L))
  }

  test("matches the local reference on a randomized-shape weighted " +
      "multigraph, independent of partitioning") {
    val edges = (0 until 200).map(i =>
      ((i * 13 % 23).toLong, (i * 7 + 5).toLong % 29,
        1.0 + (i % 4))) // multi-edges + weights + dangling nodes
    val want = localPageRank(edges, iters = 4)
    assert(run(edges, iters = 4) === want)
    val repart = Graphs.pageRank(
      edges.toDF("s", "t", "w").repartition(7),
      col("s"), col("t"), col("w"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(repart === want)
  }

  test("edge weight shifts rank toward the heavier target") {
    // a splits 3:1 between b and c
    val got = run(Seq((1L, 2L, 3.0), (1L, 3L, 1.0)), iters = 3)
    assert(got(2L) > got(3L))
    assert(got === localPageRank(Seq((1L, 2L, 3.0), (1L, 3L, 1.0)), 3))
  }

  // ---- triangle counting ------------------------------------------------

  private def tri(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] =
    Graphs.triangleCounts(edges.toDF("src", "dst"), col("src"),
        col("dst")).collect()
      .map(r => r.getAs[Long]("node") -> ((r.getAs[Long]("degree"),
        r.getAs[Long]("triangles"), r.getAs[Double]("coeff")))).toMap

  test("pageRankConverged: stops at the first iteration with max diff " +
      "<= eps, equals fixed-iteration pageRank at n_iter, fails loud " +
      "past maxIter") {
    val edges = (0 until 200).map(i =>
      ((i % 13).toLong, ((i * 11 + 5) % 17).toLong, 1.0 + (i % 3)))
    val conv = Graphs.pageRankConverged(edges.toDF("s", "t", "w"),
      col("s"), col("t"), col("w"), eps = 1e-6, maxIter = 200)
      .collect()
    val nIter = conv.head.getAs[Long]("n_iter").toInt
    assert(conv.forall(_.getAs[Long]("n_iter") === nIter.toLong))
    assert(nIter >= 2 && nIter < 200, s"suspicious n_iter $nIter")
    val got = conv.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // identical to running exactly n_iter fixed iterations...
    assert(got === run(edges, nIter))
    // ...and n_iter is MINIMAL: the local reference's diff sequence
    // crosses eps exactly there
    val before = localPageRank(edges, nIter - 1)
    val at = localPageRank(edges, nIter)
    def md(a: Map[Long, Double], b: Map[Long, Double]) =
      a.keys.map(k => math.abs(a(k) - b(k))).max
    assert(md(at, before) <= 1e-6)
    if (nIter >= 2)
      assert(md(before, localPageRank(edges, nIter - 2)) > 1e-6,
        "stopped later than the first converged iteration")
    // unconverged exit must throw, not return a mid-mixing vector —
    // AND must release its eager checkpoints (e, nodes, ranks) on the
    // way out: a fail-loud path that leaks pins would accumulate
    // storage in a long-lived session that retries with higher maxIter
    val pinsBefore = spark.sparkContext.getPersistentRDDs.size
    val ex = intercept[IllegalArgumentException] {
      Graphs.pageRankConverged(edges.toDF("s", "t", "w"), col("s"),
        col("t"), col("w"), eps = 1e-12, maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    assert(spark.sparkContext.getPersistentRDDs.size <= pinsBefore,
      "fail-loud pageRankConverged must not leak localCheckpoints")
  }

  test("K4: every vertex has degree 3, 3 triangles, coefficient 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val got = tri(k4)
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.toSet === Set((3L, 3L, 1.0)))
  }

  test("a path has no triangles; coefficient 0 everywhere") {
    val got = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got.values.forall { case (_, t, c) => t == 0L && c == 0.0 })
    assert(got(2L)._1 === 2L)
  }

  test("direction, multi-edges and self-loops collapse: the triangle " +
      "is counted once") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    val got = tri(messy)
    assert(got === Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)), 3L -> ((2L, 1L, 1.0))))
  }

  test("triangle counts match a brute-force reference on a " +
      "deterministic pseudo-random graph") {
    // the same mixing shape as the gate entry: three correlated edge
    // families plant triangles; mod keeps the vertex set bounded
    val edges = (0L until 300L).flatMap { d =>
      val a = d % 29; val b = (d * 7 + 3) % 29; val c = (d * 13 + 5) % 29
      Seq((a, b), (a, c), (b, c))
    }
    val und = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (x, y) => x != y }.distinct
    val adj = und.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val expected = nodes.map { v =>
      val nb = adj(v).toSeq
      val t = (for {
        i <- nb.indices; j <- (i + 1) until nb.length
        if adj(nb(i)).contains(nb(j))
      } yield 1).size.toLong
      v -> ((adj(v).size.toLong, t))
    }.toMap
    val got = tri(edges)
    assert(got.view.mapValues(x => (x._1, x._2)).toMap === expected)
    // sanity: the fixture actually has triangles
    assert(got.values.map(_._2).sum > 0L)
  }

  test("connectedComponents: min-id labels, sizes, isolated vertices " +
      "as singletons, partitioning-proof") {
    // components: {1,2,3,5} (3-5 via 2), {10,11}, isolated {20}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 5L), (10L, 11L))
      .toDF("s", "d")
    val verts = Seq(1L, 2L, 3L, 5L, 10L, 11L, 20L).toDF("v")
    val out = Graphs.connectedComponents(edges, col("s"), col("d"),
      Some(verts)).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("component_size"))))
      .toMap
    assert(out === Map(
      1L -> ((1L, 4L)), 2L -> ((1L, 4L)), 3L -> ((1L, 4L)),
      5L -> ((1L, 4L)),
      10L -> ((10L, 2L)), 11L -> ((10L, 2L)),
      20L -> ((20L, 1L))))
    // a long path exercises pointer jumping past naive propagation
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("s", "d")
    val labs = Graphs.connectedComponents(path.repartition(7), col("s"),
      col("d")).collect()
    assert(labs.forall(_.getAs[Long]("component") === 0L))
    assert(labs.forall(_.getAs[Long]("component_size") === 41L))
  }

  test("kCore: peels cascading tails to the exact core; empty core " +
      "when nothing survives; partitioning-independent") {
    val spark2 = spark
    import spark2.implicits._
    // triangle {1,2,3} + a pendant path 3-4-5 that peels in CASCADE
    // (5 goes first, then 4), + an isolated edge 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("s", "d")
    val core2 = Graphs.kCore(edges, col("s"), col("d"), k = 2)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("core_degree")).toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: the triangle's vertices only have degree 2 — empty core
    assert(Graphs.kCore(edges, col("s"), col("d"), k = 3).count() === 0)
    // duplicate/reversed edges and repartitioning change nothing
    val noisy = edges.unionAll(edges.select(col("d"), col("s")))
      .repartition(5)
    val again = Graphs.kCore(noisy, col("s"), col("d"), k = 2)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("core_degree")).toMap
    assert(again === core2)
    // hitting maxRounds before the fixpoint fails loud — a cascading
    // path needs one round per pendant layer
    val longPath = (0L until 12L).map(i => (i, i + 1)).toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Graphs.kCore(longPath, col("s"), col("d"), k = 2, maxRounds = 2)
    }
    assert(ex.getMessage.contains("fixpoint"))
  }
}
