package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation — PageRank over a weighted
  * edge table (domain/source authority for crawl prioritization and
  * quality weighting; the companion of Dedup.duplicateClusters'
  * connected components, which covers the unweighted reachability
  * case).
  *
  * Scale shape: the rank vector and the edge table stay distributed
  * end-to-end. Each power iteration is one equi-join (edge src →
  * rank), one dst-keyed aggregation with map-side combine, and a
  * broadcast of TWO driver-free scalars (node count, dangling mass) via
  * a 1-row crossJoin — no rank vector ever reaches the driver. Rank
  * state is lineage-truncated per iteration (localCheckpoint), the same
  * discipline as the label-propagation and BPE loops.
  */
object Graphs {

  /** Weighted PageRank, fixed iteration count. `edges` rows are
    * (src, dst, w); multi-edges are aggregated. Nodes = src ∪ dst;
    * dangling nodes (no out-edges) redistribute their mass uniformly.
    * Returns (node, rank) with ranks rounded to `roundTo` decimals at
    * every iteration end — the cross-engine float discipline that makes
    * a fixed-iteration run bit-reproducible on any engine and any
    * partitioning (per-node in-sums are tiny relative to a 1e-`roundTo`
    * grid, so association order cannot flip the rounding).
    */
  def pageRank(edges: DataFrame, src: Column, dst: Column, w: Column,
      iterations: Int, damping: Double = 0.85, roundTo: Int = 9)
      : DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.groupBy(src.as("src"), dst.as("dst"))
      .agg(sum(w.cast("double")).as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))

    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), round(lit(1.0) / col("n"), roundTo).as("r"))
      .localCheckpoint(true)

    for (_ <- 1 to iterations) {
      val incoming = e.join(outW, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w") / col("ow") * col("r")).as("inc"))
      val dangling = ranks.join(outW.select(col("src").as("node")),
          Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      val next = nodes
        .join(incoming, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nDf))
        .select(col("node"), round(
          lit(1.0 - damping) / col("n") +
            lit(damping) * (coalesce(col("inc"), lit(0.0)) +
              col("dm") / col("n")),
          roundTo).as("r"))
        .localCheckpoint(true)
      // release through the checkpoint RDD — Dataset.unpersist is a
      // no-op for checkpoint blocks (graft.util.Lineage)
      graft.util.Lineage.release(ranks)
      ranks = next
    }
    // the returned ranks frame is a localCheckpoint — self-contained,
    // so the edge/node working sets can be released (a standing session
    // calling pageRank repeatedly must not accumulate checkpoint blocks)
    graft.util.Lineage.release(e)
    graft.util.Lineage.release(nodes)
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Convergence-stopped PageRank: iterate until the max per-node rank
    * change is ≤ `eps`, failing LOUDLY past `maxIter` (the kCore
    * discipline — an unconverged exit would silently return a
    * mid-mixing vector; the caller raises maxIter for slow-mixing
    * graphs instead of trusting it blind). The fixed-iteration
    * [[pageRank]] over- or under-iterates a 100 TB graph whose mixing
    * time nobody measured; this variant spends exactly the iterations
    * the graph needs. Returns (node, rank, n_iter) — n_iter is the
    * number of updates performed, identical on any engine because each
    * iteration's ranks round to `roundTo` (the diff sequence, hence
    * the stopping decision `md > eps`, is bit-reproducible; the
    * `graph_pagerank_conv` oracle iterates a recursive CTE under the
    * SAME epsilon and must stop at the same iteration). Per-iteration
    * cost = one [[pageRank]] iteration + one broadcast-join diff
    * aggregate (a scalar to the driver — the loop is driver-steered
    * like every iterative operator here). */
  def pageRankConverged(edges: DataFrame, src: Column, dst: Column,
      w: Column, eps: Double, maxIter: Int, damping: Double = 0.85,
      roundTo: Int = 9): DataFrame = {
    require(eps > 0, s"eps must be > 0, got $eps")
    require(maxIter >= 1, "need at least one iteration")
    val e = edges.groupBy(src.as("src"), dst.as("dst"))
      .agg(sum(w.cast("double")).as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))

    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), round(lit(1.0) / col("n"), roundTo).as("r"))
      .localCheckpoint(true)
    var converged = false
    var iters = 0
    // the fail-loud path must not leak the eager checkpoints: e/nodes
    // release on every exit, the standing ranks frame only when it is
    // NOT being returned (non-convergence or a mid-loop failure)
    try {
      while (!converged && iters < maxIter) {
      val incoming = e.join(outW, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w") / col("ow") * col("r")).as("inc"))
      val dangling = ranks.join(outW.select(col("src").as("node")),
          Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      val next = nodes
        .join(incoming, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nDf))
        .select(col("node"), round(
          lit(1.0 - damping) / col("n") +
            lit(damping) * (coalesce(col("inc"), lit(0.0)) +
              col("dm") / col("n")),
          roundTo).as("r"))
        .localCheckpoint(true)
        val md = next.join(ranks.withColumnRenamed("r", "r0"), "node")
          .agg(max(abs(col("r") - col("r0")))).head.getDouble(0)
        graft.util.Lineage.release(ranks)
        ranks = next
        iters += 1
        converged = md <= eps
      }
      require(converged,
        s"pageRank did not converge to eps=$eps within $maxIter " +
          s"iterations — raise maxIter or relax eps")
    } finally {
      graft.util.Lineage.release(e)
      graft.util.Lineage.release(nodes)
      if (!converged) graft.util.Lineage.release(ranks)
    }
    ranks.select(col("node"), col("r").as("rank"),
      lit(iters.toLong).as("n_iter"))
  }

  /** Per-vertex triangle counts + local clustering coefficient over an
    * undirected simple graph (self-loops dropped, multi-edges and
    * direction collapsed). Output: (node, degree, triangles, coeff)
    * with coeff = 2·t / (deg·(deg−1)) rounded to 6 (0 when deg < 2) —
    * every input to the one division is an exact integer, so the
    * result is engine-portable.
    *
    * Scale shape — the degree-ordered orientation trick: each edge is
    * directed from its (degree, id)-smaller endpoint to the larger, so
    * every out-neighborhood has size O(√m) regardless of how skewed
    * the degree distribution is (a celebrity vertex with 10⁸ neighbors
    * contributes NO wedges from its own fan-out — its edges all point
    * INTO it from smaller vertices). Wedge generation is one self-join
    * on the oriented source (bounded fan-out), closing is one hash
    * join against the oriented edge set, and each triangle appears
    * exactly once. Everything is key-hash shuffles over (edge, wedge)
    * tables; no vertex neighborhood is ever collected to one task. */
  def triangleCounts(edges: DataFrame, src: Column, dst: Column)
      : DataFrame = {
    val und = edges
      .select(least(src, dst).as("u"), greatest(src, dst).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
      .distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // total order for orientation: (degree, node) lexicographic —
    // struct comparison gives it directly
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("a"), col("v").as("b"),
          struct(col("dv").as("d"), col("v").as("n")).as("kb")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"),
          struct(col("du").as("d"), col("u").as("n")).as("kb")))
        .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), col("e.kb").as("kb"))
    // wedges (a; b ≺ c) from a's out-neighborhood, closed by the
    // oriented edge (b → c) — b ≺ c in the SAME total order, so the
    // closing edge's orientation is determined
    val wedges = oriented.select(col("a"), col("b"), col("kb").as("kb1"))
      .join(oriented.select(col("a").as("a2"), col("b").as("c"),
        col("kb").as("kb2")),
        col("a") === col("a2") && col("kb1") < col("kb2"))
      .select(col("a"), col("b"), col("c"))
    val tris = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    val perVertex = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("t"))
    deg.join(perVertex, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        round(when(col("degree") >= 2L,
          lit(2.0) * coalesce(col("t"), lit(0L)) /
            (col("degree") * (col("degree") - 1L))).otherwise(0d), 6)
          .as("coeff"))
  }

  /** Connected components of an undirected edge list: every vertex
    * labelled with the MINIMUM vertex id reachable from it — plus the
    * component size. The general-graph form of the label-propagation +
    * pointer-jumping loop the dedup clusters run on
    * ([[Dedup.connectedComponents]]): O(log diameter) rounds, each one
    * neighbor join + one min aggregation, round state eagerly
    * checkpointed so the lineage never grows. Isolated vertices (in
    * `vertices` but no edge) are their own singleton component.
    * Returns (node, component, component_size). */
  def connectedComponents(edges: DataFrame, src: Column, dst: Column,
      vertices: Option[DataFrame] = None): DataFrame = {
    val pairs = edges.select(src.cast("long").as("id_a"),
      dst.cast("long").as("id_b"))
    val labelled = Dedup.connectedComponents(pairs)
      .select(col("id").as("node"), col("lbl").as("component"))
    val withIsolated = vertices match {
      case None => labelled
      case Some(v) =>
        val all = v.select(col(v.columns.head).cast("long").as("node"))
        all.join(labelled, Seq("node"), "left_outer")
          .select(col("node"),
            coalesce(col("component"), col("node")).as("component"))
    }
    val sizes = withIsolated.groupBy("component")
      .agg(count(lit(1)).as("component_size"))
    withIsolated.join(sizes, Seq("component"))
      .select("node", "component", "component_size")
  }

  /** k-core decomposition membership: the maximal subgraph in which
    * every vertex keeps degree ≥ k, found by iterative peeling —
    * remove all vertices of degree < k, recompute degrees, repeat to
    * the fixpoint. The standard density filter before community /
    * influence analysis on a web-scale graph (peels the long tail of
    * leaf vertices, which is most of it). Returns the surviving
    * (node, core_degree) rows — core_degree is the degree WITHIN the
    * core, ≥ k by construction.
    *
    * The fixpoint is unique (independent of peel order), so the result
    * is engine-portable even though the round COUNT is data-dependent
    * — the oracle replays it as a recursive fixpoint, not round by
    * round. Each round: one map-side-combined degree aggregation + one
    * semi-join of edges against surviving vertices — O(|E|) per round,
    * O(peel depth) rounds, round state eagerly checkpointed and the
    * superseded generation released ([[graft.util.Lineage]]); the
    * driver sees one count per round. */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
      maxRounds: Int = 100): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var und = edges
      .select(least(src, dst).cast("long").as("u"),
        greatest(src, dst).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
      .distinct()
      .localCheckpoint(true)
    var round = 0
    var stable = false
    // edge count carried across rounds: this round's surviving count
    // IS next round's starting count — recounting `und` paid a whole
    // extra job per round for a number already in hand
    var nUnd = und.count()
    while (!stable && round < maxRounds) {
      val deg = und.select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select("node")
      val next = und
        .join(keep.toDF("u"), Seq("u"), "left_semi")
        .join(keep.toDF("v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(true)
      val nNext = next.count()
      val removed = nUnd - nNext
      nUnd = nNext
      graft.util.Lineage.release(und)
      und = next
      stable = removed == 0
      round += 1
    }
    // an unconverged exit would silently return a SUPERSET of the
    // core (nodes the next rounds would have peeled) — fail loud; the
    // caller raises maxRounds for pathological peel depths (a path
    // graph peels from the ends, O(n/2) rounds; web/social graphs
    // peel in tens)
    require(stable,
      s"kCore did not reach the fixpoint within $maxRounds rounds")
    // the returned frame reads the final round's checkpoint blocks —
    // the same convention as connectedComponents (a standing session
    // releases them via Lineage once the result is consumed)
    und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
  }

  /** Multi-source BFS: the unweighted shortest-path distance from the
    * nearest seed to every reachable vertex — the crawl-frontier /
    * link-distance primitive (e.g. "hops from a trusted seed set" as a
    * quality prior). `seeds` is a one-column vertex table; edges are
    * treated as undirected. Returns (node, dist), seeds at dist 0;
    * unreachable vertices are absent.
    *
    * Frontier iteration: round d joins the CURRENT frontier against
    * the adjacency (one key-hash shuffle), anti-joins already-visited
    * vertices, and folds survivors into the visited set — each edge is
    * expanded at most twice over the whole run, so total work is
    * O(|E|) + O(diameter) rounds, NOT O(|E| · rounds). Round state is
    * eagerly checkpointed and the superseded generation released (the
    * [[kCore]] discipline); the driver sees one frontier count per
    * round. The result is the unique distance fixpoint, independent of
    * execution order — engine-portable, oracled by a recursive CTE. */
  def bfsDistances(edges: DataFrame, src: Column, dst: Column,
      seeds: DataFrame, maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val adj = edges
      .select(src.cast("long").as("a"), dst.cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .unionAll(edges.select(dst.cast("long").as("a"),
          src.cast("long").as("b"))
        .where(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b")))
      .distinct()
      .localCheckpoint(true)
    // Round state is ONE frame (node, dist, __new) with the frontier
    // tagged in-band: each round folds the discovered set into the
    // visited table with a single full-outer join and pays ONE eager
    // checkpoint + ONE count, where the two-frame formulation paid two
    // checkpoints (frontier, visited-union) and an extra anti-join —
    // at micro-batch scale the saved actions are whole scheduling
    // floors, at cluster scale a shuffle per round. The frontier view
    // is lazy over the round's checkpoint (no separate pin).
    var visited = seeds
      .select(col(seeds.columns.head).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .withColumn("__new", lit(true))
      .localCheckpoint(true)
    var depth = 0
    var exhausted = false
    while (!exhausted && depth < maxDepth) {
      val discovered = visited.where(col("__new"))
        .select(col("node").as("a"))
        .join(adj, "a")
        .select(col("b").as("node")).distinct()
        .withColumn("__d", lit(depth + 1L))
      val nextVisited = visited.select(col("node"), col("dist"))
        .join(discovered, Seq("node"), "full_outer")
        .select(col("node"),
          coalesce(col("dist"), col("__d")).as("dist"),
          col("dist").isNull.as("__new"))
        .localCheckpoint(true)
      val grew = nextVisited.where(col("__new")).count()
      graft.util.Lineage.release(visited)
      visited = nextVisited
      depth += 1
      exhausted = grew == 0L
    }
    // an un-exhausted exit would return dist values that LOOK final
    // but are truncated at maxDepth — fail loud, same rule as kCore
    // (conservative: a graph whose last discovery round lands exactly
    // on maxDepth also fails — raise maxDepth rather than guess)
    require(exhausted,
      s"bfsDistances frontier still live after $maxDepth rounds")
    graft.util.Lineage.release(adj)
    visited.select(col("node"), col("dist"))
  }

  /** Single/multi-source WEIGHTED shortest paths (non-negative integer
    * edge weights) — the link-cost generalization of [[bfsDistances]].
    * Distributed Bellman–Ford to the fixpoint: each round relaxes every
    * edge out of the vertices whose distance IMPROVED last round (delta
    * frontier, not the whole dist table), one equi-join + one min
    * aggregation; integer dists make every relaxation exact, so the
    * fixpoint is unique and engine-portable. Rounds ≤ longest
    * shortest-path hop count; round state eagerly checkpointed and
    * released; fail-loud when `maxRounds` truncates live improvements.
    * Returns (node, dist); unreachable vertices absent; edges are
    * DIRECTED (union the reverse for an undirected read). */
  def sssp(edges: DataFrame, src: Column, dst: Column, w: Column,
      seeds: DataFrame, maxRounds: Int = 64): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val adj = edges
      .select(src.cast("long").as("a"), dst.cast("long").as("b"),
        w.cast("long").as("w"))
      .where(col("a").isNotNull && col("b").isNotNull &&
        col("w").isNotNull)
      .localCheckpoint(true)
    val negs = adj.where(col("w") < 0L).count()
    require(negs == 0L, s"sssp needs non-negative weights, $negs negative")
    // Same in-band delta-frontier shape as [[bfsDistances]]: one frame
    // (node, dist, __imp) per round, ONE full-outer join folding the
    // relaxation into the dist table, ONE checkpoint + ONE count —
    // the two-frame version paid two checkpoints and two extra joins
    // (left_outer diff + left_anti merge) per round. The delta view is
    // lazy over the round's checkpoint.
    var dist = seeds
      .select(col(seeds.columns.head).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .withColumn("__imp", lit(true))
      .localCheckpoint(true)
    var round = 0
    var settled = false
    while (!settled && round < maxRounds) {
      val relaxed = dist.where(col("__imp"))
        .select(col("node").as("a"), col("dist"))
        .join(adj, "a")
        .groupBy(col("b").as("node"))
        .agg(min(col("dist") + col("w")).as("cand"))
      val better = col("dist").isNull ||
        (col("cand").isNotNull && col("cand") < col("dist"))
      val nextDist = dist.select(col("node"), col("dist"))
        .join(relaxed, Seq("node"), "full_outer")
        .select(col("node"),
          when(better, col("cand")).otherwise(col("dist")).as("dist"),
          better.as("__imp"))
        .localCheckpoint(true)
      val n = nextDist.where(col("__imp")).count()
      graft.util.Lineage.release(dist)
      dist = nextDist
      settled = n == 0L
      round += 1
    }
    require(settled,
      s"sssp still improving after $maxRounds rounds")
    graft.util.Lineage.release(adj)
    dist.select(col("node"), col("dist"))
  }
}
