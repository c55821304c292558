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
}
