package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Join-reduction operators — shrink what a big join SHUFFLES before
  * the join runs.
  *
  * At 100 TB the dominant cost of `fact ⋈ dim` is hashing every fact
  * row across the network; when the join is selective (most fact rows
  * match nothing), almost all of that traffic is wasted. A Bloom filter
  * built over the dim keys is a few MB–GB of broadcast state that
  * rejects the non-matching fact rows AT THE SCAN, before the exchange
  * — the classic semi-join reduction (Bloom 1970; the same mechanism
  * Spark's own `InjectRuntimeFilter` rule applies when it fires, made
  * explicit and deterministic here so a pipeline can rely on it).
  *
  * Exactness does not depend on the filter: Bloom false positives
  * survive the pre-filter but are removed by the exact semi-join that
  * follows, so the operator's OUTPUT is identical for any
  * (expectedItems, fpp) — only the shuffled row count changes. That is
  * what makes it safely tunable at scale: undersize the filter and the
  * job gets slower, never wrong ([[JoinReductionSpec]] pins this with a
  * deliberately saturated 50%-fpp filter).
  */
object Joins {

  /** Broadcastable Bloom side-state over the dim side's join keys.
    * `expectedItems`/`fpp` size the bit array (n·ln p⁻¹/ln²2 bits —
    * 10⁹ keys at 1% ≈ 1.2 GiB, the caller's broadcast budget); the
    * build is one aggregation over dim, merged tree-wise, only the bit
    * array reaches the driver. */
  def keyBloom(dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double): BloomFilter =
    dim.select(col(dimKey)).where(col(dimKey).isNotNull)
      .stat.bloomFilter(dimKey, expectedItems, fpp)

  /** The reduction alone: fact rows whose key MIGHT be in `bloom` — a
    * superset of the true semi-join (false positives pass, nulls and
    * true negatives never do). One broadcast + one scan-side filter;
    * composes with any downstream join/agg that finishes the exact
    * work. Long keys probe via `mightContainLong`, strings via
    * `mightContainString` — both one murmur hash pair per row. */
  def bloomReduce(fact: DataFrame, factKey: String,
      bloom: BloomFilter): DataFrame = {
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    import org.apache.spark.sql.types._
    val probe = fact.schema(factKey).dataType match {
      case StringType =>
        val f = udf((k: String) => k != null && bc.value.mightContainString(k))
        f(col(factKey))
      case ByteType | ShortType | IntegerType | LongType =>
        val f = udf((k: java.lang.Long) =>
          k != null && bc.value.mightContainLong(k))
        f(col(factKey).cast("long"))
      case other => throw new IllegalArgumentException(
        s"bloomReduce: integral or string key required, got $other")
    }
    fact.where(probe)
  }

  /** Exact semi-join with Bloom pre-reduction: `fact` rows whose
    * `factKey` appears in `dim.dimKey`. Identical output to a plain
    * `LEFT SEMI` join; the Bloom stage only cuts what the semi-join's
    * exchange has to move. The post-filter semi-join shuffles the
    * SURVIVING fact rows against the distinct dim keys (AQE broadcasts
    * that side when it is small enough). */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val reduced = bloomReduce(fact, factKey,
      keyBloom(dim, dimKey, expectedItems, fpp))
    reduced.join(dim.select(col(dimKey).as("__dk")).distinct(),
      col(factKey) === col("__dk"), "left_semi")
  }
}
