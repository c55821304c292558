package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the incremental-statistics layer a
  * standing 100 TB corpus needs: per-group HyperLogLog sketches for
  * distinct counts and KLL sketches for rank/quantile queries, stored
  * as binary columns that MERGE associatively. New data updates a
  * sketch table by unioning batch sketches — no rescan of history, and
  * a year of daily sketches folds into a yearly answer in one
  * aggregation. (Built on Spark's Apache DataSketches builtins —
  * hll_sketch_agg / hll_union_agg / kll_* — so the sketch layout is the
  * open cross-engine DataSketches format, portable to any reader.)
  *
  * HLL REGISTERS are deterministic for a given input multiset (hashing
  * is seed-fixed, union takes register maxima, so the register state of
  * sketch(A) ∪ sketch(B) ≡ sketch(A ⊎ B) exactly) — but the ESTIMATE
  * read from those registers is not partition-stable past coupon/exact
  * mode: DataSketches uses the HIP estimator for a sketch that was
  * only streamed into and the composite estimator once any merge has
  * occurred, so a streamed one-shot sketch and the union of partials
  * can report ~1%-different numbers over identical data (measured:
  * 1499 vs 1488 on 1500 true distinct). Consumers — and the oracles —
  * must therefore assert the ERROR BOUND (±5 % at lgK=12), never
  * estimate equality. KLL compaction is likewise input-ORDER-sensitive;
  * its ε-rank bound holds regardless — check the bound, not the bits.
  */
object Sketches {

  /** Per-group HLL sketch of `value` — the standing distinct-count
    * sketch table. One shuffle with map-side partial sketches (the
    * aggregation buffer IS a sketch, so the shuffle moves one
    * ~2^lgK-register blob per (partition, group), never raw values). */
  def distinctSketch(df: DataFrame, group: Seq[Column], value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(group: _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("hll_sketch"))

  /** Fold sketch tables (e.g. daily batches) into one sketch per
    * group: associative register-max union — no raw data touched. */
  def unionDistinctSketches(sketches: DataFrame, group: Seq[Column],
      sketch: Column = col("hll_sketch")): DataFrame =
    sketches.groupBy(group: _*)
      .agg(hll_union_agg(sketch).as("hll_sketch"))

  /** Distinct-count estimates from a sketch table. */
  def distinctEstimate(sketches: DataFrame, group: Seq[Column],
      sketch: Column = col("hll_sketch")): DataFrame =
    sketches.select(group :+
      hll_sketch_estimate(sketch).as("distinct_est"): _*)

  /** Per-group KLL quantile sketch of a double `value` — the standing
    * length/quality-distribution table (the per-source token-length
    * profile every mixing decision reads). Same partial-merge shape as
    * [[distinctSketch]]. */
  def quantileSketch(df: DataFrame, group: Seq[Column], value: Column,
      k: Int = 200): DataFrame =
    df.groupBy(group: _*)
      .agg(kll_sketch_agg_double(value, lit(k)).as("kll_sketch"))

  /** Merge KLL sketch tables per group (incremental batches → one
    * standing distribution). */
  def mergeQuantileSketches(sketches: DataFrame, group: Seq[Column],
      sketch: Column = col("kll_sketch")): DataFrame =
    sketches.groupBy(group: _*)
      .agg(kll_merge_agg_double(sketch).as("kll_sketch"))

  /** Quantile estimates at the given probabilities from a KLL sketch
    * table: one output column per requested p (`q_50`, `q_90`, ...). */
  def quantileEstimate(sketches: DataFrame, group: Seq[Column],
      ps: Seq[Double], sketch: Column = col("kll_sketch")): DataFrame =
    sketches.select(
      group ++ ps.map(p =>
        kll_sketch_get_quantile_double(sketch, lit(p))
          .as(s"q_${(p * 100).round}")): _*)

  // ---- count-min frequency sketches -----------------------------------

  /** Per-group count-min sketch of `value` (long) — the standing
    * frequency table for point "how often did key X appear" queries
    * with an `est ∈ [true, true + ε·N]` guarantee. Same partial-merge
    * aggregation shape as the HLL path. The seed is FIXED so sketches
    * built anywhere merge counter-for-counter. */
  def freqSketch(df: DataFrame, group: Seq[Column], value: Column,
      eps: Double = 1e-3, confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    df.groupBy(group: _*)
      .agg(count_min_sketch(value, lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Counter-wise merge of count-min sketches (exact: CMS addition is
    * associative), as a typed Aggregator over the serialized form —
    * Spark ships the CMS aggregate but no merge aggregate, so this
    * supplies the incremental-batch fold. */
  private class CmsMerge
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Byte], Array[Byte], Array[Byte]] {
    import org.apache.spark.util.sketch.CountMinSketch
    import java.io.ByteArrayInputStream
    private def toCms(b: Array[Byte]) =
      CountMinSketch.readFrom(new ByteArrayInputStream(b))
    private def toBytes(c: CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      c.writeTo(bos); bos.toByteArray
    }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      merge(b, a)
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x.isEmpty) y else if (y.isEmpty) x
      else toBytes(toCms(x).mergeInPlace(toCms(y)))
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  /** Fold CMS sketch tables per group (daily batches → standing
    * frequency sketch); merged counters are bit-identical to a one-shot
    * sketch over the union (spec'd). */
  def mergeFreqSketches(sketches: DataFrame, group: Seq[Column],
      sketch: Column = col("cms")): DataFrame =
    sketches.groupBy(group: _*)
      .agg(udaf(new CmsMerge, org.apache.spark.sql.Encoders.BINARY)
        .apply(sketch).as("cms"))

  // ---- combined sketch tables (the standing-statistics row) ------------

  /** Per-group combined sketch row — HLL distinct + KLL quantile + CMS
    * frequency of a numeric `value` in ONE aggregation pass (one
    * shuffle moving three sketch blobs per (partition, group)). The
    * standing statistics table a streaming fold maintains. */
  def sketchTable(df: DataFrame, group: Seq[Column], value: Column,
      lgK: Int = 12, kllK: Int = 200, eps: Double = 1e-3,
      confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(group: _*)
      .agg(
        hll_sketch_agg(value, lit(lgK)).as("hll_sketch"),
        kll_sketch_agg_double(value.cast("double"), lit(kllK))
          .as("kll_sketch"),
        count_min_sketch(value.cast("long"), lit(eps), lit(confidence),
          lit(seed)).as("cms"))

  /** Fold combined sketch tables per group (micro-batches / daily
    * partitions → one standing row): HLL register-max union, KLL
    * compaction merge, CMS counter addition — all associative, so the
    * fold order never changes the registers (estimates obey each
    * sketch's documented mode/bound semantics, see the class doc). */
  def mergeSketchTables(sketches: DataFrame, group: Seq[Column])
      : DataFrame =
    sketches.groupBy(group: _*)
      .agg(
        hll_union_agg(col("hll_sketch")).as("hll_sketch"),
        kll_merge_agg_double(col("kll_sketch")).as("kll_sketch"),
        udaf(new CmsMerge, org.apache.spark.sql.Encoders.BINARY)
          .apply(col("cms")).as("cms"))

  /** Point-frequency estimate of a long item from a CMS column.
    * Deserializes per row — right for estimate tables (sketches ×
    * probe items); for bulk per-row probing deserialize once per
    * partition instead. */
  def freqEstimate(sketch: Column, item: Column): Column = {
    val f = udf((b: Array[Byte], v: Long) =>
      if (b == null || b.isEmpty) 0L
      else org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)).estimateCount(v))
    f(sketch, item)
  }
}
