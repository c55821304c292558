package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-export sink: lay the curated corpus out in a deterministic
  * global order and write it as N contiguous shards — the hand-off
  * format a trainer's data loader expects (shard k holds global
  * positions [k·size, (k+1)·size), so sequential readers see the same
  * curriculum on every run, with no cross-shard interleaving).
  *
  * Scale shape: the global position comes from the range-sort +
  * broadcast-prefix pass ([[Packing.withGlobalPrefix]] — no one-task
  * window); shard assignment is the same closed-form ntile expression
  * as [[Sampling.curriculumBins]]; the write clusters by shard id, so
  * each output file holds exactly one contiguous shard. */
object Export {

  /** Assign every row a global position (by `order`) and an ntile-style
    * shard id in [0, nShards), then write `format` (json/parquet/csv)
    * partitioned by `shard` under `path`. Returns the sharded frame
    * (shard, pos, payload columns) for inspection. */
  def shardedExport(df: DataFrame, order: Column, nShards: Int,
      path: String, format: String = "json"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val (idxed, _, total) = Packing.withGlobalPrefixTotals(df, order,
      lit(0L), offsetName = "__off", idxName = "pos")
    val q = total / nShards
    val r = total % nShards
    val qSafe = math.max(q, 1L)
    val idx = col("pos")
    val shard = when(idx < lit((q + 1) * r),
        floor(idx / lit(q + 1)).cast("long"))
      .otherwise(lit(r) +
        floor((idx - lit((q + 1) * r)) / lit(qSafe)).cast("long"))
    val sharded = idxed.drop("__off").withColumn("shard", shard)
    sharded
      .repartition(math.max(1, math.min(nShards, 2048)), col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .format(format)
      .save(path)
    sharded
  }

  /** Engine-portable 60-bit row fingerprint over the payload columns
    * (the md5-hex convention) — the unit [[manifest]] checksums. */
  def portableRowHash(cols: Column*): Column =
    conv(substring(md5(concat_ws("|", cols.map(_.cast("string")): _*)),
      1, 15), 16, 10).cast("long")

  /** Per-shard export manifest: row count, position range, a
    * contiguity flag, and an ORDER-INDEPENDENT content checksum (XOR
    * of per-row fingerprints — commutative, so any read order, retry,
    * or partitioning reproduces it; the trade-off is that duplicate
    * row PAIRS cancel, which the count column catches). This is the
    * reproducibility contract of a 100 TB export: a loader (or a
    * re-run) recomputes the manifest from the files and compares —
    * byte-identical data, no full-sort diff required. One map-side
    * combined aggregation; the shuffle carries one row per shard. */
  def manifest(sharded: DataFrame, payloadCols: Seq[Column]): DataFrame =
    sharded.withColumn("__h", portableRowHash(payloadCols: _*))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"),
        expr("bit_xor(__h)").as("checksum"))
      .withColumn("contiguous",
        col("last_pos") - col("first_pos") + 1L === col("n_rows"))
      .select(col("shard"), col("n_rows"), col("first_pos"),
        col("last_pos"), col("contiguous"), col("checksum"))
}
