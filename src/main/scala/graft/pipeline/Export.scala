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
}
