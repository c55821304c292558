package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-batch preparation: turn a corpus of
  * variable-length documents into fixed-token-budget sequences.
  *
  * Two policies:
  *  - `packConcat`: the standard pretraining shape — concatenate all
  *    documents in a deterministic order into one token stream and cut
  *    it every `budget` tokens; documents may straddle a cut. Exact,
  *    order-stable, SQL-expressible (the oracle recomputes it).
  *  - `packFirstFit`: whole-document bin packing (no doc ever split) —
  *    first-fit-decreasing within deterministic range partitions; for
  *    instruction-tuning-style corpora where sequences must not cross
  *    document boundaries.
  *
  * Scale shape: the global token offset is an exact exclusive prefix
  * sum WITHOUT a single-partition window. Rows are range-partitioned
  * and sorted by id; phase 1 ships one subtotal per partition to the
  * driver (P longs); phase 2 rescans with each partition's prefix
  * offset broadcast, so the running sum stays partition-local and a
  * 100 TB corpus still parallelizes. The straddle expansion is a
  * per-row `explode(sequence(first_seq, last_seq))` — pure codegen'd
  * column arithmetic, no join.
  */
object Packing {

  /** Exact global exclusive prefix sum of `valueCol` in `orderCol`
    * order, plus a global row index, without a global-window sort:
    * adds `offsetName` (sum of values of all strictly-earlier rows)
    * and `idxName` (0-based rank) to `df`.
    *
    * The range-sorted input is localCheckpoint-pinned so the subtotal
    * pass and the rescan see identical partitioning. */
  def withGlobalPrefix(df: DataFrame, orderCol: Column, valueCol: Column,
      offsetName: String = "offset", idxName: String = "idx")
      : DataFrame =
    withGlobalPrefixTotals(df, orderCol, valueCol, offsetName, idxName)._1

  /** As [[withGlobalPrefix]], also returning (totalValue, totalRows) —
    * the prefix pass computes both already, so callers that need the
    * total (ntile binning, sharding) skip a second full scan. */
  def withGlobalPrefixTotals(df: DataFrame, orderCol: Column,
      valueCol: Column, offsetName: String = "offset",
      idxName: String = "idx"): (DataFrame, Long, Long) = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(orderCol)
      .sortWithinPartitions(orderCol)
      .localCheckpoint() // pin rows to partitions across the two passes
    val subtotals = sorted
      .groupBy(spark_partition_id().as("__p"))
      .agg(sum(col("__v")).as("__sum"), count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // single driver scan: O(P log P), stays cheap at 100k partitions
    val prefix = Map.newBuilder[Int, (Long, Long)]
    var (accV, accN) = (0L, 0L)
    subtotals.foreach { case (p, v, n) =>
      prefix += p -> (accV, accN); accV += v; accN += n
    }
    val prefixMap = prefix.result()
    val bPrefix = spark.sparkContext.broadcast(prefixMap)
    val schema = sorted.schema
      .add(offsetName, LongType, nullable = false)
      .add(idxName, LongType, nullable = false)
    val rows = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var (off, idx) = bPrefix.value.getOrElse(pid, (0L, 0L))
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ off :+ idx)
        off += r.getAs[Long]("__v"); idx += 1L
        out
      }
    }
    (spark.createDataFrame(rows, schema).drop("__v"), accV, accN)
  }

  /** Concat-and-chunk packing: documents are laid out in `idCol` order
    * into one virtual token stream cut every `budget` tokens. Emits one
    * row per (sequence × document-slice):
    * (seq_id, id, tok_start, tok_end, seq_off) where [tok_start,
    * tok_end) is the 0-based token slice of THIS doc placed at
    * `seq_off` within sequence `seq_id`. Zero-token docs are dropped
    * (they occupy no stream positions). */
  def packConcat(df: DataFrame, idCol: Column, textCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = df.select(idCol.as("id"),
        TextAnalysis.tokenCount(textCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    val withOff = withGlobalPrefix(base, col("id"), col("n_tokens"))
    val b = lit(budget)
    withOff
      .withColumn("seq_id", explode(sequence(
        (col("offset") / b).cast("long"),
        ((col("offset") + col("n_tokens") - 1) / b).cast("long"))))
      .select(
        col("seq_id"),
        col("id"),
        greatest(lit(0L), col("seq_id") * b - col("offset"))
          .as("tok_start"),
        least(col("n_tokens"), (col("seq_id") + 1) * b - col("offset"))
          .as("tok_end"),
        greatest(lit(0L), col("offset") - col("seq_id") * b)
          .as("seq_off"))
  }

  /** Whole-document first-fit-decreasing bin packing: no document is
    * split across sequences; documents longer than `budget` are
    * REJECTED to the overflow output (filter them first or raise the
    * budget). Emits (bin_id, id, n_tokens, bin_fill) — `bin_fill` the
    * bin's total AFTER this doc.
    *
    * Bins are partition-local (bin_id = partition * 2^40 + local bin) —
    * FFD is inherently sequential, so exact global FFD would funnel the
    * corpus through one task. Documents are range-partitioned by
    * descending token count, so each partition packs a near-uniform
    * size band and the packing quality matches global FFD's
    * 11/9·OPT+O(1) bound in aggregate. Deterministic for a fixed
    * partition count. */
  def packFirstFit(df: DataFrame, idCol: Column, textCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = df.select(idCol.as("id"),
        TextAnalysis.tokenCount(textCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0 && col("n_tokens") <= budget)
      .repartitionByRange(col("n_tokens").desc, col("id"))
      .sortWithinPartitions(col("n_tokens").desc, col("id"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bin_id", LongType, false),
      org.apache.spark.sql.types.StructField("id",
        base.schema("id").dataType, true),
      org.apache.spark.sql.types.StructField("n_tokens", LongType, false),
      org.apache.spark.sql.types.StructField("bin_fill", LongType, false)))
    val rows = base.rdd.mapPartitionsWithIndex { case (pid, it) =>
      // first-fit over open bins; fills is small (bounded by docs/bin
      // ratio) and scanned first-fit — classic FFD
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { r =>
        val n = r.getAs[Long]("n_tokens")
        var i = 0
        while (i < fills.length && fills(i) + n > budget) i += 1
        if (i == fills.length) fills += n else fills(i) += n
        Row(pid.toLong * (1L << 40) + i, r.get(r.fieldIndex("id")), n,
          fills(i))
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Packing utilization report: per-bin fill plus corpus-level
    * utilization = packed tokens / (bins × budget). */
  def packingStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("bin_id"))
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("n_docs"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("fill")).as("packed_tokens"),
        round(sum(col("fill")).cast("double") /
          (count(lit(1)) * lit(budget.toDouble)), 6).as("utilization"))
}
