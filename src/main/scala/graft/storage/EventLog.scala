package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent, timestamp-indexed quad log — Spark-native rebuild of
  * the reference's segmented storage (SURVEY.md §2.1 S5–S8, S11).
  *
  * The reference appends 24-byte dictionary-encoded records to segment
  * files with a two-level sparse time index
  * (`/root/reference/src/storage/segmented_storage.rs:117-163,241-294`).
  * Here the same contract — `append(quads)` + `query(start,end)` with
  * time pruning — maps onto a Parquet table partitioned by time bucket:
  *
  *   - segment files        → Parquet files (row groups ≈ segments)
  *   - dictionary encoding  → Parquet dictionary pages (automatic)
  *   - sparse ts index      → partition dirs (`ts_bucket=`) + row-group
  *                            min/max stats; `query` filters on BOTH the
  *                            bucket column (directory pruning) and
  *                            `timestamp` (row-group + page pruning)
  *   - segment discovery    → Parquet directory listing (free)
  *
  * Scale notes: append is distributed (no driver materialization); a
  * 1000-executor cluster writes each micro-batch in parallel into
  * bucket directories, and time-range queries touch only overlapping
  * buckets regardless of total log size.
  *
  * @param bucketMs partition granularity (default 1 h, mirroring a
  *   "segment per time slice"; coarse enough to avoid small-file
  *   explosion at high event rates, fine enough to prune hard)
  */
final class EventLog(
    spark: SparkSession,
    path: String,
    bucketMs: Long = 3600L * 1000L,
    compression: String = "lz4") extends Serializable {

  import EventLog._

  /** Append a canonical quads DataFrame (timestamp, subject, predicate,
    * object, graph). Equivalent of `write_rdf` + background flush
    * (`segmented_storage.rs:478-657`): the write commit IS the flush.
    *
    * Tuned for the streaming case: a micro-batch is time-local and
    * touches 1–2 bucket directories, so the dynamic-partition writer
    * opens few files. For backfills spanning many buckets use
    * [[appendBulk]].
    */
  def append(quads: DataFrame): Unit =
    quads
      .withColumn(BucketCol, expr(s"timestamp div ${bucketMs}L"))
      // sort by (bucket, ts): satisfies the file writer's required
      // partition-column ordering (so it adds no extra sort of its own)
      // while keeping segments ts-ordered like the reference (:222)
      .sortWithinPartitions(BucketCol, "timestamp")
      .write
      .option("compression", compression)
      .mode(SaveMode.Append)
      .partitionBy(BucketCol)
      .parquet(path)

  /** Backfill append for inputs spanning many buckets: range-repartition
    * on timestamp first so each task covers a contiguous time slice and
    * writes into only its own bucket directories (instead of every task
    * churning a writer per bucket). */
  def appendBulk(quads: DataFrame, parallelism: Int): Unit =
    quads
      .withColumn(BucketCol, expr(s"timestamp div ${bucketMs}L"))
      .repartitionByRange(parallelism, col("timestamp"))
      .write
      .option("compression", compression)
      .mode(SaveMode.Append)
      .partitionBy(BucketCol)
      .parquet(path)

  /** Full log scan (no pruning) — canonical 5-column shape. */
  def read(): DataFrame =
    spark.read.parquet(path)
      .select("timestamp", "subject", "predicate", "object", "graph")

  /** Time-range read path (S8): inclusive `[start, end]`, exactly the
    * reference's `storage.query(start, end)` contract
    * (`segmented_storage.rs:308-463`; inclusive bounds per the
    * partition_point ≥ start / early-exit ts > end scan). Filters on the
    * partition column first so whole bucket directories are pruned
    * before any footer is read. */
  def query(start: Long, end: Long): DataFrame = {
    val lo = math.floorDiv(start, bucketMs)
    val hi = math.floorDiv(end, bucketMs)
    spark.read.parquet(path)
      .where(col(BucketCol).between(lo, hi))
      .where(col("timestamp").between(start, end))
      .select("timestamp", "subject", "predicate", "object", "graph")
  }

  def exists: Boolean =
    new java.io.File(path).exists()
}

object EventLog {
  val BucketCol = "ts_bucket"
}
