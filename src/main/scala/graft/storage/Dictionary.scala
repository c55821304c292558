package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit term dictionary (SURVEY.md §2.1 S9/S10).
  *
  * The engine's primary position is that Parquet dictionary+RLE pages
  * subsume the reference's `String ↔ u32` dictionary
  * (`/root/reference/src/storage/indexing/dictionary.rs`) — that is the
  * default path and needs no code. This module is the OPT-IN surrogate-
  * key variant for pipelines that want integer join keys or a compact
  * normalized log: a `(id LONG, value STRING)` table built with
  * deterministic dense ids, plus encode/decode as broadcast joins.
  */
final class Dictionary(spark: SparkSession, path: String) {

  import Dictionary._

  /** Build/extend the dictionary with every distinct term of the given
    * columns. Ids are dense, assigned in term-sort order per build
    * (deterministic for a fixed input).
    *
    * Id assignment uses sort + `zipWithIndex` — every partition numbers
    * its rows independently against precomputed per-partition offsets. A
    * `row_number()` over a global (unpartitioned) window would funnel
    * every distinct term through ONE task, a scale-killer on wide
    * vocabularies. */
  def build(quads: DataFrame, columns: Seq[String] = TermColumns): Unit = {
    val existing = loadOrEmpty()
    val terms = columns.map(c => quads.select(col(c).as("value")))
      .reduce(_ union _).distinct()
    val newTerms = terms.join(existing, Seq("value"), "leftanti")
    val maxId = existing.agg(coalesce(max("id"), lit(-1L))).head().getLong(0)
    val session = spark
    import session.implicits._
    val withIds = newTerms.select("value").orderBy("value")
      .as[String].rdd
      .zipWithIndex()
      .map { case (value, i) => (i + maxId + 1, value) }
      .toDF("id", "value")
    withIds.write.mode(SaveMode.Append).parquet(path)
  }

  def table(): DataFrame = loadOrEmpty()

  /** Encode term columns to surrogate ids via broadcast joins:
    * `(timestamp, subject_id, predicate_id, object_id, graph_id)` —
    * the reference's 24-byte encoded event, columnar. */
  def encode(quads: DataFrame): DataFrame = {
    val dict = broadcast(table())
    TermColumns.foldLeft(quads) { (df, c) =>
      df.join(dict.withColumnRenamed("value", c)
          .withColumnRenamed("id", s"${c}_id"), Seq(c), "left")
        .drop(c)
    }.select("timestamp", "subject_id", "predicate_id", "object_id",
      "graph_id")
  }

  /** Decode back to the canonical quads shape
    * (`HistoricalExecutor::decode_events` equivalent). */
  def decode(encoded: DataFrame): DataFrame = {
    val dict = broadcast(table())
    TermColumns.foldLeft(encoded) { (df, c) =>
      df.join(dict.withColumnRenamed("id", s"${c}_id")
          .withColumnRenamed("value", c), Seq(s"${c}_id"), "left")
        .drop(s"${c}_id")
    }.select("timestamp", "subject", "predicate", "object", "graph")
  }

  private def loadOrEmpty(): DataFrame = {
    // Hadoop-FS existence check: works for HDFS/S3 paths too
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
  }
}

object Dictionary {
  val TermColumns: Seq[String] = Seq("subject", "predicate", "object", "graph")
}
