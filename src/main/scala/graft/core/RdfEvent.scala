package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A timestamped RDF quad — the engine's universal event record.
  *
  * Mirrors the reference's user-facing event
  * (`/root/reference/src/core/mod.rs:16-23`): millisecond epoch timestamp
  * plus four term strings. Terms are stored *unwrapped* (no `<...>` around
  * IRIs, no quotes around literals); wrapping happens only at the
  * serialization boundary (see [[Terms.format]]).
  *
  * The reference's 24-byte dictionary-encoded storage record
  * (`src/core/encoding.rs:8-34`) is deliberately NOT reproduced: Parquet
  * dictionary + RLE encoding subsumes it (SURVEY.md §1.1).
  */
final case class RdfEvent(
    timestamp: Long,
    subject: String,
    predicate: String,
    objectValue: String,
    graph: String)

object RdfEvent {

  /** Canonical columnar schema for quad DataFrames. Column named `object`
    * (a Scala keyword, hence the case-class field `objectValue`).
    */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("predicate", StringType, nullable = false),
    StructField("object", StringType, nullable = false),
    StructField("graph", StringType, nullable = false)))

  val columns: Seq[String] = schema.fieldNames.toSeq

  def toRow(e: RdfEvent): Row =
    Row(e.timestamp, e.subject, e.predicate, e.objectValue, e.graph)

  /** Build a quads DataFrame from local events (tests / small fixtures). */
  def toDF(spark: SparkSession, events: Seq[RdfEvent]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(events.map(toRow).asJava, schema)
  }

  /** Derived numeric view of the object column — the engine-wide analogue
    * of the reference's numeric literal sniffing
    * (`src/execution/historical_executor.rs:323-342`): objects that parse
    * as doubles behave numerically in FILTERs/aggregates, others are NULL.
    */
  def withObjectNumeric(df: DataFrame): DataFrame =
    df.withColumn("object_numeric", col("object").try_cast(DoubleType))
}
