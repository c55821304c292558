package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter turning the driver's `events.parquet` stream table into the
  * engine's canonical quads DataFrame — the round-trippable equivalent of
  * the reference ingesting an N-Quads event feed
  * (`/root/reference/src/parsing/rdf_parser.rs` + stream bus): each event
  * row becomes three timestamped quads under a per-event-type named
  * graph.
  *
  *   e:<id>  v:user   u:<user_id>        (IRI object)
  *   e:<id>  v:type   "<event_type>"     (plain literal)
  *   e:<id>  v:value  "<value>"          (numeric literal, lexical form)
  *
  * Single scan + generator (inline), no self-union: one pass over the
  * parquet at any scale.
  */
object EventsAsQuads {

  val Base = "http://graft.dev/"
  val Vocab: String = Base + "vocab#"
  val PUser: String = Vocab + "user"
  val PType: String = Vocab + "type"
  val PValue: String = Vocab + "value"

  /** Reads the events table with `ts` normalized to an epoch-millis LONG
    * column `ts_ms`, tolerating every physical type the driver has shipped:
    * TIMESTAMP(NANOS) (readable only as a raw Long via the nanosAsLong
    * legacy conf — set ONLY when the footer actually carries nanos, so a
    * session reading ordinary micros/NTZ events never has its parquet
    * semantics changed for other tables), TIMESTAMP_NTZ (timestamp[us]
    * with isAdjustedToUTC=false — naive wall-clock, interpreted as UTC to
    * match the DuckDB oracle's epoch_ms), and plain TIMESTAMP. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // Gate the session-global legacy conf on the actual physical type:
    // schema inference on a TIMESTAMP(NANOS) footer fails eagerly
    // without it (and only then is flipping it justified — the conf
    // must stay true for the lifetime of the returned plan, because
    // executors re-convert the footer schema at scan time, so a
    // save/restore around the read would break the later action)
    val raw =
      try spark.read.parquet(path)
      catch {
        case e: Throwable if e.getMessage != null &&
            e.getMessage.contains("NANOS") &&
            spark.conf.get(
              "spark.sql.legacy.parquet.nanosAsLong", "false") != "true" =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive wall-clock read as UTC, session-zone-free: NTZ's stored
        // micros ARE the UTC-epoch micros of that reading, so a direct
        // reinterpretation beats an NTZ→LTZ cast (which would bake the
        // session zone in at analysis time)
        graft.expressions.native.ntzEpochMillis(col("ts"))
      case _ => unix_millis(col("ts"))
    }
    raw.withColumn("ts_ms", tsMs)
  }

  /** Canonical quads view of the events table. */
  def quads(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    ev.select(
      col("ts_ms").as("timestamp"),
      concat(lit(Base + "e/"), col("event_id")).as("subject"),
      concat(lit(Base + "g/"), col("event_type")).as("graph"),
      inline(array(
        struct(lit(PUser).as("predicate"),
          concat(lit(Base + "u/"), col("user_id")).as("object")),
        struct(lit(PType).as("predicate"),
          col("event_type").as("object")),
        struct(lit(PValue).as("predicate"),
          col("value").cast("string").as("object")))))
      .select("timestamp", "subject", "predicate", "object", "graph")
  }
}
