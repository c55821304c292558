package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON document per line) ingest with a corrupt-row
  * quarantine — the de-facto interchange format of LLM training
  * corpora (raw crawls and vendor drops arrive as JSONL with a
  * non-trivial malformed-line rate; an ingest that either crashes on
  * them or silently drops them is unusable at 100 TB).
  *
  * Built as an explicit text scan + `from_json` with a corrupt-record
  * slot, rather than the JSON file source's internal `_corrupt_record`
  * plumbing: the split into (parsed, quarantine) stays two prunable
  * projections of one codegen'd parse — no corpus-wide cache() (the
  * standard workaround for SPARK-21610's corrupt-column-only
  * restriction on the file source), no schema inference pass. A line
  * lands in EXACTLY one output: PERMISSIVE-with-corrupt-slot parsing
  * quarantines both syntactically malformed lines AND lines whose
  * values cannot take the declared types — either way the verbatim
  * line is preserved for forensics, nothing is silently nulled. */
object JsonLines {

  private val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL under `schema`: (parsed, quarantine).
    * `parsed` holds the schema columns of well-formed lines;
    * `quarantine` the verbatim text of malformed ones. */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val parseSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(CorruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    val raw = spark.read.text(path)
      .select(from_json(col("value"), parseSchema, opts).as("__j"))
    val parsed = raw.where(col(s"__j.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"__j.$f")).toSeq: _*)
    val quarantine = raw.where(col(s"__j.$CorruptCol").isNotNull)
      .select(col(s"__j.$CorruptCol").as("raw_line"))
    (parsed, quarantine)
  }
}
