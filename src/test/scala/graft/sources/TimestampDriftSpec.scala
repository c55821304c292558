package graft.sources

import java.time.{LocalDateTime, ZoneOffset}

import graft.TestSpark

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.scalatest.funsuite.AnyFunSuite

/** Guards against driver-side parquet timestamp-type drift — the defect
  * class that silently voided round 8's bench (the events table shipped
  * as INT64 TIMESTAMP(NANOS), then TIMESTAMP_NTZ, across rounds; an
  * unhandled physical type made every downstream query throw while the
  * harness still recorded rc=0). Every physical type the driver has ever
  * shipped must read through [[EventsAsQuads.events]] to the SAME
  * epoch-millis, in a NON-UTC session, without mutating session state.
  */
class TimestampDriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // fixed instants (epoch micros, UTC): mid-range value, a .999999 tail
  // (floor-division check), and an exact second
  private val micros = Seq(
    1705321496789876L, // 2024-01-15T12:24:56.789876
    1705321499999999L, // floor → ...999 ms, not rounded up to ...000
    1705321500000000L)
  private val expectedMs = micros.map(Math.floorDiv(_, 1000L))

  private def fixtureDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ts-$name")
    d.toString
  }

  /** TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=false) — what the
    * driver ships today. */
  private def writeNtz(dir: String): Unit = {
    import spark.implicits._
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        ZoneOffset.UTC))
    }
    rows.toDF("event_id", "ts").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** TIMESTAMP_LTZ (timestamp[us], isAdjustedToUTC=true). */
  private def writeLtz(dir: String): Unit = {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      val rows = micros.zipWithIndex.map { case (us, i) =>
        (i.toLong, java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      }
      rows.toDF("event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  /** INT64 TIMESTAMP(NANOS) — no Spark writer exists for this physical
    * type (Spark reads it only as a raw Long via the nanosAsLong legacy
    * conf), so write it with the low-level parquet Group API. */
  private def writeNanos(dir: String): Unit = {
    val tsField = org.apache.parquet.schema.Types.required(
        org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true,
        LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
    val idField = org.apache.parquet.schema.Types.required(
        org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
      .named("event_id")
    val msg = new org.apache.parquet.schema.MessageType("events", idField, tsField)
    val outDir = new java.io.File(s"$dir/events.parquet")
    outDir.mkdirs()
    val path = new org.apache.hadoop.fs.Path(
      s"$dir/events.parquet/part-00000.parquet")
    val writer = ExampleParquetWriter.builder(path)
      .withConf(new Configuration()).withType(msg).build()
    val factory = new SimpleGroupFactory(msg)
    try micros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L)
      writer.write(g)
    } finally writer.close()
  }

  private def tsMsOf(dir: String): Seq[Long] = {
    EventsAsQuads.events(spark, dir)
      .select("event_id", "ts_ms").collect()
      .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
  }

  test("all three driver timestamp physical types yield identical ts_ms " +
      "in a non-UTC session, without mutating the session time zone") {
    val dirs = Map(
      "ntz" -> fixtureDir("ntz"), "ltz" -> fixtureDir("ltz"),
      "nanos" -> fixtureDir("nanos"))
    writeNtz(dirs("ntz")); writeLtz(dirs("ltz")); writeNanos(dirs("nanos"))
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    val nanosConf = "spark.sql.legacy.parquet.nanosAsLong"
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      spark.conf.set(nanosConf, "false")
      // micros/NTZ reads must NOT flip the session-global nanos legacy
      // conf (it changes how every OTHER nanos parquet in the session
      // reads); only an actual TIMESTAMP(NANOS) footer may set it
      Seq("ntz", "ltz").foreach { kind =>
        assert(tsMsOf(dirs(kind)) == expectedMs, s"physical type $kind")
        assert(spark.conf.get(nanosConf) == "false",
          s"$kind read mutated $nanosConf")
        assert(spark.conf.get("spark.sql.session.timeZone") ==
          "America/New_York", s"$kind read mutated the session time zone")
      }
      assert(tsMsOf(dirs("nanos")) == expectedMs, "physical type nanos")
      assert(spark.conf.get(nanosConf) == "true",
        "a genuine NANOS footer must gate the legacy conf on " +
          "(executors re-convert the footer schema at scan time)")
      assert(spark.conf.get("spark.sql.session.timeZone") ==
        "America/New_York", "nanos read mutated the session time zone")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prevZone)
      spark.conf.unset(nanosConf)
    }
  }

  test("quads derive from the normalized ts_ms (NTZ fixture)") {
    val dir = fixtureDir("quads")
    writeNtz(dir)
    // quads() needs the full event column set — extend the fixture
    import spark.implicits._
    val full = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("user_id", org.apache.spark.sql.functions.lit(7L))
      .withColumn("event_type", org.apache.spark.sql.functions.lit("t"))
      .withColumn("value", org.apache.spark.sql.functions.lit(1.5))
    full.write.mode("overwrite").parquet(s"$dir/full/events.parquet")
    val ts = EventsAsQuads.quads(spark, s"$dir/full")
      .select("timestamp").distinct().as[Long].collect().sorted.toSeq
    assert(ts == expectedMs)
  }
}
