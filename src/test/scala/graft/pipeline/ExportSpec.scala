package graft.pipeline

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sharded training export: contiguous global positions per shard,
  * ntile-balanced sizes, lossless roundtrip, deterministic layout. */
class ExportSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shards hold contiguous position ranges, balanced ntile sizes, " +
      "and roundtrip losslessly") {
    val df = (0L until 103L).map(i => (i, s"doc$i", (i * 37) % 1000))
      .toDF("id", "text", "ord")
    val dir = java.nio.file.Files.createTempDirectory("export")
      .resolve("out").toString
    Export.shardedExport(df, struct(col("ord"), col("id")), nShards = 10,
      dir, format = "json")

    val back = spark.read.json(dir)
    assert(back.count() === 103)
    assert(back.select("id").distinct().count() === 103)

    val byShard = back.select(col("shard").cast("long"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // ntile balance: first 3 shards get 11, the rest 10
    (0L to 2L).foreach(s => assert(byShard(s).size === 11, s"shard $s"))
    (3L to 9L).foreach(s => assert(byShard(s).size === 10, s"shard $s"))
    // contiguity: shard k's positions are a dense range following k-1
    var next = 0L
    (0L to 9L).foreach { s =>
      val ps = byShard(s)
      assert(ps === (next until next + ps.size), s"shard $s not contiguous")
      next += ps.size
    }
    // positions follow the requested global order
    val posOf = back.select("id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 103L).sortBy(i => ((i * 37) % 1000, i))
      .zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    assert(posOf === want)
  }

  test("export is deterministic under input repartitioning") {
    val df = (0L until 50L).map(i => (i, (i * 13) % 100)).toDF("id", "ord")
    val d1 = java.nio.file.Files.createTempDirectory("exp1")
      .resolve("o").toString
    val d2 = java.nio.file.Files.createTempDirectory("exp2")
      .resolve("o").toString
    Export.shardedExport(df, struct(col("ord"), col("id")), 5, d1)
    Export.shardedExport(df.repartition(7), struct(col("ord"), col("id")),
      5, d2)
    val a = spark.read.json(d1)
      .select(col("id"), col("pos"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = spark.read.json(d2)
      .select(col("id"), col("pos"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
