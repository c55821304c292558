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

  test("manifest: order-independent checksum, contiguity flag, and " +
      "corruption detection") {
    val df = (0L until 97L).map(i => (i, s"payload-$i")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("expm")
      .resolve("o").toString
    val sharded = Export.shardedExport(df, col("id"), 4, dir,
      format = "parquet")
    val payload = Seq(col("id"), col("text"))
    val m = Export.manifest(sharded, payload)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    assert(m.size === 4)
    assert(m.values.forall(_.getAs[Boolean]("contiguous")))
    assert(m.values.map(_.getAs[Long]("n_rows")).sum === 97L)
    // recomputing from the files in ANY row order reproduces it
    val back = spark.read.parquet(dir)
      .select(col("shard").cast("long").as("shard"), col("pos"),
        col("id"), col("text"))
    val m2 = Export.manifest(back.repartition(9), payload)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    assert(m2.keySet === m.keySet)
    m.foreach { case (s, r) =>
      assert(m2(s).getAs[Long]("checksum") === r.getAs[Long]("checksum"))
      assert(m2(s).getAs[Long]("n_rows") === r.getAs[Long]("n_rows"))
    }
    // one flipped payload byte changes exactly that shard's checksum
    val tampered = back.withColumn("text",
      when(col("pos") === 11L, lit("payload-TAMPERED"))
        .otherwise(col("text")))
    val m3 = Export.manifest(tampered, payload)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val dirty = m.keys.filter(s =>
      m3(s).getAs[Long]("checksum") != m(s).getAs[Long]("checksum"))
    assert(dirty.size === 1)
    // and a dropped row flips the count even if XOR happened to cancel
    val dropped = Export.manifest(back.where(col("pos") =!= 11L), payload)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_rows"))
      .toMap
    assert(dropped.values.sum === 96L)
  }
}
