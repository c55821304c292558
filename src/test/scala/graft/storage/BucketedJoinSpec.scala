package graft.storage

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables: equal bucket specs make the join exchange-free
  * (co-located sort-merge), and results match the plain join. */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-bucket-spec tables join with NO exchange and match the " +
      "plain join") {
    val orders = (0L until 2000L).map(i => (i, s"o$i")).toDF("k", "ov")
    val items = (0L until 6000L).map(i => (i % 2500, s"i$i")).toDF("k", "iv")
    // force the big-×-big path bucketing exists for: at fixture size the
    // planner would otherwise broadcast and skip the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedTables.writeBucketed(orders, "b_orders", "k", nBuckets = 8)
      BucketedTables.writeBucketed(items, "b_items", "k", nBuckets = 8)
      val l = BucketedTables.read(spark, "b_orders")
      val r = BucketedTables.read(spark, "b_items")
      val joined = l.join(r, "k")
      val rows = joined.collect()
      // correctness: identical to the unbucketed join
      val want = orders.join(items, "k").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
      assert(rows.map(x =>
        (x.getLong(0), x.getString(1), x.getString(2))).toSet === want)
      assert(rows.length === want.size)
      // the whole point: no Exchange anywhere in the executed plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.toLowerCase.contains("sortmergejoin") ||
        plan.toLowerCase.contains("hashjoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      BucketedTables.drop(spark, "b_orders")
      BucketedTables.drop(spark, "b_items")
    }
  }

  test("writeBucketed refuses a mismatched bucket spec and rejects " +
      "non-simple identifiers (typo safety)") {
    val df = (0L until 100L).map(i => (i, i.toDouble)).toDF("k", "v")
    try {
      BucketedTables.writeBucketed(df, "b_guard", "k", nBuckets = 4)
      // different bucket count → refuse
      val e1 = intercept[IllegalArgumentException] {
        BucketedTables.writeBucketed(df, "b_guard", "k", nBuckets = 8)
      }
      assert(e1.getMessage.contains("bucket spec"))
      // different bucket column → refuse
      val e2 = intercept[IllegalArgumentException] {
        BucketedTables.writeBucketed(df, "b_guard", "v", nBuckets = 4)
      }
      assert(e2.getMessage.contains("bucket spec"))
      // original table untouched by the refused writes
      assert(BucketedTables.read(spark, "b_guard").count() === 100L)
      assert(BucketedTables.bucketSpecOf(spark, "b_guard")
        === Some((Seq("k"), 4)))
      // same spec → legitimate overwrite still works
      BucketedTables.writeBucketed(df.limit(10), "b_guard", "k",
        nBuckets = 4)
      assert(BucketedTables.read(spark, "b_guard").count() === 10L)
      // qualified / injectable names never reach raw SQL or the fs
      intercept[IllegalArgumentException] {
        BucketedTables.writeBucketed(df, "db.tbl", "k", nBuckets = 4)
      }
      intercept[IllegalArgumentException] {
        BucketedTables.writeBucketed(df, "t; DROP TABLE x", "k", 4)
      }
    } finally BucketedTables.drop(spark, "b_guard")
  }

  test("groupBy on the bucket key is exchange-free too") {
    val df = (0L until 3000L).map(i => (i % 500, i.toDouble)).toDF("k", "v")
    try {
      BucketedTables.writeBucketed(df, "b_agg", "k", nBuckets = 8)
      val agg = BucketedTables.read(spark, "b_agg")
        .groupBy("k").agg(sum("v").as("s"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n$plan")
    } finally BucketedTables.drop(spark, "b_agg")
  }
}
