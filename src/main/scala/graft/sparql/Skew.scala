package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys.
  *
  * AQE's skew-join split handles sort-merge joins automatically (enabled
  * by default); this is the explicit salting technique for the cases AQE
  * can't touch — e.g. a quads BGP join where one subject ("celebrity
  * node") holds millions of triples, or aggregations keyed on a
  * power-law term. The skewed side replicates each row once with a
  * random salt in [0, factor); the other side explodes every row across
  * all salts, so one hot key spreads over `factor` reducers.
  */
object Skew {

  /** Salted inner equi-join on `keys`: `left` is the large/skewed side
    * (salted randomly but deterministically via hash of all columns),
    * `right` is replicated `factor`×. Result equals a plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(factor))
        .cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt", "inner")
      .drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * count/sum-style aggregates pre-combine under (key, salt) before the
    * final combine under key — bounding any single reducer's input to
    * ~1/factor of the hot key. (Spark's hash aggregate already does
    * map-side partial aggregation; this is the explicit shape for
    * memory-bound high-cardinality-value cases like collect-heavy aggs.)
    */
  def twoPhaseCount(df: DataFrame, key: Column, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(factor)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum("partial").as("n"))
}
