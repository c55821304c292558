package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage for co-located joins — the 100 TB join
  * pattern: two fact tables written with the SAME bucket spec on their
  * join key join WITHOUT any exchange (each bucket pair sort-merges
  * locally), turning the recurring big-×-big join from a full-network
  * shuffle into a scan. The write pays one clustering shuffle ONCE;
  * every subsequent join, aggregation, or dedup keyed on the bucket
  * column is exchange-free.
  *
  * This is Spark's native `bucketBy` (hash(key) mod n file groups +
  * catalog metadata); `BucketedJoinSpec` pins the contract that the
  * joined plan contains NO Exchange. EventLog's time-bucket partitions
  * solve range pruning; this solves key co-location — the two
  * composable halves of the storage layout story.
  */
object BucketedTables {

  /** Bucket spec of a cataloged table: (bucket columns, bucket count),
    * None when the table does not exist or is unbucketed. */
  def bucketSpecOf(spark: SparkSession, table: String)
      : Option[(Seq[String], Int)] = {
    if (!spark.catalog.tableExists(table)) return None
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
      .toMap
    for {
      n <- desc.get("Num Buckets").flatMap(_.trim.toIntOption)
      cols <- desc.get("Bucket Columns") // rendered as [`a`, `b`]
    } yield (cols.trim.stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
      .toSeq.filter(_.nonEmpty), n)
  }

  /** Write `df` as a bucketed managed table (overwriting), clustered
    * and sorted by `key` into `nBuckets` file groups per partition.
    * Also clears a stale warehouse LOCATION left by a previous
    * session: the default in-memory catalog forgets the table between
    * JVMs while its directory persists, and saveAsTable refuses to
    * reuse an unmanaged location.
    *
    * Typo-safe: only SIMPLE identifiers are accepted (a qualified
    * `db.tbl` would derive a wrong warehouse path, and arbitrary names
    * would reach raw SQL), and an EXISTING table is only overwritten
    * when its bucket spec matches `(key, nBuckets)` — a mistyped name
    * hitting someone else's table fails loudly instead of silently
    * destroying it. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"writeBucketed needs a simple table identifier, got '$table'")
    val spark = df.sparkSession
    bucketSpecOf(spark, table).foreach { case (cols, n) =>
      require(cols == Seq(key) && n == nBuckets,
        s"refusing to overwrite table '$table': existing bucket spec " +
          s"(${cols.mkString(",")} x $n) != requested ($key x $nBuckets)" +
          " — drop() it explicitly if that is intended")
    }
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Drop a bucketed table (cleanup). */
  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
