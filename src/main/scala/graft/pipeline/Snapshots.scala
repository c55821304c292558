package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot comparison — the audit step between two curation
  * runs ("what changed since the last crawl/clean?"). Content identity
  * is md5 of the text, so the diff never moves document bodies through
  * the join: both sides reduce to (id, hash) in their map stages, and
  * the comparison is ONE full-outer hash join on the id — the minimal
  * shuffle for an id-keyed diff at any scale. */
object Snapshots {

  /** Diff two corpus snapshots by document id: one row per id whose
    * status is not `unchanged` — `added` (only in new), `removed`
    * (only in old), or `changed` (both, different content hash).
    * Output: (doc_id, status, old_md5, new_md5) with null hashes on
    * the absent side. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val o = oldDf.select(idCol.as("doc_id"), md5(textCol).as("old_md5"))
    val n = newDf.select(idCol.as("doc_id"), md5(textCol).as("new_md5"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"), col("old_md5"),
        col("new_md5"))
  }
}
