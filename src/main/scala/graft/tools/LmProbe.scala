package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the bigram-LM entry: where do the seconds
  * go at a given scale factor — vocabulary selection, bigram-count
  * materialization, or scoring? Usage:
  * `runMain graft.tools.LmProbe <sfDir>`. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("lm-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lmprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val m = t("train (vocab+counts)") {
      val m0 = graft.pipeline.LanguageModel.trainBigramLm(
        docs, col("doc_id"), col("text"), vocabSize = 256)
      m0
    }
    t("bc materialize") { m.bigramCounts.count() }
    t("score") {
      graft.pipeline.LanguageModel.scoreBigramLm(
        docs, col("doc_id"), col("text"), m)
        .write.mode("overwrite").parquet("/tmp/lmprobe_out")
    }
    t("score (warm)") {
      graft.pipeline.LanguageModel.scoreBigramLm(
        docs, col("doc_id"), col("text"), m)
        .write.mode("overwrite").parquet("/tmp/lmprobe_out")
    }
    spark.stop()
  }
}
