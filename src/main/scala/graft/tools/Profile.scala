package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for slow bench entries (not part of the library
  * surface; run with `sbt "runMain graft.tools.Profile"`). */
object Profile {
  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mat(spark.range(1000).toDF("i"))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def bench(name: String)(f: => DataFrame): Unit = {
      val t1 = timeSec(mat(f)); val t2 = timeSec(mat(f))
      println(f"PROF $name%-28s ${math.min(t1, t2)}%.3f s  (runs $t1%.3f / $t2%.3f)")
    }

    bench("read_only") {
      docs.select("doc_id", "text")
    }
    bench("split_only") {
      docs.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
    }
    bench("shingles_hof") {
      docs.select(col("doc_id"),
        graft.pipeline.TextAnalysis.shingles(col("text"), 3).as("s"))
    }
    bench("fingerprint_current") {
      graft.pipeline.TextAnalysis.fingerprintTable(docs, col("doc_id"), col("text"))
    }
    bench("langid_current") {
      docs.select(col("doc_id"),
        graft.pipeline.TextAnalysis.langId(col("text")).as("lang_guess"))
    }
    bench("quality_current") {
      docs.select(col("doc_id"),
        round(graft.pipeline.TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
        round(graft.pipeline.TextAnalysis.digitRatio(col("text")), 6).as("digit_ratio"),
        round(graft.pipeline.TextAnalysis.meanWordLength(col("text")), 6).as("mean_word_len"),
        graft.pipeline.TextAnalysis.qualityScore(col("text")).as("quality"))
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    bench("emb_cosine_current") {
      graft.pipeline.Ann.cosineNearDuplicates(emb, col("vec_id"),
        col("embedding"), threshold = 0.9, dim = 64, planes = 10, tables = 20)
    }
    bench("ivf_current") {
      val queries = emb.where(col("vec_id") < 3)
      val model = graft.pipeline.Ann.trainIvf(emb, nCells = 8)
      val ivf = graft.pipeline.Ann.ivfTopK(emb, queries, k = 10, model, nprobe = 6)
      val brute = graft.pipeline.Ann.bruteForceTopK(emb, queries, k = 10)
      ivf.join(brute.select("query_id", "id"), Seq("query_id", "id"), "leftsemi")
        .groupBy("query_id").agg((count(lit(1)) / 10.0).as("recall"))
        .where(col("recall") >= 0.7)
        .select(col("query_id"), lit(true).as("recall_ge_070"))
    }
    bench("simhash_current") {
      graft.pipeline.Dedup.simhashNearDuplicates(docs,
        col("doc_id"), col("text"), maxHamming = 3,
        tokenHash = graft.pipeline.Dedup.md5TokenHash32)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }
    spark.stop()
  }
}
