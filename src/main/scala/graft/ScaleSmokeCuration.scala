package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke for the round-11 curation operators: replicate the
  * sf0.1 documents/embeddings with DISTINCT ids (content unchanged, so
  * hot lines / duplicate chunks / gram overlaps GROW with the corpus —
  * the adversarial direction) and measure the cost curve at 1×/4×/16×.
  * Results are narrated in SCALING.md.
  */
object ScaleSmokeCuration {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def repDocs(n: Int): DataFrame = (0 until n).map(k =>
      docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        col("text"), col("source"))).reduce(_ union _)
    def repEmb(n: Int): DataFrame = (0 until n).map(k =>
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        col("embedding"), col("label"))).reduce(_ union _)

    // warmup (codegen + shuffle machinery)
    noop(docs.groupBy("source").count())

    Seq(1, 4, 16).foreach { m =>
      val d = repDocs(m).repartition(32).cache()
      d.count()
      val nd = 5000L * m
      time(s"boilerplate x$m ($nd docs)") {
        val seg = graft.operators.TextAnalysis.segmentLines(
          d, "doc_id", "text", 12, keep = Seq("source"))
        noop(graft.operators.TextAnalysis.boilerplate(seg, "id", "source", "text", 2))
      }
      time(s"contam_rate x$m") {
        noop(graft.operators.Decontaminate.contaminationRate(
          d, "doc_id", "text", id => id % 17 === 0, 8))
      }
      time(s"keep_rate_threshold x$m") {
        val ws = split(col("text"), " ")
        val score = round(lit(1e6) *
          (size(array_distinct(ws)).cast("long") / size(ws).cast("long"))).cast("long")
        noop(graft.operators.Mixture.thresholdByKeepRate(d, "doc_id", score, 0.4))
      }
      time(s"cdc_chunks+stats x$m") {
        noop(graft.operators.Chunking.cdcDedupStats(
          graft.operators.Chunking.cdcChunks(d, "doc_id", "text", 4, 16)))
      }
      time(s"distinct_kmv x$m") {
        noop(graft.operators.TextAnalysis.distinctKmv(d, "source", "text", 4, 32, 16))
      }
      d.unpersist()
    }

    Seq(1, 2, 4).foreach { m =>
      val e = repEmb(m).repartition(32).cache()
      e.count()
      time(s"label_noise x$m (${2000 * m} vecs)") {
        noop(graft.operators.Similarity.labelNoise(e, "vec_id", "embedding", "label", 5))
      }
      time(s"margin_mining x$m") {
        noop(graft.operators.Similarity.marginMining(
          e, "vec_id", "embedding", id => id % 2 === 0, 4, 1.0))
      }
      e.unpersist()
    }
    spark.stop()
  }
}
