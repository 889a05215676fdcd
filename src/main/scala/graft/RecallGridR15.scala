package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 recall sensitivity grid — the measurement behind SCALING.md's
  * "what recall costs in M/K/nprobe terms" note (r13 verdict item 4 /
  * r14 item 1): recall@3 of flat PQ-ADC over (M, K) and of IVF-PQ over
  * nprobe, graded against brute-force ground truth on the sf0.1
  * embeddings (2 000 vectors, 5 queries) — the same grading join as the
  * oracled `sim_recall_pq`, swept over the knobs instead of pinned to
  * the query config. */
object RecallGridR15 {
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
    import graft.operators.Similarity

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .cache()
    val K = 3
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      _ < 5, K).select(col("qid"), col("vec_id")).cache()
    truth.count()

    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = truth.join(approx.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_semi").count()
      hits.toDouble / truth.count()
    }

    println("flat PQ-ADC: recall@3 over (M subspaces, K codewords)")
    for (m <- Seq(2, 4, 8, 16); kk <- Seq(16, 64, 256)) {
      val r = recall(Similarity.pqTopK(emb, "vec_id", "embedding", _ < 5,
        K, subspaces = m, codebookK = kk))
      println(f"  M=$m%2d K=$kk%3d  recall@3=$r%.3f")
    }

    println("IVF-PQ (C=16, M=4 K=16): recall@3 over nprobe")
    for (np <- Seq(1, 2, 4, 8, 16)) {
      val r = recall(Similarity.ivfPqTopK(emb, "vec_id", "embedding", _ < 5,
        K, nCentroids = 16, nprobe = np))
      println(f"  nprobe=$np%2d  recall@3=$r%.3f")
    }

    println("IVF-PQ (C=16, nprobe=16 = full probe): recall@3 over (M, K)")
    for (m <- Seq(4, 8, 16); kk <- Seq(16, 256)) {
      val r = recall(Similarity.ivfPqTopK(emb, "vec_id", "embedding", _ < 5,
        K, nCentroids = 16, nprobe = 16, subspaces = m, codebookK = kk))
      println(f"  M=$m%2d K=$kk%3d  recall@3=$r%.3f")
    }

    println("IVF-flat (C=16): recall@3 over nprobe (the no-PQ reference)")
    for (np <- Seq(2, 4, 8, 16)) {
      val r = recall(Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 5,
        K, nCentroids = 16, nprobe = np))
      println(f"  nprobe=$np%2d  recall@3=$r%.3f")
    }
    spark.stop()
  }
}
