package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 recall measurement behind SCALING.md's two-level-family
  * note (r16 verdict item 4's done-criterion: "a SCALING.md recall row
  * vs seeded ivfTopK2 at equal probe budget"): the 2×2 ablation grid
  * of the two-level index — coarse book (seeded ∕ Lloyd-trained) ×
  * candidate scoring (exact cosine ∕ trained PQ-ADC) — every cell at
  * the IDENTICAL probe budget, graded recall@3 against brute truth
  * with [[RecallGridR15]]'s grading join, swept over nprobe1.
  *
  * Two corpora, the [[ScaleSmokeTrained]] discipline: the raw sf0.1
  * embeddings (near-isotropic — the honest adversarial case for any
  * coarse quantizer) and the clustered twin built deterministically
  * from the same data (point = 5·center(g) + 0.3·detail, g = id mod
  * 16 — the corpus shape real embedding spaces have, where a TRAINED
  * coarse book can actually land on cluster mass). */
object RecallGridR17 {
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

    val raw = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .cache()
    raw.count()

    // clustered twin (ScaleSmokeTrained's deterministic construction):
    // 16 tight clusters from the same vectors — center(g) = vector of
    // the cluster's lowest id, detail = the row's own vector
    val centers = raw.withColumn("g", pmod(col("vec_id"), lit(16)))
      .withColumn("crn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("g")).orderBy(col("vec_id"))))
      .filter(col("crn") === 1)
      .select(col("g"), col("embedding").as("center"))
    val clustered = raw.withColumn("g", pmod(col("vec_id"), lit(16)))
      .join(broadcast(centers), Seq("g"))
      .select(col("vec_id"), zip_with(col("center"), col("embedding"),
        (c, d) => c * lit(5.0f) + d * lit(0.3f)).as("embedding"))
      .cache()
    clustered.count()

    val K = 3
    def grid(name: String, emb: DataFrame): Unit = {
      val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        _ < 5, K).select(col("qid"), col("vec_id")).cache()
      val nTruth = truth.count()
      def recall(approx: DataFrame): Double =
        truth.join(approx.select(col("qid"), col("vec_id")),
          Seq("qid", "vec_id"), "left_semi").count().toDouble / nTruth

      println(s"== $name: recall@3, C=16 nSub=4 nprobe2=2, over nprobe1 ==")
      println("  np1  ivf2_seed  ivf2_train  ivf2pq_seed  ivf2pq_train")
      for (np1 <- Seq(1, 2, 4, 8)) {
        val s = recall(Similarity.ivfTopK2(emb, "vec_id", "embedding",
          _ < 5, K, nCoarse = 16, nSub = 4, nprobe1 = np1, nprobe2 = 2))
        val t = recall(Similarity.ivfTopK2Trained(emb, "vec_id", "embedding",
          _ < 5, K, nCoarse = 16, nSub = 4, nprobe1 = np1, nprobe2 = 2,
          iters = 2))
        val ps = recall(Similarity.ivf2PqTopK(emb, "vec_id", "embedding",
          _ < 5, K, nCoarse = 16, nSub = 4, nprobe1 = np1, nprobe2 = 2,
          iters = 2))
        val pt = recall(Similarity.ivf2PqTopKTrained(emb, "vec_id",
          "embedding", _ < 5, K, nCoarse = 16, nSub = 4, nprobe1 = np1,
          nprobe2 = 2, iters = 2, coarseIters = 2))
        println(f"  $np1%3d    $s%.3f      $t%.3f       $ps%.3f        $pt%.3f")
      }
      println(s"== $name: PQ arms at the production book (M=16, K=256) ==")
      println("  np1  ivf2pq_seed  ivf2pq_train")
      for (np1 <- Seq(2, 8)) {
        val ps = recall(Similarity.ivf2PqTopK(emb, "vec_id", "embedding",
          _ < 5, K, nCoarse = 16, nSub = 4, nprobe1 = np1, nprobe2 = 2,
          subspaces = 16, codebookK = 256, iters = 2))
        val pt = recall(Similarity.ivf2PqTopKTrained(emb, "vec_id",
          "embedding", _ < 5, K, nCoarse = 16, nSub = 4, nprobe1 = np1,
          nprobe2 = 2, subspaces = 16, codebookK = 256, iters = 2,
          coarseIters = 2))
        println(f"  $np1%3d     $ps%.3f        $pt%.3f")
      }
      truth.unpersist()
    }

    grid("raw sf0.1 (near-isotropic)", raw)
    grid("clustered twin (16 tight clusters)", clustered)
    spark.stop()
  }
}
