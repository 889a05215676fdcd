package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 trained-codebook measurements behind SCALING.md's
  * seeded-vs-Lloyd note:
  *
  *  1. recall grid — recall@3 of flat PQ-ADC with the SEEDED codebook
  *     vs the Lloyd-TRAINED codebook (1 and 2 rounds) over the same
  *     (M, K) cells as RecallGridR15, sf0.1 embeddings, brute ground
  *     truth: prices what training buys at each operating point.
  *  2. training-cost curve — wall of pqCodebookTrained (M=4 K=16,
  *     2 rounds) at 1×/4×/16× replicated vectors (the ScaleSmokeR15
  *     protocol): each Lloyd round is one corpus pass against the
  *     broadcast book + two skinny aggregates, so the wall must scale
  *     ~linearly in n — the evidence that training is a bounded
  *     pre-pass, not a scale hazard.
  */
object ScaleSmokeTrained {
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

    def recall(approx: DataFrame): Double = {
      val hits = truth.join(approx.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_semi").count()
      hits.toDouble / truth.count()
    }

    println("flat PQ-ADC recall@3: seeded vs Lloyd-trained over (M, K)")
    for (m <- Seq(2, 4, 8, 16); kk <- Seq(16, 64, 256)) {
      val r0 = recall(Similarity.pqTopK(emb, "vec_id", "embedding", _ < 5,
        K, subspaces = m, codebookK = kk))
      val r1 = recall(Similarity.pqTopKTrained(emb, "vec_id", "embedding",
        _ < 5, K, subspaces = m, codebookK = kk, iters = 1))
      val r2 = recall(Similarity.pqTopKTrained(emb, "vec_id", "embedding",
        _ < 5, K, subspaces = m, codebookK = kk, iters = 2))
      println(f"  M=$m%2d K=$kk%3d  seeded=$r0%.3f  lloyd1=$r1%.3f  lloyd2=$r2%.3f")
    }

    println("IVF-PQ (C=16, nprobe=2, M=4 K=16): seeded vs trained vs residual")
    val iv0 = recall(Similarity.ivfPqTopK(emb, "vec_id", "embedding", _ < 5,
      K, nCentroids = 16, nprobe = 2))
    val iv2 = recall(Similarity.ivfPqTopKTrained(emb, "vec_id", "embedding",
      _ < 5, K, nCentroids = 16, nprobe = 2, iters = 2))
    val ivr = recall(Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
      _ < 5, K, nCentroids = 16, nprobe = 2, iters = 2))
    println(f"  seeded=$iv0%.3f  lloyd2=$iv2%.3f  residual=$ivr%.3f")

    println("residual IVF-PQ (C=16, nprobe=2): recall@3 over (M, K)")
    for (m <- Seq(4, 8, 16); kk <- Seq(16, 64, 256)) {
      val r = recall(Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
        _ < 5, K, nCentroids = 16, nprobe = 2, subspaces = m,
        codebookK = kk, iters = 2))
      println(f"  M=$m%2d K=$kk%3d  recall@3=$r%.3f")
    }

    // residual encoding pays only when the coarse quantizer captures
    // real structure — the synthetic sf corpus is near-isotropic, so
    // build a CLUSTERED twin deterministically from it: 16 well-spread
    // centers (the first 16 vectors, scaled 5x) + small per-point
    // detail (0.3x the original vector), point j on center j % 16
    println("clustered corpus (16 tight clusters): seeded vs trained vs residual IVF-PQ")
    val centers = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("g"), col("embedding").as("cv"))
    val clustered = emb.withColumn("g", col("vec_id") % 16)
      .join(broadcast(centers), Seq("g"))
      .select(col("vec_id"),
        zip_with(col("cv"), col("embedding"),
          (c, x) => c * lit(5.0f) + x * lit(0.3f)).as("embedding"))
      .cache()
    clustered.count()
    val ctruth = Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
      _ < 5, K).select(col("qid"), col("vec_id")).cache()
    ctruth.count()
    def crecall(approx: DataFrame): Double = {
      val hits = ctruth.join(approx.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_semi").count()
      hits.toDouble / ctruth.count()
    }
    for ((m, kk) <- Seq((4, 16), (8, 256), (16, 64), (16, 256))) {
      val cs = crecall(Similarity.ivfPqTopK(clustered, "vec_id", "embedding",
        _ < 5, K, nCentroids = 16, nprobe = 2, subspaces = m, codebookK = kk))
      val ct = crecall(Similarity.ivfPqTopKTrained(clustered, "vec_id",
        "embedding", _ < 5, K, nCentroids = 16, nprobe = 2, subspaces = m,
        codebookK = kk, iters = 2))
      val cr = crecall(Similarity.ivfPqResidualTopK(clustered, "vec_id",
        "embedding", _ < 5, K, nCentroids = 16, nprobe = 2, subspaces = m,
        codebookK = kk, iters = 2))
      println(f"  M=$m%2d K=$kk%3d  seeded=$cs%.3f  lloyd2=$ct%.3f  residual=$cr%.3f")
    }

    def rep(df: DataFrame, n: Int): DataFrame =
      (0 until n).map(k =>
        df.withColumn("vec_id", col("vec_id") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    println("training-cost curve (M=4 K=16, 2 Lloyd rounds), replicated corpus")
    for (m <- Seq(1, 4, 16)) {
      val corpus = rep(emb, m).cache()
      val n = corpus.count()
      val fx = Similarity.fixedPoint(corpus, "vec_id", "embedding")
        .localCheckpoint(eager = false)
      val t0 = System.nanoTime()
      val cb = Similarity.pqCodebookTrained(fx, 4, 16, 16, 2)
      val rows = cb.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"  x$m%2d  n=$n%6d  train_wall=$wall%.2fs  book_rows=$rows")
      corpus.unpersist()
    }
    spark.stop()
  }
}
