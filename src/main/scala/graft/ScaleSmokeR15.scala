package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale-up smoke — the PQ family and IVF-pooled MMR curves
  * the r13/r14 verdicts asked for (r14 items 1 and 6), on the
  * ScaleSmokeR12/R13 replication protocol: ×m copies of the sf0.1
  * embeddings with distinct ids and identical content, 1×/4×/16×
  * (2k → 32k vectors, 16× ≈ the sf1-equivalent corpus).
  *
  * What it measures per scale m:
  *   - `pq_encode`:   the one-time corpus encode pass (codebook fit +
  *                    nearest-codeword assignment) — PQ's promise is
  *                    that this pass is the ONLY corpus visit; expected
  *                    ~linear in n.
  *   - `pq_adc`:      flat PQ-ADC query (sim_pq_topk's config, M=4
  *                    K=16): candidates = n−1 per query BY DESIGN (flat
  *                    PQ scans every code) — the contrast line that
  *                    shows why IVF-PQ exists.
  *   - `ivfpq auto`:  ivfPqTopK with the default √n centroid sizing —
  *                    candidates/query ≈ nprobe·√n (grows as √n: the
  *                    classic IVF trade; 16× corpus → ~4× candidates).
  *   - `ivfpq fixedlist`: centroids scaled LINEARLY with n (C = n/128,
  *                    list size pinned ≈128) — the probe-list bound in
  *                    its flat form: candidates/query stays ≈
  *                    nprobe·128 as the corpus grows.
  *   - `mmr` vs `mmr_ivf`: brute-pooled MMR's relevance pass is
  *                    corpus-linear; the IVF pool is probe-list-bounded
  *                    — same candidate accounting as ivfpq.
  * Candidate counts come from the same public ivfAssign the operators
  * use (probes crn ≤ nprobe ⨝ owning lists crn = 1). Results narrated
  * in SCALING.md §round-15. */
object ScaleSmokeR15 {
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

    val sf = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def rep(df: DataFrame, n: Int): DataFrame =
      (0 until n).map(k =>
        df.withColumn("vec_id", col("vec_id") + lit(k * 100000000L)))
        .reduce(_ union _)

    noop(emb.groupBy(col("vec_id") % 7).count()) // codegen/shuffle warmup

    val SUBS = 4; val CBK = 16; val SUB = 64 / SUBS // sim_pq_topk's M/K
    val scales = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(1, 4, 16)
    scales.foreach { m =>
      val v = rep(emb, m).repartition(32).cache()
      val n = v.count()
      println(s"--- x$m: $n vectors ---")

      // one-time encode pass: codebook fit + nearest-codeword assignment
      time(s"pq_encode x$m") {
        val fx = Similarity.fixedPoint(v, "vec_id", "embedding")
          .localCheckpoint(eager = false)
        noop(Similarity.pqCodes(
          fx, Similarity.pqCodebook(fx, SUBS, CBK, SUB), SUB))
      }
      // flat PQ-ADC query (candidates = n−1 per query by design)
      time(s"pq_adc x$m (cand/query=${n - 1})") {
        noop(Similarity.pqTopK(v, "vec_id", "embedding", _ < 5, 3))
      }

      // IVF-PQ, default √n centroid sizing
      val autoC = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
      val candAuto = candPerQuery(v, autoC, nprobe = 2)
      time(f"ivfpq auto  x$m (C=$autoC, cand/query=$candAuto%.0f)") {
        noop(Similarity.ivfPqTopK(v, "vec_id", "embedding", _ < 5, 3,
          nCentroids = 0, nprobe = 2))
      }
      // IVF-PQ, linear centroid sizing (pinned list size ≈ 128): the
      // probe-list bound in its FLAT form
      val linC = math.max(16, (n / 128L).toInt)
      val candLin = candPerQuery(v, linC, nprobe = 2)
      time(f"ivfpq fixedlist x$m (C=$linC, cand/query=$candLin%.0f)") {
        noop(Similarity.ivfPqTopK(v, "vec_id", "embedding", _ < 5, 3,
          nCentroids = linC, nprobe = 2))
      }

      // MMR: brute pool (corpus-linear relevance pass) vs IVF pool
      time(s"mmr_brute x$m") {
        noop(Similarity.mmrSelect(v, "vec_id", "embedding",
          2L, 16, 6, 700000L))
      }
      time(f"mmr_ivf   x$m (auto C, cand/query=$candAuto%.0f)") {
        noop(Similarity.mmrSelectIvf(v, "vec_id", "embedding",
          2L, 16, 6, 700000L, nCentroids = 0, nprobe = 2))
      }
      v.unpersist()
    }
    spark.stop()
  }

  /** Mean per-query candidate count of the (probes crn ≤ nprobe) ⨝
    * (owning lists crn = 1) join — the exact candidate set ivfPqTopK
    * and mmrSelectIvf score, counted with the same public ivfAssign. */
  private def candPerQuery(v: DataFrame, nCentroids: Int,
      nprobe: Int): Double = {
    val ranked = graft.operators.Similarity
      .ivfAssign(v, "vec_id", "embedding", nCentroids)
      .filter(col("crn") <= nprobe).cache()
    val lists = ranked.filter(col("crn") === 1).select(col("cid"), col("id"))
    val probes = ranked.filter(col("id") < 5)
      .select(col("id").as("qid"), col("cid"))
    val nQ = math.max(1L, probes.select("qid").distinct().count())
    val n = probes.join(lists, Seq("cid"))
      .filter(col("qid") =!= col("id")).count()
    ranked.unpersist()
    n.toDouble / nQ
  }
}
