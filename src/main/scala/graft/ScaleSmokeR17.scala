package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 scale measurement behind SCALING.md's r17 note (r16 verdict
  * item 5's evidence row): per-query CANDIDATE cost of the IVF2-PQ
  * composition stays flat as the corpus grows (probed-sub-list bounded,
  * ≈ nprobe1·nprobe2·L with fixed-L sizing), while exhaustive exact
  * scoring grows linearly with n — and the ADC arm reads M = 4 code
  * lookups per candidate where the exact arm reads the 64-dim vector.
  *
  * Three arms per corpus multiple, all scored to k = ∞ so the counted
  * output rows ARE the scored-candidate set (the external-
  * instrumentation trick from ScaleSmokeR16):
  *  - brute: [[graft.operators.Similarity.bruteForceTopK]] — exact
  *    scoring of every corpus vector per query (the n−1 baseline).
  *  - ivf2:  [[graft.operators.Similarity.ivfTopK2]] — two-level probed
  *    lists, exact 64-dim scoring per candidate.
  *  - ivf2pq: [[graft.operators.Similarity.ivf2PqTopK]] — same lists,
  *    trained-ADC scoring (walls include codebook training + encode,
  *    the disclosed one-time index-build passes that grow with n;
  *    the CANDIDATE columns are the flat-vs-linear claim).
  */
object ScaleSmokeR17 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = sys.env.getOrElse("SPARK_GRAFT_SMOKE_MULTS", "1,16,64")
      .split(',').map(_.trim.toInt).toSeq
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

    def rep(df: DataFrame, n: Int): DataFrame =
      (0 until n).map(k =>
        df.withColumn("vec_id", col("vec_id") + lit(k * 100000000L)))
        .reduce(_ unionByName _)

    // warm every plan family once (unmeasured — the ScaleSmokeR16 lesson:
    // first-touch Janino/JIT otherwise lands inside the first cell)
    locally {
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 5, 10).count()
      Similarity.ivfTopK2(emb, "vec_id", "embedding", _ < 5,
        k = 10, nCoarse = 45, nSub = 2, nprobe1 = 2, nprobe2 = 2).count()
      Similarity.ivf2PqTopK(emb, "vec_id", "embedding", _ < 5,
        k = 10, nCoarse = 45, nSub = 2, nprobe1 = 2, nprobe2 = 2,
        iters = 2).count()
    }

    def sweep(keep: Set[Int]): Unit = {
      graft.core.Caches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep(id)) rdd.unpersist(blocking = false)
      }
      System.gc()
    }
    def best2(run: () => Unit): Double = {
      val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
      (1 to 2).map { _ =>
        sweep(keep)
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    def dropCellFrames(before: Set[Int]): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before(id)) rdd.unpersist(blocking = false)
      }

    println("IVF2-PQ candidate bound vs exhaustive exact scoring " +
      "(k = MaxValue counts = scored candidates per 5 queries; best-of-2 walls)")
    println("  mult       n  cand_brute  cand_ivf2  cand_ivf2pq  w_brute  w_ivf2  w_ivf2pq")
    for (m <- mults) {
      val cellRdds0 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val corpus = rep(emb, m).repartition(cpus.toInt)
        .localCheckpoint(eager = false)
      val n = corpus.count()
      val nQ = 5L
      // fixed-128 lists: √n coarse book, nSub sized so lists stay ~128
      val cCoarse = Similarity.autoCentroids(n)
      val nSub = math.max(1, math.ceil(n.toDouble / 128.0 / cCoarse).toInt)
      var cBrute = 0L; var cIvf2 = 0L; var cPq = 0L
      val wB = best2(() => cBrute = Similarity.bruteForceTopK(corpus,
        "vec_id", "embedding", _ < 5, k = Int.MaxValue).count())
      val w2 = best2(() => cIvf2 = Similarity.ivfTopK2(corpus, "vec_id",
        "embedding", _ < 5, k = Int.MaxValue, nCoarse = cCoarse,
        nSub = nSub, nprobe1 = 2, nprobe2 = 2).count())
      val wP = best2(() => cPq = Similarity.ivf2PqTopK(corpus, "vec_id",
        "embedding", _ < 5, k = Int.MaxValue, nCoarse = cCoarse,
        nSub = nSub, nprobe1 = 2, nprobe2 = 2, iters = 2).count())
      println(f"  x$m%3d  $n%8d  ${cBrute / nQ}%10d  ${cIvf2 / nQ}%9d" +
        f"  ${cPq / nQ}%11d  $wB%7.1f  $w2%6.1f  $wP%8.1f")
      dropCellFrames(cellRdds0)
    }
    spark.stop()
  }
}
