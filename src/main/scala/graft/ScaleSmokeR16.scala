package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 scale measurements behind SCALING.md's r16 note:
  *
  *  1. trained-family cost curve to 64× (r15 verdict item 5): the r15
  *     1×/4×/16× training walls were JVM-overhead-dominated and
  *     non-monotone; the 64× point (ScaleSmokeSelect's
  *     SPARK_GRAFT_SMOKE_MULTS protocol, default 1,16,64) makes the
  *     linear slope visible for `pqCodebookTrained` (train + encode
  *     pass) and `kMeansAssign`.
  *
  *  2. two-level IVF broadcast bound (r15 verdict item 1's ScaleSmoke
  *     row): single-level IVF with FIXED-SIZE (~128-row) lists needs a
  *     C = n∕128-row broadcast centroid table — growing linearly with
  *     the corpus — while `ivfTopK2` holds the broadcast at the √n
  *     coarse table and reaches the same n∕128 total list count via
  *     per-list sub-centroids (equi-joined, shuffled, never broadcast).
  *     Per-query candidates (measured as the full pre-top-k candidate
  *     row count via k = MaxValue, the external-instrumentation trick)
  *     must stay list-bounded (~nprobe1·nprobe2·L) on both paths; the
  *     broadcast row count is the column that diverges.
  */
object ScaleSmokeR16 {
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

    // FULL warm pass (unmeasured): the first execution of each plan
    // family pays Janino/JIT, not data cost — the first measured run of
    // this harness read 73.9 s for a kMeansAssign the driver's warmed
    // bench does in ~1 s, purely first-touch (the same lesson Bench's
    // warm-all pass encodes). Warm every plan shape the loops time.
    locally {
      val fxW = Similarity.fixedPoint(emb, "vec_id", "embedding")
        .localCheckpoint(eager = false)
      val cbW = Similarity.pqCodebookTrained(fxW, 4, 16, 16, 2)
        .localCheckpoint(eager = false)
      cbW.count()
      val svW = fxW.crossJoin(spark.range(4).select(col("id").cast("int").as("m")))
        .select(col("id"), col("m"), expr("slice(fx, m * 16 + 1, 16)").as("svec"))
      svW.join(broadcast(cbW), Seq("m"))
        .select(col("id"), col("m"),
          aggregate(zip_with(col("svec"), col("cvec"),
            (x, y) => (x - y) * (x - y)), lit(0L), (a, v) => a + v).as("d2"),
          col("cid"))
        .groupBy(col("id"), col("m"))
        .agg(min(struct(col("d2"), col("cid"))).getField("cid").as("cid"))
        .write.format("noop").mode("overwrite").save()
      Similarity.kMeansAssign(emb, "vec_id", "embedding", k = 8, iters = 2)
        .write.format("noop").mode("overwrite").save()
      Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 5,
        k = 10, nCentroids = 15, nprobe = 2).count()
      Similarity.ivfTopK2(emb, "vec_id", "embedding", _ < 5,
        k = 10, nCoarse = 45, nSub = 2, nprobe1 = 2, nprobe2 = 2).count()
    }

    // Between-measurement sweep + best-of-2 per cell: the first two runs
    // of this harness read wildly non-monotone walls (train 143.7 s then
    // 14.1 s at the SAME x64 cell; a 73.9 s x1 kMeansAssign the driver's
    // bench does in ~1 s) — ContextCleaner backlog from the previous
    // cell and JVM state landing inside the next timer, exactly what
    // Bench.sweep + the retime pass exist to absorb. Same medicine here.
    // sweep drops only the ORPHANS a timed run leaves behind (operator-
    // internal checkpointed slices): unpersisting a SHARED
    // localCheckpoint'd frame (corpus/fx/cb) would truncate its lineage
    // for good — Bench.sweep's keep-set rule, applied per cell
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

    // End-of-cell cleanup: each cell's corpus/fx/cb localCheckpoint
    // frames are dead once the cell prints, but best2's keep-set
    // re-snapshot would carry them forever — at x64 the x1 and x16
    // corpora would still be resident, memory pressure skewing the very
    // slope this harness measures. Unpersist every RDD the cell created.
    def dropCellFrames(before: Set[Int]): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before(id)) rdd.unpersist(blocking = false)
      }

    println("trained-family cost to 64x (best-of-2 walls; expect ~linear slope in n)")
    println("  mult       n  pq_train_s  pq_encode_s  kmeans_s")
    for (m <- mults) {
      val cellRdds0 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val corpus = rep(emb, m).repartition(cpus.toInt)
        .localCheckpoint(eager = false)
      val n = corpus.count()
      val fx = Similarity.fixedPoint(corpus, "vec_id", "embedding")
        .localCheckpoint(eager = false)
      fx.count() // materialize OUTSIDE the timers (shared input, not op cost)
      val tTrain = best2(() =>
        Similarity.pqCodebookTrained(fx, 4, 16, 16, 2).count())
      // encode pass: every corpus vector to its per-subspace arg-min
      // codeword — the index-build cost that rides on top of training
      val cb = Similarity.pqCodebookTrained(fx, 4, 16, 16, 2)
        .localCheckpoint(eager = false)
      cb.count()
      val tEnc = best2 { () =>
        val sv = fx.crossJoin(spark.range(4).select(col("id").cast("int").as("m")))
          .select(col("id"), col("m"), expr("slice(fx, m * 16 + 1, 16)").as("svec"))
        sv.join(broadcast(cb), Seq("m"))
          .select(col("id"), col("m"),
            aggregate(zip_with(col("svec"), col("cvec"),
              (x, y) => (x - y) * (x - y)), lit(0L), (a, v) => a + v).as("d2"),
            col("cid"))
          .groupBy(col("id"), col("m"))
          .agg(min(struct(col("d2"), col("cid"))).getField("cid").as("cid"))
          .write.format("noop").mode("overwrite").save()
      }
      val tKm = best2(() =>
        Similarity.kMeansAssign(corpus, "vec_id", "embedding", k = 8, iters = 2)
          .write.format("noop").mode("overwrite").save())
      println(f"  x$m%3d  $n%8d  $tTrain%9.2f  $tEnc%10.2f  $tKm%8.2f")
      dropCellFrames(cellRdds0)
    }

    println("two-level IVF vs single-level fixed-128 lists " +
      "(broadcast rows vs per-query candidates; best-of-2 walls)")
    println("  mult       n  bcast_1lvl  bcast_2lvl  cand_1lvl  cand_2lvl  w1_s  w2_s")
    for (m <- mults) {
      val cellRdds0 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val corpus = rep(emb, m).repartition(cpus.toInt)
        .localCheckpoint(eager = false)
      val n = corpus.count()
      val nQ = 5L
      // single-level fixed-list sizing: C = n/128 centroids ALL broadcast
      val cFixed = math.max(4, (n / 128L).toInt)
      var cand1 = 0L
      val w1 = best2(() => cand1 = Similarity.ivfTopK(corpus, "vec_id",
        "embedding", _ < 5, k = Int.MaxValue,
        nCentroids = cFixed, nprobe = 2).count())
      // two-level: √n coarse broadcast (auto), nSub sized so total lists
      // ≈ n/128 — the broadcast stays √n while list count matches
      val cCoarse = Similarity.autoCentroids(n)
      val nSub = math.max(1, math.ceil(n.toDouble / 128.0 / cCoarse).toInt)
      var cand2 = 0L
      val w2 = best2(() => cand2 = Similarity.ivfTopK2(corpus, "vec_id",
        "embedding", _ < 5, k = Int.MaxValue, nCoarse = cCoarse,
        nSub = nSub, nprobe1 = 2, nprobe2 = 2).count())
      println(f"  x$m%3d  $n%8d  $cFixed%10d  $cCoarse%10d" +
        f"  ${cand1 / nQ}%9d  ${cand2 / nQ}%9d  $w1%4.1f  $w2%4.1f")
      dropCellFrames(cellRdds0)
    }
    spark.stop()
  }
}
