package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 scale-up smoke: extend the round-12 curves to an sf1-
  * EQUIVALENT row count (×10 replication of the sf0.1 tables, the
  * largest driver-generated fixture) for the four round-12 newcomers —
  * prefix-filtered Jaccard (PPJoin), converged k-core, interval-overlap
  * grid join, correlation matrix — plus the round-13 retrieval trio at
  * ×16 embeddings. Replication protocol of ScaleSmokeR12: distinct ids,
  * identical content, so near-dup edges and gram collisions GROW with
  * the corpus (the adversarial direction for pair-makers, which run the
  * shallow curve; linear per-row/agg operators run 1×/4×/16×). Results
  * narrated in SCALING.md. */
object ScaleSmokeR13 {
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

    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ev = queries.Tables.t(spark, sf, "events")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def rep(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(k =>
        df.withColumn(idCol, col(idCol) + lit(k * 100000000L)))
        .reduce(_ union _)

    noop(docs.groupBy("source").count()) // codegen/shuffle warmup

    // pair-makers, adversarial replication: 1x/4x/10x docs (10x = 50k
    // docs = the sf1-equivalent corpus; dup-edge count grows ~m^2)
    Seq(1, 4, 10).foreach { m =>
      val d = rep(docs, "doc_id", m).repartition(32).cache(); d.count()
      time(s"jaccard_prefix x$m") {
        noop(graft.operators.Dedup.jaccardPairsPrefix(d, "doc_id", "text", 3, 5))
      }
      time(s"kcore_conv x$m") {
        noop(graft.operators.Dedup.kCoreConverged(
          graft.operators.Dedup.jaccardPairs(d, "doc_id", "text", 0.6),
          "da", "db", 2))
      }
      d.unpersist()
    }

    // interval-overlap grid: 1x/4x/16x events (16x = 1.6M intervals,
    // per-user density grows with m — the grid-cell fanout stressor)
    Seq(1, 4, 16).foreach { m =>
      val e = rep(ev, "event_id", m)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * 3600000000L).as("e"))
        .repartition(32).cache(); e.count()
      time(s"interval_overlap x$m") {
        noop(graft.operators.RangeJoin.intervalOverlap(
          e.filter(col("event_id") % 2 === 0), e.filter(col("event_id") % 2 =!= 0),
          Seq("user_id"), "event_id", "s", "e", "event_id", "s", "e",
          7200000000L))
      }
      e.unpersist()
    }

    // single-pass aggregate: 1x/4x/16x lineitem (16x = 9.6M rows; the
    // corr matrix is ONE map-side-combined aggregate, expected ~linear)
    Seq(1, 4, 16).foreach { m =>
      val l = rep(li, "l_orderkey", m).repartition(32).cache(); l.count()
      time(s"corr_matrix x$m") {
        noop(graft.operators.Binning.corrMatrix(l,
          Seq("l_quantity", "l_extendedprice", "l_discount")))
      }
      l.unpersist()
    }

    // round-13 retrieval trio: 1x/4x/16x embeddings (16x = 32k vectors;
    // MMR pool build is one broadcast-query pass + TakeOrdered, RRF one
    // pass + two windows — both expected ~linear in the corpus)
    Seq(1, 4, 16).foreach { m =>
      val v = rep(emb, "vec_id", m).repartition(32).cache(); v.count()
      time(s"mmr x$m") {
        noop(graft.operators.Similarity.mmrSelect(v, "vec_id", "embedding",
          2L, 16, 6, 700000L))
      }
      time(s"rrf_fusion x$m") {
        noop(graft.operators.Similarity.rrfFuseTopK(v, "vec_id", "embedding",
          id => id < 5, 10, 5))
      }
      v.unpersist()
    }
    spark.stop()
  }
}
