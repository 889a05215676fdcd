package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke for the round-12 operators: prefix-filtered Jaccard
  * (vs the full inverted index — wall AND posting mass), corpus
  * novelty, k-core peeling, interval-overlap join, MERGE apply +
  * snapshot diff, transition matrix, k-center selection. Replication
  * protocol of ScaleSmokeSelect/Finish: distinct ids, identical
  * content, so near-dup edges and gram collisions GROW with the corpus
  * (the adversarial direction for pair-making operators — those run
  * the shallow 1×/2×/4× curve; linear per-row operators run 1×/4×/16×).
  * Results narrated in SCALING.md. */
object ScaleSmokeR12 {
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
    val ord = spark.read.parquet(s"$sf/orders.parquet")
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
        df.withColumn(idCol, col(idCol) + lit(k * 10000000L)))
        .reduce(_ union _)

    noop(docs.groupBy("source").count()) // codegen/shuffle warmup

    // pair-making operators: adversarial 1x/2x/4x (dup edges grow)
    Seq(1, 2, 4).foreach { m =>
      val d = rep(docs, "doc_id", m).repartition(32).cache(); d.count()
      time(s"jaccard_full x$m") {
        noop(graft.operators.Dedup.jaccardPairs(d, "doc_id", "text", 0.6))
      }
      time(s"jaccard_prefix x$m") {
        noop(graft.operators.Dedup.jaccardPairsPrefix(d, "doc_id", "text", 3, 5))
      }
      if (m == 4) { // posting-mass comparison, once
        val sd = graft.operators.Dedup.shingleDocs(d, "doc_id", "text")
          .localCheckpoint(true)
        val full = sd.select(explode(col("ds"))).count()
        val inv = sd.select(col("id"), col("nd"), explode(col("ds")).as("h"))
        val dfr = inv.groupBy("h").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("df"), col("h"))
        val pref = inv.join(dfr, Seq("h"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= col("nd") - expr("(3 * nd + 4) div 5") + 1)
          .count()
        println(s"postings x$m: full=$full prefix=$pref " +
          f"(${100.0 * pref / full}%.1f%%)")
      }
      time(s"kcore x$m") {
        noop(graft.operators.Dedup.kCore(
          graft.operators.Dedup.jaccardPairs(d, "doc_id", "text", 0.6),
          "da", "db", 2, 3))
      }
      time(s"novelty x$m") {
        noop(graft.operators.TextAnalysis.novelty(d, "doc_id", "text", 8))
      }
      d.unpersist()
    }

    // interval overlap: event intervals, replication grows per-user density
    Seq(1, 2, 4).foreach { m =>
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

    // linear per-row/agg operators: 1x/4x/16x
    Seq(1, 4, 16).foreach { m =>
      val o = rep(ord, "o_orderkey", m).repartition(32).cache(); o.count()
      val k = col("o_orderkey")
      def cents = (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 6))
        * 100).cast("long")
      val target = o.select(k.as("k"), cents.as("v"))
      val src = o.filter(k % 3 === 0).select(k.as("k"), lit(1L).as("seq"),
        when(k % 9 === 0, lit("delete")).otherwise(lit("upsert")).as("op"),
        (cents + 12345L).as("v"))
      time(s"merge_apply x$m") {
        noop(graft.operators.Warehouse.mergeUpsert(target, src, "k", "v", "seq", "op"))
      }
      time(s"snapshot_diff x$m") {
        val after = graft.operators.Warehouse.mergeUpsert(target, src, "k", "v", "seq", "op")
        noop(graft.operators.Warehouse.snapshotDiff(target, after, "k", "v"))
      }
      o.unpersist()
      val e2 = rep(ev, "event_id", m).repartition(32).cache(); e2.count()
      time(s"transitions x$m") {
        noop(graft.operators.Warehouse.transitions(e2, "user_id", "event_type", "ts", "event_id"))
      }
      e2.unpersist()
      val v = rep(emb, "vec_id", m).repartition(32).cache(); v.count()
      time(s"kcenter_k4 x$m") {
        noop(graft.operators.Similarity.kCenter(v, "vec_id", "embedding", 4))
      }
      v.unpersist()
    }
    spark.stop()
  }
}
