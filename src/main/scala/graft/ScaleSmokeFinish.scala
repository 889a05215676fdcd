package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke for the round-11 finishing operators: winnowing
  * (fingerprints + overlap pairs), exact heavy hitters, z-order layout
  * audit, triangle counting, DoReMi reweighting, Holt smoothing, SCD2 +
  * attribution, Fellegi–Sunter linkage, JL projection, pHash. Same
  * replication protocol as ScaleSmokeSelect: distinct ids, identical
  * content — so fingerprint collisions, block sizes and near-dup edges
  * GROW with the corpus (the adversarial direction for the pair-making
  * operators, which are measured on the shallower 1×/2×/4× curve).
  * Results narrated in SCALING.md. */
object ScaleSmokeFinish {
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
    val part = spark.read.parquet(s"$sf/part.parquet")

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

    Seq(1, 4, 16).foreach { m =>
      val d = rep(docs, "doc_id", m).repartition(32).cache(); d.count()
      val nd = 5000L * m
      time(s"winnow_fingerprints x$m ($nd docs)") {
        noop(graft.operators.TextAnalysis.winnow(d, "doc_id", "text", 4))
      }
      time(s"heavy_hitters x$m ($nd docs)") {
        noop(graft.operators.TextAnalysis.heavyHitters(d, "text", 1000, 500))
      }
      time(s"doremi x$m ($nd docs)") {
        val t1 = graft.operators.Mixture.unigramLmTable(d, "text", 4096)
          .orderBy("bucket").collect().map(_.getLong(1)).toSeq
        val t2 = graft.operators.Mixture.bigramLmTable(d, "text", 4096)
          .orderBy("bucket").collect().map(_.getLong(1)).toSeq
        noop(graft.operators.Mixture.doremiPlan(d, "source", "text", t1, t2, 4096))
      }
      time(s"phash x$m ($nd images)") {
        noop(graft.operators.Multimodal.perceptualHash(
          graft.operators.Multimodal.withPngBlob(d.select("doc_id"), "doc_id"),
          "doc_id", "img"))
      }
      d.unpersist(blocking = false)

      val e = rep(ev, "event_id", m)
        .withColumn("user_id", col("user_id")
          + (col("event_id") / 10000000L).cast("long") * 10000000L)
        .repartition(32).cache(); e.count()
      val ne = 100000L * m
      time(s"holt x$m ($ne events)") {
        noop(graft.operators.TimeSeries.holt(e, "user_id", "ts", "event_id",
          "value", 0.5, 0.3))
      }
      time(s"scd2 x$m ($ne events)") {
        noop(graft.operators.Warehouse.scd2(e, "user_id", "event_type",
          "ts", "event_id"))
      }
      time(s"attribution x$m ($ne events)") {
        noop(graft.operators.Warehouse.attribution(e, "user_id", "event_type",
          "ts", "event_id", "value", Seq("click", "view"), "purchase"))
      }
      e.unpersist(blocking = false)

      val l = rep(li, "l_orderkey", m).repartition(32).cache(); l.count()
      time(s"zorder_stats x$m (${600000L * m} rows)") {
        noop(graft.operators.Layout.zorderStats(
          l.select((col("l_extendedprice").cast(
              org.apache.spark.sql.types.DecimalType(20, 6)) * 1000000L)
              .cast("long").as("x"),
            col("l_partkey").cast("long").as("y")), "x", "y", 8))
      }
      l.unpersist(blocking = false)

      val v = rep(emb, "vec_id", m).repartition(32).cache(); v.count()
      time(s"rand_proj x$m (${2000L * m} vecs)") {
        noop(graft.operators.Similarity.randomProjection(v, "vec_id",
          "embedding", 8))
      }
      v.unpersist(blocking = false)
    }

    // pair-making operators: content replication grows shared
    // fingerprints / block sizes, so PAIRS grow ~quadratically in the
    // copy count — the disclosed adversarial direction; shallower curve
    Seq(1, 2, 4).foreach { m =>
      val d = rep(docs, "doc_id", m).repartition(32).cache(); d.count()
      time(s"winnow_pairs x$m (${5000L * m} docs)") {
        noop(graft.operators.Dedup.winnowPairs(d, "doc_id", "text", 4, 2L))
      }
      time(s"triangles x$m (${5000L * m} docs)") {
        noop(graft.operators.Dedup.triangles(
          graft.operators.Dedup.jaccardPairs(d, "doc_id", "text", 0.6),
          "da", "db"))
      }
      time(s"winnow_incremental x$m (${5000L * m} docs)") {
        noop(graft.operators.Dedup.incrementalWinnow(
          d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", 4, 2L))
      }
      time(s"phash_pairs x$m (${5000L * m} images)") {
        noop(graft.operators.Multimodal.nearDupPairsPhash(
          graft.operators.Multimodal.withPngBlob(d.select("doc_id"), "doc_id"),
          "doc_id", "img", maxHd = 3))
      }
      d.unpersist(blocking = false)
      val p = rep(part, "p_partkey", m).repartition(32).cache(); p.count()
      time(s"fs_linkage x$m (${20000L * m} parts)") {
        noop(graft.operators.Linkage.fellegiSunter(p, "p_partkey", "p_size",
          Seq("brand" -> col("p_brand"), "type" -> col("p_type"),
            "price_band" -> floor(col("p_retailprice") / 100.0).cast("long")),
          m = 0.9))
      }
      p.unpersist(blocking = false)
    }
    spark.stop()
  }
}
