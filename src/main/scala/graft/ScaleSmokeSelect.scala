package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke for the selection/staging operators added after the
  * round-11 mid-point: phrase search, curriculum staging, CCNet
  * buckets, interpolated bigram perplexity, weighted / per-stratum
  * sampling, k-anonymity, D4 pruning. Replicates the sf0.1 tables with
  * DISTINCT ids (content unchanged — duplicated phrases and repeated
  * language mass GROW with the corpus, the adversarial direction) and
  * measures the cost curve at 1×/4×/16× (embeddings 1×/2×/4×: the D4
  * within-cluster term is the quadratic-by-design one). Results are
  * narrated in SCALING.md.
  */
object ScaleSmokeSelect {
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
        col("text"), col("lang"), col("source"), col("n_chars")))
      .reduce(_ union _)
    def repEmb(n: Int): DataFrame = (0 until n).map(k =>
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        col("embedding"))).reduce(_ union _)

    // warmup (codegen + shuffle machinery)
    noop(docs.groupBy("source").count())

    val B = 4096
    // SPARK_GRAFT_SMOKE_MULTS=1,4,16,64 deepens the doc curve on demand
    val docMults = sys.env.get("SPARK_GRAFT_SMOKE_MULTS")
      .map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
    docMults.foreach { m =>
      val d = repDocs(m).repartition(32).cache()
      d.count()
      val nd = 5000L * m
      time(s"phrase_search x$m ($nd docs)") {
        noop(graft.operators.Ranking.phraseSearch(d, "doc_id", "text",
          Seq("table hash", "customer join", "slow hash batch")))
      }
      val t1 = graft.operators.Mixture.unigramLmTable(d, "text", B)
        .orderBy("bucket").collect().map(_.getLong(1)).toSeq
      time(s"curriculum_stages x$m (post-fit)") {
        noop(graft.operators.Mixture.curriculumStages(
          d, "doc_id", "text", t1, B, 4))
      }
      time(s"ccnet_buckets x$m (post-fit)") {
        noop(graft.operators.Mixture.ccnetBuckets(
          d, "doc_id", "text", "lang", t1, B))
      }
      val t2 = graft.operators.Mixture.bigramLmTable(d, "text", B)
        .orderBy("bucket").collect().map(_.getLong(1)).toSeq
      time(s"perplexity_interp x$m (post-fit)") {
        noop(graft.operators.Mixture.perplexityScoreInterp(
          d, "doc_id", "text", t1, t2, B, 3, 4))
      }
      time(s"sample_weighted x$m") {
        val ws = split(col("text"), " ")
        val w = size(array_distinct(ws)).cast("long").cast("double") /
          size(ws).cast("long").cast("double")
        noop(graft.operators.Sampling.weighted(
          d.withColumn("keep_w", w), "doc_id", col("keep_w")))
      }
      time(s"stratified_k x$m") {
        noop(graft.operators.Sampling.stratifiedK(d, "doc_id", "source", 20))
      }
      time(s"k_anonymity x$m") {
        noop(graft.operators.TextAnalysis.kAnonymity(
          d.select(col("lang"), col("source"),
            floor(col("n_chars") / 64L).cast("long").as("len_bucket")),
          Seq("lang", "source", "len_bucket"), 5L))
      }
      d.unpersist()
    }

    Seq(1, 2, 4).foreach { m =>
      val e = repEmb(m).repartition(32).cache()
      e.count()
      time(s"d4_prune x$m (${2000 * m} vecs, auto-C)") {
        noop(graft.operators.Similarity.d4Prune(
          e, "vec_id", "embedding", 0.45, 0.25))
      }
      e.unpersist()
    }

    // √n IVF default (r11 verdict task 4): nCentroids=0 derives
    // C=⌈√n⌉, so probed candidates per query grow ~√n, not n∕16 —
    // the curve should flatten vs the pinned-16 variant as n grows
    Seq(1, 2, 4, 8).foreach { m =>
      val e = repEmb(m).repartition(32).cache()
      e.count()
      val n = 2000 * m
      time(s"ivf_topk auto-C x$m ($n vecs, C=${graft.operators.Similarity.autoCentroids(n)})") {
        noop(graft.operators.Similarity.ivfTopK(
          e, "vec_id", "embedding", id => id < 5, k = 3))
      }
      time(s"ivf_topk C=16 x$m ($n vecs)") {
        noop(graft.operators.Similarity.ivfTopK(
          e, "vec_id", "embedding", id => id < 5, k = 3, nCentroids = 16))
      }
      e.unpersist()
    }

    // analytics family over replicated events (distinct users per copy,
    // so per-user frames stay bounded — the production shape)
    val events = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    def repEvents(n: Int): DataFrame = (0 until n).map(k =>
      events.select((col("event_id") + lit(k * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 1000000L)).as("user_id"),
        col("event_type"), col("value"))).reduce(_ union _)
    Seq(1, 4, 16).foreach { m =>
      val ev = repEvents(m).repartition(32).cache()
      ev.count()
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ss_ev$m").toString
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      time(s"funnel x$m (${100000L * m} events)") {
        noop(graft.queries.RelationalQueries.queries("rel_funnel")(spark, dir))
      }
      time(s"cohort x$m") {
        noop(graft.queries.RelationalQueries.queries("rel_cohort")(spark, dir))
      }
      time(s"twap x$m") {
        noop(graft.queries.RelationalQueries.queries("rel_twap")(spark, dir))
      }
      ev.unpersist()
    }

    // PageRank over the near-dup graph of replicated docs: edges GROW
    // with replication (every copy pairs with every other copy of its
    // near-dup set) — the adversarial direction for the edge joins
    Seq(1, 2, 4).foreach { m =>
      val d = repDocs(m).repartition(32).cache()
      d.count()
      time(s"pagerank x$m (${5000L * m} docs)") {
        val pairs = graft.operators.Dedup.jaccardPairs(d, "doc_id", "text", 0.6)
        noop(graft.operators.Dedup.pageRank(pairs, "da", "db", 3))
      }
      d.unpersist()
    }
    spark.stop()
  }
}
