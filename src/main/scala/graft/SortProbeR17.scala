package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** r17 measurement probe (scratch): price the final presentation-order
  * Sort that most declared queries carry. The oracle gate sorts rows
  * itself before hashing, so a root-level global Sort is pure
  * presentation; this probe times each named query as declared and with
  * the root Sort stripped, to decide whether removing them is worth the
  * churn. Strip is reflection-only and probe-only — the real change (if
  * it pays) edits the query declarations. */
object SortProbeR17 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir0 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // respool exactly like Bench: N-way-split copies so scans parallelize
    val tgt = java.nio.file.Files.createTempDirectory("graft_probe_sf")
    queries.Tables.deleteOnExit(tgt)
    new java.io.File(sfDir0).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .foreach { f =>
        spark.read.parquet(f.getPath).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$tgt/${f.getName}")
      }
    val sfDir = tgt.toString

    def noop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def stripRootSort(df: DataFrame): Option[DataFrame] = {
      val lp = df.queryExecution.logical
      lp match {
        case s: Sort if s.global =>
          val cls = Class.forName("org.apache.spark.sql.classic.Dataset$")
          val mod = cls.getField("MODULE$").get(null)
          val m = cls.getMethods.find(m =>
            m.getName == "ofRows" && m.getParameterCount == 2).get
          Some(m.invoke(mod, spark, s.child).asInstanceOf[DataFrame])
        case _ => None
      }
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "o5_rolling_corr", "o1_rank_avg", "rel_q1_pricing", "text_ngrams",
      "dedup_jaccard_prefix", "o6_resample_closed_right", "asof_join",
      "o5_rolling_rank", "dedup_span", "rel_q3_shipping")
    println(f"${"query"}%-28s ${"sorted"}%8s ${"stripped"}%8s  delta")
    names.foreach { name =>
      val mk = SparkEntry.queries(name)
      val sorted = mk(spark, sfDir)
      stripRootSort(sorted) match {
        case None => println(f"$name%-28s (no root global Sort)")
        case Some(plain) =>
          noop(sorted); noop(plain) // warm codegen for both shapes
          val ts = (1 to 2).map(_ => noop(mk(spark, sfDir))).min
          val tp = (1 to 2).map(_ => noop(stripRootSort(mk(spark, sfDir)).get)).min
          println(f"$name%-28s $ts%8.3f $tp%8.3f  ${ts - tp}%6.3f")
      }
      spark.catalog.clearCache()
      graft.core.Caches.release()
      val keep = queries.ExtQueries.memoizedRddIds
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
