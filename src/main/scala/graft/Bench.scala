package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the declared queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query and total wall seconds.
  *
  * A short warmup (tiny-table queries) runs first so the timed pass
  * measures steady-state execution, not JVM/codegen/classloading
  * startup — the reference's perfplot benchmarks similarly time warmed
  * processes (examples/swifter_speed_comparison.ipynb).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warmup on the smallest scale factor: exercises parquet reader,
    // codegen, shuffle, window, HOF expression paths once.
    val warmDir = "/root/testdata/sf0.001"
    // text_quality additionally warms the higher-order-function (lambda)
    // expression machinery shared by the text/dedup/similarity queries —
    // its first execution in a fresh JVM costs ~4s regardless of data size
    Seq("o4_groupby_agg", "rel_window_rank", "o1_apply_vec", "text_fingerprint",
        "text_quality")
      .foreach { q =>
        SparkEntry.queries.get(q).foreach { fn =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
      }

    // noop sink forces full evaluation of every output column — count()
    // would let Catalyst prune the computed projections away. A failed
    // query records -1, NOT its elapsed time: a crash must never read as
    // a fast success in the bench JSON.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      } finally {
        // Drop Dataset caches the query pinned (cache() without unpersist
        // is the normal single-query idiom here): across 110 queries the
        // orphaned blocks otherwise accumulate until old-gen full-GC
        // pauses land on later queries. Memoized cross-query frames use
        // localCheckpoint, which this does not touch. Outside the timer.
        spark.catalog.clearCache()
      }
    }
    val failed = results.count(_._2 < 0)
    def toJson(rs: Seq[(String, Double)], extra: String = ""): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val total = results.filter(_._2 >= 0).map(_._2).sum
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"failed":$failed,"n_queries":${results.size},"sf":"$sfDir"$extra}"""
    }
    val full = toJson(results)
    // The driver captures only a ~2KB stdout TAIL: with 100+ queries the
    // full line (~2.7KB) gets its head cut and fails to parse (r4–r6 all
    // recorded parsed:null). Print the full line first for humans, then a
    // compact line — slowest queries only, sized to fit the capture window
    // whole — LAST, so the scrape always ends with one complete JSON
    // object. The complete per-query map also lands in bench_out.json.
    println(full)
    val budget = 1400 // bytes for the compact queries map
    val slowest = results.sortBy(-_._2)
    val keep = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 0
    slowest.foreach { case (k, v) =>
      val w = k.length + 12
      if (used + w <= budget) { keep += ((k, v)); used += w }
    }
    println(toJson(keep.sortBy(_._1).toSeq,
      s""","queries_shown":${keep.size},"full":"bench_out.json""""))
    // belt and braces for the stdout scrape: also land the JSON in a file
    // (driver or human can read bench_out.json when the tail truncates)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out: ${e.getMessage}") }
    spark.stop()
  }
}
