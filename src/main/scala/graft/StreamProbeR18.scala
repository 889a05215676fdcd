package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** r18 stream-family instrumentation (r17 verdict item 5: "instrument
  * per-microbatch state-store open/commit wall directly, then act on
  * what dominates"): runs selected stream_* queries through the same
  * noop sink as the bench with a session-wide StreamingQueryListener
  * attached, and prints for every (query, sink, batch) the engine's own
  * duration breakdown — triggerExecution / addBatch / getBatch /
  * queryPlanning / walCommit / commitOffsets — plus the state-operator
  * wall (allUpdatesTimeMs / commitTimeMs / allRemovalsTimeMs) and the
  * RocksDB custom metrics where present. This separates the four
  * candidate costs a bounded replay can pay per microbatch: incremental
  * re-planning (queryPlanning), offset/commit WAL writes (walCommit /
  * commitOffsets), state-store open/commit, and the genuine batch work.
  *
  * Usage: runMain graft.StreamProbeR18 [query ...] (default: a
  * representative set of heavy stateful twins).
  */
object StreamProbeR18 {
  def main(args: Array[String]): Unit = {
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("stream_merge", "stream_transitions", "stream_heavy_hitters",
        "stream_scd2", "stream_holt", "stream_sessionize_dynamic")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala
        val dStr = Seq("triggerExecution", "queryPlanning", "getBatch",
          "latestOffset", "addBatch", "walCommit", "commitOffsets")
          .flatMap(k => d.get(k).map(v => s"$k=$v")).mkString(" ")
        val st = p.stateOperators.toSeq.map { so =>
          val cm = so.customMetrics.asScala
          val rocks = Seq("rocksdbCommitTotalLatencyMs", "loadedMapCacheHitCount",
            "rocksdbGetLatency", "rocksdbPutLatency")
            .flatMap(k => cm.get(k).map(v => s"$k=$v")).mkString(" ")
          s"[op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} updMs=${so.allUpdatesTimeMs} " +
            s"rmMs=${so.allRemovalsTimeMs} commitMs=${so.commitTimeMs} $rocks]"
        }.mkString(" ")
        lines.add(f"${p.name}%-36s batch=${p.batchId}%-3d $dStr $st")
      }
    })

    targets.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          lines.add(s"===== $name =====")
          val t0 = System.nanoTime()
          try fn(spark, dir).write.format("noop").mode("overwrite").save()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[probe] $name FAILED: ${e.getMessage}")
          }
          lines.add(f"===== $name wall=${(System.nanoTime() - t0) / 1e9}%.2fs =====")
      }
    }
    // drain AFTER the runs: progress events are posted asynchronously
    Thread.sleep(1000)
    lines.forEach(l => println(l))
    spark.stop()
  }
}
