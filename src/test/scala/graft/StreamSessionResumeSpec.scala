package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

/** The resume-after-timeout path of [[StreamOps.sessionizeStreamEventTime]]:
  * the bounded harness only ever times sessions out at the END of the
  * replay, so these tests drive the one transition it never exercises —
  * a user whose session was evicted by the event-time timeout returning
  * with ON-TIME data — and the bounded-state guarantee around it.
  */
class StreamSessionResumeSpec extends SparkSpec {

  private val H = 3600L * 1000000L // one hour in µs

  /** Run `sessionizeStreamEventTime` over scripted MemoryStream batches;
    * returns the emitted rows for `uid`. Each element of `batches` is one
    * micro-batch of (user_id, ts_us, value, event_id). */
  private def run(batches: Seq[Seq[(Long, Long, Double, Long)]], uid: Long,
      retentionMinutes: Long, sink: String): Seq[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Double, Long)]
    val src = ms.toDF().toDF("user_id", "ts_us", "value", "event_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.sessionizeStreamEventTime(src, gapMinutes = 10,
        retentionMinutes = retentionMinutes)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(sink).filter(col("user_id") === uid)
      .select(col("session_idx"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("user returning after timeout eviction continues session_idx, not restarts") {
    // t0: user 1's first session. Two sentinel batches (user 99) advance
    // the watermark so the timeout fires (eviction in batch N uses the
    // watermark committed by batch N-1). User 1 then returns with data
    // that is ON-TIME w.r.t. the current watermark; two more sentinel
    // batches evict that second session.
    val t0 = 1000L * H
    val out = run(Seq(
      Seq((1L, t0, 1.0, 1L), (1L, t0 + 60L * 1000000L, 2.0, 2L)),
      Seq((99L, t0 + 1 * H, 0.0, 3L)),
      Seq((99L, t0 + 2 * H, 0.0, 4L)), // evicts session 1 (wm = t0+1h)
      Seq((1L, t0 + 3 * H, 1.0, 5L)),  // on-time return (wm = t0+2h)
      Seq((99L, t0 + 5 * H, 0.0, 6L)),
      Seq((99L, t0 + 6 * H, 0.0, 7L))  // evicts session 2 (wm = t0+5h)
    ), uid = 1L, retentionMinutes = 30L * 24 * 60, sink = "resume_sink")
    // the counter tombstone survived the eviction: the second session is
    // session_idx 2 — (user_id, session_idx) keys stay unique
    assert(out == Seq((1L, 2L), (2L, 1L)), out.mkString(","))
  }

  test("counter tombstone expires after the retention horizon (bounded state)") {
    // same script, but the user returns AFTER retention (1 hour here):
    // the tombstone is gone, the counter restarts at 1 — the documented
    // bounded-state trade, with (user_id, start_us) the durable key
    val t0 = 2000L * H
    val out = run(Seq(
      Seq((1L, t0, 1.0, 1L)),
      Seq((99L, t0 + 1 * H, 0.0, 2L)),
      Seq((99L, t0 + 2 * H, 0.0, 3L)), // evicts session 1; tombstone armed t0+1h
      Seq((99L, t0 + 3 * H, 0.0, 4L)), // wm = t0+2h > t0+1h: tombstone expires
      Seq((1L, t0 + 4 * H, 1.0, 5L)),  // returns past retention
      Seq((99L, t0 + 6 * H, 0.0, 6L)),
      Seq((99L, t0 + 7 * H, 0.0, 7L))
    ), uid = 1L, retentionMinutes = 60, sink = "retention_sink")
    assert(out == Seq((1L, 1L), (1L, 1L)), out.mkString(","))
  }

  test("dynamic-gap session_window: a long-gap event covers a later " +
      "short-gap one; session end is the max member end") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val M = 60L * 1000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // view gap 30min, purchase gap 5min:
    //   view@0 covers purchase@6min (its own 11min end is NOT the
    //   session end); view@29min extends the session to 59min;
    //   purchase@70min starts fresh and closes at 75min
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "purchase", ts(6 * M)),
      (1L, "view", ts(29 * M)), (1L, "purchase", ts(70 * M)))
      .toDF("user_id", "event_type", "ts")
    val out = ev.groupBy(col("user_id"), session_window(col("ts"),
        when(col("event_type") === "purchase", "5 minutes")
          .otherwise("30 minutes")))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"), col("n"))
      .orderBy("s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 59 * M, 3L), (70 * M, 75 * M, 1L)))
  }
}
