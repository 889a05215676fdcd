package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based sessionization: events of a user belong to one session while
  * consecutive gaps stay ≤ `gap`. Batch implementation via
  * `groupByKey.flatMapGroups` (arbitrary per-group logic — the O4
  * machinery applied to a real pipeline op); the streaming twin lives in
  * [[graft.streaming.StreamOps]] using flatMapGroupsWithState.
  *
  * Scale: [[sessions]] is one shuffle on the user key with per-group
  * state = a sort of that user's events — unbounded for a pathological
  * single hot user. [[sessionsSkewSafe]] removes that bound: pass 1
  * sessionizes per (user, day) — group memory capped at one user-DAY of
  * events — pass 2 merges sessions that touch across day boundaries,
  * operating on SESSION rows (orders of magnitude smaller than events).
  * Gap-merging of time-ordered segments is associative, so the two-pass
  * result is exactly the single-pass result (proven by the differential
  * spec, including a synthetic one-user hot-key input).
  */
object Sessionize {

  val outSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("session_idx", LongType),
    StructField("n_events", LongType),
    StructField("sess_sum", DoubleType),
    StructField("start_us", LongType),
    StructField("end_us", LongType)))

  /** Batch sessionize of an events table (user_id, ts, value, event_id). */
  def sessions(events: DataFrame, gapMinutes: Long): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val in = events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("value"), col("event_id"))
    in.groupByKey(_.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroups { (uid: Long, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var sessIdx = 0L
        var n = 0L
        var sum = BigDecimal(0)
        var start = 0L; var last = 0L
        def emit(): Unit = if (n > 0) {
          out += Row(uid, sessIdx, n, sum.toDouble, start, last)
        }
        rows.foreach { r =>
          val ts = r.getAs[Long]("ts_us")
          if (n == 0) { sessIdx = 1L; start = ts }
          else if (ts - last > gapUs) {
            emit(); sessIdx += 1; n = 0; sum = BigDecimal(0); start = ts
          }
          n += 1
          sum += BigDecimal(r.getAs[Double]("value"))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          last = ts
        }
        emit()
        out.iterator
      }(Encoders.row(outSchema))
  }

  private val partialSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n_events", LongType),
    StructField("sum_micro", LongType),
    StructField("start_us", LongType),
    StructField("end_us", LongType)))

  /** Skew-safe sessionize: (user, day) pre-split + boundary merge.
    * Identical output to [[sessions]]; two shuffles instead of one, but
    * per-group memory in the heavy pass is bounded by one user-day.
    * Values are carried as exact 1e-6 fixed-point micros so the two-pass
    * sum is bit-identical to the one-pass BigDecimal sum. */
  def sessionsSkewSafe(events: DataFrame, gapMinutes: Long): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val dayUs = 86400L * 1000000L
    val in = events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("event_id"))
      .withColumn("day", floor(col("ts_us") / dayUs).cast("long"))

    // pass 1: gap-sessions within each (user, day) — emits PARTIAL
    // sessions (no index yet; sums in exact micros)
    val partial = in
      .groupByKey(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))(
        Encoders.product[(Long, Long)])
      .flatMapGroups { (key: (Long, Long), it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var n = 0L; var sumMicro = 0L; var start = 0L; var last = 0L
        def emit(): Unit = if (n > 0) out += Row(key._1, n, sumMicro, start, last)
        rows.foreach { r =>
          val ts = r.getAs[Long]("ts_us")
          if (n == 0) start = ts
          else if (ts - last > gapUs) { emit(); n = 0; sumMicro = 0L; start = ts }
          n += 1
          sumMicro += math.round(BigDecimal(r.getAs[Double]("value"))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
          last = ts
        }
        emit()
        out.iterator
      }(Encoders.row(partialSchema))

    // pass 2: per user over SESSION rows (small), merge day-boundary
    // neighbors closer than the gap, then number the merged sessions.
    // (Positional getters: rows flow object-to-object from pass 1's
    // flatMapGroups without a re-attached schema, so name lookup throws.)
    partial.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (uid: Long, it: Iterator[Row]) =>
        val ss = it.toArray.sortBy(_.getLong(3)) // start_us
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var idx = 0L
        var i = 0
        while (i < ss.length) {
          var n = ss(i).getLong(1) // n_events
          var sumMicro = ss(i).getLong(2) // sum_micro
          val start = ss(i).getLong(3)
          var end = ss(i).getLong(4) // end_us
          var j = i + 1
          while (j < ss.length && ss(j).getLong(3) - end <= gapUs) {
            n += ss(j).getLong(1)
            sumMicro += ss(j).getLong(2)
            end = ss(j).getLong(4)
            j += 1
          }
          idx += 1
          out += Row(uid, idx, n, sumMicro / 1e6, start, end)
          i = j
        }
        out.iterator
      }(Encoders.row(outSchema))
  }
}
