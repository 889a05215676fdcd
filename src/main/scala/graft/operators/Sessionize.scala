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
  * Scale: one shuffle on the user key; per-group state is a sort of that
  * user's events. For pathological single-user skew, pre-split by
  * (user, day) and merge boundary sessions in a second pass — noted in
  * SCALING.md.
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
}
