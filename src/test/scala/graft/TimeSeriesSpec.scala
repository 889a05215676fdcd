package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Holt smoothing: the impulse-table formulation must match the direct
  * textbook recursion to within the disclosed micro-quantization /
  * window-truncation tolerance, and the coefficient support must be a
  * sane bounded window. */
class TimeSeriesSpec extends SparkSpec {

  private val alpha = 0.5
  private val beta = 0.3

  test("coefficient support is bounded and the tables are size-indexed") {
    val (lTab, bTab) = TimeSeries.holtTables(alpha, beta)
    assert(lTab.length == bTab.length)
    assert(lTab.length >= 10 && lTab.length <= 64, s"W=${lTab.length}")
    lTab.zipWithIndex.drop(1).foreach { case (t, i) => assert(t.length == i + 1) }
    // the level coefficients of a long frame sum to ~1 (unit gain)
    assert(math.abs(lTab.last.sum - 1000000L) <= lTab.length,
      s"level gain ${lTab.last.sum}")
  }

  test("holt == direct recursion within quantization tolerance") {
    // sf0.001 events have no null values (checked), so the reference
    // recursion below can read every y directly
    val out = TimeSeries.holt(graft.queries.Tables.t(spark, sf001, "events"),
        "user_id", "ts", "event_id", "value", alpha, beta)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("level"), col("forecast"))
      .collect()
      .groupBy(_.getLong(0))
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
      val ys = sorted.map(_.getDouble(3))
      var l = 0.0; var b = 0.0
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i == 1) { l = ys(1); b = ys(1) - ys(0) }
        else if (i >= 2) {
          val nl = alpha * ys(i) + (1 - alpha) * (l + b)
          b = beta * (nl - l) + (1 - beta) * b
          l = nl
        }
        if (i >= 1) {
          // tolerance: micro-quantized coefficients over |y|≈400 values
          // plus W-window truncation of the exponential tail
          assert(math.abs(r.getDouble(4) - l) < 0.05,
            s"level at $i: ${r.getDouble(4)} vs $l")
          assert(math.abs(r.getDouble(5) - (l + b)) < 0.1,
            s"forecast at $i: ${r.getDouble(5)} vs ${l + b}")
        } else {
          assert(r.isNullAt(4) && r.isNullAt(5))
        }
      }
    }
  }
}
