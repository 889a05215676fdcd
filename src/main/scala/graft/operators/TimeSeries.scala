package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing beyond the pandas rolling/ewm surface: Holt's
  * linear (double exponential) smoothing — level + trend — as EXACT
  * bounded-window integer algebra, the same fixed-point discipline as
  * [[graft.core.SwiftEwm]].
  *
  * Holt's recursion (Holt 1957; Hyndman & Athanasopoulos, *Forecasting:
  * Principles and Practice* §8.2, additive trend):
  *
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * with the textbook initialization l_2 = y_2, b_2 = y_2 − y_1. Both
  * l_m and b_m are LINEAR in (y_1..y_m), so the operator precomputes
  * the coefficient vectors by running the recursion on unit impulses
  * (driver-side, O(W³) doubles once per config), quantizes each
  * coefficient to micro-units, and evaluates each row as ONE integer
  * dot product over the bounded frame — the codegen'd `fixed_dot`, no
  * per-row recursion, no unbounded state. The window bound W is the
  * first length at which every quantized coefficient of the two oldest
  * positions is zero: beyond W the init/convolution influence is below
  * quantization, so the last-W-values frame computes the same micro
  * result the full history would (disclosed: results are "Holt over
  * the trailing W values", ≤1e-6-relative from unbounded Holt — the
  * ewm quantization contract).
  *
  * Scale: one per-key shuffle for the window; each row's work is a
  * W-element dot against a size-indexed literal table; per-key state
  * never materializes beyond the frame. Nulls: `collect_list` drops
  * them, so smoothing skips null values while they consume a frame
  * slot, exactly as the ewm family (mirrored by list_filter). Rows
  * with fewer than 2 values yield null.
  */
object TimeSeries {

  /** Micro-quantized Holt coefficient tables: for each frame size
    * m = 1..W, the level and trend coefficient vectors over the frame's
    * values (oldest→newest). m = 1 holds a dummy [0] — consumers guard
    * m ≥ 2 (lazy CaseWhen, the ewm pattern). */
  def holtTables(alpha: Double, beta: Double, cap: Int = 64)
      : (IndexedSeq[IndexedSeq[Long]], IndexedSeq[IndexedSeq[Long]]) = {
    require(alpha > 0 && alpha < 1, s"holt needs 0 < alpha < 1, got $alpha")
    require(beta > 0 && beta < 1, s"holt needs 0 < beta < 1, got $beta")
    def micro(x: Double): Long = math.round(x * 1e6)
    // coefficient vectors of l_m and b_m over (y_1..y_m) by running the
    // recursion on the coefficient representation itself
    def simulate(m: Int): (Array[Long], Array[Long]) = {
      var l = Array.tabulate(m)(j => if (j == 1) 1.0 else 0.0) // l_2 = y_2
      var b = Array.tabulate(m)(j =>
        if (j == 1) 1.0 else if (j == 0) -1.0 else 0.0) // b_2 = y_2 − y_1
      (3 to m).foreach { t =>
        val nl = Array.tabulate(m)(j =>
          (if (j == t - 1) alpha else 0.0) + (1 - alpha) * (l(j) + b(j)))
        val nb = Array.tabulate(m)(j => beta * (nl(j) - l(j)) + (1 - beta) * b(j))
        l = nl; b = nb
      }
      (l.map(micro), b.map(micro))
    }
    val byM = (2 to cap).iterator.map(m => (m, simulate(m)))
    val upTo = byM.find { case (m, (lc, bc)) =>
      m > 2 && lc(0) == 0L && lc(1) == 0L && bc(0) == 0L && bc(1) == 0L
    }.map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"holt(alpha=$alpha, beta=$beta) does not decay within $cap rows"))
    val tabs = (2 to upTo).map(m => simulate(m))
    (IndexedSeq(IndexedSeq(0L)) ++ tabs.map(_._1.toIndexedSeq),
      IndexedSeq(IndexedSeq(0L)) ++ tabs.map(_._2.toIndexedSeq))
  }

  /** Holt level + one-step forecast (l + b) per row, over `valueCol`
    * partitioned by `partCol` ordered by (`tsCol`, `idCol`). */
  def holt(df: DataFrame, partCol: String, tsCol: String, idCol: String,
      valueCol: String, alpha: Double, beta: Double): DataFrame = {
    val (lTab, bTab) = holtTables(alpha, beta)
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(lTab.length.toLong - 1), Window.currentRow)
    val vm = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(20, 6))
      * lit(1000000L)).cast("long")
    val vals = collect_list(vm).over(w)
    val m = size(vals)
    val dotL = graft.functions.HashExpressions.fixed_dot(
      vals, element_at(typedlit(lTab), m))
    val dotB = graft.functions.HashExpressions.fixed_dot(
      vals, element_at(typedlit(bTab), m))
    // value-micro × coef-micro = 1e12 scale; ONE division each, the
    // forecast sums its BIGINT dots before its division
    df.withColumn("level", when(m >= 2, dotL.cast("double") / lit(1e12)))
      .withColumn("forecast",
        when(m >= 2, (dotL + dotB).cast("double") / lit(1e12)))
  }

  /** Nested-list SQL literal of a coefficient table for the mirror. */
  def tableSql(tab: IndexedSeq[IndexedSeq[Long]]): String =
    tab.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
}
