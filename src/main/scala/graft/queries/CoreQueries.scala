package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{ResultType, Swift, SwiftRollingWeighted}
import Tables._

/** Declared queries for the reference's accelerated surface — O1..O6 and
  * the decision-kernel routes (SURVEY.md §2.1/§2.2) — each with a DuckDB
  * oracle in [[CoreQueries.oracleSql]].
  */
object CoreQueries {

  /** Interpolating median matching DuckDB's `median`/`quantile_cont` on
    * DOUBLE inputs: (lo + hi)/2 for even counts — one rounding step,
    * bit-identical to DuckDB's lo·0.5 + hi·0.5 (halving is exact). */
  private[queries] val interpMedian: Seq[Double] => Any = { xs =>
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  /** Scalar-typed twin for the Aggregator-based rolling.apply path. */
  private[queries] val interpMedianD: Seq[Double] => Double =
    xs => interpMedian(xs).asInstanceOf[Double]

  /** Weighted-rolling oracle for any micro-weight numerator sequence: the
    * lag-sum of weight × micro-unit-value products is all BIGINT,
    * min_periods = full frame (pandas weighted-window convention), and
    * the one double op is the final mean division — mirroring
    * [[graft.core.SwiftRollingWeighted.mean]] bit-for-bit. */
  private def weightedRollingOracle(nums: Seq[Long]): String = {
    val n = nums.length
    val terms = nums.zipWithIndex.map { case (w, k) =>
      if (k == n - 1) s"$w*vm" else s"$w*lag(vm,${n - 1 - k}) OVER w2"
    }.mkString(" + ")
    s"""SELECT event_id,
       |  CASE WHEN count(*) OVER w >= $n THEN
       |    CAST($terms AS DOUBLE) / ${nums.sum}000000.0 END AS wmean
       |FROM (SELECT event_id, user_id, ts,
       |        CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS vm
       |      FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW),
       |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
       |ORDER BY event_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1 — Series apply, vectorizable (K2 probe accepts the Column form)
    "o1_apply_vec" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li)
        .applyScalar[Double, Double]("l_quantity", "sq")(
          x => x * x,
          vectorized = Some(col("l_quantity") * col("l_quantity")))
        .select(col("l_orderkey"), col("l_linenumber"), col("sq"))
        
    }),

    // O1 — branchy (non-vectorized candidate): UDF / local route via K3
    "o1_apply_branchy" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li)
        .applyScalar[Double, Double]("l_quantity", "y")(
          x => if (x < 12) x * x else math.sqrt(x))
        .select(col("l_orderkey"), col("l_linenumber"), col("y"))
        
    }),

    // K2 — AUTOMATIC vectorization: the branchy function is written once
    // in the restricted SwiftExpr AST; the engine derives both the row
    // function and the Column candidate and probe-validates the pair
    "o1_apply_ast" -> ((s, dir) => {
      import graft.core.SwiftExpr._
      val li = t(s, dir, "lineitem")
      val q = fld("l_quantity")
      Swift(li)
        .applyExpr("y")(iff(q < num(12), q * q, sqrt_(q)))
        .select(col("l_orderkey"), col("l_linenumber"), col("y"))
        
    }),

    // O2 raw=True — ndarray-row fast path over selected numeric columns
    "o2_row_raw" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li)
        .applyRawNumeric(Seq("l_quantity", "l_tax"), "wsum")(
          xs => xs(0) * 2 + xs(1) * 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("wsum"))
        
    }),

    // O2 — row-wise apply (axis=1) with a validated vectorized candidate
    "o2_row_apply" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li)
        .applyRows("revenue")(
          r => r.getAs[Double]("l_extendedprice") * (1.0 - r.getAs[Double]("l_discount")),
          vectorized = Some(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .select(col("l_orderkey"), col("l_linenumber"), col("revenue"))
        
    }),

    // O2 — result_type="expand": list result → one column per element
    "o2_row_expand" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li)
        .applyRows("r")(
          r => Seq(r.getAs[Double]("l_quantity") + r.getAs[Double]("l_tax"),
                   r.getAs[Double]("l_quantity") - r.getAs[Double]("l_tax")),
          resultType = ResultType.Expand(Seq("s_val", "d_val")))
        .select(col("l_orderkey"), col("l_linenumber"), col("s_val"), col("d_val"))
        
    }),

    // O2 — result_type='broadcast': the row function's list result is
    // written back over the original columns positionally
    // (docs/documentation.md:103-108)
    "o2_row_broadcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li.select(col("l_quantity"), col("l_extendedprice")))
        .applyRows("r")(
          r => Seq(r.getAs[Double]("l_quantity") * 2 + 1,
                   r.getAs[Double]("l_extendedprice") / 2),
          resultType = ResultType.Broadcast)
    }),

    // O2 axis=0 — column-wise aggregate (parallel gate requires axis=1 in
    // the reference, swifter/swifter.py:434; here one codegen'd agg)
    "o2_axis0_sums" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li).applyColumns(Seq("l_quantity", "l_extendedprice", "l_discount"))(
        dsum, suffix = "_sum")
    }),

    // O2 axis=0 with an OPAQUE whole-column function (the literal pandas
    // df.apply(func, axis=0)): driver-local by design — the reference
    // never parallelizes axis=0 (swifter/swifter.py:434). The black-box
    // fn here is a per-column range; the oracle mirrors it relationally.
    "o2_axis0_blackbox" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li).applyColumnsLocal(Seq("l_quantity", "l_discount")) { vs =>
        var mn = Double.MaxValue; var mx = Double.MinValue
        vs.foreach { v =>
          val d = v.asInstanceOf[Double]
          if (d < mn) mn = d; if (d > mx) mx = d
        }
        mx - mn
      }
    }),

    // O3 — applymap: same scalar fn over every element of listed columns
    "o3_applymap" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_tax"))
      Swift(li)
        .applymap[Double, Double](x => x * 2.0 + 1.0,
          vectorized = Some(c => c * 2.0 + 1.0),
          columns = Seq("l_quantity", "l_tax"))
        
    }),

    // O4 — groupBy.apply with an arbitrary per-group numeric function
    // (mirrors numeric_func = mean/var, swifter_tests.py:60-61); exact
    // decimal accumulation keeps the Scala and SQL sides bit-identical.
    "o4_groupby_apply_num" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val out = StructType(Seq(
        StructField("l_suppkey", LongType),
        StructField("mean_q", DoubleType),
        StructField("var_d", DoubleType),
        StructField("n", LongType)))
      Swift(li).groupBy("l_suppkey").select("l_quantity", "l_discount")
        .apply(out) { (key, rows) =>
          var n = 0L
          var sq = BigDecimal(0); var sd = BigDecimal(0); var sd2 = BigDecimal(0)
          rows.foreach { r =>
            val q = r.getAs[Double]("l_quantity")
            val d = r.getAs[Double]("l_discount")
            sq += BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            sd += BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            sd2 += BigDecimal(d * d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            n += 1
          }
          val meanQ = sq.toDouble / n
          val varD = (sd2.toDouble - sd.toDouble * sd.toDouble / n) / (n - 1)
          Iterator.single(Row(key.getAs[Long](0), meanQ, varD, n))
        }
        
    }),

    // O4 — groupBy.apply with a per-group text function (mirrors
    // clean_text_foo join/replace, swifter_tests.py:66-69)
    "o4_groupby_apply_text" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val out = StructType(Seq(
        StructField("user_id", LongType),
        StructField("joined", StringType),
        StructField("n", LongType)))
      Swift(ev).groupBy("user_id").select("event_type")
        .apply(out) { (key, rows) =>
          val types = rows.map(_.getAs[String]("event_type")).toSeq.sorted
          Iterator.single(Row(key.getAs[Long](0), types.mkString("_"), types.size.toLong))
        }
        
    }),

    // O4 — scalar-result specialization: stays native Catalyst aggregate
    "o4_groupby_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li).groupBy("l_returnflag").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("n"))
        
    }),

    // O4 — pandas groupby(dropna=True) parity (the reference forwards
    // the kwarg, swifter/swifter.py:523-534): NULL group keys are
    // dropped BEFORE the shuffle (Spark's native semantics keeps them
    // as a NULL group = pandas dropna=False); the key is nulled on
    // every 7th doc so the path is genuinely exercised
    "o4_groupby_dropna" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        when(col("doc_id") % 7 === 0, lit(null: String))
          .otherwise(col("lang")).as("k"),
        col("n_chars"))
      Swift(d).groupBy("k").dropna().agg(
        count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        
    }),

    // O4 — grouping BY THE INDEX (reference swifter/swifter.py:579, tests
    // swifter_tests.py:801-813): under the explicit-index convention the
    // frame's index is a column (here o_custkey standing as a non-unique
    // index), so groupByIndex routes through the same flatMapGroups
    // machinery; the per-group fn sums micro-units so the one IEEE step
    // is the final /1e6 division, mirrored in the oracle
    "o4_groupby_by_index" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select(col("o_custkey").as("idx"),
        (col("o_totalprice").cast(DecimalType(20, 6)) * lit(1000000L))
          .cast("long").as("pm"))
      val schema = StructType(Seq(StructField("idx", LongType),
        StructField("n", LongType), StructField("sum_price", DoubleType)))
      Swift(ord).groupByIndex("idx").apply(schema) { (k, it) =>
        var n = 0L; var sm = 0L
        it.foreach { r => n += 1; sm += r.getLong(1) }
        Iterator(Row(k.getLong(0), n, sm.toDouble / 1e6))
      }
    }),

    // O4 — pandas groupby(sort=False) parity (the reference forwards the
    // kwarg, swifter/swifter.py:523-534): group order = FIRST APPEARANCE,
    // which under the explicit-index convention is min(index) over the
    // group, materialized as first_pos (one extra partial-agg on the
    // same exchange) — here event_id stands as the frame index
    "o4_groupby_nosort" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).groupBy("event_type").sort(false, "event_id").agg(
        count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }),

    // O5 — rolling count window (rolling(5)) per user, native window agg;
    // min_periods defaults to the window size (pandas integer-window
    // convention), so the first 4 frames per user are null
    "o5_rolling_count" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"), partitionBy = Seq("user_id"))
        .agg(sum(col("value").cast(DecimalType(20, 6))), "roll_sum", _.cast("double"))
        .select(col("event_id"), col("roll_sum"))
        
    }),

    // O5 — rolling time-offset window ("1 hour") per user
    "o5_rolling_time" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingTime("1 hour", "ts", partitionBy = Seq("user_id"))
        .agg(sum(col("value").cast(DecimalType(20, 6))), "roll_sum", _.cast("double"))
        .select(col("event_id"), col("roll_sum"))
        
    }),

    // O5 — time window with closed='left': [t-1h, t), current row's own
    // timestamp excluded (pandas closed= endpoint convention)
    "o5_rolling_closed" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingTime("1 hour", "ts", partitionBy = Seq("user_id"),
          closed = "left")
        .agg(sum(col("value").cast(DecimalType(20, 6))), "roll_sum", _.cast("double"))
        .select(col("event_id"), col("roll_sum"))
        
    }),

    // O5 — pandas on= kwarg: the count window walks a named data column
    // (event_id) instead of the index/timestamp order
    "o5_rolling_on" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingOn(3, "event_id", partitionBy = Seq("user_id"))
        .agg(sum(col("value").cast(DecimalType(20, 6))), "roll_sum", _.cast("double"))
        .select(col("event_id"), col("roll_sum"))
        
    }),

    // O5 — pandas win_type='triang': weighted rolling mean. Integer weight
    // numerators × exact micro-unit values keep the whole weighted sum in
    // BIGINT arithmetic; only the final mean division is one double op,
    // so DuckDB mirrors it bit-for-bit (lag-sum formulation)
    "o5_rolling_triang" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(5, "triang", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='gaussian', std=2 (first irrational-weight
    // shape): weights quantized to micro-weight integers round(wₖ·10⁶),
    // so weighted sum stays BIGINT and the oracle (built from the SAME
    // Longs) is bit-exact; see SwiftRollingWeighted.weights
    "o5_rolling_gauss" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(5, "gaussian", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"), std = 2.0)
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='bartlett' (triangle with ZERO endpoints):
    // the 2/(n−1) scipy factor cancels in the mean, so the numerators are
    // exact integers like triang — no quantization at all
    "o5_rolling_bartlett" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "bartlett", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='hamming' (scipy cosine-sum window), same
    // micro-weight quantization as gaussian, window 7
    "o5_rolling_hamming" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "hamming", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='parzen' (scipy grid: x = |2k−(n−1)|/n, inner
    // cutoff |k−(n−1)/2| ≤ (n−1)/4): cubic in p/n scaled by n³ → EXACT
    // integer numerators (zero quantization, like triang/bartlett)
    "o5_rolling_parzen" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "parzen", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='kaiser' (scipy I₀-ratio window, beta=8 via
    // the std slot): micro-quantized like gaussian/hamming
    "o5_rolling_kaiser" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "kaiser", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"), std = 8.0)
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='blackmanharris' (4-term minimum-sidelobe
    // cosine sum), micro-quantized
    "o5_rolling_blackmanharris" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "blackmanharris", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='nuttall' (4-term, continuous 1st derivative)
    "o5_rolling_nuttall" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "nuttall", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // O5 — pandas win_type='exponential' (symmetric, tau=2 via the std
    // slot): exp(−|k−center|/τ), micro-quantized
    "o5_rolling_exponential" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rollingWeighted(7, "exponential", orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"), std = 2.0)
        .mean("value", "wmean")
        .select(col("event_id"), col("wmean"))
        
    }),

    // pandas groupby().head(n): first n rows per group in time order —
    // WindowGroupLimit pushes the rank filter below the full window
    "o4_groupby_head" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3).drop("__rn")
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"))
        
    }),

    // O5 — pandas expanding(): cumulative (unbounded-preceding) decimal
    // sum per user — the native running-aggregate frame
    "o5_expanding" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).expanding(orderBy = Seq("ts", "event_id"), partitionBy = Seq("user_id"))
        .agg(sum(col("value").cast(DecimalType(20, 6))), "cum_sum", _.cast("double"))
        .select(col("event_id"), col("cum_sum"))
        
    }),

    // O5 — pandas rolling(5).skew(): adjusted Fisher–Pearson G₁ from
    // exact integer raw moments (see SwiftRolling.skew — A·√A, never pow)
    "o5_rolling_skew" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .skew("value", "skew")
        .select(col("event_id"), col("skew"))
        
    }),

    // O5 — pandas ewm(alpha=0.5).mean() (adjust=True): micro-quantized
    // exponential weights make the decay tail exactly zero at 21 rows, so
    // the full-history EWM is a bounded 21-row window (see SwiftEwm)
    "o5_ewm_mean" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).ewm(0.5, orderBy = Seq("ts", "event_id"), partitionBy = Seq("user_id"))
        .mean("value", "ewm")
        .select(col("event_id"), col("ewm"))
        
    }),

    // O5 — pandas ewm(alpha=0.5).var(bias=False)/.std(): the debiased
    // weighted variance in PURE integer algebra (DECIMAL(38,0)/HUGEINT
    // sums) with a two-division IEEE tail + sqrt — see SwiftEwm.variance
    "o5_ewm_var" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).ewm(0.5, orderBy = Seq("ts", "event_id"), partitionBy = Seq("user_id"))
        .variance("value", "evar")
        .withColumn("estd", sqrt(col("evar")))
        .select(col("event_id"), col("evar"), col("estd"))
        
    }),

    // O5 — pandas rolling(3).cov(other): SAMPLE covariance in exact
    // decimal micro-unit arithmetic (see SwiftRolling.cov), frames walk
    // each order's line numbers
    "o5_rolling_cov" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // l_linenumber is NOT unique within an order in this synthetic data —
      // the value columns join the ordering to make the walk total (ties
      // would give each engine different frames)
      Swift(li).rolling(3,
          orderBy = Seq("l_linenumber", "l_extendedprice", "l_quantity"),
          partitionBy = Seq("l_orderkey"))
        .cov("l_quantity", "l_extendedprice", "qp_cov")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("qp_cov"))
        
    }),

    // O5 — pandas rolling(7).kurt(): adjusted excess kurtosis G₂ from
    // exact 10⁴-fixed-point raw moments (C/A² algebra — see
    // SwiftRolling.kurt for why the scale is coarser than skew's micro)
    "o5_rolling_kurt" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(7, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .kurt("value", "kurt")
        .select(col("event_id"), col("kurt"))
        
    }),

    // O5 — pandas rolling(5).sem(): std error of the mean from the same
    // exact integer A = n·Σx² − (Σx)² as skew/kurt
    "o5_rolling_sem" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .sem("value", "sem")
        .select(col("event_id"), col("sem"))
        
    }),

    // O5 — pandas rolling(5).median(): exact sorted-frame midpoint in
    // integer micro-units (no interpolation-order divergence)
    "o5_rolling_median" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .median("value", "med")
        .select(col("event_id"), col("med"))
        
    }),

    // O5 — rolling MAD (robust dispersion): deviations against 2×median
    // keep everything integer; one final division by 4e6
    "o5_rolling_mad" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .mad("value", "mad")
        .select(col("event_id"), col("mad"))
        
    }),

    // O5 — pandas rolling(5).quantile(0.25): type-7 linear interpolation
    // with rational q — all-integer until the final division
    "o5_rolling_quantile" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .quantile("value", 1, 4, "q25")
        .select(col("event_id"), col("q25"))
        
    }),

    // O5 — pandas rolling(7).rank(method='average'): average rank of the
    // current value within its frame by comparison counting
    "o5_rolling_rank" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(7, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .rank("value", "rnk")
        .select(col("event_id"), col("rnk"))
        
    }),

    // O5 — pandas rolling(3).corr(other): Pearson correlation from exact
    // fixed-point sums; the scale cancels in the ratio. Scale 10² (exact
    // for the 2-decimal price/quantity data) keeps every integer term
    // under 2⁶³ — above that DuckDB's HUGEINT→DOUBLE cast double-rounds
    // and the mirror stops being bit-exact (see SwiftRolling.corr)
    "o5_rolling_corr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li).rolling(3,
          orderBy = Seq("l_linenumber", "l_extendedprice", "l_quantity"),
          partitionBy = Seq("l_orderkey"))
        .corr("l_quantity", "l_extendedprice", "qp_corr", scale = 100L)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("qp_corr"))
        
    }),

    // O5 — pandas rolling(5).var(ddof=1)/.std(): exact-integer A term,
    // two IEEE divisions + sqrt (order-stable, unlike native var_samp)
    "o5_rolling_var" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .varStd("value", "rvar", "rstd")
        .select(col("event_id"), col("rvar"), col("rstd"))
        
    }),

    // O5 — pandas rolling(5).min()/.max(): native window min/max (exact
    // value selection — no arithmetic to mirror)
    "o5_rolling_minmax" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val r = Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .agg(min(col("value")), "rmin")
      Swift(r).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"))
        .agg(max(col("value")), "rmax")
        .select(col("event_id"), col("rmin"), col("rmax"))
        
    }),

    // O4 — pandas groupby(...).transform(...): the group aggregate
    // broadcast back onto every row (window aggregate, no self-join)
    "o4_groupby_transform" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).groupBy("user_id")
        .transform(sum(col("value").cast(DecimalType(20, 6))), "user_total",
          _.cast("double"))
        .select(col("event_id"), col("user_id"), col("user_total"))
        
    }),

    // O5 — centered rolling window with min_periods (pandas center=True)
    "o5_rolling_center" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"),
          partitionBy = Seq("user_id"), center = true).withMin(3)
        .agg(sum(col("value").cast(DecimalType(20, 6))), "roll_sum", _.cast("double"))
        .select(col("event_id"), col("roll_sum"))
        
    }),

    // O1 — pandas shift / diff / pct_change: lag-based projections over
    // the per-user event order (one shuffle on user, one sort)
    "o1_shift_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ord = Seq("ts", "event_id"); val part = Seq("user_id")
      val s1 = Swift(ev).shift("value", 1, ord, part, "shifted")
      val s2 = Swift(s1).diff("value", 1, ord, part, "diffed")
      val s3 = Swift(s2).pctChange("value", 1, ord, part, "pct")
      s3.select(col("event_id"), col("shifted"), col("diffed"), col("pct"))
        
    }),

    // pandas groupby().nunique(): per-group distinct counts — Spark's
    // distinct-aggregate Expand keeps the shuffle to (group, value) rows
    "o4_groupby_nunique" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("user_id"))
        .agg(countDistinct(col("event_type")).as("n_types"),
          countDistinct(col("props")).as("n_props"))
        ),

    // pandas rank(method='average'): tied values share the MEAN of their
    // rank positions = rank() + (tie_count − 1)/2 — two window passes over
    // one shuffle, integer arithmetic until the exact halving
    "o1_rank_avg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("value"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("value"))
      ev.select(col("event_id"),
          (rank().over(w).cast("double")
            + (count(lit(1)).over(wt).cast("double") - lit(1.0)) / lit(2.0))
            .as("avg_rank"))
        
    }),

    // O6 — pandas resample('1D').ohlc(): open/high/low/close per bucket.
    // open/close are min_by/max_by over the (ts, event_id) total order —
    // pure value SELECTION, zero arithmetic, so exactness is free; one
    // hash aggregate with map-side partials like any resample
    "o6_resample_ohlc" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val ord = struct(col("ts"), col("event_id"))
      ev.groupBy(window(col("ts"), "1 day").as("w"))
        .agg(min_by(col("value"), ord).as("open"), max(col("value")).as("high"),
          min(col("value")).as("low"), max_by(col("value"), ord).as("close"))
        .select(epochUs(col("w.start")).as("bucket_us"),
          col("open"), col("high"), col("low"), col("close"))
        
    }),

    // pandas cummax/cummin/cumcount: running extremes and ordinal per
    // user — native unbounded-preceding window aggregates (incremental,
    // not O(n²)), one shuffle + sort like any ordered scan
    "o1_cum_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      ev.select(col("event_id"),
          max(col("value")).over(w).as("cummax"),
          min(col("value")).over(w).as("cummin"),
          (count(lit(1)).over(w) - 1).as("cumcount"))
        
    }),

    // pandas Series.map(dict): a small literal mapping — a CASE chain
    // (codegen'd, zero shuffle; a large dict would broadcast-join instead)
    "o1_map_dict" -> ((s, dir) => {
      val mapping = Seq("A" -> "accepted", "N" -> "none", "R" -> "returned")
      val chain = mapping.foldRight(lit(null).cast("string")) {
        case ((k, v), rest) => when(col("l_returnflag") === k, lit(v)).otherwise(rest)
      }
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), chain.as("flag_name"))
        
    }),

    // pandas .str accessor: lower / len / contains / slice in one
    // projection over the documents table
    "o1_str_ops" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          lower(substring(col("text"), 1, 20)).as("head_lower"),
          length(col("text")).cast("long").as("n_chars_str"),
          col("text").contains("data").cast("long").as("has_data"),
          substring(col("text"), 5, 8).as("slice_5_8"))
        ),

    // pandas groupby().filter(lambda g: len(g) > k): groups keep ALL
    // their rows iff the group passes — a window count + filter, no join
    "o4_groupby_filter" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("event_type") === "purchase")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      ev.withColumn("__n", count(lit(1)).over(w))
        .filter(col("__n") >= 60).drop("__n")
        .select(col("event_id"), col("user_id"))
        
    }),

    // pandas groupby().idxmax(): the row ID holding each group's maximum
    // — max_by keeps it one hash aggregate (no self-join back)
    "o4_groupby_idxmax" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("user_id"))
        .agg(max_by(col("event_id"), struct(col("value"), col("event_id"))).as("idx_max"),
          max(col("value")).as("max_value"))
        ),

    // pandas Series.value_counts(): one hash aggregate, descending count
    // with the value as tie-break (the pandas sort convention)
    "o1_value_counts" -> ((s, dir) =>
      graft.operators.Binning.valueCounts(t(s, dir, "lineitem"),
        col("l_returnflag"), out = "val")),

    // pandas fillna + clip chained (nulls synthesized via nullif —
    // the testdata itself is dense): clamp is two IEEE comparisons,
    // no arithmetic, so the mirror is trivially bit-exact
    "o1_clean_ops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val withNulls = li.withColumn("tax0", nullif(col("l_tax"), lit(0.0)))
      val filled = Swift(withNulls).fillna("tax0", 0.04, "tax_f")
      Swift(filled).clip("tax_f", 0.02, 0.07, "tax_c")
        .select(col("l_orderkey"), col("l_linenumber"), col("tax_c"))
        
    }),

    // O6 — pandas resample('1h').sum().interpolate(): gap buckets get the
    // LINEAR interpolation between surrounding populated buckets (exact
    // BIGINT-microsecond time ratio; see SwiftResample.aggInterpolate)
    "o6_resample_interp" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("event_type") === "error")
      Swift(ev).resample("1 hour", "ts")
        .aggInterpolate(sum(col("value").cast(DecimalType(20, 6))), "hr_sum",
          _.cast("double"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("hr_sum"), col("n"))
        
    }),

    // O6 — pandas resample('1h').sum().ffill(): sparse series (error
    // events populate 678 of 720 hours at sf0.01) — gap buckets are
    // materialized from a sequence spine and forward-filled
    "o6_resample_ffill" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("event_type") === "error")
      Swift(ev).resample("1 hour", "ts")
        .aggFfill(sum(col("value").cast(DecimalType(20, 6))), "hr_sum", _.cast("double"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("hr_sum"), col("n"))
        
    }),

    // O6 — resample().bfill(): gap buckets take the NEXT populated
    // bucket's value (the backward twin of ffill)
    "o6_resample_bfill" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("event_type") === "error")
      Swift(ev).resample("1 hour", "ts")
        .aggBfill(sum(col("value").cast(DecimalType(20, 6))), "hr_sum", _.cast("double"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("hr_sum"), col("n"))
        
    }),

    // O6 — resample with label='right' (bucket labeled by bin end)
    "o6_resample_label_right" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).resample("1 hour", "ts").withLabel("right")
        .agg(dsum(col("value")).as("hr_sum"), count(lit(1)).as("n"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("hr_sum"), col("n"))
        
    }),

    // O6 — resample("1 day"): tumbling time buckets, native aggregates
    "o6_resample_day" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).resample("1 day", "ts")
        .agg(dsum(col("value")).as("day_sum"), count(lit(1)).as("n"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("day_sum"), col("n"))
        
    }),

    // O6 — grouped resample (pandas groupby(user).resample('1 day')):
    // one shuffle on (user, bucket), map-side partials
    "o6_resample_grouped" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).resample("1 day", "ts").by("user_id")
        .agg(dsum(col("value")).as("day_sum"), count(lit(1)).as("n"))
        .select(col("user_id"), epochUs(col("bucket")).as("bucket_us"),
          col("day_sum"), col("n"))
        
    }),

    // O6 — pandas resample('1D', closed='right'): bins (S, S+1d] — a
    // value exactly ON a bucket boundary joins the EARLIER bucket,
    // realized as a −1µs nudge on bucket ASSIGNMENT only (the label stays
    // the true bin start; see SwiftResample.withClosed)
    "o6_resample_closed_right" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).resample("1 day", "ts").withClosed("right")
        .agg(dsum(col("value")).as("day_sum"), count(lit(1)).as("n"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("day_sum"), col("n"))
        
    }),

    // O6 — resample with a boundary offset (pandas origin/offset kwarg):
    // daily buckets starting at 06:00 instead of midnight
    "o6_resample_origin" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).resample("1 day", "ts").withOffset("6 hours")
        .agg(dsum(col("value")).as("day_sum"), count(lit(1)).as("n"))
        .select(epochUs(col("bucket")).as("bucket_us"), col("day_sum"), col("n"))
        
    }),

    // O5 — rolling.apply with an arbitrary function (frame median) via
    // the custom Aggregator window function (no collect_list column),
    // mirroring the interpolating median DuckDB computes over the frame;
    // min_periods=1 keeps the partial leading frames of the round-1 oracle
    "o5_rolling_apply" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).rolling(5, orderBy = Seq("ts", "event_id"), partitionBy = Seq("user_id"))
        .withMin(1)
        .apply("value", "med")(CoreQueries.interpMedianD)
        .select(col("event_id"), col("med"))
        
    }),

    // O6 — resample.apply with an arbitrary per-bucket function (median)
    "o6_resample_apply" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Swift(ev).resample("1 day", "ts")
        .apply("value", "med", DoubleType)(CoreQueries.interpMedian)
        .select(epochUs(col("bucket")).as("bucket_us"), col("med"))
        
    }),

    // O4/K6 — applyAuto: per-group function with sample-inferred schema
    "o4_groupby_apply_auto" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Swift(li).groupBy("l_returnflag").select("l_quantity")
        .applyAuto(names = Seq("rf", "n", "sq")) { (key, rows) =>
          var n = 0L
          var sq = BigDecimal(0)
          rows.foreach { r =>
            sq += BigDecimal(r.getAs[Double]("l_quantity"))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
            n += 1
          }
          Iterator.single(Row(key.getAs[String](0), n, sq.toDouble))
        }
        
    }),

    // O1 — string→date parsing apply (the pd.to_datetime parity case,
    // examples/swifter_speed_comparison.ipynb cell 17)
    "o1_apply_dates" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("day_str", date_format(col("ts"), "yyyy-MM-dd"))
      Swift(ev).applyRows("day_off")(
        r => java.time.LocalDate.parse(r.getAs[String]("day_str")).toEpochDay - 19723L,
        vectorized = Some(datediff(to_date(col("day_str")), lit("2024-01-01")).cast("long")))
        .select(col("event_id"), col("day_off"))
        
    }),

    // K3 — tiny input routes to the driver-local LocalRelation plan
    "k3_small_local" -> ((s, dir) => {
      val r = t(s, dir, "region")
      Swift(r).applyScalar[String, String]("r_name", "upper_name")(_.toUpperCase)
        .select(col("r_regionkey"), col("upper_name"))
        
    }),

    // K9 — force_parallel bypasses the selector (swifter/swifter.py:131-138)
    "k9_force_parallel" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      Swift(n).forceParallel()
        .applyScalar[Int, Int]("n_nationkey", "nk2")(x => x * 2)
        .select(col("n_nationkey"), col("nk2"))
        
    })
  )

  def oracleSql: Map[String, String] = Map(
    "o1_apply_vec" ->
      """SELECT l_orderkey, l_linenumber, l_quantity*l_quantity AS sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o1_apply_branchy" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 12 THEN l_quantity*l_quantity ELSE sqrt(l_quantity) END AS y
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o1_apply_ast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 12 THEN l_quantity*l_quantity ELSE sqrt(l_quantity) END AS y
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o2_row_raw" ->
      """SELECT l_orderkey, l_linenumber, l_quantity*2 + l_tax*3 AS wsum
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o2_row_apply" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice*(1.0-l_discount) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o2_row_expand" ->
      """SELECT l_orderkey, l_linenumber, l_quantity+l_tax AS s_val, l_quantity-l_tax AS d_val
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o2_row_broadcast" ->
      """SELECT l_quantity*2+1 AS l_quantity, l_extendedprice/2 AS l_extendedprice
        |FROM lineitem""".stripMargin,
    "o2_axis0_sums" ->
      s"""SELECT ${dsumSql("l_quantity")} AS l_quantity_sum,
         |  ${dsumSql("l_extendedprice")} AS l_extendedprice_sum,
         |  ${dsumSql("l_discount")} AS l_discount_sum
         |FROM lineitem""".stripMargin,
    "o2_axis0_blackbox" ->
      """SELECT max(l_quantity) - min(l_quantity) AS l_quantity,
        |  max(l_discount) - min(l_discount) AS l_discount
        |FROM lineitem""".stripMargin,
    "o3_applymap" ->
      """SELECT l_orderkey, l_linenumber, l_quantity*2.0+1.0 AS l_quantity, l_tax*2.0+1.0 AS l_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o4_groupby_apply_num" ->
      """WITH g AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sq,
        |    CAST(sum(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) AS sd,
        |    CAST(sum(CAST(l_discount*l_discount AS DECIMAL(20,6))) AS DOUBLE) AS sd2,
        |    count(*) AS n
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey, sq/n AS mean_q, (sd2 - sd*sd/n)/(n-1) AS var_d, CAST(n AS BIGINT) AS n
        |FROM g ORDER BY l_suppkey""".stripMargin,
    "o4_groupby_apply_text" ->
      """SELECT user_id, string_agg(event_type, '_' ORDER BY event_type) AS joined,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "o4_groupby_agg" ->
      s"""SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
         |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // dropna mirror: the NULL-key filter is the WHERE; HUGEINT sum cast
    // back to BIGINT
    "o4_groupby_dropna" ->
      """WITH d AS (SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS k,
        |    n_chars FROM documents)
        |SELECT k, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM d WHERE k IS NOT NULL GROUP BY k ORDER BY k""".stripMargin,
    // groupby-on-index mirror: same micro-unit BIGINT sum, one final
    // IEEE division
    "o4_groupby_by_index" ->
      """WITH m AS (SELECT o_custkey AS idx,
        |    CAST(CAST(o_totalprice AS DECIMAL(20,6))*1000000 AS BIGINT) AS pm
        |  FROM orders)
        |SELECT idx, count(*) AS n,
        |  CAST(sum(pm) AS BIGINT) / 1000000.0 AS sum_price
        |FROM m GROUP BY idx ORDER BY idx""".stripMargin,
    // sort=False mirror: first-appearance position = min(index); the
    // ORDER BY first_pos is the observable group order
    "o4_groupby_nosort" ->
      s"""SELECT event_type, min(event_id) AS first_pos, count(*) AS n,
         |  ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY first_pos""".stripMargin,
    "o5_rolling_count" ->
      """SELECT event_id,
        |  CASE WHEN count(*) OVER w >= 5
        |    THEN CAST(sum(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) END AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "o5_rolling_time" ->
      """SELECT event_id, CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (
        |  PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum
        |FROM events ORDER BY event_id""".stripMargin,
    "o5_rolling_closed" ->
      """SELECT event_id, CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (
        |  PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS roll_sum
        |FROM events ORDER BY event_id""".stripMargin,
    "o5_rolling_on" ->
      """SELECT event_id,
        |  CASE WHEN count(*) OVER w >= 3
        |    THEN CAST(sum(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) END AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // triang(5) numerators [2,4,6,4,2] / 18; vm = value in exact micro-units
    // (DECIMAL(20,6) × 10⁶ is integer-valued) — the weighted sum is all
    // BIGINT, the one double op is the final /18000000.0 mean division
    "o5_rolling_triang" ->
      """SELECT event_id,
        |  CASE WHEN count(*) OVER w >= 5 THEN
        |    CAST(2*lag(vm,4) OVER w2 + 4*lag(vm,3) OVER w2 + 6*lag(vm,2) OVER w2
        |      + 4*lag(vm,1) OVER w2 + 2*vm AS DOUBLE) / 18000000.0 END AS wmean
        |FROM (SELECT event_id, user_id, ts,
        |        CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS vm
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    // micro-weight numerators generated from the SAME
    // SwiftRollingWeighted.weights calls the Spark queries use — the
    // lag-sum is all BIGINT; the single double op is the mean division
    "o5_rolling_gauss" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(5, "gaussian", 2.0)),
    "o5_rolling_bartlett" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "bartlett")),
    "o5_rolling_hamming" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "hamming")),
    "o5_rolling_parzen" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "parzen")),
    "o5_rolling_kaiser" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "kaiser", 8.0)),
    "o5_rolling_blackmanharris" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "blackmanharris")),
    "o5_rolling_nuttall" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "nuttall")),
    "o5_rolling_exponential" ->
      weightedRollingOracle(SwiftRollingWeighted.weights(7, "exponential", 2.0)),
    "o4_groupby_head" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM (
        |  SELECT event_id, user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY event_id""".stripMargin,
    "o5_expanding" ->
      """SELECT event_id,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_sum
        |FROM events ORDER BY event_id""".stripMargin,
    // skew mirror: exact HUGEINT raw moments; A^{3/2} spelled A·√A and
    // the IEEE tail in the identical order as SwiftRolling.skew
    "o5_rolling_skew" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM events),
        |s AS (SELECT event_id, count(*) OVER w AS n,
        |    CAST(sum(xm) OVER w AS HUGEINT) AS sx,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm) OVER w AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm*xm) OVER w AS HUGEINT) AS sxxx
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |ab AS (SELECT event_id, n,
        |    CAST(n*sxx - sx*sx AS DOUBLE) AS a,
        |    CAST(n*n*sxxx - 3*n*sx*sxx + 2*sx*sx*sx AS DOUBLE) AS b
        |  FROM s)
        |SELECT event_id,
        |  CASE WHEN n >= 5 AND a > 0 THEN
        |    (b * sqrt(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)))
        |    / ((a * sqrt(a)) * (CAST(n AS DOUBLE)-2.0)) END AS skew
        |FROM ab ORDER BY event_id""".stripMargin,
    // ewm(0.5) mirror from the SAME micro-weights the Spark query uses:
    // frame values arrive oldest→newest, so vs[i] pairs with weight
    // w[len−i] (newest gets w₀); numerator and denominator are BIGINT,
    // the one double op is the final division — identical to SwiftEwm.
    // list_filter drops nulls from the kept-null list() frame, matching
    // Spark's null-dropping collect_list (ignore_na=True on both sides)
    "o5_ewm_mean" -> {
      val ws = graft.core.SwiftEwm.microWeights(0.5)
      val wArr = ws.mkString("[", ",", "]")
      s"""WITH v AS (SELECT event_id, user_id, ts,
         |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS vm FROM events),
         |l0 AS (SELECT event_id, list(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN ${ws.length - 1} PRECEDING AND CURRENT ROW) AS vs0 FROM v),
         |l AS (SELECT event_id, list_filter(vs0, v -> v IS NOT NULL) AS vs FROM l0)
         |SELECT event_id,
         |  CAST(list_sum(list_transform(generate_series(1, len(vs)),
         |      i -> vs[i] * ($wArr)[len(vs)-i+1])) AS DOUBLE)
         |  / (CAST(list_sum(list_slice($wArr, 1, len(vs))) AS DOUBLE) * 1000000.0) AS ewm
         |FROM l ORDER BY event_id""".stripMargin
    },
    // debiased ewm variance: var = (Σw·Σwx² − (Σwx)²)/((Σw)² − Σw²) —
    // all-integer numerator/denominator (HUGEINT ≙ DECIMAL(38,0)), then
    // two IEEE divisions + sqrt in the same order as the Spark query
    "o5_ewm_var" -> {
      val ws = graft.core.SwiftEwm.microWeights(0.5)
      val wArr = ws.mkString("[", ",", "]")
      s"""WITH v AS (SELECT event_id, user_id, ts,
         |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS vm FROM events),
         |l0 AS (SELECT event_id, list(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN ${ws.length - 1} PRECEDING AND CURRENT ROW) AS vs0 FROM v),
         |l AS (SELECT event_id, list_filter(vs0, v -> v IS NOT NULL) AS vs FROM l0),
         |st AS (SELECT event_id, len(vs) AS m,
         |    CAST(list_sum(list_slice($wArr, 1, len(vs))) AS HUGEINT) AS sw1,
         |    CAST(list_sum(list_transform(list_slice($wArr, 1, len(vs)), w -> CAST(w AS BIGINT)*w)) AS HUGEINT) AS sw2,
         |    CAST(list_sum(list_transform(generate_series(1, len(vs)),
         |        i -> vs[i] * ($wArr)[len(vs)-i+1])) AS HUGEINT) AS swx,
         |    list_sum(list_transform(generate_series(1, len(vs)),
         |        i -> CAST(vs[i] AS HUGEINT) * vs[i] * ($wArr)[len(vs)-i+1])) AS swxx
         |  FROM l),
         |r AS (SELECT event_id,
         |    CASE WHEN m >= 2 THEN
         |      CAST(swxx*sw1 - swx*swx AS DOUBLE) / CAST(sw1*sw1 - sw2 AS DOUBLE)
         |        / 1000000000000.0 END AS evar
         |  FROM st)
         |SELECT event_id, evar, sqrt(evar) AS estd FROM r ORDER BY event_id""".stripMargin
    },
    // HUGEINT mirror of SwiftRolling.cov's DECIMAL(38,0) arithmetic: one
    // exact-integer numerator -> double, then two IEEE divisions in the
    // same order as the Spark expression
    "o5_rolling_cov" ->
      """WITH m AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_quantity AS DECIMAL(20,6))*1000000 AS BIGINT) END AS xm,
        |  CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(20,6))*1000000 AS BIGINT) END AS ym
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CASE WHEN count(xm) OVER w >= 3 THEN
        |    CAST(count(xm) OVER w * sum(CAST(xm AS HUGEINT)*CAST(ym AS HUGEINT)) OVER w
        |       - sum(CAST(xm AS HUGEINT)) OVER w * sum(CAST(ym AS HUGEINT)) OVER w AS DOUBLE)
        |    / CAST(count(xm) OVER w * (count(xm) OVER w - 1) AS DOUBLE) / 1000000000000.0
        |  END AS qp_cov
        |FROM m
        |WINDOW w AS (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_extendedprice, l_quantity
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    // kurt mirror: same 10⁴ fixed point, HUGEINT raw moments, identical
    // C/A² tail op order as SwiftRolling.kurt
    "o5_rolling_kurt" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,4))*10000 AS BIGINT) AS xm FROM events),
        |s AS (SELECT event_id, count(xm) OVER w AS n,
        |    CAST(sum(xm) OVER w AS HUGEINT) AS s1,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm) OVER w AS HUGEINT) AS s2,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm*xm) OVER w AS HUGEINT) AS s3,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm*xm*xm) OVER w AS HUGEINT) AS s4
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |ac AS (SELECT event_id, n,
        |    CAST(n*s2 - s1*s1 AS DOUBLE) AS a,
        |    CAST(n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1
        |      AS DOUBLE) AS c
        |  FROM s)
        |SELECT event_id,
        |  CASE WHEN n >= 7 AND a > 0 THEN
        |    (CAST(n AS DOUBLE) - 1.0)
        |      / ((CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0))
        |      * ((CAST(n AS DOUBLE) + 1.0) * (c / (a * a) - 3.0) + 6.0)
        |  END AS kurt
        |FROM ac ORDER BY event_id""".stripMargin,
    // sem mirror: sqrt over three IEEE divisions in the Spark order
    "o5_rolling_sem" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM events),
        |s AS (SELECT event_id, count(xm) OVER w AS n,
        |    CAST(sum(xm) OVER w AS HUGEINT) AS s1,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm) OVER w AS HUGEINT) AS s2
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT event_id,
        |  CASE WHEN n >= 5 AND CAST(n*s2 - s1*s1 AS DOUBLE) >= 0 THEN
        |    sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |      / 1000000000000.0 / (CAST(n AS DOUBLE) - 1.0))
        |  END AS sem
        |FROM s ORDER BY event_id""".stripMargin,
    // median mirror: sorted micro-unit frame, exact midpoint; the ÷2·10⁶
    // is the single IEEE op, as in SwiftRolling.median
    "o5_rolling_median" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM events),
        |l AS (SELECT event_id, list_sort(list_filter(list(xm) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), v -> v IS NOT NULL)) AS vs
        |  FROM m)
        |SELECT event_id,
        |  CASE WHEN len(vs) >= 5 THEN
        |    (CAST(vs[CAST((len(vs)+1)//2 AS INT)] AS DOUBLE)
        |     + CAST(vs[CAST(len(vs)//2 AS INT) + 1] AS DOUBLE)) / 2000000.0
        |  END AS med
        |FROM l ORDER BY event_id""".stripMargin,
    // MAD mirror: same sorted frame, deviations vs 2x-median in 2-micro
    // units, the deviation median's midpoint sum in 4-micro units
    "o5_rolling_mad" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM events),
        |l AS (SELECT event_id, list_sort(list_filter(list(xm) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), v -> v IS NOT NULL)) AS vs
        |  FROM m),
        |d AS (SELECT event_id, vs,
        |    vs[CAST((len(vs)+1)//2 AS INT)] + vs[CAST(len(vs)//2 AS INT) + 1] AS m2
        |  FROM l),
        |e AS (SELECT event_id, len(vs) AS n,
        |    list_sort(list_transform(vs, x -> abs(x*2 - m2))) AS ds
        |  FROM d)
        |SELECT event_id,
        |  CASE WHEN n >= 5 THEN
        |    CAST(ds[CAST((n+1)//2 AS INT)] + ds[CAST(n//2 AS INT) + 1] AS DOUBLE)
        |    / 4000000.0
        |  END AS mad
        |FROM e ORDER BY event_id""".stripMargin,

    // quantile(1/4) mirror: type-7 split into integer k/rem, all-integer
    // interpolation, one final division
    "o5_rolling_quantile" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM events),
        |l AS (SELECT event_id, list_sort(list_filter(list(xm) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), v -> v IS NOT NULL)) AS vs
        |  FROM m),
        |c AS (SELECT event_id, vs,
        |    CAST((len(vs)-1)//4 AS INT) AS k,
        |    (len(vs)-1) % 4 AS rem FROM l)
        |SELECT event_id,
        |  CASE WHEN len(vs) >= 5 THEN
        |    CAST((4-rem)*vs[k+1]
        |      + rem*(CASE WHEN rem = 0 THEN vs[k+1] ELSE vs[k+2] END) AS DOUBLE)
        |    / 4000000.0
        |  END AS q25
        |FROM c ORDER BY event_id""".stripMargin,
    // rank mirror: comparison counting over the raw double frame —
    // lt/le via list_filter with the outer row's value
    "o5_rolling_rank" ->
      """WITH l AS (SELECT event_id, value,
        |    list_filter(list(value) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        |      v -> v IS NOT NULL) AS vs
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN len(vs) >= 7 AND value IS NOT NULL THEN
        |    CAST(len(list_filter(vs, x -> x < value))
        |       + len(list_filter(vs, x -> x <= value)) + 1 AS DOUBLE) / 2.0
        |  END AS rnk
        |FROM l ORDER BY event_id""".stripMargin,
    // corr mirror: HUGEINT numerator + variance terms, IEEE tail in the
    // SwiftRolling.corr op order (two sqrts, one multiply, one division)
    "o5_rolling_corr" ->
      """WITH m AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_quantity AS DECIMAL(20,2))*100 AS BIGINT) END AS xm,
        |  CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(20,2))*100 AS BIGINT) END AS ym
        |  FROM lineitem),
        |s AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    count(xm) OVER w AS n,
        |    CAST(sum(xm*ym) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(xm) OVER w AS BIGINT) AS sx,
        |    CAST(sum(ym) OVER w AS BIGINT) AS sy,
        |    CAST(sum(xm*xm) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(ym*ym) OVER w AS BIGINT) AS syy
        |  FROM m
        |  WINDOW w AS (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_extendedprice, l_quantity
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CASE WHEN n >= 3 AND CAST(n*sxx - sx*sx AS BIGINT) > 0
        |            AND CAST(n*syy - sy*sy AS BIGINT) > 0 THEN
        |    CAST(CAST(n*sxy - sx*sy AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(CAST(n*sxx - sx*sx AS BIGINT) AS DOUBLE))
        |       * sqrt(CAST(CAST(n*syy - sy*sy AS BIGINT) AS DOUBLE)))
        |  END AS qp_corr
        |FROM s
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    // var/std mirror: HUGEINT A term, IEEE tail in SwiftRolling.varStd
    // op order
    "o5_rolling_var" ->
      """WITH m AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM events),
        |s AS (SELECT event_id, count(xm) OVER w AS n,
        |    CAST(sum(xm) OVER w AS HUGEINT) AS s1,
        |    CAST(sum(CAST(xm AS HUGEINT)*xm) OVER w AS HUGEINT) AS s2
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |r AS (SELECT event_id,
        |    CASE WHEN n >= 5 AND CAST(n*s2 - s1*s1 AS DOUBLE) >= 0 THEN
        |      CAST(n*s2 - s1*s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |      / 1000000000000.0 END AS rvar
        |  FROM s)
        |SELECT event_id, rvar, sqrt(rvar) AS rstd FROM r ORDER BY event_id""".stripMargin,
    "o5_rolling_minmax" ->
      """SELECT event_id,
        |  CASE WHEN count(*) OVER w >= 5 THEN min(value) OVER w END AS rmin,
        |  CASE WHEN count(*) OVER w >= 5 THEN max(value) OVER w END AS rmax
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "o4_groupby_transform" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id) AS DOUBLE)
        |    AS user_total
        |FROM events ORDER BY event_id""".stripMargin,
    "o5_rolling_center" ->
      """SELECT event_id,
        |  CASE WHEN count(*) OVER w >= 3
        |    THEN CAST(sum(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) END AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "o1_shift_ops" ->
      """SELECT event_id, lag(value, 1) OVER w AS shifted,
        |  value - lag(value, 1) OVER w AS diffed,
        |  value / nullif(lag(value, 1) OVER w, 0.0) - 1.0 AS pct
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "o1_value_counts" ->
      """SELECT l_returnflag AS val, count(*) AS n FROM lineitem
        |GROUP BY 1 ORDER BY n DESC, val""".stripMargin,
    "o4_groupby_nunique" ->
      """SELECT user_id, count(DISTINCT event_type) AS n_types,
        |  count(DISTINCT props) AS n_props
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o1_cum_ops" ->
      """SELECT event_id, max(value) OVER w AS cummax, min(value) OVER w AS cummin,
        |  count(*) OVER w - 1 AS cumcount
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "o1_map_dict" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'N' THEN 'none'
        |    WHEN 'R' THEN 'returned' END AS flag_name
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o1_str_ops" ->
      """SELECT doc_id, lower(substr(text, 1, 20)) AS head_lower,
        |  CAST(length(text) AS BIGINT) AS n_chars_str,
        |  CAST(contains(text, 'data') AS BIGINT) AS has_data,
        |  substr(text, 5, 8) AS slice_5_8
        |FROM documents ORDER BY doc_id""".stripMargin,
    "o4_groupby_filter" ->
      """SELECT event_id, user_id FROM (
        |  SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events WHERE event_type = 'purchase')
        |WHERE n >= 60 ORDER BY event_id""".stripMargin,
    "o4_groupby_idxmax" ->
      """SELECT user_id,
        |  last(event_id ORDER BY value, event_id) AS idx_max,
        |  max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o1_rank_avg" ->
      """SELECT event_id,
        |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value) AS DOUBLE)
        |  + (CAST(count(*) OVER (PARTITION BY user_id, value) AS DOUBLE) - 1.0) / 2.0
        |    AS avg_rank
        |FROM events ORDER BY event_id""".stripMargin,
    "o1_clean_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  least(greatest(coalesce(nullif(l_tax, 0.0), 0.04), 0.02), 0.07) AS tax_c
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o6_resample_interp" ->
      s"""WITH b AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    ${dsumSql("value")} AS hs, count(*) AS n
         |  FROM events WHERE event_type = 'error' GROUP BY 1),
         |sp AS (SELECT unnest(generate_series(
         |  (SELECT min(bucket) FROM b), (SELECT max(bucket) FROM b),
         |  INTERVAL 1 HOUR)) AS bucket),
         |j AS (SELECT sp.bucket, b.hs, b.n FROM sp LEFT JOIN b USING (bucket))
         |SELECT epoch_us(bucket) AS bucket_us,
         |  CASE WHEN hs IS NOT NULL THEN hs ELSE
         |    last_value(hs IGNORE NULLS) OVER back
         |    + (first_value(hs IGNORE NULLS) OVER fwd
         |       - last_value(hs IGNORE NULLS) OVER back)
         |      * (CAST(epoch_us(bucket)
         |            - last_value(CASE WHEN hs IS NOT NULL THEN epoch_us(bucket) END
         |                IGNORE NULLS) OVER back AS DOUBLE)
         |         / CAST(first_value(CASE WHEN hs IS NOT NULL THEN epoch_us(bucket) END
         |                IGNORE NULLS) OVER fwd
         |            - last_value(CASE WHEN hs IS NOT NULL THEN epoch_us(bucket) END
         |                IGNORE NULLS) OVER back AS DOUBLE))
         |  END AS hr_sum, coalesce(n, 0) AS n
         |FROM j
         |WINDOW back AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  fwd AS (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |ORDER BY bucket_us""".stripMargin,
    "o6_resample_ffill" ->
      s"""WITH b AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    ${dsumSql("value")} AS hr_sum, count(*) AS n
         |  FROM events WHERE event_type = 'error' GROUP BY 1),
         |sp AS (SELECT unnest(generate_series(
         |  (SELECT min(bucket) FROM b), (SELECT max(bucket) FROM b),
         |  INTERVAL 1 HOUR)) AS bucket)
         |SELECT epoch_us(sp.bucket) AS bucket_us,
         |  last_value(b.hr_sum IGNORE NULLS) OVER (ORDER BY sp.bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hr_sum,
         |  coalesce(b.n, 0) AS n
         |FROM sp LEFT JOIN b USING (bucket)
         |ORDER BY bucket_us""".stripMargin,
    "o6_resample_bfill" ->
      s"""WITH b AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         |    ${dsumSql("value")} AS hr_sum, count(*) AS n
         |  FROM events WHERE event_type = 'error' GROUP BY 1),
         |sp AS (SELECT unnest(generate_series(
         |  (SELECT min(bucket) FROM b), (SELECT max(bucket) FROM b),
         |  INTERVAL 1 HOUR)) AS bucket)
         |SELECT epoch_us(sp.bucket) AS bucket_us,
         |  first_value(b.hr_sum IGNORE NULLS) OVER (ORDER BY sp.bucket
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hr_sum,
         |  coalesce(b.n, 0) AS n
         |FROM sp LEFT JOIN b USING (bucket)
         |ORDER BY bucket_us""".stripMargin,
    "o6_resample_label_right" ->
      s"""SELECT epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS bucket_us,
         |  ${dsumSql("value")} AS hr_sum, count(*) AS n
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o6_resample_day" ->
      s"""SELECT epoch_us(date_trunc('day', ts)) AS bucket_us,
         |  ${dsumSql("value")} AS day_sum, count(*) AS n
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // closed='right' mirror: the same −1µs assignment nudge (integer-µs
    // timestamps make t ∈ (S, S+1d] ⇔ t−1µs ∈ [S, S+1d))
    "o6_resample_closed_right" ->
      s"""SELECT epoch_us(date_trunc('day', ts - INTERVAL 1 MICROSECOND)) AS bucket_us,
         |  ${dsumSql("value")} AS day_sum, count(*) AS n
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o6_resample_ohlc" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS bucket_us,
        |  first(value ORDER BY ts, event_id) AS open,
        |  max(value) AS high, min(value) AS low,
        |  last(value ORDER BY ts, event_id) AS close
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o6_resample_grouped" ->
      s"""SELECT user_id, epoch_us(date_trunc('day', ts)) AS bucket_us,
         |  ${dsumSql("value")} AS day_sum, count(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // bucket start = floor((epoch - offset) / width) * width + offset,
    // all in BIGINT microseconds (6h = 21600000000, 1d = 86400000000)
    "o6_resample_origin" ->
      s"""SELECT ((epoch_us(ts) - 21600000000) // 86400000000) * 86400000000
         |    + 21600000000 AS bucket_us,
         |  ${dsumSql("value")} AS day_sum, count(*) AS n
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o5_rolling_apply" ->
      """SELECT event_id, median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
        |FROM events ORDER BY event_id""".stripMargin,
    "o6_resample_apply" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS bucket_us, median(value) AS med
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "o4_groupby_apply_auto" ->
      s"""SELECT l_returnflag AS rf, count(*) AS n, ${dsumSql("l_quantity")} AS sq
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "o1_apply_dates" ->
      """SELECT event_id,
        |  CAST(CAST(strftime(ts, '%Y-%m-%d') AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_off
        |FROM events ORDER BY event_id""".stripMargin,
    "k3_small_local" ->
      "SELECT r_regionkey, upper(r_name) AS upper_name FROM region ORDER BY r_regionkey",
    "k9_force_parallel" ->
      "SELECT n_nationkey, n_nationkey*2 AS nk2 FROM nation ORDER BY n_nationkey"
  )
}
