package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Swift, SwiftEwm}

/** O5/O6 window semantics + a differential property check of the
  * selector (the reference's core invariant, SURVEY.md §1.4.1). */
class WindowGroupSpec extends SparkSpec {
  import spark.implicits._

  test("O5 rolling count window matches a manual trailing sum") {
    val d = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    // pandas parity: integer windows default min_periods = window size,
    // so the first window-1 frames are null unless withMin(1)
    val dflt = Swift(d).rolling(3, orderBy = Seq("id"))
      .agg(sum(col("x")), "s").orderBy("id").collect()
    assert(dflt(0).isNullAt(dflt(0).fieldIndex("s")))
    assert(dflt(1).isNullAt(dflt(1).fieldIndex("s")))
    val out = Swift(d).rolling(3, orderBy = Seq("id")).withMin(1)
      .agg(sum(col("x")), "s")
      .orderBy("id").collect()
    val xs = (1 to 100).map(_.toDouble)
    out.zipWithIndex.foreach { case (r, i) =>
      val expect = xs.slice(math.max(0, i - 2), i + 1).sum
      assert(r.getAs[Double]("s") == expect)
    }
  }

  test("O5 rolling.apply arbitrary function over the frame") {
    val d = (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = Swift(d).rolling(5, orderBy = Seq("id"))
      .apply("x", "med", DoubleType) { xs =>
        val s = xs.sorted; s(s.size / 2) // frame median-ish
      }
      .orderBy("id").collect()
    assert(out.last.getAs[Double]("med") == 48.0) // frame 46..50 -> idx2=48
  }

  test("O5 rolling.apply Aggregator path == collect_list path") {
    val d = (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val med: Seq[Double] => Double = xs => { val s = xs.sorted; s(s.size / 2) }
    val viaAgg = Swift(d).rolling(5, orderBy = Seq("id")).withMin(1)
      .apply("x", "med")(med).orderBy("id").collect()
    val viaList = Swift(d).rolling(5, orderBy = Seq("id")).withMin(1)
      .apply("x", "med", DoubleType)(xs => med(xs)).orderBy("id").collect()
    assert(viaAgg.map(_.getAs[Double]("med")).toSeq
      == viaList.map(_.getAs[Double]("med")).toSeq)
  }

  test("O5 closed= endpoint conventions for time windows") {
    val d = Seq((1L, 0L, 1.0), (2L, 30L, 2.0), (3L, 60L, 3.0), (4L, 90L, 4.0))
      .toDF("id", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
    def sums(closed: String): Map[Long, Option[Double]] =
      Swift(d).rollingTime("1 minute", "ts", closed = closed)
        .agg(sum(col("v")), "s").collect()
        .map(r => r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("s"))) None else Some(r.getAs[Double]("s"))))
        .toMap
    // row 3 is at t=60s with a 60s window: [0,60]=1+2+3, (0,60]=2+3,
    // [0,60)=1+2, (0,60)=2
    assert(sums("both")(3L) == Some(6.0))
    assert(sums("right")(3L) == Some(5.0))
    assert(sums("left")(3L) == Some(3.0))
    assert(sums("neither")(3L) == Some(2.0))
    // closed=left/neither exclude the current row: first row's frame is empty
    assert(sums("left")(1L) == None)
  }

  test("O6 resample offset shifts bucket boundaries (origin kwarg)") {
    val d = Seq((1L, "2024-01-02 05:00:00", 1.0), (2L, "2024-01-02 07:00:00", 2.0))
      .toDF("id", "tss", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Swift(d).resample("1 day", "ts").withOffset("6 hours")
      .agg(sum(col("v")).as("s"))
      .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm").as("b"), col("s"))
      .orderBy("b").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "2024-01-01 06:00" && out(0).getAs[Double]("s") == 1.0)
    assert(out(1).getString(0) == "2024-01-02 06:00" && out(1).getAs[Double]("s") == 2.0)
  }

  test("O4+O5/O6 sugar: groupby().rolling and groupby().resample") {
    val ev = queries.Tables.t(spark, sf001, "events")
    val viaSugar = Swift(ev).groupBy("user_id").rolling(3, Seq("ts", "event_id"))
      .withMin(1).agg(sum(col("value")), "s")
      .select("event_id", "s").orderBy("event_id").collect()
    val direct = Swift(ev).rolling(3, Seq("ts", "event_id"), partitionBy = Seq("user_id"))
      .withMin(1).agg(sum(col("value")), "s")
      .select("event_id", "s").orderBy("event_id").collect()
    assert(viaSugar.sameElements(direct))

    val rs = Swift(ev).groupBy("user_id").resample("1 day", "ts")
      .agg(count(lit(1)).as("n"))
    assert(rs.agg(sum("n")).head.getLong(0) == ev.count())
    assert(rs.columns.contains("user_id") && rs.columns.contains("bucket"))
  }

  test("O6 resample bucket sums cover all rows") {
    val ev = queries.Tables.t(spark, sf001, "events")
    val out = Swift(ev).resample("1 day", "ts").agg(count(lit(1)).as("n"))
    assert(out.agg(sum("n")).head.getLong(0) == ev.count())
  }

  test("O5 ewm mean matches a local recomputation; head row equals its value") {
    val d = (1 to 50).map(i => (i.toLong, (i * 37 % 11) * 0.5)).toDF("id", "x")
    val out = Swift(d).ewm(0.5, orderBy = Seq("id")).mean("x", "e")
      .orderBy("id").collect().map(_.getDouble(2))
    // local mirror of the quantized arithmetic (same Long micro-weights)
    val ws = SwiftEwm.microWeights(0.5)
    val xs = (1 to 50).map(i => (i * 37 % 11) * 0.5)
    val expect = xs.indices.map { t =>
      val m = math.min(t + 1, ws.length)
      val num = (0 until m).map(k => ws(k) * math.round(xs(t - k) * 1e6)).sum
      val den = (0 until m).map(ws).sum
      num.toDouble / (den.toDouble * 1e6)
    }
    out.zip(expect).foreach { case (a, b) => assert(a == b) }
    assert(out.head == xs.head) // single-row frame renormalizes to x₀
  }

  test("O5 ewm mean: an all-null frame yields null, not INVALID_INDEX_OF_ZERO") {
    // collect_list drops nulls, so a partition whose first ordered row is
    // null has an m=0 frame — element_at(…, 0) always throws in Spark;
    // the when(m >= 1) guard must short-circuit to null (pandas NaN)
    val d = Seq[(Long, String, Option[Double])](
      (1L, "a", None), (2L, "a", Some(2.0)), (3L, "a", Some(4.0)),
      (1L, "b", Some(1.0)), (2L, "b", None)).toDF("id", "g", "x")
    val out = Swift(d).ewm(0.5, orderBy = Seq("id"), partitionBy = Seq("g"))
      .mean("x", "e").orderBy("g", "id").collect()
    assert(out(0).isNullAt(3)) // a/id=1: frame holds only a null
    assert(out(1).getDouble(3) == 2.0) // a/id=2: renormalized over [2.0]
    assert(out(4).getDouble(3) == 1.0) // b/id=2: null skipped, mean of [1.0]
  }

  test("O5 ewm variance: matches the integer-algebra recomputation; m=1 is null") {
    val d = (1 to 40).map(i => (i.toLong, (i * 53 % 13) * 0.25)).toDF("id", "x")
    val rows = Swift(d).ewm(0.5, orderBy = Seq("id")).variance("x", "v")
      .orderBy("id").collect()
    val ws = SwiftEwm.microWeights(0.5)
    val xs = (1 to 40).map(i => (i * 53 % 13) * 0.25)
    assert(rows.head.isNullAt(2)) // single-observation frame → NaN/null
    (1 until 40).foreach { t =>
      val m = math.min(t + 1, ws.length)
      val wUsed = (0 until m).map(ws)
      val vals = (0 until m).map(k => BigInt(math.round(xs(t - k) * 1e6)))
      val sw1 = wUsed.map(BigInt(_)).sum
      val sw2 = wUsed.map(w => BigInt(w) * w).sum
      val swx = (0 until m).map(k => vals(k) * wUsed(k)).sum
      val swxx = (0 until m).map(k => vals(k) * vals(k) * wUsed(k)).sum
      val expect = (swxx * sw1 - swx * swx).toDouble / (sw1 * sw1 - sw2).toDouble / 1e12
      assert(rows(t).getDouble(2) == expect, s"row $t")
    }
  }

  test("O5 win_type weight shapes: symmetric, peaked at center") {
    import graft.core.SwiftRollingWeighted.weights
    Seq("triang", "bartlett", "parzen", "cosine", "hamming", "blackman",
        "blackmanharris", "nuttall").foreach { wt =>
      val w = weights(7, wt)
      assert(w == w.reverse, s"$wt not symmetric: $w")
      assert(w(3) == w.max, s"$wt not peaked at center: $w")
      assert(w.forall(_ >= 0L), s"$wt has negative weight: $w")
    }
    Seq(("kaiser", 8.0), ("exponential", 2.0), ("gaussian", 2.0)).foreach {
      case (wt, p) =>
        val w = weights(7, wt, p)
        assert(w == w.reverse, s"$wt not symmetric: $w")
        assert(w(3) == w.max, s"$wt not peaked at center: $w")
    }
    // parzen is EXACT (scaled by n³ = 343) on scipy's grid x = p/n with
    // the piecewise cutoff at 2p ≤ n−1: endpoints are 2(n−(n−1))³ = 2
    // (scipy/pandas parzen never reaches 0 — the old (n−1)-normalized
    // grid that did was a divergence, ADVICE r7), center is n³
    assert(weights(7, "parzen") == Seq(2L, 54L, 223L, 343L, 223L, 54L, 2L))
    // normalized: [0.00583, 0.157, 0.650, 1.0] — scipy.signal.windows
    // .parzen(7) to 3 significant digits
    val p7 = weights(7, "parzen").map(_.toDouble / 343.0)
    assert(math.abs(p7(0) - 0.00583) < 1e-4 && math.abs(p7(1) - 0.1574) < 1e-3
      && math.abs(p7(2) - 0.6501) < 1e-3 && p7(3) == 1.0)
    // kaiser endpoints: I₀(0)/I₀(β) = 1/I₀(8) ≈ 2.33e-3 in micro-weights
    val k7 = weights(7, "kaiser", 8.0)
    assert(k7.head == math.round(1e6 / graft.core.SwiftRollingWeighted.besselI0(8.0)))
    assert(k7(3) == 1000000L) // center: I₀(β)/I₀(β) = 1
    // exponential(tau=2): center 1, one step off = e^{-1/2}
    val e7 = weights(7, "exponential", 2.0)
    assert(e7(3) == 1000000L && e7(2) == math.round(math.exp(-0.5) * 1e6))
  }

  test("O6 resample closed='right': boundary value joins the earlier bin") {
    val d = Seq((1L, "2024-01-02 00:00:00", 10.0), // exactly ON a day boundary
                (2L, "2024-01-02 06:00:00", 1.0),
                (3L, "2024-01-01 06:00:00", 2.0))
      .toDF("id", "tss", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    def buckets(rs: graft.core.SwiftResample): Map[String, Double] =
      rs.agg(sum(col("v")).as("s"))
        .select(date_format(col("bucket"), "yyyy-MM-dd").as("b"), col("s"))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("s")).toMap
    // closed='left' (default): [S, S+1d) — midnight row starts Jan 2
    val left = buckets(Swift(d).resample("1 day", "ts"))
    assert(left("2024-01-01") == 2.0 && left("2024-01-02") == 11.0)
    // closed='right': (S, S+1d] — midnight row closes Jan 1's bin
    val right = buckets(Swift(d).resample("1 day", "ts").withClosed("right"))
    assert(right("2024-01-01") == 12.0 && right("2024-01-02") == 1.0)
    // label is unaffected by the assignment nudge: still the bin start
    assert(right.keySet == Set("2024-01-01", "2024-01-02"))
  }

  test("min_periods yields null for underfilled frames") {
    val d = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val roll = Swift(d).rolling(3, orderBy = Seq("id")).withMin(3)
    val out = roll.agg(sum(col("x")), "s").orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("s")))
    assert(out(1).isNullAt(out(1).fieldIndex("s")))
    assert(!out(2).isNullAt(out(2).fieldIndex("s")))
  }

  test("O5 rolling kurt/sem/median/quantile/rank match pandas") {
    // pandas 2.x oracle: Series([3,1,4,1,5,9,2,6,5,3]).rolling(n).<op>()
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val d = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    def got(df: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Double]] =
      df.orderBy("id").collect().toSeq.map(r =>
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c)))
    def close(a: Seq[Option[Double]], want: Seq[Double], tol: Double): Unit =
      a.zip(want).foreach {
        case (None, w) => assert(w.isNaN, s"got null, want $w")
        case (Some(g), w) => assert(math.abs(g - w) <= tol, s"got $g, want $w")
      }
    val nan = Double.NaN
    // kurt/sem: 1e-9 tolerance for the disclosed 10⁻⁴/10⁻⁶ fixed-point
    // quantization; median/quantile/rank are exact on this data
    close(got(Swift(d).rolling(7, orderBy = Seq("id")).kurt("x", "k"), "k"),
      Seq(nan, nan, nan, nan, nan, nan, 1.7305102370110077,
        -0.3053254437869818, 0.3483580409082393, 0.05221068819684831), 1e-9)
    close(got(Swift(d).rolling(5, orderBy = Seq("id")).sem("x", "s"), "s"),
      Seq(nan, nan, nan, nan, 0.8944271909999159, 1.6583123951777,
        1.5572411502397436, 1.6046806535881213, 1.2549900398011133,
        1.3693063937629153), 1e-9)
    close(got(Swift(d).rolling(5, orderBy = Seq("id")).median("x", "m"), "m"),
      Seq(nan, nan, nan, nan, 3.0, 4.0, 4.0, 5.0, 5.0, 5.0), 0.0)
    close(got(Swift(d).rolling(5, orderBy = Seq("id")).quantile("x", 1, 4, "q"), "q"),
      Seq(nan, nan, nan, nan, 1.0, 1.0, 2.0, 2.0, 5.0, 3.0), 0.0)
    close(got(Swift(d).rolling(7, orderBy = Seq("id")).rank("x", "r"), "r"),
      Seq(nan, nan, nan, nan, nan, nan, 3.0, 6.0, 4.5, 3.0), 0.0)
    val vs = got(Swift(d).rolling(5, orderBy = Seq("id"))
      .varStd("x", "v", "sd"), "v")
    close(vs, Seq(nan, nan, nan, nan, 3.2, 11.0, 9.7, 10.3,
      6.300000000000001, 7.500000000000001), 1e-9)
    close(got(Swift(d).rolling(5, orderBy = Seq("id"))
        .varStd("x", "v", "sd"), "sd"),
      Seq(nan, nan, nan, nan, 1.7888543819998317, 3.3166247903554,
        3.1144823004794873, 3.2093613071762426, 2.5099800796022267,
        2.7386127875258306), 1e-9)
    // corr: a second column paired against the first 8 values
    val d2 = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
      .zip(Seq(2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0, 8.0)).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "x", "y")
    close(got(Swift(d2).rolling(3, orderBy = Seq("id")).corr("x", "y", "c"), "c"),
      Seq(nan, nan, -0.9843241382880896, -0.9912407071619304,
        -0.9305008557631897, 0.0, 0.9526832000714107, 0.9041944301794647), 1e-9)
    // pairwise-complete NaN handling: a null x masks the whole pair, so
    // every frame touching it has < min_periods valid pairs → null
    // (pandas: [nan ×5, 0.0] for both corr and cov)
    val dn = Seq((0L, Some(3.0), 2.0), (1L, Some(1.0), 7.0),
      (2L, None: Option[Double], 1.0), (3L, Some(1.0), 8.0),
      (4L, Some(5.0), 2.0), (5L, Some(9.0), 8.0)).toDF("id", "x", "y")
    close(got(Swift(dn).rolling(3, orderBy = Seq("id")).corr("x", "y", "c"), "c"),
      Seq(nan, nan, nan, nan, nan, 0.0), 0.0)
    close(got(Swift(dn).rolling(3, orderBy = Seq("id")).cov("x", "y", "c"), "c"),
      Seq(nan, nan, nan, nan, nan, 0.0), 0.0)
  }

  test("selector invisibility: all strategies produce identical results") {
    val d = (1 to 2000).map(i => (i.toLong, i * 0.25)).toDF("id", "x")
    val fn: Double => Double = v => if (v < 100) v * v else v / 2
    val vec = when(col("x") < 100, col("x") * col("x")).otherwise(col("x") / 2)

    val viaVec = Swift(d).applyScalar[Double, Double]("x", "y")(fn, Some(vec))
    val viaPar = Swift(d).forceParallel().applyScalar[Double, Double]("x", "y")(fn)
    val viaLocal = Swift(d).threshold(1e9).applyScalar[Double, Double]("x", "y")(fn)

    val a = viaVec.orderBy("id").collect()
    assert(a.sameElements(viaPar.orderBy("id").collect()))
    assert(a.sameElements(viaLocal.orderBy("id").collect()))
  }

  test("O4 groupby dropna: NULL keys kept by default, dropped pre-shuffle with dropna()") {
    val d = Seq((java.lang.Long.valueOf(1L), 10L), (null.asInstanceOf[java.lang.Long], 20L),
      (java.lang.Long.valueOf(1L), 30L), (null.asInstanceOf[java.lang.Long], 40L),
      (java.lang.Long.valueOf(2L), 50L)).toDF("k", "v")
    // default = Spark/pandas-dropna=False semantics: NULL is a group
    val kept = Swift(d).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((Some(1L), 2L, 40L), (Some(2L), 1L, 50L), (None, 2L, 60L)))
    // dropna() = pandas default: NULL-key rows never enter the aggregate
    val dropped = Swift(d).groupBy("k").dropna()
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dropped == Set((1L, 2L, 40L), (2L, 1L, 50L)))
    // the filter sits UNDER the exchange: dropped rows never shuffle.
    // (Asserted on the parquet-backed query — on a LocalRelation the
    // optimizer folds the filter into the local scan at plan time.)
    val p = graft.queries.CoreQueries.queries("o4_groupby_dropna")(spark,
      sf001).queryExecution.executedPlan.toString
    assert(p.contains("isnotnull"), p.take(2000))
    // flatMapGroups path honors it too
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("n", LongType)))
    val viaApply = Swift(d).groupBy("k").dropna().apply(schema) { (key, it) =>
      Iterator.single(org.apache.spark.sql.Row(key.getLong(0), it.size.toLong))
    }.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaApply == Set((1L, 2L), (2L, 1L)))
  }

  test("O4 groupby sort=False: groups in first-appearance order via first_pos") {
    // index 0..5; key 'b' appears first (pos 0), then 'a' (pos 1), 'c' (pos 4)
    val d = Seq((0L, "b", 1L), (1L, "a", 2L), (2L, "b", 3L),
      (3L, "a", 4L), (4L, "c", 5L), (5L, "b", 6L)).toDF("index", "k", "v")
    val out = Swift(d).groupBy("k").sort(false)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // result order IS first-appearance order (pandas sort=False), and
    // first_pos materializes it for any downstream re-sort
    assert(out.toSeq == Seq(("b", 0L, 3L, 10L), ("a", 1L, 2L, 6L), ("c", 4L, 1L, 5L)))
    // sort=true (default) keeps the plain agg shape — no first_pos column
    val defCols = Swift(d).groupBy("k")
      .agg(count(lit(1)).as("n")).columns.toSeq
    assert(defCols == Seq("k", "n"))
    // composes with dropna: NULL-key rows drop BEFORE first_pos is minned
    val dn = Seq((0L, null.asInstanceOf[String], 1L), (1L, "a", 2L))
      .toDF("index", "k", "v")
    val dnOut = Swift(dn).groupBy("k").dropna().sort(false)
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(dnOut.toSeq == Seq(("a", 1L, 1L)))
    // composes with the column-subset projection (the index column is
    // re-attached for the min even when the subset omits it)
    val sub = Swift(d).groupBy("k").select("v").sort(false)
      .agg(sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sub.toSeq == Seq(("b", 0L, 10L), ("a", 1L, 6L), ("c", 4L, 5L)))
    // sort(true) restores the plain shape after a sort(false)
    val restored = Swift(d).groupBy("k").sort(false).sort(true, "index")
      .agg(count(lit(1)).as("n")).columns.toSeq
    assert(restored == Seq("k", "n"))
  }
}
