package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Swift
import graft.queries.Tables
import graft.operators.{Binning, Reshape}

/** Behavior specs for the round-7 pandas-parity additions: expanding
  * windows, rolling covariance, groupby transform, resample ffill, cut. */
class ParityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("expanding: cumulative frames match a manual scan") {
    val df = Seq((1L, 1, 2.0), (1L, 2, 3.0), (1L, 3, 5.0), (2L, 1, 10.0))
      .toDF("k", "i", "v")
    val out = Swift(df).expanding(orderBy = Seq("i"), partitionBy = Seq("k"))
      .agg(sum(col("v").cast(DecimalType(20, 6))), "cum", _.cast("double"))
      .select("k", "i", "cum").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 1)) == 2.0 && out((1L, 2)) == 5.0 && out((1L, 3)) == 10.0)
    assert(out((2L, 1)) == 10.0)
  }

  test("rolling cov: matches the two-pass textbook sample covariance") {
    val xs = Seq(3.25, 1.5, 4.75, 2.0, 6.5)
    val ys = Seq(10.0, 14.5, 7.25, 11.0, 3.5)
    val df = xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (1L, i, x, y) }
      .toDF("k", "i", "x", "y")
    val got = Swift(df).rolling(3, orderBy = Seq("i"), partitionBy = Seq("k"))
      .cov("x", "y", "c").select("i", "c").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // frames 0,1 have n<3 -> null
    assert(got(0).isEmpty && got(1).isEmpty)
    def cov3(i: Int): Double = {
      val fx = xs.slice(i - 2, i + 1); val fy = ys.slice(i - 2, i + 1)
      val mx = fx.sum / 3; val my = fy.sum / 3
      fx.zip(fy).map { case (a, b) => (a - mx) * (b - my) }.sum / 2
    }
    (2 to 4).foreach { i =>
      assert(math.abs(got(i).get - cov3(i)) < 1e-9, s"frame $i")
    }
  }

  test("rolling skew: matches the textbook adjusted Fisher-Pearson formula") {
    val xs = Seq(3.25, 1.5, 4.75, 2.0, 6.5, 1.25, 8.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i, x) }.toDF("k", "i", "x")
    val got = Swift(df).rolling(5, orderBy = Seq("i"), partitionBy = Seq("k"))
      .skew("x", "sk").select("i", "sk").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert((0 to 3).forall(got(_).isEmpty)) // frames with n < 5
    def skew5(i: Int): Double = {
      val f = xs.slice(i - 4, i + 1); val n = 5.0
      val m = f.sum / n
      val m2 = f.map(x => (x - m) * (x - m)).sum / n
      val m3 = f.map(x => math.pow(x - m, 3)).sum / n
      math.sqrt(n * (n - 1)) / (n - 2) * m3 / math.pow(m2, 1.5)
    }
    (4 to 6).foreach { i =>
      assert(math.abs(got(i).get - skew5(i)) < 1e-9, s"frame $i")
    }
  }

  test("groupby transform: group aggregate lands on every row, length preserved") {
    val df = Seq((1L, 2.0), (1L, 3.0), (2L, 7.0)).toDF("k", "v")
    val out = Swift(df).groupBy("k")
      .transform(sum(col("v").cast(DecimalType(20, 6))), "tot", _.cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 3)
    assert(out.filter(_._1 == 1L).forall(_._3 == 5.0))
    assert(out.filter(_._1 == 2L).forall(_._3 == 7.0))
  }

  test("resample ffill: gap buckets materialize with the previous value and n=0") {
    val base = java.sql.Timestamp.valueOf("1970-01-01 00:30:00")
    def at(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600L * 1000)
    // hours 0, 1, 4 populated; 2 and 3 are gaps
    val df = Seq((at(0), 1.0), (at(1), 2.0), (at(4), 8.0)).toDF("ts", "v")
    val out = Swift(df).resample("1 hour", "ts")
      .aggFfill(sum(col("v").cast(DecimalType(20, 6))), "s", _.cast("double"))
      .orderBy("bucket").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq((1.0, 1L), (2.0, 1L), (2.0, 0L), (2.0, 0L), (8.0, 1L)))
  }

  test("cut: right-closed intervals, outside range and nulls -> null") {
    val df = Seq(Some(0.0), Some(0.5), Some(1.0), Some(1.5), Some(2.0),
      Some(2.5), None).toDF("x")
    val got = df.select(Binning.cut(col("x"), Seq(0.0, 1.0, 2.0), Seq("a", "b")).as("b"))
      .collect().map(r => Option(r.getString(0)))
    // 0.0 is outside (left edge open); 1.0 closes bin a; 2.0 closes bin b
    assert(got.toSeq == Seq(None, Some("a"), Some("a"), Some("b"), Some("b"), None, None))
  }

  test("melt: wide-to-long inverts a pivot; row count = n x value cols") {
    val df = Seq((1L, 2.0, 3.0), (2L, 5.0, 7.0)).toDF("id", "a", "b")
    val long = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    assert(long.count() == 4)
    val back = long.groupBy("id").pivot("variable", Seq("a", "b")).sum("value")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getDouble(2))).toSeq == Seq((1L, 2.0, 3.0), (2L, 5.0, 7.0)))
  }

  test("oneHot: exactly one dummy fires per row; unknown category = all zeros") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "zz")).toDF("id", "c")
    val out = Reshape.oneHot(df, "c", Seq("x", "y"), "d")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(r.fieldIndex("d_x")), r.getLong(r.fieldIndex("d_y"))))
      .toSeq == Seq((1L, 0L), (0L, 1L), (0L, 0L)))
  }

  test("crosstab: cell counts match pair frequencies; absent cell = 0") {
    val df = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("b", "v")).toDF("r", "c")
    val out = Reshape.crosstab(df, "r", "c", Seq("u", "v")).orderBy("r").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(out.toSeq == Seq(("a", 2L, 1L), ("b", 0L, 1L)))
  }

  test("zscore: scaled column has mean ~0 and population std ~1") {
    val li = Tables.t(spark, sf001, "lineitem")
    val z = Binning.zscore(li, "l_quantity", "z")
    val r = z.agg(avg(col("z")), stddev_pop(col("z"))).head
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }

  test("robustScale: planted quartiles, outlier immunity, constant -> 0") {
    import spark.implicits._
    // 1..9: q1=3, med=5, q3=7 under type-7 interpolation
    val d = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val r = Binning.robustScale(d, "x", "r").orderBy("id")
      .collect().map(_.getDouble(2))
    assert(r.head === (1.0 - 5.0) / 4.0 && r.last === 1.0)
    // one wild outlier barely moves the scaling (vs zscore it would)
    val d2 = ((1 to 9).map(i => (i.toLong, i.toDouble)) :+ (10L, 1e9))
      .toDF("id", "x")
    val r2 = Binning.robustScale(d2, "x", "r")
      .filter(col("id") === 5L).head.getDouble(2)
    assert(math.abs(r2) < 0.2, s"median row must stay near 0: $r2")
    val const = Seq((1L, 4.0), (2L, 4.0), (3L, 4.0)).toDF("id", "x")
    assert(Binning.robustScale(const, "x", "r").collect()
      .forall(_.getDouble(2) == 0.0))
  }

  test("targetEncodeLoo: hand values, singleton category -> null") {
    import spark.implicits._
    val d = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 7.0)).toDF("id", "cat", "y")
    val out = Binning.targetEncodeLoo(d, "cat", "y", "loo")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("loo")).map(_.doubleValue)).toMap
    assert(out(1L).contains(25.0)) // (20+30)/2
    assert(out(2L).contains(20.0)) // (10+30)/2
    assert(out(3L).contains(15.0)) // (10+20)/2
    assert(out(4L).isEmpty, "singleton category must encode null")
  }

  test("driftHist: planted gap surfaces, identical halves report zero") {
    import spark.implicits._
    // side A: 3 rows bin 0, 1 row bin 1; side B: 1 and 3
    val d = Seq((true, 0L), (true, 0L), (true, 0L), (true, 1L),
      (false, 0L), (false, 1L), (false, 1L), (false, 1L))
      .toDF("side", "bin")
    val out = Binning.driftHist(d, col("side"), col("bin"))
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq === Seq((0L, 3L, 1L, 500000L), (1L, 1L, 3L, 500000L)))
    val same = Seq((true, 0L), (false, 0L), (true, 1L), (false, 1L))
      .toDF("side", "bin")
    assert(Binning.driftHist(same, col("side"), col("bin")).collect()
      .forall(_.getLong(5) == 0L))
  }

  test("corrMatrix: planted perfect, anti, and near-zero correlations") {
    import spark.implicits._
    val d = Seq((1.0, 2.0, -1.0, 3.0), (2.0, 4.0, -2.0, 1.0),
      (3.0, 6.0, -3.0, 3.5), (4.0, 8.0, -4.0, 0.5))
      .toDF("x", "y2x", "negx", "w")
    val out = Binning.corrMatrix(d, Seq("x", "y2x", "negx", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(math.abs(out(("x", "y2x")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "negx")) + 1.0) < 1e-12)
    assert(math.abs(out(("x", "w"))) < 1.0)
    assert(out.size == 6, "4 columns -> 6 pairs")
  }

  test("imputeLocf: carries the last observation, leading nulls stay null") {
    import spark.implicits._
    val d = Seq(
      (1L, 1L, Option.empty[Double]),  // leading null: stays null
      (1L, 2L, Some(5.0)), (1L, 3L, None), (1L, 4L, None),
      (1L, 5L, Some(7.0)), (2L, 1L, Some(9.0)), (2L, 2L, None))
      .toDF("k", "t", "v")
    val out = Binning.imputeLocf(d, "k", "t", "t", "v", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.getAs[java.lang.Double]("f")).map(_.doubleValue)).toMap
    assert(out((1L, 1L)).isEmpty)
    assert(out((1L, 3L)).contains(5.0) && out((1L, 4L)).contains(5.0))
    assert(out((1L, 5L)).contains(7.0))
    assert(out((2L, 2L)).contains(9.0), "fills never cross keys")
  }

  test("zscore: exact beyond the BIGINT-square bound (|x| > 3037)") {
    // micro-unit values past ⌊√(2⁶³−1)⌋ wrap a Long square silently; the
    // gated decimal branch must keep Σxm² exact (a wrapped sxx skews σ,
    // breaking the std≈1 invariant — or NaNs it via a negative variance)
    val d = Seq(12345.125, -8000.5, 5000.25, 3036.0, 1.5, 0.0)
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    val z = Binning.zscore(d, "x", "z")
    val r = z.agg(avg(col("z")), stddev_pop(col("z"))).head
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }

  test("normalizeL2: every non-zero vector lands on the unit sphere") {
    import spark.implicits._
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.normalizeL2(df, "vec_id", "embedding")
      .groupBy("id").agg(sum(col("xn") * col("xn")).as("nrm2")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(math.abs(out(1L).get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(out(2L).isEmpty) // zero vector: null components → null norm
  }

  test("fillna/clip: nulls filled then clamped; non-null values pass clip only") {
    val df = Seq(Some(0.5), None, Some(9.0), Some(-3.0)).toDF("x")
    val out = Swift(Swift(df).fillna("x", 1.5, "f")).clip("f", 0.0, 2.0, "c")
      .select("c").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.5, 1.5, 2.0, 0.0))
  }

  test("observe: pipeline telemetry rides the job — no second pass over the corpus") {
    // the production pattern for quality dashboards at 100 TB: metrics
    // (rows kept, tokens, PII hits) are OBSERVED during the one job that
    // writes the output, instead of re-scanning the corpus to count
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
    val gated = docs
      .filter(length(col("text")) >= 50)
      .observe("curation_metrics",
        count(lit(1)).as("docs_kept"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens_kept"))
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var metrics: Option[org.apache.spark.sql.Row] = None
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.get("curation_metrics").foreach(r => metrics = Some(r))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val written = gated.count()
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (listener.metrics.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      // the observed metrics equal an explicit recount
      val m = listener.metrics.getOrElse(fail("no observed metrics delivered"))
      assert(m.getAs[Long]("docs_kept") == written)
      val expectTokens = docs.filter(length(col("text")) >= 50)
        .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
      assert(m.getAs[Long]("tokens_kept") == expectTokens)
    } finally spark.listenerManager.unregister(listener)
  }
}
