package graft

import org.apache.spark.sql.functions._

import graft.core.Swift

/** Property check of the rolling moment family (var/sem/skew/kurt and
  * the order statistics median/quantile/rank) against EXACT BigInt
  * reference arithmetic: 100 random 2-decimal frames, each operator's
  * full-frame output must equal the reference's replication of the
  * documented integer algebra + IEEE tail bit-for-bit. This is the
  * same differential discipline FixedDotSq gets — the decimal
  * expressions must not silently overflow or reassociate. */
class RollingMomentPropertySpec extends SparkSpec {
  import spark.implicits._

  private val G = 100 // groups (one random frame each)
  private val W = 7   // window = rows per group, so the last row sees the full frame

  // seeded 2-decimal values in [0, 500) — the events.value shape
  private lazy val frames: Map[Int, Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    (0 until G).map(g => g -> Seq.fill(W)(rnd.nextInt(50000) / 100.0)).toMap
  }

  private lazy val df = frames.toSeq.flatMap { case (g, vs) =>
    vs.zipWithIndex.map { case (v, i) => (g, i.toLong, v) }
  }.toDF("g", "idx", "x")

  /** Last-row (full-frame) outputs per group for a rolling op. */
  private def lastRow(out: org.apache.spark.sql.DataFrame,
      c: String): Map[Int, Double] =
    out.filter(col("idx") === W - 1)
      .select(col("g"), col(c)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap

  private def micros(vs: Seq[Double]): Seq[BigInt] =
    vs.map(v => BigInt(math.round(v * 1e6)))

  test("var/sem: exact A-term algebra matches BigInt reference") {
    val roll = Swift(df).rolling(W, orderBy = Seq("idx"), partitionBy = Seq("g"))
    val gotVar = lastRow(roll.varStd("x", "v", "sd"), "v")
    val gotSem = lastRow(roll.sem("x", "s"), "s")
    frames.foreach { case (g, vs) =>
      val xm = micros(vs)
      val n = BigInt(W)
      val a = (n * xm.map(x => x * x).sum - xm.sum * xm.sum).toDouble
      val nn = W.toDouble
      val refVar = a / (nn * (nn - 1.0)) / 1e12
      val refSem = math.sqrt(a / (nn * (nn - 1.0)) / 1e12 / (nn - 1.0))
      assert(gotVar(g) == refVar, s"var g=$g got ${gotVar(g)} want $refVar")
      assert(gotSem(g) == refSem, s"sem g=$g got ${gotSem(g)} want $refSem")
    }
  }

  test("skew/kurt: exact raw-moment algebra matches BigInt reference") {
    val roll = Swift(df).rolling(W, orderBy = Seq("idx"), partitionBy = Seq("g"))
    val gotSkew = lastRow(roll.skew("x", "sk"), "sk")
    val gotKurt = lastRow(roll.kurt("x", "ku"), "ku")
    frames.foreach { case (g, vs) =>
      val nn = W.toDouble
      // skew: micro-unit sums
      val xm = micros(vs)
      val n = BigInt(W)
      val aS = (n * xm.map(x => x * x).sum - xm.sum * xm.sum).toDouble
      val bS = (n * n * xm.map(x => x * x * x).sum
        - BigInt(3) * n * xm.sum * xm.map(x => x * x).sum
        + BigInt(2) * xm.sum * xm.sum * xm.sum).toDouble
      val refSkew = (bS * math.sqrt(nn * (nn - 1.0))) /
        ((aS * math.sqrt(aS)) * (nn - 2.0))
      // kurt: 10^4 fixed point
      val x4 = vs.map(v => BigInt(math.round(v * 1e4)))
      val (s1, s2, s3, s4) = (x4.sum, x4.map(x => x * x).sum,
        x4.map(x => x * x * x).sum, x4.map(x => x * x * x * x).sum)
      val aK = (n * s2 - s1 * s1).toDouble
      val cK = (n * n * n * s4 - BigInt(4) * n * n * s1 * s3
        + BigInt(6) * n * s1 * s1 * s2 - BigInt(3) * s1 * s1 * s1 * s1).toDouble
      val refKurt = (nn - 1.0) / ((nn - 2.0) * (nn - 3.0)) *
        ((nn + 1.0) * (cK / (aK * aK) - 3.0) + 6.0)
      assert(gotSkew(g) == refSkew, s"skew g=$g got ${gotSkew(g)} want $refSkew")
      assert(gotKurt(g) == refKurt, s"kurt g=$g got ${gotKurt(g)} want $refKurt")
    }
  }

  test("median/quantile/rank: order statistics match direct computation") {
    val roll = Swift(df).rolling(W, orderBy = Seq("idx"), partitionBy = Seq("g"))
    val gotMed = lastRow(roll.median("x", "m"), "m")
    val gotQ = lastRow(roll.quantile("x", 1, 4, "q"), "q")
    val gotR = lastRow(roll.rank("x", "r"), "r")
    frames.foreach { case (g, vs) =>
      val sorted = micros(vs).sorted
      val lo = sorted((W + 1) / 2 - 1)
      val hi = sorted(W / 2)
      val refMed = (lo.toDouble + hi.toDouble) / 2000000.0
      val p = (W - 1) * 1; val k = p / 4; val rem = p % 4
      val a = sorted(k)
      val b = if (rem == 0) a else sorted(k + 1)
      val refQ = (BigInt(4 - rem) * a + BigInt(rem) * b).toDouble / 4000000.0
      val cur = vs.last
      val refR = (vs.count(_ < cur) + vs.count(_ <= cur) + 1).toDouble / 2.0
      assert(gotMed(g) == refMed, s"median g=$g got ${gotMed(g)} want $refMed")
      assert(gotQ(g) == refQ, s"quantile g=$g got ${gotQ(g)} want $refQ")
      assert(gotR(g) == refR, s"rank g=$g got ${gotR(g)} want $refR")
    }
  }

  test("moment + order ops compose with expanding() frames") {
    // expanding() returns the same SwiftRolling surface — the n-th row of
    // an expanding median equals rolling(n) over the prefix
    val exp = Swift(df).expanding(orderBy = Seq("idx"), partitionBy = Seq("g"))
    val out = exp.median("x", "m").filter(col("idx") === 2)
      .select(col("g"), col("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    frames.foreach { case (g, vs) =>
      val sorted = micros(vs.take(3)).sorted
      val ref = (sorted(1).toDouble + sorted(1).toDouble) / 2000000.0
      assert(out(g) == ref, s"expanding median g=$g got ${out(g)} want $ref")
    }
  }
}
