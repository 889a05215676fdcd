package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Swift

/** O5/O6 window semantics + a differential property check of the
  * selector (the reference's core invariant, SURVEY.md §1.4.1). */
class WindowGroupSpec extends SparkSpec {
  import spark.implicits._

  test("O5 rolling count window matches a manual trailing sum") {
    val d = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = Swift(d).rolling(3, orderBy = Seq("id"))
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

  test("O6 resample bucket sums cover all rows") {
    val ev = queries.Tables.t(spark, sf001, "events")
    val out = Swift(ev).resample("1 day", "ts").agg(count(lit(1)).as("n"))
    assert(out.agg(sum("n")).head.getLong(0) == ev.count())
  }

  test("min_periods yields null for underfilled frames") {
    val d = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val roll = Swift(d).rolling(3, orderBy = Seq("id")).withMin(3)
    val out = roll.agg(sum(col("x")), "s").orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("s")))
    assert(out(1).isNullAt(out(1).fieldIndex("s")))
    assert(!out(2).isNullAt(out(2).fieldIndex("s")))
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
}
