package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.AsOfJoin

/** Null right VALUES in as-of joins: pandas merge_asof returns the matched
  * row as a unit — if that row's value column is NULL, the output is NULL.
  * A per-column last(ignoreNulls) carry would instead back-fill the value
  * from an OLDER right row, welding fields of different rows together;
  * the struct-carry implementation must not.
  */
class AsOfJoinNullSpec extends SparkSpec {

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private lazy val (left, right) = {
    val lSchema = StructType(Seq(
      StructField("k", LongType), StructField("lts", TimestampType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", LongType), StructField("rts", TimestampType),
      StructField("px", DoubleType), StructField("qty", LongType)))
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, ts(10_000_000L), 1L),
        Row(1L, ts(30_000_000L), 2L))),
      lSchema)
    // at t=20s the right row has px = NULL but qty = 7: the t=30s left row
    // must match it and report px NULL (not px 1.5 from the t=5s row)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, ts(5_000_000L), 1.5, 2L),
        Row(1L, ts(20_000_000L), null, 7L))),
      rSchema)
    (l, r)
  }

  test("backward: NULL value stays attached to its matched row") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts", Seq("px", "qty"))
      .orderBy("lid").collect()
    // lid 1 (t=10s) matches t=5s: px 1.5, qty 2
    assert(out(0).getAs[java.lang.Double]("asof_px") == 1.5)
    assert(out(0).getAs[Long]("asof_qty") == 2L)
    // lid 2 (t=30s) matches t=20s: px NULL (NOT back-filled), qty 7
    assert(out(1).isNullAt(out(1).fieldIndex("asof_px")), out(1).toString)
    assert(out(1).getAs[Long]("asof_qty") == 7L)
    assert(out(1).getAs[java.sql.Timestamp]("asof_rts") == ts(20_000_000L))
  }

  test("forward: NULL value stays attached to its matched row") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "lts", "rts", Seq("px", "qty"))
      .orderBy("lid").collect()
    // lid 1 (t=10s) matches forward t=20s: px NULL, qty 7
    assert(out(0).isNullAt(out(0).fieldIndex("asof_px")), out(0).toString)
    assert(out(0).getAs[Long]("asof_qty") == 7L)
    // lid 2 (t=30s) has no following right row: all-null match
    assert(out(1).isNullAt(out(1).fieldIndex("asof_qty")))
    assert(out(1).isNullAt(out(1).fieldIndex("asof_rts")))
  }

  test("allow_exact_matches=false: an exactly-equal right row is excluded") {
    import spark.implicits._
    val l = Seq((1L, ts(20_000_000L), 10L)).toDF("k", "lts", "lid")
    val r = Seq((1L, ts(5_000_000L), 1.0), (1L, ts(20_000_000L), 2.0))
      .toDF("k", "rts", "px")
    val incl = AsOfJoin.backward(l, r, Seq("k"), "lts", "rts", Seq("px")).head
    assert(incl.getAs[Double]("asof_px") == 2.0) // default: equal ts matches
    val strict = AsOfJoin.backward(l, r, Seq("k"), "lts", "rts", Seq("px"),
      allowExactMatches = false).head
    assert(strict.getAs[Double]("asof_px") == 1.0) // strictly earlier only
    val fwdStrict = AsOfJoin.forward(l, r, Seq("k"), "lts", "rts", Seq("px"),
      allowExactMatches = false).head
    assert(fwdStrict.isNullAt(fwdStrict.fieldIndex("asof_px"))) // nothing later
  }

  test("nearest: NULL value stays attached to its matched row") {
    val out = AsOfJoin.nearest(left, right, Seq("k"), "lts", "rts", Seq("px", "qty"))
      .orderBy("lid").collect()
    // lid 1 (t=10s): backward t=5s at distance 5s, forward t=20s at 10s → t=5s
    assert(out(0).getAs[java.lang.Double]("asof_px") == 1.5)
    // lid 2 (t=30s): only backward t=20s → px NULL, qty 7, rts 20s (one row)
    assert(out(1).isNullAt(out(1).fieldIndex("asof_px")), out(1).toString)
    assert(out(1).getAs[Long]("asof_qty") == 7L)
    assert(out(1).getAs[java.sql.Timestamp]("asof_rts") == ts(20_000_000L))
  }
}
