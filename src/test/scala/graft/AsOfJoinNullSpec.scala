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

  test("intervalOverlap: planted grid — touching, containment, no dup " +
      "across spanned cells, disjoint excluded") {
    import spark.implicits._
    val L = Seq(("u", 1L, 0L, 10L), ("u", 2L, 50L, 100L), ("v", 3L, 0L, 10L))
      .toDF("k", "id", "s", "e")
    val R = Seq(
      ("u", 11L, 10L, 20L),   // touches id 1 at a point (ov_len 0)
      ("u", 12L, 60L, 70L),   // contained in id 2
      ("u", 13L, 0L, 95L),    // spans MANY 8-wide cells with both 1 and 2
      ("u", 14L, 30L, 40L),   // disjoint from everything on u
      ("v", 15L, 5L, 6L))     // other key
      .toDF("k", "id", "s", "e")
    val got = graft.operators.RangeJoin.intervalOverlap(
        L, R, Seq("k"), "id", "s", "e", "id", "s", "e", bucketW = 8L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
    assert(got.length == got.map(_._1).distinct.length, "pair emitted once")
    assert(got.toMap === Map(
      (1L, 11L) -> ((10L, 10L)), (2L, 12L) -> ((60L, 70L)),
      (1L, 13L) -> ((0L, 10L)), (2L, 13L) -> ((50L, 95L)),
      (3L, 15L) -> ((5L, 6L))))
  }

  test("intervalOverlap == brute range-predicate join on real events") {
    val ev = graft.queries.Tables.t(spark, sf001, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * 3600000000L).as("e"))
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 =!= 0)
    def key(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val grid = graft.operators.RangeJoin.intervalOverlap(a, b, Seq("user_id"),
        "event_id", "s", "e", "event_id", "s", "e", 7200000000L)
      .select("user_id", "ida", "idb").collect().map(key).toSet
    val brute = a.as("a").join(b.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.user_id"), col("a.event_id"), col("b.event_id"))
      .collect().map(key).toSet
    assert(grid === brute)
    assert(brute.nonEmpty, "fixture must exercise overlaps")
  }
}
