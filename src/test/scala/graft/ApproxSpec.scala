package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Approximate aggregates (sketches) — can't hash-match an oracle by
  * nature, so they're spec-bounded against their exact counterparts
  * instead of declared in the gate. */
class ApproxSpec extends SparkSpec {

  private lazy val li = Tables.t(spark, sf001, "lineitem")

  test("approx_count_distinct within 5% of exact") {
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
  }

  test("percentile_approx brackets the exact percentile") {
    val r = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile(l_extendedprice, 0.5)").as("exact")).head
    val (approx, exact) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"$approx vs $exact")
  }

  test("HLL sketch per group tracks exact distinct counts") {
    val g = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"))
    g.collect().foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"group ${r.getString(0)}: $a vs $e")
    }
  }
}
