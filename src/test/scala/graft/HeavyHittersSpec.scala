package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Exact two-pass heavy hitters: the Misra-Gries candidate pass is
  * partition-dependent, but the OUTPUT (exact counts ≥ ⌈n∕share⌉) must
  * equal the naive full group-by answer under any layout and any legal
  * counter budget — that is the MG superset guarantee made testable. */
class HeavyHittersSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text")

  /** The oracle shape: full group-by + ceil-threshold filter. */
  private def naive(share: Int): Set[(String, Long)] = {
    val tok = docs.select(explode(split(col("text"), " ")).as("token"))
    val n = tok.count()
    val t = (n + share - 1) / share
    tok.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") >= t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  private def hh(counters: Int, share: Int, parts: Int): Set[(String, Long)] =
    TextAnalysis.heavyHitters(docs.repartition(parts), "text", counters, share)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("two-pass heavy hitters == naive group-by threshold") {
    assert(hh(1000, 500, 4) == naive(500))
  }

  test("output is partition-layout-invariant") {
    val expected = naive(200)
    Seq(1, 3, 7).foreach { p =>
      assert(hh(400, 200, p) == expected, s"parts=$p")
    }
  }

  test("tightest legal counter budget (counters == share) stays exact") {
    assert(hh(100, 100, 5) == naive(100))
  }

  test("counters < share is rejected (superset guarantee would break)") {
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(docs, "text", 99, 100)
    }
  }
}
