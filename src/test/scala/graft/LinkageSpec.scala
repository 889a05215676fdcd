package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** Fellegi–Sunter record linkage: weight math + the round-12
  * degenerate-u guards (ADVICE r11: an all-distinct field gave u = 0 →
  * ln(m∕0) = +Inf → math.round = Long.MaxValue, silently wrapping the
  * BIGINT score sums; a single-valued field divided by zero in the
  * disagreement weight; n ≤ 1 made the denominator n(n−1) = 0). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fsWeightPair: agreement weight positive, disagreement negative") {
    // u = 10/100 = 0.1, m = 0.9: agree ln(9) > 0, disagree ln(1/9) < 0
    val (a, d) = Linkage.fsWeightPair(10L, 100L, 0.9)
    assert(a === math.round(1e6 * math.log(9.0)))
    assert(d === math.round(1e6 * math.log(0.1 / 0.9)))
    assert(a > 0 && d < 0)
  }

  test("fsWeightPair rejects degenerate u-probabilities") {
    // all-distinct field: s = 0 → u = 0 → +Inf agreement weight
    val e0 = intercept[IllegalArgumentException](Linkage.fsWeightPair(0L, 100L, 0.9))
    assert(e0.getMessage.contains("degenerate"))
    // single-valued field: s = d → u = 1 → disagreement divides by zero
    val e1 = intercept[IllegalArgumentException](Linkage.fsWeightPair(100L, 100L, 0.9))
    assert(e1.getMessage.contains("degenerate"))
    // n <= 1: denominator n(n-1) = 0
    val e2 = intercept[IllegalArgumentException](Linkage.fsWeightPair(0L, 0L, 0.9))
    assert(e2.getMessage.contains("degenerate"))
  }

  test("fellegiSunter names the degenerate field in its error") {
    val df = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1))
      .toDF("k", "all_distinct", "blk")
    val e = intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(df, "k", "blk",
        Seq("uniq" -> col("all_distinct")), m = 0.9)
    }
    assert(e.getMessage.contains("'uniq'"))

    val single = Seq((1L, "x", 1), (2L, "x", 1)).toDF("k", "cst", "blk")
    val e2 = intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(single, "k", "blk",
        Seq("const" -> col("cst")), m = 0.9)
    }
    assert(e2.getMessage.contains("'const'"))
  }

  test("fellegiSunter scores blocked pairs with finite integer weights") {
    // field f: values repeat AND differ -> 0 < s < d
    val df = Seq(
      (1L, "x", 1), (2L, "x", 1), (3L, "y", 1), // block 1: pairs (1,2)(1,3)(2,3)
      (4L, "y", 2), (5L, "y", 2) //              block 2: pair (4,5)
    ).toDF("k", "f", "blk")
    val out = Linkage.fellegiSunter(df, "k", "blk",
      Seq("f" -> col("f")), m = 0.9).orderBy("ka", "kb").collect()
    // u = sum c(c-1) / n(n-1) = (2*1 + 3*2) / (5*4) = 8/20 = 0.4
    val agreeW = math.round(1e6 * math.log(0.9 / 0.4))
    // only agreeing pairs have positive evidence with one field
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (4L, 5L)))
    assert(out.forall(_.getLong(3) === agreeW))
    assert(out.forall(_.getLong(2) === 1L)) // pattern bit 0 set
  }
}
