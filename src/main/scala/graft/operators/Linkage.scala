package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
  * Sunter, JASA 1969; the scoring core of Splink/dedupe-style entity
  * resolution): candidate pairs from BLOCKING (an equi-join, never
  * all-pairs), each pair scored by the sum of per-field log
  * match-weights — agreement on field f contributes ln(m_f∕u_f),
  * disagreement ln((1−m_f)∕(1−u_f)) — where u_f (the probability two
  * RANDOM records agree on f) is estimated exactly from the data as
  * Σ_v c_v(c_v−1) ∕ n(n−1) and m_f is the configured match-model
  * constant.
  *
  * Determinism: u_f is a ratio of exact BIGINTs; weights are rounded
  * to integer micro-nats once (driver-side, from the tiny per-field
  * value-count aggregates — the LM-table collect pattern), so pair
  * scoring is pure BIGINT addition and the oracle recomputes the same
  * integers. The only transcendental is one ln per field (≈3 values),
  * with the usual final-ulp-then-round exposure.
  *
  * Scale: per-field u aggregates are map-side-combined counts over the
  * dimension table; candidate generation is the block equi-join (the
  * block key is the recall/cost knob); scoring is a projection. */
object Linkage {

  /** Per-field u-probability numerator/denominator: Σ c(c−1) and
    * n(n−1), as exact Longs. */
  private def uProb(df: DataFrame, field: Column): (Long, Long) = {
    val n = df.count()
    val s = df.groupBy(field).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1)).as("s"))
      .head().getLong(0)
    (s, n * (n - 1))
  }

  /** Micro-nat agreement / disagreement weights for one field.
    *
    * Requires 0 < s < d: s = 0 (every value distinct) gives u = 0 so
    * ln(m∕u) = +Inf and `math.round` silently yields Long.MaxValue,
    * wrapping the subsequent BIGINT score sums; s = d (a single-valued
    * field) gives u = 1 so the disagreement weight divides by zero. */
  def fsWeightPair(s: Long, d: Long, m: Double): (Long, Long) = {
    require(d > 0 && s > 0 && s < d,
      s"degenerate u-probability (s=$s, d=$d): the field needs both " +
        "repeated and distinct values to carry a finite log-weight")
    val u = s.toDouble / d.toDouble
    (math.round(1e6 * math.log(m / u)),
      math.round(1e6 * math.log((1 - m) / (1 - u))))
  }

  /** Fellegi–Sunter scored self-linkage: candidate pairs block on
    * `blockCol`, every pair (ka < kb) scored over `fields` (name →
    * comparator column pairs are plain equality here), emitting the
    * agreement pattern bitmap and the integer micro-nat score; pairs
    * with non-positive total evidence drop. */
  def fellegiSunter(df: DataFrame, keyCol: String, blockCol: String,
      fields: Seq[(String, Column)], m: Double): DataFrame = {
    require(fields.nonEmpty && m > 0 && m < 1, "need fields and 0<m<1")
    val weights = fields.map { case (name, c) =>
      val (s, d) = uProb(df, c)
      require(d > 0, s"fellegiSunter: need >= 2 rows to estimate u-probabilities (field '$name')")
      require(s > 0 && s < d,
        s"fellegiSunter: field '$name' has a degenerate u-probability " +
          s"(s=$s, d=$d): an all-distinct (u=0) or single-valued (u=1) " +
          "field cannot be weighted — drop it or coarsen its comparator")
      fsWeightPair(s, d, m)
    }
    val base = df.select(col(keyCol).as("k") +: col(blockCol).as("blk") +:
      fields.zipWithIndex.map { case ((_, c), i) => c.as(s"f$i") }: _*)
    val a = base.toDF(base.columns.map(_ + "_a").toIndexedSeq: _*)
    val b = base.toDF(base.columns.map(_ + "_b").toIndexedSeq: _*)
    val pairs = a.join(b,
      col("blk_a") === col("blk_b") && col("k_a") < col("k_b"))
    val agree = fields.indices.map(i => col(s"f${i}_a") === col(s"f${i}_b"))
    val pattern = fields.indices.map(i =>
      when(agree(i), lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    val score = fields.indices.map(i =>
      when(agree(i), lit(weights(i)._1)).otherwise(lit(weights(i)._2)))
      .reduce(_ + _)
    pairs.select(col("k_a").as("ka"), col("k_b").as("kb"),
        pattern.as("pattern"), score.as("score_micro"))
      .filter(col("score_micro") > 0)
  }
}
