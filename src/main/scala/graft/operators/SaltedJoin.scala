package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual counterpart to AQE's
  * runtime skew-join splitting (use this when the skew is KNOWN ahead of
  * time, e.g. a power-law user key in a fact-fact join AQE cannot split
  * because both sides are large).
  *
  * The skewed side gets a deterministic salt in [0, k) (hash of the
  * whole row, so one hot key's rows spread over k reducers); the other
  * side is replicated k times. Joining on (keys, salt) yields exactly
  * the plain equi-join's rows — proven by the differential spec and the
  * DuckDB oracle — while each reducer sees at most ~1/k of any hot key.
  * Shuffle volume: |skewed| + k·|other| — choose k ≈ (hot-key rows) /
  * (target partition rows), and keep the replicated side the smaller
  * one.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` (hot keys) with `other` on `keys`,
    * salted k ways. */
  def join(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      k: Int): DataFrame = {
    val saltedL = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(k)))
    val replicatedR = other.withColumn("__salt",
      explode(array((0 until k).map(i => lit(i)): _*)))
    saltedL.join(replicatedR, keys :+ "__salt").drop("__salt")
  }
}
