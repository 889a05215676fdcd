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

  /** AUDIT-DRIVEN selective salting: [[Warehouse.skewAudit]] names the
    * keys whose skew factor exceeds `thresholdMicro` (default 5e6 µ =
    * the ~5× ratio AQE's skew-join splitter targets — below that the
    * runtime splitter handles it, above it a fact-fact shuffle needs
    * the salt decided BEFORE the exchange), and ONLY those keys' rows
    * are salted: the hot-key set (≤ topK rows) broadcasts onto both
    * sides, hot left rows take a k-way row-hash salt while cold rows
    * keep salt 0, and the right side replicates k ways ONLY under hot
    * keys (explode of a conditional 1-or-k array). Result rows are
    * exactly the plain equi-join's (differential oracle); replication
    * volume drops from [[join]]'s k·|other| to k·|other ∩ hot| +
    * |other \ hot| — the difference between a diagnostic-guided salt
    * and a blanket one at 100 TB. */
  def joinByAudit(skewed: DataFrame, other: DataFrame, keyCol: String,
      k: Int, topK: Int = 10, thresholdMicro: Long = 5000000L): DataFrame = {
    require(k >= 2, s"salting needs k >= 2, got $k")
    val hot = broadcast(
      Warehouse.skewAudit(skewed, keyCol, topK)
        .filter(col("skew_micro") > thresholdMicro)
        .select(col(keyCol), lit(1).as("__hot")))
    val saltedL = skewed.join(hot, Seq(keyCol), "left")
      .withColumn("__salt", when(col("__hot") === 1,
        pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(k)))
        .otherwise(lit(0)))
      .drop("__hot")
    val replicatedR = other.join(hot, Seq(keyCol), "left")
      .withColumn("__salt", explode(when(col("__hot") === 1,
        array((0 until k).map(i => lit(i)): _*))
        .otherwise(array(lit(0)))))
      .drop("__hot")
    saltedL.join(replicatedR, Seq(keyCol, "__salt")).drop("__salt")
  }
}
