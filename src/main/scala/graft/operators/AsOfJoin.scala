package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, implemented with scale-safe
  * plans (SURVEY.md §2.3 lists range/as-of joins in the reference's
  * absent-category table; these are the canonical time-series pipeline
  * ops, so they're first-class here).
  */
object AsOfJoin {

  /** Backward as-of join: for every left row, the latest right row with
    * `rightTs` ≤ `leftTs` on equal `keys` (DuckDB/kdb ASOF JOIN
    * semantics, left-outer flavor). `toleranceUs` mirrors pandas
    * merge_asof(tolerance=...): matches farther than the tolerance are
    * nulled out.
    *
    * Implementation: tag + union + running `last(...ignoreNulls)` window,
    * NOT a range-condition join — one shuffle on the key, one
    * per-partition sort, linear in |left|+|right|. A naive inequality
    * join is a broadcast-nested-loop at Spark's mercy; this plan is the
    * 100 TB-safe shape.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String = "asof_", toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    withTolerance(
      carry(left, right, keys, leftTs, rightTs, rightVals, prefix,
        forward = false, allowExactMatches),
      leftTs, rightTs, rightVals, prefix, toleranceUs, forward = false)

  /** Forward as-of join (pandas merge_asof direction='forward'): the
    * EARLIEST right row with `rightTs` ≥ `leftTs`. Same union+window
    * plan with the sort reversed. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String = "asof_", toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    withTolerance(
      carry(left, right, keys, leftTs, rightTs, rightVals, prefix,
        forward = true, allowExactMatches),
      leftTs, rightTs, rightVals, prefix, toleranceUs, forward = true)

  /** Nearest as-of join (pandas merge_asof direction='nearest'): the
    * right row minimizing |rightTs − leftTs|; equal distances resolve to
    * the backward match.
    *
    * FUSED plan: one union, then the backward carry (ts asc) and the
    * forward carry (ts desc) as two window specs over the SAME key-hash
    * partitioning — Catalyst plans one Exchange feeding two Sort+Window
    * passes, instead of the two full union+shuffle rounds a
    * backward-then-forward composition would pay. At scale the shuffle is
    * the cost; the second in-partition sort is cheap by comparison. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String = "asof_", toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val vs = rightVals :+ rightTs
    val (l, r) = tagged(left, right, keys, leftTs, rightTs, rightVals)
    // right rows (__tag 0) sort before left rows at equal __ts under BOTH
    // orderings, so an exactly-equal right timestamp is carried into both
    // the backward and the forward match (merge_asof includes equality in
    // both directions; the tie then resolves backward in chooseB)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct carried per direction: the matched right row travels as a
    // unit, so a NULL value field stays attached to ITS row instead of
    // last(ignoreNulls) back-filling it from an older right row
    val carried = l.unionByName(r)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(wF))
    val base = carried.filter(col("__tag") === 1)
      .drop("__tag", "__r")
      .withColumnRenamed("__ts", leftTs)
    val lt = unix_micros(col(leftTs))
    val withTol = toleranceUs.fold(base) { tol =>
      val okB = col("__b").getField(rightTs).isNotNull &&
        lt - unix_micros(col("__b").getField(rightTs)) <= tol
      val okF = col("__f").getField(rightTs).isNotNull &&
        unix_micros(col("__f").getField(rightTs)) - lt <= tol
      base.withColumn("__b", when(okB, col("__b")))
        .withColumn("__f", when(okF, col("__f")))
    }
    val bts = col("__b").getField(rightTs)
    val fts = col("__f").getField(rightTs)
    val chooseB = bts.isNotNull &&
      (fts.isNull || lt - unix_micros(bts) <= unix_micros(fts) - lt)
    withTol
      .withColumn("__c", when(chooseB, col("__b")).otherwise(col("__f")))
      .drop("__b", "__f")
      .select((keys.map(col) :+ col(leftTs)) ++ leftCols.map(col) ++
        vs.map(v => col("__c").getField(v).as(s"$prefix$v")): _*)
  }

  /** Union legs for the tag+union+window plan: left rows tagged 1 carrying
    * a NULL `__r`, right rows tagged 0 carrying their value columns + ts
    * as ONE `__r` struct (null-safety: see [[nearest]]). */
  private def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): (DataFrame, DataFrame) = {
    val leftCols = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val vs = rightVals :+ rightTs
    val rStructT = org.apache.spark.sql.types.StructType(
      vs.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__tag")) ++
        leftCols.map(col) :+
        lit(null).cast(rStructT).as("__r"): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(vs.map(v => col(v).as(v)): _*).as("__r"): _*)
    (l, r)
  }

  private def carry(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String, forward: Boolean,
      allowExactMatches: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val vs = rightVals :+ rightTs
    val (l, r) = tagged(left, right, keys, leftTs, rightTs, rightVals)
    // right rows (__tag 0) sort before left rows at equal ts, so the
    // carried match includes an exactly-equal timestamp in BOTH
    // directions; descending order makes "preceding" mean ts ≥ t and the
    // last preceding non-null the nearest following right row
    // pandas allow_exact_matches: the tag tie-break at EQUAL __ts decides
    // whether an exactly-equal right row is inside the preceding frame —
    // right-before-left (tag asc) includes it; left-before-right (tag
    // desc) excludes it, giving the strict < / > semantics
    val tagOrd = if (allowExactMatches) col("__tag").asc else col("__tag").desc
    val ord = if (forward) Seq(col("__ts").desc, tagOrd)
              else Seq(col("__ts").asc, tagOrd)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched right row carried as ONE struct (null-safety: [[nearest]])
    l.unionByName(r)
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((keys.map(col) :+ col("__ts").as(leftTs)) ++ leftCols.map(col) ++
        vs.map(v => col("__rc").getField(v).as(s"$prefix$v")): _*)
  }

  /** pandas merge_asof(tolerance=...): null the carried match where its
    * distance exceeds the tolerance. Value columns are nulled before the
    * carried timestamp so the distance predicate still sees it. */
  private def withTolerance(df: DataFrame, leftTs: String, rightTs: String,
      rightVals: Seq[String], prefix: String, toleranceUs: Option[Long],
      forward: Boolean): DataFrame = toleranceUs.fold(df) { tol =>
    val dist =
      if (forward) unix_micros(col(s"$prefix$rightTs")) - unix_micros(col(leftTs))
      else unix_micros(col(leftTs)) - unix_micros(col(s"$prefix$rightTs"))
    val ok = col(s"$prefix$rightTs").isNotNull && dist <= tol
    (rightVals :+ rightTs).foldLeft(df) { (d, v) =>
      d.withColumn(s"$prefix$v", when(ok, col(s"$prefix$v")))
    }
  }
}

/** Bounded time-range self/equi join via bucket replication: right rows
  * land in their own bucket and the next, the join is an equi-join on
  * (key, bucket), and the exact range predicate filters after. Shuffle
  * volume is 2×|right| instead of a nested-loop range scan.
  */
object RangeJoin {

  /** Pairs (a, b) with equal `keys`, `0 < ts_b − ts_a ≤ rangeUs`. Output:
    * left/right id columns and the gap in µs. */
  def pairsWithin(df: DataFrame, keys: Seq[String], tsCol: String,
      idCol: String, rangeUs: Long): DataFrame = {
    val us = unix_micros(col(tsCol))
    val a0 = df.select(keys.map(col) :+ col(idCol).as("ea") :+ us.as("ta"): _*)
    val b0 = df.select(keys.map(col) :+ col(idCol).as("eb") :+ us.as("tb"): _*)
    // a replicated to its bucket and the next; b joins on its own bucket:
    // any pair with tb-ta in (0, range] shares one of the two.
    val a = a0.withColumn("__bk", explode(array(
      floor(col("ta") / rangeUs), floor(col("ta") / rangeUs) + 1)))
    val b = b0.withColumn("__bk", floor(col("tb") / rangeUs))
    a.join(b, keys :+ "__bk")
      .filter(col("tb") > col("ta") && col("tb") <= col("ta") + rangeUs)
      .select((keys.map(col) :+ col("ea") :+ col("eb") :+
        (col("tb") - col("ta")).as("gap_us")): _*)
  }

  /** Interval-OVERLAP equi-key join (intervals × intervals — the
    * genomics/ads-session workhorse the point-in-range join above can't
    * express): pairs with equal `keys` whose [s, e] intervals intersect
    * (touching endpoints count), emitting the intersection and its
    * length. Inputs are integer interval bounds (µs, positions — any
    * unit), `bucketW` the grid width.
    *
    * Scale: BOTH sides replicate to every `bucketW` grid cell their
    * interval spans (explode of a bounded `sequence`; replication
    * factor ≈ length∕W + 1, so pick W near the typical interval
    * length), the join is a pure EQUI-join on (keys, cell) — never a
    * range-predicate nested loop — and each overlapping pair is
    * counted exactly ONCE by the responsibility rule: only the cell
    * containing the overlap's LEFT EDGE (trunc-div of max(sa, sb), a
    * point both intervals necessarily cover) keeps the pair. Truncating
    * division (Spark `div` == DuckDB `//`) keeps the grid identical in
    * both engines at any sign. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      idL: String, sL: String, eL: String,
      idR: String, sR: String, eR: String, bucketW: Long): DataFrame = {
    require(bucketW > 0, s"bucketW must be positive: $bucketW")
    def cells(df: DataFrame, id: String, s: String, e: String,
        ida: String): DataFrame =
      df.select(keys.map(col) :+ col(id).as(ida) :+
          col(s).cast("long").as(s"__s_$ida") :+
          col(e).cast("long").as(s"__e_$ida"): _*)
        .withColumn("__bk", explode(sequence(
          expr(s"__s_$ida div ${bucketW}L"), expr(s"__e_$ida div ${bucketW}L"))))
    val a = cells(left, idL, sL, eL, "ida")
    val b = cells(right, idR, sR, eR, "idb")
    a.join(b, keys :+ "__bk")
      .filter(col("__s_ida") <= col("__e_idb") &&
        col("__s_idb") <= col("__e_ida"))
      .filter(col("__bk") ===
        expr(s"greatest(__s_ida, __s_idb) div ${bucketW}L"))
      .select(keys.map(col) :+ col("ida") :+ col("idb") :+
        greatest(col("__s_ida"), col("__s_idb")).as("ov_start") :+
        least(col("__e_ida"), col("__e_idb")).as("ov_end") :+
        (least(col("__e_ida"), col("__e_idb")) -
          greatest(col("__s_ida"), col("__s_idb"))).as("ov_len"): _*)
  }
}
