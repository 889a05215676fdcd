package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimensional-warehouse operators over change-event streams: SCD
  * Type-2 version building (Kimball & Ross, The Data Warehouse Toolkit
  * ch. 5 — the standard "effective_from / effective_to / is_current"
  * versioned dimension) and multi-touch conversion attribution (the
  * last-touch and linear credit models every marketing-analytics stack
  * ships).
  *
  * Both are pure per-key window algebra: the event frame shuffles once
  * on its natural key and every derivation is a lag/lead/carry within
  * the partition — no self-joins, no driver state, linear in events at
  * any scale with per-key state bounded by one partition's slice.
  */
object Warehouse {

  /** SCD Type-2 dimension build from a change log: per `keyCol` ordered
    * by (ts, tie-break id), collapse consecutive duplicate values of
    * `attrCol` (only real changes version), then stamp each version with
    * effective_from = its change timestamp, effective_to = the NEXT
    * change's timestamp (null while current) and an is_current flag.
    *
    * One shuffle: both windows partition on the key, and the change
    * filter preserves ordering, so Catalyst reuses the first exchange
    * for the lead() pass (plan-audited). */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changes
      .withColumn("eff_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("eff_from"), col("eff_to"),
        col("eff_to").isNull.cast("int").as("is_current"))
  }

  /** Multi-touch conversion attribution: every touch event (types in
    * `touchTypes`) is credited to the NEXT conversion event (type
    * `convType`) of the same key, under both standard models at once —
    * last-touch (the final touch before the conversion takes the full
    * conversion value) and linear (the value splits evenly across the
    * conversion's touches; integer micro-unit floor division, the
    * remainder disclosed by n_touches·linear ≤ value).
    *
    * The touch→conversion assignment is a REVERSE carry (`last` with
    * ignoreNulls over the descending-ordered per-key frame), not a
    * range join — each key's events shuffle once and the carry is a
    * linear scan; the per-conversion touch counts and ranks are
    * windows on the (key, conversion) sub-key, which Catalyst serves
    * from the SAME key-hash exchange with a re-sort (plan-audited: one
    * hashpartitioning in the whole query). Unattributed touches (no
    * later conversion) drop, matching the business rule. */
  def attribution(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String, valCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    val isConv = col(typeCol) === convType
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vMicro = (col(valCol).cast(org.apache.spark.sql.types.DecimalType(20, 6))
      * lit(1000000L)).cast("long")
    val carried = events
      .withColumn("__conv_id", last(when(isConv, col(idCol)), ignoreNulls = true).over(wDesc))
      .withColumn("__conv_vm", last(when(isConv, vMicro), ignoreNulls = true).over(wDesc))
      .filter(col(typeCol).isInCollection(touchTypes) && col("__conv_id").isNotNull)
    val wConv = Window.partitionBy(col(keyCol), col("__conv_id"))
    val wConvOrd = wConv.orderBy(col(tsCol).desc, col(idCol).desc)
    carried
      .withColumn("n_touches", count(lit(1)).over(wConv))
      .withColumn("__rn", row_number().over(wConvOrd))
      .select(col(keyCol), col(idCol).as("touch_id"),
        col("__conv_id").as("conv_id"), col("n_touches"),
        expr("__conv_vm div n_touches").as("linear_micro"),
        when(col("__rn") === 1, col("__conv_vm")).otherwise(lit(0L))
          .as("last_touch_micro"))
  }

  /** MERGE INTO / CDC-batch apply — the lakehouse upsert every
    * warehouse (Delta MERGE, Iceberg MERGE, Hudi upsert) ships: apply a
    * change batch (`keyCol`, `seqCol` change order, `opCol` ∈
    * {'upsert','delete'}, `valCol`) onto a target snapshot keyed by
    * `keyCol`, producing the NEW table state plus a per-row `action`
    * audit tag ('kept' | 'updated' | 'inserted'; deleted keys and
    * deletes of absent keys vanish, the MERGE WHEN MATCHED DELETE /
    * no-op rules).
    *
    * Shape: (1) the change batch collapses to its LAST event per key —
    * one hash aggregate (`max_by` over the (seq, op, value) struct, a
    * total order so ties cannot diverge across engines) with map-side
    * combine, so a key churned 10⁶ times in one batch collapses per map
    * task before the shuffle; (2) one full-outer equi-join against the
    * target resolves the three MERGE arms as a projection. At 100 TB
    * the common case is a small daily delta against a huge snapshot —
    * the collapsed change frame is delta-sized, so AQE broadcasts it
    * and the snapshot never shuffles; the physical lakehouse MERGE adds
    * file pruning on top, but this is its relational core. */
  def mergeUpsert(target: DataFrame, source: DataFrame, keyCol: String,
      valCol: String, seqCol: String, opCol: String): DataFrame = {
    val latest = source.groupBy(col(keyCol))
      .agg(max_by(struct(col(opCol).as("op"), col(valCol).as("v")),
        struct(col(seqCol), col(opCol), col(valCol))).as("__c"))
      .select(col(keyCol), col("__c.op").as("__op"), col("__c.v").as("__sv"))
    target.select(col(keyCol), col(valCol).as("__tv"))
      .join(latest, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") === "upsert")
      .select(col(keyCol),
        when(col("__op") === "upsert", col("__sv")).otherwise(col("__tv"))
          .as("v"),
        when(col("__op").isNull, lit("kept"))
          .when(col("__tv").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"))
  }

  /** Event-transition matrix — the product-analytics path report (and
    * the fitted first-order Markov chain behind "next action"
    * prediction): per key ordered by (ts, tie-break id), every adjacent
    * (from_type → to_type) step, counted corpus-wide with the row
    * probability p = n ∕ Σ n over each from_type. One per-key window
    * (lead) on a single key shuffle, then one map-side-combined hash
    * aggregate over ≤ |types|² rows; the probability divides two
    * BIGINTs once at the end (numerator/denominator also emitted so
    * the table re-aggregates exactly). */
  def transitions(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val steps = events
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    steps
      .withColumn("n_from", sum(col("n")).over(wf))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
  }

  /** Incremental aggregate maintenance — the materialized-view refresh
    * every incremental ETL runs: fold a delta batch into a persisted
    * per-key aggregate STATE (count + exact micro-unit sum) without
    * rescanning history. The delta aggregates first (map-side combine,
    * |delta keys| rows), unions with the state table, and one re-agg
    * merges — cost ∝ |delta| + |touched keys|, never ∝ history. Sums
    * are BIGINT micro-units (count/sum are the classic self-mergeable
    * partials — min/max/decimal sums slot into the same shape); the
    * derived mean divides once at the end. Refreshing from state ==
    * recomputing from all rows, which is exactly what the oracle
    * checks. */
  def incrementalAgg(state: DataFrame, delta: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val xm = (col(valCol).cast(org.apache.spark.sql.types.DecimalType(20, 6))
      * lit(1000000L)).cast("long")
    val deltaAgg = delta.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(xm).as("sum_micro"))
    state.select(col(keyCol), col("cnt"), col("sum_micro"))
      .unionAll(deltaAgg)
      .groupBy(col(keyCol))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_micro")).as("sum_micro"))
      .withColumn("mean",
        col("sum_micro").cast("double") / (col("cnt").cast("double") * lit(1e6)))
  }

  /** Builds the state table [[incrementalAgg]] consumes — the same
    * (count, exact micro sum) partials from a full history scan, run
    * once at bootstrap. */
  def aggState(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val xm = (col(valCol).cast(org.apache.spark.sql.types.DecimalType(20, 6))
      * lit(1000000L)).cast("long")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(xm).as("sum_micro"))
  }

  /** Snapshot diff — the table-history audit every lakehouse exposes
    * (Delta CDF "what changed between versions", Iceberg changelog
    * scan): rows whose value differs between two keyed snapshots, as
    * (key, old_v, new_v, change ∈ 'added'|'removed'|'changed');
    * identical rows are omitted. One full-outer equi-join + a
    * null-safe-equality filter — at 100 TB the diff of adjacent
    * versions is delta-sized output from one key-partitioned join
    * (physical lakehouse diffs additionally skip unchanged FILES by
    * manifest; this is the row-level core they verify against). */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
      valCol: String): DataFrame =
    before.select(col(keyCol), col(valCol).as("old_v"))
      .join(after.select(col(keyCol), col(valCol).as("new_v")),
        Seq(keyCol), "full_outer")
      .filter(!(col("old_v") <=> col("new_v")))
      .select(col(keyCol), col("old_v"), col("new_v"),
        when(col("old_v").isNull, lit("added"))
          .when(col("new_v").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"))

  /** Join-key SKEW audit — the diagnostic that justifies (or rules out)
    * salting before a big shuffle: the top-k heaviest keys with their
    * share of the table and their skew factor cnt∕mean in micro units
    * (cnt·n_keys·1e6 div total — all-BIGINT, truncating div, so both
    * engines agree bit-for-bit). A skew_micro of 1 000 000 is a
    * perfectly uniform key; AQE's skew-join splitter targets ~5× — keys
    * above that are the salting candidates this report names.
    *
    * Scale: ONE map-side-combined count per key (the same aggregate the
    * eventual join's shuffle would do), a 1-row total frame broadcast
    * back, and TakeOrdered for the top-k — the corpus shuffles once,
    * the report frame is k rows. */
  def skewAudit(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col(keyCol)).limit(topK)
    // the rank window runs over the k-row top frame, not the key space
    val w = Window.orderBy(col("cnt").desc, col(keyCol))
    top.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(keyCol), col("cnt"),
        // DECIMAL(38,0) intermediates: cnt·n_keys·1e6 wraps BIGINT once
        // cnt·n_keys exceeds ~9.2e12 (a 1M-row hot key over 10M keys —
        // inside the 100 TB envelope); the widened product div is still
        // truncating and lands back in BIGINT, so the DuckDB mirror
        // (HUGEINT product, // , CAST AS BIGINT) agrees bit-for-bit
        expr("cast(cnt as decimal(38,0)) * 1000000 div total")
          .as("share_micro"),
        expr("cast(cnt as decimal(38,0)) * n_keys * 1000000 div total")
          .as("skew_micro"),
        col("n_keys"), col("total"))
  }
}
