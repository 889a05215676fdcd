package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** The relational surface (SURVEY.md §2.3): categories the reference
  * delegates to pandas, inherited here from Spark SQL. Declared as
  * first-class queries so the DuckDB gate covers them.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (`region`, `nation`, `customer`) are explicit
  *    `broadcast()`s — no shuffle of the fact table;
  *  - fact-fact joins shuffle on the join key only after filters are
  *    pushed to the parquet scan (verified via .explain in the specs);
  *  - top-k uses orderBy+limit → TakeOrderedAndProject (no global sort);
  *  - rollup/distinct aggregates use partial aggregation map-side.
  */
object RelationalQueries {

  /** Shared MERGE-apply CTE chain (rel_merge_upsert + the streaming
    * twin): fixture change batch, last-event-per-key collapse (the
    * row_number mirror of Spark's max_by over the (seq, op, v) struct —
    * the same lexicographic total order), full-outer resolution frame. */
  val mergeCtes: String =
    """tgt AS (SELECT o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |src AS (
      |  SELECT o_orderkey AS k, 1 AS seq,
      |      CASE WHEN o_orderkey % 9 = 0 THEN 'delete' ELSE 'upsert' END AS op,
      |      CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100 AS BIGINT) + 12345 AS v
      |    FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL SELECT o_orderkey, 2, 'delete', 0
      |    FROM orders WHERE o_orderkey % 9 = 3
      |  UNION ALL SELECT o_orderkey + 100000000, 1, 'upsert',
      |      CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100 AS BIGINT) + 7
      |    FROM orders WHERE o_orderkey % 3 = 1
      |  UNION ALL SELECT o_orderkey + 200000000, 1, 'delete', 0
      |    FROM orders WHERE o_orderkey % 9 = 5),
      |latest AS (SELECT k, op, v FROM (
      |    SELECT k, op, v,
      |      row_number() OVER (PARTITION BY k
      |        ORDER BY seq DESC, op DESC, v DESC) AS rn
      |    FROM src) WHERE rn = 1),
      |m AS (SELECT COALESCE(t.k, l.k) AS k, t.v AS tv, l.op AS op, l.v AS sv
      |  FROM tgt t FULL OUTER JOIN latest l ON t.k = l.k)""".stripMargin

  // Holt smoothing decay parameters (level / trend); W derives from
  // their quantized coefficient support (~40 rows at these values)
  private val HOLT_ALPHA = 0.5
  private val HOLT_BETA = 0.3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: the flagship aggregate
    "rel_q1_pricing" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        
    }),

    // Broadcast dimension join: revenue per market segment
    "rel_join_broadcast" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        
    }),

    // 5-way join: revenue per region (TPC-H Q5 shape); dims broadcast
    "rel_join_multi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(li("l_extendedprice") * (lit(1.0) - li("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        
    }),

    // Semi join: orders with at least one very-high-quantity line
    "rel_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      o.join(li.filter(col("l_quantity") >= 45).select(col("l_orderkey")),
          o("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Anti join: customers with no orders
    "rel_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o.select(col("o_custkey")), c("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
    }),

    // Window rank: top-3 orders per priority by total price
    "rel_window_rank" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        
    }),

    // Window lag: per-user delta of consecutive event values
    "rel_window_lag" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .select(col("event_id"), col("delta"))
    }),

    // Salted join: the manual skew weapon — deterministic salt spreads a
    // hot key over k reducers; result identical to the plain equi-join
    "rel_join_salted" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy(col("user_id")).agg(dsum(col("value")).as("user_total"))
      graft.operators.SaltedJoin.join(ev, dim, Seq("user_id"), k = 8)
        .select(col("event_id"), col("user_total"))
        
    }),

    // Audit-DRIVEN salted join: skewAudit names the user_ids above the
    // 5x AQE skew target, only THOSE keys salt k ways (cold keys join
    // plain, the dim side replicates only under hot keys) — the
    // diagnostic feeding the weapon; result == the plain equi-join
    "pipe_skew_salted" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy(col("user_id")).agg(dsum(col("value")).as("user_total"))
      graft.operators.SaltedJoin.joinByAudit(ev, dim, "user_id", k = 8)
        .select(col("event_id"), col("user_total"))
        
    }),

    // Audit-driven salted LEFT join: the routine warehouse fact-dim
    // shape — the dim side drops every 3rd user so unmatched fact rows
    // must null-extend EXACTLY ONCE (each left row carries one salt;
    // only matched right rows were replicated). Oracle = the plain
    // LEFT join: salting changes the shuffle, never the rows
    "pipe_skew_salted_left" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy(col("user_id")).agg(dsum(col("value")).as("user_total"))
        .filter(col("user_id") % 3 =!= 0)
      graft.operators.SaltedJoin.joinByAudit(ev, dim, "user_id", k = 8,
          joinType = "left")
        .select(col("event_id"), col("user_total"))
        
    }),

    // Audit-driven salted join with AUTO-sized k (k = 0): the salt
    // factor comes from the audit's own counts — k ≈ heaviest hot key ∕
    // mean partition load (SaltedJoin.autoK) — instead of a caller
    // guess; one bounded ≤ topK-row driver action, result still the
    // plain equi-join
    "pipe_skew_salted_auto" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy(col("user_id")).agg(dsum(col("value")).as("user_total"))
      graft.operators.SaltedJoin.joinByAudit(ev, dim, "user_id")
        .select(col("event_id"), col("user_total"))
        
    }),

    // Pivot: long→wide per-user event-type sums (groupBy().pivot() with
    // an explicit value list — one shuffle, map-side partials per cell)
    "rel_pivot" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
        
    }),

    // pandas melt (wide → long): Spark's native unpivot — an Expand
    // generator, zero shuffle, 4 output rows per lineitem
    "rel_melt" -> ((s, dir) =>
      graft.operators.Reshape.melt(t(s, dir, "lineitem"),
          ids = Seq("l_orderkey", "l_linenumber"),
          values = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        ),

    // pandas crosstab(priority, status): ONE hash aggregate with
    // conditional count partials — the shuffle carries 5 rows, not pairs
    "rel_crosstab" -> ((s, dir) =>
      graft.operators.Reshape.crosstab(t(s, dir, "orders"),
          "o_orderpriority", "o_orderstatus", Seq("F", "O", "P"))
        ),

    // pandas get_dummies: one 0/1 column per category, pure projection
    // (explicit category list keeps the plan collect-free — see Reshape)
    "feat_one_hot" -> ((s, dir) =>
      graft.operators.Reshape.oneHot(t(s, dir, "orders"), "o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), "pri")
        .select(col("o_orderkey"), col("pri_1_urgent"), col("pri_2_high"),
          col("pri_3_medium"), col("pri_4_not_specified"), col("pri_5_low"))
        ),

    // Numeric RANGE frame (vs the ROWS frames everywhere else and the
    // time-range frames in o5_rolling_time): peers within a VALUE
    // distance — how many of the user's events fall within 5.0 below
    // the current value
    "rel_window_range" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("value"))
        .rangeBetween(-5L, 0L)
      ev.select(col("event_id"), count(lit(1)).over(w).as("n_near"))
        
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist
    "rel_window_dist" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      ev.select(col("event_id"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        
    }),

    // TPC-H Q3-style composite: selective dim filter → fact join →
    // grouped revenue → top-k (broadcast + partial agg + TakeOrdered)
    "rel_q3_shipping" -> ((s, dir) => {
      val orders = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      val li = t(s, dir, "lineitem")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"),
          epochUs(col("o_orderdate").cast("timestamp")).as("odate_us"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Edit distance (levenshtein) between consecutive docs' prefixes —
    // the classic fuzzy-similarity scalar, exact in both engines
    "rel_edit_distance" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 40).as("p"))
      val a = d.select(col("doc_id").as("id"), col("p").as("pa"))
      val b = d.select((col("doc_id") - 1).as("id"), col("p").as("pb"))
      a.join(b, "id")
        .select(col("id"), levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
        
    }),

    // Top-k: TakeOrderedAndProject, no global sort
    "rel_topk" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    }),

    // Set ops: users who clicked but never errored
    "rel_setops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .except(ev.filter(col("event_type") === "error").select(col("user_id")))
        
    }),

    // Set ops: INTERSECT and UNION (DISTINCT) composed
    "rel_union_intersect" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def users(t0: String) = ev.filter(col("event_type") === t0).select("user_id")
      users("click").intersect(users("purchase"))
        .union(users("signup")).distinct()
        
    }),

    // Rollup: hierarchical aggregates (grouping-set NULLs → 'ALL')
    "rel_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        
    }),

    // Exact distinct aggregate
    "rel_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"))
        
    }),

    // Scalar function catalog: string/date/math built-ins
    "rel_scalar_funcs" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_u"),
        substring(col("o_orderpriority"), 1, 3).as("pri_3"),
        concat(lit("P-"), col("o_orderstatus")).as("tag"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        abs(col("o_totalprice") - lit(1000.0)).as("adiff"))
        
    }),

    // Cube: all grouping-set combinations
    "rel_cube" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        
    }),

    // JSON extraction from the events props column
    "rel_json" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        
    }),

    // As-of join (backward): latest prior error per click, per user —
    // an operator Spark lacks; union+window plan, oracle is DuckDB's
    // native ASOF JOIN (semantics must agree exactly)
    // pandas merge_asof(allow_exact_matches=False): STRICTLY-earlier
    // match (e.ts < c.ts) — one tie-break flip in the same one-shuffle
    // union+window plan
    "asof_join_strict" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      graft.operators.AsOfJoin.backward(clicks, errors,
          Seq("user_id"), "ts", "ts", Seq("value"), prefix = "err_",
          allowExactMatches = false)
        .select(col("event_id"), epochUs(col("err_ts")).as("err_ts_us"),
          col("err_value"))
        
    }),

    "asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      graft.operators.AsOfJoin.backward(clicks, errors,
          Seq("user_id"), "ts", "ts", Seq("value"), prefix = "err_")
        .select(col("event_id"), epochUs(col("err_ts")).as("err_ts_us"),
          col("err_value"))
        
    }),

    // forward as-of (merge_asof direction='forward'): earliest error ≥ click
    "asof_join_fwd" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      graft.operators.AsOfJoin.forward(clicks, errors,
          Seq("user_id"), "ts", "ts", Seq("value"), prefix = "err_")
        .select(col("event_id"), epochUs(col("err_ts")).as("err_ts_us"),
          col("err_value"))
        
    }),

    // as-of with tolerance (merge_asof tolerance=2min): distant matches null
    "asof_join_tol" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      graft.operators.AsOfJoin.backward(clicks, errors,
          Seq("user_id"), "ts", "ts", Seq("value"), prefix = "err_",
          toleranceUs = Some(120000000L))
        .select(col("event_id"), epochUs(col("err_ts")).as("err_ts_us"),
          col("err_value"))
        
    }),

    // nearest as-of (merge_asof direction='nearest'; ties → backward)
    "asof_join_near" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      graft.operators.AsOfJoin.nearest(clicks, errors,
          Seq("user_id"), "ts", "ts", Seq("value"), prefix = "err_")
        .select(col("event_id"), epochUs(col("err_ts")).as("err_ts_us"),
          col("err_value"))
        
    }),

    // Bounded range self-join via bucket replication (no BNL join)
    "range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.RangeJoin.pairsWithin(ev, Seq("user_id"), "ts",
          "event_id", rangeUs = 120000000L)
        .select(col("ea"), col("eb"), col("gap_us"))
        
    }),

    // Interval×interval overlap join: per-user event intervals (1-7h,
    // derived from event_id) split by parity; both sides grid-replicate
    // to 2h cells, one equi-join, responsibility-cell dedup — never a
    // range-predicate nested loop
    "rel_interval_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        epochUs(col("ts")).as("s"),
        (epochUs(col("ts")) + (col("event_id") % 7 + 1) * 3600000000L).as("e"))
      graft.operators.RangeJoin.intervalOverlap(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 =!= 0),
          Seq("user_id"), "event_id", "s", "e", "event_id", "s", "e",
          bucketW = 7200000000L)
        
    }),

    // Array/map scalar functions over the documents table
    "rel_array_funcs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ws = split(col("text"), " ")
      d.select(
        col("doc_id"),
        size(ws).cast("long").as("n"),
        array_contains(ws, "spark").as("has_spark"),
        concat_ws("|", slice(ws, 1, 3)).as("first3"),
        element_at(ws, -1).as("last_w"),
        size(array_distinct(ws)).cast("long").as("nd"))
        
    }),

    // Source/sink surface under the oracle: parquet → CSV sink → CSV
    // source must reproduce the rows exactly (header + explicit schema
    // on read — the production pattern; inference is a schema gamble)
    "src_csv_roundtrip" -> ((s, dir) => {
      val n = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val out = cachedTempDir("graft_csv", dir)
      n.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(n.schema).option("header", "true").csv(out)
        
    }),

    // Hive-partitioned parquet sink → pruned read: the layout a 100 TB
    // corpus actually ships with (one directory per source); the read
    // filter prunes to 2 of 20 partition directories before any IO
    // (PartitionFilters in the scan — audited in SourceSinkIndexSpec)
    "src_partitioned_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "source", "n_chars")
      val out = cachedTempDir("graft_part", dir)
      d.write.mode("overwrite").partitionBy("source").parquet(out)
      s.read.parquet(out).filter(col("source").isin("src0", "src1"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        
    }),

    // SCHEMA EVOLUTION roundtrip: two parquet batches with different
    // column sets (a column added mid-stream — the routine ingest drift
    // at 100 TB) read back with mergeSchema: old rows surface the new
    // column as NULL, the production contract for additive evolution
    "src_evolving_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val out = cachedTempDir("graft_evolve", dir)
      d.filter(col("doc_id") % 2 === 0).select("doc_id", "source")
        .write.mode("overwrite").parquet(s"$out/b1")
      d.filter(col("doc_id") % 2 =!= 0).select("doc_id", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$out/b2")
      s.read.option("mergeSchema", "true").parquet(s"$out/b1", s"$out/b2")
        .select(col("doc_id"), col("source"), col("n_chars"))
        
    }),

    // WRITE-side schema evolution: append a batch with a DIFFERENT
    // column set (new column, dropped column, reordered) into the SAME
    // table path — parquet files carry their own schemas, so the append
    // itself never rewrites old files (the 100 TB additive-ingest
    // contract: evolution must be O(new batch), not O(table)). The
    // mergeSchema read surfaces each side's missing column as NULL.
    "src_evolving_append" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val out = cachedTempDir("graft_evapp", dir)
      // overwrite resets the path, so repeated runs stay deterministic
      d.filter(col("doc_id") % 2 === 0).select("doc_id", "source")
        .write.mode("overwrite").parquet(out)
      d.filter(col("doc_id") % 2 =!= 0).select("n_chars", "doc_id")
        .write.mode("append").parquet(out)
      s.read.option("mergeSchema", "true").parquet(out)
        .select(col("doc_id"), col("source"), col("n_chars"))
        
    }),

    // Dynamic partition overwrite: rewrite ONE ingest partition in place
    // (the routine backfill at 100 TB — a bad source re-lands) while
    // every other partition's files are untouched; partitionOverwriteMode
    // =dynamic replaces only the partitions present in the written frame,
    // where static mode would TRUNCATE the whole table first
    "src_partition_backfill" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "source", "n_chars")
      val out = cachedTempDir("graft_backfill", dir)
      d.write.mode("overwrite").partitionBy("source").parquet(out)
      val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        d.filter(col("source") === "src0")
          .withColumn("n_chars", col("n_chars") + 1000000L)
          .write.mode("overwrite").partitionBy("source").parquet(out)
      finally prev match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(out)
        .select(col("doc_id"), col("source"), col("n_chars"))
        
    }),

    // parquet → JSON-lines sink → JSON source, same exactness contract
    "src_json_roundtrip" -> ((s, dir) => {
      val r = t(s, dir, "region").select("r_regionkey", "r_name")
      val out = cachedTempDir("graft_json", dir)
      r.write.mode("overwrite").json(out)
      s.read.schema(r.schema).json(out)
        
    }),

    // parquet → ORC sink → ORC source: the third columnar container
    // Spark ships natively (zlib-compressed, predicate-pushdown-capable
    // like parquet); the oracle compares against the same rows read
    // straight from parquet, so any ORC encode/decode drift surfaces as
    // a value mismatch
    "src_orc_roundtrip" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      val out = cachedTempDir("graft_orc", dir)
      su.write.mode("overwrite").orc(out)
      s.read.schema(su.schema).orc(out)
        
    }),

    // Generator / UDTF surface: posexplode = LATERAL VIEW with ordinal —
    // one row per token with its position (Spark's Generate operator,
    // DuckDB's UNNEST WITH ORDINALITY). Filter keeps output bounded.
    "rel_explode" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("word"))
        
    }),

    // Plain-SQL frontend: the engine's surface is also reachable via
    // spark.sql over registered views
    "rel_sql_api" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_mktsegment,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS rev,
          |  count(*) AS n
          |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          |GROUP BY 1""".stripMargin)
    }),

    // Correlated scalar subquery through the SQL frontend — Catalyst
    // decorrelates it into a join + aggregate (no per-row re-execution).
    // The inner average uses the decimal-sum/count form so both engines
    // compute the identical double.
    "rel_correlated" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_corr_v")
      s.sql(
        """SELECT l_orderkey, l_linenumber FROM lineitem_corr_v l1
          |WHERE l_extendedprice >
          |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / count(*)
          |   FROM lineitem_corr_v l2 WHERE l2.l_orderkey = l1.l_orderkey)""".stripMargin)
    }),

    // NOT EXISTS through the SQL frontend — Catalyst rewrites the
    // correlated existence test into a left-anti hash join
    "rel_not_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_ne_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_ne_v")
      s.sql(
        """SELECT c_custkey, c_mktsegment FROM customer_ne_v c
          |WHERE NOT EXISTS (SELECT 1 FROM orders_ne_v o WHERE o.o_custkey = c.c_custkey)""".stripMargin)
    }),

    // GROUPING SETS beyond rollup/cube: hand-picked aggregation levels
    "rel_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty,
          |  count(*) AS n
          |FROM lineitem_gs_v
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
    }),

    // Predicate + projection pushdown to the parquet scan
    "rel_filter_pushdown" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        
    }),

    // Typed-Aggregator UDAF as a first-class oracled query: exact
    // micro-unit mean per user (two-Long buffer, map-side partials —
    // the custom-aggregate API with built-in-aggregate plan shape)
    "rel_udaf_mean" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val microMean = udaf(new graft.functions.MicroMeanAgg,
        org.apache.spark.sql.Encoders.scalaLong)
      val vm = (col("value").cast(DecimalType(20, 6)) * lit(1000000L)).cast("long")
      ev.select(col("user_id"), vm.as("__vm"))
        .groupBy(col("user_id"))
        .agg(microMean(col("__vm")).as("vmean"), count(lit(1)).as("n"))
        
    }),

    // TPC-H Q5-style 6-table local-supplier revenue: the canonical
    // mixed-strategy join tree — region/nation/supplier/customer are
    // broadcast (the fact tables never move for them), lineitem⋈orders is
    // the one shuffled fact-fact join; aggregation is map-side partial.
    "rel_q5_region" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        
    }),

    // Time-weighted average (TWAP) per user: each observation holds
    // until the next one, so its weight is the gap to the successor
    // (the last observation holds nothing — weight 0). Values
    // integerize to exact milli-units and weights are exact integer
    // microseconds, so the weighted sum is BIGINT and the single final
    // division is the only IEEE step. One per-user window (lead) + one
    // aggregate.
    "rel_twap" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 1000).cast("long").as("v_milli"),
          epochUs(col("ts")).as("t_us"))
        .withColumn("dt_us",
          coalesce(lead(col("t_us"), 1).over(w) - col("t_us"), lit(0L)))
        .groupBy(col("user_id"))
        .agg(sum(col("v_milli") * col("dt_us")).as("wsum"),
          sum(col("dt_us")).as("total_us"))
        .filter(col("total_us") > 0)
        .select(col("user_id"),
          (col("wsum").cast("double") / col("total_us").cast("double")
            / lit(1000.0)).as("twap"),
          col("total_us"))
        
    }),

    // Funnel analysis (view → click → purchase): the product-analytics
    // staple — per user, the earliest view, the earliest click AFTER
    // that view, the earliest purchase after the click. Three stage
    // aggregates chained by user-keyed equi-joins (each stage's frame
    // shrinks to qualifying users); timestamps are exact integer
    // microseconds so stage ordering is engine-identical. Missing
    // stages report -1 (hash-stable across engines).
    "rel_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(epochUs(col("ts"))).as("t1_us"))
      val cl = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(epochUs(col("ts")) > col("t1_us"))
        .groupBy(col("user_id"), col("t1_us"))
        .agg(min(epochUs(col("ts"))).as("t2_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(cl.select(col("user_id"), col("t2_us")), "user_id")
        .filter(epochUs(col("ts")) > col("t2_us"))
        .groupBy(col("user_id")).agg(min(epochUs(col("ts"))).as("t3_us"))
      v.join(cl.select(col("user_id"), col("t2_us")), Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t1_us"),
          coalesce(col("t2_us"), lit(-1L)).as("t2_us"),
          coalesce(col("t3_us"), lit(-1L)).as("t3_us"))
        
    }),

    // Cohort retention: users grouped by their first-event week, the
    // activity matrix (cohort_week, week_offset) → distinct active
    // users — the other product-analytics staple. Two aggregates and
    // one user-keyed join. Week arithmetic is true FLOOR division
    // (subtract the non-negative pmod remainder, then DIV the exact
    // multiple): Spark's DIV truncates toward zero, which would
    // disagree with DuckDB's flooring // on pre-epoch timestamps.
    "rel_cohort" -> ((s, dir) => {
      val weekUs = 7L * 24 * 3600 * 1000000L
      def floorWeek(c: String) =
        expr(s"($c - pmod($c, $weekUs)) DIV $weekUs")
      val ev = t(s, dir, "events")
      val first = ev.groupBy(col("user_id"))
        .agg(min(epochUs(col("ts"))).as("t0_us"))
        .select(col("user_id"), floorWeek("t0_us").as("cohort_week"))
      ev.select(col("user_id"), epochUs(col("ts")).as("e_us"))
        .select(col("user_id"), floorWeek("e_us").as("wk"))
        .join(first, "user_id")
        .select(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        
    }),

    // Join-key skew audit: top-10 heaviest user_ids with share and
    // cnt/mean skew factor in exact micro units — the report that
    // justifies (or rules out) salting before the shuffle
    "rel_skew_audit" -> ((s, dir) =>
      graft.operators.Warehouse.skewAudit(t(s, dir, "events"), "user_id", 10)
        ),

    // Data-quality constraint suite (the Deequ/Great-Expectations shape
    // as ONE aggregate): completeness, key uniqueness, domain
    // cardinality, and range checks computed in a single partial+final
    // agg pass over the fact table, unpivoted to one row per check.
    // Every metric is a BIGINT or a BIGINT/BIGINT ratio — engine-exact
    "rel_data_checks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.agg(
        count(lit(1)).as("n"),
        count(col("l_returnflag")).as("n_rf"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_key"),
        countDistinct(col("l_returnflag")).as("n_rf_vals"),
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"))
      val checks = Seq(
        ("completeness_returnflag", col("n_rf") / col("n"),
          col("n_rf") === col("n")),
        ("unique_orderkey_linenumber", col("n_key") / col("n"),
          col("n_key") === col("n")),
        ("returnflag_domain_3", col("n_rf_vals").cast("double"),
          col("n_rf_vals") === 3),
        ("quantity_min_ge_1", col("q_min").cast("double"), col("q_min") >= 1),
        ("quantity_max_le_50", col("q_max").cast("double"), col("q_max") <= 50))
      // ONE agg evaluation: the checks explode out of a struct array
      // (a per-check select would rescan the fact table five times)
      a.select(explode(array(checks.map { case (name, metric, passed) =>
          struct(lit(name).as("check"), metric.as("metric"),
            passed.cast("int").as("passed"))
        }: _*)).as("c"))
        .select(col("c.*"))
    }),

    // Holt double exponential smoothing (level + one-step forecast) as
    // bounded-window fixed-point algebra: impulse-precomputed micro
    // coefficient tables, one codegen'd integer dot per row per output
    "ts_holt" -> ((s, dir) =>
      graft.operators.TimeSeries.holt(t(s, dir, "events"),
          "user_id", "ts", "event_id", "value", HOLT_ALPHA, HOLT_BETA)
        .select(col("event_id"), col("level"), col("forecast"))
        ),

    // SCD Type-2 dimension build (Kimball ch.5): per-user change log →
    // versioned rows with effective_from/to and is_current. One shuffle
    // (both windows share the user partitioning; the change filter
    // preserves it). Timestamps surface as epoch-µs BIGINTs with -1 for
    // the open current version, the funnel convention.
    "rel_scd2" -> ((s, dir) =>
      graft.operators.Warehouse.scd2(t(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id")
        .select(col("user_id"), col("attr"),
          epochUs(col("eff_from")).as("from_us"),
          coalesce(epochUs(col("eff_to")), lit(-1L)).as("to_us"),
          col("is_current"))
        ),

    // Multi-touch attribution: click/view touches credited to the NEXT
    // purchase of the same user — last-touch and linear models in one
    // pass. Reverse ignoreNulls carry assigns touch→conversion (a per-
    // user window scan, never a range join); micro-unit integer credit.
    "rel_attribution" -> ((s, dir) =>
      graft.operators.Warehouse.attribution(t(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id", "value",
          Seq("click", "view"), "purchase")
        ),

    // MERGE INTO / CDC-batch apply (Delta-MERGE relational core): a
    // change batch (upserts, deletes, a churn key with two events, new
    // keys, a delete of an absent key) collapses to last-event-per-key
    // in ONE map-side-combined aggregate, then a single full-outer join
    // against the snapshot resolves the MERGE arms. At scale the
    // collapsed delta is small → AQE broadcasts it; the snapshot never
    // shuffles.
    "rel_merge_upsert" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val k = col("o_orderkey")
      def cents = (col("o_totalprice").cast(DecimalType(20, 6)) * 100)
        .cast("long")
      val target = ord.select(k.as("k"), cents.as("v"))
      val upd = ord.filter(k % 3 === 0).select(k.as("k"),
        lit(1L).as("seq"),
        when(k % 9 === 0, lit("delete")).otherwise(lit("upsert")).as("op"),
        (cents + 12345L).as("v"))
      val redel = ord.filter(k % 9 === 3).select(k.as("k"),
        lit(2L).as("seq"), lit("delete").as("op"), lit(0L).as("v"))
      val ins = ord.filter(k % 3 === 1).select((k + 100000000L).as("k"),
        lit(1L).as("seq"), lit("upsert").as("op"), (cents + 7L).as("v"))
      val ghost = ord.filter(k % 9 === 5).select((k + 200000000L).as("k"),
        lit(1L).as("seq"), lit("delete").as("op"), lit(0L).as("v"))
      graft.operators.Warehouse.mergeUpsert(target,
          upd.unionAll(redel).unionAll(ins).unionAll(ghost),
          "k", "v", "seq", "op")
        
    }),

    // Pairwise Pearson correlation matrix over three lineitem measures:
    // ONE exact-moment aggregate pass, three IEEE steps per cell
    "rel_corr_matrix" -> ((s, dir) =>
      graft.operators.Binning.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        ),

    // LOCF imputation: planted nulls (event_id % 7) take the user's
    // most recent non-null value in (ts, event_id) order; leading
    // nulls stay null — one per-key window
    "feat_impute_locf" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_id"),
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      graft.operators.Binning.imputeLocf(ev, "user_id", "ts", "event_id",
          "v", "v_filled")
        .select(col("event_id"), col("v"), col("v_filled"))
        
    }),

    // Incremental aggregate maintenance (materialized-view refresh):
    // bootstrap state from 2/3 of orders, fold the remaining third in
    // as a delta — the refreshed view must equal the full recompute,
    // which is what the oracle does directly; cost of the refresh is
    // delta-sized, history never rescans
    "rel_incr_agg" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val state = graft.operators.Warehouse.aggState(
        ord.filter(col("o_orderkey") % 3 =!= 0), "o_orderpriority", "o_totalprice")
      graft.operators.Warehouse.incrementalAgg(state,
          ord.filter(col("o_orderkey") % 3 === 0), "o_orderpriority", "o_totalprice")
        
    }),

    // Event-transition matrix (first-order Markov path report): one
    // per-user lead window + one ≤|types|² aggregate; probabilities
    // divide two BIGINTs once
    "rel_transitions" -> ((s, dir) =>
      graft.operators.Warehouse.transitions(t(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id")
        ),

    // Snapshot diff (Delta-CDF/changelog core): the row-level diff of
    // the merge fixture's before/after states in ONE declarative plan —
    // the CDC batch flows through mergeUpsert into the diff's full-outer
    // join; output is exactly the merge's non-kept actions re-derived
    // from values alone
    "rel_snapshot_diff" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val k = col("o_orderkey")
      def cents = (col("o_totalprice").cast(DecimalType(20, 6)) * 100)
        .cast("long")
      val target = ord.select(k.as("k"), cents.as("v"))
      val upd = ord.filter(k % 3 === 0).select(k.as("k"),
        lit(1L).as("seq"),
        when(k % 9 === 0, lit("delete")).otherwise(lit("upsert")).as("op"),
        (cents + 12345L).as("v"))
      val redel = ord.filter(k % 9 === 3).select(k.as("k"),
        lit(2L).as("seq"), lit("delete").as("op"), lit(0L).as("v"))
      val ins = ord.filter(k % 3 === 1).select((k + 100000000L).as("k"),
        lit(1L).as("seq"), lit("upsert").as("op"), (cents + 7L).as("v"))
      val ghost = ord.filter(k % 9 === 5).select((k + 200000000L).as("k"),
        lit(1L).as("seq"), lit("delete").as("op"), lit(0L).as("v"))
      val after = graft.operators.Warehouse.mergeUpsert(target,
        upd.unionAll(redel).unionAll(ins).unionAll(ghost),
        "k", "v", "seq", "op")
      graft.operators.Warehouse.snapshotDiff(target, after, "k", "v")
        
    }),

    // Fellegi-Sunter probabilistic record linkage: blocked candidate
    // pairs scored by per-field micro-nat log match-weights, with the
    // u-probabilities estimated EXACTLY from the data's value counts
    "rel_record_linkage" -> ((s, dir) =>
      graft.operators.Linkage.fellegiSunter(t(s, dir, "part"),
          "p_partkey", "p_size",
          Seq("brand" -> col("p_brand"), "type" -> col("p_type"),
            "price_band" -> floor(col("p_retailprice") / 10.0).cast("long")),
          m = 0.9)
        ),

    // Entity resolution: dirty-string lookup against the part catalog —
    // a tiny probe list (typo'd names) broadcasts, BLOCKING on (first
    // two chars, ±1 length band) prunes the catalog BEFORE the
    // edit-distance verify (never an all-pairs distance), and each
    // probe keeps its best match (min distance, then key). The classic
    // blocked fuzzy join, corpus cost ∝ block collisions.
    "rel_fuzzy_join" -> ((s, dir) => {
      val probes = Seq("smal ring", "red widgot", "blue blot", "hot gearr")
      val s2 = s
      import s2.implicits._
      val pr = probes.toDF("probe")
        .select(col("probe"), substring(col("probe"), 1, 2).as("blk"),
          length(col("probe")).as("plen"))
      val cat = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          substring(col("p_name"), 1, 2).as("blk"),
          length(col("p_name")).as("clen"))
      val cand = broadcast(pr).join(cat, Seq("blk"))
        .filter(abs(col("plen") - col("clen")) <= 1)
        .withColumn("dist", levenshtein(col("probe"), col("p_name")).cast("long"))
        .filter(col("dist") <= 2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe")).orderBy(col("dist"), col("p_partkey"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("probe"), col("p_partkey"), col("p_name"), col("dist"))
        
    }),

    // TPC-H Q7-style "volume shipping": revenue between a nation PAIR by
    // ship year — the fact table joins its two dimension chains
    // (supplier-nation, orders-customer-nation) with every dimension
    // broadcast; the symmetric pair filter runs in the join output and
    // the single shuffle is the final (n1, n2, year) aggregate.
    "rel_q7_volume" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val n1 = n.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = n.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        
    }),

    // TPC-H Q14-style "promotion effect": the percentage of revenue from
    // PROMO parts in one ship-month — two conditional decimal sums over
    // ONE fact pass (part broadcast), a single final IEEE division.
    "rel_q14_promo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(year(col("l_shipdate")) === 1995 && month(col("l_shipdate")) === 3)
        .agg(
          dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))).as("promo_rev"),
          dsum(rev).as("total_rev"))
        .select(
          (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"),
          col("promo_rev"), col("total_rev"))
    }),

    // TPC-H Q18-style "large volume customer": HAVING over a fact-table
    // aggregate, then a join back to orders/customer for the detail. The
    // qualifying-key set is tiny after the filter, so the detail joins
    // broadcast it — the fact table shuffles ONCE (for its own groupBy),
    // never for the joins.
    "rel_q18_topcust" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val big = li.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 270.0)
      o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c.select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          epochUs(col("o_orderdate").cast("timestamp")).as("odate_us"),
          col("o_totalprice"), col("sum_qty"))
        
    }),

    // pandas concat with mismatched columns (NaN fill): unionByName with
    // allowMissingColumns — absent columns null-fill, zero shuffle
    "rel_union_by_name" -> ((s, dir) => {
      val a = t(s, dir, "nation").select(col("n_nationkey").as("id"), col("n_name").as("name"))
      val b = t(s, dir, "region").select(col("r_regionkey").as("id"),
        col("r_name").as("name"), lit("region").as("kind"))
      a.unionByName(b, allowMissingColumns = true)
        
    }),

    // TPC-H Q10-style returned-item report: who returned the most
    // revenue — selective fact filter (pushed to the scan), one fact
    // shuffle for the customer rollup, broadcast dim, top-20 heap
    "rel_q10_returns" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c.select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q2-style minimum-cost supplier: for each part in a
    // size/type band, the EUROPE supplier(s) offering the lowest unit
    // price (this schema has no partsupp, so the offer = min unit price
    // over the pair's lineitems). The correlated min becomes ONE window
    // over the per-pair aggregate — no per-part re-scan; suppliers and
    // the filtered part list broadcast, the fact table shuffles once on
    // the (part, supplier) grouping.
    "rel_q2_mincost" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select("p_partkey")
      val eu = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val offers = li
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val w = Window.partitionBy(col("p_partkey"))
      offers.withColumn("__min", min(col("cost")).over(w))
        .filter(col("cost") === col("__min"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("cost"))
        
    }),

    // TPC-H Q4-style order-priority check: EXISTS becomes a LEFT SEMI
    // join — the order row survives if ANY of its lineitems shipped
    // after the order date; lineitem never duplicates orders (no
    // join-then-distinct), counts group on the tiny priority domain
    "rel_q4_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996 && quarter(col("o_orderdate")) === 3)
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(li, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        
    }),

    // TPC-H Q6 forecasting-revenue change: the pure-scan aggregate —
    // zero joins, every predicate pushed to the parquet scan, one
    // partial+final agg; the canonical "is pushdown working" probe
    "rel_q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1996
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q8-style national market share: NATION_3's fraction of
    // ECONOMY-part revenue delivered into AMERICA, by order year — the
    // two-level conditional-share aggregate: ONE fact pass, both sums
    // conditional/total accumulate in the same groupBy, one final IEEE
    // division; all five dimensions broadcast
    "rel_q8_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val amCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(o.filter(year(col("o_orderdate")).isin(1995, 1996)),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(amCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0.0)))
            .as("nation_rev"),
          dsum(rev).as("total_rev"))
        .select(col("o_year"),
          (col("nation_rev") / col("total_rev")).as("mkt_share"),
          col("nation_rev"), col("total_rev"))
        
    }),

    // TPC-H Q9-style product-type profit: profit = revenue − cost with
    // a deterministic cost stand-in (0.1·retail·qty — no partsupp
    // table), parts chosen by the p_name LIKE prefix, rolled up by
    // supplier nation × order year. The LIKE filter prunes parts BEFORE
    // the broadcast; one fact pass, one rollup shuffle on the tiny
    // (nation, year) domain.
    "rel_q9_profit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val p = t(s, dir, "part").filter(col("p_name").startsWith("red"))
        .select("p_partkey", "p_retailprice")
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")
      li.join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(amount).as("sum_profit"), count(lit(1)).as("n"))
        
    }),

    // TPC-H Q11-style important stock: per-part value restricted to one
    // nation's suppliers, kept where value exceeds a FRACTION of the
    // global total — HAVING against a scalar subquery. The 1-row total
    // broadcasts back (crossJoin of an aggregate — never a shuffle);
    // at 100 TB both aggregates are partial+final over the same
    // pre-filtered fact slice.
    "rel_q11_stock" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val slice = li.join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("v"))
      val perPart = slice.groupBy(col("l_partkey")).agg(dsum(col("v")).as("value"))
      val total = slice.agg(dsum(col("v")).as("__total"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value") > col("__total") * lit(0.001))
        .select(col("l_partkey"), col("value"))
        
    }),

    // TPC-H Q12-style shipping-priority check: lineitems shipped >90
    // days after their order date in one year, split per returnflag
    // into urgent/non-urgent order counts — the CASE-counting aggregate
    // over one fact-fact join; the interval predicate rides the join
    "rel_q12_shipmode" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(year(col("l_shipdate")) === 1997
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        
    }),

    // TPC-H Q13 customer order-count distribution: LEFT OUTER join so
    // zero-order customers survive with count 0, then a second groupBy
    // over the counts — the double-aggregate histogram shape
    "rel_q13_custdist" -> ((s, dir) => {
      val c = t(s, dir, "customer").select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        
    }),

    // TPC-H Q15 top supplier: quarterly revenue per supplier, keep the
    // max — the view + scalar-max shape; the 1-row max broadcasts back
    // against the tiny per-supplier aggregate, never a global sort
    "rel_q15_topsupp" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997 && quarter(col("l_shipdate")) === 1)
      val rev = li.groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("__max"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("__max"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        
    }),

    // TPC-H Q16-style supplier diversity: distinct suppliers per
    // (brand, type, size) for non-excluded parts, minus complained-
    // about suppliers (acctbal < 0 stands in for the complaint LIKE) —
    // NOT IN becomes a LEFT ANTI join (the excluded set is provably
    // non-null here, so anti-join and NOT IN agree); count distinct
    // runs partial+final, never a collect
    "rel_q16_suppcnt" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        
    }),

    // TPC-H Q17 small-quantity-order revenue: lineitems below 20% of
    // their part's mean quantity — the correlated scalar average
    // becomes a per-part aggregate JOINED back (one extra fact pass,
    // no per-row subquery); the mean is the exact DECIMAL sum over an
    // exact count, so the 0.2× threshold is bit-identical cross-engine
    "rel_q17_smallqty" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#2")
        .select("p_partkey")
      val avgQ = li.groupBy(col("l_partkey").as("aq_key"))
        .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(avgQ, col("l_partkey") === col("aq_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q19 discounted-revenue OR-of-ANDs: three disjoint
    // brand/size/quantity bands OR'd into one predicate — the classic
    // "does the optimizer keep a disjunctive filter on a broadcast
    // join" probe; part prunes to the three brands before broadcast
    "rel_q19_bands" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand", "p_size")
      val band =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1.0, 11.0)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10.0, 20.0)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20.0, 30.0))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(band)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n"))
    }),

    // TPC-H Q20-style excess suppliers: the nested-IN chain — suppliers
    // of 'red' parts who moved >30 units in the year, restricted to one
    // nation. Each IN becomes a semi/equi join on a key set that only
    // ever SHRINKS (parts → qualifying pairs → supplier keys), so the
    // chain is a funnel of broadcasts, never a blow-up.
    "rel_q20_excess" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val redParts = t(s, dir, "part").filter(col("p_name").startsWith("red"))
        .select("p_partkey")
      val movers = li.filter(year(col("l_shipdate")) === 1996)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 30.0)
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(movers), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        
    }),

    // TPC-H Q21-style waiting-orders: in finished multi-supplier orders,
    // the supplier who shipped STRICTLY last (unique max ship date)
    // kept everyone waiting. EXISTS/NOT-EXISTS become per-order
    // aggregates joined back — supplier count, the max, and the count
    // AT the max (ntop=1 ⇔ "no other supplier tied the last ship") —
    // three partial+final aggs over one fact slice, zero correlated
    // subqueries, no window over the raw fact table.
    "rel_q21_waiting" -> ((s, dir) => {
      val f = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("mx"))
      val perOrder = f.groupBy(col("l_orderkey").as("po_key"))
        .agg(count(lit(1)).as("nsupp"), max(col("mx")).as("top"))
      val atTop = f.join(perOrder, col("l_orderkey") === col("po_key")
          && col("mx") === col("top"))
        .groupBy(col("l_orderkey").as("at_key"))
        .agg(count(lit(1)).as("ntop"))
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_9")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      f.join(perOrder, col("l_orderkey") === col("po_key"))
        .join(atTop, col("l_orderkey") === col("at_key"))
        .filter(col("nsupp") >= 2 && col("ntop") === 1 && col("mx") === col("top"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        
    }),

    // TPC-H Q22-style dormant high-balance customers: customers with no
    // RECENT order (NOT EXISTS → LEFT ANTI on the date-filtered orders)
    // whose balance beats the positive-balance average (scalar subquery
    // → 1-row broadcast), grouped into nation-key bands. The anti join
    // broadcasts the distinct recent-customer keys; the fact table is
    // only scanned for that key set.
    "rel_q22_dormant" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("__avg"))
      c.join(broadcast(recent), col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .groupBy((col("c_nationkey") % 5).as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        
    }),

    // pandas describe(): per-column profile — count, exact mean, sample
    // std, min/max — ONE aggregate pass over the fact table. Values move
    // to micro-unit BIGINT; Σxm and Σxm² accumulate exactly (DECIMAL(38,0)
    // ≙ DuckDB HUGEINT), so the variance numerator n·Σxm² − (Σxm)² is an
    // exact integer and the only IEEE ops are the final casts, divisions
    // and one sqrt — in an order the oracle mirrors verbatim.
    "rel_describe" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def profile(c: String): Seq[Column] = {
        val xm = (col(c).cast(DecimalType(20, 6)) * lit(1000000L)).cast("long")
        val n = count(col(c))
        val sx = sum(xm).cast(DecimalType(38, 0))
        // overflow-safe exact square with the Long fast path (a BIGINT
        // square silently wraps for |xm| > ⌊√(2⁶³−1)⌋ while DuckDB raises)
        val sxx = graft.operators.Binning.sumSquaresExact(xm)
        val nn = n.cast("double")
        val mean = sx.cast("double") / (nn * lit(1e6))
        val num = (sxx * n - sx * sx).cast("double")
        val std = sqrt(num / (nn * (nn - lit(1.0)))) / lit(1e6)
        Seq(n.as(s"${c.stripPrefix("l_")}_n"), mean.as(s"${c.stripPrefix("l_")}_mean"),
          std.as(s"${c.stripPrefix("l_")}_std"),
          min(col(c)).as(s"${c.stripPrefix("l_")}_min"),
          max(col(c)).as(s"${c.stripPrefix("l_")}_max"))
      }
      val cols = profile("l_quantity") ++ profile("l_discount")
      li.agg(cols.head, cols.tail: _*)
    }),

    // grouped describe(): the per-group twin of rel_describe — one hash
    // aggregate, same exact integer moment algebra, 20 groups out
    "o4_groupby_describe" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val dec = DecimalType(38, 0)
      val xm = (col("n_chars").cast(DecimalType(20, 6)) * lit(1000000L)).cast("long")
      val n = count(col("n_chars"))
      val sx = sum(xm).cast(dec)
      val sxx = graft.operators.Binning.sumSquaresExact(xm) // overflow-safe, Long fast path
      val nn = n.cast("double")
      d.groupBy(col("source")).agg(
          n.as("n"),
          (sx.cast("double") / (nn * lit(1e6))).as("mean"),
          (sqrt(((sxx * n - sx * sx).cast("double")) / (nn * (nn - lit(1.0)))) / lit(1e6)).as("std"),
          min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
        
    }),

    // FULL OUTER join with nulls flowing both directions: segment
    // customers without qualifying orders (null rev) and qualifying
    // order-customers outside the segment (null segment). Both sides are
    // unique-keyed so the output order key is total.
    "rel_join_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_mktsegment")
      val rev = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
        .groupBy(col("o_custkey")).agg(dsum(col("o_totalprice")).as("rev"))
      c.join(rev, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment"), col("rev"))
        
    }),

    // Exact grouped percentiles (continuous interpolation, the engine's
    // sort-based exact percentile — DuckDB quantile_cont mirrors it; the
    // integer-valued quantity column makes every percentile land inside a
    // run of equal values, so the interpolation arithmetic never fires
    // and the compare is tie-safe)
    "rel_percentiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.9D))").as("__p"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          element_at(col("__p"), 1).as("p25"),
          element_at(col("__p"), 2).as("p50"),
          element_at(col("__p"), 3).as("p75"),
          element_at(col("__p"), 4).as("p90"),
          col("n"))
        
    }),

    // CO-LOCATED BUCKETED JOIN — the 100 TB fact-fact join shape: both
    // sides written bucketed+sorted on the join key, so the sort-merge
    // join reads bucket i against bucket i with NO Exchange and NO Sort
    // on either side (BucketedJoinSpec asserts the plan). At scale this
    // is the difference between shuffling 100 TB and shuffling nothing —
    // bucketing amortizes the one-time layout cost across every
    // subsequent join on that key. The `merge` hint keeps the small test
    // tables from planning as a broadcast join, which would hide the
    // co-location the query exists to demonstrate.
    "rel_join_bucketed" -> ((s, dir) => {
      val (ordersTab, lineitemTab) = bucketedTables(s, dir)
      s.table(lineitemTab).hint("merge")
        .join(s.table(ordersTab), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
        
    })
  )

  /** One-time bucketed+sorted layout of orders/lineitem on the join key,
    * memoized per (session, sf dir) — the bench therefore books the
    * layout cost on the first caller, exactly like a warehouse pays the
    * bucketing once at ingest. Tables are EXTERNAL (data under
    * java.io.tmpdir) so nothing lands in the repo; 8 buckets matches the
    * small test tables (production sizing: buckets ∝ data / target file
    * size). */
  private val bucketedTabs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]

  private def bucketedTables(s: SparkSession, dir: String): (String, String) =
    // synchronized: TrieMap.getOrElseUpdate may evaluate the builder
    // twice under concurrent callers (the bench's parallel warm pass);
    // a double saveAsTable on the same table name is a hard error
    bucketedTabs.synchronized { bucketedTabs.getOrElseUpdate((s, dir), {
      val tag = math.abs(dir.hashCode).toString
      val basePath = java.nio.file.Files.createTempDirectory("graft_bkt")
      Tables.deleteOnExit(basePath)
      val base = basePath.toString
      val oTab = s"graft_bkt_orders_$tag"
      val lTab = s"graft_bkt_lineitem_$tag"
      t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable(oTab)
      t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable(lTab)
      (oTab, lTab)
    }) }

  def oracleSql: Map[String, String] = Map(
    "rel_q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base,
         |  ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS sum_disc,
         |  ${dsumSql("l_quantity")}/count(*) AS avg_qty,
         |  count(*) AS n
         |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "rel_join_broadcast" ->
      s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_join_multi" ->
      s"""SELECT r_name, ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_join_semi" ->
      """SELECT count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)""".stripMargin,
    "rel_join_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rel_window_rank" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "rel_window_lag" ->
      """SELECT event_id, value - lag(value, 1) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events ORDER BY event_id""".stripMargin,
    "rel_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "rel_setops" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,
    "rel_union_intersect" ->
      """SELECT user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  UNION
        |  SELECT user_id FROM events WHERE event_type = 'signup')
        |ORDER BY user_id""".stripMargin,
    "rel_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,
    "rel_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_scalar_funcs" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS pri_u,
        |  substring(o_orderpriority, 1, 3) AS pri_3,
        |  'P-' || o_orderstatus AS tag,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  abs(o_totalprice - 1000.0) AS adiff
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "rel_cube" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,
    "rel_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "asof_join" ->
      """SELECT c.event_id, epoch_us(e.ts) AS err_ts_us, e.value AS err_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND e.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,
    "asof_join_strict" ->
      """SELECT c.event_id, epoch_us(e.ts) AS err_ts_us, e.value AS err_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND e.ts < c.ts
        |ORDER BY c.event_id""".stripMargin,
    "rel_join_salted" ->
      s"""WITH dim AS (SELECT user_id, ${dsumSql("value")} AS user_total
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, d.user_total
         |FROM events e JOIN dim d USING (user_id)
         |ORDER BY e.event_id""".stripMargin,
    // audit-driven salting is result-transparent: the oracle is the
    // PLAIN equi-join — the differential proof that selective salt
    // changes the shuffle, never the rows
    "pipe_skew_salted" ->
      s"""WITH dim AS (SELECT user_id, ${dsumSql("value")} AS user_total
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, d.user_total
         |FROM events e JOIN dim d USING (user_id)
         |ORDER BY e.event_id""".stripMargin,
    // left-join form: unmatched fact rows null-extend exactly once
    "pipe_skew_salted_left" ->
      s"""WITH dim AS (SELECT user_id, ${dsumSql("value")} AS user_total
         |  FROM events GROUP BY 1 HAVING user_id % 3 <> 0)
         |SELECT e.event_id, d.user_total
         |FROM events e LEFT JOIN dim d USING (user_id)
         |ORDER BY e.event_id""".stripMargin,
    // auto-k variant: identical oracle — the derived k is a shuffle
    // parameter, invisible in the rows by construction
    "pipe_skew_salted_auto" ->
      s"""WITH dim AS (SELECT user_id, ${dsumSql("value")} AS user_total
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, d.user_total
         |FROM events e JOIN dim d USING (user_id)
         |ORDER BY e.event_id""".stripMargin,
    "rel_pivot" -> {
      def cell(t: String) =
        s"CAST(sum(CAST(value AS DECIMAL(20,6))) FILTER (WHERE event_type = '$t') AS DOUBLE) AS $t"
      s"""SELECT user_id, ${Seq("click", "error", "purchase", "signup", "view").map(cell).mkString(", ")}
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // melt mirror: UNION ALL of one projection per value column — the
    // dialect-neutral spelling of UNPIVOT
    "rel_melt" -> {
      val vals = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      vals.map(v =>
        s"SELECT l_orderkey, l_linenumber, '$v' AS variable, $v AS value FROM lineitem")
        .mkString("", "\nUNION ALL\n", "\nORDER BY l_orderkey, l_linenumber, variable")
    },
    "rel_crosstab" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "feat_one_hot" -> {
      val cats = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val cols = cats.map(c => // coalesce mirrors oneHot's NULL→all-zeros row
        s"coalesce(CAST(o_orderpriority = '$c' AS BIGINT), 0) AS pri_${graft.operators.Reshape.sanitize(c)}")
      s"""SELECT o_orderkey, ${cols.mkString(", ")}
         |FROM orders ORDER BY o_orderkey""".stripMargin
    },
    "rel_window_range" ->
      """SELECT event_id, count(*) OVER (
        |  PARTITION BY user_id ORDER BY value
        |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_near
        |FROM events ORDER BY event_id""".stripMargin,
    "rel_window_dist" ->
      """SELECT event_id,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,
    "rel_q3_shipping" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderstatus = 'O'
         |GROUP BY 1, 2
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "rel_edit_distance" ->
      """SELECT a.doc_id AS id,
        |  CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT) AS dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY id""".stripMargin,
    "asof_join_fwd" ->
      """SELECT c.event_id, epoch_us(e.ts) AS err_ts_us, e.value AS err_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND e.ts >= c.ts
        |ORDER BY c.event_id""".stripMargin,
    "asof_join_tol" ->
      """SELECT c.event_id,
        |  CASE WHEN e.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(e.ts) <= 120000000
        |    THEN epoch_us(e.ts) END AS err_ts_us,
        |  CASE WHEN e.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(e.ts) <= 120000000
        |    THEN e.value END AS err_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND e.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,
    "asof_join_near" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error'),
        |b AS (SELECT c.event_id, c.ts AS cts, e.ts AS bts, e.value AS bval
        |  FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND e.ts <= c.ts),
        |f AS (SELECT c.event_id, e.ts AS fts, e.value AS fval
        |  FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND e.ts >= c.ts)
        |SELECT b.event_id,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        |      OR epoch_us(cts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(cts))
        |    THEN epoch_us(bts) ELSE epoch_us(fts) END AS err_ts_us,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        |      OR epoch_us(cts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(cts))
        |    THEN bval ELSE fval END AS err_value
        |FROM b JOIN f USING (event_id) ORDER BY b.event_id""".stripMargin,
    "range_join" ->
      """SELECT a.event_id AS ea, b.event_id AS eb,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts
        |  AND b.ts <= a.ts + INTERVAL 2 MINUTE
        |ORDER BY ea, eb""".stripMargin,
    "rel_array_funcs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
        |  list_contains(ws, 'spark') AS has_spark,
        |  array_to_string(list_slice(ws, 1, 3), '|') AS first3,
        |  ws[-1] AS last_w,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS nd
        |FROM w ORDER BY doc_id""".stripMargin,
    "src_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "src_json_roundtrip" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",
    "src_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,
    "src_partitioned_roundtrip" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE source IN ('src0', 'src1') ORDER BY doc_id""".stripMargin,
    // evolving-schema mirror: old-batch rows surface NULL n_chars
    "src_evolving_roundtrip" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id % 2 <> 0 THEN n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // write-side evolution mirror: the appended batch carries n_chars
    // but dropped source, so each side NULLs the other's column
    "src_evolving_append" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN source END AS source,
        |  CASE WHEN doc_id % 2 <> 0 THEN n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // backfill mirror: only the src0 partition's rows were rewritten
    "src_partition_backfill" ->
      """SELECT doc_id, source,
        |  CASE WHEN source = 'src0' THEN n_chars + 1000000 ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // overlap mirror: the declarative range predicate (DuckDB IEJoin)
    // — set-identical to the grid-cell responsibility plan; all-integer
    // bounds, no FP divergence possible
    "rel_interval_overlap" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + (event_id % 7 + 1) * 3600000000 AS e FROM events),
        |a AS (SELECT * FROM ev WHERE event_id % 2 = 0),
        |b AS (SELECT * FROM ev WHERE event_id % 2 <> 0)
        |SELECT a.user_id, a.event_id AS ida, b.event_id AS idb,
        |  GREATEST(a.s, b.s) AS ov_start, LEAST(a.e, b.e) AS ov_end,
        |  LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS ov_len
        |FROM a JOIN b ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
        |ORDER BY 1, 2, 3""".stripMargin,
    "rel_explode" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents WHERE doc_id % 50 = 0)
        |SELECT doc_id, CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos,
        |  unnest(ws) AS word
        |FROM w ORDER BY doc_id, pos""".stripMargin,
    "rel_correlated" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem l1
        |WHERE l_extendedprice >
        |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / count(*)
        |   FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey)
        |ORDER BY 1, 2""".stripMargin,
    "rel_not_exists" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rel_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY 1, 2""".stripMargin,
    "rel_sql_api" ->
      s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS rev, count(*) AS n
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_udaf_mean" ->
      """WITH m AS (SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS vm
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(vm) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE) AS vmean,
        |  count(*) AS n
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_q5_region" ->
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "rel_twap" ->
      """WITH o AS (SELECT user_id, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS v_milli,
        |    epoch_us(ts) AS t_us,
        |    COALESCE(lead(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts),
        |      0) AS dt_us
        |  FROM events),
        |a AS (SELECT user_id,
        |    CAST(sum(v_milli * dt_us) AS BIGINT) AS wsum,
        |    CAST(sum(dt_us) AS BIGINT) AS total_us
        |  FROM o GROUP BY 1)
        |SELECT user_id,
        |  CAST(wsum AS DOUBLE) / CAST(total_us AS DOUBLE) / 1000.0 AS twap,
        |  total_us
        |FROM a WHERE total_us > 0 ORDER BY user_id""".stripMargin,
    "rel_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1_us
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |cl AS (SELECT e.user_id, v.t1_us, min(epoch_us(e.ts)) AS t2_us
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1_us
        |  GROUP BY 1, 2),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3_us
        |  FROM events e JOIN cl ON e.user_id = cl.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > cl.t2_us
        |  GROUP BY 1)
        |SELECT v.user_id, v.t1_us,
        |  COALESCE(cl.t2_us, -1) AS t2_us, COALESCE(p.t3_us, -1) AS t3_us
        |FROM v LEFT JOIN cl ON v.user_id = cl.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "rel_cohort" -> {
      val weekUs = 7L * 24 * 3600 * 1000000L
      s"""WITH first AS (SELECT user_id,
         |    min(epoch_us(ts)) // $weekUs AS cohort_week
         |  FROM events GROUP BY 1),
         |act AS (SELECT DISTINCT f.cohort_week,
         |    epoch_us(e.ts) // $weekUs - f.cohort_week AS week_offset,
         |    e.user_id
         |  FROM events e JOIN first f ON e.user_id = f.user_id)
         |SELECT cohort_week, week_offset, count(*) AS n_active
         |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // skew-audit mirror: identical per-key counts, (cnt DESC, key)
    // rank, and widened (HUGEINT == Spark DECIMAL(38,0)) truncating
    // micro divisions cast back to BIGINT
    "rel_skew_audit" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |  CAST(count(*) AS BIGINT) AS n_keys FROM c),
        |r AS (SELECT user_id, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS rank
        |  FROM c)
        |SELECT rank, user_id, cnt,
        |  CAST((CAST(cnt AS HUGEINT) * 1000000) // total AS BIGINT)
        |    AS share_micro,
        |  CAST((CAST(cnt AS HUGEINT) * n_keys * 1000000) // total AS BIGINT)
        |    AS skew_micro,
        |  n_keys, total
        |FROM r, t WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "rel_data_checks" ->
      """WITH a AS (SELECT count(*) AS n, count(l_returnflag) AS n_rf,
        |    count(DISTINCT (l_orderkey, l_linenumber)) AS n_key,
        |    count(DISTINCT l_returnflag) AS n_rf_vals,
        |    min(l_quantity) AS q_min, max(l_quantity) AS q_max FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'completeness_returnflag' AS "check",
        |    CAST(n_rf AS BIGINT)/CAST(n AS BIGINT) AS metric,
        |    CAST(n_rf = n AS INT) AS passed FROM a
        |  UNION ALL SELECT 'unique_orderkey_linenumber',
        |    CAST(n_key AS BIGINT)/CAST(n AS BIGINT), CAST(n_key = n AS INT) FROM a
        |  UNION ALL SELECT 'returnflag_domain_3',
        |    CAST(n_rf_vals AS DOUBLE), CAST(n_rf_vals = 3 AS INT) FROM a
        |  UNION ALL SELECT 'quantity_min_ge_1',
        |    CAST(q_min AS DOUBLE), CAST(q_min >= 1 AS INT) FROM a
        |  UNION ALL SELECT 'quantity_max_le_50',
        |    CAST(q_max AS DOUBLE), CAST(q_max <= 50 AS INT) FROM a)
        |ORDER BY "check"""".stripMargin,
    // Holt mirror: the SAME driver-side coefficient tables as literal
    // nested lists, the same kept-null list() + list_filter frame and
    // single-division order as the ewm mirrors
    "ts_holt" -> {
      val (lTab, bTab) = graft.operators.TimeSeries.holtTables(HOLT_ALPHA, HOLT_BETA)
      val lSql = graft.operators.TimeSeries.tableSql(lTab)
      val bSql = graft.operators.TimeSeries.tableSql(bTab)
      s"""WITH v AS (SELECT event_id, user_id, ts,
         |    CAST(CAST(value AS DECIMAL(20,6))*1000000 AS BIGINT) AS vm FROM events),
         |l0 AS (SELECT event_id, list(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN ${lTab.length - 1} PRECEDING AND CURRENT ROW) AS vs0 FROM v),
         |lf AS (SELECT event_id, list_filter(vs0, x -> x IS NOT NULL) AS vs FROM l0),
         |d AS (SELECT event_id, len(vs) AS m,
         |    CAST(list_sum(list_transform(generate_series(1, len(vs)),
         |        i -> vs[i] * ($lSql)[len(vs)][i])) AS BIGINT) AS dl,
         |    CAST(list_sum(list_transform(generate_series(1, len(vs)),
         |        i -> vs[i] * ($bSql)[len(vs)][i])) AS BIGINT) AS db
         |  FROM lf)
         |SELECT event_id,
         |  CASE WHEN m >= 2 THEN CAST(dl AS DOUBLE)/1000000000000.0 END AS level,
         |  CASE WHEN m >= 2 THEN CAST(dl + db AS DOUBLE)/1000000000000.0 END AS forecast
         |FROM d ORDER BY event_id""".stripMargin
    },
    "rel_scd2" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS attr, ts AS eff_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
        |  FROM c)
        |SELECT user_id, attr, epoch_us(eff_from) AS from_us,
        |  COALESCE(epoch_us(eff_to), -1) AS to_us,
        |  CAST(eff_to IS NULL AS INT) AS is_current
        |FROM v ORDER BY user_id, from_us, attr""".stripMargin,
    "rel_attribution" ->
      """WITH m AS (SELECT user_id, event_id, event_type, ts,
        |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv_id,
        |    last_value(CASE WHEN event_type = 'purchase'
        |        THEN CAST(CAST(value AS DECIMAL(20,6)) * 1000000 AS BIGINT) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv_vm
        |  FROM events),
        |tch AS (SELECT * FROM m
        |  WHERE event_type IN ('click', 'view') AND conv_id IS NOT NULL),
        |r AS (SELECT user_id, event_id AS touch_id, conv_id, conv_vm,
        |    count(*) OVER (PARTITION BY user_id, conv_id) AS n_touches,
        |    row_number() OVER (PARTITION BY user_id, conv_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM tch)
        |SELECT user_id, touch_id, conv_id, n_touches,
        |  conv_vm // n_touches AS linear_micro,
        |  CASE WHEN rn = 1 THEN conv_vm ELSE 0 END AS last_touch_micro
        |FROM r ORDER BY user_id, touch_id""".stripMargin,
    // FS-linkage mirror: identical u estimation (exact BIGINT ratios),
    // identical weight arithmetic — note (1 - 0.9), NOT 0.1: the Scala
    // side computes 1 − m in doubles and 0.1's bit pattern differs
    "rel_merge_upsert" ->
      s"""WITH $mergeCtes
         |SELECT k, CASE WHEN op = 'upsert' THEN sv ELSE tv END AS v,
         |  CASE WHEN op IS NULL THEN 'kept'
         |       WHEN tv IS NULL THEN 'inserted'
         |       ELSE 'updated' END AS action
         |FROM m WHERE op IS NULL OR op = 'upsert'
         |ORDER BY k""".stripMargin,
    // corr-matrix mirror: identical HUGEINT moment algebra, identical
    // three-IEEE-step tail per cell
    "rel_corr_matrix" -> {
      def cell(a: Int, b: Int, an: String, bn: String) =
        s"""SELECT '$an' AS col_a, '$bn' AS col_b, n,
           |  CAST(p$a$b*n - s$a*s$b AS DOUBLE) /
           |    (sqrt(CAST(q$a*n - s$a*s$a AS DOUBLE)) *
           |     sqrt(CAST(q$b*n - s$b*s$b AS DOUBLE))) AS r FROM s""".stripMargin
      s"""WITH m AS (SELECT
         |    CAST(CAST(l_quantity AS DECIMAL(20,6))*1000000 AS BIGINT) AS c1,
         |    CAST(CAST(l_extendedprice AS DECIMAL(20,6))*1000000 AS BIGINT) AS c2,
         |    CAST(CAST(l_discount AS DECIMAL(20,6))*1000000 AS BIGINT) AS c3
         |  FROM lineitem),
         |s AS (SELECT count(*) AS n,
         |    CAST(sum(c1) AS HUGEINT) AS s1, CAST(sum(c2) AS HUGEINT) AS s2,
         |    CAST(sum(c3) AS HUGEINT) AS s3,
         |    sum(CAST(c1 AS HUGEINT)*c1) AS q1, sum(CAST(c2 AS HUGEINT)*c2) AS q2,
         |    sum(CAST(c3 AS HUGEINT)*c3) AS q3,
         |    sum(CAST(c1 AS HUGEINT)*c2) AS p12, sum(CAST(c1 AS HUGEINT)*c3) AS p13,
         |    sum(CAST(c2 AS HUGEINT)*c3) AS p23
         |  FROM m)
         |${cell(1, 2, "l_quantity", "l_extendedprice")}
         |UNION ALL ${cell(1, 3, "l_quantity", "l_discount")}
         |UNION ALL ${cell(2, 3, "l_extendedprice", "l_discount")}
         |ORDER BY col_a, col_b""".stripMargin
    },
    "feat_impute_locf" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM e ORDER BY event_id""".stripMargin,
    // incremental-agg mirror: the full recompute the refresh must equal
    "rel_incr_agg" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 1000000 AS BIGINT))
        |    AS BIGINT) AS sum_micro,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 1000000 AS BIGINT))
        |    AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_transitions" ->
      """WITH s AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM s
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type)
        |    AS DOUBLE) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // diff mirror: the merge resolution frame re-read as value deltas —
    // added (no before), removed (matched delete), changed (upsert with
    // a different value); equal-value upserts would be omitted like the
    // operator's null-safe-equality filter omits them
    "rel_snapshot_diff" ->
      s"""WITH $mergeCtes
         |SELECT k, tv AS old_v, sv AS new_v, 'changed' AS change
         |  FROM m WHERE op = 'upsert' AND tv IS NOT NULL AND sv <> tv
         |UNION ALL SELECT k, NULL, sv, 'added'
         |  FROM m WHERE op = 'upsert' AND tv IS NULL
         |UNION ALL SELECT k, tv, NULL, 'removed'
         |  FROM m WHERE op = 'delete' AND tv IS NOT NULL
         |ORDER BY k""".stripMargin,
    "rel_record_linkage" -> {
      def uSql(expr: String) =
        s"(SELECT CAST(sum(c*(c-1)) AS BIGINT) AS s FROM (SELECT count(*) AS c FROM part GROUP BY $expr))"
      def wPair(uCte: String, tag: String) =
        s"""CAST(round(1000000*ln(0.9 / (CAST($uCte.s AS DOUBLE) / CAST(nn.n*(nn.n-1) AS DOUBLE)))) AS BIGINT) AS w${tag}_a,
           |CAST(round(1000000*ln((1 - 0.9) / (1 - CAST($uCte.s AS DOUBLE) / CAST(nn.n*(nn.n-1) AS DOUBLE)))) AS BIGINT) AS w${tag}_d""".stripMargin
      val band = (p: String) => s"CAST(floor($p.p_retailprice/10.0) AS BIGINT)"
      s"""WITH nn AS (SELECT count(*) AS n FROM part),
         |ub AS ${uSql("p_brand")},
         |ut AS ${uSql("p_type")},
         |up AS ${uSql("CAST(floor(p_retailprice/10.0) AS BIGINT)")},
         |w AS (SELECT
         |  ${wPair("ub", "b")},
         |  ${wPair("ut", "t")},
         |  ${wPair("up", "p")}
         |  FROM ub, ut, up, nn),
         |p2 AS (SELECT a.p_partkey AS ka, b.p_partkey AS kb,
         |    CAST(CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END
         |      + CASE WHEN a.p_type = b.p_type THEN 2 ELSE 0 END
         |      + CASE WHEN ${band("a")} = ${band("b")} THEN 4 ELSE 0 END AS BIGINT) AS pattern,
         |    (CASE WHEN a.p_brand = b.p_brand THEN w.wb_a ELSE w.wb_d END
         |      + CASE WHEN a.p_type = b.p_type THEN w.wt_a ELSE w.wt_d END
         |      + CASE WHEN ${band("a")} = ${band("b")} THEN w.wp_a ELSE w.wp_d END) AS score_micro
         |  FROM part a JOIN part b
         |    ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey, w)
         |SELECT ka, kb, pattern, score_micro FROM p2
         |WHERE score_micro > 0 ORDER BY ka, kb""".stripMargin
    },
    "rel_fuzzy_join" -> {
      val probeRows = Seq("smal ring", "red widgot", "blue blot", "hot gearr")
        .map(p => s"('$p')").mkString(", ")
      s"""WITH pr(probe) AS (VALUES $probeRows),
         |cand AS (SELECT pr.probe, p.p_partkey, p.p_name,
         |    CAST(levenshtein(pr.probe, p.p_name) AS BIGINT) AS dist
         |  FROM pr JOIN part p
         |    ON substr(pr.probe, 1, 2) = substr(p.p_name, 1, 2)
         |   AND abs(len(pr.probe) - len(p.p_name)) <= 1
         |  WHERE levenshtein(pr.probe, p.p_name) <= 2),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY probe ORDER BY dist, p_partkey) AS rn FROM cand)
         |SELECT probe, p_partkey, p_name, dist FROM r WHERE rn = 1
         |ORDER BY probe""".stripMargin
    },
    "rel_q7_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "rel_q14_promo" ->
      s"""SELECT
         |  100.0 * ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |    / ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS promo_pct,
         |  ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_rev,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_rev
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE year(l_shipdate) = 1995 AND month(l_shipdate) = 3""".stripMargin,
    "rel_q18_topcust" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING ${dsumSql("l_quantity")} > 270.0)
         |SELECT c_custkey, c_name, o_orderkey, epoch_us(o_orderdate) AS odate_us,
         |  o_totalprice, sum_qty
         |FROM orders JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,
    "rel_union_by_name" ->
      """SELECT n_nationkey AS id, n_name AS name, NULL AS kind FROM nation
        |UNION ALL BY NAME
        |SELECT r_regionkey AS id, r_name AS name, 'region' AS kind FROM region
        |ORDER BY id, kind ASC NULLS FIRST""".stripMargin,
    "rel_q10_returns" ->
      s"""SELECT c_custkey, c_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    // Q2 mirror: the window-min rewrite reads back as the classic
    // correlated min over the same per-pair offer aggregate
    "rel_q2_mincost" ->
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offers AS (
        |  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
        |    min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN eu ON l_suppkey = s_suppkey
        |  WHERE p_size = 15 AND p_type = 'STANDARD'
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT s_acctbal, s_name, n_name, p_partkey, cost
        |FROM offers o
        |WHERE cost = (SELECT min(cost) FROM offers i WHERE i.p_partkey = o.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,
    "rel_q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE year(o_orderdate) = 1996 AND quarter(o_orderdate) = 3
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_q6_forecast" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |WHERE year(l_shipdate) = 1996
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24.0""".stripMargin,
    "rel_q8_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${dsumSql("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |    / ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS mkt_share,
         |  ${dsumSql("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS nation_rev,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE year(o_orderdate) IN (1995, 1996)
         |  AND p_type = 'ECONOMY' AND r_name = 'AMERICA'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_q9_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity")} AS sum_profit,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE 'red%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "rel_q11_stock" ->
      s"""WITH slice AS (
         |  SELECT l_partkey, l_extendedprice * (1.0 - l_discount) AS v
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_5')
         |SELECT l_partkey, ${dsumSql("v")} AS value
         |FROM slice
         |GROUP BY 1
         |HAVING ${dsumSql("v")} >
         |  (SELECT ${dsumSql("v")} FROM slice) * 0.001
         |ORDER BY value DESC, l_partkey""".stripMargin,
    "rel_q12_shipmode" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(l_shipdate) = 1997
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
        |                   WHERE o_orderpriority <> '5-LOW') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "rel_q15_topsupp" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_rev
         |  FROM lineitem
         |  WHERE year(l_shipdate) = 1997 AND quarter(l_shipdate) = 1
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "rel_q16_suppcnt" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "rel_q17_smallqty" ->
      s"""WITH pq AS (
         |  SELECT l_partkey AS aq_key,
         |    ${dsumSql("l_quantity")} / count(*) AS avg_qty
         |  FROM lineitem GROUP BY 1)
         |SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly,
         |  count(*) AS n
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN pq ON l_partkey = aq_key
         |WHERE p_brand = 'Brand#2' AND l_quantity < 0.2 * avg_qty""".stripMargin,
    "rel_q19_bands" ->
      s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1.0 AND 11.0)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10.0 AND 20.0)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,
    "rel_q20_excess" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE year(l_shipdate) = 1996
        |      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    GROUP BY l_partkey, l_suppkey
        |    HAVING CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) > 30.0)
        |ORDER BY s_suppkey""".stripMargin,
    "rel_q21_waiting" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS mx
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |po AS (SELECT l_orderkey, count(*) AS nsupp, max(mx) AS top
        |       FROM f GROUP BY 1),
        |at_top AS (SELECT f.l_orderkey, count(*) AS ntop
        |           FROM f JOIN po ON f.l_orderkey = po.l_orderkey AND f.mx = po.top
        |           GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM f
        |JOIN po ON f.l_orderkey = po.l_orderkey
        |JOIN at_top ON f.l_orderkey = at_top.l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE nsupp >= 2 AND ntop = 1 AND mx = top AND n_name = 'NATION_9'
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "rel_q22_dormant" ->
      s"""SELECT c_nationkey % 5 AS cntrycode, count(*) AS numcust,
         |  ${dsumSql("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_custkey NOT IN (
         |    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
         |  AND c_acctbal > (
         |    SELECT ${dsumSql("c_acctbal")} / count(*)
         |    FROM customer WHERE c_acctbal > 0.0)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "o4_groupby_describe" ->
      """SELECT source, count(n_chars) AS n,
        |  CAST(sum(xm) AS DOUBLE)/(CAST(count(n_chars) AS DOUBLE)*1000000.0) AS mean,
        |  sqrt(CAST(sum(CAST(xm AS HUGEINT)*xm)*count(n_chars) - sum(xm)*sum(xm) AS DOUBLE)
        |    / (CAST(count(n_chars) AS DOUBLE) * (CAST(count(n_chars) AS DOUBLE) - 1.0)))
        |    / 1000000.0 AS std,
        |  min(n_chars) AS mn, max(n_chars) AS mx
        |FROM (SELECT source, n_chars,
        |    CAST(CAST(n_chars AS DECIMAL(20,6))*1000000 AS BIGINT) AS xm FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // describe mirror: micro-unit BIGINT sums (HUGEINT-exact in DuckDB ≙
    // DECIMAL(38,0) in Spark), IEEE ops in the identical order
    "rel_describe" -> {
      def prof(c: String, short: String) =
        s"""count($c) AS ${short}_n,
           |  CAST(sum(${short}m) AS DOUBLE) / (CAST(count($c) AS DOUBLE) * 1000000.0) AS ${short}_mean,
           |  sqrt(CAST(sum(CAST(${short}m AS HUGEINT)*${short}m)*count($c) - sum(${short}m)*sum(${short}m) AS DOUBLE)
           |    / (CAST(count($c) AS DOUBLE) * (CAST(count($c) AS DOUBLE) - 1.0))) / 1000000.0 AS ${short}_std,
           |  min($c) AS ${short}_min, max($c) AS ${short}_max""".stripMargin
      s"""WITH m AS (SELECT l_quantity, l_discount,
         |    CAST(CAST(l_quantity AS DECIMAL(20,6))*1000000 AS BIGINT) AS quantitym,
         |    CAST(CAST(l_discount AS DECIMAL(20,6))*1000000 AS BIGINT) AS discountm
         |  FROM lineitem)
         |SELECT ${prof("l_quantity", "quantity")},
         |  ${prof("l_discount", "discount")}
         |FROM m""".stripMargin
    },
    "rel_join_outer" ->
      s"""SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
         |  c.c_mktsegment, o.rev
         |FROM (SELECT c_custkey, c_mktsegment FROM customer
         |      WHERE c_mktsegment = 'BUILDING') c
         |FULL OUTER JOIN (SELECT o_custkey, ${dsumSql("o_totalprice")} AS rev
         |      FROM orders WHERE o_totalprice > 150000.0 GROUP BY 1) o
         |  ON c.c_custkey = o.o_custkey
         |ORDER BY custkey""".stripMargin,
    "rel_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bucketed layout is a physical-plan property; the logical result
    // is the plain join+aggregate
    "rel_join_bucketed" ->
      s"""SELECT o_orderpriority, ${dsumSql("l_extendedprice")} AS rev, count(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
