package graft

import org.apache.spark.sql.functions._

import graft.core.Swift
import graft.queries.{RelationalQueries, Tables}

/** Physical-plan audits: assert the plans are the ones we'd want at
  * 100 TB — pushdown reaches the scan, dims broadcast, top-k avoids a
  * global sort, aggregates run partial+final, and the apply fast path
  * adds no shuffle. (The builder prompt's ".explain and iterate" step,
  * frozen into tests so regressions fail loudly.)
  */
class PlanAuditSpec extends SparkSpec {

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def plan(name: String): String =
    fmt(RelationalQueries.queries(name)(spark, sf001))

  test("dup-cluster label joins carry NO static broadcast hint") {
    // |labels| scales with the corpus dup mass (billions of rows on web
    // data) — a pinned broadcast(labels) OOMs the driver at 100 TB. AQE
    // may still broadcast at runtime when the actual size is small; the
    // audit only forbids the STATIC hint (r11 verdict task 3).
    Seq("pipe_text_dedup", "pipe_mm_dedup", "split_leak_safe").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sf001)
      val hints = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hints.isEmpty,
        s"$q pins ${hints.size} static join hint(s): ${hints.map(_.hints)}")
    }
  }

  test("Q6: pure-scan aggregate — predicates pushed, zero joins") {
    val p = plan("rel_q6_forecast")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_discount"), p)
    assert(p.contains("LessThan(l_quantity"), p)
    assert(!p.contains("Join"), p)
  }

  test("Q4: EXISTS runs as LeftSemi — no join-then-distinct") {
    val p = plan("rel_q4_priority")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("Distinct"), p)
  }

  test("Q19: brand filter pushed to the part scan under the OR-of-ANDs") {
    val p = plan("rel_q19_bands")
    assert(p.contains("In(p_brand"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("Q13: left outer survives into the double aggregate") {
    val p = plan("rel_q13_custdist")
    assert(p.contains("LeftOuter"), p)
    // two aggregate levels, each partial+final
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("Q21: EXISTS/NOT-EXISTS as aggregates — no window over the raw fact, no nested loop") {
    val p = plan("rel_q21_waiting")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("Q2: correlated min is ONE window over the per-pair aggregate, dims broadcast") {
    val p = plan("rel_q2_mincost")
    assert("\\bWindow\\b".r.findAllIn(p).size >= 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("filter + projection push down to the parquet scan") {
    val p = plan("rel_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // only the 4 needed columns are read (3 output + filter column)
    assert(!p.contains("l_extendedprice"), p)
  }

  test("dimension joins broadcast (no fact-table shuffle)") {
    val p = plan("rel_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("5-way join keeps all dimensions broadcast") {
    val p = plan("rel_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("rel_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("Q3-style composite: filter pushed, partial agg, top-k no global sort") {
    val p = plan("rel_q3_shipping")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("aggregation runs partial (map-side) + final") {
    val p = plan("rel_q1_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("vectorized apply path adds no shuffle") {
    val li = Tables.t(spark, sf001, "lineitem")
    val out = Swift(li).applyScalar[Double, Double]("l_quantity", "sq")(
      x => x * x, vectorized = Some(col("l_quantity") * col("l_quantity")))
    val p = fmt(out)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("codegen id"), p) // whole-stage codegen spans the projection
  }

  test("as-of join shuffles exactly once (union+window, no BNL)") {
    val p = plan("asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one hash shuffle (the window partitioning); the second
    // Exchange is the final ORDER BY's range partitioning
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("nearest as-of join fuses both direction carries onto ONE shuffle") {
    val p = plan("asof_join_near")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // one key-hash Exchange feeding two Sort+Window passes (asc + desc) —
    // a backward-then-forward composition would shuffle the union twice
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("dedup candidate generation never degenerates to a cross join") {
    val docs = Tables.t(spark, sf001, "documents")
    val emb = Tables.t(spark, sf001, "embeddings")
    Seq(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.6),
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 0.6),
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 4),
      graft.operators.Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.45)
    ).foreach { d =>
      val p = fmt(d)
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    }
  }

  test("bucketed ANN: search join is an equi-join with broadcast queries") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Similarity.bucketedTopK(
      emb, "vec_id", "embedding", _ < 3, 3))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("salted join == plain join on a pathologically hot key") {
    val ev = Tables.t(spark, sf001, "events").withColumn("user_id", lit(7L))
    val dim = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("user_total"))
    val plain = ev.join(dim, "user_id")
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    val salted = graft.operators.SaltedJoin.join(ev, dim, Seq("user_id"), k = 8)
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    assert(salted.sameElements(plain))
  }

  // r7/r8 flagged rel_join_semi / rel_join_salted / rel_cube as possible
  // perf regressions but the bench noise made them unadjudicable; these
  // pins freeze the plan shapes so a future slowdown must be a real plan
  // change, not harness noise (r9 isolated timings: all three ≤ r7).
  test("semi join: quantity filter pushed to scan, LeftSemi, no cartesian") {
    val p = plan("rel_join_semi")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("GreaterThanOrEqual(l_quantity,45"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // single-row result still aggregates partial+final (no driver fold)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("salted join: salt in the join key, replication via Generate, no cartesian") {
    val p = plan("rel_join_salted")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // the k-fold dim replication is a generator (explode), never a join
    assert(p.contains("Generate"), p.take(3000))
    // the salt participates in the join key, so a hot key spreads over
    // k reducers — the operator's whole point
    assert(p.contains("__salt"), p.take(3000))
    // the NONDETERMINISTIC salt (unique-id fold) blocks Catalyst from
    // pushing the inner join's implied IsNotNull(key) through the salt
    // projection — the explicit pre-filter below the salt must restore
    // the scan-level pushdown (r15 frozen-plan-diff catch)
    assert(p.contains("PushedFilters: [IsNotNull(user_id)]"), p.take(3000))
  }

  test("audit-driven salted join == plain join on a pathologically hot key") {
    // half the rows collapse onto key 7 (skew_micro >> 5e6, so the audit
    // flags it); the rest keep distinct keys (cold, salt 0)
    val ev = Tables.t(spark, sf001, "events")
      .withColumn("user_id",
        when(col("event_id") % 2 === 0, lit(7L)).otherwise(col("user_id") + 1000L))
    val dim = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("user_total"))
    val plain = ev.join(dim, "user_id")
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    val salted = graft.operators.SaltedJoin
      .joinByAudit(ev, dim, "user_id", k = 8)
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    assert(salted.sameElements(plain))
  }

  test("audit-driven salted LEFT join == plain left join (unmatched facts null-extend once)") {
    // hot key 7 (audit flags it) + cold keys, and the dim side DROPS
    // every key ≡ 0 mod 3 so unmatched left rows must null-extend
    // exactly once whatever their salt
    val ev = Tables.t(spark, sf001, "events")
      .withColumn("user_id",
        when(col("event_id") % 2 === 0, lit(7L)).otherwise(col("user_id") + 1000L))
    val dim = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("user_total"))
      .filter(col("user_id") % 3 =!= 0)
    val plain = ev.join(dim, Seq("user_id"), "left")
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    val salted = graft.operators.SaltedJoin
      .joinByAudit(ev, dim, "user_id", k = 8, joinType = "left")
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    assert(salted.sameElements(plain))
    // blanket form too, plus semi/anti partition the left side exactly
    val saltedBlanket = graft.operators.SaltedJoin
      .join(ev, dim, Seq("user_id"), k = 8, joinType = "left")
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    assert(saltedBlanket.sameElements(plain))
    val nSemi = graft.operators.SaltedJoin
      .join(ev, dim, Seq("user_id"), k = 8, joinType = "left_semi").count()
    val nAnti = graft.operators.SaltedJoin
      .join(ev, dim, Seq("user_id"), k = 8, joinType = "left_anti").count()
    assert(nSemi + nAnti === ev.count())
    assert(nSemi === ev.join(dim, Seq("user_id"), "left_semi").count())
    // right/full outer would null-extend each unmatched REPLICATED right
    // row k times — rejected up front with the swap-sides hint
    val err = intercept[IllegalArgumentException] {
      graft.operators.SaltedJoin.join(ev, dim, Seq("user_id"), k = 8,
        joinType = "full")
    }
    assert(err.getMessage.contains("swap the sides"))
  }

  test("autoK applies the scaladoc sizing rule with the [2, 64] clamp") {
    import graft.operators.SaltedJoin.autoK
    // heaviest key 80k rows, 1M total over 32 partitions → target
    // 31 250 rows/reducer → k = ceil(80000/31250) = 3
    assert(autoK(80000L, 1000000L, 32) === 3)
    // uniform key (max ≈ target) never salts below the k=2 floor
    assert(autoK(31250L, 1000000L, 32) === 2)
    // a monster key clamps at 64: beyond that, replication cost passes
    // what more reducer spread buys (AQE splits inside a partition)
    // (one key = the whole table over 1000 partitions → raw k = 1000)
    assert(autoK(1000000L, 1000000L, 1000) === 64)
    // degenerate inputs stay sane
    assert(autoK(1L, 1L, 1) === 2)
  }

  test("audit-driven salted join with AUTO k == plain join; derived k replicates only hot keys") {
    // same pathological shape as the explicit-k test: half the rows on
    // key 7 — the audit must flag it and autoK must pick a k ≥ 2
    val ev = Tables.t(spark, sf001, "events")
      .withColumn("user_id",
        when(col("event_id") % 2 === 0, lit(7L)).otherwise(col("user_id") + 1000L))
    val dim = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("user_total"))
    val plain = ev.join(dim, "user_id")
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id").collect()
    val auto = graft.operators.SaltedJoin
      .joinByAudit(ev, dim, "user_id") // k defaults to 0 = auto
      .select(col("event_id"), col("user_total"))
      .orderBy("event_id")
    assert(auto.collect().sameElements(plain))
    val p = fmt(auto)
    assert(!p.contains("CartesianProduct"), p.take(4000))
    // cold keys still replicate ONCE: the conditional 1-or-k array
    // explode survives the auto path
    assert(p.contains("Generate"), p.take(4000))
    assert(p.contains("CASE WHEN"), p.take(4000))
    // the collected hot set inlines as a LOCAL relation broadcast to
    // both sides — the in-plan audit subtree is gone (one corpus count
    // on the driver action instead of one per tagging join)
    assert(p.contains("LocalTableScan"), p.take(4000))
    assert(!p.contains("skew_micro"), p.take(4000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(4000))
  }

  test("groupby sort=False: first_pos rides the user aggregate's exchange") {
    // min(index) must be ONE more partial aggregate on the SAME shuffle
    // as the user's aggs — exactly one hash exchange (plus the output
    // orderBy's range exchange on the tiny grouped result), partial+final
    val p = fmt(graft.queries.CoreQueries.queries("o4_groupby_nosort")(
      spark, sf001))
    assert("hashpartitioning\\(".r.findAllIn(p).size === 1, p.take(3000))
    assert("""\(\d+\) HashAggregate""".r.findAllIn(p).size === 2, p.take(3000))
    assert(p.contains("min(event_id"), p.take(3000))
  }

  test("bloom incremental dedup: map-side bloom probe, no cartesian, reference never self-joins") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Dedup.incrementalDedupBloom(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", 0.6))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    // the broadcast bitset probes as a plain FILTER on the incoming side
    // (UDF over the hash column), BELOW the exact verify semi-join
    assert(p.contains("LeftSemi"), p.take(4000))
    assert(p.toLowerCase.contains("mightcontain") || p.contains("UDF"),
      p.take(4000))
  }

  test("salt spreads fully-duplicate hot-key rows across reducers") {
    // 4096 byte-identical rows on one key: hash(row) alone would land
    // them on ONE salt (the r14 ADVICE finding) — the folded-in unique
    // id must spread them over all k salt values
    val dup = spark.range(4096).select(lit(7L).as("k"), lit("same").as("v"))
    val k = 8
    val salts = dup.withColumn("__salt",
        pmod(hash(col("k"), col("v"), monotonically_increasing_id()), lit(k)))
      .select("__salt").distinct().count()
    assert(salts === k.toLong)
    // and through the public operator: a duplicate-heavy hot key joined
    // salted still equals the plain join (salt is internal only)
    val dim = spark.range(1).select(lit(7L).as("k"), lit(1L).as("t"))
    val out = graft.operators.SaltedJoin.join(dup, dim, Seq("k"), k)
    assert(out.count() === 4096L)
  }

  test("audit-driven salted join: salt only on flagged keys — conditional replication, broadcast hot set") {
    val p = plan("pipe_skew_salted")
    // (the embedded skewAudit's 1-row total-frame broadcast is the
    // codebase's disclosed legitimate BroadcastNestedLoopJoin, so only
    // a cartesian is forbidden here)
    assert(!p.contains("CartesianProduct"), p.take(4000))
    // replication is a generator over a CONDITIONAL array — 1-element
    // for cold keys, k for hot — never a blanket k-fold explode
    assert(p.contains("Generate"), p.take(4000))
    assert(p.contains("CASE WHEN"), p.take(4000))
    // the <=topK hot-key set reaches both sides as a broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(4000))
    assert(p.contains("__salt"), p.take(4000))
  }

  test("trained PQ codebook: broadcast book scoring, combiner aggregates, no window/cartesian") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val fx = graft.operators.Similarity.fixedPoint(emb, "vec_id", "embedding")
    val p = fmt(graft.operators.Similarity.pqCodebookTrained(fx, 4, 16, 16, 2))
    // (the 4-row subspace-id crossJoin is the disclosed legitimate
    // BroadcastNestedLoopJoin — only a true cartesian is forbidden)
    assert(!p.contains("CartesianProduct"), p.take(4000))
    // every Lloyd round scores subvectors against the BROADCAST book
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(4000))
    // each round = arg-min aggregate (min(struct) -> partial+final
    // SortAggregate; struct min-buffers aren't hash-aggregable, but the
    // partial phase keeps the map-side combine so the shuffle carries
    // one row per (id, m) group) + mean aggregate (partial+final
    // HashAggregate): >= 2 phases per round each — lower bounds, not
    // exact counts (r15 ADVICE: a planner change that keeps the
    // combiner discipline must not fail the suite) — and NO rank
    // window, which would shuffle all n·M·K scored rows
    assert("""\(\d+\) HashAggregate""".r.findAllIn(p).size >= 4, p.take(4000))
    assert("""\(\d+\) SortAggregate""".r.findAllIn(p).size >= 4, p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
  }

  test("two-level IVF: level 2 + probe tail is equi-join-only — no nested-loop broadcast beyond level 1") {
    // the level-1 ranking sits behind its lazy localCheckpoint, so this
    // plan IS the level-2 + search tail in isolation — exactly the part
    // the architecture claims never nested-loop-broadcasts: sub-centroid
    // assignment and probe ranking are EQUI-joins on cid1 (shuffle-
    // partitionable at 100 TB; the only crossJoin-shaped broadcast in
    // the whole operator is the √n-bounded coarse table inside level 1,
    // pinned by the ivfAssign-family tests)
    val p = fmt(graft.SparkEntry.queries("sim_ivf2_topk")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(6000))
    // the candidate join keys on BOTH list levels (cid1, cid2)
    assert("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(p).size >= 3, p.take(6000))
    assert(p.contains("cid2"), p.take(6000))
  }

  test("trained two-level IVF: level 2 + probe tail equi-join-only, like the seeded form") {
    // training happens inside the level-1 ranking's checkpointed lineage;
    // the visible plan is the level-2 build + search tail and must keep
    // the seeded form's discipline: equi-joins on (cid1)/(cid1, cid2),
    // never a nested-loop broadcast of anything corpus-shaped
    val p = fmt(graft.SparkEntry.queries("sim_ivf2_trained")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(6000))
    assert(p.contains("cid2"), p.take(6000))
  }

  test("IVF2-PQ: no cartesian; candidates, codes and ADC tables all join by key") {
    // the only crossJoin-shaped passes are the disclosed broadcast-book
    // scans (M·K-row codebook vs corpus — the pqCodebookTrained
    // disclosure); the search side must be keyed joins: (cid1, cid2)
    // candidates, id-keyed codes, (qid, m, code) ADC lookups
    val p = fmt(graft.SparkEntry.queries("sim_ivf2_pq")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(6000))
    assert(p.contains("cid2"), p.take(6000))
  }

  test("all-trained IVF2-PQ: keyed joins only, like the seeded composition") {
    // both Lloyd chains live behind checkpointed lineage; the visible
    // plan is the same list/probe/ADC shape as sim_ivf2_pq and must keep
    // its discipline: no cartesian, broadcast ADC/candidate tables,
    // (cid1, cid2)-keyed candidates
    val p = fmt(graft.SparkEntry.queries("sim_ivf2_pq_trained")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(6000))
    assert(p.contains("cid2"), p.take(6000))
  }

  test("margin IVF: candidate generation is a centroid equi-join — no cross-side product") {
    // the brute form's crossJoin is exactly what this variant removes:
    // probe memberships sit behind the checkpointed ranking, candidates
    // come from one cid equi-join, and the margin tail joins by key
    val p = fmt(graft.SparkEntry.queries("sim_margin_ivf")(spark, sf001))
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(6000))
  }

  test("k-means prototypes: rank filter below the per-cluster window (WindowGroupLimit)") {
    val p = fmt(graft.SparkEntry.queries("sim_kmeans_protos")(spark, sf001))
    // top-3-per-cluster must prune under the window sort, never rank
    // the full cluster membership and filter afterwards
    assert(p.contains("WindowGroupLimit"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("residual IVF-PQ: broadcast query tables, no cartesian, probe-bounded candidates") {
    val p = fmt(graft.SparkEntry.queries("sim_ivfpq_residual")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    // the probe set, residual codebook, and per-centroid ADC tables all
    // reach the candidate join as broadcasts — the corpus side never
    // replicates
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(4000))
  }

  test("cube: ONE Expand into partial+final aggregate, one hash shuffle") {
    val p = plan("rel_cube")
    // formatted mode names each node twice (tree + detail header) — count
    // the detail headers, which appear exactly once per physical node
    assert("""\(\d+\) Expand""".r.findAllIn(p).size === 1, p.take(3000))
    assert("""\(\d+\) HashAggregate""".r.findAllIn(p).size === 2, p.take(3000))
    // exactly one hash-partitioned exchange (the aggregate's); the output
    // orderBy legitimately adds a range exchange on the 12-row result
    assert("hashpartitioning\\(".r.findAllIn(p).size === 1, p.take(3000))
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // 100k rows, 95% on ONE key, wide payload so the hot partition
      // crosses the (lowered) skew threshold
      val left = spark.range(100000)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id") % 50).as("k"),
          concat(lit("x" * 64), col("id")).as("payload"))
      val right = spark.range(50).select(col("id").as("k"), col("id").as("rv"))
      val joined = left.join(right, "k")
      // action on THIS plan (count() builds a separate QueryExecution and
      // would leave joined.queryExecution unexecuted / non-final)
      assert(joined.collect().length == 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("range join is an equi-join on buckets, not a nested loop") {
    val p = plan("range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("vocab: explode pipelined into the scan, partial agg, top-k heap") {
    val p = fmt(graft.queries.ExtQueries.queries("text_vocab")(spark, sf001))
    assert(p.contains("Generate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global sort
  }

  test("oov rate: vocab broadcasts to the token stream, no cartesian, partial agg") {
    val p = fmt(graft.queries.ExtQueries.queries("text_oov_rate")(spark, sf001))
    assert(p.contains("BroadcastHashJoin"), p) // k-row vocab never shuffles the corpus
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // vocab top-k is a heap
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // both aggs partial+final
  }

  test("rrf fusion: one scored pass feeds both rank windows; only the disclosed broadcast cross") {
    val p = fmt(graft.queries.ExtQueries.queries("sim_rrf_fusion")(spark, sf001))
    // the query side is broadcast (disclosed small-query-set crossJoin,
    // same contract as sim_topk_brute) — never a shuffled cartesian
    assert(!p.contains("CartesianProduct"), p)
    // two rank windows (cosine, L2) + the final fused-topk window
    assert("Window".r.findAllIn(p).size >= 3, p)
  }

  private def exchangeNodes(p: String): Int =
    """\(\d+\) Exchange""".r.findAllIn(p).size

  test("winnowing: selection pipelines in the scan, zero shuffle") {
    val p = fmt(graft.queries.ExtQueries.queries("text_winnowing")(spark, sf001))
    // codegen'd winnow + explode run inside the scan stage; r17 removed
    // the presentation ORDER BY, so the plan is now exchange-free
    assert(p.contains("Generate"), p)
    assert(exchangeNodes(p) == 0, p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("z-order audit: 1-row bounds broadcast, partial+final agg, codegen'd z") {
    val p = fmt(graft.queries.ExtQueries.queries("layout_zorder")(spark, sf001))
    // the bounds frame joins in as a broadcast (1 row) — the fact scan
    // never shuffles before its aggregate
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("heavy hitters: bounded-summary broadcast semi-join, partial agg") {
    val p = fmt(graft.queries.ExtQueries.queries("text_heavy_hitters")(spark, sf001))
    // pass 2: candidate semi-join broadcasts, exact counts agg partial+final
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("JL projection: pure projection pass, zero shuffle") {
    val p = fmt(graft.queries.ExtQueries.queries("emb_rand_proj")(spark, sf001))
    // r17: presentation sort removed — a projection pass plans no exchange
    assert(exchangeNodes(p) == 0, p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("LPA communities: two cliques + one bridge separate; bridge-free == components") {
    import spark.implicits._
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L)).toDF("da", "db")
    val out = graft.operators.Dedup.labelPropagation(pairs, "da", "db", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each clique converges to its own min label; the bridge does not
    // merge them (a single cross-edge never outvotes a clique)
    assert(out(1) == out(2) && out(2) == out(3))
    assert(out(10) == out(11) && out(11) == out(12))
    assert(out(1) != out(10), out.toString)
  }

  test("triangles: degree-ordered orientation == id orientation (incl. hot star)") {
    import spark.implicits._
    def run(pairs: org.apache.spark.sql.DataFrame, byDeg: Boolean) =
      graft.operators.Dedup.triangles(pairs, "da", "db", orientByDegree = byDeg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    // hot star (hub 100 with 20 spokes) + a clique hanging off a spoke
    val star = (1L to 20L).map(s => (math.min(s, 100L), math.max(s, 100L)))
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 100L))
    val pairs = (star ++ clique).distinct.toDF("da", "db")
    assert(run(pairs, byDeg = true) == run(pairs, byDeg = false))
    // and on the real jaccard graph
    val jp = graft.operators.Dedup.jaccardPairs(
      Tables.t(spark, sf001, "documents"), "doc_id", "text", 0.6)
    assert(run(jp, byDeg = true) == run(jp, byDeg = false))
  }

  test("triangles: forward-edge equi-joins, never a cross join") {
    val p = fmt(graft.queries.ExtQueries.queries("graph_triangles")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("SCD2: both windows share ONE user-key shuffle (exchange reused)") {
    val p = plan("rel_scd2")
    // lag pass + lead pass partition identically and the change filter
    // preserves ordering -> exactly one hash exchange; the second
    // Exchange is the output ORDER BY
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p) // versioning is pure window algebra
  }

  test("attribution: reverse carry + per-conversion stats, no range join") {
    val p = plan("rel_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // ONE user-key shuffle serves all four windows: the (user, conv)
    // stats windows only re-SORT — user-hash distribution already
    // satisfies their partitioning requirement
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("winnow pairs: fingerprint equi-join, partial agg, no cross join") {
    val p = fmt(graft.queries.ExtQueries.queries("dedup_winnow_pairs")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("melt: Expand generator, zero shuffle") {
    val p = plan("rel_melt")
    assert(p.contains("Expand"), p)
    // r17: presentation ORDER BY removed — melt plans no exchange at all
    assert(exchangeNodes(p) == 0, p)
  }

  test("Q18: fact table shuffles for its aggregate, detail joins broadcast") {
    val p = plan("rel_q18_topcust")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    // no shuffled (sort-merge / shuffled-hash) join anywhere
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("partitioned roundtrip read prunes partition directories") {
    val p = plan("src_partitioned_roundtrip")
    assert(p.contains("PartitionFilters: [") && p.contains("src0"), p)
  }

  test("e2e curation capstone: gate is a pure filter, hits anti-join broadcasts") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_e2e_curation")(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // the contaminated-id removal is a broadcast LeftAnti (tiny hit list)
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the quality gate never becomes a join — it's a Filter over the scan
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("curation pipeline: tagging is one projection, dedup window the only wide op") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_curation")(spark, sf001))
    // one hashpartitioning exchange (dedup window); the presentation
    // sort's range exchange is gone (r17)
    assert(exchangeNodes(p) == 1, p)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p) // column-composed: no self-joins
  }

  test("mixture resample: replica generator adds NO shuffle") {
    val p = fmt(graft.queries.ExtQueries.queries("mix_resample")(spark, sf001))
    assert(p.contains("Generate"), p)           // explode(sequence)
    assert(exchangeNodes(p) == 0, p)            // r17: no presentation sort
    assert(!p.contains("hashpartitioning"), p)  // rows replicate in place
  }

  test("paragraph dedup: two hash shuffles (line agg, doc regroup), partial agg, no join") {
    val p = fmt(graft.queries.ExtQueries.queries("dedup_paragraphs")(spark, sf001))
    // line-key agg + doc_id regroup; the presentation sort's range
    // exchange is gone (r17)
    assert("hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(exchangeNodes(p) == 2, p)
    // the skew-killer: min(struct) combines map-side BEFORE the shuffle
    assert(p.contains("partial_min") || p.contains("Functions [partial"), p)
    assert(!p.contains("Join"), p)              // the agg output IS the kept set
  }

  test("C4 line cleaning: pure per-doc projection, zero wide ops") {
    val p = fmt(graft.queries.ExtQueries.queries("text_clean_lines")(spark, sf001))
    assert(exchangeNodes(p) == 0, p)            // r17: no presentation sort
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("importance scoring: the fitted table applies as a projection fold, zero shuffle") {
    val docs = Tables.t(spark, sf001, "documents")
    val scored = graft.operators.Mixture.importanceScore(
      docs, "doc_id", "text", Seq.fill(64)(1L), 64)
    val p = fmt(scored)
    assert(exchangeNodes(p) == 0, p)            // table is a plan literal
    assert(!p.contains("Join"), p)
  }

  test("mixture->pack capstone: generator + ONE pack-window shuffle") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_mix_pack")(spark, sf001))
    assert(p.contains("Generate"), p)
    // the bucket-partitioned packing window is the only hash shuffle
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("deterministic shuffle: one range sort, no hash shuffle, no single-task collapse") {
    val p = fmt(graft.queries.ExtQueries.queries("sample_shuffle")(spark, sf001))
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("dup-span dedup: gram-hash equi-joins only, partial gram agg, no cartesian") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Dedup.dupSpans(docs, "doc_id", "text", 8))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"), p)
    // the global gram count aggregates with map-side partials
    assert(p.contains("partial_count"), p)
  }

  test("semDedup: centroids broadcast, prune join is an equi-join on the cluster id") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Similarity.semDedup(
      emb, "vec_id", "embedding", 0.45, 8))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the corpus×C assignment pass (centroids as the broadcast build
    // side, same shape as the IVF queries) sits behind a lazy
    // localCheckpoint boundary so it runs once however many consumers
    // read it — downstream of the boundary the visible plan is pure
    // equi-join (SMJ/hash) + anti-join, with no nested-loop at all
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("d4Prune: inherits semDedup's shape — equi-joins only, prototype tail adds no nested loop") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Similarity.d4Prune(
      emb, "vec_id", "embedding", 0.45, 0.25, 8))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
    // the prototype cut is a window pair partitioned by cluster
    assert(p.contains("Window"), p.take(2000))
  }

  test("interpolated perplexity: both literal tables fold in one projection — zero shuffle") {
    val docs = Tables.t(spark, sf001, "documents")
    val t0 = Seq.fill(64)(-1000000L)
    val p = fmt(graft.operators.Mixture.perplexityScoreInterp(
      docs, "doc_id", "text", t0, t0, 64, 3, 4))
    assert(exchangeNodes(p) == 0, p)
    assert(!p.contains("Join"), p)
    // the folds run in the codegen'd ClassScoreArray, not interpreted HOFs
    assert(!p.contains("lambdafunction"), p)
  }

  test("ccnetBuckets: scoring shuffle-free; the only window partitions by language") {
    val docs = Tables.t(spark, sf001, "documents")
    val t0 = Seq.fill(64)(-1000000L)
    val p = fmt(graft.operators.Mixture.ccnetBuckets(
      docs, "doc_id", "text", "lang", t0, 64))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("SinglePartition"), p.take(2000))
    assert(p.contains("hashpartitioning(lang"), p.take(2000))
  }

  test("stratifiedK: per-stratum window rank, never a global sort") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Sampling.stratifiedK(docs, "doc_id", "source", 10))
    assert(!p.contains("SinglePartition"), p.take(2000))
    assert(p.contains("hashpartitioning(source"), p.take(2000))
    assert(!p.contains("rangepartitioning"), p.take(2000))
  }

  test("pageRank: per-round edge equi-join + partial sum behind checkpoints") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("da", "db")
    val p = fmt(graft.operators.Dedup.pageRank(pairs, "da", "db", 2))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // prior rounds sit behind localCheckpoint boundaries — flat lineage
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("twap: one per-user window + one agg — no single-partition collapse") {
    val p = fmt(graft.queries.RelationalQueries.queries("rel_twap")(spark, sf001))
    assert(!p.contains("SinglePartition"), p.take(2000))
    assert(p.contains("hashpartitioning(user_id"), p.take(2000))
  }

  test("NB predict: literal tables fold in a projection — zero shuffle, zero join") {
    val docs = Tables.t(spark, sf001, "documents")
    val model = Seq("a" -> (0L, Seq.fill(64)(1L)), "b" -> (0L, Seq.fill(64)(2L)))
    val p = fmt(graft.operators.Mixture.nbPredict(
      docs, "doc_id", "text", "source", model, 64))
    assert(exchangeNodes(p) == 0, p)
    assert(!p.contains("Join"), p)
    // the r10 perf_weak: word_hashes re-evaluated inside every class's
    // interpreted HOF fold. Pin the fix — the doc tokenizes ONCE and all
    // class scores come from ONE ClassScoreArray pass; CollapseProject
    // must not inline the score array into the |C| argmax consumers
    assert("wordhasharray".r.findAllIn(p.toLowerCase).size == 1, p)
    assert("classscorearray".r.findAllIn(p.toLowerCase).size == 1, p)
  }

  test("incrementalDedup: band/hash equi-joins only — the corpora never cross-join") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Dedup.incrementalDedup(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 0.6))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(2000))
    assert(p.contains("LeftSemi"), p.take(2000)) // the exact-hash membership arm
  }

  test("sourceOverlap: gram-keyed equi-join, distinct collapses map-side, no cartesian") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.TextAnalysis.sourceOverlap(docs, "source", "text", 8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("partial_count"), p)
  }

  test("softDedupWeights: gram equi-joins only, map-side partial counts, no cartesian") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Dedup.softDedupWeights(docs, "doc_id", "text", 8))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("partial_count"), p)
  }

  test("unimaxPlan: one corpus agg; the water-fill window runs on the |sources|-row frame") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Mixture.unimaxPlan(docs, "source", "text", 52000L, 2))
    assert(!p.contains("CartesianProduct"), p)
    // per-source token counts aggregate with map-side combine — the only
    // corpus-sized shuffle; everything after operates on |sources| rows
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(p.contains("BroadcastExchange"), p) // the 1-row totals join back
  }

  test("dense retrieval capstone: no cartesian; the doc join is a broadcast hash join") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_dense_retrieval")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the k·|Q|-row hits frame broadcasts against the doc store — the
    // corpus-sized side must never shuffle for the payload fetch
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("approx_aggs exact arm: hash-threshold sample, no global top-k funnel") {
    // r10 residual: orderBy(__h).limit(100k) was TakeOrderedAndProject —
    // per-partition heaps merged by ONE final task (k x P rows at scale).
    // The threshold-filter form has no ordered-limit operator at all.
    val p = fmt(graft.queries.ExtQueries.queries("approx_aggs")(spark, sf001))
    assert(!p.contains("TakeOrderedAndProject"), p.take(3000))
    val r = graft.queries.ExtQueries.queries("approx_aggs")(spark, sf001).head()
    assert(r.getAs[Int]("acd_ok") == 1 && r.getAs[Int]("p50_ok") == 1, r)
  }

  test("boilerplate: df agg partial, left-anti mark, no cartesian") {
    val docs = Tables.t(spark, sf001, "documents")
    val seg = graft.operators.TextAnalysis.segmentLines(
      docs, "doc_id", "text", 12, keep = Seq("source"))
    val p = fmt(graft.operators.TextAnalysis.boilerplate(
      seg, "id", "source", "text", 2))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("partial_count"), p) // doc-frequency map-side combine
    assert(p.contains("LeftAnti"), p)
  }

  test("contaminationRate: eval grams broadcast — corpus never shuffles on grams") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Decontaminate.contaminationRate(
      docs, "doc_id", "text", id => id % 17 === 0, 8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p) // probe side = the corpus scan
  }

  test("thresholdByKeepRate: histogram aggregates partial; 1-row threshold broadcasts back") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Mixture.thresholdByKeepRate(
      docs, "doc_id", length(col("text")).cast("long"), 0.4))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p) // score histogram map-side combine
    assert(p.contains("BroadcastExchange"), p) // the 1-row threshold
    // no corpus-wide ordered limit — the exact quantile comes from the
    // bounded histogram, never a TakeOrdered funnel or a global sort of
    // the corpus
    assert(!p.contains("TakeOrderedAndProject"), p)
  }

  test("cdcChunks: pure projection + Generate — zero shuffle") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Chunking.cdcChunks(docs, "doc_id", "text", 4, 16))
    assert(exchangeNodes(p) == 0, p)
    assert(p.contains("Generate"), p)
  }

  test("cdcDedupStats: chunk-hash equi-join with map-side partial counts") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Chunking.cdcDedupStats(
      graft.operators.Chunking.cdcChunks(docs, "doc_id", "text", 4, 16)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("partial_count"), p)
  }

  test("distinctKmv: threshold filter precedes the distinct; partial aggregation") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.TextAnalysis.distinctKmv(
      docs, "source", "text", 4, 32, 16))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the (source, g) distinct takes map-side partials on the
    // post-threshold sliver
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("marginMining: pair frame behind a checkpoint boundary; downstream equi-joins only") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Similarity.marginMining(
      emb, "vec_id", "embedding", id => id % 2 === 0, 4, 1.0))
    // the disclosed brute pair generator sits behind the lazy
    // localCheckpoint (ExistingRDD); the visible margin algebra is
    // window + hash-agg + equi-joins with no nested loop
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("labelNoise: LSH-bucket equi-join candidates — never an n² cross join") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Similarity.labelNoise(
      emb, "vec_id", "embedding", "label", 5))
    // the bucketed frame sits behind a lazy localCheckpoint; the visible
    // candidate join is an equi-join on the bucket with no nested loop
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("hardNegatives: query side broadcasts; corpus scanned once") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Similarity.hardNegatives(
      emb, "vec_id", "embedding", "label", id => id < 5, 5))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
  }

  test("tfidfKeywords: tf/df hash aggs partial; only the per-doc window shuffles by doc") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Ranking.tfidfKeywords(docs, "doc_id", "text", 5))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastExchange"), p) // the 1-row N
  }

  test("phraseSearch: vocab filter precedes the joins; every join keyed (id,pos)") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Ranking.phraseSearch(docs, "doc_id", "text",
      Seq("table hash", "slow hash batch")))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // posting-intersection arms are equi-joins; per-doc counts partial-agg
    assert(p.contains("partial_count"), p.take(3000))
    // the sparse posting sliver is computed once behind a lazy
    // localCheckpoint boundary (reclaimable, unlike a CacheManager entry)
    assert(p.contains("ExistingRDD"), p.take(3000))
  }

  test("phraseContexts: sparse match set equi-joins back to tokens — no nested loop") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Ranking.phraseContexts(
      docs, "doc_id", "text", Seq("table hash"), 3))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("curriculum pack capstone: one packing window, no corpus join") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_curriculum_pack")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // text carried through the staging projection — no join-back of the
    // corpus to itself; the only joins are the broadcast 1-row extremes
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("curriculumStages: one corpus scoring pass; extremes broadcast back") {
    val docs = Tables.t(spark, sf001, "documents")
    val tbl = Seq.fill(64)(-1000000L)
    val p = fmt(graft.operators.Mixture.curriculumStages(
      docs, "doc_id", "text", tbl, 64, 4))
    // the 1-row min/max agg rejoins as a broadcast, never a shuffle join
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // binning is a projection over the scored frame — no window, no sort
    assert(!p.contains("Window"), p.take(3000))
  }

  test("weighted sampling: one codegen'd filter, no shuffle") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.Sampling.weighted(
      docs, "doc_id", org.apache.spark.sql.functions.lit(0.5)))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("codegen id"), p.take(2000))
  }

  test("kAnonymity: one map-side-combined hash agg, no join") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.TextAnalysis.kAnonymity(
      docs, Seq("lang", "source"), 5L))
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("piiStats: single projection + one bounded agg — zero joins") {
    val docs = Tables.t(spark, sf001, "documents")
    val p = fmt(graft.operators.TextAnalysis.piiStats(docs, "source", "text",
      Seq("d" -> "[0-9]+", "a" -> "[a-z]+[0-9]+")))
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_sum"), p)
    assert(p.contains("Generate"), p) // the pattern stack explode
  }

  test("datasheet capstone: mini-frame joins only — no cartesian, no corpus self-join") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_datasheet")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // every corpus-sized pass is an audited operator plan; the final
    // report joins |sources|-row frames (sort-merge or broadcast, never
    // nested-loop over corpus data)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(3000))
  }

  test("incrementalEmbDedup: cross-side band equi-join — reference never self-joins") {
    val emb = Tables.t(spark, sf001, "embeddings")
    val p = fmt(graft.operators.Dedup.incrementalEmbDedup(
      emb.filter(col("vec_id") % 3 =!= 0), emb.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", 0.45, tables = 64))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // both signature passes sit behind lazy localCheckpoints
    assert(p.contains("ExistingRDD"), p.take(2000))
  }

  test("clusterStats: two bounded hash aggregates over the label frame") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("da", "db")
    val p = fmt(graft.operators.Dedup.clusterStats(
      graft.operators.Dedup.clusters(pairs, "da", "db"), "l"))
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("prefix jaccard: equi-joins only — prefix posting join, no cartesian") {
    val p = fmt(graft.queries.ExtQueries.queries("dedup_jaccard_prefix")(spark, sf001))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the df-rank aggregate sits behind the shingle-frame cache in the
    // full query plan (renders as an InMemoryRelation), so its map-side
    // combine is audited on the exposed pre-cache stage directly
    val docs = graft.operators.Dedup.shingleDocs(
      graft.queries.Tables.t(spark, sf001, "documents"), "doc_id", "text")
    val pp = fmt(graft.operators.Dedup.prefixPostings(docs, 3, 5))
    assert(pp.contains("partial_count"), pp.take(3000))
    assert(!pp.contains("CartesianProduct"), pp.take(3000))
  }

  test("interval overlap: grid-cell equi-join, never a range nested loop") {
    val p = plan("rel_interval_overlap")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // both sides Generate their cell replicas before the join
    assert("Generate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("merge apply: keep-last collapse aggregates partially; one full-outer join") {
    val p = plan("rel_merge_upsert")
    assert(p.contains("FullOuter"), p.take(3000))
    assert(p.contains("partial_max_by"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("target encoding: category stats broadcast back — no per-category window") {
    val p = fmt(graft.queries.ExtQueries.queries("feat_target_encode")(spark, sf001))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("RAG capstone: chunk Generate pipelines into the scan; no corpus-side shuffle before postings") {
    val p = fmt(graft.queries.ExtQueries.queries("pipe_rag_retrieval")(spark, sf001))
    assert(p.contains("Generate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // nested-loop joins only for the 1-row corpus-stats broadcasts (the
    // scored and unscored stat arms); dfreq joins the postings as a
    // broadcast HASH join, and the corpus itself never nested-loops
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }
}
