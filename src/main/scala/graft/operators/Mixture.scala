package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture composition: the step between a curated corpus and
  * a training run, where each source (or language/domain) is up- or
  * down-weighted to a target mixture and capped to a token budget.
  *
  * Reference pipelines express this as "epochs per source" (a rate of
  * 2.5 means every document appears twice and a random half appear a
  * third time) and "top-quality documents until the budget is spent".
  * Both are re-expressed here as deterministic, layout-invariant Spark
  * plans:
  *
  *  - [[resample]] replicates/filters per-row with membership decided by
  *    [[Sampling.rowHash]] — a pure projection + generator, no shuffle,
  *    no RNG, reproducible across runs, partitionings and engines (the
  *    property a training mixture must have: re-running the job on a
  *    recompacted table must yield the same corpus).
  *  - [[tokenBudget]] is one window per source partition (cumulative
  *    token sum in quality order) + a filter — a single shuffle on the
  *    source key; budgets are enforced exactly and deterministically
  *    (score ties broken by id).
  */
object Mixture {

  import Sampling.M

  /** Per-source sampling plan derived from fractional epoch rates:
    * `whole` full copies for every row plus one extra copy for the
    * deterministic hash slice below `fracThreshold`. Thresholds are
    * precomputed as integer constants so the DuckDB oracle can mirror
    * membership bit-for-bit from the same numbers. */
  final case class EpochPlan(whole: Long, fracThreshold: Long)

  /** Derive an [[EpochPlan]] from a fractional epoch rate (0 drops the
    * source, 1 keeps it unchanged, 2.5 = two epochs + a half slice). */
  def epochPlan(rate: Double): EpochPlan = {
    require(rate >= 0.0, s"epoch rate $rate < 0")
    val whole = math.floor(rate).toLong
    EpochPlan(whole, math.floor((rate - whole) * M).toLong)
  }

  /** Copies-per-row column for the given per-source rates: CASE over the
    * source column with integer-constant plans, so the same constants
    * can be pasted into the oracle SQL. */
  def copiesCol(idCol: Column, srcCol: Column,
      plans: Map[String, EpochPlan], default: EpochPlan): Column = {
    val h = Sampling.rowHash(idCol)
    val whole = plans.foldLeft(lit(default.whole)) { case (acc, (s, p)) =>
      when(srcCol === s, lit(p.whole)).otherwise(acc) }
    val thr = plans.foldLeft(lit(default.fracThreshold)) { case (acc, (s, p)) =>
      when(srcCol === s, lit(p.fracThreshold)).otherwise(acc) }
    whole + when(h < thr, 1L).otherwise(0L)
  }

  /** Deterministic mixture resampling with fractional-epoch replication:
    * each row appears `floor(rate)` times, plus once more if its id hash
    * falls in the fractional slice. Emits every input column plus
    * `copy_idx` (0-based). Plan shape: projection + `explode(sequence)`
    * generator — zero shuffle; replication happens where the row already
    * lives. */
  def resample(df: DataFrame, idCol: String, srcCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val plans = rates.map { case (s, r) => s -> epochPlan(r) }
    val n = copiesCol(col(idCol), col(srcCol), plans, epochPlan(defaultRate))
    df.withColumn("__n", n).filter(col("__n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** DSIR-style importance table (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-unigram
    * bag-of-words models of the target and source distributions, emitted
    * as integer MICRO-NAT log-ratios per hash bucket:
    *
    *   L_b = round(10⁶ · ln( (ct_b+1)∕(tt+B) ÷ (cs_b+1)∕(ts+B) ))
    *
    * (add-one smoothing; ct = target bucket counts, cs = RAW-CORPUS
    * bucket counts — the whole pool INCLUDING the target rows, i.e. the
    * q distribution is the raw pool DSIR selects from, not
    * corpus-minus-target; tt/ts the totals, B the bucket count). A
    * document's importance log-weight is then Σ_words L_bucket(word) —
    * integer exact given the table.
    *
    * Scale design: `isTarget` tags rows so BOTH distributions come from
    * ONE pass over the corpus (explode word hashes → conditional counts
    * per bucket — map-side combine makes the shuffle B-bounded); totals
    * join at 1×1; the output is B rows. The ln argument is a ratio of
    * exact sub-2⁵³ integer products, so both engines see the same
    * double; the only cross-engine wobble is the final ulp of ln before
    * the micro-nat rounding. */
  def importanceTable(df: DataFrame, textCol: String, isTarget: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val wh = graft.functions.HashExpressions.word_hashes(col(textCol))
    val bc = df.select(explode(wh).as("w"), isTarget.as("t"))
      .select(pmod(col("w"), lit(buckets.toLong)).as("bucket"), col("t"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cs"), sum(when(col("t"), 1L).otherwise(0L)).as("ct"))
    val tot = bc.agg(sum(col("cs")).as("ts"), sum(col("ct")).as("tt"))
    val spine = df.sparkSession.range(buckets).select(col("id").as("bucket"))
    spine.join(bc, Seq("bucket"), "left").crossJoin(tot)
      .select(col("bucket"),
        round(lit(1e6) * log(
          ((coalesce(col("ct"), lit(0L)) + 1) * (col("ts") + buckets)).cast("double")
            / ((coalesce(col("cs"), lit(0L)) + 1) * (col("tt") + buckets)).cast("double")))
          .cast("long").as("lw"))
  }

  /** Unigram language-model table for perplexity filtering (the CCNet
    * move — Wenzek et al. 2020 rank documents by LM perplexity and drop
    * the tail): hashed-unigram log-probabilities as integer micro-nats,
    * L_b = round(10⁶ · ln((c_b+1)∕(total+B))) with add-one smoothing.
    * One corpus pass, map-side combine, B-bounded shuffle — the same
    * fit shape as [[importanceTable]]. */
  def unigramLmTable(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    lmTableFromHashes(df,
      graft.functions.HashExpressions.word_hashes(col(textCol)),
      buckets, coalesceTotal = false)

  /** Shared add-one-smoothed micro-nat LM fit over ANY hashed-token
    * array column (unigram word hashes, bigram gram hashes): one
    * B-bounded bucket agg, spine left-join, round(10⁶·ln((c+1)∕(t+B))).
    * `coalesceTotal` guards the zero-token corpus — reachable for a
    * BIGRAM fit when every doc is single-word, whereas a unigram fit of
    * a nonempty corpus always has tokens and its oracle mirror does not
    * coalesce; the flag keeps each table bit-matched to ITS mirror. */
  private def lmTableFromHashes(df: DataFrame, hashes: Column, buckets: Int,
      coalesceTotal: Boolean): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bc = df.select(explode(hashes).as("g"))
      .select(pmod(col("g"), lit(buckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val tot = bc.agg(sum(col("c")).as("t"))
    val spine = df.sparkSession.range(buckets).select(col("id").as("bucket"))
    val tCol = if (coalesceTotal) coalesce(col("t"), lit(0L)) else col("t")
    spine.join(bc, Seq("bucket"), "left").crossJoin(tot)
      .select(col("bucket"),
        round(lit(1e6) * log(
          (coalesce(col("c"), lit(0L)) + 1).cast("double")
            / (tCol + buckets).cast("double")))
          .cast("long").as("lp"))
  }

  /** Per-document perplexity under a collected unigram table: the
    * negative mean log-probability in micro-nats,
    * nll = −Σ_words lp[bucket(word)] ∕ n_words — BIGINT sum, one final
    * IEEE division. High nll = surprising/low-quality under the corpus
    * LM; the CCNet filter drops the worst tail. Pure projection fold
    * with the table a plan literal — zero shuffle. */
  def perplexityScore(df: DataFrame, idCol: String, textCol: String,
      table: Seq[Long], buckets: Int, carry: Seq[String] = Nil): DataFrame = {
    require(table.length == buckets, s"table size ${table.length} != $buckets")
    val wh = graft.functions.HashExpressions.word_hashes(col(textCol))
    // the fold runs in the codegen'd ClassScoreArray (one class, zero
    // prior) — not an interpreted `aggregate` HOF; BIGINT addition is
    // order-free so the value is identical to the lambda form
    val nllSum = -element_at(graft.functions.HashExpressions.class_scores(
      wh, Array(0L), table.toArray, buckets), 1)
    df.select(col(idCol).as("id") +: carry.map(col) :+
      size(wh).cast("long").as("n_words") :+
      nllSum.as("__s"): _*)
      .select(col("id") +: carry.map(col) :+ col("n_words") :+
        (col("__s").cast("double") / col("n_words").cast("double"))
          .as("nll_micro_nats"): _*)
      .filter(col("n_words") > 0)
  }

  /** Hashed-BIGRAM language-model table — the context-aware half of an
    * interpolated n-gram LM (the KenLM 5-gram CCNet actually ships,
    * truncated to order 2 and hashed so the table stays B-bounded):
    * bigram bucket counts with add-one smoothing, emitted as integer
    * micro-nat log-probabilities like [[unigramLmTable]]. The bigram
    * key is the repo's standard rolling gram hash over the word-hash
    * sequence (`ngram_hashes(wh, 2)` — the same chain the dedup/
    * decontam operators mirror), so the DuckDB oracle shares it. One
    * corpus pass, map-side combine, B-bounded shuffle. */
  def bigramLmTable(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    lmTableFromHashes(df,
      graft.functions.HashExpressions.ngram_hashes(
        graft.functions.HashExpressions.word_hashes(col(textCol)), 2),
      buckets, coalesceTotal = true)

  /** Per-document perplexity under an INTERPOLATED unigram+bigram LM —
    * the log-linear interpolation λ·lp₂ + (1−λ)·lp₁ per token position
    * (position 0, which has no left context, scores lp₁ alone), with
    * λ = lamNum∕lamDen kept RATIONAL so the whole sum stays BIGINT:
    *
    *   s = (D−L)·Σᵢ lp₁(wᵢ) + L·lp₁(w₀) + L·Σᵢ₌₁ lp₂(wᵢ₋₁wᵢ)
    *   nll = −s ∕ (D·n)          (L = lamNum, D = lamDen)
    *
    * — algebraically identical to scoring position 0 by lp₁ and every
    * later position by the interpolation, but computed from three whole-
    * array folds (no per-position branching). ONE projection pass, both
    * tables plan literals, zero shuffle; a single-word document
    * degenerates to the unigram score exactly. */
  /** Shared unigram/bigram LM sum core: (word-hash array, Σ lp₁ over
    * all positions, lp₁(w₀) + Σ lp₂ over later positions) — the
    * sufficient BIGINT statistics every interpolated-LM consumer
    * ([[perplexityScoreInterp]], [[doremiPlan]]) scores from, factored
    * so the twins cannot drift. Folds run in the codegen'd
    * ClassScoreArray (one class, zero prior) — no interpreted HOF. */
  private def lmSums(textCol: String, uniTable: Seq[Long],
      biTable: Seq[Long], buckets: Int): (Column, Column, Column) = {
    val wh = graft.functions.HashExpressions.word_hashes(col(textCol))
    val gh = graft.functions.HashExpressions.ngram_hashes(wh, 2)
    def fold(arr: Column, tbl: Seq[Long]): Column =
      element_at(graft.functions.HashExpressions.class_scores(
        arr, Array(0L), tbl.toArray, buckets), 1)
    val first = element_at(lit(uniTable.toArray),
      pmod(element_at(wh, 1), lit(buckets.toLong)).cast("int") + 1)
    (wh, fold(wh, uniTable), first + fold(gh, biTable))
  }

  def perplexityScoreInterp(df: DataFrame, idCol: String, textCol: String,
      uniTable: Seq[Long], biTable: Seq[Long], buckets: Int,
      lamNum: Int, lamDen: Int): DataFrame = {
    require(uniTable.length == buckets && biTable.length == buckets,
      "table sizes must equal buckets")
    require(lamNum >= 0 && lamDen > 0 && lamNum <= lamDen,
      s"lambda $lamNum/$lamDen not in [0,1]")
    val (wh, s1, sbi) = lmSums(textCol, uniTable, biTable, buckets)
    val s = lit((lamDen - lamNum).toLong) * s1 + lit(lamNum.toLong) * sbi
    df.select(col(idCol).as("id"),
      size(wh).cast("long").as("n_words"),
      (-s).as("__s"))
      .filter(col("n_words") > 0)
      .select(col("id"), col("n_words"),
        (col("__s").cast("double")
          / (lit(lamDen.toLong) * col("n_words")).cast("double"))
          .as("nll_micro_nats"))
  }

  /** DoReMi-style domain reweighting plan (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * the Group-DRO exponentiated-gradient step that upweights domains
    * where a stronger model improves most over a weaker one. The
    * published method measures per-domain EXCESS LOSS (proxy minus
    * reference model); this deterministic stand-in uses the repo's two
    * corpus LMs — excess = unigram NLL − interpolated-bigram NLL per
    * document (both BIGINT micro-nat sums from [[lmSums]], so the
    * statistic is bit-exact cross-engine) — and takes one EG step from
    * the baseline token distribution:
    *
    *   L_d      = Σ_docs max(0, nll₁ − nll₂) div Σ_docs tokens   (µnats/tok)
    *   score_d  = round(10⁶ · exp(L_d ∕ 10⁶))                    (η = 1)
    *   weight_d = tokens_d·score_d ∕ Σ_e tokens_e·score_e
    *
    * The only transcendental is one exp per DOMAIN (≈20 rows), rounded
    * to integer micro-units — the same final-ulp-then-round exposure as
    * the LM tables' ln, negligible and disclosed.
    *
    * Scale: corpus cost is one zero-shuffle scoring projection (both
    * LM tables are plan literals) + one |domains|-row aggregate; the
    * normalizer joins back as a broadcast 1-row frame. */
  def doremiPlan(df: DataFrame, srcCol: String, textCol: String,
      uniTable: Seq[Long], biTable: Seq[Long], buckets: Int): DataFrame = {
    require(uniTable.length == buckets && biTable.length == buckets,
      "table sizes must equal buckets")
    val (wh, s1, sbi) = lmSums(textCol, uniTable, biTable, buckets)
    // lp sums are negative; nll₁ − nll₂ = (−s1) − (−sbi) = sbi − s1
    val perDoc = df.select(col(srcCol).as("source"),
        size(wh).cast("long").as("__n"),
        greatest(lit(0L), sbi - s1).as("__ex"))
      .filter(col("__n") > 0)
    // |domains| rows feed two consumers (normalizer + output) — lazy
    // checkpoint so the corpus scoring pass runs once
    val agg = perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        sum(col("__ex")).as("__ex_sum"))
      .withColumn("excess_micro", expr("__ex_sum div n_tokens"))
      .withColumn("eg_score",
        round(lit(1e6) * exp(col("excess_micro").cast("double") / lit(1e6)))
          .cast("long"))
      .localCheckpoint(eager = false)
    val total = agg.agg(sum(col("n_tokens") * col("eg_score")).as("__tot"))
    agg.join(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("excess_micro"), col("eg_score"),
        ((col("n_tokens") * col("eg_score")) / col("__tot")).as("weight"))
  }

  /** CCNet head/middle/tail quality buckets (Wenzek et al. 2020 §4.3) —
    * the released CommonCrawl curation format: documents ranked by LM
    * perplexity WITHIN THEIR LANGUAGE and cut at the terciles; "head"
    * is the most-fluent third of each language, "tail" the least. The
    * per-language rank is percent_rank over (nll, id) — a total order,
    * so ties cannot straddle a cut — and the cuts are the IEEE doubles
    * 1∕3 and 2∕3 both engines compute identically.
    *
    * Scale: the corpus is scored in [[perplexityScore]]'s zero-shuffle
    * fold; the only shuffle is the per-LANGUAGE window. Partitions are
    * per-language (the paper's semantics — a global window would be the
    * scale-killer, a language partition is merely skewed); a corpus
    * whose largest language outgrows an executor would swap the exact
    * tercile for the keep-rate histogram threshold
    * ([[thresholdByKeepRate]]) per language — disclosed trade. */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String, table: Seq[Long], buckets: Int): DataFrame = {
    val scored = perplexityScore(df, idCol, textCol, table, buckets,
      carry = Seq(langCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("nll_micro_nats"), col("id"))
    scored.withColumn("pct", percent_rank().over(w))
      .withColumn("bucket",
        when(col("pct") <= lit(1.0 / 3), "head")
          .when(col("pct") <= lit(2.0 / 3), "middle")
          .otherwise("tail"))
      .select(col("id"), col(langCol), col("n_words"),
        col("nll_micro_nats"), col("bucket"))
  }

  /** Curriculum staging by LM perplexity — the "easy-to-hard" data
    * ordering of curriculum learning (Bengio et al. 2009; applied to LM
    * pretraining data by e.g. DoCL / Rho-style selection): documents are
    * assigned to one of `nStages` difficulty stages by their unigram-LM
    * nll, stage 0 = most predictable (easiest). Stages are EQUI-WIDTH
    * bins of the [min, max] nll span rather than quantiles: quantile
    * staging needs a global rank (a total sort, or a single-task ntile
    * window — the scale-killer this repo's window audit warns on), while
    * min/max are order-independent one-row aggregates that BROADCAST
    * back — the corpus is scored in one projection pass and binned in a
    * second, shuffle-free except the 1-row extremes agg.
    *
    * Determinism: nll is a BIGINT micro-nat sum with one final IEEE
    * division (see [[perplexityScore]]); the bin index is
    * floor((nll−lo)∕(hi−lo)·S) with identical operation order in the SQL
    * mirror, clamped to S−1 so the max lands in the last stage; a
    * degenerate corpus (hi == lo) collapses to stage 0. */
  def curriculumStages(df: DataFrame, idCol: String, textCol: String,
      table: Seq[Long], buckets: Int, nStages: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(nStages >= 1, "nStages must be positive")
    val scored = perplexityScore(df, idCol, textCol, table, buckets, carry)
    val ext = scored.agg(min(col("nll_micro_nats")).as("lo"),
      max(col("nll_micro_nats")).as("hi"))
    scored.crossJoin(broadcast(ext))
      .select(col("id") +: carry.map(col) :+ col("n_words") :+
        col("nll_micro_nats") :+
        when(col("hi") > col("lo"),
          least(floor((col("nll_micro_nats") - col("lo"))
              / (col("hi") - col("lo")) * nStages).cast("long"),
            lit(nStages - 1L)))
          .otherwise(0L).as("stage"): _*)
  }

  /** Score every document against a collected importance table (the
    * model-application half of DSIR, and the same plan shape as any
    * trained hashed-linear quality classifier à la fastText): score =
    * Σ_words table[hash(word) mod B], a pure projection fold with the
    * B-entry table shipped as a plan literal — zero shuffle, zero join;
    * the corpus is touched exactly once no matter its size. */
  def importanceScore(df: DataFrame, idCol: String, textCol: String,
      table: Seq[Long], buckets: Int): DataFrame = {
    require(table.length == buckets, s"table size ${table.length} != $buckets")
    val wh = graft.functions.HashExpressions.word_hashes(col(textCol))
    // codegen'd one-class ClassScoreArray fold — not an interpreted HOF
    df.select(col(idCol).as("id"),
      element_at(graft.functions.HashExpressions.class_scores(
        wh, Array(0L), table.toArray, buckets), 1)
        .as("score"))
  }

  /** Temperature-based mixture planning — the multilingual up/down-
    * weighting rule of XLM (Conneau & Lample 2019) and mT5 (Xue et al.
    * 2021): source i is sampled ∝ n_i^α with α < 1, boosting
    * low-resource sources. α is PINNED at 1∕2 so the power is `sqrt` —
    * correctly rounded per IEEE-754 in every engine, unlike `pow`
    * whose libm tail differs across platforms (the same determinism
    * discipline as the rest of the oracle surface). Weights are
    * emitted RELATIVE TO THE LARGEST source (max is order-independent,
    * a cross-source sum of doubles is not), so the output is a pure
    * function of the per-source token counts: rel_weight =
    * √n_i ∕ √n_max, epochs = rel_weight · maxEpochs — the epochs-per-
    * source vector a [[resample]] pass consumes.
    *
    * ONE pass: per-source counts aggregate with map-side combine
    * (shuffle ≤ |sources| rows), the 1-row max broadcasts back. */
  def temperaturePlan(df: DataFrame, srcCol: String, textCol: String,
      maxEpochs: Double): DataFrame = {
    val bySrc = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    val mx = bySrc.agg(max(col("n_tokens")).as("max_tokens"))
    bySrc.crossJoin(broadcast(mx))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (sqrt(col("n_tokens").cast("double"))
          / sqrt(col("max_tokens").cast("double"))).as("rel_weight"),
        (sqrt(col("n_tokens").cast("double"))
          / sqrt(col("max_tokens").cast("double")) * maxEpochs).as("epochs"))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", arXiv:2304.09151): distribute a total token budget B
    * as UNIFORMLY as possible across sources, capping every source at
    * `maxEpochs` passes over its own data — the fairness-motivated
    * alternative to temperature sampling ([[temperaturePlan]]) that
    * never over-repeats low-resource sources. Classic water-filling
    * with the sources sorted by cap ascending: a source is CAPPED when
    * even handing every not-yet-capped source its cap amount fits the
    * remaining budget (cᵢ·(m−i+1) ≤ B−P_{i−1}); the capped set is a
    * prefix of the sort order, everyone else splits the remainder
    * evenly. All integer arithmetic — allocations are exact token
    * counts, the division remainder goes one token each to the first r
    * uncapped sources, so Σ alloc == min(B, Σ caps) always.
    *
    * Scale: one corpus pass for per-source token counts (map-side
    * combine, shuffle ≤ |sources| rows); the water-fill itself runs on
    * the |sources|-row frame (a global window over tens of rows, not
    * corpus data). Emits (source, n_docs, n_tokens, cap_tokens,
    * alloc_tokens, epochs = alloc∕n_tokens). */
  def unimaxPlan(df: DataFrame, srcCol: String, textCol: String,
      budgetTokens: Long, maxEpochs: Int): DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0, "budget and epochs must be positive")
    val bySrc = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens") * maxEpochs)
    val w = Window.orderBy(col("cap_tokens"), col("source"))
    val ranked = bySrc
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("p", sum(col("cap_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("capped",
        col("cap_tokens") * (count(lit(1)).over(Window.partitionBy()) - col("i") + 1)
          <= lit(budgetTokens) - (col("p") - col("cap_tokens")))
    val tot = ranked.agg(
      count(lit(1)).as("m"),
      coalesce(max(when(col("capped"), col("i"))), lit(0L)).as("k"),
      coalesce(max(when(col("capped"), col("p"))), lit(0L)).as("pk"))
    // integer DIV/% sit INSIDE the otherwise branch: CaseWhen evaluates
    // lazily per row, so the all-capped edge (m == k, divisor 0) never
    // reaches the division — every row takes the capped branch there
    ranked.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("cap_tokens"),
        when(col("i") <= col("k"), col("cap_tokens"))
          .otherwise(expr(
            s"($budgetTokens - pk) DIV (m - k) + " +
            s"(CASE WHEN i - k <= ($budgetTokens - pk) % (m - k) THEN 1 ELSE 0 END)"))
          .cast("long").as("alloc_tokens"))
      .withColumn("epochs",
        col("alloc_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Multinomial Naive Bayes over hashed unigrams — fit half. The
    * in-engine stand-in for the fastText-style domain/quality classifier
    * every published curation pipeline trains (CCNet's language-model
    * filter, GPT-3's WebText-vs-CommonCrawl quality classifier, Llama's
    * Wikipedia-reference classifier): a linear scorer over hashed bag-of-
    * words features, here with exactly mirrorable integer weights.
    * Returns the spine-complete conditional table (cls, bucket, lw) with
    * lw = round(10⁶·ln((c_{cls,b}+1)∕(t_cls+B))) — add-one-smoothed
    * log-likelihoods in micro-nats, same integerization as
    * [[importanceTable]].
    *
    * ONE corpus pass: the (cls, bucket) agg has full map-side combine and
    * its shuffle is bounded by |classes|·B, never the corpus. */
  def nbTable(df: DataFrame, textCol: String, classCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val wh = graft.functions.HashExpressions.word_hashes(col(textCol))
    val bc = df.select(col(classCol).as("cls"), explode(wh).as("w"))
      .select(col("cls"), pmod(col("w"), lit(buckets.toLong)).as("bucket"))
      .groupBy("cls", "bucket").agg(count(lit(1)).as("c"))
    val tot = bc.groupBy("cls").agg(sum(col("c")).as("t"))
    val spine = tot.select(col("cls"), col("t")).crossJoin(
      df.sparkSession.range(buckets).select(col("id").as("bucket")))
    spine.join(bc, Seq("cls", "bucket"), "left")
      .select(col("cls"), col("bucket"),
        round(lit(1e6) * log(
          (coalesce(col("c"), lit(0L)) + 1).cast("double")
            / (col("t") + buckets).cast("double")))
          .cast("long").as("lw"))
  }

  /** Class log-priors for [[nbPredict]]: (cls, n_docs,
    * lp = round(10⁶·ln(n_docs∕N))). One tiny agg. */
  def nbPriors(df: DataFrame, classCol: String): DataFrame = {
    val nd = df.groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("nd"))
    nd.crossJoin(nd.agg(sum(col("nd")).as("n")))
      .select(col("cls"), col("nd"),
        round(lit(1e6) * log(col("nd").cast("double") / col("n").cast("double")))
          .cast("long").as("lp"))
  }

  /** Multinomial Naive Bayes — predict half. `model` maps each class to
    * (log-prior, B-entry log-likelihood table), collected from
    * [[nbPriors]]/[[nbTable]] (model fitting collects like IVF centroids
    * — |classes|·B longs, driver-bounded). Scoring is ONE codegen'd
    * expression ([[graft.functions.HashExpressions.ClassScoreArray]]):
    * the document tokenizes once and a two-level loop adds every class's
    * table entry for each token's bucket, with the |C|·B model riding
    * along as a plan reference object — ZERO shuffle, zero join, the
    * corpus is read once and hashed once (NOT once per class, the r10
    * interpreted-HOF form that re-ran WordHashArray |C|× per row). The
    * argmax (score DESC, class name ASC on ties) is a `greatest` over
    * (score, reverse-class-rank, name) structs reading the projected
    * score array — cheap element_at only, so the two projections stay
    * separate and the scores evaluate once. Emits (id, cls = true
    * label, pred, correct). */
  def nbPredict(df: DataFrame, idCol: String, textCol: String,
      classCol: String, model: Seq[(String, (Long, Seq[Long]))],
      buckets: Int): DataFrame =
    // one scoring implementation — the margin-carrying variant below —
    // so the tie-break rule / model layout can never silently diverge
    nbPredictScored(df, idCol, textCol, classCol, model, buckets)
      .drop("margin")

  /** [[nbPredict]] with the prediction MARGIN carried: margin = best
    * score − second-best score (micro-nats, ≥ 0; 0 when the model has
    * one class). The margin is the standard confidence proxy for a
    * linear bag-of-words classifier — what a curation pipeline
    * thresholds on when it keeps only confidently-classified documents.
    * Same single [[graft.functions.HashExpressions.ClassScoreArray]]
    * pass; the margin reads the projected score array via one
    * sort_array (|C| elements, row-local). */
  def nbPredictScored(df: DataFrame, idCol: String, textCol: String,
      classCol: String, model: Seq[(String, (Long, Seq[Long]))],
      buckets: Int): DataFrame = {
    require(model.nonEmpty, "model must have at least one class")
    val sorted = model.sortBy(_._1)
    sorted.foreach { case (_, (_, tbl)) =>
      require(tbl.length == buckets, s"table size ${tbl.length} != $buckets") }
    val priors = sorted.map(_._2._1).toArray
    val flat = sorted.iterator.flatMap(_._2._2).toArray
    val scores = graft.functions.HashExpressions.class_scores(
      graft.functions.HashExpressions.word_hashes(col(textCol)),
      priors, flat, buckets)
    val base = df.select(col(idCol).as("id"), col(classCol).as("cls"),
      scores.as("__sc"))
    val cands = sorted.zipWithIndex.map { case ((name, _), idx) =>
      struct(element_at(col("__sc"), idx + 1).as("s"),
        lit(sorted.size - idx).as("r"), lit(name).as("n"))
    }
    val best = if (cands.size == 1) cands.head else greatest(cands: _*)
    val margin =
      if (sorted.size == 1) lit(0L)
      else {
        val d = sort_array(col("__sc"), asc = false)
        element_at(d, 1) - element_at(d, 2)
      }
    base.select(col("id"), col("cls"), best.getField("n").as("pred"),
        margin.as("margin"))
      .withColumn("correct", (col("cls") === col("pred")).cast("int"))
  }

  /** Classifier CALIBRATION audit over [[nbPredictScored]]'s margins:
    * reliability bins — fixed-width integer bins of the margin (bin =
    * min(margin ∕ binWidth, maxBin), micro-nat units), each with its
    * document count, correct count, and accuracy. The sanity check
    * every production quality-classifier gate ships with: accuracy
    * should rise with margin, and the low-margin mass tells you what a
    * confidence threshold would discard. ONE aggregate over the scored
    * frame (map-side combine, ≤ maxBin+1 groups). */
  def nbCalibration(scored: DataFrame, binWidth: Long,
      maxBin: Int): DataFrame = {
    require(binWidth > 0 && maxBin >= 0, "binWidth and maxBin must be positive")
    scored
      .withColumn("bin",
        least(expr(s"margin DIV $binWidth"), lit(maxBin.toLong)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("correct")).cast("long").as("n_correct"))
      .withColumn("acc",
        col("n_correct").cast("double") / col("n").cast("double"))
  }

  /** Quality-ordered token-budget selection: per `srcCol` group, keep
    * the best-scoring rows (ties broken by id) until the cumulative
    * `tokensCol` sum would exceed `budget`. One window over the source
    * partition — the per-group state is a running BIGINT sum, so the
    * plan holds at any corpus size where a single source's rows fit a
    * sort spill. Emits id, source, tokens and the cumulative sum. */
  def tokenBudget(df: DataFrame, idCol: String, srcCol: String,
      tokensCol: String, scoreCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Keep-rate-calibrated score threshold — how production quality gates
    * are actually tuned (the FineWeb-Edu / DCLM recipe: pick the
    * classifier-score cutoff that keeps the top X% of the corpus, rather
    * than hand-picking an absolute score): given an INTEGER `score`
    * column and a target `keepRate`, find τ = the ⌈keepRate·N⌉-th
    * largest score and emit every doc with (id, score, thr, keep =
    * score ≥ τ). Ties at τ are kept (threshold semantics), so n_keep ≥
    * ⌈keepRate·N⌉ — the standard over-admit of a value cutoff.
    *
    * Scale design — this is the EXACT quantile, computed scale-free:
    * no global sort of the corpus and no single-task top-K funnel
    * (the two shapes an exact percentile usually costs, cf.
    * `approx_aggs`' history). The corpus aggregates to a score
    * HISTOGRAM (map-side combine; ≤ |score space| rows — integerized
    * micro-unit ratios give ≤ 10⁶+1 bins regardless of corpus size),
    * the cumulative count runs over that bounded frame, and the 1-row
    * threshold broadcasts back over the scoring pass. Corpus is read
    * twice (histogram + flagging) — fuse with a cache upstream if the
    * score projection is expensive. */
  def thresholdByKeepRate(df: DataFrame, idCol: String, score: Column,
      keepRate: Double): DataFrame = {
    require(keepRate > 0.0 && keepRate <= 1.0, "keepRate must be in (0,1]")
    val scored = df.select(col(idCol).as("id"), score.as("score"))
    val hist = scored.groupBy("score").agg(count(lit(1)).as("cnt"))
    val n = hist.agg(sum(col("cnt")).as("n"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist.crossJoin(broadcast(n))
      .withColumn("cum", sum(col("cnt")).over(w))
      .filter(col("cum") >= ceil(lit(keepRate) * col("n")).cast("long"))
      .agg(max(col("score")).as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("id"), col("score"), col("thr"),
        (col("score") >= col("thr")).cast("int").as("keep"))
  }
}
