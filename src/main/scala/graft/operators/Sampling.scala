package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling for training pipelines:
  * reproducible subsets, train/val/test splits and stratified draws at
  * 100 TB — all PURE FILTERS over a row-id hash.
  *
  * Why not `df.sample()` / `sampleBy()`: Spark's samplers are seeded per
  * PARTITION, so the selected set changes with partitioning, file
  * layout, and AQE decisions — a re-run of the "same" 1% draw on a
  * recompacted table yields different rows. Membership here is a pure
  * function of the row id: stable across runs, engines, cluster sizes
  * and table layouts (the property a train/val split must have — a row
  * must never migrate from val to train when files compact).
  *
  * Plan shape: one codegen'd arithmetic filter — no shuffle, no state;
  * composes with scan pruning. The hash is the repo's standard two-round
  * multiplicative form with a modular-squaring middle step (see
  * [[graft.functions.PlaneHash]]) — every intermediate BIGINT-safe, so
  * the DuckDB oracle mirrors membership bit-for-bit. The final multiplier
  * differs from the IVF seed hash so sampling decisions are decorrelated
  * from quantizer seeding.
  */
object Sampling {

  val M: Long = graft.functions.PlaneHash.M // 2^31 − 1 (prime)

  /** Uniform hash of a row id into [0, M): h2(h1(id)²) with h1, h2
    * multiplicative rounds mod M. Reduce mod M BEFORE multiplying —
    * (M−1)·3266489917 ≈ 7.0e18 fits signed 64-bit, a raw 64-bit id
    * would overflow (ANSI throw vs DuckDB range error). */
  def rowHash(id: Column): Column = {
    val h1 = id % M * 2654435761L % M
    h1 * h1 % M * 3266489917L % M
  }

  /** Driver-side mirror of [[rowHash]] (specs recompute memberships and
    * packing orders locally against it). */
  def rowHashLong(id: Long): Long = {
    val h1 = id % M * 2654435761L % M
    h1 * h1 % M * 3266489917L % M
  }

  /** DuckDB mirror of [[rowHash]]. */
  def rowHashSql(id: String): String = {
    val h1 = s"((($id)%$M)*2654435761)%$M"
    s"(($h1)*($h1))%$M*3266489917%$M"
  }

  /** Hash threshold selecting a `fraction` share of [0, M). */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    math.floor(fraction * M).toLong
  }

  /** Deterministic `fraction` sample: rows with hash(id) < fraction·M.
    * Reproducible membership — the same id is always in or always out. */
  def deterministic(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(rowHash(col(idCol)) < threshold(fraction))

  /** Reproducible split labels by consecutive hash ranges: `weights`
    * (summing to 1) and `labels` of equal length; every row gets exactly
    * one label — disjoint and exhaustive by construction. */
  def split(df: DataFrame, idCol: String, weights: Seq[Double],
      labels: Seq[String], out: String = "split"): DataFrame = {
    require(weights.length == labels.length && weights.nonEmpty,
      "weights and labels must align")
    require(math.abs(weights.sum - 1.0) < 1e-9, s"weights sum ${weights.sum} != 1")
    val cuts = weights.scanLeft(0.0)(_ + _).tail.map(threshold) // cumulative
    val h = rowHash(col(idCol))
    // last bucket catches the remainder so coverage is exhaustive even
    // with floor rounding on the cuts
    val expr0 = labels.init.zip(cuts.init).foldRight(lit(labels.last)) {
      case ((lbl, cut), rest) => when(h < cut, lbl).otherwise(rest)
    }
    df.withColumn(out, expr0)
  }

  /** Deterministic WEIGHTED Bernoulli sample: row kept iff
    * hash(id) < w·M, where w ∈ [0,1] is a per-row keep probability
    * (quality-proportional retention — e.g. SoftDedup-style weights or a
    * classifier score used as a sampling rate instead of a loss weight).
    * Membership is still a pure function of (id, w): reproducible across
    * runs, layouts and engines, and MONOTONE in w — raising a document's
    * weight can only add it, never evict it (the property a curriculum
    * of progressively looser quality cuts needs). Plan: one codegen'd
    * arithmetic filter, no shuffle, no state. The comparison is done in
    * doubles (w·M is one IEEE multiply both engines round identically). */
  def weighted(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(rowHash(col(idCol)).cast("double") < weight * M)

  /** Deterministic EXACT-k sample: the k rows with the smallest id hash
    * (id as tiebreak). The hash order is a fixed uniform permutation of
    * the ids, so the selected set is reproducible across runs, layouts
    * and engines — and growing k only ADDS rows (prefix property), the
    * analog of extending a sample without resampling. Plan: one
    * TakeOrderedAndProject (per-partition top-k + merge) — no full sort,
    * no shuffle of unselected rows. */
  def deterministicK(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(rowHash(col(idCol)), col(idCol)).limit(k)

  /** Per-stratum deterministic EXACT-k sample — the balanced-eval-set
    * draw (k docs per language/source/domain regardless of stratum
    * size): within each stratum, the k rows with the smallest (hash(id),
    * id). Same reproducibility and prefix-monotonicity as
    * [[deterministicK]], per stratum — growing k only ADDS rows, and a
    * stratum with fewer than k rows contributes all of them. Plan: one
    * window rank partitioned by the stratum (hash order, never a global
    * sort); stratum cardinality bounds the partition, the usual skew
    * disclosure for per-group top-k applies. */
  def stratifiedK(df: DataFrame, idCol: String, strataCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(rowHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-key quota — domain balancing for web corpora ("no domain
    * contributes more than `cap` docs"): within each key, keep the top
    * `cap` rows by the given priority columns (quality-first order,
    * caller-supplied; append the id for a total order). The standard
    * defense against a handful of template-heavy domains dominating a
    * crawl. Plan: one window rank partitioned by the key — key
    * cardinality bounds the partition, the usual per-group-top-k skew
    * disclosure applies (a pathological single domain is exactly what
    * the cap exists to bound, and its partition is capped reading too:
    * rank short-circuits at cap only after the sort, so a truly
    * degenerate hot key wants the salted two-phase variant). Keeps the
    * rank as `key_rank` for audit. */
  def capPerKey(df: DataFrame, keyCol: String, priority: Seq[Column],
      cap: Int): DataFrame = {
    require(cap >= 1, "cap must be positive")
    require(priority.nonEmpty, "need a priority order (append the id for totality)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(priority: _*)
    df.withColumn("key_rank", row_number().over(w).cast("long"))
      .filter(col("key_rank") <= cap)
  }

  /** Per-stratum rank quantile — cross-source score calibration: raw
    * quality scores are not comparable across sources (different
    * scales, different score models), but each doc's RANK within its
    * source is. Emits q = (rank − 1)∕(n − 1) ∈ [0, 1] per stratum
    * (q = 0 for a 1-row stratum), ranks ascending by (`valueCol`, id) —
    * a total order, so q is reproducible and the only IEEE op is the
    * final division of exact BIGINTs. Selecting q ≥ 0.75 everywhere
    * then takes each source's own top quartile — quantile-matched
    * sampling. Plan: one window per stratum + a 1-per-stratum count
    * carried by the same window (no second shuffle). */
  def strataQuantile(df: DataFrame, idCol: String, strataCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(valueCol), col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("q",
        when(col("__n") === 1L, lit(0.0))
          .otherwise((col("__rn") - 1L).cast("double")
            / (col("__n") - 1L).cast("double")))
      .drop("__rn", "__n")
  }

  /** Deterministic corpus shuffle — the "global shuffle before packing/
    * training" step every LLM data pipeline runs: a pseudo-random but
    * REPRODUCIBLE permutation, realized as ORDER BY (hash(id), id) with
    * the hash emitted as `shuffle_key`. The permutation is a pure
    * function of the id set — invariant under partitioning, file layout
    * and cluster size (per-partition-seeded `df.orderBy(rand())` is
    * none of these). Plan: one range-partitioned sort — the canonical
    * distributed total order, no single-task collapse; downstream
    * writers keep the order per output partition. */
  def shuffleDeterministic(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shuffle_key", rowHash(col(idCol)))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Stratified deterministic sample: a per-stratum fraction (with a
    * default for unlisted strata), membership still a pure function of
    * the row id — strata only pick the threshold. `default = 0.0` means
    * an unlisted stratum contributes NOTHING (threshold 0 excludes every
    * hash), not "pass through" — pass `default = 1.0` to keep unlisted
    * strata whole. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val h = rowHash(col(idCol))
    val thr = fractions.toSeq.sortBy(_._1).foldRight(lit(threshold(default))) {
      case ((k, f), rest) => when(col(strataCol) === k, lit(threshold(f))).otherwise(rest)
    }
    df.filter(h < thr)
  }
}
