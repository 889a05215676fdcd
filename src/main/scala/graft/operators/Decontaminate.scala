package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions.{word_hashes, ngram_hashes}

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with a held-out evaluation set (the published
  * train/test-overlap check — GPT-3 appendix C, Gopher §A.8 — uses
  * 8–13-gram collisions; default n = 8).
  *
  * Scale design (100 TB corpus, MB-scale benchmark):
  *  - the eval side is tiny by construction (benchmark suites are a few
  *    thousand documents), so its distinct gram set broadcasts and the
  *    corpus-side probe is a broadcast hash join — the 100 TB training
  *    side is scanned ONCE, never shuffled on grams;
  *  - per-doc grams are computed in one codegen'd projection
  *    ([[graft.functions.HashExpressions.NgramHashArray]]) and
  *    de-duplicated per document BEFORE the explode, so a doc repeating
  *    one boilerplate gram contributes a single probe row;
  *  - the only shuffle is the final per-doc hit-count aggregate, which
  *    carries only the (rare) contaminated rows after map-side partials;
  *  - [[contaminatedBloom]] is the even-bigger-benchmark variant: a
  *    Bloom filter over the eval grams prefilters the exploded corpus
  *    grams (a compact bitset where the exact gram set would strain the
  *    broadcast budget), and the surviving sliver — false positives
  *    included — is verified by an exact equi-join, so the result is
  *    bit-identical to [[contaminated]].
  */
object Decontaminate {

  private def gramSets(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      array_distinct(ngram_hashes(word_hashes(col(textCol)), n)).as("gs"))

  /** (id, g) rows — one per DISTINCT n-gram per doc. The single gram
    * convention shared by the batch paths and the streaming twin
    * ([[graft.streaming.StreamOps.decontamOnce]]). */
  private[graft] def explodedGrams(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    gramSets(df, idCol, textCol, n)
      .select(col("id"), explode(col("gs")).as("g"))

  /** Training docs (`!evalPred`) sharing ≥1 word n-gram with the eval
    * docs (`evalPred`), with the count of distinct shared grams.
    * `evalPred` receives the id column. */
  def contaminated(df: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int = 8): DataFrame = {
    val grams = explodedGrams(df, idCol, textCol, n)
    val ev = grams.filter(evalPred(col("id"))).select(col("g")).distinct()
    val tr = grams.filter(!evalPred(col("id")))
    tr.join(broadcast(ev), "g")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
  }

  /** Per-eval-document contamination RATE — the audit twin of
    * [[contaminated]]: instead of flagging training docs, report for
    * every EVAL document what fraction of its distinct word n-grams
    * appears anywhere in the training corpus (the per-example
    * benchmark-contamination statistic WIMBD (Elazar et al. 2024 §5)
    * and the GPT-4/PaLM contamination appendices report — an eval
    * example is then "dirty" above a rate threshold, not on any single
    * collision). Emits (id, n_grams, n_hit, rate) for every eval doc,
    * rate = n_hit∕n_grams as one exact BIGINT division.
    *
    * Scale: the eval side is tiny by construction, so its (id, gram)
    * pairs BROADCAST and the 100 TB corpus is scanned once, never
    * shuffled on grams — corpus grams probe the broadcast map and only
    * HITS survive to the (id, g)-distinct + per-id count (both bounded
    * by |eval grams|, not the corpus). Mirrors [[contaminated]]'s join
    * orientation exactly; a gram shared by many training docs collapses
    * in the distinct's map-side partials. */
  def contaminationRate(df: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int = 8): DataFrame = {
    val grams = explodedGrams(df, idCol, textCol, n)
    val ev = grams.filter(evalPred(col("id")))
    val tr = grams.filter(!evalPred(col("id"))).select(col("g"))
    val hits = tr.join(broadcast(ev.select(col("id").as("eid"), col("g"))), "g")
      .select(col("eid"), col("g")).distinct()
      .groupBy("eid").agg(count(lit(1)).as("n_hit"))
    ev.groupBy("id").agg(count(lit(1)).as("n_grams"))
      .join(hits, col("id") === col("eid"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / col("n_grams")).as("rate"))
  }

  /** Same result as [[contaminated]], via a Bloom prefilter on the
    * corpus side followed by an exact verify join. The verify join is
    * deliberately NOT broadcast: this is the shape for an eval gram set
    * too large to broadcast as a hash map — the bitset ships to every
    * task, the exact set only meets the few surviving candidates in a
    * (tiny) shuffle. FPP only adds verify-join probes, never rows. */
  def contaminatedBloom(df: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val grams = explodedGrams(df, idCol, textCol, n)
    // materialized (lazy localCheckpoint): the eval gram set is consumed
    // THREE times (count sizes the filter, bloomFilter aggregates it,
    // the verify join probes it) and this method exists for the
    // big-benchmark case where re-running the eval scan+distinct per use
    // is exactly the waste to avoid; the verify join's strategy is the
    // explicit shuffle_hash hint below (no AQE decision reads this
    // frame's stats), and checkpoint blocks are ContextCleaner-reclaimed
    // instead of accumulating in the CacheManager (see graft.core.Caches)
    val ev = grams.filter(evalPred(col("id")))
      .select(col("g")).distinct().localCheckpoint(eager = false)
    // Two driver actions on the SMALL side only — the corpus side stays
    // lazy.
    val nEval = math.max(ev.count(), 1L)
    val bloom = ev.stat.bloomFilter("g", nEval, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((g: Long) => bc.value.mightContainLong(g))
    val tr = grams.filter(!evalPred(col("id")))
      .filter(might(col("g")))
    tr.join(ev.hint("shuffle_hash"), "g")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
  }
}
