package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge learning — tokenizer-training step 2 (step 1, the corpus
  * vocabulary, is `TextAnalysis.vocab`). Classic Sennrich-style greedy
  * pair merging (Sennrich et al. 2016), here over the WORD sequence
  * (learned merges are multi-word tokens — the phrase-BPE variant), as
  * iterative Spark plans:
  *
  * per round: (1) count adjacent symbol pairs — explode + hash agg with
  * full map-side combine, the shuffle bounded by the DISTINCT pair set,
  * not the corpus; (2) pick the most frequent pair — a 1-row
  * TakeOrdered with a total tie-break (count desc, left, right); (3)
  * rewrite the corpus — one pure projection applying the merge.
  *
  * This is exactly how distributed BPE trainers iterate (a corpus pass
  * per merge; production trainers batch top-N compatible merges per
  * pass — same plan shape, fewer rounds). State between rounds is
  * localCheckpoint'd: K rounds must cost K plans, not one 2^K plan.
  *
  * Merge application semantics (disclosed, engine-mirrored): the pair
  * `a b` is replaced by `a_b` via TWO passes of non-overlapping
  * left-to-right literal string replacement over the space-joined
  * symbols. Two passes re-catch the occurrence a single pass misses
  * when matches share a delimiter space (`x a b a b`); an unbroken run
  * of 3+ identical pairs can still differ from a strict leftmost-greedy
  * tokenizer — on natural corpora this is vanishingly rare, and both
  * engines compute the IDENTICAL result by construction. */
object Bpe {

  /** THE merge-application contract (engine-mirrored): two passes of
    * non-overlapping literal replacement of " l r " with " l_r " over a
    * space-padded symbol string. Single definition — learnMerges,
    * learnMergesBatched and applyMerges must never drift apart on the
    * padding, pass count or joiner. `c` must already carry the leading
    * and trailing pad space. */
  private def applyMergePadded(c: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column = {
    val pat = lit(s" $l $r ")
    val rep = lit(s" ${l}_$r ")
    replace(replace(c, pat, rep), pat, rep)
  }

  /** Learn `rounds` merges from `df.textCol`; returns one row per merge:
    * (rank, left, right, cnt) in learning order. */
  def learnMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = df.sparkSession
    var state = df.select(col(textCol).as("s")).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val ws = split(col("s"), " ")
      val top = state
        .select(explode(zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) return result(spark, merges.result())
      val (l, rr, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((r, l, rr, cnt))
      state = state
        .select(trim(applyMergePadded(
          concat(lit(" "), col("s"), lit(" ")), l, rr)).as("s"))
        .localCheckpoint(true)
    }
    result(spark, merges.result())
  }

  /** Batched merge learning — the 100 TB path: each corpus pass learns
    * up to `perRound` merges instead of one, so M merges cost ~M∕N
    * passes. A batch must be order-independent to apply in one rewrite,
    * so it keeps only SYMBOL-DISJOINT pairs, selected by a
    * non-recursive rule both engines can express: rank candidates by
    * (count desc, left, right); a pair is kept iff NO higher-ranked
    * CANDIDATE (kept or not) shares a symbol with it. (Stricter than
    * greedy-vs-kept-only — it may select fewer merges per pass — but it
    * is deterministic, engine-mirrorable, and still sound.) Merge
    * application then stacks the batch's two-pass replaces in rank
    * order. Emits (round, rank, left, right, cnt). */
  def learnMergesBatched(df: DataFrame, textCol: String, rounds: Int,
      perRound: Int): DataFrame = {
    require(rounds >= 1 && perRound >= 1, "rounds/perRound must be >= 1")
    val spark = df.sparkSession
    var state = df.select(col(textCol).as("s")).localCheckpoint(true)
    val out = Seq.newBuilder[(Int, Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val ws = split(col("s"), " ")
      // top candidates: perRound is the KEEP budget; examine a deeper
      // pool so disjointness filtering can still fill the batch
      val pool = state
        .select(explode(zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(perRound * 4).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (pool.isEmpty) return resultBatched(spark, out.result())
      // kept iff disjoint from EVERY higher-ranked candidate
      val kept = pool.zipWithIndex.filter { case ((l, r, _), i) =>
        pool.take(i).forall { case (l2, r2, _) =>
          l != l2 && l != r2 && r != l2 && r != r2 }
      }.map(_._1).take(perRound)
      kept.zipWithIndex.foreach { case ((l, r, c), i) =>
        out += ((round, i + 1, l, r, c)) }
      val rewritten = kept.foldLeft(concat(lit(" "), col("s"), lit(" "))) {
        case (acc, (l, r, _)) => applyMergePadded(acc, l, r)
      }
      state = state.select(trim(rewritten).as("s")).localCheckpoint(true)
    }
    resultBatched(spark, out.result())
  }

  private def resultBatched(spark: SparkSession,
      ms: Seq[(Int, Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    ms.toDF("round", "rank", "left", "right", "cnt")
  }

  /** Apply a learned merge table to a corpus — the inference half (the
    * tokenizer's encode step for the merge phase): the K merges unfold
    * into K stacked two-pass replaces, one pure projection over the
    * corpus — zero shuffle, zero state; the merge table is part of the
    * plan like [[Mixture.importanceScore]]'s weight table. Emits the
    * rewritten text plus the resulting token count. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val rewritten = merges.foldLeft(concat(lit(" "), col(textCol), lit(" "))) {
      case (acc, (l, r)) => applyMergePadded(acc, l, r)
    }
    df.select(col(idCol).as("id"), trim(rewritten).as("text"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
  }

  private def result(spark: SparkSession,
      ms: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    ms.toDF("rank", "left", "right", "cnt")
  }
}
