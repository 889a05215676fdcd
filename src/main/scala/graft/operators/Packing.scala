package graft.operators

import org.apache.spark.sql.{DataFrame, expressions}
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining step that concatenates documents
  * into fixed-token-budget training sequences (context-window filling).
  * A document is assigned to the sequence in which its first token
  * lands: seq = ⌊start_offset ∕ budget⌋ over the bucket's concatenated
  * token stream (document-level packing; an overflowing tail document
  * belongs to the sequence it starts in).
  *
  * Scale design (100 TB): packing does NOT need one global order — the
  * production form packs independently inside deterministic hash
  * buckets, so the only window is `partitionBy(bucket)` (never the
  * unpartitioned-window OOM trap; bucket count chosen ≈ executor
  * parallelism, skew bounded by hash uniformity). Order within a bucket
  * is (rowHash, id) — a pure function of the id like Sampling's
  * membership, so the packing is invariant under file layout,
  * partitioning and cluster size, and reproducible across runs. */
object Packing {

  /** Assign each doc a packed sequence id under `budget` tokens per
    * sequence, `buckets` independent packing streams. Output: one row
    * per doc — (id, bucket, n_tokens, seq_id), seq_id globally unique
    * (in-bucket index interleaved with the bucket). */
  def packTokens(df: DataFrame, idCol: String, textCol: String,
      budget: Long, buckets: Int): DataFrame =
    assign(df, idCol, textCol, budget, buckets)
      .select(col("id"), col("bucket"), col("n_tokens"), col("seq_id"))

  /** MATERIALIZE the packed sequences: one row per sequence with the
    * concatenated text (docs joined in packing order), doc count and
    * token count — the table a training job actually reads. One
    * bucket-partitioned window + one hash aggregate on seq_id; the
    * in-sequence order is re-derived by sorting the collected (h, id,
    * text) structs, so the output is deterministic however the shuffle
    * delivers rows. */
  def packTexts(df: DataFrame, idCol: String, textCol: String,
      budget: Long, buckets: Int): DataFrame =
    assign(df, idCol, textCol, budget, buckets)
      .groupBy(col("seq_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("h"), col("id"), col("text")))),
          e => e.getField("text")), " ").as("seq_text"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))

  /** LENGTH-bucketed sequence packing — the "sorted batching" layout
    * SFT/finetuning pipelines use to cut padding waste: documents pack
    * among similar-length neighbors (bucket = min(maxBucket, n_tokens ∕
    * lenWidth)), so a sequence's underfull tail is bounded by its
    * band's length spread instead of the corpus-wide spread. Inside
    * each band the order is still (hash, id) — deterministic,
    * layout-invariant, the same window/seq_id algebra as [[packTokens]]
    * with the band count as the interleave multiplier. One
    * band-partitioned window; band population is the skew knob
    * (length distributions are heavy-tailed — lenWidth sizes the
    * bands, maxBucket caps the tail band). */
  def packTokensByLength(df: DataFrame, idCol: String, textCol: String,
      budget: Long, lenWidth: Long, maxBucket: Int): DataFrame = {
    require(budget >= 1 && lenWidth >= 1 && maxBucket >= 0,
      "need budget/lenWidth >= 1 and maxBucket >= 0")
    val w = expressions.Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("id"))
    df.select(col(idCol).as("id"),
        Sampling.rowHash(col(idCol)).as("h"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        least(lit(maxBucket.toLong), expr(s"n_tokens DIV $lenWidth")))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id",
        expr(s"(cum - n_tokens) DIV $budget") * (maxBucket + 1) + col("bucket"))
      .select(col("id"), col("bucket"), col("n_tokens"), col("seq_id"))
  }

  /** Packing-efficiency audit over [[packTexts]] output — the fill-rate
    * histogram a training-infra team watches (underfull sequences waste
    * context window; the per-bucket tail sequence is underfull by
    * construction, and an overflowing tail document pushes its sequence
    * past 10∕10): sequences bucketed by fill decile (n_tokens·10 ∕
    * budget, capped at `maxDecile` for the overflow tail), with
    * sequence/doc/token mass per decile. ONE bounded hash agg. */
  def fillStats(packed: DataFrame, budget: Long,
      maxDecile: Int = 15): DataFrame = {
    require(budget >= 1, "budget must be positive")
    packed
      .withColumn("fill_decile",
        least(expr(s"n_tokens * 10 DIV $budget"), lit(maxDecile.toLong)))
      .groupBy("fill_decile")
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
  }

  private def assign(df: DataFrame, idCol: String, textCol: String,
      budget: Long, buckets: Int): DataFrame = {
    require(budget >= 1 && buckets >= 1, s"need budget/buckets >= 1")
    val w = expressions.Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("id"))
    df.select(col(idCol).as("id"),
        Sampling.rowHash(col(idCol)).as("h"),
        col(textCol).as("text"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", (col("h") % buckets).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // seq_id = in-bucket sequence index interleaved with the bucket
      // (idx·buckets + bucket): injective for ANY number of sequences per
      // bucket — a fixed bucket multiplier would collide once a bucket
      // exceeds it, which a corpus-scale stream eventually does
      .withColumn("seq_id",
        expr(s"(cum - n_tokens) DIV $budget") * buckets + col("bucket"))
  }
}
