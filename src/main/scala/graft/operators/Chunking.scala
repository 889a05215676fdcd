package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split each document
  * into fixed-size token windows with overlap — the standard
  * pretokenization shape for LLM pretraining / embedding corpora
  * (context-window-sized pieces, overlap so no boundary context is
  * lost).
  *
  * Declarative plan: one projection computes the chunk count from the
  * token count (pure integer arithmetic, mirrored exactly by the DuckDB
  * oracle), `posexplode(sequence(...))` fans each document out to its
  * chunk indices, and each chunk's text is a `slice + array_join` over
  * the one tokenized array. No shuffle at all — chunking is
  * embarrassingly parallel, and at 100 TB it pipelines inside the scan
  * stage (WholeStageCodegen straight off the parquet reader).
  *
  * Chunk-count contract (window W, stride S = W - overlap):
  * `n ≤ W → 1` chunk, else `⌈(n - W) / S⌉ + 1` — every token is in ≥1
  * chunk, consecutive chunks share exactly `overlap` tokens, and the
  * last chunk is the only one allowed to be short.
  */
object Chunking {

  /** Token-window chunks: one output row per (doc, chunk_idx) with the
    * chunk text, its token count, and the token span [tok_from, tok_to)
    * in the source document. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    val ws = split(col(textCol), " ")
    // ⌈(n-W)/S⌉ + 1 in exact integer arithmetic: (n - W + S - 1) div S + 1
    val nChunks = when(col("__n") <= window, lit(1L))
      .otherwise(expr(s"(__n - $window + ${stride - 1}) div $stride") + 1L)
    df.select(col(idCol).as("id"), ws.as("__ws"), size(ws).cast("long").as("__n"))
      .withColumn("__nc", nChunks)
      .select(col("id"), col("__ws"), col("__n"),
        posexplode(sequence(lit(0L), col("__nc") - 1L)).as(Seq("__i", "ci")))
      .select(
        col("id"),
        col("ci").as("chunk_idx"),
        array_join(slice(col("__ws"), (col("ci") * stride + 1L).cast("int"),
          lit(window)), " ").as("chunk_text"),
        size(slice(col("__ws"), (col("ci") * stride + 1L).cast("int"),
          lit(window))).cast("long").as("n_tokens"),
        (col("ci") * stride).as("tok_from"),
        least(col("ci") * stride + window, col("__n")).as("tok_to"))
  }

  /** DuckDB mirror of [[chunk]] over the `documents` table — same
    * integer chunk-count arithmetic, same 1-based slice bounds. */
  def chunkSql(window: Int, overlap: Int): String = {
    val stride = window - overlap
    s"""WITH w AS (SELECT doc_id AS id, string_split(text, ' ') AS ws FROM documents),
       |c AS (SELECT id, ws, CAST(len(ws) AS BIGINT) AS n,
       |  CASE WHEN len(ws) <= $window THEN 1
       |       ELSE (CAST(len(ws) AS BIGINT) - $window + ${stride - 1}) // $stride + 1
       |  END AS nc FROM w)
       |SELECT id, i AS chunk_idx,
       |  array_to_string(ws[CAST(i*$stride+1 AS INT) : CAST(i*$stride+$window AS INT)], ' ') AS chunk_text,
       |  CAST(len(ws[CAST(i*$stride+1 AS INT) : CAST(i*$stride+$window AS INT)]) AS BIGINT) AS n_tokens,
       |  i*$stride AS tok_from, least(i*$stride+$window, n) AS tok_to
       |FROM c, UNNEST(generate_series(0, nc-1)) u(i)
       |ORDER BY id, chunk_idx""".stripMargin
  }
}
