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

  /** Content-DEFINED chunking — the Rabin-fingerprint boundary rule data
    * lakes and dedup stores use (LBFS/FastCDC lineage) re-expressed over
    * word n-gram hashes: a chunk boundary falls AFTER token t whenever
    * the hash of the n-gram ENDING at t is ≡ 0 (mod `modK`). Boundaries
    * are a pure function of local content, so an insertion early in a
    * document shifts only the chunk it lands in — every later chunk
    * keeps its identity (hash), which is exactly what makes chunk-level
    * dedup of near-identical documents work where fixed-window chunking
    * ([[chunk]]) re-keys everything after the edit. Expected chunk
    * length ≈ modK tokens (geometric); this is the classic STATELESS
    * form — no min/max chunk clamps, which would need a sequential scan
    * state (the FastCDC refinement), so boundaries stay local and the
    * whole pass stays one projection.
    *
    * Emits (id, chunk_idx, tok_from, tok_to, n_tokens, chunk_hash,
    * chunk_text); chunk_hash is the position-weighted fingerprint of the
    * chunk's word hashes ([[graft.functions.MirrorHash.fingerprint]]) —
    * a mod-P (~2³⁰) identity, fine for dedup STATISTICS and
    * candidate generation ([[cdcDedupStats]]), not for destructive
    * deletion (see Dedup.dupSpans' wide hash for that distinction).
    *
    * Scale: gram hashes, boundary positions, and chunk slices are all
    * HOFs over the one tokenized array — zero shuffle, pipelines inside
    * the scan like [[chunk]]. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      n: Int, modK: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    require(modK >= 2, "modK must be at least 2")
    // each lambda-bearing stage is projected ONCE and later stages read
    // the attribute (see cleanLines for the NamedLambdaVariable-sharing
    // and re-evaluation hazards of nesting lambda Columns)
    val s1 = df.select(col(idCol).as("id"),
      split(col(textCol), " ").as("ws"),
      graft.functions.HashExpressions.word_hashes(col(textCol)).as("whs"))
    val s2 = s1.withColumn("gs",
      graft.functions.HashExpressions.ngram_hashes(col("whs"), n))
    // cut after token t (t ∈ [n, T-1]; a cut at T duplicates the end
    // bound) iff the gram ending at t — gram index t-n+1 — hits 0 mod K
    val gs = col("gs")
    val s3 = s2.withColumn("cuts",
      when(size(col("ws")) >= n + 1,
        filter(sequence(lit(n), size(col("ws")) - 1),
          t => pmod(element_at(gs, t - (n - 1)), lit(modK.toLong)) === 0L))
        .otherwise(array().cast("array<int>")))
    val s4 = s3.withColumn("bnds",
      concat(array(lit(0)), col("cuts"), array(size(col("ws")))))
    val from = element_at(col("bnds"), col("ci") + 1)
    val to = element_at(col("bnds"), col("ci") + 2)
    s4.select(col("id"), col("ws"), col("whs"), col("bnds"),
        posexplode(sequence(lit(0), size(col("bnds")) - 2)).as(Seq("__i", "ci")))
      .select(col("id"), col("ci").cast("long").as("chunk_idx"),
        from.cast("long").as("tok_from"),
        to.cast("long").as("tok_to"),
        (to - from).cast("long").as("n_tokens"),
        graft.functions.MirrorHash.fingerprint(
          slice(col("whs"), from + 1, to - from)).as("chunk_hash"),
        array_join(slice(col("ws"), from + 1, to - from), " ").as("chunk_text"))
  }

  /** Chunk-level dedup audit over [[cdcChunks]]: global occurrence count
    * per chunk_hash (hash agg, full map-side combine — a boilerplate
    * chunk collapses per map task), marked back onto each document by an
    * equi-join, re-aggregated to per-doc (n_chunks, dup_chunks,
    * dup_frac) where dup_chunks counts this doc's chunks whose hash
    * occurs ≥2 times corpus-wide. The chunk-granular complement of
    * Dedup.paragraphs: finds shared spans between near-identical
    * documents without any alignment. */
  def cdcDedupStats(chunks: DataFrame): DataFrame = {
    val cnt = chunks.groupBy("chunk_hash").agg(count(lit(1)).as("c"))
    chunks.select(col("id"), col("chunk_hash"))
      .join(cnt, "chunk_hash")
      .groupBy("id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup_chunks"))
      .withColumn("dup_frac",
        col("dup_chunks") / col("n_chunks"))
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
