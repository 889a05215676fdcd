package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MirrorHash

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * All pure Catalyst expressions (no UDFs) — codegen-friendly, one
  * projection pass per document, trivially parallel at any scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language ID. Alphabetical language order = deterministic tie-break. */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "y", "de", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  private def words(text: Column): Column = split(text, " ")

  private def countIn(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(list))).cast("long")

  /** Token counts: whitespace tokens and regex ("BPE-ish") tokens. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      size(words(col(textCol))).cast("long").as("n_ws"),
      regexp_count(col(textCol), lit("[a-z]+|[0-9]+")).cast("long").as("n_re"))

  /** Quality features: word count, distinct ratio, mean word length,
    * stopword ratio. Ratios are BIGINT/BIGINT divisions → identical
    * doubles in any engine. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val n = size(ws).cast("long")
    val totalLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    df.select(col(idCol).as("id"),
      n.as("n_words"),
      (size(array_distinct(ws)).cast("long") / n).as("distinct_ratio"),
      (totalLen / n).as("avg_wlen"),
      (countIn(ws, stopwords) / n).as("stop_ratio"))
  }

  /** Stopword-scored language ID with deterministic alphabetical
    * tie-break. Each language's score is built ONCE into an array of
    * (score, lang) structs and the winner picked by a strict-`>` fold —
    * array order is alphabetical, so the earliest language wins ties and
    * the `und` seed (score 0) wins only when every score is 0: exactly
    * the semantics of the CASE chain the oracle runs. (A naive CASE
    * chain here re-instantiates every score expression ~5×; the expanded
    * tree cost >6s of one-time codegen per fresh JVM.) */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), langIdCol(col(textCol)).as("pred_lang"))

  /** Column form of [[langId]] for single-pass pipeline composition. */
  def langIdCol(text: Column): Column = {
    val ws = words(text)
    val scored = array(langWords.map { case (l, list) =>
      struct(countIn(ws, list).as("s"), lit(l).as("l")) }: _*)
    aggregate(scored,
      struct(lit(0L).as("s"), lit("und").as("l")),
      (acc, e) => when(e.getField("s") > acc.getField("s"), e).otherwise(acc))
      .getField("l")
  }

  /** Column form of the word count for pipeline composition. */
  def nWordsCol(text: Column): Column = size(words(text)).cast("long")

  /** Pattern scrubbing (the PII-redaction step of a curation pipeline):
    * every match of `pattern` replaced by `mask`, with a count of
    * scrubbed spans per document for audit. Pure projection — codegen'd
    * regex, zero shuffle. Keep patterns to the portable regex core
    * (character classes, quantifiers) so external mirrors agree. */
  def redact(df: DataFrame, idCol: String, textCol: String,
      pattern: String, mask: String): DataFrame =
    df.select(col(idCol).as("id"),
      regexp_replace(col(textCol), pattern, mask).as("redacted"),
      regexp_count(col(textCol), lit(pattern)).cast("long").as("n_hits"))

  /** Position-weighted rolling-hash document fingerprint. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      MirrorHash.fingerprint(graft.functions.HashExpressions.word_hashes(col(textCol))).as("fp"))

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 — the MOSS algorithm): 3-word shingle hashes winnowed
    * with window `w` to the per-window leftmost-minimum set, exploded to
    * one row per selected (position, gram-hash). Unlike the global
    * MinHash signature, winnowed fingerprints are LOCAL — any shared
    * word run of ≥ w+2 words between two documents is guaranteed to
    * share a selected hash — so an equi-join on `gh` finds substring-
    * level overlap (plagiarism / quote detection) with expected density
    * 2∕(w+1) of the gram count. The selection runs as one codegen'd
    * O(grams) pass per document ([[graft.functions.HashExpressions.WinnowArray]],
    * monotonic-deque sliding minimum) inside the scan projection: zero
    * shuffle, embarrassingly parallel at any corpus scale, and the
    * downstream join carries only the ~2∕(w+1)-dense fingerprint rows
    * rather than every gram. */
  def winnow(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val he = graft.functions.HashExpressions
    df.select(col(idCol).as("id"),
        explode(he.winnow(he.shingle_hashes(he.word_hashes(col(textCol))), w)).as("__p"))
      .select(col("id"),
        expr(s"__p div ${MirrorHash.P}").as("pos"),
        (col("__p") % MirrorHash.P).as("gh"))
  }

  /** Corpus vocabulary: top-k tokens by frequency (the first step of any
    * tokenizer/BPE training run). Explode pipelines inside the scan stage;
    * the hash aggregate does map-side partials so the shuffle carries one
    * row per distinct token per partition; top-k is
    * TakeOrderedAndProject — no global sort. */
  def vocab(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)

  /** Out-of-vocabulary rate per group — the tokenizer-coverage audit a
    * mixture designer runs per source/language before fixing a vocab
    * (a source whose tokens fall outside the shared top-k vocabulary
    * will fragment into byte-level pieces and quietly eat the token
    * budget). The closed set is the corpus [[vocab]] top-k ((count
    * DESC, token) tie-break, deterministic); per group the rate is one
    * IEEE division over exact BIGINT counts.
    *
    * Scale: vocab is a TakeOrdered over map-side-combined counts and
    * broadcasts (k rows); the token stream joins it map-side and
    * aggregates partially — the corpus shuffles once, by group key. */
  def oovRate(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(col(groupCol), explode(words(col(textCol))).as("token"))
    val voc = vocab(df, textCol, k).select(col("token"), lit(1L).as("__in"))
    toks.join(broadcast(voc), Seq("token"), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, lit(1L)).otherwise(lit(0L))).as("n_oov"))
      .select(col(groupCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** EXACT corpus heavy hitters in two passes — every token whose count
    * is ≥ ⌈n∕share⌉ with its exact count, without ever shuffling the
    * full distinct-token frame (the WIMBD/vocab shape shuffles one row
    * per distinct token per partition; at web scale the token
    * vocabulary is billions of rows of long-tail noise).
    *
    * Pass 1 runs a Misra-Gries summary (Misra & Gries 1982; merge bound
    * per Agarwal et al., PODS 2012) with `counters` slots per partition
    * in one mapPartitions scan (bounded state, amortized O(1) per token
    * — each decrement retires counters+1 count units, so total decrement
    * work is O(n)). Each partition also emits its token total as a
    * null-token sentinel row, so one scan yields both the candidate
    * summaries and n. Plain summation of per-partition summaries keeps
    * the MG guarantee: each partition undercounts any token by at most
    * n_i∕(counters+1), so the summed undercount is < n∕(counters+1) —
    * any token with true count ≥ ⌈n∕share⌉ > n∕(counters+1) (enforced:
    * counters ≥ share) survives with a positive summed count. Candidates
    * are therefore a guaranteed SUPERSET of the answer, at most
    * partitions×counters rows.
    *
    * Pass 2 broadcast-semi-joins the token stream against the candidate
    * set and exact-counts only those tokens (map-side partial combine
    * collapses the hot tokens per partition, so the shuffle is ≤
    * |candidates| rows per partition). The output is EXACT and
    * partition-layout-invariant even though the intermediate summaries
    * are not — mapPartitions is justified here as genuine bounded-state
    * per-partition imperative logic (the same clause as Multimodal's
    * codec pipelining). */
  def heavyHitters(df: DataFrame, textCol: String, counters: Int,
      share: Int): DataFrame = {
    require(counters >= share,
      s"need counters >= share for the MG superset guarantee ($counters < $share)")
    val summary = mgSummary(df, textCol, counters).localCheckpoint(eager = false)
    val n = summary.filter(col("token").isNull)
      .agg(sum(col("c")).as("n"))
    val cands = summary.filter(col("token").isNotNull).select("token").distinct()
    exactOverCandidates(df, textCol, cands, n, share)
  }

  /** Pass 1 of [[heavyHitters]]: one mapPartitions scan emitting each
    * partition's Misra-Gries summary rows (token, mgCount) plus a
    * null-token sentinel carrying the partition's token total. The
    * shared [[mgUpdate]] fold is also the streaming twin's state
    * transition — one definition, the twins cannot drift. */
  def mgSummary(df: DataFrame, textCol: String, counters: Int): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    df.select(col(textCol).cast("string")).as[String].mapPartitions { it =>
      val mg = new java.util.HashMap[String, Long](counters * 2)
      var nTok = 0L
      it.foreach { text => nTok += mgUpdate(mg, counters, text) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Long)]
      out += ((None, nTok)) // null-token sentinel: this partition's token total
      mg.forEach((k, v) => out += ((Some(k), v)))
      out.iterator
    }.toDF("token", "c")
  }

  /** Fold one document into a Misra-Gries summary (Misra & Gries 1982);
    * returns the number of tokens consumed. Tokenization matches
    * `split(text, ' ')` limit −1 exactly (keeps empties, incl. the
    * single "" token of an empty document). The decrement-all step
    * retires counters+1 count units, so total decrement work is O(n). */
  def mgUpdate(mg: java.util.HashMap[String, Long], counters: Int,
      text: String): Long = {
    var nTok = 0L
    if (text != null) {
      var from = 0
      while (from <= text.length) {
        val sp = text.indexOf(' ', from)
        val end = if (sp < 0) text.length else sp
        val tok = text.substring(from, end)
        nTok += 1
        val cur = mg.getOrDefault(tok, 0L)
        if (cur > 0L) mg.put(tok, cur + 1L) // stored counts are always >= 1
        else if (mg.size < counters) mg.put(tok, 1L)
        else {
          val e = mg.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
        from = end + 1
      }
    }
    nTok
  }

  /** Pass 2 of [[heavyHitters]] (shared with the streaming twin): exact
    * counts of the broadcast candidate set only, thresholded at
    * ⌈n∕share⌉ from the 1-row `nDf` total. Output is exact and
    * independent of HOW the candidate superset was produced. */
  def exactOverCandidates(df: DataFrame, textCol: String, cands: DataFrame,
      nDf: DataFrame, share: Int): DataFrame = {
    // ceil(n/share) in INTEGER arithmetic (Column./ is IEEE division);
    // both operands positive, so Spark `div` == DuckDB `//`
    val thresh = nDf.select(expr(s"(n + ${share - 1}) div $share").as("t"))
    df.select(explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(thresh))
      .filter(col("c") >= col("t"))
      .select(col("token"), col("c"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A.1.1, the
    * repetition-removal filters): per document, the share of words taken
    * by the single most frequent word and the fraction of duplicated
    * word bigrams. Both are pure per-row array folds — zero shuffle, the
    * document never leaves its partition, so the pass is embarrassingly
    * parallel at any corpus size. Ratios divide exact BIGINTs → bit-
    * identical doubles in any engine. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = graft.functions.TextExpressions.repetition_stats(words(col(textCol)))
    val n = size(words(col(textCol))).cast("long")
    df.select(col(idCol).as("id"),
      n.as("n_words"),
      (st.getField("top_count") / n).as("top_word_share"),
      when(st.getField("n_bigrams") >= 1,
          lit(1.0) - st.getField("n_distinct_bigrams") / st.getField("n_bigrams"))
        .otherwise(lit(0.0)).as("dup_bigram_frac"))
  }

  /** The FULL Gopher repetition profile (Rae et al. 2021 Table A1 —
    * every repetition filter the paper applies): per document, the
    * char fraction held by the single most frequent 2-∕3-∕4-gram and
    * the char fraction covered by duplicated 5-∕6-∕7-∕8-grams, from
    * ONE codegen'd pass ([[graft.functions.TextExpressions.GopherProfile]])
    * — zero shuffle, embarrassingly parallel; fractions are
    * BIGINT∕BIGINT divisions. Completes [[repetition]]'s top-word +
    * dup-bigram pair into the paper's whole suite. */
  def repetitionFull(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val prof = graft.functions.TextExpressions.gopher_profile(words(col(textCol)))
    // explode(array(struct)) is a Generate barrier: CollapseProject
    // cannot inline the profile into its 9 consumers, so the one-pass
    // expression truly runs once per row
    val st = df.select(col(idCol).as("id"),
      explode(array(prof)).as("st"))
    def frac(f: String) =
      when(col("st.n_chars") > 0, col(s"st.$f") / col("st.n_chars"))
        .otherwise(lit(0.0))
    st.select(col("id"), col("st.n_chars").as("n_chars"),
      frac("top2_mass").as("top2_frac"),
      frac("top3_mass").as("top3_frac"),
      frac("top4_mass").as("top4_frac"),
      frac("dup5_mass").as("dup5_frac"),
      frac("dup6_mass").as("dup6_frac"),
      frac("dup7_mass").as("dup7_frac"),
      frac("dup8_mass").as("dup8_frac"))
  }

  /** The composite pretraining quality gate: language, length and both
    * Gopher repetition signals evaluated in ONE projection pass (no
    * self-joins, no shuffle — every signal is a per-row fold), each doc
    * emitted with its signals and the keep verdict. Thresholds are the
    * caller's corpus policy; the shape (tag once, gate once) is the
    * production filter chain every curation pipeline runs first. */
  def qualityGate(df: DataFrame, idCol: String, textCol: String,
      lang: String, minWords: Long, maxTopShare: Double,
      maxDupBigram: Double): DataFrame = {
    val n = size(words(col(textCol))).cast("long")
    val (tws, dbf) = repetitionCols(col(textCol))
    val lg = langIdCol(col(textCol))
    df.select(col(idCol).as("id"), n.as("n_words"),
      tws.as("top_word_share"), dbf.as("dup_bigram_frac"),
      lg.as("pred_lang"),
      qualityGateCol(col(textCol), lang, minWords, maxTopShare, maxDupBigram)
        .cast("int").as("keep"))
  }

  /** (top_word_share, dup_bigram_frac) Column pair for composition. */
  private def repetitionCols(text: Column): (Column, Column) = {
    val st = graft.functions.TextExpressions.repetition_stats(words(text))
    val n = size(words(text)).cast("long")
    val tws = st.getField("top_count") / n
    val dbf = when(st.getField("n_bigrams") >= 1,
        lit(1.0) - st.getField("n_distinct_bigrams") / st.getField("n_bigrams"))
      .otherwise(lit(0.0))
    (tws, dbf)
  }

  /** Boolean Column form of the gate verdict — lets a pipeline FILTER on
    * the gate in place (one projection, zero join), the shape that
    * matters when the corpus is the big side. */
  def qualityGateCol(text: Column, lang: String, minWords: Long,
      maxTopShare: Double, maxDupBigram: Double): Column = {
    val n = size(words(text)).cast("long")
    val (tws, dbf) = repetitionCols(text)
    langIdCol(text) === lang && n >= minWords &&
      tws <= maxTopShare && dbf <= maxDupBigram
  }

  /** HOF formulation of [[repetition]] — the executable specification the
    * native [[graft.functions.TextExpressions.RepetitionStats]] is
    * differentially tested against (DecontaminateSpec). O(n²) interpreted
    * comparisons per row: correct, but not the production path. */
  private[graft] def repetitionSpec(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val n = size(ws).cast("long")
    val topCount = array_max(
      transform(array_distinct(ws), w => size(filter(ws, x => x === w))))
      .cast("long")
    val bg = zip_with(slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1), (a, b) => concat_ws(" ", a, b))
    val nbg = size(bg).cast("long")
    df.select(col(idCol).as("id"),
      n.as("n_words"),
      (topCount / n).as("top_word_share"),
      when(nbg >= 1, lit(1.0) - size(array_distinct(bg)).cast("long") / nbg)
        .otherwise(lit(0.0)).as("dup_bigram_frac"))
  }

  /** Deterministic line segmentation for corpora that arrive as flat
    * word streams (no newlines): regroup the whitespace tokens into
    * `wordsPerLine`-word lines joined by '\n'. Pure projection (HOFs
    * over the token array) — zero shuffle; gives line-level operators
    * ([[cleanLines]], [[Dedup.paragraphs]]) a well-defined line
    * structure on unsegmented text. */
  def segmentLines(df: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int, keep: Seq[String] = Nil): DataFrame = {
    require(wordsPerLine > 0, "wordsPerLine must be positive")
    val ws = words(col(textCol))
    val nLines = ((size(ws) + lit(wordsPerLine - 1)) / lit(wordsPerLine)).cast("int")
    val lines = transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(ws, i * wordsPerLine + 1, lit(wordsPerLine)), " "))
    df.select(col(idCol).as("id") +: array_join(lines, "\n").as("text") +:
      keep.map(col): _*)
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): per
    * document, keep only lines that (a) have at least `minWordsPerLine`
    * words, (b) contain no blacklisted word, (c) — when
    * `requireTerminalPunct` — end in terminal punctuation; then drop
    * duplicate lines within the document (keep-first), and drop the
    * document entirely if fewer than `minLines` lines survive. The whole
    * pass is per-row HOF folds over the line array — zero shuffle, the
    * document never leaves its partition, so it holds at any corpus
    * size. Emits the cleaned text plus kept/dropped line counts. */
  def cleanLines(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3, minLines: Int = 1,
      badWords: Seq[String] = Nil,
      requireTerminalPunct: Boolean = false): DataFrame = {
    val lines = split(col(textCol), "\n")
    val bad = array(badWords.map(lit): _*)
    def ok(l: Column): Column = {
      val lws = split(l, " ")
      val base = size(lws) >= minWordsPerLine &&
        !exists(lws, w => array_contains(bad, w))
      if (requireTerminalPunct) base && l.rlike("[.!?\"']$") else base
    }
    // Each lambda-bearing stage is projected ONCE and later stages read
    // the attribute: (a) nesting/duplicating a lambda-bearing Column
    // shares its NamedLambdaVariable ids and can evaluate inconsistently
    // (observed: size() disagreeing with array_join() over one expr);
    // (b) referencing `filtered` inside the dedup lambda would re-run
    // the content filters once per element — O(L²) per document.
    val filtered = col("__filtered")
    val kept = filter(filtered, (l, i) => array_position(filtered, l) === i + 1)
    df.select(col(idCol).as("id"), size(lines).as("__n_lines_in"),
        filter(lines, ok _).as("__filtered"))
      .select(col("id"), col("__n_lines_in"), kept.as("__kept"))
      .select(col("id"),
        array_join(col("__kept"), "\n").as("text"),
        size(col("__kept")).cast("long").as("n_lines"),
        (col("__n_lines_in") - size(col("__kept"))).cast("long").as("n_dropped"))
      .filter(col("n_lines") >= minLines)
  }

  /** Top-k word bigrams — same plan shape as [[vocab]]; the bigram array
    * is built by zipping the token array with its own tail (pure
    * projection, no second pass over the text). */
  def bigrams(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val ws = words(col(textCol))
    val n = size(ws)
    val bg = zip_with(slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    df.select(explode(bg).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(k)
  }

  /** Corpus-wide most-DUPLICATED word n-grams — the WIMBD corpus
    * statistic (Elazar et al. 2024 report the most-duplicated n-grams of
    * every major pretraining corpus as a first-class audit artifact):
    * textual n-grams occurring ≥2 times, top-k by (count DESC, gram).
    * Generalizes [[vocab]]/[[bigrams]]: the n-gram array is one
    * projection (sequence + slice + concat_ws — no self-join on
    * positions), the hash aggregate takes map-side partials so a
    * boilerplate gram collapses per map task, and top-k is
    * TakeOrderedAndProject — no global sort at any corpus size. */
  def ngramTopK(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 1, "ngram n must be positive")
    val ws = words(col(textCol))
    val grams = when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .orderBy(col("c").desc, col("gram")).limit(k)
  }

  /** Per-source PII exposure audit — the privacy report a curation run
    * files before release (how many documents of each source trip each
    * detector class, and how many raw hits): for every (source,
    * pattern) pair, the count of documents with ≥1 match and the total
    * match count. Patterns are (name, regex) with the same portable
    * regex core as [[redact]] (both engines count non-overlapping
    * matches identically). ONE projection evaluates every pattern per
    * row, the stacked (pattern, hits) rows aggregate with map-side
    * combine — shuffle ≤ |sources|·|patterns| rows, zero joins. */
  def piiStats(df: DataFrame, srcCol: String, textCol: String,
      patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    val hits = array(patterns.map { case (name, p) =>
      struct(lit(name).as("pattern"),
        regexp_count(col(textCol), lit(p)).cast("long").as("h"))
    }: _*)
    df.select(col(srcCol).as("source"), explode(hits).as("ph"))
      .select(col("source"), col("ph.pattern").as("pattern"), col("ph.h").as("h"))
      .groupBy("source", "pattern")
      .agg(sum(when(col("h") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("h")).as("n_hits"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002) —
    * the privacy-release check a curated corpus runs before publishing
    * per-document metadata: every combination of quasi-identifiers
    * (language, source, coarse length bucket, …) must be shared by ≥ k
    * documents, else the combination singles documents out. Emits the
    * full equivalence-class census with an at-risk flag (1 = class size
    * < k), so both the risky classes and the anonymity distribution are
    * in one result. Plan: ONE hash aggregate with map-side combine on
    * the quasi-identifier key — output rows ∝ distinct QI combinations,
    * never corpus-sized; no join, no window. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, "k must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk",
        when(col("n_docs") < k, 1L).otherwise(0L))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the companion
    * check to [[kAnonymity]]: a QI class can be k-anonymous yet leak
    * its members' sensitive value when everyone in it SHARES that
    * value. Per quasi-identifier class: member count, number of
    * DISTINCT sensitive values, and the at-risk flag (diversity < l).
    * One map-side-combined aggregate (count-distinct runs
    * partial+final); output rows ∝ distinct QI classes. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, "l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(sensitiveCol)).as("diversity"))
      .withColumn("at_risk",
        when(col("diversity") < l, 1L).otherwise(0L))
  }

  /** Collocation mining by PMI-ordered lift: adjacent word pairs
    * occurring ≥ `minCount` times, ranked by lift = P(ab)∕(P(a)·P(b))
    * = c_ab·N ∕ (c_a·c_b) with N the corpus bigram total — monotone in
    * PMI (PMI = log lift), so ranking by the lift RATIO avoids the
    * cross-engine log while ordering identically. Every ranked piece
    * (c_ab, c_a, c_b, N) is an exact BIGINT; the only IEEE op is the
    * final ratio division, mirrored verbatim by the oracle.
    *
    * Scale design: bigram and unigram counts are map-side-combined
    * aggregates; the minCount filter shrinks the bigram side BEFORE
    * the two unigram equi-joins (vocab-sized, shuffled — NOT broadcast:
    * at web scale the vocabulary is billions of types); N is a 1-row
    * broadcast; top-k is a TakeOrderedAndProject heap. */
  def collocations(df: DataFrame, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1, "need minCount >= 1 and topK >= 1")
    val toks = df.select(split(col(textCol), " ").as("__ws"))
    val big = toks.filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ws) - 1), i -> " +
          "struct(element_at(__ws, i) AS w1, element_at(__ws, i + 1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = toks.select(explode(col("__ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nBig = big.agg(count(lit(1)).as("n_big"))
    bc.join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(nBig))
      .withColumn("lift",
        (col("c_ab") * col("n_big")).cast("double")
          / (col("c_a") * col("c_b")).cast("double"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** KMV (k-minimum-values) distinct n-gram estimator per source — the
    * corpus-diversity audit statistic ("how many distinct n-grams does
    * each source contribute?") computed WITHOUT a corpus-wide exact
    * distinct: by the classic bottom-k sketch (Bar-Yossef et al. 2002),
    * if h_k is the k-th smallest distinct hash of a uniform [0,P) hash,
    * then D̂ = (k−1)·P∕h_k. Deterministic and engine-mirrorable because
    * the "random" hash is the fixed arithmetic gram hash and the only
    * floating step is one final division of exact BIGINTs.
    *
    * Scale design: a THRESHOLD prefilter (g < P∕invFrac) bounds the
    * candidate set to ≈ D∕invFrac rows per source BEFORE the distinct —
    * the corpus-side explode feeds a filter that discards (invFrac−1)/
    * invFrac of all grams at the map side, the (source, g) distinct +
    * per-source rank then run on the surviving sliver. Correct because
    * survivors < P∕invFrac are exactly the k smallest whenever ≥ k
    * survive; when fewer survive, ALL distinct hashes sit under the
    * threshold and the inverse-probability estimate D̂ = n_low·invFrac
    * applies. Pick invFrac so D∕invFrac ≫ k for real sources (k=32,
    * invFrac=64 here); a per-partition bottom-k pre-aggregation is the
    * further refinement if the sliver itself ever dominates. */
  def distinctKmv(df: DataFrame, srcCol: String, textCol: String,
      n: Int, k: Int, invFrac: Int): DataFrame = {
    require(k >= 2 && invFrac >= 2, "need k >= 2 and invFrac >= 2")
    val P = graft.functions.MirrorHash.P
    val thr = P / invFrac
    val gs = df.select(col(srcCol).as("source"),
        explode(graft.functions.HashExpressions.ngram_hashes(
          graft.functions.HashExpressions.word_hashes(col(textCol)), n)).as("g"))
      .filter(col("g") < thr).distinct()
    val w = Window.partitionBy(col("source")).orderBy(col("g"))
    val agg = gs.withColumn("rn", row_number().over(w))
      .groupBy("source").agg(
        count(lit(1)).as("n_low"),
        max(when(col("rn") === k, col("g"))).as("hk"))
    // spine on DISTINCT sources (one tiny agg): a source whose every
    // gram hash sits above the threshold must still report (n_low = 0,
    // estimate 0) — the audit covers every source, not just survivors
    df.select(col(srcCol).as("source")).distinct()
      .join(agg, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_low"), lit(0L)).as("n_low"), col("hk"),
        when(coalesce(col("n_low"), lit(0L)) >= k,
          lit((k - 1).toDouble * P) / col("hk").cast("double"))
          .otherwise(coalesce(col("n_low"), lit(0L)).cast("double") * invFrac)
          .as("est_distinct"))
  }

  /** Per-source boilerplate line removal — the crawl-curation step CCNet
    * (Wenzek et al. 2020 §4.1, per-shard line dedup) and RefinedWeb run
    * before document dedup: navigation bars, cookie banners, and footer
    * lines repeat across most pages of a source, and keeping them skews
    * every downstream n-gram statistic. A line is BOILERPLATE within a
    * source when it occurs in ≥ `minDf` DISTINCT documents of that
    * source (within-doc repeats count once); boilerplate lines are
    * removed from every document, in-doc order preserved. Emits per doc
    * (id, n_lines, n_kept, clean_text).
    *
    * Scale design ([[Dedup.dupSpans]]' skeleton at line granularity):
    * the (source, id, line)-distinct projection collapses within-doc
    * repeats map-side; document frequency is a (source, line) hash agg
    * with full map-side combine — a nav bar shared by 10⁶ pages of a
    * source collapses per map task before the shuffle, so hot lines
    * cannot skew it; marking is a LEFT-ANTI equi-join of the exploded
    * line frame against the (tiny) boilerplate set; re-assembly is the
    * sort-struct aggregate. No corpus-sized broadcast, no global sort,
    * no per-token quadratic scan. */
  def boilerplate(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, minDf: Int): DataFrame = {
    require(minDf >= 2, "minDf must be at least 2")
    val lines = df.select(col(idCol).as("id"), col(srcCol).as("source"),
      posexplode(split(col(textCol), "\n")).as(Seq("li", "line")))
    val bp = lines.select(col("source"), col("id"), col("line")).distinct()
      .groupBy("source", "line").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("source", "line")
    val kept = lines.join(bp, Seq("source", "line"), "left_anti")
      .groupBy("id").agg(
        count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("li"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
    // a doc whose every line is boilerplate drops out of `kept`; the
    // left join + coalesce restores it with empty clean_text
    df.select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Cross-source n-gram overlap audit (the WIMBD "how much do my
    * sources share?" statistic, Elazar et al. 2024 §4): for every source
    * pair (a < b), the number of DISTINCT word n-gram hashes appearing
    * in both — the corpus-level contamination/duplication map a mixture
    * designer reads before weighting sources. Gram identity is the
    * collision-safe wide hash shared with [[graft.operators.Dedup]].
    *
    * Scale design: one projection + distinct builds the (gram, source)
    * inventory (map-side combine collapses within-source repeats before
    * the shuffle); the pair join is an equi-join ON THE GRAM whose
    * per-gram fanout is bounded by |sources|² (tens of sources → ≤ a few
    * hundred rows per gram, never corpus-sized); the output is
    * |sources|²∕2 rows. Sources sharing no gram emit no row. */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      n: Int): DataFrame = {
    val gs = df.select(col(srcCol).as("source"),
        explode(graft.functions.HashExpressions.ngram_hashes_wide(
          graft.functions.HashExpressions.word_hashes(col(textCol)), n)).as("g"))
      .distinct()
    gs.as("a").join(gs.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Per-source top-k terms — the datasheet's "what is each source
    * about" line (WIMBD summary statistics): token counts per (source,
    * token) with full map-side combine, then one window over the
    * BOUNDED aggregated frame (≤ |sources|·|vocab| rows — never the
    * corpus) ranked (count DESC, token). */
  def topTermsBySource(df: DataFrame, srcCol: String, textCol: String,
      k: Int): DataFrame = {
    val counts = df.select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("token"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("source", "rk", "token", "c")
  }

  /** Corpus novelty audit — the "what does this dump add?" statistic
    * behind dataset-growth decisions (each CommonCrawl snapshot adds
    * ever-less novel text; WIMBD §4 measures the dual, cross-source
    * overlap): per document, the fraction of its DISTINCT n-grams whose
    * corpus-wide FIRST occurrence (minimum doc id — the arrival-order
    * proxy; feed real ingest timestamps as the id to audit by time) is
    * this document. Near-duplicates and quotations score low, fresh
    * text scores ~1; the per-source mean of `novelty` is the marginal
    * value curve of continued crawling.
    *
    * Shape (the [[graft.operators.Dedup.softDedupWeights]] skeleton):
    * grams are the collision-safe packed two-chain hash; first-seen =
    * ONE min(id) aggregate with full map-side combine (a boilerplate
    * gram repeated 10⁶× collapses per map task); mark-back is an
    * equi-join on the gram hash; docs below n words report n_grams = 0
    * with novelty 1.0 (no duplication evidence — the softDedup
    * convention). Never all-pairs, never a sort. */
  def novelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(array_distinct(graft.functions.HashExpressions.ngram_hashes_wide(
        graft.functions.HashExpressions.word_hashes(col(textCol)), n))).as("g"))
    val firstSeen = grams.groupBy("g").agg(min(col("id")).as("first_id"))
    val perDoc = grams.join(firstSeen, Seq("g")).groupBy("id").agg(
      count(lit(1)).as("n_grams"),
      sum((col("first_id") === col("id")).cast("long")).as("n_novel"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams").isNull, lit(1.0))
          .otherwise(col("n_novel").cast("double") / col("n_grams").cast("double"))
          .as("novelty"))
  }

  /** DuckDB mirror of [[novelty]]. */
  def noveltySql(n: Int, docs: String = "documents",
      idCol: String = "doc_id"): String =
    s"""WITH w AS (SELECT $idCol AS id, ${MirrorHash.wordHashesSql()} AS whs FROM $docs),
       |gr AS (SELECT DISTINCT id, g FROM (
       |  SELECT id, unnest(${MirrorHash.ngramHashesWideSql("whs", n)}) AS g FROM w)),
       |fs AS (SELECT g, min(id) AS first_id FROM gr GROUP BY g),
       |pd AS (SELECT id, count(*) AS n_grams,
       |    sum(CASE WHEN first_id = id THEN 1 ELSE 0 END) AS n_novel
       |  FROM gr JOIN fs USING (g) GROUP BY id)
       |SELECT w.id, coalesce(pd.n_grams, 0) AS n_grams,
       |  CAST(coalesce(pd.n_novel, 0) AS BIGINT) AS n_novel,
       |  CASE WHEN pd.n_grams IS NULL THEN 1.0
       |       ELSE CAST(pd.n_novel AS DOUBLE) / CAST(pd.n_grams AS DOUBLE) END
       |    AS novelty
       |FROM w LEFT JOIN pd USING (id) ORDER BY id""".stripMargin
}
