package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic arithmetic hashing used by the dedup / fingerprint /
  * similarity operators, with a DuckDB-SQL mirror for the oracle gate.
  *
  * Spark's native hash functions (xxhash64, murmur3) have no DuckDB
  * equivalent, so the content hashes here are built from pure integer
  * arithmetic over ASCII codepoints — expressible identically in both
  * engines: every intermediate is a BIGINT (or an exactly-representable
  * double), so results are bit-identical regardless of evaluation order.
  *
  * Pipeline (reference semantics: shingle→minhash→band→bucket-join, the
  * standard MinHash-LSH construction; SimHash per Charikar'02):
  *   words      = split(text, ' ')
  *   wordHash   = Σ ascii(c_i)·(131^(i mod 8) mod P) mod P  (polynomial, in [0,P))
  *   shingleH   = (wh_i·31 + wh_{i+1}·131 + wh_{i+2}·1313) mod P  (3-gram)
  *   minhash_j  = min over shingles of (a_j·h + b_j mod P)
  *   band_t     = (mh_{2t}·31 + mh_{2t+1}·131) mod P    (2-row bands)
  *   simhash    = 30-bit sign-aggregate over shingle-hash bits
  *
  * NOTE Spark lambda indices are 0-based, DuckDB's are 1-based — the SQL
  * emitters compensate. Spark `split(w,"")` yields a trailing "" (Java
  * split semantics) whose ascii() is 0, so it contributes nothing and
  * both engines agree.
  */
object MirrorHash {
  val P = 1000000007L
  val NUM_PERMS = 8 // minhash permutations
  val NUM_BANDS = 4 // LSH bands (2 rows per band)
  val SIM_BITS = 30 // simhash width (P < 2^30)

  // 131^k mod P — reduced multipliers; see HashExpressions.POW131 for
  // why (raw powers overflow the per-word accumulator after ~650 chars
  // of one unbroken token, breaking the [0,P) word-hash contract)
  private val POW131: Seq[Long] = (0 until 8).scanLeft(1L)((a, _) => a * 131L % P).take(8)
  private val POW2: Seq[Long] = (0 until SIM_BITS).map(b => 1L << b)

  private def permA(j: Int): Long = (654435761L * j + 150889L) % P
  private def permB(j: Int): Long = (253910941L * j + 982451653L) % P

  // ===================== Spark side =====================

  private val pow131Arr: Column = array(POW131.map(lit): _*)
  private val pow2Arr: Column = array(POW2.map(lit): _*)

  /** Polynomial hash of one word, in [0,P): Σ ascii(c_i)·(131^(i mod 8)
    * mod P) mod P, maintained by a running mod (each addend ≤
    * 65535·(P−1), so acc + addend never overflows at any word length). */
  def wordHash(w: Column): Column =
    aggregate(
      transform(split(w, ""), (c, i) =>
        ascii(c).cast("long") * element_at(pow131Arr, (i % 8) + 1)),
      lit(0L), (acc, x) => (acc + x) % P)

  /** Array of word hashes for a space-separated text column. */
  def wordHashes(text: Column): Column =
    transform(split(text, " "), w => wordHash(w))

  /** 3-gram shingle hashes from a word-hash array (empty if <3 words). */
  def shingleHashes(whs: Column): Column =
    when(size(whs) >= 3,
      transform(sequence(lit(0), size(whs) - 3), i =>
        ((element_at(whs, i + 1) % P) * 31L
          + (element_at(whs, i + 2) % P) * 131L
          + (element_at(whs, i + 3) % P) * 1313L) % P))
      .otherwise(array().cast("array<bigint>"))

  /** Word-n-gram hashes from a word-hash array: gram i is
    * Σ_k (whs[i+k] mod P)·(131^k mod P) mod P for k < n. Every term is
    * < P² ≈ 2^60 and at most 8 terms sum before the reduction, so the
    * accumulation never overflows a Long (nor DuckDB's BIGINT). Used for
    * benchmark decontamination (n=8, the published train/test-overlap
    * convention — GPT-3 appendix C uses 8–13-gram collision checks). */
  def ngramHashes(whs: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    when(size(whs) >= n,
      transform(sequence(lit(0), size(whs) - n), i =>
        (0 until n).map(k =>
            (element_at(whs, i + k + 1) % P) * lit(powMod131(k)))
          .reduce(_ + _) % P))
      .otherwise(array().cast("array<bigint>"))
  }

  /** 131^k mod P (distinct per-position multipliers for [[ngramHashes]]). */
  private def powMod131(k: Int): Long = powMod(131L, k)

  /** b^k mod P — per-position multipliers for the hash chains. */
  private def powMod(b: Long, k: Int): Long =
    (0 until k).foldLeft(1L)((a, _) => a * b % P)

  /** WIDE word-n-gram hashes: two independent mod-P chains (multipliers
    * 131 and 1117) packed h1·P + h2 < P² ≈ 10¹⁸ — the collision-safe
    * gram identity for operators that DELETE on gram equality (dup-span
    * removal), where a single mod-P hash would falsely merge distinct
    * grams at the ~2³⁰ birthday rate. HOF executable spec of
    * [[graft.functions.HashExpressions.NgramHashWideArray]]. */
  def ngramHashesWide(whs: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    def chain(i: Column, b: Long): Column =
      (0 until n).map(k =>
          (element_at(whs, i + k + 1) % P) * lit(powMod(b, k)))
        .reduce(_ + _) % P
    when(size(whs) >= n,
      transform(sequence(lit(0), size(whs) - n), i =>
        chain(i, 131L) * P + chain(i, 1117L)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** MinHash under permutation j: min((a_j·h + b_j) mod P). */
  def minhash(shs: Column, j: Int): Column =
    array_min(transform(shs, h => (h * permA(j) + permB(j)) % P))

  /** All NUM_PERMS minhashes as an array column, computed in ONE pass
    * over the shingle array: `shs` is the direct aggregate input, so even
    * if Catalyst inlines an expensive producer expression it is evaluated
    * once per row (a per-permutation formulation re-evaluates the whole
    * upstream hash pipeline NUM_PERMS times after CollapseProject). */
  def minhashSig(shs: Column): Column =
    aggregate(
      shs,
      array_repeat(lit(P), NUM_PERMS), // P > any (a·h+b) mod P
      (acc, h) => zip_with(
        acc,
        array((0 until NUM_PERMS).map(j => (h * permA(j) + permB(j)) % P): _*),
        (m, v) => least(m, v)))

  /** LSH band values (2 minhash rows per band) from a signature array. */
  def bands(sig: Column): Column =
    array((0 until NUM_BANDS).map { t =>
      (element_at(sig, 2 * t + 1) * 31L + element_at(sig, 2 * t + 2) * 131L) % P
    }: _*)

  /** 30-bit SimHash over shingle hashes: bit b set iff Σ ±1 of the b-th
    * bit across shingles is ≥ 0. Division via exactly-representable
    * doubles (< 2^53) keeps both engines identical.
    *
    * Single-pass: one aggregate over `shs` carrying a 30-counter array
    * (see [[minhashSig]] for why — a per-bit inner aggregate re-evaluates
    * the upstream pipeline SIM_BITS times once CollapseProject inlines
    * it; measured 340s vs ~2s on 500 docs). */
  def simhash(shs: Column): Column = {
    val counts = aggregate(
      shs,
      array_repeat(lit(0L), SIM_BITS),
      (acc, h) => zip_with(
        acc,
        transform(pow2Arr, p =>
          when(floor(h / p).cast("long") % 2 === 1, 1L).otherwise(-1L)),
        (a, s) => a + s))
    aggregate(
      zip_with(counts, pow2Arr, (c, p) => when(c >= 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** SimHash split into `nb` equal-width band values for bucket joins:
    * two hashes within hamming distance < nb share ≥1 band (pigeonhole). */
  def simhashBands(sh: Column, nb: Int): Column = {
    val width = SIM_BITS / nb // e.g. 5 bands × 6 bits
    array((0 until nb).map { t =>
      floor(sh / lit(1L << (t * width))).cast("long") % lit(1L << width)
    }: _*)
  }

  /** Winnowing fingerprint selection over a gram-hash array — the O(m·w)
    * per-window HOF executable spec of
    * [[graft.functions.HashExpressions.WinnowArray]] (Schleimer et al.
    * 2003 §4): every w-window's leftmost minimum, deduplicated, as packed
    * pos·P + hash longs sorted by position. Docs with 1 ≤ m < w winnow
    * the single full window; empty gram arrays select nothing. */
  def winnowSelect(hs: Column, w: Int): Column = {
    require(w >= 1, s"winnow window must be >= 1, got $w")
    val m = size(hs)
    // leftmost argmin of window [j, min(j+w-1, m-1)]: strict < keeps the
    // earliest min; acc seeds at (P, -1) and P exceeds every hash
    val packed = transform(sequence(lit(0), greatest(m - w, lit(0))), j =>
      aggregate(sequence(j, least(j + w - 1, m - 1)),
        struct(lit(P).as("h"), lit(-1L).as("p")),
        (acc, i) => when(element_at(hs, i + 1) < acc.getField("h"),
            struct(element_at(hs, i + 1).as("h"), i.cast("long").as("p")))
          .otherwise(acc),
        acc => acc.getField("p") * P + acc.getField("h")))
    when(m >= 1, array_sort(array_distinct(packed)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** SQL mirror of [[winnowSelect]] (DuckDB slices are 1-based inclusive
    * and clamp at the list end; list_position returns the FIRST match =
    * the leftmost-min tie-break). */
  def winnowSelectSql(hs: String, w: Int): String =
    s"""CASE WHEN len($hs) >= 1 THEN
       | list_sort(list_distinct(list_transform(
       |   generate_series(1, greatest(len($hs)-${w - 1}, 1)),
       |   j -> CAST(j-2+list_position($hs[j:j+${w - 1}], list_min($hs[j:j+${w - 1}])) AS BIGINT)*$P
       |        + list_min($hs[j:j+${w - 1}]))))
       | ELSE [] END""".stripMargin

  /** Position-weighted document fingerprint: Σ (wh_i mod P)·((i mod 64)+1) mod P. */
  def fingerprint(whs: Column): Column =
    aggregate(
      transform(whs, (h, i) => (h % P) * ((i % 64) + 1).cast("long")),
      lit(0L), (acc, x) => acc + x) % P

  // ===================== DuckDB SQL mirror =====================

  private val powSql = POW131.mkString("[", ",", "]")
  private val pow2Sql = POW2.mkString("[", ",", "]")

  /** SQL: array of word hashes of `text`. (DuckDB lambda index is
    * 1-based, hence (i-1).) list_sum has no running mod, so the mirror
    * reduces once at the end — exact (identical to the Spark running
    * mod) while the pre-mod sum fits a BIGINT, i.e. words up to
    * ~1.4·10⁵ characters; beyond that DuckDB raises an overflow error
    * rather than silently diverging (the oracle gate runs on bounded
    * fixtures). */
  def wordHashesSql(text: String = "text"): String =
    // CAST the ascii side up front: the mod-P multipliers all fit INT32
    // (unlike the raw 131^k), so without it DuckDB multiplies in INT32
    // and overflows at the first 5-char word
    s"""list_transform(string_split($text,' '), w ->
       | CAST(list_sum(list_transform(string_split(w,''),
       |   (c,i) -> CAST(ascii(c) AS BIGINT) * ($powSql)[((i-1)%8)+1])) AS BIGINT) % $P)""".stripMargin

  /** SQL: shingle hashes from a word-hash array column named `whs`. */
  def shingleHashesSql(whs: String = "whs"): String =
    s"""CASE WHEN len($whs) >= 3 THEN
       | list_transform(generate_series(1, len($whs)-2),
       |  i -> (($whs[i]%$P)*31 + ($whs[i+1]%$P)*131 + ($whs[i+2]%$P)*1313) % $P)
       | ELSE [] END""".stripMargin

  /** COALESCE to the sentinel P for docs with <3 words (empty shingle
    * list): DuckDB's list_min([]) is NULL, while the Spark side
    * (minhashSig / MinHashSig) initializes the signature to P. */
  def minhashSql(shs: String, j: Int): String =
    s"COALESCE(list_min(list_transform($shs, h -> (h*${permA(j)} + ${permB(j)}) % $P)), $P)"

  def minhashSigSql(shs: String = "shs"): String =
    (0 until NUM_PERMS).map(j => minhashSql(shs, j)).mkString("[", ", ", "]")

  def bandsSql(sig: String = "sig"): String =
    (0 until NUM_BANDS).map { t =>
      s"($sig[${2 * t + 1}]*31 + $sig[${2 * t + 2}]*131) % $P"
    }.mkString("[", ", ", "]")

  def simhashSql(shs: String = "shs"): String =
    s"""CAST(list_sum(list_transform(generate_series(0,${SIM_BITS - 1}), b ->
       | CASE WHEN list_sum(list_transform($shs, h ->
       |   CASE WHEN CAST(floor(h/($pow2Sql)[b+1]) AS BIGINT)%2 = 1 THEN 1 ELSE -1 END)) >= 0
       | THEN ($pow2Sql)[b+1] ELSE 0 END)) AS BIGINT)""".stripMargin

  def simhashBandsSql(sh: String, nb: Int): String = {
    val width = SIM_BITS / nb
    (0 until nb).map { t =>
      s"CAST(floor($sh/${1L << (t * width)}) AS BIGINT) % ${1L << width}"
    }.mkString("[", ", ", "]")
  }

  def fingerprintSql(whs: String = "whs"): String =
    s"""CAST(list_sum(list_transform($whs, (h,i) -> (h%$P) * (((i-1)%64)+1))) AS BIGINT) % $P""".stripMargin

  /** SQL mirror of [[ngramHashes]] (DuckDB lists are 1-based). */
  def ngramHashesSql(whs: String, n: Int): String = {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    val terms = (0 until n)
      .map(k => s"($whs[i+$k]%$P)*${powMod131(k)}").mkString(" + ")
    s"""CASE WHEN len($whs) >= $n THEN
       | list_transform(generate_series(1, len($whs)-${n - 1}), i -> ($terms) % $P)
       | ELSE [] END""".stripMargin
  }

  /** SQL mirror of [[ngramHashesWide]]: the packed two-chain gram hash
    * (every intermediate < 8·P² and the packed value < P², both inside
    * DuckDB's signed BIGINT). */
  def ngramHashesWideSql(whs: String, n: Int): String = {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    def terms(b: Long) = (0 until n)
      .map(k => s"($whs[i+$k]%$P)*${powMod(b, k)}").mkString(" + ")
    s"""CASE WHEN len($whs) >= $n THEN
       | list_transform(generate_series(1, len($whs)-${n - 1}),
       |   i -> ((${terms(131L)}) % $P) * $P + ((${terms(1117L)}) % $P))
       | ELSE [] END""".stripMargin
  }
}
