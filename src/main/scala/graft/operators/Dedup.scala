package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MirrorHash._
import graft.functions.HashExpressions.{word_hashes, shingle_hashes, minhash_sig, simhash30, fixed_dot, hyperplane_sig}

/** Deduplication operators for large-scale text corpora: exact,
  * n-gram-Jaccard, MinHash-LSH, SimHash-band. Everything is expressed as
  * declarative DataFrame plans so Catalyst handles pushdown and AQE
  * handles skew.
  *
  * Scale design (100 TB):
  *  - never an all-pairs cross join in a production path: candidate
  *    generation is an inverted-index or band-bucket equi-join, which
  *    shuffles on the bucket key and scales with the number of
  *    *colliding* pairs (the one brute-force method,
  *    [[embeddingPairsExact]], is the disclosed small-input recall
  *    oracle, not a scale path);
  *  - hot shingles are capped (`maxShingleFreq`) — the classic stop-
  *    shingle trick that keeps the inverted index from quadratic blowup
  *    on boilerplate n-grams;
  *  - per-doc state (signature, band values) is computed in one
  *    projection pass — no shuffle before the bucket join.
  */
object Dedup {

  /** Exact dedup via content-hash groupBy: one row per distinct text with
    * the surviving (minimum) id and the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** Keep-first dedup returning the surviving ROWS (pandas
    * drop_duplicates(keep='first') analog with the minimum id as
    * "first"): row_number over the content key, keep rank 1. */
  def dropDuplicatesKeepMin(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** pandas drop_duplicates(keep='last'): the MAXIMUM id survives —
    * identical plan with the rank order reversed. */
  def dropDuplicatesKeepMax(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(idCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-doc distinct 3-gram shingle hashes: id, ds (array), nd (count). */
  def shingleDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(shingle_hashes(word_hashes(col(textCol)))).as("ds"))
      .withColumn("nd", size(col("ds")).cast("long"))

  /** Exact n-gram Jaccard pairs with J ≥ tau via an inverted shingle
    * index self-join (no cross join). `maxShingleFreq` drops shingles
    * appearing in more docs than the cap from candidate generation. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, maxShingleFreq: Option[Int] = None): DataFrame =
    shingleCandidateCounts(df, idCol, textCol, maxShingleFreq)
      .withColumn("j", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("j") >= tau)
      .select("da", "db", "common", "na", "nb", "j")

  /** Shared inverted-shingle-index candidate core of [[jaccardPairs]]
    * and [[containmentPairs]]: per unordered candidate pair (da < db),
    * the common-shingle count plus both set sizes — the sufficient
    * statistics for EVERY set-resemblance measure. Equi-join on the
    * shingle hash (optional hot-shingle cap), never all-pairs. The
    * shingle frame sits behind a lazy localCheckpoint (two consumers:
    * the index and the hot-shingle census) — reclaimable, unlike a
    * CacheManager entry no caller is positioned to unpersist. */
  private def shingleCandidateCounts(df: DataFrame, idCol: String,
      textCol: String, maxShingleFreq: Option[Int]): DataFrame = {
    val docs = shingleDocs(df, idCol, textCol).localCheckpoint(eager = false)
    val inv0 = docs.select(col("id"), col("nd"), explode(col("ds")).as("h"))
    val inv = maxShingleFreq.fold(inv0) { cap =>
      val hot = inv0.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("h")
      inv0.join(broadcast(hot), Seq("h"), "left_anti")
    }
    val a = inv.select(col("id").as("da"), col("nd").as("na"), col("h"))
    val b = inv.select(col("id").as("db"), col("nd").as("nb"), col("h"))
    a.join(b, Seq("h")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("common"), first(col("na")).as("na"), first(col("nb")).as("nb"))
  }

  /** Prefix-filtered exact Jaccard pairs (the PPJoin/All-Pairs candidate
    * rule — Chaudhuri et al. 2006, Xiao et al. 2008): identical output
    * to [[jaccardPairs]], but the inverted index posts ONLY each
    * document's prefix under a global rarity order, shrinking the
    * candidate join provably instead of lossily.
    *
    * Principle: J(A,B) ≥ t ⟹ |A∩B| ≥ ⌈t·|A|⌉ (from c(1+t) ≥
    * t(na+nb) and nb ≥ c), and two sets sharing ≥ α elements must, under
    * ANY common total order, share one among the first n−α+1 of each
    * (pigeonhole). So candidates come from an equi-join of prefixes of
    * length n − ⌈t·n⌉ + 1 only, with EXACT recall — the provable form
    * of [[jaccardPairs]]'s lossy hot-shingle cap. The threshold is a
    * RATIONAL tauNum∕tauDen so ⌈t·n⌉ = (tauNum·n + tauDen − 1) div
    * tauDen stays BIGINT-exact in both engines (an IEEE ceil can round
    * a hair high and silently shorten the prefix below the guarantee).
    *
    * Scale: ordering tokens by ascending document frequency puts the
    * corpus's hottest shingles (boilerplate) LAST, so they almost never
    * enter a prefix — at t = 0.6 the index carries ~40% of postings and
    * the hot-gram quadratic blowup disappears without losing a pair.
    * Costs vs [[jaccardPairs]]: one extra bounded df aggregate
    * (map-side combined, ≤ distinct shingles), one gram-keyed join to
    * rank, one per-doc window; the verify step fetches the two shingle
    * arrays by id equi-joins and intersects per candidate — never
    * all-pairs anywhere. */
  /** The df-ascending prefix slice of the shingle postings: each doc's
    * first nd − ⌈t·nd⌉ + 1 shingles under the global
    * document-frequency order. Split out of [[jaccardPairsPrefix]] so
    * its plan (map-side partial_count on the df aggregate, equi-joins
    * only) stays auditable — inside the operator the frame sits behind
    * a cache() (InMemoryRelation, which keeps the size stats AQE needs
    * to broadcast the verify joins); this helper exposes the pre-cache
    * plan. */
  private[graft] def prefixPostings(docs: DataFrame, tauNum: Int,
      tauDen: Int): DataFrame = {
    val inv = docs.select(col("id"), col("nd"), explode(col("ds")).as("h"))
    val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("h"))
    inv.join(dfreq, Seq("h"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <=
        col("nd") - expr(s"($tauNum * nd + ${tauDen - 1}) div $tauDen") + 1)
      // pos = the token's 1-based rank under the global (df, h) order —
      // carried for the PPJoin positional filter downstream
      .select(col("id"), col("nd"), col("h"), col("__rn").cast("long").as("pos"))
  }

  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"need 0 < tau <= 1, got $tauNum/$tauDen")
    val tau = tauNum.toDouble / tauDen
    // cache, NOT localCheckpoint: the shingle frame has three consumers
    // (prefix postings + both verify sides), and a checkpointed RDD scan
    // loses size stats — AQE then planned the verify joins as SMJ,
    // SHUFFLING every candidate pair's two gram arrays (~600 MB at
    // sf0.1, 7.5s of the 4.1s-total budget); the InMemoryRelation keeps
    // measured sizes, so the per-doc array frame broadcasts and the
    // arrays never move (measured 7.1s -> ~2s warm at sf0.1)
    val docs = graft.core.Caches.cached(shingleDocs(df, idCol, textCol))
    val pref = prefixPostings(docs, tauNum, tauDen)
    // All-Pairs length filter (also exact): J >= t forces t·na <= nb and
    // t·nb <= na (c <= min and c >= t·max), so mismatched-size pairs drop
    // BEFORE the distinct/verify — integer cross-multiplied, no division.
    // (Measured alternatives for the pref-computed-twice rename join:
    // localCheckpoint/cache destabilize AQE stats and a per-gram
    // collect_list + HOF pair expansion runs 2x SLOWER than the join —
    // the codegen'd equi-join wins despite the double pipeline.)
    // POSITIONAL filter (Xiao et al.'s ppjoin refinement of All-Pairs):
    // a token matched at 1-based ranks (pa, pb) under the shared global
    // (df, h) order bounds the overlap EXACTLY — common tokens strictly
    // before it number ≤ min(pa,pb)−1 (both docs are sorted by the same
    // order), and common tokens from it on number ≤ min(na−pa, nb−pb)+1,
    // so c ≤ min(pa,pb) + min(na−pa, nb−pb). J ≥ t ⇔ c·(num+den) ≥
    // num·(na+nb), so a match whose bound falls below α := ⌈num·(na+nb)
    // ∕ (num+den)⌉ cannot witness a qualifying pair and is dropped
    // BEFORE the distinct — for a TRUE pair every matched token's bound
    // ≥ c ≥ α, so recall stays exact; all-BIGINT cross-multiplied, no
    // division. Applied per ROW, not as a per-pair min-aggregate: the
    // min-agg form (group by pair, prune on the tightest bound) was
    // measured 3× slower than distinct() for 0.03% extra pruning, while
    // this row form is one codegen'd comparison inside the join stage
    // (SCALING.md round 14: 193 244 → 190 549 candidates at sf0.1 —
    // long-doc corpora give the prefix itself most of the pruning; the
    // filter's value grows as docs shorten).
    val cand = pref.select(col("id").as("da"), col("nd").as("__na"),
        col("h"), col("pos").as("__pa"))
      .join(pref.select(col("id").as("db"), col("nd").as("__nb"),
        col("h"), col("pos").as("__pb")), Seq("h"))
      .filter(col("da") < col("db") &&
        col("__nb") * tauDen >= col("__na") * tauNum &&
        col("__na") * tauDen >= col("__nb") * tauNum)
      .filter((least(col("__pa"), col("__pb")) +
        least(col("__na") - col("__pa"), col("__nb") - col("__pb"))) *
        (tauNum + tauDen) >= (col("__na") + col("__nb")) * tauNum)
      .select("da", "db").distinct()
    cand
      .join(docs.select(col("id").as("da"), col("nd").as("na"),
        col("ds").as("__dsa")), Seq("da"))
      .join(docs.select(col("id").as("db"), col("nd").as("nb"),
        col("ds").as("__dsb")), Seq("db"))
      .withColumn("common",
        size(array_intersect(col("__dsa"), col("__dsb"))).cast("long"))
      .withColumn("j", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("j") >= tau)
      .select("da", "db", "common", "na", "nb", "j")
  }

  /** WEIGHTED (multiset) Jaccard pairs — Σ min(cₐ,c_b) ∕ Σ max(cₐ,c_b)
    * over per-doc shingle MULTIPLICITIES (Σmax = nₐ + n_b − Σmin). The
    * set form treats a doc that repeats a template 50× and one that
    * contains it once as identical; the multiset form is the dedup
    * measure for templated/boilerplate-heavy corpora where repetition
    * IS the signal (spam mirrors, log dumps, scraped pagination).
    *
    * Arithmetic: gram counts and totals are exact BIGINTs, the single
    * IEEE division is the final ratio — mirrored verbatim. Candidate
    * generation is the family's inverted-index self-join keyed on the
    * gram hash (never all-pairs), with [[jaccardPairs]]'s optional
    * hot-gram cap; the per-pair Σmin folds map-side in the pair
    * aggregate, so no gram array ever moves to a pair row.
    *
    * Scale: the counted-gram frame has three consumers (totals + both
    * join sides) — cache(), not localCheckpoint, so AQE keeps measured
    * sizes for the join strategy (see SCALING.md round 13). */
  def jaccardWeightedPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, maxShingleFreq: Option[Int] = None): DataFrame = {
    val grams = graft.core.Caches.cached(df.select(col(idCol).as("id"),
        explode(shingle_hashes(word_hashes(col(textCol)))).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("c")))
    val totals = grams.groupBy("id").agg(sum(col("c")).as("n"))
    val inv = maxShingleFreq.fold(grams: DataFrame) { cap =>
      val hot = grams.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("h")
      grams.join(broadcast(hot), Seq("h"), "left_anti")
    }
    val a = inv.select(col("id").as("da"), col("h"), col("c").as("ca"))
    val b = inv.select(col("id").as("db"), col("h"), col("c").as("cb"))
    a.join(b, Seq("h")).filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(sum(least(col("ca"), col("cb"))).as("wcommon"))
      .join(totals.select(col("id").as("da"), col("n").as("na")), Seq("da"))
      .join(totals.select(col("id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("wj",
        col("wcommon") / (col("na") + col("nb") - col("wcommon")))
      .filter(col("wj") >= tau)
      .select("da", "db", "wcommon", "na", "nb", "wj")
  }

  /** Shingle-set CONTAINMENT pairs (Broder 1997's second resemblance
    * measure, |A∩B| ∕ |A|) — the asymmetric relation Jaccard misses: a
    * short document quoted whole inside a long one has tiny Jaccard but
    * containment ≈ 1. The dedup policy move is "drop the contained
    * copy, keep the container" (quote/extension collapse). Emits one
    * DIRECTIONAL row per (contained, container) with containment ≥
    * tau; a pair similar in both directions yields two rows.
    *
    * Scale: identical inverted-shingle-index candidate generation to
    * [[jaccardPairs]] (equi-join on the shingle hash, optional
    * hot-shingle cap — never all-pairs); the direction split is a
    * projection over the counted candidate frame. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, maxShingleFreq: Option[Int] = None): DataFrame = {
    // both direction arms read the counted frame — checkpoint so the
    // candidate pipeline runs once (the clusters() union discipline)
    val counted = shingleCandidateCounts(df, idCol, textCol, maxShingleFreq)
      .localCheckpoint(eager = false)
    val fwd = counted.select(col("da").as("contained"), col("db").as("container"),
      col("common"), (col("common") / col("na")).as("containment"))
    val rev = counted.select(col("db").as("contained"), col("da").as("container"),
      col("common"), (col("common") / col("nb")).as("containment"))
    fwd.unionAll(rev).filter(col("containment") >= tau)
  }

  /** Winnowed-fingerprint overlap pairs (Schleimer et al. 2003 §5): the
    * substring-level dual of [[jaccardPairs]]. Each document contributes
    * only its winnowed fingerprint set (expected 2∕(w+1) of its grams,
    * selected by the codegen'd O(grams) [[graft.operators.TextAnalysis.winnow]]
    * pass), and candidate pairs come from an equi-join on the fingerprint
    * hash — never all-pairs. Any shared word run of ≥ w+2 words is
    * guaranteed to surface (the winnowing guarantee), so `minShared`
    * thresholds evidence strength, not recall of long overlaps. The
    * optional hot-gram cap drops boilerplate fingerprints from candidate
    * generation exactly like jaccard's hot-shingle cap.
    *
    * Scale: the join carries the sparse fingerprint frame (~0.4× gram
    * rows at w=4); the pair aggregate does map-side partial counts; the
    * cap bounds the worst single-hash fanout at `cap²` rows. */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String, w: Int,
      minShared: Long, maxGramFreq: Option[Int] = None): DataFrame = {
    // distinct (id, gh): the same hash winnowed at several positions is
    // one piece of evidence. Two consumers when capped -> lazy checkpoint
    val fps0 = TextAnalysis.winnow(df, idCol, textCol, w)
      .select(col("id"), col("gh")).distinct()
    val fps = maxGramFreq.fold(fps0) { cap =>
      val f = fps0.localCheckpoint(eager = false)
      val hot = f.groupBy("gh").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("gh")
      f.join(broadcast(hot), Seq("gh"), "left_anti")
    }
    val a = fps.select(col("id").as("da"), col("gh"))
    val b = fps.select(col("id").as("db"), col("gh"))
    a.join(b, Seq("gh")).filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** INCREMENTAL winnowed-overlap detection — the daily-batch form of
    * [[winnowPairs]]: arriving documents probe the HISTORICAL
    * fingerprint index by a cross-side equi-join on the fingerprint
    * hash (the reference corpus never self-joins — cost ∝ |incoming|
    * + cross-side hash collisions, the incremental-dedup discipline of
    * [[incrementalDedup]]/[[incrementalEmbDedup]]); every incoming doc
    * emits its verdict with its best-evidenced historical match
    * (shared desc, id asc). At 100 TB the reference fingerprint index
    * is the persisted artifact — ~2∕(w+1) of its gram volume. */
  def incrementalWinnow(reference: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, w: Int, minShared: Long): DataFrame = {
    def fps(df: DataFrame) = TextAnalysis.winnow(df, idCol, textCol, w)
      .select(col("id"), col("gh")).distinct()
    val r = fps(reference).select(col("id").as("ri"), col("gh"))
    val i = fps(incoming).select(col("id").as("ii"), col("gh"))
    val shared = i.join(r, "gh")
      .groupBy("ii", "ri").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    val best = shared.withColumn("rn", row_number().over(
        Window.partitionBy(col("ii")).orderBy(col("shared").desc, col("ri"))))
      .filter(col("rn") === 1)
      .select(col("ii").as("id"), col("ri").as("match_id"), col("shared"))
    incoming.select(col(idCol).as("id"))
      .join(best, Seq("id"), "left")
      .select(col("id"),
        when(col("match_id").isNotNull, 1).otherwise(0).as("overlap"),
        col("match_id"), coalesce(col("shared"), lit(0L)).as("shared"))
  }

  /** MinHash signatures: id, mh0..mh{NUM_PERMS-1}. The signature is one
    * single-pass aggregate (minhashSig); element extraction happens in a
    * separate projection so CollapseProject cannot duplicate it. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        minhash_sig(array_distinct(shingle_hashes(word_hashes(col(textCol))))).as("sig"))
      .select(
        (col("id") +: (0 until NUM_PERMS).map(j =>
          element_at(col("sig"), j + 1).as(s"mh$j"))): _*)

  /** MinHash-LSH near-dup pairs: band-bucket join for candidates, then
    * exact Jaccard verification at `tau`. Identical construction to the
    * reference's shingle→minhash→band→bucket-join path. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double): DataFrame = {
    // cached (tracked, see graft.core.Caches): the verify joins pull the
    // per-doc shingle arrays back by id with no explicit hint — AQE needs
    // the InMemoryRelation's measured size to broadcast them instead of
    // sort-merge-shuffling every candidate pair's two gram arrays
    val docs = graft.core.Caches.cached(df.select(col(idCol).as("id"),
        array_distinct(shingle_hashes(word_hashes(col(textCol)))).as("ds"))
      .withColumn("nd", size(col("ds")).cast("long"))
      .withColumn("sig", minhash_sig(col("ds")))
      .withColumn("bands", bands(col("sig")))
      .drop("sig"))
    val exploded = docs.select(col("id"), posexplode(col("bands")).as(Seq("bi", "bv")))
    val cand = exploded.as("x").join(exploded.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db")).distinct()
    val da = docs.select(col("id").as("da"), col("ds").as("dsa"), col("nd").as("na"))
    val dbd = docs.select(col("id").as("db"), col("ds").as("dsb"), col("nd").as("nb"))
    cand.join(da, "da").join(dbd, "db")
      .withColumn("common", size(array_intersect(col("dsa"), col("dsb"))).cast("long"))
      .withColumn("j", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("j") >= tau)
      .select("da", "db", "j")
  }

  /** Per-doc SimHash: id, sh (30-bit). */
  def simhashDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      simhash30(shingle_hashes(word_hashes(col(textCol)))).as("sh"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHd via band
    * bucketing: nb bands of SIM_BITS/nb bits — any pair with hd < nb
    * shares ≥1 band (pigeonhole), so recall is exact for maxHd < nb. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHd: Int, nb: Int = 5): DataFrame = {
    require(maxHd < nb, s"hd ≤ $maxHd needs > $maxHd bands for exact recall")
    // cached (tracked): the band self-join's small-side choice reads the
    // InMemoryRelation's measured stats (see graft.core.Caches)
    val docs = graft.core.Caches.cached(simhashDocs(df, idCol, textCol)
      .withColumn("bands", simhashBands(col("sh"), nb)))
    val ex = docs.select(col("id"), col("sh"), posexplode(col("bands")).as(Seq("bi", "bv")))
    ex.as("x").join(ex.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hd"))
      .distinct()
      .filter(col("hd") <= maxHd)
  }

  /** Embedding near-dup pairs with cosine ≥ tau — the 100 TB path.
    * Candidate generation is multi-table random-hyperplane LSH: each
    * vector gets `tables` band values (one codegen'd
    * [[graft.functions.HashExpressions.HyperplaneSig]] pass, weights from
    * [[graft.functions.PlaneHash]]); a pair is a candidate iff it shares
    * ≥1 (table, band) bucket — an equi-join on the band key, shuffle ∝
    * collisions, never |corpus|². Candidates are then verified with the
    * exact fixed-point cosine, so precision is exact; recall is the LSH
    * collision probability, tuned by (tables, planesPerBand): measured on
    * the deterministic test embeddings at tau=0.45, T=150×P=8 recovers
    * 7/7 (sf0.001), 14/14 (sf0.01) and 143/144 (sf0.1) of the exhaustive
    * pairs — the miss is the single pair at cos 0.45010, right at the
    * threshold.
    *
    * `tables = 0` (the default) AUTO-SIZES the table count with corpus
    * growth: T = [[autoTables]](df.count()) — the T ∝ ln n rule from
    * SCALING.md (the classic n^(1+ρ) LSH tradeoff, ρ≈0.63 at tau=0.45),
    * anchored at the measured T=150 @ n=500 point. Pass an explicit T
    * to pin it — the oracled `dedup_embedding` query does (its DuckDB
    * mirror is static SQL), and so should any job that must be
    * bit-reproducible across corpus sizes. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      tau: Double, tables: Int = 0, planesPerBand: Int = 8,
      dims: Int = 64): DataFrame = {
    val t = if (tables > 0) tables else autoTables(df.count())
    // cached (tracked): the verify joins pull fx vectors back by id with
    // no explicit hint — measured stats steer AQE to broadcast (see
    // graft.core.Caches for the discipline split)
    val docs = graft.core.Caches.cached(Similarity.fixedPoint(df, idCol, vecCol)
      .withColumn("sig", hyperplane_sig(col("fx"), t, planesPerBand, dims)))
    val ex = docs.select(col("id"), posexplode(col("sig")).as(Seq("bi", "bv")))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("va"), col("y.id").as("vb")).distinct()
    val a = docs.select(col("id").as("va"), col("fx").as("fa"), col("nrm").as("na"))
    val b = docs.select(col("id").as("vb"), col("fx").as("fb"), col("nrm").as("nb"))
    cand.join(a, "va").join(b, "vb")
      .withColumn("dot", fixed_dot(col("fa"), col("fb")))
      .withColumn("cos", col("dot") / sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= tau)
      .select("va", "vb", "cos")
  }

  /** Incremental EMBEDDING dedup — [[incrementalDedup]]'s shape on the
    * vector side (the daily-ingest workflow: a new embedding batch
    * against the already-curated reference store): flag each INCOMING
    * vector whose cosine to some REFERENCE vector ≥ tau. Candidates
    * come from the same multi-table hyperplane-LSH band join as
    * [[embeddingPairs]], but restricted incoming×reference — the
    * reference NEVER self-joins, so a daily batch against a 100 TB
    * store costs ∝ |incoming| + cross-side band collisions. The
    * signature pass runs over both sides (reference signatures are the
    * store's index; persist them once in production). Emits per
    * incoming id (near_dup flag, best matching reference id by (cos
    * DESC, id), its cosine — null when no candidate verified). */
  def incrementalEmbDedup(reference: DataFrame, incoming: DataFrame,
      idCol: String, vecCol: String, tau: Double, tables: Int = 0,
      planesPerBand: Int = 8, dims: Int = 64): DataFrame = {
    // ONE union-count job when auto-sizing (two separate counts would
    // scan the 100 TB reference store twice per daily batch; production
    // persists the reference count with its signature index anyway)
    val t = if (tables > 0) tables
      else autoTables(reference.select(col(idCol))
        .unionByName(incoming.select(col(idCol))).count())
    def sigs(df: DataFrame) = Similarity.fixedPoint(df, idCol, vecCol)
      .withColumn("sig", hyperplane_sig(col("fx"), t, planesPerBand, dims))
      .localCheckpoint(eager = false)
    val r = sigs(reference)
    val i = sigs(incoming)
    def ex(d: DataFrame) =
      d.select(col("id"), posexplode(col("sig")).as(Seq("bi", "bv")))
    val cand = ex(i).as("x").join(ex(r).as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv"))
      .select(col("x.id").as("ii"), col("y.id").as("ri")).distinct()
    val iv = i.select(col("id").as("ii"), col("fx").as("fi"), col("nrm").as("ni"))
    val rv = r.select(col("id").as("ri"), col("fx").as("fr"), col("nrm").as("nr"))
    val verified = cand.join(iv, "ii").join(rv, "ri")
      .withColumn("cos", fixed_dot(col("fi"), col("fr"))
        / sqrt(col("ni").cast("double") * col("nr").cast("double")))
      .filter(col("cos") >= tau)
    val best = verified
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("ii")).orderBy(col("cos").desc, col("ri"))))
      .filter(col("rn") === 1)
      .select(col("ii").as("id"), col("ri").as("match_id"), col("cos"))
    incoming.select(col(idCol).as("id"))
      .join(best, Seq("id"), "left")
      .select(col("id"),
        when(col("match_id").isNotNull, 1).otherwise(0).as("near_dup"),
        col("match_id"), col("cos"))
  }

  /** LSH table count for corpus size n: T = ⌈c·ln n⌉, anchored so the
    * measured full-recall point is reproduced at its own scale
    * (T=150 @ n=500 → c = 150/ln 500 ≈ 24.2; measurement: a
    * threshold-adjacent pair at cos 0.45010 needs ≥~150 tables at P=8),
    * floored at 64 so tiny corpora keep band diversity. Recall is
    * MONOTONE in T — table t's planes are a prefix-stable series, so a
    * larger T strictly adds candidate buckets — which makes the ln-rule
    * safe to extrapolate upward. One count() job — cheap next to the
    * signature pass it sizes. */
  def autoTables(n: Long): Int =
    math.max(64, math.ceil(24.2 * math.log(math.max(n, 2L).toDouble)).toInt)

  /** Connected components over near-dup PAIRS — the dedup finisher: a
    * duplicate cluster is the transitive closure of pairwise matches, and
    * the canonical survivor is the cluster's minimum id. Min-label
    * propagation: l(v) ← min(l(v), min l(neighbors)), run a FIXED
    * `iters` rounds (converged when iters ≥ cluster diameter; near-dup
    * clusters are near-cliques, so single-digit rounds suffice — and the
    * DuckDB oracle unrolls the SAME rounds, so results mirror exactly
    * even mid-convergence). At 100 TB scale swap the plain propagation
    * for alternating large-star/small-star contractions; the per-round
    * plan (edge⋈label equi-join + min groupBy) is identical. */
  /** Deterministic integer PageRank over an undirected pair frame — the
    * hub statistic of a near-dup graph ("which documents sit at the
    * center of a duplication web": boilerplate templates and mirror
    * hubs rank highest; the audit complement of [[clusterStats]]).
    * Ranks are MILLI-units, all arithmetic BIGINT floor division so
    * both engines agree bit-for-bit: r₀ = 1000 per node; per round,
    * each node sends r DIV deg along every incident edge and
    * r' = 150 + (850 · Σ incoming) DIV 1000 — the damping-0.85 power
    * iteration with the divisions floored. Fixed `iters` rounds (the
    * oracle unrolls the same rounds).
    *
    * Scale: the pair list symmetrizes behind a checkpoint; per round,
    * ONE equi-join of edges to ranks + one map-side-combined sum per
    * target node — the standard distributed PR shape (edge partitioning
    * is the skew knob for hub nodes at 100 TB); ranks checkpoint per
    * round so lineage stays flat. */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .localCheckpoint(true)
    val ed = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
    val deg = ed.groupBy("u").agg(count(lit(1)).as("deg"))
    val edd = ed.join(deg, "u").localCheckpoint(true)
    var pr = deg.select(col("u").as("n"), lit(1000L).as("r"))
    for (i <- 1 to iters) {
      pr = edd.join(pr, edd("u") === pr("n"))
        .select(col("v"), expr("r DIV deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("s"))
        .select(col("v").as("n"),
          (lit(150L) + expr("850 * s DIV 1000")).as("r"))
      // checkpoint BETWEEN rounds (flat lineage); the final round is
      // consumed exactly once by the caller, so its checkpoint would
      // only cost a materialization
      if (i < iters) pr = pr.localCheckpoint(true)
    }
    pr.select(col("n").as("id"), col("r").as("rank_milli"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected pair frame (aCol < bCol) — the graph-density audit of a
    * near-dup web: a high coefficient marks template/boilerplate cliques
    * (every copy matches every copy), a low one marks chain-like
    * spurious matches, the signal that separates "true duplicate
    * cluster" from "hub accident" before committing a keep-one policy.
    *
    * Shape: the classic forward-edge algorithm — triangles a<b<c found
    * by joining the oriented edge list to itself on the middle vertex
    * and verifying the closing edge with a second equi-join; per-node
    * counts explode the triangle's three corners; coefficient =
    * 2·tri ∕ (deg·(deg−1)) with integer operands and ONE double
    * division (engine-identical). No cartesian anywhere; join fanout is
    * Σ out·in per vertex, and `orientByDegree = true` (the production
    * default at scale) bounds it by degree-ordering — see the inline
    * note; the declared query keeps id-orientation so the oracle
    * mirrors the joins verbatim, with a differential spec proving both
    * orientations emit identical output. */
  def triangles(pairs: DataFrame, aCol: String, bCol: String,
      orientByDegree: Boolean = false): DataFrame = {
    // multiple consumers (orientation + triangle join ×3 + degrees) —
    // truncate lineage so the upstream candidate pipeline runs once
    val e0 = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .distinct().localCheckpoint(eager = false)
    val deg0 = e0.select(col("u").as("id"))
      .unionAll(e0.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // the 100 TB skew hardening: each edge points at the larger
    // (deg, id) endpoint, bounding out-degrees by O(√m)
    // (Chiba–Nishizeki) so a hot hub cannot explode the middle join;
    // the OUTPUT is orientation-invariant (each triangle counts once
    // under ANY acyclic orientation — differential-spec'd), so the
    // oracle keeps the id form
    val e = if (!orientByDegree) e0 else {
      val du = deg0.select(col("id").as("u"), col("deg").as("du"))
      val dv = deg0.select(col("id").as("v"), col("deg").as("dv"))
      e0.join(du, "u").join(dv, "v")
        .select(
          when(col("du") < col("dv")
              || (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("fu"), col("v").as("fv")))
            .otherwise(struct(col("v").as("fu"), col("u").as("fv"))).as("e"))
        .select(col("e.fu").as("u"), col("e.fv").as("v"))
        .localCheckpoint(eager = false)
    }
    val deg = deg0
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("deg") >= 2,
            (col("n_tri") * 2) / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)))
  }

  /** Label-propagation communities (Raghavan et al. 2007, synchronous
    * variant with deterministic tie-break) — the graph-clustering
    * complement of [[clusters]]: connected components answer "what is
    * transitively linked", LPA answers "which DENSE region does each
    * node sit in" (a giant weakly-linked component splits into its
    * template cliques). Labels start as node ids; each round every
    * node adopts the most frequent label among its NEIGHBORS, ties to
    * the smallest label — a total order, so fixed `iters` rounds are
    * engine-mirrorable (the oracle unrolls the same rounds, the
    * pageRank discipline).
    *
    * Scale: per round ONE edge→label equi-join + a map-side-combined
    * (node, label) count + one per-node window rank; labels checkpoint
    * per round (flat lineage). Edge partitioning is the hub-skew knob,
    * as for pageRank. */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .localCheckpoint(true)
    val ed = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
    var lbl = ed.select(col("u").as("n")).distinct()
      .select(col("n"), col("n").as("l"))
    val w = Window.partitionBy(col("v")).orderBy(col("c").desc, col("l"))
    for (i <- 1 to iters) {
      lbl = ed.join(lbl, ed("u") === lbl("n"))
        .groupBy(col("v"), col("l")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v").as("n"), col("l"))
      if (i < iters) lbl = lbl.localCheckpoint(true)
    }
    lbl.select(col("n").as("id"), col("l").as("community"))
  }

  /** k-core peeling (Seidman 1983) — the density lens between
    * [[triangles]] (local) and [[labelPropagation]] (global): repeatedly
    * delete nodes of degree < k; what survives is the graph's dense
    * SKELETON. On a near-dup graph the 2-core separates genuine
    * template cliques and mirror rings from the chain-like accidental
    * bridges that inflate component sizes — the structure a keep-one
    * policy review wants isolated. Fixed synchronous `rounds` mirrored
    * by unrolled CTEs (the [[clusters]] fixed-round discipline; peeling
    * converges in ≤ diameter rounds, and a spec pins convergence on the
    * declared fixture). Emits surviving (id, deg in the peeled graph).
    *
    * Scale: per round one map-side-combined degree aggregate + two
    * semi-joins of the edge list against the alive set — equi-joins
    * only, O(E) per round; per-round localCheckpoint keeps the plan
    * tree flat (each round reads the previous edges twice). */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int = 3): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1: $k, $rounds")
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .localCheckpoint(true)
    var ed = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
    for (_ <- 1 to rounds) {
      val alive = ed.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("u")
      ed = ed.join(alive, Seq("u"), "left_semi")
        .join(alive.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(true)
    }
    ed.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("id"), col("deg"))
  }

  /** [[kCore]] run to the FIXPOINT — the unknown-diameter production
    * path (the [[clustersConverged]] discipline): peel until a round
    * removes nothing, detected by the surviving-edge count (peeling is
    * monotone decreasing, so an unchanged count IS convergence — no
    * checksum needed). One cheap count job per round; rounds ≤ the
    * longest pendant path, and each is the same degree-agg + semi-join
    * pair as the fixed form. */
  def kCoreConverged(pairs: DataFrame, aCol: String, bCol: String,
      k: Int, maxRounds: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .localCheckpoint(true)
    var ed = half.unionAll(half.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false) // materialized by the count below
    var n = ed.count()
    var round = 0
    var converged = n == 0
    while (!converged && round < maxRounds) {
      val alive = ed.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("u")
      // LAZY checkpoint + count: the count() action materializes the
      // checkpoint, so each peel round runs ONE job, not a separate
      // eager-checkpoint job plus the count (halves round overhead —
      // loop cost is round-count × job latency, not data volume)
      val next = ed.join(alive, Seq("u"), "left_semi")
        .join(alive.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(eager = false)
      val m = next.count()
      converged = m == n
      ed = next; n = m; round += 1
    }
    ed.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("id"), col("deg"))
  }

  def clusters(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 4): DataFrame = {
    // checkpoint the pair list BEFORE symmetrizing: the union references
    // it twice, which would run the whole upstream candidate pipeline
    // (LSH/Jaccard joins) twice inside one job (measured ~2.3s of
    // dedup_clusters' 5.8s at sf0.1)
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .localCheckpoint(true)
    // each round references the previous labels TWICE (union + join), so
    // without lineage truncation the plan tree doubles per round —
    // 2^iters recomputations of the whole upstream pair pipeline
    // (measured 158s for 8 rounds at sf0.1; seconds when truncated).
    // edges itself is NOT checkpointed: it is a cheap union over the
    // checkpointed half's blocks, so re-deriving it per reference costs
    // less than the extra eager checkpoint job
    val edges = half.union(half.select(col("v").as("u"), col("u").as("v")))
    var labels = edges.select(col("u").as("n")).distinct()
      .select(col("n"), col("n").as("l"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val viaNb = edges
        .join(labels.select(col("n").as("u"), col("l")), "u")
        .select(col("v").as("n"), col("l"))
      labels = labels.union(viaNb).groupBy("n").agg(min(col("l")).as("l"))
      // truncate every OTHER round: a depth-2 lineage costs one cheap
      // recompute of tiny label frames, but halves the checkpoint jobs
      if (i % 2 == 1 || i == iters - 1) labels = labels.localCheckpoint(true)
      i += 1
    }
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * contractions (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the at-scale finisher [[clusters]]'s scaladoc promises:
    * converges in O(log² n) rounds REGARDLESS of component diameter,
    * where plain min-label propagation needs diameter-many rounds.
    *
    *  - large-star: every node's strictly-LARGER neighbors re-attach to
    *    the minimum of its closed neighborhood — one equi-join of the
    *    edge list with the per-node min (a groupBy), emit (v, m) for
    *    v > u;
    *  - small-star: the smaller-or-equal neighbors and the node itself
    *    re-attach to that minimum.
    *
    * Each round is the same shuffle shape as one [[clusters]] round
    * (groupBy min + equi-join on the node id); the win is round COUNT.
    * Convergence is detected by an order-insensitive edge-set checksum
    * (count + sum of per-edge hashes — exact set equality would cost a
    * join; a 64-bit sum collision is negligible) and the result labeled
    * like [[clusters]]: (n, l) with l the component minimum.
    *
    * [[clusters]] (fixed rounds, DuckDB-unrollable) remains the
    * oracle-mirrored mode; this is the production path for graphs whose
    * diameter is unknown — e.g. chained near-dup clusters at 100 TB. */
  def clustersConverged(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): DataFrame = {
    import org.apache.spark.sql.DataFrame
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    // per-node minimum of the closed neighborhood Γ(u) ∪ {u}
    def minMap(e: DataFrame): DataFrame =
      e.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
    def checksum(e: DataFrame): (Long, String) = {
      // hash sum in DECIMAL(38,0): a long sum of 64-bit hashes overflows
      // (ANSI throw)
      val r = e.filter(col("u") < col("v"))
        .agg(count(lit(1)),
          sum(xxhash64(col("u"), col("v"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }
    // checkpoint before sym(): see [[clusters]] — the union would run the
    // upstream pair pipeline twice otherwise
    val half = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .localCheckpoint(true)
    var e = sym(half).localCheckpoint(eager = false) // materialized by checksum
    var prev = checksum(e)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val mL = minMap(e)
      val large = e.join(mL, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // only the post-small-star edge set is checkpointed: the large-star
      // intermediate is referenced twice (minMap + join) but its lineage
      // is one round deep off the previous checkpoint, so the bounded
      // double-recompute of tiny frames costs less than an extra eager
      // checkpoint job per round
      val eL = sym(large)
      val mS = minMap(eL)
      val small = eL.join(mS, "u").filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mS.select(col("u"), col("m").as("v")))
      // LAZY checkpoint: the checksum aggregate is the materializing
      // action, so each contraction round runs ONE job instead of an
      // eager-checkpoint job plus the checksum (round overhead halves;
      // the persisted blocks still truncate lineage for the next round)
      e = sym(small).localCheckpoint(eager = false)
      val cur = checksum(e)
      done = cur == prev
      prev = cur
      round += 1
    }
    require(done, s"star contraction did not converge in $maxRounds rounds")
    // at the fixed point every component is a star around its minimum:
    // l(n) = min(n, min neighbor)
    e.groupBy(col("u").as("n")).agg(min(col("v")).as("mv"))
      .select(col("n"), least(col("n"), col("mv")).as("l"))
  }

  /** Cluster-size histogram — the dedup AUDIT every published pipeline
    * reports (Lee et al. 2021 fig. 4, RefinedWeb table 4 plot cluster /
    * duplicate-group size distributions): from a (node, label) cluster
    * assignment ([[clusters]] / [[clustersConverged]] output), emit one
    * row per distinct cluster SIZE with the number of clusters and docs
    * at that size. Singleton nodes never appear in the pair frame, so
    * the histogram covers only docs with ≥1 near-dup — the population a
    * dedup decision acts on. Two hash aggs (cluster → size, size →
    * count), both with full map-side combine; output ≤ |distinct sizes|
    * rows. */
  def clusterStats(clusters: DataFrame, labelCol: String = "l"): DataFrame =
    clusters.groupBy(col(labelCol)).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))

  /** Corpus-level paragraph (line-span) dedup — the C4 move (Raffel et
    * al. 2020 §2.2 deduplicates three-sentence spans corpus-wide,
    * keep-first): explode documents into lines, keep only the globally
    * FIRST occurrence of each distinct line (ordered by document id,
    * then line position), and reassemble the survivors into documents.
    * Documents whose every line was seen earlier disappear.
    *
    * Scale design: first-occurrence selection is `min(struct(doc, idx))`
    * grouped BY LINE — a hash aggregation with full map-side partial
    * combine, so a boilerplate line repeated millions of times collapses
    * to one row per map task before the shuffle (the skew-killer the
    * row_number()-over-line formulation lacks), and the agg output IS
    * the kept set — no join back. Two shuffles total (line agg, doc
    * regroup), no global sort, no cross join. */
  def paragraphs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val exploded = df.select(col(idCol).as("id"), posexplode(lines).as(Seq("idx", "line")))
    val kept = exploded
      .groupBy("line").agg(min(struct(col("id"), col("idx"))).as("f"))
      .select(col("f.id").as("id"), col("f.idx").as("idx"), col("line"))
    kept.groupBy("id").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          s => s.getField("line")), "\n").as("text"),
      count(lit(1)).as("n_kept"))
  }

  /** Canonical text form for normalization-then-exact dedup — the
    * RefinedWeb/CCNet preprocessing trick (Penedo et al. 2023 §3.3 run
    * exact dedup on a normalized form so trivial variants — case,
    * punctuation, whitespace — collapse): lowercase, strip everything
    * outside [a-z0-9 ], squeeze whitespace runs, trim. ONE codegen'd
    * character scan ([[graft.functions.TextExpressions.CanonicalText]])
    * — the r10 two-`regexp_replace` form ran java.util.regex twice over
    * every full document (the measured cost of dedup_normalized); the
    * regex form remains the executable spec in the differential test.
    * Zero shuffle either way. */
  def canonicalText(text: Column): Column =
    graft.functions.TextExpressions.canonical_text(text)

  /** The two-regex Column formulation — [[canonicalText]]'s executable
    * specification (DedupSimilaritySpec asserts equality on real docs
    * plus adversarial edges). */
  def canonicalTextRegex(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** The SQL twin of [[canonicalText]] (DuckDB regexp_replace needs the
    * explicit 'g' flag where Spark replaces all matches by default). */
  def canonicalTextSql(text: String): String =
    s"trim(regexp_replace(regexp_replace(lower($text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Normalization-then-exact dedup: exact keep-min-id dedup on the
    * [[canonicalText]] key. Same one-shuffle plan as [[exact]] — the
    * canonical form is computed in the scan projection, the group key
    * is its hash. Emits survivor id, duplicate count, and the
    * canonical key's length for audit. */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = canonicalText(col(textCol))
    df.select(col(idCol).as("id"), canon.as("__c"))
      .groupBy(col("__c"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("n"))
      .select(col("id"), col("n"), length(col("__c")).cast("long").as("canon_len"))
  }

  /** Duplicate-SPAN detection and removal — the exact-substring dedup of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499), re-expressed over hashed word n-grams
    * instead of a suffix array: a token is "duplicated" when it is
    * covered by any n-gram whose hash occurs ≥2 times ANYWHERE in the
    * corpus (including twice in the same document — self-repetition
    * counts, as in the paper's suffix-array formulation). Emits per doc
    * the token count, the covered-token count, and the text with every
    * duplicated span removed (the paper's "drop all copies" variant,
    * which it reports trains as well as keep-one and needs no global
    * occurrence ordering — so the plan needs no sort at all).
    *
    * Scale design: gram extraction is one codegen'd projection over a
    * COLLISION-SAFE packed two-chain gram hash
    * ([[graft.functions.HashExpressions.NgramHashWideArray]], collision
    * space P² ≈ 2⁶⁰ — a single mod-P hash at ~2³⁰ would falsely delete
    * distinct grams at the birthday rate G²∕2P, hundreds of spurious
    * span deletions at 10⁶ distinct grams; the wide form's residual is
    * ≈ 5·10⁵ false pairs among 10¹² grams at ~100 TB, a 5·10⁻⁷
    * fraction). The global occurrence count is a hash aggregate on the
    * gram hash with full map-side combine (a boilerplate gram repeated
    * 10⁶× collapses per map task before the shuffle — same skew-killer
    * as [[paragraphs]]); marking is an equi-JOIN back on the gram hash
    * (shuffle bounded by gram occurrences, never |corpus|²); kept-token
    * selection is a LEFT-ANTI equi-join of the exploded (id, ti) token
    * frame against the covered set — O(tokens) total, replacing the
    * r10 per-row `array_contains` scan that cost O(tokens × |covered|)
    * on a single row (~10¹⁰ comparisons for a heavily-duplicated
    * 100k-token web document). No broadcast of corpus-sized state, no
    * global sort, no driver collect. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      posexplode(graft.functions.HashExpressions.ngram_hashes_wide(
        word_hashes(col(textCol)), n)).as(Seq("p", "g")))
    val dupG = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("g")
    val covered = grams.join(dupG, "g")
      .select(col("id"), explode(sequence(col("p"), col("p") + (n - 1))).as("ti"))
      .distinct()
    val cov = covered.groupBy("id").agg(count(lit(1)).as("dup_tokens"))
    // lazily checkpointed: the token frame feeds BOTH the kept-token
    // anti-join and the (id, n_tokens) spine below — without the
    // boundary each consumer would re-scan df (the r11 review found the
    // spine as a third full corpus read)
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("ti", "tok")))
      .localCheckpoint(eager = false)
    // docs whose every token is covered drop out of `kept` — the final
    // left join + coalesce('') restores them with empty clean_text
    val kept = toks.join(covered, Seq("id", "ti"), "left_anti")
      .groupBy("id").agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("ti"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    // the (id, n_tokens) spine comes from the toks frame already scanned
    // above — NOT a third full read of df; split always yields ≥1 token,
    // so no doc drops out of the count
    toks.groupBy("id").agg(count(lit(1)).as("n_tokens"))
      .join(cov, Seq("id"), "left")
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** DuckDB mirror of [[dupSpans]] (shares the word/n-gram hash mirrors
    * with the decontamination oracle). `docs` must provide (id, text). */
  def dupSpansSql(n: Int, docs: String = "documents",
      idCol: String = "doc_id"): String =
    s"""WITH w AS (SELECT $idCol AS id, string_split(text,' ') AS toks,
       |    ${wordHashesSql()} AS whs FROM $docs),
       |gr AS (SELECT id, toks, ${ngramHashesWideSql("whs", n)} AS gs FROM w),
       |oc AS (SELECT id, unnest(gs) AS g,
       |    unnest(list_transform(gs, (x,i) -> i-1)) AS p FROM gr),
       |dg AS (SELECT g FROM oc GROUP BY g HAVING count(*) >= 2),
       |cov AS (SELECT DISTINCT id, p+d AS ti
       |  FROM (SELECT oc.id, oc.p FROM oc JOIN dg USING (g)) dup,
       |    generate_series(0, ${n - 1}) s(d)),
       |agg AS (SELECT id, count(*) AS dup_tokens, list(ti) AS cset
       |  FROM cov GROUP BY id)
       |SELECT gr.id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  coalesce(agg.dup_tokens, 0) AS dup_tokens,
       |  coalesce(array_to_string(list_filter(toks,
       |    (x,i) -> NOT coalesce(list_contains(cset, i-1), FALSE)), ' '), '')
       |    AS clean_text
       |FROM gr LEFT JOIN agg USING (id) ORDER BY id""".stripMargin

  /** Incremental (cross-corpus) dedup — the CommonCrawl-dump workflow:
    * dedup an INCOMING batch against a REFERENCE corpus that is already
    * curated (dump N against dumps 1..N−1), never
    * reference-vs-reference. Two arms: EXACT (content-hash membership
    * in the reference) and NEAR (MinHash band candidates against the
    * reference + exact-Jaccard verify at `tau` — the same
    * signature/band/verify chain as [[minhashLshPairs]]). Emits one row
    * per incoming doc: (id, exact_dup, near_dup, kept) with kept = 1
    * iff neither arm fired — the batch-side twin of the streaming
    * near-dup operator.
    *
    * Scale design: both corpora project to (hash, shingle set, bands)
    * in one pass each; the exact arm is a LEFT-SEMI equi-join on the
    * content hash (the reference never moves for it beyond its hash
    * column); the near arm is a band equi-join bounded by collisions.
    * The corpora never cross-join, and the reference side never
    * self-joins at all — cost ∝ |incoming| + band collisions, so a
    * small daily increment against a 100 TB reference does incremental
    * work, not corpus-scale work. */
  def incrementalDedup(reference: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, tau: Double): DataFrame = {
    val ref = incPrep(reference, idCol, textCol)
    val inc = incPrep(incoming, idCol, textCol)
    val exactHits = inc.select(col("id"), col("h"))
      .join(ref.select(col("h")).distinct(), Seq("h"), "left_semi")
      .select(col("id"))
    incFlags(ref, inc, tau, exactHits)
  }

  /** [[incrementalDedup]] with the EXACT arm's reference-membership test
    * behind a BLOOM prefilter — the [[Decontaminate.contaminatedBloom]]
    * pattern applied to cross-corpus dedup. At 100 TB the reference's
    * content-hash inventory is itself corpus-sized, so the plain
    * LEFT-SEMI arm shuffles |incoming| + |reference| hash rows on every
    * increment; here the reference hashes aggregate ONCE into a
    * broadcast Bloom bitset (bits ∝ |ref|·ln(1∕fpp) — the bitset ships
    * where a hash TABLE of a 100 TB corpus cannot), incoming rows probe
    * it MAP-SIDE, and only Bloom-positives meet the reference in the
    * exact verify semi-join, now sized by true dups + fpp·|incoming|
    * instead of |reference|. False positives add verify probes, never
    * output rows — the result is bit-identical to [[incrementalDedup]]
    * (differential spec) and shares its oracle verbatim. The near arm
    * (band equi-join + exact-Jaccard verify) is unchanged: its
    * collision-bounded candidates are already incremental-sized.
    * Driver cost: two actions over the reference HASH COLUMN only
    * (count sizes the filter, bloomFilter folds it) — in a production
    * increment loop both belong to the reference's build time, not the
    * per-increment path (persist the bitset with the curated corpus). */
  def incrementalDedupBloom(reference: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, tau: Double,
      fpp: Double = 0.01): DataFrame = {
    val ref = incPrep(reference, idCol, textCol)
    val inc = incPrep(incoming, idCol, textCol)
    // 3 consumers (count / bloom fold / verify semi-join); lazy
    // localCheckpoint, not persist — the semi-join's strategy doesn't
    // hang on this frame's stats (the reference side is the BIG side by
    // design), and checkpoint blocks are ContextCleaner-reclaimed, so an
    // increment loop doesn't accumulate CacheManager entries per call
    val refH = ref.select(col("h")).localCheckpoint(eager = false)
    val nRef = math.max(refH.count(), 1L)
    val bloom = refH.stat.bloomFilter("h", nRef, fpp)
    val bc = reference.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((h: String) => bc.value.mightContainString(h))
    val exactHits = inc.select(col("id"), col("h"))
      .filter(might(col("h")))
      .join(refH.distinct(), Seq("h"), "left_semi")
      .select(col("id"))
    incFlags(ref, inc, tau, exactHits)
  }

  /** Shared (id, content hash, distinct shingles, MinHash bands)
    * projection of the incremental-dedup arms. */
  private def incPrep(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("h"),
        array_distinct(shingle_hashes(word_hashes(col(textCol)))).as("ds"))
      .withColumn("nd", size(col("ds")).cast("long"))
      .withColumn("bands", bands(minhash_sig(col("ds"))))
      .localCheckpoint(eager = false) // 2–3 consumers each; see ivfAssign

  /** The near arm + per-doc flag assembly shared by the plain and
    * Bloom-prefiltered exact arms. */
  private def incFlags(ref: DataFrame, inc: DataFrame, tau: Double,
      exactHits: DataFrame): DataFrame = {
    val bi = inc.select(col("id"), posexplode(col("bands")).as(Seq("bi", "bv")))
    val br = ref.select(col("id").as("rid"), posexplode(col("bands")).as(Seq("bi", "bv")))
    val cand = bi.join(br, Seq("bi", "bv")).select(col("id"), col("rid")).distinct()
    val nearHits = cand
      .join(inc.select(col("id"), col("ds").as("dsi"), col("nd").as("ni")), Seq("id"))
      .join(ref.select(col("id").as("rid"), col("ds").as("dsr"), col("nd").as("nr")), Seq("rid"))
      .withColumn("common", size(array_intersect(col("dsi"), col("dsr"))).cast("long"))
      .filter(col("common") / (col("ni") + col("nr") - col("common")) >= tau)
      .select(col("id")).distinct()
    inc.select(col("id"))
      .join(exactHits.withColumn("__e", lit(1)), Seq("id"), "left")
      .join(nearHits.withColumn("__n", lit(1)), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__e"), lit(0)).as("exact_dup"),
        coalesce(col("__n"), lit(0)).as("near_dup"))
      .withColumn("kept",
        (col("exact_dup") === 0 && col("near_dup") === 0).cast("int"))
  }

  /** SoftDeDup-style duplication REWEIGHTING (He et al. 2024, "SoftDedup:
    * an Efficient Data Reweighting Method for Speeding Up Language Model
    * Pre-training", arXiv:2407.04203): instead of REMOVING duplicated
    * text, down-weight it — commonness of a doc = mean corpus frequency
    * of its word n-gram hashes, sampling weight = 1∕commonness =
    * n_grams∕Σ freq ∈ (0, 1], with weight 1 for unduplicated docs and
    * docs too short to form a gram (no duplication evidence). Keeps the
    * long-tail information duplicates carry while flattening their
    * effective epoch count — the paper's trade vs hard dedup.
    *
    * Scale design: same skeleton as [[dupSpans]] minus text
    * reconstruction — one codegen'd gram projection (collision-safe
    * wide hash), a map-side-combined gram-frequency aggregate, an
    * equi-join back on the gram hash, one per-doc aggregate. The only
    * division is the final weight (one IEEE double op, engine-exact).
    * No sort, no cartesian, no driver state. */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(graft.functions.HashExpressions.ngram_hashes_wide(
        word_hashes(col(textCol)), n)).as("g"))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("f"))
    val perDoc = grams.join(freq, "g").groupBy("id").agg(
      count(lit(1)).as("n_grams"), sum(col("f")).as("sum_freq"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("sum_freq"), lit(0L)).as("sum_freq"),
        when(col("n_grams").isNull, lit(1.0))
          .otherwise(col("n_grams").cast("double") / col("sum_freq").cast("double"))
          .as("weight"))
  }

  /** DuckDB mirror of [[softDedupWeights]]. */
  def softDedupWeightsSql(n: Int, docs: String = "documents",
      idCol: String = "doc_id"): String =
    s"""WITH w AS (SELECT $idCol AS id, ${wordHashesSql()} AS whs FROM $docs),
       |gr AS (SELECT id, unnest(${ngramHashesWideSql("whs", n)}) AS g FROM w),
       |fq AS (SELECT g, count(*) AS f FROM gr GROUP BY g),
       |pd AS (SELECT id, count(*) AS n_grams, sum(f) AS sum_freq
       |  FROM gr JOIN fq USING (g) GROUP BY id)
       |SELECT w.id, coalesce(pd.n_grams, 0) AS n_grams,
       |  CAST(coalesce(pd.sum_freq, 0) AS BIGINT) AS sum_freq,
       |  CASE WHEN pd.n_grams IS NULL THEN 1.0
       |       ELSE CAST(pd.n_grams AS DOUBLE) / CAST(pd.sum_freq AS DOUBLE) END
       |    AS weight
       |FROM w LEFT JOIN pd USING (id) ORDER BY id""".stripMargin

  /** Exhaustive embedding near-dup pairs: all-pairs cross join with exact
    * fixed-point (1e6) BIGINT dot products. O(n²) — brute-force-only, for
    * small inputs and as the recall oracle for [[embeddingPairs]]; never
    * the production path at scale. */
  def embeddingPairsExact(df: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    val fx = Similarity.fixedPoint(df, idCol, vecCol)
    val a = fx.select(col("id").as("va"), col("fx").as("fa"), col("nrm").as("na"))
    val b = fx.select(col("id").as("vb"), col("fx").as("fb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("dot", fixed_dot(col("fa"), col("fb")))
      .withColumn("cos", col("dot") / sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= tau)
      .select("va", "vb", "cos")
  }
}
