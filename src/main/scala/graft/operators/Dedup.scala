package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MirrorHash._
import graft.functions.HashExpressions.{word_hashes, shingle_hashes, minhash_sig, simhash30, fixed_dot}

/** Deduplication operators for large-scale text corpora: exact,
  * n-gram-Jaccard, MinHash-LSH, SimHash-band. Everything is expressed as
  * declarative DataFrame plans so Catalyst handles pushdown and AQE
  * handles skew.
  *
  * Scale design (100 TB):
  *  - never an all-pairs cross join: candidate generation is an
  *    inverted-index or band-bucket equi-join, which shuffles on the
  *    bucket key and scales with the number of *colliding* pairs;
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

  /** Per-doc distinct 3-gram shingle hashes: id, ds (array), nd (count). */
  def shingleDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(shingle_hashes(word_hashes(col(textCol)))).as("ds"))
      .withColumn("nd", size(col("ds")).cast("long"))

  /** Exact n-gram Jaccard pairs with J ≥ tau via an inverted shingle
    * index self-join (no cross join). `maxShingleFreq` drops shingles
    * appearing in more docs than the cap from candidate generation. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, maxShingleFreq: Option[Int] = None): DataFrame = {
    val docs = shingleDocs(df, idCol, textCol).cache()
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
      .withColumn("j", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("j") >= tau)
      .select("da", "db", "common", "na", "nb", "j")
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
    val docs = df.select(col(idCol).as("id"),
        array_distinct(shingle_hashes(word_hashes(col(textCol)))).as("ds"))
      .withColumn("nd", size(col("ds")).cast("long"))
      .withColumn("sig", minhash_sig(col("ds")))
      .withColumn("bands", bands(col("sig")))
      .drop("sig")
      .cache()
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
    val docs = simhashDocs(df, idCol, textCol)
      .withColumn("bands", simhashBands(col("sh"), nb)).cache()
    val ex = docs.select(col("id"), col("sh"), posexplode(col("bands")).as(Seq("bi", "bv")))
    ex.as("x").join(ex.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hd"))
      .distinct()
      .filter(col("hd") <= maxHd)
  }

  /** Embedding near-dup pairs with cosine ≥ tau. Fixed-point (1e6) BIGINT
    * dot products keep the arithmetic exact and order-independent.
    * All-pairs within `joinOn` buckets; pass None for brute force (small
    * inputs / verification) — the ANN path lives in Similarity. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    val fx = df.select(col(idCol).as("id"),
        transform(col(vecCol).cast("array<double>"),
          x => round(x * 1e6).cast("long")).as("fx"))
      .withColumn("nrm", aggregate(transform(col("fx"), x => x * x),
        lit(0L), (a, x) => a + x))
    val a = fx.select(col("id").as("va"), col("fx").as("fa"), col("nrm").as("na"))
    val b = fx.select(col("id").as("vb"), col("fx").as("fb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("dot", fixed_dot(col("fa"), col("fb")))
      .withColumn("cos", col("dot") / sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= tau)
      .select("va", "vb", "cos")
  }
}
