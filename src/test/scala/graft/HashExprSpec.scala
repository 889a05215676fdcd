package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions => HE, MirrorHash => MH}

/** Differential check: the native Catalyst expressions must compute
  * exactly what the HOF Column specification (and therefore the DuckDB
  * oracle) computes, on real document data. */
class HashExprSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text")
  private lazy val emb =
    spark.read.parquet(s"$sf001/embeddings.parquet")

  private def assertSame(fast: org.apache.spark.sql.Column,
      spec: org.apache.spark.sql.Column): Unit = {
    val diff = docs.select(fast.as("a"), spec.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("word_hashes == MirrorHash.wordHashes") {
    assertSame(HE.word_hashes(col("text")), MH.wordHashes(col("text")))
  }

  test("shingle_hashes == MirrorHash.shingleHashes") {
    assertSame(HE.shingle_hashes(HE.word_hashes(col("text"))),
      MH.shingleHashes(MH.wordHashes(col("text"))))
  }

  test("minhash_sig == MirrorHash.minhashSig") {
    assertSame(HE.minhash_sig(HE.shingle_hashes(HE.word_hashes(col("text")))),
      MH.minhashSig(MH.shingleHashes(MH.wordHashes(col("text")))))
  }

  test("simhash30 == MirrorHash.simhash") {
    assertSame(HE.simhash30(HE.shingle_hashes(HE.word_hashes(col("text")))),
      MH.simhash(MH.shingleHashes(MH.wordHashes(col("text")))))
  }

  test("hyperplane_sig == Similarity's HOF bucket (shared plane indices)") {
    // tables=1, planes=8 makes HyperplaneSig's single band use plane
    // indices 0..7 — exactly hyperplaneBuckets' planes, independently
    // formulated as interpreted HOF Columns over the same PlaneHash
    // weights; the codegen'd expression must agree bit-for-bit
    val viaExpr = graft.operators.Similarity
      .fixedPoint(emb, "vec_id", "embedding")
      .select(col("id"), element_at(
        HE.hyperplane_sig(col("fx"), 1, 8, 64), 1).as("band"))
    val viaHof = graft.operators.Similarity
      .hyperplaneBuckets(emb, "vec_id", "embedding")
      .select(col("id"), col("bucket"))
    val joined = viaExpr.join(viaHof, "id")
    assert(joined.filter(col("band") =!= col("bucket")).count() == 0)
    assert(joined.count() == emb.count())
  }

  test("fixed_dot == zip_with/aggregate dot") {
    val fx = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * 1e6).cast("long")).as("fx")).limit(50)
    val pairs = fx.as("a").crossJoin(fx.as("b"))
    val diff = pairs.select(
        HE.fixed_dot(col("a.fx"), col("b.fx")).as("fast"),
        aggregate(zip_with(col("a.fx"), col("b.fx"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(diff == 0)
  }
}
