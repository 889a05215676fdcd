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

  test("word hash stays in [0,P) on arbitrarily long unbroken tokens") {
    // regression (r11 review): raw 131^k multipliers overflowed the
    // per-word accumulator NEGATIVE after ~650 chars of one token
    // (base64/minified-JS shapes), breaking the [0,P) contract the gram
    // packing injectivity and pmod-vs-% mirror parity rest on
    import spark.implicits._
    val long = Seq(
      ("a" * 100000) + " tail",
      "zq9" * 50000,
      ("x" * 649) + " " + ("y" * 651)).toDF("text")
    val rows = long.select(HE.word_hashes(col("text")).as("f"),
        MH.wordHashes(col("text")).as("s"))
      .collect()
    rows.foreach { r =>
      val f = r.getSeq[Long](0); val s = r.getSeq[Long](1)
      assert(f == s)
      f.foreach(h => assert(h >= 0 && h < MH.P, s"hash $h out of [0,P)"))
    }
  }

  test("shingle_hashes == MirrorHash.shingleHashes") {
    assertSame(HE.shingle_hashes(HE.word_hashes(col("text"))),
      MH.shingleHashes(MH.wordHashes(col("text"))))
  }

  test("winnow == MirrorHash.winnowSelect across window sizes") {
    // materialize the gram arrays FIRST: element_at inside the HOF spec
    // re-evaluates its input expression per access once CollapseProject
    // inlines it (the simhash 340s lesson) — the spec compares the
    // winnowing step, not the hash pipeline (covered above)
    val grams = docs
      .select(HE.shingle_hashes(HE.word_hashes(col("text"))).as("hs"))
      .localCheckpoint(true)
    Seq(1, 2, 4, 7).foreach { w =>
      val diff = grams.select(HE.winnow(col("hs"), w).as("a"),
          MH.winnowSelect(col("hs"), w).as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(diff == 0, s"w=$w")
    }
  }

  test("winnow edge cases: empty, short-doc single window, all-equal ties") {
    import spark.implicits._
    val cases = Seq(
      "",                       // no words -> no grams -> empty selection
      "a b",                    // < 3 words -> no grams
      "a b c",                  // one gram, m < w
      "a b c d e",              // 3 grams, m < w=4: single full window
      "x x x x x x x x x x")    // all-equal gram hashes: leftmost ties
      .toDF("text")
    val out = cases.select(
        HE.winnow(HE.shingle_hashes(HE.word_hashes(col("text"))), 4).as("a"),
        MH.winnowSelect(MH.shingleHashes(MH.wordHashes(col("text"))), 4).as("b"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
    // all-equal hashes: every window's leftmost min is its start index,
    // so the selection is every window-start position 0..m-w
    val ties = cases.filter(col("text").startsWith("x"))
      .select(HE.winnow(HE.shingle_hashes(HE.word_hashes(col("text"))), 4).as("a"))
      .head().getSeq[Long](0)
    assert(ties.map(p => p / MH.P) == (0L to 4L), ties.toString) // 8 grams, w=4
  }

  test("winnowing guarantee: a shared >= w+k-1-word run shares a fingerprint hash") {
    import spark.implicits._
    // k=3 shingles, w=4 windows -> guarantee length 6 words; the run
    // below is planted inside unrelated prefixes/suffixes at different
    // positions in each document
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $run four five"),
      (2L, s"$run nine ten eleven twelve thirteen fourteen")).toDF("doc_id", "text")
    val fps = graft.operators.TextAnalysis.winnow(docs, "doc_id", "text", 4)
    val shared = fps.filter(col("id") === 1).select("gh")
      .intersect(fps.filter(col("id") === 2).select("gh")).count()
    assert(shared >= 1)
  }

  test("winnowPairs hot-gram cap: capped pairs lose only hot-hash evidence") {
    import spark.implicits._
    val docs2 = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def pairs(cap: Option[Int]) =
      graft.operators.Dedup.winnowPairs(docs2, "doc_id", "text", 4, 1L, cap)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val un = pairs(None)
    val capped = pairs(Some(2)) // drop fingerprints shared by > 2 docs
    // the cap can only REMOVE evidence: every capped pair exists
    // uncapped with at least as much shared weight
    capped.foreach { case (k, s) =>
      assert(un.contains(k) && un(k) >= s, s"$k: capped $s vs ${un.get(k)}")
    }
    assert(capped.size <= un.size)
    // and with an infinite cap the result is identical to uncapped
    assert(pairs(Some(Int.MaxValue)) == un)
  }

  test("gopher profile: planted duplicates hit every mass field (hand-computed)") {
    import spark.implicits._
    // "a b c d e f a b c d e f": the 6-gram repeats at 0 and 6, so
    // every 5/6-gram duplicates and coverage is all 12 tokens; 7/8-grams
    // are all distinct; top-2-gram "a b" (count 2, binary-min tie) has
    // char mass 2*2
    val out = graft.operators.TextAnalysis.repetitionFull(
        Seq((1L, "a b c d e f a b c d e f")).toDF("doc_id", "text"),
        "doc_id", "text")
      .head()
    assert(out.getLong(1) == 12L) // n_chars
    assert(out.getDouble(2) == 4.0 / 12) // top2
    assert(out.getDouble(3) == 6.0 / 12) // top3 "a b c" x2, mass 2*3
    assert(out.getDouble(4) == 8.0 / 12) // top4
    assert(out.getDouble(5) == 1.0) // dup5 covers everything
    assert(out.getDouble(6) == 1.0) // dup6
    assert(out.getDouble(7) == 0.0) // 7-grams distinct
    assert(out.getDouble(8) == 0.0)
  }

  test("minhash_sig == MirrorHash.minhashSig") {
    assertSame(HE.minhash_sig(HE.shingle_hashes(HE.word_hashes(col("text")))),
      MH.minhashSig(MH.shingleHashes(MH.wordHashes(col("text")))))
  }

  test("simhash30 == MirrorHash.simhash") {
    assertSame(HE.simhash30(HE.shingle_hashes(HE.word_hashes(col("text")))),
      MH.simhash(MH.shingleHashes(MH.wordHashes(col("text")))))
  }

  test("hyperplane_sig == HOF bucket specification (shared plane indices)") {
    // tables=1, planes=8 makes HyperplaneSig's single band use plane
    // indices 0..7 — exactly the production bucket's planes. The HOF
    // formulation below (interpreted Columns over the same PlaneHash
    // weights, the shape of the DuckDB mirror Similarity.bucketSql) IS
    // the executable specification — it lives here since production
    // hyperplaneBuckets now uses the codegen'd expression directly.
    def planeWeight(j: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val m = graft.functions.PlaneHash.M
      val h1 = (j * 64L + d) * 2654435761L % m
      h1 * h1 % m * 2246822519L % 97L - 48L
    }
    val pow2 = array((0 until 8).map(b => lit(1L << b)): _*)
    val hofBucket = aggregate(
      transform(sequence(lit(0), lit(7)), j =>
        when(aggregate(
          transform(col("fx"), (x, d) =>
            x * planeWeight(j.cast("long"), d.cast("long"))),
          lit(0L), (a, x) => a + x) >= 0,
          element_at(pow2, j.cast("int") + 1)).otherwise(0L)),
      lit(0L), (a, x) => a + x)
    val both = graft.operators.Similarity
      .hyperplaneBuckets(emb, "vec_id", "embedding")
      .select(col("id"), col("bucket"), hofBucket.as("spec_bucket"))
    assert(both.filter(col("bucket") =!= col("spec_bucket")).count() == 0)
    assert(both.count() == emb.count())
  }

  test("fixed_point_vec == transform(round(x*1e6)) HOF, incl. half-way values") {
    // production fixedPoint uses the codegen'd expression; the HOF form
    // (the DuckDB mirror's shape) is the specification. Adversarial
    // values: exact ±k.5 micro-unit boundaries (round-half direction),
    // subnormal-ish tiny values, zeros, and the real embedding floats.
    import spark.implicits._
    val spec = transform(col("v"), x => round(x * 1e6).cast("long"))
    val adversarial = Seq(
      Array(2.5e-6, -2.5e-6, 0.5e-6, -0.5e-6, 3.5e-6, -3.5e-6),
      Array(0.0, -0.0, 1e-12, -1e-12, 9.87654321, -9.87654321),
      Array(0.4999999999999999e-6, -0.4999999999999999e-6, 1.0, -1.0))
      .toDF("v")
    assert(adversarial.select(HE.fixed_point_vec(col("v")).as("a"), spec.as("b"))
      .filter(not(col("a") <=> col("b"))).count() == 0)
    val onReal = emb.select(col("embedding").cast("array<double>").as("v"))
      .select(HE.fixed_point_vec(col("v")).as("a"), spec.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(onReal == 0)
    // null array and null element pass through
    val withNulls = Seq[Option[Seq[Option[Double]]]](
      None, Some(Seq(Some(1.5e-6), None, Some(-1.5e-6)))).toDF("v")
    assert(withNulls.select(HE.fixed_point_vec(col("v")).as("a"), spec.as("b"))
      .filter(not(col("a") <=> col("b"))).count() == 0)
  }

  test("fixedDotSq 128-bit arithmetic == BigInteger reference (randomized)") {
    // the unsigned multiplyHigh corrections and carry detection are the
    // subtle part — drive them with randomized magnitudes up to the
    // full documented domain (Σ x²·w < 2¹²⁷), checked against exact
    // BigInteger arithmetic on the driver
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val pairGen = for {
      n <- Gen.choose(0, 24)
      vs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1000000L, 1000000L),          // embedding micro domain
        Gen.choose(-9000000000L, 9000000000L),    // Long-overflowing squares
        Gen.oneOf(0L, 1L, -1L, 3037000499L, -3037000500L)))
      ws <- Gen.listOfN(n, Gen.choose(0L, 2000000L))
    } yield (vs, ws)
    val params = org.scalacheck.Gen.Parameters.default
    (0 until 300).foreach { i =>
      val (vs, ws) = pairGen.pureApply(params, Seed(i.toLong))
      val got = HE.fixedDotSq(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vs.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ws.toArray))
        .toJavaBigDecimal.toBigInteger
      val want = vs.zip(ws).map { case (v, w) =>
        java.math.BigInteger.valueOf(v).pow(2)
          .multiply(java.math.BigInteger.valueOf(w))
      }.foldLeft(java.math.BigInteger.ZERO)(_ add _)
      assert(got === want, s"seed $i: vs=$vs ws=$ws")
    }
  }

  test("roundFix: JDK-6430675 tie value rounds like Spark HALF_UP, not floor(+0.5)") {
    // 0.49…94 + 0.5 lands exactly on the 1.0 round-to-even tie: the
    // floor(+0.5) trick says 1, decimal HALF_UP (Spark round) says 0
    assert(HE.roundFix(0.49999999999999994) === 0L)
    assert(HE.roundFix(-0.49999999999999994) === 0L)
    assert(HE.roundFix(0.5) === 1L)
    assert(HE.roundFix(-0.5) === -1L)
    assert(HE.roundFix(1.5) === 2L)
    assert(HE.roundFix(-2.5) === -3L)
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

  test("fixed_dot_sq == DECIMAL(38,0) HOF fold, incl. Long-overflowing squares") {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def specCol(v: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column) =
      aggregate(zip_with(v, w, (x, y) => x.cast(dec) * x * y),
        lit(0L).cast(dec), _ + _)
    // real embedding micro-values (weights must be NON-NEGATIVE per the
    // expression contract — the ewm micro-weight domain; values may be
    // negative, their square is taken inside)
    val fx = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * 1e6).cast("long")).as("fx"),
      transform(col("embedding").cast("array<double>"),
        x => abs(round(x * 1e6)).cast("long")).as("w")).limit(50)
    val d1 = fx.select(HE.fixed_dot_sq(col("fx"), col("w")).as("fast"),
        specCol(col("fx"), col("w")).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(d1 == 0)
    // adversarial magnitudes: v² overflows a Long (|v| > 3.03e9), negative
    // values, ewm-scale weights — the 128-bit path must match Decimal
    val hard = Seq(
      (Seq(4000000000L, -4000000000L, 3037000500L), Seq(1000000L, 999999L, 1L)),
      (Seq(9000000000L, 1L, -7L), Seq(1000000L, 1000000L, 1000000L)),
      (Seq.empty[Long], Seq.empty[Long]))
      .toDF("v", "w")
    val d2 = hard.select(HE.fixed_dot_sq(col("v"), col("w")).as("fast"),
        specCol(col("v"), col("w")).as("spec"))
      .filter(not(col("fast") <=> col("spec"))).count()
    assert(d2 == 0)
  }
}
