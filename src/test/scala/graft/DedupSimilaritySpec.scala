package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dedup / similarity operator properties on sf0.001 documents. */
class DedupSimilaritySpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("exact dedup: one group per distinct text, counts sum to row count") {
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.agg(sum("n")).head.getLong(0) == docs.count())
    assert(d.count() == docs.select("text").distinct().count())
  }

  test("jaccard pairs: symmetric bounds 0<j<=1 and da<db") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).cache()
    assert(p.filter(col("j") < 0.5 || col("j") > 1.0).count() == 0)
    assert(p.filter(col("da") >= col("db")).count() == 0)
  }

  test("prefix-filtered jaccard == full inverted-index jaccard (exact recall)") {
    // the PPJoin guarantee: prefix candidates lose NOTHING at any tau
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("da", "db", "common").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 0.6))
    val pref = pairs(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 5))
    assert(pref === full)
    assert(full.nonEmpty, "fixture must exercise at least one pair")
  }

  test("prefix index posts strictly fewer postings than the full index") {
    import spark.implicits._
    val d = Dedup.shingleDocs(docs, "doc_id", "text")
    val fullPostings = d.select(explode(col("ds"))).count()
    // replicate the operator's prefix rule to measure its posting mass
    val inv = d.select(col("id"), col("nd"), explode(col("ds")).as("h"))
    val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("h"))
    val prefPostings = inv.join(dfreq, Seq("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("nd") - expr("(3 * nd + 4) div 5") + 1)
      .count()
    assert(prefPostings < fullPostings,
      s"prefix index must shrink the join: $prefPostings vs $fullPostings")
  }

  test("prefix rule catches a pair exactly AT the threshold") {
    import spark.implicits._
    // two 5-shingle docs sharing 4 shingles + one noise doc:
    // J = 4/(5+5-4) = 2/3 >= 3/5; at tau=2/3 exactly, still caught
    val a = "w1 w2 w3 w4 w5 w6 w7"             // 5 3-gram shingles
    val b = "w1 w2 w3 w4 w5 w6 zz"             // shares 4 of them
    val c = "q1 q2 q3 q4 q5 q6 q7"
    val lit3 = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsPrefix(lit3, "doc_id", "text", 2, 3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("kCore peels a chain away and keeps the clique (planted graph)") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + a pendant chain 4-5-6-7: each peel round
    // removes the chain's current endpoint, so 3 rounds are needed
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("da", "db")
    val core = graft.operators.Dedup.kCore(pairs, "da", "db", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore declared rounds reach the fixpoint on the jaccard fixture") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      .localCheckpoint(true)
    def run(rounds: Int) = graft.operators.Dedup.kCore(pairs, "da", "db", 2, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(3) === run(4), "one more peel round must change nothing")
    // and the converged form agrees with the settled fixed-round form
    val conv = graft.operators.Dedup.kCoreConverged(pairs, "da", "db", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(conv === run(3))
  }

  test("kCoreConverged peels a LONG pendant chain a fixed 3 rounds misses") {
    import spark.implicits._
    // triangle {1,2,3} + a 6-node pendant chain: needs 6 peel rounds
    val pairs = (Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++
      (3L to 8L).map(i => (i, i + 1))).toDF("da", "db")
    val fixed3 = graft.operators.Dedup.kCore(pairs, "da", "db", 2, 3)
      .collect().map(_.getLong(0)).toSet
    val conv = graft.operators.Dedup.kCoreConverged(pairs, "da", "db", 2)
      .collect().map(_.getLong(0)).toSet
    assert(conv === Set(1L, 2L, 3L))
    assert(fixed3 !== conv, "the fixture must demonstrate why convergence matters")
  }

  test("kCenter picks the farthest point each round (planted line)") {
    import spark.implicits._
    val pts = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(10.0, 0.0)), (4L, Seq(10.001, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenter(pts, "vec_id", "embedding", 3)
      .orderBy("round").collect().map(r => (r.getLong(0), r.getLong(1)))
    // seed = min id (1); round 2 = farthest from 1 (4 beats 3 by a
    // hair); round 3 = the point with the largest min-distance to
    // {1, 4}: 2 (d²=1) beats 3 (d² to 4 is ~1e-6)
    assert(got.toSeq === Seq((1L, 1L), (2L, 4L), (3L, 2L)))
  }

  test("kCenter coverage gap is non-increasing and rounds are distinct ids") {
    val sel = Similarity.kCenter(emb, "vec_id", "embedding", 6)
      .orderBy("round").collect()
    assert(sel.length == 6)
    assert(sel.map(_.getLong(1)).distinct.length == 6)
    val gaps = sel.drop(1).map(_.getLong(2))
    assert(gaps.zip(gaps.tail).forall { case (a, b) => b <= a },
      s"farthest-point gaps must not increase: ${gaps.mkString(",")}")
  }

  test("minhash-LSH pairs are a subset of exact jaccard pairs") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.6)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    // LSH with 4 bands at J>=0.6 should recall nearly everything here
    assert(exact.isEmpty || lsh.size >= exact.size / 2)
  }

  test("simhash band pairs: exact recall vs brute force for hd<=4") {
    val sh = Dedup.simhashDocs(docs, "doc_id", "text").cache()
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("hd", bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long"))
      .filter(col("hd") <= 4)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", 4)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute) // pigeonhole: 5 bands guarantee hd<=4 recall
  }

  test("brute-force topk: k rows per query, descending cosine") {
    val t = Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 3, 5).cache()
    assert(t.groupBy("qid").count().filter(col("count") =!= 5).count() == 0)
    val perQ = t.orderBy("qid", "rn").collect().grouped(5)
    perQ.foreach { g =>
      val cosines = g.map(_.getAs[Double]("cos")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("bucketed ANN topk: results come from the query's bucket") {
    val b = Similarity.hyperplaneBuckets(emb, "vec_id", "embedding")
      .select(col("id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = Similarity.bucketedTopK(emb, "vec_id", "embedding", _ < 3, 3).collect()
    t.foreach { r =>
      assert(b(r.getAs[Long]("qid")) == b(r.getAs[Long]("vec_id")))
    }
  }

  test("clusters: min-label propagation finds transitive dup groups") {
    import spark.implicits._
    // chain 1-2-3, pair 5-6, chain 7-8-9-10 (diameter 3)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (8L, 9L), (9L, 10L))
      .toDF("da", "db")
    val got = Dedup.clusters(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L))
  }

  test("star contraction converges on a long path that fixed rounds leave unmerged") {
    import spark.implicits._
    // a 24-node path: diameter 23 >> the 4 fixed propagation rounds
    val path = (0L until 23L).map(i => (i, i + 1)).toDF("da", "db")
    val fixed = Dedup.clusters(path, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixed-round propagation is honest about its limit: far nodes have
    // NOT reached label 0 yet
    assert(fixed.values.toSet.size > 1, fixed.toString)
    val star = Dedup.clustersConverged(path, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == (0L to 23L).map(_ -> 0L).toMap, star.toString)
  }

  test("star contraction == fixed-round propagation on converged inputs") {
    import spark.implicits._
    // random sparse graph with small components (the near-dup regime):
    // both algorithms must produce identical labelings
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("da", "db")
    val fixed = Dedup.clusters(pairs, "da", "db", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.clustersConverged(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == fixed, s"star=$star fixed=$fixed")
  }

  test("IVF topk: k rows per query, descending cosine") {
    val t3 = Similarity.ivfTopK(emb, "vec_id", "embedding", _ < 3, 3).cache()
    assert(t3.groupBy("qid").count().filter(col("count") =!= 3).count() == 0)
    t3.orderBy("qid", "rn").collect().grouped(3).foreach { g =>
      val cs = g.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("embedding LSH pairs: exact precision, full recall vs brute force") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.45))
    val lsh = pairs(Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.45))
    // precision is structurally exact (candidates verified with the same
    // fixed-point cosine); recall on this data is measured 100% — see
    // Dedup.embeddingPairs scaladoc for the tuning story at other scales
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("C4 cleanLines: filters, terminal punct, in-doc keep-first dedup") {
    import spark.implicits._
    val d = Seq(
      (1L, "Good line one.\nshort\nGood line one.\nbad word here spam.\nAnother keeper stays!"),
      (2L, "no punct at all here\nonly line"),
      (3L, "Solo survivor stays put.")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.cleanLines(d, "doc_id", "text",
        minWordsPerLine = 3, minLines = 1, badWords = Seq("spam."),
        requireTerminalPunct = true)
      .orderBy("id").collect()
    // doc 1: dup "Good line one." collapses, "short" (<3 words) and the
    // spam line drop → 2 lines; doc 2: no terminal punct → 0 lines → doc
    // dropped; doc 3: kept as-is
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getString(1) == "Good line one.\nAnother keeper stays!")
    assert(out(0).getAs[Long]("n_lines") == 2L)
    assert(out(0).getAs[Long]("n_dropped") == 3L)
    assert(out(1).getString(1) == "Solo survivor stays put.")
  }

  test("C4 paragraphs: corpus-wide keep-first line dedup reassembles docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta\ncommon boilerplate\ngamma delta"),
      (2L, "common boilerplate\nunique two"),
      (3L, "common boilerplate") // every line seen earlier → doc vanishes
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.paragraphs(d, "doc_id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getString(1) == "alpha beta\ncommon boilerplate\ngamma delta")
    assert(out(0).getAs[Long]("n_kept") == 3L)
    assert(out(1).getString(1) == "unique two")
    assert(out(1).getAs[Long]("n_kept") == 1L)
  }

  test("auto-sized LSH tables (T ∝ ln n) hold full recall at two scales") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the default tables=0 path sizes T from df.count(); both corpus
    // scales must keep recall == the exhaustive brute force
    Seq(emb, spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))
      .foreach { e =>
        val n = e.count()
        val t = graft.operators.Dedup.autoTables(n)
        assert(t >= 64 && t <= 256, s"autoTables($n) = $t out of expected range")
        val exact = pairs(Dedup.embeddingPairsExact(e, "vec_id", "embedding", 0.45))
        val auto = pairs(Dedup.embeddingPairs(e, "vec_id", "embedding", 0.45))
        assert(exact.nonEmpty)
        assert(auto == exact, s"n=$n T=$t missing=${exact -- auto} extra=${auto -- exact}")
      }
  }

  test("dupSpans: planted cross-doc span covered in both docs, self-repeat counts") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"dup$i").mkString(" ") // one 8-gram
    val df = Seq(
      (1L, s"alpha beta $span gamma delta epsilon zeta eta theta"),
      (2L, s"$span iota kappa lambda mu nu xi omicron pi"),
      (3L, "unique words only here nothing repeats at all today friend"),
      (4L, s"$span and again $span") // self-repetition in one doc
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(df, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // docs 1, 2, 4 each contain the planted 8-gram (doc 4 twice) -> its
    // 8 tokens are covered in every occurrence; doc 3 is untouched
    assert(out(1L)._2 == 8L)
    assert(out(2L)._2 == 8L)
    assert(out(3L) == ((10L, 0L,
      "unique words only here nothing repeats at all today friend")))
    assert(out(1L)._3 == "alpha beta gamma delta epsilon zeta eta theta")
    assert(out(2L)._3 == "iota kappa lambda mu nu xi omicron pi")
    // doc 4: both copies removed (drop-all-copies variant); the infix
    // "and again" bridges two copies — grams spanning the boundary are
    // unique, so only the two clean copies' tokens are covered
    assert(out(4L)._2 == 16L)
    assert(out(4L)._3 == "and again")
  }

  test("dupSpans anti-join marking == row-local membership-filter form on sf0.01") {
    import graft.functions.HashExpressions
    // the r10 formulation rebuilt here as the executable spec: covered
    // token indexes collected per doc, tokens filtered by per-row
    // array_contains (O(T x |covered|) — correct, just not the scale
    // path). Same wide gram hash, so any divergence is the MARKING.
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
    val n = 8
    val grams = docs.select(col("doc_id").as("id"),
      posexplode(HashExpressions.ngram_hashes_wide(
        HashExpressions.word_hashes(col("text")), n)).as(Seq("p", "g")))
    val dupG = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("g")
    val covered = grams.join(dupG, "g")
      .select(col("id"), explode(sequence(col("p"), col("p") + (n - 1))).as("ti"))
      .distinct()
    val cov = covered.groupBy("id").agg(
      count(lit(1)).as("dup_tokens"), collect_set(col("ti")).as("__cset"))
    val rowLocal = docs
      .select(col("doc_id").as("id"), split(col("text"), " ").as("__toks"))
      .join(cov, Seq("id"), "left")
      .select(col("id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        concat_ws(" ", filter(col("__toks"),
          (_, i) => !coalesce(array_contains(col("__cset"), i), lit(false))))
          .as("clean_text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val antiJoin = Dedup.dupSpans(docs, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(antiJoin == rowLocal)
    assert(antiJoin.values.exists(_._2 > 0L)) // sf0.001+ plants real dups
  }

  test("incrementalDedup: planted exact/near/unique flags; near arm == cross-split batch pairs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq(
      (10L, base),
      (11L, "completely different reference words here nothing shared at all")
    ).toDF("doc_id", "text")
    val inc = Seq(
      (20L, base),                                  // exact (and near) dup of 10
      (21L, base + " lambda"),                      // near-dup of 10, not exact
      (22L, "unique incoming document words that overlap with nothing else")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(ref, inc, "doc_id", "text", 0.6)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(20L) == ((1, 1, 0)))
    assert(out(21L) == ((0, 1, 0)))
    assert(out(22L) == ((0, 0, 1)))
    // differential on real data: the near flags must be exactly the
    // incoming ids appearing in a cross-split slice of the batch
    // MinHash pairs (same split the streaming twin uses)
    val docsAll = graft.queries.Tables.t(spark, sf001, "documents")
    val batchNear = Dedup.minhashLshPairs(docsAll, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect {
        case (a, b) if a % 3 == 0 && b % 3 != 0 => a
        case (a, b) if b % 3 == 0 && a % 3 != 0 => b
      }.toSet
    val incNear = Dedup.incrementalDedup(
        docsAll.filter(col("doc_id") % 3 =!= 0),
        docsAll.filter(col("doc_id") % 3 === 0), "doc_id", "text", 0.6)
      .filter(col("near_dup") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(incNear == batchNear, s"missing=${batchNear -- incNear} extra=${incNear -- batchNear}")
  }

  test("incrementalDedupBloom == incrementalDedup (Bloom prefilter adds probes, never rows)") {
    // differential on real data at the query split, plus a high-fpp run:
    // even a 50%-noise bitset must not change the output — the exact
    // verify semi-join is the correctness gate, the bloom only prunes
    val docsAll = graft.queries.Tables.t(spark, sf001, "documents")
    val ref = docsAll.filter(col("doc_id") % 3 =!= 0)
    val inc = docsAll.filter(col("doc_id") % 3 === 0)
    val plain = Dedup.incrementalDedup(ref, inc, "doc_id", "text", 0.6)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val bloom = Dedup.incrementalDedupBloom(ref, inc, "doc_id", "text", 0.6)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(bloom == plain)
    val noisy = Dedup.incrementalDedupBloom(ref, inc, "doc_id", "text", 0.6,
        fpp = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(noisy == plain)
    assert(plain.nonEmpty)
    // the sf0.001 split plants no cross-split EXACT dup, so the bloom's
    // positive path (probe hit → verify semi-join) is exercised on the
    // planted frames: exact dup flagged, near-only and unique unchanged
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pRef = Seq((10L, base),
      (11L, "completely different reference words here nothing shared at all"))
      .toDF("doc_id", "text")
    val pInc = Seq((20L, base), (21L, base + " lambda"),
      (22L, "unique incoming document words that overlap with nothing else"))
      .toDF("doc_id", "text")
    val planted = Dedup.incrementalDedupBloom(pRef, pInc, "doc_id", "text", 0.6)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(planted(20L) == ((1, 1, 0)))
    assert(planted(21L) == ((0, 1, 0)))
    assert(planted(22L) == ((0, 0, 1)))
  }

  test("sourceOverlap: planted shared gram counted once, disjoint sources emit no row") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared tail_a words here", "a"),
      (2L, s"lead_b $shared", "b"),       // shares exactly the planted gram...
      (3L, s"$shared again $shared", "b"), // ...counted ONCE (distinct grams)
      (4L, "totally disjoint source text nothing in common", "c")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.sourceOverlap(df, "source", "text", 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.contains(("a", "b")))
    assert(out((("a", "b"))) == 1L) // only the planted 8-gram is shared
    assert(!out.keySet.exists { case (x, y) => x == "c" || y == "c" })
  }

  test("streaming near-dup == cross-split slice of the batch MinHash pairs") {
    val batch = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect {  // orient: (stream doc, historical doc, j)
        case (a, b, j) if a % 3 == 0 && b % 3 != 0 => (a, b, j)
        case (a, b, j) if b % 3 == 0 && a % 3 != 0 => (b, a, j)
      }.toSet
    val stream = graft.streaming.StreamOps.nearDupOnce(spark, sf001,
        histMod = 3, tau = 0.6, sinkName = "spec_neardup_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stream === batch)
    assert(stream.nonEmpty, "fixture has no cross-split near-dup pair")
  }

  test("canonicalText single-pass expression == two-regex executable spec") {
    import spark.implicits._
    // real corpus text
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
    val diff = docs.select(
      Dedup.canonicalText(col("text")).as("fast"),
      Dedup.canonicalTextRegex(col("text")).as("spec"))
    assert(diff.filter(col("fast") =!= col("spec")).count() === 0L)
    // adversarial edges: leading/trailing/bridged spaces, digits, empty,
    // all-stripped, unicode case mapping (Kelvin sign -> k, U+0130 -> i)
    val edges = Seq("", "   ", "!!!", "  Hello,   World!  ", "a..b",
      "MiXeD 42 CaSe", "KKelvin", "İstanbul", "tab\there",
      "dots . . between", "x").toDF("text")
    val ediff = edges.select(
      Dedup.canonicalText(col("text")).as("fast"),
      Dedup.canonicalTextRegex(col("text")).as("spec"))
    assert(ediff.filter(col("fast") =!= col("spec")).count() === 0L,
      ediff.collect().mkString("\n"))
  }

  test("canonicalText property: arbitrary unicode strings match the regex reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.unsafe.types.UTF8String
    // driver-side reference replicating the Spark Column chain exactly:
    // lower (same JVM String.toLowerCase Spark's UTF8String falls back
    // to for non-ASCII) -> strip -> squeeze -> trim, all java.util.regex
    def ref(s: String): String =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").strip()
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.const(' '),
      2 -> Gen.oneOf('.', ',', '!', '-', '_', '\t', '\n', '"', '\\'),
      1 -> Gen.oneOf('İ', 'K', 'ß', 'É', 'Ω', 'ﬁ', '中', '̇'),
      1 -> Gen.choose(' ', '￿'))
    val strGen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val params = Gen.Parameters.default
    (0 until 500).foreach { i =>
      val s = strGen.pureApply(params, Seed(i.toLong))
      val got = graft.functions.TextExpressions
        .computeCanonical(UTF8String.fromString(s)).toString
      assert(got == ref(s), s"seed $i input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("ClassScoreArray property: random models and docs match the per-class fold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val caseGen = for {
      nc <- Gen.choose(1, 5)
      b <- Gen.choose(1, 16)
      priors <- Gen.listOfN(nc, Gen.choose(-1000000L, 0L))
      table <- Gen.listOfN(nc * b, Gen.choose(-5000000L, 0L))
      nw <- Gen.choose(0, 30)
      whs <- Gen.listOfN(nw, Gen.oneOf(
        Gen.choose(0L, Long.MaxValue), Gen.choose(Long.MinValue, 0L)))
    } yield (priors.toArray, table.toArray, b, whs.toArray)
    val params = Gen.Parameters.default
    (0 until 300).foreach { i =>
      val (priors, table, b, whs) = caseGen.pureApply(params, Seed(i.toLong))
      val expr = graft.functions.HashExpressions.ClassScoreArray(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), priors, table, b)
      val got = expr.nullSafeEval(new GenericArrayData(whs))
        .asInstanceOf[GenericArrayData].toLongArray.toSeq
      val want = priors.indices.map { c =>
        priors(c) + whs.map(w => table(c * b + (((w % b) + b) % b).toInt)).sum
      }
      assert(got == want, s"seed $i nc=${priors.length} b=$b")
    }
  }

  test("exactNormalized: case/punct/whitespace variants collapse, keep-min survives") {
    import spark.implicits._
    val df = Seq(
      (5L, "Hello,  World!"), (3L, "hello world"), (9L, "HELLO WORLD."),
      (7L, "different text")
    ).toDF("doc_id", "text")
    val out = Dedup.exactNormalized(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(3L -> ((3L, 11L)), 7L -> ((1L, 14L))))
  }

  test("semDedup: identical in-cluster twin dropped, keeper is min id; singletons survive") {
    import spark.implicits._
    // 64-dim unit-ish vectors: two identical (near-dup) + one orthogonal
    def vec(hot: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == hot) 1.0f else 0.0f)
    val df = Seq(
      (10L, vec(0)), (11L, vec(0)), // identical pair
      (20L, vec(5))                  // unrelated singleton
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, "vec_id", "embedding", 0.9, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    // exactly one of the twins survives, the singleton always does
    assert(kept.contains(20L))
    assert((kept - 20L).size == 1)
    assert((kept - 20L).subsetOf(Set(10L, 11L)))
  }

  test("semDedup auto-sizes its cluster count to ~sqrt(n) at two scales") {
    import graft.operators.Similarity
    assert(Similarity.autoCentroids(16) == 4)    // floor at 4
    assert(Similarity.autoCentroids(10000) == 100)
    assert(Similarity.autoCentroids(1000000) == 1000)
    val emb = graft.queries.Tables.t(spark, sf001, "embeddings")
    for (slice <- Seq(emb.filter(col("vec_id") < 40), emb)) {
      val n = slice.count()
      val kept = Similarity.semDedup(slice, "vec_id", "embedding", 0.99)
      val cids = kept.select(countDistinct(col("cid"))).head().getLong(0)
      // duplicate-seed ties can leave empty lists, so <=, and the
      // derived C must actually spread the corpus beyond the r10 habit
      // of a couple of mega-clusters when n >> 16
      assert(cids <= Similarity.autoCentroids(n), s"n=$n cids=$cids")
      assert(cids > 1, s"n=$n cids=$cids")
    }
  }

  test("semDedup at tau>1 drops nothing") {
    val all = emb.count()
    val kept = Similarity.semDedup(emb, "vec_id", "embedding", 1.1, 4).count()
    assert(kept == all)
  }

  test("containment: a quoted-whole short doc clears tau where Jaccard cannot") {
    import spark.implicits._
    val short0 = "alpha beta gamma delta epsilon zeta eta theta"
    val long0 = short0 + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, short0), (2L, long0), (3L, "unrelated words only here")
    ).toDF("id", "text")
    val cont = graft.operators.Dedup.containmentPairs(df, "id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // doc 1's shingles all appear in doc 2 → containment 1.0, one
    // direction only; doc 3 pairs with nobody
    assert(cont.keySet == Set((1L, 2L)))
    assert(cont((1L, 2L)) == 1.0)
    // the symmetric Jaccard at the same tau misses the pair entirely
    val jac = graft.operators.Dedup.jaccardPairs(df, "id", "text", 0.7).count()
    assert(jac == 0L)
  }

  test("d4Prune: survivors are a subset of semDedup's; frac 0 is identity") {
    val sem = Similarity.semDedup(emb, "vec_id", "embedding", 0.45, 8)
      .select("id").collect().map(_.getLong(0)).toSet
    val d4 = Similarity.d4Prune(emb, "vec_id", "embedding", 0.45, 0.25, 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(d4.subsetOf(sem) && d4.size < sem.size)
    val d0 = Similarity.d4Prune(emb, "vec_id", "embedding", 0.45, 0.0, 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(d0 == sem)
  }

  test("d4Prune: each cluster drops exactly ceil(frac*|c|) centroid-closest members") {
    val sem = Similarity.semDedup(emb, "vec_id", "embedding", 0.45, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val d4 = Similarity.d4Prune(emb, "vec_id", "embedding", 0.45, 0.25, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val semBy = sem.groupBy(_._2).view.mapValues(_.length).toMap
    val d4By = d4.groupBy(_._2).view.mapValues(_.length).toMap
    semBy.foreach { case (cid, n) =>
      val cut = math.ceil(0.25 * n).toInt
      assert(d4By.getOrElse(cid, 0) == n - cut, s"cid $cid: $n -> ${d4By.getOrElse(cid, 0)}")
    }
    // proto_rank of every survivor exceeds its cluster's cut
    d4.foreach { case (_, cid, pr) =>
      assert(pr > math.ceil(0.25 * semBy(cid)).toLong)
    }
  }

  test("mmrSelect: first pick is argmax relevance; later picks trade rel for diversity") {
    val sel = Similarity.mmrSelect(emb, "vec_id", "embedding",
      qid = 2L, poolN = 16, k = 6, lambdaMicro = 700000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(sel.length == 6)
    assert(sel.map(_._2).distinct.length == 6, "picks are distinct")
    assert(!sel.map(_._2).contains(2L), "query never selects itself")
    // round 1 == plain top-1 by relevance (mmax is 0 everywhere)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      id => id === 2L, k = 1).collect()
    assert(sel.head._2 == brute.head.getLong(2), "first pick = argmax rel")
    // raw score = lambda*rel - (1-lambda)*mmax <= lambda*rel, with
    // equality on round 1; rounds are non-increasing in raw score ONLY
    // if relevance dominates — not guaranteed — but every round's raw
    // must be <= lambda * (its own rel)
    sel.foreach { case (_, _, rel, raw) => assert(raw <= 700000L * rel) }
    assert(sel.head._4 == 700000L * sel.head._3)
  }

  test("mmrSelect diversifies: the duplicated top hit's clone loses to a diverse vector") {
    import spark.implicits._
    // query q = e0; candidates: a (id 1) and its exact clone a' (id 2)
    // are the most relevant (cos 1/sqrt(2) ~ 0.707); b (id 3) is slightly
    // less relevant (cos 2/3) but far from a (cos(a,b) ~ 0.471). Plain
    // top-2 takes BOTH clones; at lambda=0.7, round 2 must score
    // raw(a') = .7*707107 - .3*1000000 < raw(b) = .7*666667 - .3*471405
    // and pick the diverse b.
    def vec(entries: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      entries.foreach { case (i, x) => a(i) = x }
      a
    }
    val v = Seq(
      (0L, vec(0 -> 1.0f)),
      (1L, vec(0 -> 1.0f, 1 -> 1.0f)),
      (2L, vec(0 -> 1.0f, 1 -> 1.0f)),
      (3L, vec(0 -> 1.0f, 2 -> 1.0f, 3 -> 0.5f))
    ).toDF("vec_id", "embedding")
    val sel = Similarity.mmrSelect(v, "vec_id", "embedding",
      qid = 0L, poolN = 3, k = 3, lambdaMicro = 700000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(sel(0)._2 == 1L, "round 1 = most relevant (lowest id of the tied clones)")
    assert(sel(1)._2 == 3L, "round 2 skips the redundant clone for the diverse vector")
    assert(sel(2)._2 == 2L, "round 3 takes the remaining clone")
  }


  test("mmr rounds exhaust gracefully when the pool holds fewer than k rows") {
    import spark.implicits._
    // 4 vectors: the pool (everything but qid) is 3 rows < k=5 — the
    // rounds must return the 3 reachable picks, not throw mid-round
    // (r14 ADVICE: sparse IVF probe lists / tiny corpora)
    def vec(i: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a(0) = 1.0f; a
    }
    val v = (0L to 3L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val sel = Similarity.mmrSelect(v, "vec_id", "embedding",
      qid = 0L, poolN = 5, k = 5, lambdaMicro = 700000L).collect()
    assert(sel.length == 3)
    assert(sel.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "rounds stay 1..3")
    assert(sel.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    // IVF form shares the guard via mmrRounds
    val ivf = Similarity.mmrSelectIvf(v, "vec_id", "embedding",
      qid = 0L, poolN = 5, k = 5, lambdaMicro = 700000L,
      nCentroids = 2, nprobe = 2).collect()
    assert(ivf.length <= 3 && ivf.nonEmpty)
  }

  test("mmrSelectIvf == mmrSelect when every list is probed (degeneracy)") {
    // nprobe = nCentroids probes the whole corpus, so the IVF pool is
    // the global exact-cosine top-poolN — the brute pool — and the
    // greedy rounds must replay identically (the IVF-PQ==PQ idiom)
    val ivf = Similarity.mmrSelectIvf(emb, "vec_id", "embedding",
      qid = 2L, poolN = 16, k = 6, lambdaMicro = 700000L,
      nCentroids = 4, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = Similarity.mmrSelect(emb, "vec_id", "embedding",
      qid = 2L, poolN = 16, k = 6, lambdaMicro = 700000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ivf.sortBy(_._1).sameElements(brute.sortBy(_._1)))
  }

  test("mmrSelectIvf: picks come from the probe lists' candidates only") {
    val poolIds = Similarity.ivfTopK(emb, "vec_id", "embedding",
      _ === 2L, k = 16, nCentroids = 16, nprobe = 2)
      .collect().map(_.getLong(2)).toSet
    val sel = Similarity.mmrSelectIvf(emb, "vec_id", "embedding",
      qid = 2L, poolN = 16, k = 6, lambdaMicro = 700000L,
      nCentroids = 16, nprobe = 2).collect().map(_.getLong(1))
    assert(sel.length == 6 && sel.distinct.length == 6)
    sel.foreach(id => assert(poolIds.contains(id),
      s"pick $id outside the IVF pool"))
  }

  test("rrfFuseTopK: fused scores match hand-computed reciprocal ranks") {
    val fused = Similarity.rrfFuseTopK(emb, "vec_id", "embedding",
      id => id < 3, depth = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(fused.nonEmpty)
    fused.foreach { case (_, _, _, rrf, rc, rl) =>
      val expect = (if (rc > 0) 1000000L / (60 + rc) else 0L) +
        (if (rl > 0) 1000000L / (60 + rl) else 0L)
      assert(rrf == expect, s"rrf $rrf != $expect for rc=$rc rl=$rl")
      assert(rc == -1 || (rc >= 1 && rc <= 10))
      assert(rl == -1 || (rl >= 1 && rl <= 10))
      assert(rc != -1 || rl != -1, "a fused row must appear in some list")
    }
    // per query the fused list is rn=1..5 with non-increasing scores
    fused.groupBy(_._1).foreach { case (_, rows) =>
      val byRn = rows.sortBy(_._2)
      assert(byRn.map(_._2).toSeq == (1L to byRn.length))
      assert(byRn.map(_._4).toSeq.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("weighted jaccard: repetition-blind set form vs multiplicity-aware multiset form") {
    import spark.implicits._
    val template = "x y z w v"
    val d = Seq(
      (1L, Seq.fill(10)(template).mkString(" ")), // the template 10x
      (2L, template),                             // the template once
      (3L, Seq.fill(10)(template).mkString(" "))  // exact copy of 1
    ).toDF("doc_id", "text")
    // SET jaccard can't tell 10 copies from 1 copy apart beyond the
    // repetition-boundary grams (j = 3/5 here)...
    val setJ = Dedup.jaccardPairs(d, "doc_id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(math.abs(setJ((1L, 2L)) - 0.6) < 1e-9, setJ.toString)
    // ...the MULTISET form collapses the ratio (sum-min 3 vs sum-max 48)
    val wJ = Dedup.jaccardWeightedPairs(d, "doc_id", "text", 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(wJ((1L, 3L)) == 1.0, "exact copies score 1.0")
    assert(wJ((1L, 2L)) < 0.1, s"template-once vs template-10x must collapse: ${wJ((1L, 2L))}")
    assert(math.abs(wJ((1L, 2L)) - 3.0 / 48.0) < 1e-9, wJ.toString)
  }

  test("pqTopK: with every vector a codeword, ADC degenerates to exact L2 order") {
    import spark.implicits._
    // 16 distinct one-hot-scaled vectors with codebookK=16: the seed
    // draw takes ALL of them, each encodes to itself (zero subspace
    // distance), so ADC(q,v) == exact L2^2(q,v) and the PQ ranking must
    // equal the brute L2 ranking: for query i, neighbors in id order
    // (distance (i+1)^2 + (j+1)^2 is increasing in j)
    val v = (0 until 16).map { i =>
      val a = Array.fill(64)(0.0f); a(i) = (i + 1).toFloat; (i.toLong, a)
    }.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(v, "vec_id", "embedding", id => id < 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (1L, 1L, 0L), (1L, 2L, 2L), (1L, 3L, 3L)), got.toSeq.toString)
  }

  test("pqTopK on the fixture: k rows per query, ADC non-decreasing, approximate recall > 0") {
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", id => id < 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pq.groupBy(_._1).forall(_._2.length == 3))
    pq.groupBy(_._1).foreach { case (_, rows) =>
      val byRn = rows.sortBy(_._2).map(_._4)
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a <= b })
    }
    // PQ is approximate BY DESIGN; on the fixed fixture it must still
    // find at least one true (brute cosine) top-3 neighbor overall
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", _ < 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = pq.count(p => truth((p._1, p._3)))
    assert(hits >= 1, s"PQ found $hits of ${truth.size} true neighbors")
  }

  test("ivfPqTopK with nprobe covering every list degenerates to plain pqTopK") {
    // candidates = whole corpus when every list is probed, and both
    // paths share the seeded codebook + exact ADC, so the results must
    // be IDENTICAL rows
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val full = rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      id => id < 3, k = 3, nCentroids = 4, nprobe = 4))
    val pq = rows(Similarity.pqTopK(emb, "vec_id", "embedding",
      id => id < 3, k = 3))
    assert(full == pq, s"ivfpq(all-lists) ${full.toSeq.sorted} != pq ${pq.toSeq.sorted}")
    // and with a REAL probe budget the candidates shrink: results are
    // k rows per query, drawn only from probed lists (subset property
    // checked implicitly by determinism vs the oracle; here just shape)
    val pruned = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      id => id < 3, k = 3, nCentroids = 16, nprobe = 2)
      .collect()
    assert(pruned.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("semDedupTrained: survivors never contain a same-cluster pair over tau") {
    // the core SemDeDup guarantee, independent of which quantizer made
    // the clusters: any surviving pair (x, y) sharing a trained cluster
    // with cos >= tau would have put the lower-priority one in the drop
    // set — verify exhaustively on the fixture
    val tau = 0.45
    val surv = Similarity.semDedupTrained(emb, "vec_id", "embedding",
      tau, nCentroids = 16, iters = 2)
    val fx = Similarity.fixedPoint(emb, "vec_id", "embedding")
    val s2 = surv.join(fx, Seq("id"))
    val aSide = s2.select(col("cid"), col("id").as("ia"),
      col("fx").as("fa"), col("nrm").as("na"))
    val bSide = s2.select(col("cid"), col("id").as("ib"),
      col("fx").as("fb"), col("nrm").as("nb"))
    val bad = aSide.join(bSide, Seq("cid"))
      .filter(col("ia") < col("ib"))
      .filter(
        (graft.functions.HashExpressions.fixed_dot(col("fa"), col("fb")) /
          sqrt(col("na").cast("double") * col("nb").cast("double"))) >= tau)
      .count()
    assert(bad == 0, s"$bad surviving same-cluster pairs over tau")
    assert(surv.count() > 0 && surv.count() <= emb.count())
  }

  test("ivfPqResidualTopK: every vector its own centroid makes ADC exact") {
    import spark.implicits._
    // 16 one-hot-scaled vectors with C=16: every vector seeds a
    // centroid, so every residual is the ZERO vector, the trained book
    // collapses to zero codewords, and adc(q, v) = Σ_m ||(q−c_v)_m||²
    // = exact L2²(q, v) — with every list probed, the residual index
    // must reproduce the brute L2 ranking (same fixture + expectation
    // as the pqTopK degeneracy test)
    val v = (0 until 16).map { i =>
      val a = Array.fill(64)(0.0f); a(i) = (i + 1).toFloat; (i.toLong, a)
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfPqResidualTopK(v, "vec_id", "embedding",
      id => id < 2, k = 3, nCentroids = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (1L, 1L, 0L), (1L, 2L, 2L), (1L, 3L, 3L)), got.toSeq.toString)
  }

  test("ivfPqResidualTopK on the fixture: shape, candidates from probed lists only") {
    val res = Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
      id => id < 3, k = 3, nCentroids = 16, nprobe = 2).collect()
    assert(res.groupBy(_.getLong(0)).forall(_._2.length == 3))
    res.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a <= b })
    }
    assert(res.forall(r => r.getLong(0) != r.getLong(2)), "no self-matches")
  }

  test("ivfTopKTrained at iters=1 degenerates to ivfTopKRefined") {
    // refined = assign to the seeded draw, move to integer means,
    // re-assign and probe — exactly one Lloyd round. The shared-engine
    // claim is that the generalization reproduces it bit-for-bit.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val one = rows(Similarity.ivfTopKTrained(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 16, nprobe = 2, iters = 1))
    val refined = rows(Similarity.ivfTopKRefined(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 16, nprobe = 2))
    assert(one == refined, s"$one vs $refined")
  }

  test("ivfTopK2 at nSub=1, nprobe2=1 degenerates to single-level ivfTopK") {
    // one sub-centroid per coarse list: every member assigns to it and
    // every probe picks it, so the probed candidate set IS the coarse
    // list — the two-level index must reproduce ivfTopK row-for-row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val two = rows(Similarity.ivfTopK2(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCoarse = 16, nSub = 1, nprobe1 = 2, nprobe2 = 1))
    val one = rows(Similarity.ivfTopK(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 16, nprobe = 2))
    assert(two == one, s"$two vs $one")
  }

  test("ivfTopK2: k rows per query, no self-matches, cos non-increasing") {
    val res = Similarity.ivfTopK2(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCoarse = 16, nSub = 4, nprobe1 = 2, nprobe2 = 2)
      .collect()
    assert(res.groupBy(_.getLong(0)).forall(_._2.length == 3))
    res.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a >= b },
        "cos must be non-increasing in rank")
    }
    assert(res.forall(r => r.getLong(0) != r.getLong(2)), "no self-matches")
    // an ANN hit can't score HIGHER than the exhaustive scorer's best —
    // sanity that the probed candidates are real corpus vectors scored
    // by the same exact cosine
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      _ < 5, k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    res.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getDouble(3) <= brute(r.getLong(0)),
        s"query ${r.getLong(0)}: ANN rank-1 cos beats the exact best")
    }
  }

  test("kMeansAssign: total assignment, valid labels, exact distances") {
    val n = emb.count()
    val a = Similarity.kMeansAssign(emb, "vec_id", "embedding",
      k = 8, iters = 2).cache()
    assert(a.count() == n, "every vector labeled exactly once")
    assert(a.select("id").distinct().count() == n)
    assert(a.select("cid").distinct().count() <= 8)
    assert(a.filter(col("d2") < 0).count() == 0, "d2 is a squared norm")
    // the label is the ARG-min: no trained centroid may sit strictly
    // closer than the assigned one (recomputed via the zip_with form —
    // same exact integers as the operator's nrm − 2·dot + cnrm)
    val fx = Similarity.fixedPoint(emb, "vec_id", "embedding")
    val cents = Similarity.pqCodebookTrained(fx, 1, 8, 64, 2)
      .select(col("cid").as("ocid"), col("cvec"))
    val beat = a.join(fx, Seq("id")).crossJoin(broadcast(cents))
      .select(col("id"), col("d2"),
        aggregate(zip_with(col("fx"), col("cvec"),
          (x, y) => (x - y) * (x - y)), lit(0L), (s, v) => s + v).as("od2"))
      .filter(col("od2") < col("d2")).count()
    assert(beat == 0, s"$beat (vector, centroid) cells beat the assignment")
    a.unpersist()
  }

  test("kMeansPrototypes: members of their cluster, most central first") {
    val a = Similarity.kMeansAssign(emb, "vec_id", "embedding",
      k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val p = Similarity.kMeansPrototypes(emb, "vec_id", "embedding",
      k = 8, perCluster = 3, iters = 2).collect()
    assert(p.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    p.foreach { r =>
      val (cid, rn, id, d2) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(a(id) == (cid, d2), s"prototype $id not labeled ($cid, $d2)")
      assert(rn >= 1 && rn <= 3)
    }
    // rank 1 is the cluster's minimum assignment distance
    val minByCluster = a.values.groupBy(_._1).view.mapValues(_.map(_._2).min)
    p.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getLong(3) == minByCluster(r.getLong(0)),
        s"cluster ${r.getLong(0)}: rank-1 d2 ${r.getLong(3)} != min")
    }
  }

  test("kMeansWcss: elbow decreases in k on the fixture") {
    // strict per-step monotonicity is NOT a theorem under independent
    // per-k training (r15 ADVICE: a fixture regeneration could flake
    // it without any code bug), so assert the DIRECTIONAL invariant —
    // wcss(kmax) < wcss(kmin) — and allow at most one adjacent
    // inversion; bit-exactness stays with the sim_kmeans_elbow oracle
    val r = Similarity.kMeansWcss(emb, "vec_id", "embedding",
      Seq(2, 4, 8), iters = 2)
      .orderBy("k").collect().map(x => (x.getLong(0), x.getLong(2)))
    assert(r.map(_._1).toSeq == Seq(2L, 4L, 8L))
    assert(r.last._2 < r.head._2,
      s"more clusters must cut WCSS overall: ${r.mkString(", ")}")
    val inversions = r.sliding(2).count(p => p(1)._2 > p(0)._2)
    assert(inversions <= 1, s"elbow shape lost: ${r.mkString(", ")}")
  }

  test("pqCodebookTrained: singleton clusters are a Lloyd fixed point") {
    import spark.implicits._
    // 16 distinct vectors, codebookK=16: every vector is its own
    // codeword, each cluster is a singleton, and the integer mean of a
    // single member is the member itself — so ANY number of Lloyd
    // rounds returns the seeded book unchanged and the trained search
    // must equal the seeded search row-for-row
    val v = (0 until 16).map { i =>
      val a = Array.fill(64)(0.0f); a(i) = (i + 1).toFloat; (i.toLong, a)
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val trained = rows(Similarity.pqTopKTrained(v, "vec_id", "embedding",
      id => id < 2, k = 3, iters = 3))
    val seeded = rows(Similarity.pqTopK(v, "vec_id", "embedding",
      id => id < 2, k = 3))
    assert(trained == seeded,
      s"fixed point violated: $trained vs $seeded")
  }

  test("pqCodebookTrained: each Lloyd round reduces quantization error") {
    // WCSS (total min subspace d2 over all (vector, subspace) cells)
    // must not increase round over round: the assignment step is the
    // arg-min and the update step moves codewords to (integer) means.
    // Trunc-division displaces each coordinate < 1 micro-unit against
    // 1e6-scale values, so the Lloyd descent dominates on this fixture.
    val sub = 16
    val fx = Similarity.fixedPoint(emb, "vec_id", "embedding")
      .localCheckpoint(eager = false)
    def wcss(cb: org.apache.spark.sql.DataFrame): Long =
      fx.crossJoin(spark.range(4).select(col("id").cast("int").as("m")))
        .select(col("id"), col("m"),
          expr(s"slice(fx, m * $sub + 1, $sub)").as("svec"))
        .join(broadcast(cb), Seq("m"))
        .select(col("id"), col("m"),
          aggregate(zip_with(col("svec"), col("cvec"),
            (x, y) => (x - y) * (x - y)), lit(0L), (a, v) => a + v).as("d2"))
        .groupBy("id", "m").agg(min("d2").as("d"))
        .agg(sum("d")).head.getLong(0)
    val w0 = wcss(Similarity.pqCodebook(fx, 4, 16, sub))
    val w1 = wcss(Similarity.pqCodebookTrained(fx, 4, 16, sub, 1))
    val w2 = wcss(Similarity.pqCodebookTrained(fx, 4, 16, sub, 2))
    assert(w1 <= w0, s"round 1 increased WCSS: $w0 -> $w1")
    assert(w2 <= w1, s"round 2 increased WCSS: $w1 -> $w2")
    assert(w1 < w0, s"training moved nothing on the fixture ($w0)")
  }

  test("pqTopKTrained/ivfPqTopKTrained on the fixture: shape and codebook bounds") {
    val t = Similarity.pqTopKTrained(emb, "vec_id", "embedding",
      id => id < 5, k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(t.groupBy(_._1).forall(_._2.length == 3))
    t.groupBy(_._1).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_._2).map(_._4)
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a <= b },
        "ADC must be non-decreasing in rank")
    }
    assert(t.forall(r => r._1 != r._3), "self-matches excluded")
    // trained book: at most M*K codewords, every subspace present,
    // every codeword the right width
    val fx = Similarity.fixedPoint(emb, "vec_id", "embedding")
    val cb = Similarity.pqCodebookTrained(fx, 4, 16, 16, 2).collect()
    assert(cb.length <= 4 * 16, s"book too large: ${cb.length}")
    assert(cb.map(_.getInt(0)).toSet == Set(0, 1, 2, 3))
    assert(cb.forall(_.getSeq[Long](2).length == 16))
    val iv = Similarity.ivfPqTopKTrained(emb, "vec_id", "embedding",
      id => id < 3, k = 3, nCentroids = 16, nprobe = 2, iters = 2).collect()
    assert(iv.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("ivfTopK2Trained at nSub=1, nprobe2=1 degenerates to ivfTopKTrained") {
    // one sub-centroid per trained coarse list: the probed candidate set
    // IS the coarse list, so the trained two-level index must reproduce
    // the trained single-level form row-for-row (shared Lloyd engine +
    // shared probe semantics)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val two = rows(Similarity.ivfTopK2Trained(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCoarse = 16, nSub = 1, nprobe1 = 2, nprobe2 = 1,
      iters = 2))
    val one = rows(Similarity.ivfTopKTrained(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 16, nprobe = 2, iters = 2))
    assert(two == one, s"$two vs $one")
  }

  test("ivf2PqTopK at nSub=1, nprobe2=1 degenerates to ivfPqTopKTrained") {
    // the IVF2-PQ composition collapses to the single-level trained
    // IVF-PQ when level 2 is trivial: same seeded coarse book, same
    // probed candidates, same trained ADC tables
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val two = rows(Similarity.ivf2PqTopK(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCoarse = 16, nSub = 1, nprobe1 = 2, nprobe2 = 1,
      iters = 2))
    val one = rows(Similarity.ivfPqTopKTrained(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 16, nprobe = 2, iters = 2))
    assert(two == one, s"$two vs $one")
  }

  test("ivf2PqTopK on the fixture: shape, ADC non-decreasing, no self-matches") {
    val res = Similarity.ivf2PqTopK(emb, "vec_id", "embedding",
      _ < 5, k = 3, nCoarse = 16, nSub = 4, nprobe1 = 2, nprobe2 = 2,
      iters = 2).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a <= b },
        "ADC must be non-decreasing in rank")
    }
    assert(res.forall(r => r.getLong(0) != r.getLong(2)), "no self-matches")
  }

  test("marginMiningIvf: accepted pairs score identically to brute; recall >= 0.9") {
    // the IVF generator changes WHICH pairs are candidates, never the
    // scoring arithmetic: any pair both forms accept must carry the
    // identical micro-cosine. Pair recall vs the brute ground truth is
    // the operator's quality contract (r16 verdict item 6: >= 0.9).
    val brute = Similarity.marginMining(emb, "vec_id", "embedding",
        _ % 2 === 0, k = 4, tau = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // nprobe = 6 of 16: measured recall 0.99 on this fixture (0.53 at
    // nprobe = 2 — near-isotropic synthetic vectors need generous probe
    // overlap; full curve in SCALING.md r17)
    val ivf = Similarity.marginMiningIvf(emb, "vec_id", "embedding",
        _ % 2 === 0, k = 4, tau = 1.0, nCentroids = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(brute.nonEmpty, "brute form accepted no pairs on the fixture")
    val hits = brute.keySet.intersect(ivf.keySet)
    hits.foreach { p =>
      assert(brute(p) == ivf(p), s"cos_micro diverged on $p")
    }
    val recall = hits.size.toDouble / brute.size
    assert(recall >= 0.9, s"pair recall $recall (${hits.size}/${brute.size})")
  }

  test("ivf2PqTopKTrained: candidates = ivfTopK2Trained's, ADC = pqTopKTrained's") {
    // the all-trained composition adds no new machinery — trained-coarse
    // ivf2Candidates × the trained-ADC tail — so two cross-checks pin it
    // completely: (a) at k = ∞ its (qid, vec_id) candidate set equals
    // the trained two-level EXACT form's (identical lists and probes);
    // (b) every returned pair's ADC equals the flat trained-PQ form's
    // (identical Lloyd codebook chain, identical code/query tables)
    val pq = Similarity.ivf2PqTopKTrained(emb, "vec_id", "embedding",
      _ < 5, k = 100000, nCoarse = 16, nSub = 4, nprobe1 = 2,
      nprobe2 = 2, iters = 2, coarseIters = 2).collect()
    assert(pq.nonEmpty)
    val exact = Similarity.ivfTopK2Trained(emb, "vec_id", "embedding",
      _ < 5, k = 100000, nCoarse = 16, nSub = 4, nprobe1 = 2,
      nprobe2 = 2, iters = 2).collect()
    val pqPairs = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exPairs = exact.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pqPairs == exPairs,
      s"candidate sets diverge: ${pqPairs.size} vs ${exPairs.size}")
    val flat = Similarity.pqTopKTrained(emb, "vec_id", "embedding",
      _ < 5, k = 100000, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(flat(key) == r.getLong(3), s"ADC diverged on $key")
    }
  }
}
