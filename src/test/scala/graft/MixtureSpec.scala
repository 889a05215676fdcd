package graft

import org.apache.spark.sql.functions._
import graft.operators.{Mixture, Sampling}

/** Training-mixture operators: fractional-epoch resampling and
  * token-budget selection (operators/Mixture.scala). */
class MixtureSpec extends SparkSpec {

  private lazy val docs = queries.Tables.t(spark, sf001, "documents")

  test("resample: epoch counts match the fractional-rate plan") {
    val out = Mixture.resample(docs, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0), 1.0)
    val counts = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // src2 dropped entirely
    assert(!counts.exists(_._2 == "src2"))
    // src0: every surviving doc has 2 or 3 copies, per its hash slice
    val src0 = counts.filter(_._2 == "src0")
    assert(src0.nonEmpty && src0.forall(c => c._3 == 2 || c._3 == 3))
    // src1: 0 or 1 copies — 0-copy rows are absent from the output
    val src1 = counts.filter(_._2 == "src1")
    assert(src1.forall(_._3 == 1))
    // default sources: exactly 1 copy
    val rest = counts.filterNot(c => Set("src0", "src1", "src2")(c._2))
    assert(rest.nonEmpty && rest.forall(_._3 == 1))

    // membership/copy-count is the documented pure function of the hash
    val th = Mixture.epochPlan(2.5).fracThreshold
    src0.foreach { case (id, _, n) =>
      val extra = if (Sampling.rowHashLong(id) < th) 1 else 0
      assert(n == 2 + extra, s"doc $id: $n copies, hash slice said ${2 + extra}")
    }
  }

  test("resample: layout-invariant (same corpus after repartition)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixture.resample(df, "doc_id", "source", Map("src0" -> 1.5), 0.4)
        .select("doc_id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("resample plan: generator only, no shuffle") {
    val plan = Mixture.resample(docs, "doc_id", "source", Map("src0" -> 2.0), 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resample shuffled:\n$plan")
    assert(plan.contains("Generate"), "expected explode(sequence) generator")
  }

  test("leak-safe split: near-dup pairs never straddle a split boundary") {
    // sf0.01 is the smallest SF with a meaningful near-dup pair set
    val dir = "/root/testdata/sf0.01"
    val docs = queries.Tables.t(spark, dir, "documents")
    val pairs = operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs; property vacuous")

    val labels = operators.Dedup.clusters(
      operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5), "da", "db")
    val labeled = docs.join(labels, docs("doc_id") === labels("n"), "left")
      .withColumn("cl", coalesce(col("l"), col("doc_id")))
    val byCluster = Sampling.split(labeled, "cl", Seq(0.8, 0.1, 0.1),
        Seq("train", "val", "test"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    pairs.foreach { case (a, b) =>
      assert(byCluster(a) == byCluster(b),
        s"near-dup pair ($a,$b) split across ${byCluster(a)}/${byCluster(b)}")
    }

    // the property is not vacuous: a plain doc-id split DOES separate
    // at least one near-dup pair on this fixture
    val byDoc = Sampling.split(docs, "doc_id", Seq(0.8, 0.1, 0.1),
        Seq("train", "val", "test"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => byDoc(a) != byDoc(b) },
      "doc-id split kept every pair together — fixture too small to " +
        "demonstrate the leak; widen the pair set")
  }

  test("tokenBudget: per-source sums within budget, greedy-maximal") {
    val budget = 500L
    val ws = split(col("text"), " ")
    val scored = docs.withColumn("__q",
      size(array_distinct(ws)).cast("long") / size(ws).cast("long"))
    val kept = Mixture.tokenBudget(scored, "doc_id", "source", "n_chars", "__q", budget)
    val sums = kept.groupBy("source").agg(sum("n_chars").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.nonEmpty && sums.values.forall(_ <= budget))

    // greedy-maximal: the best-scoring EXCLUDED doc of some source would
    // not have fit (cum including it exceeds the budget)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val excluded = scored.filter(!col("doc_id").isin(keptIds.toSeq: _*))
      .orderBy(col("__q").desc, col("doc_id"))
      .select("source", "n_chars").limit(1).collect()
    excluded.headOption.foreach { r =>
      assert(sums.getOrElse(r.getString(0), 0L) + r.getLong(1) > budget)
    }
  }

  test("perplexity: rare-vocabulary docs score higher nll than common ones") {
    import spark.implicits._
    // 30 docs share a common vocabulary; 2 outliers use words seen
    // nowhere else — the unigram LM must rank the outliers as the most
    // surprising (highest negative mean log-prob)
    val corpus = (0L until 30L).map(i => (i, "the quick brown fox jumps")) ++
      Seq((100L, "zyx wvu tsr qpo nml"), (101L, "abc def ghi jkl mno"))
    val df = corpus.toDF("doc_id", "text")
    val tbl = Mixture.unigramLmTable(df, "text", 512)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val nll = Mixture.perplexityScore(df, "doc_id", "text", tbl, 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val common = (0L until 30L).map(nll).max
    assert(nll(100L) > common && nll(101L) > common,
      s"outliers ${nll(100L)}/${nll(101L)} vs common max $common")
  }

  test("DSIR importance: docs sharing the target vocabulary outscore the rest") {
    import spark.implicits._
    // target docs (id % 5 == 0) use a distinctive vocabulary; two probe
    // docs mix it — the one with more target words must score higher,
    // and every pure-target-vocab doc must outscore every pure-noise doc
    val corpus = (0L until 40L).map { i =>
      val text = if (i % 5 == 0) "quantum flux entangle qubit decohere"
      else "mundane filler noise words here"
      (i, text)
    } ++ Seq((100L, "quantum flux noise words here"),
      (101L, "quantum noise filler words here"))
    val df = corpus.toDF("doc_id", "text")
    val tbl = Mixture.importanceTable(df, "text", col("doc_id") % 5 === 0, 512)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    assert(tbl.length == 512)
    val scores = Mixture.importanceScore(df, "doc_id", "text", tbl, 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val target = (0L until 40L by 5).map(scores)
    val noise = (0L until 40L).filter(_ % 5 != 0).map(scores)
    assert(target.min > noise.max,
      s"target min ${target.min} vs noise max ${noise.max}")
    assert(scores(100L) > scores(101L)) // two target words beat one
  }

  test("temperaturePlan: α=1/2 weights relative to the largest source, exact on squares") {
    import spark.implicits._
    // 100 vs 25 tokens -> rel weights exactly 1.0 and 0.5
    val df = Seq.tabulate(10)(i => (i.toLong, "big", Seq.fill(10)("w").mkString(" "))) ++
      Seq.tabulate(5)(i => (100L + i, "small", Seq.fill(5)("w").mkString(" ")))
    val out = Mixture.temperaturePlan(df.toDF("doc_id", "source", "text"),
        "source", "text", 4.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("big") == ((10L, 100L, 1.0, 4.0)))
    assert(out("small") == ((5L, 25L, 0.5, 2.0)))
  }

  test("UniMax water-filling: capped prefix, exact integer allocations, sum == min(B, caps)") {
    import spark.implicits._
    // sources a,b: 10 tokens; c: 40; d: 100. E=2 -> caps 20,20,80,200.
    def doc(src: String, i: Int, words: Int) =
      (s"$src$i", Seq.fill(words)("w").mkString(" "), src)
    val rows = Seq.tabulate(2)(i => doc("a", i, 5)) ++ Seq(doc("b", 0, 10)) ++
      Seq.tabulate(4)(i => doc("c", i, 10)) ++ Seq.tabulate(10)(i => doc("d", i, 10))
    val df = rows.toDF("id", "text", "source")
    def allocs(budget: Long): Map[String, Long] =
      Mixture.unimaxPlan(df, "source", "text", budget, 2)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    // B=100: a,b cap (20*4=80<=100; 20*3=60<=80), c fails (160>60) ->
    // k=2, remaining 60 splits 30/30
    assert(allocs(100L) == Map("a" -> 20L, "b" -> 20L, "c" -> 30L, "d" -> 30L))
    // B=101: remainder 1 goes to the FIRST uncapped source (c)
    assert(allocs(101L) == Map("a" -> 20L, "b" -> 20L, "c" -> 31L, "d" -> 30L))
    // B >= sum(caps)=320: everyone capped, the divisor-zero branch must
    // never evaluate; leftover budget stays unallocated by design
    assert(allocs(1000L) == Map("a" -> 20L, "b" -> 20L, "c" -> 80L, "d" -> 200L))
    // conservation at the split points
    assert(allocs(100L).values.sum == 100L && allocs(1000L).values.sum == 320L)
  }

  test("softDedupWeights: planted duplicate pair halves, unique and short docs weigh 1") {
    import spark.implicits._
    val gram = (1 to 8).map(i => s"g$i").mkString(" ")
    val df = Seq(
      (1L, gram), (2L, gram),                       // identical: 1 gram, freq 2
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")), // unique: 1 gram, freq 1
      (4L, "x y")                                   // too short: no gram
    ).toDF("doc_id", "text")
    val w = graft.operators.Dedup.softDedupWeights(df, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(w(1L) == ((1L, 2L, 0.5)) && w(2L) == ((1L, 2L, 0.5)))
    assert(w(3L) == ((1L, 1L, 1.0)))
    assert(w(4L) == ((0L, 0L, 1.0)))
  }

  test("nbPredictScored margins and nbCalibration bins match hand computation") {
    import spark.implicits._
    // word "x": hash = ascii('x') = 120 -> bucket 120 % 4 = 0 with B=4.
    // model: a = (0, [5,0,0,0]), b = (0, [1,0,0,0]) -> per-"x" margin 4
    val model = Seq(
      "a" -> (0L, Seq(5L, 0L, 0L, 0L)),
      "b" -> (0L, Seq(1L, 0L, 0L, 0L)))
    val df = Seq(
      (1L, "x", "a"),     // scores a=5,  b=1  -> pred a, margin 4,  correct
      (2L, "x x", "b"),   // scores a=10, b=2  -> pred a, margin 8,  wrong
      (3L, "x x x", "a")  // scores a=15, b=3  -> pred a, margin 12, correct
    ).toDF("doc_id", "text", "source")
    val scored = Mixture.nbPredictScored(df, "doc_id", "text", "source", model, 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getInt(4))).toMap
    assert(scored(1L) == (("a", 4L, 1)))
    assert(scored(2L) == (("a", 8L, 0)))
    assert(scored(3L) == (("a", 12L, 1)))
    // binWidth 5, maxBin 1: margin 4 -> bin 0; margins 8, 12 -> bin 1
    val cal = Mixture.nbCalibration(
      Mixture.nbPredictScored(df, "doc_id", "text", "source", model, 4), 5L, 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cal(0L) == ((1L, 1L, 1.0)))
    assert(cal(1L) == ((2L, 1L, 0.5)))
    // single-class model: margin pinned 0
    val one = Mixture.nbPredictScored(df, "doc_id", "text", "source",
      Seq("a" -> (0L, Seq(5L, 0L, 0L, 0L))), 4)
      .select(max(col("margin"))).head().getLong(0)
    assert(one == 0L)
  }

  test("Naive Bayes: planted class vocabularies classify perfectly; model shapes hold") {
    import spark.implicits._
    val corpus = (0L until 40L).map { i =>
      val cls = if (i % 2 == 0) "news" else "code"
      val word = if (cls == "news") "election" else "compiler"
      (i, cls, Seq.fill(5)(word).mkString(" ") + s" shared$i common")
    }
    val df = corpus.toDF("doc_id", "source", "text")
    val b = 256
    val tblRows = Mixture.nbTable(df, "text", "source", b).collect()
    // spine-complete: every (class, bucket) present exactly once
    assert(tblRows.length == 2 * b)
    val tables = tblRows.groupBy(_.getString(0)).map { case (c, rs) =>
      c -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val priors = Mixture.nbPriors(df, "source").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // balanced classes: equal priors = round(1e6 ln 0.5)
    assert(priors("news") == priors("code"))
    assert(priors("news") == math.round(1e6 * math.log(0.5)))
    val model = tables.map { case (c, t) => c -> (priors(c), t) }.toSeq
    val pred = Mixture.nbPredict(df, "doc_id", "text", "source", model, b)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getInt(3))).toMap
    assert(pred.size == 40)
    assert(pred.values.forall(_._2 == 1), // 5 class-exclusive words dominate
      s"misclassified: ${pred.filter(_._2._2 == 0)}")
  }

  test("Naive Bayes argmax tie-break is the lexicographically smallest class") {
    import spark.implicits._
    // identical per-class tables and priors -> every class ties
    val df = Seq((1L, "x", "word")).toDF("doc_id", "source", "text")
    val model = Seq("zeta" -> (0L, Seq.fill(16)(0L)), "alpha" -> (0L, Seq.fill(16)(0L)))
    val out = Mixture.nbPredict(df, "doc_id", "text", "source", model, 16).head()
    assert(out.getString(2) == "alpha")
  }

  test("interpolated perplexity: λ=0 reduces exactly to the unigram score") {
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
    val B = 256
    val t1 = Mixture.unigramLmTable(docs, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val t2 = Mixture.bigramLmTable(docs, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val uni = Mixture.perplexityScore(docs, "doc_id", "text", t1, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val interp0 = Mixture.perplexityScoreInterp(docs, "doc_id", "text",
        t1, t2, B, 0, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(interp0 == uni)
  }

  test("interpolated perplexity: single-word doc degenerates to unigram at ANY λ") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "world")).toDF("id", "text")
    val B = 64
    val t1 = Mixture.unigramLmTable(df, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val t2 = Mixture.bigramLmTable(df, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val uni = Mixture.perplexityScore(df, "id", "text", t1, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val i34 = Mixture.perplexityScoreInterp(df, "id", "text", t1, t2, B, 3, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(i34 == uni)
  }

  test("interpolated perplexity: repeated-bigram doc scores lower nll than shuffled twin") {
    import spark.implicits._
    // same unigram bag, different bigram structure: the repetitive doc's
    // bigrams dominate the corpus bigram table and must win under λ=3/4
    val df = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "a a b b a b b a a b a b")).toDF("id", "text")
    val B = 512
    val t1 = Mixture.unigramLmTable(df, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val t2 = Mixture.bigramLmTable(df, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val out = Mixture.perplexityScoreInterp(df, "id", "text", t1, t2, B, 3, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L))
  }

  test("ccnetBuckets: per-language terciles, head holds each language's lowest nll") {
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
    val B = 256
    val t1 = Mixture.unigramLmTable(docs, "text", B)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val out = Mixture.ccnetBuckets(docs, "doc_id", "text", "lang", t1, B)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getString(4)))
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      val byNll = rows.sortBy(r => (r._3, r._1))
      // bucket labels are monotone head <= middle <= tail along the nll order
      val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
      val seq = byNll.map(r => order(r._4))
      assert(seq.zip(seq.tail).forall { case (a, b) => a <= b }, s"$lang not monotone")
      // tercile sizes: each bucket holds between floor(n/3) and ceil(n/3)+1
      val sizes = seq.groupBy(identity).view.mapValues(_.length).toMap
      if (n >= 3) Seq(0, 1, 2).foreach { b =>
        val s = sizes.getOrElse(b, 0)
        assert(s >= n / 3 - 1 && s <= n / 3 + 2, s"$lang bucket $b size $s of $n")
      }
    }
  }
}
