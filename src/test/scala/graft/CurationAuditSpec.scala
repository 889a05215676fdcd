package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Decontaminate, Dedup, Mixture, Similarity, TextAnalysis}
import graft.queries.Tables

/** Contracts for the round-11 curation/audit operators: boilerplate
  * removal, contamination rate, keep-rate threshold, CDC chunking,
  * KMV distinct sketch, margin mining, cluster stats. */
class CurationAuditSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.t(spark, sf001, "documents")
  private def embs = Tables.t(spark, sf001, "embeddings")

  // ---- boilerplate ----

  test("boilerplate: per-source df>=2 lines removed, other sources untouched") {
    val df = Seq(
      (1L, "s1", "cookie banner\nreal content one"),
      (2L, "s1", "cookie banner\nreal content two"),
      (3L, "s2", "cookie banner\nreal content three"),
      (4L, "s1", "cookie banner\ncookie banner")
    ).toDF("id", "src", "text")
    val out = TextAnalysis.boilerplate(df, "id", "src", "text", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // "cookie banner" appears in 3 distinct s1 docs → removed from s1
    assert(out(1L) == ((2L, 1L, "real content one")))
    assert(out(2L) == ((2L, 1L, "real content two")))
    // s2 has it only once → kept there
    assert(out(3L) == ((2L, 2L, "cookie banner\nreal content three")))
    // a doc whose EVERY line is boilerplate survives with empty text
    // (within-doc repeats count once toward df)
    assert(out(4L) == ((2L, 0L, "")))
  }

  test("boilerplate: no line reaches min-df → identity on text") {
    val seg = TextAnalysis.segmentLines(docs.limit(50), "doc_id", "text", 12,
      keep = Seq("source"))
    val out = TextAnalysis.boilerplate(seg, "id", "source", "text", 1000)
    val joined = out.join(seg.select(col("id"), col("text").as("orig")), "id")
    assert(joined.filter(col("clean_text") =!= col("orig")).count() == 0)
    assert(joined.filter(col("n_kept") =!= col("n_lines")).count() == 0)
  }

  // ---- contamination rate ----

  test("contaminationRate: contained eval doc rates 1.0, disjoint rates 0.0") {
    val df = Seq(
      (0L, "a b c d e f g h i j"), // eval (id % 2 == 0): inside train doc 1
      (1L, "a b c d e f g h i j k l m n"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"), // eval: disjoint from train
      (3L, "p q r s t u v w x y")
    ).toDF("id", "text")
    val out = Decontaminate.contaminationRate(df, "id", "text",
        id => id % 2 === 0, n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(0L)._1 == 3L && out(0L)._2 == 3L && out(0L)._3 == 1.0)
    assert(out(2L)._1 == 2L && out(2L)._2 == 0L && out(2L)._3 == 0.0)
    assert(out.keySet == Set(0L, 2L)) // training docs never emitted
  }

  test("contaminationRate: n_hit consistent with the contaminated flag set") {
    // any eval doc with rate > 0 shares ≥1 gram with SOME train doc —
    // cross-check against the production decontam operator run in the
    // reverse orientation
    val rates = Decontaminate.contaminationRate(docs, "doc_id", "text",
      id => id % 17 === 0, n = 8)
    val flagged = Decontaminate.contaminated(docs, "doc_id", "text",
      id => id % 17 === 0, n = 8)
    val anyHits = rates.filter(col("n_hit") > 0).count()
    val anyFlagged = flagged.count()
    // both sides agree on whether ANY overlap exists at all
    assert((anyHits > 0) == (anyFlagged > 0))
    rates.collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_hit <= n_grams
    }
  }

  // ---- keep-rate threshold ----

  test("thresholdByKeepRate: keeps at least ceil(rate*N), ties kept, exact kth") {
    val scores = Seq(10L, 20L, 20L, 30L, 40L, 50L, 50L, 50L, 60L, 70L)
    val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    for (rate <- Seq(0.1, 0.3, 0.5, 0.9, 1.0)) {
      val out = Mixture.thresholdByKeepRate(df, "id", col("s"), rate).collect()
      val k = math.ceil(rate * scores.size).toLong
      val kth = scores.sorted(Ordering[Long].reverse)(k.toInt - 1)
      val kept = out.filter(_.getInt(3) == 1)
      assert(out.forall(_.getLong(2) == kth), s"rate $rate: thr != $kth")
      assert(kept.length >= k, s"rate $rate under-kept")
      assert(kept.forall(_.getLong(1) >= kth))
      // maximality: dropping to the next-higher distinct score would
      // under-keep
      val above = scores.count(_ > kth)
      assert(above < k)
    }
  }

  // ---- CDC chunking ----

  test("cdcChunks: spans partition the doc and text reassembles") {
    val out = Chunking.cdcChunks(docs.limit(100), "doc_id", "text", 4, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(6)))
    val texts = docs.limit(100).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.groupBy(_._1).foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      assert(sorted.head._3 == 0L)
      val n = texts(id).split(" ", -1).length.toLong
      assert(sorted.last._4 == n)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4) // contiguous spans
        case _ => ()
      }
      sorted.foreach { case (_, _, f, t, nt, _) => assert(t - f == nt && nt > 0) }
      assert(sorted.map(_._6).mkString(" ") == texts(id))
    }
  }

  test("cdcChunks: an early edit shifts only its own chunk's identity") {
    val base = docs.limit(60).select(col("doc_id").as("id"), col("text"))
    // prepend one token — fixed-window chunking would re-key EVERY chunk
    val edited = base.select(col("id"), concat(lit("zzedit "), col("text")).as("text"))
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Chunking.cdcChunks(df, "id", "text", 4, 16)
        .groupBy("id").agg(collect_set(col("chunk_hash")).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val h0 = hashes(base)
    val h1 = hashes(edited)
    // across the corpus, the vast majority of chunk identities survive
    // the edit (only the first chunk of each doc can change)
    val (kept, total) = h0.keys.foldLeft((0, 0)) { case ((k, t), id) =>
      (k + (h0(id) & h1(id)).size, t + h0(id).size)
    }
    assert(kept >= (total * 0.5).toInt, s"only $kept/$total chunk ids survived")
    // and every doc with ≥2 chunks keeps its final chunk
    h0.foreach { case (id, hs) =>
      if (hs.size >= 2) assert((hs & h1(id)).nonEmpty)
    }
  }

  test("cdcDedupStats: duplicated doc pair → every chunk duplicated") {
    val df = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15 q16 q17 q18")
    ).toDF("id", "text")
    val out = Chunking.cdcDedupStats(
      Chunking.cdcChunks(df, "id", "text", 4, 16))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(1L)._3 == 1.0) // twin docs: all chunks shared
    assert(out(2L)._3 == 1.0)
    // identical text → identical chunking on both twins
    assert(out(1L)._1 == out(2L)._1)
  }

  // ---- KMV sketch ----

  test("distinctKmv: estimate within 35% of exact distinct on real sources") {
    val est = TextAnalysis.distinctKmv(docs, "source", "text", 4, 32, 16)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = docs.select(col("source"),
        explode(graft.functions.HashExpressions.ngram_hashes(
          graft.functions.HashExpressions.word_hashes(col("text")), 4)).as("g"))
      .distinct().groupBy("source").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (s, d) =>
      val e = est(s)
      assert(math.abs(e - d) <= 0.35 * d, s"$s: est $e vs exact $d")
    }
  }

  test("distinctKmv: tiny source takes the inverse-probability fallback") {
    val df = Seq(("tiny", "a b c d e f"), ("tiny", "a b c d e f"))
      .toDF("src", "text")
    val out = TextAnalysis.distinctKmv(df, "src", "text", 4, 32, 16).collect()
    // the source row survives even when every gram hash sits above the
    // threshold (n_low may be 0) — audits cover every source
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) < 32) // below k → fallback
    assert(r.isNullAt(2)) // hk null
    assert(r.getDouble(3) == r.getLong(1).toDouble * 16)
  }

  // ---- margin mining ----

  test("marginMining: one best match per left id, margin formula exact") {
    val out = Similarity.marginMining(embs, "vec_id", "embedding",
      id => id % 2 === 0, k = 4, tau = 0.0)
    val rows = out.collect()
    val qids = rows.map(_.getLong(0))
    assert(qids.distinct.length == qids.length, "duplicate qid")
    assert(qids.length == embs.filter(col("vec_id") % 2 === 0).count())
    // recompute the margin for a few rows from the raw pair frame
    val fx = Similarity.fixedPoint(embs, "vec_id", "embedding")
    val a = fx.filter(col("id") % 2 === 0)
      .select(col("id").as("aid"), col("fx").as("fa"), col("nrm").as("na"))
    val b = fx.filter(col("id") % 2 =!= 0)
      .select(col("id").as("bid"), col("fx").as("fb"), col("nrm").as("nb"))
    val pairs = a.crossJoin(b).select(col("aid"), col("bid"),
        round(lit(1e6) * (graft.functions.HashExpressions.fixed_dot(col("fa"), col("fb"))
          / sqrt(col("na").cast("double") * col("nb").cast("double"))))
          .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byA = pairs.groupBy(_._1._1).map { case (aid, m) =>
      aid -> m.values.toSeq.sorted(Ordering[Long].reverse).take(4) }
    val byB = pairs.groupBy(_._1._2).map { case (bid, m) =>
      bid -> m.values.toSeq.sorted(Ordering[Long].reverse).take(4) }
    rows.take(20).foreach { r =>
      val (qid, vid, c, m) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(pairs((qid, vid)) == c)
      val sa = byA(qid); val sb = byB(vid)
      val expect = (c.toDouble * 2 * sa.size * sb.size) /
        (sa.sum * sb.size + sb.sum * sa.size).toDouble
      assert(m == expect, s"margin $m != $expect for ($qid,$vid)")
      // best match: c is the max cosine for qid (modulo tie-break on bid)
      assert(c == byA(qid).head)
    }
  }

  test("marginMining: tau filters and hub margins stay near 1") {
    val all = Similarity.marginMining(embs, "vec_id", "embedding",
      id => id % 2 === 0, k = 4, tau = 0.0).collect()
    val cut = Similarity.marginMining(embs, "vec_id", "embedding",
      id => id % 2 === 0, k = 4, tau = 1.0).collect()
    assert(cut.length == all.count(_.getDouble(3) >= 1.0))
    // a best match can never fall below its own neighborhood average on
    // the left side alone; margins concentrate around ~1
    assert(all.forall(r => r.getDouble(3) > 0.5 && r.getDouble(3) < 2.5))
  }

  // ---- hard negatives / label noise ----

  test("hardNegatives: every mined negative carries a different label, ranks dense") {
    val out = Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
      id => id < 5, k = 5).collect()
    val labels = embs.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements((1 to sorted.length).map(_.toLong)))
      sorted.foreach { r =>
        assert(r.getInt(3) != labels(qid)) // neg_label differs
        assert(r.getInt(3) == labels(r.getLong(2))) // and is the true label
      }
      // scores non-increasing in rank
      sorted.map(_.getDouble(4)).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b)
        case _ => ()
      }
    }
  }

  test("hardNegatives: equals bruteForceTopK restricted to other-label candidates") {
    val k = 5
    val hn = Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
      id => id < 3, k).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val labels = embs.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // big-k brute top list, filtered to other-label, re-truncated to k
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      id => id < 3, k = 500).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSeq
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(_._3).filter(t => labels(t._2) != labels(qid)).take(k)
          .map(t => (qid, t._2))
      }.toSet
    assert(hn == brute)
  }

  test("labelNoise: a planted mislabel is flagged, clean twins score 0") {
    val dim = 64
    def vec(sign: Double) = Array.tabulate(dim)(i => (if (i == 0) sign else 0.01f * (i % 3)).toFloat)
    val rows =
      (1L to 10L).map(i => (i, vec(1.0), 1)) ++ // cluster A, label 1
      (11L to 20L).map(i => (i, vec(-1.0), 2)) ++ // cluster B, label 2
      Seq((21L, vec(1.0), 2)) // A-shaped vector mislabeled as 2
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelNoise(df, "vec_id", "embedding", "label", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 21) // every row reports
    // the planted mislabel: all its bucket-mates are label 1
    assert(out(21L)._3 == 1.0, out(21L))
    // clean members of A see mostly label-1 neighbors (the one impostor
    // can appear among the 5); mismatch stays well under half
    (1L to 10L).foreach { i => assert(out(i)._3 <= 0.2, s"$i: ${out(i)}") }
    (11L to 20L).foreach { i => assert(out(i)._3 == 0.0, s"$i: ${out(i)}") }
    out.values.foreach { case (nNb, nSame, frac) =>
      assert(nSame <= nNb && nNb <= 5)
      if (nNb > 0) assert(frac == (nNb - nSame).toDouble / nNb)
    }
  }

  test("stream contamination-rate twin equals the batch operator") {
    val batch = Decontaminate.contaminationRate(docs, "doc_id", "text",
        id => id % 17 === 0, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val stream = graft.streaming.StreamOps.contamRateOnce(spark, sf001, 17, 8,
        sinkName = "contam_rate_spec_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(stream == batch)
  }

  test("ccnet capstone: keeps exactly the non-tail two-thirds of each predicted language") {
    val out = graft.queries.ExtQueries.queries("pipe_ccnet_filter")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(4)))
    assert(out.nonEmpty)
    assert(out.forall(_._3 != "tail"))
    // per predicted language, the kept share is ~2/3 (tercile cuts)
    val tagged = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.groupBy(_._2).foreach { case (pl, rows) =>
      val total = tagged.values.count(_ == pl)
      if (total >= 6) {
        val share = rows.length.toDouble / total
        assert(share > 0.55 && share < 0.8, s"$pl kept $share of $total")
      }
    }
  }

  test("stream phrase-hits twin equals the batch positional-index search") {
    val phrases = Seq("table hash", "customer join", "slow hash batch")
    val batch = graft.operators.Ranking
      .phraseSearch(docs, "doc_id", "text", phrases)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val stream = graft.streaming.StreamOps.phraseHitsOnce(spark, sf001, phrases,
        sinkName = "stream_phrase_spec_sink")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && stream == batch)
  }

  test("temperature-mix capstone: per-doc copies bracket the source's epoch rate") {
    val rates = Mixture.temperaturePlan(docs, "source", "text", 4.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val out = graft.queries.ExtQueries.queries("pipe_temperature_mix")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    perDoc.foreach { case (id, n) =>
      val rate = rates(srcOf(id))
      assert(n == math.floor(rate).toLong || n == math.floor(rate).toLong + 1,
        s"doc $id: $n copies at rate $rate")
    }
    // the largest source runs at exactly maxEpochs (rel_weight = 1)
    val largest = rates.maxBy(_._2)._1
    assert(math.abs(rates(largest) - 4.0) < 1e-12)
    // and per-source replication mass tracks the rate within the
    // Bernoulli tolerance
    out.groupBy(_._2).foreach { case (src, rows) =>
      val nDocs = srcOf.values.count(_ == src)
      val mean = rows.size.toDouble / nDocs
      assert(math.abs(mean - rates(src)) < 0.5, s"$src mean $mean rate ${rates(src)}")
    }
  }

  test("stream weighted-retention twin equals the batch operator") {
    val ws = split(col("text"), " ")
    val w = size(array_distinct(ws)).cast("long").cast("double") /
      size(ws).cast("long").cast("double")
    val batch = graft.operators.Sampling.weighted(
        docs.select(col("doc_id"), col("source"), w.as("keep_w")),
        "doc_id", col("keep_w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val stream = graft.streaming.StreamOps.weightedSampleOnce(spark, sf001,
        sinkName = "stream_weighted_spec_sink")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(stream == batch)
  }

  // ---- tf-idf keywords / pii stats ----

  test("tfidfKeywords: planted rare token outranks stopwords, ranks dense") {
    val df = Seq(
      (1L, "the the the zyzzyva the the"),
      (2L, "the a of and is to in the"),
      (3L, "the a of and is to in a")
    ).toDF("id", "text")
    val out = graft.operators.Ranking.tfidfKeywords(df, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // doc 1's top keyword is the corpus-unique token, despite tf 1 vs 5
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.head._3 == "zyzzyva", d1.toSeq)
    assert(d1.head._5 == 1L) // df 1
    // ranks dense from 1 per doc
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements((1 to rows.length).map(_.toLong)))
    }
    // "the" appears in all 3 docs → idf floor 1/(2N+1): positive (the
    // rational form never crosses zero) but behind the unique token even
    // at tf 5 vs 1
    val theScore = d1.find(_._3 == "the").map(_._6)
    assert(theScore.forall(s => s > 0 && s < d1.head._6), d1.toSeq)
  }

  test("piiStats: planted hits counted per source and pattern") {
    val df = Seq(
      ("s1", "call 5551234 or 42"),
      ("s1", "no numbers here"),
      ("s2", "user7 has id 99999")
    ).toDF("src", "text")
    val pats = Seq("digits" -> "[0-9]+", "long_digits" -> "[0-9]{4,}",
      "alnum_id" -> "[a-z]+[0-9]+")
    val out = graft.operators.TextAnalysis.piiStats(df, "src", "text", pats)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("s1", "digits")) == ((1L, 2L)))
    assert(out(("s1", "long_digits")) == ((1L, 1L)))
    assert(out(("s1", "alnum_id")) == ((0L, 0L)))
    assert(out(("s2", "digits")) == ((1L, 2L))) // "7" inside user7 + 99999
    assert(out(("s2", "long_digits")) == ((1L, 1L)))
    assert(out(("s2", "alnum_id")) == ((1L, 1L)))
    // every (source, pattern) cell reports, including zero cells
    assert(out.size == 6)
  }

  test("stream PII twin equals the batch operator") {
    val pats = Seq("digits" -> "[0-9]+", "alnum_id" -> "[a-z]+[0-9]+")
    val batch = TextAnalysis.piiStats(docs, "source", "text", pats)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val stream = graft.streaming.StreamOps.piiStatsOnce(spark, sf001, pats,
        sinkName = "pii_spec_sink")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(stream == batch)
  }

  // ---- incremental embedding dedup ----

  test("incrementalEmbDedup: flags equal the cross-split slice of batch pairs") {
    val ref = embs.filter(col("vec_id") % 3 =!= 0)
    val inc = embs.filter(col("vec_id") % 3 === 0)
    val out = graft.operators.Dedup.incrementalEmbDedup(
        ref, inc, "vec_id", "embedding", 0.45, tables = 150)
      .collect().map(r => r.getLong(0) -> (r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out.size == inc.count())
    // differential: the batch LSH pair operator on the FULL corpus,
    // sliced to cross-split pairs, must flag the same incoming ids
    val batch = graft.operators.Dedup.embeddingPairs(
        embs, "vec_id", "embedding", 0.45, tables = 150)
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq(a -> b, b -> a)
      }.filter { case (x, y) => x % 3 == 0 && y % 3 != 0 }
      .groupBy(_._1)
    out.foreach { case (id, (flag, _)) =>
      assert((flag == 1) == batch.contains(id), s"id $id flag $flag")
    }
    // the reported match is the best (cos desc) verified candidate
    batch.foreach { case (id, _) => assert(out(id)._1 == 1) }
  }

  // ---- phrase search ----

  test("phraseSearch: counts equal a brute sliding-window recount") {
    val phrases = Seq("table hash", "customer join", "slow hash batch")
    val got = graft.operators.Ranking
      .phraseSearch(docs, "doc_id", "text", phrases)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = docs.select("doc_id", "text").collect().flatMap { r =>
      val (id, ws) = (r.getLong(0), r.getString(1).split(" "))
      phrases.flatMap { ph =>
        val p = ph.split(" ")
        val n = ws.sliding(p.length).count(_.sameElements(p))
        if (n > 0) Some((ph, id) -> n.toLong) else None
      }
    }.toMap
    assert(want.nonEmpty, "probe phrases must occur in the fixture corpus")
    assert(got === want)
  }

  test("phraseSearch: overlapping matches and repeated words count per start") {
    val df = Seq((1L, "a a a b a a"), (2L, "b b b"), (3L, "a b")).toDF("id", "text")
    val out = graft.operators.Ranking.phraseSearch(df, "id", "text", Seq("a a", "a b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "a a a" has TWO overlapping starts; doc 2 contains neither phrase
    assert(out === Map(("a a", 1L) -> 3L, ("a b", 1L) -> 1L, ("a b", 3L) -> 1L))
  }

  test("phraseContexts: window slices clamp at doc edges, pos is the match start") {
    val df = Seq((1L, "x a b y z"), (2L, "a b"), (3L, "q a b")).toDF("id", "text")
    val out = graft.operators.Ranking
      .phraseContexts(df, "id", "text", Seq("a b"), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(out === Set(
      (1L, 1L, "x a b y z"),   // 2 tokens both sides, clamped to the doc
      (2L, 0L, "a b"),          // phrase == doc
      (3L, 1L, "q a b")))       // left side clamped at 1 token
  }

  test("phraseContexts: one row per occurrence, context holds the phrase") {
    val out = graft.operators.Ranking
      .phraseContexts(docs, "doc_id", "text", Seq("table hash"), 3)
      .collect()
    val counts = graft.operators.Ranking
      .phraseSearch(docs, "doc_id", "text", Seq("table hash"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out.length == counts.values.sum)
    out.foreach { r => assert(r.getString(3).contains("table hash")) }
  }

  test("pipe_curriculum_pack packs exactly the stage<=1 docs of mix_curriculum") {
    val spark0 = spark
    val stages = graft.queries.ExtQueries.queries("mix_curriculum")(spark0, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val packed = graft.queries.ExtQueries.queries("pipe_curriculum_pack")(spark0, sf001)
      .collect().map(_.getLong(0)).toSet
    val easy = stages.filter(_._2 <= 1L).keySet
    assert(packed == easy && easy.nonEmpty && easy.size < stages.size)
  }

  // ---- curriculum staging ----

  test("curriculumStages: stages ordered by nll, bounded, extremes pinned") {
    val tbl = Mixture.unigramLmTable(docs, "text", 512)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val out = Mixture.curriculumStages(docs, "doc_id", "text", tbl, 512, 4)
      .collect().map(r => (r.getDouble(2), r.getLong(3)))
    assert(out.forall { case (_, s) => s >= 0 && s <= 3 })
    // monotone: stage never decreases as nll grows
    val byNll = out.sortBy(_._1)
    assert(byNll.zip(byNll.tail).forall { case ((_, a), (_, b)) => a <= b })
    // the most predictable doc sits in stage 0, the most surprising in 3
    assert(byNll.head._2 == 0L && byNll.last._2 == 3L)
  }

  test("curriculumStages: degenerate corpus (hi == lo) collapses to stage 0") {
    val df = Seq((1L, "x y"), (2L, "x y")).toDF("id", "text")
    val tbl = Mixture.unigramLmTable(df, "text", 64)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    val out = Mixture.curriculumStages(df, "id", "text", tbl, 64, 4)
      .collect().map(_.getLong(3))
    assert(out.forall(_ == 0L))
  }

  // ---- k-anonymity ----

  test("kAnonymity: census counts and the at-risk flag") {
    val df = Seq(
      ("en", "s1"), ("en", "s1"), ("en", "s1"),
      ("en", "s2"), ("zh", "s1")
    ).toDF("lang", "src")
    val out = TextAnalysis.kAnonymity(df, Seq("lang", "src"), 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      ("en", "s1") -> (3L, 0L),
      ("en", "s2") -> (1L, 1L),
      ("zh", "s1") -> (1L, 1L)))
  }

  // ---- cluster stats ----

  test("clusterStats: histogram mass equals clustered node count") {
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L), (8L, 9L))
      .toDF("da", "db")
    val labels = Dedup.clusters(pairs, "da", "db")
    val out = Dedup.clusterStats(labels, "l").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one 3-cluster + three 2-clusters
    assert(out.toSet == Set((2L, 3L, 6L), (3L, 1L, 3L)))
    assert(out.map(_._3).sum == labels.count())
  }

  // ---- novelty ----

  test("novelty: exact copy scores 0, fresh text 1, short doc defaults 1") {
    val nine = (1 to 9).map(i => s"w$i").mkString(" ")       // 2 distinct 8-grams
    val fresh = (1 to 9).map(i => s"q$i").mkString(" ")
    val df = Seq(
      (1L, nine),            // first occurrence of both grams
      (2L, nine),            // exact copy: nothing novel
      (3L, fresh),           // disjoint vocabulary: all novel
      (4L, "too short"))     // < 8 words: no grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.novelty(df, "doc_id", "text", 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((2L, 2L, 1.0)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((2L, 2L, 1.0)))
    assert(out(4L) === ((0L, 0L, 1.0)))
  }

  test("novelty counts DISTINCT grams — in-doc repetition cannot inflate") {
    val rep = ((1 to 8) ++ (1 to 8)).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.novelty(Seq((1L, rep)).toDF("doc_id", "text"),
        "doc_id", "text", 8)
      .collect().head
    // 16 words → 9 gram positions, but the wrap repeats gram w1..w8
    assert(out.getLong(1) < 9L, "distinct grams must dedup in-doc repeats")
    assert(out.getDouble(3) === 1.0)
  }
}
