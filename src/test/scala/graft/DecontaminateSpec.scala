package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, MirrorHash}
import graft.operators.{Decontaminate, TextAnalysis}

/** Decontamination (Decontaminate.scala) + repetition metrics
  * (TextAnalysis.repetition): the Bloom path must be bit-identical to the
  * exact path (FPP adds verify probes, never rows), the native n-gram
  * expression must agree with its HOF executable spec, and the metrics
  * must match hand-computed values. */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private def docs = graft.queries.Tables.t(spark, sf001, "documents")

  test("ngram_hashes native expression == MirrorHash HOF spec") {
    val both = docs.select(
      HashExpressions.ngram_hashes(
        HashExpressions.word_hashes(col("text")), 8).as("native"),
      MirrorHash.ngramHashes(
        MirrorHash.wordHashes(col("text")), 8).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
    // short docs: fewer words than n yields an empty gram array, not null
    val short = Seq("a b c").toDF("text").select(
      HashExpressions.ngram_hashes(
        HashExpressions.word_hashes(col("text")), 8).as("g"))
    assert(short.select(size(col("g"))).head().getInt(0) === 0)
  }

  test("ngram_hashes_wide native expression == MirrorHash HOF spec; packs two chains") {
    val both = docs.select(
      HashExpressions.ngram_hashes_wide(
        HashExpressions.word_hashes(col("text")), 8).as("native"),
      MirrorHash.ngramHashesWide(
        MirrorHash.wordHashes(col("text")), 8).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
    // packing algebra: the high chain (wide div P, exact Long division
    // driver-side — double division would lose bits above 2^53) must be
    // exactly the plain 131-chain ngram hash
    val p = MirrorHash.P
    val rows = docs.limit(50).select(
      HashExpressions.ngram_hashes_wide(
        HashExpressions.word_hashes(col("text")), 8).as("wide"),
      HashExpressions.ngram_hashes(
        HashExpressions.word_hashes(col("text")), 8).as("narrow")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wide = r.getSeq[Long](0); val narrow = r.getSeq[Long](1)
      assert(wide.map(_ / p) == narrow)
    }
  }

  test("exact contamination finds a planted 8-gram overlap, and only it") {
    val gram = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (0L, s"held out doc containing $gram for the benchmark"),
      (1L, s"training doc that leaked $gram into the corpus"),
      (2L, "training doc with entirely disjoint words only here"),
      (3L, "alpha beta gamma delta epsilon zeta eta")) // 7 of 8 — no hit
      .toDF("doc_id", "text")
    val hits = Decontaminate.contaminated(df, "doc_id", "text",
      id => id === 0L, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits === Map(1L -> 1L))
  }

  test("bloom path is bit-identical to the exact path") {
    val exact = Decontaminate.contaminated(docs, "doc_id", "text",
      id => id % 17 === 0, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloom = Decontaminate.contaminatedBloom(docs, "doc_id", "text",
      id => id % 17 === 0, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact === bloom)
    assert(exact.nonEmpty) // sf0.001 plants real near-dup overlaps
  }

  test("repetition metrics match hand-computed values") {
    val df = Seq(
      (0L, "x x x y"),        // top word 3/4; bigrams: x x, x x, x y → dup 1/3
      (1L, "a b c d"),        // no repetition at all
      (2L, "p q p q p"))      // top 3/5; bigrams p q,q p,p q,q p → dup 2/4
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetition(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(m(0L) === ((4L, 0.75, 1.0 - 2.0 / 3.0)))
    assert(m(1L) === ((4L, 0.25, 0.0)))
    assert(m(2L) === ((5L, 0.6, 0.5)))
  }

  test("native RepetitionStats == HOF executable spec on real documents") {
    val native = TextAnalysis.repetition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val spec = TextAnalysis.repetitionSpec(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(native === spec)
  }

  test("streaming decontamination == batch operator, row for row") {
    val batch = Decontaminate.contaminated(docs, "doc_id", "text",
      id => id % 17 === 0, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val stream = graft.streaming.StreamOps.decontamOnce(spark, sf001,
      evalMod = 17, n = 8, sinkName = "spec_decontam_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stream === batch)
  }

  test("quality gate: verdicts match the component signals") {
    val g = TextAnalysis.qualityGate(docs, "doc_id", "text",
      "en", 40L, 0.12, 0.10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getString(4), r.getInt(5)))
    assert(g.nonEmpty)
    g.foreach { case (id, n, tws, dbf, lang, keep) =>
      val expect = if (lang == "en" && n >= 40 && tws <= 0.12 && dbf <= 0.10) 1 else 0
      assert(keep === expect, s"doc $id: n=$n tws=$tws dbf=$dbf lang=$lang")
    }
    // the thresholds actually split the corpus — a gate that keeps or
    // drops everything is a configuration bug, not a filter
    assert(g.exists(_._6 == 1) && g.exists(_._6 == 0))
  }

  test("decontamination plan: corpus side broadcast-joins, no gram shuffle") {
    val plan = Decontaminate.contaminated(docs, "doc_id", "text",
      id => id % 17 === 0, n = 8)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus grams must never shuffle-join:\n$plan")
  }
}
