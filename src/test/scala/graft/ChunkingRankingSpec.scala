package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Ranking}
import graft.queries.Tables

/** Chunking coverage contract + BM25 ranking sanity. */
class ChunkingRankingSpec extends SparkSpec {

  private def docs = Tables.t(spark, sf001, "documents")

  test("chunk: every token covered, consecutive chunks overlap exactly") {
    val w = 16; val ov = 4; val stride = w - ov
    val out = Chunking.chunk(docs, "doc_id", "text", w, ov)
      .select("id", "chunk_idx", "n_tokens", "tok_from", "tok_to").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (id, chunks) =>
      val n = lens(id)
      val sorted = chunks.sortBy(_._2)
      // indices 0..nc-1, first starts at 0, last ends at n
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      assert(sorted.head._4 == 0L && sorted.last._5 == n)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each next chunk starts exactly `stride` later → overlap = ov
          assert(b._4 - a._4 == stride.toLong, s"doc $id: starts $a $b")
        case _ => ()
      }
      // spans match n_tokens and the slice clamps at the doc end
      sorted.foreach { case (_, _, nt, from, to) => assert(to - from == nt) }
      // every chunk but the last is full-width
      sorted.init.foreach { case (_, _, nt, _, _) => assert(nt == w.toLong) }
    }
  }

  test("chunk: text roundtrip — chunk 0 text equals the first W tokens") {
    val w = 16
    val first = Chunking.chunk(docs, "doc_id", "text", w, 4)
      .filter(col("chunk_idx") === 0)
      .select("id", "chunk_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val expect = r.getString(1).split(" ", -1).take(w).mkString(" ")
      assert(first(r.getLong(0)) == expect)
    }
  }

  test("bm25: postings sparse, ranks dense from 1, score ordered desc") {
    val out = Ranking.bm25TopK(docs, "doc_id", "text", Seq("join", "data"), 10)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("rank"),
        r.getAs[Long]("tf"), r.getAs[Double]("score")))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(sorted.indices.map(i => (i + 1).toLong)))
      assert(sorted.forall(_._3 > 0L)) // only docs containing the term
      // scores non-increasing in rank
      sorted.map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ => ()
      }
    }
  }

  test("bm25: higher tf wins at equal dl; longer doc loses at equal tf") {
    import spark.implicits._
    val df = Seq(
      (1L, "x x y y"),      // tf(x)=2, dl=4
      (2L, "x z y y"),      // tf(x)=1, dl=4
      (3L, "x z y y w w")   // tf(x)=1, dl=6
    ).toDF("doc_id", "text")
    val ranked = Ranking.bm25TopK(df, "doc_id", "text", Seq("x"), 10)
      .orderBy("rank").select("id").collect().map(_.getLong(0))
    assert(ranked.sameElements(Seq(1L, 2L, 3L)))
  }
}
