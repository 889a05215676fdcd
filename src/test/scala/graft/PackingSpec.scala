package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence packing (Packing.scala): every doc starts inside its
  * sequence's budget window, assignment is a pure function of the id
  * set (layout-invariant like Sampling), and sequences fill greedily. */
class PackingSpec extends SparkSpec {

  private def docs = graft.queries.Tables.t(spark, sf001, "documents")

  test("every doc's start offset lies inside its sequence's window") {
    val packed = Packing.packTokens(docs, "doc_id", "text", 512L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.length === docs.count())
    // reconstruct per-bucket streams: cumulative start offsets must map
    // to exactly the assigned sequence — and stay within [seq*512, (seq+1)*512)
    packed.groupBy(_._2).foreach { case (bucket, rows) =>
      // bucket order is (rowHash, id); recompute it independently
      val ordered = rows.sortBy { case (id, _, _, _) =>
        (graft.operators.Sampling.rowHashLong(id), id) }
      var cum = 0L
      ordered.foreach { case (id, b, n, seq) =>
        val expectSeq = (cum / 512L) * 8L + b
        assert(seq === expectSeq, s"doc $id in bucket $b at offset $cum")
        cum += n
      }
    }
  }

  test("assignment invariant under repartitioning (pure id function)") {
    val base = Packing.packTokens(docs, "doc_id", "text", 512L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted
    Seq(1, 7, 32).foreach { k =>
      val re = Packing.packTokens(docs.repartition(k), "doc_id", "text", 512L, 8)
        .collect().map(r => (r.getLong(0), r.getLong(3))).sorted
      assert(re.sameElements(base), s"packing changed at repartition($k)")
    }
  }

  test("materialized sequences conserve every doc and every token") {
    val texts = Packing.packTexts(docs, "doc_id", "text", 512L, 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(texts.map(_._3).sum === docs.count())
    // the concatenation is space-joined, so token counts survive exactly
    texts.foreach { case (seq, t, _, n) =>
      assert(t.split(" ").length.toLong === n, s"seq $seq token drift")
    }
    // and the assignment view agrees on membership counts per sequence
    val assigned = Packing.packTokens(docs, "doc_id", "text", 512L, 8)
      .groupBy("seq_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    texts.foreach { case (seq, _, nDocs, _) =>
      assert(assigned(seq) === nDocs)
    }
  }

  test("budget below every doc size degenerates to one sequence per doc") {
    val one = Packing.packTokens(docs, "doc_id", "text", 1L, 2)
    assert(one.select(col("seq_id")).distinct().count() === one.count())
  }

  test("length-bucketed packing: sequences are band-homogeneous and cut padding spread") {
    val out = Packing.packTokensByLength(docs, "doc_id", "text", 512L, 16L, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // band rule: bucket = min(7, n_tokens/16), and every doc in a
    // sequence shares the band (seq ids interleave by band)
    out.foreach { case (_, b, n, seq) =>
      assert(b == math.min(7L, n / 16L))
      assert(seq % 8 == b)
    }
    // non-tail-band sequences have doc lengths within one 16-token band
    out.groupBy(_._4).foreach { case (_, rows) =>
      if (rows.head._2 < 7L) {
        val lens = rows.map(_._3)
        assert(lens.max - lens.min < 16L)
      }
    }
    // conservation: every doc exactly once
    assert(out.map(_._1).toSet.size == out.length)
    assert(out.length == docs.count())
    // layout-invariant
    val re = Packing.packTokensByLength(docs.repartition(9), "doc_id", "text",
        512L, 16L, 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(re == out.map(r => (r._1, r._4)).toSet)
  }
}
