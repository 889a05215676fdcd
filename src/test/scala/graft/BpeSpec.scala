package graft

import graft.operators.Bpe

/** BPE merge learning (operators/Bpe.scala) on a hand-checkable corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: greedy pair ranking and state rewrite") {
    // "the cat" appears 4x, "cat sat" 3x, "on the" 2x; after merging
    // the_cat, the next-best pair is the now-rewritten "the_cat sat"
    val d = Seq(
      "the cat sat on the mat",
      "the cat sat on the rug",
      "the cat sat here",
      "the cat naps"
    ).toDF("text")
    val m = Bpe.learnMerges(d, "text", 3).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "the", "cat", 4L)))
    assert(m(1) == ((2, "the_cat", "sat", 3L)))
    // after those merges the remaining pair counts: "on the" 2x wins
    // (tie-break would order lexicographically)
    assert(m(2)._2 == "on" && m(2)._3 == "the" && m(2)._4 == 2L)
  }

  test("learnMerges: adjacent-run replacement matches the two-pass contract") {
    // "a b a b" rewrites to "a_b a_b" (pass 2 catches the shared-space
    // occurrence); counts on later rounds see the rewritten state
    val d = Seq("a b a b", "a b x").toDF("text")
    val m = Bpe.learnMerges(d, "text", 2).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == (("a", "b", 3L)))
    // round 2 state: "a_b a_b" / "a_b x" → top pair is (a_b, a_b) 1x vs
    // (a_b, x) 1x — tie-break picks (a_b, a_b)
    assert(m(1) == (("a_b", "a_b", 1L)))
  }

  test("learnMergesBatched: kept merges are symbol-disjoint within a round") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val m = Bpe.learnMergesBatched(docs, "text", 2, 4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(m.nonEmpty)
    // across DIFFERENT pairs no symbol repeats (a self-pair like
    // "order order" is a single merge and is fine)
    m.groupBy(_._1).foreach { case (_, batch) =>
      batch.combinations(2).foreach { case Array(a, b) =>
        val sa = Set(a._3, a._4); val sb = Set(b._3, b._4)
        assert(sa.intersect(sb).isEmpty,
          s"overlapping symbols between $a and $b")
      }
    }
    // ranks are 1..k within each round
    m.groupBy(_._1).foreach { case (_, batch) =>
      assert(batch.map(_._2).sorted.toSeq == (1 to batch.length)) }
  }

  test("learnMergesBatched(perRound=1) == learnMerges") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val seq = Bpe.learnMerges(docs, "text", 3).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat = Bpe.learnMergesBatched(docs, "text", 3, 1)
      .orderBy("round").collect()
      .map(r => (r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(seq == bat)
  }

  test("learnMerges: fewer pairs than rounds terminates early") {
    val d = Seq("one two", "solo").toDF("text")
    val m = Bpe.learnMerges(d, "text", 5).collect()
    // round 1 merges (one,two); round 2 state has no pairs left → stop
    assert(m.length == 2 || m.length == 1) // (one_two) then possibly none
    assert(m.map(_.getInt(0)).toSeq == (1 to m.length))
  }
}
