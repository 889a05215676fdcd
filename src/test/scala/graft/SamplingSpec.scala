package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling (Sampling.scala): membership must be a pure
  * function of the row id — THE design property (a row must never migrate
  * between train and val when files compact or the cluster resizes), and
  * the reason the operator exists instead of df.sample (whose
  * per-partition seeding changes the selected set with layout). */
class SamplingSpec extends SparkSpec {

  private def docs = graft.queries.Tables.t(spark, sf001, "documents")

  test("deterministic: membership invariant under repartitioning") {
    val base = Sampling.deterministic(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(base.nonEmpty && base.length < docs.count())
    Seq(1, 7, 32).foreach { k =>
      val re = Sampling.deterministic(docs.repartition(k), "doc_id", 0.3)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(re.sameElements(base), s"membership changed at repartition($k)")
    }
  }

  test("deterministic: fraction 0 selects nothing, 1 selects everything") {
    assert(Sampling.deterministic(docs, "doc_id", 0.0).count() === 0L)
    assert(Sampling.deterministic(docs, "doc_id", 1.0).count() === docs.count())
  }

  test("split: disjoint, exhaustive, and invariant under repartitioning") {
    val w = Seq(0.8, 0.1, 0.1)
    val l = Seq("train", "val", "test")
    val s1 = Sampling.split(docs, "doc_id", w, l)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    // exhaustive: every row got exactly one label (withColumn keeps rows)
    assert(s1.length === docs.count())
    assert(s1.map(_._2).toSet.subsetOf(l.toSet))
    // the majority bucket should dominate on 50 rows at 80%
    val byLabel = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel("train") > byLabel.getOrElse("val", 0))
    val s2 = Sampling.split(docs.repartition(13), "doc_id", w, l)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(s2.sameElements(s1), "split labels changed under repartition(13)")
  }

  test("deterministicK: exact k, repartition-invariant, prefix-monotone, top-k plan") {
    val k10 = Sampling.deterministicK(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k10.size === 10)
    val k10b = Sampling.deterministicK(docs.repartition(9), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k10b === k10, "selected set changed under repartition(9)")
    // growing k only ADDS rows — extending a sample without resampling
    val k30 = Sampling.deterministicK(docs, "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k10.subsetOf(k30))
    // plan is per-partition top-k + merge, not a global sort
    val plan = Sampling.deterministicK(docs, "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan, got:\n$plan")
  }

  test("stratified: unlisted stratum with default=0.0 yields ZERO rows") {
    // default is a THRESHOLD fraction, not pass-through: 0.0 excludes
    // every hash, so strata absent from the map contribute nothing
    val out = Sampling.stratified(docs, "doc_id", "source",
      Map("src0" -> 1.0), default = 0.0)
    val srcs = out.select("source").distinct().collect().map(_.getString(0))
    assert(srcs.toSet === Set("src0"))
    // and the listed stratum at fraction 1.0 survives whole
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(out.count() === src0Total)
  }

  test("shuffleDeterministic: a total permutation, layout-invariant") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (i, s"doc$i")).toDF("id", "body")
    val out = Sampling.shuffleDeterministic(d, "id").collect()
    // total order: the emitted sequence is sorted by (shuffle_key, id)
    val keys = out.map(r => (r.getAs[Long]("shuffle_key"), r.getAs[Long]("id")))
    assert(keys.toSeq == keys.toSeq.sorted)
    // a permutation: every input id exactly once
    assert(out.map(_.getAs[Long]("id")).toSet == (0L until 500L).toSet)
    // actually shuffled (not identity order) and layout-invariant
    assert(out.map(_.getAs[Long]("id")).toSeq != (0L until 500L).toSeq)
    val re = Sampling.shuffleDeterministic(d.repartition(7), "id").collect()
    assert(re.map(_.getAs[Long]("id")).toSeq
      == out.map(_.getAs[Long]("id")).toSeq)
  }

  test("weighted: mirror-exact membership, monotone in w, layout-invariant") {
    import spark.implicits._
    val d = (0L until 400L).map(i => (i, (i % 5).toDouble / 4.0))
      .toDF("id", "w")
    val got = Sampling.weighted(d, "id", col("w"))
      .select("id").collect().map(_.getLong(0)).sorted
    // driver mirror: hash(id) < w·M, the exact filter arithmetic
    val want = (0L until 400L)
      .filter(i => Sampling.rowHashLong(i).toDouble
        < (i % 5).toDouble / 4.0 * Sampling.M)
      .sorted
    assert(got.toSeq === want)
    // w=0 never keeps, w=1 always keeps (hash < M holds for every hash)
    assert(got.forall(_ % 5 != 0))
    assert((0L until 400L).filter(_ % 5 == 4).forall(got.contains))
    // monotone: raising every weight only ADDS rows
    val raised = Sampling.weighted(
        d.withColumn("w", least(col("w") + 0.25, lit(1.0))), "id", col("w"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.toSet.subsetOf(raised))
    // layout-invariant
    val re = Sampling.weighted(d.repartition(11), "id", col("w"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(re.sameElements(got))
  }

  test("stratifiedK: per-stratum exact min(k,n), prefix-monotone, equals per-stratum deterministicK") {
    val out = Sampling.stratifiedK(docs, "doc_id", "source", 10)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    totals.foreach { case (src, n) =>
      assert(perSrc.getOrElse(src, Set()).size == math.min(10L, n),
        s"$src drew ${perSrc.getOrElse(src, Set()).size} of $n")
    }
    // equals the global exact-k draw restricted to each stratum
    totals.keys.foreach { src =>
      val direct = Sampling.deterministicK(
          docs.filter(col("source") === src), "doc_id", 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(perSrc(src) == direct, s"$src differs from deterministicK")
    }
    // prefix property per stratum: k=4 is a subset of k=10
    val k4 = Sampling.stratifiedK(docs, "doc_id", "source", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k4.subsetOf(out.map(_._1).toSet))
    // layout-invariant
    val re = Sampling.stratifiedK(docs.repartition(13), "doc_id", "source", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re == out.map(_._1).toSet)
  }

  test("stratified: per-stratum thresholds compose with the id hash") {
    val out = Sampling.stratified(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.4), default = 0.0)
    val perSrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src1Total = docs.filter(col("source") === "src1").count()
    assert(perSrc.getOrElse("src1", 0L) < src1Total,
      "fraction 0.4 should subsample the stratum")
    // membership within a stratum equals the plain deterministic draw
    // restricted to that stratum — strata only pick the threshold
    val direct = Sampling.deterministic(
        docs.filter(col("source") === "src1"), "doc_id", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val strat = out.filter(col("source") === "src1")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(strat.sameElements(direct))
  }
}
