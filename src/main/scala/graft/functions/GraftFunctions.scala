package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the native graft expressions, so `spark.sql`
  * users can call them directly:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT graft_simhash(graft_shingles(graft_word_hashes(text))) FROM docs")
  * }}}
  */
object GraftFunctions {
  import HashExpressions._
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Name → expression builder for every native graft function — the one
    * source both [[register]] (temp functions) and
    * [[graft.plans.GraftExtensions]] (permanent, via
    * `spark.sql.extensions`) install from. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_word_hashes" -> (exprs => WordHashArray(exprs.head)),
    "graft_shingles" -> (exprs => ShingleHashArray(exprs.head)),
    "graft_minhash_sig" -> (exprs => MinHashSig(exprs.head)),
    "graft_simhash" -> (exprs => SimHash30(exprs.head)),
    "graft_fixed_dot" -> (exprs => FixedDot(exprs.head, exprs(1))),
    "graft_fixed_point" -> (exprs => FixedPointVec(exprs.head)),
    // graft_hyperplane_sig(fx, tables, planes, dims) — LSH band signature
    "graft_hyperplane_sig" -> (exprs => HyperplaneSig(exprs.head,
      foldInt(exprs(1)), foldInt(exprs(2)), foldInt(exprs(3)))),
    // graft_ngrams(whs, n) — word-n-gram hashes (decontamination joins)
    "graft_ngrams" -> (exprs => NgramHashArray(exprs.head, foldInt(exprs(1)))),
    // graft_fixed_dot_sq(vals, weights) — Σ x²·w in 128-bit → DECIMAL(38,0)
    "graft_fixed_dot_sq" -> (exprs => FixedDotSq(exprs.head, exprs(1))),
    // graft_repetition_stats(tokens) — (top_count, n_bigrams, n_distinct)
    "graft_repetition_stats" ->
      (exprs => TextExpressions.RepetitionStats(exprs.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }

  /** Integer config args (hyperplane tables/planes/dims, ngram n) must be
    * integer literals. */
  private def foldInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft function config arguments must be integer literals, got $other")
    }
}
