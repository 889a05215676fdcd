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

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_word_hashes",
      exprs => WordHashArray(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingles",
      exprs => ShingleHashArray(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSig(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash30(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fixed_dot",
      exprs => FixedDot(exprs.head, exprs(1)), "scala_udf")
    // graft_hyperplane_sig(fx, tables, planes, dims) — LSH band signature
    reg.createOrReplaceTempFunction("graft_hyperplane_sig",
      exprs => HyperplaneSig(exprs.head,
        foldInt(exprs(1)), foldInt(exprs(2)), foldInt(exprs(3))), "scala_udf")
  }

  /** Config args of graft_hyperplane_sig must be integer literals. */
  private def foldInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_hyperplane_sig expects integer literals for (tables, planes, dims), got $other")
    }
}
