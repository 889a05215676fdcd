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
  }
}
