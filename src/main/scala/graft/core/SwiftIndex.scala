package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Index/order parity helpers (SURVEY.md §1.1 row index, §7.4.2).
  *
  * Spark has no implicit row order; the pandas index becomes an explicit
  * column. Operators never rely on order internally — callers restore it
  * with `orderBy(index)` at materialization, mirroring the reference's
  * `pd.concat(...).sort_index()` (swifter/swifter.py:628).
  */
object SwiftIndex {

  /** Attach a stable 0-based row index reflecting the input's current
    * order. Uses `zipWithIndex` (one extra job to count partitions, then
    * a deterministic per-partition offset) rather than
    * `monotonically_increasing_id`, whose values encode partition ids
    * and are not dense. */
  def withRowIndex(df: DataFrame, name: String = "index"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Duplicate-index check, the analog of the reference's warning path
    * (swifter/swifter.py:86-91): returns true when `cols` uniquely key
    * the rows; logs a warning otherwise. */
  def checkUnique(df: DataFrame, cols: Seq[String]): Boolean = {
    val dup = df.groupBy(cols.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    val ok = dup == 0
    if (!ok) Console.err.println(
      s"[swift] WARNING: columns ${cols.mkString(",")} do not uniquely index rows " +
        "(duplicate index); order restoration will be partial, mirroring the " +
        "reference's duplicate-index warning")
    ok
  }
}
