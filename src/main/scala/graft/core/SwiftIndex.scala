package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index/order parity helpers (SURVEY.md §1.1 row index, §7.4.2).
  *
  * Spark has no implicit row order; the pandas index becomes an explicit
  * column. Operators never rely on order internally — callers restore it
  * with `orderBy(index)` at materialization, mirroring the reference's
  * `pd.concat(...).sort_index()` (swifter/swifter.py:628).
  */
object SwiftIndex {

  /** Attach a stable 0-based dense row index reflecting the input's
    * current order — partition-offset arithmetic in the DataFrame API,
    * never dropping to the RDD (an `rdd.zipWithIndex` deserializes out of
    * Tungsten and kills codegen/columnar for everything downstream).
    *
    * Same structure as zipWithIndex, kept declarative: one tiny job
    * counts rows per partition (`spark_partition_id` groupBy — collects
    * #partitions rows, not data), offsets are a broadcast-sized map
    * literal, and the index itself is `offset[pid] + position`, where
    * position is the low 33 bits of `monotonically_increasing_id` (the
    * documented per-partition record counter). Both jobs traverse the
    * same deterministic lineage — the identical assumption zipWithIndex
    * makes. */
  def withRowIndex(df: DataFrame, name: String = "index"): DataFrame = {
    val pid = "__swift_pid"
    val mono = "__swift_mono"
    val tagged = df
      .withColumn(pid, spark_partition_id())
      .withColumn(mono, monotonically_increasing_id())
    val counts = tagged.groupBy(col(pid)).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = typedlit(offsets)
    tagged
      .withColumn(name,
        element_at(offCol, col(pid)) +
          (col(mono) - shiftleft(col(pid).cast("long"), 33)))
      .drop(pid, mono)
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
