package graft.core

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** O4 — `df.swifter.groupby(by).apply(func)` (swifter/swifter.py:523-639).
  *
  * The reference hand-rolls a shuffle: distinct group keys are
  * np.array_split into chunks, each chunk (holding *complete* groups) is
  * shipped to a Ray task that runs `chunk.groupby(by).apply(func)`
  * (swifter/swifter.py:591-608). A Spark `groupByKey` shuffle gives that
  * group-completeness guarantee natively, so the whole mechanism collapses
  * into `flatMapGroups` — map-side combine and skew handling (AQE) come
  * for free.
  *
  * Routing mirrors the reference: at or below `groupbyLocalMaxRows` the
  * input is collected to a LocalRelation first (no cluster shuffle); above
  * it, always parallel — the reference never probes groupby ("Swifter
  * logic can't accurately estimate groupby applies",
  * swifter/swifter.py:638).
  */
final class SwiftGroupBy(sw: Swift, by: Seq[String], subset: Option[Seq[String]]) {
  private def df: DataFrame = sw.df

  /** `groupby(by)[cols]` column-subset projection
    * (`__getitem__`, swifter/swifter.py:584-586). */
  def select(cols: String*): SwiftGroupBy = new SwiftGroupBy(sw, by, Some(cols.toSeq))

  private def inputDf: DataFrame =
    subset.fold(df)(cols => df.select((by ++ cols).distinct.map(col).toIndexedSeq: _*))

  /** Arbitrary per-group function: receives the key Row (fields = `by`)
    * and all rows of the group; may return any number of rows of
    * `outSchema` (covers the reference's scalar / Series / frame-valued
    * group functions — the shape is fixed per query, SURVEY.md §7.4.5).
    */
  def apply(outSchema: StructType)(
      fn: (Row, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val in0 = inputDf
    val in =
      if (sw.nrows <= sw.cfg.groupbyLocalMaxRows) {
        sw.lastStrategy = SwiftStrategy.Local
        df.sparkSession.createDataFrame(in0.collect().toSeq.asJava, in0.schema)
      } else { sw.lastStrategy = SwiftStrategy.Parallel; in0 }

    val keySchema = StructType(by.map(c => in.schema(c)))
    val keyIdx = by.map(in.schema.fieldIndex).toArray
    val keyEnc = Encoders.row(keySchema)
    val outEnc = Encoders.row(outSchema)
    in.groupByKey(r => Row.fromSeq(keyIdx.toSeq.map(r.get)))(keyEnc)
      .flatMapGroups((k: Row, it: Iterator[Row]) => fn(k, it))(outEnc)
  }

  /** Scalar-result specialization: one value per group via a built-in
    * aggregate — the `Aggregator` fast path of SURVEY.md §2.1/O4. Stays
    * fully in Catalyst (partial aggregation map-side, codegen). */
  def agg(exprs: Column*): DataFrame = {
    sw.lastStrategy = SwiftStrategy.Vectorized
    inputDf.groupBy(by.map(col).toIndexedSeq: _*).agg(exprs.head, exprs.tail: _*)
  }
}
