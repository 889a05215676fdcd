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

  /** Robust scaling (sklearn RobustScaler): (x − median) ∕ (Q3 − Q1) —
    * the outlier-immune alternative to [[zscore]] (one wild value moves
    * a mean/std arbitrarily; quartiles don't budge). ONE exact
    * sort-based percentile aggregate (Spark's `percentile`, type-7
    * linear interpolation — the `rel_percentiles`-proven DuckDB
    * quantile_cont twin), the 1-row stats frame broadcast back, then a
    * pure per-row projection; a constant-IQR column scales to 0.0
    * rather than ±Inf. */
  def robustScale(df: DataFrame, valueCol: String, out: String): DataFrame = {
    val stats = df
      .agg(expr(s"percentile($valueCol, array(0.25D, 0.5D, 0.75D))").as("__p"))
      .select(element_at(col("__p"), 1).as("__q1"),
        element_at(col("__p"), 2).as("__med"),
        element_at(col("__p"), 3).as("__q3"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, when(col("__q3") === col("__q1"), lit(0.0))
        .otherwise((col(valueCol) - col("__med")) / (col("__q3") - col("__q1"))))
      .drop("__q1", "__med", "__q3")
  }

  /** Leave-one-out target encoding — the category feature every tabular
    * training stack derives (replace a categorical with the mean target
    * of its OTHER members; plain per-category means leak the row's own
    * label): loo = (Σ_cat target − x) ∕ (n_cat − 1), null for
    * singleton categories. Targets integerize to micro-units so the
    * sums are exact BIGINTs and the one IEEE division per row is
    * mirrored; the category stats come from ONE map-side-combined hash
    * aggregate (|categories| rows) broadcast back — never a per-cat
    * window, so a category holding half the corpus costs nothing extra.
    * Null handling (r12 ADVICE): `__n` counts NON-NULL targets only (a
    * null target must not deflate its category-mates' loo mean), a
    * null-target row's own loo is null (its `__x` is null), and rows
    * with a null CATEGORY survive via the left join with a null
    * encoding rather than being silently dropped. */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      out: String): DataFrame = {
    val xm = (col(targetCol).cast(org.apache.spark.sql.types.DecimalType(20, 6))
      * lit(1000000L)).cast("long")
    val stats = df.groupBy(col(catCol))
      .agg(sum(xm).as("__s"), count(xm).as("__n"))
    df.withColumn("__x", xm)
      .join(broadcast(stats), Seq(catCol), "left")
      .withColumn(out, when(col("__n") <= 1, lit(null).cast("double"))
        .otherwise((col("__s") - col("__x")).cast("double") /
          ((col("__n") - 1).cast("double") * lit(1e6))))
      .drop("__s", "__n", "__x")
  }

  /** Pairwise Pearson correlation matrix — the data-profiling staple
    * (feature-redundancy screen before training): every column pair's
    * r = (n·Σxy − Σx·Σy) ∕ (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) from ONE
    * aggregate pass. All sums are exact DECIMAL(38,0) micro-unit
    * integers (order-independent — the rel_describe moment discipline;
    * cross-products go through the decimal cast so micro² can't wrap a
    * Long), and each cell pays exactly three IEEE steps (cast, two
    * sqrts, one division) in oracle-mirrored order. Output is
    * |cols|·(|cols|−1)∕2 rows exploded from the single stats row. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, "corrMatrix needs at least two columns")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def xm(c: String) =
      (col(c).cast(org.apache.spark.sql.types.DecimalType(20, 6))
        * lit(1000000L)).cast("long")
    val aggs = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("n"))
    for (c <- cols) {
      aggs += sum(xm(c)).cast(dec).as(s"s_$c")
      aggs += sumSquaresExact(xm(c)).as(s"q_$c")
    }
    for (Seq(a, b) <- cols.combinations(2))
      aggs += sum(xm(a).cast(dec) * xm(b)).as(s"p_${a}_$b")
    val st = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        ((col(s"p_${a}_$b") * col("n") - col(s"s_$a") * col(s"s_$b")).cast("double") /
          (sqrt((col(s"q_$a") * col("n") - col(s"s_$a") * col(s"s_$a")).cast("double")) *
            sqrt((col(s"q_$b") * col("n") - col(s"s_$b") * col(s"s_$b")).cast("double"))))
          .as("r"))
    }
    st.select(col("n"), explode(array(pairs: _*)).as("__pr"))
      .select(col("__pr.col_a"), col("__pr.col_b"), col("n"), col("__pr.r"))
  }

  /** Last-observation-carried-forward imputation (pandas
    * `ffill`/sklearn time-series imputers): nulls take the key's most
    * recent non-null value in (orderCol, tie idCol) order; nulls before
    * a key's first observation stay null (no leakage from the future).
    * One per-key window — the key shuffle is the whole cost, and the
    * running `last(ignoreNulls)` is a linear frame scan. */
  def imputeLocf(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, valCol: String, out: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(idCol))
      .rowsBetween(Long.MinValue, 0)
    df.withColumn(out, last(col(valCol), ignoreNulls = true).over(w))
  }

  /** Histogram drift report between two populations sharing a bin rule
    * (the training-data distribution monitor: yesterday's dump vs
    * today's, source A vs source B): per bin, both counts and both
    * micro-unit proportions plus their absolute gap — the L∞ drift
    * statistic is the max `d_micro`, read off a ≤|bins|-row table. All
    * INTEGER arithmetic (proportions by truncating micro division), so
    * the report is engine-exact — no KL/PSI logarithm whose libm tails
    * differ. ONE map-side-combined aggregate over (bin, side); empty
    * bins on one side report zero via the conditional sums. */
  def driftHist(df: DataFrame, sideCol: Column, binCol: Column): DataFrame = {
    val agged = df
      .select(sideCol.cast("boolean").as("__side"), binCol.as("bin"))
      .groupBy("bin")
      .agg(sum(when(col("__side"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__side"), 1L).otherwise(0L)).as("n_b"))
    val tot = agged.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    agged.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("(n_a * 1000000) div __ta").as("p_a_micro"),
        expr("(n_b * 1000000) div __tb").as("p_b_micro"),
        abs(expr("(n_a * 1000000) div __ta") -
          expr("(n_b * 1000000) div __tb")).as("d_micro"))
  }
}
