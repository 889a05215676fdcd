package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** pandas reshape surface (`melt`, `get_dummies`, `crosstab`) as
  * declarative Spark plans.
  *
  * Scale notes: `melt` is a generator (k output rows per input row, no
  * shuffle); `oneHot` is a pure projection; `crosstab` is ONE hash
  * aggregate with conditional partials. None of the three collects to
  * the driver — the category lists are explicit parameters, exactly like
  * Spark's own `pivot(col, values)` fast path, so the plans are static
  * and safe at any scale (pandas derives categories by scanning, which
  * at 100 TB would be a full extra pass; callers who want that can run
  * `df.select(c).distinct.collect` themselves and pass the result).
  */
object Reshape {

  /** pandas `melt(id_vars, value_vars)`: wide → long. Spark's native
    * `unpivot` — an Expand generator, zero shuffle. Value columns must
    * share a least-common type (Spark errors otherwise, where pandas
    * silently widens to object — pre-cast mixed columns explicitly). */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
      varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valueName)

  /** pandas `get_dummies(prefix=...)`: one 0/1 LongType column per
    * category. Unknown categories simply yield all-zeros rows (pandas
    * drops them from the column set instead — disclosed divergence;
    * parameterizing the list is what keeps the plan collect-free).
    * A NULL category value also yields an all-zeros row — matching
    * pandas get_dummies on NaN — via coalesce (a bare `=== c` is NULL
    * on NULL input, which downstream ML code would choke on). */
  def oneHot(df: DataFrame, catCol: String, categories: Seq[String],
      prefix: String): DataFrame = {
    val dummies = categories.map { c =>
      coalesce((col(catCol) === c).cast("long"), lit(0L))
        .as(s"${prefix}_${sanitize(c)}")
    }
    df.select(df.columns.map(col).toSeq ++ dummies: _*)
  }

  /** pandas `crosstab(index, columns)`: co-occurrence counts as one hash
    * aggregate — conditional `count_if` partials per column value, so the
    * shuffle carries one row per index value, never the raw pairs. */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
      colValues: Seq[String]): DataFrame = {
    val cells = colValues.map { v =>
      count(when(col(colCol) === v, 1)).as(sanitize(v))
    }
    df.groupBy(col(rowCol)).agg(cells.head, cells.tail: _*)
  }

  /** Column-name-safe category label (mirrors what the oracle emits). */
  def sanitize(c: String): String =
    c.toLowerCase.replaceAll("[^a-z0-9]+", "_")
}
