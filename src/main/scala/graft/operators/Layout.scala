package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * range-quantized dimensions so that sorting by the single z-value
  * co-locates rows that are close in BOTH dimensions — the standard
  * multi-dimensional clustering technique (Morton 1966, the layout
  * behind Delta `OPTIMIZE ZORDER BY` and Iceberg's z-ordered sorts)
  * that turns parquet min/max footer statistics into 2-D data
  * skipping: a query with predicates on both columns prunes files
  * whose z-range misses the query box, where a single-column sort only
  * prunes on its leading column.
  *
  * Everything is integer Column arithmetic over Spark builtins
  * (shiftleft / bitwiseAND / bitwiseOR / floor of a power-of-two
  * division, which IEEE-754 evaluates exactly) — fully whole-stage-
  * codegen'd, zero UDFs — with a DuckDB SQL emitter mirroring the
  * identical operations for the oracle gate.
  *
  * Scale: quantization bounds come from ONE tiny min/max aggregate
  * broadcast back as a 1-row frame (never a driver collect); the
  * z-value is a pure projection; the layout audit is a hash aggregate
  * over 2^bucketBits rows. The production write path is
  * `df.repartitionByRange(N, col("z")).write.parquet(...)` — the audit
  * table emitted by [[zorderStats]] IS the per-bucket min/max skipping
  * statistic that the layout buys.
  */
object Layout {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value (the classic magic-mask doubling sequence). */
  private def spread(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: x on even bits, y on odd. */
  def interleave(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Down-shift for a span: the smallest s with span >> s < 2^16 (0 for
    * spans already inside 16 bits), built as a SUM of comparisons — no
    * float log2, whose boundary rounding the two engines could disagree
    * on. Supports any span < 2^63. */
  def shiftDown(span: Column): Column =
    (16 to 62).map(k =>
        when(span >= lit(1L << k), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Up-shift for a span: the largest t ≤ 15 with span << t < 2^16 —
    * STRETCHES narrow spans to fill the quantized range, so the Morton
    * code's high bits discriminate even when the raw span is tiny
    * (without it a 6000-wide key range leaves the top quantized bits
    * all-zero and every row lands in one curve bucket). */
  def shiftUp(span: Column): Column =
    (1 to 15).map(k =>
        when(span < lit(1L << (16 - k)), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Order-preserving 16-bit range quantization:
    * ((v − vMin) << t) >> s with exactly one of (t, s) nonzero — pure
    * dynamic integer shifts (`call_function`, Spark's ShiftLeft/Right
    * accept column shift amounts), bit-identical to DuckDB's `<< >>`.
    * No overflow: t > 0 only when v − vMin < 2^16, and t ≤ 15. */
  def quantize(v: Column, vMin: Column, up: Column, down: Column): Column =
    call_function("shiftright",
      call_function("shiftleft", v - vMin, up.cast("int")), down.cast("int"))

  /** Z-order layout audit over two BIGINT dimensions: computes each
    * row's Morton code from range-quantized dims (bounds via one tiny
    * min/max agg broadcast back), buckets the curve into its top
    * `bucketBits` bits, and emits the per-bucket row count and min/max
    * of BOTH dimensions — exactly the footer statistics a z-ordered
    * file layout would give a 2-D range scan for data skipping. */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
      bucketBits: Int = 8): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 32, s"bucketBits in [1,32]: $bucketBits")
    val x = col(xCol); val y = col(yCol)
    // shifts computed INSIDE the 1-row bounds frame: the comparison
    // chains run once, not 16× per row after the spread sequence
    // duplicates its operand (CollapseProject inlines aliases)
    val bounds = df.agg(
        min(x).as("__xmin"), max(x).as("__xmax"),
        min(y).as("__ymin"), max(y).as("__ymax"))
      .select(col("*"),
        shiftUp(col("__xmax") - col("__xmin")).as("__tx"),
        shiftDown(col("__xmax") - col("__xmin")).as("__sx"),
        shiftUp(col("__ymax") - col("__ymin")).as("__ty"),
        shiftDown(col("__ymax") - col("__ymin")).as("__sy"))
    val z = interleave(
      quantize(x, col("__xmin"), col("__tx"), col("__sx")),
      quantize(y, col("__ymin"), col("__ty"), col("__sy")))
    df.join(broadcast(bounds))
      .select(x.as("__x"), y.as("__y"),
        shiftright(z, 32 - bucketBits).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("__x").as("x_min"), max("__x").as("x_max"),
        min("__y").as("y_min"), max("__y").as("y_max"))
  }

  /** Small-file compaction plan — the bin-packing core of Delta
    * `OPTIMIZE` / Iceberg `rewriteDataFiles`: assign a partition's
    * files, scanned in file-id order, to target-size output groups.
    * A file's group is `exclusive-cumulative-bytes div targetBytes` —
    * the deterministic next-fit rule real compactors use (files are
    * never split, so a group may overshoot the target by at most its
    * last file; a file larger than the target advances the group
    * counter past the ids it spans, leaving gaps — group ids are
    * labels, not ordinals). Emits one row per planned output group
    * with its file count, byte total, and id range — the rewrite
    * manifest a compaction job executes.
    *
    * Scale: the input is the table's FILE INVENTORY (metadata: ~10⁶–10⁷
    * rows for a 100 TB table), not its data. One window partitioned by
    * the table partition (running sums never cross partitions, matching
    * the compactor's partition-local rewrite rule) + one hash
    * aggregate; output ∝ planned groups. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Long.MinValue, -1)
    files
      .withColumn("__pre", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("grp", expr(s"__pre div ${targetBytes}L"))
      .groupBy(col(partCol).as("part"), col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bytes"),
        min(col(fileCol)).as("first_file"), max(col(fileCol)).as("last_file"))
  }

  // ===================== DuckDB SQL mirror =====================

  private def spreadSql(v: String): String = {
    val a = s"(($v) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  /** SQL mirror of [[interleave]]. */
  def interleaveSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** SQL mirror of [[shiftDown]]. */
  def shiftDownSql(span: String): String =
    (16 to 62).map(k =>
        s"CASE WHEN ($span) >= ${1L << k} THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** SQL mirror of [[shiftUp]]. */
  def shiftUpSql(span: String): String =
    (1 to 15).map(k =>
        s"CASE WHEN ($span) < ${1L << (16 - k)} THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** SQL mirror of [[quantize]]: dynamic BIGINT shifts. */
  def quantizeSql(v: String, vMin: String, up: String, down: String): String =
    s"(((($v) - ($vMin)) << ($up)) >> ($down))"
}
