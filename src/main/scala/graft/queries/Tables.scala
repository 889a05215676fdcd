package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Shared helpers for the declared query set (SparkEntry.queries).
  *
  * Determinism discipline for the DuckDB-oracle hash compare:
  *  - Floating aggregates accumulate in exact DECIMAL (order-independent)
  *    and cast back to DOUBLE at the end, so Spark and DuckDB agree
  *    bit-for-bit no matter how the partial aggregates are ordered.
  *  - Timestamps are emitted as epoch microseconds (BIGINT) — avoids
  *    tz-annotation mismatches between Spark parquet and DuckDB results.
  *  - Every result carries an ORDER BY on a unique key.
  */
object Tables {
  /** Load a testdata table, normalizing `ts` via [[normalizeTs]].
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (every main/spec bootstrap sets it in its builder) so a
    * TIMESTAMP(NANOS) encoding surfaces as LongType instead of a reader
    * refusal — `t` itself never mutates session conf. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalize a `ts` column to session-tz TimestampType regardless of
    * the physical encoding the testdata generator used this round. The
    * generator has shipped three encodings across rounds:
    *  - parquet TIMESTAMP(NANOS) → LongType raw nanos (under the
    *    nanosAsLong conf); floor to µs — exactly DuckDB's ns→µs narrowing,
    *    so both engines see identical values;
    *  - timestamp[us] without timezone → TimestampNTZType; cast to
    *    TimestampType (sessions pin UTC, so the instant is unchanged and
    *    DuckDB reads the same wall-clock values);
    *  - plain TimestampType → passthrough.
    * Tables without a `ts` column pass through untouched. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Exact decimal-accumulated sum of a double column, returned as DOUBLE.
    * SQL mirror: CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(20, 6))).cast("double")

  /** SQL-side mirror of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(20,6))) AS DOUBLE)"

  /** Timestamp → epoch microseconds (BIGINT). SQL mirror: epoch_us(ts). */
  def epochUs(c: Column): Column = unix_micros(c)

  private val tmpDirs =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** Per-(prefix, input-dir) CACHED temp directory: repeated query
    * invocations (bench loops, repeated correctness runs) reuse one
    * directory instead of leaking a fresh /tmp entry per call; a
    * shutdown hook removes it at JVM exit. Callers write with
    * mode("overwrite"), so reuse is safe. */
  def cachedTempDir(prefix: String, dir: String): String =
    tmpDirs.getOrElseUpdate((prefix, dir), {
      val p = java.nio.file.Files.createTempDirectory(prefix)
      deleteOnExit(p)
      p.toString
    })

  // ONE shutdown hook draining a shared set: registering a fresh hook per
  // call would accumulate unbounded hooks (each pinning its Path) across
  // long bench loops — e.g. the streaming parquet sink creates a new temp
  // dir on every run.
  private val exitPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val exitHook: Unit = {
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      exitPaths.forEach(p => rm(p.toFile))
    }
    ()
  }

  /** Best-effort recursive delete of `p` at JVM exit. */
  def deleteOnExit(p: java.nio.file.Path): Unit = {
    exitHook
    exitPaths.add(p)
    ()
  }
}
