package graft.core

import org.apache.spark.sql.types._

/** K6 — result-schema ("meta") inference from sample outputs.
  *
  * The reference captures the sample result of the user function and hands
  * it to Dask as `meta` so all partitions agree on the output schema
  * (swifter/swifter.py:260,370,465). Here: run the function on the K1
  * sample on the driver, map the runtime values to a Spark DataType, and
  * declare it for the distributed run.
  */
object TypeInfer {

  /** Infer a Spark DataType from a driver-side runtime value. */
  def of(v: Any): DataType = v match {
    case null            => NullType
    case _: java.lang.Double | _: Double   => DoubleType
    case _: java.lang.Float | _: Float     => FloatType
    case _: java.lang.Long | _: Long       => LongType
    case _: java.lang.Integer | _: Int     => IntegerType
    case _: java.lang.Short | _: Short     => ShortType
    case _: java.lang.Boolean | _: Boolean => BooleanType
    case _: String                         => StringType
    case _: java.sql.Timestamp             => TimestampType
    case _: java.time.Instant              => TimestampType
    case _: java.sql.Date                  => DateType
    case _: java.time.LocalDate            => DateType
    case _: java.math.BigDecimal           => DecimalType.SYSTEM_DEFAULT
    case _: Array[Byte]                    => BinaryType
    case s: Seq[_] =>
      val elem = s.collectFirst { case e if e != null => of(e) }.getOrElse(NullType)
      ArrayType(elem)
    case a: Array[_] =>
      val elem = a.collectFirst { case e if e != null => of(e) }.getOrElse(NullType)
      ArrayType(elem)
    case m: Map[_, _] =>
      val k = m.keys.collectFirst { case e if e != null => of(e) }.getOrElse(StringType)
      val v2 = m.values.collectFirst { case e if e != null => of(e) }.getOrElse(NullType)
      MapType(k, v2)
    case r: org.apache.spark.sql.Row => r.schema
    case other =>
      throw new IllegalArgumentException(
        s"TypeInfer: cannot infer Spark DataType for ${other.getClass}")
  }

  /** Infer from many sampled outputs: first non-null wins; all-null
    * samples are an error (the caller must declare the type, same caveat
    * the reference documents for `meta`). */
  def of(vs: Seq[Any]): DataType =
    vs.collectFirst { case v if v != null => of(v) }.getOrElse(
      throw new IllegalArgumentException(
        "TypeInfer: all sample outputs were null; declare an explicit DataType"))
}
