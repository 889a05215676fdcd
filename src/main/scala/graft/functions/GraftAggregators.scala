package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (the UDAF row of SURVEY §2.3), oracled as
  * a first-class query: exact micro-unit mean. The input is the ALREADY
  * micro-quantized BIGINT column (the same DECIMAL(20,6)·10⁶ cast every
  * exact-sum query uses), so the buffer is two Longs, partial
  * aggregation (`merge`) runs map-side like any built-in aggregate, and
  * `finish` is two ordered IEEE divisions the oracle mirrors exactly. */
final class MicroMeanAgg extends Aggregator[Long, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: Long): (Long, Long) = (b._1 + a, b._2 + 1L)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Long, Long)): Double = b._1.toDouble / 1000000.0 / b._2.toDouble
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
