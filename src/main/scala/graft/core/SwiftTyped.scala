package graft.core

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed facade of the selector for `Dataset[T]` users (SURVEY.md §1.1:
  * `Dataset[T]` where compile-time field checks help). The vectorized
  * strategy needs a Column form and lives on the untyped API; here the
  * selector chooses between the distributed typed map and the
  * driver-local route (K3), preserving the same invisibility contract.
  */
final class SwiftTyped[T](ds: Dataset[T], cfg: SwiftConfig) {

  def threshold(sec: Double): SwiftTyped[T] =
    new SwiftTyped(ds, cfg.copy(thresholdSec = sec))
  def forceParallel(b: Boolean = true): SwiftTyped[T] =
    new SwiftTyped(ds, cfg.copy(forceParallel = b))

  @volatile var lastStrategy: SwiftStrategy = SwiftStrategy.Parallel

  def apply[U: Encoder](f: T => U): Dataset[U] = {
    val n = ds.count()
    if (n == 0 || cfg.forceParallel) { lastStrategy = SwiftStrategy.Parallel; return ds.map(f) }
    val k = if (n <= 25000) math.max(1, math.ceil(n / 25.0).toInt) else cfg.sampleSize
    val sample = ds.limit(k).collect()
    val estSec = {
      var total = 0L
      var i = 0
      while (i < cfg.nRepeats) {
        val t0 = System.nanoTime()
        Progress.suppressed { sample.foreach(f) }
        total += System.nanoTime() - t0; i += 1
      }
      (total.toDouble / cfg.nRepeats / 1e9) / math.max(1, sample.length) * n
    }
    if (estSec <= cfg.thresholdSec && n <= cfg.localMaxRows) {
      lastStrategy = SwiftStrategy.Local
      val all: Seq[U] = ds.collect().toIndexedSeq.map(f)
      ds.sparkSession.createDataset(all)
    } else { lastStrategy = SwiftStrategy.Parallel; ds.map(f) }
  }
}

object SwiftTyped {
  def apply[T](ds: Dataset[T]): SwiftTyped[T] = new SwiftTyped(ds, SwiftDefaults.get)
}
