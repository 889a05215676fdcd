package graft.core

import org.apache.spark.sql.DataFrame

/** K9 — global default configuration, the analog of the reference's
  * `swifter.set_defaults(...)` (swifter/swifter.py:34-70, which patches
  * accessor __init__ defaults process-wide). Thread-safe via a volatile
  * snapshot; per-handle fluent setters still override.
  */
object SwiftDefaults {
  @volatile private var current: SwiftConfig = SwiftConfig()

  def set(cfg: SwiftConfig): Unit = { current = cfg }
  def get: SwiftConfig = current
  def reset(): Unit = { current = SwiftConfig() }
}

/** O7 — the Modin parallel-accessor analog (reference
  * parallel_accessor.py:81-130). In the reference this is a separate
  * frontend whose only job is vectorize-if-valid-else-delegate, because
  * the input is *already distributed*. In Spark every DataFrame is
  * already distributed, so O7 collapses into the main selector
  * (SURVEY.md §2.1/O7): this accessor simply skips the cost-model local
  * route — parallel input never gets collected — while keeping the K2
  * vectorization probe.
  */
object SwiftParallel {
  def apply(df: DataFrame): Swift =
    new Swift(df, SwiftDefaults.get.copy(localMaxRows = 0L))
}
