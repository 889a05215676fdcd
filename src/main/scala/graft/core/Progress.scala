package graft.core

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** K8 — progress reporting. The reference wires tqdm into the pandas path
  * (swifter/swifter.py:233-235), a Dask scheduler callback
  * (tqdm_dask_progressbar.py:5-37) and Ray polling
  * (swifter/swifter.py:610-618). Spark analog: a SparkListener counting
  * finished tasks, rendered as a single console line.
  */
final class ProgressListener(desc: String) extends SparkListener {
  private val done = new AtomicLong(0)
  private val total = new AtomicLong(0)

  /** Observability for tests/monitoring: completed and announced tasks. */
  def tasksDone: Long = done.get
  def tasksTotal: Long = total.get

  // totals from stage SUBMISSION, not job start: a job's stageInfos
  // include stages AQE later skips (shuffle reuse) — counting those
  // announces tasks that never run and the bar never reaches 100%
  override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit = {
    total.addAndGet(ss.stageInfo.numTasks.toLong)
    render()
  }
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    done.incrementAndGet()
    render()
  }
  private def render(): Unit = {
    val t = total.get; val d = done.get
    if (t > 0) {
      val pct = math.min(100, d * 100 / t)
      Console.err.print(s"\r$desc: $d/$t tasks ($pct%)")
      if (d >= t) Console.err.println()
    }
  }
}

object Progress {
  /** Run `body` with a progress listener attached; always detaches. */
  def withProgress[A](spark: SparkSession, enabled: Boolean, desc: String)(body: => A): A = {
    if (!enabled) body
    else {
      val l = new ProgressListener(desc)
      spark.sparkContext.addSparkListener(l)
      try body finally spark.sparkContext.removeSparkListener(l)
    }
  }

  /** K7 — output suppression during probe runs: the sample probes execute
    * the user function extra times; their console output is silenced so a
    * user `print` fires once (reference base.py:25-39). */
  def suppressed[A](body: => A): A = {
    val devNull = new java.io.PrintStream(java.io.OutputStream.nullOutputStream())
    Console.withOut(devNull) { Console.withErr(devNull) { body } }
  }
}
