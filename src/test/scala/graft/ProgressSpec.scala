package graft

import org.apache.spark.sql.functions._

import graft.core.{Progress, ProgressListener}

/** K8 — automated proof that progress reporting observes real work
  * (reference analog: swifter_tests.py:370-383 captures tqdm output from a
  * subprocess; here the SparkListener's task counters are the observable),
  * and K7 — that probe suppression silences it.
  */
class ProgressSpec extends SparkSpec {

  /** Listener events arrive on the async listener bus; poll until the
    * counters stop moving (bounded wait). */
  private def drained(l: ProgressListener, timeoutMs: Long = 10000): Unit = {
    val t0 = System.currentTimeMillis()
    var last = (-1L, -1L)
    var cur = (l.tasksDone, l.tasksTotal)
    while ((cur != last || cur._1 < cur._2) &&
        System.currentTimeMillis() - t0 < timeoutMs) {
      last = cur
      Thread.sleep(200)
      cur = (l.tasksDone, l.tasksTotal)
    }
  }

  test("K8: listener counts every task of a real multi-stage job") {
    val l = new ProgressListener("spec")
    spark.sparkContext.addSparkListener(l)
    try {
      // 8 map tasks + a 4-partition shuffle-reduce stage: a genuinely
      // multi-stage job, so announced totals come from more than one stage
      spark.range(0, 100000, 1, 8).toDF("x")
        .groupBy((col("x") % 7).as("k")).count().collect()
      drained(l)
    } finally spark.sparkContext.removeSparkListener(l)
    // ≥9 = 8 map tasks + at least one reduce task (AQE may coalesce the
    // reduce side); announced == done because totals come from stage
    // SUBMISSION, so AQE-skipped stages don't inflate the bar
    assert(l.tasksTotal >= 9, s"expected >=9 announced tasks, got ${l.tasksTotal}")
    assert(l.tasksDone == l.tasksTotal,
      s"done ${l.tasksDone} != announced ${l.tasksTotal}")
  }

  test("K8: a removed listener stops counting (withProgress detach path)") {
    // same mechanics as withProgress's finally-removeSparkListener: once
    // detached, later jobs must not advance the counters
    val l = new ProgressListener("spec2")
    spark.sparkContext.addSparkListener(l)
    val r = Progress.withProgress(spark, enabled = true, "spec2-body") {
      spark.range(0, 1000, 1, 4).agg(sum(col("id"))).collect()
    }
    assert(r.head.getLong(0) == 499500L)
    drained(l)
    spark.sparkContext.removeSparkListener(l)
    val frozen = (l.tasksDone, l.tasksTotal)
    assert(frozen._1 > 0)
    spark.range(0, 1000, 1, 4).agg(sum(col("id"))).collect()
    Thread.sleep(500) // listener bus drain window for the second job
    assert((l.tasksDone, l.tasksTotal) == frozen,
      s"detached listener advanced: $frozen -> ${(l.tasksDone, l.tasksTotal)}")
  }

  test("K7: suppression silences console output on the probing thread") {
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true)
    Console.withErr(ps) { Console.withOut(ps) {
      Progress.suppressed {
        Console.out.print("probe-noise-out")
        Console.err.print("probe-noise-err")
      }
      Console.err.print("after")
    } }
    // the probe's prints were swallowed; output after suppression flows
    assert(buf.toString == "after", s"captured: '${buf.toString}'")
  }
}
