package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for [[Bench.classifyEpisode]] (r15 verdict item 3):
  * each synthetic reading mirrors a past cross-round adjudication, so
  * the classifier would have labeled it in-run. Thresholds under test:
  * floor 1.0 s wall, jvm_pause at ≥50% pause, paging at >1000 majflt,
  * starved below 0.75 busy cores. */
class EpisodeClassifierSpec extends AnyFunSuite {

  test("sub-floor walls are never episodes, whatever the counters say") {
    assert(Bench.classifyEpisode(0.5, cpuMs = 0, gcMs = 400,
      safepointMs = 400, majfltDelta = 50000) === None)
  }

  test("healthy CPU-bound query: multiple busy cores, quiet JVM → None") {
    // 3 s wall, 40 s of process CPU (~13 cores busy), 100 ms pause
    assert(Bench.classifyEpisode(3.0, cpuMs = 40000, gcMs = 80,
      safepointMs = 20, majfltDelta = 0) === None)
  }

  test("r8-style GC storm: pause dominates the wall → jvm_pause") {
    // 30 s wall, 20 s of it gc+safepoint
    assert(Bench.classifyEpisode(30.0, cpuMs = 25000, gcMs = 18000,
      safepointMs = 2000, majfltDelta = 0) === Some("jvm_pause"))
  }

  test("r11-style host paging: majflt surge with real CPU → paging") {
    assert(Bench.classifyEpisode(12.0, cpuMs = 30000, gcMs = 500,
      safepointMs = 100, majfltDelta = 8000) === Some("paging"))
  }

  test("r10/r15-style starvation: wall ≫ CPU, JVM quiet, no faults → starved") {
    // 26 s wall (the r12 o2_row_expand episode shape), 4 s CPU total
    assert(Bench.classifyEpisode(26.0, cpuMs = 4000, gcMs = 300,
      safepointMs = 100, majfltDelta = 10) === Some("starved"))
  }

  test("single-threaded but busy phase is NOT starved (1 core ≥ threshold)") {
    // 5 s wall, 5 s CPU — a legitimately serial stage keeps one core hot
    assert(Bench.classifyEpisode(5.0, cpuMs = 5000, gcMs = 50,
      safepointMs = 10, majfltDelta = 0) === None)
  }

  test("unavailable CPU bean (−1) cannot produce starved") {
    assert(Bench.classifyEpisode(26.0, cpuMs = -1, gcMs = 300,
      safepointMs = 100, majfltDelta = 10) === None)
  }

  test("precedence: a GC storm during paging reads jvm_pause first") {
    assert(Bench.classifyEpisode(20.0, cpuMs = 15000, gcMs = 12000,
      safepointMs = 0, majfltDelta = 5000) === Some("jvm_pause"))
  }

  test("pause time is subtracted before the busy-core test") {
    // 4 s wall, 3.2 s CPU but 1.8 s of it was pause (< the 50% jvm_pause
    // bar) — only (3200−1800)/4000 = 0.35 busy cores of real work:
    // descheduled outside the pauses → starved, not healthy
    assert(Bench.classifyEpisode(4.0, cpuMs = 3200, gcMs = 1500,
      safepointMs = 300, majfltDelta = 0) === Some("starved"))
  }
}
