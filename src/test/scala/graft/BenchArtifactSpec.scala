package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Timeout-proof bench artifact (r16 verdict item 1): the r16 driver
  * bench timed out (rc=124) and the once-at-exit artifact write left
  * parsed:null — an entire round's bench certification lost despite
  * healthy per-query costs. The bench now snapshots the complete
  * current artifact (atomic temp+rename) after EVERY query, so a kill
  * at any point leaves a parseable JSON naming every completed query.
  * This spec drives a [[BenchRecorder]] through a simulated
  * interrupted run and asserts exactly that contract.
  */
class BenchArtifactSpec extends AnyFunSuite {

  private def recorderAfterThreeQueries(): BenchRecorder = {
    val rec = new BenchRecorder
    rec.sf = "/tmp/sf_test"
    rec.respoolSec = 12.3
    rec.warmupSec = 45.6
    rec.warmN = 2
    rec.warmSkippedN = 1
    rec.firstPass("q_alpha") = 1.5
    rec.firstPass("q_beta") = -1.0 // failed query: -1, never a fast success
    rec.errByQuery("q_beta") = "boom \"quoted\" message"
    rec.firstPass("q_gamma") = 0.4
    rec.gcByQuery("q_alpha") = (100L, 5L)
    rec.cpuByQuery("q_alpha") = 4000L
    rec.mfByQuery("q_alpha") = 0L
    rec.cgByQuery("q_alpha") = 0L
    rec.episodeByQuery("q_alpha") = "starved"
    rec
  }

  test("mid-run snapshot parses and carries every completed query") {
    val rec = recorderAfterThreeQueries()
    // budget hit: the remaining declared queries are named, not dropped
    rec.skipped += "q_delta"
    rec.skipped += "q_epsilon"
    val json = JsonMethods.parse(rec.renderFull())
    assert((json \ "partial") == JBool(true))
    assert((json \ "skipped_n") == JInt(2))
    val qs = (json \ "queries").asInstanceOf[JObject].obj.toMap
    assert(qs.keySet == Set("q_alpha", "q_beta", "q_gamma"))
    assert((json \ "failed") == JInt(1))
    // the failed query's message survives JSON escaping
    val errs = (json \ "errors").asInstanceOf[JObject].obj.toMap
    assert(errs("q_beta") == JString("boom \"quoted\" message"))
    val skipped = (json \ "skipped").asInstanceOf[JArray].arr
    assert(skipped == List(JString("q_delta"), JString("q_epsilon")))
    // headline total counts only completed non-failed walls
    assert((json \ "value") == JDouble(1.9))
  }

  test("final snapshot of an uninterrupted run is partial:false") {
    val rec = recorderAfterThreeQueries()
    rec.secondPass("q_alpha") = 1.2 // retime improves the headline
    val json = JsonMethods.parse(rec.renderFull())
    assert((json \ "partial") == JBool(false))
    assert((json \ "skipped_n") == JInt(0))
    // best-of: min(first, retime) for the retimed query
    val qs = (json \ "queries").asInstanceOf[JObject].obj.toMap
    assert(qs("q_alpha") == JDouble(1.2))
    // the cold first-pass wall stays as the side channel
    val fp = (json \ "first_pass").asInstanceOf[JObject].obj.toMap
    assert(fp("q_alpha") == JDouble(1.5))
  }

  test("compact tail line parses and carries the host-health fields") {
    val rec = recorderAfterThreeQueries()
    val json = JsonMethods.parse(rec.renderCompact())
    // r16 verdict item 7: respool_sec + episodes_n in the scraped tail,
    // so a host-decayed run self-identifies from the 2KB scrape alone
    assert((json \ "respool_sec") == JDouble(12.3))
    assert((json \ "episodes_n") == JInt(1))
    assert((json \ "queries_shown") != JNothing)
  }

  test("writeSnapshot atomically replaces the artifact on disk") {
    val rec = recorderAfterThreeQueries()
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_spec")
    val path = dir.resolve("bench_out.json")
    rec.writeSnapshot(path.toString)
    val first = java.nio.file.Files.readString(path)
    assert(JsonMethods.parse(first) \ "n_queries" == JInt(3))
    // a later query lands in the NEXT snapshot; the file is replaced
    // whole (temp + ATOMIC_MOVE — a kill mid-write leaves the previous
    // complete snapshot, never a truncated file)
    rec.firstPass("q_delta") = 2.0
    rec.writeSnapshot(path.toString)
    val second = java.nio.file.Files.readString(path)
    assert(JsonMethods.parse(second) \ "n_queries" == JInt(4))
    assert(first != second)
    // no temp litter left behind
    val leftovers = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.contains(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    java.nio.file.Files.delete(path)
    java.nio.file.Files.delete(dir)
  }

  test("codegen wiring failure renders -1, not a false all-zero") {
    val rec = recorderAfterThreeQueries()
    rec.cgWiringOk = false
    val json = JsonMethods.parse(rec.renderFull())
    assert((json \ "codegen_fallbacks") == JInt(-1))
  }
}
