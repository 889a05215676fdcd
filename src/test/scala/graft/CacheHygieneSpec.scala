package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Source gate + functional check for the cache discipline (see
  * `graft.core.Caches`): library code never calls bare
  * `.cache()`/`.persist()` — multi-consumer reuse goes through lazy
  * `localCheckpoint` (ContextCleaner-reclaimed) and the few
  * stat-load-bearing caches go through `Caches.cached`, which registers
  * them so a long-lived session can reclaim the CacheManager entries
  * with one `Caches.release()` call. One-shot measurement mains
  * (ScaleSmoke*, RecallGrid*) are exempt: their process exit reclaims
  * everything, and their cache-then-count warm-up IS the measurement
  * protocol. */
class CacheHygieneSpec extends SparkSpec {

  private val exemptFile = "^(ScaleSmoke.*|RecallGrid.*|Caches)\\.scala$".r

  private def mainSources: Seq[Path] =
    Files.walk(Paths.get("src/main/scala/graft")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => exemptFile.findFirstIn(p.getFileName.toString).isDefined)
      .toSeq

  test("no bare .cache()/.persist() in library sources") {
    val offenders = for {
      p <- mainSources
      (line, i) <- Files.readAllLines(p).asScala.zipWithIndex
      // strip only true '//' comments — takeWhile(_ != '/') truncated at
      // ANY slash (division, a path inside a string, '*/'), letting a
      // bare .cache() after one silently escape the gate
      trimmed = { val idx = line.indexOf("//"); if (idx >= 0) line.take(idx) else line }
      if trimmed.contains(".cache()") || trimmed.contains(".persist(")
      // Caches.cached(...) call sites never spell .cache() themselves,
      // so any textual hit outside Caches.scala is a leak
    } yield s"$p:${i + 1}: $line"
    assert(offenders.isEmpty,
      "bare cache/persist (use localCheckpoint(eager=false) or " +
        s"graft.core.Caches.cached):\n${offenders.mkString("\n")}")
  }

  test("every Caches.cached call site carries the load-bearing rationale nearby") {
    // the discipline requires documenting WHY measured stats matter at
    // each tracked cache; enforce at least one comment line mentioning
    // stats/AQE/measured within the 12 lines above each call site
    val undocumented = for {
      p <- mainSources
      lines = Files.readAllLines(p).asScala.toVector
      (line, i) <- lines.zipWithIndex
      if line.contains("Caches.cached(")
      ctx = lines.slice(math.max(0, i - 12), i + 1).mkString("\n")
      if !("stats|AQE|measured|microbatch".r.findFirstIn(ctx).isDefined)
    } yield s"$p:${i + 1}"
    assert(undocumented.isEmpty,
      s"Caches.cached sites missing a stats rationale:\n${undocumented.mkString("\n")}")
  }

  test("Caches.cached registers and release() unpersists") {
    import spark.implicits._
    graft.core.Caches.release(blocking = true)
    val before = graft.core.Caches.trackedCount
    assert(before === 0)
    val df = graft.core.Caches.cached((1 to 100).toDF("x"))
    assert(df.count() === 100)
    assert(graft.core.Caches.trackedCount === 1)
    assert(df.storageLevel.useMemory, "cached frame should be persisted")
    graft.core.Caches.release(blocking = true)
    assert(graft.core.Caches.trackedCount === 0)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release() should unpersist the tracked frame")
    // the frame stays correct after release — lineage recomputes
    assert(df.count() === 100)
  }

  test("two load-bearing operators drain on release(); a re-run re-establishes " +
      "the stats and still plans the broadcast") {
    // the two stat-load-bearing cache sites exercised in ONE session —
    // the long-lived curation-session shape the registry exists for
    graft.core.Caches.release(blocking = true)
    val docs = graft.queries.Tables.t(spark, sf001, "documents").limit(200)
    graft.operators.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 5).count()
    val emb = graft.queries.Tables.t(spark, sf001, "embeddings").limit(200)
    graft.operators.Dedup.embeddingPairs(emb, "vec_id", "embedding",
      tau = 0.9, tables = 4).count()
    assert(graft.core.Caches.trackedCount >= 2,
      s"both operators should register, saw ${graft.core.Caches.trackedCount}")
    graft.core.Caches.release(blocking = true)
    assert(graft.core.Caches.trackedCount === 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager should be empty after Caches.release()")
    // re-run after release: the operator re-caches, AQE sees measured
    // InMemoryRelation stats again, and the verify join still lands as a
    // broadcast — release() costs nothing but the re-materialization
    val rerun = graft.operators.Dedup.jaccardPairsPrefix(
      docs, "doc_id", "text", 3, 5)
    rerun.collect()
    val finalPlan = rerun.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan.take(4000))
    assert(graft.core.Caches.trackedCount >= 1)
    graft.core.Caches.release(blocking = true)
  }

  test("a released operator cache frees the CacheManager entry end-to-end") {
    // run a stat-load-bearing operator (jaccard prefix), then release:
    // the session's CacheManager must be empty afterwards
    graft.core.Caches.release(blocking = true)
    val docs = graft.queries.Tables.t(spark, sf001, "documents").limit(200)
    val out = graft.operators.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 5)
    out.count()
    assert(graft.core.Caches.trackedCount >= 1)
    graft.core.Caches.release(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager should be empty after Caches.release()")
  }
}
