package graft

import org.apache.spark.sql.functions._

/** Focused spec for the r17 single-pass wave staging
  * (StreamOps.stageWaveFiles): the per-wave filter+coalesce loop became
  * ONE partitioned write, so pin the properties the six file-source
  * twins depend on — exactly one parquet file per wave, wave-ordered
  * mtimes (FileStreamSource replays oldest-first), the wave column
  * still present in the file data, and per-file contents exactly the
  * wave's rows (the shuffle may reorder rows WITHIN a file; the
  * stateful consumers sort inside handleInputRows). */
class WaveStagingSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("one file per wave, mtime-ordered, contents == wave slices") {
    import spark.implicits._
    val feed = (0L until 1000L)
      .map(i => (i, i % 3, s"v$i"))
      .toDF("id", "__wave", "payload")
    val dir = graft.streaming.StreamOps.stageWaveFiles(
      feed, "__wave", 0L to 2L, "wave_staging_spec")
    val files = java.nio.file.Files.list(dir).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
    assert(files.map(_.getFileName.toString) ==
      Seq("wave00.parquet", "wave01.parquet", "wave02.parquet"))
    // replay order: strictly increasing mtimes in wave order
    val mtimes = files.map(f => java.nio.file.Files.getLastModifiedTime(f).toMillis)
    assert(mtimes == mtimes.sorted && mtimes.distinct == mtimes, mtimes.toString)
    // each file holds exactly its wave's rows, full schema included
    (0 to 2).foreach { w =>
      val got = spark.read.parquet(files(w).toString)
      assert(got.columns.toSeq.sorted == Seq("__wave", "id", "payload"))
      val ids = got.select("id").as[Long].collect().sorted.toSeq
      val want = (0L until 1000L).filter(_ % 3 == w)
      assert(ids == want, s"wave $w: ${ids.take(5)}... n=${ids.size}")
      assert(got.select("__wave").distinct().as[Long].collect().toSeq == Seq(w.toLong))
    }
  }
}
