package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** r18 optimization-round plan snapshots: writes
  * plans/r18/<query>_<suffix>.txt — `.explain("formatted")` for every
  * declared query (sf0.001, local[4], same shape as ExplainDump) so the
  * judge can diff before/after for each touched query.
  * Usage: runMain graft.PlanDumpR18 <suffix> [query...]
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val only = args.drop(1).toSet
    val spark = graft.core.SessionDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val out = Paths.get("/root/repo/plans/r18")
    Files.createDirectories(out)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    var n = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution
          .explainString(ExplainMode.fromString("formatted")).trim
        Files.writeString(out.resolve(s"${name}_$suffix.txt"), plan + "\n")
        n += 1
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"wrote $n plans to $out (suffix=$suffix)")
    spark.stop()
  }
}
