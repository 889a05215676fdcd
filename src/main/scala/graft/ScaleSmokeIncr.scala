package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 incremental-dedup scale smoke: the claim under
  * [[graft.operators.Dedup.incrementalDedupBloom]] is that a daily
  * increment does INCREMENT-sized work against a corpus-sized
  * reference. Protocol: the INCOMING batch stays fixed (the sf0.1
  * %3==0 slice, ~1.7k docs) while the REFERENCE grows 1×/4×/16× by
  * replication (distinct ids, identical content — band collisions and
  * exact-dup hits GROW with the reference, the adversarial direction).
  * Reported per scale: plain vs bloom wall, and the exact-arm verify
  * input (bloom-positive incoming rows — bounded by true dups +
  * fpp·|incoming| whatever |reference| is). Results in SCALING.md
  * §round-15. */
object ScaleSmokeIncr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val inc = docs.filter(col("doc_id") % 3 === 0).repartition(32).cache()
    val nInc = inc.count()
    val ref0 = docs.filter(col("doc_id") % 3 =!= 0)

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def rep(df: DataFrame, n: Int): DataFrame =
      (0 until n).map(k =>
        df.withColumn("doc_id", col("doc_id") + lit(k * 100000000L)))
        .reduce(_ union _)

    noop(docs.groupBy("source").count()) // warmup
    // warm both operator plans once so first-execution codegen doesn't
    // masquerade as a scale effect (the ScaleSmokeR15 lesson)
    noop(Dedup.incrementalDedup(ref0.limit(200), inc.limit(200),
      "doc_id", "text", 0.6))
    noop(Dedup.incrementalDedupBloom(ref0.limit(200), inc.limit(200),
      "doc_id", "text", 0.6))

    println(s"incoming fixed at $nInc docs")
    Seq(1, 4, 16).foreach { m =>
      val ref = rep(ref0, m).repartition(32).cache()
      val nRef = ref.count()
      // bloom-positive incoming rows = the exact-verify join's input —
      // the quantity that must NOT grow with |reference| beyond the
      // (replicated) true-dup mass
      val refH = ref.select(md5(col("text").cast("binary")).as("h"))
      val bloom = refH.stat.bloomFilter("h", math.max(nRef, 1L), 0.01)
      val bc = spark.sparkContext.broadcast(bloom)
      val might = udf((h: String) => bc.value.mightContainString(h))
      val pos = inc.select(md5(col("text").cast("binary")).as("h"))
        .filter(might(col("h"))).count()
      println(s"x$m: reference=$nRef docs, bloom-positive incoming=$pos")
      time(s"incr_plain x$m") {
        noop(Dedup.incrementalDedup(ref, inc, "doc_id", "text", 0.6))
      }
      time(s"incr_bloom x$m") {
        noop(Dedup.incrementalDedupBloom(ref, inc, "doc_id", "text", 0.6))
      }
      ref.unpersist()
    }
    spark.stop()
  }
}
