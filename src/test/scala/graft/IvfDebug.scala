package graft

import org.apache.spark.sql.functions._

// temporary debug spec — deleted after use
class IvfDebug extends SparkSpec {
  import spark.implicits._

  test("debug centroid picks") {
    val corpus = (0 until 400).map { id =>
      val c = id / 100
      val v = Array.tabulate(64) { d =>
        val base = if (d >= 16 * c && d < 16 * (c + 1)) 5.0f else 0.0f
        base + ((id * 31 + d) % 7) * 0.01f
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val m = 2147483647L
    val fx = graft.operators.Similarity.fixedPoint(corpus, "vec_id", "embedding")
    val h1 = col("id") * 2654435761L % m
    val h = h1 * h1 % m * 2246822519L % m
    val cents = fx.withColumn("h", h).orderBy(col("h"), col("id")).limit(8)
      .select("id", "h").collect()
    println("CENTS: " + cents.map(r => (r.getLong(0), r.getLong(1))).mkString(", "))
    val centsDf = fx.withColumn("h", h).orderBy(col("h"), col("id")).limit(8)
      .select(col("id").as("cid"), col("fx").as("cfx"), col("nrm").as("cnrm"))
    val scored = fx.filter(col("id") === 162).crossJoin(broadcast(centsDf))
      .withColumn("dot", graft.functions.HashExpressions.fixed_dot(col("fx"), col("cfx")))
      .withColumn("d2", col("nrm") - lit(2L) * col("dot") + col("cnrm"))
      .select("cid", "nrm", "cnrm", "dot", "d2").orderBy("d2").collect()
    scored.foreach(r => println(s"D2: cid=${r.getLong(0)} nrm=${r.getLong(1)} cnrm=${r.getLong(2)} dot=${r.getLong(3)} d2=${r.getLong(4)}"))
  }
}
