package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Adversarial quantizer-seeding case for IVF ANN: a corpus whose id
  * ORDER correlates with content (ids 0-99 are cluster 0, 100-199
  * cluster 1, ...). First-N-by-id seeding would put every coarse
  * centroid inside cluster 0, leaving clusters 1-3 quantized by
  * far-away centroids and the lists wildly unbalanced; the hash-spread
  * seed draw is uniform over ids, so every content cluster gets seeds
  * and lists stay bounded. */
class IvfBalanceSpec extends SparkSpec {
  import spark.implicits._

  private val nPer = 100
  private val nClusters = 4
  private val nCentroids = 8

  // 64-dim vectors: cluster c occupies dims [16c, 16c+16) at magnitude 5
  // with a small deterministic per-id jitter — well-separated clusters.
  // The jitter period (101) exceeds the per-cluster id range (100) so no
  // two vectors in a cluster are identical: with a shorter period (an
  // earlier draft used % 7) the corpus contains exact duplicates, and if
  // the hash draw seeds two DUPLICATE vectors the later one's list is
  // legitimately empty (d2 ties at 0, lower cid wins) — that's documented
  // ivfAssign behavior, not imbalance, and not what this spec probes.
  private lazy val corpus = (0 until nPer * nClusters).map { id =>
    val c = id / nPer
    val v = Array.tabulate(64) { d =>
      val base = if (d >= 16 * c && d < 16 * (c + 1)) 5.0f else 0.0f
      base + ((id * 31 + d * 17) % 101) * 0.01f
    }
    (id.toLong, v)
  }.toDF("vec_id", "embedding")

  test("hash-spread seeds cover every content cluster on an id-sorted corpus") {
    val assign = Similarity.ivfAssign(corpus, "vec_id", "embedding", nCentroids)
    val owning = assign.filter(col("crn") === 1)
      .groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n")).toMap

    // all centroids materialized as non-empty lists
    assert(owning.size == nCentroids, s"expected $nCentroids lists, got $owning")
    // the seeds (list ids ARE corpus ids) span all 4 content clusters —
    // first-N-by-id seeding would give {0} here
    val seedClusters = owning.keySet.map(_ / nPer)
    assert(seedClusters == (0 until nClusters).map(_.toLong).toSet,
      s"seed clusters $seedClusters do not cover all $nClusters content clusters")
    // balance: worst list ≤ one full content cluster (the unavoidable
    // bound when a cluster drew a single seed); mean is corpus/centroids
    val maxList = owning.values.max
    assert(maxList <= nPer,
      s"max list $maxList exceeds one content cluster ($nPer) — quantizer degenerate")
    // every vector lands on a centroid of its OWN cluster (separation
    // sanity: the quantizer is actually partitioning content space)
    val crossAssigned = assign.filter(col("crn") === 1)
      .filter(col("id").divide(nPer).cast("int") =!= col("cid").divide(nPer).cast("int"))
      .count()
    assert(crossAssigned == 0, s"$crossAssigned vectors assigned outside their cluster")
  }
}
