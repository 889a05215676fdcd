package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: the Morton interleave must match a plain-Scala bit
  * reference, the quantizer must be the minimal power-of-two divisor,
  * and the audit table must conserve rows and produce ordered bounds. */
class LayoutSpec extends SparkSpec {

  private def mortonRef(x: Int, y: Int): Long = {
    var z = 0L
    (0 until 16).foreach { b =>
      z |= ((x >> b) & 1).toLong << (2 * b)
      z |= ((y >> b) & 1).toLong << (2 * b + 1)
    }
    z
  }

  test("interleave == plain-Scala Morton reference on deterministic pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(500)(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val out = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.interleave(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0).toInt, r.getLong(1).toInt))
    }
  }

  test("quantization shifts: minimal down-shift, maximal up-shift, 16-bit fit") {
    import spark.implicits._
    val spans = Seq(0L, 1L, 5999L, 65535L, 65536L, 65537L, 131071L, 131072L,
      (1L << 20) - 1, 1L << 20, (1L << 40) + 12345L, (1L << 62) - 1)
    val out = spans.toDF("span")
      .select(col("span"), Layout.shiftUp(col("span")).as("t"),
        Layout.shiftDown(col("span")).as("s"))
      .collect()
    out.foreach { r =>
      val span = r.getLong(0); val t = r.getLong(1); val s = r.getLong(2)
      assert(t == 0 || s == 0, s"span=$span t=$t s=$s both nonzero")
      assert((span << t) >> s <= 65535L, s"span=$span does not fit 16 bits")
      if (s > 0) assert(span >> (s - 1) > 65535L, s"span=$span s=$s not minimal")
      // maximal stretch: one more doubling would overflow 16 bits
      if (s == 0 && t < 15) assert((span << (t + 1)) > 65535L,
        s"span=$span t=$t not maximal")
    }
  }

  test("zorderStats conserves rows and emits ordered per-bucket bounds") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("x"),
        col("l_partkey").cast("long").as("y"))
    val stats = Layout.zorderStats(li, "x", "y", 8).collect()
    assert(stats.map(_.getLong(1)).sum == li.count())
    stats.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 256)
      assert(r.getLong(2) <= r.getLong(3)) // x_min <= x_max
      assert(r.getLong(4) <= r.getLong(5)) // y_min <= y_max
    }
    // the point of the layout: buckets localize BOTH dims — every
    // bucket's x-span and y-spans are a fraction of the global span
    val xSpan = li.agg(max("x") - min("x")).head().getLong(0)
    val maxBucketXSpan = stats.map(r => r.getLong(3) - r.getLong(2)).max
    assert(maxBucketXSpan <= xSpan / 8,
      s"bucket x-span $maxBucketXSpan vs global $xSpan")
  }

  test("compactionPlan: hand-built manifest, conservation, overshoot bound") {
    import spark.implicits._
    // partition A: 60+60+60 → group 0 holds files 1,2 (pre 0,60;
    // file 3's pre=120 ≥ 100 → group 1); oversized 350-byte file 4
    // lands alone in group 1's successor computed from its pre (180//100=1)
    // and pushes file 5 to group 5 (pre 530//100)
    val inv = Seq(
      ("A", 1L, 60L), ("A", 2L, 60L), ("A", 3L, 60L),
      ("A", 4L, 350L), ("A", 5L, 40L),
      ("B", 10L, 10L), ("B", 11L, 10L)).toDF("part", "file_id", "bytes")
    val plan = Layout.compactionPlan(inv, "part", "file_id", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(plan(("A", 0L)) === ((2L, 120L, 1L, 2L)))
    assert(plan(("A", 1L)) === ((2L, 410L, 3L, 4L)))
    assert(plan(("A", 5L)) === ((1L, 40L, 5L, 5L)))
    assert(plan(("B", 0L)) === ((2L, 20L, 10L, 11L)))
    // conservation: every file in exactly one group
    assert(plan.values.map(_._2).sum == 60L + 60 + 60 + 350 + 40 + 10 + 10)
    assert(plan.values.map(_._1).sum == 7L)
    // next-fit bound: a group exceeds the target only via its LAST file
    val sizes = Map(1L -> 60L, 2L -> 60L, 3L -> 60L, 4L -> 350L,
      5L -> 40L, 10L -> 10L, 11L -> 10L)
    plan.values.foreach { case (_, bytes, _, last) =>
      assert(bytes - sizes(last) < 100L,
        s"group holds $bytes with last file $last — pre-last mass must be under target")
    }
  }
}
