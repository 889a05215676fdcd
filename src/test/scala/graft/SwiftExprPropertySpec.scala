package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{Swift, SwiftExpr}
import graft.core.SwiftExpr._

/** Property: for ANY term of the restricted AST, `applyExpr`'s output
  * equals the row-at-a-time evaluation — whether the K2 probe accepted
  * the derived Column (the two forms agree) or a divergence (e.g. Spark
  * `log`/division null-vs-NaN conventions) made the probe fall back to
  * the row function. Either way the selector stays observationally
  * invisible; a translator bug can cost performance, never correctness. */
class SwiftExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private def genExpr(depth: Int): Gen[SwiftExpr] =
    if (depth == 0)
      Gen.oneOf(Gen.const(fld("x")), Gen.const(fld("y")),
        Gen.choose(-5.0, 5.0).map(num))
    else
      Gen.choose(0, 6).flatMap { k =>
        for {
          a <- genExpr(depth - 1)
          b <- genExpr(depth - 1)
        } yield k match {
          case 0 => a + b
          case 1 => a - b
          case 2 => a * b
          case 3 => a / b
          case 4 => iff(a < b, a, b)
          case 5 => abs_(a)
          case 6 => iff(a >= b && !(a === b), sqrt_(abs_(a)), b)
        }
      }

  test("property: applyExpr output == row evaluation for arbitrary AST terms") {
    val d = (1 to 300).map(i => (i.toLong, i * 0.37 - 50, (i % 17) * 1.25))
      .toDF("id", "x", "y")
    (1 to 25).foreach { trial =>
      val term = genExpr(3)(Gen.Parameters.default, Seed(97L + trial)).get
      val out = Swift(d).applyExpr("r")(term)
        .orderBy("id").select("id", "x", "y", "r").collect()
      out.foreach { row =>
        val expect = term.eval(row)
        if (row.isNullAt(3))
          // a null can only arise from Spark's null-not-NaN conventions
          // (double /0, log of non-positive) on rows the probe's sample
          // happened to miss — legal only where the JVM value is non-finite
          assert(expect.isNaN || expect.isInfinite,
            s"term=$term row=$row expect=$expect got=null")
        else
          assert(java.lang.Double.doubleToLongBits(expect)
            == java.lang.Double.doubleToLongBits(row.getDouble(3)),
            s"term=$term row=$row expect=$expect got=${row.getDouble(3)}")
      }
    }
  }
}
