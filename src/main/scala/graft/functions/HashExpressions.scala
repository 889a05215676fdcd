package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the MirrorHash pipeline.
  *
  * The Column/HOF formulations in [[MirrorHash]] are the executable
  * *specification* (and stay bit-identical to the DuckDB oracle); these
  * expressions compute the same values in a single JVM loop per row —
  * measured ~50-100× faster than the interpreted higher-order-function
  * trees (each HOF element evaluation walks an expression tree and
  * allocates; 5k docs × ~2k chars made dedup candidate generation the
  * bench bottleneck). A differential spec asserts expression == HOF
  * mirror on real data.
  *
  * CodegenFallback is deliberate: the win is loop fusion inside one
  * eval call, not codegen of the surrounding plan; these feed shuffles,
  * not tight codegen pipelines.
  */
object HashExpressions {
  import MirrorHash.{P, NUM_PERMS, SIM_BITS}

  private val POW131: Array[Long] = {
    val a = new Array[Long](8); a(0) = 1L
    (1 until 8).foreach(i => a(i) = a(i - 1) * 131L); a
  }
  private def permA(j: Int): Long = (654435761L * j + 150889L) % P
  private def permB(j: Int): Long = (253910941L * j + 982451653L) % P

  /** Word-hash array of a space-separated text (MirrorHash.wordHashes):
    * h(word) = Σ ascii(c_i)·131^(i mod 8). One pass over the UTF-8
    * bytes; ASCII inputs only need byte values (matches ascii()). */
  case class WordHashArray(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): WordHashArray = copy(c)

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var h = 0L
      var ci = 0 // char index within current word
      var k = 0
      while (k < s.length) {
        val c = s.charAt(k)
        if (c == ' ') { out += h; h = 0L; ci = 0 }
        else { h += c.toLong * POW131(ci % 8); ci += 1 }
        k += 1
      }
      out += h // final word (split(text," ") always yields ≥1 token)
      new GenericArrayData(out.toArray)
    }
  }

  /** 3-gram shingle hashes over a word-hash array (MirrorHash.shingleHashes). */
  case class ShingleHashArray(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): ShingleHashArray = copy(c)

    override def nullSafeEval(input: Any): Any = {
      val whs = input.asInstanceOf[ArrayData].toLongArray()
      if (whs.length < 3) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](whs.length - 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((whs(i) % P) * 31L + (whs(i + 1) % P) * 131L + (whs(i + 2) % P) * 1313L) % P
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** MinHash signature (MirrorHash.minhashSig): NUM_PERMS mins in one pass. */
  case class MinHashSig(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)

    override def nullSafeEval(input: Any): Any = {
      val shs = input.asInstanceOf[ArrayData].toLongArray()
      val sig = Array.fill(NUM_PERMS)(P)
      var i = 0
      while (i < shs.length) {
        val h = shs(i)
        var j = 0
        while (j < NUM_PERMS) {
          val v = (h * permA(j) + permB(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
  }

  /** 30-bit SimHash (MirrorHash.simhash) in one pass. */
  case class SimHash30(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def withNewChildInternal(c: Expression): SimHash30 = copy(c)

    override def nullSafeEval(input: Any): Any = {
      val shs = input.asInstanceOf[ArrayData].toLongArray()
      val counts = new Array[Long](SIM_BITS)
      var i = 0
      while (i < shs.length) {
        val h = shs(i)
        var b = 0
        while (b < SIM_BITS) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
        i += 1
      }
      var sh = 0L
      var b = 0
      while (b < SIM_BITS) { if (counts(b) >= 0) sh |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sh)
    }
  }

  /** Fixed-point dot product of two BIGINT arrays (Similarity cosine
    * numerator) — one fused loop instead of zip_with+aggregate. Fully
    * codegen'd (`doGenCode`): the loop inlines into the surrounding
    * whole-stage-codegen pipeline, the hot path of the all-pairs
    * embedding join. */
  case class FixedDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def withNewChildrenInternal(l: Expression, r: Expression): FixedDot =
      copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toLongArray()
      val y = b.asInstanceOf[ArrayData].toLongArray()
      var s = 0L
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) { s += x(i) * y(i); i += 1 }
      java.lang.Long.valueOf(s)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    }
  }

  // Column wrappers (Spark 4: Column ↔ Expression via the sql-package bridge)
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def word_hashes(text: Column): Column = column(WordHashArray(expression(text)))
  def shingle_hashes(whs: Column): Column = column(ShingleHashArray(expression(whs)))
  def minhash_sig(shs: Column): Column = column(MinHashSig(expression(shs)))
  def simhash30(shs: Column): Column = column(SimHash30(expression(shs)))
  def fixed_dot(a: Column, b: Column): Column = column(FixedDot(expression(a), expression(b)))
}
