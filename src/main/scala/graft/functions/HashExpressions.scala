package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * All expressions implement `doGenCode`, so they inline into the
  * surrounding whole-stage-codegen pipeline (no per-row boxing or
  * virtual eval dispatch); the interpreted `nullSafeEval` twins remain
  * for non-codegen contexts and as the reference semantics.
  */
object HashExpressions {
  import MirrorHash.{P, NUM_PERMS, SIM_BITS}

  // 131^k mod P — the per-position multipliers REDUCED mod P: with raw
  // 131^k (up to ~6.6e14) the per-word accumulator overflowed a signed
  // Long after ~650 characters of one unbroken token (base64 blobs and
  // minified JS are routine in web crawl), going NEGATIVE — and a
  // negative word hash breaks the [0,P) premise every downstream chain
  // (gram packing injectivity, KMV uniformity, pmod-vs-% mirror parity)
  // is built on. Mod-P multipliers + a running mod keep the accumulator
  // in [0,P) for ANY token length.
  private val POW131: Array[Long] = {
    val a = new Array[Long](8); a(0) = 1L
    (1 until 8).foreach(i => a(i) = a(i - 1) * 131L % P); a
  }
  private def permA(j: Int): Long = (654435761L * j + 150889L) % P
  private def permB(j: Int): Long = (253910941L * j + 982451653L) % P

  /** Word-hash array of a space-separated text (MirrorHash.wordHashes):
    * h(word) = Σ ascii(c_i)·(131^(i mod 8) mod P) mod P, maintained in
    * [0,P) by a running mod (each addend ≤ 65535·(P−1) ≈ 6.6e13, so the
    * pre-mod sum never overflows). One pass over the UTF-8 bytes; ASCII
    * inputs only need byte values (matches ascii()). */
  case class WordHashArray(child: Expression) extends UnaryExpression {
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
        else { h = (h + c.toLong * POW131(ci % 8)) % P; ci += 1 }
        k += 1
      }
      out += h // final word (split(text," ") always yields ≥1 token)
      new GenericArrayData(out.toArray)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val powRef = ctx.addReferenceObj("pow131", POW131, "long[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val s = ctx.freshName("s"); val len = ctx.freshName("len")
        val cnt = ctx.freshName("cnt"); val out = ctx.freshName("out")
        val h = ctx.freshName("h"); val ci = ctx.freshName("ci")
        val wi = ctx.freshName("wi"); val k = ctx.freshName("k")
        val c = ctx.freshName("c")
        s"""
           |String $s = $in.toString();
           |int $len = $s.length();
           |int $cnt = 1;
           |for (int $k = 0; $k < $len; $k++) if ($s.charAt($k) == ' ') $cnt++;
           |long[] $out = new long[$cnt];
           |long $h = 0L; int $ci = 0; int $wi = 0;
           |for (int $k = 0; $k < $len; $k++) {
           |  char $c = $s.charAt($k);
           |  if ($c == ' ') { $out[$wi++] = $h; $h = 0L; $ci = 0; }
           |  else { $h = ($h + (long) $c * $powRef[$ci % 8]) % ${P}L; $ci++; }
           |}
           |$out[$wi] = $h;
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }
  }

  /** 3-gram shingle hashes over a word-hash array (MirrorHash.shingleHashes). */
  case class ShingleHashArray(child: Expression) extends UnaryExpression {
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

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        s"""
           |int $n = $in.numElements();
           |long[] $out = ($n < 3) ? new long[0] : new long[$n - 2];
           |for (int $i = 0; $i + 2 < $n; $i++) {
           |  $out[$i] = (($in.getLong($i) % ${P}L) * 31L
           |    + ($in.getLong($i + 1) % ${P}L) * 131L
           |    + ($in.getLong($i + 2) % ${P}L) * 1313L) % ${P}L;
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }
  }

  /** Word-n-gram hashes over a word-hash array (MirrorHash.ngramHashes):
    * gram i = Σ_k (whs[i+k] mod P)·(131^k mod P) mod P. Terms stay under
    * P² ≈ 2^60 and at most 8 accumulate, so the sum never wraps a long. */
  case class NgramHashArray(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): NgramHashArray =
      copy(child = c)

    private val mult: Array[Long] =
      (0 until n).scanLeft(1L)((a, _) => a * 131L % P).take(n).toArray

    override def nullSafeEval(input: Any): Any = {
      val whs = input.asInstanceOf[ArrayData].toLongArray()
      if (whs.length < n) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](whs.length - n + 1)
      var i = 0
      while (i < out.length) {
        var acc = 0L
        var k = 0
        while (k < n) { acc += (whs(i + k) % P) * mult(k); k += 1 }
        out(i) = acc % P
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val gad = classOf[GenericArrayData].getName
      val multRef = ctx.addReferenceObj("mult", mult, "long[]")
      nullSafeCodeGen(ctx, ev, in => {
        val nn = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val k = ctx.freshName("k")
        val acc = ctx.freshName("acc")
        s"""
           |int $nn = $in.numElements();
           |long[] $out = ($nn < $n) ? new long[0] : new long[$nn - ${n - 1}];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  long $acc = 0L;
           |  for (int $k = 0; $k < $n; $k++) {
           |    $acc += ($in.getLong($i + $k) % ${P}L) * $multRef[$k];
           |  }
           |  $out[$i] = $acc % ${P}L;
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }
  }

  /** WIDE word-n-gram hashes (MirrorHash.ngramHashesWide): two
    * independent mod-P polynomial chains (multipliers 131 and 1117)
    * packed as h1·P + h2 < P² ≈ 10¹⁸ (fits signed 64-bit, and every
    * intermediate stays BIGINT-safe for the DuckDB mirror). For
    * operators that act DESTRUCTIVELY on gram-hash equality (dup-span
    * removal deletes text): a single mod-P hash (~2³⁰) false-collides
    * distinct grams at the birthday rate G²∕2P — hundreds of spurious
    * deletions at 10⁶ distinct grams, overwhelming at corpus scale. The
    * packed pair's collision space is P² ≈ 2⁶⁰: expected false pairs
    * G²∕2P² ≈ 0.5 at G = 10⁹ and ≈ 5·10⁵ at G = 10¹² (a 5·10⁻⁷
    * fraction at ~100 TB) — documented residual, negligible in effect
    * and strictly audit-visible via dup_tokens counts. */
  case class NgramHashWideArray(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1 && n <= 8, s"ngram n must be in [1,8], got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): NgramHashWideArray =
      copy(child = c)

    private val mult1: Array[Long] =
      (0 until n).scanLeft(1L)((a, _) => a * 131L % P).take(n).toArray
    private val mult2: Array[Long] =
      (0 until n).scanLeft(1L)((a, _) => a * 1117L % P).take(n).toArray

    override def nullSafeEval(input: Any): Any = {
      val whs = input.asInstanceOf[ArrayData].toLongArray()
      if (whs.length < n) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](whs.length - n + 1)
      var i = 0
      while (i < out.length) {
        var a1 = 0L; var a2 = 0L
        var k = 0
        while (k < n) {
          val w = whs(i + k) % P
          a1 += w * mult1(k); a2 += w * mult2(k) // ≤ 8·P² < 2^63
          k += 1
        }
        out(i) = (a1 % P) * P + (a2 % P)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val gad = classOf[GenericArrayData].getName
      val m1Ref = ctx.addReferenceObj("mult1", mult1, "long[]")
      val m2Ref = ctx.addReferenceObj("mult2", mult2, "long[]")
      nullSafeCodeGen(ctx, ev, in => {
        val nn = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val k = ctx.freshName("k")
        val a1 = ctx.freshName("a1"); val a2 = ctx.freshName("a2")
        val w = ctx.freshName("w")
        s"""
           |int $nn = $in.numElements();
           |long[] $out = ($nn < $n) ? new long[0] : new long[$nn - ${n - 1}];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  long $a1 = 0L; long $a2 = 0L;
           |  for (int $k = 0; $k < $n; $k++) {
           |    long $w = $in.getLong($i + $k) % ${P}L;
           |    $a1 += $w * $m1Ref[$k]; $a2 += $w * $m2Ref[$k];
           |  }
           |  $out[$i] = ($a1 % ${P}L) * ${P}L + ($a2 % ${P}L);
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 §4 — the MOSS local document fingerprint): over a
    * gram-hash array, slide a window of `w` consecutive hashes and
    * select each window's minimum (LEFTMOST position on ties — a fixed,
    * engine-mirrorable tie-break; the paper's "robust" rightmost rule
    * differs only in which duplicate hash is kept). The selected set is
    * returned as packed `pos·P + hash` longs in increasing-position
    * order (hash < P, so packing is injective for any pos < 2^63∕P ≈
    * 9·10⁹ grams — far beyond any document). Guarantee: two documents
    * sharing a word-gram run of ≥ w+k−1 words share ≥1 selected
    * fingerprint hash, with expected density 2∕(w+1) — a local,
    * position-robust alternative to MinHash for substring-level match.
    *
    * Single O(m) pass via a monotonic ascending deque (indices whose
    * hashes increase; pop-back on strict `>` keeps the earliest minimum
    * = leftmost tie-break); the O(m·w) per-window HOF form
    * ([[MirrorHash.winnowSelect]]) is the executable spec and the DuckDB
    * oracle mirror. Documents with fewer than w grams winnow their
    * single full window (standard short-doc convention); empty gram
    * arrays select nothing. */
  case class WinnowArray(child: Expression, w: Int) extends UnaryExpression {
    require(w >= 1, s"winnow window must be >= 1, got $w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): WinnowArray =
      copy(child = c)

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      val m = hs.length
      if (m == 0) return new GenericArrayData(Array.emptyLongArray)
      val dq = new Array[Int](m)
      var head = 0; var tail = 0
      val sel = new Array[Long](m)
      var nSel = 0; var last = -1
      var i = 0
      while (i < m) {
        while (tail > head && hs(dq(tail - 1)) > hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (i >= w - 1 || i == m - 1) {
          while (dq(head) < i - w + 1) head += 1
          val p = dq(head)
          if (p != last) { sel(nSel) = p.toLong * P + hs(p); nSel += 1; last = p }
        }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(sel, nSel))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val m = ctx.freshName("m"); val dq = ctx.freshName("dq")
        val head = ctx.freshName("head"); val tail = ctx.freshName("tail")
        val sel = ctx.freshName("sel"); val nSel = ctx.freshName("nSel")
        val last = ctx.freshName("last"); val i = ctx.freshName("i")
        val p = ctx.freshName("p")
        s"""
           |int $m = $in.numElements();
           |int[] $dq = new int[$m];
           |long[] $sel = new long[$m];
           |int $head = 0, $tail = 0, $nSel = 0, $last = -1;
           |for (int $i = 0; $i < $m; $i++) {
           |  while ($tail > $head && $in.getLong($dq[$tail - 1]) > $in.getLong($i)) $tail--;
           |  $dq[$tail++] = $i;
           |  if ($i >= $w - 1 || $i == $m - 1) {
           |    while ($dq[$head] < $i - $w + 1) $head++;
           |    int $p = $dq[$head];
           |    if ($p != $last) { $sel[$nSel++] = (long) $p * ${P}L + $in.getLong($p); $last = $p; }
           |  }
           |}
           |${ev.value} = new $gad(java.util.Arrays.copyOf($sel, $nSel));
         """.stripMargin
      })
    }
  }

  /** MinHash signature (MirrorHash.minhashSig): NUM_PERMS mins in one pass. */
  case class MinHashSig(child: Expression) extends UnaryExpression {
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

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("permAs", Array.tabulate(NUM_PERMS)(permA), "long[]")
      val bRef = ctx.addReferenceObj("permBs", Array.tabulate(NUM_PERMS)(permB), "long[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val h = ctx.freshName("h"); val v = ctx.freshName("v")
        s"""
           |int $n = $in.numElements();
           |long[] $sig = new long[$NUM_PERMS];
           |java.util.Arrays.fill($sig, ${P}L);
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $in.getLong($i);
           |  for (int $j = 0; $j < $NUM_PERMS; $j++) {
           |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${P}L;
           |    if ($v < $sig[$j]) $sig[$j] = $v;
           |  }
           |}
           |${ev.value} = new $gad($sig);
         """.stripMargin
      })
    }
  }

  /** 30-bit SimHash (MirrorHash.simhash) in one pass. */
  case class SimHash30(child: Expression) extends UnaryExpression {
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

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
        val i = ctx.freshName("i"); val b = ctx.freshName("b")
        val h = ctx.freshName("h"); val sh = ctx.freshName("sh")
        s"""
           |int $n = $in.numElements();
           |long[] $counts = new long[$SIM_BITS];
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $in.getLong($i);
           |  for (int $b = 0; $b < $SIM_BITS; $b++) {
           |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
           |  }
           |}
           |long $sh = 0L;
           |for (int $b = 0; $b < $SIM_BITS; $b++) {
           |  if ($counts[$b] >= 0) $sh |= (1L << $b);
           |}
           |${ev.value} = $sh;
         """.stripMargin
      })
    }
  }

  /** Multi-table hyperplane-LSH band signature of a fixed-point vector:
    * `tables` band values, each packing `planes` sign bits (bit p of band
    * t is 1 iff the dot product with deterministic hyperplane j = t·P+p
    * is ≥ 0). The weight matrix comes from [[PlaneHash]] and is computed
    * once per (tables, planes, dims) config, NOT per row — the per-row
    * work is one fused multiply-add loop over tables·planes·dims terms,
    * fully codegen'd. Feeds Dedup.embeddingPairs candidate generation. */
  case class HyperplaneSig(child: Expression, tables: Int, planes: Int, dims: Int)
      extends UnaryExpression {
    require(planes <= 63, "band packs bits into one long")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): HyperplaneSig =
      copy(child = c)

    @transient private lazy val w: Array[Long] = PlaneHash.table(tables * planes, dims)

    override def nullSafeEval(input: Any): Any = {
      val fx = input.asInstanceOf[ArrayData].toLongArray()
      val n = math.min(fx.length, dims)
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var p = 0
        var bv = 0L
        while (p < planes) {
          val base = (t * planes + p) * dims
          var dot = 0L
          var d = 0
          while (d < n) { dot += fx(d) * w(base + d); d += 1 }
          if (dot >= 0) bv |= (1L << p)
          p += 1
        }
        out(t) = bv
        t += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val wRef = ctx.addReferenceObj("planeWeights", w, "long[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, fx => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val t = ctx.freshName("t"); val p = ctx.freshName("p")
        val bv = ctx.freshName("bv"); val dot = ctx.freshName("dot")
        val base = ctx.freshName("base"); val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($fx.numElements(), $dims);
           |long[] $out = new long[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  long $bv = 0L;
           |  for (int $p = 0; $p < $planes; $p++) {
           |    int $base = ($t * $planes + $p) * $dims;
           |    long $dot = 0L;
           |    for (int $d = 0; $d < $n; $d++) {
           |      $dot += $fx.getLong($d) * $wRef[$base + $d];
           |    }
           |    if ($dot >= 0) $bv |= (1L << $p);
           |  }
           |  $out[$t] = $bv;
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }
  }

  /** Fixed-point dot product of two BIGINT arrays (Similarity cosine
    * numerator) — one fused loop instead of zip_with+aggregate. Fully
    * codegen'd (`doGenCode`): the loop inlines into the surrounding
    * whole-stage-codegen pipeline, the hot path of the all-pairs
    * embedding join. */
  /** Spark `round(p, 0).cast("long")` for a DOUBLE, callable from
    * generated code. Fast exact path: for 1 ≤ |p| < 2⁵¹, `floor(|p|+0.5)`
    * re-signed equals Spark's HALF_UP-on-shortest-decimal — a `k+0.5`
    * boundary can only separate a double from its shortest decimal
    * representation if the boundary itself is representable AND shorter,
    * in which case Double.toString would have produced the boundary; and
    * in [1, 2⁵¹) the sum |p|+0.5 never falsely rounds across k+1 because
    * fractional parts are ulp-grid multiples, so f ≤ 0.5−ulp keeps the
    * exact sum representable. |p| < 1 takes the exact BigDecimal route:
    * the JDK-6430675 value 0.49999999999999994 has 0.49…94+0.5 land
    * exactly on the 1.0 round-to-even tie, where floor(+0.5) says 1 but
    * HALF_UP on the shortest decimal says 0 — the one region where the
    * addition trick and decimal rounding disagree. Past 2⁵¹ (far outside
    * the ±10⁷ embedding domain) likewise BigDecimal; NaN/±Inf follow
    * Cast-to-long (0 / clamp). Bit-parity with the HOF form:
    * HashExprSpec. */
  def roundFix(p: Double): Long = {
    if (p != p) 0L
    else if (p == Double.PositiveInfinity) Long.MaxValue
    else if (p == Double.NegativeInfinity) Long.MinValue
    else if (p >= 1 && p < 2.251799813685248e15) Math.floor(p + 0.5d).toLong
    else if (p <= -1 && p > -2.251799813685248e15) -Math.floor(-p + 0.5d).toLong
    else java.math.BigDecimal.valueOf(p)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** Fixed-point conversion of a DOUBLE vector — the fused, fully
    * codegen'd form of `transform(vec, x => round(x * 1e6).cast("long"))`.
    * The HOF form walks an interpreted expression tree per ELEMENT
    * (ArrayTransform never participates in whole-stage codegen), which
    * made the corpus-wide fixed-point pass the dominant cost of every
    * similarity / embedding / embedding-dedup query; this loop inlines
    * into the surrounding generated code. Identical output incl. null
    * elements and round-half boundaries ([[roundFix]]). */
  case class FixedPointVec(child: Expression) extends UnaryExpression {
    private def childContainsNull: Boolean = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    override def dataType: DataType =
      ArrayType(LongType, containsNull = childContainsNull)
    override protected def withNewChildInternal(c: Expression): FixedPointVec =
      copy(c)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (childContainsNull) {
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) out(i) = roundFix(arr.getDouble(i) * 1e6)
          i += 1
        }
        new GenericArrayData(out)
      } else {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) { out(i) = roundFix(arr.getDouble(i) * 1e6); i += 1 }
        new GenericArrayData(out)
      }
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val gad = classOf[GenericArrayData].getName
      val he = "graft.functions.HashExpressions"
      nullSafeCodeGen(ctx, ev, arr => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        if (childContainsNull)
          s"""
             |int $n = $arr.numElements();
             |Object[] $out = new Object[$n];
             |for (int $i = 0; $i < $n; $i++) {
             |  if (!$arr.isNullAt($i)) {
             |    $out[$i] = java.lang.Long.valueOf(
             |      $he.roundFix($arr.getDouble($i) * 1.0E6D));
             |  }
             |}
             |${ev.value} = new $gad($out);
           """.stripMargin
        else
          s"""
             |int $n = $arr.numElements();
             |long[] $out = new long[$n];
             |for (int $i = 0; $i < $n; $i++) {
             |  $out[$i] = $he.roundFix($arr.getDouble($i) * 1.0E6D);
             |}
             |${ev.value} = new $gad($out);
           """.stripMargin
      })
    }
  }

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

  /** Σ xᵢ²·wᵢ accumulated in unsigned 128-bit integer arithmetic and
    * emitted as DECIMAL(38,0) — the allocation-light replacement for a
    * per-element Decimal HOF fold (ewm variance's Σw·x² term, whose
    * v²·w products overflow a Long for |v| > ~2.1e6 micro-units). Values
    * may be negative (the square is taken here); weights must be
    * non-negative. Exact while the true sum < 2¹²⁷ ≈ 1.7e38 — i.e. on
    * the full domain DECIMAL(38,0) itself can represent. */
  case class FixedDotSq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DecimalType(38, 0)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): FixedDotSq =
      copy(l, r)

    override def nullSafeEval(a: Any, b: Any): Any =
      HashExpressions.fixedDotSq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HashExpressions.fixedDotSq($a, $b);")
  }

  /** Shared by interpreted eval and generated code: unsigned 128-bit
    * (hi, lo) accumulation of Σ x²·w, one Decimal built per ROW. */
  def fixedDotSq(a: ArrayData, b: ArrayData): org.apache.spark.sql.types.Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < n) {
      val v = a.getLong(i); val w = b.getLong(i)
      // v² as unsigned 128 (non-negative): signed multiplyHigh is exact
      // here because both operands are the same value
      val sqHi = Math.multiplyHigh(v, v); val sqLo = v * v
      // (sqHi, sqLo) · w: 64×128 schoolbook; sqLo is an UNSIGNED limb, so
      // its high product needs the unsigned correction of multiplyHigh
      val pLo = sqLo * w
      var pHi = Math.multiplyHigh(sqLo, w) + ((sqLo >> 63) & w) + ((w >> 63) & sqLo)
      pHi += sqHi * w
      // 128-bit add with carry detect on the unsigned low limb
      val newLo = lo + pLo
      if (java.lang.Long.compareUnsigned(newLo, lo) < 0) hi += 1L
      lo = newLo; hi += pHi
      i += 1
    }
    val big = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(big), 38, 0)
  }

  /** All |C| Naive-Bayes class scores in ONE codegen'd pass over a
    * word-hash array: scores[c] = priors[c] + Σ_i table[c·B + b_i] with
    * b_i = pmod(whs[i], B). The per-class model tables ride along as
    * plan reference objects (|C|·B longs), so scoring a document is a
    * tight two-level loop with zero allocation beyond the |C|-long
    * output — replacing the |C| interpreted `aggregate` HOF folds that
    * re-evaluated the word hashes once per class (r10's one perf_weak:
    * ArrayAggregate.eval → WordHashArray per class per row). */
  case class ClassScoreArray(child: Expression, priors: Array[Long],
      table: Array[Long], buckets: Int) extends UnaryExpression {
    require(buckets > 0, "buckets must be positive")
    require(priors.length >= 1, "need at least one class")
    require(table.length == priors.length * buckets,
      s"table length ${table.length} != ${priors.length} classes x $buckets buckets")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(c: Expression): ClassScoreArray =
      copy(child = c)

    override def nullSafeEval(input: Any): Any = {
      val whs = input.asInstanceOf[ArrayData]
      val n = whs.numElements()
      val out = priors.clone()
      var i = 0
      while (i < n) {
        val w = whs.getLong(i)
        val b = (((w % buckets) + buckets) % buckets).toInt // pmod
        var c = 0
        while (c < out.length) { out(c) += table(c * buckets + b); c += 1 }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("nbPriors", priors, "long[]")
      val tRef = ctx.addReferenceObj("nbTable", table, "long[]")
      val gad = classOf[GenericArrayData].getName
      val nc = priors.length
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val c = ctx.freshName("c")
        val b = ctx.freshName("b")
        s"""
           |int $n = $in.numElements();
           |long[] $out = new long[$nc];
           |System.arraycopy($pRef, 0, $out, 0, $nc);
           |for (int $i = 0; $i < $n; $i++) {
           |  int $b = (int) ((($in.getLong($i) % $buckets) + $buckets) % $buckets);
           |  for (int $c = 0; $c < $nc; $c++) $out[$c] += $tRef[$c * $buckets + $b];
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }
  }

  // Column wrappers (Spark 4: Column ↔ Expression via the sql-package bridge)
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def word_hashes(text: Column): Column = column(WordHashArray(expression(text)))
  def shingle_hashes(whs: Column): Column = column(ShingleHashArray(expression(whs)))
  def ngram_hashes(whs: Column, n: Int): Column = column(NgramHashArray(expression(whs), n))
  def ngram_hashes_wide(whs: Column, n: Int): Column =
    column(NgramHashWideArray(expression(whs), n))
  def class_scores(whs: Column, priors: Array[Long], table: Array[Long],
      buckets: Int): Column =
    column(ClassScoreArray(expression(whs), priors, table, buckets))
  def minhash_sig(shs: Column): Column = column(MinHashSig(expression(shs)))
  def winnow(hs: Column, w: Int): Column = column(WinnowArray(expression(hs), w))
  def simhash30(shs: Column): Column = column(SimHash30(expression(shs)))
  def fixed_dot(a: Column, b: Column): Column = column(FixedDot(expression(a), expression(b)))
  def fixed_dot_sq(a: Column, b: Column): Column = column(FixedDotSq(expression(a), expression(b)))
  def fixed_point_vec(vec: Column): Column = column(FixedPointVec(expression(vec)))
  def hyperplane_sig(fx: Column, tables: Int, planes: Int, dims: Int): Column =
    column(HyperplaneSig(expression(fx), tables, planes, dims))
}

/** Deterministic pseudo-random hyperplane weights, shared by the Scala
  * side ([[HashExpressions.HyperplaneSig]], Similarity's bucket columns)
  * and the DuckDB oracle mirror.
  *
  * `weight(j, d)` for plane j, dimension d is a TWO-round multiplicative
  * hash with a nonlinear (modular-squaring) middle step:
  *   k  = j·64 + d
  *   h1 = (k · 2654435761) mod 2147483647
  *   w  = (h1² mod 2147483647 · 2246822519) mod 97 − 48        ∈ [−48, 48]
  *
  * The squaring is load-bearing: a single multiply-mod chain is LINEAR in
  * k, which makes every plane a cyclic shift of the same 97-long weight
  * sequence — only ~97 effectively distinct hyperplanes exist and LSH
  * recall saturates no matter how many tables are added (measured: band
  * buckets collapsed to 128 values with a 19% hot bucket). With the
  * squaring step the planes decorrelate (256/256 buckets, max 1% skew).
  *
  * Every intermediate fits in a signed 64-bit integer (h1 < 2^31 so
  * h1² < 2^62; (h1² mod M)·2246822519 < 2^62), so Spark `Long`, DuckDB
  * `BIGINT`, and the spec's numpy int64 all compute identical values —
  * no overflow wraparound anywhere.
  */
object PlaneHash {
  val M = 2147483647L

  def weight(j: Long, d: Long): Long = {
    val h1 = ((j * 64L + d) * 2654435761L) % M
    (h1 * h1 % M * 2246822519L) % 97L - 48L
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()

  /** Flattened (plane-major) weight matrix for `planes` hyperplanes over
    * `dims` dimensions, computed once per config per JVM. */
  def table(planes: Int, dims: Int): Array[Long] =
    cache.computeIfAbsent((planes, dims), { case (np, nd) =>
      val w = new Array[Long](np * nd)
      var j = 0
      while (j < np) {
        var d = 0
        while (d < nd) { w(j * nd + d) = weight(j.toLong, d.toLong); d += 1 }
        j += 1
      }
      w
    })

  /** DuckDB CTE producing (j, d, w) for planes [0, planes) × dims [0, dims):
    * the oracle-side mirror of [[table]]. */
  def weightsCteSql(planes: Int, dims: Int): String =
    s"""wts AS (SELECT j, d, ((h1*h1)%$M*2246822519)%97-48 AS w
       | FROM (SELECT j, d, ((j*64+d)*2654435761)%$M AS h1
       |       FROM generate_series(0,${planes - 1}) t1(j), generate_series(0,${dims - 1}) t2(d)))""".stripMargin

  /** DuckDB scalar expression for weight(j, d) usable inside a lambda
    * (j, d are SQL expressions; the h1 subexpression is inlined twice). */
  def weightSql(j: String, d: String): String = {
    val h1 = s"((($j)*64+($d))*2654435761)%$M"
    s"((($h1)*($h1))%$M*2246822519)%97-48"
  }
}
