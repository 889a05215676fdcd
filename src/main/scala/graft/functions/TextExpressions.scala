package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics expressions (non-hash counterparts of
  * [[HashExpressions]]). The HOF Column formulations they replace remain
  * the executable specification in DecontaminateSpec's differential. */
object TextExpressions {

  /** One-pass repetition statistics over a token array:
    * (top_count, n_bigrams, n_distinct_bigrams). The HOF formulation
    * (array_distinct × filter scan) is O(n²) interpreted comparisons per
    * row and allocation-heavy — this is a single hashed pass, inlined
    * into whole-stage codegen via a static call. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("top_count", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("n_distinct_bigrams", LongType, nullable = false)))
    override protected def withNewChildInternal(c: Expression): RepetitionStats =
      copy(child = c)

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeRepetition(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in =>
        s"${ev.value} = graft.functions.TextExpressions.computeRepetition($in);")
  }

  /** Shared by interpreted eval and generated code. */
  def computeRepetition(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var top = 0L
    var i = 0
    while (i < n) {
      val c = counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val nbg = math.max(n - 1, 0)
    val bigrams = new java.util.HashSet[String](nbg * 2)
    i = 0
    while (i < nbg) {
      // ' ' is the split delimiter, so it cannot occur INSIDE a token --
      // the pair key matches the HOF spec's concat_ws(" ", a, b) keys
      // (and the oracle's ws[i]||' '||ws[i+1]) exactly, NULs included
      bigrams.add(arr.getUTF8String(i).toString + " "
        + arr.getUTF8String(i + 1).toString)
      i += 1
    }
    new GenericInternalRow(Array[Any](top, nbg.toLong, bigrams.size.toLong))
  }

  /** Single-pass canonical text form for normalization-then-exact dedup
    * (the RefinedWeb/CCNet preprocessing key): lowercase, strip
    * everything outside [a-z0-9 ], squeeze whitespace runs, trim — one
    * character scan with no intermediate strings. Replaces the
    * two-`regexp_replace` Column form (now the executable spec in
    * DedupSimilaritySpec's differential), whose java.util.regex passes
    * over full documents were the measured cost of dedup_normalized.
    * Unicode note: per-char `Character.toLowerCase` matches `lower()`'s
    * full case mapping AFTER the [a-z0-9 ] filter — the only multi-char
    * lowercase expansion (U+0130 → i + U+0307) filters to the same 'i',
    * and map-to-ASCII singletons (U+212A KELVIN → k) map identically. */
  case class CanonicalText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override protected def withNewChildInternal(c: Expression): CanonicalText =
      copy(child = c)

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeCanonical(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in =>
        s"${ev.value} = graft.functions.TextExpressions.computeCanonical($in);")
  }

  /** Shared by interpreted eval and generated code. */
  def computeCanonical(s0: UTF8String): UTF8String = {
    val s = s0.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val lc = Character.toLowerCase(s.charAt(i))
      if (lc == ' ') {
        if (sb.length > 0) pendingSpace = true // leading spaces trim away
      } else if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(lc)
      } // anything else is stripped; a pending space stays pending so
        // spaces bridged by stripped chars squeeze to one
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing space never emitted = trim
  }

  /** The FULL Gopher repetition-removal profile (Rae et al. 2021
    * Table A1) in one pass per document: char mass of the single most
    * frequent word 2-∕3-∕4-gram (count × gram chars) and char mass of
    * the UNION of token positions covered by any DUPLICATED
    * 5-∕6-∕7-∕8-gram, plus the total token char mass. All integer
    * decisions: gram ties break (count desc, gram binary-UTF8 asc) —
    * UTF8String comparison here == DuckDB's binary VARCHAR order, so
    * the oracle picks the same gram; char lengths are CODE POINTS
    * (Java codePointCount == DuckDB length()). Char mass counts token
    * characters only (the ' ' delimiters are layout, not content) —
    * the disclosed word-level reading of the paper's character
    * fractions. */
  case class GopherProfile(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_chars", LongType, nullable = false),
      StructField("top2_mass", LongType, nullable = false),
      StructField("top3_mass", LongType, nullable = false),
      StructField("top4_mass", LongType, nullable = false),
      StructField("dup5_mass", LongType, nullable = false),
      StructField("dup6_mass", LongType, nullable = false),
      StructField("dup7_mass", LongType, nullable = false),
      StructField("dup8_mass", LongType, nullable = false)))
    override protected def withNewChildInternal(c: Expression): GopherProfile =
      copy(child = c)

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeGopher(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in =>
        s"${ev.value} = graft.functions.TextExpressions.computeGopher($in);")
  }

  /** Shared by interpreted eval and generated code. */
  def computeGopher(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    val lens = new Array[Long](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      toks(i) = s
      lens(i) = s.codePointCount(0, s.length).toLong
      total += lens(i)
      i += 1
    }
    def gramAt(j: Int, ng: Int): String = {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < ng) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      sb.toString
    }
    def counts(ng: Int): java.util.HashMap[String, Int] = {
      val m = new java.util.HashMap[String, Int]()
      var j = 0
      while (j + ng <= n) { m.merge(gramAt(j, ng), 1, (a, b) => a + b); j += 1 }
      m
    }
    def topMass(ng: Int): Long = {
      if (n < ng) return 0L
      val m = counts(ng)
      var bestC = 0; var bestG: String = null
      m.forEach { (g, c) =>
        if (c > bestC || (c == bestC && (bestG == null ||
            UTF8String.fromString(g).compareTo(UTF8String.fromString(bestG)) < 0)))
          { bestC = c; bestG = g }
      }
      // gram char mass = joined code points minus the ng−1 spaces
      bestC.toLong * (bestG.codePointCount(0, bestG.length) - (ng - 1))
    }
    def dupMass(ng: Int): Long = {
      if (n < ng) return 0L
      val m = counts(ng)
      val covered = new Array[Boolean](n)
      var j = 0
      while (j + ng <= n) {
        if (m.get(gramAt(j, ng)) >= 2) {
          var k = 0
          while (k < ng) { covered(j + k) = true; k += 1 }
        }
        j += 1
      }
      var s = 0L; var p = 0
      while (p < n) { if (covered(p)) s += lens(p); p += 1 }
      s
    }
    new GenericInternalRow(Array[Any](total,
      topMass(2), topMass(3), topMass(4),
      dupMass(5), dupMass(6), dupMass(7), dupMass(8)))
  }

  /** Single-pass URL canonicalization (see
    * [[graft.operators.Urls.canonicalize]] for the contract): one
    * character walk instead of the ~40-node string-function tree the
    * Column composition builds — that tree triplicated through
    * `registrableDomain(canonicalize(url))` made Catalyst + codegen
    * spend ~25s per plan (measured round 12). Semantics are pinned to
    * the composition form by UrlTextOpsSpec's differential; fixed
    * delimiters only, no regex. */
  case class CanonicalUrl(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override protected def withNewChildInternal(c: Expression): CanonicalUrl =
      copy(child = c)

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeCanonicalUrl(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in =>
        s"${ev.value} = graft.functions.TextExpressions.computeCanonicalUrl($in);")
  }

  /** Shared by interpreted eval and generated code. Each step mirrors
    * the split_part/substr Column form verbatim (same out-of-range
    * behaviors: a missing delimiter yields the whole string for part 1
    * and "" for part 2), so the differential holds on ANY input.
    * Lowercasing goes through UTF8String (== `lower()`); the parameter
    * sort compares UTF8String byte order (== `array_sort`). */
  def computeCanonicalUrl(s0: UTF8String): UTF8String = {
    def lower(s: String): String = UTF8String.fromString(s).toLowerCase.toString
    def part1(s: String, d: String): String = {
      val i = s.indexOf(d); if (i >= 0) s.substring(0, i) else s
    }
    def part2(s: String, d: String): String = {
      val i = s.indexOf(d)
      if (i < 0) "" else {
        val r = s.substring(i + d.length)
        val j = r.indexOf(d)
        if (j >= 0) r.substring(0, j) else r
      }
    }
    val u0 = s0.toString
    val u1 = part1(u0, "#")
    val sch = lower(part1(u1, "://"))
    val rest = if (u1.indexOf("://") >= 0) u1.substring(part1(u1, "://").length + 3) else ""
    val hostport = part1(rest, "/")
    val host0 = lower(part1(hostport, ":"))
    val port = part2(hostport, ":")
    val host = if (host0.startsWith("www.")) host0.substring(4) else host0
    val keepPort =
      if (port.isEmpty || (sch == "https" && port == "443") ||
        (sch == "http" && port == "80")) "" else ":" + port
    val pq = rest.substring(hostport.length)
    val path0 = part1(pq, "?")
    val query = part2(pq, "?")
    val path = if (path0.endsWith("/")) path0.substring(0, path0.length - 1) else path0
    val params = query.split("&", -1).filter { p =>
      p.nonEmpty && !lower(p).startsWith("utm_") && {
        val name = part1(p, "=")
        name != "fbclid" && name != "gclid"
      }
    }
    java.util.Arrays.sort(params, (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    val qstr = if (params.isEmpty) "" else "?" + params.mkString("&")
    UTF8String.fromString(sch + "://" + host + keepPort + path + qstr)
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def repetition_stats(tokens: Column): Column = column(RepetitionStats(expression(tokens)))
  def canonical_text(text: Column): Column = column(CanonicalText(expression(text)))
  def canonical_url(url: Column): Column = column(CanonicalUrl(expression(url)))
  def gopher_profile(tokens: Column): Column = column(GopherProfile(expression(tokens)))
}
