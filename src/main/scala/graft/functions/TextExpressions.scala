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

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def repetition_stats(tokens: Column): Column = column(RepetitionStats(expression(tokens)))
  def canonical_text(text: Column): Column = column(CanonicalText(expression(text)))
}
