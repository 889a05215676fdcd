package graft.core

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

/** Restricted row-function AST — the "small translator" SURVEY §7.4.1
  * floats for automatic vectorization (reference behavior: swifter probes
  * the SAME black-box callable as a column op via numpy broadcasting,
  * swifter/swifter.py:309-317; a JVM closure cannot be re-typed that way,
  * so the restricted AST carries BOTH forms from one definition).
  *
  * A `SwiftExpr` is a tiny arithmetic/conditional language over named
  * numeric fields. From one term the engine derives:
  *   - `eval(row)`  — the row-at-a-time function (the semantic oracle);
  *   - `column`     — the equivalent Catalyst Column (whole-stage codegen).
  * `Swift.applyExpr` feeds both to the normal K2 probe, so the translation
  * is still VALIDATED on a sample before the vectorized plan is chosen —
  * a translator bug degrades to the UDF path instead of wrong results.
  * The probe alone can't catch a divergence confined to rows outside the
  * sample, so the two forms are built as TRUE TWINS on the full double
  * domain: division and log evaluate raw JVM IEEE-754 (not Spark's
  * NULL/ANSI-error behavior on zero denominators and non-positive logs),
  * NULL fields read as NaN on both sides, and comparisons NaN-guard the
  * Spark ordering (see the member scaladocs).
  *
  * Deliberately tiny: +,-,*,/, unary neg, abs/sqrt/exp/log/pow, and
  * comparisons/boolean logic feeding `If`. Anything outside the language
  * stays a black-box closure and goes through the ordinary probe path.
  */
sealed trait SwiftExpr {
  /** Row-at-a-time semantics — plain JVM IEEE-754 double arithmetic. */
  def eval(row: Row): Double
  /** Columnar twin. MUST agree with [[eval]] on EVERY row, not just the
    * probe sample: division and log use [[graft.functions.IeeeMath]]
    * (Spark's built-ins diverge on zero denominators / non-positive log
    * args — NULL or an ANSI error where the JVM gives ±Inf/NaN), NULL
    * input fields become NaN in both forms, and comparisons are
    * NaN-guarded (Spark orders NaN greater than everything; the JVM
    * compares NaN as false) so `If` picks the same branch. */
  def column: Column

  def +(o: SwiftExpr): SwiftExpr = SwiftExpr.Bin(this, o, "+")
  def -(o: SwiftExpr): SwiftExpr = SwiftExpr.Bin(this, o, "-")
  def *(o: SwiftExpr): SwiftExpr = SwiftExpr.Bin(this, o, "*")
  def /(o: SwiftExpr): SwiftExpr = SwiftExpr.Bin(this, o, "/")
  def unary_- : SwiftExpr = SwiftExpr.Bin(SwiftExpr.Num(0.0), this, "-")

  def <(o: SwiftExpr): SwiftPred = SwiftPred.Cmp(this, o, "<")
  def <=(o: SwiftExpr): SwiftPred = SwiftPred.Cmp(this, o, "<=")
  def >(o: SwiftExpr): SwiftPred = SwiftPred.Cmp(this, o, ">")
  def >=(o: SwiftExpr): SwiftPred = SwiftPred.Cmp(this, o, ">=")
  def ===(o: SwiftExpr): SwiftPred = SwiftPred.Cmp(this, o, "==")
}

object SwiftExpr {
  /** Named numeric input field (read as double, mirroring numpy's
    * float64 upcast of numeric frames). A NULL value reads as NaN — the
    * float64 representation pandas itself uses for missing numerics —
    * identically in both forms, so a nullable column degrades to NaN
    * arithmetic instead of throwing at probe time (eval) or silently
    * diverging (column). */
  final case class Fld(name: String) extends SwiftExpr {
    def eval(row: Row): Double = row.getAs[Any](name) match {
      case null => Double.NaN
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case other => throw new IllegalArgumentException(
        s"non-numeric field $name: $other")
    }
    def column: Column = {
      val c = col(name).cast("double")
      when(c.isNull, lit(Double.NaN)).otherwise(c)
    }
  }

  final case class Num(v: Double) extends SwiftExpr {
    def eval(row: Row): Double = v
    def column: Column = lit(v)
  }

  final case class Bin(a: SwiftExpr, b: SwiftExpr, op: String) extends SwiftExpr {
    def eval(row: Row): Double = {
      val x = a.eval(row); val y = b.eval(row)
      op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "/" => x / y
      }
    }
    def column: Column = op match {
      case "+" => a.column + b.column
      case "-" => a.column - b.column
      case "*" => a.column * b.column
      // NOT Spark's `/`: ANSI (Spark 4 default) throws on x/0 and
      // non-ANSI returns NULL, where eval gives ±Inf/NaN
      case "/" => graft.functions.IeeeMath.ieee_div(a.column, b.column)
    }
  }

  final case class Fun1(a: SwiftExpr, f: String) extends SwiftExpr {
    def eval(row: Row): Double = {
      val x = a.eval(row)
      f match {
        case "abs" => math.abs(x)
        case "sqrt" => math.sqrt(x)
        case "exp" => math.exp(x)
        case "log" => math.log(x)
      }
    }
    def column: Column = f match {
      case "abs" => abs(a.column)
      case "sqrt" => sqrt(a.column) // Spark sqrt(<0) = NaN, same as the JVM
      case "exp" => exp(a.column)
      // NOT Spark's `log`: it returns NULL for x ≤ 0, where Math.log
      // gives -Inf (x = 0) / NaN (x < 0)
      case "log" => graft.functions.IeeeMath.ieee_log(a.column)
    }
  }

  final case class Pow(a: SwiftExpr, b: SwiftExpr) extends SwiftExpr {
    def eval(row: Row): Double = math.pow(a.eval(row), b.eval(row))
    def column: Column = pow(a.column, b.column)
  }

  final case class If(c: SwiftPred, t: SwiftExpr, e: SwiftExpr) extends SwiftExpr {
    def eval(row: Row): Double = if (c.eval(row)) t.eval(row) else e.eval(row)
    def column: Column = when(c.column, t.column).otherwise(e.column)
  }

  // entry points
  def fld(name: String): SwiftExpr = Fld(name)
  def num(v: Double): SwiftExpr = Num(v)
  def iff(c: SwiftPred, t: SwiftExpr, e: SwiftExpr): SwiftExpr = If(c, t, e)
  def abs_(a: SwiftExpr): SwiftExpr = Fun1(a, "abs")
  def sqrt_(a: SwiftExpr): SwiftExpr = Fun1(a, "sqrt")
  def exp_(a: SwiftExpr): SwiftExpr = Fun1(a, "exp")
  def log_(a: SwiftExpr): SwiftExpr = Fun1(a, "log")
  def pow_(a: SwiftExpr, b: SwiftExpr): SwiftExpr = Pow(a, b)
}

/** Boolean sub-language of [[SwiftExpr]] (conditions for `If`). */
sealed trait SwiftPred {
  def eval(row: Row): Boolean
  def column: Column
  def &&(o: SwiftPred): SwiftPred = SwiftPred.AndP(this, o)
  def ||(o: SwiftPred): SwiftPred = SwiftPred.OrP(this, o)
  def unary_! : SwiftPred = SwiftPred.NotP(this)
}

object SwiftPred {
  final case class Cmp(a: SwiftExpr, b: SwiftExpr, op: String) extends SwiftPred {
    def eval(row: Row): Boolean = {
      val x = a.eval(row); val y = b.eval(row)
      op match {
        case "<" => x < y
        case "<=" => x <= y
        case ">" => x > y
        case ">=" => x >= y
        case "==" => x == y
      }
    }
    def column: Column = {
      val (ac, bc) = (a.column, b.column)
      val cmp = op match {
        case "<" => ac < bc
        case "<=" => ac <= bc
        case ">" => ac > bc
        case ">=" => ac >= bc
        case "==" => ac === bc
      }
      // Spark totally orders NaN above every double (NaN > x, NaN === NaN
      // are true); the JVM compares NaN as false for ALL of <,<=,>,>=,==.
      // NaN reaches comparisons through 0/0, log(<0), or a NULL field, so
      // an unguarded If would pick a different branch than eval.
      when(isnan(ac) || isnan(bc), lit(false)).otherwise(cmp)
    }
  }
  final case class AndP(a: SwiftPred, b: SwiftPred) extends SwiftPred {
    def eval(row: Row): Boolean = a.eval(row) && b.eval(row)
    def column: Column = a.column && b.column
  }
  final case class OrP(a: SwiftPred, b: SwiftPred) extends SwiftPred {
    def eval(row: Row): Boolean = a.eval(row) || b.eval(row)
    def column: Column = a.column || b.column
  }
  final case class NotP(a: SwiftPred) extends SwiftPred {
    def eval(row: Row): Boolean = !a.eval(row)
    def column: Column = !a.column
  }
}
