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
  *
  * Deliberately tiny: +,-,*,/, unary neg, abs/sqrt/exp/log/pow, and
  * comparisons/boolean logic feeding `If`. Anything outside the language
  * stays a black-box closure and goes through the ordinary probe path.
  */
sealed trait SwiftExpr {
  def eval(row: Row): Double
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
    * float64 upcast of numeric frames). */
  final case class Fld(name: String) extends SwiftExpr {
    def eval(row: Row): Double = row.getAs[Any](name) match {
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
    def column: Column = col(name).cast("double")
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
      case "/" => a.column / b.column
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
      case "sqrt" => sqrt(a.column)
      case "exp" => exp(a.column)
      case "log" => log(a.column)
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
    def column: Column = op match {
      case "<" => a.column < b.column
      case "<=" => a.column <= b.column
      case ">" => a.column > b.column
      case ">=" => a.column >= b.column
      case "==" => a.column === b.column
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
