package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** IEEE-754 double arithmetic with exact JVM semantics, independent of
  * `spark.sql.ansi.enabled`.
  *
  * Spark's built-in `/` is NOT a JVM-semantics twin for doubles: under
  * ANSI mode (the Spark 4 default) x/0 throws DIVIDE_BY_ZERO, and under
  * non-ANSI it returns NULL — where the JVM gives ±Infinity (or NaN for
  * 0/0). `log` likewise returns NULL (or errors) for non-positive input
  * where `java.lang.Math.log` gives -Infinity / NaN. The [[SwiftExpr]]
  * AST promises that its Column translation computes exactly what its
  * row-function `eval` computes on EVERY row — not just the probe sample
  * — so the translation uses these expressions, which evaluate the raw
  * JVM operation in both interpreted and codegen paths.
  */
object IeeeMath {

  /** `a / b` with raw Java double division: 1/0 → Inf, -1/0 → -Inf,
    * 0/0 → NaN, 1/-0.0 → -Inf (signed zero respected). */
  case class IeeeDiv(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = DoubleType
    // without this, non-double children reach codegen's raw Java `/`
    // (integer division / ArithmeticException) while interpreted eval
    // casts to Double — enforce double inputs at analysis time instead
    // Seq[DataType] (not AbstractDataType, which is private[sql]) — fine
    // because Seq is covariant and DataType <: AbstractDataType
    override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): IeeeDiv =
      copy(l, r)
    override def nullSafeEval(a: Any, b: Any): Any =
      a.asInstanceOf[Double] / b.asInstanceOf[Double]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"($a / $b)")
  }

  /** `Math.log(x)`: log(0) → -Inf, log(<0) → NaN, log(NaN) → NaN. */
  case class IeeeLog(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = DoubleType
    override def inputTypes: Seq[DataType] = Seq(DoubleType)
    override protected def withNewChildInternal(c: Expression): IeeeLog = copy(c)
    override def nullSafeEval(x: Any): Any = math.log(x.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"java.lang.Math.log($x)")
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def ieee_div(a: Column, b: Column): Column = column(IeeeDiv(expression(a), expression(b)))
  def ieee_log(a: Column): Column = column(IeeeLog(expression(a)))
}
