package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 bit transform: maps a double to a signed
  * long such that `x < y` (in Spark's double ordering) implies
  * `bits(x) < bits(y)` (in signed-long ordering), with equal doubles
  * mapping equal. The classic radix-sort key trick:
  * `b = doubleToLongBits(x); b ^ ((b >> 63) & 0x7fff…f)` flips the
  * magnitude bits of negatives (more negative → smaller long) and
  * leaves positives alone.
  *
  * Edges, aligned with Spark's total order on doubles:
  *  - `-0.0` is canonicalized to `+0.0` first — Spark compares them
  *    equal, so they must land in the same long (a raw bit transform
  *    would split them across a quantization boundary);
  *  - `NaN` canonicalizes (doubleToLongBits) and maps ABOVE `+Inf`,
  *    matching Spark's NaN-largest comparison semantics.
  *
  * The point of the transform: any arithmetic right-shift of the
  * result is a MONOTONE quantization of the double line whose classes
  * are log-spaced (per-binade subdivisions) — the bounded score-class
  * device of [[graft.operators.Sampling.topFractionBy]]. Participates
  * in whole-stage codegen. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "double_sortable_bits"

  override protected def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Double]
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      s"""
         |double $d = ($c == 0.0) ? 0.0 : $c;
         |long $b = Double.doubleToLongBits($d);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScalarExpressions {
  /** Codegen'd order-preserving double→long bit transform (see
    * [[DoubleSortableBits]]). */
  def sortableBits(c: Column): Column =
    ColumnBridge.column(DoubleSortableBits(ColumnBridge.expression(c)))
}
