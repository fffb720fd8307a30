package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expressions.{DoubleSortableBits, FloatVectorCosine, FloatVectorDot}

/** Session extensions registering graft's native expressions for the
  * SQL surface — the canonical integration point for custom Catalyst
  * pieces:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   // then: SELECT fvec_cosine(embedding, other) FROM vectors
  * }}}
  *
  * The injected functions are the whole-stage-codegen vector kernels
  * ([[graft.expressions.VectorExpressions]]), so SQL-text users get the
  * same plans as the Column API. For a session that is already built
  * (no extensions conf), [[GraftExtensions.register]] installs the same
  * functions through the function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def binary(name: String, make: (Expression, Expression) => Expression)
      (children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => make(a, b)
    case _ => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${children.length}")
  }

  /** (name, info, builder) triples for every injected function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fvec_cosine"),
      new ExpressionInfo(classOf[FloatVectorCosine].getName, "fvec_cosine"),
      binary("fvec_cosine", FloatVectorCosine) _),
    (FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "fvec_dot"),
      binary("fvec_dot", FloatVectorDot) _),
    (FunctionIdentifier("double_sortable_bits"),
      new ExpressionInfo(classOf[DoubleSortableBits].getName, "double_sortable_bits"),
      (children: Seq[Expression]) => children match {
        case Seq(a) => DoubleSortableBits(a)
        case _ => throw new IllegalArgumentException(
          s"double_sortable_bits requires exactly 1 argument, got ${children.length}")
      }))

  /** Install on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      ColumnBridge.registerFunction(spark, id.funcName, info, builder)
    }
}
