package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over `array<float>`
  * (the storage type of the embeddings table) and `array<double>`.
  *
  * The `zip_with`/`aggregate` higher-order-function forms evaluate as
  * interpreted CodegenFallback — fine at test scale, but at 100 TB the
  * dot product is the innermost loop of every similarity scan. These
  * expressions participate in whole-stage codegen (`doGenCode` emits a
  * tight primitive loop over the columnar `ArrayData` — no boxing, no
  * lambda dispatch per element).
  *
  * Numeric semantics are bit-identical to the HOF forms they replace:
  * on two float arrays, per-element FLOAT multiply first (like
  * `zip_with(a, b, _ * _)` on float arrays), then widen to double for
  * accumulation; if either side is `array<double>` the arithmetic is
  * pure double (like the HOF after implicit float→double promotion).
  * Mismatched lengths yield NULL (`zip_with` pads with null, which
  * nulls the whole fold). `AbstractDataType` is private[sql] in Spark 4
  * so implicit-cast traits are unavailable here; double support is
  * native instead of cast-in.
  */
private[expressions] trait FloatOrDoubleArrayInputs { self: BinaryExpression =>

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def checkVectorInputs(prettyName: String): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float>/array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  /** True when BOTH sides are float — the float-multiply-first path. */
  protected def bothFloat: Boolean =
    elemType(left) == FloatType && elemType(right) == FloatType

  protected def getElem(a: ArrayData, t: DataType, i: Int): Double =
    if (t == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java source for element i of `arr` as a double. */
  protected def genGet(arr: String, t: DataType, i: String): String =
    if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

case class FloatVectorCosine(left: Expression, right: Expression)
    extends BinaryExpression with FloatOrDoubleArrayInputs {

  override def checkInputDataTypes(): TypeCheckResult = checkVectorInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fvec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    val ff = bothFloat
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // HOF: null element nulls the fold
      if (ff) {
        val xi = x.getFloat(i); val yi = y.getFloat(i)
        dot += (xi * yi).toDouble
        na += (xi * xi).toDouble
        nb += (yi * yi).toDouble
      } else {
        val xi = getElem(x, lt, i); val yi = getElem(y, rt, i)
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val body = if (bothFloat)
        s"""
           |    float $xi = $x.getFloat($i); float $yi = $y.getFloat($i);
           |    $dot += (double)($xi * $yi);
           |    $na += (double)($xi * $xi);
           |    $nb += (double)($yi * $yi);
         """.stripMargin
      else
        s"""
           |    double $xi = ${genGet(x, elemType(left), i)};
           |    double $yi = ${genGet(y, elemType(right), i)};
           |    $dot += $xi * $yi;
           |    $na += $xi * $xi;
           |    $nb += $yi * $yi;
         """.stripMargin
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $body
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatOrDoubleArrayInputs {

  override def checkInputDataTypes(): TypeCheckResult = checkVectorInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    val ff = bothFloat
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // HOF: null element nulls the fold
      dot += (if (ff) (x.getFloat(i) * y.getFloat(i)).toDouble
              else getElem(x, lt, i) * getElem(y, rt, i))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val term = if (bothFloat)
        s"(double)($x.getFloat($i) * $y.getFloat($i))"
      else
        s"${genGet(x, elemType(left), i)} * ${genGet(y, elemType(right), i)}"
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $term;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd cosine similarity of two `array<float>`/`array<double>`
    * columns. */
  def cosineF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd dot product of two `array<float>`/`array<double>`
    * columns. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
