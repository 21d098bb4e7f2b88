package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: ascending-index double dot product of two
  * `array<float>` / `array<double>` columns, with full whole-stage-codegen
  * support.
  *
  * Replaces the `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0.0, (acc, x) -> acc + x)` idiom BIT-FOR-BIT: the accumulation is the
  * same IEEE double additions in the same ascending index order, so every
  * oracle-replayed cosine/norm computed through it hashes identically.
  * The higher-order-function form never enters whole-stage codegen
  * (`zip_with`/`aggregate` evaluate their lambda per element through an
  * interpreted expression tree with variable binding), which made it the
  * dominant per-row cost of the within-cluster pair loops at soak scale;
  * this expression compiles to a primitive loop inside the surrounding
  * codegen span — no boxing, no per-element dispatch.
  *
  * Length semantics: iterates to `min(|a|, |b|)` (the [[CosineSimilarity]]
  * convention). The replaced `zip_with` form instead null-padded to the
  * LONGER array, making the whole sum NULL on a length mismatch; all
  * call sites compare vectors produced by one pipeline over one table, so
  * lengths are equal by construction and the two semantics coincide. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two array<float> or two array<double> args, " +
            s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.$getter($i) * (double) $y.$getter($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
