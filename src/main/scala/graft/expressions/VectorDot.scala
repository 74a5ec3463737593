package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression for the sequential-fold dot product of two
 * numeric arrays (float or double elements), with whole-stage codegen.
 *
 * Motivation (SURVEY §7.8#6 / the prompt's extension ladder): the
 * higher-order-function formulation `aggregate(zip_with(a, b, _*_), 0, _+_)`
 * is interpreted per element — it allocates a zipped array and walks lambda
 * closures for every product. This expression compiles to a tight primitive
 * loop inside WholeStageCodegen. Semantics are IDENTICAL to the HOF form
 * (left-to-right double accumulation, float elements widened exactly, any
 * NULL element → NULL result), so DuckDB-oracle parity is unchanged — only
 * the constant factor drops.
 */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems: Boolean = Seq(left, right).exists(
    _.dataType.asInstanceOf[ArrayType].containsNull)

  /** A NULL ELEMENT nulls the result even when the array columns themselves
   *  are non-nullable (collect_list output, literals) — without this
   *  override the expression claimed non-nullable, and the codegen's
   *  `ev.isNull = true` assigned to a slot that does not exist, which
   *  Janino rejected — silently DE-COMPILING every operator containing a
   *  vector_dot over non-nullable arrays (the whole IVF assignment path)
   *  to interpreted mode. */
  override def nullable: Boolean = !left.resolved || !right.resolved ||
    left.nullable || right.nullable || mayHaveNullElems

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    // Locals MUST come from ctx.freshName: several vector_dot evaluations can
    // land in one generated function (lshBucket emits 6 per band, cosine
    // composes 3) and fixed names made janino reject the whole function with
    // "Redefinition of local variable", silently de-compiling the hot path.
    val n = ctx.freshName("vdN")
    val acc = ctx.freshName("vdAcc")
    val i = ctx.freshName("vdI")
    // element null-check only when an input's element type admits nulls —
    // otherwise the loop is a branch-free multiply-add (and `ev.isNull` may
    // be the non-existent slot of a non-nullable expression)
    val elemCheck =
      if (mayHaveNullElems)
        (a: String, b: String, idx: String) =>
          s"if ($a.isNullAt($idx) || $b.isNullAt($idx)) { ${ev.isNull} = true; break; }"
      else (_: String, _: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemCheck(a, b, i)}
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VectorDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
