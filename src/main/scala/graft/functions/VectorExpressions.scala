package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native dot product for the embedding hot path (SURVEY.md §2 P5-P7,
 * P17). The composable twin — `aggregate(zip_with(a, b, _ * _), 0.0,
 * _ + _)` — is codegen'd but materializes the zipped products array per
 * invocation and pays higher-order-function lambda dispatch per element;
 * at O(candidates) invocations per ANN/dedup query that allocation is the
 * scoring cost. This expression fuses the whole product into one
 * generated loop over the two ArrayDatas: no intermediate array, no
 * lambda, plain double arithmetic inside whole-stage codegen.
 *
 * Semantics are the EXACT twin of the Column version, so the DuckDB
 * oracles are unchanged:
 *  - accumulates left-to-right from 0.0 in element order (IEEE-identical
 *    to the ordered fold);
 *  - a null element on either side → null result (zip_with yields a null
 *    product, and `null + x` poisons the fold);
 *  - length mismatch → null (zip_with pads the shorter side with nulls).
 */
object VectorExpressions {

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    // null on length mismatch / null element, even for non-null inputs
    override def nullable: Boolean = true

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      import org.apache.spark.sql.types.ArrayType
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires array<double>, got ${left.dataType} / ${right.dataType}")
      }
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        final int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          int $i = 0;
          for (; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }""")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.graftglue.Bridge

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
