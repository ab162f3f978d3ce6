package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the float-embedding dot product — the
  * one hot-path operation the built-in surface only covers via
  * `zip_with`+`aggregate` higher-order functions, which are interpreted
  * (no whole-stage codegen) and allocate per row. This expression stays
  * inside codegen: a tight primitive loop over the two ArrayData, summing
  * left-to-right in double — bit-identical to the HOF fold (and to the
  * DuckDB oracle's list_dot_product over DOUBLE[] casts).
  *
  * Null semantics: null if either side is null (nullIntolerant) OR the
  * lengths differ — the same result the zip_with/aggregate fold produces
  * (zip_with pads the shorter side with nulls, which poison the sum).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // mismatched lengths → null
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Idempotent per-session registration (also exposes `vector_dot` to
    * SQL text via the function registry).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs.head, exprs(1)), "scala_udf")

  /** Column-level dot product; requires [[register]] on the session. */
  def vectorDot(a: Column, b: Column): Column = call_function("vector_dot", a, b)
}
