package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `array<float>` columns in double precision.
  *
  * A native Catalyst expression (SURVEY §7.4's "custom Expression"
  * tier): `doGenCode` emits one tight scalar loop over the unsafe array
  * data — no per-element boxing, no intermediate arrays, stays inside
  * whole-stage codegen. The interpreted `aggregate(zip_with(...))`
  * formulation this replaces allocated two arrays and three closures
  * per pair; on an all-pairs similarity join that was the entire
  * runtime (BENCH r1: d06_embedding_neardup 72 s → sub-second).
  *
  * Summation is sequential left-to-right with each float widened to
  * double first — bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))` over `CAST(... AS DOUBLE[])`.
  *
  * NULL ELEMENTS contribute 0 to the sum (ArrayData.getFloat reads a
  * null slot as 0f) — deliberately matching DuckDB's `list_sum`, which
  * skips NULL products, rather than whole-expression null propagation.
  * Null ARRAYS (either side) do propagate to a null result.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the float-vector expressions. */
object FloatVector {
  import GraftExpressionBridge.{column, expression}

  /** Σ aᵢ·bᵢ in double precision; both sides must be `array<float>`. */
  def dotF(a: Column, b: Column): Column =
    column(FloatDot(expression(a), expression(b)))

  /** The one `float_dot` function builder — shared by the per-session
    * registration below and the cluster-wide graft.GraftExtensions
    * injection, so the two SQL paths can never drift. */
  private[graft] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatDot(a, b)
    case args => throw new IllegalArgumentException(
      s"float_dot expects 2 arguments, got ${args.size}")
  }

  /** Make the expression visible to SQL (EP2): `float_dot(a, b)`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftExpressionBridge.registerFunction(spark, "float_dot", builder)
}
