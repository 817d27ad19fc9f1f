package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Integer hash arithmetic that WANTS two's-complement wrap.
  *
  * Spark 4 defaults to ANSI mode, where long `+`/`*` throw on overflow —
  * correct for business arithmetic, wrong for hash mixing, which relies
  * on the wrap. A dedicated Catalyst expression sidesteps the check
  * without flipping the session-wide ANSI flag (the rest of the engine
  * benefits from strict arithmetic), and `doGenCode` keeps the hot
  * aggregate inside whole-stage codegen where a UDF would break it.
  */
object HashArith {

  /** `base + mul * step` over longs with Java wrap semantics — the
    * Kirsch–Mitzenmacher combiner h_i = h1 + i·h2 that derives a k-wise
    * hash family from two base hashes (one digest instead of k). */
  case class MulAddWrap(base: Expression, mul: Expression, step: Expression)
      extends TernaryExpression {
    override def first: Expression = base
    override def second: Expression = mul
    override def third: Expression = step
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mul_add_wrap needs (bigint, bigint, bigint), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = LongType
    override def nullSafeEval(b: Any, m: Any, s: Any): Any =
      b.asInstanceOf[Long] + m.asInstanceOf[Long] * s.asInstanceOf[Long]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, m, s) => s"${ev.value} = $b + $m * $s;")
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(base = newFirst, mul = newSecond, step = newThird)
  }

  def mulAddWrap(base: Column, mul: Column, step: Column): Column =
    ColumnBridge.column(MulAddWrap(
      ColumnBridge.expression(base),
      ColumnBridge.expression(mul),
      ColumnBridge.expression(step)))
}
