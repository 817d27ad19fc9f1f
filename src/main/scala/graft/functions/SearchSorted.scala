package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Binary search over a driver-side sorted cut array — the equi-depth
  * bucket assignment kernel (NumPy's `searchsorted`, Spark ML's
  * `Bucketizer.binarySearchForBuckets`, but as a native Catalyst
  * expression so the assignment stays inside whole-stage codegen where
  * ML's UDF route would break it, and O(log B) per row where a
  * `when`-chain or higher-order-function scan over B cuts is O(B)).
  *
  * `eval(s)` = the number of cuts strictly below `s` — so a value equal
  * to a cut lands in the LOWER bucket (the q105 decile tie convention)
  * and the bucket is a pure function of the value: ties can never
  * split across buckets, which is what keeps the bucketed average-rank
  * algebra in `QualityClassifier.bucketRanked` bit-identical to the
  * single-sort form.
  */
object SearchSorted {

  /** `#{ c in cuts : c < child }` via `Arrays.binarySearch`; `cuts`
    * must be sorted ascending and duplicate-free (callers dedupe). */
  case class SearchSortedBucket(child: Expression, cuts: Array[Double])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"search_sorted_bucket needs double, got ${child.dataType.simpleString}")
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any = {
      val r = java.util.Arrays.binarySearch(cuts, v.asInstanceOf[Double])
      if (r >= 0) r else -(r + 1)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val r = ctx.freshName("bs")
        s"""
           |int $r = java.util.Arrays.binarySearch($cutsRef, $v);
           |${ev.value} = $r >= 0 ? $r : -($r + 1);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def searchSortedBucket(c: Column, cuts: Array[Double]): Column =
    ColumnBridge.column(SearchSortedBucket(ColumnBridge.expression(c), cuts))
}
