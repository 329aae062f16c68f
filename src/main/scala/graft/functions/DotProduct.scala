package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product over two `array<bigint>` columns.
  *
  * A native codegen'd expression because this is the inner loop of
  * similarity search: at 100 TB the dot product runs |queries|·|corpus|
  * times, and Catalyst's `aggregate`/`zip_with` higher-order functions
  * evaluate interpreted (measured ~20× slower than generated code on the
  * shingle workload). The generated code is a primitive long loop over
  * the two ArrayData buffers — no allocation, no boxing, stays inside
  * WholeStageCodegen.
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var sum = 0L
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
        |long $sum = 0L;
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |for (int $i = 0; $i < $n; $i++) {
        |  $sum += $a.getLong($i) * $b.getLong($i);
        |}
        |${ev.value} = $sum;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_l"
}

object DotProductL {
  import org.apache.spark.sql.graftglue.Glue
  def apply(a: Column, b: Column): Column =
    Glue.column(DotProductL(Glue.expression(a), Glue.expression(b)))
}
