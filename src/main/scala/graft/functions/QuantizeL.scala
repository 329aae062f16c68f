package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Integer quantization of a float/double array: element → round(x·scale)
  * as long, rounding half AWAY from zero (what both Spark's `round` and
  * DuckDB's `round` do), emitted as a primitive long array.
  *
  * A native codegen'd expression because quantization runs once per
  * embedding row in every vector operator (s1–s4, d5) and Catalyst's
  * `transform` higher-order function evaluates interpreted — this keeps
  * the embedding pipeline inside WholeStageCodegen end-to-end, feeding
  * [[DotProductL]] without an interpreted seam. Elements are assumed
  * non-null (embedding vectors are dense). Must stay semantically in
  * lockstep with `graft.core.Exact.sqlQuantize`.
  */
case class QuantizeL(child: Expression, scale: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = (if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)) * scale
      out(i) = (if (v >= 0) math.floor(v + 0.5d) else math.ceil(v - 0.5d)).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val v = ctx.freshName("v")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        |int $n = $a.numElements();
        |long[] $arr = new long[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = $get * $scale;
        |  $arr[$i] = (long)($v >= 0 ? java.lang.Math.floor($v + 0.5d)
        |                            : java.lang.Math.ceil($v - 0.5d));
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeL =
    copy(child = newChild)

  override def prettyName: String = "quantize_l"
}

object QuantizeL {
  import org.apache.spark.sql.graftglue.Glue
  def apply(c: Column, scale: Int): Column =
    Glue.column(QuantizeL(Glue.expression(c), scale))
}
