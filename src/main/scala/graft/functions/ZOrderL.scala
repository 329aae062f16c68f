package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton / Z-order interleave of two long keys: bit i of x lands at
  * position 2i, bit i of y at 2i+1, inputs masked to 31 bits so the
  * code always fits a non-negative long identically on every engine.
  *
  * A native codegen'd Catalyst expression (not a UDF): the z-value is
  * computed once per row when laying out a 100 TB table for TWO-
  * dimensional locality (a range-sort on z keeps rows close in BOTH
  * key dimensions, so min/max file stats prune 2-D box filters — the
  * multi-column generalisation of x11's single-axis range sort). The
  * magic-mask spread runs in ~10 ALU ops per operand with no loop, no
  * boxing, inside the WholeStageCodegen span.
  *
  * The bit semantics are replayable in ANSI SQL (the oracle states the
  * 62-term shift-and-add form), so z-values are engine-independent.
  */
case class ZOrderL(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderL.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderL.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderL =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder"
}

object ZOrderL {

  /** Spread the low 31 bits of v into the even bit positions. */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** The oracle's shift-and-add form of [[interleave]] — generated once
    * so the SQL text and the Scala reference cannot drift apart. */
  def sqlInterleave(x: String, y: String): String = {
    val terms = (0 until 31).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  import org.apache.spark.sql.graftglue.Glue
  def apply(x: Column, y: Column): Column =
    Glue.column(ZOrderL(Glue.expression(x), Glue.expression(y)))
}
