package graft.functions

import graft.curie.PrefixTrie
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the CURIE prefix rewrite (SURVEY §2.2 P1,
  * §2.12 #1; reference trie: `grebi_shared/src/prefix_map.rs:117-197`).
  *
  * A codegen'd `Expression` rather than a Scala UDF so the rewrite stays
  * inside the WholeStageCodegen span: the trie is attached to the generated
  * class as a reference object and each row pays one virtual call, no
  * encoder/closure boundary. At 100 TB the normalise pass touches every
  * string of every record — this is the hottest scalar in the pipeline.
  */
case class NormalisePrefix(child: Expression, trie: PrefixTrie)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    trie.rewriteUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("trie", trie, classOf[PrefixTrie].getName)
    defineCodeGen(ctx, ev, c => s"$trieRef.rewriteUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalisePrefix =
    copy(child = newChild)

  override def prettyName: String = "normalise_prefix"
}

object NormalisePrefix {
  import org.apache.spark.sql.graftglue.Glue
  /** Column-level entry point: `NormalisePrefix(col, trie)`. */
  def apply(c: Column, trie: PrefixTrie): Column =
    Glue.column(NormalisePrefix(Glue.expression(c), trie))
}
