package graft.functions

import graft.core.Json
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical qualifiers JSON (`{"k":["v",...],...}`, UTF-8-sorted keys)
  * as a codegen'd Catalyst expression over a `map<string,array<string>>`
  * column — byte-identical to [[graft.core.Json.strMap]] because it
  * CALLS the same `Json.str`/`utf8Ordering` logic, just directly on the
  * columnar MapData instead of on a deserialized Scala Map.
  *
  * This is what lets `Materialise.assertions` stay column-native (round
  * 16): the qualifiers rendering was the one field that previously
  * forced the whole-record typed flatMap (the JSON bytes feed the sha256
  * edgeId, so `to_json` — different escaping, unsorted keys — is not an
  * option). QualifiersJsonSpec pins byte-equality against Json.strMap on
  * adversarial inputs (control chars, quotes, backslashes, astral-plane
  * keys that UTF-16 ordering would invert).
  */
case class QualifiersJson(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    QualifiersJson.render(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualifiersJson.render($c)")

  override protected def withNewChildInternal(newChild: Expression): QualifiersJson =
    copy(child = newChild)

  override def prettyName: String = "qualifiers_json"
}

object QualifiersJson {
  import org.apache.spark.sql.graftglue.Glue
  def apply(c: Column): Column = Glue.column(QualifiersJson(Glue.expression(c)))

  /** One pass over the MapData: sort keys by UTF-8 order, render each
    * `"key":["v1","v2"]` with [[Json.str]] escaping. No Scala Map is
    * materialised. */
  def render(m: MapData): UTF8String = {
    val n = m.numElements()
    if (n == 0) return UTF8String.fromString("{}")
    val keys = m.keyArray()
    val vals = m.valueArray()
    val idx = Array.range(0, n)
    val keyStrs = Array.tabulate(n)(i => keys.getUTF8String(i).toString)
    // insertion-sort-free: sort indices by the key's UTF-8 order (maps
    // here are tiny — qualifier objects carry a handful of keys)
    val sorted = idx.sortWith((a, b) => Json.utf8Compare(keyStrs(a), keyStrs(b)) < 0)
    val sb = new StringBuilder(32 * n)
    sb.append('{')
    var first = true
    var i = 0
    while (i < n) {
      val j = sorted(i)
      if (!first) sb.append(',')
      first = false
      sb.append(Json.str(keyStrs(j))).append(':').append('[')
      val arr = vals.getArray(j)
      val an = arr.numElements()
      var k = 0
      while (k < an) {
        if (k > 0) sb.append(',')
        sb.append(Json.str(arr.getUTF8String(k).toString))
        k += 1
      }
      sb.append(']')
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }
}
