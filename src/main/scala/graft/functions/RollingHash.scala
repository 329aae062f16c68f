package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * `h = Σ (h*31 + codepoint) mod (2^31-1)` over the string's characters.
  *
  * A native codegen'd Catalyst expression (not a UDF): fingerprinting runs
  * over every document of a 100 TB corpus, so it must stay inside the
  * WholeStageCodegen span — the generated code is a tight per-row loop on
  * the UTF8String with no boxing and no closure dispatch.
  *
  * The mod-2^31-1 integer recurrence is chosen to be replayable in ANSI
  * SQL (the DuckDB oracle recomputes it with a recursive CTE), so the
  * fingerprints are engine-independent.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

/** All length-`w` window hashes of a string as `array<long>` — the
  * column form of [[RollingHash.windowHashes]], built for
  * `posexplode`: the d16/d19 window stage explodes ONE primitive long
  * array per document inside codegen (`ArrayData.toArrayData` on an
  * `Array[Long]` is `UnsafeArrayData.fromPrimitiveArray` — no boxing,
  * no per-window tuple encoding), where the previous Dataset flatMap
  * paid a boxed `(Long, Long, Long)` encoder round-trip per CORPUS
  * POSITION, twice (the plan recomputes the window stage on the
  * candidate-join branch). Measured at sfx1: TUNING.md round-15 d16
  * line. */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"window width must be positive, got $w")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      RollingHash.windowHashes(input.asInstanceOf[UTF8String].toString, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.RollingHash.windowHashes($c.toString(), $w))")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)

  override def prettyName: String = "window_hashes"
}

object WindowHashes {
  import org.apache.spark.sql.graftglue.Glue
  def apply(c: Column, w: Int): Column = Glue.column(WindowHashes(Glue.expression(c), w))
}

object RollingHash {
  final val Mod = 2147483647L // 2^31 - 1

  /** Iterates Unicode CODEPOINTS (not UTF-16 code units) so the recurrence
    * matches the SQL oracle's per-character `ord()` on astral-plane text
    * (emoji etc.), not just the BMP. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** All length-`w` codepoint-window hashes of `s` in O(n) — the slide
    * recurrence of [[hash]]: h⁺ = (h − cp_out·31^(w−1))·31 + cp_in mod p.
    * Element k is exactly `hash` of the window starting at codepoint k
    * (RollingHashSpec pins the equivalence), which is what lets a
    * corpus-scale window stage shuffle one 8-byte key per position
    * instead of re-hashing (or carrying) w codepoints per window. */
  def windowHashes(s: String, w: Int): Array[Long] = {
    val cps = (if (s == null) "" else s).codePoints().toArray
    val n = cps.length
    if (n < w) return Array.emptyLongArray
    var pw = 1L // 31^(w-1) mod p
    var k = 1
    while (k < w) { pw = (pw * 31) % Mod; k += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    var i = 0
    while (i < w) { h = (h * 31 + cps(i)) % Mod; i += 1 }
    out(0) = h
    while (i < n) {
      h = (((h - (cps(i - w) * pw) % Mod + Mod) % Mod) * 31 + cps(i)) % Mod
      out(i - w + 1) = h
      i += 1
    }
    out
  }

  import org.apache.spark.sql.graftglue.Glue
  def apply(c: Column): Column = Glue.column(RollingHash(Glue.expression(c)))
}
