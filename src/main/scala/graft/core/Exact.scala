package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Bit-exact float aggregation for the DuckDB oracle comparison.
  *
  * Summing doubles is order-dependent, and Spark's shuffle order differs
  * from DuckDB's sequential scan, so `sum(double)` can differ in the last
  * ulp and fail the driver's hash compare. The fix: round each addend to a
  * fixed decimal scale (the test data carries 2-decimal money values, so
  * the cast is unambiguous — no value sits on a rounding tie), sum
  * exactly in decimal, and cast the final exact decimal to double. The
  * decimal→double conversion is correctly rounded in both JVM and DuckDB,
  * so both sides produce identical bits.
  *
  * Precision 12,2 keeps the 3-factor product (price × (1-disc) × (1+tax))
  * inside decimal(38,6) with no rounding on either engine.
  */
object Exact {
  /** Canonical 2-decimal fixed-point view of a money/quantity column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum surfaced as a bit-stable double. */
  def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact mean: exact decimal sum → double, divided by the group count.
    * (double / long is a single IEEE op — deterministic on both engines.) */
  def avgd(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** SQL fragments for the DuckDB side of the same computations. */
  def sqlDec(col: String): String = s"CAST($col AS DECIMAL(12,2))"
  def sqlSumd(col: String): String = s"CAST(sum(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"

  /** Integer quantization of a float-array column (the int8/int16 trick
    * that makes vector arithmetic order-independent and thus engine-exact).
    * ONE definition for every operator that scores embeddings — the Scala
    * expression and the DuckDB fragment must stay in lockstep or
    * hash-parity silently breaks. Codegen'd ([[graft.functions.QuantizeL]]),
    * not a `transform` HOF: the HOF evaluates interpreted and would break
    * the WholeStageCodegen span right before the dot product. */
  def quantize(c: Column, scale: Int): Column =
    graft.functions.QuantizeL(c, scale)

  def sqlQuantize(col: String, scale: Int): String =
    s"list_transform($col, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))"
}
