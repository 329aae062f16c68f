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

  /** Deterministic p=1/4 edge draw for the DOULION sampled-triangle
    * family (g32/st28). The hash MUST be nonlinear in (u, v): for any
    * linear form c·u + d·v the three edges of a triangle {u,v,w} have
    * linearly dependent hashes (h(u,v) + h(v,w) − h(u,w) = (c+d)·v), so
    * edge survivals are correlated and the p³ independence the ×64
    * scaling assumes breaks — the original c=1103515245, d=12345 draw
    * (both ≡1 mod 4) degenerated to (u+v)%4=0 and kept triangles with
    * probability ~1/32, a systematic 2× estimate bias. Two ingredients
    * fix it, and BOTH are load-bearing: (1) a u·v product term, because
    * for triangle edges the linear parts are dependent while uv, uw, vw
    * are not; (2) a Lehmer scramble (×48271 mod 2³¹−1) AFTER the mix,
    * because `mod 4` of any polynomial sees its inputs only mod 4 — the
    * product alone still collapses to a 16-cell (u%4, v%4) table (keep
    * ratio measured 1/8, estimate ~1.9× high). The modular reduction by
    * the odd Mersenne prime feeds high bits into the low two bits, so
    * the draw is ~uniform (keep ratio 0.2501/0.2492 at sf0.001/sf0.01;
    * estimate within 3% of the true count at both). Every intermediate
    * fits signed 64-bit (max (2³¹)·48271 < 2⁴⁸), so the SAME expression
    * evaluates overflow-free in both Spark codegen and the DuckDB
    * oracle. ONE definition, three hosts (Column / SQL / local Scala
    * for brute-force spec oracles) — keep them in lockstep. */
  /** b^e mod m — plan-build-time constants for the per-component minhash
    * families (t35/d12). Every intermediate stays in BigInt, so any
    * (b, e, m) with m < 2⁶³ is safe. */
  def modPow(b: Long, e: Long, m: Long): Long =
    BigInt(b).modPow(BigInt(e), BigInt(m)).toLong

  /** The ONE per-component affine minhash family (t35 source signatures,
    * d12 affine LSH): `h_j(x) = (x·minhashA(j) + minhashB(j)) mod
    * MinhashP` over a 60-bit md5 slice reduced mod P. The constants are
    * GEOMETRIC powers of two generators, never anything linear in j: a
    * multiplier c·j makes h_j(x) ≈ j·(c'·x+1) mod P, so every component
    * picks the SAME argmin element until wraparound interferes, and a
    * K-component signature estimates Jaccard with effective K=1
    * (measured: a J=1/3 fixture estimated 1/24 instead of ~8/24; same
    * failure family as the DOULION [[edgeDraw]] degeneracy — mod-k of a
    * structured polynomial sees only structure). Distinct powers of a
    * generator share no linear relation, so argmins decorrelate; the
    * CorpusOpsSpec t35 test pins estimates against true set Jaccard. */
  val MinhashP = 2147483647L
  def minhashA(j: Int): Long = modPow(40503L, j, MinhashP)
  def minhashB(j: Int): Long = modPow(16807L, j, MinhashP)

  private val DrawM = 2147483647L // 2^31 - 1

  def edgeDraw(u: Column, v: Column): Column = {
    val m = lit(DrawM)
    val a = u % m
    val b = v % m
    val h1 = ((a * b) % m + (a * lit(48271L)) % m + (b * lit(16807L)) % m) % m
    (h1 * lit(48271L)) % m % lit(4L) === lit(0L)
  }

  def sqlEdgeDraw(u: String, v: String): String =
    s"(((($u % $DrawM) * ($v % $DrawM)) % $DrawM + (($u % $DrawM) * 48271) % $DrawM + " +
      s"(($v % $DrawM) * 16807) % $DrawM) % $DrawM) * 48271 % $DrawM % 4 = 0"

  def edgeDrawLocal(u: Long, v: Long): Boolean = {
    val a = u % DrawM
    val b = v % DrawM
    val h1 = ((a * b) % DrawM + (a * 48271L) % DrawM + (b * 16807L) % DrawM) % DrawM
    h1 * 48271L % DrawM % 4L == 0L
  }
}
