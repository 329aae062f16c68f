package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads go straight to parquet so Catalyst can push filters and prune
  * columns at the scan (`PushedFilters` / `ReadSchema` in explain output) —
  * at 100 TB this is the difference between scanning a column subset of a
  * partition and scanning everything.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Generator builds have written `ts` two ways: TIMESTAMP(NANOS), which
    * Spark's vectorized reader only surfaces as long nanos, and plain
    * TIMESTAMP(MICROS). Dispatch on the file schema and surface
    * microsecond-precision TIMESTAMP_NTZ either way (identical to what
    * DuckDB sees — it also truncates nanos to its native micros). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      // integer DIV, not `/`: epoch-nanos exceed double's 2^53 exact range,
      // so float division would be off by ±1 µs on some rows
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
