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
  /** Does the parquet file/dir at `path` carry a TIMESTAMP(NANOS) `ts`
    * column? Pure footer-metadata read — no session conf consulted or
    * mutated, which is the point: it lets [[events]] decide whether the
    * legacy nanos flag is needed BEFORE touching any session state. */
  private[graft] def tsIsNanos(s: SparkSession, path: String): Boolean = try {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = s.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val part =
      if (fs.getFileStatus(p).isFile) Some(p)
      else fs.listStatus(p).map(_.getPath)
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    part.exists { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val schema = reader.getFileMetaData.getSchema
        schema.containsField("ts") && {
          val t = schema.getType(schema.getFieldIndex("ts"))
          t.isPrimitive && (t.getLogicalTypeAnnotation match {
            case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
        }
      } finally reader.close()
    }
  } catch { case _: java.io.IOException => false } // missing path → load() reports it

  /** Generator builds have written `ts` two ways: TIMESTAMP(NANOS), which
    * Spark's vectorized reader only surfaces as long nanos, and plain
    * TIMESTAMP(MICROS). Dispatch on the file footer and surface
    * microsecond-precision TIMESTAMP_NTZ either way (identical to what
    * DuckDB sees — it also truncates nanos to its native micros).
    *
    * Conf hygiene: the legacy nanos flag is set ONLY when the footer
    * shows a genuine TIMESTAMP(NANOS) column — the micros flavor (what
    * the round-9 generator writes at every SF) leaves session state
    * untouched. When nanos IS detected the flag must stay set for the
    * session: Spark re-reads it from the session conf when the returned
    * (lazy) DataFrame is later planned/executed, so a set-and-restore
    * here would make the handed-out DataFrame unreadable. The one-time
    * stderr line makes the (file-mandated) session change loud. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val path = s"$d/events.parquet"
    if (tsIsNanos(s, path) &&
        !s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")) {
      System.err.println(s"[graft] Tables.events: $path carries TIMESTAMP(NANOS); " +
        "enabling spark.sql.legacy.parquet.nanosAsLong for this session " +
        "(the vectorized reader reads the flag from session conf at execution, " +
        "so it cannot be scoped tighter)")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
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
